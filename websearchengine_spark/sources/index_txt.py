"""Debug text index format (reference `txt` index type).

The reference supports a human-readable index encoding "for debugging"
(readme_assignment.md:70): per term, one line in the ids file —
``term gap1 gap2 ...`` (docID deltas when store_diff, raw ids otherwise) —
and one line in the freqs file — ``term f1 f2 ...``
(create_index.cpp:67-72 dump_uints_txt; merge_index.cpp:169-191
dump_index_txt). Reproduced here as a dump of the serving block index so
the same golden-inspection workflow works against this engine; the loader
round-trips for tests.
"""

from __future__ import annotations

import numpy as np


def dump_index_txt(
    reader, ids_path: str, freqs_path: str, store_diff: bool = True
) -> int:
    """Dump every term's postings from a BlockIndexReader to the reference
    text format, terms in lexicographic order (the merged index's term
    order, merge_index.cpp:394-476). Returns the number of terms written.

    Debug-only by design: this decodes the whole index on the driver —
    never a production path (the reference's txt type is likewise a
    debugging aid)."""
    terms = sorted(
        reader._lex_ds.to_table(columns=["term"]).column("term").to_pylist()
    ) if reader._lex_ds is not None else []
    n = 0
    with open(ids_path, "w") as ids_fp, open(freqs_path, "w") as freqs_fp:
        for term in terms:
            arrays = reader._fetch_arrays([term])
            if term not in arrays:
                continue
            ids, tfs, _dls = arrays[term]
            out_ids = np.diff(ids, prepend=0) if store_diff else ids
            ids_fp.write(term + "".join(f" {int(v)}" for v in out_ids) + "\n")
            freqs_fp.write(term + "".join(f" {int(v)}" for v in tfs) + "\n")
            n += 1
    return n


def read_index_txt(
    ids_path: str, freqs_path: str, store_diff: bool = True
) -> dict[str, dict[int, int]]:
    """Parse the text index back: term → {doc_id: tf} (the oracle's posting
    shape), undoing the delta encoding."""
    out: dict[str, dict[int, int]] = {}
    with open(ids_path) as ids_fp, open(freqs_path) as freqs_fp:
        for ids_line, freqs_line in zip(ids_fp, freqs_fp):
            it, *id_vals = ids_line.split()
            ft, *tf_vals = freqs_line.split()
            assert it == ft, "ids/freqs files desynchronized"
            ids = np.array([int(v) for v in id_vals], dtype=np.int64)
            if store_diff:
                ids = np.cumsum(ids)
            out[it] = {
                int(d): int(tf) for d, tf in zip(ids, (int(v) for v in tf_vals))
            }
    return out
