"""Debug index interchange formats (reference `txt` and `bin` index types).

The reference supports three posting encodings selectable at runtime
(readme_assignment.md:70): `txt` (human-readable, "for debugging"), `bin`
(raw little-endian u32 streams), and `vbyte` (the production codec — our
block index's wire format). This module reproduces the first two as dumps
of the serving block index so the reference's golden-inspection and raw
interchange workflows work against this engine; loaders round-trip for
tests.

- txt (create_index.cpp:67-72 dump_uints_txt; merge_index.cpp:169-191):
  per term, one ids-file line ``term gap1 gap2 ...`` (docID deltas when
  store_diff) and one freqs-file line ``term f1 f2 ...``.
- bin (merge_index.cpp:193-216 dump_index_bin): raw u32 values, ids
  (deltas when store_diff) and freqs in two files, per-term extents
  recorded in a lexicon sidecar (the reference records ftell offsets in
  storage_info; here the sidecar is ``term ids_off freqs_off doc_cnt``
  text lines, merge_index.cpp:249-254 shape). The u32 width is the
  REFERENCE's cap (readme_assignment.md:247) — dumping a corpus with
  docID gaps or tfs ≥ 2^32 raises rather than truncating.
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


def dump_index_bin(
    reader, ids_path: str, freqs_path: str, lexicon_path: str,
    store_diff: bool = True,
) -> int:
    """Dump postings as the reference's `bin` format: raw little-endian u32
    streams (ids as deltas when store_diff) + a text lexicon sidecar
    ``term ids_off freqs_off doc_cnt`` with byte offsets into the two
    streams (the storage_info shape, merge_index.cpp:249-254). Values
    ≥ 2^32 raise (the reference's u32 cap, not silently truncated).
    Debug/interchange only — decodes the whole index on the driver."""
    terms = sorted(
        reader._lex_ds.to_table(columns=["term"]).column("term").to_pylist()
    ) if reader._lex_ds is not None else []
    n = 0
    with open(ids_path, "wb") as ids_fp, open(freqs_path, "wb") as freqs_fp, \
            open(lexicon_path, "w") as lex_fp:
        for term in terms:
            arrays = reader._fetch_arrays([term])
            if term not in arrays:
                continue
            ids, tfs, _dls = arrays[term]
            out_ids = np.diff(ids, prepend=0) if store_diff else ids
            if out_ids.max(initial=0) >= 1 << 32 or tfs.max(initial=0) >= 1 << 32:
                raise OverflowError(
                    f"term {term!r} exceeds the bin format's u32 range "
                    "(reference cap, readme_assignment.md:247)"
                )
            lex_fp.write(
                f"{term} {ids_fp.tell()} {freqs_fp.tell()} {len(ids)}\n"
            )
            ids_fp.write(out_ids.astype("<u4").tobytes())
            freqs_fp.write(tfs.astype("<u4").tobytes())
            n += 1
    return n


def read_index_bin(
    ids_path: str, freqs_path: str, lexicon_path: str, store_diff: bool = True
) -> dict[str, dict[int, int]]:
    """Parse the bin index back via the lexicon offsets: term →
    {doc_id: tf}, undoing the delta encoding."""
    out: dict[str, dict[int, int]] = {}
    with open(ids_path, "rb") as ids_fp, open(freqs_path, "rb") as freqs_fp, \
            open(lexicon_path) as lex_fp:
        for line in lex_fp:
            term, ids_off, freqs_off, cnt = line.split()
            ids_off, freqs_off, cnt = int(ids_off), int(freqs_off), int(cnt)
            ids_fp.seek(ids_off)
            freqs_fp.seek(freqs_off)
            ids = np.frombuffer(ids_fp.read(4 * cnt), dtype="<u4").astype(np.int64)
            tfs = np.frombuffer(freqs_fp.read(4 * cnt), dtype="<u4")
            if store_diff:
                ids = np.cumsum(ids)
            out[term] = {int(d): int(tf) for d, tf in zip(ids, tfs)}
    return out
