"""Snippet extraction (reference P13, main.cpp:498-547) + per-result term
frequencies (J3, main.cpp:610-612 — the `freqs` pairs in the JSON results).

Reference behavior: after ranking, re-read the doc body, scan tokens for the
first occurrence of any query term, and cut a window of ``snippet_len``
characters centered on it (expanded to UTF-8 boundaries). Rebuild semantics
(documented, deterministic, identical in Spark and the DuckDB oracle):

- match position = min over cleaned query terms of the first word-boundary
  occurrence (1-based char position in the body; 0 if no term occurs —
  possible for conjunctive matches only via tokenizer/boundary mismatches,
  and for disjunctive results by construction);
- snippet = ``substr(body, max(1, pos - len/2), len)`` — a center-out
  window; byte==char here because gate documents are ASCII (full UTF-8
  boundary handling lives in the serving path, which slices Python
  strings — codepoint-safe by construction).

Serving path: :class:`SnippetService` resolves doc_id → (conv_id, turn_idx)
through the index's doc_stats table and fetches turn text from the
transcripts parquet via pyarrow (the analogue of the reference's page-table
byte offsets into the corpus file, main.cpp:63-69, 498).
"""

from __future__ import annotations

import pyarrow.dataset as ds
from pyspark.sql import Column
from pyspark.sql import functions as F

from websearchengine_spark.functions.tokenizer import clean_query, tokenize


def first_match_pos_col(text: Column, terms: list[str]) -> Column:
    """1-based char position of the first word-boundary occurrence of any
    term (0 = none). Word boundary via space-padding — exact for the
    [a-z0-9 ]-alphabet gate corpus and mirrored verbatim in the SQL oracle."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    locs = [F.locate(f" {t} ", padded) for t in terms]
    nonzero = [F.when(loc > 0, loc) for loc in locs]
    return F.coalesce(F.least(*nonzero) if len(nonzero) > 1 else nonzero[0], F.lit(0))


def snippet_col(text: Column, pos: Column, length: int) -> Column:
    """Centered window: substr(text, max(1, pos - length/2), length)."""
    start = F.greatest(F.lit(1), pos - length // 2)
    return F.substring(text, start, length)


def first_match_pos(text: str, terms: list[str]) -> int:
    padded = f" {text.lower()} "
    best = 0
    for t in terms:
        i = padded.find(f" {t} ")
        if i >= 0 and (best == 0 or i + 1 < best):
            best = i + 1
    return best


def make_snippet(text: str, pos: int, length: int) -> str:
    """Python mirror of snippet_col (codepoint-safe slicing)."""
    start = max(1, pos - length // 2)
    return text[start - 1 : start - 1 + length]


class SnippetService:
    """Serving-side snippet fetch: doc_id → turn text → snippet. The page
    table analogue — doc_stats carries (doc_id, conv_id, turn_idx); the
    transcripts parquet is the corpus file."""

    def __init__(self, doc_stats_path: str, transcripts_path: str):
        self._doc_stats = ds.dataset(doc_stats_path)
        self._transcripts = ds.dataset(transcripts_path)

    def texts_for(self, doc_ids: list[int]) -> dict[int, str]:
        keys = self._doc_stats.to_table(
            filter=ds.field("doc_id").isin(doc_ids),
            columns=["doc_id", "conv_id", "turn_idx"],
        ).to_pylist()
        if not keys:
            return {}
        convs = [r["conv_id"] for r in keys]
        rows = self._transcripts.to_table(
            filter=ds.field("conv_id").isin(convs),
            columns=["conv_id", "turn_idx", "text"],
        ).to_pylist()
        by_key = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
        return {
            r["doc_id"]: by_key.get((r["conv_id"], r["turn_idx"]), "")
            for r in keys
        }

    def snippets(
        self, query: str, doc_ids: list[int], snippet_len: int = 120
    ) -> dict[int, tuple[int, str]]:
        """doc_id → (match_pos, snippet) for the cleaned query terms."""
        terms = clean_query(query)
        texts = self.texts_for(doc_ids)
        out = {}
        for d, text in texts.items():
            pos = first_match_pos(text, terms)
            out[d] = (pos, make_snippet(text, pos, snippet_len))
        return out

    def result_freqs(self, query: str, doc_ids: list[int]) -> dict[int, list[tuple[str, int]]]:
        """doc_id → [(term, tf)...] in sorted-term order — the reference's
        `freqs` result field (readme.md:205-223), recomputed from text."""
        terms = clean_query(query)
        texts = self.texts_for(doc_ids)
        out = {}
        for d, text in texts.items():
            counts: dict[str, int] = {}
            for tok in tokenize(text):
                if tok in terms:
                    counts[tok] = counts.get(tok, 0) + 1
            out[d] = [(t, counts[t]) for t in terms if t in counts]
        return out
