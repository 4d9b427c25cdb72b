"""Cross-encoder pair-scorer seam — the reference's actual reranker.

The reference reranks by scoring (query, doc_text) PAIRS with a
cross-encoder (learning_to_rank.py:23-27, ``cross_encoder.predict(
query_doc_pairs)``), wired in main.cpp:785-806 which builds the pairs from
the doc bodies of the SEMANTIC candidates. This module is that seam:

- contract: any object with ``predict(list[tuple[str, str]]) ->
  sequence of float`` — exactly the sentence-transformers ``CrossEncoder``
  shape, so a real model drops in without touching any plan;
- :func:`stub_pair_score` — the deterministic default (cross-encoder
  models are not in this container). SQL-expressible
  (``(h60(query || US || text) % 2001 − 1000) / 1000``, US = unit
  separator chr(31)), so the q3 gate verifies the whole rerank dataflow —
  semantic candidate generation, doc-text join, pair scoring, final
  sort — end-to-end against the DuckDB oracle;
- :func:`score_pairs_udf` — the Spark-side seam as a batched pandas UDF
  (one model.predict call per Arrow batch, the GPU-amortizing shape).
"""

from __future__ import annotations

import hashlib

PAIR_SEP = "\x1f"  # unit separator; chr(31) in the SQL oracle


def stub_pair_score(query: str, text: str) -> float:
    """Deterministic stand-in for CrossEncoder.predict on one pair:
    (h60(query ∥ US ∥ text) % 2001 − 1000) / 1000 ∈ [−1, 1]. Integer ÷
    1000.0 is the same IEEE double in Python, Spark, and DuckDB."""
    h = int.from_bytes(
        hashlib.md5((query + PAIR_SEP + text).encode("utf-8")).digest()[:8], "big"
    ) >> 4  # first 15 hex digits = 60 bits
    return (h % 2001 - 1000) / 1000.0


def sql_pair_score(query_expr: str, text_expr: str) -> str:
    """DuckDB mirror of :func:`stub_pair_score` (for gate oracles)."""
    from websearchengine_spark.pipeline.hashing import sql_h60

    h = sql_h60(f"{query_expr} || chr(31) || {text_expr}")
    return f"((({h} % 2001) - 1000) / 1000.0)"


class StubCrossEncoder:
    """Default pair scorer: the deterministic hash score, batch-shaped like
    sentence_transformers.CrossEncoder (predict over a list of pairs)."""

    def predict(self, pairs):
        return [stub_pair_score(q, t) for q, t in pairs]


def score_pairs(pairs, model=None) -> list[float]:
    """The serving-side seam: score (query, doc_text) pairs."""
    if model is not None:
        return [float(s) for s in model.predict(list(pairs))]
    return [stub_pair_score(q, t) for q, t in pairs]


def score_pairs_udf(model=None):
    """(query Column, text Column) -> double Column, batched per Arrow
    batch. Default = the stub (gate-checked against the SQL oracle); pass
    a CrossEncoder-shaped ``model`` for real reranking."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    # no type hints: `from __future__ import annotations` stringifies them,
    # which Spark's pandas-UDF signature inference rejects; the explicit
    # returnType below is authoritative
    def _score(query, text):
        q = query.fillna("")
        t = text.fillna("")
        return pd.Series(
            score_pairs(zip(q, t), model=model), index=query.index, dtype="float64"
        )

    return pandas_udf(_score, DoubleType())
