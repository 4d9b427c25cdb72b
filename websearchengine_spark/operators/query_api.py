"""Unified query API — the reference's Searcher::search dispatch
(main.cpp:465-553) over the four QueryTypes (main.cpp:234-236,
index.html:120-128): CONJUNCTIVE, DISJUNCTIVE, SEMANTIC, RERANKING."""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators import semantic as sem
from websearchengine_spark.operators.query import search as bm25_search
from websearchengine_spark.plans.build import LogicalIndex


class QueryType(IntEnum):
    CONJUNCTIVE = 0
    DISJUNCTIVE = 1
    SEMANTIC = 2
    RERANKING = 3


def _query_vecs(
    spark, queries: list[tuple[int, str]], dim: int, model=None
) -> DataFrame:
    """Query encoding through the batched pandas-UDF encoder seam
    (operators/semantic.py::encode_texts_udf); pass ``model`` to use a real
    bi-encoder, default = the deterministic hash encoder (gate-checked)."""
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    enc = sem.encode_texts_udf(dim=dim, model=model)
    return qdf.select("query_id", enc(F.col("query")).alias("qv"))


def search_api(
    index: LogicalIndex,
    queries: list[tuple[int, str]],
    query_type: QueryType = QueryType.CONJUNCTIVE,
    k: int = 10,
    embeddings: DataFrame | None = None,
    doc_texts: DataFrame | None = None,
    rerank_candidates: int = 32,
    pair_scorer=None,
) -> DataFrame:
    """Dispatch like the reference's Searcher::search. BM25 modes run the
    exhaustive DataFrame plan; SEMANTIC is dense cosine retrieval over the
    doc-embedding table; RERANKING follows the reference's actual pipeline
    (main.cpp:772-806): SEMANTIC candidates (top ``rerank_candidates`` =
    the reference's top_k=32) re-scored by the cross-encoder pair seam
    over the doc bodies (``doc_texts``: (doc_id, text)). The query encoder
    is the pseudo-embedding stub (operators/semantic.py) and the pair
    scorer defaults to the deterministic stub
    (operators/pair_scorer.py) — swap either for a real model."""
    spark = index.postings.sparkSession
    if query_type in (QueryType.CONJUNCTIVE, QueryType.DISJUNCTIVE):
        return bm25_search(
            index, queries, conjunctive=query_type == QueryType.CONJUNCTIVE, k=k
        )
    if embeddings is None:
        raise ValueError("SEMANTIC/RERANKING need the doc-embedding table")
    dim = len(embeddings.select("embedding").first()["embedding"])
    qv = _query_vecs(spark, queries, dim)
    if query_type == QueryType.SEMANTIC:
        return sem.semantic_topk(embeddings, qv, k=k)
    if doc_texts is None:
        raise ValueError(
            "RERANKING needs doc_texts (doc_id, text) — the cross-encoder "
            "scores (query, doc_body) pairs (main.cpp:785-799)"
        )
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    return sem.rerank(
        doc_texts, embeddings, qv, qdf,
        k=k, candidates_k=rerank_candidates, scorer=pair_scorer,
    )
