"""Semantic search + reranking plane (reference QueryType SEMANTIC=2 and
RERANKING=3, main.cpp:234-236; learning_to_rank.py; eval notebooks).

The reference encodes queries/documents with sentence-transformers
(bi-encoder for retrieval, cross-encoder for rerank) — models that are not
in this container. The Spark-side dataflow is the real deliverable and is
identical whatever produces the vectors:

- a doc-embedding table `(vec_id = doc_id, embedding array<float>)` — the
  analogue of the reference's `corpus_embeddings.pt` [n_docs × d] tensor
  plus its corpus_id→doc_id remap (main.cpp:714-719);
- :func:`encode_query` — the encoder seam. STUB: deterministic lookup of a
  vector by id (tests/gates) or a h60-seeded pseudo-embedding for raw text;
  swap in a real model here (pandas UDF batching) without touching plans;
- :func:`semantic_topk` — dense retrieval: cosine against every doc
  (brute force; the reference's torch.topk over corpus chunks) — the
  LSH-bucketed ANN scale path is pipeline/similarity.ann_lsh_topk;
- :func:`rerank` — candidate generation by BM25 → re-score candidates by
  embedding cosine, exactly the reference's two-stage shape
  (learning_to_rank.py:18-27: BM25 top-n → cross-encoder → sort desc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.hashing import h60
from websearchengine_spark.pipeline.similarity import cosine_col


def encode_texts_udf(dim: int = 64, model=None):
    """The batched encoder seam as a REAL pandas UDF — drop a model in
    without touching any plan (the reference's C++↔Python boundary,
    main.cpp:727-742 + learning_to_rank.py:15-18, where
    SentenceTransformer.encode takes a batch of strings).

    ``model``: any object with ``encode(list[str]) -> sequence of float
    vectors`` (the sentence-transformers shape; models are not in this
    container, so the default is the deterministic hash encoder, which
    produces EXACTLY the :func:`pseudo_embedding` column values — the q2/q3
    gates therefore verify this UDF end-to-end against the SQL oracle).
    Batching: one UDF call per Arrow batch — a GPU model amortizes its
    batch overhead exactly as the reference's batch-224 encoding does."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    def _encode(texts):  # Series[str] -> Series[list[float]]
        filled = texts.fillna("")
        if model is not None:
            vecs = model.encode(list(filled))
            return pd.Series(
                [[float(x) for x in v] for v in vecs], index=texts.index
            )
        out = []
        for t in filled:
            out.append(
                [
                    (
                        int(hashlib.md5(f"{t}#{j}".encode("utf-8")).hexdigest()[:15], 16)
                        % 2001
                        - 1000
                    )
                    / 1000.0
                    for j in range(dim)
                ]
            )
        return pd.Series(out, index=texts.index)

    return pandas_udf(_encode, ArrayType(DoubleType()))


def pseudo_embedding(text_col: Column, dim: int = 64) -> Column:
    """Deterministic stand-in encoder for environments without a model:
    component j = (h60(text || '#' || j) % 2001 − 1000) / 1000 ∈ [−1, 1].
    SQL-expressible (same arithmetic in DuckDB), so gates can check the
    full dataflow end-to-end."""
    comps = [
        (
            (h60(F.concat_ws("#", text_col, F.lit(str(j)))) % 2001 - 1000)
            / F.lit(1000.0)
        ).cast("double")
        for j in range(dim)
    ]
    return F.array(*comps)


def doc_vectors(embeddings: DataFrame) -> DataFrame:
    """(doc_id, v: array<double>) from the embeddings table (vec_id is the
    dense docID — the corpus_id→doc_id remap collapsed)."""
    return embeddings.select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def semantic_topk(
    embeddings: DataFrame, query_vecs: DataFrame, k: int = 10
) -> DataFrame:
    """Dense retrieval: per query vector, cosine top-k over all docs.
    query_vecs: (query_id, qv array<double>). → (query_id, rank, doc_id,
    cosine) ranked by (ROUND(cosine,6) DESC, doc_id ASC)."""
    docs = doc_vectors(embeddings)
    scored = (
        F.broadcast(query_vecs)
        .crossJoin(docs)
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cosine")
    )


def rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    query_vecs: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval: BM25 candidates (query_id, doc_id[, score]) →
    embedding-cosine re-score → top-k by (ROUND(cosine,6) DESC, doc_id ASC)
    (learning_to_rank.py:27 sorts by the reranker score only)."""
    docs = doc_vectors(embeddings)
    scored = (
        candidates.select("query_id", "doc_id")
        .join(docs, "doc_id")
        .join(F.broadcast(query_vecs), "query_id")
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cosine")
    )
