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
- :func:`rerank` — the reference's ACTUAL two-stage shape
  (main.cpp:772-806 + learning_to_rank.py): candidates from SEMANTIC
  search (bi-encoder top-32, learning_to_rank.py:10), re-scored by a
  cross-encoder over (query, doc_text) pairs through the
  operators/pair_scorer seam, sorted by the pair score only (stable —
  ties keep semantic order, learning_to_rank.py:27).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.hashing import h60
from websearchengine_spark.pipeline.similarity import cosine_col


def hash_encode_batch(texts, dim: int = 64):
    """Vectorized deterministic hash encoder. Component j of text t:

        block b = j // 8, lane l = j % 8
        comp = (uint16_be(md5(f"{t}#{b}").digest()[2l : 2l+2]) % 2001
                − 1000) / 1000                            ∈ [−1, 1]

    i.e. ONE md5 per 8 components (each 128-bit digest yields eight
    16-bit lanes) instead of one md5 per component. The %2001 of a 16-bit
    lane carries a ~3% modulo bias — irrelevant for a stand-in encoder.
    Identical in Spark/DuckDB as ('0x' || substr(md5(t||'#'||b), 1+4l,
    4))::BIGINT — a 4-hex-char substring IS the big-endian uint16.

    Speed (10k × 190-char texts, one thread): ~0.08 s vs 0.92 s for the
    round-2 per-component encoder (~11×). Two devices: the md5 state of
    ``t + '#'`` is hashed once and ``copy()``-ed per block (md5 is
    streaming, so state-copy + update(suffix) == one-shot md5 of the
    concatenation), and the digest→component arithmetic is a single numpy
    pass over the concatenated digests. Returns list[list[float]]."""
    import numpy as np

    n_blocks = (dim + 7) // 8
    suffixes = [str(b).encode("ascii") for b in range(n_blocks)]
    chunks = []
    for t in texts:
        base = hashlib.md5(t.encode("utf-8") + b"#")
        for suf in suffixes:
            h = base.copy()
            h.update(suf)
            chunks.append(h.digest())
    if not chunks:
        return []
    lanes = np.frombuffer(b"".join(chunks), dtype=">u2").astype(np.int64)
    comps = (lanes % 2001 - 1000) / 1000.0
    return comps.reshape(len(texts), n_blocks * 8)[:, :dim].tolist()


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
        return pd.Series(hash_encode_batch(filled, dim), index=texts.index)

    return pandas_udf(_encode, ArrayType(DoubleType()))


def pseudo_embedding(text_col: Column, dim: int = 64) -> Column:
    """Deterministic stand-in encoder for environments without a model —
    the column-expression twin of :func:`hash_encode_batch` (same md5
    block/lane scheme, bit-identical values). SQL-expressible (same
    arithmetic in DuckDB), so gates can check the full dataflow
    end-to-end."""
    blocks = [
        F.md5(F.concat_ws("#", text_col, F.lit(str(b))))
        for b in range((dim + 7) // 8)
    ]
    comps = []
    for j in range(dim):
        b, lane = divmod(j, 8)
        chunk = F.conv(F.substring(blocks[b], 1 + 4 * lane, 4), 16, 10).cast("long")
        comps.append(((chunk % 2001 - 1000) / F.lit(1000.0)).cast("double"))
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
    doc_texts: DataFrame,
    embeddings: DataFrame,
    query_vecs: DataFrame,
    query_texts: DataFrame,
    k: int = 10,
    candidates_k: int = 32,
    scorer=None,
) -> DataFrame:
    """The reference's RERANKING pipeline (main.cpp:772-806):

    1. candidates = SEMANTIC top-``candidates_k`` (bi-encoder cosine;
       top_k=32, learning_to_rank.py:10) — NOT BM25;
    2. build (query, doc_text) pairs from the doc bodies
       (main.cpp:785-799 read_doc) — ``doc_texts`` is (doc_id, text, ...);
    3. score pairs through the cross-encoder seam
       (operators/pair_scorer.score_pairs_udf; learning_to_rank.py:23-27),
       one model.predict per Arrow batch;
    4. sort by the pair score only, DESC (learning_to_rank.py:27). The
       reference's Python sort is stable, so ties keep the semantic
       candidate order — mirrored as (score DESC, sem_rank ASC).

    ``query_texts``: (query_id, query) raw query strings — the reference
    passes the RAW query into the pairs (main.cpp:777, 793). Returns
    (query_id, rank, doc_id, score)."""
    from websearchengine_spark.operators.pair_scorer import score_pairs_udf

    cands = semantic_topk(embeddings, query_vecs, k=candidates_k).withColumnRenamed(
        "rank", "sem_rank"
    )
    # candidates are tiny (candidates_k × n_queries) — broadcast them so
    # the doc-text fetch is a broadcast semi-join against the (huge at
    # scale) document table, never a shuffle of doc bodies
    scored = (
        doc_texts.select("doc_id", "text")
        .join(F.broadcast(cands), "doc_id")
        .join(F.broadcast(query_texts.select("query_id", "query")), "query_id")
        .withColumn(
            "score",
            F.round(score_pairs_udf(scorer)(F.col("query"), F.col("text")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("sem_rank"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
