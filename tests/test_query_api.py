"""Unified query-API dispatch (all four reference QueryTypes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators.query import search
from websearchengine_spark.operators.query_api import QueryType, search_api
from websearchengine_spark.plans.build import build_logical_index


@pytest.fixture(scope="module")
def setup(spark):
    rows = [
        ("c", i, "user", t, None)
        for i, t in enumerate(
            [
                "spark shuffles data across the cluster",
                "the quick fox jumps over spark",
                "data pipelines need dedup and quality checks",
                "spark data processing at scale",
                "irrelevant text about cooking pasta",
            ]
        )
    ]
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    index = build_logical_index(transcripts, num_partitions=2)
    import numpy as np

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    queries = [(0, "spark data"), (1, "quick fox")]
    return index, emb, queries


def test_bm25_modes_match_direct_search(setup):
    index, emb, queries = setup
    api = search_api(index, queries, QueryType.CONJUNCTIVE, k=5).collect()
    direct = search(index, queries, conjunctive=True, k=5).collect()
    assert sorted(map(tuple, api)) == sorted(map(tuple, direct))
    disj = search_api(index, queries, QueryType.DISJUNCTIVE, k=5).collect()
    assert len(disj) >= len(api)


def test_semantic_mode(setup):
    index, emb, queries = setup
    out = search_api(index, queries, QueryType.SEMANTIC, k=3, embeddings=emb).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert all(-1.0 <= r["cosine"] <= 1.0 for r in rs)


def test_rerank_mode_is_bm25_candidates_reordered(setup):
    index, emb, queries = setup
    cands = {
        (r["query_id"], r["doc_id"])
        for r in search(index, queries, conjunctive=True, k=100).collect()
    }
    rr = search_api(
        index, queries, QueryType.RERANKING, k=10, embeddings=emb
    ).collect()
    assert rr, "rerank produced no rows"
    assert all((r["query_id"], r["doc_id"]) in cands for r in rr)
    # ranked by cosine desc within each query
    per_q = {}
    for r in rr:
        per_q.setdefault(r["query_id"], []).append(r)
    for rs in per_q.values():
        rs.sort(key=lambda r: r["rank"])
        cos = [r["cosine"] for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_semantic_requires_embeddings(setup):
    index, emb, queries = setup
    with pytest.raises(ValueError):
        search_api(index, queries, QueryType.SEMANTIC)


def test_encode_texts_udf_matches_pseudo_embedding(spark):
    """The encoder seam's default impl must emit EXACTLY the column-expr
    pseudo-embedding values (what the q2/q3 SQL oracles mirror)."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import semantic as sem

    df = spark.createDataFrame(
        [(0, "spark query"), (1, ""), (2, "the data")], "id long, text string"
    )
    enc = sem.encode_texts_udf(dim=8)
    got = {r["id"]: r["u"] for r in df.select("id", enc("text").alias("u")).collect()}
    exp = {
        r["id"]: r["p"]
        for r in df.select(
            "id", sem.pseudo_embedding(F.col("text"), dim=8).alias("p")
        ).collect()
    }
    assert got == exp


def test_encode_texts_udf_model_swap(spark):
    """Any object with the sentence-transformers encode(list[str]) shape
    drops into the seam without touching plans."""
    from websearchengine_spark.operators import semantic as sem

    class DummyModel:
        def encode(self, texts):
            return [[float(len(t)), 1.0] for t in texts]

    df = spark.createDataFrame([(0, "ab"), (1, "abcd")], "id long, text string")
    enc = sem.encode_texts_udf(model=DummyModel())
    got = {r["id"]: r["u"] for r in df.select("id", enc("text").alias("u")).collect()}
    assert got == {0: [2.0, 1.0], 1: [4.0, 1.0]}


def test_serving_engine_dispatch(spark, fixture, tmp_path_factory):
    """ServingEngine = the reference's Searcher family behind one object:
    all four QueryTypes through the no-Spark serving stack, result shapes
    consistent with search_full / SemanticService."""
    import os

    from websearchengine_spark.operators.query_api import QueryType
    from websearchengine_spark.operators.serving import ServingEngine
    from websearchengine_spark.plans.block_index import build_block_index

    base = tmp_path_factory.mktemp("serving_engine")
    tdf = spark.createDataFrame(fixture.transcripts)
    tpath = str(base / "transcripts")
    tdf.write.parquet(tpath)
    idx = str(base / "idx")
    build_block_index(spark.read.parquet(tpath), idx, resume=False,
                      n_buckets=4, num_partitions=4)
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    eng = ServingEngine(idx, transcripts_path=tpath, embeddings_path=emb_path)

    bm = eng.search("the data", QueryType.CONJUNCTIVE, n_results=3)
    assert bm["count"] > 3 and len(bm["data"]) == 3 and bm["data"][0]["freqs"]
    assert eng.search("the data", QueryType.CONJUNCTIVE, n_results=3)["cached"]

    disj = eng.search("the nosuchword", QueryType.DISJUNCTIVE, n_results=2)
    assert disj["count"] > 0  # OOV skipped, not empty

    sem = eng.search("spark query", QueryType.SEMANTIC, n_results=4)
    assert len(sem["data"]) == 4 and "freqs" not in sem["data"][0]
    assert sem["count"] == 4
    assert eng.search("spark query", QueryType.SEMANTIC, n_results=4)["cached"]

    rr = eng.search("the data", QueryType.RERANKING, n_results=3)
    assert len(rr["data"]) == 3 and rr["data"][0]["rank"] == 1
