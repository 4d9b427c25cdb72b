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
    doc_texts = spark.createDataFrame(
        [(i, t) for (_, i, _, t, _) in rows], "doc_id long, text string"
    )
    return index, emb, queries, doc_texts


def test_bm25_modes_match_direct_search(setup):
    index, emb, queries, _ = setup
    api = search_api(index, queries, QueryType.CONJUNCTIVE, k=5).collect()
    direct = search(index, queries, conjunctive=True, k=5).collect()
    assert sorted(map(tuple, api)) == sorted(map(tuple, direct))
    disj = search_api(index, queries, QueryType.DISJUNCTIVE, k=5).collect()
    assert len(disj) >= len(api)


def test_semantic_mode(setup):
    index, emb, queries, _ = setup
    out = search_api(index, queries, QueryType.SEMANTIC, k=3, embeddings=emb).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert all(-1.0 <= r["cosine"] <= 1.0 for r in rs)


def test_rerank_mode_is_semantic_candidates_pair_scored(setup):
    """The reference's RERANKING (main.cpp:772-806): candidates come from
    SEMANTIC search — NOT BM25 — and are re-scored by the cross-encoder
    pair seam over the doc bodies, sorted by the pair score only."""
    from websearchengine_spark.operators.pair_scorer import stub_pair_score

    index, emb, queries, doc_texts = setup
    texts = {r["doc_id"]: r["text"] for r in doc_texts.collect()}
    rr = search_api(
        index, queries, QueryType.RERANKING, k=10,
        embeddings=emb, doc_texts=doc_texts,
    ).collect()
    assert rr, "rerank produced no rows"
    per_q = {}
    for r in rr:
        per_q.setdefault(r["query_id"], []).append(r)
    qtext = dict(queries)
    for qid, rs in per_q.items():
        # every semantic candidate survives (5 docs < candidates_k=32) —
        # including docs with ZERO BM25 conjunctive matches (the
        # architecture point: a no-BM25-match query still reranks)
        assert {r["doc_id"] for r in rs} == set(texts)
        rs.sort(key=lambda r: r["rank"])
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:  # scores are the stub pair scores on (raw q, body)
            assert r["score"] == round(
                stub_pair_score(qtext[qid], texts[r["doc_id"]]), 6
            )


def test_rerank_pair_scorer_model_swap(setup):
    """Any CrossEncoder-shaped object (predict over (query, text) pairs)
    drops into the rerank seam without touching the plan."""
    index, emb, queries, doc_texts = setup

    class DummyCE:
        def predict(self, pairs):
            return [float(len(t)) for _, t in pairs]

    rr = search_api(
        index, [queries[0]], QueryType.RERANKING, k=3,
        embeddings=emb, doc_texts=doc_texts, pair_scorer=DummyCE(),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in doc_texts.collect()}
    assert len(rr) == 3
    rr.sort(key=lambda r: r["rank"])
    assert rr[0]["score"] == max(float(len(t)) for t in texts.values())
    lens = [r["score"] for r in rr]
    assert lens == sorted(lens, reverse=True)


def test_semantic_requires_embeddings(setup):
    index, emb, queries, _ = setup
    with pytest.raises(ValueError):
        search_api(index, queries, QueryType.SEMANTIC)
    with pytest.raises(ValueError):
        search_api(index, queries, QueryType.RERANKING, embeddings=emb)


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


def test_serving_engine_dispatch(spark, tmp_path_factory):
    """ServingEngine = the reference's Searcher family behind one object:
    all four QueryTypes through the no-Spark serving stack. SEMANTIC /
    RERANKING follow TransformerSearcher + the base-class assembly
    (main.cpp:465-553, 744-831): candidates from semantic search, count =
    total ranked size, snippets from the doc bodies, no-term items
    dropped (data empty → count forced 0), caches keyed by RAW query."""
    from websearchengine_spark.operators.query_api import QueryType
    from websearchengine_spark.operators.serving import ServingEngine
    from websearchengine_spark.plans.block_index import build_block_index

    base = tmp_path_factory.mktemp("serving_engine")
    n_docs = 40
    rows = [
        ("c", i, "user", f"data term{i} alpha{i % 7} filler{i % 3}", None)
        for i in range(n_docs)
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    tpath = str(base / "transcripts")
    tdf.write.parquet(tpath)
    idx = str(base / "idx")
    build_block_index(spark.read.parquet(tpath), idx, resume=False,
                      n_buckets=4, num_partitions=4)
    # embeddings aligned with the index's dense docIDs (single conv →
    # doc_id = turn_idx)
    from websearchengine_spark.operators.semantic import pseudo_embedding

    emb_path = str(base / "embeddings.parquet")
    tdf.select(
        F.col("turn_idx").cast("long").alias("vec_id"),
        pseudo_embedding(F.col("text"), dim=8).cast("array<float>").alias("embedding"),
    ).coalesce(1).write.parquet(emb_path)
    eng = ServingEngine(idx, transcripts_path=tpath, embeddings_path=emb_path)

    bm = eng.search("data", QueryType.CONJUNCTIVE, n_results=3)
    assert bm["count"] > 3 and len(bm["data"]) == 3 and bm["data"][0]["freqs"]
    assert eng.search("data", QueryType.CONJUNCTIVE, n_results=3)["cached"]

    disj = eng.search("data nosuchword", QueryType.DISJUNCTIVE, n_results=2)
    assert disj["count"] > 0  # OOV skipped, not empty

    sem = eng.search("data alpha3", QueryType.SEMANTIC, n_results=4)
    # count = TOTAL ranked size (the full 32-candidate list), not the page
    assert sem["count"] == 32
    # every body contains "data" → no drops → a full page
    assert len(sem["data"]) == 4 and "freqs" not in sem["data"][0]
    assert "snippet" in sem["data"][0] and sem["data"][0]["conv_id"] == "c"
    assert eng.search("data alpha3", QueryType.SEMANTIC, n_results=4)["cached"]
    # full candidate list is cached — a different page size is still a hit
    assert eng.search("data alpha3", QueryType.SEMANTIC, n_results=7)["cached"]

    rr = eng.search("data term5", QueryType.RERANKING, n_results=3)
    assert rr["count"] == 32
    assert len(rr["data"]) == 3 and rr["data"][0]["rank"] == 1
    rr_scores = [it["score"] for it in rr["data"]]
    assert rr_scores == sorted(rr_scores, reverse=True)
    # separate per-QueryType caches (main.cpp:744-751): same raw query,
    # other type → miss; same type → hit
    assert not eng.search("data term5", QueryType.SEMANTIC, n_results=3)["cached"]
    assert eng.search("data term5", QueryType.RERANKING, n_results=5)["cached"]

    # no query term in any candidate body → every item dropped → data
    # empty and count forced to 0 (main.cpp:548-550)
    none = eng.search("zzzqqq", QueryType.SEMANTIC, n_results=3)
    assert none["count"] == 0 and none["data"] == []


def test_model_seams_end_to_end_with_toy_numpy_models(spark, tmp_path_factory):
    """VERDICT r3 #6: drive BOTH model seams — encode_texts_udf(model=...)
    and score_pairs_udf(model) — with non-stub numpy models end-to-end
    (semantic_topk + rerank DataFrame plans, SemanticService, ServingEngine),
    asserting (a) the physical plans are unchanged by the injection (same
    pandas-UDF/exchange shape as the stub), (b) outputs follow the injected
    models, (c) serving is rank- and score-identical to the Spark plans
    under the SAME injected models."""
    import numpy as np

    from websearchengine_spark.operators.query_api import QueryType
    from websearchengine_spark.operators.semantic import (
        encode_texts_udf, rerank, semantic_topk,
    )
    from websearchengine_spark.operators.semantic_service import SemanticService
    from websearchengine_spark.operators.serving import ServingEngine
    from websearchengine_spark.plans.block_index import build_block_index

    # defined in-function so cloudpickle ships them by VALUE to executors
    # (a real model object is shipped the same way)
    class ToyEncoder:
        """Deterministic numpy bi-encoder with the sentence-transformers
        shape: encode(list[str]) -> ndarray [n, 8]. Component p of text t
        is a weighted char-sum residue mod the p-th prime."""

        _PRIMES = (97, 89, 83, 79, 73, 71, 67, 61)

        def encode(self, texts):
            out = np.empty((len(texts), 8), dtype=np.float64)
            for i, t in enumerate(texts):
                s = sum((j + 1) * ord(c) for j, c in enumerate(t))
                out[i] = [(s % p) / p for p in self._PRIMES]
            return out

    class ToyCrossEncoder:
        """Deterministic numpy cross-encoder: predict(pairs) -> ndarray."""

        def predict(self, pairs):
            return np.array(
                [
                    ((len(q) * 31 + sum(ord(c) for c in t)) % 1001 - 500)
                    / 500.0
                    for q, t in pairs
                ],
                dtype=np.float64,
            )

    base = tmp_path_factory.mktemp("toy_model_seams")
    encoder, ce = ToyEncoder(), ToyCrossEncoder()
    n_docs = 40
    rows = [
        ("c", i, "user", f"data term{i} alpha{i % 7} filler{i % 3}", None)
        for i in range(n_docs)
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())

    # doc embeddings COME FROM the injected encoder via the UDF seam
    emb_path = str(base / "emb.parquet")
    enc_udf = encode_texts_udf(model=encoder)
    tdf.select(
        F.col("turn_idx").cast("long").alias("vec_id"),
        enc_udf(F.col("text")).cast("array<float>").alias("embedding"),
    ).coalesce(1).write.parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    # UDF output == model.encode verbatim (the seam adds nothing)
    got_v = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    exp_v = encoder.encode([r[3] for r in rows]).astype(np.float32)
    for i in range(n_docs):
        assert got_v[i] == pytest.approx(list(exp_v[i]), abs=0)

    query = "data term5"
    qdf = spark.createDataFrame([(0, query)], "query_id long, query string")
    qv = qdf.select("query_id", enc_udf(F.col("query")).alias("qv"))
    doc_texts = tdf.select(
        F.col("turn_idx").cast("long").alias("doc_id"), "text"
    )

    # (a) plan shape is invariant under model injection
    stub_qv = qdf.select(
        "query_id", encode_texts_udf(dim=8)(F.col("query")).alias("qv")
    )
    for injected, stub in (
        (semantic_topk(emb, qv, k=10), semantic_topk(emb, stub_qv, k=10)),
        (
            rerank(doc_texts, emb, qv, qdf, k=10, candidates_k=12, scorer=ce),
            rerank(doc_texts, emb, stub_qv, qdf, k=10, candidates_k=12),
        ),
    ):
        pi = injected._jdf.queryExecution().executedPlan().toString()
        ps = stub._jdf.queryExecution().executedPlan().toString()
        for marker in ("ArrowEvalPython", "Exchange", "SortMergeJoin"):
            assert pi.count(marker) == ps.count(marker), marker

    # (b)+(c): Spark plans == no-Spark service under the same models
    svc = SemanticService(emb_path, encoder=encoder)
    sem_spark = [
        (r["rank"], r["doc_id"], r["cosine"])
        for r in semantic_topk(emb, qv, k=12).orderBy("rank").collect()
    ]
    assert sem_spark == svc.search(query, k=12)

    texts = {r["doc_id"]: r["text"] for r in doc_texts.collect()}
    rr_spark = [
        (r["rank"], r["doc_id"], r["score"])
        for r in rerank(doc_texts, emb, qv, qdf, k=8, candidates_k=12, scorer=ce)
        .orderBy("rank").collect()
    ]
    rr_svc = svc.rerank(
        query, texts_for=lambda ids: {d: texts[d] for d in ids},
        k=8, candidates_k=12, scorer=ce,
    )
    assert rr_spark == rr_svc
    # scores follow the injected CE verbatim
    for _, d, s in rr_svc:
        assert s == round(float(ce.predict([(query, texts[d])])[0]), 6)

    # ServingEngine with both models injected serves the same rankings
    tpath = str(base / "transcripts")
    tdf.write.parquet(tpath)
    idx = str(base / "idx")
    build_block_index(spark.read.parquet(tpath), idx, resume=False,
                      n_buckets=4, num_partitions=4)
    eng = ServingEngine(
        idx, transcripts_path=tpath, embeddings_path=emb_path,
        encoder=encoder, pair_scorer=ce, candidates_k=12,
    )
    sem_served = eng.search(query, QueryType.SEMANTIC, n_results=12)
    assert [(it["rank"], it["score"]) for it in sem_served["data"]] == [
        (r, s) for r, _, s in sem_spark[: len(sem_served["data"])]
    ]
    rr_served = eng.search(query, QueryType.RERANKING, n_results=8)
    assert [(it["rank"], it["score"]) for it in rr_served["data"]] == [
        (r, s) for r, _, s in rr_spark[: len(rr_served["data"])]
    ]


def test_serving_rerank_matches_dataframe_plan(spark, tmp_path_factory):
    """Serving RERANKING must be rank- and score-identical to the
    DataFrame plan (operators/semantic.rerank) on the same corpus."""
    from websearchengine_spark.operators.semantic import (
        encode_texts_udf, pseudo_embedding, rerank,
    )
    from websearchengine_spark.operators.semantic_service import SemanticService

    base = tmp_path_factory.mktemp("serving_rerank_parity")
    docs = spark.createDataFrame(
        [(i, f"body word{i} shared{i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    emb_path = str(base / "emb.parquet")
    docs.select(
        F.col("doc_id").alias("vec_id"),
        pseudo_embedding(F.col("text"), dim=8).cast("array<float>").alias("embedding"),
    ).coalesce(1).write.parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    query = "shared2 word7"
    qdf = spark.createDataFrame([(0, query)], "query_id long, query string")
    qv = qdf.select(
        "query_id", encode_texts_udf(dim=8)(F.col("query")).alias("qv")
    )
    expected = [
        (r["rank"], r["doc_id"], r["score"])
        for r in rerank(docs, emb, qv, qdf, k=8, candidates_k=12)
        .orderBy("rank").collect()
    ]
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    svc = SemanticService(emb_path)
    got = svc.rerank(
        query, texts_for=lambda ids: {d: texts[d] for d in ids},
        k=8, candidates_k=12,
    )
    assert got == expected


def test_serving_engine_close_releases_pool(spark, tmp_path_factory):
    """ServingEngine lifecycle: the engine owns the reader's parallel-decode
    pool, so `with ServingEngine(...)` / .close() must terminate the forked
    workers (daemonic pool children only die with the PROCESS — a long-lived
    caller constructing engines repeatedly would otherwise accumulate
    workers for its whole lifetime). close() is idempotent and a no-op for
    parallel_workers=0 engines."""
    from websearchengine_spark.operators.query_api import QueryType
    from websearchengine_spark.operators.serving import ServingEngine
    from websearchengine_spark.plans.block_index import build_block_index

    base = tmp_path_factory.mktemp("serving_close")
    tdf = spark.createDataFrame(
        [("c", i, "user", f"data term{i}", None) for i in range(30)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    idx = str(base / "idx")
    build_block_index(tdf, idx, resume=False, n_buckets=2, num_partitions=2)

    with ServingEngine(idx, parallel_workers=2) as eng:
        eng.reader.parallel_df_threshold = 0  # force the pool to engage
        res = eng.search("data", QueryType.CONJUNCTIVE, n_results=5)
        assert res["count"] > 0 and eng.reader.last_parallel
        workers = list(eng.reader._pool._pool)  # noqa: SLF001 — pin liveness
        assert workers and all(w.is_alive() for w in workers)
    # __exit__ → close(): pool gone, workers dead
    assert eng.reader._pool is None
    for w in workers:
        w.join(timeout=10)
    assert not any(w.is_alive() for w in workers)
    # repeat query after close: served from the C1 result cache, decodes
    # nothing (last_parallel reset False on the hit)
    assert eng.search("data", QueryType.CONJUNCTIVE, n_results=5)["cached"]
    assert not eng.reader.last_parallel
    # a NEW dense query lazily re-forks — close-then-reuse recreates the
    # pool rather than failing; a second close() releases it again
    assert eng.search("term3", QueryType.CONJUNCTIVE, n_results=5)["count"] > 0
    assert eng.reader.last_parallel and eng.reader._pool is not None
    eng.close()
    assert eng.reader._pool is None
    eng.close()  # idempotent

    plain = ServingEngine(idx)  # parallel_workers=0: nothing to release
    plain.close()
