"""Physical-plan audits: the properties that make these plans survive a
100× scale-up are asserted, not assumed — broadcast joins on small sides,
parquet filter pushdown, and no accidental cartesian products."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_exhaustive_search_broadcasts_query_side(spark_index, spark):
    from websearchengine_spark.operators.query import search

    plan = explain_str(search(spark_index, [(0, "the data")], conjunctive=True, k=10))
    assert "BroadcastHashJoin" in plan      # query terms ⋈ postings
    assert "CartesianProduct" not in plan


def test_parquet_filter_pushdown_on_transcripts(spark, fixture, tmp_path):
    tdf = spark.createDataFrame(fixture.transcripts)
    p = str(tmp_path / "t")
    tdf.write.parquet(p)
    q = spark.read.parquet(p).filter(F.col("conv_id") == "conv000001").select(
        "conv_id", "turn_idx"
    )
    plan = explain_str(q)
    # the predicate must reach the scan, and the scan must read only the
    # projected columns (column pruning)
    assert "PushedFilters" in plan and "conv_id" in plan.split("PushedFilters", 1)[1]
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "text" not in read_schema


def test_semantic_topk_is_broadcast_not_cartesian(spark, fixture):
    from websearchengine_spark.operators.semantic import semantic_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    qv = spark.createDataFrame(
        [(0, [1.0, 0.5])], "query_id long, qv array<double>"
    )
    plan = explain_str(semantic_topk(emb, qv, k=5))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_salt_factors_join_not_literal_map(spark, fixture):
    """The hot-term salt ride-along must be a broadcast JOIN — a
    create_map literal of the hot set becomes a multi-million-node
    Catalyst expression at real vocabulary sizes."""
    from websearchengine_spark.plans.build import build_logical_index

    tdf = spark.createDataFrame(fixture.transcripts)
    idx = build_logical_index(tdf, num_partitions=4)
    # reproduce the build's salted-postings plan shape
    hot = idx.lexicon.filter(F.col("df") > 0).select(
        "term", F.ceil(F.col("df") / F.lit(2)).cast("int").alias("n_salt")
    )
    salted = idx.postings.join(F.broadcast(hot), "term", "left").withColumn(
        "salt", (F.col("doc_id") * F.coalesce(F.col("n_salt"), F.lit(1))).cast("int")
    )
    plan = explain_str(salted)
    assert "BroadcastHashJoin" in plan
    assert "map_keys" not in plan and "keys: [" not in plan
    idx.release()


def test_minhash_band_join_keys_are_uniform_hash(spark):
    """The LSH candidate self-join must shuffle on the band hash key (a
    uniform 60-bit hash) — never on raw document content."""
    from websearchengine_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(6)],
        "doc_id long, text string",
    )
    plan = explain_str(minhash_lsh_pairs(docs))
    assert "band_key" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle-hash set must broadcast (it is an eval suite,
    tiny next to the corpus) and the training-side scan must stay
    cartesian-free."""
    from websearchengine_spark.pipeline.dedup import decontaminate

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i}") for i in range(8)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    plan = explain_str(decontaminate(docs, bench, k=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_domain_mix_is_broadcast_rate_join(spark):
    """Domain mixture sampling = one narrow filter + a broadcast join of
    the (domain, rate) table; the corpus must not shuffle."""
    from websearchengine_spark.pipeline.curate import domain_mix

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", f"text {i}") for i in range(9)],
        "doc_id long, source string, text string",
    )
    plan = explain_str(domain_mix(docs, {"src0": 1000, "src1": 500}))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # no exchange on the corpus side: the only shuffle-free wide op allowed
    # is the broadcast exchange itself
    assert plan.count("Exchange") == plan.count("BroadcastExchange")
