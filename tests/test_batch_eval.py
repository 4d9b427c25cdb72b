"""Distributed batch evaluation (operators/batch_eval.py): the mapInPandas
executor-local-reader path must be result-identical to driver-side
BlockIndexReader.search and produce the same MRR as the driver loop
(reference evaluation.cpp semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators.batch_eval import batch_mrr, batch_search
from websearchengine_spark.operators.wand import BlockIndexReader
from websearchengine_spark.plans.block_index import build_block_index


@pytest.fixture(scope="module")
def index_dir(spark, fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("batcheval_idx"))
    tdf = spark.createDataFrame(fixture.transcripts)
    build_block_index(
        tdf, out, n_buckets=8, block_size=16, build_id="be1",
        num_partitions=8, hot_df_threshold=200, target_group_size=150,
    )
    return out


@pytest.fixture(scope="module")
def queries_df(spark, fixture):
    rows = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    return spark.createDataFrame(rows, "query_id long, query string"), rows


@pytest.mark.parametrize("conjunctive", [True, False], ids=["conj", "disj"])
def test_batch_search_matches_driver_reader(
    spark, index_dir, queries_df, conjunctive
):
    qdf, rows = queries_df
    got = (
        batch_search(qdf, index_dir, conjunctive=conjunctive, k=10,
                     num_partitions=4)
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    reader = BlockIndexReader(index_dir)
    for qid, q in rows:
        exp = reader.search(q, conjunctive=conjunctive, k=10)
        act = sorted(by_q.get(qid, []))
        assert [(r, d) for r, d, _ in act] == [(r, d) for r, d, _ in exp], (qid, q)
        for (_, _, es), (_, _, asc) in zip(exp, act):
            assert math.isclose(es, asc, rel_tol=1e-12)


def test_batch_mrr_matches_driver_loop(spark, index_dir, queries_df):
    qdf, rows = queries_df
    # qrels: the min docID of each query's conjunctive top-20 (varied ranks)
    top20 = batch_search(qdf, index_dir, conjunctive=True, k=20,
                         num_partitions=4)
    qrels_df = top20.groupBy("query_id").agg(F.min("doc_id").alias("rel_doc"))
    qrels = {r["query_id"]: r["rel_doc"] for r in qrels_df.collect()}

    row = batch_mrr(qdf, qrels_df, index_dir, n=10).collect()[0]
    reader = BlockIndexReader(index_dir)
    expected = reader.mrr_at([(q, t) for q, t in rows if q in qrels], qrels, n=10)
    assert row["n_queries"] == len(qrels)
    assert math.isclose(row["mrr"], round(expected, 6), abs_tol=1.5e-6)


def test_batch_mrr_denominator_matches_driver_loop_on_misaligned_qrels(
    spark, index_dir, queries_df
):
    """A qrels query_id absent from queries.tsv must be SKIPPED, not
    counted as rr=0 (ADVICE r2: evaluation.cpp loops over queries and
    skips ids without a qrel; reader.mrr_at does the same)."""
    qdf, rows = queries_df
    top20 = batch_search(qdf, index_dir, conjunctive=True, k=20,
                         num_partitions=4)
    qrels_df = top20.groupBy("query_id").agg(F.min("doc_id").alias("rel_doc"))
    # inject qrels rows for query ids that are NOT in queries
    phantom = spark.createDataFrame(
        [(999901, 0), (999902, 1)], "query_id long, rel_doc long"
    )
    qrels = {r["query_id"]: r["rel_doc"] for r in qrels_df.collect()}
    row = batch_mrr(
        qdf, qrels_df.union(phantom), index_dir, n=10
    ).collect()[0]
    reader = BlockIndexReader(index_dir)
    expected = reader.mrr_at([(q, t) for q, t in rows if q in qrels], qrels, n=10)
    assert row["n_queries"] == len(qrels)  # phantoms excluded
    assert math.isclose(row["mrr"], round(expected, 6), abs_tol=1.5e-6)


def test_batch_mrr_production_twin(spark, index_dir, queries_df):
    """VERDICT r3 #5: the production (exact=False) mean is plain F.sum with
    map-side partial aggregation — no collect_list in the plan — and equals
    the ordered-fold exact twin to 6 decimals."""
    qdf, _rows = queries_df
    top20 = batch_search(qdf, index_dir, conjunctive=True, k=20,
                         num_partitions=4)
    qrels_df = top20.groupBy("query_id").agg(F.min("doc_id").alias("rel_doc"))

    prod_df = batch_mrr(qdf, qrels_df, index_dir, n=10, exact=False)
    assert "collect_list" not in prod_df._jdf.queryExecution().toString()
    prod = prod_df.collect()[0]
    exact = batch_mrr(qdf, qrels_df, index_dir, n=10).collect()[0]
    assert prod["n_queries"] == exact["n_queries"]
    assert math.isclose(prod["mrr"], exact["mrr"], abs_tol=1.5e-6)


def test_partition_by_term_is_output_invariant(spark, index_dir, queries_df):
    qdf, _rows = queries_df
    a = sorted(
        tuple(r)
        for r in batch_search(qdf, index_dir, conjunctive=True, k=10,
                              num_partitions=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in batch_search(qdf, index_dir, conjunctive=True, k=10,
                              num_partitions=4, partition_by_term=True).collect()
    )
    assert a == b
