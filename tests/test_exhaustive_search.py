"""End-to-end rank identity: Spark exhaustive DataFrame scorer vs the
pure-Python oracle of the reference semantics, over the full fixture query
set, conjunctive + disjunctive, k ∈ {1, 10, 100}.

DocIDs and ranks must match exactly (including score-tie → docID-asc
tie-break); scores within 1e-9 relative tolerance (float summation is
sorted-term-ordered in both, but Java vs C libm log may differ in the last
ulp)."""

from __future__ import annotations

import math

import pytest

from websearchengine_spark.operators import query as Q


def _spark_results(index, queries, conjunctive, k):
    rows = Q.search(index, queries, conjunctive=conjunctive, k=k).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in out.values():
        v.sort()
    return out


@pytest.mark.parametrize("conjunctive", [True, False], ids=["conj", "disj"])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_rank_identity_vs_oracle(spark_index, oracle, fixture, conjunctive, k):
    queries = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    got = _spark_results(spark_index, queries, conjunctive, k)
    checked = 0
    for qid, q in queries:
        expected = oracle.search(q, conjunctive=conjunctive, k=k)
        actual = got.get(qid, [])
        assert len(actual) == len(expected), (qid, q, actual, expected)
        for (er, ed, es), (ar, ad, asc) in zip(expected, actual):
            assert (er, ed) == (ar, ad), (qid, q, expected, actual)
            assert math.isclose(es, asc, rel_tol=1e-9, abs_tol=1e-12), (qid, q, es, asc)
        checked += 1
    assert checked == len(queries)


def test_corpus_stats_match(spark_index, oracle):
    assert spark_index.n_docs == oracle.n_docs
    assert math.isclose(spark_index.avg_dl, oracle.avg_dl, rel_tol=1e-12)


def test_match_counts(spark_index, oracle, fixture):
    queries = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    rows = Q.match_counts(spark_index, queries, conjunctive=True).collect()
    got = {r["query_id"]: r["count"] for r in rows}
    for qid, q in queries:
        expected = len(oracle.search(q, conjunctive=True, k=10**9))
        assert got.get(qid, 0) == expected, (qid, q)


def test_mrr_matches_oracle(spark_index, oracle, fixture, spark):
    queries = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    qrels_map = dict(zip(fixture.qrels["query_id"], fixture.qrels["doc_id"]))
    expected = oracle.mrr_at(queries, qrels_map, n=10)
    qrels_df = spark.createDataFrame(fixture.qrels)
    got = Q.mrr_at(spark_index, queries, qrels_df, n=10)
    assert math.isclose(got, expected, rel_tol=1e-9)
    assert got > 0.3  # planted qrels: most queries should find their doc


def test_docid_stability(spark, fixture):
    """docIDs = rank in (conv_id, turn_idx) order, invariant to partition
    count and input row order."""
    from websearchengine_spark.plans.build import docs_table

    tdf = spark.createDataFrame(fixture.transcripts)
    a = docs_table(tdf, num_partitions=3)
    shuffled = spark.createDataFrame(
        fixture.transcripts.sample(frac=1.0, random_state=9)
    )
    b = docs_table(shuffled, num_partitions=11)
    rows_a = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    rows_b = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert rows_a == rows_b
    expected = {k: i for i, k in enumerate(fixture.doc_keys)}
    assert rows_a == expected
