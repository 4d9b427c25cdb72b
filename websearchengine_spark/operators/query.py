"""Exhaustive DataFrame query plane — the ground-truth BM25 scorer.

Spark-first rewrite of the reference query processor (main.cpp
Searcher::search, 465-553) as one declarative plan per query batch:

  query terms (cleaned driver-side, main.cpp:393-431)
    → broadcast join onto postings (term-pruned scan; the analogue of the
      lexicon probe, misses silently skipped — main.cpp:575)
    → join doc lengths (doc_stats)
    → per-(query, doc): conjunctive `count == n_found` filter
      (set-intersection semantics, main.cpp:599-607) or none (disjunctive,
      main.cpp:681-687)
    → BM25 contributions summed in **sorted-term order** (array_sort +
      aggregate — reproduces the reference's float summation order,
      main.cpp:574)
    → rank by (score DESC, doc_id ASC) (main.cpp:626-630), top-k per query.

Queries are tiny; cleaning runs driver-side (reference P4). Everything else
is JVM-side — the only UDF in the whole path is the build-time tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from websearchengine_spark.functions.tokenizer import clean_query
from websearchengine_spark.plans.build import LogicalIndex


def clean_queries_df(index: LogicalIndex, queries: list[tuple[int, str]]) -> DataFrame:
    """(query_id, raw) → exploded (query_id, term), cleaned per reference."""
    spark = index.postings.sparkSession
    rows = [
        (int(qid), t) for qid, q in queries for t in clean_query(q)
    ]
    return spark.createDataFrame(rows or [], "query_id long, term string")


def search(
    index: LogicalIndex,
    queries: list[tuple[int, str]],
    conjunctive: bool = True,
    k: int = 10,
) -> DataFrame:
    """→ DataFrame(query_id, rank, doc_id, score), rank 1-based, ≤ k rows
    per query."""
    qt = clean_queries_df(index, queries)
    if not queries:
        return qt.select(
            "query_id",
            F.lit(0).alias("rank"),
            F.lit(0).cast("long").alias("doc_id"),
            F.lit(0.0).alias("score"),
        ).limit(0)

    # lexicon probe: OOV terms drop out of the inner join (silently skipped,
    # main.cpp:575). n_found = per-query count of in-vocabulary terms — the
    # conjunctive intersection is over the *found* terms only.
    qlex = index.lexicon.join(F.broadcast(qt), "term")
    n_found = qlex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_found"))

    hits = (
        index.postings.join(F.broadcast(qlex), "term")
        .join(index.doc_stats.select("doc_id", "term_cnt"), "doc_id")
        .withColumn("contrib", index.bm25_score_col())
    )

    # sum per-term contributions in sorted-term order (float-order parity
    # with the oracle; ties between identical docs stay exact ties)
    per_doc = hits.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )

    if conjunctive:
        per_doc = per_doc.join(F.broadcast(n_found), "query_id").filter(
            F.col("n_terms_hit") == F.col("n_found")
        )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def match_counts(
    index: LogicalIndex, queries: list[tuple[int, str]], conjunctive: bool = True
) -> DataFrame:
    """Total matched docs per query (the reference's `count` field,
    main.cpp:487) — rank-independent."""
    qt = clean_queries_df(index, queries)
    qlex = index.lexicon.join(F.broadcast(qt), "term")
    n_found = qlex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_found"))
    per_doc = (
        index.postings.join(F.broadcast(qlex.select("query_id", "term")), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms_hit"))
    )
    if conjunctive:
        per_doc = per_doc.join(F.broadcast(n_found), "query_id").filter(
            F.col("n_terms_hit") == F.col("n_found")
        )
    return per_doc.groupBy("query_id").agg(F.count(F.lit(1)).alias("count"))


def mrr_at(
    index: LogicalIndex,
    queries: list[tuple[int, str]],
    qrels: DataFrame,
    n: int = 10,
    conjunctive: bool = True,
) -> float:
    """Distributed MRR@n (evaluation.cpp:484-490, 715-720): mean over
    queries *with a qrel* of 1/rank of the relevant doc within top-n."""
    results = search(index, queries, conjunctive=conjunctive, k=n)
    rr = results.join(qrels, ["query_id", "doc_id"]).select(
        "query_id", (F.lit(1.0) / F.col("rank")).alias("rr")
    )
    per_query = qrels.select("query_id").distinct().join(rr, "query_id", "left")
    row = per_query.agg(F.avg(F.coalesce(F.col("rr"), F.lit(0.0))).alias("mrr")).collect()[0]
    return float(row["mrr"] or 0.0)
