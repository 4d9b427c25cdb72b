"""Distributed batch query evaluation over the block index.

The reference parallelizes batch evaluation with a 20-thread pool over a
shared in-RAM index (evaluation.cpp:570-660, 798 q/s on 367k queries). Here
the same shape is expressed Spark-first: a ``mapInPandas`` over the queries
DataFrame where each executor task drives an **executor-local
BlockIndexReader** — the reader is pyarrow-only (no JVM, no Spark session),
so it runs inside the Python worker exactly like the reference's evaluator
threads run against the mmap'd index. Readers are cached per worker process,
so a long evaluation pays the index-open cost once per core, and the
reader's posting/result LRUs play the role of the reference's shared
thread-safe caches (evaluation.cpp:84-121).

Scale shape: queries shard across executors (embarrassingly parallel); each
task reads only the blocks its queries touch (bucket + row-group pruned).
At 1000 executors this is the reference's thread pool scaled out — no
driver loop, no collect of anything bigger than the final metric.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-worker-process reader cache: Python workers are reused across tasks,
# so the index-open + LRU warmup amortizes over the whole evaluation.
# BOUNDED, evicted readers closed: a reader can own a forked decode pool
# and open file handles, so an unbounded cache in a long-lived worker
# evaluating a stream of (re)built indexes would accumulate leaked worker
# processes/fds for the process's lifetime (the ServingEngine close()
# contract, applied here). Workers run one task at a time, so closing the
# evicted reader cannot race an in-flight search.
_READERS: dict = {}
_READERS_CAP = 4


def _get_reader(root: str, **kwargs):
    from websearchengine_spark.operators.wand import BlockIndexReader

    key = (root, tuple(sorted(kwargs.items())))
    reader = _READERS.get(key)
    if reader is None:
        reader = _READERS[key] = BlockIndexReader(root, **kwargs)
        while len(_READERS) > _READERS_CAP:
            _READERS.pop(next(iter(_READERS))).close()
    return reader


def batch_search(
    queries: DataFrame,
    index_root: str,
    conjunctive: bool = True,
    k: int = 10,
    num_partitions: int | None = None,
    partition_by_term: bool = False,
    **reader_kwargs,
) -> DataFrame:
    """(query_id, query) → (query_id, rank, doc_id, score), evaluated by
    executor-local serving engines. Rank-identical to driver-side
    ``BlockIndexReader.search`` (same code runs in the workers).

    ``partition_by_term`` co-locates queries sharing a leading term: each
    worker then cold-decodes a term's postings at most once instead of
    every worker paying the full hot-term fetch (the reference's single
    shared posting cache, evaluation.cpp:84-121, recreated as per-worker
    caches with term-affinity routing). Output is partitioning-invariant.

    Measured caveat (BASELINE.md): at MS-MARCO-shape workloads the
    DEFAULT (random) routing wins by > 2.4× — Zipf-distributed lead terms
    make affinity partitions straggle, and hot terms appear in so many
    queries that every worker warms them within its first few queries
    anyway. Use affinity only when the lead-term histogram is balanced."""
    q = queries.select("query_id", "query")
    if partition_by_term:
        key = F.element_at(F.split(F.trim(F.lower("query")), "[^a-z0-9]+"), 1)
        if num_partitions is not None:
            q = q.repartition(num_partitions, key)
        else:
            q = q.repartition(key)
    elif num_partitions is not None:
        q = q.repartition(num_partitions)

    def eval_partition(batches):
        reader = _get_reader(index_root, **reader_kwargs)
        for pdf in batches:
            qids, ranks, docs, scores = [], [], [], []
            for qid, text in zip(pdf["query_id"], pdf["query"]):
                for rank, d, s in reader.search(
                    text or "", conjunctive=conjunctive, k=k
                ):
                    qids.append(qid)
                    ranks.append(rank)
                    docs.append(d)
                    scores.append(s)
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(qids, dtype="int64"),
                    "rank": pd.Series(ranks, dtype="int64"),
                    "doc_id": pd.Series(docs, dtype="int64"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

    return q.mapInPandas(
        eval_partition, "query_id long, rank long, doc_id long, score double"
    )


def batch_mrr(
    queries: DataFrame,
    qrels: DataFrame,
    index_root: str,
    n: int = 10,
    num_partitions: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Distributed MRR@n (evaluation.cpp:484-490, 715-720): reciprocal rank
    of each query's relevant doc within the top-n conjunctive results, mean
    over evaluated queries. ``qrels``: (query_id, rel_doc). Returns one row
    (mrr, n_queries); the mean is an ordered fold by query_id — the same
    deterministic float summation the exhaustive plan and oracle use.

    Denominator = DISTINCT query_ids that appear in BOTH inputs — the
    reference loops over queries and skips ids without a qrel
    (evaluation.cpp:715-720), and reader.mrr_at does the same, so a qrels
    row whose query_id is absent from ``queries`` contributes nothing
    instead of deflating the mean. A query_id with SEVERAL qrel rows
    (multiple relevant docs, or duplicate rows — representable here though
    not in the reference's last-wins hash map or reader.mrr_at's dict)
    counts ONCE, scored by its best-ranked relevant doc; without the
    per-query reduction the rr⋈evaluated join would cross-multiply and
    corrupt both the mean's weights and n_queries. Only queries that have
    a qrel are searched at all — a sparse holdout does not pay top-n
    evaluation for queries the inner join would discard.

    ``exact=True`` (gate/oracle default) folds rr values in query_id order
    for a bit-stable mean; ``exact=False`` is the production twin — plain
    ``F.sum/F.count`` with map-side partial aggregation, the plan for a
    367k-query MS-MARCO-scale eval, equal to the fold up to float
    associativity ulps (the plans/olap.py split applied to this holdout)."""
    evaluated = (
        queries.select("query_id")
        .distinct()
        .join(qrels.select("query_id").distinct(), "query_id")
    )
    results = batch_search(
        queries.join(evaluated, "query_id", "left_semi"),
        index_root, conjunctive=True, k=n, num_partitions=num_partitions,
    )
    rr = (
        results.join(qrels, "query_id")
        .filter(F.col("doc_id") == F.col("rel_doc"))
        # best-ranked relevant doc; rr = 1/rank is monotone in rank, so
        # min(rank) gives exactly the value a single-qrel input yields
        .groupBy("query_id")
        .agg((F.lit(1.0) / F.min("rank")).alias("rr"))
    )
    per_query = evaluated.join(rr, "query_id", "left").select(
        "query_id", F.coalesce(F.col("rr"), F.lit(0.0)).alias("rr")
    )
    mean = (
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("query_id", "rr"))),
            F.lit(0.0),
            lambda acc, x: acc + x["rr"],
        )
        / F.count(F.lit(1))
        if exact
        else F.sum("rr") / F.count(F.lit(1))
    )
    return per_query.agg(
        F.round(mean, 6).alias("mrr"),
        F.count(F.lit(1)).alias("n_queries"),
    )
