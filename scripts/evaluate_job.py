#!/usr/bin/env python
"""Batch MRR@n evaluation job — the reference's `evaluation` binary
(evaluation.cpp:696-730): queries.tsv + qrels.tsv + index → MRR@n.

Distributed (the reference's 20-thread pool, scaled out across executors —
operators/batch_eval.py):

    spark-submit --py-files wse.zip scripts/evaluate_job.py \\
        --index /path/idx --queries queries.tsv --qrels qrels.tsv [--n 10]

Driver-only mode (--local; no executors — a sanity path):

    python scripts/evaluate_job.py --local --index ... --queries ... --qrels ...

Prints ONE JSON line: {"mrr": ..., "n_queries": ..., "seconds": ...,
"queries_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--qrels", required=True)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--local", action="store_true",
                   help="driver-only loop (no Spark executors)")
    p.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args(argv)

    t0 = time.time()
    if args.local:
        import csv

        from websearchengine_spark.operators.wand import BlockIndexReader

        queries = []
        with open(args.queries) as f:
            for row in csv.reader(f, delimiter="\t"):
                if row:
                    queries.append((int(row[0]), row[1]))
        qrels: dict[int, int] = {}
        with open(args.qrels) as f:
            for row in csv.reader(f, delimiter="\t"):
                if row and int(row[3]) > 0:
                    qrels[int(row[0])] = int(row[2])  # file-order last-wins
        reader = BlockIndexReader(args.index)
        mrr = reader.mrr_at(queries, qrels, n=args.n)
        n_q = sum(1 for qid, _ in queries if qid in qrels)
    else:
        from websearchengine_spark.operators.batch_eval import batch_mrr
        from websearchengine_spark.session import get_spark
        from websearchengine_spark.sources.tsv import read_qrels, read_queries

        spark = get_spark(app_name="wse-evaluate")
        try:
            queries_df = read_queries(spark, args.queries)
            qrels_df = read_qrels(spark, args.qrels)
            row = batch_mrr(
                spark, queries_df, qrels_df, args.index, n=args.n,
                num_partitions=args.num_partitions,
            ).collect()[0]
            mrr, n_q = float(row["mrr"]), int(row["n_queries"])
        finally:
            spark.stop()
    dt = time.time() - t0
    print(json.dumps({
        "mrr": round(float(mrr), 6),
        "n_queries": n_q,
        "seconds": round(dt, 3),
        "queries_per_sec": round(n_q / dt, 1) if dt > 0 else 0.0,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
