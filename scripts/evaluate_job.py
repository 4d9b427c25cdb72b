#!/usr/bin/env python
"""Batch MRR@n evaluation job — the reference's `evaluation` binary
(evaluation.cpp:696-730): queries.tsv + qrels.tsv + index → MRR@n.

Distributed (the reference's 20-thread pool, scaled out across executors —
operators/batch_eval.py):

    spark-submit --py-files wse.zip scripts/evaluate_job.py \\
        --index /path/idx --queries queries.tsv --qrels qrels.tsv [--n 10]

Driver-only mode (--local; no executors — a sanity path):

    python scripts/evaluate_job.py --local --index ... --queries ... --qrels ...

--local --procs N runs the reference's ACTUAL shape — a worker pool over a
shared on-disk index (evaluation.cpp:273-274: 20 threads; here N processes,
one pyarrow reader each, no Spark). Per-query reciprocal ranks are computed
in chunks and re-folded IN ORIGINAL QUERY ORDER, so the MRR is bit-identical
to the sequential --procs 1 loop (tests/test_cli.py).

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

_WORKER_READER = None
_WORKER_N = 10


def _pool_init(index_root: str, n: int) -> None:
    global _WORKER_READER, _WORKER_N
    from websearchengine_spark.operators.wand import BlockIndexReader

    _WORKER_READER = BlockIndexReader(index_root)
    _WORKER_N = n


def _rr_chunk(chunk):
    """[(qid, query, rel_doc)] → [rr] for one worker (same per-query rule
    as BlockIndexReader.mrr_at; the caller re-folds in original order)."""
    out = []
    for _qid, q, rel in chunk:
        rr = 0.0
        for rank, d, _ in _WORKER_READER.search(q, conjunctive=True, k=_WORKER_N):
            if d == rel:
                rr = 1.0 / rank
                break
        out.append(rr)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--qrels", required=True)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--local", action="store_true",
                   help="driver-only loop (no Spark executors)")
    p.add_argument("--procs", type=int, default=1,
                   help="--local worker processes (reference: 20 threads)")
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
        evaluated = [(qid, q, qrels[qid]) for qid, q in queries if qid in qrels]
        n_q = len(evaluated)
        if args.procs > 1 and n_q:
            import multiprocessing as mp

            chunk = max(1, -(-n_q // (args.procs * 8)))
            chunks = [evaluated[i : i + chunk] for i in range(0, n_q, chunk)]
            with mp.get_context("spawn").Pool(
                args.procs, initializer=_pool_init, initargs=(args.index, args.n)
            ) as pool:
                rr_lists = pool.map(_rr_chunk, chunks)
            total = 0.0
            for rrs in rr_lists:  # original query order → bit-identical fold
                for rr in rrs:
                    total += rr
            mrr = total / n_q
        else:
            reader = BlockIndexReader(args.index)
            mrr = reader.mrr_at(queries, qrels, n=args.n)
    else:
        from websearchengine_spark.operators.batch_eval import batch_mrr
        from websearchengine_spark.session import get_spark
        from websearchengine_spark.sources.tsv import read_qrels, read_queries

        spark = get_spark(app_name="wse-evaluate")
        try:
            queries_df = read_queries(spark, args.queries)
            qrels_df = read_qrels(spark, args.qrels)
            row = batch_mrr(
                queries_df, qrels_df, args.index, n=args.n,
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
