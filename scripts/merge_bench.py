#!/usr/bin/env python
"""Same-window A/B: absorb k delta indexes via ONE k-way merge
(plans.merge_index.merge_many_block_indexes) vs chained 2-way merges.

The claim under test is the scale shape, not a constant factor: a chained
absorption re-shuffles the ever-growing base at every step (the base's
postings cross the exchange k times), while the k-way pass moves every
posting exactly once — the reference's merge_index opens ALL partial
indexes and heap-merges them in one pass (merge_index.cpp:363-407).

Protocol (host drifts hours-scale 2-3×, see CLAUDE.md): everything runs
back-to-back in ONE session/window; builds are untimed; the two merge
strategies are timed on identical inputs; outputs are asserted equivalent
(lexicon + doc_stats + posting counts exact; serving rank-identical on the
corpus's highest-df terms — block LAYOUT may differ between the strategies
once hot-term salting engages, because chained merges cut salt ranges on
intermediate docID axes).

Usage:  python scripts/merge_bench.py [--base-rep 64] [--delta-rep 8]
            [--deltas 4] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _prefixed(df, prefix: str):
    from pyspark.sql import functions as F

    return df.withColumn("conv_id", F.concat(F.lit(prefix), F.col("conv_id")))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--base-rep", type=int, default=64,
                   help="base corpus = sf transcripts × this")
    p.add_argument("--delta-rep", type=int, default=8,
                   help="each delta = sf transcripts × this")
    p.add_argument("--deltas", type=int, default=4)
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--work-dir", default=None)
    args = p.parse_args(argv)
    if args.deltas < 1:
        p.error("--deltas must be >= 1 (the warm-up and A/B need a delta)")

    import bench  # repo-root bench: corpus loader/replicator (same shapes)
    from websearchengine_spark.operators.wand import BlockIndexReader
    from websearchengine_spark.plans.block_index import build_block_index
    from websearchengine_spark.plans.merge_index import (
        merge_block_indexes,
        merge_many_block_indexes,
    )
    from websearchengine_spark.session import get_spark

    work = args.work_dir or tempfile.mkdtemp(prefix="wse_merge_ab_")
    own_work = args.work_dir is None
    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="merge-bench",
        shuffle_partitions=args.cpus,
    )
    out: dict = {
        "metric": "kway_merge_vs_chained",
        "deltas": args.deltas,
        "unit": "sec",
    }
    try:
        base_t = _prefixed(
            bench._replicate(
                bench._load_transcripts(spark, args.sf_dir), args.base_rep
            ),
            "b~",
        )
        kw = dict(resume=False, num_partitions=args.cpus)
        m = build_block_index(base_t, f"{work}/base", build_id="base", **kw)
        out["base_docs"], out["base_postings"] = m.n_docs, m.n_postings
        delta_dirs = []
        delta_postings = 0
        for i in range(args.deltas):
            dt = _prefixed(
                bench._replicate(
                    bench._load_transcripts(spark, args.sf_dir),
                    args.delta_rep,
                ),
                f"d{i}~",
            )
            dm = build_block_index(
                dt, f"{work}/d{i}", build_id=f"d{i}", **kw
            )
            delta_postings += dm.n_postings
            delta_dirs.append(f"{work}/d{i}")
        out["delta_postings_total"] = delta_postings

        # untimed warm-up: the first merge in a JVM pays JIT + codepath
        # first-touch for the merge-specific stages (blocks→runs mapInArrow,
        # leaf parquet reads) — without it whichever strategy runs first
        # would eat that cost and bias the A/B
        merge_block_indexes(spark, f"{work}/base", delta_dirs[0],
                            f"{work}/warmup", build_id="warmup")

        # chained 2-way: base absorbs the deltas one at a time
        t0 = time.time()
        cur = f"{work}/base"
        chain_walls = []
        for i, d in enumerate(delta_dirs):
            t1 = time.time()
            merge_block_indexes(spark, cur, d, f"{work}/chain{i}",
                                build_id=f"chain{i}")
            chain_walls.append(round(time.time() - t1, 3))
            cur = f"{work}/chain{i}"
        t_chain = time.time() - t0

        # one k-way pass over the identical inputs
        t0 = time.time()
        mm = merge_many_block_indexes(
            spark, [f"{work}/base", *delta_dirs], f"{work}/many",
            build_id="many",
        )
        t_many = time.time() - t0

        # equivalence: sidecars + counts exact, serving rank-identical on
        # the highest-df terms (block layout may legitimately differ once
        # hot-term salting engages — chained merges cut salt ranges on
        # intermediate docID axes)
        import pyarrow.dataset as ds

        def rows(path, sort_cols):
            t = ds.dataset(path, partitioning="hive").to_table()
            pdf = t.to_pandas().sort_values(sort_cols, kind="mergesort")
            return [tuple(r) for r in pdf[sorted(pdf.columns)].itertuples(
                index=False, name=None)]

        assert rows(f"{work}/many/lexicon", ["term"]) == rows(
            f"{cur}/lexicon", ["term"]), "lexicon mismatch"
        assert rows(f"{work}/many/doc_stats", ["doc_id"]) == rows(
            f"{cur}/doc_stats", ["doc_id"]), "doc_stats mismatch"
        lex = ds.dataset(f"{work}/many/lexicon", partitioning="hive") \
            .to_table(columns=["term", "df"]).to_pandas() \
            .sort_values("df", ascending=False)
        top = [t for t in lex["term"].head(6)]
        rm, rc = BlockIndexReader(f"{work}/many"), BlockIndexReader(cur)
        n_q = 0
        for q in (top[0], " ".join(top[:2]), " ".join(top[2:5]),
                  " ".join(top[:6:2])):
            for conj in (True, False):
                assert rm.search(q, conjunctive=conj, k=20) == rc.search(
                    q, conjunctive=conj, k=20), (q, conj)
                n_q += 1
        out.update(
            merged_docs=mm.n_docs,
            merged_postings=mm.n_postings,
            chained_total_s=round(t_chain, 3),
            chained_per_merge_s=chain_walls,
            kway_s=round(t_many, 3),
            speedup=round(t_chain / t_many, 3) if t_many else None,
            rank_identity_queries=n_q,
            value=round(t_many, 3),
        )
    finally:
        spark.stop()
        if own_work:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
