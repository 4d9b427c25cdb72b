#!/usr/bin/env python
"""Same-window A/B for live-index deletion (plans/delete_index.py):

1. absorb-a-delta-AND-purge in ONE pass
   (merge_many_block_indexes(purge_tombstones=True)) vs the naive
   purge_deletes-then-merge TWO-pass flow — the claim is data movement:
   two passes rewrite every surviving posting twice;
2. tombstone_delete wall time (the O(deleted) claim: a ~1% delete must
   cost seconds, not a rebuild);
3. cold serving overhead of a tombstoned index vs its purged twin (the
   per-decode mask + df-correction lookups — expected ~nil).

Protocol (host drifts hours-scale 2-3×, CLAUDE.md): one session/window,
builds untimed, warm-up merge untimed, outputs asserted equivalent
(lexicon + doc_stats exact; serving rank-identical on the top-df terms —
block layout may differ between strategies because the two-pass flow cuts
hot-term salt ranges on the intermediate purged axis).

Usage: python scripts/delete_bench.py [--base-rep 64] [--delta-rep 8]
           [--del-permille 10] [--sf-dir /root/testdata/sf0.1]
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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--base-rep", type=int, default=64)
    p.add_argument("--delta-rep", type=int, default=8)
    p.add_argument("--del-permille", type=int, default=10,
                   help="fraction of base conversations to tombstone (‰)")
    p.add_argument("--serve-reps", type=int, default=5,
                   help="cold-reader serving reps per config")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--work-dir", default=None)
    args = p.parse_args(argv)

    import pyarrow.dataset as ds
    from pyspark.sql import functions as F

    import bench  # repo-root bench: corpus loader/replicator (same shapes)
    from websearchengine_spark.operators.wand import BlockIndexReader
    from websearchengine_spark.plans.block_index import build_block_index
    from websearchengine_spark.plans.delete_index import (
        purge_deletes,
        tombstone_delete,
    )
    from websearchengine_spark.plans.merge_index import (
        merge_block_indexes,
        merge_many_block_indexes,
    )
    from websearchengine_spark.session import get_spark

    work = args.work_dir or tempfile.mkdtemp(prefix="wse_del_ab_")
    own_work = args.work_dir is None
    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="delete-bench",
        shuffle_partitions=args.cpus,
    )
    out: dict = {
        "metric": "delete_purge_merge_ab",
        "del_permille": args.del_permille,
        "unit": "sec",
    }
    try:
        base_t = bench._replicate(
            bench._load_transcripts(spark, args.sf_dir), args.base_rep
        ).persist()
        delta_t = bench._load_transcripts(spark, args.sf_dir)
        delta_t = bench._replicate(delta_t, args.delta_rep).withColumn(
            "conv_id", F.concat(F.lit("zz~"), F.col("conv_id"))
        )
        kw = dict(resume=False, num_partitions=args.cpus)
        m = build_block_index(base_t, f"{work}/base", build_id="base", **kw)
        # a second identical base so each strategy consumes a pristine input
        build_block_index(base_t, f"{work}/base2", build_id="base", **kw)
        dm = build_block_index(delta_t, f"{work}/delta", build_id="d", **kw)
        out["base_docs"], out["base_postings"] = m.n_docs, m.n_postings
        out["delta_postings"] = dm.n_postings

        # ~del_permille of conversations, deterministic
        dead = base_t.select("conv_id").distinct().filter(
            F.crc32("conv_id") % 1000 < args.del_permille
        )
        t0 = time.time()
        dmx = tombstone_delete(
            spark, f"{work}/base", conv_ids=dead, corpus=base_t
        )
        out["tombstone_s"] = round(time.time() - t0, 3)
        out["n_deleted"] = dmx.n_deleted_total
        tombstone_delete(
            spark, f"{work}/base2", conv_ids=dead, corpus=base_t
        )
        base_t.unpersist()

        # untimed warm-up (JIT + merge codepath first-touch)
        merge_block_indexes(
            spark, f"{work}/delta", f"{work}/base2", f"{work}/warmup",
            build_id="w", purge_tombstones=True,
        )

        # A: one pass — deltas absorbed and tombstones purged in one exchange
        t0 = time.time()
        ma = merge_many_block_indexes(
            spark, [f"{work}/base", f"{work}/delta"], f"{work}/one",
            build_id="one", purge_tombstones=True,
        )
        t_one = time.time() - t0

        # B: two passes — physical purge, then a plain merge
        t0 = time.time()
        purge_deletes(spark, f"{work}/base2", f"{work}/purged", build_id="pg")
        t_purge = time.time() - t0
        t0 = time.time()
        merge_block_indexes(
            spark, f"{work}/purged", f"{work}/delta", f"{work}/two",
            build_id="two",
        )
        t_merge2 = time.time() - t0

        def rows(path, sort_cols):
            t = ds.dataset(path, partitioning="hive").to_table()
            pdf = t.to_pandas().sort_values(sort_cols, kind="mergesort")
            return [tuple(r) for r in pdf[sorted(pdf.columns)].itertuples(
                index=False, name=None)]

        assert rows(f"{work}/one/lexicon", ["term"]) == rows(
            f"{work}/two/lexicon", ["term"]), "lexicon mismatch"
        assert rows(f"{work}/one/doc_stats", ["doc_id"]) == rows(
            f"{work}/two/doc_stats", ["doc_id"]), "doc_stats mismatch"

        # rank-identity on the corpus's top-df terms + cold-serving A/B of
        # the TOMBSTONED base vs its PURGED twin (fresh reader per rep)
        lex = ds.dataset(f"{work}/one/lexicon", partitioning="hive") \
            .to_table(columns=["term", "df"]).to_pandas() \
            .sort_values("df", ascending=False)
        top = [t for t in lex["term"].head(6)]
        suite = [top[0], " ".join(top[:2]), " ".join(top[2:5]),
                 " ".join(top[:6:2])]
        r1, r2 = BlockIndexReader(f"{work}/one"), BlockIndexReader(f"{work}/two")
        n_q = 0
        for q in suite:
            for conj in (True, False):
                assert r1.search(q, conjunctive=conj, k=20) == r2.search(
                    q, conjunctive=conj, k=20), (q, conj)
                n_q += 1

        def cold_suite_wall(root):
            walls = []
            for _ in range(args.serve_reps):
                r = BlockIndexReader(root)
                t0 = time.time()
                for q in suite:
                    r.search(q, conjunctive=False, k=10)
                    r.search(q, conjunctive=True, k=10)
                walls.append(time.time() - t0)
            walls.sort()
            return walls[len(walls) // 2]

        out["serve_cold_tombstoned_s"] = round(
            cold_suite_wall(f"{work}/base"), 4
        )
        out["serve_cold_purged_s"] = round(
            cold_suite_wall(f"{work}/purged"), 4
        )
        out.update(
            merged_docs=ma.n_docs,
            one_pass_s=round(t_one, 3),
            two_pass_purge_s=round(t_purge, 3),
            two_pass_merge_s=round(t_merge2, 3),
            two_pass_total_s=round(t_purge + t_merge2, 3),
            speedup=round((t_purge + t_merge2) / t_one, 3) if t_one else None,
            rank_identity_queries=n_q,
            value=round(t_one, 3),
        )
    finally:
        spark.stop()
        if own_work:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
