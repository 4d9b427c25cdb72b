#!/usr/bin/env python
"""Merge at 100× scale: absorb a 5M-turn delta into a 50M-turn base.

The incremental-merge scale claim (plans/merge_index.py): absorbing a
delta moves ~1-3 compressed B/posting through one exchange — no
re-tokenize, no text shuffle — so it must beat rebuilding the union from
raw text by roughly the base:delta ratio. This smoke measures all four
walls IN ONE SESSION (same-window comparability; host drifts hours-scale):

  1. base build   (50M turns from raw text — the live index)
  2. delta build  (5M turns — the nightly arrivals)
  3. incremental merge (base + delta → 55M index)
  4. from-scratch rebuild of the 55M union (what a deployment without the
     merge pays every night)

Correctness at scale: delta conv_ids sort after the base's, so arrival
order == (conv_id, turn_idx) order and the merged docID numbering equals
the rebuild's — top-k results (ties included) must match exactly; meta
n_docs/avg_dl and total postings must be equal. (Block LAYOUT may differ:
at these dfs every term is hot-salted, and the merge cuts salt ranges on
the docID axis — the documented divergence.)

Run: python scripts/merge_scale_smoke.py 2>/dev/null   (~25-35 min; one JSON line)
Env: SPARK_GRAFT_MERGE_SMOKE_BASE_REP (default 10000 → 50M turns),
     SPARK_GRAFT_MERGE_SMOKE_DELTA_REP (default 1000 → 5M).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

BASE_REP = int(os.environ.get("SPARK_GRAFT_MERGE_SMOKE_BASE_REP", "10000"))
DELTA_REP = int(os.environ.get("SPARK_GRAFT_MERGE_SMOKE_DELTA_REP", "1000"))


def _materialize(spark, bench, rep: int, prefix: str, path: str) -> int:
    """Replicated transcripts with a conv_id namespace prefix, written to
    a real table (timed builds read materialized input, never a lazy
    generator — bench._materialize_input's rationale)."""
    from pyspark.sql import functions as F

    base = bench._load_transcripts(spark, bench.SF_DIR)
    df = bench._replicate(base, rep).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )
    df.repartition(64).write.mode("overwrite").parquet(path)
    return base.count() * max(rep, 1)


def main() -> int:
    import bench
    from websearchengine_spark.operators.wand import BlockIndexReader
    from websearchengine_spark.plans.merge_index import merge_block_indexes
    from websearchengine_spark.session import get_spark

    out: dict = {
        "metric": "merge_scale_smoke",
        "base_rep": BASE_REP,
        "delta_rep": DELTA_REP,
        "unit": "sec",
    }
    root = tempfile.mkdtemp(prefix="wse_merge50m_", dir=bench.TMP_ROOT)
    spark = get_spark(app_name="merge-scale-smoke")
    try:
        walls = {}
        for tag, rep, prefix in (("base", BASE_REP, "b~"),
                                 ("delta", DELTA_REP, "d~")):
            ipath = os.path.join(root, f"in_{tag}")
            n = _materialize(spark, bench, rep, prefix, ipath)
            wall, tput, metrics = bench._timed_build(
                spark, spark.read.parquet(ipath), n,
                os.path.join(root, f"idx_{tag}"), f"msmoke-{tag}",
            )
            walls[tag] = wall
            out[f"build_{tag}"] = {
                "n_turns": n, "wall_s": round(wall, 1),
                "turns_per_sec": round(tput, 1),
                "n_postings": metrics.n_postings,
            }
        t0 = time.time()
        mm = merge_block_indexes(
            spark, os.path.join(root, "idx_base"),
            os.path.join(root, "idx_delta"), os.path.join(root, "idx_merged"),
            build_id="m",
        )
        walls["merge"] = time.time() - t0
        out["merge"] = {
            "wall_s": round(walls["merge"], 1),
            "n_docs": mm.n_docs, "n_postings": mm.n_postings,
            "postings_per_sec": round(mm.postings_per_sec, 1),
        }
        # the comparator: rebuild the union from raw text (one table so the
        # rebuild pays exactly one scan, same as a real nightly job)
        upath = os.path.join(root, "in_union")
        spark.read.parquet(os.path.join(root, "in_base")).unionByName(
            spark.read.parquet(os.path.join(root, "in_delta"))
        ).repartition(64).write.mode("overwrite").parquet(upath)
        for tag in ("in_base", "in_delta"):
            shutil.rmtree(os.path.join(root, tag), ignore_errors=True)
        n_union = out["build_base"]["n_turns"] + out["build_delta"]["n_turns"]
        wall, tput, sm = bench._timed_build(
            spark, spark.read.parquet(upath), n_union,
            os.path.join(root, "idx_scratch"), "msmoke-union",
        )
        walls["rebuild"] = wall
        out["rebuild_union"] = {
            "n_turns": n_union, "wall_s": round(wall, 1),
            "turns_per_sec": round(tput, 1), "n_postings": sm.n_postings,
        }
        assert mm.n_docs == sm.n_docs and mm.n_postings == sm.n_postings
        assert mm.avg_dl == sm.avg_dl
        out["merge_speedup_vs_rebuild"] = round(wall / walls["merge"], 2)
        out["delta_build_plus_merge_s"] = round(
            walls["delta"] + walls["merge"], 1
        )
        out["speedup_incl_delta_build"] = round(
            wall / (walls["delta"] + walls["merge"]), 2
        )

        # serving identity: same docID numbering (arrival==sort) ⇒ exact
        # top-k equality, ties included
        rm = BlockIndexReader(os.path.join(root, "idx_merged"))
        rs = BlockIndexReader(os.path.join(root, "idx_scratch"))
        n_q = 0
        for q in ("the data", "query batch fast", "table row", "spark"):
            for conj in (True, False):
                assert rm.search(q, conjunctive=conj, k=10) == rs.search(
                    q, conjunctive=conj, k=10), (q, conj)
                n_q += 1
        rm.close(); rs.close()
        out["rank_identity_queries"] = n_q
        out["value"] = out["merge"]["wall_s"]
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
