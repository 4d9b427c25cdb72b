#!/usr/bin/env python
"""100× scale smoke: 50M-turn build + serving sanity (VERDICT r3 #7).

Builds the block index over a MATERIALIZED 50M-turn table (10,000 × the
5,000-doc sf0.1 base — 100× the 480k-turn bench headline, 10× the round-2/3
5M smoke) at local[32], with Spark event logging on, and reports:

- turns/s for a SAME-SESSION 5M build and the 50M build — the
  linear-in-data evidence (done = within ~20% of each other);
- per-stage wall + core-seconds from the event log (done = no stage
  superlinear in data: each stage's core-seconds scale ≈10× from 5M to
  50M);
- serving sanity at 50M docs: dense-term queries (this corpus's vocabulary
  is small and every term has df ≈ 0.8·N, so cold queries are decode-bound
  by design — the p50/p95 recorded here are THAT regime, not the ms-band
  selective regime the zipf bench line measures), rank-consistency checks,
  and the two-level metadata counters (superblock rows fetched eagerly vs
  leaf rows fetched lazily — the VERDICT r3 #2 fix's bound at real scale).

Run: python scripts/scale_smoke.py 2>/dev/null   (~25-35 min; one JSON line)
Env: SPARK_GRAFT_SMOKE_REPLICATE (default 10000), SPARK_GRAFT_SMOKE_BASELINE_REPLICATE
(default 1000 = the 5M comparator).
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

REPLICATE = int(os.environ.get("SPARK_GRAFT_SMOKE_REPLICATE", "10000"))
BASE_REPLICATE = int(os.environ.get("SPARK_GRAFT_SMOKE_BASELINE_REPLICATE", "1000"))


def _timed_build_from(spark, input_path: str, n_input: int, out_dir: str, tag: str):
    import bench

    big = spark.read.parquet(input_path)
    t0 = time.time()
    wall, tput, metrics = bench._timed_build(spark, big, n_input, out_dir, tag)
    return {"t0": t0, "wall": round(wall, 1), "turns_per_sec": round(tput, 1),
            "n_turns": n_input, "n_postings": metrics.n_postings,
            "postings_per_sec": round(metrics.postings_per_sec, 1)}


def _serving_sanity(out_dir: str) -> dict:
    from websearchengine_spark.functions.tokenizer import clean_query
    from websearchengine_spark.operators.wand import BlockIndexReader

    r = BlockIndexReader(out_dir)
    # the corpus vocabulary is dense by construction — take real terms from
    # one doc's text via the reader's own lexicon
    queries = ["the data", "query batch fast", "table row", "spark"]
    lat = []
    stats: dict = {}
    for q in queries:
        t0 = time.time()
        res = r.search(q, conjunctive=True, k=10)
        lat.append(round((time.time() - t0) * 1000.0, 1))
        assert len(res) > 0, q
    lat_sorted = sorted(lat)
    stats["cold_ms"] = lat
    stats["cold_p50_ms"] = lat_sorted[len(lat_sorted) // 2]
    stats["cold_max_ms"] = lat_sorted[-1]
    # repeat = LRU hit
    t0 = time.time()
    r.search(queries[0], conjunctive=True, k=10)
    stats["cached_us"] = round((time.time() - t0) * 1e6, 1)
    # two-level metadata bound on a WAND-forced disjunction of dense terms:
    # eager fetch is SUPERBLOCK rows only (~n_blocks/128), leaves lazy
    wand = BlockIndexReader(out_dir, taat_threshold=0, dense_docs_max=0)
    sb0, lf0 = wand.sb_rows_fetched, wand.leaf_rows_fetched
    t0 = time.time()
    wand.search("the data", conjunctive=False, k=10)
    stats["wand_dense_ms"] = round((time.time() - t0) * 1000.0, 1)
    stats["sb_rows_fetched"] = wand.sb_rows_fetched - sb0
    stats["leaf_rows_fetched"] = wand.leaf_rows_fetched - lf0
    n_leaf_blocks = sum(
        -(-df // 128) for df in wand.lexicon_rows(clean_query("the data")).values()
    )
    stats["total_leaf_blocks"] = n_leaf_blocks
    # OOV + conjunctive-with-OOV semantics hold at scale
    assert r.search("zzqqxx9", conjunctive=False, k=5) == []
    assert len(r.search("zzqqxx9 the", conjunctive=True, k=5)) == 5

    # ---- within-query parallel decode A/B (VERDICT r4 #2) ---------------
    # the dense cold regime is single-Python-process decode-bound (this
    # corpus: every term df ≈ 0.8·N, disjunctions unprunable by design);
    # doc-range sharding across a process pool must cut it ~Nx with EXACT
    # result equality (each doc scored whole in one shard, same float tree)
    # COLD/COLD on FRESH readers: the conjunctive loop above already
    # decoded "the"/"data" into r's posting LRU, so timing the disjunction
    # on r measures accumulation only — not the single-process decode this
    # A/B exists to cut. Each side starts with nothing cached; the parallel
    # side pays its pool spawn + footer scans inside the timed region.
    rs = BlockIndexReader(out_dir)
    t0 = time.time()
    disj_serial = rs.search("the data", conjunctive=False, k=10)
    stats["disj_serial_cold_ms"] = round((time.time() - t0) * 1000.0, 1)
    rs.close()
    workers = int(os.environ.get("SPARK_GRAFT_SMOKE_PWORKERS", "8"))
    pc = BlockIndexReader(out_dir, parallel_workers=workers,
                          parallel_df_threshold=1)
    try:
        t0 = time.time()
        disj_par_cold = pc.search("the data", conjunctive=False, k=10)
        stats["disj_parallel_cold_ms"] = round((time.time() - t0) * 1000.0, 1)
        assert pc.last_parallel
    finally:
        pc.close()
    assert disj_par_cold == disj_serial
    stats["disj_parallel_speedup_cold"] = round(
        stats["disj_serial_cold_ms"]
        / max(stats["disj_parallel_cold_ms"], 1e-9), 2
    )
    # warm twin (posting LRUs hot on the serial side): the accumulation-
    # bound floor, kept for continuity with earlier rounds' records
    t0 = time.time()
    r.search("the data", conjunctive=False, k=10)
    stats["disj_serial_warm_ms"] = round((time.time() - t0) * 1000.0, 1)
    par = BlockIndexReader(out_dir, parallel_workers=workers,
                           parallel_df_threshold=1)
    try:
        plat1, plat2 = [], []
        for q in queries:
            t0 = time.time()
            pres = par.search(q, conjunctive=True, k=10)
            plat1.append(round((time.time() - t0) * 1000.0, 1))
            assert pres == r.search(q, conjunctive=True, k=10), q
            assert par.last_parallel, q
            # k=11 re-times the same decode work past the result cache:
            # steady-state latency once the pool + footer scans are warm
            t0 = time.time()
            par.search(q, conjunctive=True, k=11)
            plat2.append(round((time.time() - t0) * 1000.0, 1))
        stats["parallel_workers"] = workers
        stats["parallel_cold_ms"] = plat1   # first query carries pool spawn
        stats["parallel_warm_ms"] = plat2
        t0 = time.time()
        disj_par = par.search("the data", conjunctive=False, k=10)
        stats["disj_parallel_warm_ms"] = round((time.time() - t0) * 1000.0, 1)
        assert disj_par == disj_serial
        assert par.last_parallel
    finally:
        par.close()
    return stats


def main() -> int:
    import bench
    from scripts.scaling_profile import _parse_eventlog
    from websearchengine_spark.session import get_spark

    out: dict = {"metric": "scale_smoke_50m", "replicate": REPLICATE}
    root = tempfile.mkdtemp(prefix="wse_smoke50m_", dir=bench.TMP_ROOT)
    evdir = os.path.join(root, "ev")
    os.makedirs(evdir)
    spark = get_spark(
        app_name="scale-smoke",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    idx50 = os.path.join(root, "idx50m")
    try:
        _run(out, bench, spark, root, evdir, idx50, _parse_eventlog)
    finally:
        # a failure anywhere must not leak the tmpfs workdir (pinned host
        # RAM — a crashed run once left 584 MB behind)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


def _run(out, bench, spark, root, evdir, idx50, _parse_eventlog) -> None:
    try:
        # same-session 5M comparator first (also the JVM warmup), then 50M
        for tag, rep, key in (("5m", BASE_REPLICATE, "build_5m"),
                              ("50m", REPLICATE, "build_50m")):
            ipath = os.path.join(root, f"in_{tag}")
            n = bench._materialize_input(spark, rep, ipath)
            odir = idx50 if tag == "50m" else os.path.join(root, "idx5m")
            out[key] = _timed_build_from(spark, ipath, n, odir, f"smoke-{tag}")
            shutil.rmtree(ipath, ignore_errors=True)
            if tag == "5m":
                shutil.rmtree(odir, ignore_errors=True)
        out["tput_ratio_50m_vs_5m"] = round(
            out["build_50m"]["turns_per_sec"] / out["build_5m"]["turns_per_sec"], 3
        )
        # per-stage attribution for the 50M build only. Spark 4 writes the
        # event log as a DIRECTORY (eventlog_v2_<appid>/events_*); resolve
        # to the newest events file
        logs = sorted(
            (os.path.join(evdir, f) for f in os.listdir(evdir)),
            key=os.path.getmtime,
        )
        if logs:
            path = logs[-1]
            if os.path.isdir(path):
                evs = sorted(
                    (os.path.join(path, f) for f in os.listdir(path)
                     if f.startswith("events")),
                    key=os.path.getmtime,
                )
                path = evs[-1] if evs else None
            if path:
                stages = _parse_eventlog(path, out["build_50m"]["t0"])
                stages.sort(key=lambda s: -s["core_s"])
                out["stages_top"] = stages[:12]
    finally:
        spark.stop()
        shutil.rmtree(evdir, ignore_errors=True)
    out["serving"] = _serving_sanity(idx50)


if __name__ == "__main__":
    sys.exit(main())
