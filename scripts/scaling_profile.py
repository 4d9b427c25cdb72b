#!/usr/bin/env python
"""Per-stage scaling attribution for the block-index build (event logs).

Runs the SAME replicated build at two pinned parallelism levels (fresh
subprocess + taskset per level, exactly like bench.py's scaling phases) with
Spark event logging on, then attributes wall and core-seconds per stage at
each level. A stage whose core-seconds INFLATE at the high level is losing
efficiency to contention (memory bandwidth, GC); a stage whose core-seconds
are flat but wall doesn't shrink 4x is under-parallelized.

Run: python scripts/scaling_profile.py  (~7 min; prints one JSON line)
Env: SPARK_GRAFT_PROF_REPLICATE (default 288), SPARK_GRAFT_PROF_CORES
(default "1,4").
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICATE = int(os.environ.get("SPARK_GRAFT_PROF_REPLICATE", "288"))
CORES = [int(c) for c in os.environ.get("SPARK_GRAFT_PROF_CORES", "1,4").split(",")]


def _phase(cores: int, evdir: str, input_path: str, n_input: int) -> dict:
    """Subprocess body: one warmed, timed build with event logging. The
    timed build reads the pre-materialized input table (see bench.
    _materialize_input) so no synthetic generator work is attributed."""
    import bench  # noqa: F401  (sys.path already has the repo root)
    from websearchengine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"prof-c{cores}",
        shuffle_partitions=max(cores * 4, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            # A/B knob: shuffle/cache codec (lz4 default vs zstd — trades
            # CPU for the DRAM bandwidth that co-located cores contend on)
            "spark.io.compression.codec": os.environ.get(
                "SPARK_GRAFT_PROF_CODEC", "lz4"
            ),
        },
    )
    try:
        base = bench._load_transcripts(spark, bench.SF_DIR)
        n_base = base.count()
        wtmp = tempfile.mkdtemp(prefix="prof_warm_", dir=bench.TMP_ROOT)
        wrep = min(12 * cores, 48, REPLICATE)
        bench._timed_build(
            spark, bench._replicate(base, wrep), n_base * wrep, wtmp, "warm",
            cores=cores,
        )
        shutil.rmtree(wtmp, ignore_errors=True)
        ttmp = tempfile.mkdtemp(prefix="prof_timed_", dir=bench.TMP_ROOT)
        big = spark.read.parquet(input_path)
        t0 = time.time()
        wall, tput, _ = bench._timed_build(
            spark, big, n_input, ttmp, "timed", cores=cores,
        )
        shutil.rmtree(ttmp, ignore_errors=True)
        return {"wall": wall, "tput": tput, "t0": t0}
    finally:
        spark.stop()


def _parse_eventlog(path: str, t0: float) -> list[dict]:
    """Event log → per-stage rows (only stages submitted after t0, i.e. the
    timed build; the warmup's stages are filtered out by submission time)."""
    stages: dict[int, dict] = {}
    task_ms: dict[int, float] = {}
    gc_ms: dict[int, float] = {}
    task_n: dict[int, int] = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            if sub is None or sub / 1000.0 < t0:
                continue
            stages[sid] = {
                "stage": sid,
                "name": si["Stage Name"],  # keep the callsite after " at "
                "wall_s": round((si["Completion Time"] - sub) / 1000.0, 2),
                "tasks": si["Number of Tasks"],
            }
        elif k == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            task_ms[sid] = task_ms.get(sid, 0.0) + m.get("Executor Run Time", 0)
            gc_ms[sid] = gc_ms.get(sid, 0.0) + m.get("JVM GC Time", 0)
            task_n[sid] = task_n.get(sid, 0) + 1
    out = []
    for sid, row in sorted(stages.items()):
        row["core_s"] = round(task_ms.get(sid, 0.0) / 1000.0, 2)
        row["gc_s"] = round(gc_ms.get(sid, 0.0) / 1000.0, 2)
        out.append(row)
    return out


def main() -> None:
    import bench
    from websearchengine_spark.session import get_spark

    results: dict = {}
    # materialize the profiled input ONCE, unpinned, before any measurement
    in_root = tempfile.mkdtemp(prefix="prof_in_", dir=bench.TMP_ROOT)
    input_path = os.path.join(in_root, "transcripts")
    mspark = get_spark(app_name="prof-materialize")
    try:
        n_input = bench._materialize_input(mspark, REPLICATE, input_path)
    finally:
        mspark.stop()
    try:
        for cores in CORES:
            evdir = tempfile.mkdtemp(prefix=f"prof_ev_c{cores}_")
            with tempfile.NamedTemporaryFile("r", suffix=".json") as f:
                code = (
                    "import json, sys\n"
                    f"sys.path.insert(0, {REPO!r})\n"
                    "from scripts.scaling_profile import _phase\n"
                    f"r = _phase({cores}, {evdir!r}, {input_path!r}, {n_input})\n"
                    f"json.dump(r, open({f.name!r}, 'w'))\n"
                )
                cpu_list = ",".join(
                    str(c) for c in sorted(os.sched_getaffinity(0))[-cores:]
                )
                pin = ["taskset", "-c", cpu_list] if shutil.which("taskset") else []
                subprocess.run(
                    pin + [sys.executable, "-c", code], cwd=REPO, check=True,
                    stdout=sys.stderr,
                )
                r = json.load(open(f.name))
            logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
            r["stages"] = _parse_eventlog(logs[-1], r["t0"]) if logs else []
            shutil.rmtree(evdir, ignore_errors=True)
            results[f"c{cores}"] = r
    finally:
        # a failed pinned phase must not leak the materialized input
        # (tmpfs = pinned host RAM) or the event-log dirs
        shutil.rmtree(in_root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
