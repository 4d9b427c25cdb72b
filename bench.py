#!/usr/bin/env python
"""Benchmark harness for the PySpark-native WebSearchEngine rebuild.

Measures, at ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` (default 32):

- index-build throughput (turns/sec) of the physical compressed block index
  (the reference's create_index + merge_index passes, SURVEY.md §3), measured
  on a deterministically replicated input so the job is large enough to
  amortize per-stage overhead;
- the same build at 1/4 the cores → scaling efficiency, the sandbox stand-in
  for the north rule's "N vs 4N executors ≥ 0.8" criterion (no real cluster
  here; parallelism is the axis we can vary);
- BM25 top-k latency through the serving engine (block-max WAND + bounded
  heap): cold p50/p95 and cached lookups;
- the exhaustive DataFrame query path (the driver-gate plan) end-to-end.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "build_turns_per_sec": ..., "wand_p95_ms": ...,
   "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# replication factor for the throughput/scaling runs: big enough to amortize
# job overhead, small enough to keep the whole bench under a few minutes
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "12"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_BENCH_NO_SCALING", "") == "1"

BENCH_QUERIES = [
    "spark query", "hash join", "window agg stream", "the data", "scan",
    "sort merge batch", "vector value", "nosuchterm spark",
    "customer line value", "big small filter",
]


def _load_transcripts(spark, sf_dir: str):
    """documents.parquet → the transcripts shape from BASELINE.json
    input_hint (conv_id, turn_idx, role, text, tool, ts)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )


def _replicate(transcripts, factor: int):
    """Deterministic ×factor blow-up: each replica is a new conversation
    (conv_id suffixed), so docID assignment and postings stay well-formed."""
    from pyspark.sql import functions as F

    if factor <= 1:
        return transcripts
    return (
        transcripts.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .withColumn("conv_id", F.concat_ws("#", "conv_id", "rep"))
        .drop("rep")
    )


def _timed_build(spark, transcripts, n_turns: int, out_dir: str, tag: str):
    from websearchengine_spark.plans.block_index import build_block_index

    t0 = time.time()
    metrics = build_block_index(
        transcripts, out_dir, build_id=f"bench-{tag}", resume=False,
        n_buckets=32, num_partitions=CPUS,
    )
    wall = time.time() - t0
    return wall, n_turns / wall, metrics


def _run_at(master_cores: int, tag: str, results: dict, scaling_only: bool):
    """One SparkSession at local[master_cores]; returns after spark.stop()."""
    from websearchengine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{master_cores}]",
        app_name=f"wse-bench-{tag}",
        shuffle_partitions=max(master_cores, 8),
    )
    try:
        base = _load_transcripts(spark, SF_DIR)
        n_base = base.count()
        big = _replicate(base, REPLICATE)
        n_big = n_base * REPLICATE

        tmp = tempfile.mkdtemp(prefix=f"wse_bench_{tag}_")
        try:
            wall, tput, _ = _timed_build(spark, big, n_big, tmp, tag)
        finally:
            if scaling_only:
                shutil.rmtree(tmp, ignore_errors=True)
        results[f"build_block_index_x{REPLICATE}_c{master_cores}"] = round(wall, 3)
        results.setdefault("_tput", {})[master_cores] = tput

        if scaling_only:
            return None

        # ---- serving-engine latency (block-max WAND, bounded heap) -------
        from websearchengine_spark.operators.wand import BlockIndexReader

        reader = BlockIndexReader(tmp)
        lat_cold, lat_warm = [], []
        for mode in ("cold", "warm"):
            for q in BENCH_QUERIES:
                for conj in (True, False):
                    t0 = time.time()
                    reader.search(q, conjunctive=conj, k=10)
                    (lat_cold if mode == "cold" else lat_warm).append(
                        (time.time() - t0) * 1000.0
                    )
        lat_cold.sort()
        results["wand_query_suite"] = round(sum(lat_cold) / 1000.0, 3)
        results["_wand_p50_ms"] = lat_cold[len(lat_cold) // 2]
        results["_wand_p95_ms"] = lat_cold[int(len(lat_cold) * 0.95)]
        results["_wand_cached_p50_ms"] = sorted(lat_warm)[len(lat_warm) // 2]

        # ---- exhaustive DataFrame path (the correctness-gate plan) -------
        from websearchengine_spark.plans.gate_queries import (
            q_bm25_conjunctive, q_bm25_disjunctive,
        )

        t0 = time.time()
        q_bm25_conjunctive(spark, SF_DIR).collect()
        results["bm25_conjunctive_exhaustive"] = round(time.time() - t0, 3)
        t0 = time.time()
        q_bm25_disjunctive(spark, SF_DIR).collect()
        results["bm25_disjunctive_exhaustive"] = round(time.time() - t0, 3)

        # ---- training-data pipeline ops over the documents table ---------
        try:
            from websearchengine_spark.plans.pipeline_gate import pipeline_bench_fns

            for name, fn in pipeline_bench_fns().items():
                t0 = time.time()
                fn(spark, SF_DIR).collect()
                results[name] = round(time.time() - t0, 3)
        except ImportError:
            pass
        return tmp
    finally:
        spark.stop()


def main() -> None:
    results: dict = {}
    lo_cores = max(CPUS // 4, 1)

    if not SKIP_SCALING:
        _run_at(lo_cores, "lo", results, scaling_only=True)
    tmp = _run_at(CPUS, "hi", results, scaling_only=False)
    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)

    tput = results.pop("_tput", {})
    scaling = None
    if lo_cores in tput and CPUS in tput and not SKIP_SCALING:
        eff = (tput[CPUS] / tput[lo_cores]) / (CPUS / lo_cores)
        scaling = {
            "cores_lo": lo_cores,
            "cores_hi": CPUS,
            "turns_per_sec_lo": round(tput[lo_cores], 1),
            "turns_per_sec_hi": round(tput[CPUS], 1),
            "efficiency": round(eff, 3),
        }

    extras = {k: results.pop(k) for k in list(results) if k.startswith("_")}
    queries = {k: v for k, v in results.items()}
    out = {
        "metric": "block_index_build_plus_bm25_query_suite",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "build_turns_per_sec": round(tput.get(CPUS, 0.0), 1),
        "wand_p50_ms": round(extras.get("_wand_p50_ms", 0.0), 3),
        "wand_p95_ms": round(extras.get("_wand_p95_ms", 0.0), 3),
        "wand_cached_p50_ms": round(extras.get("_wand_cached_p50_ms", 0.0), 4),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
