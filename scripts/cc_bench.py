#!/usr/bin/env python
"""Head-to-head bench of the two connected-components variants behind
pipeline/dedup.dup_groups (VERDICT r3 #8): min-label pointer jumping vs
alternating large-star/small-star (Kiveris et al. 2014).

Two planted graphs, both sized like real near-dup pair sets at bench scale:

- ``clusters``: the realistic regime — near-dup groups are shallow
  stars/cliques. N_CLUSTERS planted components, sizes Zipf-ish in
  [2, MAX_CLUSTER], each wired as a random spanning tree plus a few chords
  (what MinHash-LSH pair output looks like after the exact-Jaccard verify).
- ``chain``: the adversarial regime — ONE path of CHAIN_LEN nodes
  (diameter = CHAIN_LEN − 1), the worst case for label propagation and the
  case the star algorithm's near-linear intermediate-size guarantee is for.

Both variants run on the same materialized edge DataFrame; we record wall
seconds, driver-coordinated rounds to converge, and verify the two produce
IDENTICAL (doc_id, group_id) assignments. Prints one JSON line; paste the
numbers into BASELINE.md and point the dup_groups docstring at the winner.

Usage: python scripts/cc_bench.py [--quick] 2>/dev/null
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _planted_clusters(rng, n_clusters: int, max_size: int):
    """Random spanning tree + ~20% chord edges per planted cluster."""
    edges = []
    next_id = 0
    # Zipf-ish sizes in [2, max_size]
    sizes = 2 + (
        (max_size - 2) * (rng.random(n_clusters) ** 3)
    ).astype(np.int64)
    for s in sizes:
        ids = next_id + rng.permutation(s)
        next_id += int(s)
        # spanning tree: node i attaches to a random earlier node
        for i in range(1, int(s)):
            edges.append((int(ids[i]), int(ids[rng.integers(0, i)])))
        for _ in range(int(s) // 5):
            a, b = rng.integers(0, s, 2)
            if a != b:
                edges.append((int(ids[a]), int(ids[b])))
    return edges


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true", help="10x smaller graphs")
    p.add_argument("--chain-len", type=int, default=60_000)
    p.add_argument("--n-clusters", type=int, default=60_000)
    p.add_argument("--max-cluster", type=int, default=64)
    args = p.parse_args(argv)
    scale = 10 if args.quick else 1

    from pyspark.sql import functions as F

    from websearchengine_spark.pipeline.dedup import dup_groups
    from websearchengine_spark.session import get_spark

    spark = get_spark(app_name="cc-bench", shuffle_partitions=32)
    rng = np.random.default_rng(14)

    chain_len = args.chain_len // scale
    chain_edges = [(i, i + 1) for i in range(chain_len - 1)]
    cluster_edges = _planted_clusters(
        rng, args.n_clusters // scale, args.max_cluster
    )

    out = {"metric": "cc_variants_head_to_head", "graphs": {}}
    for name, edges in (("clusters", cluster_edges), ("chain", chain_edges)):
        edf = (
            spark.createDataFrame(edges, "doc_a long, doc_b long")
            .repartition(32)
            .persist()
        )
        n_edges = edf.count()  # materialize once, outside both timed runs
        graph = {"n_edges": n_edges, "variants": {}}
        results = {}
        for algo in ("pointer_jump", "star"):
            stats: dict = {}
            t0 = time.perf_counter()
            labels = dup_groups(edf, max_iter=200, algorithm=algo, stats=stats)
            rows = labels.collect()
            wall = time.perf_counter() - t0
            results[algo] = sorted((r["doc_id"], r["group_id"]) for r in rows)
            graph["variants"][algo] = {
                "wall_s": round(wall, 2),
                "rounds": stats.get("rounds"),
                "n_nodes": len(rows),
                "n_groups": len({g for _, g in results[algo]}),
            }
        identical = results["pointer_jump"] == results["star"]
        graph["identical_assignments"] = identical
        out["graphs"][name] = graph
        edf.unpersist()
        if not identical:
            print(json.dumps(out))
            print("MISMATCH between variants on", name, file=sys.stderr)
            return 1
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
