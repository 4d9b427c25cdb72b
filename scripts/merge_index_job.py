#!/usr/bin/env python
"""spark-submit entry point: merge a base block index with a delta index
(or absorb newly staged streaming batches) without a full rebuild.

Cluster usage (the north rule's deployment shape; see build_index_job.py):

    spark-submit --master yarn --deploy-mode cluster --py-files wse.zip \\
        scripts/merge_index_job.py \\
        --base s3://bucket/index --delta s3://bucket/index_delta \\
        --output s3://bucket/index_v2 --build-id nightly-02-merge

Streaming-staging mode (derives the delta from batches staged AFTER the
base index's docID range — see streaming/ingest.py::compact_incremental):

    spark-submit ... scripts/merge_index_job.py \\
        --base /idx --staging /staging --output /idx_v2

Prints one JSON line of merge metrics. Reference analogue:
merge_index.cpp:353-493 (the merge pass over existing sorted runs)."""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python scripts/...` runs (the spark-submit path ships the package
# via --py-files instead, which also works — the insert is harmless there);
# PYTHONPATH propagates the package to local-mode python WORKERS, which fork
# with the environment, not the driver's sys.path
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="existing index directory")
    p.add_argument("--delta", action="append", default=None,
                   help="delta index directory (repeatable: k deltas merge "
                        "in ONE pass, in the order given — the reference's "
                        "N-input merge_index shape; mutually exclusive with "
                        "--staging)")
    p.add_argument("--staging", default=None,
                   help="streaming staging dir; batches beyond the base index's "
                        "docID range become the delta")
    p.add_argument("--output", required=True, help="merged index output directory")
    p.add_argument("--build-id", default="merge0")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="output buckets (default: the base index's)")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--hot-df-threshold", type=int, default=100_000)
    p.add_argument("--drop-texts", action="store_true",
                   help="deliberately drop the texts sidecar from the "
                        "merged index (disables snippet serving; the only "
                        "way to merge mixed texts/textless inputs)")
    p.add_argument("--purge-tombstones", action="store_true",
                   help="drop each input's tombstoned docs (plans/"
                        "delete_index.py sidecar) during this merge — the "
                        "one-pass nightly-compaction shape. Without it, a "
                        "tombstoned --delta input is refused (--staging "
                        "mode always purges the base's tombstones)")
    args = p.parse_args(argv)
    if (args.delta is None) == (args.staging is None):
        p.error("exactly one of --delta / --staging is required")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"wse-merge-{args.build_id}").getOrCreate()
    if args.delta is not None:
        from websearchengine_spark.plans.merge_index import (
            merge_many_block_indexes,
        )

        metrics = merge_many_block_indexes(
            spark, [args.base, *args.delta], args.output,
            build_id=args.build_id,
            n_buckets=args.n_buckets,
            hot_df_threshold=args.hot_df_threshold,
            num_partitions=args.num_partitions,
            drop_texts=args.drop_texts,
            purge_tombstones=args.purge_tombstones,
        )
    else:
        from websearchengine_spark.streaming.ingest import compact_incremental

        metrics = compact_incremental(
            spark, args.staging, args.base, args.output,
            build_id=args.build_id,
            hot_df_threshold=args.hot_df_threshold,
            drop_texts=args.drop_texts,
            **({"n_buckets": args.n_buckets} if args.n_buckets else {}),
            **({"num_partitions": args.num_partitions}
               if args.num_partitions else {}),
        )
        if metrics is None:
            print(json.dumps({"merged": False, "reason": "no new batches"}))
            spark.stop()
            return 0
    print(json.dumps(metrics.__dict__))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
