#!/usr/bin/env python
"""spark-submit entry point: transcripts table → compressed block index.

Cluster usage (the north rule's deployment shape):

    zip -r wse.zip websearchengine_spark
    spark-submit --master yarn --deploy-mode cluster \\
        --py-files wse.zip \\
        scripts/build_index_job.py \\
        --input catalog.db.transcripts --output s3://bucket/index \\
        --n-buckets 4096 --num-partitions 8192 --build-id nightly-01

Local smoke:

    spark-submit --master 'local[4]' --py-files wse.zip \\
        scripts/build_index_job.py --input /path/turns.parquet --output /tmp/idx

Resumable: rerunning with the same --build-id skips completed buckets
(per-partition checkpoints with input fingerprint; see
plans/block_index.py). Prints one JSON line of build metrics.
"""

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
    p.add_argument("--input", required=True, help="transcripts parquet path or catalog table")
    p.add_argument("--output", required=True, help="index output directory")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--build-id", default="build0")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--hot-df-threshold", type=int, default=100_000)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from websearchengine_spark.plans.block_index import build_block_index
    from websearchengine_spark.sources.catalog import read_table

    spark = SparkSession.builder.appName(f"wse-build-{args.build_id}").getOrCreate()
    transcripts = read_table(spark, args.input)
    metrics = build_block_index(
        transcripts,
        args.output,
        n_buckets=args.n_buckets,
        block_size=args.block_size,
        num_partitions=args.num_partitions,
        build_id=args.build_id,
        resume=not args.no_resume,
        hot_df_threshold=args.hot_df_threshold,
    )
    print(json.dumps(metrics.__dict__))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
