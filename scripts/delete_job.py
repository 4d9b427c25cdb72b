#!/usr/bin/env python
"""spark-submit entry point for live-index deletion
(plans/delete_index.py): tombstone docs now, or physically purge the
accumulated tombstones into a new index directory.

Cluster usage (same deployment shape as build_index_job.py /
merge_index_job.py):

    # tombstone whole conversations (O(deleted); index files untouched)
    spark-submit --py-files wse.zip scripts/delete_job.py tombstone \\
        --index s3://bucket/index --conv-ids c0091 c0412 \\
        [--corpus s3://bucket/transcripts]   # needed for textless indexes

    # tombstone specific turns from a TSV (conv_id<TAB>turn_idx)
    spark-submit ... scripts/delete_job.py tombstone \\
        --index /idx --turns-tsv /requests/deletions.tsv --corpus /transcripts

    # physical purge (compaction half): rewrite into a NEW directory
    spark-submit ... scripts/delete_job.py purge \\
        --index /idx --output /idx_purged --build-id nightly-purge

Nightly compactions purge automatically (merge_index_job.py --staging /
streaming.compact_incremental), so the explicit purge subcommand is for
redaction deadlines and standalone indexes. Prints one JSON line of
metrics."""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tombstone", help="logical delete (sidecar only)")
    t.add_argument("--index", required=True)
    t.add_argument("--conv-ids", nargs="+", default=None,
                   help="conversations to delete entirely")
    t.add_argument("--turns-tsv", default=None,
                   help="TSV of conv_id<TAB>turn_idx pairs to delete")
    t.add_argument("--corpus", default=None,
                   help="transcripts table with the deleted turns' text "
                        "(required when the index has no texts sidecar)")
    g = sub.add_parser("purge", help="physical rewrite without tombstoned docs")
    g.add_argument("--index", required=True)
    g.add_argument("--output", required=True,
                   help="NEW directory for the purged index")
    g.add_argument("--build-id", default="purge0")
    g.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args(argv)
    if args.cmd == "tombstone" and (args.conv_ids is None) == (args.turns_tsv is None):
        p.error("tombstone needs exactly one of --conv-ids / --turns-tsv")

    from pyspark.sql import SparkSession

    from websearchengine_spark.plans.delete_index import (
        purge_deletes,
        tombstone_delete,
    )

    spark = SparkSession.builder.appName(f"wse-delete-{args.cmd}").getOrCreate()
    try:
        if args.cmd == "tombstone":
            corpus = (
                spark.read.parquet(args.corpus)
                if args.corpus is not None
                else None
            )
            if args.conv_ids is not None:
                m = tombstone_delete(
                    spark, args.index, conv_ids=args.conv_ids, corpus=corpus
                )
            else:
                turns = (
                    spark.read.option("sep", "\t")
                    .schema("conv_id string, turn_idx int")
                    .csv(args.turns_tsv)
                )
                m = tombstone_delete(
                    spark, args.index, turns=turns, corpus=corpus
                )
        else:
            m = purge_deletes(
                spark, args.index, args.output,
                build_id=args.build_id,
                num_partitions=args.num_partitions,
            )
        print(json.dumps(m.__dict__))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
