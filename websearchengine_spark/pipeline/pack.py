"""Training-data assembly operators: sequence packing and deterministic
train/val splitting over the ``documents`` table.

Sequence packing is the LLM-pretraining layout step: concatenate the token
streams of all documents in a canonical order (doc_id ASC) and cut the
stream at fixed ``seq_len`` boundaries; a document then occupies the pack
range [first_pack, last_pack]. The semantics are exactly a global running
token offset — the same two-level numbering problem as dense docID
assignment (operators/docids.py), so the plan is the same scale shape:

1. project (doc_id, n_tokens) BEFORE the shuffle (the text column never
   moves — at 100 TB this is the difference between shuffling ~16 B/doc
   and shuffling the corpus);
2. range-repartition by doc_id + sort within partitions (the one shuffle
   any global order needs);
3. per-partition token sums → prefix offsets on the driver (one number per
   partition);
4. mapInPandas adds offset[pid] + intra-partition exclusive cumsum — no
   second shuffle, embarrassingly parallel.

A ``row_number()/sum() OVER (ORDER BY ...)`` global window is the
single-partition non-starter this replaces. The DuckDB oracle in
plans/pipeline_gate.py IS that window — fine at gate scale, and the
equality of the two is what the gate checks.

Train/val splitting is a pure narrow map: a content hash (md5-derived h60,
identical integers in Spark and DuckDB) mod 1000 against a permille
threshold. Content-keyed (not doc_id-keyed) so the assignment is stable
under re-partitioning, re-ingestion, and docID renumbering.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.hashing import h60, tokens


def seq_pack(
    docs: DataFrame,
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its token span in the packed training stream.

    Returns (doc_id, n_tokens, token_start, first_pack, last_pack,
    n_packs): ``token_start`` is the exclusive prefix sum of ``n_tokens``
    in doc_id order; packs are ``seq_len``-token windows of the
    concatenated stream; a 0-token document spans 0 packs.

    Output depends only on the total doc_id order, so it is deterministic
    and partition-count-invariant (tested). The range-partitioned frame
    stays persisted until the result is materialized for the same reason
    assign_doc_ids pins its cache: range-boundary sampling is seeded by
    the physical RDD id, and a re-execution after eviction could renumber
    rows against the driver-collected offsets.
    """
    spark = docs.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    toked = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    part = (
        toked.repartitionByRange(n, "doc_id")
        .sortWithinPartitions("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sums = {
        r["_pid"]: r["s"]
        for r in part.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(sums) + 1 if sums else 0):
        offsets[pid] = acc
        acc += int(sums.get(pid) or 0)

    out_schema = (
        "doc_id long, n_tokens long, token_start long, "
        "first_pack long, last_pack long, n_packs long"
    )

    def add_spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            nt = pdf["n_tokens"].to_numpy(dtype=np.int64)
            cum = np.cumsum(nt)
            start = seen + cum - nt  # exclusive prefix sum
            seen += int(cum[-1]) if len(cum) else 0
            first = start // seq_len
            last = np.where(nt > 0, (start + nt - 1) // seq_len, first)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_tokens": nt,
                    "token_start": start,
                    "first_pack": first,
                    "last_pack": last,
                    "n_packs": np.where(nt > 0, last - first + 1, 0),
                }
            )

    return part.mapInPandas(add_spans, out_schema)


def train_val_split(docs: DataFrame, val_permille: int = 50) -> DataFrame:
    """Deterministic content-hash train/val assignment.

    (doc_id, h_mod, split): ``h_mod = h60(text) % 1000`` (h60 is 60-bit
    non-negative, so both engines' % agree); split = 'val' for the top
    ``val_permille`` buckets, 'train' otherwise. Zero shuffle — a narrow
    JVM-side map that scales to any corpus size, and the content keying
    keeps a document's split stable across re-ingestions.
    """
    hmod = h60(F.col("text")) % 1000
    return docs.select(
        "doc_id",
        hmod.alias("h_mod"),
        F.when(hmod >= 1000 - val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
