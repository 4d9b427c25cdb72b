"""Physical ANN index: hyperplane-LSH-bucketed vector table at rest.

The similarity plane's scale path, materialized the same way the text
index is: Spark computes production LSH signatures
(pipeline/similarity.lsh_signatures — one int64 matmul per Arrow batch)
and writes the vectors hive-partitioned by ``sig``; a query then touches
exactly one partition (its bucket) instead of the whole table. The
pyarrow-only serving counterpart is operators/ann_service.AnnService.

Bucket skew (near-duplicate clusters): the partition layout carries a
``bn`` bucket-size column in meta so the reader can report/cap oversized
buckets; candidate-pair jobs over the same layout reuse the salting in
pipeline/dedup.embedding_dup_pairs_lsh.

At 10^9 vectors × 2^n_planes buckets this is one shuffle by a uniform key
and a partitioned write — the exact shape of the text index build, and
idempotent the same way (dynamic partition overwrite).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.similarity import FIXED_POINT, lsh_signatures


def build_ann_index(
    embeddings: DataFrame, out_dir: str, n_planes: int = 8
) -> dict:
    """embeddings(vec_id, embedding) → ``out_dir/vectors/sig=*/`` +
    ``out_dir/meta``. Returns {n_vectors, n_buckets_used, dim}."""
    spark = embeddings.sparkSession
    sigs = lsh_signatures(embeddings, n_planes=n_planes)
    vecs = embeddings.join(sigs, "vec_id").select(
        "sig", "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    (
        vecs.repartition("sig")
        # sig leads: satisfies the writer's partition-order requirement so
        # no unstable Sort(sig) is inserted over the sorted rows (see
        # plans/block_index.py blocks write)
        .sortWithinPartitions("sig", "vec_id")
        .write.partitionBy("sig")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    row = embeddings.select(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("dim"),
    ).collect()[0]
    # empty input (a vectorless shard / day-0 rebuild): the partitioned
    # write leaves a fileless dir, so the bucket-count read-back cannot
    # infer a schema — and max(size) aggregates to NULL
    n_buckets = (
        spark.read.parquet(os.path.join(out_dir, "vectors"))
        .select("sig")
        .distinct()
        .count()
        if int(row["n"])
        else 0
    )
    meta = {
        "n_vectors": int(row["n"]),
        "dim": int(row["dim"]) if row["dim"] is not None else 0,
        "n_planes": int(n_planes),
        "fixed_point": int(FIXED_POINT),
        "n_buckets_used": int(n_buckets),
    }
    spark.createDataFrame(
        [tuple(meta.values())],
        "n_vectors long, dim int, n_planes int, fixed_point long, n_buckets_used int",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "meta"))
    return meta


def build_ivf_index(
    embeddings: DataFrame, out_dir: str, n_lists: int = 16
) -> dict:
    """Materialized IVF-flat index (the FAISS layout, Spark-built): the
    coarse-quantizer assignment pass of pipeline/similarity.ivf_assignments
    (ONE broadcast of the centroid table + a map-side-combinable max_by —
    the shuffle carries exactly N rows) written as ``out_dir/vectors/
    list_id=*/`` plus a ``centroids`` sidecar and ``meta``. A query then
    reads EXACTLY its nprobe partitions (operators/ann_service.IvfService),
    no Spark. Same seam as the LSH pair (build_ann_index/AnnService);
    trained k-means centroids drop in through _centroids without touching
    this layout."""
    from websearchengine_spark.pipeline.similarity import (
        _as_double,
        _centroids,
        ivf_assignments,
    )

    spark = embeddings.sparkSession
    e = _as_double(embeddings)
    asg = ivf_assignments(embeddings, n_lists=n_lists)
    (
        e.join(asg, "vec_id")
        .select("list_id", "vec_id", "v")
        .repartition("list_id")
        .sortWithinPartitions("list_id", "vec_id")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    _centroids(e, n_lists).select("list_id", F.col("cv").alias("v")).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    row = embeddings.select(
        F.count(F.lit(1)).alias("n"), F.max(F.size("embedding")).alias("dim")
    ).collect()[0]
    meta = {
        "n_vectors": int(row["n"]),
        "dim": int(row["dim"]) if row["dim"] is not None else 0,
        "n_lists": int(n_lists),
    }
    spark.createDataFrame(
        [tuple(meta.values())], "n_vectors long, dim int, n_lists int"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "meta"))
    return meta
