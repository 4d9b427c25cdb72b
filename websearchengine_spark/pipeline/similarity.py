"""Similarity search over the embeddings table (array<float> column).

- ``cosine_topk``: exact brute-force cosine top-k — the baseline/oracle path.
- ``lsh_signatures`` / ``ann_lsh_topk``: hyperplane-LSH approximate NN — the
  scale path: vectors bucket by a sign-bit signature; a query only scores
  its own bucket.

Determinism across engines: the LSH hyperplanes are pseudo-random ±1
vectors derived from the shared md5 hash (coefficient sign = parity of
h60(plane || ':' || dim)), and the sign decision dot(v, plane) uses
*fixed-point* embeddings (round(x·10^4) as int64) so the comparison is exact
integer arithmetic — no float-summation-order ambiguity between Spark and
DuckDB. Final cosine scores are float64 rounded to 6.

Scale notes: brute force is O(Q·N·d) — fine for reranking a bucket, not for
N = 10^9. The LSH path shuffles once by bucket id (uniform by construction);
skewed buckets (near-duplicate clusters) are handled the same way as hot
terms in the index build — split oversized buckets by a secondary salt. An
IVF variant (k-means coarse quantizer) would drop in at the same seam but is
not deterministic across engines, so LSH is the checked implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.hashing import h60

FIXED_POINT = 10_000  # fixed-point scale for exact cross-engine sign decisions


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    na, nb = dot_col(a, a), dot_col(b, b)
    return F.when(
        (na > 0) & (nb > 0), dot_col(a, b) / F.sqrt(na * nb)
    ).otherwise(F.lit(0.0))


def _as_double(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k: the first ``n_queries`` vec_ids are
    the query set, scored against the whole table (self-match excluded).
    (query_id, rank, vec_id, cosine) — rank by (cosine DESC, vec_id ASC) on
    the ROUND()ed score so ranking is ulp-stable across engines."""
    e = _as_double(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_signatures(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Hyperplane-LSH signature per vector: bit p = 1 iff
    Σ_d sign(p,d)·fx(v_d) > 0, where sign(p,d) = ±1 from parity of
    h60(p ':' d) and fx = round(v_d·10^4)::int64 (exact integer dot).
    (vec_id, sig) with sig ∈ [0, 2^n_planes)."""
    fx = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * FIXED_POINT, 0).cast("long")
    )
    # per-plane signed sums, computed JVM-side over the fixed-point array;
    # plane coefficients resolve to literals? no — parity of h60 must be a
    # column expression over (p, d); build via explode of (plane, dim) grid
    rows = embeddings.select("vec_id", fx.alias("fx")).select(
        "vec_id",
        F.posexplode("fx").alias("d", "x"),
    )
    planes = rows.select(
        "vec_id",
        "d",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"),
    ).withColumn(
        "sgn",
        F.when(
            h60(
                F.concat_ws(":", F.col("p").cast("string"), F.col("d").cast("string"))
            ).bitwiseAND(F.lit(1))
            == 1,
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )
    dots = planes.groupBy("vec_id", "p").agg(
        F.sum(F.col("sgn") * F.col("x")).alias("dot")
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("dot") > 0,
                F.expr("shiftleft(cast(1 as bigint), cast(p as int))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sig")
    )


def ann_lsh_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Approximate NN: score only vectors sharing the query's LSH bucket,
    then exact-cosine rank within the bucket. (query_id, rank, vec_id,
    cosine). Recall < 1 vs cosine_topk by design; the oracle runs the same
    bucketed computation, so the *check* is still exact."""
    sigs = lsh_signatures(embeddings, n_planes=n_planes)
    e = _as_double(embeddings).join(sigs, "vec_id")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("sig").alias("qsig"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("sig") == F.col("qsig"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
