"""Similarity search over the embeddings table (array<float> column).

- ``cosine_topk``: exact brute-force cosine top-k — the baseline/oracle path.
- ``lsh_signatures`` / ``ann_lsh_topk``: hyperplane-LSH approximate NN — the
  scale path: vectors bucket by a sign-bit signature; a query only scores
  its own bucket.

- ``ivf_assignments`` / ``ivf_topk``: IVF-flat approximate NN — the second
  scale path: vectors partition into ``n_lists`` inverted lists by nearest
  coarse-quantizer centroid; a query scores only its ``nprobe`` nearest
  lists.

Determinism across engines: the LSH hyperplanes are pseudo-random ±1
vectors derived from the shared md5 hash (coefficient sign = parity of
h60(plane || ':' || dim)), and the sign decision dot(v, plane) uses
*fixed-point* embeddings (round(x·10^4) as int64) so the comparison is exact
integer arithmetic — no float-summation-order ambiguity between Spark and
DuckDB. Final cosine scores are float64 rounded to 6.

Scale notes: brute force is O(Q·N·d) — fine for reranking a bucket, not for
N = 10^9. The LSH path shuffles once by bucket id (uniform by construction);
skewed buckets (near-duplicate clusters) are handled the same way as hot
terms in the index build — split oversized buckets by a secondary salt. The
IVF path uses deterministic SAMPLED centroids (the ``n_lists`` lowest
vec_ids), which makes the whole quantizer cross-engine exact — the
assignment argmax runs on ROUND(cosine, 6) with a centroid-id tie-break, the
same ulp-stability device every top-k gate uses. On a real cluster you'd
swap in trained k-means centroids through the same broadcast seam (the
assignment/probe plans are unchanged; random-sample init is itself a
legitimate coarse quantizer).
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


def plane_signs(n_planes: int, dim: int) -> "np.ndarray":
    """(dim × n_planes) ±1 hyperplane matrix from the SAME md5-parity
    constants the SQL oracle embeds: sign(p,d) = +1 iff h60(f"{p}:{d}") is
    odd. Derived driver/worker-side with hashlib (md5 is md5 everywhere)."""
    import hashlib

    import numpy as np

    s = np.empty((dim, n_planes), dtype=np.int64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            s[d, p] = 1 if h & 1 else -1
    return s


def lsh_signatures(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Production hyperplane-LSH signatures: bit p = 1 iff
    Σ_d sign(p,d)·fx(v_d) > 0 with fx = round(v_d·10^4)::int64.

    Physical plan: the fixed-point step is a JVM column expression (the
    IDENTICAL expression the oracle uses — no Python rounding-parity risk),
    then ONE Arrow-batched ``mapInPandas`` does an int64 matmul per batch:
    O(batch·dim·planes) multiply-adds in BLAS, zero row explosion. The
    prior pure-column plan exploded (vector × dim × planes) rows through
    two shuffles — ~6×10^12 shuffle rows at 10^9 vectors × 384 dims × 16
    planes for what is one tiny matmul per vector; it survives as
    :func:`lsh_signatures_explode`, the oracle-check plan (pytest asserts
    bit-identity; integer arithmetic makes that exact).
    (vec_id, sig) with sig ∈ [0, 2^n_planes)."""
    import numpy as np
    import pandas as pd

    fx = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * FIXED_POINT, 0).cast("long")
    )
    src = embeddings.select("vec_id", fx.alias("fx"))

    def sig_batches(pdfs):
        signs = None
        shifts = np.arange(n_planes, dtype=np.int64)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["fx"].to_numpy()).astype(np.int64)
            if signs is None or signs.shape[0] != m.shape[1]:
                signs = plane_signs(n_planes, m.shape[1])
            dots = m @ signs  # exact: |fx| ≤ ~1e5, dim ≤ ~1e3 ≪ 2^63
            sig = ((dots > 0).astype(np.int64) << shifts).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "sig": pd.Series(sig, dtype="int64"),
                }
            )

    return src.mapInPandas(sig_batches, "vec_id long, sig long")


def lsh_signatures_explode(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Oracle-check plan (pure column expressions, SQL-mirrorable 1:1):
    explodes (vector × dim × planes) rows — kept ONLY to check
    :func:`lsh_signatures` bit-identity in tests; never the scale path."""
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
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 8,
    pre_topk_salt: int = 0,
) -> DataFrame:
    """Approximate NN: score only vectors sharing the query's LSH bucket,
    then exact-cosine rank within the bucket. (query_id, rank, vec_id,
    cosine). Recall < 1 vs cosine_topk by design; the oracle runs the same
    bucketed computation, so the *check* is still exact.

    Skewed buckets (near-duplicate clusters ⇒ one bucket ≫ the mean): the
    cosine compute itself stays distributed (broadcast join preserves the
    doc side's partitioning), but the final per-query window shuffles the
    whole bucket to one task. ``pre_topk_salt = s > 0`` inserts a two-phase
    top-k: rank within (query_id, vec_id % s) first and keep k per salt —
    the global top-k is a subset of the union of per-salt top-ks (every
    global winner ranks ≤ k within its own salt, ties resolved by the same
    (cosine DESC, vec_id ASC) key), so the output is IDENTICAL, while the
    skewed window shrinks from |bucket| to s·k rows."""
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
    if pre_topk_salt > 0:
        w1 = Window.partitionBy("query_id", "salt").orderBy(
            F.desc("cosine"), F.asc("vec_id")
        )
        scored = (
            scored.withColumn("salt", (F.col("vec_id") % pre_topk_salt).cast("int"))
            .withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= k)
            .drop("salt", "r1")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _centroids(e: DataFrame, n_lists: int) -> DataFrame:
    """Deterministic sampled coarse quantizer: the ``n_lists`` lowest
    vec_ids ARE the centroids. Trained k-means centroids drop in through
    the same broadcast seam without touching the assignment/probe plans."""
    return e.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("list_id"), F.col("v").alias("cv")
    )


def ivf_assignments(embeddings: DataFrame, n_lists: int = 16) -> DataFrame:
    """IVF coarse assignment: (vec_id, list_id) with
    list_id = argmax_c ROUND(cosine(v, centroid_c), 6), ties → lowest
    centroid id (the standard ulp-stability device, so the argmax is
    cross-engine exact).

    Physical plan: ONE broadcast of the centroid table against the vector
    scan (O(N·n_lists·d) multiply-adds, a narrow map), then a map-side
    combinable ``max_by`` hash aggregate — the shuffle carries exactly N
    rows, no window over N·n_lists rows. At 10^9 vectors × 2^14 lists this
    is the canonical IVF build shape (FAISS's assignment pass, distributed)."""
    e = _as_double(embeddings)
    scored = e.crossJoin(F.broadcast(_centroids(e, n_lists))).withColumn(
        "sim", F.round(cosine_col(F.col("v"), F.col("cv")), 6)
    )
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "list_id", F.struct(F.col("sim"), (-F.col("list_id")).alias("nl"))
        ).alias("list_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate NN: per query, rank only the vectors assigned
    to its ``nprobe`` nearest inverted lists; exact cosine + the shared
    (cosine DESC, vec_id ASC) top-k within the probed lists.
    (query_id, rank, vec_id, cosine). Recall < 1 vs cosine_topk by design
    (the check is still exact — the oracle probes identically); with
    ``nprobe == n_lists`` the probed set is the whole table and the output
    EQUALS cosine_topk exactly (pytest-asserted).

    Scale: assignments are one broadcast-join + hash-agg pass; the probe
    join broadcasts (query × nprobe) rows against the assignment-joined
    vector table, so a materialized list_id-partitioned layout (same seam
    as plans/ann_index.py) serves a query from exactly nprobe partitions."""
    e = _as_double(embeddings)
    cents = _centroids(e, n_lists)
    asg = ivf_assignments(embeddings, n_lists=n_lists)
    ev = e.join(asg, "vec_id")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("list_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cosine_col(F.col("qv"), F.col("cv")), 6))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        F.broadcast(probes)
        .join(ev, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
