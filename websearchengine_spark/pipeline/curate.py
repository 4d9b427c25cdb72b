"""End-to-end corpus curation: the composed training-data pipeline.

One declarative plan chaining the pipeline operators the way a real
pretraining-data job does:

  1. exact dedup        — keep the min-doc_id survivor per identical text;
  2. quality filter     — drop documents below a quality-score threshold;
  3. language filter    — keep the target language (stopword heuristic);
  4. near-dup resolution— MinHash-LSH pairs → connected components → keep
                          each group's min-doc_id representative.

Output: one row per SURVIVING doc with the evidence columns
(doc_id, quality, lang_pred, group_id) — group_id = doc_id for docs with
no near-duplicate. Everything is a single Catalyst plan (the stages are
joins/filters over shared scans, not materialized passes); the DuckDB
oracle recomputes the identical pipeline in plans/pipeline_gate.py.

Scale notes: stages 1-3 are narrow (hash-shuffle on content hash, per-row
scoring); stage 4's candidate generation is the banded self-join from
dedup.minhash_lsh_pairs and its CC runs over the (tiny) dup-pair graph,
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.pipeline import dedup, textstats
from websearchengine_spark.pipeline.hashing import h60


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    lang: str = "en",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """→ (doc_id, quality, lang_pred, group_id) for every surviving doc."""
    # 1) exact dedup: survivor = min doc_id per content hash
    exact_survivors = (
        docs.groupBy(h60("text").alias("th"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(exact_survivors, "doc_id")

    # 2) + 3) quality and language, computed on the surviving set
    q = textstats.quality_score(kept).select("doc_id", "quality")
    l = textstats.lang_id(kept).select("doc_id", "lang_pred")
    scored = (
        kept.select("doc_id")
        .join(q, "doc_id")
        .join(l, "doc_id")
        .filter((F.col("quality") >= min_quality) & (F.col("lang_pred") == lang))
    )

    # 4) near-dup groups over what's left; keep each group's min member
    remaining_docs = docs.join(scored.select("doc_id"), "doc_id")
    pairs = dedup.minhash_lsh_pairs(remaining_docs, threshold=jaccard_threshold)
    groups = dedup.dup_groups(pairs)
    out = scored.join(groups, "doc_id", "left").withColumn(
        "group_id", F.coalesce("group_id", F.col("doc_id"))
    )
    return out.filter(F.col("doc_id") == F.col("group_id")).select(
        "doc_id", "quality", "lang_pred", "group_id"
    )


def domain_mix(docs: DataFrame, rates: dict[str, int], key_col: str = "source") -> DataFrame:
    """Deterministic per-domain mixture sampling: keep each doc with
    probability ``rates[domain] / 1000`` (permille), decided by a content
    hash — the domain-weighting step of a pretraining-data pipeline
    (up/down-sample sources to hit a target mixture).

    Keep rule: ``h60(domain || ':' || doc_id) % 1000 < rate``. Hash-based
    (like pl_train_val_split), so the sample is stable under re-ingestion,
    reshuffling, and incremental appends — no RNG state, no sort order
    dependence. Domains absent from ``rates`` are dropped (rate 0).

    Scale shape: one narrow map + a broadcast join of the (domain, rate)
    table; no corpus shuffle at any size."""
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        [(d, int(r)) for d, r in rates.items()] or [("", 0)],
        f"{key_col} string, _rate int",
    )
    bucket = F.pmod(
        h60(F.concat_ws(":", F.col(key_col), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    return (
        docs.join(F.broadcast(rates_df), key_col)
        .filter(bucket < F.col("_rate"))
        .drop("_rate")
    )
