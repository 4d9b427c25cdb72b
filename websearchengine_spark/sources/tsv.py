"""Queries / qrels TSV sources (reference evaluation.cpp:662-694).

`read_queries` (evaluation.cpp:662-675): lines of `query_id \\t query`.
`read_relevance` (evaluation.cpp:677-694): MS-MARCO qrels
`query_id \\t 0 \\t doc_id \\t relevance` — the reference keeps one relevant
doc per query (hash-map overwrite on duplicate query_id; reproduced with a
max aggregation for determinism instead of file-order last-wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_queries(spark: SparkSession, path: str) -> DataFrame:
    """→ (query_id long, query string)."""
    return (
        spark.read.csv(path, sep="\t", schema="query_id long, query string")
        .filter(F.col("query_id").isNotNull())
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """→ (query_id long, rel_doc long) — one relevant doc per query."""
    raw = spark.read.csv(
        path, sep="\t",
        schema="query_id long, zero int, doc_id long, relevance int",
    )
    return (
        raw.filter(F.col("relevance") > 0)
        .groupBy("query_id")
        .agg(F.max("doc_id").alias("rel_doc"))
    )
