"""Queries / qrels TSV sources (reference evaluation.cpp:662-694).

`read_queries` (evaluation.cpp:662-675): lines of `query_id \\t query`.
`read_relevance` (evaluation.cpp:677-694): MS-MARCO qrels
`query_id \\t 0 \\t doc_id \\t relevance` — the reference keeps one relevant
doc per query via hash-map overwrite, i.e. FILE-ORDER LAST-WINS on duplicate
query_ids. Reproduced exactly: max_by(doc_id, file_position), where
file_position = monotonically_increasing_id() — monotone in file order
because it encodes (partition_index, row_in_partition) and CSV splits of one
file are ordered by partition index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_queries(spark: SparkSession, path: str) -> DataFrame:
    """→ (query_id long, query string)."""
    return (
        spark.read.csv(path, sep="\t", schema="query_id long, query string")
        .filter(F.col("query_id").isNotNull())
        # an empty query line parses as NULL; the reference keeps it as the
        # empty string (zero-result query), so coalesce rather than drop
        .select("query_id", F.coalesce("query", F.lit("")).alias("query"))
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """→ (query_id long, rel_doc long) — one relevant doc per query."""
    raw = spark.read.csv(
        path, sep="\t",
        schema="query_id long, zero int, doc_id long, relevance int",
    ).withColumn("_pos", F.monotonically_increasing_id())
    return (
        raw.filter(F.col("relevance") > 0)
        .groupBy("query_id")
        .agg(F.max_by("doc_id", "_pos").alias("rel_doc"))
    )
