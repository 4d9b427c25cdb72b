"""Queries / qrels TSV sources (reference evaluation.cpp:662-694).

`read_queries` (evaluation.cpp:662-675): lines of `query_id \\t query`.
`read_relevance` (evaluation.cpp:677-694): MS-MARCO qrels
`query_id \\t 0 \\t doc_id \\t relevance` — the reference keeps one relevant
doc per query via hash-map overwrite, i.e. FILE-ORDER LAST-WINS on duplicate
query_ids. Reproduced exactly with an EXPLICIT line-number source: each file
is read wholetext and split into (file, line_no) rows, so last-wins is
max_by(doc_id, (file, line_no)) regardless of how Spark bin-packs splits
(plain CSV partition indices follow size-descending split packing, NOT file
order, once input spans several files/splits). Qrels files are tiny by
nature (MS MARCO: a few MB), so wholetext-per-file costs nothing; for a
multi-file glob, "file order" is lexicographic path order.
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
    """→ (query_id long, rel_doc long) — one relevant doc per query,
    file-order last-wins (see module docstring for the split-order
    guard)."""
    lines = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"),
        F.posexplode(F.split(F.col("value"), "\r?\n")).alias("_line_no", "_line"),
    )
    # try_* variants: blank/short/garbage lines become NULLs and are
    # filtered, instead of failing the ANSI cast
    cols = F.split(F.col("_line"), "\t")
    parsed = lines.select(
        "_file",
        "_line_no",
        F.try_element_at(cols, F.lit(1)).try_cast("long").alias("query_id"),
        F.try_element_at(cols, F.lit(3)).try_cast("long").alias("doc_id"),
        F.try_element_at(cols, F.lit(4)).try_cast("int").alias("relevance"),
    )
    return (
        parsed.filter(
            F.col("query_id").isNotNull() & (F.col("relevance") > 0)
        )
        .groupBy("query_id")
        .agg(
            F.max_by("doc_id", F.struct("_file", "_line_no")).alias("rel_doc")
        )
    )


def remap_qrels(qrels_natural: DataFrame, doc_stats: DataFrame) -> DataFrame:
    """The reference's qrels ID-conversion pass (convert_ids.cpp:154-172:
    raw TREC DOCNOs → dense numeric docIDs via the page-table map) for the
    transcripts model: qrels keyed by the natural document identity
    (query_id, conv_id, turn_idx) → (query_id, rel_doc) dense ids, joined
    through the doc_stats table (the page-table analogue). Qrels whose
    identity is absent from the corpus are DROPPED, like DOCNOs missing
    from the reference's map.

    Scale shape: qrels are evaluation-sized (MS MARCO: 385k rows) — the
    qrels side broadcasts and doc_stats never shuffles."""
    return (
        F.broadcast(qrels_natural)
        .join(doc_stats, ["conv_id", "turn_idx"])
        .select("query_id", F.col("doc_id").alias("rel_doc"))
    )
