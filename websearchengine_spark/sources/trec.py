"""TREC corpus source: `<DOC>…</DOC>` blocks → (docno, url, body) rows.

Reference semantics (create_index.cpp:314-412):
- one document per `<DOC>` block; `<DOCNO>…</DOCNO>` is the id;
- inside `<TEXT>`, the FIRST line is the URL (create_index.cpp:350-353),
  the rest (up to `</TEXT>`) is the body;
- gzip inputs are transparent (`gzopen` fallback, create_index.cpp:299-305)
  — Spark's text source decompresses `.gz` by extension automatically;
- docIDs are dense in parse order (create_index.cpp:314) — here that is
  (file, offset) order made stable by assign_doc_ids over
  (file_path, doc_index_in_file).

Spark-first shape: `spark.read.text(wholetext=True)` gives one row per
file; a vectorized mapInPandas splits blocks with one C-level regex per
file. No hand-rolled buffered scanner — the 256 MB carry-over machinery of
the reference (create_index.cpp:158-199) is subsumed by the data source.
For corpora where single files exceed executor memory, split upstream or
use `spark.sql.files.maxPartitionBytes`-sized text chunking; the reference
caps at one machine anyway (readme_assignment.md:247).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DOC_RE = re.compile(r"<DOC>\s*(.*?)\s*</DOC>", re.DOTALL)
DOCNO_RE = re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", re.DOTALL)
TEXT_RE = re.compile(r"<TEXT>\n?(.*?)</TEXT>", re.DOTALL)

TREC_SCHEMA = "file string, doc_index long, docno string, url string, body string"


def parse_trec_blocks(text: str) -> list[tuple[str, str, str]]:
    """(docno, url, body) per `<DOC>` block — the record state machine of
    create_index.cpp:314-412 as three regexes."""
    out = []
    for block in DOC_RE.findall(text):
        m_no = DOCNO_RE.search(block)
        m_tx = TEXT_RE.search(block)
        if not m_no or not m_tx:
            continue  # malformed block; reference aborts (316-317), we skip
        content = m_tx.group(1)
        url, _, body = content.partition("\n")
        out.append((m_no.group(1), url.strip(), body.rstrip("\n")))
    return out


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """TREC corpus → DataFrame(file, doc_index, docno, url, body)."""
    files = spark.read.text(path, wholetext=True).selectExpr(
        "input_file_name() AS file", "value"
    )

    def split_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"file": [], "doc_index": [], "docno": [], "url": [], "body": []}
            for fname, text in zip(pdf["file"], pdf["value"]):
                for i, (docno, url, body) in enumerate(parse_trec_blocks(text)):
                    rows["file"].append(fname)
                    rows["doc_index"].append(i)
                    rows["docno"].append(docno)
                    rows["url"].append(url)
                    rows["body"].append(body)
            yield pd.DataFrame(rows)

    return files.mapInPandas(split_blocks, TREC_SCHEMA)


def trec_to_transcripts(trec: DataFrame) -> DataFrame:
    """Adapt a TREC frame to the transcripts schema (docno → conv_id,
    doc_index → turn_idx, body → text, url rides in `tool`)."""
    from pyspark.sql import functions as F

    return trec.select(
        F.col("docno").alias("conv_id"),
        F.col("doc_index").cast("int").alias("turn_idx"),
        F.lit("doc").alias("role"),
        F.col("body").alias("text"),
        F.col("url").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
