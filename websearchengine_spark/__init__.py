"""websearchengine_spark — a from-scratch PySpark-native inverted-index builder
and BM25 query engine over tables of multi-turn conversation/agent transcripts.

Re-expresses the capabilities of the reference (kevintsq/WebSearchEngine, a
C++ three-process pipeline: create_index → merge_index → main/evaluation) as
one PySpark package with two planes:

- **build plane** (`plans.build_index`): DataFrame pipeline
  transcripts → dense docIDs → tokenize (vectorized pandas UDF) → postings
  → doc_stats/lexicon/metadata → salted term-partitioned varbyte/delta
  posting blocks with skip metadata (per-block max score), resumable from
  per-partition checkpoints.
- **query plane** (`operators.query` exhaustive DataFrame scorer — ground
  truth; `operators.wand` block-max WAND serving scorer with bounded heap).

All per-row logic is vectorized (pandas/Arrow UDFs); no per-row Python UDFs,
no RDD API.
"""

from websearchengine_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
