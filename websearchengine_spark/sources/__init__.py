"""Sources: every input format the reference reads, Spark-first.

- :mod:`trec` — the TREC `<DOC>` corpus format (reference create_index.cpp's
  hand-rolled streaming scanner, 158-199 + 314-412), as `spark.read.text`
  (wholetext) + a vectorized record splitter; gzip is transparent
  (`create_index.cpp:299-305` → Spark's codec autodetection).
- :mod:`tsv` — queries/qrels TSV readers (evaluation.cpp:662-694) as
  `spark.read.csv(sep='\\t')`.
- transcripts themselves are plain `spark.read` (Iceberg/Parquet) — see
  plans.build.load_transcripts.
"""
