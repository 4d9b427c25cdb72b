"""Training-data pipeline operators over the documents/embeddings tables.

These are the large-scale data-curation operators a 100 TB training pipeline
needs on top of the search engine core: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force
and LSH-bucketed ANN), text analysis (language ID, quality scoring, token
stats, fingerprinting), and multimodal binary-column plumbing.

Design rules shared by every module here:

- Spark-first: built-in ``pyspark.sql.functions`` (JVM-side, whole-stage
  codegen) for everything except genuinely imperative per-batch work, which
  uses Arrow-batched ``mapInPandas``;
- every operator that is SQL-expressible has an exact DuckDB oracle in
  :mod:`websearchengine_spark.plans.pipeline_gate` built from the *same*
  md5-derived 60-bit hash primitive (identical integers in both engines);
- float outputs are ROUND()ed to 6 places on both sides so value-hash
  comparison is ulp-stable;
- scale notes (what changes at 1000 executors) live in each docstring.
"""
