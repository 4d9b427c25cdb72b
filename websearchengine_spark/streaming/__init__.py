"""Structured Streaming plane: incremental transcript ingestion.

The reference is strictly batch (SURVEY.md §2.9) — its "streaming" is a
hand-rolled buffered file scanner. This package adds what a live transcript
pipeline needs on Spark: checkpointed, exactly-once ingestion of arriving
turns into the index's staging tables, plus watermarked monitoring
aggregations. Index refresh stays a batch job (build_block_index is
resumable/idempotent), mirroring the standard lambda shape: stream → staged
rows → periodic compaction.
"""
