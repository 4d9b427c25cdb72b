"""Physical index: salted, term-partitioned varbyte/delta posting blocks.

The Spark-first replacement for the reference's two-pass create_index →
merge_index pipeline (create_index.cpp:116-150 spill runs;
merge_index.cpp:394-476 k-way heap merge). Here the term shuffle IS the
merge: postings are hash-bucketed by term (bucket = crc32(term) % n_buckets —
the partition-pruning key for query-time reads), skew-salted into contiguous
docID ranges, and encoded per (term, salt) group by an Arrow-batched
``applyInPandas`` into fixed-size blocks:

    (term, doc_lo, doc_hi, n, ids_vb, tfs_vb, dls_vb, max_tfc, min_tfc, bucket)

- ``ids_vb``  — delta+varbyte docIDs (merge_index.cpp:220-245 convention);
- ``tfs_vb``  — varbyte raw term frequencies;
- ``dls_vb``  — varbyte doc lengths, stored *in the posting* (the reference
  keeps an in-RAM page table, main.cpp:63-69 — impossible at 10^12 docs;
  embedding l_d costs ~1 byte/posting and makes scoring block-local);
- ``doc_lo/doc_hi`` — block skip pointers (absent in the reference, which
  decodes whole lists — main.cpp:584-587);
- ``max_tfc/min_tfc`` — per-block max/min of the BM25 tf-component
  tf·(k1+1)/(tf + k1·(1−b+b·l_d/avgdl)). The query-time block upper bound is
  max(idf·max_tfc, idf·min_tfc), exact under **negative IDF** (hot terms with
  f_t > N/2 — the reference has no IDF floor, main.cpp:446-450).

Skew (SURVEY.md §4.2): hot terms (df above a threshold — Zipf ⇒ few) are
salted into ``ceil(df / target_group_size)`` contiguous docID ranges, so each
encode group is bounded; salted sub-lists are disjoint ranges and concatenate
back into sorted order for free. AQE skew handling stays on as a backstop,
but the salting is the deterministic guarantee.

Resumability (SURVEY.md §4.3): the commit unit is the bucket. Blocks are
written with dynamic partition overwrite (idempotent per-bucket commits); a
``checkpoints`` table records (build_id, bucket, status, lineage fingerprint,
n_postings, n_blocks, bytes, postings/sec). A restarted build skips buckets
already checkpointed for the same build_id + input fingerprint.
"""

from __future__ import annotations

import os
import time
import zlib
from collections.abc import Iterable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.functions.codec import vb_encode, vb_value_lengths
from websearchengine_spark.functions.tokenizer import tokenize_postings_frame
from websearchengine_spark.operators.docids import ordered_partitions
from websearchengine_spark.plans.build import B, K1
from websearchengine_spark.sources.catalog import (
    is_table_identifier,
    read_table,
    write_table,
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_lo", T.LongType(), False),
        T.StructField("doc_hi", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("ids_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        T.StructField("dls_vb", T.BinaryType(), False),
        T.StructField("max_tfc", T.DoubleType(), False),
        T.StructField("min_tfc", T.DoubleType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)


def term_bucket(term: str, n_buckets: int) -> int:
    """crc32-based bucket — identical in Python (zlib.crc32) and Spark
    (F.crc32), so the serving layer can partition-prune without the JVM."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


@dataclass
class BlockIndexPaths:
    """The five index tables. ``root`` is either a filesystem directory
    (tables are parquet subdirectories) or an Iceberg table-identifier
    PREFIX like ``catalog.db.idx`` (tables are ``catalog.db.idx_blocks``
    etc. — Iceberg namespaces are flat, so children are suffixed siblings).
    All Spark-side IO in this module routes through sources/catalog.py, so
    an Iceberg runtime picks the index tables up with no code edits; the
    pyarrow serving reader (operators/wand.py) requires the filesystem
    layout."""

    root: str

    def _child(self, name: str) -> str:
        if is_table_identifier(self.root):
            return f"{self.root}_{name}"
        return os.path.join(self.root, name)

    @property
    def blocks(self) -> str:
        return self._child("blocks")

    @property
    def lexicon(self) -> str:
        return self._child("lexicon")

    @property
    def doc_stats(self) -> str:
        return self._child("doc_stats")

    @property
    def meta(self) -> str:
        return self._child("meta")

    @property
    def checkpoints(self) -> str:
        return self._child("checkpoints")


def _vb_blocked(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list[bytes]:
    """vb-encode the whole array ONCE, then split the byte stream at block
    boundaries (vb coding is per-value independent, so the split blobs are
    byte-identical to encoding each block separately)."""
    stream = vb_encode(values)
    cum = np.concatenate(([0], np.cumsum(vb_value_lengths(values))))
    return [stream[cum[s] : cum[e]] for s, e in zip(starts, ends)]


def _make_stream_encoder(avg_dl: float, block_size: int, n_buckets: int):
    """Partition-streaming block encoder (mapInPandas body).

    Input: a partition repartitioned by (term, salt) and sorted by
    (term, salt, doc_id). The encoder is vectorized ACROSS groups — one
    vb_encode per column per Arrow chunk, block boundaries derived from
    group-relative row indices, reduceat for block max/min — so per-group
    cost is O(postings), not O(1 ms) of per-group machinery. This matters:
    ``groupBy().applyInPandas`` pays ~1-2 ms per group, which at a
    reference-corpus-scale vocabulary (25.2M distinct terms,
    readme_assignment.md table) is hours of pure overhead; here a
    10^5-term chunk costs one pass of numpy.

    Groups may span Arrow batches inside a partition — the trailing
    (term, salt) group of each batch is carried into the next. Blocks
    never span a (term, salt) group, so the produced layout is
    deterministic and independent of the partition count (each (term,
    salt) group lives in exactly one partition and is encoded alone)."""
    k1, b = K1, B

    def encode_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        terms = pdf["term"].to_numpy()
        salts = pdf["salt"].to_numpy(dtype=np.int64)
        n = len(ids)
        # group starts: (term, salt) change points (input sorted). Term
        # equality via factorize codes — elementwise != on an object array
        # is a Python-level compare per row, which at ~10k rows/batch ×
        # thousands of batches dominates single-core encode time
        tcodes = pd.factorize(terms, sort=False)[0]
        gchg = np.nonzero((tcodes[1:] != tcodes[:-1]) | (salts[1:] != salts[:-1]))[0] + 1
        gstarts = np.concatenate(([0], gchg))
        gsizes = np.diff(np.concatenate((gstarts, [n])))
        # block boundaries: every block_size rows WITHIN a group
        rel = np.arange(n, dtype=np.int64) - np.repeat(gstarts, gsizes)
        bmask = (rel % block_size) == 0
        starts = np.nonzero(bmask)[0]
        ends = np.concatenate((starts[1:], [n]))
        blocks_per_group = np.add.reduceat(bmask.astype(np.int64), gstarts)
        gterms = terms[gstarts]
        # per-block delta encoding in one array: gaps everywhere, absolute
        # value at each block start
        gaps = np.empty(n, dtype=np.uint64)
        u = ids.astype(np.uint64)
        gaps[0] = u[0]
        np.subtract(u[1:], u[:-1], out=gaps[1:])
        gaps[starts] = u[starts]
        # exact BM25 tf-component per posting (float64, same expression
        # tree as the oracle) — block max/min give tight WAND bounds
        tfc = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avg_dl))
        buckets = np.fromiter(
            (term_bucket(t, n_buckets) for t in gterms), np.int64, len(gterms)
        )
        return pd.DataFrame(
            {
                "term": np.repeat(gterms, blocks_per_group),
                "doc_lo": ids[starts],
                "doc_hi": ids[ends - 1],
                "n": (ends - starts).astype(np.int32),
                "ids_vb": _vb_blocked(gaps, starts, ends),
                "tfs_vb": _vb_blocked(tfs.astype(np.uint64), starts, ends),
                "dls_vb": _vb_blocked(dls.astype(np.uint64), starts, ends),
                "max_tfc": np.maximum.reduceat(tfc, starts),
                "min_tfc": np.minimum.reduceat(tfc, starts),
                "bucket": np.repeat(buckets, blocks_per_group).astype(np.int32),
            },
            columns=[f.name for f in BLOCK_SCHEMA.fields],
        )

    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            t = pd.factorize(pdf["term"].to_numpy(), sort=False)[0]
            s = pdf["salt"].to_numpy(dtype=np.int64)
            # first row of the trailing (term, salt) group → carry it over
            cut = int(np.argmax((t == t[-1]) & (s == s[-1])))
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield encode_frame(head)
        if carry is not None and len(carry):
            yield encode_frame(carry)

    return encode_stream


@dataclass
class BuildMetrics:
    build_id: str
    n_docs: int
    avg_dl: float
    n_postings: int
    n_buckets_built: int
    n_buckets_skipped: int
    wall_s: float
    postings_per_sec: float


def build_block_index(
    transcripts: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = 32,
    block_size: int = 128,
    hot_df_threshold: int = 100_000,
    target_group_size: int = 50_000,
    build_id: str = "build0",
    resume: bool = True,
    num_partitions: int | None = None,
    fail_buckets: Iterable[int] = (),  # test hook: simulate a mid-build crash
) -> BuildMetrics:
    spark = transcripts.sparkSession
    paths = BlockIndexPaths(out_dir)
    t0 = time.time()

    # Assign docIDs and tokenize in ONE fused mapInPandas over the
    # range-partitioned input (one Python/Arrow crossing of the text column
    # instead of two), emitting FLAT rows (no nested list<struct>, no
    # explode): posting rows (term, tf, dl) plus one term-NULL doc-stat row
    # per doc carrying the metadata columns. postings, doc_stats, lexicon,
    # and corpus stats are all cheap filters of this one cached frame — at
    # 100 TB the tokenizer is the single most expensive stage, so it runs
    # once, stays off per-row Python, and skips the explode shuffle blowup.
    from pyspark import TaskContext

    part, offsets = ordered_partitions(
        transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        order_cols=("conv_id", "turn_idx"),
        num_partitions=num_partitions,
    )
    meta_cols = ["conv_id", "turn_idx", "role", "tool", "ts"]
    flat_schema = (
        "doc_id long, term string, tf long, dl long, "
        "conv_id string, turn_idx int, role string, tool string, ts timestamp"
    )

    def _ids_and_tokenize(batches):
        import numpy as _np

        pid = TaskContext.get().partitionId()
        seen = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_id"] = _np.arange(seen, seen + len(pdf), dtype=_np.int64)
            seen += len(pdf)
            yield tokenize_postings_frame(pdf, meta_cols)

    flat = part.mapInPandas(_ids_and_tokenize, flat_schema).persist()

    doc_stats = flat.filter(F.col("term").isNull()).select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
        F.col("dl").alias("term_cnt"),
    )
    postings = flat.filter(F.col("term").isNotNull()).select(
        "term", "doc_id", "tf", "dl"
    )

    # ONE aggregation job yields corpus stats, the full lexicon, and the
    # hot-term set: the term-NULL doc-stat group IS the corpus-stats row
    # (df of the NULL group = n_docs, avg dl over it = avg_dl), non-null
    # groups are lexicon rows, hot terms are the df > threshold subset.
    term_agg = flat.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.avg("dl").alias("avg_dl_in_group"),
    ).persist()  # vocab-sized; reused by the lexicon write (saves a full
    #              re-aggregation pass over the postings at write time)
    head = term_agg.filter(F.col("term").isNull()).collect()  # 1 row
    n_docs = int(head[0]["df"]) if head else 0
    avg_dl = float(head[0]["avg_dl_in_group"] or 0.0) if head else 0.0
    # `flat` is materialized now; the range-partition cache is done
    part.unpersist()

    # lexicon: df (postings per term == distinct docs per term) + cf
    lexicon = term_agg.filter(F.col("term").isNotNull()).select("term", "df", "cf")
    # hot-term salt factors as a BROADCAST-JOINED frame, never driver
    # literals: at real corpus scale the df > threshold set is 10^5-10^6
    # stopword-ish terms — a create_map literal of that size becomes a
    # multi-million-node Catalyst expression (and the terms never need to
    # touch the driver at all; the salt frame is derived from the same
    # persisted aggregation the lexicon reads)
    hot_df = term_agg.filter(
        F.col("term").isNotNull() & (F.col("df") > hot_df_threshold)
    ).select(
        "term",
        F.ceil(F.col("df") / F.lit(target_group_size)).cast("int").alias("n_salt"),
    )
    salted = (
        postings.join(F.broadcast(hot_df), "term", "left")
        .withColumn(
            # contiguous docID ranges per salt ⇒ salted sub-lists concatenate
            # back into globally sorted posting order
            "salt",
            (
                F.col("doc_id") * F.coalesce(F.col("n_salt"), F.lit(1))
                / F.lit(max(n_docs, 1))
            ).cast("int"),
        )
        .drop("n_salt")
        .withColumn("bucket", (F.crc32(F.col("term")) % n_buckets).cast("int"))
    )

    # ---- resume: skip buckets checkpointed for this build_id + lineage
    fingerprint = f"{n_docs}:{avg_dl:.6f}"
    done: set[int] = set()
    if resume:
        try:
            cp = read_table(spark, paths.checkpoints)
            done = {
                r["bucket"]
                for r in cp.filter(
                    (F.col("build_id") == build_id)
                    & (F.col("status") == "done")
                    & (F.col("fingerprint") == fingerprint)
                )
                .select("bucket")
                .collect()
            }
        except Exception:
            done = set()
    fail_buckets = set(fail_buckets)
    build_buckets = [
        b for b in range(n_buckets) if b not in done and b not in fail_buckets
    ]

    if build_buckets:
        to_build = salted.filter(F.col("bucket").isin(build_buckets))
        # shuffle by (term, salt) + in-partition sort, then a STREAMING
        # vectorized encoder (mapInPandas) — the shuffle is the k-way merge
        # (merge_index.cpp:394-476 analogue) and the encoder has no
        # per-group overhead (see _make_stream_encoder)
        blocks = (
            to_build.repartition("term", "salt")
            .sortWithinPartitions("term", "salt", "doc_id")
            .mapInPandas(_make_stream_encoder(avg_dl, block_size, n_buckets), BLOCK_SCHEMA)
        )
        # dynamic partition overwrite → idempotent per-bucket commits.
        # Blocks are sorted by (term, doc_lo) within each bucket file and
        # written with small row groups so the serving reader's predicate
        # pushdown prunes to the few row groups holding the query terms
        # (parquet min/max stats on `term`) instead of scanning the bucket.
        # Posting rows are ~40 bytes — large Arrow batches amortize the
        # per-batch carry/split overhead of the streaming encoder (the
        # tokenize stage upstream is already materialized in the cache, so
        # this setting only shapes the encoder's input batches).
        batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        prev_batch = spark.conf.get(batch_key, "10000")
        spark.conf.set(batch_key, str(1 << 17))
        try:
            write_table(
                blocks.repartition("bucket").sortWithinPartitions("term", "doc_lo"),
                paths.blocks,
                mode="overwrite",
                partition_by=("bucket",),
                options={"parquet.block.size": 1 << 20},
            )
        finally:
            spark.conf.set(batch_key, prev_batch)

    # ---- per-partition (bucket) checkpoints with lineage + metrics
    wall_s = time.time() - t0
    # explicit schema: an empty corpus writes a data-less directory that
    # schema inference cannot read
    read_schema = T.StructType(
        BLOCK_SCHEMA.fields[:-1]
        + [T.StructField("bucket", T.IntegerType(), True)]
    )
    built_blocks = read_table(spark, paths.blocks, schema=read_schema).filter(
        F.col("bucket").isin(build_buckets) if build_buckets else F.lit(False)
    )
    per_bucket = {
        r["bucket"]: r
        for r in built_blocks.groupBy("bucket")
        .agg(
            F.sum("n").alias("n_postings"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.length("ids_vb") + F.length("tfs_vb") + F.length("dls_vb")).alias(
                "bytes_compressed"
            ),
        )
        .collect()
    }
    now = time.time()
    cp_rows = []
    for bkt in build_buckets:
        r = per_bucket.get(bkt)
        npost = int(r["n_postings"]) if r else 0
        cp_rows.append(
            (
                build_id,
                int(bkt),
                "done",
                fingerprint,
                npost,
                int(r["n_blocks"]) if r else 0,
                int(r["bytes_compressed"]) if r else 0,
                float(wall_s),
                float(npost / wall_s) if wall_s > 0 else 0.0,
                float(now),
            )
        )
    if cp_rows:
        write_table(
            spark.createDataFrame(
                cp_rows,
                "build_id string, bucket int, status string, fingerprint string, "
                "n_postings long, n_blocks long, bytes_compressed long, "
                "wall_s double, postings_per_sec double, ts double",
            ),
            paths.checkpoints,
            mode="append",
        )

    complete = len(done) + len(build_buckets) == n_buckets
    if complete:
        write_table(
            lexicon.withColumn(
                "bucket", (F.crc32(F.col("term")) % n_buckets).cast("int")
            )
            .repartition("bucket")
            .sortWithinPartitions("term"),
            paths.lexicon,
            mode="overwrite",
            partition_by=("bucket",),
            options={"parquet.block.size": 256 << 10},
        )
        write_table(doc_stats, paths.doc_stats, mode="overwrite")
        write_table(
            spark.createDataFrame(
                [(build_id, n_docs, avg_dl, block_size, n_buckets, fingerprint)],
                "build_id string, n_docs long, avg_dl double, block_size int, "
                "n_buckets int, fingerprint string",
            ),
            paths.meta,
            mode="overwrite",
        )

    n_postings = sum(int(r["n_postings"]) for r in per_bucket.values())
    flat.unpersist()
    term_agg.unpersist()
    return BuildMetrics(
        build_id=build_id,
        n_docs=n_docs,
        avg_dl=avg_dl,
        n_postings=n_postings,
        n_buckets_built=len(build_buckets),
        n_buckets_skipped=len(done),
        wall_s=wall_s,
        postings_per_sec=(n_postings / wall_s) if wall_s > 0 else 0.0,
    )


def load_meta(spark: SparkSession, out_dir: str) -> dict:
    row = read_table(spark, BlockIndexPaths(out_dir).meta).collect()[0]
    return row.asDict()
