"""Incremental index merge: k block indexes → one merged index.

The analogue of the reference's merge_index pass (merge_index.cpp:353-476:
open EVERY partial index in a directory, k-way heap-merge their sorted
runs) for the case a live deployment actually hits: an index already
serves queries and NEW batches of turns arrive.
:func:`merge_many_block_indexes` is the N-input entry point;
:func:`merge_block_indexes` is the common base+delta special case.
Rebuilding from scratch re-tokenizes and re-shuffles the whole corpus;
this module instead treats the input indexes' posting BLOCKS as pre-sorted
compressed runs and re-runs only the (term, salt) exchange + block encode:

1. each leaf block row becomes one compressed RUN — the varbyte payloads
   are reused as-is except the docID head gap, which is rewritten from
   block-relative (gap from ``doc_lo - 1``) to absolute, with delta docIDs
   shifted by ``base.n_docs`` (one vectorized decode + re-encode per Arrow
   batch, no per-row Python);
2. the runs take the SAME path as a fresh build's runs: hot-term salting
   (from the merged lexicon's dfs), a (term, salt) repartition + run_pos
   sort, and the streaming run merger/encoder of plans.block_index — the
   shuffle is the k-way merge, moving ~1-3 compressed bytes per posting;
3. lexicon / doc_stats / meta are unioned or recomputed exactly (integer
   dl sums → the merged ``avg_dl`` equals a from-scratch build's float).

docID semantics: merged ids are ARRIVAL-BLOCKED — base keeps its ids,
delta docs get ``base.n_docs + delta_id`` — i.e. the reference's
parse-order docID assignment (create_index.cpp:314), which is exactly what
the streaming stager (streaming/ingest.py) allocates. When arrival order
coincides with (conv_id, turn_idx) order — every delta conversation sorts
after every base conversation — the merged index is CONTENT-IDENTICAL to a
from-scratch build on the union, including the varbyte payload bytes
(blocks re-chunk from the concatenated per-term stream, so boundaries,
superblocks, and gap bytes all coincide; pinned by tests/test_merge_index).
The one documented divergence: hot-term salt boundaries (df >
hot_df_threshold) are cut on the docID axis here but on input-partition
ranges in a fresh build — group contiguity and query results are
unaffected, only block-boundary placement within those few terms.

Scale shape: the merge never touches raw text, never re-tokenizes, and its
only wide operation is the run exchange (same volume as a fresh build's
encode stage minus the tokenize/shuffle of the base corpus — for a 1%
delta on 10^12 turns that is ~50× less data movement than a rebuild; the
base's compressed blocks are read once, streamed through one narrow
mapInArrow, and shuffled at ~1-3 B/posting).
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.functions.codec import (
    concat_binary_column,
    vb_blocked_arrow,
    vb_decode,
)
from websearchengine_spark.plans.block_index import (
    BLOCK_SCHEMA,
    BlockIndexPaths,
    BuildMetrics,
    _clear_stale_deletes,
    _make_stream_encoder,
)
from websearchengine_spark.sources.catalog import (
    is_table_identifier,
    read_table,
    write_table,
)

RUNS_SCHEMA = (
    "term string, run_pos long, n long, ids_vb binary, tfs_vb binary, "
    "dls_vb binary"
)


class _DelState(NamedTuple):
    """One input's tombstone-sidecar state (purge_tombstones=True)."""

    ids_bc: object            # broadcast of the sorted deleted doc_ids
    df_corr: object           # DataFrame (term, ddf, dcf)
    n_deleted: int
    deleted_dl: int
    total_dl: int

# explicit read schemas for the sidecar tables (the layouts
# plans.block_index writes): an index built over an EMPTY input — a quiet
# ingest window staging zero turns — is a legal merge input, but its
# parquet dirs contain no data files, so a schemaless read dies with
# UNABLE_TO_INFER_SCHEMA instead of yielding the zero-row frame the merge
# math already handles (zero shift, zero dl, no runs).
LEXICON_READ_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("df", T.LongType()),
        T.StructField("cf", T.LongType()),
        T.StructField("bucket", T.IntegerType()),  # partition col
    ]
)
DOC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("term_cnt", T.LongType()),
    ]
)
TEXTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _blocks_to_runs(shift: int):
    """mapInArrow body: leaf block rows → compressed runs with ABSOLUTE
    docID heads, shifted by ``shift``.

    Only the ids payload is rewritten (its head gap is block-relative);
    tfs/dls payloads pass through untouched. One vectorized vb_decode +
    segmented cumsum + re-encode per batch — the same primitives the block
    encoder itself uses (plans.block_index._make_stream_encoder)."""
    import pyarrow as pa

    def to_runs(batches):
        for rb in batches:
            t = pa.Table.from_batches([rb])
            if t.num_rows == 0:
                continue
            ns = t.column("n").to_numpy().astype(np.int64)
            los = t.column("doc_lo").to_numpy().astype(np.int64)
            vals = vb_decode(concat_binary_column(t.column("ids_vb")))
            n = len(vals)
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            ends = np.concatenate((starts[1:], [n]))
            # within-block cumsum of gaps; head gap is measured from
            # (doc_lo - 1), so absolute id = rel + doc_lo - 1
            c = np.cumsum(vals, dtype=np.uint64)
            base = (c - vals)[starts]
            rel = (c - np.repeat(base, ns)).astype(np.int64)
            ids = rel + np.repeat(los - 1 + shift, ns)
            u = ids.astype(np.uint64)
            gaps = np.empty(n, dtype=np.uint64)
            if n:
                gaps[0] = u[0]
                np.subtract(u[1:], u[:-1], out=gaps[1:])
            gaps[starts] = u[starts]  # absolute heads (encoder gets no
            #                           pid_offsets — runs are global)
            yield pa.RecordBatch.from_arrays(
                [
                    t.column("term").combine_chunks(),
                    pa.array(los + shift, type=pa.int64()),  # run_pos: merged
                    #   doc_lo — unique per term, sorts runs into global
                    #   docID order (block ranges are disjoint per term)
                    pa.array(ns, type=pa.int64()),
                    vb_blocked_arrow(gaps, starts, ends),
                    t.column("tfs_vb").combine_chunks(),
                    t.column("dls_vb").combine_chunks(),
                ],
                names=["term", "run_pos", "n", "ids_vb", "tfs_vb", "dls_vb"],
            )

    return to_runs


def _leaf_blocks(spark: SparkSession, paths: BlockIndexPaths):
    read_schema = T.StructType(
        [f for f in BLOCK_SCHEMA.fields if f.name != "bucket"]
        + [T.StructField("bucket", T.IntegerType(), True)]  # partition col
    )
    return (
        read_table(spark, paths.blocks, schema=read_schema)
        .filter(F.col("kind") == 0)
        .select("term", "doc_lo", "n", "ids_vb", "tfs_vb", "dls_vb")
    )


def _salt_encode_write_blocks(
    spark: SparkSession,
    runs,
    lexicon,
    n_docs: int,
    hot_df_threshold: int,
    target_group_size: int,
    num_partitions: int | None,
    avg_dl: float,
    block_size: int,
    n_buckets: int,
    out_p: BlockIndexPaths,
) -> None:
    """Hot-term salting → (term, salt) exchange → streaming block encoder
    → partitioned blocks write. The shared tail of the k-way merge and
    plans/delete_index.purge_deletes — both feed compressed runs with
    ABSOLUTE head gaps in per-term docID order.

    Salt arithmetic: docID width of one salt range is ceil(n_docs/n_salt)
    with n_salt = ceil(df / target_group_size); salt is an int64-safe
    integer DIVISION of run_pos — the naive run_pos * n_salt / n_docs
    product overflows int64 at ~10^12 docs × a stopword df, wrapping
    negative and violating the encoder's runs-in-docID-order precondition
    (salt must be monotone in run_pos within a term)."""
    nd = max(n_docs, 1)
    hot_df = lexicon.filter(F.col("df") > hot_df_threshold).select(
        "term",
        F.ceil(
            F.lit(nd) / F.ceil(F.col("df") / F.lit(target_group_size))
        ).cast("long").alias("salt_span"),
    )
    salted = runs.join(F.broadcast(hot_df), "term", "left").withColumn(
        "salt",
        F.expr(f"CAST(run_pos DIV coalesce(salt_span, {nd}L) AS INT)"),
    ).select("term", "salt", "run_pos", "n", "ids_vb", "tfs_vb", "dls_vb")
    n_exch = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    blocks = (
        salted.repartition(n_exch, "term", "salt")
        .sortWithinPartitions("term", "salt", "run_pos")
        .mapInArrow(
            _make_stream_encoder(avg_dl, block_size, n_buckets, None),
            BLOCK_SCHEMA,
        )
    )
    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev_batch = spark.conf.get(batch_key, "10000")
    spark.conf.set(batch_key, str(1 << 15))
    try:
        write_table(
            # bucket leads the sort (same as build_block_index): without it
            # the V1 parquet writer inserts its own Sort(bucket), which is
            # both a redundant full sort and NOT stable — measured
            # permuting rows within bucket files, degrading the serving
            # reader's (kind, term, doc_lo) row-group pruning
            blocks.repartition("bucket").sortWithinPartitions(
                "bucket", "kind", "term", "doc_lo"
            ),
            out_p.blocks,
            mode="overwrite",
            partition_by=("bucket",),
            options={"parquet.block.size": 1 << 20},
        )
    finally:
        spark.conf.set(batch_key, prev_batch)


def _write_lexicon(lexicon, out_p: BlockIndexPaths, n_buckets: int) -> None:
    """Bucketed lexicon write (same layout as build_block_index)."""
    write_table(
        lexicon.withColumn(
            "bucket", (F.crc32(F.col("term")) % n_buckets).cast("int")
        )
        .repartition("bucket")
        .sortWithinPartitions("bucket", "term"),
        out_p.lexicon,
        mode="overwrite",
        partition_by=("bucket",),
        options={"parquet.block.size": 256 << 10},
    )


def _write_meta(
    spark: SparkSession,
    out_p: BlockIndexPaths,
    build_id: str,
    n_docs: int,
    avg_dl: float,
    block_size: int,
    n_buckets: int,
    staged_hwm: int,
) -> str:
    """Meta row (block_format 3 + the staging-id watermark) → fingerprint."""
    fingerprint = f"{n_docs}:{avg_dl:.6f}"
    write_table(
        spark.createDataFrame(
            [(
                build_id, n_docs, avg_dl, block_size, n_buckets,
                fingerprint, 3, staged_hwm,
            )],
            "build_id string, n_docs long, avg_dl double, block_size int, "
            "n_buckets int, fingerprint string, block_format int, "
            "staged_hwm long",
        ),
        out_p.meta,
        mode="overwrite",
    )
    return fingerprint


def _finalize_metrics(
    spark: SparkSession,
    out_p: BlockIndexPaths,
    build_id: str,
    fingerprint: str,
    n_docs: int,
    avg_dl: float,
    t0: float,
) -> BuildMetrics:
    """Per-bucket lineage + metrics (same accounting shape as a fresh
    build's checkpoints): column-pruned stats scan, no payload read."""
    read_schema = T.StructType(
        [f for f in BLOCK_SCHEMA.fields if f.name != "bucket"]
        + [T.StructField("bucket", T.IntegerType(), True)]
    )
    wall_s = time.time() - t0
    per_bucket = {
        r["bucket"]: r
        for r in read_table(spark, out_p.blocks, schema=read_schema)
        .filter(F.col("kind") == 0)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n_postings"), F.count(F.lit(1)).alias("n_blocks"))
        .collect()
    }
    now = time.time()
    cp_rows = [
        (
            build_id, int(bkt), "done", fingerprint,
            int(r["n_postings"]), int(r["n_blocks"]), 0,
            float(wall_s),
            float(int(r["n_postings"]) / wall_s) if wall_s > 0 else 0.0,
            float(now),
        )
        for bkt, r in per_bucket.items()
    ]
    if cp_rows:
        write_table(
            spark.createDataFrame(
                cp_rows,
                "build_id string, bucket int, status string, fingerprint string, "
                "n_postings long, n_blocks long, bytes_compressed long, "
                "wall_s double, postings_per_sec double, ts double",
            ),
            out_p.checkpoints,
            mode="append",
        )
    n_postings = sum(int(r["n_postings"]) for r in per_bucket.values())
    return BuildMetrics(
        build_id=build_id,
        n_docs=n_docs,
        avg_dl=avg_dl,
        n_postings=n_postings,
        n_buckets_built=len(per_bucket),
        n_buckets_skipped=0,
        wall_s=wall_s,
        postings_per_sec=(n_postings / wall_s) if wall_s > 0 else 0.0,
    )


def merge_block_indexes(
    spark: SparkSession,
    base_dir: str,
    delta_dir: str,
    out_dir: str,
    *,
    build_id: str = "merge0",
    n_buckets: int | None = None,
    hot_df_threshold: int = 100_000,
    target_group_size: int = 50_000,
    num_partitions: int | None = None,
    drop_texts: bool = False,
    purge_tombstones: bool = False,
) -> BuildMetrics:
    """Merge two block indexes into ``out_dir``. Base docIDs are kept;
    delta docIDs shift by ``base.n_docs`` (arrival-blocked numbering — see
    module docstring). Inputs must be block_format 3 with equal block_size;
    the two corpora must be disjoint (the streaming stager guarantees it).
    Thin wrapper over :func:`merge_many_block_indexes`."""
    return merge_many_block_indexes(
        spark,
        (base_dir, delta_dir),
        out_dir,
        build_id=build_id,
        n_buckets=n_buckets,
        hot_df_threshold=hot_df_threshold,
        target_group_size=target_group_size,
        num_partitions=num_partitions,
        drop_texts=drop_texts,
        purge_tombstones=purge_tombstones,
    )


def merge_many_block_indexes(
    spark: SparkSession,
    input_dirs,
    out_dir: str,
    *,
    build_id: str = "merge0",
    n_buckets: int | None = None,
    hot_df_threshold: int = 100_000,
    target_group_size: int = 50_000,
    num_partitions: int | None = None,
    drop_texts: bool = False,
    purge_tombstones: bool = False,
) -> BuildMetrics:
    """k-way merge of ``input_dirs`` (ordered) into ``out_dir`` — the
    reference's N-input shape (merge_index.cpp:363-407 opens EVERY partial
    index in the directory and heap-merges them in one pass). docIDs are
    arrival-blocked in list order: index ``i``'s ids shift by the total
    ``n_docs`` of indexes ``0..i-1``. One pass matters at scale: chaining
    2-way merges to absorb k deltas re-shuffles the ever-growing base k-1
    times, while this moves every posting through the exchange exactly once.
    Inputs must be block_format 3 with equal block_size over disjoint
    corpora (the streaming stager guarantees disjointness).

    ``purge_tombstones=True`` additionally drops each input's tombstoned
    docs (plans/delete_index.py sidecars) INSIDE this same pass: deleted
    postings are filtered and survivors renumbered densely while the
    blocks stream into the exchange, lexicon/doc_stats/avg_dl use the
    sidecars' exact corrections, and the output carries no sidecar. This
    is the nightly-compaction shape — absorbing deltas and honoring the
    day's deletes costs ONE rewrite instead of purge-then-merge's two.
    With the default False, a tombstoned input is refused (merging it
    verbatim would silently resurrect its deleted docs)."""
    t0 = time.time()
    input_dirs = list(input_dirs)
    if len(input_dirs) < 2:
        raise ValueError("merge needs at least two input indexes")

    def _norm(p: str) -> str:
        # realpath, not abspath: a symlink alias of an input must not evade
        # the duplicate-input / in-place-output checks below
        return p if is_table_identifier(p) else os.path.realpath(p)

    normed = [_norm(d) for d in input_dirs]
    if len(set(normed)) != len(normed):
        raise ValueError(
            "duplicate input index: merged corpora must be disjoint"
        )
    # fail eagerly, not minutes in: the merge reads the inputs while
    # writing the output, so an in-place merge (--output == --base, the
    # natural "update the nightly index" invocation) would only die at the
    # blocks write with Spark's opaque cannot-overwrite-a-path-being-read
    # error after the collects below already ran
    if _norm(out_dir) in normed:
        raise ValueError(
            "out_dir must be a NEW location: the merge reads its inputs "
            "while writing the output (write to a sibling dir, then swap)"
        )
    # lazy import: delete_index imports this module
    from websearchengine_spark.plans.delete_index import (
        DEL_DF_SCHEMA,
        DEL_IDS_SCHEMA,
        DEL_META_SCHEMA,
        _blocks_to_purged_runs,
        _remap_doc_ids,
        delete_paths,
        has_tombstones,
        live_deletes_dir,
    )

    if not purge_tombstones:
        # an input with pending tombstones would merge its deleted postings
        # into an output that carries no sidecar — silently resurrecting
        # the deleted docs
        for d in input_dirs:
            if has_tombstones(d):
                raise ValueError(
                    f"input index at {d} has pending tombstones: merging "
                    "would resurrect its deleted docs — run purge_deletes "
                    "on it first, or pass purge_tombstones=True to drop "
                    "them during this merge"
                )
    in_ps = [BlockIndexPaths(d) for d in input_dirs]
    out_p = BlockIndexPaths(out_dir)
    _clear_stale_deletes(out_p)  # a reused out_dir may hold a previous
    #                              index's tombstone sidecar — stale ids
    #                              would silently mask the merged axis
    metas = [read_table(spark, p.meta).collect()[0].asDict() for p in in_ps]
    for m, d in zip(metas, input_dirs):
        if int(m.get("block_format", 1)) != 3:
            raise ValueError(f"index at {d} is block_format "
                             f"{m.get('block_format')}; merge requires 3")
    block_sizes = {int(m["block_size"]) for m in metas}
    if len(block_sizes) > 1:
        raise ValueError("block_size mismatch between input indexes")
    block_size = block_sizes.pop()
    n_buckets = n_buckets or int(metas[0]["n_buckets"])
    # per-input tombstone state (purge_tombstones=True): sorted deleted-id
    # broadcast + the sidecar's exact corrections — the merge drops those
    # postings inline, so deltas are absorbed and deletes purged in the
    # SAME exchange (see docstring)
    del_state = []
    for d, p in zip(input_dirs, in_ps):
        if purge_tombstones and has_tombstones(d):
            ids_p, dfc_p, dmeta_p = delete_paths(p, base=live_deletes_dir(d))
            dm = read_table(spark, dmeta_p, schema=DEL_META_SCHEMA).collect()[0]
            arr = np.sort(
                read_table(spark, ids_p, schema=DEL_IDS_SCHEMA)
                .toPandas()["doc_id"]
                .to_numpy()
                .astype(np.int64)
            )
            del_state.append(
                _DelState(
                    spark.sparkContext.broadcast(arr),
                    read_table(spark, dfc_p, schema=DEL_DF_SCHEMA),
                    int(dm["n_deleted"]),
                    int(dm["deleted_dl"]),
                    int(dm["total_dl"]),
                )
            )
        else:
            del_state.append(None)
    counts = [
        int(m["n_docs"]) - (st.n_deleted if st else 0)
        for m, st in zip(metas, del_state)
    ]  # LIVE docs per input
    # shift for index i = total docs of indexes before it (arrival-blocked)
    shifts = [sum(counts[:i]) for i in range(len(counts))]
    n_docs = sum(counts)

    # texts-sidecar policy decided EAGERLY (fail before the exchange, not
    # minutes in — and before out_dir holds a complete-looking snippet-less
    # index a retry could silently adopt). A carrier is any filesystem
    # input with a texts/ dir; empty carriers count — an empty
    # store_texts=True base is still the carrier of the snippets decision,
    # and merging a non-empty textless delta into it must be the same hard
    # error as the non-empty base case. ``drop_texts=True`` is the
    # deliberate opt-out (also the only way to merge texts-carrying inputs
    # into a table-identifier output, which cannot hold a sidecar).
    has_texts = [
        (not is_table_identifier(d)) and os.path.isdir(p.texts)
        for d, p in zip(input_dirs, in_ps)
    ]
    emit_texts = False
    if not drop_texts and any(has_texts):
        nonempty_have = [h for h, c in zip(has_texts, counts) if c > 0]
        if nonempty_have and not all(nonempty_have):
            raise ValueError(
                "mixed texts sidecars: some inputs carry texts/ and a "
                "non-empty input does not — the merged index would "
                "silently lose snippet serving; build every delta with "
                "store_texts=True (streaming.compact_incremental inherits "
                "it from the base), or pass drop_texts=True to "
                "deliberately drop snippet serving from the merged index"
            )
        if is_table_identifier(out_dir):
            raise ValueError(
                "texts sidecar cannot be written to a table-identifier "
                "output; pass drop_texts=True to deliberately drop "
                "snippet serving from the merged index"
            )
        emit_texts = True

    # exact avg_dl: integer dl sums from doc_stats — the same number a
    # from-scratch build computes (total_dl / n_docs in one float division)
    in_ds = [
        read_table(spark, p.doc_stats, schema=DOC_STATS_SCHEMA) for p in in_ps
    ]
    total_dl = 0
    for ds_in, st in zip(in_ds, del_state):
        if st is not None:
            # exact live dl from the sidecar ints
            total_dl += st.total_dl - st.deleted_dl
        else:
            total_dl += int(ds_in.agg(F.sum("term_cnt")).collect()[0][0] or 0)
    avg_dl = (total_dl / n_docs) if n_docs else 0.0

    # merged lexicon (disjoint corpora ⇒ dfs/cfs add; tombstoned inputs
    # contribute LIVE dfs/cfs via their sidecar's exact corrections)
    lex_parts = []
    for p, st in zip(in_ps, del_state):
        part = read_table(spark, p.lexicon, schema=LEXICON_READ_SCHEMA).select(
            "term", "df", "cf"
        )
        if st is not None:
            part = (
                part.join(st.df_corr, "term", "left")
                .select(
                    "term",
                    (F.col("df") - F.coalesce(F.col("ddf"), F.lit(0))).alias("df"),
                    (F.col("cf") - F.coalesce(F.col("dcf"), F.lit(0))).alias("cf"),
                )
                .filter(F.col("df") > 0)
            )
        lex_parts.append(part)
    lex_union = lex_parts[0]
    for part in lex_parts[1:]:
        lex_union = lex_union.unionByName(part)
    lexicon = (
        lex_union.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    ).persist()

    # blocks → runs (each index shifted), salted like a fresh build but with
    # the salt ranges cut on the MERGED docID axis (monotone in doc_lo ⇒
    # salted sub-lists stay contiguous disjoint ranges that concatenate in
    # order)
    def _input_runs(p, st, shift):
        lb = _leaf_blocks(spark, p)
        if st is not None:  # drop tombstoned postings inside the stream
            return lb.mapInArrow(
                _blocks_to_purged_runs(st.ids_bc, shift), RUNS_SCHEMA
            )
        return lb.mapInArrow(_blocks_to_runs(shift), RUNS_SCHEMA)

    runs = _input_runs(in_ps[0], del_state[0], 0)
    for p, st, shift in zip(in_ps[1:], del_state[1:], shifts[1:]):
        runs = runs.unionByName(_input_runs(p, st, shift))
    _salt_encode_write_blocks(
        spark, runs, lexicon, n_docs, hot_df_threshold, target_group_size,
        num_partitions, avg_dl, block_size, n_buckets, out_p,
    )

    # sidecar tables (same layouts as build_block_index)
    _write_lexicon(lexicon, out_p, n_buckets)

    def _input_ds(ds_in, st, shift, schema):
        if st is not None:  # drop tombstoned rows, remap to survivor ranks
            ds_in = _remap_doc_ids(ds_in, st.ids_bc, schema)
        if shift:
            ds_in = ds_in.withColumn("doc_id", F.col("doc_id") + F.lit(shift))
        return ds_in

    ds_union = _input_ds(in_ds[0], del_state[0], 0, DOC_STATS_SCHEMA)
    for ds, st, shift in zip(in_ds[1:], del_state[1:], shifts[1:]):
        ds_union = ds_union.unionByName(
            _input_ds(ds, st, shift, DOC_STATS_SCHEMA)
        )
    write_table(ds_union, out_p.doc_stats, mode="overwrite")
    # staged_hwm: the cumulative STAGING-id-space watermark this index has
    # absorbed — Σ of each input's watermark (its own staged_hwm, else its
    # n_docs: for an index that never purged, the docID axis IS the
    # staging axis). A purge shrinks n_docs but not the watermark;
    # compact_incremental derives "new batches" from this, NOT n_docs —
    # otherwise the first post-purge compaction would silently re-absorb
    # (duplicate) every batch whose id_lo falls in the purged gap.
    staged_hwm = sum(
        int(m.get("staged_hwm") or m["n_docs"]) for m in metas
    )
    fingerprint = _write_meta(
        spark, out_p, build_id, n_docs, avg_dl, block_size, n_buckets,
        staged_hwm,
    )
    # texts sidecar: policy (emit_texts) was validated eagerly above; the
    # write happens here so the sidecar lands after the data tables. Row
    # groups stay contiguous docID ranges because the union preserves each
    # side's clustering and each index's shifted ids all sort after the
    # previous index's. Even when every input is empty the (fileless)
    # sidecar dir is written: it is the carrier of the store_texts decision
    # that compact_incremental infers the next delta's build from.
    if not is_table_identifier(out_dir):
        if emit_texts:
            with_texts = [
                (p, st, s)
                for p, st, s, h in zip(in_ps, del_state, shifts, has_texts)
                if h
            ]
            texts = None
            for p, st, shift in with_texts:
                part = _input_ds(
                    read_table(spark, p.texts, schema=TEXTS_SCHEMA),
                    st,
                    shift,
                    TEXTS_SCHEMA,
                )
                texts = part if texts is None else texts.unionByName(part)
            write_table(
                texts,
                out_p.texts,
                mode="overwrite",
                options={"parquet.block.size": 256 << 10},
            )
        else:
            # a reused out_dir may hold a PREVIOUS merge's sidecar; every
            # other table is mode="overwrite", so a textless (or
            # drop_texts) re-merge must not leave stale texts keyed by the
            # old docIDs behind
            import shutil

            shutil.rmtree(out_p.texts, ignore_errors=True)

    metrics = _finalize_metrics(
        spark, out_p, build_id, fingerprint, n_docs, avg_dl, t0
    )
    lexicon.unpersist()
    for st in del_state:
        if st is not None:
            st.ids_bc.unpersist()
    return metrics
