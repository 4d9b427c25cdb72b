"""Live-index deletion: cheap tombstones now, physical purge at compaction.

The reference engine has no delete (its index is immutable once merged —
merge_index.cpp writes a final artifact); a 100-TB training-data pipeline
does need one: right-to-be-forgotten and takedown requests arrive against
a corpus whose index took hours of cluster time to build, and rebuilding
per request is not an option. Two-phase design, the standard
tombstone-then-compact shape (Lucene's liveDocs + merge):

1. :func:`tombstone_delete` — O(deleted) work. Writes a ``deletes/``
   sidecar next to the index tables: the deleted doc_ids plus the EXACT
   per-term df/cf corrections and dl totals, derived by re-tokenizing only
   the deleted docs' text (from the texts sidecar or a supplied corpus
   frame — never a corpus scan). The serving reader
   (operators/wand.py) picks the sidecar up at construction and
   masks deleted postings at every decode site, scoring with the
   corrected N / avg_dl / df — BM25 scores come out BITWISE-equal to a
   from-scratch build on the surviving corpus (same integer sums, same
   float expression tree), so rankings match the honest rebuild exactly
   while the index files stay untouched. Stored block-max bounds are kept
   valid by the avg_dl drift factor (see ``_bf_hi``/``_bf_lo`` in the
   reader): the tf component is monotone in avg_dl and its ratio between
   two avg_dl values is bounded by their ratio, so scaling the stored
   bounds by max(1, avg_dl'/avg_dl) (and min(·) on the min side for
   negative IDF) keeps block-max WAND pruning exact.

2. :func:`purge_deletes` — the physical rewrite, run at the next natural
   compaction. Re-uses the incremental-merge machinery
   (plans/merge_index.py): every leaf block becomes a compressed run with
   deleted postings dropped and surviving docIDs REMAPPED to dense ranks
   (id' = id - |{deleted < id}|, one vectorized searchsorted against the
   broadcast sorted tombstone array), then flows through the same
   (term, salt) exchange + streaming block encoder as a fresh build.
   Output is CONTENT-IDENTICAL — payload bytes included — to a
   from-scratch build on the surviving corpus (pinned in
   tests/test_delete_index.py), with no re-tokenize and no text shuffle:
   ~1-3 compressed B/posting moved, the same bill as a merge.

Privacy semantics, stated plainly: a tombstone is a LOGICAL delete — no
serving surface (search, counts, freqs, snippets) will ever return the
doc again, but its bytes still sit in the posting blocks and the texts
sidecar until :func:`purge_deletes` (or a ``purge_tombstones=True``
compaction) physically rewrites them. A redaction obligation is met at
the purge, not at the tombstone.

Scale notes: the tombstone path costs O(deleted docs) everywhere — the
sidecar is meant for the small live-delete fraction between compactions;
the serving reader loads the tombstone array into memory (8 B/doc), and
the purge broadcasts it to executors, so a deletion wave beyond ~10^8
docs should go straight to a filtered rebuild instead. Merging an index
with pending tombstones is refused (the merged output would resurrect
the deleted docs — purge first; merge_many_block_indexes enforces it).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from websearchengine_spark.functions.codec import (
    concat_binary_column,
    vb_blocked_arrow,
    vb_decode,
)
from websearchengine_spark.plans.block_index import (
    BlockIndexPaths,
    BuildMetrics,
    _clear_stale_deletes,
)
from websearchengine_spark.plans.merge_index import (
    DOC_STATS_SCHEMA,
    LEXICON_READ_SCHEMA,
    RUNS_SCHEMA,
    TEXTS_SCHEMA,
    _finalize_metrics,
    _leaf_blocks,
    _salt_encode_write_blocks,
    _write_lexicon,
    _write_meta,
)
from websearchengine_spark.sources.catalog import (
    is_table_identifier,
    read_table,
    write_table,
)

# sidecar layout under <index_root>/deletes/ (filesystem only — the
# tombstone mask is a SERVING structure and the pyarrow reader requires
# the filesystem layout anyway)
DEL_IDS_SCHEMA = "doc_id long"
DEL_DF_SCHEMA = "term string, ddf long, dcf long"
DEL_META_SCHEMA = "n_deleted long, deleted_dl long, total_dl long"


def delete_paths(paths: BlockIndexPaths, base: str | None = None) -> tuple[str, str, str]:
    """(ids, df_corr, meta) table dirs of the tombstone sidecar."""
    d = base if base is not None else paths.deletes
    return os.path.join(d, "ids"), os.path.join(d, "df_corr"), os.path.join(d, "meta")


def live_deletes_dir(root: str) -> str | None:
    """The sidecar directory a READER should trust right now: ``deletes/``
    when present, else the crash-recovery ``deletes.prev/`` (a process
    killed between the two renames of the tombstone swap leaves the old
    complete state there — see tombstone_delete), else None. Read-only;
    the next tombstone_delete physically heals the rename."""
    if is_table_identifier(root):
        return None
    d = BlockIndexPaths(root).deletes
    if os.path.isdir(os.path.join(d, "meta")):
        return d
    if os.path.isdir(os.path.join(d + ".prev", "meta")):
        return d + ".prev"
    return None


def has_tombstones(root: str) -> bool:
    """True iff ``root`` carries a tombstone sidecar with ≥1 deleted doc.
    Cheap (reads one tiny meta table) — used by merge/compaction guards."""
    d = live_deletes_dir(root)
    if d is None:
        return False
    import pyarrow.dataset as ds

    t = ds.dataset(os.path.join(d, "meta")).to_table()
    return t.num_rows > 0 and int(t.column("n_deleted")[0].as_py()) > 0


def _heal_deletes_swap(paths: BlockIndexPaths) -> None:
    """Finish an interrupted tombstone swap before starting a new one:
    restore ``deletes/`` from the crash-recovery ``deletes.prev/`` if the
    second rename never ran, drop a superseded prev/ otherwise, and clear
    orphaned tmp dirs from dead writers."""
    import glob

    prev = paths.deletes + ".prev"
    if os.path.isdir(prev):
        if os.path.isdir(paths.deletes):
            shutil.rmtree(prev, ignore_errors=True)
        else:
            os.rename(prev, paths.deletes)
    for tmp in glob.glob(paths.deletes + ".tmp*"):
        shutil.rmtree(tmp, ignore_errors=True)


@dataclass
class DeleteMetrics:
    n_deleted_new: int       # docs tombstoned by THIS call (already-deleted
    #                          ids in the request are skipped, idempotent)
    n_deleted_total: int     # cumulative tombstones in the sidecar
    n_docs_live: int
    deleted_dl_total: int
    wall_s: float


def _selector(spark: SparkSession, conv_ids, turns) -> tuple[DataFrame, list[str]]:
    """→ (broadcastable selector frame, join cols). Exactly one of
    ``conv_ids`` (whole conversations) / ``turns`` ((conv_id, turn_idx)
    pairs) must be given."""
    if (conv_ids is None) == (turns is None):
        raise ValueError("pass exactly one of conv_ids= or turns=")
    if conv_ids is not None:
        df = (
            conv_ids
            if isinstance(conv_ids, DataFrame)
            else spark.createDataFrame(
                [(c,) for c in conv_ids], "conv_id string"
            )
        )
        return df.select("conv_id").distinct(), ["conv_id"]
    df = (
        turns
        if isinstance(turns, DataFrame)
        else spark.createDataFrame(
            [(c, int(t)) for c, t in turns], "conv_id string, turn_idx int"
        )
    )
    return df.select("conv_id", "turn_idx").distinct(), ["conv_id", "turn_idx"]


def tombstone_delete(
    spark: SparkSession,
    index_dir: str,
    *,
    conv_ids=None,
    turns=None,
    corpus: DataFrame | None = None,
) -> DeleteMetrics:
    """Tombstone the selected docs of the index at ``index_dir`` (in place:
    writes/extends the ``deletes/`` sidecar; the index tables are not
    touched). Idempotent — re-deleting already-tombstoned docs is a no-op,
    and the correction math never double-counts.

    Exact df corrections need the deleted docs' TEXT (to know which terms
    lose a document): by default it comes from the texts sidecar
    (``store_texts=True`` builds); for textless indexes pass ``corpus=``
    (the original transcripts frame, or any frame carrying
    (conv_id, turn_idx, text) for at least the deleted turns)."""
    t0 = time.time()
    if is_table_identifier(index_dir):
        raise ValueError(
            "tombstone sidecars require a filesystem index root (the "
            "serving reader that consumes them is filesystem-only)"
        )
    paths = BlockIndexPaths(index_dir)
    _heal_deletes_swap(paths)
    ids_p, dfc_p, meta_p = delete_paths(paths)
    doc_stats = read_table(spark, paths.doc_stats, schema=DOC_STATS_SCHEMA)
    sel, join_cols = _selector(spark, conv_ids, turns)
    targeted = doc_stats.join(F.broadcast(sel), join_cols, "left_semi").select(
        "doc_id", "conv_id", "turn_idx", "term_cnt"
    )

    existing = os.path.isdir(meta_p)
    if existing:
        old_ids = read_table(spark, ids_p, schema=DEL_IDS_SCHEMA)
        old_dfc = read_table(spark, dfc_p, schema=DEL_DF_SCHEMA)
        om = read_table(spark, meta_p, schema=DEL_META_SCHEMA).collect()[0]
        old_n, old_dl, total_dl = (
            int(om["n_deleted"]), int(om["deleted_dl"]), int(om["total_dl"])
        )
        targeted = targeted.join(old_ids, "doc_id", "left_anti")
    else:
        old_ids = old_dfc = None
        old_n = old_dl = 0
        # the one full-table agg, paid once per index (an exact integer —
        # invariant across deletes, carried forward in the sidecar meta)
        total_dl = int(
            doc_stats.agg(F.sum("term_cnt")).collect()[0][0] or 0
        )
    targeted = targeted.persist()
    try:
        agg = targeted.agg(
            F.count(F.lit(1)).alias("n"), F.sum("term_cnt").alias("dl")
        ).collect()[0]
        n_new, dl_new = int(agg["n"]), int(agg["dl"] or 0)
        meta_all = read_table(spark, paths.meta).collect()[0]
        n_docs = int(meta_all["n_docs"])
        if n_new == 0:
            return DeleteMetrics(
                0, old_n, n_docs - old_n, old_dl, time.time() - t0
            )

        # deleted docs' text → exact per-term corrections (ddf = docs lost,
        # dcf = collection frequency lost), via the SAME tokenizer as the
        # build (functions/tokenizer.py — create_index.cpp:96-115 semantics)
        if corpus is not None:
            # broadcast-semi filters the corpus scan down to the deleted
            # turns (narrow); both sides of the id-attach join are then
            # O(deleted) — the corpus never shuffles
            deleted_turns = corpus.select("conv_id", "turn_idx", "text").join(
                F.broadcast(targeted.select("conv_id", "turn_idx")),
                ["conv_id", "turn_idx"],
                "left_semi",
            )
            texts = targeted.select("doc_id", "conv_id", "turn_idx").join(
                F.broadcast(deleted_turns), ["conv_id", "turn_idx"]
            ).select("doc_id", "text")
        else:
            if not os.path.isdir(paths.texts):
                raise ValueError(
                    "index has no texts sidecar: pass corpus= (the "
                    "transcripts frame) so the exact df corrections can be "
                    "derived, or rebuild with store_texts=True"
                )
            texts = read_table(spark, paths.texts, schema=TEXTS_SCHEMA).join(
                F.broadcast(targeted.select("doc_id")), "doc_id", "left_semi"
            )
        from websearchengine_spark.functions.tokenizer import (
            tokenize_postings_frame,
        )

        def _tok(batches):
            for pdf in batches:
                yield tokenize_postings_frame(pdf, [])

        flat = texts.mapInPandas(_tok, "doc_id long, term string, tf long, dl long")
        n_texts = flat.filter(F.col("term").isNull()).count()
        if n_texts != n_new:
            raise ValueError(
                f"text rows for {n_texts} of {n_new} deleted docs — the "
                "df corrections would be inexact; supply corpus= covering "
                "every deleted (conv_id, turn_idx)"
            )
        new_dfc = (
            flat.filter(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("ddf"), F.sum("tf").alias("dcf"))
        )
        if old_dfc is not None:
            new_dfc = (
                new_dfc.unionByName(old_dfc)
                .groupBy("term")
                .agg(F.sum("ddf").alias("ddf"), F.sum("dcf").alias("dcf"))
            )
        all_ids = targeted.select("doc_id")
        if old_ids is not None:
            all_ids = all_ids.unionByName(old_ids)

        # write the new sidecar beside the old, then swap via the fixed
        # crash-recovery name ``deletes.prev``: every reachable state is
        # safe — an exception restores the old dir here, and a hard KILL
        # between the two renames leaves the old state at deletes.prev,
        # which readers trust (live_deletes_dir) and the next
        # tombstone_delete physically restores (_heal_deletes_swap)
        tmp = paths.deletes + f".tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        tmp_ids, tmp_dfc, tmp_meta = delete_paths(paths, base=tmp)
        try:
            write_table(
                all_ids.coalesce(1).sortWithinPartitions("doc_id"),
                tmp_ids,
                mode="overwrite",
            )
            write_table(new_dfc, tmp_dfc, mode="overwrite")
            write_table(
                spark.createDataFrame(
                    [(old_n + n_new, old_dl + dl_new, total_dl)],
                    DEL_META_SCHEMA,
                ),
                tmp_meta,
                mode="overwrite",
            )
            prev = paths.deletes + ".prev"
            if os.path.isdir(paths.deletes):
                os.rename(paths.deletes, prev)
            try:
                os.rename(tmp, paths.deletes)
            except BaseException:
                if os.path.isdir(prev) and not os.path.isdir(paths.deletes):
                    os.rename(prev, paths.deletes)  # restore old state
                raise
            shutil.rmtree(prev, ignore_errors=True)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return DeleteMetrics(
            n_deleted_new=n_new,
            n_deleted_total=old_n + n_new,
            n_docs_live=n_docs - old_n - n_new,
            deleted_dl_total=old_dl + dl_new,
            wall_s=time.time() - t0,
        )
    finally:
        targeted.unpersist()


def _blocks_to_purged_runs(bc_deleted, shift: int = 0):
    """mapInArrow body: leaf block rows → compressed runs with deleted
    postings DROPPED and surviving docIDs remapped to dense ranks
    (id' = id - |{deleted < id}| + shift). Same vectorized
    decode/re-encode primitives as merge_index._blocks_to_runs, plus the
    tf/dl payloads are re-encoded too (their values survive unchanged but
    their block segmentation shifts with the drops). ``shift`` is the
    arrival-block offset when purging inline inside a k-way merge
    (merge_many_block_indexes(purge_tombstones=True))."""
    import pyarrow as pa

    def to_runs(batches):
        dels = bc_deleted.value  # sorted int64, ≥1 entries
        for rb in batches:
            t = pa.Table.from_batches([rb])
            if t.num_rows == 0:
                continue
            ns = t.column("n").to_numpy().astype(np.int64)
            los = t.column("doc_lo").to_numpy().astype(np.int64)
            vals = vb_decode(concat_binary_column(t.column("ids_vb")))
            n = len(vals)
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            c = np.cumsum(vals, dtype=np.uint64)
            base = (c - vals)[starts]
            rel = (c - np.repeat(base, ns)).astype(np.int64)
            ids = rel + np.repeat(los - 1, ns)  # absolute docIDs
            j = np.searchsorted(dels, ids)
            hit = np.zeros(n, dtype=bool)
            ok = j < len(dels)
            hit[ok] = dels[j[ok]] == ids[ok]
            keep = ~hit
            new_ids = (ids - j)[keep] + shift  # dense survivor rank + block offset
            tfs = vb_decode(concat_binary_column(t.column("tfs_vb")))[keep]
            dls = vb_decode(concat_binary_column(t.column("dls_vb")))[keep]
            block_of = np.repeat(np.arange(len(ns)), ns)[keep]
            kept = np.bincount(block_of, minlength=len(ns))
            nz = np.nonzero(kept)[0]
            if len(nz) == 0:
                continue
            new_ns = kept[nz]
            nstarts = np.concatenate(([0], np.cumsum(new_ns)[:-1]))
            nends = np.concatenate((nstarts[1:], [int(new_ns.sum())]))
            u = new_ids.astype(np.uint64)
            gaps = np.empty(len(u), dtype=np.uint64)
            if len(u):
                gaps[0] = u[0]
                np.subtract(u[1:], u[:-1], out=gaps[1:])
            gaps[nstarts] = u[nstarts]  # absolute heads (global runs)
            terms = t.column("term").combine_chunks().take(pa.array(nz))
            yield pa.RecordBatch.from_arrays(
                [
                    terms,
                    pa.array(new_ids[nstarts], type=pa.int64()),  # run_pos:
                    #   remapped doc_lo — monotone remap keeps per-term
                    #   run order == docID order
                    pa.array(new_ns, type=pa.int64()),
                    vb_blocked_arrow(gaps, nstarts, nends),
                    vb_blocked_arrow(tfs, nstarts, nends),
                    vb_blocked_arrow(dls, nstarts, nends),
                ],
                names=["term", "run_pos", "n", "ids_vb", "tfs_vb", "dls_vb"],
            )

    return to_runs


def _remap_doc_ids(df: DataFrame, bc_deleted, schema) -> DataFrame:
    """Drop tombstoned rows and remap ``doc_id`` to dense survivor ranks —
    one narrow mapInArrow, no join, no shuffle."""
    import pyarrow as pa

    def remap(batches):
        dels = bc_deleted.value
        for rb in batches:
            t = pa.Table.from_batches([rb])
            if t.num_rows == 0:
                continue
            ids = t.column("doc_id").to_numpy().astype(np.int64)
            j = np.searchsorted(dels, ids)
            hit = np.zeros(len(ids), dtype=bool)
            ok = j < len(dels)
            hit[ok] = dels[j[ok]] == ids[ok]
            keep = ~hit
            if not keep.any():
                continue
            t = t.filter(pa.array(keep))
            new = pa.array(
                (ids - j)[keep].astype(np.int64), type=pa.int64()
            )
            i = t.schema.get_field_index("doc_id")
            yield from t.set_column(i, "doc_id", new).to_batches()

    return df.mapInArrow(remap, schema)


def purge_deletes(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    *,
    build_id: str = "purge0",
    hot_df_threshold: int = 100_000,
    target_group_size: int = 50_000,
    num_partitions: int | None = None,
) -> BuildMetrics:
    """Physically rewrite the index at ``index_dir`` into ``out_dir`` with
    every tombstoned doc removed and docIDs renumbered densely — the
    compaction half of the two-phase delete. Content-identical (payload
    bytes included) to a from-scratch build on the surviving corpus; the
    output carries NO deletes sidecar. ``out_dir`` must be a new location
    (write-sibling-then-swap, same rule as the merge)."""
    t0 = time.time()
    if is_table_identifier(index_dir) or is_table_identifier(out_dir):
        raise ValueError("purge_deletes requires filesystem index roots")
    if os.path.realpath(out_dir) == os.path.realpath(index_dir):
        raise ValueError(
            "out_dir must be a NEW location: the purge reads the input "
            "while writing the output (write to a sibling dir, then swap)"
        )
    paths = BlockIndexPaths(index_dir)
    out_p = BlockIndexPaths(out_dir)
    _clear_stale_deletes(out_p)  # reused out_dir: see block_index note
    if not has_tombstones(index_dir):
        raise ValueError(
            f"index at {index_dir} has no tombstones to purge "
            "(tombstone_delete first, or just copy the index)"
        )
    ids_p, dfc_p, meta_p = delete_paths(
        paths, base=live_deletes_dir(index_dir)
    )
    dm = read_table(spark, meta_p, schema=DEL_META_SCHEMA).collect()[0]
    n_deleted, deleted_dl, total_dl = (
        int(dm["n_deleted"]), int(dm["deleted_dl"]), int(dm["total_dl"])
    )
    meta = read_table(spark, paths.meta).collect()[0].asDict()
    if int(meta.get("block_format", 1)) != 3:
        raise ValueError("purge requires a block_format-3 index")
    block_size = int(meta["block_size"])
    n_buckets = int(meta["n_buckets"])
    n_live = int(meta["n_docs"]) - n_deleted
    # exact: the same integer sums / single float division a from-scratch
    # build on the surviving corpus performs
    avg_dl = ((total_dl - deleted_dl) / n_live) if n_live else 0.0

    del_arr = np.sort(
        read_table(spark, ids_p, schema=DEL_IDS_SCHEMA)
        .toPandas()["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    bc = spark.sparkContext.broadcast(del_arr)

    # corrected lexicon: df/cf minus the sidecar's exact corrections
    lexicon = (
        read_table(spark, paths.lexicon, schema=LEXICON_READ_SCHEMA)
        .select("term", "df", "cf")
        .join(read_table(spark, dfc_p, schema=DEL_DF_SCHEMA), "term", "left")
        .select(
            "term",
            (F.col("df") - F.coalesce(F.col("ddf"), F.lit(0))).alias("df"),
            (F.col("cf") - F.coalesce(F.col("dcf"), F.lit(0))).alias("cf"),
        )
        .filter(F.col("df") > 0)
    ).persist()

    runs = _leaf_blocks(spark, paths).mapInArrow(
        _blocks_to_purged_runs(bc), RUNS_SCHEMA
    )
    # hot-term salting + (term, salt) exchange + streaming encoder +
    # bucketed writes — the same shared tail as the k-way merge
    _salt_encode_write_blocks(
        spark, runs, lexicon, n_live, hot_df_threshold, target_group_size,
        num_partitions, avg_dl, block_size, n_buckets, out_p,
    )
    _write_lexicon(lexicon, out_p, n_buckets)
    write_table(
        _remap_doc_ids(
            read_table(spark, paths.doc_stats, schema=DOC_STATS_SCHEMA),
            bc,
            DOC_STATS_SCHEMA,
        ),
        out_p.doc_stats,
        mode="overwrite",
    )
    # preserve the staging-id-space watermark across the purge: n_docs
    # shrinks to the live count, but the batches this index has ABSORBED
    # don't change — compact_incremental keys its new-batch detection on
    # staged_hwm (see merge_index.py), and deriving it from the purged
    # n_docs would re-absorb (duplicate) batches in the purged gap
    staged_hwm = int(meta.get("staged_hwm") or meta["n_docs"])
    fingerprint = _write_meta(
        spark, out_p, build_id, n_live, avg_dl, block_size, n_buckets,
        staged_hwm,
    )
    if os.path.isdir(paths.texts):
        # filtered + remapped sidecar: the monotone remap preserves each
        # file's doc_id clustering, so row-group pruning still holds
        write_table(
            _remap_doc_ids(
                read_table(spark, paths.texts, schema=TEXTS_SCHEMA),
                bc,
                TEXTS_SCHEMA,
            ),
            out_p.texts,
            mode="overwrite",
            options={"parquet.block.size": 256 << 10},
        )

    metrics = _finalize_metrics(
        spark, out_p, build_id, fingerprint, n_live, avg_dl, t0
    )
    lexicon.unpersist()
    bc.unpersist()
    return metrics
