"""Serving query engine: vectorized block-max scoring over the block index.

The low-latency counterpart of the exhaustive DataFrame scorer — the rebuild
of the reference's interactive query processor (main.cpp Searcher, 465-553),
upgraded from decode-everything-then-full-sort (main.cpp:584-630) to:

- partition-pruned block fetch: only the query terms' buckets/blocks are read
  (pyarrow dataset over the hive-partitioned blocks table — the analogue of
  the lexicon-offset fseek, main.cpp:120-173);
- lazy per-block varbyte+delta decode with an LRU posting cache
  (main.cpp:466 posting cache analogue);
- galloping (searchsorted) posting-list intersection for conjunctive mode
  (main.cpp:599-607's std::set_intersection, now with block skip pointers);
- vectorized term-at-a-time scoring with a **candidate-bounded accumulator**
  for machine-reasonable posting volumes: memory is O(Σ candidate postings),
  never O(n_docs) (a flat dense accumulator is used only while n_docs is
  driver-RAM-sized — the 10^12-doc scale path is the compressed one);
- **block-at-a-time block-max WAND** for large disjunctions: candidate
  blocks are selected from block-max metadata and scored as whole numpy
  batches — no doc-at-a-time Python loop. Exact under the reference's
  quirks (SURVEY.md §4.4):
  - **negative IDF** (no floor, main.cpp:446-450): the bound for a doc not
    known to contain a term is max(block_ub, 0) (absent ⇒ contributes 0);
  - **tie-break** (score DESC, docID ASC, main.cpp:626-630): pruning uses
    strict `bound < θ_score` only, so any potential exact tie is fully
    scored, and the bounded heap orders by (score, −doc_id) — push order
    cannot change the selected set;
  - **float summation order**: exact scores are summed in sorted-term order
    (main.cpp:574), bit-identical to the oracle;
- LRU result cache keyed by the cleaned (deduped, sorted) query string
  (main.cpp:78-110, 424-430);
- :meth:`BlockIndexReader.search_full` — the reference's assembled result
  object {cached, time, count, data:[{rank, score, freqs, …, snippet}]}
  (main.cpp:465-553, JSON shape readme.md:205-223).
"""

from __future__ import annotations

import heapq
import math
import os
import threading
import time
from bisect import bisect_left
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from websearchengine_spark.functions.codec import vb_decode
from websearchengine_spark.functions.tokenizer import clean_query
from websearchengine_spark.plans.block_index import BlockIndexPaths, term_bucket

# BM25 parameters and THE shared tf-component expression (plans/build.py):
# every scorer here (per-posting ``contrib``, TAAT, range-sharded TAAT, the
# WAND decode loop) routes through the ONE site the block encoder also uses
# for its stored bounds — cross-path rank identity and the exactness of
# strict bound < θ pruning hold at ulp boundaries only while the float
# expression tree is literally identical everywhere.
from websearchengine_spark.plans.build import B, K1, tf_component as _tf_component

INF = 1 << 62


class _BucketRGs:
    """Row-group-pruned reads over one bucket directory of a hive-
    partitioned index table.

    pyarrow's dataset Scanner does NOT prune parquet row groups from the
    filter expression on these reads (measured at 480k docs: every
    filtered ``to_table`` decoded the bucket's whole payload region —
    ~10 ms per serving fetch, 80% of warm conjunctive query time). The
    bucket files are written sorted by (kind, term, doc_lo), so per-row-
    group min/max statistics identify exactly the groups a (kind, term,
    doc-range) request can touch. This class reads each file's FOOTER once
    (O(row groups) metadata, no data pages — scale-safe at any corpus
    size) and serves requests via ``read_row_groups`` on the selected
    groups; callers apply the exact residual row filter afterwards, so
    selection only has to be a superset (missing statistics degrade to
    "read everything", never to wrong answers). This is the reference's
    page-table byte seek (main.cpp:498) re-expressed for parquet.

    ``rg_cache``: optional LRU of decoded row-group tables keyed
    (file, group, columns) — the analogue of the reference's mmap + OS
    page cache (hot row groups stay decoded, cold ones are re-read);
    bounded, so reader memory stays O(cache) at any corpus size."""

    __slots__ = ("parts", "stats", "rg_cache", "_dir")

    def __init__(self, bucket_dir: str, rg_cache: "_LRU | None" = None):
        self.rg_cache = rg_cache
        self._dir = bucket_dir
        files = (
            sorted(
                os.path.join(bucket_dir, f)
                for f in os.listdir(bucket_dir)
                if f.endswith(".parquet")
            )
            if os.path.isdir(bucket_dir)
            else []
        )
        self.parts = [pq.ParquetFile(p) for p in files]
        # per (file, rg): {col: (min, max) or None}
        self.stats: list[list[dict]] = []
        for pf in self.parts:
            md = pf.metadata
            rgs = []
            for ri in range(md.num_row_groups):
                rg = md.row_group(ri)
                st: dict = {}
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    name = col.path_in_schema
                    if name in ("kind", "term", "doc_lo", "doc_hi"):
                        s = col.statistics
                        st[name] = (
                            (s.min, s.max)
                            if s is not None and s.has_min_max
                            else None
                        )
                rgs.append(st)
            self.stats.append(rgs)

    @staticmethod
    def _overlaps(st, lo, hi) -> bool:
        if st is None:
            return True  # no statistics → conservative
        return not (st[1] < lo or st[0] > hi)

    def read(
        self,
        columns: list[str],
        kind: int | None = None,
        terms: list[str] | None = None,
        ranges_by_term: dict[str, list[tuple[int, int]]] | None = None,
    ) -> pa.Table:
        """Concatenated rows of every row group whose statistics can
        contain the request. ``ranges_by_term`` further prunes by doc_lo
        (only meaningful with per-term ranges; conservative across terms
        sharing a group)."""
        out = []
        want_cols = columns
        for pf, rgs in zip(self.parts, self.stats):
            sel = []
            for ri, st in enumerate(rgs):
                if kind is not None and not self._overlaps(
                    st.get("kind"), kind, kind
                ):
                    continue
                if terms is not None:
                    tst = st.get("term")
                    if tst is not None and not any(
                        tst[0] <= t <= tst[1] for t in terms
                    ):
                        continue
                    if ranges_by_term is not None and tst is not None:
                        lst = st.get("doc_lo")
                        hst = st.get("doc_hi")
                        # doc stats prune only when the group holds a single
                        # term (group entirely inside one term). A group can
                        # contain a block POSTING-overlapping [lo, hi] iff
                        # min(doc_lo) <= hi and max(doc_hi) >= lo — the
                        # doc_hi side matters for callers whose range cuts
                        # fall INSIDE a block (the parallel-decode shards):
                        # the straddling block can be the last row of a
                        # group whose every doc_lo < lo. Missing statistics
                        # degrade to "can't prune" on that side.
                        if (
                            tst[0] == tst[1]
                            and tst[0] in ranges_by_term
                            and not any(
                                not (
                                    (hst is not None and hst[1] < lo)
                                    or (lst is not None and lst[0] > hi)
                                )
                                for lo, hi in ranges_by_term[tst[0]]
                            )
                        ):
                            continue
                sel.append(ri)
            if not sel:
                continue
            if self.rg_cache is None:
                out.append(pf.read_row_groups(sel, columns=want_cols))
                continue
            ckey_cols = tuple(want_cols)
            for ri in sel:
                key = ("rg", self._dir, id(pf), ri, ckey_cols)
                tbl = self.rg_cache.get_(key)
                if tbl is None:
                    tbl = pf.read_row_groups([ri], columns=want_cols)
                    self.rg_cache.put(key, tbl)
                out.append(tbl)
        if not out:
            schema = (
                self.parts[0].schema_arrow if self.parts else pa.schema([])
            )
            fields = [schema.field(c) for c in want_cols] if self.parts else []
            return pa.table(
                {f.name: pa.array([], type=f.type) for f in fields}
            )
        return pa.concat_tables(out)


class _LRU(OrderedDict):
    """O(1) thread-safe LRU cache (reference main.cpp:78-110; the
    thread-safe variant is the evaluator pool's shared cache,
    evaluation.cpp:84-121). A lock guards every access: concurrent
    ``search()`` callers sharing one reader would otherwise corrupt the
    OrderedDict's links mid-``move_to_end``/``popitem``. Values are safe
    to share because fetch helpers collect DIRECT references and never
    read back through the cache (see lexicon_rows) — a racing eviction
    costs a duplicate fetch, never a wrong answer."""

    def __init__(self, cap: int):
        super().__init__()
        self.cap = cap
        self._lock = threading.Lock()

    def get_(self, key):
        with self._lock:
            if key in self:
                self.move_to_end(key)
                return self[key]
            return None

    def get2(self, key):
        """(present, value) in ONE locked read — callers that must
        distinguish a stored None from a miss cannot use ``key in cache``
        followed by ``get_`` (a concurrent eviction between the two turns
        a present entry into a miss, which the fetch helpers would treat
        as term-absent)."""
        with self._lock:
            if key in self:
                self.move_to_end(key)
                return True, self[key]
            return False, None

    def put(self, key, value):
        with self._lock:
            self[key] = value
            self.move_to_end(key)
            if len(self) > self.cap:
                self.popitem(last=False)


@dataclass
class _Leaf:
    """One superblock's leaf-block arrays (metadata + raw varbyte payloads),
    sorted by doc_lo. The unit of lazy fetch: a query touches a superblock →
    its ≤ SUPERBLOCK_FACTOR leaf blocks arrive in one pruned parquet read."""

    los: np.ndarray       # int64 doc_lo per leaf block
    his: np.ndarray       # int64 doc_hi
    ns: np.ndarray        # int64 posting count
    max_tfc: np.ndarray   # float64 BM25 tf-component block max
    min_tfc: np.ndarray   # float64 block min (negative-IDF bound support)
    ids_vb: list          # raw varbyte gap payloads (decoded lazily)
    tfs_vb: list
    dls_vb: list


class TermCursor:
    """Two-level cursor over one term's ordered posting blocks: superblock
    skip (bisect over ~128-block summaries) → leaf-block skip (bisect within
    the superblock) → lazy varbyte decode of the one landing block. Leaf
    metadata + payloads are fetched per SUPERBLOCK on demand through the
    reader (LRU-shared across queries), so a cursor over a 10^9-posting
    stopword term materializes O(df / 16384) superblock rows up front and
    only the leaf data its skips actually land in — never the whole list.
    Used by the galloping conjunctive path (selective queries); the
    disjunctive paths are block/array-vectorized and bypass cursors."""

    __slots__ = ("term", "df", "idf", "avg_dl", "reader", "sb_los", "sb_his",
                 "sbi", "leaf", "bi", "pos", "ids", "tfs", "dls")

    def __init__(self, term: str, df: int, idf: float, avg_dl: float,
                 reader: "BlockIndexReader", sbm):
        self.term = term
        self.df = df
        self.idf = idf
        self.avg_dl = avg_dl
        self.reader = reader
        self.sb_los, self.sb_his = sbm[0], sbm[1]
        # LAZY: no leaf data is fetched until a skip actually lands in a
        # superblock — a cursor that galloping immediately jumps past its
        # first superblocks never touches their leaf blocks at all
        self.sbi = 0
        self.leaf = None
        self.ids = None
        self.bi = 0
        self.pos = 0

    def _enter_sb(self, sbi: int):
        if sbi >= len(self.sb_his):
            self.sbi = len(self.sb_his)
            self.ids = None
            return
        self.sbi = sbi
        self.leaf = self.reader._leaf_for(self.term, sbi)
        self.bi = 0
        self.pos = 0
        self._decode()

    def _decode(self):
        # loop, not recursion: consecutive blocks (or whole superblocks)
        # fully emptied by tombstones are skipped iteratively
        while True:
            leaf = self.leaf
            if self.bi >= len(leaf.his):
                # past the superblock's last block → first of the next
                sbi = self.sbi + 1
                if sbi >= len(self.sb_his):
                    self.sbi = sbi
                    self.ids = None
                    return
                self.sbi = sbi
                self.leaf = self.reader._leaf_for(self.term, sbi)
                self.bi = 0
                self.pos = 0
                continue
            i = self.bi
            # ids_vb holds gaps with the block head measured from doc_lo - 1
            ids = (
                np.int64(leaf.los[i] - 1)
                + np.cumsum(
                    vb_decode(leaf.ids_vb[i]), dtype=np.uint64
                ).astype(np.int64)
            )
            keep = self.reader._del_mask(ids)
            if keep is None:
                self.ids = ids
                self.tfs = vb_decode(leaf.tfs_vb[i])
                self.dls = vb_decode(leaf.dls_vb[i])
                return
            ids = ids[keep]
            if len(ids) == 0:  # block fully tombstoned → skip
                self.bi += 1
                continue
            self.ids = ids
            self.tfs = vb_decode(leaf.tfs_vb[i])[keep]
            self.dls = vb_decode(leaf.dls_vb[i])[keep]
            return

    def cur_doc(self) -> int:
        if self.sbi >= len(self.sb_his):
            return INF
        if self.ids is None:
            self._enter_sb(self.sbi)
            if self.ids is None:
                return INF
        return int(self.ids[self.pos])

    def next_geq(self, target: int) -> int:
        """Advance to the first posting with doc_id ≥ target (galloping:
        bisect superblock doc_hi pointers — WITHOUT loading skipped
        superblocks — then leaf doc_hi pointers, then searchsorted inside
        the one decoded block)."""
        if self.sbi >= len(self.sb_his):
            return INF
        if self.ids is not None and target <= int(self.ids[self.pos]):
            return int(self.ids[self.pos])
        if target > self.sb_his[self.sbi]:
            sbi = bisect_left(self.sb_his, target, lo=self.sbi + 1)
            if sbi >= len(self.sb_his):
                self.sbi = len(self.sb_his)
                self.ids = None
                return INF
            self.sbi = sbi
            self.leaf = None
            self.ids = None
            self.bi = 0
            self.pos = 0
        if self.ids is None:
            self._enter_sb(self.sbi)
            if self.ids is None:
                return INF
        bi = bisect_left(self.leaf.his, target, lo=self.bi)
        if bi >= len(self.leaf.his):  # safety: gap at superblock tail
            self._enter_sb(self.sbi + 1)
            return self.cur_doc()
        if bi != self.bi:
            self.bi = bi
            self._decode()
            self.pos = 0
            if self.ids is None:  # landing block + every later one fully
                return INF        # tombstoned → term exhausted
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # gap between blocks
            self.bi += 1
            self.pos = 0
            self._decode()
            if self.ids is None:
                return INF
        return int(self.ids[self.pos])

    def advance(self) -> int:
        return self.next_geq(self.cur_doc() + 1)

    def contrib(self) -> float:
        """Exact BM25 contribution at the current posting — identical float
        expression tree to the oracle (main.cpp:446-450)."""
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * _tf_component(tf, dl, self.avg_dl)

    def block_ub(self) -> float:
        i = self.bi
        r = self.reader  # tombstone avg_dl drift factors (1.0 when none)
        return max(
            self.idf * self.leaf.max_tfc[i] * r._bf_hi,
            self.idf * self.leaf.min_tfc[i] * r._bf_lo,
        )


class BlockIndexReader:
    """Driver/serving-side reader of the block index written by
    plans.block_index — no Spark session needed (pyarrow only).

    ``dense_docs_max`` bounds the flat term-at-a-time accumulator: above it
    (or when the query is too selective for a dense array to pay off) the
    scorer compresses the candidate set first, so per-query memory is
    O(candidate postings) regardless of corpus size.
    """

    def __init__(self, root: str, result_cache: int = 1000, posting_cache: int = 4096,
                 taat_threshold: int = 5_000_000, dense_docs_max: int = 1 << 26,
                 rg_cache: int = 128, parallel_workers: int = 0,
                 parallel_df_threshold: int = 20_000_000):
        self.paths = BlockIndexPaths(root)
        meta = pq.read_table(self.paths.meta).to_pylist()[0]
        fmt = int(meta.get("block_format", 1))
        if fmt != 3:
            raise ValueError(
                f"index at {root} has block_format {fmt}; this reader "
                "requires format 3 (block-head gap from doc_lo - 1 + "
                "superblock metadata rows) — rebuild the index"
            )
        self.n_docs = int(meta["n_docs"])
        self.avg_dl = float(meta["avg_dl"])
        self.n_buckets = int(meta["n_buckets"])
        # tombstone sidecar (plans/delete_index.py): when present, deleted
        # postings are masked at every decode site and BM25 stats (N,
        # avg_dl, per-term df) are corrected with the sidecar's exact
        # integers, so scores come out BITWISE-equal to a from-scratch
        # build on the surviving corpus. n_docs stays the PHYSICAL docID
        # axis (accumulator sizing, shard bounds); n_docs_live drives IDF.
        self.avg_dl_built = self.avg_dl
        self.n_docs_live = self.n_docs
        self._deleted: np.ndarray | None = None
        self._df_corr: dict[str, int] = {}
        self._bf_hi = self._bf_lo = 1.0
        # trust deletes/ when present, else the crash-recovery
        # deletes.prev/ left by a writer killed mid-swap (the old complete
        # state — see delete_index.tombstone_delete's swap protocol)
        ddir = self.paths.deletes
        if not os.path.isdir(os.path.join(ddir, "meta")) and os.path.isdir(
            os.path.join(ddir + ".prev", "meta")
        ):
            ddir = ddir + ".prev"
        dmeta = os.path.join(ddir, "meta")
        if os.path.isdir(dmeta):
            dm = pq.read_table(dmeta).to_pylist()[0]
            n_del = int(dm["n_deleted"])
            if n_del:
                self._deleted = np.sort(
                    pq.read_table(os.path.join(ddir, "ids"))
                    .column("doc_id")
                    .to_numpy()
                    .astype(np.int64)
                )
                dfc = pq.read_table(os.path.join(ddir, "df_corr"))
                self._df_corr = {
                    t: int(d)
                    for t, d in zip(
                        dfc.column("term").to_pylist(),
                        dfc.column("ddf").to_pylist(),
                    )
                }
                self.n_docs_live = self.n_docs - n_del
                live_dl = int(dm["total_dl"]) - int(dm["deleted_dl"])
                self.avg_dl = (
                    live_dl / self.n_docs_live if self.n_docs_live else 0.0
                )
                # stored block-max bounds were computed with avg_dl_built;
                # the tf component is monotone in avg_dl and its ratio
                # between two avg_dl values is bounded by their ratio, so
                # scaling stored maxima by max(1, r) (and minima by
                # min(1, r) for the negative-IDF branch) keeps every bound
                # a true bound — strict-< pruning stays exact
                r = (
                    self.avg_dl / self.avg_dl_built
                    if self.avg_dl_built > 0.0
                    else 1.0
                )
                self._bf_hi = max(1.0, r)
                self._bf_lo = min(1.0, r)
        try:
            self._blocks_ds = ds.dataset(self.paths.blocks, partitioning="hive")
            self._lex_ds = ds.dataset(self.paths.lexicon, partitioning="hive")
            if not self._lex_ds.files or not self._blocks_ds.files:
                raise FileNotFoundError("no data files")
        except FileNotFoundError:
            # empty corpus: the build wrote meta but no block/lexicon data
            # files — every search over an empty index returns []. Any
            # other failure (corrupt parquet, permissions) propagates.
            self._blocks_ds = None
            self._lex_ds = None
        self._result_cache = _LRU(result_cache)
        self._posting_cache = _LRU(posting_cache)
        # per-bucket row-group indexes (footer statistics only), built
        # lazily on first touch — see _BucketRGs. The shared rg LRU holds
        # decoded row-group tables (~1 MB each at the build's block.size):
        # the reference's mmap + page cache, bounded
        self._rg_cache = _LRU(rg_cache) if rg_cache else None
        self._block_rgs: dict[int, _BucketRGs] = {}
        self._lex_rgs: dict[int, _BucketRGs] = {}
        # cumulative metadata/payload fetch instrumentation (bench snapshots
        # deltas around a cold query to prove the two-level fetch is bounded)
        self.sb_rows_fetched = 0
        self.leaf_rows_fetched = 0
        # queries whose total candidate-posting count is below this run the
        # vectorized term-at-a-time scorer (numpy, C-speed per posting);
        # above it, block-max WAND can skip whole blocks without decoding
        self.taat_threshold = taat_threshold
        self.dense_docs_max = dense_docs_max
        # within-query parallel decode (dense cold queries): when a query's
        # total df reaches parallel_df_threshold and parallel_workers > 0,
        # the TAAT scorer shards the docID axis across a process pool —
        # each worker decodes + scores its contiguous doc range against its
        # own reader and returns a local exact top-k; the merge is exact
        # because every doc's score is complete within one shard (posting
        # lists are doc-sorted, shards are doc ranges). The 50M-doc smoke
        # measured a single-process dense disjunction at 62-71 s — pure
        # decode, Python-process-bound — which batch eval sidesteps by
        # distributing ACROSS queries; this is the within-ONE-query analogue
        # (the reference cannot do this at all: one query = one thread).
        self.parallel_workers = parallel_workers
        self.parallel_df_threshold = parallel_df_threshold
        self._pool = None  # spawned lazily; see _ensure_pool / close
        self._pool_lock = threading.Lock()
        self.last_parallel = False  # instrumentation for tests/bench
        # postings decoded+scored by the LAST block-max WAND evaluation;
        # -1 = the last query did not complete on the WAND path (TAAT
        # routing, gallop, cache hit, or bail-out) — reset per search()
        self.last_wand_scored = -1
        # terms with at most this many superblocks are leaf-prefetched WHOLE
        # in the first read that touches them (≤ 8·16384 ≈ 128k postings —
        # a bounded, scale-safe eager read that collapses the lazy per-
        # superblock round trips most queries would otherwise pay; a true
        # stopword term at 10^10+ docs has thousands of superblocks and
        # stays on the lazy path)
        self.prefetch_sbs = 8
        # warm the pyarrow scan machinery once (thread pools, filesystem,
        # codec init): the reference's startup similarly pre-loads its
        # lexicon/page table (main.cpp:338-373) — without this the FIRST
        # query pays ~100+ ms of one-time infrastructure cost that has
        # nothing to do with query evaluation
        if self._lex_ds is not None:
            self._lex_ds.head(1)
            self._blocks_ds.head(1)

    # ---- index access -----------------------------------------------------
    def _pruned_read(
        self,
        rgs_cache: dict,
        table_root: str,
        terms: list[str],
        columns: list[str],
        kind: int | None = None,
        ranges_by_term: dict | None = None,
    ):
        """Row-group-pruned read across the buckets of ``terms``, with the
        exact residual row filter (kind equality + term membership) applied
        — the drop-in replacement for the filtered dataset scans (see
        _BucketRGs for why the Scanner path is not usable here)."""
        by_bucket: dict[int, list[str]] = {}
        for t in terms:
            by_bucket.setdefault(term_bucket(t, self.n_buckets), []).append(t)
        parts = []
        for b in sorted(by_bucket):
            rgs = rgs_cache.get(b)
            if rgs is None:
                rgs = rgs_cache[b] = _BucketRGs(
                    os.path.join(table_root, f"bucket={b}"),
                    rg_cache=self._rg_cache,
                )
            tbl = rgs.read(
                columns,
                kind=kind,
                terms=sorted(by_bucket[b]),
                ranges_by_term=ranges_by_term,
            )
            if tbl.num_rows:
                parts.append(tbl)
        if not parts:
            return None
        tbl = pa.concat_tables(parts)
        mask = pc.is_in(
            tbl.column("term"), value_set=pa.array(terms, type=pa.string())
        )
        if kind is not None:
            mask = pc.and_(mask, pc.equal(tbl.column("kind"), kind))
        tbl = tbl.filter(mask)
        return tbl if tbl.num_rows else None

    def lexicon_rows(self, terms: list[str]) -> dict[str, int]:
        if self._lex_ds is None:
            return {}
        # Collect values as DIRECT references; never read back through the
        # cache after a put. A put may evict another query term's entry (a
        # cache-hit probe does not refresh LRU recency), and a read-back
        # would then silently treat that term as OOV and drop it from the
        # query — observed as history-dependent wrong rankings at 367k-query
        # eviction pressure. With direct references the LRU is a pure
        # optimization: eviction can only cost a refetch, never an answer.
        vals: dict[str, int | None] = {}
        for t in terms:
            hit, v = self._posting_cache.get2(("lex", t))
            if hit:
                vals[t] = v
        missing = [t for t in terms if t not in vals]
        if missing:
            tbl = self._pruned_read(
                self._lex_rgs, self.paths.lexicon, missing, ["term", "df"]
            )
            found = (
                dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
                if tbl is not None
                else {}
            )
            for t in missing:
                v = found.get(t)
                self._posting_cache.put(("lex", t), v)
                vals[t] = v
        if self._df_corr:
            # tombstone df corrections: the cache keeps RAW dfs (sidecar
            # state is fixed per reader instance); a term whose every doc
            # is deleted becomes OOV, exactly as a rebuilt index drops it
            out: dict[str, int] = {}
            for t in terms:
                v = vals.get(t)
                if v is None:
                    continue
                v -= self._df_corr.get(t, 0)
                if v > 0:
                    out[t] = v
            return out
        return {t: v for t in terms if (v := vals.get(t)) is not None}

    def _del_mask(self, ids: np.ndarray):
        """Keep-mask for decoded docIDs against the tombstone set — None
        means keep everything (the zero-overhead path when the index has
        no tombstones, or this batch hits none)."""
        d = self._deleted
        if d is None or len(ids) == 0:
            return None
        j = np.searchsorted(d, ids)
        j[j == len(d)] = 0  # out-of-range ⇒ id > d[-1] ≥ d[0]: never equal
        hit = d[j] == ids
        if not hit.any():
            return None
        return ~hit

    def _fetch_superblocks(self, terms: list[str]) -> dict[str, tuple]:
        """term → (los, his, ns, max_tfc, min_tfc) superblock arrays sorted
        by doc_lo (kind=1 rows — O(df / (block_size · SUPERBLOCK_FACTOR))
        rows per term, the ONLY per-term-proportional metadata a query ever
        loads eagerly). LRU-cached; values are collected as direct
        references (see lexicon_rows: a put may evict another query term's
        entry, so a read-back-after-put can silently drop a term)."""
        vals: dict[str, tuple | None] = {}
        for t in terms:
            hit, v = self._posting_cache.get2(("sbm", t))
            if hit:
                vals[t] = v
        missing = [t for t in terms if t not in vals]
        if missing:
            tbl = self._pruned_read(
                self._block_rgs, self.paths.blocks, missing,
                ["kind", "term", "doc_lo", "doc_hi", "n", "max_tfc", "min_tfc"],
                kind=1,
            )
            if tbl is None:
                for t in missing:
                    self._posting_cache.put(("sbm", t), None)
                    vals[t] = None
                return {t: v for t in terms if (v := vals.get(t)) is not None}
            self.sb_rows_fetched += tbl.num_rows
            tcol = tbl.column("term").to_pylist()
            lo = tbl.column("doc_lo").to_numpy()
            hi = tbl.column("doc_hi").to_numpy()
            ns = tbl.column("n").to_numpy()
            mx = tbl.column("max_tfc").to_numpy()
            mn = tbl.column("min_tfc").to_numpy()
            per: dict[str, list[int]] = {t: [] for t in missing}
            for i, t in enumerate(tcol):
                per[t].append(i)
            for t in missing:
                idxs = per.get(t, [])
                if not idxs:
                    self._posting_cache.put(("sbm", t), None)
                    vals[t] = None
                    continue
                o = np.array(idxs)[np.argsort(lo[idxs], kind="stable")]
                v = (
                    lo[o].astype(np.int64), hi[o].astype(np.int64),
                    ns[o].astype(np.int64), mx[o], mn[o],
                )
                self._posting_cache.put(("sbm", t), v)
                vals[t] = v
        return {t: v for t in terms if (v := vals.get(t)) is not None}

    def _fetch_leaf_batch(
        self, wants: list[tuple[str, int, int, int]]
    ) -> dict[tuple[str, int], "_Leaf"]:
        """Fetch the leaf blocks (metadata + raw payloads) of the given
        (term, sb_index, sb_doc_lo, sb_doc_hi) superblocks in ONE pruned
        parquet read, populating the ("leaf", term, sb_index) LRU slots.
        Leaf rows belong to exactly one superblock (superblock ranges
        partition each term's docID axis), so a doc_lo BETWEEN filter is an
        exact membership test. Returns the leaves fetched THIS call as
        direct references (callers needing a specific slot must not read it
        back through the LRU — a later put in the same batch may already
        have evicted it; see lexicon_rows)."""
        fetched: dict[tuple[str, int], _Leaf] = {}
        todo = [w for w in wants if ("leaf", w[0], w[1]) not in self._posting_cache]
        if not todo:
            return fetched
        by_term: dict[str, list[tuple[int, int, int]]] = {}
        for t, si, lo_, hi_ in todo:
            by_term.setdefault(t, []).append((si, lo_, hi_))
        # row groups are pruned by (kind, term, wanted doc ranges); rows of
        # a wanted term OUTSIDE its wanted ranges can ride along from shared
        # groups — the per-superblock searchsorted slicing below drops them
        tbl = self._pruned_read(
            self._block_rgs, self.paths.blocks, sorted(by_term),
            [
                "kind", "term", "doc_lo", "doc_hi", "n",
                "max_tfc", "min_tfc", "ids_vb", "tfs_vb", "dls_vb",
            ],
            kind=0,
            ranges_by_term={
                t: [(lo_, hi_) for _si, lo_, hi_ in ranges]
                for t, ranges in by_term.items()
            },
        )
        if tbl is None:
            for t, ranges in by_term.items():
                for si, _lo, _hi in ranges:
                    empty = _Leaf(
                        np.array([], dtype=np.int64),
                        np.array([], dtype=np.int64),
                        np.array([], dtype=np.int64),
                        np.array([]), np.array([]), [], [], [],
                    )
                    self._posting_cache.put(("leaf", t, si), empty)
                    fetched[(t, si)] = empty
            return fetched
        tcol = tbl.column("term").to_pylist()
        lo = tbl.column("doc_lo").to_numpy()
        hi = tbl.column("doc_hi").to_numpy()
        ns = tbl.column("n").to_numpy()
        mx = tbl.column("max_tfc").to_numpy()
        mn = tbl.column("min_tfc").to_numpy()
        ids_vb = tbl.column("ids_vb").to_pylist()
        tfs_vb = tbl.column("tfs_vb").to_pylist()
        dls_vb = tbl.column("dls_vb").to_pylist()
        per: dict[str, list[int]] = {t: [] for t in by_term}
        for i, t in enumerate(tcol):
            per[t].append(i)
        for t, ranges in by_term.items():
            idxs = per.get(t, [])
            o = (
                np.array(idxs)[np.argsort(lo[idxs], kind="stable")]
                if idxs
                else np.array([], dtype=np.int64)
            )
            slos = lo[o] if len(o) else np.array([], dtype=np.int64)
            for si, sb_lo, sb_hi in ranges:
                a = int(np.searchsorted(slos, sb_lo, side="left"))
                b = int(np.searchsorted(slos, sb_hi, side="right"))
                sel = o[a:b]
                # the counter measures leaf rows MATERIALIZED into slots —
                # rows of a wanted term that ride along from shared row
                # groups are sliced away here and not counted (the row-
                # group selection above is what bounds the IO itself)
                self.leaf_rows_fetched += len(sel)
                leaf = _Leaf(
                    lo[sel].astype(np.int64), hi[sel].astype(np.int64),
                    ns[sel].astype(np.int64), mx[sel], mn[sel],
                    [ids_vb[i] for i in sel],
                    [tfs_vb[i] for i in sel],
                    [dls_vb[i] for i in sel],
                )
                self._posting_cache.put(("leaf", t, si), leaf)
                fetched[(t, si)] = leaf
        return fetched

    def _leaf_for(self, term: str, sb_idx: int) -> _Leaf:
        """The leaf blocks of one (term, superblock) — LRU hit or a single
        on-demand fetch (cursors prefetch in batches; this is the miss
        path). Loop, not a single try: under concurrent readers another
        thread may have fetched the slot between our miss and our fetch
        (its presence makes our fetch a no-op), then an eviction can take
        it before our re-read — the next iteration simply fetches it
        ourselves and returns the direct reference."""
        while True:
            leaf = self._posting_cache.get_(("leaf", term, sb_idx))
            if leaf is not None:
                return leaf
            sbm = self._fetch_superblocks([term]).get(term)
            got = self._fetch_leaf_batch(
                [(term, sb_idx, int(sbm[0][sb_idx]), int(sbm[1][sb_idx]))]
            ).get((term, sb_idx))
            if got is not None:
                return got

    def _fetch_arrays(self, terms: list[str]) -> dict[str, tuple]:
        """term → decoded (ids:int64, tfs:f64, dls:f64) full posting arrays,
        LRU-cached. Columnar fetch — no per-block Python objects (building a
        _Block per row costs more than decoding for dense lists), one
        segmented vb_decode per column. Values are collected as direct
        references (see lexicon_rows: a put may evict another query term's
        entry, so a read-back-after-put can silently drop a term)."""
        vals: dict[str, tuple | None] = {}
        for t in terms:
            hit, v = self._posting_cache.get2(("arr", t))
            if hit:
                vals[t] = v
        missing = [t for t in terms if t not in vals]
        if missing:
            tbl = self._pruned_read(
                self._block_rgs, self.paths.blocks, missing,
                ["kind", "term", "doc_lo", "n", "ids_vb", "tfs_vb", "dls_vb"],
                kind=0,
            )
            if tbl is None:
                for t in missing:
                    self._posting_cache.put(("arr", t), None)
                    vals[t] = None
                return {t: v for t in terms if (v := vals.get(t)) is not None}
            self.leaf_rows_fetched += tbl.num_rows
            decoded = self._decode_posting_table(tbl, missing)
            for t in missing:
                v = decoded.get(t)
                self._posting_cache.put(("arr", t), v)
                vals[t] = v
        return {t: v for t in terms if (v := vals.get(t)) is not None}

    def _decode_posting_table(self, tbl: pa.Table, terms: list[str]) -> dict[str, tuple]:
        """term → decoded (ids:int64, tfs:f64, dls:f64) posting arrays from
        leaf block rows (columns term, doc_lo, n, ids_vb, tfs_vb, dls_vb),
        with tombstoned postings masked out. Columnar: one segmented
        vb_decode per column per term, no per-block Python objects. No
        caching — callers cache (or are one-shot range workers). Terms
        with no (surviving) rows are simply absent from the result."""
        out: dict[str, tuple] = {}
        tcol = tbl.column("term").to_pylist()
        lo = tbl.column("doc_lo").to_numpy()
        ns_all = tbl.column("n").to_numpy()
        ids_vb = tbl.column("ids_vb").to_pylist()
        tfs_vb = tbl.column("tfs_vb").to_pylist()
        dls_vb = tbl.column("dls_vb").to_pylist()
        per: dict[str, list[int]] = {t: [] for t in terms}
        for i, t in enumerate(tcol):
            if t in per:
                per[t].append(i)
        for t in terms:
            idxs = sorted(per.get(t, []), key=lambda i: lo[i])
            if not idxs:
                continue
            ns = ns_all[idxs].astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            raw = vb_decode(b"".join(ids_vb[i] for i in idxs))
            cs = np.cumsum(raw, dtype=np.uint64)
            # block-head gaps are measured from (doc_lo - 1), so the
            # per-block offset folds the metadata base back in; uint64
            # wraparound in the intermediate is exact under mod-2^64
            offsets = (
                cs[starts] - raw[starts]
                + np.uint64(1)
                - lo[idxs].astype(np.uint64)
            )
            ids = (cs - np.repeat(offsets, ns)).astype(np.int64)
            tfs = vb_decode(b"".join(tfs_vb[i] for i in idxs)).astype(np.float64)
            dls = vb_decode(b"".join(dls_vb[i] for i in idxs)).astype(np.float64)
            keep = self._del_mask(ids)
            if keep is not None:
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if len(ids) == 0:
                    continue
            out[t] = (ids, tfs, dls)
        return out

    def _cursors(self, terms: list[str]) -> list[TermCursor]:
        """Two-level cursors with lead-driven prefetch. The galloping
        intersection only ever calls ``next_geq(d)`` for docIDs ``d`` of the
        LEAD (rarest) term, so the exact set of superblocks every other
        cursor will touch is known up front: the covering superblock of each
        lead posting. Prefetching them in ONE batched read replaces what
        would otherwise be O(superblocks-touched) round trips — and the
        dense terms' untouched superblocks (the overwhelming majority at
        stopword df) are never read at all, metadata or payload."""
        lex = self.lexicon_rows(terms)
        present = [t for t in terms if t in lex]  # OOV silently skipped
        sbms = self._fetch_superblocks(present)
        present = [t for t in present if t in sbms]
        if not present:
            return []
        lead = min(present, key=lambda t: int(lex[t]))
        l_los, l_his = sbms[lead][0], sbms[lead][1]
        wants = [
            (lead, i, int(l_los[i]), int(l_his[i])) for i in range(len(l_los))
        ]
        self._fetch_leaf_batch(wants)
        # the lead's docIDs, decoded once (bounded by min_df — the router
        # only picks the gallop path when that is small)
        lead_ids = []
        for i in range(len(l_los)):
            leaf = self._leaf_for(lead, i)
            for j in range(len(leaf.los)):
                lead_ids.append(
                    np.int64(leaf.los[j] - 1)
                    + np.cumsum(
                        vb_decode(leaf.ids_vb[j]), dtype=np.uint64
                    ).astype(np.int64)
                )
        if lead_ids:
            lead_docs = np.concatenate(lead_ids)
            wants = []
            for t in present:
                if t == lead:
                    continue
                los, his = sbms[t][0], sbms[t][1]
                if len(his) <= self.prefetch_sbs:
                    sis = range(len(his))
                else:
                    cover = np.unique(np.searchsorted(his, lead_docs, side="left"))
                    sis = cover[cover < len(his)].tolist()
                for si in sis:
                    wants.append((t, si, int(los[si]), int(his[si])))
            self._fetch_leaf_batch(wants)
        cursors = []
        for t in present:
            df = int(lex[t])
            cursors.append(
                TermCursor(t, df, self._idf(df), self.avg_dl, self, sbms[t])
            )
        return cursors  # every present term has ≥1 superblock by construction

    def _idf(self, df: int) -> float:
        # N = LIVE docs: with tombstones pending this is the same integer a
        # from-scratch build on the surviving corpus would use
        return math.log((self.n_docs_live - df + 0.5) / (df + 0.5))

    def _flat_ok(self, total_postings: int) -> bool:
        """A flat O(n_docs) accumulator is used only while the corpus is
        driver-RAM-sized AND dense enough relative to the query that the
        zero-fill beats sorting the candidate set."""
        return self.n_docs <= min(self.dense_docs_max, 32 * total_postings)

    # ---- search -----------------------------------------------------------
    def search(
        self, query: str, conjunctive: bool = True, k: int = 10
    ) -> list[tuple[int, int, float]]:
        """→ [(rank, doc_id, score)] — rank-identical to the oracle."""
        terms = clean_query(query)
        cache_key = (" ".join(terms), conjunctive, k)
        # reset BEFORE the cache check: a hit decodes nothing, so the
        # instrumentation must not report the previous query's routing
        self.last_parallel = False
        self.last_wand_scored = -1
        cached = self._result_cache.get_(cache_key)
        if cached is not None:
            return cached
        lex = self.lexicon_rows(terms)
        present = [t for t in terms if t in lex]  # OOV silently skipped
        if not present:
            self._result_cache.put(cache_key, [])
            return []
        # path routing (all paths are rank-identical; this is cost only):
        # - conjunctive with a rare lead term → galloping intersection:
        #   candidates bounded by min_df, ~5 µs per Python-loop step;
        # - TAAT while total postings are machine-reasonable (~25 ns/posting
        #   vectorized; memory O(candidates) via the compressed accumulator);
        # - block-at-a-time WAND above that (skips whole blocks without
        #   decode; bails back to TAAT when block bounds cannot prune).
        total_df = sum(lex[t] for t in present)
        min_df = min(lex[t] for t in present)
        gallop_cost = min_df * len(present) * 5e-6
        taat_cost = total_df * 2.5e-8 + (
            self.n_docs * 1e-8 if self._flat_ok(total_df) else total_df * 6e-8
        )
        if conjunctive:
            # gallop iff the rarest list is small enough that Python-loop
            # candidate stepping beats decoding every posting; a dense
            # conjunction (min_df in the millions) MUST go vectorized —
            # an unconditional gallop above the TAAT threshold measured
            # 45-55 s/query on a 5M-doc dense corpus
            path = "gallop" if gallop_cost < taat_cost else "taat"
        elif total_df <= self.taat_threshold:
            path = "taat"
        else:
            path = "wand"
        if path == "taat":
            out = self._taat_route(present, lex, k, conjunctive, total_df)
        elif path == "wand":
            out = self._search_wand_blocks(present, lex, k)
            if out is None:  # block bounds don't prune → vectorized TAAT
                out = self._taat_route(present, lex, k, False, total_df)
        else:
            cursors = self._cursors(present)
            if not cursors:
                self._result_cache.put(cache_key, [])
                return []
            heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap, ≤ k
            self._search_conjunctive(cursors, k, heap)
            ranked = sorted(((-s, -nd) for s, nd in heap))
            out = [(i + 1, d, -negs) for i, (negs, d) in enumerate(ranked)]
        self._result_cache.put(cache_key, out)
        return out

    def _search_taat(self, present, lex, k, conjunctive) -> list[tuple[int, int, float]]:
        """Vectorized term-at-a-time scorer: full-list columnar decode
        (cached), per-term numpy BM25 contribution with the SAME float
        expression tree as the oracle, accumulation in sorted-term order
        (= the oracle's float summation order, main.cpp:574), exact
        (score DESC, doc_id ASC) top-k.

        Accumulator: docIDs are dense [0, n_docs) by construction
        (operators/docids.py), so while n_docs is driver-RAM-sized a flat
        array is the fastest accumulator (O(Σ postings) scatter-adds, no
        sort). Past ``dense_docs_max`` — or for queries too selective to
        amortize the zero-fill — the candidate ids are compressed first
        (np.unique) and accumulation happens in the compressed domain:
        peak memory O(Σ candidate postings), independent of n_docs."""
        arrays = self._fetch_arrays(present)
        per = []
        total = 0
        for t in sorted(arrays):
            ids, tfs, dls = arrays[t]
            idf = self._idf(int(lex[t]))
            per.append((ids, idf * _tf_component(tfs, dls, self.avg_dl)))
            total += len(ids)
        if not per:
            return []
        n_terms = len(per)
        if self._flat_ok(total):
            score = np.zeros(self.n_docs)
            cnt = np.zeros(self.n_docs, dtype=np.int16)
            for ids, contrib in per:  # sorted-term order fixes summation order
                score[ids] += contrib  # each doc appears once per term: no races
                cnt[ids] += 1
            cand = np.nonzero(cnt == n_terms if conjunctive else cnt > 0)[0]
            s = score[cand]
        else:
            cand = np.unique(np.concatenate([ids for ids, _ in per]))
            s = np.zeros(len(cand))
            cnt = np.zeros(len(cand), dtype=np.int16)
            for ids, contrib in per:  # sorted-term order, same float tree
                ix = np.searchsorted(cand, ids)
                s[ix] += contrib
                cnt[ix] += 1
            if conjunctive:
                m = cnt == n_terms
                cand, s = cand[m], s[m]
        cand, s = self._topk_arrays(cand, s, k)
        return [
            (i + 1, int(d), float(v))
            for i, (d, v) in enumerate(zip(cand.tolist(), s.tolist()))
        ]

    @staticmethod
    def _topk_arrays(cand: np.ndarray, s: np.ndarray, k: int):
        """Exact (score DESC, doc_id ASC) top-k over parallel arrays — the
        one comparator every scorer and the shard merge share."""
        if len(cand) == 0:
            return cand, s
        kk = min(k, len(cand))
        if len(cand) > 4 * k + 64:
            # shrink to the top plateau before the exact tie-aware sort:
            # kth-largest value via partition, keep everything ≥ it (ties
            # included, so the doc_id-ascending tie-break stays exact)
            kth = np.partition(s, len(s) - kk)[len(s) - kk]
            keep = s >= kth
            cand, s = cand[keep], s[keep]
        sel = np.lexsort((cand, -s))[:kk]
        return cand[sel], s[sel]

    # ---- within-query parallel decode (dense-term cold queries) -----------
    def _taat_route(self, present, lex, k, conjunctive, total_df):
        if (
            self.parallel_workers > 0
            and total_df >= self.parallel_df_threshold
            and self.n_docs > 1
        ):
            self.last_parallel = True
            return self._search_taat_parallel(present, lex, k, conjunctive)
        return self._search_taat(present, lex, k, conjunctive)

    def _ensure_pool(self):
        """FORK worker pool (not spawn/forkserver): those two re-execute the
        caller's main script in every worker (spawn.prepare →
        _fixup_main_from_path), so a library entry point would fork-bomb any
        caller without a ``__main__`` guard. Fork is the pattern this stack
        already relies on (Spark's Python worker daemon, bench controls)
        and pyarrow repairs its thread pools in the child via its atfork
        handlers. Inherited parent state — reader locks included — is never
        touched: the initializer builds each worker its OWN reader, and the
        worker function only ever references that.

        Lock-guarded: concurrent searches on one reader (the HTTP server's
        ThreadingHTTPServer pattern) racing the lazy init would each fork a
        full pool and leak the loser's worker processes."""
        with self._pool_lock:
            if self._pool is None:
                import multiprocessing as mp

                ctx = mp.get_context("fork")
                self._pool = ctx.Pool(
                    self.parallel_workers,
                    initializer=_parallel_worker_init,
                    initargs=(self.paths.root,),
                )
            return self._pool

    def close(self):
        """Release the parallel-decode pool (no-op without one). Readers
        without parallel_workers hold no process resources."""
        with self._pool_lock:
            if self._pool is not None:
                self._pool.terminate()
                self._pool.join()
                self._pool = None

    def _search_taat_parallel(self, present, lex, k, conjunctive):
        """Doc-range-sharded TAAT: split [0, n_docs) into 2·workers
        contiguous ranges, score each in a pool worker, merge local top-ks.

        Exactness: posting lists are doc-sorted, so every doc's postings —
        hence its complete score, summed in the same sorted-term float
        order — live in exactly one shard; a global top-k doc is therefore
        in its shard's top-k, and the merge reapplies the one shared
        comparator. Rank- and score-identical to the single-process TAAT
        by construction (pinned by the parametrized reader fixtures)."""
        pool = self._ensure_pool()
        n_shards = min(2 * self.parallel_workers, self.n_docs)
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        args = [
            (list(present), k, conjunctive, int(lo), int(hi))
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]
        parts = pool.map(_parallel_taat_worker, args)
        docs = [p[0] for p in parts if len(p[0])]
        if not docs:
            return []
        cand = np.concatenate(docs)
        s = np.concatenate([p[1] for p in parts if len(p[0])])
        cand, s = self._topk_arrays(cand, s, k)
        return [
            (i + 1, int(d), float(v))
            for i, (d, v) in enumerate(zip(cand.tolist(), s.tolist()))
        ]

    def _taat_range_topk(self, terms, k, conjunctive, doc_lo, doc_hi):
        """One shard's exact TAAT top-k over docIDs in [doc_lo, doc_hi):
        range-pruned leaf read (row groups outside the range never decode —
        the doc_lo statistics prune within single-term groups), candidate-
        compressed accumulation in sorted-term order, shared comparator.
        Returns (docs:int64[], scores:f64[]) ready for the exact merge."""
        lex = self.lexicon_rows(terms)
        present = [t for t in terms if t in lex]
        empty = (np.empty(0, dtype=np.int64), np.empty(0))
        if not present:
            return empty
        tbl = self._pruned_read(
            self._block_rgs, self.paths.blocks, present,
            ["kind", "term", "doc_lo", "doc_hi", "n", "ids_vb", "tfs_vb", "dls_vb"],
            kind=0,
            ranges_by_term={t: [(doc_lo, doc_hi - 1)] for t in present},
        )
        if tbl is None:
            return empty
        mask = pc.and_(
            pc.less_equal(tbl.column("doc_lo"), doc_hi - 1),
            pc.greater_equal(tbl.column("doc_hi"), doc_lo),
        )
        tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            return empty
        arrays = self._decode_posting_table(tbl, present)
        per = []
        for t in sorted(arrays):  # sorted-term order = oracle summation order
            ids, tfs, dls = arrays[t]
            a = int(np.searchsorted(ids, doc_lo, side="left"))
            b = int(np.searchsorted(ids, doc_hi, side="left"))
            if a == b:
                continue
            ids, tfs, dls = ids[a:b], tfs[a:b], dls[a:b]
            idf = self._idf(int(lex[t]))
            per.append((ids, idf * _tf_component(tfs, dls, self.avg_dl)))
        if not per:
            return empty
        cand = np.unique(np.concatenate([ids for ids, _ in per]))
        s = np.zeros(len(cand))
        cnt = np.zeros(len(cand), dtype=np.int16)
        for ids, contrib in per:
            ix = np.searchsorted(cand, ids)
            s[ix] += contrib
            cnt[ix] += 1
        if conjunctive:
            # a doc must carry ALL present terms GLOBALLY; terms with no
            # postings in this shard make that impossible for its docs
            m = cnt == len(present) if len(per) == len(present) else cnt < 0
            cand, s = cand[m], s[m]
        return self._topk_arrays(cand, s, k)

    def _search_wand_blocks(self, present, lex, k):
        """Two-level block-max WAND (disjunctive): superblock pruning first,
        leaf pruning among survivors, payload decode last. No doc-at-a-time
        Python loop, and — the 10^12-doc requirement — no per-term
        O(df/block_size) metadata materialization: the only eagerly-loaded
        per-term state is O(df / (block_size · SUPERBLOCK_FACTOR)) superblock
        rows (~16384 postings each).

        1. From SUPERBLOCK metadata only, cut the docID axis into elementary
           intervals — every superblock doc_lo / doc_hi+1 is a boundary, so
           each (term, interval) is covered by exactly one superblock or
           none. Upper-bound each interval by Σ_t max(sb_ub, 0) (max(·, 0)
           because membership is unknown: an absent doc contributes exactly
           0 — which also keeps negative-IDF bounds valid, SURVEY.md §4.4).
        2. Process intervals in DESCENDING bound order in geometrically
           growing batches. A batch fetches the leaf blocks (metadata +
           payload) of exactly the superblocks covering its intervals, in
           ONE range-pruned parquet read (LRU-shared across queries).
        3. REFINE within the batch: re-cut the selected intervals at leaf-
           block boundaries and re-bound with leaf maxima; leaf intervals
           whose Σ_t max(leaf_ub, 0) < θ are dropped — exact, because every
           term's covering superblock (hence all its leaf metadata over the
           interval) is in hand, and absent terms contribute 0.
        4. Decode only leaf blocks covering surviving leaf intervals (once,
           cached for the call), gather member postings, compress
           candidates, scatter-add per term in sorted-term order (= the
           oracle's float summation order), push survivors into the bounded
           heap.
        5. Stop when the next interval bound is strictly below θ: every
           unscored doc then scores < θ — it can neither enter the top k
           nor tie (strict <, so ties are always scored). The
           (score, -doc_id) heap yields the exact reference ordering
           (main.cpp:626-630) regardless of push order.

        Returns None to signal "bounds don't prune" (dense query with
        near-uniform block maxima): the caller falls back to the TAAT
        scorer, whose flat/compressed accumulator is strictly faster when
        ~everything must be scored anyway.
        """
        sbms = self._fetch_superblocks(present)
        metas = []  # (term, idf, los, his, ubs, ns) in sorted-term order
        for t in sorted(present):
            sbm = sbms.get(t)
            if sbm is None:
                continue
            los, his, ns, mx, mn = sbm
            idf = self._idf(int(lex[t]))
            # _bf_hi/_bf_lo: tombstone avg_dl drift factors (1.0 when no
            # deletes) — keep stored build-time bounds valid upper bounds
            metas.append((
                t, idf, los, his,
                np.maximum(idf * mx * self._bf_hi, idf * mn * self._bf_lo),
                ns,
            ))
        if not metas:
            return []
        bounds = np.unique(
            np.concatenate([np.concatenate((m[2], m[3] + 1)) for m in metas])
        )
        starts = bounds[:-1]
        n_int = len(starts)
        total_ub = np.zeros(n_int)
        est_cost = np.zeros(n_int)
        covers = []
        for _t, idf, los, his, ubs, ns in metas:
            ci = np.searchsorted(his, starts, side="left")
            cis = np.minimum(ci, len(his) - 1)
            covered = (ci < len(his)) & (los[cis] <= starts)
            covers.append(np.where(covered, cis, -1))
            total_ub += np.where(covered, np.maximum(ubs[cis], 0.0), 0.0)
            est_cost += np.where(covered, ns[cis], 0)
        order = np.argsort(-total_ub, kind="stable")
        ub_sorted = total_ub[order]
        cum_cost = np.cumsum(est_cost[order])
        heap: list[tuple[float, int]] = []
        in_batch = np.zeros(n_int, dtype=bool)
        decoded: list[dict] = [dict() for _ in metas]  # (sb, leaf) → arrays
        pos = 0
        budget = float(max(64 * k, 1024))
        scored_postings = 0  # instrumentation: how much pruning bought
        while pos < n_int:
            theta = heap[0][0] if len(heap) == k else -math.inf
            if ub_sorted[pos] < theta:
                break  # desc order ⇒ everything left is strictly below θ
            if len(heap) == k:
                # pruning-effectiveness check: if most intervals survive θ
                # and a flat accumulator is affordable, TAAT wins — bail
                # (wasted work so far is bounded by the geometric budget)
                n_sel = int(np.searchsorted(-ub_sorted, -theta, side="right")) - pos
                if n_sel > 0.5 * n_int and self.n_docs <= self.dense_docs_max:
                    return None
            # batch = next intervals in bound order up to the posting budget
            tgt = (cum_cost[pos - 1] if pos else 0.0) + budget
            end = min(max(int(np.searchsorted(cum_cost, tgt, side="left")) + 1, pos + 1), n_int)
            if len(heap) == k:
                cut = int(np.searchsorted(-ub_sorted[pos:end], -theta, side="right"))
                end = pos + max(cut, 1)
            sel = order[pos:end]
            pos = end
            budget *= 4
            in_batch[:] = False
            in_batch[sel] = True
            # ---- leaf fetch: exactly the superblocks covering the batch
            needs = []
            wants = []
            for (t, _idf, los, his, _ubs, _ns), cover in zip(metas, covers):
                civ = cover[sel]
                need = np.unique(civ[civ >= 0])
                needs.append(need)
                grab = (
                    range(len(los))
                    if len(los) <= self.prefetch_sbs
                    else need.tolist()
                )
                for si in grab:
                    if ("leaf", t, si) not in self._posting_cache:
                        wants.append((t, si, int(los[si]), int(his[si])))
            self._fetch_leaf_batch(wants)
            # ---- leaf-level refinement inside the selected intervals
            # interval i = [bounds[i], bounds[i+1]) — include both edges so
            # no leaf interval straddles a selected-interval boundary
            lb = [bounds[sel], bounds[sel + 1]]
            leafs = []  # per term: (leaf_los, leaf_his, leaf_ubs, sb_of, j_of)
            for (t, idf, _los, _his, _ubs, _ns), need in zip(metas, needs):
                if need.size == 0:
                    leafs.append(None)
                    continue
                parts = [self._leaf_for(t, int(si)) for si in need.tolist()]
                llos = np.concatenate([pt.los for pt in parts])
                lhis = np.concatenate([pt.his for pt in parts])
                lubs = np.concatenate(
                    [
                        np.maximum(
                            idf * pt.max_tfc * self._bf_hi,
                            idf * pt.min_tfc * self._bf_lo,
                        )
                        for pt in parts
                    ]
                )
                lns = np.concatenate([pt.ns for pt in parts])
                sb_of = np.repeat(need, [len(pt.los) for pt in parts])
                j_of = np.concatenate(
                    [np.arange(len(pt.los), dtype=np.int64) for pt in parts]
                )
                leafs.append((llos, lhis, lubs, lns, sb_of, j_of))
                lb.append(llos)
                lb.append(lhis + 1)
            lbounds = np.unique(np.concatenate(lb))
            lstarts = lbounds[:-1]
            iv = np.searchsorted(bounds, lstarts, side="right") - 1
            inside = in_batch[iv]
            l_ub = np.zeros(len(lstarts))
            l_cost = np.zeros(len(lstarts))
            lcovers = []
            for leaf in leafs:
                if leaf is None:
                    lcovers.append(None)
                    continue
                llos, lhis, lubs, lns, _sb_of, _j_of = leaf
                ci = np.searchsorted(lhis, lstarts, side="left")
                cis = np.minimum(ci, len(lhis) - 1)
                covered = (ci < len(lhis)) & (llos[cis] <= lstarts)
                lcovers.append(np.where(covered, cis, -1))
                l_ub += np.where(covered, np.maximum(lubs[cis], 0.0), 0.0)
                l_cost += np.where(covered, lns[cis], 0.0)
            # ---- inner leaf-level loop: same descending-bound batching as
            # the outer loop, but over leaf intervals — θ updates BETWEEN
            # sub-batches, so leaf-granularity pruning engages even while
            # the heap is still filling (one-shot scoring of a whole
            # superblock batch would decode ~16384 postings before the
            # first θ exists)
            l_idx = np.nonzero(inside)[0]
            if len(l_idx) == 0:
                continue
            lorder = l_idx[np.argsort(-l_ub[l_idx], kind="stable")]
            lub_sorted = l_ub[lorder]
            lcum = np.cumsum(l_cost[lorder])
            lpos = 0
            lbudget = float(max(64 * k, 1024))
            alive = np.zeros(len(lstarts), dtype=bool)
            while lpos < len(lorder):
                theta = heap[0][0] if len(heap) == k else -math.inf
                if lub_sorted[lpos] < theta:
                    break
                ltgt = (lcum[lpos - 1] if lpos else 0.0) + lbudget
                lend = min(
                    max(int(np.searchsorted(lcum, ltgt, side="left")) + 1, lpos + 1),
                    len(lorder),
                )
                if len(heap) == k:
                    cut = int(
                        np.searchsorted(-lub_sorted[lpos:lend], -theta, side="right")
                    )
                    lend = lpos + max(cut, 1)
                lsel = lorder[lpos:lend]
                lpos = lend
                lbudget *= 4
                alive[:] = False
                alive[lsel] = True
                # ---- decode + gather (sorted-term order)
                gathered = []  # (ids, contribs) per term
                for (t, idf, *_m), leaf, lcover, dec in zip(
                    metas, leafs, lcovers, decoded
                ):
                    if leaf is None:
                        continue
                    _llos, _lhis, _lubs, _lns, sb_of, j_of = leaf
                    cb = lcover[lsel]
                    needb = np.unique(cb[cb >= 0])
                    if needb.size == 0:
                        continue
                    miss = [
                        ci
                        for ci in needb.tolist()
                        if (int(sb_of[ci]), int(j_of[ci])) not in dec
                    ]
                    if miss:
                        # ONE concatenated vb_decode per column for all
                        # missing blocks (per-block decode calls have
                        # ~10 µs fixed cost)
                        mparts = [
                            self._leaf_for(t, int(sb_of[ci])) for ci in miss
                        ]
                        mjs = [int(j_of[ci]) for ci in miss]
                        mns = np.array(
                            [int(pt.ns[j]) for pt, j in zip(mparts, mjs)],
                            dtype=np.int64,
                        )
                        st = np.concatenate(([0], np.cumsum(mns)[:-1]))
                        raw = vb_decode(
                            b"".join(pt.ids_vb[j] for pt, j in zip(mparts, mjs))
                        )
                        cs = np.cumsum(raw, dtype=np.uint64)
                        mlos = np.array(
                            [int(pt.los[j]) for pt, j in zip(mparts, mjs)],
                            dtype=np.uint64,
                        )
                        # block-head gap is from (doc_lo - 1) — fold the
                        # base back in
                        off = cs[st] - raw[st] + np.uint64(1) - mlos
                        ids_all = (cs - np.repeat(off, mns)).astype(np.int64)
                        tfs = vb_decode(
                            b"".join(pt.tfs_vb[j] for pt, j in zip(mparts, mjs))
                        ).astype(np.float64)
                        dls = vb_decode(
                            b"".join(pt.dls_vb[j] for pt, j in zip(mparts, mjs))
                        ).astype(np.float64)
                        contrib_all = idf * _tf_component(tfs, dls, self.avg_dl)
                        dkeep = self._del_mask(ids_all)
                        for jj, ci in enumerate(miss):
                            s0, s1 = int(st[jj]), int(st[jj] + mns[jj])
                            if dkeep is None:
                                dec[(int(sb_of[ci]), int(j_of[ci]))] = (
                                    ids_all[s0:s1],
                                    contrib_all[s0:s1],
                                )
                            else:  # tombstoned postings never score
                                kk = dkeep[s0:s1]
                                dec[(int(sb_of[ci]), int(j_of[ci]))] = (
                                    ids_all[s0:s1][kk],
                                    contrib_all[s0:s1][kk],
                                )
                    keys = [
                        (int(sb_of[ci]), int(j_of[ci])) for ci in needb.tolist()
                    ]
                    ids = np.concatenate([dec[ky][0] for ky in keys])
                    co = np.concatenate([dec[ky][1] for ky in keys])
                    liv = np.searchsorted(lbounds, ids, side="right") - 1
                    keep = alive[liv]
                    if keep.any():
                        gathered.append((ids[keep], co[keep]))
                if not gathered:
                    continue
                scored_postings += sum(len(ids) for ids, _ in gathered)
                cand = np.unique(np.concatenate([ids for ids, _ in gathered]))
                acc = np.zeros(len(cand))
                for ids, co in gathered:  # sorted-term order = oracle order
                    acc[np.searchsorted(cand, ids)] += co
                if len(heap) == k:
                    m = acc >= theta  # strict-< prune; == θ ties still pushed
                    cand, acc = cand[m], acc[m]
                for d, s in zip(cand.tolist(), acc.tolist()):
                    self._push(heap, k, s, d)
        # exposed for tests/diagnostics: postings actually decoded+scored
        # vs the query's total df — the measure of block-max pruning
        self.last_wand_scored = scored_postings
        ranked = sorted(((-s, -nd) for s, nd in heap))
        return [(i + 1, d, -negs) for i, (negs, d) in enumerate(ranked)]

    @staticmethod
    def _push(heap, k, score, doc_id):
        item = (score, -doc_id)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    @staticmethod
    def _exact_score(at_doc: list[TermCursor]) -> float:
        # sorted-term float summation order (main.cpp:574)
        score = 0.0
        for c in sorted(at_doc, key=lambda c: c.term):
            score += c.contrib()
        return score

    def _search_conjunctive(self, cursors, k, heap):
        cursors.sort(key=lambda c: c.df)  # rarest first → fewest candidates
        lead = cursors[0]
        d = lead.cur_doc()
        while d < INF:
            aligned = True
            for c in cursors[1:]:
                got = c.next_geq(d)
                if got != d:
                    d = lead.next_geq(got)
                    aligned = False
                    break
            if aligned:
                # block-max prune: skip exact scoring if even the bound loses
                if len(heap) == k:
                    ub = sum(c.block_ub() for c in cursors)
                    if ub < heap[0][0]:
                        d = lead.advance()
                        continue
                self._push(heap, k, self._exact_score(cursors), d)
                d = lead.advance()

    # ---- result assembly (the reference's primary user surface) -----------
    def match_count(self, query: str, conjunctive: bool = True) -> int:
        """Exact total match count (main.cpp:487: `count` = ALL matched
        docs, not n_results). Enumerates the query terms' postings — the
        same work the reference does (it scores every candidate); decoded
        arrays are LRU-shared with the TAAT scorer."""
        terms = clean_query(query)
        lex = self.lexicon_rows(terms)
        present = [t for t in terms if t in lex]
        if not present:
            return 0
        arrays = self._fetch_arrays(present)
        lists = [arrays[t][0] for t in sorted(arrays)]
        if not lists:
            return 0
        if len(lists) == 1:
            return int(len(lists[0]))
        uniq, cnts = np.unique(np.concatenate(lists), return_counts=True)
        if conjunctive:
            return int(np.count_nonzero(cnts == len(lists)))
        return int(len(uniq))

    def result_freqs(self, query: str, doc_ids: list[int]) -> dict[int, list[tuple[str, int]]]:
        """doc_id → [(term, tf)...] in sorted-term order, present terms only
        — the reference's `freqs` pairs (main.cpp:610-618), looked up in the
        index postings (no text re-read)."""
        terms = clean_query(query)
        lex = self.lexicon_rows(terms)
        present = sorted(t for t in terms if t in lex)
        arrays = self._fetch_arrays(present)
        out: dict[int, list[tuple[str, int]]] = {int(d): [] for d in doc_ids}
        # iterate the FETCHED terms (sorted, ⊆ present): a lexicon row with
        # no posting blocks (partially-written index) must degrade to a
        # missing freq pair, not a KeyError mid-assembly (match_count
        # already guards the same way)
        for t in sorted(arrays):
            ids, tfs, _dls = arrays[t]
            for d in out:
                i = int(np.searchsorted(ids, d))
                if i < len(ids) and int(ids[i]) == d:
                    out[d].append((t, int(tfs[i])))
        return out

    def search_full(
        self,
        query: str,
        conjunctive: bool = True,
        n_results: int = 10,
        snippet_len: int = 120,
        snippets=None,
    ) -> dict:
        """The assembled result object of the reference's Searcher::search
        (main.cpp:465-553; JSON shape readme.md:205-223):

            {cached, time (µs), count, data: [{rank, score,
              freqs: [[term, tf], ...],           # sorted-term order
              conv_id, turn_idx, role,            # the `url` analogue (§1.5)
              snippet}, ...]}

        ``count`` = TOTAL matched docs (main.cpp:487). ``snippets`` is an
        optional :class:`operators.snippets.SnippetService`; without it the
        doc-metadata/snippet fields are omitted (index-only assembly).
        Reference quirk reproduced: a result whose body contains no query
        term is dropped from ``data``, and if data ends up empty, count is
        forced to 0 (main.cpp:547-551)."""
        terms = clean_query(query)
        cache_key = (" ".join(terms), conjunctive, n_results)
        t0 = time.perf_counter()
        # ONE locked probe (C3 / the get2 invariant): a separate `in` +
        # search()'s get_ lets a concurrent eviction/put flip the reported
        # `cached` flag; probing and taking the value atomically makes the
        # flag exact — hit ⇔ this response was served from the cache
        hit, ranked = self._result_cache.get2(cache_key)
        if hit:
            # mirror search()'s hit path: a cache hit decodes nothing, so
            # the routing instrumentation must not report the prior query
            self.last_parallel = False
            self.last_wand_scored = -1
        else:
            ranked = self.search(query, conjunctive=conjunctive, k=n_results)
        elapsed_us = (time.perf_counter() - t0) * 1e6
        result = {"cached": hit, "time": elapsed_us, "count": 0, "data": []}
        if not ranked:
            return result
        result["count"] = self.match_count(query, conjunctive=conjunctive)
        doc_ids = [d for _, d, _ in ranked]
        freqs = self.result_freqs(query, doc_ids)
        meta = snippets.meta_for(doc_ids) if snippets is not None else {}
        snips = (
            snippets.reference_snippets(query, doc_ids, snippet_len)
            if snippets is not None
            else {}
        )
        for rank, d, score in ranked:
            item = {
                "rank": rank,
                "score": score,
                "freqs": [[t, tf] for t, tf in freqs.get(d, [])],
            }
            if snippets is not None:
                item.update(meta.get(d, {}))
                snip = snips.get(d)
                if snip is None:
                    continue  # no query term in body → dropped (main.cpp:520-546)
                item["snippet"] = snip
            result["data"].append(item)
        if not result["data"]:
            result["count"] = 0  # reference quirk (main.cpp:548-550)
        return result

    def mrr_at(self, queries, qrels: dict[int, int], n: int = 10) -> float:
        total, cnt = 0.0, 0
        for qid, q in queries:
            if qid not in qrels:
                continue
            cnt += 1
            for rank, d, _ in self.search(q, conjunctive=True, k=n):
                if d == qrels[qid]:
                    total += 1.0 / rank
                    break
        return total / cnt if cnt else 0.0


# ---- parallel-decode pool workers (module-level: spawn pickles by name) ----
_PW_READER: BlockIndexReader | None = None


def _parallel_worker_init(root: str) -> None:
    """Per-worker reader: pyarrow-only, small caches (the worker serves one
    doc-range slice of one query at a time; its row-group cache still pays
    off across the queries of a session). parallel_workers stays 0 here —
    workers never recurse into pools."""
    global _PW_READER
    _PW_READER = BlockIndexReader(
        root, result_cache=8, posting_cache=1024, rg_cache=32
    )


def _parallel_taat_worker(args):
    terms, k, conjunctive, doc_lo, doc_hi = args
    return _PW_READER._taat_range_topk(terms, k, conjunctive, doc_lo, doc_hi)
