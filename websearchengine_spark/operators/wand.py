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
import time
from bisect import bisect_left
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from websearchengine_spark.functions.codec import vb_decode
from websearchengine_spark.functions.tokenizer import clean_query
from websearchengine_spark.plans.block_index import BlockIndexPaths, term_bucket

K1 = 0.9
B = 0.4
INF = 1 << 62


class _LRU(OrderedDict):
    """O(1) LRU cache (reference main.cpp:78-110)."""

    def __init__(self, cap: int):
        super().__init__()
        self.cap = cap

    def get_(self, key):
        if key in self:
            self.move_to_end(key)
            return self[key]
        return None

    def put(self, key, value):
        self[key] = value
        self.move_to_end(key)
        if len(self) > self.cap:
            self.popitem(last=False)


@dataclass
class _Block:
    doc_lo: int
    doc_hi: int
    n: int
    ids_vb: bytes
    tfs_vb: bytes
    dls_vb: bytes
    max_tfc: float
    min_tfc: float


class TermCursor:
    """Cursor over one term's ordered blocks with lazy decode + skip.
    Used by the galloping conjunctive path (selective queries); the
    disjunctive paths are block/array-vectorized and bypass cursors."""

    __slots__ = ("term", "df", "idf", "avg_dl", "blocks", "his", "bi", "pos",
                 "ids", "tfs", "dls")

    def __init__(self, term: str, df: int, idf: float, avg_dl: float,
                 blocks: list[_Block]):
        self.term = term
        self.df = df
        self.idf = idf
        self.avg_dl = avg_dl
        self.blocks = blocks
        self.his = [b.doc_hi for b in blocks]
        self.bi = 0
        self.pos = 0
        self._decode()

    def _decode(self):
        if self.bi < len(self.blocks):
            b = self.blocks[self.bi]
            # ids_vb holds gaps with the block head measured from doc_lo - 1
            self.ids = (
                np.int64(b.doc_lo - 1)
                + np.cumsum(vb_decode(b.ids_vb), dtype=np.uint64).astype(np.int64)
            )
            self.tfs = vb_decode(b.tfs_vb)
            self.dls = vb_decode(b.dls_vb)
        else:
            self.ids = None

    def cur_doc(self) -> int:
        if self.ids is None:
            return INF
        return int(self.ids[self.pos])

    def next_geq(self, target: int) -> int:
        """Advance to the first posting with doc_id ≥ target (galloping:
        bisect over block doc_hi skip pointers, then searchsorted)."""
        if self.ids is None:
            return INF
        if target <= self.cur_doc():
            return self.cur_doc()
        bi = bisect_left(self.his, target, lo=self.bi)
        if bi >= len(self.blocks):
            self.bi = len(self.blocks)
            self.ids = None
            return INF
        if bi != self.bi:
            self.bi = bi
            self._decode()
            self.pos = 0
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # gap between blocks
            self.bi += 1
            self._decode()
            self.pos = 0
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
        tf_c = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / self.avg_dl))
        return self.idf * tf_c

    def block_ub(self) -> float:
        b = self.blocks[self.bi]
        return max(self.idf * b.max_tfc, self.idf * b.min_tfc)


class BlockIndexReader:
    """Driver/serving-side reader of the block index written by
    plans.block_index — no Spark session needed (pyarrow only).

    ``dense_docs_max`` bounds the flat term-at-a-time accumulator: above it
    (or when the query is too selective for a dense array to pay off) the
    scorer compresses the candidate set first, so per-query memory is
    O(candidate postings) regardless of corpus size.
    """

    def __init__(self, root: str, result_cache: int = 1000, posting_cache: int = 4096,
                 taat_threshold: int = 5_000_000, dense_docs_max: int = 1 << 26):
        self.paths = BlockIndexPaths(root)
        meta = pq.read_table(self.paths.meta).to_pylist()[0]
        fmt = int(meta.get("block_format", 1))
        if fmt != 2:
            raise ValueError(
                f"index at {root} has block_format {fmt}; this reader "
                "requires format 2 (block-head gap from doc_lo - 1) — "
                "rebuild the index"
            )
        self.n_docs = int(meta["n_docs"])
        self.avg_dl = float(meta["avg_dl"])
        self.n_buckets = int(meta["n_buckets"])
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
        # queries whose total candidate-posting count is below this run the
        # vectorized term-at-a-time scorer (numpy, C-speed per posting);
        # above it, block-max WAND can skip whole blocks without decoding
        self.taat_threshold = taat_threshold
        self.dense_docs_max = dense_docs_max
        # warm the pyarrow scan machinery once (thread pools, filesystem,
        # codec init): the reference's startup similarly pre-loads its
        # lexicon/page table (main.cpp:338-373) — without this the FIRST
        # query pays ~100+ ms of one-time infrastructure cost that has
        # nothing to do with query evaluation
        if self._lex_ds is not None:
            self._lex_ds.head(1)
            self._blocks_ds.head(1)

    # ---- index access -----------------------------------------------------
    def lexicon_rows(self, terms: list[str]) -> dict[str, int]:
        if self._lex_ds is None:
            return {}
        missing = [t for t in terms if ("lex", t) not in self._posting_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in missing})
            flt = (ds.field("bucket").isin(buckets)) & (ds.field("term").isin(missing))
            tbl = self._lex_ds.to_table(filter=flt, columns=["term", "df"])
            found = dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
            for t in missing:
                self._posting_cache.put(("lex", t), found.get(t))
        return {
            t: v
            for t in terms
            if (v := self._posting_cache.get_(("lex", t))) is not None
        }

    def _fetch_blocks(self, terms: list[str]) -> dict[str, list[_Block]]:
        missing = [t for t in terms if ("blk", t) not in self._posting_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in missing})
            flt = (ds.field("bucket").isin(buckets)) & (ds.field("term").isin(missing))
            tbl = self._blocks_ds.to_table(filter=flt)
            # columnar extraction — per-row dicts (to_pylist) cost ~10 µs a
            # row, which at 30k blocks/term for a dense 5M-doc term is
            # seconds of pure conversion
            tcol = tbl.column("term").to_pylist()
            lo = tbl.column("doc_lo").to_numpy()
            hi = tbl.column("doc_hi").to_numpy()
            ns = tbl.column("n").to_numpy()
            ids_vb = tbl.column("ids_vb").to_pylist()
            tfs_vb = tbl.column("tfs_vb").to_pylist()
            dls_vb = tbl.column("dls_vb").to_pylist()
            mx = tbl.column("max_tfc").to_numpy()
            mn = tbl.column("min_tfc").to_numpy()
            per: dict[str, list[int]] = {t: [] for t in missing}
            for i, t in enumerate(tcol):
                per[t].append(i)
            for t in missing:
                idxs = sorted(per.get(t, []), key=lambda i: lo[i])
                blks = [
                    _Block(
                        int(lo[i]), int(hi[i]), int(ns[i]),
                        ids_vb[i], tfs_vb[i], dls_vb[i],
                        float(mx[i]), float(mn[i]),
                    )
                    for i in idxs
                ]
                self._posting_cache.put(("blk", t), blks)
        return {t: self._posting_cache.get_(("blk", t)) or [] for t in terms}

    def _fetch_arrays(self, terms: list[str]) -> dict[str, tuple]:
        """term → decoded (ids:int64, tfs:f64, dls:f64) full posting arrays,
        LRU-cached. Columnar fetch — no per-block Python objects (building a
        _Block per row costs more than decoding for dense lists), one
        segmented vb_decode per column."""
        missing = [t for t in terms if ("arr", t) not in self._posting_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in missing})
            flt = (ds.field("bucket").isin(buckets)) & (ds.field("term").isin(missing))
            tbl = self._blocks_ds.to_table(
                filter=flt,
                columns=["term", "doc_lo", "n", "ids_vb", "tfs_vb", "dls_vb"],
            )
            tcol = tbl.column("term").to_pylist()
            lo = tbl.column("doc_lo").to_numpy()
            ns_all = tbl.column("n").to_numpy()
            ids_vb = tbl.column("ids_vb").to_pylist()
            tfs_vb = tbl.column("tfs_vb").to_pylist()
            dls_vb = tbl.column("dls_vb").to_pylist()
            per: dict[str, list[int]] = {t: [] for t in missing}
            for i, t in enumerate(tcol):
                per[t].append(i)
            for t in missing:
                idxs = sorted(per.get(t, []), key=lambda i: lo[i])
                if not idxs:
                    self._posting_cache.put(("arr", t), None)
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
                self._posting_cache.put(("arr", t), (ids, tfs, dls))
        return {
            t: v
            for t in terms
            if (v := self._posting_cache.get_(("arr", t))) is not None
        }

    def _cursors(self, terms: list[str]) -> list[TermCursor]:
        lex = self.lexicon_rows(terms)
        present = [t for t in terms if t in lex]  # OOV silently skipped
        blocks = self._fetch_blocks(present)
        cursors = []
        for t in present:
            df = int(lex[t])
            idf = math.log((self.n_docs - df + 0.5) / (df + 0.5))
            if blocks[t]:
                cursors.append(TermCursor(t, df, idf, self.avg_dl, blocks[t]))
        return cursors

    def _idf(self, df: int) -> float:
        return math.log((self.n_docs - df + 0.5) / (df + 0.5))

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
            out = self._search_taat(present, lex, k, conjunctive)
        elif path == "wand":
            out = self._search_wand_blocks(present, lex, k)
            if out is None:  # block bounds don't prune → vectorized TAAT
                out = self._search_taat(present, lex, k, conjunctive=False)
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
            tf_c = tfs * (K1 + 1) / (tfs + K1 * (1 - B + B * dls / self.avg_dl))
            per.append((ids, idf * tf_c))
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
        if len(cand) == 0:
            return []
        kk = min(k, len(cand))
        if len(cand) > 4 * k + 64:
            # shrink to the top plateau before the exact tie-aware sort:
            # kth-largest value via partition, keep everything ≥ it (ties
            # included, so the doc_id-ascending tie-break stays exact)
            kth = np.partition(s, len(s) - kk)[len(s) - kk]
            keep = s >= kth
            cand, s = cand[keep], s[keep]
        sel = np.lexsort((cand, -s))[:kk]
        return [(i + 1, int(cand[j]), float(s[j])) for i, j in enumerate(sel)]

    def _search_wand_blocks(self, present, lex, k):
        """Block-at-a-time block-max WAND (disjunctive). No doc-at-a-time
        Python loop (the prior version stepped ~5 µs/posting in Python —
        837 ms/q measured on dense disjunctions):

        1. From block METADATA only (no decode), cut the docID axis into
           elementary intervals — every block doc_lo / doc_hi+1 is a
           boundary, so each (term, interval) is covered by exactly one
           block or none.
        2. Upper-bound each interval: Σ_t max(block_ub, 0). max(·, 0)
           because membership inside a covering block is unknown (an absent
           doc contributes exactly 0), which also keeps negative-IDF block
           bounds valid (SURVEY.md §4.4).
        3. Score intervals in DESCENDING bound order in geometrically
           growing batches, fully vectorized: decode only blocks covering a
           selected interval (once, cached for the call), gather member
           postings, compress candidates, scatter-add per term in
           sorted-term order, push survivors into the bounded heap.
        4. Stop when the next interval bound is strictly below the heap
           threshold θ: every unscored doc then scores < θ — it can neither
           enter the top k nor tie (strict <, so ties are always scored).
           The (score, -doc_id) heap yields the exact reference ordering
           (main.cpp:626-630) regardless of push order.

        Returns None to signal "bounds don't prune" (dense query with
        near-uniform block maxima): the caller falls back to the TAAT
        scorer, whose flat/compressed accumulator is strictly faster when
        ~everything must be scored anyway.
        """
        blocks = self._fetch_blocks(present)
        metas = []  # (idf, blks, ubs, ns) in sorted-term order
        for t in sorted(present):
            blks = blocks.get(t) or []
            if not blks:
                continue
            idf = self._idf(int(lex[t]))
            mx = np.array([b.max_tfc for b in blks])
            mn = np.array([b.min_tfc for b in blks])
            metas.append(
                (
                    idf,
                    blks,
                    np.array([b.doc_lo for b in blks], dtype=np.int64),
                    np.array([b.doc_hi for b in blks], dtype=np.int64),
                    np.maximum(idf * mx, idf * mn),
                    np.array([b.n for b in blks], dtype=np.int64),
                )
            )
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
        for idf, blks, los, his, ubs, ns in metas:
            ci = np.searchsorted(his, starts, side="left")
            cis = np.minimum(ci, len(blks) - 1)
            covered = (ci < len(blks)) & (los[cis] <= starts)
            covers.append(np.where(covered, cis, -1))
            total_ub += np.where(covered, np.maximum(ubs[cis], 0.0), 0.0)
            est_cost += np.where(covered, ns[cis], 0)
        order = np.argsort(-total_ub, kind="stable")
        ub_sorted = total_ub[order]
        cum_cost = np.cumsum(est_cost[order])
        heap: list[tuple[float, int]] = []
        in_batch = np.zeros(n_int, dtype=bool)
        decoded: list[dict] = [dict() for _ in metas]
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
            gathered = []  # (ids, contribs) per term, sorted-term order
            for (idf, blks, los, his, ubs, ns), cover, dec in zip(metas, covers, decoded):
                civ = cover[sel]
                need = np.unique(civ[civ >= 0])
                if need.size == 0:
                    continue
                miss = [bi for bi in need.tolist() if bi not in dec]
                if miss:
                    # ONE concatenated vb_decode per column for all missing
                    # blocks (per-block decode calls have ~10 µs fixed cost)
                    mns = np.array([blks[bi].n for bi in miss], dtype=np.int64)
                    st = np.concatenate(([0], np.cumsum(mns)[:-1]))
                    raw = vb_decode(b"".join(blks[bi].ids_vb for bi in miss))
                    cs = np.cumsum(raw, dtype=np.uint64)
                    mlos = np.array(
                        [blks[bi].doc_lo for bi in miss], dtype=np.uint64
                    )
                    # block-head gap is from (doc_lo - 1) — fold the base in
                    off = cs[st] - raw[st] + np.uint64(1) - mlos
                    ids_all = (cs - np.repeat(off, mns)).astype(np.int64)
                    tfs = vb_decode(b"".join(blks[bi].tfs_vb for bi in miss)).astype(np.float64)
                    dls = vb_decode(b"".join(blks[bi].dls_vb for bi in miss)).astype(np.float64)
                    tfc = tfs * (K1 + 1) / (tfs + K1 * (1 - B + B * dls / self.avg_dl))
                    contrib_all = idf * tfc
                    for j, bi in enumerate(miss):
                        s0, s1 = int(st[j]), int(st[j] + mns[j])
                        dec[bi] = (ids_all[s0:s1], contrib_all[s0:s1])
                ids = np.concatenate([dec[bi][0] for bi in need.tolist()])
                co = np.concatenate([dec[bi][1] for bi in need.tolist()])
                iv = np.searchsorted(bounds, ids, side="right") - 1
                keep = in_batch[iv]
                if keep.any():
                    gathered.append((ids[keep], co[keep]))
            if not gathered:
                continue
            scored_postings += sum(len(ids) for ids, _ in gathered)
            cand = np.unique(np.concatenate([ids for ids, _ in gathered]))
            acc = np.zeros(len(cand))
            for ids, co in gathered:  # sorted-term order = oracle float order
                acc[np.searchsorted(cand, ids)] += co
            if len(heap) == k:
                m = acc >= theta  # strict-< prune only; == θ ties still pushed
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
        for t in present:
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
        was_cached = cache_key in self._result_cache
        t0 = time.perf_counter()
        ranked = self.search(query, conjunctive=conjunctive, k=n_results)
        elapsed_us = (time.perf_counter() - t0) * 1e6
        result = {"cached": was_cached, "time": elapsed_us, "count": 0, "data": []}
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
