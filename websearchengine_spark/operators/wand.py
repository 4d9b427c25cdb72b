"""Serving query engine: block-max WAND over the compressed block index.

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
- block-max WAND with a bounded min-heap for disjunctive mode — exact under
  the reference's quirks (SURVEY.md §4.4):
  - **negative IDF** (no floor, main.cpp:446-450): a term's upper bound for
    a doc *not known* to contain it is max(block_ub, 0); for a doc known to
    contain it, block_ub of any sign (tighter);
  - **tie-break** (score DESC, docID ASC, main.cpp:626-630): pruning uses
    strict `bound < θ_score` only, so any potential exact tie is fully
    scored and the heap orders by (score, −doc_id);
  - **float summation order**: exact scores are summed in sorted-term order
    (main.cpp:574), bit-identical to the oracle;
- LRU result cache keyed by the cleaned (deduped, sorted) query string
  (main.cpp:78-110, 424-430).
"""

from __future__ import annotations

import heapq
import math
import os
from bisect import bisect_left
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from websearchengine_spark.functions.codec import decode_ids, vb_decode
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
    """Cursor over one term's ordered blocks with lazy decode + skip."""

    __slots__ = ("term", "df", "idf", "avg_dl", "blocks", "his", "bi", "pos",
                 "ids", "tfs", "dls", "term_ub")

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
        # term-level upper bound (for WAND pivots) from block metadata only
        self.term_ub = max(
            max(idf * b.max_tfc, idf * b.min_tfc) for b in blocks
        )

    def _decode(self):
        if self.bi < len(self.blocks):
            b = self.blocks[self.bi]
            self.ids = decode_ids(b.ids_vb).astype(np.int64)
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

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the ENTIRE posting list in three vb_decode calls (not
        3·n_blocks): the per-block byte blobs are concatenated and decoded as
        one stream; block-local delta encoding (absolute first value per
        block) is undone with a segmented cumsum. Used by the vectorized
        term-at-a-time path for dense lists."""
        ns = np.array([b.n for b in self.blocks], dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
        raw = vb_decode(b"".join(b.ids_vb for b in self.blocks))
        cs = np.cumsum(raw, dtype=np.uint64)
        # per-block correction: subtract everything accumulated before the
        # block, then re-add its absolute first value
        offsets = cs[starts] - raw[starts]
        ids = (cs - np.repeat(offsets, ns)).astype(np.int64)
        tfs = vb_decode(b"".join(b.tfs_vb for b in self.blocks)).astype(np.float64)
        dls = vb_decode(b"".join(b.dls_vb for b in self.blocks)).astype(np.float64)
        return ids, tfs, dls

    def block_ub(self) -> float:
        b = self.blocks[self.bi]
        return max(self.idf * b.max_tfc, self.idf * b.min_tfc)

    def block_ub_at(self, target: int) -> tuple[float, int]:
        """(upper bound for a doc == target, doc_hi of the covering block)
        without decoding. If no block can contain target, ub = 0."""
        bi = bisect_left(self.his, target, lo=self.bi)
        if bi >= len(self.blocks):
            return 0.0, INF
        b = self.blocks[bi]
        if target < b.doc_lo:
            return 0.0, b.doc_lo - 1  # nothing until this block starts
        return max(self.idf * b.max_tfc, self.idf * b.min_tfc), b.doc_hi


class BlockIndexReader:
    """Driver/serving-side reader of the block index written by
    plans.block_index — no Spark session needed (pyarrow only)."""

    def __init__(self, root: str, result_cache: int = 1000, posting_cache: int = 4096,
                 taat_threshold: int = 5_000_000):
        self.paths = BlockIndexPaths(root)
        meta = pq.read_table(self.paths.meta).to_pylist()[0]
        self.n_docs = int(meta["n_docs"])
        self.avg_dl = float(meta["avg_dl"])
        self.n_buckets = int(meta["n_buckets"])
        try:
            self._blocks_ds = ds.dataset(self.paths.blocks, partitioning="hive")
            self._lex_ds = ds.dataset(self.paths.lexicon, partitioning="hive")
            if not self._lex_ds.files or not self._blocks_ds.files:
                raise FileNotFoundError("no data files")
        except Exception:
            # empty corpus: the build wrote meta but no block/lexicon data
            # files — every search over an empty index returns []
            self._blocks_ds = None
            self._lex_ds = None
        self._result_cache = _LRU(result_cache)
        self._posting_cache = _LRU(posting_cache)
        # queries whose total candidate-posting count is below this run the
        # vectorized term-at-a-time scorer (numpy, C-speed per posting);
        # above it, block-max WAND's pruning outweighs Python loop overhead
        # (it skips whole blocks — the dense-vs-selective crossover)
        self.taat_threshold = taat_threshold

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
            tbl = self._blocks_ds.to_table(filter=flt).to_pylist()
            grouped: dict[str, list[_Block]] = {t: [] for t in missing}
            for r in tbl:
                grouped[r["term"]].append(
                    _Block(
                        r["doc_lo"], r["doc_hi"], r["n"],
                        r["ids_vb"], r["tfs_vb"], r["dls_vb"],
                        r["max_tfc"], r["min_tfc"],
                    )
                )
            for t in missing:
                blks = sorted(grouped.get(t, []), key=lambda b: b.doc_lo)
                self._posting_cache.put(("blk", t), blks)
        return {t: self._posting_cache.get_(("blk", t)) or [] for t in terms}

    def _fetch_arrays(self, terms: list[str]) -> dict[str, tuple]:
        """term → decoded (ids:int64, tfs:f64, dls:f64) full posting arrays,
        LRU-cached. Columnar fetch — no per-block Python objects (building a
        _Block per row costs more than decoding for dense lists), one
        segmented vb_decode per column (TermCursor.decode_all's trick)."""
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
                offsets = cs[starts] - raw[starts]
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
        #   candidates are bounded by min_df, cost ≈ min_df·n_terms·step
        #   where step is a Python-loop iteration (~5 µs); TAAT instead
        #   decodes/scores EVERY posting of every term (~25 ns each).
        # - otherwise TAAT while total postings are machine-reasonable;
        # - block-max WAND above that (skips whole blocks without decode —
        #   the only option when full decode doesn't fit the latency budget).
        total_df = sum(lex[t] for t in present)
        min_df = min(lex[t] for t in present)
        gallop_cost = min_df * len(present) * 5e-6
        taat_cost = total_df * 2.5e-8 + self.n_docs * 1e-8
        if conjunctive and gallop_cost < taat_cost:
            path = "gallop"
        elif total_df <= self.taat_threshold:
            path = "taat"
        else:
            path = "gallop" if conjunctive else "wand"
        if path == "taat":
            out = self._search_taat(present, lex, k, conjunctive)
        else:
            cursors = self._cursors(present)
            if not cursors:
                self._result_cache.put(cache_key, [])
                return []
            heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap, ≤ k
            if conjunctive:
                self._search_conjunctive(cursors, k, heap)
            else:
                self._search_wand(cursors, k, heap)
            ranked = sorted(((-s, -nd) for s, nd in heap))
            out = [(i + 1, d, -negs) for i, (negs, d) in enumerate(ranked)]
        self._result_cache.put(cache_key, out)
        return out

    def _search_taat(self, present, lex, k, conjunctive) -> list[tuple[int, int, float]]:
        """Vectorized term-at-a-time scorer: full-list columnar decode
        (cached), per-term numpy BM25 contribution with the SAME float
        expression tree as TermCursor.contrib, accumulation in sorted-term
        order (= the oracle's float summation order, main.cpp:574), exact
        (score DESC, doc_id ASC) top-k."""
        arrays = self._fetch_arrays(present)
        per = []
        for t in sorted(arrays):
            ids, tfs, dls = arrays[t]
            df = int(lex[t])
            idf = math.log((self.n_docs - df + 0.5) / (df + 0.5))
            tf_c = tfs * (K1 + 1) / (tfs + K1 * (1 - B + B * dls / self.avg_dl))
            per.append((ids, idf * tf_c))
        if not per:
            return []
        # docIDs are DENSE [0, n_docs) by construction (operators/docids.py),
        # so accumulate into flat arrays: O(Σ postings) scatter-adds, no
        # sort/unique of the candidate ids (which dominated at high df)
        score = np.zeros(self.n_docs)
        cnt = np.zeros(self.n_docs, dtype=np.int16)
        for ids, contrib in per:  # sorted-term order fixes summation order
            score[ids] += contrib  # each doc appears once per term: no races
            cnt[ids] += 1
        cand = np.nonzero(cnt == len(per) if conjunctive else cnt > 0)[0]
        if len(cand) == 0:
            return []
        kk = min(k, len(cand))
        s = score[cand]
        if len(cand) > 4 * k + 64:
            # shrink to the top plateau before the exact tie-aware sort:
            # kth-largest value via partition, keep everything ≥ it (ties
            # included, so the doc_id-ascending tie-break stays exact)
            kth = np.partition(s, len(s) - kk)[len(s) - kk]
            keep = s >= kth
            cand, s = cand[keep], s[keep]
        sel = np.lexsort((cand, -s))[:kk]
        return [(i + 1, int(cand[j]), float(s[j])) for i, j in enumerate(sel)]

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

    def _search_wand(self, cursors, k, heap):
        while True:
            live = [c for c in cursors if c.cur_doc() < INF]
            if not live:
                return
            live.sort(key=lambda c: c.cur_doc())
            theta = heap[0][0] if len(heap) == k else -math.inf
            # pivot: first prefix whose potential (absent terms contribute 0,
            # hence max(ub, 0)) reaches θ; strict < θ is prunable, = θ is not
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += max(c.term_ub, 0.0)
                if acc >= theta:
                    pivot = i
                    break
            if pivot < 0:
                return  # no prefix can reach θ → done
            pivot_doc = live[pivot].cur_doc()
            if live[0].cur_doc() == pivot_doc:
                # shallow block-max check before decoding. Two bounds:
                # - bub_pivot: for pivot_doc itself — known members use the
                #   signed block bound (tighter under negative IDF);
                # - bub_range: for OTHER docs in the covered range, where
                #   membership is unknown → absent contributes 0, so each
                #   term's bound is max(block_ub, 0).
                bub_pivot = 0.0
                bub_range = 0.0
                min_hi = INF
                for c in live[: pivot + 1]:
                    ub, hi = c.block_ub_at(pivot_doc)
                    ub_pos = max(ub, 0.0)
                    bub_range += ub_pos
                    bub_pivot += ub if c.cur_doc() == pivot_doc else ub_pos
                    min_hi = min(min_hi, hi)
                # cursors beyond the pivot parked exactly at pivot_doc are
                # known members too: add their signed bounds (tighter under
                # negative IDF), and — critically — if we prune pivot_doc we
                # must advance them past it, or the next iteration would
                # score pivot_doc with only the leftover terms (a partial,
                # possibly higher score).
                for c in live[pivot + 1 :]:
                    if c.cur_doc() != pivot_doc:
                        break
                    ub, _ = c.block_ub_at(pivot_doc)
                    bub_pivot += ub
                if len(heap) == k and bub_pivot < theta:
                    if bub_range < theta:
                        # whole range [pivot_doc, min_hi] is prunable from
                        # the prefix alone; cursors beyond the pivot cap the
                        # skip (they could add potential from nxt onward)
                        nxt = min_hi + 1
                        if pivot + 1 < len(live):
                            nxt = min(nxt, live[pivot + 1].cur_doc())
                        nxt = max(nxt, pivot_doc + 1)
                    else:
                        nxt = pivot_doc + 1  # only pivot_doc is prunable
                    for c in live:
                        if c.cur_doc() < nxt:
                            c.next_geq(nxt)
                    continue
                at_doc = []
                for c in live:
                    if c.cur_doc() <= pivot_doc:
                        if c.next_geq(pivot_doc) == pivot_doc:
                            at_doc.append(c)
                if at_doc:
                    self._push(heap, k, self._exact_score(at_doc), pivot_doc)
                    for c in at_doc:
                        c.next_geq(pivot_doc + 1)
                else:
                    live[0].next_geq(pivot_doc + 1)
            else:
                # advance the laggard with the largest df (cheapest skips)
                laggards = [c for c in live if c.cur_doc() < pivot_doc]
                adv = max(laggards, key=lambda c: c.df)
                adv.next_geq(pivot_doc)

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
