"""Physical block index + WAND serving engine tests.

- rank identity vs the oracle over the full query set (conj + disj,
  k ∈ {1, 10, 100}) — exercises block-max pruning, negative IDF bounds,
  docID-asc tie-break, OOV skipping;
- partition-count invariance of the built index;
- resume from per-bucket checkpoints → identical decoded index;
- block invariants (sorted, disjoint ranges; bounds cover members).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from websearchengine_spark.functions.codec import vb_decode
from websearchengine_spark.operators.wand import BlockIndexReader
from websearchengine_spark.plans.block_index import build_block_index


@pytest.fixture(scope="module")
def index_dir(spark, fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("blockidx"))
    tdf = spark.createDataFrame(fixture.transcripts)
    m = build_block_index(
        tdf,
        out,
        n_buckets=8,
        block_size=16,  # small blocks → many block boundaries exercised
        hot_df_threshold=200,
        target_group_size=150,
        build_id="t1",
        num_partitions=8,
    )
    assert m.n_buckets_built == 8
    return out


@pytest.fixture(
    scope="module", params=["taat", "taat_sparse", "taat_parallel", "wand"]
)
def reader(index_dir, request):
    """All serving paths must be rank-identical to the oracle:
    - taat: vectorized term-at-a-time, flat dense accumulator;
    - taat_sparse: same scorer with the candidate-compressed accumulator
      (dense_docs_max=0 → O(candidates) memory, the 10^12-doc scale path);
    - taat_parallel: doc-range-sharded TAAT across a 2-worker process pool
      (parallel_df_threshold=0 forces every TAAT-routed query through the
      pool — the dense-cold-query scale path);
    - wand: block-at-a-time block-max WAND for disjunctive (taat_threshold=0
      routes everything there; dense_docs_max=0 disables the TAAT bail-out
      so pruning logic is fully exercised) + galloping conjunctive."""
    if request.param == "taat":
        r = BlockIndexReader(index_dir)
    elif request.param == "taat_sparse":
        r = BlockIndexReader(index_dir, dense_docs_max=0)
    elif request.param == "taat_parallel":
        r = BlockIndexReader(index_dir, parallel_workers=2,
                             parallel_df_threshold=0)
    else:
        r = BlockIndexReader(index_dir, taat_threshold=0, dense_docs_max=0)
    yield r
    r.close()


@pytest.mark.parametrize("conjunctive", [True, False], ids=["conj", "disj"])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_rank_identity_vs_oracle(reader, oracle, fixture, conjunctive, k):
    queries = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    for qid, q in queries:
        expected = oracle.search(q, conjunctive=conjunctive, k=k)
        actual = reader.search(q, conjunctive=conjunctive, k=k)
        assert [(r, d) for r, d, _ in actual] == [(r, d) for r, d, _ in expected], (
            qid, q, actual, expected,
        )
        for (_, _, es), (_, _, asc) in zip(expected, actual):
            assert math.isclose(es, asc, rel_tol=1e-9, abs_tol=1e-12), (qid, q)


@pytest.mark.parametrize("conjunctive", [True, False], ids=["conj", "disj"])
def test_eviction_pressure_never_changes_results(
    index_dir, oracle, fixture, conjunctive
):
    """Regression: the posting LRU must be a pure optimization. The fetch
    helpers used to read values back THROUGH the cache after putting them;
    a put can evict another query term's cold entry (a membership probe
    does not refresh recency), and the read-back then silently treated
    that term as OOV — dropping it from the query and corrupting scores
    in a history-dependent way (reproduced at 367k-query eviction
    pressure: 20/367013 rankings differed between two warm readers).
    Pathologically tiny caches force an eviction on nearly every fetch;
    results must still match the oracle on every query, twice (the second
    pass runs against a fully churned cache)."""
    r = BlockIndexReader(
        index_dir, result_cache=0, posting_cache=4, rg_cache=2
    )
    queries = list(fixture.queries["query"])
    for _pass in range(2):
        for q in queries:
            expected = oracle.search(q, conjunctive=conjunctive, k=10)
            actual = r.search(q, conjunctive=conjunctive, k=10)
            assert [(rk, d) for rk, d, _ in actual] == [
                (rk, d) for rk, d, _ in expected
            ], q
            for (_, _, es), (_, _, asc) in zip(expected, actual):
                assert math.isclose(es, asc, rel_tol=1e-9, abs_tol=1e-12), q


@pytest.mark.parametrize(
    "reader_kw",
    [
        pytest.param(
            dict(result_cache=8, posting_cache=8, rg_cache=2), id="serial"
        ),
        pytest.param(
            dict(result_cache=4, posting_cache=8, rg_cache=2,
                 parallel_workers=2, parallel_df_threshold=1),
            id="parallel_pool",
        ),
    ],
)
def test_concurrent_search_is_rank_identical(index_dir, oracle, fixture, reader_kw):
    """C3 (thread-safe LRU, evaluation.cpp:84-121): one reader shared by
    16 threads — the reference's evaluator-pool shape — must stay rank-
    and score-identical to the oracle on every query. The LRU is lock-
    guarded (concurrent move_to_end/popitem would corrupt the OrderedDict
    links) and fetch helpers collect direct references, so a racing
    eviction costs a duplicate fetch, never a wrong answer. Tiny caches
    maximize eviction races; each thread runs the full query stream in a
    different rotation so threads constantly push each other's entries
    out.

    The parallel_pool variant is the serve_http --parallel-workers
    deployment shape: every TAAT query fans out over the ONE shared fork
    pool (Pool.map called from many threads at once) — interleaved shard
    results attributed to the wrong query, or a corrupted task queue,
    would flip rankings only under concurrency."""
    from concurrent.futures import ThreadPoolExecutor

    r = BlockIndexReader(index_dir, **reader_kw)
    queries = list(fixture.queries["query"])
    expected = {
        (q, conj): oracle.search(q, conjunctive=conj, k=10)
        for q in queries
        for conj in (True, False)
    }

    def worker(offset):
        bad = []
        n = len(queries)
        for i in range(n):
            q = queries[(i + offset) % n]
            conj = (i + offset) % 2 == 0
            got = r.search(q, conjunctive=conj, k=10)
            exp = expected[(q, conj)]
            if [(rk, d) for rk, d, _ in got] != [(rk, d) for rk, d, _ in exp]:
                bad.append((q, conj, got, exp))
            else:
                for (_, _, es), (_, _, asc) in zip(exp, got):
                    if not math.isclose(es, asc, rel_tol=1e-9, abs_tol=1e-12):
                        bad.append((q, conj, got, exp))
                        break
        return bad

    try:
        with ThreadPoolExecutor(max_workers=16) as pool:
            results = list(pool.map(worker, range(16)))
    finally:
        r.close()
    assert all(not b for b in results), [b[:1] for b in results if b]


def test_result_cache_hit(reader, oracle):
    r1 = reader.search("the data", conjunctive=False, k=10)
    r2 = reader.search("the data", conjunctive=False, k=10)
    assert r1 is r2  # LRU returns the cached object


def test_parallel_taat_bitwise_equal_and_threshold_routed(index_dir, fixture):
    """Within-query parallel decode (doc-range-sharded TAAT): every result —
    ranks, docs, AND score floats — must equal the single-process reader
    BITWISE (each doc's score is computed whole in exactly one shard with
    the identical float expression and summation order; the merge reapplies
    the one shared comparator). Also pins the routing: the pool engages only
    at/above parallel_df_threshold, and only on TAAT-routed queries."""
    serial = BlockIndexReader(index_dir)
    par = BlockIndexReader(index_dir, parallel_workers=3,
                           parallel_df_threshold=0)
    gated = BlockIndexReader(index_dir, parallel_workers=3,
                             parallel_df_threshold=1 << 60)
    try:
        queries = list(fixture.queries["query"]) + [
            "the", "the data value", "nosuchterm the"
        ]
        engaged = 0
        for q in queries:
            for conj in (True, False):
                a = serial.search(q, conjunctive=conj, k=10)
                b = par.search(q, conjunctive=conj, k=10)
                assert a == b, (q, conj)  # exact — floats included
                engaged += par.last_parallel
                g = gated.search(q, conjunctive=conj, k=10)
                assert a == g, (q, conj)
                assert not gated.last_parallel  # threshold keeps it serial
        assert engaged > 0  # the pool actually served TAAT-routed queries
    finally:
        par.close()
        gated.close()


def test_parallel_pool_init_is_race_free(index_dir):
    """Concurrent cold searches on one reader must share ONE worker pool —
    an unguarded lazy init forks a pool per racing thread and leaks the
    losers' worker processes (the ThreadingHTTPServer pattern)."""
    import threading

    r = BlockIndexReader(index_dir, parallel_workers=2)
    try:
        pools = []
        barrier = threading.Barrier(8)

        def grab():
            barrier.wait()
            pools.append(r._ensure_pool())

        threads = [threading.Thread(target=grab) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(pools) == 8
        assert all(p is pools[0] for p in pools)
    finally:
        r.close()


def test_rg_pruning_keeps_block_straddling_range_lo():
    """Regression: a shard-range read must return the block that STRADDLES
    the range's lower bound even when that block is the last row of its
    parquet row group (every doc_lo in the group < lo, so doc_lo-only
    statistics would prune the whole group — observed dropping the block's
    postings in [lo, block doc_hi] from the parallel-decode shard). The
    pruning must consult max(doc_hi) for the lower side."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from websearchengine_spark.operators.wand import _BucketRGs

    with tempfile.TemporaryDirectory() as d:
        tbl = pa.table({
            "kind": pa.array([0] * 5, type=pa.int32()),
            "term": ["t"] * 5,
            "doc_lo": pa.array([0, 10, 20, 30, 40], type=pa.int64()),
            "doc_hi": pa.array([9, 19, 29, 39, 49], type=pa.int64()),
            "n": pa.array([10] * 5, type=pa.int64()),
        })
        # row groups: {0,10}, {20,30}, {40} — block [10,19] is the LAST row
        # of group 0, whose max doc_lo (10) is below the queried lo (15)
        pq.write_table(tbl, f"{d}/part-0.parquet", row_group_size=2)
        rgs = _BucketRGs(d)
        got = rgs.read(
            ["term", "doc_lo", "doc_hi"],
            kind=0,
            terms=["t"],
            ranges_by_term={"t": [(15, 44)]},
        )
        los = sorted(got.column("doc_lo").to_pylist())
        assert 10 in los, f"straddling block pruned away: {los}"
        # the fully-below block [0,9] may legitimately be pruned
        assert set(los) >= {10, 20, 30, 40}


def test_shard_cuts_inside_blocks_with_tiny_row_groups(index_dir, fixture):
    """End-to-end shard identity under adversarial row-group placement:
    rewrite every bucket file with 2-row row groups (so a term's blocks
    span many groups and MOST shard cuts land next to a group boundary),
    then assert that for a sweep of two-shard cuts the merged shard top-k
    equals the single-process TAAT bitwise."""
    import shutil

    import pyarrow.parquet as pq

    tmp = index_dir + "_rg2"
    if not os.path.isdir(tmp):
        shutil.copytree(index_dir, tmp)
        broot = os.path.join(tmp, "blocks")
        for bdir in os.listdir(broot):
            full = os.path.join(broot, bdir)
            if not os.path.isdir(full):
                continue
            for f in os.listdir(full):
                if f.endswith(".parquet"):
                    p = os.path.join(full, f)
                    t = pq.read_table(p)
                    pq.write_table(t, p, row_group_size=2)
    r = BlockIndexReader(tmp)
    try:
        for q in list(fixture.queries["query"])[:6] + ["the data value"]:
            terms = sorted(set(q.lower().split()))
            lex = r.lexicon_rows(terms)
            present = [t for t in terms if t in lex]
            if not present:
                continue
            for conj in (True, False):
                want = r._search_taat(present, lex, 1000, conj)
                n = r.n_docs
                for cut in range(1, n, max(1, n // 13)):
                    d0, s0 = r._taat_range_topk(present, 1000, conj, 0, cut)
                    d1, s1 = r._taat_range_topk(present, 1000, conj, cut, n)
                    cand = np.concatenate([d0, d1])
                    sc = np.concatenate([s0, s1])
                    cand, sc = r._topk_arrays(cand, sc, 1000)
                    got = [
                        (i + 1, int(d), float(v))
                        for i, (d, v) in enumerate(zip(cand.tolist(),
                                                       sc.tolist()))
                    ]
                    assert got == want, (q, conj, cut)
    finally:
        r.close()


def test_meta_matches_oracle(reader, oracle):
    assert reader.n_docs == oracle.n_docs
    assert math.isclose(reader.avg_dl, oracle.avg_dl, rel_tol=1e-12)


def test_block_invariants(spark, index_dir, oracle):
    allrows = spark.read.parquet(f"{index_dir}/blocks").collect()
    rows = [r for r in allrows if r["kind"] == 0]  # leaf posting blocks
    supers = [r for r in allrows if r["kind"] == 1]
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(oracle.postings)
    # superblock invariants: per term, disjoint ordered ranges that cover
    # every leaf block exactly once, with posting counts and tfc bounds
    # aggregating their members
    sb_by_term: dict[str, list] = {}
    for r in supers:
        sb_by_term.setdefault(r["term"], []).append(r)
    assert set(sb_by_term) == set(by_term)
    for term, sbs in sb_by_term.items():
        sbs.sort(key=lambda r: r["doc_lo"])
        leaves = sorted(by_term[term], key=lambda r: r["doc_lo"])
        prev_hi = -1
        li = 0
        for sb in sbs:
            assert sb["doc_lo"] > prev_hi
            prev_hi = sb["doc_hi"]
            n_sum, mx, mn = 0, -math.inf, math.inf
            first_lo, last_hi = None, None
            while li < len(leaves) and leaves[li]["doc_lo"] <= sb["doc_hi"]:
                lf = leaves[li]
                assert lf["doc_lo"] >= sb["doc_lo"]
                assert lf["doc_hi"] <= sb["doc_hi"]
                first_lo = lf["doc_lo"] if first_lo is None else first_lo
                last_hi = lf["doc_hi"]
                n_sum += lf["n"]
                mx = max(mx, lf["max_tfc"])
                mn = min(mn, lf["min_tfc"])
                li += 1
            assert first_lo == sb["doc_lo"] and last_hi == sb["doc_hi"]
            assert n_sum == sb["n"]
            assert math.isclose(mx, sb["max_tfc"], rel_tol=1e-12)
            assert math.isclose(mn, sb["min_tfc"], rel_tol=1e-12)
        assert li == len(leaves)  # every leaf block inside exactly one sb
    for term, blks in by_term.items():
        blks.sort(key=lambda r: r["doc_lo"])
        prev_hi = -1
        seen = {}
        for blk in blks:
            # block-head gap is from (doc_lo - 1): base + cumsum of gaps
            ids = (
                blk["doc_lo"] - 1 + np.cumsum(vb_decode(blk["ids_vb"]))
            ).astype(np.int64)
            tfs = vb_decode(blk["tfs_vb"])
            dls = vb_decode(blk["dls_vb"])
            assert blk["doc_lo"] == ids[0] and blk["doc_hi"] == ids[-1]
            assert blk["n"] == len(ids) == len(tfs) == len(dls)
            assert blk["doc_lo"] > prev_hi  # disjoint, ordered ranges
            prev_hi = blk["doc_hi"]
            assert np.all(np.diff(ids) > 0)
            # bounds cover every member's tf-component
            k1, b = 0.9, 0.4
            tfc = tfs * (k1 + 1.0) / (
                tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / oracle.avg_dl)
            )
            assert blk["max_tfc"] >= tfc.max() - 1e-12
            assert blk["min_tfc"] <= tfc.min() + 1e-12
            for i, d in enumerate(ids):
                seen[int(d)] = int(tfs[i])
                assert int(dls[i]) == oracle.doc_len[int(d)]
        assert seen == oracle.postings[term]  # exact postings content


def test_build_accepts_long_typed_meta_columns(spark, fixture, tmp_path_factory):
    """Regression: a transcripts table with the natural parquet types —
    turn_idx int64 instead of the flat schema's int32 — must build, not
    detonate at the first flat-frame row-projection with an opaque
    ArrowColumnVector getInt error (mapInArrow passes meta columns through
    with the INPUT's Arrow type, unvalidated). The index must equal the
    int-typed twin's bit for bit."""
    import pyarrow.dataset as ds
    from pyspark.sql import functions as F

    tdf = spark.createDataFrame(fixture.transcripts.head(40))
    wide = tdf.withColumn("turn_idx", F.col("turn_idx").cast("long"))
    base = tmp_path_factory.mktemp("blockidx_longmeta")
    kw = dict(resume=False, n_buckets=4, num_partitions=4, block_size=16)
    build_block_index(tdf, str(base / "i32"), build_id="a", **kw)
    build_block_index(wide, str(base / "i64"), build_id="a", **kw)
    for sub in ("blocks", "lexicon", "doc_stats"):
        a = ds.dataset(str(base / "i32" / sub)).to_table().sort_by(
            [(c, "ascending") for c in ("term", "doc_lo")
             if c in ds.dataset(str(base / "i32" / sub)).schema.names]
            or [(ds.dataset(str(base / "i32" / sub)).schema.names[0],
                 "ascending")]
        )
        b = ds.dataset(str(base / "i64" / sub)).to_table().sort_by(
            [(c, "ascending") for c in ("term", "doc_lo")
             if c in ds.dataset(str(base / "i64" / sub)).schema.names]
            or [(ds.dataset(str(base / "i64" / sub)).schema.names[0],
                 "ascending")]
        )
        assert a.equals(b), sub


def test_resume_produces_identical_index(spark, fixture, oracle, tmp_path_factory):
    tdf = spark.createDataFrame(fixture.transcripts)
    out = str(tmp_path_factory.mktemp("blockidx_resume"))
    # crash: buckets {2, 5} not built in the first attempt
    m1 = build_block_index(
        tdf, out, n_buckets=8, block_size=16, build_id="r1",
        num_partitions=8, fail_buckets={2, 5},
        hot_df_threshold=200, target_group_size=150,
    )
    assert m1.n_buckets_built == 6
    # restart: only the missing buckets are built
    m2 = build_block_index(
        tdf, out, n_buckets=8, block_size=16, build_id="r1",
        num_partitions=8,
        hot_df_threshold=200, target_group_size=150,
    )
    assert m2.n_buckets_skipped == 6 and m2.n_buckets_built == 2

    reader = BlockIndexReader(out)
    for q in ["the data", "term00001 term00002", "apple pie"]:
        for conj in (True, False):
            got = reader.search(q, conjunctive=conj, k=10)
            exp = oracle.search(q, conjunctive=conj, k=10)
            assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]

    cp = spark.read.parquet(f"{out}/checkpoints")
    rows = cp.collect()
    assert {r["bucket"] for r in rows} == set(range(8))
    assert all(r["status"] == "done" for r in rows)
    assert all(r["postings_per_sec"] >= 0 for r in rows)
    assert all(r["fingerprint"] for r in rows)


def test_taat_memory_is_candidate_bounded(index_dir):
    """The compressed-accumulator TAAT path must allocate O(candidate
    postings), never O(n_docs): with n_docs inflated to 10^10 (a flat
    float64+int16 accumulator would be ~100 GB) the search must still
    complete within a tiny allocation budget. Scores shift (IDF depends on
    n_docs) — this test asserts memory + result shape, not values."""
    import tracemalloc

    r = BlockIndexReader(index_dir)
    r.n_docs = 10_000_000_000  # forces the sparse path via _flat_ok
    tracemalloc.start()
    out = r.search("the data", conjunctive=False, k=10)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == 10
    assert peak < 32 * 1024 * 1024  # MBs, not the ~100 GB a flat array needs


def test_match_count_and_result_freqs(reader, oracle, fixture):
    queries = list(zip(fixture.queries["query_id"], fixture.queries["query"]))
    for _, q in queries[:6]:
        for conj in (True, False):
            exp = len(oracle.search(q, conjunctive=conj, k=10**9))
            assert reader.match_count(q, conjunctive=conj) == exp, (q, conj)
    # freqs: sorted-term order, tf from the index == oracle postings
    res = reader.search("the data", conjunctive=True, k=5)
    freqs = reader.result_freqs("the data", [d for _, d, _ in res])
    for _, d, _ in res:
        fl = freqs[d]
        assert fl == sorted(fl)
        for t, tf in fl:
            assert oracle.postings[t][d] == tf


def test_hot_term_salt_scales_to_wide_vocab(spark, tmp_path_factory):
    """The salt factors ride a broadcast-joined frame, not driver literals:
    with hot_df_threshold=0 EVERY term is hot (>= 1e5 salt entries here),
    which a create_map literal plan cannot survive. The index must still be
    correct: postings round-trip exactly for sampled terms."""
    import pandas as pd

    n_docs, terms_per_doc = 2000, 60
    rows = []
    for d in range(n_docs):
        # n_docs*terms_per_doc distinct terms (>= 1e5) + one hot term
        toks = ["common"] + [
            f"t{d * terms_per_doc + j:06d}" for j in range(terms_per_doc)
        ]
        rows.append(("c", d, "user", " ".join(toks), None, None))
    tdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path_factory.mktemp("hotsalt"))
    m = build_block_index(
        tdf, out, n_buckets=4, block_size=32, build_id="hot",
        num_partitions=4, hot_df_threshold=0, target_group_size=500,
    )
    assert m.n_docs == n_docs
    lex = spark.read.parquet(f"{out}/lexicon")
    assert lex.count() >= 100_000
    reader = BlockIndexReader(out)
    # the genuinely hot term (df = n_docs, salted n_docs/500 ways) must have
    # every doc, in order, exactly once
    arrays = reader._fetch_arrays(["common"])
    ids = arrays["common"][0]
    assert list(ids) == list(range(n_docs))
    # a rare term: present in exactly its one source doc (doc 1)
    arrays = reader._fetch_arrays(["t000100"])
    assert list(arrays["t000100"][0]) == [1]


def test_wand_block_pruning_engages_on_tf_skew(spark, tmp_path_factory):
    """Block-max pruning must actually PRUNE when block maxima vary: a
    corpus whose hot-term tf varies at block granularity lets θ (the k-th
    best score) exceed most blocks' upper bounds after the first batch, so
    WAND decodes a small fraction of the postings. Deterministic check via
    the scored-postings counter — no wall-clock flakiness."""
    import pandas as pd

    # "hot" in a QUARTER of the docs: df must sit well under N/2 — at
    # df == N the IDF is negative (bounds clamp to 0, nothing prunable by
    # semantics) and at df == N/2 it is exactly 0 (all scores 0, all ties);
    # tf constant over 256-doc spans so block maxima vary across blocks
    n_docs, bs = 32768, 16
    rows = []
    for d in range(n_docs):
        toks = [f"u{d:05d}"]
        if d % 4 == 0:
            toks = ["hot"] * (1 + (d // 256) % 64) + toks
        rows.append(("c", d, "user", " ".join(toks), None, None))
    tdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path_factory.mktemp("tfskew"))
    build_block_index(tdf, out, resume=False, n_buckets=4, num_partitions=4,
                      block_size=bs, hot_df_threshold=10**9)
    wand = BlockIndexReader(out, taat_threshold=0, dense_docs_max=0)
    taat = BlockIndexReader(out)
    got = wand.search("hot", conjunctive=False, k=10)
    exp = taat.search("hot", conjunctive=False, k=10)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]
    df_hot = n_docs // 4
    assert wand.last_wand_scored < 0.25 * df_hot, wand.last_wand_scored


def _skewed_corpus(spark, n_docs=32768, every=4, tf_of=None):
    import pandas as pd

    tf_of = tf_of or (lambda d: 1 + (d // 1024))
    rows = []
    for d in range(n_docs):
        toks = [f"u{d:05d}"]
        if d % every == 0:
            toks = ["hot"] * tf_of(d) + toks
        rows.append(("c", d, "user", " ".join(toks), None, None))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_wand_metadata_fetch_is_bounded_on_hot_term(spark, tmp_path_factory):
    """The 10^12-doc serving requirement (two-level superblock metadata): a
    WAND query over a hot term must NOT materialize O(df/block_size) leaf
    metadata rows — only the superblock summaries eagerly, and leaf rows
    lazily for superblocks that survive pruning. The tf ramp concentrates
    top scores in the highest-docID superblocks, so most superblocks' leaf
    blocks are never fetched at all."""
    # superblock = 128·8 = 1024 postings; df = 16384 → 16 superblocks,
    # ABOVE the reader's bounded whole-term prefetch (prefetch_sbs = 8), so
    # this exercises the genuinely lazy path a 10^12-doc stopword term takes
    n_docs, bs = 65536, 8
    tdf = _skewed_corpus(spark, n_docs=n_docs)
    out = str(tmp_path_factory.mktemp("sbfetch"))
    build_block_index(tdf, out, resume=False, n_buckets=4, num_partitions=4,
                      block_size=bs, hot_df_threshold=10**9)
    wand = BlockIndexReader(out, taat_threshold=0, dense_docs_max=0)
    taat = BlockIndexReader(out)
    got = wand.search("hot", conjunctive=False, k=10)
    exp = taat.search("hot", conjunctive=False, k=10)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]
    df_hot = n_docs // 4
    n_leaf_blocks = -(-df_hot // bs)            # ~1024
    n_sbs = -(-n_leaf_blocks // 128)            # ~8
    assert wand.sb_rows_fetched <= n_sbs + 2    # eager metadata is sb-level
    # leaf rows arrive lazily, only for surviving superblocks: a bounded
    # slice, not the whole term (the old reader read all ~1024 rows)
    assert wand.leaf_rows_fetched < 0.5 * n_leaf_blocks, wand.leaf_rows_fetched


def test_conjunctive_cursor_fetch_is_bounded(spark, tmp_path_factory):
    """Galloping conjunctive over (rare AND hot): the two-level cursors must
    fetch the hot term's leaf data only for superblocks the rare lead's
    docIDs actually land in — never the hot term's whole posting list."""
    import pandas as pd

    n_docs, bs = 32768, 8
    rows = []
    rare_at = {100, 5000, 20000}  # 3 docs, far apart → ≤3 superblocks touched
    for d in range(n_docs):
        toks = [f"u{d:05d}", "hot"]
        if d in rare_at:
            toks.append("rare")
        rows.append(("c", d, "user", " ".join(toks), None, None))
    tdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path_factory.mktemp("cursorfetch"))
    build_block_index(tdf, out, resume=False, n_buckets=4, num_partitions=4,
                      block_size=bs, hot_df_threshold=10**9)
    r = BlockIndexReader(out)
    got = r.search("rare hot", conjunctive=True, k=10)
    assert {d for _, d, _ in got} == rare_at
    # exact-match check vs the exhaustive scorer
    taat = BlockIndexReader(out, dense_docs_max=1 << 26)
    exp = taat.search("hot rare", conjunctive=True, k=10)
    assert [(rk, d) for rk, d, _ in got] == [(rk, d) for rk, d, _ in exp]
    # hot term: 32768 postings = 4096 leaf blocks = ~32 superblocks; the
    # 3 lead docs land in ≤ 3+ a few of them. rare term: 1 superblock.
    assert r.leaf_rows_fetched <= 6 * 128, r.leaf_rows_fetched


def test_texts_sidecar_matches_transcripts_fallback(spark, fixture, tmp_path_factory):
    """store_texts=True writes the doc_id-clustered text sidecar (the
    reference's page-table byte seek, main.cpp:498); SnippetService must
    return identical texts/snippets through it, and the sidecar must be
    doc_id-sorted within files (contiguous row-group ranges → pruned
    fetch)."""
    import os

    import pyarrow.parquet as pq_
    from websearchengine_spark.operators.snippets import SnippetService

    out = str(tmp_path_factory.mktemp("sidecar"))
    tdf = spark.createDataFrame(fixture.transcripts)
    build_block_index(tdf, out, resume=False, n_buckets=4, num_partitions=4,
                      store_texts=True)
    tpath = str(tmp_path_factory.mktemp("tr"))
    tdf.write.mode("overwrite").parquet(tpath)
    svc_fast = SnippetService(
        os.path.join(out, "doc_stats"), texts_path=os.path.join(out, "texts")
    )
    svc_slow = SnippetService(os.path.join(out, "doc_stats"), tpath)
    reader = BlockIndexReader(out)
    doc_ids = [d for _, d, _ in reader.search("the data", conjunctive=False, k=20)]
    assert doc_ids
    assert svc_fast.texts_for(doc_ids) == svc_slow.texts_for(doc_ids)
    q = "the data"
    assert svc_fast.reference_snippets(q, doc_ids) == svc_slow.reference_snippets(q, doc_ids)
    # layout invariant: every sidecar file is doc_id-ascending and files
    # cover disjoint ranges (row-group stats prune a k-doc fetch to ~k groups)
    tdir = os.path.join(out, "texts")
    ranges = []
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".parquet"):
            continue
        ids = pq_.read_table(os.path.join(tdir, fn), columns=["doc_id"])["doc_id"].to_numpy()
        if len(ids) == 0:
            continue
        assert np.all(np.diff(ids) > 0)
        ranges.append((int(ids[0]), int(ids[-1])))
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi < blo
    n_docs = sum(hi - lo + 1 for lo, hi in ranges)
    assert n_docs == reader.n_docs
