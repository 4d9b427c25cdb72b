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


@pytest.fixture(scope="module", params=["taat", "taat_sparse", "wand"])
def reader(index_dir, request):
    """All serving paths must be rank-identical to the oracle:
    - taat: vectorized term-at-a-time, flat dense accumulator;
    - taat_sparse: same scorer with the candidate-compressed accumulator
      (dense_docs_max=0 → O(candidates) memory, the 10^12-doc scale path);
    - wand: block-at-a-time block-max WAND for disjunctive (taat_threshold=0
      routes everything there; dense_docs_max=0 disables the TAAT bail-out
      so pruning logic is fully exercised) + galloping conjunctive."""
    if request.param == "taat":
        return BlockIndexReader(index_dir)
    if request.param == "taat_sparse":
        return BlockIndexReader(index_dir, dense_docs_max=0)
    return BlockIndexReader(index_dir, taat_threshold=0, dense_docs_max=0)


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


def test_result_cache_hit(reader, oracle):
    r1 = reader.search("the data", conjunctive=False, k=10)
    r2 = reader.search("the data", conjunctive=False, k=10)
    assert r1 is r2  # LRU returns the cached object


def test_meta_matches_oracle(reader, oracle):
    assert reader.n_docs == oracle.n_docs
    assert math.isclose(reader.avg_dl, oracle.avg_dl, rel_tol=1e-12)


def test_block_invariants(spark, index_dir, oracle):
    rows = spark.read.parquet(f"{index_dir}/blocks").collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(oracle.postings)
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
