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

from websearchengine_spark.functions.codec import decode_ids, vb_decode
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


@pytest.fixture(scope="module", params=["taat", "wand"])
def reader(index_dir, request):
    """Both serving paths — vectorized term-at-a-time (dense lists) and
    block-max WAND/intersection (selective lists) — must be rank-identical
    to the oracle; taat_threshold=0 forces the pointer-loop path."""
    if request.param == "taat":
        return BlockIndexReader(index_dir)
    return BlockIndexReader(index_dir, taat_threshold=0)


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
            ids = decode_ids(blk["ids_vb"]).astype(np.int64)
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
