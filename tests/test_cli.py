"""The user-facing CLI surfaces (reference `main` REPL + `evaluation`
binary analogues): scripts/search_cli.py and scripts/evaluate_job.py driven
as real subprocesses against a built index."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_env(spark, fixture, tmp_path_factory):
    from websearchengine_spark.plans.block_index import build_block_index

    base = tmp_path_factory.mktemp("cli")
    tdf = spark.createDataFrame(fixture.transcripts)
    tpath = str(base / "transcripts")
    tdf.write.parquet(tpath)
    idx = str(base / "idx")
    build_block_index(spark.read.parquet(tpath), idx, resume=False,
                      n_buckets=4, num_partitions=4)
    qpath = str(base / "queries.tsv")
    rpath = str(base / "qrels.tsv")
    with open(qpath, "w") as f:
        for qid, q in zip(fixture.queries["query_id"], fixture.queries["query"]):
            f.write(f"{qid}\t{q}\n")
    with open(rpath, "w") as f:
        for qid, d in zip(fixture.qrels["query_id"], fixture.qrels["doc_id"]):
            f.write(f"{qid}\t0\t{d}\t1\n")
    return {"idx": idx, "transcripts": tpath, "queries": qpath, "qrels": rpath}


def _run(args, **kw):
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, capture_output=True, text=True,
        timeout=300, **kw,
    )


def test_search_cli_one_shot(cli_env):
    r = _run([
        "scripts/search_cli.py", "--index", cli_env["idx"],
        "--transcripts", cli_env["transcripts"],
        "--query", "the data", "--n-results", "3", "--snippet-len", "40",
    ])
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "Found" in out and "results in" in out
    assert "1. [" in out and "the(" in out and "data(" in out
    assert "..." in out  # snippet rendered


def test_search_cli_repl_and_oov(cli_env):
    r = _run(
        ["scripts/search_cli.py", "--index", cli_env["idx"]],
        input="zzznosuchword\nthe data\n",
    )
    assert r.returncode == 0, r.stderr
    assert "No results found" in r.stdout       # pure-OOV query
    assert "Found" in r.stdout                  # real query
    assert r.stdout.count("query>") >= 3        # prompt re-printed


def test_evaluate_job_local_matches_reader(cli_env):
    r = _run([
        "scripts/evaluate_job.py", "--local",
        "--index", cli_env["idx"],
        "--queries", cli_env["queries"], "--qrels", cli_env["qrels"],
    ])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_queries"] > 0
    assert 0.0 <= out["mrr"] <= 1.0
    # planted qrels → most queries find their doc (same bar as the
    # exhaustive-path MRR test)
    assert out["mrr"] > 0.3


def test_evaluate_job_local_pool_is_bit_identical(cli_env):
    """--local --procs N (the reference's 20-thread evaluation pool as a
    process pool) must produce the EXACT sequential MRR: per-chunk rr lists
    are re-folded in original query order, so the float sum is the same."""
    outs = []
    for procs in ("1", "3"):
        r = _run([
            "scripts/evaluate_job.py", "--local", "--procs", procs,
            "--index", cli_env["idx"],
            "--queries", cli_env["queries"], "--qrels", cli_env["qrels"],
        ])
        assert r.returncode == 0, r.stderr
        outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    assert outs[0]["mrr"] == outs[1]["mrr"]
    assert outs[0]["n_queries"] == outs[1]["n_queries"]
