#!/usr/bin/env python
"""Reference-scale evaluation fixture + end-to-end run (VERDICT r3 #9).

The reference evaluates 367,013 queries / 384,597 qrels (MS MARCO doctrain,
readme.md:86) at 798 q/s on 20 threads, over a corpus with a REALISTIC
(Zipf) vocabulary — most query terms are selective, which is what makes
798 q/s possible at all. This script reproduces that workload SHAPE and
runs `scripts/evaluate_job.py` end-to-end in both modes:

1. **setup** — generate a deterministic 480k-doc corpus with a 120k-term
   Zipf vocabulary (exponent 1.07, ~40 tokens/doc; the bench headline
   corpus would NOT be a faithful analogue here — its tiny synthetic
   vocabulary makes every term df ≈ 0.8·N, so every multi-term query is a
   dense decode-bound query, a regime MS MARCO queries are not in), and
   build the block index (32 buckets, 128 partitions).
2. **fixtures** — deterministic generation, driver-side numpy:
   - queries: token windows (4–7 terms) sampled from corpus texts —
     mixing hot and selective terms exactly as real queries do; sharded
     into 8 TSV files + one concatenated file for --local mode;
   - qrels: MS MARCO format (qid, 0, doc_id, rel), derived from ONE
     untimed distributed batch_search: the primary row per query carries
     the engine's rank-1 doc; every 21st query gets a SECOND qrel row
     carrying the rank-2 doc, placed in the lexicographically LAST shard —
     cross-file last-wins (sources/tsv.py's explicit (file, line_no)
     ordering) must pick it, scoring those queries rr=1/2 instead of 1, so
     ANY first-wins/split-order bug moves the aggregate MRR and the
     dist==local equality check below detects it. 107 relevance-0 rows
     must be ignored by both paths. Total rows = 384,597 exactly.
3. **dist** — subprocess `evaluate_job.py` (fresh JVM, local[32]) over the
   sharded files; records q/s (the BENCH_r04 line; target ≥ ~800 q/s).
4. **local** — subprocess `evaluate_job.py --local` (driver loop, no
   executors) over the concatenated files; MRR must equal dist EXACTLY.

Prints ONE JSON line. --skip-local defers phase 4; rerun with the same
--workdir and --only-local to finish the comparison later.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 367_013
N_QRELS = 384_597
N_DOCS = int(os.environ.get("WSE_MARCO_N_DOCS", "480000"))
VOCAB = int(os.environ.get("WSE_MARCO_VOCAB", "120000"))
DOC_LEN = 40
TURNS_PER_CONV = 16


def _token_ids(n_docs: int):
    """Deterministic Zipf token-id matrix [n_docs, DOC_LEN] (seed 7,
    exponent 1.07 — the zipf bench's realistic-vocabulary shape)."""
    import numpy as np

    rng = np.random.default_rng(7)
    p = (1.0 / np.arange(1, VOCAB + 1)) ** 1.07
    p /= p.sum()
    return rng.choice(VOCAB, size=(n_docs, DOC_LEN), p=p)


def _setup(workdir: str, n_docs: int) -> None:
    """Generate the Zipf corpus and build the index (untimed here; the
    headline build number is bench.py's)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from websearchengine_spark.plans.block_index import build_block_index
    from websearchengine_spark.session import get_spark

    ids = _token_ids(n_docs)
    vocab = np.array([f"w{i}" for i in range(VOCAB)])
    texts = [" ".join(row) for row in vocab[ids]]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i // TURNS_PER_CONV}" for i in range(n_docs)],
            "turn_idx": np.arange(n_docs, dtype=np.int32) % TURNS_PER_CONV,
            "role": "user",
            "text": texts,
            "tool": None,
        }
    )
    spark = get_spark(app_name="marco-eval-setup")
    try:
        corpus = os.path.join(workdir, "corpus")
        (
            spark.createDataFrame(
                pdf,
                "conv_id string, turn_idx int, role string, text string, tool string",
            )
            .withColumn("ts", F.current_timestamp())
            .repartition(64)
            .write.mode("overwrite")
            .parquet(corpus)
        )
        build_block_index(
            spark.read.parquet(corpus),
            os.path.join(workdir, "idx"),
            build_id="marco-eval", resume=False,
            n_buckets=32, num_partitions=128,
        )
    finally:
        spark.stop()


def _fixtures(workdir: str, n_docs: int, n_queries: int) -> None:
    import numpy as np

    ids = _token_ids(n_docs)
    vocab = np.array([f"w{i}" for i in range(VOCAB)])

    qdir = os.path.join(workdir, "queries")
    rdir = os.path.join(workdir, "qrels")
    os.makedirs(qdir, exist_ok=True)
    os.makedirs(rdir, exist_ok=True)
    qshards = [open(os.path.join(qdir, f"queries_{k:02d}.tsv"), "w") for k in range(8)]
    # MS MARCO queries carry CONTENT words — the rarest term bounds the
    # conjunctive cost. A raw Zipf window is often all head words (the top
    # ~20 words each cover >30% of docs), which is a workload no real query
    # set has; rotate the window until it contains at least one selective
    # term (vocab rank ≥ SELECTIVE_MIN → df ≲ 2% of docs)
    SELECTIVE_MIN = 2000
    for i in range(n_queries):
        j = (i * 104_729) % n_docs  # prime stride over the corpus
        qlen = 4 + (i % 4)
        base_start = (i * 7919) % (DOC_LEN - qlen)
        start = base_start
        for off in range(DOC_LEN - qlen):
            start = (base_start + off) % (DOC_LEN - qlen)
            if (ids[j, start : start + qlen] >= SELECTIVE_MIN).any():
                break
        query = " ".join(vocab[ids[j, start : start + qlen]])
        qshards[i % 8].write(f"{i}\t{query}\n")
    for f in qshards:
        f.close()

    # qrels come from the engine's own top-2 (one untimed distributed
    # batch_search): primary rel = the rank-1 doc (rr=1 when the timed
    # eval reproduces the ranking), and every 21st query gets a SECOND
    # qrel row carrying the rank-2 doc, placed in the lexicographically
    # LAST shard — correct cross-file last-wins scores those queries at
    # rr=1/2; a first-wins or split-order bug scores them 1 and moves the
    # aggregate MRR, so the dist==local equality check detects it.
    from websearchengine_spark.operators.batch_eval import batch_search
    from websearchengine_spark.session import get_spark
    from websearchengine_spark.sources.tsv import read_queries

    spark = get_spark(app_name="marco-eval-fixtures")
    try:
        top2 = (
            batch_search(
                read_queries(spark, qdir),
                os.path.join(workdir, "idx"),
                conjunctive=True, k=2, num_partitions=128,
            )
            .collect()
        )
    finally:
        spark.stop()
    rel_at: dict[tuple[int, int], int] = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in top2
    }

    rshards = [open(os.path.join(rdir, f"qrels_{k:02d}.tsv"), "w") for k in range(8)]
    dup_rows: list[str] = []
    n_primary = n_dup = n_zero = 0
    zero_budget = max(0, N_QRELS - n_queries - (n_queries + 20) // 21) \
        if n_queries == N_QUERIES else 3
    n_docs_hint = max(rel_at.values(), default=1) + 1
    for i in range(n_queries):
        rel1 = rel_at.get((i, 1), 0)  # no-result queries: placeholder, rr=0
        rel2 = rel_at.get((i, 2), rel1)
        rshards[i % 7].write(f"{i}\t0\t{rel1}\t1\n")
        n_primary += 1
        if i % 21 == 0:
            dup_rows.append(f"{i}\t0\t{rel2}\t1\n")
            n_dup += 1
        if n_zero < zero_budget and i % 343 == 17:
            # relevance-0 rows: present in the file, ignored by the parser
            rshards[i % 7].write(f"{i}\t0\t{(rel1 + 1) % n_docs_hint}\t0\n")
            n_zero += 1
    # all duplicates land in the lexicographically LAST shard: the winner is
    # decided across files, which is exactly what (file, line_no) last-wins
    # must get right under multi-split packing
    for row in dup_rows:
        rshards[7].write(row)
    for f in qshards + rshards:
        f.close()

    # concatenated single-file twins for --local mode (file order =
    # lexicographic shard order, same as the distributed source's rule)
    for d, names, out in (
        (qdir, sorted(os.listdir(qdir)), os.path.join(workdir, "queries_all.tsv")),
        (rdir, sorted(os.listdir(rdir)), os.path.join(workdir, "qrels_all.tsv")),
    ):
        with open(out, "w") as o:
            for nm in names:
                if nm.endswith(".tsv"):
                    with open(os.path.join(d, nm)) as f:
                        o.write(f.read())
    total = n_primary + n_dup + n_zero
    print(
        f"fixtures: {n_queries} queries, {total} qrels rows "
        f"({n_primary} primary + {n_dup} cross-file dups + {n_zero} rel-0)",
        file=sys.stderr,
    )


def _run_eval(workdir: str, local: bool, num_partitions: int | None = None,
              procs: int = 1) -> dict:
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "evaluate_job.py"),
        "--index", os.path.join(workdir, "idx"),
    ]
    if local:
        cmd += [
            "--local", "--procs", str(procs),
            "--queries", os.path.join(workdir, "queries_all.tsv"),
            "--qrels", os.path.join(workdir, "qrels_all.tsv"),
        ]
    else:
        cmd += [
            "--queries", os.path.join(workdir, "queries"),
            "--qrels", os.path.join(workdir, "qrels"),
        ]
        if num_partitions:
            cmd += ["--num-partitions", str(num_partitions)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/dev/shm/wse_marco_eval")
    p.add_argument("--n-docs", type=int, default=N_DOCS)
    p.add_argument("--n-queries", type=int, default=N_QUERIES)
    p.add_argument("--skip-setup", action="store_true")
    p.add_argument("--skip-local", action="store_true")
    p.add_argument("--only-local", action="store_true",
                   help="reuse workdir fixtures, run only the --local phase")
    p.add_argument("--local-procs", type=int, default=20,
                   help="--local worker pool size (reference: 20 threads); "
                        "MRR is bit-identical to --procs 1")
    # 128 = 4 tasks/core at local[32]: the 8 query shards would otherwise
    # flow through as 8 partitions and drive only 8 of 32 cores
    p.add_argument("--num-partitions", type=int, default=128)
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    result: dict = {
        "metric": "marco_scale_eval",
        "n_queries": args.n_queries,
        "n_docs": args.n_docs,
        "vocab": VOCAB,
    }
    if not args.only_local:
        if not args.skip_setup:
            t0 = time.time()
            _setup(args.workdir, args.n_docs)
            result["setup_s"] = round(time.time() - t0, 1)
        _fixtures(args.workdir, args.n_docs, args.n_queries)
        result["dist"] = _run_eval(args.workdir, local=False,
                                   num_partitions=args.num_partitions)
    if not args.skip_local:
        result["local"] = _run_eval(args.workdir, local=True,
                                    procs=args.local_procs)
        if "dist" in result:
            result["mrr_identical"] = result["dist"]["mrr"] == result["local"]["mrr"]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
