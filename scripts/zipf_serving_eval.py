#!/usr/bin/env python
"""Selective-regime serving evaluation (reproduces the BASELINE.md Zipf row).

Builds an index over a synthetic Zipf-vocabulary corpus (100k docs, 50k
terms, s=1.07 — a realistic term distribution, unlike the 31-term gate
corpus) and measures per-query latency of the auto-routed serving engine on
hot+rare mixed queries, asserting rank-identity between every path.

Run: python scripts/zipf_serving_eval.py  (~2 min, prints one JSON line)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    from pyspark.sql import functions as F

    from websearchengine_spark.functions.tokenizer import clean_query
    from websearchengine_spark.operators.wand import BlockIndexReader
    from websearchengine_spark.plans.block_index import build_block_index
    from websearchengine_spark.session import get_spark

    rng = np.random.default_rng(11)
    V, N, L = 50_000, 100_000, 60
    p = (1.0 / np.arange(1, V + 1)) ** 1.07
    p /= p.sum()
    vocab = np.array([f"w{i}" for i in range(V)])

    spark = get_spark(master="local[16]", app_name="zipf-eval", shuffle_partitions=16)
    rows = [
        ("c", d, "user", " ".join(vocab[rng.choice(V, size=L, p=p)]), None)
        for d in range(N)
    ]
    docs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    out = tempfile.mkdtemp(prefix="zipf_idx_")
    t0 = time.time()
    m = build_block_index(docs, out, resume=False, n_buckets=32, num_partitions=16)
    build_s = time.time() - t0
    spark.stop()

    r_auto = BlockIndexReader(out)
    r_taat = BlockIndexReader(out, taat_threshold=1 << 60)
    queries = [
        f"w0 w{rng.integers(5000, V - 1)} w{rng.integers(5000, V - 1)}"
        for _ in range(60)
    ]
    res: dict = {"n_docs": m.n_docs, "n_postings": m.n_postings,
                 "build_s": round(build_s, 1)}
    for conj in (True, False):
        total = 0.0
        for q in queries:
            t0 = time.time()
            a = r_auto.search(q, conjunctive=conj, k=10)
            total += time.time() - t0
            terms = clean_query(q)
            lex = r_taat.lexicon_rows(terms)
            b = r_taat._search_taat([t for t in terms if t in lex], lex, 10, conj)
            assert [(x, y) for x, y, _ in a] == [(x, y) for x, y, _ in b], (q, conj)
        res[f"{'conj' if conj else 'disj'}_ms_per_q"] = round(total / len(queries) * 1e3, 1)
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
