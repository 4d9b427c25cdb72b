#!/usr/bin/env python
"""Interactive / one-shot search CLI over a built block index — the
reference's `main` CLI mode (main.cpp:960-994), including its output
format: `N. [score] term(tf) ...` lines with the doc key and snippet.
No Spark session: the serving engine is pyarrow+numpy only.

    python scripts/search_cli.py --index /path/idx \\
        [--transcripts /path/turns.parquet] \\
        [--embeddings /path/embeddings.parquet] \\
        [--query-type conjunctive|disjunctive|semantic|rerank] \\
        [--n-results 10] [--snippet-len 120] [--query 'one shot']

Without --query it REPLs on stdin (`query> ` prompt, EOF exits) exactly
like the reference. SEMANTIC/RERANK need --embeddings (vec_id = docID);
snippets and doc keys need --transcripts.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_TYPES = ["conjunctive", "disjunctive", "semantic", "rerank"]


def _print_result(result: dict, query_type: str) -> None:
    # the reference's REPL formatting (main.cpp:962-994)
    if result["count"] == 0:
        print(f"\nNo results found. Checked in {result['time']:.2f} microseconds.\n\n")
        return
    if result["cached"]:
        print(
            f"\nFound {result['count']} results from cache in "
            f"{result['time']:.2f} microseconds.\n\n"
        )
    else:
        print(
            f"\nFound {result['count']} results in "
            f"{result['time'] / 1000.0:.2f} milliseconds.\n\n"
        )
    for item in result["data"]:
        line = f"{item['rank']}. [{item['score']:.2f}] "
        if query_type in ("conjunctive", "disjunctive"):
            line += " ".join(f"{t}({tf})" for t, tf in item.get("freqs", []))
        print(line)
        key = item.get("conv_id")
        if key is not None:
            print(f"\n({key}, turn {item.get('turn_idx')}, {item.get('role')})")
        snip = item.get("snippet")
        if snip is not None:
            print(f"\n...{snip}...\n\n")
        else:
            print()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--transcripts")
    p.add_argument("--embeddings")
    p.add_argument("--query-type", default="conjunctive", choices=QUERY_TYPES)
    p.add_argument("--n-results", type=int, default=10)
    p.add_argument("--snippet-len", type=int, default=120)
    p.add_argument("--query")
    p.add_argument("--parallel-workers", type=int, default=0,
                   help="process-pool size for within-query parallel decode "
                        "of dense cold queries (0 = single-process)")
    args = p.parse_args(argv)

    from websearchengine_spark.operators.query_api import QueryType
    from websearchengine_spark.operators.serving import ServingEngine

    qtype = QueryType(QUERY_TYPES.index(args.query_type))
    if qtype in (QueryType.SEMANTIC, QueryType.RERANKING) and not args.embeddings:
        p.error("--embeddings is required for semantic/rerank query types")
    with ServingEngine(
        args.index,
        transcripts_path=args.transcripts,
        embeddings_path=args.embeddings,
        parallel_workers=args.parallel_workers,
    ) as engine:

        def run(q: str) -> None:
            _print_result(
                engine.search(q, qtype, n_results=args.n_results,
                              snippet_len=args.snippet_len),
                args.query_type,
            )

        if args.query is not None:
            run(args.query)
            return 0
        print("query> ", end="", flush=True)
        for line in sys.stdin:
            q = line.strip()
            if q:
                run(q)
            print("query> ", end="", flush=True)
        print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
