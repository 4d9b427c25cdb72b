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


def run_query(engines: dict, query: str, args) -> dict:
    reader = engines["reader"]
    svc = engines.get("snippets")
    if args.query_type in ("conjunctive", "disjunctive"):
        return reader.search_full(
            query,
            conjunctive=args.query_type == "conjunctive",
            n_results=args.n_results,
            snippet_len=args.snippet_len,
            snippets=svc,
        )
    sem = engines["semantic"]
    if args.query_type == "semantic":
        ranked = sem.search(query, k=args.n_results)
    else:  # rerank: BM25 conjunctive candidates → cosine re-score
        cands = [d for _, d, _ in reader.search(query, conjunctive=True, k=100)]
        ranked = sem.rerank(query, cands, k=args.n_results)
    data = []
    meta = svc.meta_for([d for _, d, _ in ranked]) if svc is not None else {}
    for rank, d, score in ranked:
        item = {"rank": rank, "score": score}
        item.update(meta.get(d, {}))
        data.append(item)
    # transformer-mode responses carry no freqs and count == returned
    # (main.cpp: semantic results report only the ranked list)
    return {"cached": False, "time": 0.0, "count": len(data), "data": data}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--transcripts")
    p.add_argument("--embeddings")
    p.add_argument("--query-type", default="conjunctive",
                   choices=["conjunctive", "disjunctive", "semantic", "rerank"])
    p.add_argument("--n-results", type=int, default=10)
    p.add_argument("--snippet-len", type=int, default=120)
    p.add_argument("--query")
    args = p.parse_args(argv)

    from websearchengine_spark.operators.wand import BlockIndexReader

    engines: dict = {"reader": BlockIndexReader(args.index)}
    if args.transcripts:
        from websearchengine_spark.operators.snippets import SnippetService

        engines["snippets"] = SnippetService(
            os.path.join(args.index, "doc_stats"), args.transcripts
        )
    if args.embeddings:
        from websearchengine_spark.operators.semantic_service import SemanticService

        engines["semantic"] = SemanticService(args.embeddings)
    if args.query_type in ("semantic", "rerank") and "semantic" not in engines:
        p.error("--embeddings is required for semantic/rerank query types")

    if args.query is not None:
        _print_result(run_query(engines, args.query, args), args.query_type)
        return 0
    print("query> ", end="", flush=True)
    for line in sys.stdin:
        q = line.strip()
        if q:
            _print_result(run_query(engines, q, args), args.query_type)
        print("query> ", end="", flush=True)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
