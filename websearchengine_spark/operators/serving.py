"""Unified serving engine — the reference's Searcher class family
(ConjunctiveSearcher / DisjunctiveSearcher / TransformerSearcher dispatched
by QueryType, main.cpp:234-236, 555-841) behind one object, no Spark:

    engine = ServingEngine(index_dir, transcripts_path=..., embeddings_path=...)
    engine.search("hash join", QueryType.CONJUNCTIVE, n_results=10)
    → {cached, time (µs), count, data: [{rank, score, freqs?, conv_id,
       turn_idx, role, snippet?}]}

BM25 modes delegate to BlockIndexReader.search_full (count = TOTAL
matches, freqs sorted-term, reference-exact snippets). SEMANTIC/RERANKING
delegate to SemanticService (bit-identical cosines to the DataFrame
plans); per the reference, transformer results carry no freqs and the
response's count is the returned list's length, with results cached under
the cleaned-query key like the BM25 searchers (main.cpp:758-768)."""

from __future__ import annotations

import time

from websearchengine_spark.functions.tokenizer import clean_query
from websearchengine_spark.operators.query_api import QueryType
from websearchengine_spark.operators.wand import BlockIndexReader, _LRU


class ServingEngine:
    def __init__(
        self,
        index_dir: str,
        transcripts_path: str | None = None,
        embeddings_path: str | None = None,
        encoder=None,
        result_cache: int = 1000,
        rerank_candidates: int = 100,
    ):
        import os

        self.reader = BlockIndexReader(index_dir, result_cache=result_cache)
        self.snippets = None
        if transcripts_path is not None:
            from websearchengine_spark.operators.snippets import SnippetService

            self.snippets = SnippetService(
                os.path.join(index_dir, "doc_stats"), transcripts_path
            )
        self.semantic = None
        if embeddings_path is not None:
            from websearchengine_spark.operators.semantic_service import (
                SemanticService,
            )

            self.semantic = SemanticService(embeddings_path, encoder=encoder)
        self.rerank_candidates = rerank_candidates
        self._sem_cache = _LRU(result_cache)

    def search(
        self,
        query: str,
        query_type: QueryType = QueryType.CONJUNCTIVE,
        n_results: int = 10,
        snippet_len: int = 120,
    ) -> dict:
        query_type = QueryType(query_type)
        if query_type in (QueryType.CONJUNCTIVE, QueryType.DISJUNCTIVE):
            return self.reader.search_full(
                query,
                conjunctive=query_type == QueryType.CONJUNCTIVE,
                n_results=n_results,
                snippet_len=snippet_len,
                snippets=self.snippets,
            )
        if self.semantic is None:
            raise ValueError("SEMANTIC/RERANKING need embeddings_path")
        key = (" ".join(clean_query(query)), int(query_type), n_results)
        t0 = time.perf_counter()
        cached = self._sem_cache.get_(key)
        if cached is not None:
            ranked = cached
            was_cached = True
        else:
            was_cached = False
            if query_type == QueryType.SEMANTIC:
                ranked = self.semantic.search(query, k=n_results)
            else:
                cands = [
                    d
                    for _, d, _ in self.reader.search(
                        query, conjunctive=True, k=self.rerank_candidates
                    )
                ]
                ranked = self.semantic.rerank(query, cands, k=n_results)
            self._sem_cache.put(key, ranked)
        elapsed_us = (time.perf_counter() - t0) * 1e6
        meta = (
            self.snippets.meta_for([d for _, d, _ in ranked])
            if self.snippets is not None
            else {}
        )
        data = []
        for rank, d, score in ranked:
            item = {"rank": rank, "score": score}  # no freqs (main.cpp:490)
            item.update(meta.get(d, {}))
            data.append(item)
        return {
            "cached": was_cached,
            "time": elapsed_us,
            "count": len(data),
            "data": data,
        }
