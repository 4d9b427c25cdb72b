"""Pure-Python oracle of the reference engine's query semantics.

A small in-memory reimplementation of kevintsq/WebSearchEngine's BM25 search
(main.cpp Searcher::search, 465-553) used as the rank-identity ground truth
for every Spark path. Reproduces, exactly:

- tokenizer + ASCII-only lowercasing (SURVEY.md §1.3);
- query cleaning: tokenize → dedupe → sort (main.cpp:393-431) — per-term
  contributions are summed in sorted-term order (fixes float summation
  order, main.cpp:574);
- OOV query terms silently skipped, even in conjunctive mode (main.cpp:575);
  all-OOV → zero results (main.cpp:593-595);
- BM25 with k1=0.9, b=0.4 (main.cpp:250), IDF = ln((N-f_t+0.5)/(f_t+0.5))
  with NO floor — negative for f_t > N/2 (main.cpp:446-450);
- conjunctive = intersection of posting lists (main.cpp:599-607);
  disjunctive = union (main.cpp:681-687);
- result order: score DESC, docID ASC (main.cpp:626-630), then top-n.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from websearchengine_spark.functions.tokenizer import clean_query, tokenize

K1 = 0.9
B = 0.4


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # term → {doc_id: tf}
    doc_len: list[int]                   # docID → l_d
    n_docs: int
    avg_dl: float

    @classmethod
    def build(cls, texts_in_docid_order: list[str]) -> "OracleIndex":
        postings: dict[str, dict[int, int]] = {}
        doc_len: list[int] = []
        for doc_id, text in enumerate(texts_in_docid_order):
            toks = tokenize(text)
            doc_len.append(len(toks))
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in counts.items():
                postings.setdefault(t, {})[doc_id] = tf
        n = len(doc_len)
        avg = (sum(doc_len) / n) if n else 0.0
        return cls(postings=postings, doc_len=doc_len, n_docs=n, avg_dl=avg)

    def bm25(self, tf: int, df: int, dl: int) -> float:
        idf = math.log((self.n_docs - df + 0.5) / (df + 0.5))
        tf_c = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / self.avg_dl))
        return idf * tf_c

    def search(
        self, query: str, conjunctive: bool = True, k: int = 10
    ) -> list[tuple[int, int, float]]:
        """→ [(rank starting at 1, doc_id, score)]."""
        terms = [t for t in clean_query(query) if t in self.postings]
        if not terms:
            return []
        if conjunctive:
            docs: set[int] | None = None
            for t in terms:
                s = set(self.postings[t])
                docs = s if docs is None else docs & s
            candidates = docs or set()
        else:
            candidates = set()
            for t in terms:
                candidates |= set(self.postings[t])
        scores: dict[int, float] = {}
        for t in terms:  # sorted-term order → fixed float summation order
            plist = self.postings[t]
            df = len(plist)
            for d in candidates:
                tf = plist.get(d)
                if tf is not None:
                    scores[d] = scores.get(d, 0.0) + self.bm25(tf, df, self.doc_len[d])
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]

    def mrr_at(self, queries: list[tuple[int, str]], qrels: dict[int, int], n: int = 10) -> float:
        """Mean reciprocal rank over queries with a qrel (evaluation.cpp:715-720)."""
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
