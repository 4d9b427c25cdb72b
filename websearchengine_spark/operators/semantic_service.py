"""Serving-side semantic search + rerank (reference QueryTypes SEMANTIC=2,
RERANKING=3) — no Spark session needed.

The reference serves these interactively by holding the corpus-embedding
tensor in RAM and calling the encoder through an embedded Python bridge
(main.cpp:714-742, learning_to_rank.py). Analogue: pyarrow-load the
embeddings table (vec_id = dense docID, SURVEY.md J6) into a dense matrix,
encode the query through the same seam as the DataFrame plans, and rank by
cosine with the identical tie rules.

Float-exactness: the DataFrame plans (and the DuckDB oracles) sum dot
products as a SEQUENTIAL left fold over vector components. numpy's dot/sum
use pairwise/SIMD orders — ulp-different, which can flip ROUND(x, 6) at a
boundary. This service therefore folds with ``cumsum(axis=1)[:, -1]`` —
vectorized AND sequential-order, so cosines are bit-identical to the
DataFrame/oracle path and rank identity is exact, not approximate.

Scale: the in-RAM matrix is the reference's own serving model (3.2M × 384
floats). For corpora beyond driver RAM the ANN path is
pipeline/similarity.ann_lsh_topk (bucketed); this service is the
interactive/rerank role.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot with SEQUENTIAL float summation order (matches the
    Spark/DuckDB fold): cumsum is defined left-to-right."""
    return np.cumsum(a * b, axis=1)[:, -1]


class SemanticService:
    def __init__(self, embeddings_path: str, encoder=None):
        tbl = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
        ids = tbl.column("vec_id").to_numpy()
        order = np.argsort(ids)
        self.doc_ids = ids[order].astype(np.int64)
        mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
        self.mat = mat[order]
        self.dim = self.mat.shape[1]
        # doc self-norms, sequential order (matches dot_col(v, v))
        self._norms = _seq_dot(self.mat, self.mat)
        self._encoder = encoder

    def encode(self, text: str) -> np.ndarray:
        """The encoder seam (same contract as semantic.encode_texts_udf):
        default = the deterministic hash encoder, component-identical to
        pseudo_embedding, so results line up with the gate-checked plans."""
        if self._encoder is not None:
            return np.asarray(self._encoder.encode([text])[0], dtype=np.float64)
        from websearchengine_spark.operators.semantic import hash_encode_batch

        return np.array(hash_encode_batch([text], self.dim)[0])

    def _cosines(self, qv: np.ndarray, rows: np.ndarray | None = None):
        mat = self.mat if rows is None else self.mat[rows]
        norms = self._norms if rows is None else self._norms[rows]
        nq = float(np.cumsum(qv * qv)[-1])
        dots = _seq_dot(mat, np.broadcast_to(qv, mat.shape))
        cos = np.where(
            (nq > 0) & (norms > 0), dots / np.sqrt(nq * norms), 0.0
        )
        return np.round(cos, 6)

    def search(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """Dense retrieval: [(rank, doc_id, cosine)] ranked by
        (ROUND(cosine,6) DESC, doc_id ASC) — identical to semantic_topk."""
        cos = self._cosines(self.encode(query))
        sel = np.lexsort((self.doc_ids, -cos))[: min(k, len(cos))]
        return [
            (i + 1, int(self.doc_ids[j]), float(cos[j])) for i, j in enumerate(sel)
        ]

    def rerank(
        self,
        query: str,
        texts_for,
        k: int = 10,
        candidates_k: int = 32,
        scorer=None,
    ) -> list[tuple[int, int, float]]:
        """The reference's RERANKING flow (main.cpp:772-806): SEMANTIC
        candidates (top ``candidates_k``, learning_to_rank.py:10's
        top_k=32) → (raw query, doc_text) pairs from the doc bodies →
        cross-encoder seam scores (operators/pair_scorer; stub default) →
        sort by score DESC, stable (ties keep semantic order,
        learning_to_rank.py:27). ``texts_for``: callable(list[doc_id]) →
        {doc_id: text} (SnippetService.texts_for — the read_doc analogue)
        or a plain dict. Rank-identical to the DataFrame plan
        operators/semantic.rerank."""
        cands = self.search(query, k=candidates_k)
        ids = [d for _, d, _ in cands]
        texts = texts_for(ids) if callable(texts_for) else texts_for
        from websearchengine_spark.operators.pair_scorer import score_pairs

        scores = [
            round(s, 6)
            for s in score_pairs(
                [(query, texts.get(d, "")) for d in ids], model=scorer
            )
        ]
        order = sorted(range(len(ids)), key=lambda i: -scores[i])  # stable
        return [
            (r + 1, int(ids[i]), float(scores[i]))
            for r, i in enumerate(order[: min(k, len(ids))])
        ]
