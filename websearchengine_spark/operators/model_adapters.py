"""Optional REAL-model adapters for the two model seams.

The reference's semantic search and rerank run public sentence-transformers
checkpoints (learning_to_rank.py:8-13: bi-encoder
``multi-qa-MiniLM-L6-cos-v1`` with max_seq_length 256 / top_k 32, and
cross-encoder ``cross-encoder/ms-marco-MiniLM-L-6-v2``). This container has
neither the library nor model weights, so every plan and serving path in
this repo runs against deterministic stand-ins (operators/semantic.py
hash encoder, operators/pair_scorer.py StubCrossEncoder) — the SEAMS are
the contract:

- bi-encoder: any object with ``encode(list[str]) -> sequence of float
  vectors`` (``operators.semantic.encode_texts_udf(model=...)``);
- cross-encoder: any object with ``predict(list[(query, text)]) ->
  sequence of float`` (``operators.pair_scorer.score_pairs_udf``).

sentence-transformers models natively satisfy both shapes, so these
loaders only add availability gating, the reference's checkpoint names and
truncation setting, and L2 normalization for the bi-encoder (the plans
score by cosine via dot product, so embeddings must be unit-norm — the
reference's ``util.semantic_search`` normalizes internally instead).

Every loader returns ``None`` when the library or the weights are
unavailable (offline container, no HF cache) — callers keep the
deterministic stubs and no plan changes shape. The opt-in end-to-end test
lives in tests/test_model_adapters.py (skipped unless a model loads).
"""

from __future__ import annotations

# the reference's checkpoints (learning_to_rank.py:8,13)
DEFAULT_BI_ENCODER = "multi-qa-MiniLM-L6-cos-v1"
DEFAULT_CROSS_ENCODER = "cross-encoder/ms-marco-MiniLM-L-6-v2"
DEFAULT_MAX_SEQ_LENGTH = 256  # learning_to_rank.py:9


def sentence_transformers_available() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


class _NormalizedEncoder:
    """Wraps a SentenceTransformer so ``encode`` returns unit-norm float
    vectors — the shape ``encode_texts_udf`` and the cosine plans expect.
    Batch size is the seam's Arrow batch (one encode call per batch)."""

    def __init__(self, model):
        self._model = model

    def encode(self, texts):
        return self._model.encode(
            list(texts),
            normalize_embeddings=True,
            convert_to_numpy=True,
            show_progress_bar=False,
        )


def load_bi_encoder(
    name: str = DEFAULT_BI_ENCODER,
    device: str | None = None,
    max_seq_length: int = DEFAULT_MAX_SEQ_LENGTH,
    normalize: bool = True,
):
    """Bi-encoder for the ``encode_texts_udf(model=...)`` seam, or ``None``
    when sentence-transformers / the weights are unavailable."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError:
        return None
    try:
        m = SentenceTransformer(name, device=device)
    except Exception:  # no network and no local cache — stay on the stub
        return None
    m.max_seq_length = max_seq_length
    return _NormalizedEncoder(m) if normalize else m


def load_cross_encoder(
    name: str = DEFAULT_CROSS_ENCODER, device: str | None = None
):
    """Cross-encoder for the ``score_pairs_udf`` seam (native ``predict``
    already matches), or ``None`` when unavailable."""
    try:
        from sentence_transformers import CrossEncoder
    except ImportError:
        return None
    try:
        return CrossEncoder(name, device=device)
    except Exception:
        return None
