"""Multimodal binary-column plumbing: opaque media payloads with typed
metadata, batch decode / feature-extract / frame-sample over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake or ``NotImplementedError``), but everything Spark-side —
schema, Arrow batch shapes, partitioning, UDF signatures — is real and
tested. Swapping the stub for PIL/ffmpeg is a one-function change.

Media rows are synthesized deterministically from the documents table
(payload = UTF-8 bytes of the text) so metadata operators have an exact
DuckDB oracle (octet_length / md5 over the same bytes).

Scale notes: payloads stay opaque BinaryType end-to-end (never collected,
never exploded); decode fan-out uses ``mapInPandas`` so one input row can
yield many frames without materializing a per-row array column; a real
deployment bounds batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` since frames are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),       # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),    # audio/video
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
        T.StructField("frame_checksum", T.LongType(), False),
    ]
)


def to_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents: payload = UTF-8 text bytes,
    kind = doc_id % 3, metadata derived from byte length. Pure column ops."""
    n = F.length(F.col("text").cast("binary")).cast("long")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.when(kind != "audio", (n % 640 + 16).cast("int")).alias("width"),
        F.when(kind != "audio", (n % 480 + 16).cast("int")).alias("height"),
        F.when(kind != "image", (n * 40)).alias("duration_ms"),
    )


def media_stats(docs: DataFrame) -> DataFrame:
    """Typed metadata over opaque payloads — no decode, JVM-side only.
    (doc_id, kind, n_bytes, checksum_md5)."""
    m = to_media(docs)
    return m.select(
        "doc_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum_md5"),
    )


def decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """STUB — real codecs (PIL / soundfile / pyav) are not in this container.
    Raises so callers can't silently treat fake pixels as real."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "container; use fake_decode_payload for plumbing tests"
    )


def fake_decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: payload bytes as a u8 feature vector,
    zero-padded to a multiple of 16 — stands in for pixels/samples."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % 16
    return np.pad(arr, (0, pad))


def frame_sample(media: DataFrame, frame_size: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame/window sampler: split each payload into up to ``max_frames``
    fixed-size frames (video frames / audio windows / image tiles).
    Arrow-batched ``mapInPandas`` — the real fan-out plumbing; the per-frame
    checksum uses the fake decoder in place of a codec."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "frame_bytes": [], "frame_checksum": []
            }
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                decoded = fake_decode_payload(bytes(payload), kind)
                n_frames = min(
                    max_frames, max(1, int(np.ceil(len(decoded) / frame_size)))
                )
                for i in range(n_frames):
                    frame = decoded[i * frame_size : (i + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(frame.tobytes())
                    out["frame_checksum"].append(
                        int(frame.astype(np.uint64).sum())
                    )
            yield pd.DataFrame(out)

    return media.select("doc_id", "kind", "payload").mapInPandas(
        sample, FRAME_SCHEMA
    )


def frame_checksums(docs: DataFrame, frame_size: int = 64, max_frames: int = 4) -> DataFrame:
    """Gate-friendly projection of frame_sample (no raw bytes):
    (doc_id, frame_no, n_bytes, frame_checksum)."""
    frames = frame_sample(to_media(docs), frame_size=frame_size, max_frames=max_frames)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        "frame_checksum",
    )
