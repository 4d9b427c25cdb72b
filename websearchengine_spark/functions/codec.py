"""Varbyte + delta (d-gap) posting codec, vectorized with numpy.

Same wire convention as the reference (create_index.cpp:80-93 encode,
merge_index.cpp:95-114 decode): values are split into 7-bit groups,
little-endian (least-significant group first), and the **terminating byte of
a value has its high bit SET** (non-final bytes have it clear).

Extensions over the reference (which caps values at u32,
readme_assignment.md:247): values are uint64 (docIDs at 10^12-turn scale),
and docID lists are delta-encoded as [first, gap, gap, ...] before varbyte
(merge_index.cpp:220-224 stores gaps; frequencies are varbyte'd raw — they
are small, readme_assignment.md:78).
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 10  # ceil(64 / 7)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64 array. Vectorized: no per-value Python loop —
    the only loops are over the ≤10 7-bit group positions."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (≥1)
    ngroups = np.ones(v.size, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        ngroups += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    out = np.zeros(int(ngroups.sum()), dtype=np.uint8)
    for k in range(_MAX_GROUPS):
        sel = ngroups > k
        if not sel.any():
            break
        byte = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        last = ngroups[sel] == k + 1
        byte[last] |= 0x80  # high bit set terminates a value
        out[starts[sel] + k] = byte
    return out.tobytes()


def vb_value_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (1..10) — lets callers split one
    whole-list vb_encode stream at arbitrary value boundaries (vb coding is
    per-value independent, so the concatenation property is exact)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    ngroups = np.ones(v.size, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        ngroups += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    return ngroups


def vb_blocked(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list[bytes]:
    """vb-encode the whole array ONCE, then split the byte stream at block
    boundaries (vb coding is per-value independent, so the split blobs are
    byte-identical to encoding each block separately)."""
    stream = vb_encode(values)
    cum = np.concatenate(([0], np.cumsum(vb_value_lengths(values))))
    return [stream[cum[s] : cum[e]] for s, e in zip(starts, ends)]


def vb_blocked_arrow(values: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Like :func:`vb_blocked` but returns a ZERO-COPY Arrow binary array.

    Requires the blocks to TILE the value array contiguously
    (``ends[i] == starts[i+1]``, ``starts[0] == 0``) — both call sites (the
    run emitter and the block encoder) cut maximal-coverage boundaries, so
    the encoded stream's value offsets at the block starts ARE the Arrow
    offsets vector, and the stream itself is the data buffer. No per-block
    Python bytes objects (a 1.44M-turn build otherwise materializes ~1.8M
    of them across the run and block stages)."""
    import pyarrow as pa

    n_blocks = len(starts)
    stream = vb_encode(values)
    if n_blocks == 0:
        return pa.array([], type=pa.binary())
    cum = np.concatenate(([0], np.cumsum(vb_value_lengths(values))))
    if cum[-1] > np.iinfo(np.int32).max:  # binary() offsets are int32
        raise ValueError(
            f"encoded stream of {cum[-1]} bytes overflows int32 Arrow "
            "offsets — shrink the Arrow batch size"
        )
    offsets = np.empty(n_blocks + 1, dtype=np.int32)
    offsets[:-1] = cum[starts]
    offsets[-1] = cum[ends[-1]]
    return pa.BinaryArray.from_buffers(
        pa.binary(), n_blocks, [None, pa.py_buffer(offsets), pa.py_buffer(stream)]
    )


def concat_binary_column(col) -> np.ndarray:
    """Zero-copy concatenation of a null-free Arrow binary column's values
    as one uint8 array — the equivalent of ``b"".join(col.to_pylist())``
    without materializing a Python bytes object per row (binary array
    values are stored back-to-back in the data buffer already)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint8)
    if not pa.types.is_binary(col.type):  # large_binary has int64 offsets
        raise TypeError(f"expected binary column, got {col.type}")
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    return np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]


def vb_decode(buf) -> np.ndarray:
    """Decode a varbyte stream (bytes or uint8 array) back to uint64s
    (vectorized)."""
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    high = b & 0x80
    if high.all():  # every value single-byte (common for tfs/small gaps):
        return (b & np.uint8(0x7F)).astype(np.uint64)
    ends = np.nonzero(high)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    lengths = ends - starts
    out = np.empty(n, dtype=np.uint64)
    # dominant shape: almost all values 1 byte (tf=1 / gap-of-1 runs) with
    # rare multi-byte values (block-head absolute ids). One gather handles
    # the short values; the per-group loop runs only over the long subset
    # (the old loop re-masked and re-gathered ALL n values per group —
    # ~10x slower on delta-encoded dense posting lists).
    short = lengths == 0
    out[short] = b[starts[short]] & np.uint8(0x7F)
    long_idx = np.nonzero(~short)[0]
    if long_idx.size:
        lstarts = starts[long_idx]
        llen = lengths[long_idx] + 1
        acc = np.zeros(long_idx.size, dtype=np.uint64)
        for k in range(int(llen.max())):
            sel = llen > k
            grp = (b[lstarts[sel] + k] & 0x7F).astype(np.uint64)
            acc[sel] |= grp << np.uint64(7 * k)
        out[long_idx] = acc
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 ids → [first, gap, gap, ...]."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` (prefix sum, main.cpp:122-129)."""
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_ids(sorted_ids: np.ndarray) -> bytes:
    return vb_encode(delta_encode(sorted_ids))


def decode_ids(buf: bytes) -> np.ndarray:
    return delta_decode(vb_decode(buf))


def encode_tfs(tfs: np.ndarray) -> bytes:
    return vb_encode(tfs)


def decode_tfs(buf: bytes) -> np.ndarray:
    return vb_decode(buf)
