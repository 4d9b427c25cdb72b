"""Varbyte/delta codec roundtrips (reference wire convention:
create_index.cpp:80-93 / merge_index.cpp:95-114 — low bit groups first,
high bit SET terminates a value), widened to uint64."""

from __future__ import annotations

import random

import numpy as np

from websearchengine_spark.functions.codec import (
    decode_ids,
    delta_decode,
    delta_encode,
    encode_ids,
    vb_decode,
    vb_encode,
)

BOUNDARIES = [0, 1, 126, 127, 128, 129, 16383, 16384, 2**31 - 1, 2**31, 2**32 - 1,
              2**32, 2**63 - 1, 2**64 - 1]


def test_vb_boundaries_roundtrip():
    arr = np.array(BOUNDARIES, dtype=np.uint64)
    assert list(vb_decode(vb_encode(arr))) == BOUNDARIES


def test_vb_wire_convention():
    # 0 → single byte 0x80; 1 → 0x81; 128 → [0x00, 0x81] (low group first,
    # terminator = high bit set) — matches the reference convention
    assert vb_encode(np.array([0], dtype=np.uint64)) == b"\x80"
    assert vb_encode(np.array([1], dtype=np.uint64)) == b"\x81"
    assert vb_encode(np.array([128], dtype=np.uint64)) == b"\x00\x81"
    assert vb_encode(np.array([127], dtype=np.uint64)) == b"\xff"


def test_vb_empty():
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_vb_fuzz_roundtrip():
    rng = random.Random(11)
    for _ in range(50):
        n = rng.randint(0, 500)
        vals = [rng.randint(0, 2**64 - 1) for _ in range(n)]
        arr = np.array(vals, dtype=np.uint64)
        out = vb_decode(vb_encode(arr))
        assert list(out) == vals


def test_delta_roundtrip_and_ids():
    rng = random.Random(12)
    ids = np.array(sorted(rng.sample(range(10**12), 300)), dtype=np.uint64)
    assert list(delta_decode(delta_encode(ids))) == list(ids)
    assert list(decode_ids(encode_ids(ids))) == list(ids)


def test_delta_monotone_gap_sizes():
    ids = np.array([5, 6, 10, 1000], dtype=np.uint64)
    gaps = delta_encode(ids)
    assert list(gaps) == [5, 1, 4, 990]
