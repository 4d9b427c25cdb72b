"""Hypothesis property tests: tokenizer regex path vs the character-level
spec port, codec roundtrips/invariants, query-cleaning invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from websearchengine_spark.functions.codec import (
    decode_ids,
    delta_decode,
    delta_encode,
    encode_ids,
    vb_decode,
    vb_encode,
    vb_value_lengths,
)
from websearchengine_spark.functions.tokenizer import (
    clean_query,
    tokenize,
    tokenize_spec,
)

# full Unicode incl. the reproduction-critical boundary blocks
UNICODE_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(),
        st.sampled_from("abcXYZ019 .,!-_你好ひみむめもカタ⁰–—😀ＡＢ ⁯　みむ"),
    ),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(UNICODE_TEXT)
def test_tokenize_regex_equals_spec(text):
    assert tokenize(text) == tokenize_spec(text)


@settings(max_examples=200, deadline=None)
@given(UNICODE_TEXT)
def test_clean_query_invariants(text):
    terms = clean_query(text)
    assert terms == sorted(set(terms))            # deduped + sorted
    assert all(t in tokenize(text) for t in terms)


U64S = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=0, max_size=200
)


@settings(max_examples=300, deadline=None)
@given(U64S)
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(U64S)
def test_vb_value_lengths_consistent(values):
    """Per-value byte lengths partition the encoded stream exactly — the
    invariant the blocked encoder's split-at-boundary trick relies on."""
    arr = np.array(values, dtype=np.uint64)
    stream = vb_encode(arr)
    lens = vb_value_lengths(arr)
    assert int(lens.sum()) == len(stream)
    pos = 0
    for v, ln in zip(arr, lens):
        piece = stream[pos : pos + int(ln)]
        assert vb_decode(piece)[0] == v
        pos += int(ln)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 62) - 1),
        min_size=1, max_size=200, unique=True,
    )
)
def test_delta_and_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)
    assert np.array_equal(decode_ids(encode_ids(arr)), arr.astype(np.uint64))
