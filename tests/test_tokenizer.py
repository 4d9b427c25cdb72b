"""Tokenizer parity: vectorized regex path == character-level spec port
(reference is_al_num, main.cpp:175-212), on targeted edges + fuzzed Unicode."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from websearchengine_spark.functions.tokenizer import (
    clean_query,
    doc_length_series,
    tokenize,
    tokenize_count_series,
    tokenize_series,
    tokenize_spec,
)

EDGES = [
    "",
    "   ",
    "Hello, World!",
    "don't stop e-mail 3.14 a1b2 __x__",
    "Apple apple APPLE aPpLe",
    "café naïve привет",            # 2-byte word chars
    "你好、世界。",                   # CJK ideographs + CJK punct boundaries
    "ひらがな",                      # first-half Hiragana → all boundaries
    "むめも",                        # U+3080+ Hiragana → word chars (quirk edge)
    "カタカナ",                       # Katakana → word chars
    "x‿y a–b c—d",                  # General Punctuation boundaries
    "⁰⁹ superscripts",              # U+2070+ → word chars again
    "😀emoji😀",                     # 4-byte word chars
    "mixedＣＪＫfullwidth",           # fullwidth latin (3-byte, word, unfolded)
    " ⁯　〿぀みむ゠",  # block boundaries
    "aみb",                     # U+307F boundary inside ASCII run
    "aむb",                     # U+3080 word char inside ASCII run
]


@pytest.mark.parametrize("text", EDGES)
def test_edges_match_spec(text):
    assert tokenize(text) == tokenize_spec(text)


def test_fuzz_against_spec():
    rng = random.Random(7)
    for _ in range(300):
        n = rng.randint(0, 200)
        cps = []
        for _ in range(n):
            r = rng.random()
            if r < 0.4:
                cps.append(rng.randint(0x20, 0x7E))
            elif r < 0.6:
                cps.append(rng.randint(0x80, 0x7FF))
            elif r < 0.85:
                cps.append(rng.randint(0x1F00, 0x3100))  # straddles the quirk blocks
            else:
                cp = rng.randint(0x800, 0x10FFFF)
                if 0xD800 <= cp <= 0xDFFF:
                    cp = 0x4E00
                cps.append(cp)
        s = "".join(map(chr, cps))
        assert tokenize(s) == tokenize_spec(s), repr(s)


def test_ascii_only_lowercase():
    assert tokenize("ABC École СТРАНА Ｆｕｌｌ") == ["abc", "École", "СТРАНА", "Ｆｕｌｌ"]


def test_series_paths_agree():
    s = pd.Series(EDGES, dtype=object)
    assert list(tokenize_series(s)) == [tokenize_spec(t) for t in EDGES]
    counted = tokenize_count_series(s)
    for lst, text in zip(counted, EDGES):
        toks = tokenize_spec(text)
        assert sum(d["tf"] for d in lst) == len(toks)
        assert {d["term"] for d in lst} == set(toks)
    assert list(doc_length_series(s)) == [len(tokenize_spec(t)) for t in EDGES]


def test_clean_query():
    assert clean_query("  Apple apple  PIE banana ") == ["apple", "banana", "pie"]
    assert clean_query("zebra apple") == ["apple", "zebra"]
    assert clean_query("!!! 。、") == []
    assert clean_query("") == []


def _runs_sig(terms, ns, tfs, ids_vb, tfs_vb, dls_vb):
    return sorted(
        (t, int(a), int(b), bytes(c), bytes(d), bytes(e))
        for t, a, b, c, d, e in zip(terms, ns, tfs, ids_vb, tfs_vb, dls_vb)
    )


def test_arrow_runs_bit_identical_to_pandas_twin():
    """The Arrow-native build kernel (RE2 split + ascii_lower +
    dictionary_encode) must emit byte-identical runs and doc lengths to the
    pandas/factorize twin on edges + fuzzed Unicode."""
    import numpy as np
    import pyarrow as pa

    from websearchengine_spark.functions.tokenizer import (
        tokenize_runs_arrays,
        tokenize_runs_frame,
    )

    rng = random.Random(11)
    fuzz = [
        "".join(chr(rng.choice([rng.randrange(32, 128), rng.randrange(0x80, 0x800),
                                rng.randrange(0x2000, 0x2080), rng.randrange(0x3000, 0x3100),
                                rng.randrange(0x10000, 0x10100)]))
                for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    texts = EDGES + [None, ""] + fuzz + ["the data " * 30, "spark SPARK Spark"]
    doc_ids = np.arange(1000, 1000 + len(texts), dtype=np.int64)

    terms, ns, tfs, iv, tv, dv, lens = tokenize_runs_arrays(
        pa.array(texts, type=pa.string()), doc_ids
    )
    old = tokenize_runs_frame(pd.DataFrame({"doc_id": doc_ids, "text": texts}), [])
    runs = old[old["term"].notna()]
    assert _runs_sig(
        terms.to_pylist(), ns, tfs, iv.to_pylist(), tv.to_pylist(), dv.to_pylist()
    ) == _runs_sig(
        runs["term"], runs["n"], runs["tf_sum"],
        runs["ids_vb"], runs["tfs_vb"], runs["dls_vb"],
    )
    assert list(lens) == list(old[old["term"].isna()]["dl"].astype(int))


def test_arrow_runs_empty_and_tokenless():
    import numpy as np
    import pyarrow as pa

    from websearchengine_spark.functions.tokenizer import tokenize_runs_arrays

    terms, ns, tfs, iv, tv, dv, lens = tokenize_runs_arrays(
        pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    )
    assert len(terms) == 0 and list(lens) == []
    terms, ns, tfs, iv, tv, dv, lens = tokenize_runs_arrays(
        pa.array(["", "...", None], type=pa.string()), np.arange(3, dtype=np.int64)
    )
    assert len(terms) == 0 and list(lens) == [0, 0, 0]
