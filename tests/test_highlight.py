"""Query-term highlight (P14) — parity with the reference browser JS.

Two layers:
- hand-pinned cases encoding the quirks (single-char query split → empty
  string in the word list; empty edge tokens rendered as ``<b></b>``;
  digits are separators; Unicode letters and full-Unicode lowercasing);
- a seeded fuzz that executes the REFERENCE's own ``emphasizeWordsWithNonAlnum``
  (extracted from /root/reference/index.html at runtime, never vendored)
  in node and compares byte-for-byte — the same twin-pinning strategy as
  the tokenizer kernels. Skipped when node or the reference is absent.
"""

from __future__ import annotations

import json
import os
import random
import re
import shutil
import subprocess

import pytest

from websearchengine_spark.functions.highlight import (
    emphasize_words,
    highlight_snippet,
    query_words,
    split_like_js_capture,
)

REF_HTML = "/root/reference/index.html"


def test_query_words_single_char_split_keeps_empties():
    # index.html:175 — split(/\P{L}/u) is per-character: digits and doubled
    # punctuation inject empty strings, leading/trailing separators too.
    assert query_words("the data") == ["the", "data"]
    assert query_words("a!b") == ["a", "b"]
    assert query_words("a!!b") == ["a", "", "b"]
    assert query_words("v2") == ["v", ""]
    assert query_words("!x") == ["", "x"]
    assert query_words("x!") == ["x", ""]
    assert query_words("") == [""]
    assert query_words("The DATA") == ["the", "data"]


def test_split_like_js_capture_edges():
    assert split_like_js_capture("x!y") == ["x", "!", "y"]
    assert split_like_js_capture("!x") == ["", "!", "x"]
    assert split_like_js_capture("x!") == ["x", "!", ""]
    assert split_like_js_capture("") == [""]
    assert split_like_js_capture("ab cd") == ["ab", " ", "cd"]
    # digits are non-letters: they are separators, kept in the stream
    assert split_like_js_capture("v2x") == ["v", "2", "x"]


def test_basic_highlight_case_insensitive():
    assert (
        highlight_snippet("The data is Here", "the data")
        == "<b>The</b> <b>data</b> is Here"
    )
    # substrings never match — whole letter-runs only
    assert highlight_snippet("database", "data") == "database"


def test_empty_word_quirk_bolds_empty_edge_tokens():
    # query "v2" → words ["v", ""]; text "!x" has an empty leading token
    # which lowercases to "" and therefore gets wrapped: "<b></b>!x"
    assert highlight_snippet("!x", "v2") == "<b></b>!x"
    assert highlight_snippet("x!", "a!!b") == "x!<b></b>"
    # without an empty word, edges stay unwrapped
    assert highlight_snippet("!x", "ab") == "!x"


def test_unicode_letters_and_lowercase():
    assert highlight_snippet("Naïve approach", "naïve") == "<b>Naïve</b> approach"
    # CJK is Unicode letter too; U+3000 ideographic space separates
    assert highlight_snippet("漢字　data", "漢字") == "<b>漢字</b>　data"
    # İ (U+0130) lowercases to i + U+0307 (combining dot, category Mn — NOT
    # a letter) in BOTH JS and Python: the query split cuts at U+0307, so
    # the token's two-codepoint lowercase never appears in the word list
    # and İ is NOT emphasized even by a literal "i̇" query — faithful quirk
    assert highlight_snippet("İ", "i̇") == "İ"
    assert query_words("i̇") == ["i", ""]


def _extract_reference_js() -> str:
    with open(REF_HTML, encoding="utf-8") as f:
        html = f.read()
    m = re.search(
        r"function emphasizeWordsWithNonAlnum.*?\n    \}", html, re.DOTALL
    )
    assert m, "reference highlight function not found"
    return m.group(0)


@pytest.mark.skipif(
    shutil.which("node") is None or not os.path.exists(REF_HTML),
    reason="needs node and the reference checkout",
)
def test_fuzz_against_reference_js():
    fn = _extract_reference_js()
    harness = (
        fn
        + """
const lines = require('fs').readFileSync(0, 'utf-8').split('\\n').filter(Boolean);
for (const line of lines) {
  const {text, query} = JSON.parse(line);
  const out = emphasizeWordsWithNonAlnum(text, query.toLowerCase().split(/\\P{L}/u));
  console.log(JSON.stringify(out));
}
"""
    )
    rng = random.Random(20260819)
    alphabet = "ab AB.!!3é漢字ß İıΣσ　\t<>&-_'\"xyz  09"
    cases = []
    for _ in range(400):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        query = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        cases.append({"text": text, "query": query})
    # make sure whole-word hits actually occur in the fuzz stream
    cases += [
        {"text": "ab xyz ab", "query": "ab"},
        {"text": "漢字 data 漢字", "query": "漢字 ab"},
        {"text": "!ab!", "query": "v2"},
    ]
    feed = "\n".join(json.dumps(c, ensure_ascii=False) for c in cases)
    res = subprocess.run(
        ["node", "-e", harness],
        input=feed.encode("utf-8"),
        capture_output=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr.decode()
    got_js = [json.loads(l) for l in res.stdout.decode("utf-8").splitlines()]
    assert len(got_js) == len(cases)
    for case, expect in zip(cases, got_js):
        mine = highlight_snippet(case["text"], case["query"])
        assert mine == expect, case


def test_emphasize_words_lowercases_word_list():
    # JS lowercases the provided list before membership (index.html:95)
    assert emphasize_words("data", ["DATA"]) == "<b>data</b>"


def test_emphasized_snippet_col(spark):
    from websearchengine_spark.functions.highlight import emphasized_snippet_col

    df = spark.createDataFrame(
        [("The data is Here", "the data"), ("!x", "v2"), (None, "q")],
        "snippet string, query string",
    )
    rows = {
        (r["snippet"],): r["hl"]
        for r in df.select(
            "snippet",
            emphasized_snippet_col(df.snippet, df.query).alias("hl"),
        ).collect()
    }
    assert rows[("The data is Here",)] == "<b>The</b> <b>data</b> is Here"
    assert rows[("!x",)] == "<b></b>!x"
    assert rows[(None,)] == ""
