"""Reference-exact tokenizer, in three forms.

Reference semantics (kevintsq/WebSearchEngine — identical logic copy-pasted at
create_index.cpp:49-65/201-223, main.cpp:175-212, evaluation.cpp:203-240):

- Text is UTF-8. A character is a *word character* iff:
  - ASCII (1-byte): ``isalnum`` — letters + digits only;
  - U+0080–U+07FF (2-byte UTF-8): always a word character;
  - 3-byte UTF-8: word character **unless** in U+2000–U+206F (General
    Punctuation) or U+3000–U+307F (CJK punctuation *plus the first half of
    Hiragana* — a reference quirk stated as intended in its
    readme_assignment.md:86; reproduced literally);
  - 4-byte UTF-8 (U+10000+): always a word character.
- Tokens are maximal runs of word characters.
- ASCII letters are lowercased (main.cpp:508-510); non-ASCII is NEVER
  case-folded.

Three implementations, all of the same spec:

- :func:`is_word_char` / :func:`tokenize_spec` — character-level port used as
  the property-test oracle (mirrors is_al_num, main.cpp:196-212).
- :func:`tokenize_series` / :func:`tokenize_count_series` — vectorized pandas
  versions used inside pandas UDFs (the production path).
- :data:`BOUNDARY_RE` — the boundary regex shared by both.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

# Maximal-run word-character class. After ASCII-only lowercasing, A-Z no
# longer occur; every other uppercase codepoint (e.g. À, Ａ) is a word char
# that the reference leaves unfolded.
_WORD_CLASS = "0-9a-zA-Z\u0080-\u1fff\u2070-\u2fff\u3080-\U0010ffff"
WORD_RE = re.compile(f"[{_WORD_CLASS}]+")
BOUNDARY_RE = re.compile(f"[^{_WORD_CLASS}]+")

# ASCII-only lowercase: str.translate map A-Z → a-z (never .lower(); that
# would case-fold non-ASCII, which the reference does not do).
ASCII_LOWER = {c: c + 32 for c in range(ord("A"), ord("Z") + 1)}


def is_word_char(cp: int) -> bool:
    """Character-level spec — port of is_al_num (main.cpp:196-212)."""
    if cp < 0x80:  # 1-byte: isalnum
        return (
            0x30 <= cp <= 0x39  # 0-9
            or 0x41 <= cp <= 0x5A  # A-Z
            or 0x61 <= cp <= 0x7A  # a-z
        )
    if cp <= 0x7FF:  # 2-byte: always word char
        return True
    if cp <= 0xFFFF:  # 3-byte: word char unless punctuation blocks
        if 0x2000 <= cp <= 0x206F:  # General Punctuation (main.cpp:201-203)
            return False
        if 0x3000 <= cp <= 0x307F:  # CJK punct + first-half Hiragana quirk
            return False  # (main.cpp:204-206)
        return True
    return True  # 4-byte: always word char


def tokenize_spec(text: str) -> list[str]:
    """Slow, character-at-a-time tokenizer used as the test oracle."""
    tokens: list[str] = []
    cur: list[str] = []
    for ch in text:
        if is_word_char(ord(ch)):
            o = ord(ch)
            cur.append(chr(o + 32) if 0x41 <= o <= 0x5A else ch)
        elif cur:
            tokens.append("".join(cur))
            cur = []
    if cur:
        tokens.append("".join(cur))
    return tokens


def tokenize(text: str) -> list[str]:
    """Fast single-string tokenizer (regex path, same spec)."""
    return [t.translate(ASCII_LOWER) for t in WORD_RE.findall(text)]


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized: Series[str] → Series[list[str]] (pandas UDF body)."""
    lowered = texts.fillna("").str.translate(ASCII_LOWER)
    return lowered.map(WORD_RE.findall)


def tokenize_count_series(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[list[dict(term, tf)]], pre-aggregated per doc.

    Emitting per-(doc, term) rows instead of per-token rows cuts the
    postings-build shuffle volume by ~the average in-document tf. The
    first-occurrence/tf-count logic mirrors create_index.cpp:355,378-386.
    """
    out = []
    findall = WORD_RE.findall
    for text in texts.fillna("").str.translate(ASCII_LOWER):
        counts = Counter(findall(text))
        out.append([{"term": t, "tf": c} for t, c in counts.items()])
    return pd.Series(out, index=texts.index)


def doc_length_series(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: BM25 doc length = total token count
    (create_index.cpp:376)."""
    lowered = texts.fillna("").str.translate(ASCII_LOWER)
    return lowered.map(lambda s: len(WORD_RE.findall(s))).astype(np.int64)


def clean_query(query: str) -> list[str]:
    """Reference query cleaning (main.cpp:393-431): tokenize → dedupe →
    sort lexicographically. Scoring must iterate terms in this order (it
    fixes the float summation order of per-term BM25 contributions)."""
    return sorted(set(tokenize(query)))
