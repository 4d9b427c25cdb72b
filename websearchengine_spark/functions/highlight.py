"""Query-term highlight (reference P14, index.html:93-104 + :175).

The reference highlights snippets in the BROWSER: ``emphasizeWordsWithNonAlnum``
splits the snippet on runs of non-letters (``text.split(/(\\P{L}+)/u)`` —
capture kept, so separators stay in the token stream and empty edge tokens
appear when the text begins/ends with a non-letter), then wraps a letter
token in ``<b>…</b>`` when its ``toLowerCase()`` is in the query-word list.
The word list (index.html:175) is ``query.toLowerCase().split(/\\P{L}/u)`` —
a SINGLE-character split, so consecutive non-letters (or a leading/trailing
one, or any digit: ``"v2"`` → ``["v", ""]``) put the EMPTY string in the
list, and the empty edge tokens of the snippet then render as ``<b></b>``.
Ported literally, quirks included (same policy as the P13 byte-window
snippets) — this is a display-layer function, not a scan/score path.

"Letter" is the Unicode property ``L`` per code point (JS ``\\p{L}`` with
the ``u`` flag == ``unicodedata.category(ch)[0] == "L"``); lowercasing is
full Unicode default case conversion (JS ``toLowerCase`` == ``str.lower``
for every code point the two standards share, including İ → i + U+0307).

Batch path: :func:`emphasized_snippet_col` wraps the scalar into an
Arrow-batched pandas UDF for exporting a highlighted snippet column — the
per-row Python here is inherent (Unicode-property splitting has no JVM
column twin) and sits strictly in the presentation tail (k rows per query,
never the corpus).
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, List


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch)[0] == "L"


def split_like_js_capture(text: str) -> List[str]:
    """``text.split(/(\\P{L}+)/u)`` — alternating letter-run / non-letter-run
    tokens, separators kept, with the empty edge tokens JS emits when the
    text starts or ends with a separator (and ``[""]`` for empty input)."""
    tokens: List[str] = []
    run: List[str] = []
    run_is_letter = True  # JS yields a leading "" before a separator-first text
    for ch in text:
        is_l = _is_letter(ch)
        if is_l != run_is_letter:
            tokens.append("".join(run))
            run = []
            run_is_letter = is_l
        run.append(ch)
    tokens.append("".join(run))
    if not run_is_letter:  # trailing separator → JS appends the empty tail
        tokens.append("")
    return tokens


def query_words(query: str) -> List[str]:
    """``query.toLowerCase().split(/\\P{L}/u)`` (index.html:175) — lowercase
    FIRST, then split on every single non-letter, keeping empty strings."""
    lowered = query.lower()
    words: List[str] = []
    cur: List[str] = []
    for ch in lowered:
        if _is_letter(ch):
            cur.append(ch)
        else:
            words.append("".join(cur))
            cur = []
    words.append("".join(cur))
    return words


def emphasize_words(text: str, words_to_emphasize: Iterable[str]) -> str:
    """``emphasizeWordsWithNonAlnum`` (index.html:93-104): bold every letter
    token whose lowercase is in the word list. The membership probe uses the
    LOWERCASED words (JS lowercases the list before comparing) and the empty
    token counts as a letter token (``!/\\P{L}+/u.test("")`` is true)."""
    lower_words = {w.lower() for w in words_to_emphasize}
    out: List[str] = []
    for tok in split_like_js_capture(text):
        # Constructed tokens are pure letter-runs or pure non-letter-runs;
        # the JS containment test therefore equals "is this a letter run".
        if (tok == "" or _is_letter(tok[0])) and tok.lower() in lower_words:
            out.append(f"<b>{tok}</b>")
        else:
            out.append(tok)
    return "".join(out)


def highlight_snippet(snippet: str, query: str) -> str:
    """The full browser pipeline for one result (index.html:175):
    ``emphasizeWordsWithNonAlnum(result.snippet, query.toLowerCase()
    .split(/\\P{L}/u))``. The surrounding ``...`` ellipses are markup the
    page adds outside the function — not included here."""
    return emphasize_words(snippet, query_words(query))


def emphasized_snippet_col(snippet_col, query_col):
    """Arrow-batched column twin: highlight a snippet column against a
    per-row query column (both string). Presentation-tail only — apply to
    top-k result frames, never corpus-wide."""
    import pandas as pd  # local: keep module import-light for serving
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    def _hl(snippets, queries):
        return pd.Series(
            [
                highlight_snippet(s if s is not None else "", q or "")
                for s, q in zip(snippets, queries)
            ],
            index=snippets.index,
        )

    # real annotation objects: the module-level `from __future__ import
    # annotations` would leave strings pyspark's typehint check can't resolve
    _hl.__annotations__ = {
        "snippets": pd.Series,
        "queries": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(_hl, StringType())(snippet_col, query_col)
