"""Deterministic synthetic transcripts / queries / qrels fixtures.

Implements FIXTURES.md: the corpus is an (Iceberg-shaped) table
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``; one turn = one document. Content exercises the
reference's tokenizer/query semantics (SURVEY.md §1.3–§1.4): Zipf vocabulary
with deliberate hot terms (negative IDF + skew salting), mixed-case ASCII,
punctuation edges, multilingual boundary probes (General Punctuation,
CJK punctuation, first-half Hiragana vs Katakana, emoji), high-tf repeats,
zero-token docs, and identical texts across conversations (score-tie →
docID-asc tie-break, reference main.cpp:626-630).

Everything is seeded — per-turn ``text`` is byte-stable across regenerations.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "search", "edit", None]

# Hot terms: df ≈ 30-60% of docs → f_t > N/2 possible → negative IDF
# (reference main.cpp:448 has no IDF floor).
HOT_TERMS = ["the", "data", "spark", "agent"]

MULTILINGUAL = [
    "café",          # 2-byte chars, word
    "naïve",
    "привет",        # Cyrillic, word
    "你好",           # CJK ideographs, word
    "世界",
    "カタカナ",        # Katakana U+30A0+, word chars
    "ムテスト",        # Katakana (U+30E0 …)
    "😀😀",           # 4-byte emoji, word chars
    "ひらがな",        # first-half Hiragana U+3040-307F: ALL boundary chars
    "x‿y",           # U+203F undertie (General Punctuation): boundary
    "a–b",           # U+2013 en dash: boundary
    "甲、乙。丙",      # CJK punct U+3001/U+3002: boundaries
]

PUNCT_EDGES = ["don't", "e-mail", "3.14", "a1b2", "__x__", "foo_bar", "C++", "(nested)"]
MIXED_CASE = ["Apple", "apple", "APPLE", "aPpLe", "Banana", "BANANA"]

DUP_TEXT = "identical duplicated turn text for tie breaking tests"


@dataclass
class Fixture:
    transcripts: pd.DataFrame
    queries: pd.DataFrame
    qrels: pd.DataFrame
    # docID ←→ (conv_id, turn_idx) under the stable global ordering
    doc_keys: list[tuple[str, int]] = field(default_factory=list)


def _vocab(n_terms: int) -> list[str]:
    return [f"term{i:05d}" for i in range(n_terms)]


def generate_transcripts(
    n_convs: int = 200, seed: int = 42, n_terms: int = 5000
) -> pd.DataFrame:
    rng = random.Random(seed)
    np_rng = np.random.RandomState(seed)
    vocab = _vocab(n_terms)
    # Zipf ranks for sampling the long tail
    zipf_weights = 1.0 / np.arange(1, n_terms + 1) ** 1.1
    zipf_weights /= zipf_weights.sum()

    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = []
    uniq = 0
    for ci in range(n_convs):
        conv_id = f"conv{ci:06d}"
        n_turns = rng.randint(1, 40)
        for ti in range(n_turns):
            r = rng.random()
            if r < 0.02:
                text = ""  # zero-token doc (l_d = 0)
            elif r < 0.04:
                text = "  \t ,,, !!! 。、 "  # punctuation-only → zero tokens
            elif r < 0.10:
                text = DUP_TEXT  # identical across convs → score ties
            else:
                n_words = rng.randint(3, 120)
                words = [
                    vocab[i]
                    for i in np_rng.choice(n_terms, size=n_words, p=zipf_weights)
                ]
                # hot terms: each appears in ~30-60% of docs
                for h, p in zip(HOT_TERMS, (0.6, 0.5, 0.4, 0.3)):
                    if rng.random() < p:
                        words.insert(rng.randrange(len(words) + 1), h)
                # high-tf repeats for TF saturation
                if rng.random() < 0.15:
                    words.extend([rng.choice(words)] * rng.randint(5, 30))
                if rng.random() < 0.25:
                    words.append(rng.choice(MIXED_CASE))
                if rng.random() < 0.25:
                    words.append(rng.choice(PUNCT_EDGES))
                if rng.random() < 0.25:
                    words.append(rng.choice(MULTILINGUAL))
                if rng.random() < 0.10:
                    uniq += 1
                    words.append(f"uniqterm{uniq:06d}")  # long tail of df=1
                text = " ".join(words)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": ROLES[ti % 3],
                    "text": text,
                    "tool": rng.choice(TOOLS),
                    "ts": base_ts + timedelta(seconds=ci * 1000 + ti),
                }
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return df


def generate_queries_qrels(
    transcripts: pd.DataFrame, seed: int = 43, n_random: int = 60
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build the reference query set + planted qrels.

    Hand-written queries cover every category in FIXTURES.md §2; random
    queries sample terms from real docs so conjunctive hits exist. For each
    query we designate one turn containing all its terms as the relevant doc
    (reference qrels format: one relevant doc per query,
    evaluation.cpp:682-694).
    """
    rng = random.Random(seed)
    # stable global ordering (conv_id ASC, turn_idx ASC) → docID
    ordered = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    from websearchengine_spark.functions.tokenizer import tokenize

    doc_tokens = [set(tokenize(t)) for t in ordered["text"]]

    fixed = [
        "term00000",                         # single hot-ish term
        "term00001 term00002",               # multi-term conjunctive
        "apple apple pie",                   # duplicate terms
        "zebra apple",                       # unsorted input (z before a)
        "APPLE Banana",                      # mixed case
        "   term00003    term00001   ",      # extra spaces
        "term00000 qqqqoovqqqq",             # OOV + in-vocab (OOV skipped)
        "qqqqoovqqqq zzzznosuchzzzz",        # all OOV → zero results
        "the data",                          # hot-term only (negative IDF)
        "the",                               # single hot term
        "你好 世界",                          # CJK query
        "café term00001",                    # mixed script
        "!!! 。、 ...",                       # punctuation only → empty
        "",                                  # empty query
        "don't e-mail",                      # ASCII punctuation edges
        "identical duplicated turn",         # hits the tie-break docs
        "カタカナ",                            # Katakana
        "term00004 term00005 term00006",     # 3-term conjunctive
        "uniqterm000001",                    # df=1 tail term
        "3 14",                              # digits
    ]
    queries = list(fixed)
    # random conjunctive queries sampled from real docs (guaranteed hits)
    candidates = [i for i, toks in enumerate(doc_tokens) if len(toks) >= 4]
    for _ in range(n_random):
        di = rng.choice(candidates)
        k = rng.randint(1, 4)
        terms = rng.sample(sorted(doc_tokens[di]), min(k, len(doc_tokens[di])))
        if rng.random() < 0.3:  # shuffle case on some ASCII terms
            terms = [t.upper() if rng.random() < 0.5 and t.isascii() else t for t in terms]
        queries.append(" ".join(terms))

    qdf = pd.DataFrame({"query_id": range(len(queries)), "query": queries})

    # qrels: first doc (lowest docID) containing all cleaned terms of the query
    from websearchengine_spark.functions.tokenizer import clean_query

    qrels_rows = []
    for qid, q in zip(qdf["query_id"], qdf["query"]):
        terms = clean_query(q)
        if not terms:
            continue
        for di, toks in enumerate(doc_tokens):
            if all(t in toks for t in terms):
                qrels_rows.append({"query_id": qid, "doc_id": di})
                break
    qrels = pd.DataFrame(qrels_rows, columns=["query_id", "doc_id"])
    qrels["doc_id"] = qrels["doc_id"].astype(np.int64)
    return qdf, qrels


def generate_fixture(n_convs: int = 200, seed: int = 42) -> Fixture:
    t = generate_transcripts(n_convs=n_convs, seed=seed)
    q, r = generate_queries_qrels(t, seed=seed + 1)
    ordered = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    keys = list(zip(ordered["conv_id"], ordered["turn_idx"]))
    return Fixture(transcripts=t, queries=q, qrels=r, doc_keys=keys)


def write_fixture(fx: Fixture, out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    fx.transcripts.to_parquet(f"{out_dir}/transcripts.parquet", index=False)
    fx.queries.to_parquet(f"{out_dir}/queries.parquet", index=False)
    fx.qrels.to_parquet(f"{out_dir}/qrels.parquet", index=False)
