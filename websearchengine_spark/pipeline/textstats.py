"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure JVM-side column expressions (whole-stage codegen; zero Python in
the hot path) over the ``documents`` table. Each has an exact DuckDB oracle
in plans/pipeline_gate.py. At 100 TB these are embarrassingly parallel
narrow maps — no shuffle at all except the optional aggregations callers add.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.pipeline.hashing import MASK40, h60, shingles, tokens

# small multilingual stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting: whitespace tokens, distinct tokens, chars,
    average token length. (doc_id, n_tokens, n_unique, n_chars, avg_token_len)."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality score in [0,1] from length, lexical
    diversity, and stopword ratio (natural text sits near a stopword ratio
    of ~0.4; too low = keyword spam, too high = filler).

    score = 0.3·min(n_tokens/100, 1) + 0.4·unique_ratio
          + 0.3·(1 − |stop_ratio − 0.4|)
    """
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stops = F.size(
        F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS))
    ).cast("double")
    unique_ratio = F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stops / n).otherwise(F.lit(0.0))
    score = (
        0.3 * F.least(n / 100.0, F.lit(1.0))
        + 0.4 * unique_ratio
        + 0.3 * (1.0 - F.abs(stop_ratio - 0.4))
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(unique_ratio, 6).alias("unique_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(F.when(n > 0, score).otherwise(F.lit(0.0)), 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit-ratio language ID (deterministic argmax with a fixed
    tie-break order de < en < fr; 'und' = undetermined when no list hits).
    (doc_id, lang_pred, lang_confidence)."""
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("double")
    ratios = {
        lang: F.when(
            n > 0,
            F.size(F.filter(toks, lambda t: t.isin(*sw))).cast("double") / n,
        ).otherwise(F.lit(0.0))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*ratios.values())
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):  # fixed tie-break: first max wins
        pred = pred.when(ratios[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(best, 6).alias("lang_confidence"),
    )


def fingerprint(docs: DataFrame, k: int = 3) -> DataFrame:
    """Content fingerprint from k-token shingle hashes (the rolling-hash
    document signature): min-hash + order-independent 40-bit-masked sum —
    two independent 64-bit-safe digests. Docs with < k tokens get (-1, 0).
    (doc_id, n_shingles, fp_min, fp_sum)."""
    projected = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", shingles(F.col("toks"), k=k, distinct=True).alias("sh"))
    hashes = F.transform(F.col("sh"), lambda s: h60(s))
    return projected.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_shingles"),
        F.coalesce(F.array_min(hashes), F.lit(-1)).cast("long").alias("fp_min"),
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + h.bitwiseAND(F.lit(MASK40)),
        ).alias("fp_sum"),
    )


def rep_stats(docs: DataFrame) -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4 rule family):
    duplicate-line fraction, longest line, and most-frequent-token fraction.
    (doc_id, n_lines, dup_line_frac, max_line_len, top_token_frac).

    All narrow JVM column expressions — zero shuffle at any corpus size.
    The top-token count folds over the SORTED token array with a
    (prev, run, best) struct accumulator (max run in a sorted array = max
    frequency), instead of the explode→groupBy→max plan that would shuffle
    every token; the DuckDB oracle uses unnest+GROUP BY — mechanically
    different, numerically identical, which is exactly what the gate checks.
    Lines are newline splits with empties dropped (C4 counts non-empty
    lines); both engines compare raw strings, no trimming."""
    lines = F.filter(F.split(F.col("text"), "\n"), lambda x: x != "")
    n_lines = F.size(lines)
    # project toks/sorted into columns first: HOF lambdas re-evaluate outer
    # subexpressions per element (no CSE across the lambda boundary)
    projected = docs.select(
        "doc_id",
        lines.alias("ls"),
        F.array_sort(tokens(F.col("text"))).alias("s"),
    )
    zero = F.lit(0).cast("long")
    fold = F.aggregate(
        F.col("s"),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            ).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
    )
    nl = F.size(F.col("ls"))
    nt = F.size(F.col("s")).cast("double")
    return projected.select(
        "doc_id",
        nl.cast("long").alias("n_lines"),
        F.round(
            F.when(
                nl > 0,
                1.0 - F.size(F.array_distinct(F.col("ls"))).cast("double") / nl,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
        F.coalesce(
            F.array_max(F.transform(F.col("ls"), F.length)), F.lit(0)
        ).cast("long").alias("max_line_len"),
        F.round(
            F.when(nt > 0, fold["best"].cast("double") / nt).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("top_token_frac"),
    )


BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"
# ^ subword-style pre-tokenization over lowered text: letter runs, digit
#   runs, and single non-alnum marks — the GPT-2-style pre-tokenizer shape
#   minus lookaheads (RE2, the oracle's engine, has none). Disjoint
#   branches, so alternation-order semantics cannot differ across engines.


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting (the training-data cost estimator): counts of
    pre-tokenizer pieces and distinct pieces under :data:`BPE_ISH_PATTERN`.
    (doc_id, n_pieces, n_unique_pieces). JVM regexp_extract_all — zero
    Python, narrow map."""
    pieces = F.expr(
        f"regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}', 0)"
    )
    return docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_unique_pieces"),
    )


EMAIL_PATTERN = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
LONGNUM_PATTERN = "[0-9]{9,}"
# ^ PII patterns chosen for exact Java-regex ↔ RE2 parity: character
#   classes + bounded repetition only — no \d/\b shorthands, lookarounds,
#   or backrefs (absent or different across the two engines).


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction — the C4-style cleaning step a pretraining pipeline
    runs before anything else: emails → ``<EMAIL>``, long digit runs (≥9,
    the id/phone shape) → ``<NUM>``, applied in that fixed order so the
    count of digit runs is measured on the email-scrubbed text.

    → (doc_id, n_emails, n_longnums, text_clean). Pure JVM column
    expressions (regexp_extract_all / regexp_replace), narrow map, zero
    Python and zero shuffle at any scale."""
    emails = F.expr(f"regexp_extract_all(text, '{EMAIL_PATTERN}', 0)")
    no_email = F.regexp_replace("text", EMAIL_PATTERN, "<EMAIL>")
    longnums = F.regexp_extract_all(no_email, F.lit(LONGNUM_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(emails).cast("long").alias("n_emails"),
        F.size(longnums).cast("long").alias("n_longnums"),
        F.regexp_replace(no_email, LONGNUM_PATTERN, "<NUM>").alias("text_clean"),
    )
