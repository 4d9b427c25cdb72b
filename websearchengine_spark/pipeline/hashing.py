"""Cross-engine deterministic hashing + tokenization primitives.

The dedup/similarity family needs hash functions that produce *identical
integers* in Spark (JVM) and DuckDB (the correctness oracle). Neither
engine's native hash matches the other (Spark xxhash64 vs DuckDB's own), so
everything derives from md5, which both implement identically:

    h60(s) = int(md5(s)[:15 hex digits], 16)        # 60 bits, fits int64

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)::long``
DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

md5 is JVM-side in Spark (no Python), vectorized in DuckDB. 60 bits keeps
every value positive in a signed int64 (no overflow differences). This is a
*content* hash for dedup — collision probability at 10^12 items over 60 bits
is non-trivial for global uniqueness but irrelevant for per-band LSH
bucketing, where collisions only add verify-stage candidates.

Tokenization here is the whitespace/alnum split (the pipeline operators'
model), kept deliberately SQL-expressible; the search core's full
reference-exact Unicode tokenizer lives in functions/tokenizer.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK40 = (1 << 40) - 1  # for overflow-safe SUM() fingerprints


def h60(col: Column | str) -> Column:
    """60-bit md5-derived hash, identical to SQL_H60 in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_h60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def tokens(col: Column | str) -> Column:
    """Whitespace/alnum tokens, JVM-side: lowercase → split on non-[a-z0-9]
    runs → drop empties. Matches SQL_TOKENS exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )


def shingles(toks: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-token shingles as space-joined strings; [] when fewer than k tokens.
    Matches sql_shingles exactly.

    Implementation note: zip-of-shifted-slices, NOT
    ``transform(sequence, i -> element_at(toks, i+j))`` — Catalyst
    re-evaluates the ``toks`` subexpression for every element_at inside a
    lambda (no CSE across lambda boundaries), which made the old form ~13×
    slower. Pass ``toks`` as a *projected column reference* (select it into
    a column first), or the k slice references still recompute it k times."""
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, 1 << 30) for j in range(k)])
    cut = F.slice(zipped, 1, F.greatest(F.size(toks) - (k - 1), F.lit(0)))
    joined = F.transform(
        cut, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return F.array_distinct(joined) if distinct else joined


def sql_shingles(l: str, k: int = 3, distinct: bool = True) -> str:
    parts = " || ' ' || ".join(f"{l}[i+{j}]" if j else f"{l}[i]" for j in range(k))
    comp = f"[{parts} FOR i IN range(1, greatest(len({l}) - {k - 2}, 1))]"
    return f"list_distinct({comp})" if distinct else comp
