"""Text-pipeline building blocks (nvtext surface, SURVEY §2.11) as pure
Column expressions: tokenize, shingles, n-grams — the inputs to dedup,
similarity and quality scoring. All codegen-friendly; no UDFs.

References: nvtext/tokenize.hpp:51 (tokenize), generate_ngrams.hpp:49,
minhash.hpp:62, jaccard.hpp:63, normalize.hpp:154.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace (nvtext normalize_spaces/characters)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def normalize_characters_nfc(col: Column) -> Column:
    """Full Unicode NFC normalization (nvtext/normalize.hpp:154
    normalize_characters) — combining sequences compose to their canonical
    precomposed forms (``e`` + U+0301 → ``é``). No Spark builtin exists, so
    this is one Arrow-batched pandas_udf over stdlib ``unicodedata`` —
    vectorized transfer, per-batch Python, no per-row overhead beyond the
    normalize call itself. Nulls pass through."""

    @F.pandas_udf("string")
    def _nfc(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)


def tokenize(col: Column) -> Column:
    """Single-space tokenization. PRECONDITION: run the input through
    :func:`normalize_text` first — it collapses whitespace runs to one
    space, after which this matches nvtext/tokenize.hpp:51 whitespace
    semantics. On RAW text a run like ``"a  b"`` yields an empty token
    (``['a', '', 'b']``); the single-space contract is kept because every
    registered query's DuckDB oracle string-splits identically, so
    changing it here would diverge from the hash gate."""
    return F.split(col, " ")


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles ('a b c' windows) — the minhash input
    (nvtext/minhash.hpp minhash_ngrams). Empty array when < k tokens.

    The token array is bound ONCE per row through a single-element-array
    ``transform`` (a lambda variable): inlining ``split()`` directly makes
    Catalyst re-split the string for every ``element_at`` — O(tokens²)
    per document, measured 15× slower at sf0.1.

    NULL input propagates as NULL (nvtext null passthrough) — a missing
    document must stay distinguishable from a short one whose shingle
    set is legitimately empty.
    """

    def shingles_of(w: Column) -> Column:
        n = F.size(w)
        windows = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + off) for off in range(k)]),
        )
        return F.when(w.isNull(), F.lit(None).cast("array<string>")).when(
            n >= k, F.array_distinct(windows)
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokenize(col)), shingles_of), 1)


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-grams — the reference minhash's native input
    (nvtext/minhash.hpp hashes width-``k`` substrings, not words). Empty
    array when the string is shorter than ``k``. Binds the string once
    (same CSE guard as :func:`word_shingles`)."""

    def grams_of(s: Column) -> Column:
        n = F.length(s)
        windows = F.transform(
            F.sequence(F.lit(1), n - (k - 1)), lambda i: F.substring(s, i, k)
        )
        return F.when(s.isNull(), F.lit(None).cast("array<string>")).when(
            n >= k, F.array_distinct(windows)
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(col), grams_of), 1)


def top_token_count(w: Column) -> Column:
    """Occurrences of the most frequent element of ``w`` as a single O(n)
    pass: sort, then fold the longest run of equal neighbours. The naive
    per-distinct re-count is O(distinct·n) *interpreted* (higher-order
    lambdas never enter codegen) — measured ~4× slower at sf0.1. Tokens
    are assumed non-empty (the empty string seeds the fold)."""

    def _run(acc: Column, x: Column) -> Column:
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    return F.aggregate(
        F.array_sort(w),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _run,
        lambda acc: acc["best"],
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set jaccard of two arrays (nvtext/jaccard.hpp:63). Two EMPTY sets
    yield NULL (0/0 is undefined) instead of raising DIVIDE_BY_ZERO under
    Spark 4's default ANSI mode — two short docs whose shingle sets are
    both empty must not abort a corpus-wide dedup job, and a NULL
    similarity fails every >= threshold filter, which is the behavior a
    no-information pair should have."""
    return F.size(F.array_intersect(a, b)) / F.nullif(
        F.size(F.array_union(a, b)), F.lit(0)
    )
