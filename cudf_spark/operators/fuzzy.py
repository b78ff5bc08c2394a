"""SymSpell-style fuzzy string matching (Garbe's symmetric-delete
algorithm — public domain reference implementation; also the blocking
trick in Norvig's spell-corrector essay).

Finds all vocabulary pairs within edit distance 1 WITHOUT a quadratic
all-pairs scan: two strings with ed<=1 necessarily share a key in
{word} ∪ deletes1(word) (substitution at i: both delete i; insertion/
deletion: the longer word's delete equals the shorter word) — so an
equi-join on deletion keys yields a candidate superset, and a cheap
``levenshtein`` pass verifies.

100 TB shape: each token emits len+1 keys; candidates come from ONE
keyed equi-join (no cross join anywhere); the verify step touches only
candidate rows. Key skew is bounded by token length × the count of
near-identical tokens — for entity/part vocabularies this is the
linear-growth replacement for an O(V²) edit-distance matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(token: F.Column) -> F.Column:
    """token -> array of symmetric-delete keys: the token itself plus every
    single-character deletion.

    Guarded for the empty token: Spark's ``sequence(1, 0)`` DESCENDS
    ([1, 0]) instead of returning empty, which would fabricate '' keys
    that equi-join every empty-ish token pair; '' gets itself as its only
    key instead."""
    deletes = F.when(
        F.length(token) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(token)),
            lambda i: F.concat(
                F.substring(token, F.lit(1), i - 1),
                F.substring(token, i + 1, F.length(token)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(F.array(token), deletes)


def symspell_pairs(vocab: DataFrame, *, token_col: str = "t", count_col: str = "n") -> DataFrame:
    """All (token_a < token_b) vocabulary pairs with levenshtein <= 1, plus
    a ``canon`` column pointing at the higher-frequency spelling (ties
    break lexicographically) — the normalization decision a cleaning
    pipeline applies downstream.

    Input: one row per distinct token with its corpus frequency.
    """
    # Two-step projection: re-aliasing token_col->t in the same select that
    # uses it inside the explode lambda trips Spark's lateral-column-alias
    # resolution (LateralColumnAliasReference internal error).
    base = vocab.select(F.col(token_col).alias("t"), F.col(count_col).alias("n"))
    keys = base.select("t", "n", F.explode(deletion_keys(F.col("t"))).alias("k"))
    a = keys.select(F.col("t").alias("token_a"), F.col("n").alias("n_a"), "k")
    b = keys.select(F.col("t").alias("token_b"), F.col("n").alias("n_b"), "k")
    cand = (
        a.join(b, "k")
        .filter(F.col("token_a") < F.col("token_b"))
        .select("token_a", "token_b", "n_a", "n_b")
        .distinct()
    )
    canon = F.when(
        (F.col("n_b") > F.col("n_a"))
        | ((F.col("n_b") == F.col("n_a")) & (F.col("token_b") < F.col("token_a"))),
        F.col("token_b"),
    ).otherwise(F.col("token_a"))
    return (
        cand.filter(F.levenshtein("token_a", "token_b") <= 1)
        .select("token_a", "token_b", "n_a", "n_b", canon.alias("canon"))
    )
