"""cumsum_two_level: the distributed global running sum that replaced the
single-partition window in agg_lorenz_curve_binned (VERDICT r07 item 2).

Pins (a) value equality against the naive global-ordered window on a
histogram-shaped input, (b) graceful degeneracy (constant key, tiny
input, empty input), and (c) the scale property itself — no
``Exchange SinglePartition`` feeding the Window in the produced plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cudf_spark.operators.windows import cumsum_two_level


def _naive(df, order_col, value_col):
    # RANGE frame: ties get the post-group total — the helper's contract
    w = Window.orderBy(order_col).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return {
        r[order_col]: r.cum
        for r in df.withColumn("cum", F.sum(value_col).over(w)).collect()
    }


def test_matches_naive_global_window(spark):
    # deterministic pseudo-random histogram: 500 distinct keys, skewed
    # counts, keys deliberately NOT contiguous
    hist = spark.range(500).select(
        (F.col("id") * 7919 % 104729).alias("k"),
        (F.col("id") % 13 + 1).cast("bigint").alias("c"),
    )
    got = {
        r.k: r.cum
        for r in cumsum_two_level(hist, "k", "c", "cum", num_buckets=8).collect()
    }
    assert got == _naive(hist, "k", "c")


def test_degenerate_inputs(spark):
    # constant order key: everything lands in one bucket; the running sum
    # at a tie is the post-tie total on both forms
    const = spark.range(10).select(F.lit(5).alias("k"), F.lit(2).alias("c"))
    rows = cumsum_two_level(const, "k", "c", "cum").collect()
    assert {r.cum for r in rows} == {20}

    # fewer rows than buckets
    tiny = spark.createDataFrame([(1, 10), (3, 5), (9, 1)], "k int, c int")
    got = {r.k: r.cum for r in cumsum_two_level(tiny, "k", "c", "cum").collect()}
    assert got == {1: 10, 3: 15, 9: 16}

    # empty input: no rows, no crash (ANSI mode included)
    empty = tiny.filter(F.col("k") < 0)
    assert cumsum_two_level(empty, "k", "c", "cum").count() == 0


def test_negative_and_zero_values(spark):
    signed = spark.createDataFrame(
        [(-5, -3), (0, 0), (2, 7), (8, -1)], "k int, c int"
    )
    got = {r.k: r.cum for r in cumsum_two_level(signed, "k", "c", "cum").collect()}
    assert got == {-5: -3, 0: -3, 2: 4, 8: 3}


def test_no_single_partition_window(spark):
    """The point of the helper: the cumsum window must run keyed on the
    bucket column (hash exchange), never behind Exchange SinglePartition."""
    from cudf_spark.plans.audit import scale_audit

    hist = spark.range(2000).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("c")
    )
    out = cumsum_two_level(hist, "k", "c", "cum", num_buckets=8)
    assert scale_audit(out) == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bucket" in plan  # the keyed window actually keys on it


def test_mixed_duplicate_order_keys(spark):
    """Ties in order_col among OTHER keys (not the all-constant case):
    every row of a tie group gets the post-group total, identical to the
    naive RANGE window, and ties can never straddle a bucket boundary
    (bucketing is by value comparison, so equal values share a bucket)."""
    rows = [(1, 2), (1, 3), (5, 1), (5, 4), (5, 6), (9, 10), (12, -2), (12, 2)]
    df = spark.createDataFrame(rows, "k int, c int")
    got = sorted(
        (r.k, r.cum)
        for r in cumsum_two_level(df, "k", "c", "cum", num_buckets=4).collect()
    )
    # post-group totals: k=1 -> 5, k=5 -> 16, k=9 -> 26, k=12 -> 26
    assert got == [(1, 5), (1, 5), (5, 16), (5, 16), (5, 16), (9, 26), (12, 26), (12, 26)]
    naive = _naive(df.dropDuplicates(["k", "c"]), "k", "c")  # spot vs window form
    assert naive[9] == 26 and naive[1] == 5
