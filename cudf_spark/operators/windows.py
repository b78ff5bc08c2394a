"""Window operators beyond Spark's built-in frame/agg surface.

Covers the reference's rolling/EWM family (cpp/include/cudf/rolling.hpp;
python/cudf/cudf/core/window/rolling.py:64, ewm.py) where Spark lacks a
single primitive:

- ``rolling_agg`` — fixed windows with cudf's ``min_periods`` semantics
  (rolling.hpp:194: result is null until the window holds >= min_periods
  observations).
- ``ewma`` — exponentially weighted mean (aggregation.hpp:100 EWMA kind).
  No Spark builtin (SURVEY §7 hard-part 6): implemented as an Arrow-batched
  grouped map (`applyInPandas`). Scale note: one shuffle on the group key;
  each *group* (not partition) must fit in executor memory — for ungrouped
  or giant-group EWMA at 100 TB the scale path is a segmented-scan
  formulation (two-pass linear-recurrence over partition boundaries), which
  we'd add as a mapInPandas prefix/carry pass; grouped time series
  (per-user, per-key) are the overwhelmingly common case and shard well.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_agg(
    value: Column | str,
    agg: str,
    partition_by: list,
    order_by: list,
    preceding: int,
    following: int = 0,
    min_periods: int = 1,
) -> Column:
    """Fixed-size rolling aggregate with cudf ``min_periods`` null semantics."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )
    col = F.col(value) if isinstance(value, str) else value
    result = getattr(F, agg)(col).over(w)
    if min_periods > 1:
        result = F.when(F.count(col).over(w) >= min_periods, result)
    return result


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float,
    adjust: bool = True,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-group exponentially weighted moving average (pandas ``ewm`` semantics)."""
    import pandas as pd  # noqa: F401 (arrow batch path)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` double"]
    )

    def per_group(pdf):
        pdf = pdf.sort_values(order_cols)
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=adjust).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(per_group, schema=out_schema)


def variable_rolling_agg(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    preceding_col: str,
    following_col: str,
    value_col: str,
    row_id: str,
) -> DataFrame:
    """Variable windows from offset COLUMNS (cudf rolling.hpp:194 overload:
    per-row preceding/following window bounds).

    Spark's Window only takes literal frame bounds, so per-row bounds
    become a bounded range self-join: each row aggregates peers in the
    same key group with ``order ∈ [order − preceding, order + following]``.
    Returns (row_id, n_in_window, sum_value, min_value, max_value).

    Scale: shuffles both sides on the key columns (equi-join) with the
    range predicate as residual — never a cartesian (pinned in
    tests/test_plans.py). Cost ∝ Σ window sizes — the same work the
    reference's kernel does; AQE splits skewed keys. Per-row fan-out is
    capped by data rate × window width.
    """
    left = df.select(
        *key_cols,
        F.col(row_id).alias("__rid"),
        F.col(order_col).alias("__ord"),
        F.col(preceding_col).alias("__prec"),
        F.col(following_col).alias("__foll"),
    )
    right = df.select(
        *[F.col(k).alias(f"__r_{k}") for k in key_cols],
        F.col(order_col).alias("__r_ord"),
        F.col(value_col).alias("__peer"),
    )
    cond = (F.col("__r_ord") >= F.col("__ord") - F.col("__prec")) & (
        F.col("__r_ord") <= F.col("__ord") + F.col("__foll")
    )
    for k in key_cols:
        cond = (F.col(k) == F.col(f"__r_{k}")) & cond
    return (
        left.join(right, cond)
        .groupBy(F.col("__rid").alias(row_id))
        .agg(
            F.count("*").alias("n_in_window"),
            F.sum("__peer").alias("sum_value"),
            F.min("__peer").alias("min_value"),
            F.max("__peer").alias("max_value"),
        )
    )
