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
