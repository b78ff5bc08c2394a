"""Quantile interpolation modes beyond LINEAR — cudf exposes five
(cudf/quantiles.hpp:50: LINEAR, LOWER, HIGHER, MIDPOINT, NEAREST);
``F.percentile`` only does linear, so the other four are expression shims
over a per-group sorted array.

Both engines compute the SAME index arithmetic over the SAME sorted list
(pos = q·(n−1); lo/hi/round half-up), so parity is exact — no reliance on
DuckDB's quantile_disc mode choice.

Scale note: exact non-linear quantiles inherently need the group's values
in one place (same as the reference's sort-based quantile kernel). The
grouped collect_list here shuffles once on the group key; group sizes are
bounded by the key's cardinality share. For unbounded groups the approx
path is ``percentile_approx``/t-digest (agg_approx_sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register

_Q = 0.37  # deliberately lands between indices for every mode


def _modes(sorted_arr: Column, q: float) -> dict[str, Column]:
    n = F.size(sorted_arr)
    pos = F.lit(q) * (n.cast("double") - 1)
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    near = F.floor(pos + F.lit(0.5)).cast("int")  # explicit half-up in both engines
    a_lo = F.element_at(sorted_arr, lo + 1).cast("double")
    a_hi = F.element_at(sorted_arr, hi + 1).cast("double")
    return {
        "q_linear": a_lo + (a_hi - a_lo) * (pos - lo.cast("double")),
        "q_lower": a_lo,
        "q_higher": a_hi,
        "q_midpoint": (a_lo + a_hi) / 2,
        "q_nearest": F.element_at(sorted_arr, near + 1).cast("double"),
    }


@register(
    "agg_quantile_modes",
    oracle=f"""
    WITH g AS (
        SELECT l_returnflag, list_sort(list(l_quantity)) AS a,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag),
    ix AS (
        SELECT l_returnflag, a,
               {_Q} * (n - 1)                          AS pos,
               CAST(floor({_Q} * (n - 1)) AS INT)       AS lo,
               CAST(ceil({_Q} * (n - 1)) AS INT)        AS hi,
               CAST(floor({_Q} * (n - 1) + 0.5) AS INT) AS near
        FROM g)
    SELECT l_returnflag,
           round(a[lo + 1] + (a[hi + 1] - a[lo + 1]) * (pos - lo), 4) AS q_linear,
           round(a[lo + 1], 4)                                        AS q_lower,
           round(a[hi + 1], 4)                                        AS q_higher,
           round((a[lo + 1] + a[hi + 1]) / 2, 4)                      AS q_midpoint,
           round(a[near + 1], 4)                                      AS q_nearest
    FROM ix ORDER BY l_returnflag
    """,
    doc="All five cudf quantile interpolation modes (quantiles.hpp:50) at "
    "q=0.37 per group — LOWER/HIGHER/MIDPOINT/NEAREST as index shims over "
    "one sorted collect per group.",
)
def agg_quantile_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("a")
    )
    m = _modes(F.col("a"), _Q)
    return grouped.select(
        "l_returnflag", *[F.round(c, 4).alias(k) for k, c in m.items()]
    ).orderBy("l_returnflag")
