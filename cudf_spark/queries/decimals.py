"""Fixed-point (decimal) arithmetic — the cudf ``fixed_point`` type family
(reference cpp/include/cudf/fixed_point/fixed_point.hpp; DECIMAL32/64/128
at types.hpp:210-212) re-expressed as Spark ``DecimalType(p,s)``.

Exact base-10 arithmetic has no IEEE fold-order drift, but the *transport*
to the comparator is not exact: a DECIMAL fetched through a float64 path
loses digits beyond ~15-16 significant figures (decimal(38,10) sums
exceed that). The output contract is therefore canonical *strings*: every
decimal result is CAST to VARCHAR inside the query on BOTH engines, so
exact values survive any fetch path. Both engines render full-scale
fixed-point strings for these widths (``1.5 :: DECIMAL(18,4)`` →
``"1.5000"``).

HALF_EVEN is deliberately exercised on doubles elsewhere (agg family):
DuckDB's ``round_even`` converts decimals to DOUBLE first, so exact-tie
cells (…x500) would diverge from Spark's exact BigDecimal HALF_EVEN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register


@register(
    "decimal_fixed_point",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
             CAST(l_discount      AS DECIMAL(4,2))  AS disc
      FROM lineitem
    ),
    n AS (
      SELECT l_returnflag, price, disc,
             CAST((CAST(1 AS DECIMAL(3,2)) - disc) * price AS DECIMAL(18,4)) AS net
      FROM d
    )
    SELECT l_returnflag,
           CAST(CAST(sum(net)   AS DECIMAL(22,4)) AS VARCHAR)            AS sum_net,
           CAST(CAST(sum(CAST(net AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS VARCHAR)
                                                                         AS sum_net_wide,
           CAST(CAST(min(price) AS DECIMAL(12,2)) AS VARCHAR)            AS min_price,
           CAST(CAST(max(net)   AS DECIMAL(18,4)) AS VARCHAR)            AS max_net,
           CAST(CAST(round(max(net), 1) AS DECIMAL(18,1)) AS VARCHAR)    AS max_net_round1,
           CAST(CAST(CAST(CAST(max(net) AS VARCHAR) AS DECIMAL(18,4)) AS DECIMAL(18,4))
                AS VARCHAR)                                              AS max_net_roundtrip,
           max(CAST(price AS VARCHAR))                                   AS max_price_str
    FROM n GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="fixed_point arithmetic (fixed_point.hpp; round.hpp round_decimal; "
    "strings/convert/convert_fixed_point.hpp): DECIMAL64 cast, exact "
    "multiply with scale growth, DECIMAL128-wide sum, HALF_UP decimal "
    "round, decimal<->string round-trip. All values exact — the only "
    "parity requirement is identical CAST targets on both engines.",
)
def decimal_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(4,2)").alias("disc"),
    )
    net = ((F.lit(1).cast("decimal(3,2)") - F.col("disc")) * F.col("price")).cast(
        "decimal(18,4)"
    )
    return (
        d.withColumn("net", net)
        .groupBy("l_returnflag")
        .agg(
            # Every decimal output ships as its canonical string: the exact
            # values survive any fetch path (the driver's DuckDB fetch
            # materializes DECIMAL as float64, which cannot represent
            # decimal(38,10) exactly). Both engines render full-scale
            # fixed-point strings for these widths.
            F.sum("net").cast("decimal(22,4)").cast("string").alias("sum_net"),
            F.sum(F.col("net").cast("decimal(38,10)"))
            .cast("decimal(38,10)")
            .cast("string")
            .alias("sum_net_wide"),
            F.min("price").cast("decimal(12,2)").cast("string").alias("min_price"),
            F.max("net").cast("decimal(18,4)").cast("string").alias("max_net"),
            F.round(F.max("net"), 1)
            .cast("decimal(18,1)")
            .cast("string")
            .alias("max_net_round1"),
            F.max("net")
            .cast("string")
            .cast("decimal(18,4)")
            .cast("decimal(18,4)")
            .cast("string")
            .alias("max_net_roundtrip"),
            F.max(F.col("price").cast("string")).alias("max_price_str"),
        )
        .orderBy("l_returnflag")
    )
