"""Fixed-point (decimal) arithmetic — the cudf ``fixed_point`` type family
(reference cpp/include/cudf/fixed_point/fixed_point.hpp; DECIMAL32/64/128
at types.hpp:210-212) re-expressed as Spark ``DecimalType(p,s)``.

Exact base-10 arithmetic is the one numeric surface where cross-engine
parity is bit-perfect by construction — no IEEE fold-order drift — so the
oracle needs no rounding shims, only identical explicit CASTs: decimal
op-result precision/scale rules differ slightly between engines, and the
comparator stringifies values (``Decimal('3.30')`` ≠ ``Decimal('3.3')``).

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
           CAST(sum(net)   AS DECIMAL(22,4))            AS sum_net,
           CAST(sum(CAST(net AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS sum_net_wide,
           CAST(min(price) AS DECIMAL(12,2))            AS min_price,
           CAST(max(net)   AS DECIMAL(18,4))            AS max_net,
           CAST(round(max(net), 1) AS DECIMAL(18,1))    AS max_net_round1,
           CAST(CAST(CAST(max(net) AS VARCHAR) AS DECIMAL(18,4)) AS DECIMAL(18,4))
                                                        AS max_net_roundtrip,
           max(CAST(price AS VARCHAR))                  AS max_price_str
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
            F.sum("net").cast("decimal(22,4)").alias("sum_net"),
            F.sum(F.col("net").cast("decimal(38,10)"))
            .cast("decimal(38,10)")
            .alias("sum_net_wide"),
            F.min("price").cast("decimal(12,2)").alias("min_price"),
            F.max("net").cast("decimal(18,4)").alias("max_net"),
            F.round(F.max("net"), 1).cast("decimal(18,1)").alias("max_net_round1"),
            F.max("net")
            .cast("string")
            .cast("decimal(18,4)")
            .cast("decimal(18,4)")
            .alias("max_net_roundtrip"),
            F.max(F.col("price").cast("string")).alias("max_price_str"),
        )
        .orderBy("l_returnflag")
    )
