"""TPC-H canon, part 3 — q02/q11/q12/q20, completing the reference's full
PDS-H suite (reference: python/cudf_polars/cudf_polars/experimental/
benchmarks/pdsh.py). These bring the correlated-scalar-subquery and
HAVING-over-global-aggregate shapes the rest of the registry lacks.

Adapted to fixture schemas: there is no ``partsupp`` table, so the supply
relation is derived from lineitem — ``ps(l_partkey, l_suppkey)`` with
``min(l_extendedprice / l_quantity)`` as the supply cost and
``sum(l_quantity)`` as the available quantity. ``min`` (not ``avg``) keeps
the derived cost bit-identical across engines: division is a single IEEE
op and min never accumulates, so the correlated cost-equality predicate is
exact on both sides. No l_shipmode/commitdate either, so q12's "late"
classes come from l_returnflag × (shipdate > orderdate + 90 days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register

# Shared lineitem-derived supply relation (partsupp stand-in).
_PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               CAST(sum(l_quantity) AS BIGINT)   AS ps_availqty
        FROM lineitem GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").cast("bigint").alias("ps_availqty"),
    )


@register(
    "q02_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           CAST(floor(ps.ps_supplycost * 10000) AS BIGINT) AS supplycost_q4
    FROM part p
    JOIN ps        ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n  ON n.n_nationkey = s.s_nationkey
    JOIN region r  ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 15 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
            SELECT min(ps2.ps_supplycost)
            FROM ps ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
            JOIN nation n2  ON n2.n_nationkey = s2.s_nationkey
            JOIN region r2  ON r2.r_regionkey = n2.n_regionkey
            WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: correlated scalar MIN subquery (min-cost supplier "
    "per part in a region) → decorrelates to a grouped-min + equi-join. "
    "Reference runs it via polars rewrites (pdsh.py q2).",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # Both the outer block and the correlated-min subquery are keyed on
    # p_partkey, so only partkeys surviving the p_type/p_size filter can
    # reach the result — semi-join lineitem against the filtered part keys
    # BEFORE the (partkey, suppkey) supply aggregation (guide §3.2:
    # pre-filter the big side before shuffling it). The filter drops the
    # non-qualifying ~96% of lineitem ahead of the widest shuffle in the
    # plan; at fixture scale the key set broadcasts, at 100 TB AQE/bloom
    # handles the semi-join strategy.
    ps = (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
            F.sum("l_quantity").cast("bigint").alias("ps_availqty"),
        )
    )
    # Suppliers in EUROPE. nation/region are fixed-size → forced broadcast;
    # supplier scales with SF, so AQE picks its strategy from observed size
    # (broadcast at small SF, shuffle at cluster scale).
    eligible = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # Decorrelated as a per-part windowed min: ONE pass over `eligible`
    # (the agg+self-join form executes the whole join subtree twice), one
    # shuffle on ps_partkey, tiny per-part groups so no skew. Same
    # cost-equality semantics as the correlated scalar subquery.
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("mc_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mc_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            # floor-quantized, not rounded: the cost is an exact ratio
            # (price/qty) that lands on half-ulps where Spark HALF_UP and
            # DuckDB half-even disagree.
            F.floor(F.col("ps_supplycost") * 10000).cast("bigint").alias("supplycost_q4"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    natval AS (
        SELECT ps.ps_partkey,
               CAST(floor(ps.ps_supplycost * ps.ps_availqty * 100) AS BIGINT)
                   AS value_c
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n  ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7')
    SELECT ps_partkey, CAST(sum(value_c) AS BIGINT) AS total_value_c
    FROM natval
    GROUP BY ps_partkey
    HAVING sum(value_c) > (SELECT sum(value_c) * 2.0 / count(DISTINCT ps_partkey)
                           FROM natval)
    ORDER BY total_value_c DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape: HAVING over a global-aggregate scalar subquery "
    "(parts holding an outsized share of one nation's stock value). The "
    "threshold is 2x the AVERAGE per-part share — scale-invariant, the "
    "same reason the TPC-H spec sets FRACTION = 0.0001/SF (a fixed "
    "share threshold de-generates to empty as part count grows; "
    "observed at sf0.1). The threshold is a 1-row aggregate broadcast "
    "to the filter — no global window (pdsh.py q11).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    natval = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            # Quantize per ROW to integer cents before aggregating: the raw
            # value is an arbitrary double ratio (min(price/qty)·availqty),
            # so a post-sum round would depend on IEEE fold order, which
            # differs between Spark's partial aggregation and DuckDB. With
            # integer cents, the sum AND the HAVING threshold comparison
            # are exact on both engines (floor of one identical product is
            # deterministic; only multi-term folds diverge).
            F.floor(F.col("ps_supplycost") * F.col("ps_availqty") * 100)
            .cast("bigint")
            .alias("value_c"),
        )
    )
    per_part = natval.groupBy("ps_partkey").agg(F.sum("value_c").alias("sum_value_c"))
    # Scalar subquery → 1-row aggregate broadcast-cross-joined into the
    # HAVING filter (never a global window).
    threshold = natval.agg(
        (F.sum("value_c") * 2.0 / F.countDistinct("ps_partkey")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("sum_value_c") > F.col("threshold"))
        .select("ps_partkey", F.col("sum_value_c").alias("total_value_c"))
        .orderBy(F.desc("total_value_c"), "ps_partkey")
    )


@register(
    "q12_shipping_priority_class",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: late-shipment priority classes — conditional "
    "counts over a join with a cross-table date predicate (pdsh.py q12; "
    "fixture has no l_shipmode/commitdate, so returnflag × "
    "shipdate>orderdate+90d stand in).",
)
def q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q20_excess_suppliers",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    demand AS (
        SELECT l_partkey, 0.5 * sum(l_quantity) AS half_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
            SELECT ps.ps_suppkey
            FROM ps
            JOIN demand d ON d.l_partkey = ps.ps_partkey
            WHERE ps.ps_partkey IN
                  (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND ps.ps_availqty > d.half_qty)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: nested IN subqueries with a correlated aggregate "
    "threshold (suppliers holding more than half a year's demand for "
    "'small…' parts) → semi-join chain after decorrelation (pdsh.py q20).",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    demand = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    # IN (parts) → broadcast semi-join; correlated availqty>half → equi-join
    # on partkey with a residual; outer IN → semi-join on suppkey.
    excess = (
        ps.join(p.select("p_partkey"), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(demand, ps.ps_partkey == demand.l_partkey)
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
