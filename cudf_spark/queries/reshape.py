"""Reshape coverage — the pandas-layer reshape surface
(python/cudf/cudf/core/reshape.py: melt:610, pivot:1088, pivot_table:1658,
crosstab:1543, get_dummies:784; cpp/include/cudf/reshape.hpp interleave:48,
tile:72; transpose.hpp:39; transform.hpp one_hot_encode:384).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register


@register(
    "reshape_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="pivot (reshape.py:1088) — long→wide with explicit value list "
    "(explicit lists avoid the extra distinct-scan pass at scale).",
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select("l_returnflag", F.col("F").alias("f_qty"), F.col("O").alias("o_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "reshape_melt",
    oracle="""
    SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    ORDER BY p_partkey, variable
    """,
    doc="melt / unpivot (reshape.py:610) — wide→long via df.unpivot.",
)
def reshape_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    )
    return p.unpivot("p_partkey", ["p_size", "p_retailprice"], "variable", "value").orderBy(
        "p_partkey", "variable"
    )


@register(
    "reshape_crosstab",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (o_orderpriority = '1-URGENT')        AS urgent,
           count(*) FILTER (o_orderpriority = '5-LOW')           AS low,
           count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '5-LOW')) AS mid
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="crosstab (reshape.py:1543) — contingency counts via pivot/count_if.",
)
def reshape_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
            F.count_if(F.col("o_orderpriority") == "5-LOW").alias("low"),
            F.count_if(~F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).alias("mid"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "reshape_one_hot",
    oracle="""
    SELECT c_custkey,
           CAST(c_mktsegment = 'BUILDING'   AS INT) AS seg_building,
           CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS seg_automobile,
           CAST(c_mktsegment = 'MACHINERY'  AS INT) AS seg_machinery,
           CAST(c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY') AS INT) AS seg_other
    FROM customer ORDER BY c_custkey
    """,
    doc="one-hot encode (transform.hpp:384; get_dummies reshape.py:784) — "
    "indicator expressions with an explicit category list.",
)
def reshape_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        (seg == "BUILDING").cast("int").alias("seg_building"),
        (seg == "AUTOMOBILE").cast("int").alias("seg_automobile"),
        (seg == "MACHINERY").cast("int").alias("seg_machinery"),
        (~seg.isin("BUILDING", "AUTOMOBILE", "MACHINERY")).cast("int").alias("seg_other"),
    ).orderBy("c_custkey")


@register(
    "reshape_transpose",
    oracle="""
    SELECT count(*) FILTER (r_name = 'AFRICA')      AS africa,
           count(*) FILTER (r_name = 'ASIA')        AS asia,
           count(*) FILTER (r_name = 'EUROPE')      AS europe,
           count(*) FILTER (r_name = 'AMERICA')     AS america,
           count(*) FILTER (r_name = 'MIDDLE EAST') AS middle_east
    FROM region
    """,
    doc="transpose (transpose.hpp:39) — rows→columns over a bounded key "
    "domain (unbounded transpose is an anti-pattern at scale).",
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    return r.agg(
        F.count_if(F.col("r_name") == "AFRICA").alias("africa"),
        F.count_if(F.col("r_name") == "ASIA").alias("asia"),
        F.count_if(F.col("r_name") == "EUROPE").alias("europe"),
        F.count_if(F.col("r_name") == "AMERICA").alias("america"),
        F.count_if(F.col("r_name") == "MIDDLE EAST").alias("middle_east"),
    )


@register(
    "reshape_interleave",
    oracle="""
    SELECT p_partkey, 0 AS pos, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 1 AS pos, p_type FROM part
    ORDER BY p_partkey, pos
    """,
    doc="interleave_columns (reshape.hpp:48) — stack columns into rows with "
    "position (F.stack / posexplode of an array literal).",
)
def reshape_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.posexplode(F.array("p_brand", "p_type")).alias("pos", "val"))
        .orderBy("p_partkey", "pos")
    )


@register(
    "reshape_tile",
    oracle="""
    SELECT r.r_regionkey, r.r_name, g.i AS copy
    FROM region r, (SELECT unnest(generate_series(0, 2)) AS i) g
    ORDER BY r_regionkey, copy
    """,
    doc="tile (reshape.hpp:72) — repeat the table n times with a copy index "
    "(explode of a sequence; no driver loop).",
)
def reshape_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    return (
        r.select("r_regionkey", "r_name", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("copy"))
        .orderBy("r_regionkey", "copy")
    )
