"""Join-family coverage — every join mode of the reference
(cpp/include/cudf/join/: join.hpp, filtered_join.hpp, conditional_join.hpp,
mixed_join.hpp, cross_join) plus table-level set operations (§2.7) and the
as-of join operator.

Scale notes: dims broadcast; the events self-join is a *mixed* join (equi
key + time-range residual) so Catalyst plans a hash join with residual
filter, never a nested-loop over the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.operators.joins import asof_join
from cudf_spark.queries.registry import register


@register(
    "join_left_outer",
    oracle="""
    SELECT n.n_name,
           count(c.c_custkey)                        AS n_customers,
           round(coalesce(sum(c.c_acctbal), 0), 2)   AS total_bal
    FROM nation n
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Left outer join keeping empty dims (cudf left_join, join.hpp:203).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nk, count(*) AS n_cust
        FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey
    ), supp AS (
        SELECT s_nationkey AS nk, count(*) AS n_supp
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           cust.n_cust AS n_cust, supp.n_supp AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    ORDER BY nationkey
    """,
    doc="Full outer join with nulls on both sides (cudf full_join, join.hpp:244).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.nk == supp.nk, "full")
        .select(
            F.coalesce(cust.nk, supp.nk).alias("nationkey"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    ORDER BY c_custkey
    """,
    doc="Left semi join / EXISTS (cudf filtered_join.hpp LEFT_SEMI_JOIN:49).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    ORDER BY c_custkey
    """,
    doc="Left anti join / NOT EXISTS (cudf filtered_join.hpp LEFT_ANTI_JOIN:50).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus, count(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r.r_name, s.o_orderstatus
    ORDER BY r.r_name, s.o_orderstatus
    """,
    doc="Cross join (cudf cross_join, join.hpp:278).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        r.crossJoin(s)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name", "o_orderstatus")
    )


@register(
    "join_mixed_time_range",
    oracle="""
    SELECT e1.user_id, count(*) AS n_followups
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    WHERE e1.event_type = 'view'
    GROUP BY e1.user_id
    ORDER BY e1.user_id
    """,
    doc="Mixed join: equi key + time-range residual (cudf mixed_join.hpp:92); "
    "Catalyst splits equality keys and residual natively.",
)
def join_mixed_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    e1 = e.filter(F.col("event_type") == "view").alias("e1")
    e2 = e.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_followups"))
        .orderBy("user_id")
    )


@register(
    "join_conditional_theta",
    oracle="""
    SELECT s.s_name, count(*) AS n_richer
    FROM supplier s
    JOIN customer c ON s.s_acctbal > c.c_acctbal AND c.c_acctbal > 9000
    GROUP BY s.s_name
    ORDER BY s.s_name
    """,
    doc="Pure conditional (theta) join on an inequality predicate "
    "(cudf conditional_join.hpp:72) — plans BroadcastNestedLoopJoin with a "
    "pre-filter shrinking the build side.",
)
def join_conditional_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        s.join(F.broadcast(c), s.s_acctbal > c.c_acctbal)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_richer"))
        .orderBy("s_name")
    )


@register(
    "join_asof",
    # ranked correlated pick instead of DuckDB's ASOF JOIN: ASOF picks an
    # ARBITRARY right row when several clicks share (user_id, ts), while
    # the engine deterministically tie-breaks by greatest payload tuple —
    # the explicit rn=1 rank mirrors that rule (fixtures have unique
    # (user_id, ts) today, so ASOF was green only by luck). Timestamps
    # are CAST to µs first: events.ts is ns in parquet and Spark
    # truncates, so comparing raw ns could order sub-µs siblings that
    # Spark sees as ties.
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'click'
    ), j AS (
        SELECT p.event_id, c.ts AS cts, c.value,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.value DESC) AS rn
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(j.cts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
           round(j.value, 4) AS last_click_value
    FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON j.event_id = p.event_id
    ORDER BY p.event_id
    """,
    doc="As-of join (pandas merge_asof; SURVEY §2.3 'not implemented' in the "
    "reference) — union + partitioned window, one shuffle on the key; "
    "deterministic greatest-payload tie-break at equal timestamps, pinned "
    "by the oracle's explicit rank.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_values=["ts", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_click_ts"),
        F.round("asof_value", 4).alias("last_click_value"),
    ).orderBy("event_id")


@register(
    "setop_union_distinct",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT s_nationkey AS nk FROM supplier
    ) ORDER BY nk
    """,
    doc="UNION DISTINCT (cudf concatenate + distinct; Union IR dsl/ir.py:3519).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct().orderBy("nk")


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nk
    """,
    doc="INTERSECT (distinct) — built-in Spark capability (SURVEY §2.7).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


@register(
    "setop_except_all",
    oracle="""
    SELECT nk, count(*) AS n FROM (
        SELECT l_suppkey AS nk FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-02-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00'
    ) GROUP BY nk ORDER BY nk
    """,
    doc="EXCEPT ALL multiset difference — built-in Spark exceptAll.",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    jan = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    ).select(F.col("l_suppkey").alias("nk"))
    feb = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
    ).select(F.col("l_suppkey").alias("nk"))
    return jan.exceptAll(feb).groupBy("nk").agg(F.count("*").alias("n")).orderBy("nk")


@register(
    "hconcat_positional",
    oracle="""
    WITH a AS (
        SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS rn FROM region
    ), b AS (
        SELECT o_orderstatus, row_number() OVER (ORDER BY o_orderstatus) AS rn
        FROM (SELECT DISTINCT o_orderstatus FROM orders)
    )
    SELECT a.rn AS pos, a.r_name, b.o_orderstatus
    FROM a LEFT JOIN b ON a.rn = b.rn
    ORDER BY pos
    """,
    doc="HConcat — positional column zip of two frames (cudf-polars HConcat "
    "IR dsl/ir.py:3555). Spark has no implicit row order (SURVEY §7 "
    "hard-part 1): positions come from explicit row_number over a total "
    "order, then an equi-join on position.",
)
def hconcat_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    a = r.select("r_name", F.row_number().over(W.partitionBy().orderBy("r_regionkey")).alias("rn"))
    b = s.select(
        "o_orderstatus", F.row_number().over(W.partitionBy().orderBy("o_orderstatus")).alias("rn")
    )
    return (
        a.join(b, "rn", "left")
        .select(F.col("rn").alias("pos"), "r_name", "o_orderstatus")
        .orderBy("pos")
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
        SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS k
        FROM events WHERE event_id < 200
    ), b AS (
        SELECT CASE WHEN user_id % 5 = 0 THEN NULL ELSE user_id END AS k, count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT a.event_id, a.k, b.n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.event_id
    """,
    doc="null-safe equality join — the NULL_EQUALS binary op the reference "
    "documents with Spark's null rules (binaryop.hpp:79-82) → <=> / "
    "eqNullSafe; null keys match null keys.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") < 200).select(
        "event_id",
        # when(== 'error', NULL).otherwise(user_id): the negated form
        # would ALSO null the key for a NULL event_type, diverging from
        # the oracle's CASE ... ELSE in the one query that exists to
        # exercise null-key semantics
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    b = (
        e.select(F.when(F.col("user_id") % 5 != 0, F.col("user_id")).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .select("event_id", a.k.alias("k"), "n")
        .orderBy("event_id")
    )


@register(
    "union_by_name_promote",
    oracle="""
    SELECT nk, src, bal FROM (
        SELECT c_nationkey AS nk, 'cust' AS src, round(c_acctbal, 2) AS bal
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT s_nationkey AS nk, 'supp' AS src, NULL AS bal FROM supplier
    ) ORDER BY src, nk, bal
    """,
    doc="union with schema promotion — unionByName(allowMissingColumns) "
    "fills absent columns with nulls (cudf concatenate with unequal "
    "schemas; Union IR dsl/ir.py:3519).",
)
def union_by_name_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(
            F.col("c_nationkey").alias("nk"),
            F.lit("cust").alias("src"),
            F.round("c_acctbal", 2).alias("bal"),
        )
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"), F.lit("supp").alias("src")
    )
    return c.unionByName(s, allowMissingColumns=True).orderBy("src", "nk", "bal")


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'click'
    )
    , j AS (
        SELECT p.event_id, c.ts AS cts, c.value,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                            CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                            c.value DESC
               ) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
         AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800000000
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f')   AS purchase_ts,
           strftime(j.cts, '%Y-%m-%d %H:%M:%S.%f')  AS nearest_click_ts,
           round(j.value, 4)                         AS nearest_click_value
    FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON j.event_id = p.event_id
    ORDER BY p.event_id
    """,
    doc="merge_asof direction='nearest' with tolerance (pandas/cudf full "
    "surface): closer of backward/forward click within 30 min, ties to "
    "backward then greatest payload. Still one shuffle + two in-partition "
    "sorts; the oracle is a correlated min_by over a lexicographic "
    "[distance, direction, -payload] key.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["ts", "value"],
        direction="nearest",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("nearest_click_ts"),
        F.round("asof_value", 4).alias("nearest_click_value"),
    ).orderBy("event_id")


@register(
    "join_range_binned",
    oracle="""
    WITH iv AS (
        SELECT o_orderkey AS interval_id,
               datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS start_d
        FROM orders WHERE o_orderkey % 97 = 5),
    pts AS (
        SELECT o_orderkey AS point_id,
               datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS p_d,
               o_totalprice
        FROM orders)
    SELECT iv.interval_id,
           CAST(iv.start_d AS INT)                         AS start_d,
           CAST(count(pts.point_id) AS BIGINT)             AS n_points,
           round(sum(pts.o_totalprice), 2)                 AS total_price
    FROM iv LEFT JOIN pts
      ON pts.p_d >= iv.start_d AND pts.p_d <= iv.start_d + 13
    GROUP BY iv.interval_id, iv.start_d
    ORDER BY iv.interval_id
    """,
    doc="Point-in-interval join via the binning rewrite "
    "(operators/joins.py:range_join_binned): ~150 two-week maintenance "
    "windows x 15k order dates as a bin-keyed EQUI-join + residual "
    "BETWEEN, where a raw non-equi join would plan a nested loop over "
    "|P|x|I|. Bin width = interval length, so each interval fans out to "
    "<= 2 bins and every pair matches exactly once. The oracle runs the "
    "naive BETWEEN join — same answer, different (scale-safe) plan.",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.joins import range_join_binned

    o = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    iv = o.filter(F.col("o_orderkey") % 97 == 5).select(
        F.col("o_orderkey").alias("interval_id"),
        days.alias("start_d"),
        (days + 13).alias("end_d"),
    )
    pts = o.select(
        F.col("o_orderkey").alias("point_id"),
        days.alias("p_d"),
        "o_totalprice",
    )
    matched = range_join_binned(
        pts, iv, point_col="p_d", start_col="start_d", end_col="end_d", bin_width=14
    )
    agg = matched.groupBy("interval_id", "start_d").agg(
        F.count("point_id").cast("bigint").alias("n_points"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    return (
        iv.select("interval_id", "start_d")
        .join(agg, ["interval_id", "start_d"], "left")
        .select(
            "interval_id",
            F.col("start_d").cast("int").alias("start_d"),
            F.coalesce("n_points", F.lit(0)).cast("bigint").alias("n_points"),
            "total_price",
        )
        .orderBy("interval_id")
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH dim AS (
        SELECT event_type, CAST(length(event_type) AS DOUBLE) / 10.0 AS weight
        FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_id, e.event_type,
           round(e.value * d.weight, 6) AS weighted
    FROM events e JOIN dim d ON e.event_type = d.event_type
    ORDER BY weighted DESC, e.event_id
    LIMIT 20
    """,
    doc="salted skew join (operators/joins.py:salted_join): events.event_type "
    "has a handful of hot values — a plain shuffle join sends each entire "
    "type to ONE reducer. Salting spreads every hot key across n_salt "
    "tasks (probe salt from a row id, build side replicated), row-identical "
    "to the plain join. At 100 TB this is the structural answer when the "
    "build side is too big/dynamic to broadcast and AQE's reactive "
    "skew-split doesn't cover the build strategy. Reference scope: hash "
    "join (cpp/include/cudf/join/join.hpp) — single-GPU has no shuffle "
    "skew; this is the distributed-engine counterpart.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.joins import salted_join

    ev = load(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "weight", (F.length("event_type").cast("double") / 10.0)
    )
    joined = salted_join(ev, dim, "event_type", n_salt=8)
    return (
        joined.select(
            "event_id",
            "event_type",
            F.round(F.col("value") * F.col("weight"), 6).alias("weighted"),
        )
        .orderBy(F.col("weighted").desc(), "event_id")
        .limit(20)
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="bloom-prefiltered semi-join: the build side's keys compress "
    "into a persisted Bloom sketch (operators/sketches.py:bloom_build, "
    "4096 words — sketch rows, not keys, cross the wire), the probe "
    "side's DISTINCT keys test against it, and only bloom-hit rows "
    "enter the exact semi-join. False positives are filtered by the "
    "exact join, false negatives are impossible — so the result is "
    "row-identical to the plain semi-join the oracle runs. This is "
    "Spark's runtime bloom filter (session.py enables the automatic "
    "form) made EXPLICIT and persistable: at 100 TB the sketch is "
    "built once per dim snapshot and reused across every probe query "
    "(cudf_streaming/bloom_filter.hpp:21 — the reference's "
    "cross-channel bloom, as a relational operator).",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.sketches import bloom_build, bloom_probe

    li = load(spark, sf_dir, "lineitem")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    sketch = bloom_build(urgent, [], "o_orderkey", n_words=4096)
    cand = bloom_probe(
        sketch, li.select("l_orderkey").distinct(), [], "l_orderkey", n_words=4096
    ).filter(F.col("bloom_hit"))
    prefiltered = li.join(
        cand.select("l_orderkey"), "l_orderkey", "left_semi"
    )
    # exact semi-join removes bloom false positives
    exact = prefiltered.join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_c"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_merge_indicator",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'right_only'
                WHEN max(o.o_custkey) IS NULL THEN 'left_only'
                ELSE 'both' END AS _merge
    FROM (SELECT c_custkey FROM customer WHERE c_custkey % 3 != 0) c
    FULL JOIN (SELECT o_custkey, o_orderkey FROM orders
               WHERE o_custkey % 5 != 0) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, o.o_custkey
    ORDER BY custkey
    """,
    doc="pandas/cudf merge(indicator=True) semantics (cudf.merge's "
    "indicator column; python/cudf/cudf/core/join): full outer join "
    "emitting the provenance tag left_only/right_only/both per key — "
    "the reconciliation idiom for diffing two snapshots. One keyed "
    "full-outer join + keyed aggregate.",
)
def join_merge_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the two "snapshots" are offset (mod-3 vs mod-5 key filters) so all
    # three provenance classes actually occur
    c = load(spark, sf_dir, "customer").select("c_custkey").filter(
        F.col("c_custkey") % 3 != 0
    )
    o = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .filter(F.col("o_custkey") % 5 != 0)
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return (
        j.groupBy("c_custkey", "o_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "n_orders",
            F.when(F.col("c_custkey").isNull(), "right_only")
            .when(F.col("o_custkey").isNull(), "left_only")
            .otherwise("both")
            .alias("_merge"),
        )
        .orderBy("custkey")
    )
