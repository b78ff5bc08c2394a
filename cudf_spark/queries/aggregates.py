"""Aggregation-kind coverage — the full ``cudf::aggregation::Kind`` table
(cpp/include/cudf/aggregation.hpp:78-121) re-expressed with Spark's
declarative aggregates, which already implement the reference's
partial→merge→finalize decomposition (streaming_groupby.cpp:21-33;
cudf_polars streaming/groupby.py:254) as map-side partial aggregation.

All float outputs rounded for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register


@register(
    "agg_kinds_basic",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2)              AS sum_qty,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price,
           round(avg(l_extendedprice), 4)         AS avg_price,
           count(*)                               AS n_rows,
           count(DISTINCT l_suppkey)              AS n_supp,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           round(sum(l_quantity * l_quantity), 2) AS sum_sq_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="SUM/MIN/MAX/MEAN/COUNT_VALID/COUNT_ALL/NUNIQUE/SUM_OF_SQUARES "
    "(aggregation.hpp:78-121).",
)
def agg_kinds_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.round(F.sum(F.col("l_quantity") * F.col("l_quantity")), 2).alias("sum_sq_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           round(var_samp(l_quantity), 6)                  AS var_qty,
           round(var_pop(l_quantity), 6)                   AS varp_qty,
           round(stddev_samp(l_quantity), 6)               AS std_qty,
           round(stddev_pop(l_quantity), 6)                AS stdp_qty,
           round(corr(l_quantity, l_extendedprice), 6)     AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS covp_qp
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="VARIANCE/STD (M2 Welford merge in the reference, "
    "cpp/src/groupby/hash/), COVARIANCE, CORRELATION kinds.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("stdp_qty"),
            # guarded Pearson instead of F.corr: a zero-variance group
            # makes Spark's corr aggregate itself raise DIVIDE_BY_ZERO
            # under ANSI mode (Spark 4 default), where DuckDB and the
            # SQL standard return NULL — covar/stddev_pop compose the
            # identical statistic with the division guarded
            F.round(
                F.when(
                    (F.stddev_pop("l_quantity") != 0)
                    & (F.stddev_pop("l_extendedprice") != 0),
                    F.covar_pop("l_quantity", "l_extendedprice")
                    / (
                        F.stddev_pop("l_quantity")
                        * F.stddev_pop("l_extendedprice")
                    ),
                ),
                6,
            ).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "agg_median_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4)                        AS med_qty,
           round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS q25,
           round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS q75,
           round(CAST(quantile_cont(l_quantity, 0.90) AS DOUBLE), 4) AS q90
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="MEDIAN + exact QUANTILE with linear interpolation "
    "(cudf quantiles.hpp:50; aggregation.hpp MEDIAN/QUANTILE).",
)
def agg_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.percentile("l_quantity", 0.25), 4).alias("q25"),
            F.round(F.percentile("l_quantity", 0.75), 4).alias("q75"),
            F.round(F.percentile("l_quantity", 0.90), 4).alias("q90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000000 + c_custkey) AS richest,
           arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000000 + c_custkey) AS poorest
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="ARGMAX/ARGMIN kinds → max_by/min_by; composite (value, key) order "
    "key encoded as a bigint for deterministic tie-breaks. Radix 1e11 "
    "keeps the encoding collision-free while c_custkey < 1e11 (TPC-H "
    "SF ~650k; the old 1e7 radix collided from SF ~67, letting 'richest' "
    "name a strictly poorer customer with a big enough key — silently, "
    "since both engines shared the formula); |cents| <= 1e6 keeps the "
    "product at 1e17, inside BIGINT.",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    order_key = (
        F.round(F.col("c_acctbal") * 100).cast("long") * 100000000000
        + F.col("c_custkey")
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", order_key).alias("richest"),
            F.min_by("c_name", order_key).alias("poorest"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_collect",
    oracle="""
    SELECT r.r_name,
           array_to_string(list_sort(list(n.n_name)), ',')           AS nations,
           array_to_string(list_sort(list(DISTINCT n.n_regionkey)), ',') AS keys
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="COLLECT_LIST / COLLECT_SET kinds (aggregation.hpp:101-102) — output "
    "sorted + joined so the hash is order-independent.",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.array_join(F.sort_array(F.collect_set("n_regionkey")), ",").alias("keys"),
        )
        .orderBy("r_name")
    )


@register(
    "agg_bool_bit",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_totalprice > 90000)  AS any_over_90k,
           bit_and(o_custkey)             AS band,
           bit_or(o_custkey)              AS bor,
           bit_xor(o_custkey)             AS bxor
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="ANY/ALL + BITWISE_AGG kinds (aggregation.hpp:86-87,118).",
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 90000).alias("any_over_90k"),
            F.bit_and("o_custkey").alias("band"),
            F.bit_or("o_custkey").alias("bor"),
            F.bit_xor("o_custkey").alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_product",
    oracle="""
    SELECT n_regionkey, round(product(n_nationkey + 1), 2) AS prod_keys
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="PRODUCT kind (aggregation.hpp:80).",
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.round(F.product(F.col("n_nationkey") + 1), 2).alias("prod_keys"))
        .orderBy("n_regionkey")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING count(*) > 0  -- empty-input () row: Spark emits none (r11 fuzz)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP with GROUPING indicators — a Spark capability the reference "
    "lacks (SURVEY §2.4 'grouping sets: absent').",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0  -- empty-input () row: Spark emits none (r11 fuzz)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE — Spark built-in capability win (SURVEY §2.4).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    -- HAVING mirrors Spark: on EMPTY input Spark's grouping sets emit
    -- zero rows while SQL-standard engines emit the () grand-total row
    -- (r11 fuzz, hostile empty-lineitem tree); no real group can have
    -- count 0, so this only drops the empty-input () row
    HAVING count(*) > 0
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="GROUPING SETS via Spark SQL.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "distinct_stable_first",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag, l_linestatus
        ORDER BY l_orderkey, l_linenumber) = 1
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="stable_distinct keep-first (cudf stream_compaction.hpp:383) — "
    "explicit order key + row_number window, since Spark has no implicit "
    "row order (SURVEY §7 hard-part 1).",
)
def distinct_stable_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy("l_orderkey", "l_linenumber")
    return (
        li.select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_approx_sketches",
    # Upgraded rows-only -> HASH GATE in round 8 (VERDICT r07 item 5):
    # the sketch VALUES stay engine-side (Spark HLL++ register layout
    # and the GK/t-digest summary have no DuckDB counterpart by
    # construction), but the hashed output is the exact NDV, the exact
    # median on the half-cents integer lattice, and two ALL-INTEGER
    # accuracy-envelope flags the oracle asserts TRUE — the
    # agg_hll_error_envelope idiom. If either sketch ever drifts past
    # its bound on this deterministic data the query goes red instead of
    # silently lying.
    oracle="""
    WITH v AS (
        SELECT l_returnflag, l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), hist AS (
        SELECT l_returnflag, cents, CAST(count(*) AS BIGINT) AS c
        FROM v GROUP BY l_returnflag, cents
    ), cum AS (
        SELECT l_returnflag, cents, c,
               CAST(sum(c) OVER (PARTITION BY l_returnflag
                                 ORDER BY cents) AS BIGINT) AS cum
        FROM hist
    ), th AS (
        -- median rank rule, denominator 2: rank r and fractional g*2
        -- are exact integers
        SELECT l_returnflag,
               (sum(c) - 1) // 2 + 1 AS r,
               (sum(c) - 1) % 2      AS g
        FROM hist GROUP BY l_returnflag
    ), bd AS (
        SELECT c.l_returnflag,
               min(CASE WHEN c.cum >= t.r THEN c.cents END)     AS a,
               min(CASE WHEN c.cum >= t.r + 1 THEN c.cents END) AS b,
               min(t.g) AS g
        FROM cum c JOIN th t USING (l_returnflag) GROUP BY c.l_returnflag
    ), nd AS (
        SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT)
               AS exact_parts
        FROM v GROUP BY l_returnflag
    )
    SELECT n.l_returnflag, n.exact_parts,
           TRUE AS parts_within_10pct,
           CAST(2 * d.a + d.g * (coalesce(d.b, d.a) - d.a) AS BIGINT)
               AS median_halfcents,
           TRUE AS median_rank_within_5pct
    FROM nd n JOIN bd d USING (l_returnflag)
    ORDER BY n.l_returnflag
    """,
    doc="Approx sketches under the hash gate: HLL distinct (cudf_streaming "
    "approx_distinct_count.hpp:42) and the t-digest quantile sketch "
    "(aggregation.hpp TDIGEST kind) -> approx_count_distinct / "
    "percentile_approx, both engine-specific by contract. Hashed output: "
    "exact NDV (own two-level distinct agg), exact median as half-cents "
    "integers from the rank rule on the cents histogram (keyed cumsum "
    "window, never global), and two integer envelope flags — "
    "10*|hll - exact| <= exact (5 sigma at rsd 0.02) and the approx "
    "median's rank bracket 100*cnt_lt < 55*n AND 100*cnt_le >= 45*n "
    "(GK accuracy 1000 => rank error <= 0.1%% << the 5%% bracket; "
    "cnt_lt/cnt_le bracketing is tie-proof where a single rank check is "
    "not). No float ever crosses the gate or a comparison.",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    # countDistinct must NOT share the aggregate with the percentile buffers:
    # the single-distinct rewrite Expands the stream 2x and drags the t-digest
    # / exact-percentile buffers over it (measured 18s -> 1s at sf0.1).
    # Exact distinct goes through its own two-level agg and a 3-row join.
    sk = v.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("cents", 0.5, 1000).alias("approx_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    exact = (
        v.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").cast("bigint").alias("exact_parts"))
    )
    # exact median in half-cents: the clean_winsorize rank-rule idiom
    # (keyed histogram, group-KEYED cumsum window, 3-row bound table)
    hist = v.groupBy("l_returnflag", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wk = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wk).cast("bigint"))
    th = hist.groupBy("l_returnflag").agg(
        F.expr("(sum(c) - 1) div 2 + 1").alias("r"),
        F.expr("(sum(c) - 1) % 2").alias("g"),
    )
    bd = (
        cum.join(th, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("r"), F.col("cents"))).alias("a"),
            F.min(F.when(F.col("cum") >= F.col("r") + 1, F.col("cents"))).alias("b"),
            F.min("g").alias("g"),
        )
        .select(
            "l_returnflag",
            (
                 2 * F.col("a")
                 + F.col("g") * (F.coalesce("b", "a") - F.col("a"))
            ).cast("bigint").alias("median_halfcents"),
        )
    )
    # rank bracket of the approx median: one more keyed pass over the
    # fact scan against the broadcast 3-row sketch table — integer
    # counts, tie-proof two-sided check
    rk = (
        v.join(F.broadcast(sk.select("l_returnflag", "approx_cents")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("approx_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_lt"),
            F.sum(F.when(F.col("cents") <= F.col("approx_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_le"),
        )
    )
    return (
        sk.join(exact, "l_returnflag")
        .join(F.broadcast(bd), "l_returnflag")
        .join(F.broadcast(rk), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            (
                10 * F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.col("exact_parts")
            ).alias("parts_within_10pct"),
            "median_halfcents",
            (
                (100 * F.col("cnt_lt") < 55 * F.col("n"))
                & (100 * F.col("cnt_le") >= 45 * F.col("n"))
            ).alias("median_rank_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "distinct_keep_last_none",
    oracle="""
    WITH keyed AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn_last,
               count(*) OVER (PARTITION BY o_custkey) AS grp_n
        FROM orders WHERE o_orderkey % 11 = 0)
    SELECT o_custkey, o_orderkey AS last_orderkey,
           round(o_totalprice, 2) AS last_totalprice,
           (grp_n = 1) AS kept_under_none
    FROM keyed WHERE rn_last = 1
    ORDER BY o_custkey
    """,
    doc="stable_distinct KEEP_LAST + KEEP_NONE "
    "(cudf stream_compaction.hpp:383 duplicate_keep_option — keep-first "
    "already covered by distinct_stable_first): last = row_number over "
    "the DESCENDING explicit order key; none = group survives only when "
    "its count is 1 (kept_under_none flag). One keyed window pass "
    "computes both.",
)
def distinct_keep_last_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    wc = Window.partitionBy("o_custkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn_last", F.row_number().over(w))
        .withColumn("grp_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn_last") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.round("o_totalprice", 2).alias("last_totalprice"),
            (F.col("grp_n") == 1).alias("kept_under_none"),
        )
        .orderBy("o_custkey")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag, l_quantity, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_quantity)
    SELECT l_returnflag,
           round(l_quantity, 2) AS modal_qty,
           CAST(n AS BIGINT) AS modal_n
    FROM counts
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) = 1
    ORDER BY l_returnflag
    """,
    doc="MODE aggregation with a DETERMINISTIC tie rule (most frequent "
    "value, ties -> smallest; pandas Series.mode / cudf mode semantics). "
    "Built as count + rank instead of Spark's F.mode, whose tie winner "
    "is engine-arbitrary — the portable form is two keyed shuffles with "
    "map-side partial counts.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.round("l_quantity", 2).alias("modal_qty"),
            F.col("n").cast("bigint").alias("modal_n"),
        )
        .orderBy("l_returnflag")
    )
