"""Datetime scalar-function coverage — libcudf datetime namespace
(cpp/src/datetime/, cpp/include/cudf/datetime.hpp; SURVEY §2.9) plus the
ceil/round-to-frequency and calendar helpers Spark lacks as builtins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.functions.datetime_fns import ceil_month, days_in_month, is_leap_year, round_month
from cudf_spark.queries.registry import register


@register(
    "dt_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS y,
           CAST(month(o_orderdate) AS INT)      AS mo,
           CAST(day(o_orderdate) AS INT)        AS d,
           CAST(quarter(o_orderdate) AS INT)    AS q,
           CAST(dayofyear(o_orderdate) AS INT)  AS doy,
           CAST(isodow(o_orderdate) AS INT)     AS iso_dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders ORDER BY o_orderkey
    """,
    doc="extract_datetime_component (datetime.hpp:32-57): year…weekday; "
    "ISO weekday = Spark weekday()+1; ISO week number.",
)
def dt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("o_orderdate").alias("woy"),
    ).orderBy("o_orderkey")


@register(
    "dt_extract_time",
    oracle="""
    SELECT event_id,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)   AS h,
           CAST(minute(CAST(ts AS TIMESTAMP)) AS INT) AS mi,
           CAST(second(CAST(ts AS TIMESTAMP)) AS INT) AS s,
           CAST((microsecond(CAST(ts AS TIMESTAMP)) % 1000000) // 1000 AS INT) AS msec
    FROM events ORDER BY event_id
    """,
    doc="sub-day component extraction on microsecond timestamps "
    "(datetime.hpp HOUR/MINUTE/SECOND/MILLISECOND).",
)
def dt_extract_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        # pmod, not %: Spark's % keeps the dividend's sign, so a
        # pre-1970 timestamp (negative unix_micros) would yield a
        # NEGATIVE millisecond while the oracle's microsecond() — and
        # any calendar reading — is always non-negative
        (F.pmod(F.unix_micros("ts"), F.lit(1_000_000)) / 1000)
        .cast("int")
        .alias("msec"),
    ).orderBy("event_id")


@register(
    "dt_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)      AS plus30d,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)     AS plus3mo,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)  AS days_since,
           (year(o_orderdate) * 12 + month(o_orderdate))
             - (1995 * 12 + 1)                              AS months_since
    FROM orders ORDER BY o_orderkey
    """,
    doc="calendar arithmetic: date_add / add_calendrical_months "
    "(datetime.hpp:132) / day + month deltas.",
)
def dt_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d.cast("date"), 30).alias("plus30d"),
        F.add_months(d.cast("date"), 3).alias("plus3mo"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        ((F.year(d) * 12 + F.month(d)) - (1995 * 12 + 1)).alias("months_since"),
    ).orderBy("o_orderkey")


@register(
    "dt_trunc_calendar",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
           CAST(date_trunc('week', o_orderdate) AS DATE)   AS week_start,
           CAST(last_day(o_orderdate) AS DATE)             AS month_end,
           CAST(CASE WHEN date_trunc('month', o_orderdate) = o_orderdate
                     THEN o_orderdate
                     ELSE date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
                END AS DATE)                               AS month_ceil,
           CAST(CASE WHEN day(o_orderdate) >= 16
                     THEN date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
                     ELSE date_trunc('month', o_orderdate)
                END AS DATE)                               AS month_round,
           (year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 != 0
                OR year(o_orderdate) % 400 = 0))           AS leap,
           CAST(day(last_day(o_orderdate)) AS INT)         AS dim
    FROM orders ORDER BY o_orderkey
    """,
    doc="floor/ceil/round to month (datetime.hpp:258-292), last_day (:80), "
    "is_leap_year (:189), days_in_month (:208).",
)
def dt_trunc_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.last_day(d).alias("month_end"),
        ceil_month(d).cast("date").alias("month_ceil"),
        round_month(d).cast("date").alias("month_round"),
        is_leap_year(d).alias("leap"),
        days_in_month(d).cast("int").alias("dim"),
    ).orderBy("o_orderkey")


@register(
    "dt_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y/%m/%d')        AS ymd,
           strftime(o_orderdate, '%d-%m-%Y')        AS dmy,
           strftime(o_orderdate, '%Y-%m')           AS ym
    FROM orders ORDER BY o_orderkey
    """,
    doc="from_timestamps formatting (strings/convert/convert_datetime.hpp:243) "
    "— strptime-dialect formats translated to JVM patterns by "
    "functions.strings.strptime_to_jvm.",
)
def dt_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.strings import strptime_to_jvm

    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, strptime_to_jvm("%Y/%m/%d")).alias("ymd"),
        F.date_format(d, strptime_to_jvm("%d-%m-%Y")).alias("dmy"),
        F.date_format(d, strptime_to_jvm("%Y-%m")).alias("ym"),
    ).orderBy("o_orderkey")


@register(
    "dt_month_sequence",
    oracle="""
    WITH months AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-01',
                                      INTERVAL 1 MONTH)) AS m
    )
    SELECT CAST(months.m AS DATE) AS month_start, count(o.o_orderkey) AS n_orders
    FROM months
    LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = months.m
    GROUP BY months.m
    ORDER BY month_start
    """,
    doc="calendrical_month_sequence (filling.hpp:232) → F.sequence + explode; "
    "left join keeps empty months.",
)
def dt_month_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m")
    )
    return (
        months.join(o, F.date_trunc("month", o.o_orderdate).cast("date") == F.col("m"), "left")
        .groupBy(F.col("m").alias("month_start"))
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("month_start")
    )


@register(
    "dt_bucket",
    oracle="""
    SELECT o_orderkey,
           CAST(least(greatest(floor((o_totalprice - 0) / 20000), 0), 4) AS INT) AS price_bucket
    FROM orders ORDER BY o_orderkey
    """,
    doc="label_bins / cut (labeling/label_bins.hpp:61, core/cut.py) — "
    "fixed-width bucketing as a pure expression (width_bucket minus "
    "out-of-range sentinels).",
)
def dt_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor((F.col("o_totalprice") - 0) / 20000), F.lit(0)), F.lit(4)
    ).cast("int")
    return o.select("o_orderkey", bucket.alias("price_bucket")).orderBy("o_orderkey")


@register(
    "dt_timezone",
    oracle="""
    SELECT o_orderkey,
           timezone('America/New_York', timezone('UTC', o_orderdate)) AS ny_local,
           timezone('Asia/Kolkata',     timezone('UTC', o_orderdate)) AS kolkata_local,
           timezone('UTC', timezone('America/New_York',
               timezone('America/New_York', timezone('UTC', o_orderdate)))) AS roundtrip
    FROM orders ORDER BY o_orderkey
    """,
    doc="Timezone conversion (cudf/timezone.hpp; Spark "
    "from_utc_timestamp/to_utc_timestamp): UTC→named-zone wall time across "
    "a DST boundary (NY) and a half-hour offset (Kolkata), plus the "
    "to_utc round-trip. DuckDB mirrors via ICU timezone() pairs.",
)
def dt_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ny = F.from_utc_timestamp(F.col("o_orderdate"), "America/New_York")
    return o.select(
        "o_orderkey",
        ny.alias("ny_local"),
        F.from_utc_timestamp(F.col("o_orderdate"), "Asia/Kolkata").alias("kolkata_local"),
        F.to_utc_timestamp(ny, "America/New_York").alias("roundtrip"),
    ).orderBy("o_orderkey")


@register(
    "dt_boundary_flags",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                         AS d,
           day(o_orderdate) = 1                              AS is_month_start,
           o_orderdate = last_day(o_orderdate)               AS is_month_end,
           month(o_orderdate) IN (1, 4, 7, 10)
               AND day(o_orderdate) = 1                      AS is_quarter_start,
           month(o_orderdate) = 1 AND day(o_orderdate) = 1   AS is_year_start,
           month(o_orderdate) = 12 AND day(o_orderdate) = 31 AS is_year_end,
           CAST(weekofyear(o_orderdate) AS INT)              AS week_iso
    FROM orders
    WHERE o_orderkey % 7 = 0
    ORDER BY o_orderkey
    """,
    doc="calendar boundary predicates (pandas/cudf Series.dt "
    "is_month_start/is_month_end/is_quarter_start/is_year_start/"
    "is_year_end properties; cudf datetime.hpp last_day:80 family) plus "
    "ISO week number — pure codegen date arithmetic, map-only.",
)
def dt_boundary_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("d"),
        (F.dayofmonth(d) == 1).alias("is_month_start"),
        (d.cast("date") == F.last_day(d)).alias("is_month_end"),
        (F.month(d).isin(1, 4, 7, 10) & (F.dayofmonth(d) == 1)).alias(
            "is_quarter_start"
        ),
        ((F.month(d) == 1) & (F.dayofmonth(d) == 1)).alias("is_year_start"),
        ((F.month(d) == 12) & (F.dayofmonth(d) == 31)).alias("is_year_end"),
        F.weekofyear(d).cast("int").alias("week_iso"),
    ).orderBy("o_orderkey")
