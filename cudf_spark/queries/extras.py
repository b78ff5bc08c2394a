"""Duration arithmetic and structured JSON parsing — closing two remaining
type-surface rows: cudf duration types (cpp/include/cudf/wrappers/
durations.hpp; timestamps minus timestamps → duration_us) and schema-full
JSON decode (cudf io/json.hpp read_json), which is deeper than the
JSONPath-only ``get_json_object`` already covered by ``str_json``.

events.ts is stored as nanoseconds; Spark's parquet reader truncates to
microseconds, so oracles compare on ``CAST(ts AS TIMESTAMP)`` (DuckDB's
µs timestamp) and all duration math is done in integer microseconds —
exact on both engines, no interval-type stringification parity needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register


@register(
    "dt_durations",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gaps AS (
      SELECT user_id, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM e
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT)        AS n_gaps,
           max(gap_us)                          AS max_gap_us,
           min(gap_us)                          AS min_gap_us,
           CAST(sum(gap_us) AS BIGINT)          AS span_us,
           CAST(sum(gap_us) AS BIGINT) // 1000000 AS span_s,
           CAST(sum(CASE WHEN gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
                AS BIGINT)                      AS n_session_breaks
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
    doc="Duration arithmetic (durations.hpp; timestamps.hpp:54 — timestamp "
    "subtraction yields duration_us): per-user inter-event gaps via lag, "
    "duration aggregates, integer µs→s scale-down, and a 30-minute "
    "session-break count. One user_id-keyed shuffle; exact integer math.",
)
def dt_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.select("user_id", "event_id", "ts")
        .withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.sum("gap_us").alias("span_us"),
            F.expr("sum(gap_us) div 1000000").alias("span_s"),
            F.sum(
                F.when(F.col("gap_us") > 30 * 60 * 1000000, 1).otherwise(0)
            ).alias("n_session_breaks"),
        )
        .orderBy("user_id")
    )


@register(
    "str_json_struct",
    oracle="""
    SELECT event_id,
           -- json_valid guard: on malformed assembled JSON (NaN value,
           -- quote/backslash in event_type) Spark's PERMISSIVE
           -- from_json nulls the struct, while an unguarded
           -- json_extract would ABORT the whole oracle run
           CASE WHEN json_valid(js)
                THEN CAST(json_extract_string(js, '$.et') AS VARCHAR) END AS et,
           CASE WHEN json_valid(js)
                THEN CAST(json_extract(js, '$.v') AS DOUBLE) END          AS v,
           CASE WHEN json_valid(js)
                THEN CAST(json_extract(js, '$.k') AS INT) END             AS k,
           CASE WHEN json_valid(js)
                THEN CAST(json_array_length(json_extract(js, '$.tags'))
                          AS INT) END                                     AS n_tags,
           CASE WHEN json_valid(js)
                THEN CAST(json_extract_string(js, '$.tags[0]') AS VARCHAR)
           END                                                            AS tag0
    FROM (
      SELECT event_id,
             '{"et":"' || event_type || '","v":' || CAST(value AS VARCHAR)
               || ',"k":' || json_extract_string(props, '$.k')
               || ',"tags":["' || event_type || '","u' || CAST(user_id AS VARCHAR)
               || '"]}' AS js
      FROM events
    ) ORDER BY event_id
    """,
    doc="Schema-full JSON decode (io/json.hpp read_json semantics on a "
    "column): a nested document (string/double/int fields + array) is "
    "assembled per row, then parsed back through from_json with an "
    "explicit schema — struct field access and array element extraction, "
    "all JVM-side. The doc is built by concat (not to_json); each engine "
    "renders the double with its own cast (Spark writes 1.0E7 where "
    "DuckDB writes 10000000.0) but both strings parse back to the "
    "identical DOUBLE, and the v column is compared as that double — "
    "formatting never crosses the hash gate. Malformed assembled JSON "
    "(NaN value, quotes in event_type) nulls the row on BOTH engines.",
)
def str_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"et":"'),
        F.col("event_type"),
        F.lit('","v":'),
        F.col("value").cast("string"),
        F.lit(',"k":'),
        F.get_json_object("props", "$.k"),
        F.lit(',"tags":["'),
        F.col("event_type"),
        F.lit('","u'),
        F.col("user_id").cast("string"),
        F.lit('"]}'),
    )
    parsed = F.from_json(
        js, "et STRING, v DOUBLE, k INT, tags ARRAY<STRING>"
    )
    return (
        e.select("event_id", parsed.alias("p"))
        .select(
            "event_id",
            F.col("p.et").alias("et"),
            F.col("p.v").alias("v"),
            F.col("p.k").alias("k"),
            F.size("p.tags").cast("int").alias("n_tags"),
            F.element_at("p.tags", 1).alias("tag0"),
        )
        .orderBy("event_id")
    )


@register(
    "interpolate_linear",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS idx
      FROM events
    ),
    f AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wp AS prev_i,
        first_value(v IGNORE NULLS) OVER wn AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wn AS next_i
      FROM b
      WINDOW wp AS (PARTITION BY user_id ORDER BY idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY idx
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, (v IS NULL) AS was_null,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN prev_v IS NULL THEN NULL
                      WHEN next_v IS NULL THEN prev_v
                      ELSE prev_v + (next_v - prev_v) * (idx - prev_i) * 1.0
                                    / (next_i - prev_i)
                 END, 4) AS v_interp
    FROM f ORDER BY event_id
    """,
    doc="Linear interpolation of nulls (cudf Series.interpolate, pandas "
    "method='linear' semantics: leading nulls stay null, trailing nulls "
    "forward-fill): per-user last/next non-null bracketing via "
    "ignorenulls window frames, then the linear blend. Fixtures carry no "
    "nulls, so event_id % 7 == 3 is nulled deterministically first. One "
    "user-keyed shuffle; both frame scans share it.",
)
def interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = (
        F.when(F.col("event_id") % 7 == 3, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select("user_id", "event_id", "ts", v.alias("v")).withColumn(
        "idx", F.row_number().over(w)
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("v", ignorenulls=True).over(wp)
    prev_i = F.last(F.when(F.col("v").isNotNull(), F.col("idx")), ignorenulls=True).over(wp)
    next_v = F.first("v", ignorenulls=True).over(wn)
    next_i = F.first(F.when(F.col("v").isNotNull(), F.col("idx")), ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v) * (F.col("idx") - prev_i) / (next_i - prev_i)
        )
    )
    return (
        base.select(
            "event_id",
            "user_id",
            F.col("v").isNull().alias("was_null"),
            F.round(interp, 4).alias("v_interp"),
        )
        .orderBy("event_id")
    )


@register(
    "events_funnel_stages",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    s1 AS (
        SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view'
        GROUP BY user_id),
    s2 AS (
        SELECT ev.user_id, min(ev.ts) AS t2
        FROM ev JOIN s1 ON ev.user_id = s1.user_id
        WHERE ev.event_type = 'click'
          AND ev.ts > s1.t1 AND ev.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY ev.user_id),
    s3 AS (
        SELECT ev.user_id, min(ev.ts) AS t3
        FROM ev JOIN s2 ON ev.user_id = s2.user_id
        WHERE ev.event_type = 'purchase'
          AND ev.ts > s2.t2 AND ev.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY ev.user_id),
    counts AS (
        SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS users FROM s1
        UNION ALL
        SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM s3),
    top AS (SELECT CAST(count(*) AS BIGINT) AS n_top FROM s1)
    SELECT stage, step, users,
           -- nullif: an empty funnel top (no 'view' events at all) makes
           -- the share undefined, not a crash (r11 fuzz: ANSI
           -- DIVIDE_BY_ZERO on the Spark side, NaN-cast on DuckDB's)
           CAST(floor(users * 10000.0 / nullif(top.n_top, 0)) AS BIGINT)
               AS pct_top_q4
    FROM counts CROSS JOIN top ORDER BY stage
    """,
    doc="ordered time-bounded funnel (view -> click within 24h -> "
    "purchase within 24h, per user): each stage is the min event time "
    "strictly after the previous stage's time and inside the conversion "
    "window — the sequential-pattern query every event warehouse runs. "
    "Three user-keyed min-aggregations chained by user-keyed joins; no "
    "per-user collect, no global window (the top-of-funnel scalar "
    "broadcasts); each stage's intermediate is <= one row per user.",
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")
    # s1 feeds s2, the counts union AND the top-of-funnel scalar; s2
    # feeds s3 and the union — materialize each once instead of
    # re-running the events scan + groupBy per consumer
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("users"))
        .select(F.lit(1).alias("stage"), F.lit("view").alias("step"), "users")
        .unionByName(
            s2.agg(F.count(F.lit(1)).cast("bigint").alias("users")).select(
                F.lit(2).alias("stage"), F.lit("view>click").alias("step"), "users"
            )
        )
        .unionByName(
            s3.agg(F.count(F.lit(1)).cast("bigint").alias("users")).select(
                F.lit(3).alias("stage"),
                F.lit("view>click>purchase").alias("step"),
                "users",
            )
        )
    )
    top = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_top"))
    return (
        counts.crossJoin(F.broadcast(top))
        .select(
            "stage",
            "step",
            "users",
            F.floor(
                F.col("users") * 10000.0 / F.nullif(F.col("n_top"), F.lit(0))
            )
            .cast("bigint")
            .alias("pct_top_q4"),
        )
        .orderBy("stage")
    )


@register(
    "scd2_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer),
    updates AS (
        -- changed rows: every 7th customer gets +$10
        SELECT c_custkey, c_nationkey, bal_cents + 1000 AS bal_cents
        FROM base WHERE c_custkey % 7 = 0
        UNION ALL
        -- inserts: every 97th customer spawns a new key; NEGATED so the
        -- synthetic key can never collide with a real c_custkey at any
        -- SF (a fixed additive offset collides once keys pass it)
        SELECT -c_custkey, c_nationkey, bal_cents
        FROM base WHERE c_custkey % 97 = 0),
    closed AS (
        SELECT b.c_custkey, b.c_nationkey, b.bal_cents,
               1 AS valid_from, 2 AS valid_to, FALSE AS is_current
        FROM base b WHERE EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = b.c_custkey)),
    untouched AS (
        SELECT b.c_custkey, b.c_nationkey, b.bal_cents,
               1 AS valid_from, CAST(NULL AS INT) AS valid_to, TRUE AS is_current
        FROM base b WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = b.c_custkey)),
    fresh AS (
        SELECT c_custkey, c_nationkey, bal_cents,
               2 AS valid_from, CAST(NULL AS INT) AS valid_to, TRUE AS is_current
        FROM updates)
    SELECT c_custkey, c_nationkey, bal_cents,
           CAST(valid_from AS INT) AS valid_from, valid_to, is_current
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM untouched
          UNION ALL SELECT * FROM fresh)
    ORDER BY c_custkey, valid_from
    """,
    doc="SCD2 merge/upsert (slowly-changing-dimension type 2 — the "
    "lakehouse MERGE INTO pattern, Kimball dimensional modeling; beyond "
    "the reference's scope but table-maintenance a production pipeline "
    "needs): changed keys close their old version (valid_to set, "
    "is_current false) and append the new one; unmatched keys insert; "
    "untouched rows stay open. Composed as semi-join (close) + "
    "anti-join (keep) + union (append) — three key-keyed passes, no "
    "full-outer row explosion, exact integer cents.",
)
def scd2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    updates = (
        base.filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", "c_nationkey", (F.col("bal_cents") + 1000).alias("bal_cents"))
        .unionByName(
            base.filter(F.col("c_custkey") % 97 == 0).select(
                (-F.col("c_custkey")).alias("c_custkey"),
                "c_nationkey",
                "bal_cents",
            )
        )
    )
    ukeys = updates.select("c_custkey").distinct()
    closed = (
        base.join(ukeys, "c_custkey", "left_semi")
        .withColumn("valid_from", F.lit(1))
        .withColumn("valid_to", F.lit(2).cast("int"))
        .withColumn("is_current", F.lit(False))
    )
    untouched = (
        base.join(ukeys, "c_custkey", "left_anti")
        .withColumn("valid_from", F.lit(1))
        .withColumn("valid_to", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
    )
    fresh = (
        updates.withColumn("valid_from", F.lit(2))
        .withColumn("valid_to", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
    )
    return (
        closed.unionByName(untouched)
        .unionByName(fresh)
        .select(
            "c_custkey",
            "c_nationkey",
            "bal_cents",
            F.col("valid_from").cast("int").alias("valid_from"),
            "valid_to",
            "is_current",
        )
        .orderBy("c_custkey", "valid_from")
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    cohort AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_wk
        FROM ev GROUP BY user_id),
    activity AS (
        SELECT DISTINCT ev.user_id,
               CAST(floor(epoch(ev.ts) / 604800) AS BIGINT) AS wk
        FROM ev),
    sizes AS (
        SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_n
        FROM cohort GROUP BY cohort_wk),
    cells AS (
        SELECT c.cohort_wk, CAST(a.wk - c.cohort_wk AS INT) AS wk_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY c.cohort_wk, a.wk - c.cohort_wk)
    SELECT cells.cohort_wk AS cohort_wk, cells.wk_offset, cells.active_users, sizes.cohort_n,
           CAST(floor(cells.active_users * 10000.0 / sizes.cohort_n) AS BIGINT)
               AS retention_bps
    FROM cells JOIN sizes ON cells.cohort_wk = sizes.cohort_wk
    ORDER BY cells.cohort_wk, wk_offset
    """,
    doc="weekly cohort retention matrix (the standard warehouse cohort "
    "analysis): cohort = epoch-week of each user's first event, cell = "
    "distinct active users at each week offset, retention in basis "
    "points of the cohort size. Shapes: one user-keyed min (cohorts), "
    "one distinct (activity), one user-keyed join + (cohort, offset) "
    "aggregate — matrix size is weeks x weeks regardless of data "
    "volume; epoch-week integer division keeps bucketing exact.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    wk = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("bigint")
    cohort = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", wk(F.col("first_ts")).alias("cohort_wk"))
        .localCheckpoint(eager=False)  # feeds sizes AND the cells join
    )
    activity = ev.select("user_id", wk(F.col("ts")).alias("wk")).distinct()
    sizes = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_n")
    )
    cells = (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).cast("int").alias("wk_offset")
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    return (
        cells.join(sizes, "cohort_wk")
        .select(
            "cohort_wk",
            "wk_offset",
            "active_users",
            "cohort_n",
            F.floor(F.col("active_users") * 10000.0 / F.col("cohort_n"))
            .cast("bigint")
            .alias("retention_bps"),
        )
        .orderBy("cohort_wk", "wk_offset")
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH e AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL),
    c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY event_type),
    r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        FROM e),
    med AS (
        -- exact DISCRETE (lower) median: the k-th smallest VALUE — an
        -- actual data double, so both engines agree bit-for-bit (ties in
        -- `value` don't matter: any rn assignment yields the same value)
        SELECT r.event_type, r.value AS med
        FROM r JOIN c USING (event_type) WHERE r.rn = (c.n + 1) // 2),
    d AS (
        SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
        FROM e JOIN med m USING (event_type)),
    r2 AS (
        SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn
        FROM d),
    mad AS (
        SELECT r2.event_type, r2.dev AS mad
        FROM r2 JOIN c USING (event_type) WHERE r2.rn = (c.n + 1) // 2),
    anom AS (
        SELECT d.event_type,
               CAST(count(*) FILTER (WHERE d.dev > 5 * a.mad) AS BIGINT) AS n_anomalies
        FROM d JOIN mad a USING (event_type) GROUP BY d.event_type)
    SELECT c.event_type, c.n,
           CAST(floor(m.med * 1000000) AS BIGINT) AS med_q6,
           CAST(floor(a.mad * 1000000) AS BIGINT) AS mad_q6,
           anom.n_anomalies
    FROM c JOIN med m USING (event_type) JOIN mad a USING (event_type)
           JOIN anom USING (event_type)
    ORDER BY c.event_type
    """,
    doc="grouped robust anomaly detection: per-key exact discrete median "
    "and MAD (median absolute deviation — Hampel's robust scale, public "
    "statistics), flagging |x - med| > 5*MAD. Discrete (k-th smallest) "
    "medians are actual data doubles, so med/MAD/threshold are "
    "bit-identical cross-engine with no interpolation or fold drift. "
    "Plan: two per-key window sorts + keyed joins — no global sort, no "
    "collect; at 100 TB swap the exact medians for approx_percentile "
    "when tolerance allows, the shape stays keyed either way. The "
    "reference's groupby quantiles (quantiles.hpp) cover the same "
    "surface with interpolation=NEAREST.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    c = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def disc_median(df, col, out):
        w = Window.partitionBy("event_type").orderBy(col)
        return (
            df.withColumn("rn", F.row_number().over(w))
            .join(c, "event_type")
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = disc_median(e, "value", "med")
    d = e.join(med, "event_type").withColumn("dev", F.abs(F.col("value") - F.col("med")))
    mad = disc_median(d.select("event_type", F.col("dev").alias("value")), "value", "mad")
    anom = (
        d.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("dev") > 5 * F.col("mad")).cast("long"))
            .cast("bigint")
            .alias("n_anomalies")
        )
    )
    return (
        c.join(med, "event_type")
        .join(mad, "event_type")
        .join(anom, "event_type")
        .select(
            "event_type",
            "n",
            F.floor(F.col("med") * 1e6).cast("bigint").alias("med_q6"),
            F.floor(F.col("mad") * 1e6).cast("bigint").alias("mad_q6"),
            "n_anomalies",
        )
        .orderBy("event_type")
    )


@register(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events),
    r AS (
        SELECT user_id, d,
               row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM days),
    isl AS (SELECT user_id, d - CAST(rn AS INTEGER) AS anchor FROM r),
    g AS (
        SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, anchor)
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM g GROUP BY user_id ORDER BY user_id
    """,
    doc="consecutive-day activity streaks per user — the gaps-and-islands "
    "idiom (island anchor = day minus per-user day rank, a date constant "
    "within each consecutive run): distinct active days -> one keyed "
    "window rank -> keyed island aggregate. Pure integer/date arithmetic "
    "end to end (no float anywhere). 100 TB: the distinct() and both "
    "groupBys are user-keyed; nothing global. Complements the time-gap "
    "sessionization family (stream_sessions) with the calendar-grain "
    "engagement metric retention dashboards use.",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    r = days.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    )
    isl = r.select("user_id", F.expr("date_sub(d, rn)").alias("anchor"))
    g = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user_id")
    )
