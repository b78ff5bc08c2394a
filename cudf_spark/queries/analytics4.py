"""Analytics, part 4 — round-5 continuation: privacy auditing, heavy-tail
diagnostics, and causal-inference heads.

- ``dq_k_anonymity``: the privacy-risk audit (Sweeney 2002 k-anonymity +
  Machanavajjhala 2007 l-diversity) over quasi-identifier groups —
  every count is an exact integer; risk thresholds k<5 / l<3 are the
  conventional re-identification fences.

- ``stats_hill_tail_index``: Hill estimator of the power-law tail
  exponent over the per-user activity distribution — the heavy-tail
  diagnostic that decides whether mean-based capacity planning is even
  valid. Order statistics by exact rank; per-item log terms are
  log2-based (the cross-engine-proven log) scaled by ln 2 as a literal
  double and nano-quantized at ITEM grain so the sum is order-free.

- ``events_did_estimator``: difference-in-differences on the 2x2
  (treated x post) design with exact cent moments per cell and a
  pooled independent-means standard error in one identical double
  expression — the experimentation head beside stats_ab_welch_t and
  stats_ratio_delta_method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register


@register(
    "dq_k_anonymity",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(round(value) AS BIGINT) // 10 AS vb,
               user_id
        FROM events
    ), grp AS (
        SELECT event_type, day, vb,
               CAST(count(*) AS BIGINT) AS k,
               CAST(count(DISTINCT user_id) AS BIGINT) AS l
        FROM q GROUP BY event_type, day, vb
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS rows_at_k_risk,
           CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_low_l
    FROM grp GROUP BY event_type ORDER BY event_type
    """,
    doc="k-anonymity / l-diversity privacy audit: quasi-identifier "
    "groups (event_type, day, value decile) scored by group size k and "
    "sensitive-attribute diversity l (distinct users); rows in groups "
    "with k < 5 are re-identifiable under the conventional fence, "
    "groups with l < 3 leak the sensitive value by elimination. One "
    "QI-keyed groupBy is the data pass; the audit is group grain. The "
    "release-gate check every anonymized-export pipeline runs.",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("CAST(round(value) AS BIGINT) div 10").alias("vb"),
        "user_id",
    )
    grp = q.groupBy("event_type", "day", "vb").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.countDistinct("user_id").cast("bigint").alias("l"),
    )
    return (
        grp.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_rows"),
            F.min("k").cast("bigint").alias("min_k"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_k_risk"),
            F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
            .cast("bigint")
            .alias("groups_low_l"),
        )
        .orderBy("event_type")
    )


_LN2 = 0.6931471805599453


@register(
    "stats_hill_tail_index",
    oracle=f"""
    WITH cnts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn,
               CAST((SELECT count(*) FROM cnts) AS BIGINT) AS n
        FROM cnts
    ), kk AS (
        SELECT least(100, n // 2) AS k, n FROM ranked LIMIT 1
    ), xmin AS (
        SELECT r.c AS xm FROM ranked r, kk WHERE r.rn = kk.k
    ), terms AS (
        SELECT CAST(floor(1000000000.0
                   * log2(CAST(r.c AS DOUBLE) / CAST(x.xm AS DOUBLE))
                   * {_LN2}) AS BIGINT) AS t9
        FROM ranked r, kk, xmin x
        WHERE r.rn < kk.k
    )
    SELECT kk.k, kk.n AS n_users, x.xm AS x_min,
           CAST(sum(t.t9) AS BIGINT) AS sum_ln_n9,
           CASE WHEN sum(t.t9) > 0
                THEN CAST((kk.k - 1) * 1000000000000000 // sum(t.t9)
                          AS BIGINT) END AS alpha_q6
    FROM terms t, kk, xmin x
    GROUP BY kk.k, kk.n, x.xm
    """,
    doc="Hill estimator of the power-law tail index over per-user "
    "activity counts (Hill 1975): alpha = (k-1) / sum ln(x_i/x_k) over "
    "the top-k order statistics (k = min(100, n/2), exact rank with "
    "user tiebreak). Log terms use log2 (the engine-proven log) scaled "
    "by ln2 as a shared double literal, nano-quantized at item grain "
    "so the sum is an order-free BIGINT; alpha by truncating integer "
    "division, NULL when the top-k plateau is flat (sum 0). User-grain "
    "count is the only data pass; order statistics live on the "
    "bounded top-k panel.",
)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = cnts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rw = Window.orderBy(F.desc("c"), "user_id")
    ranked = cnts.withColumn("rn", F.row_number().over(rw).cast("bigint")).crossJoin(
        F.broadcast(n)
    )
    kk = ranked.limit(1).select(
        F.least(F.lit(100), F.expr("n div 2")).cast("bigint").alias("k"), "n"
    )
    xmin = ranked.crossJoin(F.broadcast(kk.select("k"))).filter(
        F.col("rn") == F.col("k")
    ).select(F.col("c").alias("xm"))
    t9 = F.floor(
        1000000000.0
        * F.log2(F.col("c").cast("double") / F.col("xm").cast("double"))
        * _LN2
    ).cast("bigint")
    terms = (
        ranked.crossJoin(F.broadcast(kk.select("k")))
        .crossJoin(F.broadcast(xmin))
        .filter(F.col("rn") < F.col("k"))
        .select(t9.alias("t9"))
    )
    return (
        terms.agg(F.sum("t9").cast("bigint").alias("sum_ln_n9"))
        .crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(xmin))
        .select(
            "k",
            F.col("n").alias("n_users"),
            F.col("xm").alias("x_min"),
            "sum_ln_n9",
            F.when(
                F.col("sum_ln_n9") > 0,
                F.expr("(k - 1) * 1000000000000000 div sum_ln_n9"),
            )
            .cast("bigint")
            .alias("alpha_q6"),
        )
    )


@register(
    "events_did_estimator",
    oracle="""
    WITH cells AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS treated,
               CASE WHEN day(CAST(ts AS TIMESTAMP)) >= 16 THEN 1 ELSE 0 END
                   AS post,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), m AS (
        SELECT treated, post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM cells GROUP BY treated, post
    ), wide AS (
        SELECT
            max(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
            max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
            max(CASE WHEN treated = 1 AND post = 1 THEN ss END) AS ss11,
            max(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
            max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
            max(CASE WHEN treated = 1 AND post = 0 THEN ss END) AS ss10,
            max(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
            max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
            max(CASE WHEN treated = 0 AND post = 1 THEN ss END) AS ss01,
            max(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
            max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
            max(CASE WHEN treated = 0 AND post = 0 THEN ss END) AS ss00
        FROM m
    )
    SELECT CAST(n11 + n10 + n01 + n00 AS BIGINT) AS n_events,
           CAST(floor(CAST(s11 AS DOUBLE) / n11
                      - CAST(s10 AS DOUBLE) / n10
                      - CAST(s01 AS DOUBLE) / n01
                      + CAST(s00 AS DOUBLE) / n00) AS BIGINT) AS did_cents,
           CAST(floor(1000000.0 * sqrt(
                 (CAST(ss11 AS DOUBLE) / n11
                  - (CAST(s11 AS DOUBLE) / n11) * (CAST(s11 AS DOUBLE) / n11))
                     / n11
               + (CAST(ss10 AS DOUBLE) / n10
                  - (CAST(s10 AS DOUBLE) / n10) * (CAST(s10 AS DOUBLE) / n10))
                     / n10
               + (CAST(ss01 AS DOUBLE) / n01
                  - (CAST(s01 AS DOUBLE) / n01) * (CAST(s01 AS DOUBLE) / n01))
                     / n01
               + (CAST(ss00 AS DOUBLE) / n00
                  - (CAST(s00 AS DOUBLE) / n00) * (CAST(s00 AS DOUBLE) / n00))
                     / n00)) AS BIGINT) AS se_cents_q6
    FROM wide
    """,
    doc="difference-in-differences estimator on the 2x2 treated x post "
    "design (Card & Krueger's workhorse; treated = user parity, post = "
    "second half of the month — deterministic assignment for the "
    "gate): DiD = (T,post) - (T,pre) - (C,post) + (C,pre) on cell "
    "means from exact cent moments, pooled independent-means SE via "
    "the per-cell population variances in ONE identical double "
    "expression. One groupBy over 4 cells is the data pass. The "
    "pre-trend causal head beside stats_ab_welch_t.",
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.select(
        (F.col("user_id") % 2).cast("bigint").alias("treated"),
        F.when(F.dayofmonth("ts") >= 16, 1).otherwise(0).alias("post"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    m = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )

    def cell(t, p, c):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(c))
        ).alias(f"{c}{t}{p}")

    wide = m.agg(
        *[cell(t, p, c) for t in (1, 0) for p in (1, 0) for c in ("s", "n", "ss")]
    )
    d = lambda c: F.col(c).cast("double")

    def mean(t, p):
        return d(f"s{t}{p}") / F.col(f"n{t}{p}")

    def varterm(t, p):
        mu = mean(t, p)
        return (d(f"ss{t}{p}") / F.col(f"n{t}{p}") - mu * mu) / F.col(f"n{t}{p}")

    did = F.floor(mean(1, 1) - mean(1, 0) - mean(0, 1) + mean(0, 0)).cast("bigint")
    se = F.floor(
        1000000.0
        * F.sqrt(varterm(1, 1) + varterm(1, 0) + varterm(0, 1) + varterm(0, 0))
    ).cast("bigint")
    return wide.select(
        (F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00"))
        .cast("bigint")
        .alias("n_events"),
        did.alias("did_cents"),
        se.alias("se_cents_q6"),
    )
