"""Batch-equivalent oracle queries for the streaming operators.

cudf has no event-time windowing to diff against (SURVEY §2.12), so the
correctness strategy is: run the SAME operator function on the batch frame
(this module — oracle-checked against DuckDB), and separately drive it
through a real micro-batch stream asserting stream == batch
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.operators.sketches import cms_oracle_cell_sql, cms_oracle_cells_sql
from cudf_spark.queries.registry import register
from cudf_spark.streaming.ops import (
    await_available_now,
    latest_update_rows,
    sessionized,
    sliding_counts,
    tumbling_counts,
)


@register(
    "stream_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S')  AS window_start,
           event_type,
           count(*)                        AS n,
           round(sum(value), 2)            AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="tumbling event-time window aggregate (F.window) — batch form of "
    "the watermarked streaming agg.",
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return tumbling_counts(e).orderBy("window_start", "event_type")


@register(
    "stream_sliding_halfhour",
    oracle="""
    WITH grid AS (
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d %H:%M:%S') AS window_start, event_type FROM events
        UNION ALL
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP), INTERVAL 30 MINUTE),
                        '%Y-%m-%d %H:%M:%S') AS window_start, event_type FROM events
    )
    SELECT window_start, event_type, count(*) AS n
    FROM grid GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="sliding window (1h width, 30m slide) — each event lands in exactly "
    "two offset tumbling grids; the oracle reconstructs them explicitly.",
)
def stream_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return sliding_counts(e).orderBy("window_start", "event_type")


@register(
    "stream_sessions",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S')                     AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*)                                                    AS n_events,
           round(sum(value), 2)                                        AS total
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="session windows, 30m gap (F.session_window in batch; the oracle is "
    "the classic lag + cumsum sessionization — session end = last event + gap).",
)
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return sessionized(e).orderBy("user_id", "session_start")


@register(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type,
           strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
           count(*) AS n_suppressed
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    doc="keep-first dedup per (user, event_type): the batch contract behind "
    "dropDuplicatesWithinWatermark (streaming form tested in "
    "tests/test_streaming.py).",
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
            F.count("*").alias("n_suppressed"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "stream_interval_join",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           p.value AS value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    ORDER BY 1, 2, 3
    """,
    doc="stream-stream interval join (click -> purchase attribution within "
    "30 min per user): watermarked symmetric hash join with bounded state "
    "on streams (tests/test_streaming.py); equi-join + range residual in "
    "batch — this oracle-checked batch form.",
)
def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.streaming.ops import stream_interval_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    j = stream_interval_join(
        clicks, purchases, [("c_user", "p_user")], left_ts="c_ts", right_ts="p_ts"
    )
    return j.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "value",
    ).orderBy("user_id", "click_id", "purchase_id")


@register(
    "events_time_rollup",
    oracle="""
    SELECT CAST(year(CAST(ts AS TIMESTAMP)) AS INT)  AS y,
           CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS m,
           CAST(day(CAST(ts AS TIMESTAMP)) AS INT)   AS d,
           CAST(grouping(CAST(year(CAST(ts AS TIMESTAMP)) AS INT)) AS INT)  AS g_y,
           CAST(grouping(CAST(month(CAST(ts AS TIMESTAMP)) AS INT)) AS INT) AS g_m,
           CAST(grouping(CAST(day(CAST(ts AS TIMESTAMP)) AS INT)) AS INT)   AS g_d,
           count(*)            AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY ROLLUP (CAST(year(CAST(ts AS TIMESTAMP)) AS INT),
                     CAST(month(CAST(ts AS TIMESTAMP)) AS INT),
                     CAST(day(CAST(ts AS TIMESTAMP)) AS INT))
    HAVING count(*) > 0  -- empty-input () row: Spark emits none (r11 fuzz)
    ORDER BY y NULLS FIRST, m NULLS FIRST, d NULLS FIRST
    """,
    doc="time-hierarchy rollup (the hypertable continuous-aggregate "
    "pattern): year/month/day ROLLUP over the event stream in one pass — "
    "each upper level is a partial re-aggregation, not a rescan; the "
    "streaming form is the tumbling-window agg feeding the same rollup.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        "value",
    )
    return (
        e.rollup("y", "m", "d")
        .agg(
            F.grouping("y").cast("int").alias("g_y"),
            F.grouping("m").cast("int").alias("g_m"),
            F.grouping("d").cast("int").alias("g_d"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy(F.asc_nulls_first("y"), F.asc_nulls_first("m"), F.asc_nulls_first("d"))
    )


@register(
    "stream_enrich_static",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S')  AS window_start,
           CASE WHEN user_id % 3 = 0 THEN 'gold'
                WHEN user_id % 3 = 1 THEN 'silver'
                ELSE 'bronze' END          AS tier,
           count(*)                        AS n,
           round(sum(value), 2)            AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Stream-static enrichment join (fact stream x user dim, stateless "
    "per-batch broadcast) + tumbling rollup per tier — batch form of the "
    "streaming lookup pattern; stream==batch asserted in "
    "tests/test_streaming.py.",
)
def stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.streaming.ops import enrich_with_static, user_tier_dim

    e = load(spark, sf_dir, "events")
    return enrich_with_static(e, user_tier_dim(spark, sf_dir)).orderBy(
        "window_start", "tier"
    )


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           -- coalesce: the stateful accumulator INITIALIZES total to 0.0
           -- (state.exists else (0, 0.0)) and pandas' NaN-skipping sum
           -- leaves it there for a user whose values are all NULL, while
           -- SQL sum yields NULL — the accumulator's zero-start IS the
           -- operator contract, so the oracle declares it (r11 fuzz,
           -- seed 10 all-null value column)
           round(coalesce(sum(value), 0.0), 2) AS total
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Custom stateful streaming operator DRIVEN THROUGH A REAL "
    "MICRO-BATCH STREAM inside the query: applyInPandasWithState "
    "(streaming_groupby.cpp:21-33 accumulate/merge/finalize with "
    "user-managed state) over the events file source, availableNow "
    "trigger, memory sink; the last update per user is the final state "
    "and must hash-match the plain batch aggregate oracle. The one "
    "registry entry that proves the stateful streaming path end-to-end "
    "rather than via its batch twin.",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from cudf_spark.streaming.ops import events_stream, stateful_running_totals

    name = "mem_stateful_" + uuid.uuid4().hex[:8]
    q = (
        stateful_running_totals(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_available_now(q, "stream_stateful_totals")
    return (
        latest_update_rows(spark.table(name), ["user_id"], "n")
        .select("user_id", "n", F.round("total", 2).alias("total"))
        .orderBy("user_id")
    )


# transformWithState's Python state-server protocol needs google.protobuf,
# absent from this container (environment ask, recorded in COVERAGE.md).
# The operator (streaming/ops.py:stateful_topk) is complete; the query
# self-activates the moment protobuf appears on the path.
import importlib.util as _ilu

try:
    _HAS_PROTOBUF = _ilu.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False

_register_topk = register if _HAS_PROTOBUF else (lambda *a, **k: (lambda f: f))


@_register_topk(
    "stream_stateful_topk",
    oracle="""
    WITH ranked AS (
        SELECT user_id, value, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events)
    SELECT user_id,
           (SELECT CAST(count(*) AS BIGINT) FROM events e
            WHERE e.user_id = ranked.user_id) AS n,
           round(max(CASE WHEN rn = 1 THEN value END), 2) AS v1,
           round(max(CASE WHEN rn = 2 THEN value END), 2) AS v2,
           round(max(CASE WHEN rn = 3 THEN value END), 2) AS v3
    FROM ranked GROUP BY user_id ORDER BY user_id
    """,
    doc="Per-user top-3 event values through a REAL micro-batch stream on "
    "the transformWithState API (Spark 4.x arbitrary state: ListState of "
    "(value, event_id) pairs + ValueState counter, availableNow trigger, "
    "memory sink; streaming/ops.py:stateful_topk). State is bounded at "
    "k rows per user, so operator memory is O(users*k) for any stream "
    "length. Final state = highest-n emission per user; hash-matched "
    "against the batch window-rank oracle.",
)
def stream_stateful_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from cudf_spark.streaming.ops import events_stream, stateful_topk

    name = "mem_topk_" + uuid.uuid4().hex[:8]
    q = (
        stateful_topk(events_stream(spark, sf_dir), k=3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_available_now(q, "stream_stateful_topk")
    return (
        latest_update_rows(spark.table(name), ["user_id"], "n")
        .select(
            "user_id",
            "n",
            F.round("v1", 2).alias("v1"),
            F.round("v2", 2).alias("v2"),
            F.round("v3", 2).alias("v3"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_cms_heavy_hitters",
    oracle=f"""
    WITH u AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
    exact AS (SELECT v, CAST(count(*) AS BIGINT) AS exact_cnt FROM u GROUP BY v),
    {cms_oracle_cells_sql()},
    top AS (
        -- tie-break on the NUMERIC id: v is VARCHAR here and string
        -- order ("100" < "99") diverges from Spark's long order at the
        -- rank-10 boundary (bit at sf0.1)
        SELECT v, exact_cnt,
               row_number() OVER (ORDER BY exact_cnt DESC, CAST(v AS BIGINT)) AS rk
        FROM exact QUALIFY rk <= 10),
    probe AS (
        SELECT top.v, top.exact_cnt, min(coalesce(cells.cnt, 0)) AS cms_est
        FROM top CROSS JOIN rows_
        LEFT JOIN cells ON cells.r = rows_.r
             AND cells.c = {cms_oracle_cell_sql('top.v')}
        GROUP BY 1, 2)
    SELECT CAST(v AS BIGINT) AS user_id, exact_cnt, cms_est
    FROM probe ORDER BY exact_cnt DESC, user_id
    """,
    doc="STREAMING incremental heavy hitters: events split into 4 files "
    "and replayed as a REAL micro-batch stream (maxFilesPerTrigger=1, "
    "availableNow); each batch builds its own count-min sketch in "
    "foreachBatch, only the <=depth*width sketch rows leave the batch, "
    "and the sum-merged sketch must equal the one-shot batch sketch the "
    "oracle replays — cms(A∪B)==merge(cms(A),cms(B)) proven through an "
    "actual incremental pipeline, not just the unit test. The streaming "
    "form of the persisted-sketch workflow (streaming_groupby.cpp "
    "accumulate/merge/finalize). Oracle CMS replay from the shared "
    "cms_oracle_cells_sql fragment (single source with the batch CMS "
    "query).",
)
def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cudf_spark.operators.sketches import cms_build, cms_estimate

    ev = load(spark, sf_dir, "events").select("user_id")
    tmp = tempfile.mkdtemp(prefix="cms_stream_")
    try:
        ev.repartition(4).write.mode("overwrite").parquet(tmp)
        parts: list = []

        def per_batch(bdf, _bid):
            # sketch rows ONLY cross the batch boundary (<= 4k rows)
            parts.append(cms_build(bdf, [], "user_id").collect())

        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q, "stream_cms_heavy_hitters")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    merged = (
        spark.createDataFrame(
            [(r["r"], r["c"], r["cnt"]) for p in parts for r in p],
            "r int, c int, cnt long",
        )
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(10)
    )
    est = cms_estimate(merged, top.select("user_id"), [], "user_id")
    return (
        top.join(est, "user_id")
        .select("user_id", "exact_cnt", F.col("est").alias("cms_est"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


@register(
    "stream_interval_join_outer",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           p.event_id IS NOT NULL AS matched
    FROM events c
    LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click'
    ORDER BY 1, 2, 3
    """,
    doc="stream-stream LEFT OUTER interval join (unattributed-click "
    "detection): clicks with no purchase within 30 min null-extend — "
    "the state-eviction-hard half of stream-stream joins (an unmatched "
    "row is only FINAL when the watermark passes its interval, so "
    "outer emission trails by the watermark; proven stream==batch with "
    "a sentinel watermark flush in tests/test_streaming.py). Batch "
    "form: keyed left join + range residual, never a nested loop.",
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.streaming.ops import stream_interval_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    j = stream_interval_join(
        clicks,
        purchases,
        [("c_user", "p_user")],
        left_ts="c_ts",
        right_ts="p_ts",
        how="left_outer",
    )
    return j.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("purchase_id").isNotNull().alias("matched"),
    ).orderBy("user_id", "click_id", "purchase_id")


def _curation_oracle() -> str:
    from cudf_spark.queries.text6 import _QUALITY_CTES

    return f"""
    WITH {_QUALITY_CTES},
    gated AS (
        SELECT d.doc_id, d.source, md5(d.text) AS dig
        FROM documents d JOIN scored s ON d.doc_id = s.doc_id
        WHERE s.z > 0),
    first_ AS (SELECT dig, min(doc_id) AS doc_id FROM gated GROUP BY dig),
    kept AS (
        SELECT g.source, g.doc_id
        FROM gated g JOIN first_ f ON g.dig = f.dig AND g.doc_id = f.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT)    AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY source ORDER BY source
    """


@register(
    "stream_curation_incremental",
    oracle=_curation_oracle(),
    doc="STREAMING curation: documents replayed as a REAL micro-batch "
    "stream (3 doc_id-range files with strictly ordered mtimes, "
    "maxFilesPerTrigger=1, availableNow); each foreachBatch applies the "
    "quality-classifier gate, dedups exactly within the batch (min "
    "doc_id per md5 digest), then digest-ANTI-JOINS against the "
    "accumulated parquet state table and appends only genuinely new "
    "digests — keep-FIRST-ARRIVAL across batches, the incremental form "
    "of curation_pipeline_v2's exact-dedup stage and the cross-run "
    "workflow of dedup_exact_crossrun, proven through an actual "
    "incremental pipeline. Because batches are doc_id-ordered, the end "
    "state must equal the one-shot batch rule (min doc_id per digest), "
    "which the oracle replays; id_sum pins the exact surviving doc set. "
    "100 TB: driver holds only paths — state is a digest-keyed parquet "
    "table, every per-batch op is digest-/doc-keyed.",
)
def stream_curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from cudf_spark.queries.text6 import _quality_z

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    tmp = tempfile.mkdtemp(prefix="curation_stream_")
    src, state = os.path.join(tmp, "src"), os.path.join(tmp, "state")
    try:
        # 1-row collect: integer id-range thirds pick the batch cuts
        # (any deterministic split works — the end state is
        # batch-invariant; collecting all ids would not scale, a 1-row
        # min/max always does, and pure integer arithmetic means no
        # float percentile ever crosses a filter)
        span = d.agg(
            F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
        ).collect()[0]
        if span["mn"] is None:  # empty documents table: nothing to stream
            return spark.createDataFrame(
                [], "source string, n_kept bigint, id_sum bigint"
            )
        mn, mx = int(span["mn"]), int(span["mx"])
        width = mx - mn + 1
        cuts = [mn + width // 3, mn + (2 * width) // 3]
        batches = [
            d.filter(F.col("doc_id") < cuts[0]),
            d.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
            d.filter(F.col("doc_id") >= cuts[1]),
        ]
        from cudf_spark.streaming.ops import write_ordered_batch

        for seq, b in enumerate(batches):
            write_ordered_batch(b, src, seq)

        def per_batch(bdf, _bid):
            gated = bdf.join(
                _quality_z(bdf).filter(F.col("z") > 0).select("doc_id"), "doc_id"
            )
            w = gated.select("doc_id", "source", F.md5("text").alias("dig"))
            first = w.groupBy("dig").agg(F.min("doc_id").alias("doc_id"))
            batch_kept = w.join(first, ["dig", "doc_id"])
            if os.path.isdir(state) and glob.glob(os.path.join(state, "*.parquet")):
                seen = bdf.sparkSession.read.parquet(state).select("dig")
                batch_kept = batch_kept.join(seen, "dig", "left_anti")
            batch_kept.write.mode("append").parquet(state)

        q = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q, "stream_curation_incremental")
        kept = spark.read.parquet(state).select("source", "doc_id")
        # materialize before rmtree pulls the state files away
        rows = kept.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        ).orderBy("source").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(r["source"], r["n_kept"], r["id_sum"]) for r in rows],
        "source string, n_kept bigint, id_sum bigint",
    ).orderBy("source")


@register(
    "stream_late_arrival_audit",
    oracle="""
    WITH e AS (
        SELECT event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               epoch_us(CAST(ts AS TIMESTAMP))
                   + (event_id % 7) * 300000000 AS arr
        FROM events
    ), gb AS (
        SELECT us, (day(make_timestamp(arr)) - 1) // 10 AS g FROM e
    ), agg AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n, max(us) AS mx
        FROM gb GROUP BY g
    ), wm AS (
        SELECT g, n, mx,
               max(mx) OVER (ORDER BY g
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) - 600000000 AS wm
        FROM agg
    )
    SELECT w.g AS batch, w.n AS n_rows,
           CAST(w.mx AS BIGINT) AS max_event_us,
           CAST(coalesce(sum(CASE WHEN gb.us < w.wm THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_late
    FROM wm w LEFT JOIN gb ON gb.g = w.g
    GROUP BY w.g, w.n, w.mx
    ORDER BY w.g
    """,
    doc="streaming LATENESS OBSERVABILITY through a real micro-batch "
    "pipeline: events get a deterministic pseudo arrival time (event "
    "time + (event_id mod 7)*5 min — rows near a window boundary land "
    "in the NEXT arrival batch), batches are 10-arrival-day windows "
    "written as one file each with strictly increasing mtimes (the "
    "coalesce(1)+utime discipline that deflaked test_streaming), and a "
    "foreachBatch audit counts rows older than the running "
    "max-event-time watermark minus 10 min — exactly what "
    "withWatermark would drop. The callback ASSERTS batches arrive in "
    "the defined arrival order (a reordered file source fails loudly, "
    "never silently mismatches). The oracle recomputes the audit from "
    "the same deterministic batch rule, so the hash gate proves the "
    "stream processed the defined batches in the defined order. Scale: "
    "per-batch state is ONE watermark scalar; the audit is a map-side "
    "count.",
)
def stream_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        (
            F.unix_micros("ts") + (F.col("event_id") % 7) * 300_000_000
        ).alias("arr"),
    )
    withg = ev.withColumn(
        "g", F.expr("(day(timestamp_micros(arr)) - 1) div 10")
    )
    groups = sorted(
        r.g for r in withg.select("g").distinct().collect()
    )  # bounded: ceil(31/10) arrival-day windows
    tmp = tempfile.mkdtemp(prefix="late_audit_")
    results: list = []
    state = {"wm": None, "next": 0}
    try:
        stage = os.path.join(tmp, "_stage")
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i, g in enumerate(groups):
            withg.filter(F.col("g") == g).select(
                "us", "g"
            ).coalesce(1).write.mode("overwrite").parquet(stage)
            part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"batch_{i:03d}.parquet")
            shutil.copyfile(os.path.join(stage, part), dst)
            # strictly increasing mtimes: the file source processes files
            # in mtime order, so batch order == arrival order
            os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

        def per_batch(bdf, _bid):
            row = bdf.agg(
                F.min("g").alias("gmin"),
                F.max("g").alias("gmax"),
                F.count(F.lit(1)).alias("n"),
                F.max("us").alias("mx"),
                F.sum(
                    F.when(
                        F.col("us")
                        < F.lit(
                            state["wm"] - 600_000_000
                            if state["wm"] is not None
                            else -(1 << 62)
                        ),
                        1,
                    ).otherwise(0)
                ).alias("late"),
            ).collect()[0]
            if row["n"] == 0:  # empty trailing trigger
                return
            expected = groups[state["next"]]
            if row["gmin"] != expected or row["gmax"] != expected:
                raise RuntimeError(
                    f"file source broke batch order: saw g in "
                    f"[{row['gmin']},{row['gmax']}], expected {expected}"
                )
            results.append(
                (
                    int(expected),
                    int(row["n"]),
                    int(row["mx"]),
                    int(row["late"]) if state["wm"] is not None else 0,
                )
            )
            state["wm"] = (
                row["mx"]
                if state["wm"] is None
                else max(state["wm"], row["mx"])
            )
            state["next"] += 1

        q = (
            spark.readStream.schema(withg.select("us", "g").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q, "stream_late_arrival_audit")
        if state["next"] != len(groups):
            raise RuntimeError(
                f"stream_late_arrival_audit: processed {state['next']} of "
                f"{len(groups)} batches — partial stream"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        results, "batch bigint, n_rows bigint, max_event_us bigint, n_late bigint"
    ).orderBy("batch")
