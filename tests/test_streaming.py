"""Drive the streaming operators through a REAL micro-batch stream (memory
sink, processAllAvailable) and assert stream == batch — the correctness
strategy for semantics cudf has no reference behavior for (SURVEY §7
hard-part 8)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _run_stream(spark, df, name, output_mode="complete"):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


from cudf_spark.streaming.ops import write_ordered_batch as _write_batch  # noqa: E402


def _bump_mtimes(path, seq):
    """Push every current part-file's mtime to a common point strictly
    ordered by ``seq`` (for multi-part writes whose internal order does
    not matter but whose position relative to later batches does)."""
    import glob
    import os
    import time

    t = int(time.time()) + seq * 10
    for f in glob.glob(os.path.join(path, "*.parquet")):
        os.utime(f, (t, t))


def test_stream_tumbling_matches_batch(spark):
    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, tumbling_counts

    batch = tumbling_counts(load(spark, SF_DIR, "events"))
    stream = _run_stream(spark, tumbling_counts(events_stream(spark, SF_DIR)), "t_tumble")
    cols = ["window_start", "event_type", "n", "total"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_session_matches_batch(spark):
    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, sessionized

    batch = sessionized(load(spark, SF_DIR, "events"))
    stream = _run_stream(spark, sessionized(events_stream(spark, SF_DIR)), "t_sess")
    cols = ["user_id", "session_start", "session_end", "n_events", "total"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_dedup_within_watermark(spark):
    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, stream_dedup

    batch_n = stream_dedup(load(spark, SF_DIR, "events")).count()
    stream = _run_stream(
        spark, stream_dedup(events_stream(spark, SF_DIR)), "t_dedup", output_mode="append"
    )
    assert stream.count() == batch_n


def test_stateful_running_totals(spark):
    from pyspark.sql import functions as F

    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, stateful_running_totals

    stream = _run_stream(
        spark,
        stateful_running_totals(events_stream(spark, SF_DIR)),
        "t_state",
        output_mode="update",
    )
    # final state per user (last update) must equal the batch aggregate
    final = stream.groupBy("user_id").agg(
        F.max("n").alias("n"), F.round(F.max("total"), 2).alias("total")
    )
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    cols = ["user_id", "n", "total"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_stream_sliding_matches_batch(spark):
    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, sliding_counts

    batch = sliding_counts(load(spark, SF_DIR, "events"))
    stream = _run_stream(spark, sliding_counts(events_stream(spark, SF_DIR)), "t_slide")
    cols = ["window_start", "event_type", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_interval_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import events_stream, stream_interval_join

    def split(e):
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
        return stream_interval_join(
            clicks, purchases, [("c_user", "p_user")], left_ts="c_ts", right_ts="p_ts"
        ).select("c_user", "click_id", "purchase_id")

    batch = split(load(spark, SF_DIR, "events"))
    stream = _run_stream(
        spark, split(events_stream(spark, SF_DIR)), "t_ivjoin", output_mode="append"
    )
    cols = ["c_user", "click_id", "purchase_id"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_enrich_static_matches_batch(spark):
    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import (
        enrich_with_static,
        events_stream,
        user_tier_dim,
    )

    dim = user_tier_dim(spark, SF_DIR)
    batch = enrich_with_static(load(spark, SF_DIR, "events"), dim)
    stream = _run_stream(
        spark, enrich_with_static(events_stream(spark, SF_DIR), dim), "t_enrich"
    )
    cols = ["window_start", "tier", "n", "total"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stateful_topk_transform_with_state(spark):
    """transformWithState per-user top-k == batch window-rank answer.
    Needs google.protobuf (the state-server protocol) — environment-gated
    like the Kafka jar; self-activates when protobuf is installed."""
    import importlib.util

    import pytest

    try:
        has_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_pb = False
    if not has_pb:
        pytest.skip("google.protobuf absent: transformWithState worker cannot start")

    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cudf_spark.streaming.ops import events_stream, stateful_topk
    from tests.conftest import SF_DIR

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    name = "mem_tws_" + uuid.uuid4().hex[:8]
    q = (
        stateful_topk(events_stream(spark, SF_DIR), k=3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    got = {
        r["user_id"]: (r["n"], r["v1"])
        for r in spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r["user_id"]: (r["n"], r["v1"])
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("v1"))
        .collect()
    }
    assert got == want


def test_streaming_cms_merge_equals_one_shot(spark, tmp_path):
    """The incremental-sketch contract through a real stream: 3 files ->
    3 micro-batches, one CMS per batch, sum-merged == the sketch built
    over all rows at once."""
    from pyspark.sql import functions as F

    from cudf_spark.operators.sketches import cms_build

    df = spark.createDataFrame(
        [(i % 50,) for i in range(600)], "user_id long"
    )
    path = str(tmp_path / "cms_src")
    df.repartition(3).write.parquet(path)

    parts = []

    def per_batch(bdf, _bid):
        parts.append(cms_build(bdf, [], "user_id", depth=3, width=64).collect())

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(parts) == 3  # genuinely incremental, one batch per file

    merged = (
        spark.createDataFrame(
            [(r["r"], r["c"], r["cnt"]) for p in parts for r in p],
            "r int, c int, cnt long",
        )
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(df, [], "user_id", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_stream_interval_join_outer_matches_batch(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join == batch left join, with a
    far-future sentinel event per side so the final watermark advances
    past every real interval and the tail's unmatched rows flush (outer
    emission is final only once the watermark passes left_ts + upper)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cudf_spark.catalog import load
    from cudf_spark.streaming.ops import stream_interval_join

    ev = load(spark, SF_DIR, "events").select("user_id", "event_id", "event_type", "ts")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    _bump_mtimes(path, 0)  # data files first, in any internal order
    # sentinel file ordered strictly AFTER every data file => processed
    # in a later micro-batch; one far-future click + purchase push both
    # watermarks (mtime tie + random UUID path would otherwise let the
    # sentinel sort BEFORE data and drop it all as late)
    far = dt.datetime(2031, 1, 1)
    _write_batch(
        spark.createDataFrame(
            [(-999, -1, "click", far), (-999, -2, "purchase", far)],
            "user_id long, event_id long, event_type string, ts timestamp",
        ),
        path,
        1,
    )

    def split_join(e):
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
        return stream_interval_join(
            clicks, purchases, [("c_user", "p_user")],
            left_ts="c_ts", right_ts="p_ts", how="left_outer",
        ).select("c_user", "click_id", "purchase_id")

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    stream = _run_stream(spark, split_join(src), "t_ivjoin_outer", output_mode="append")
    batch = split_join(spark.read.parquet(path))
    cols = ["c_user", "click_id", "purchase_id"]
    got = [r for r in _rows(stream, cols) if r[0] != -999]
    want = [r for r in _rows(batch, cols) if r[0] != -999]
    assert got == want
    assert any(r[2] is None for r in got)  # unmatched clicks DID flush


def test_watermark_drops_late_data(spark, tmp_path):
    """NEGATIVE semantics proof: the watermark actually discards late
    rows. File 1 advances the watermark far past a bucket; file 2 then
    delivers a late event for that bucket. Append-mode tumbling output
    must NOT contain the late row's contribution, while the plain batch
    aggregate over the same files does — stream == batch MINUS the late
    row, not stream == batch."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cudf_spark.streaming.ops import tumbling_counts

    base = dt.datetime(2030, 1, 1, 0, 30)
    on_time = [
        (1, base, 10.0, "click"),
        (2, base + dt.timedelta(hours=6), 1.0, "click"),  # watermark -> 04:30
    ]
    # Spark (>=3.5) filters late events with the watermark from ONE BATCH
    # EARLIER than the one used for state eviction — a watermark advanced
    # by batch N only drops late rows from batch N+2 on. This on-time
    # filler batch commits the advanced watermark for late-event
    # filtering before the late row arrives.
    filler = [(4, base + dt.timedelta(hours=6, minutes=1), 1.0, "click")]
    late = [(3, base + dt.timedelta(minutes=5), 99.0, "click")]  # bucket 00:00, long closed
    schema = "event_id long, ts timestamp, value double, event_type string"
    _write_batch(spark.createDataFrame(on_time, schema), str(tmp_path / "src"), 0)
    _write_batch(spark.createDataFrame(filler, schema), str(tmp_path / "src"), 1)
    _write_batch(spark.createDataFrame(late, schema), str(tmp_path / "src"), 2)

    src = (
        spark.readStream.schema(spark.read.parquet(str(tmp_path / "src")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    stream = _run_stream(
        spark, tumbling_counts(src, watermark="2 hours"), "t_late", output_mode="append"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in stream.collect()
    }
    # the 00:00 bucket closed with ONLY the on-time event
    assert got[("2030-01-01 00:00:00", "click")] == (1, 10.0)

    batch = tumbling_counts(spark.read.parquet(str(tmp_path / "src")))
    b = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    # batch (no watermark) sees both -> proves the stream genuinely dropped it
    assert b[("2030-01-01 00:00:00", "click")] == (2, 109.0)


def test_dedup_within_watermark_state_expiry(spark, tmp_path):
    """The 'WithinWatermark' scoping is real: a duplicate event_id
    arriving WITHIN the horizon is suppressed, but one arriving after
    the watermark expired that key's state is emitted again — bounded
    state means bounded memory of the past."""
    import datetime as dt

    from cudf_spark.streaming.ops import stream_dedup

    base = dt.datetime(2030, 6, 1, 0, 0)
    schema = "event_id long, ts timestamp, value double, event_type string"
    # batch 1: original + watermark already advanced 6h past it
    _write_batch(
        spark.createDataFrame(
            [(7, base, 1.0, "click"), (8, base + dt.timedelta(hours=6), 1.0, "click")],
            schema,
        ),
        str(tmp_path / "src"),
        0,
    )
    # batch 2: near-dup of id 8 (state alive -> suppressed). Its end-of-
    # batch cleanup also EVICTS id 7's expired state (eviction runs with
    # the watermark batch 1 advanced; doing it in a separate batch keeps
    # the eviction committed before the re-emission candidate arrives —
    # state eviction, like late filtering, lags the watermark a batch).
    _write_batch(
        spark.createDataFrame(
            [(8, base + dt.timedelta(hours=6, minutes=1), 9.0, "click")],
            schema,
        ),
        str(tmp_path / "src"),
        1,
    )
    # batch 3: fresh-ts row for id 7 — its 00:00 state is gone, so it is
    # emitted AGAIN (a far-late dup would be dropped by the watermark
    # itself, so re-emission is exercised with an on-time ts)
    _write_batch(
        spark.createDataFrame(
            [(7, base + dt.timedelta(hours=6, minutes=5), 2.0, "click")],
            schema,
        ),
        str(tmp_path / "src"),
        2,
    )

    src = (
        spark.readStream.schema(spark.read.parquet(str(tmp_path / "src")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    out = _run_stream(
        spark, stream_dedup(src, watermark="2 hours"), "t_dedup_exp", output_mode="append"
    )
    rows = sorted((r["event_id"], r["value"]) for r in out.collect())
    # id 8's dup (1 minute later, state alive) suppressed; id 7's state
    # from 00:00 expired by the 6h-later watermark -> emitted AGAIN
    assert rows == [(7, 1.0), (7, 2.0), (8, 1.0)], rows


def test_kafka_reader_option_wiring(spark):
    """The Kafka jar is absent in this container, so the source cannot be
    driven end-to-end — but the reader's OPTION MAPPING and the
    value-JSON projection are plain logic, tested here against a
    recording fake for the stream handle and a real batch frame for the
    projection (custreamz read_gdf option parity: brokers/topic/offsets)."""
    import json

    from pyspark.sql import functions as F

    from cudf_spark.streaming.ops import kafka_micro_batch_reader

    payload = spark.createDataFrame(
        [
            (b"k1", json.dumps({"a": 7, "b": "x"}).encode(), 1),
            (b"k2", json.dumps({"a": 8, "b": "y"}).encode(), 2),
        ],
        "key binary, value binary, timestamp long",
    )

    class FakeReader:
        def __init__(self, df):
            self.fmt = None
            self.opts = {}
            self._df = df

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            return self._df

    class FakeSession:
        def __init__(self, df):
            self._reader = FakeReader(df)

        @property
        def readStream(self):
            return self._reader

    sess = FakeSession(payload)
    out = kafka_micro_batch_reader(
        sess, brokers="b1:9092,b2:9092", topic="events",
        value_schema="a long, b string", starting_offsets="latest",
    )
    r = sess._reader
    assert r.fmt == "kafka"
    assert r.opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
    }
    got = sorted(
        (x["key"], x["value"]["a"], x["value"]["b"])
        for x in (row.asDict(recursive=True) for row in out.collect())
    )
    assert got == [("k1", 7, "x"), ("k2", 8, "y")]
    # no value_schema -> raw frame passes through untouched
    raw = kafka_micro_batch_reader(
        FakeSession(payload), brokers="b", topic="t"
    )
    assert raw.columns == ["key", "value", "timestamp"]
    assert raw.count() == 2
