"""Degenerate-input regressions for window queries — inputs the parquet
fixtures never produce (NULL event_type), pinned via monkeypatched load."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fill_null_keeps_value_for_null_event_type(spark, monkeypatch):
    """when(== 'error', NULL).otherwise(v) — a NULL event_type must KEEP
    its value (the oracle's CASE ... ELSE branch), not be nulled the way
    the old negated when(!= 'error') form did. Fixtures carry no NULL
    types, so this pins the degenerate input directly."""
    from cudf_spark.queries import windows as mod

    ev = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", None, 5.0),
            (2, 10, "2024-01-01 00:00:01", "error", 7.0),
            (3, 10, "2024-01-01 00:00:02", "click", 9.0),
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    rows = {r.event_id: r for r in mod.win_fill_null(spark, "unused").collect()}
    assert rows[1].v == 5.0          # NULL type keeps its value
    assert rows[2].v is None         # 'error' still nulled
    assert rows[2].ffill == 5.0      # and ffills from the kept row
