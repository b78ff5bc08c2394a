"""Degenerate-input regressions for join/map queries — inputs the parquet
fixtures never produce (NULL event_type, props keys colliding with the
column-derived map entries), pinned via monkeypatched load."""

from __future__ import annotations



def test_null_safe_join_key_survives_null_event_type(spark, monkeypatch):
    """A NULL event_type must KEEP its user_id key (oracle CASE ... ELSE);
    the old negated form sent it to the NULL-key bucket — in the one
    query whose purpose is null-key semantics."""
    from pyspark.sql import functions as F

    from cudf_spark.queries import joins as mod

    ev = spark.createDataFrame(
        [(1, 7, None, 1.0), (2, 7, "click", 1.0), (300, 7, "click", 1.0),
         (3, 5, "error", 1.0), (301, 5, "click", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    rows = {r.event_id: r for r in mod.join_null_safe_eq(spark, "unused").collect()}
    assert rows[1].k == 7            # NULL type keeps the key
    assert rows[3].k is None         # 'error' nulls it


def test_map_ops_props_key_collision_does_not_abort(spark, monkeypatch):
    """props carrying a 'type'/'uid' key must not trigger Spark's
    mapKeyDedupPolicy=EXCEPTION abort — column-derived entries win, and
    the extra props keys flow through the dynamic outputs."""
    from cudf_spark.queries import lists as mod

    ev = spark.createDataFrame(
        [(1, 9, "click", '{"k": 4, "type": "shadow", "z": "w"}')],
        "event_id long, user_id long, event_type string, props string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    [r] = mod.map_ops(spark, "unused").collect()
    assert r.n_keys == 4 and r.keys_csv == "k,type,uid,z"
    assert r.entries_csv == "k=4,type=click,uid=9,z=w"  # column type wins
    assert r.k_val == 4 and r.n_after_filter == 3
