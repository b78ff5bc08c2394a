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


def test_map_ops_degenerate_props(spark, monkeypatch):
    """The degenerate props shapes fixtures never produce, engine side:
    'type'/'uid' collisions must not trigger Spark's
    mapKeyDedupPolicy=EXCEPTION abort (column-derived entries win);
    NULL/invalid props degrade to the empty map (not a NULL map erasing
    the column entries); dotted keys and null JSON values flow through.
    The DuckDB oracle is run on the same rows and must agree cell for
    cell — the whole point of the dynamic rewrite."""
    import duckdb

    from cudf_spark.queries import lists as mod

    rows = [
        (1, 9, "click", '{"k": 4, "type": "shadow", "z": "w"}'),
        (2, 9, "view", None),
        (3, 9, "view", "not json"),
        (4, 9, "view", '{"a.b": "x", "z": null}'),
        (5, 9, "view", '{"k": 4}'),
        (6, 9, "view", '{"k": "abc"}'),     # non-integer k: NULL, no abort
        (7, 9, "view", '{"k": "4.5"}'),     # Spark try_cast NULL (DuckDB
                                            # CAST would round to 5)
        (8, 9, "view", '{"a": "1", "a": "2"}'),  # duplicate JSON key
        (9, 9, "view", '{"k": "4\x7f"}'),  # DEL-padded int: Spark trimAll
    ]
    schema = "event_id long, user_id long, event_type string, props string"
    ev = spark.createDataFrame(rows, schema)
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    got = {r.event_id: r for r in mod.map_ops(spark, "unused").collect()}
    assert got[1].n_keys == 4 and got[1].keys_csv == "k,type,uid,z"
    assert got[1].entries_csv == "k=4,type=click,uid=9,z=w"  # column wins
    assert got[1].k_val == 4 and got[1].n_after_filter == 3
    assert got[2].n_keys == 2 and got[2].keys_csv == "type,uid"
    assert got[3].n_keys == 2          # invalid JSON == empty props
    assert got[4].keys_csv == "a.b,type,uid,z"
    assert got[4].entries_csv == "a.b=x,type=view,uid=9,z"  # null val: bare key
    assert got[6].k_val is None and got[7].k_val is None  # ANSI-safe try_cast
    assert got[8].n_keys == 3 and got[8].keys_csv == "a,type,uid"  # dedup
    assert got[8].entries_csv == "a=1,type=view,uid=9"  # keep-FIRST wins
    assert got[9].k_val == 4  # \x7f is ASCII control: trimmed by try_cast
    # oracle agreement on the same degenerate rows
    con = duckdb.connect()
    import pandas as pd

    con.register("events", pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "props"]))
    from cudf_spark.queries import REGISTRY

    ora = con.execute(REGISTRY["map_ops"].oracle).fetchdf()
    ora = {int(r.event_id): r for r in ora.itertuples()}
    for eid, g in got.items():
        o = ora[eid]
        cols = ("n_keys", "keys_csv", "entries_csv", "n_after_filter", "k_val")
        for c in cols:
            g_v, o_v = getattr(g, c), getattr(o, c)
            if g_v is None:
                import math

                assert o_v is None or (isinstance(o_v, float) and math.isnan(o_v)), (eid, c, o_v)
            else:
                assert g_v == o_v, (eid, c, g_v, o_v)
