"""Property-based tests (hypothesis) for the trickiest cross-engine shims —
the same strategy cudf's own python test-suite uses for scalar kernels.

Each property generates a BATCH of values and runs ONE Spark job over it
(per-example Spark jobs would be prohibitively slow), comparing against an
independent reference: Python semantics for zfill, DuckDB for hash60,
numpy's five percentile methods for the quantile-mode shims.
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

signed_ints = st.lists(st.integers(-(10**8), 10**8), min_size=1, max_size=40)
plain_text = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + " _-.", max_size=24),
    min_size=1,
    max_size=40,
)
float_lists = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=1,
    max_size=60,
)


@SLOW
@given(vals=signed_ints, width=st.integers(0, 12))
def test_zfill_matches_python(spark, vals, width):
    """zfill == str.zfill on signed decimal strings, including the
    already-wider-than-width no-op cudf/pandas semantics."""
    from pyspark.sql import functions as F

    from cudf_spark.functions.strings import zfill

    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    out = [r["z"] for r in df.select(zfill(F.col("s"), width).alias("z")).collect()]
    assert out == [str(v).zfill(width) for v in vals]


@SLOW
@given(vals=plain_text)
def test_hash60_matches_duckdb(spark, duck, vals):
    """The md5-derived 60-bit hash is bit-identical in Spark and DuckDB for
    arbitrary strings — the foundation every dedup/sampling oracle rests on."""
    from pyspark.sql import functions as F

    from cudf_spark.functions.hashing import hash60

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    spark_h = [r["h"] for r in df.select(hash60(F.col("s"), seed=5).alias("h")).collect()]
    duck_h = [
        duck.execute(
            "SELECT CAST(('0x' || substr(md5('5|' || ?), 1, 15)) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert spark_h == duck_h


@SLOW
@given(vals=float_lists, q=st.floats(min_value=0.0, max_value=1.0))
def test_quantile_modes_match_numpy(spark, vals, q):
    """The five interpolation-mode shims == numpy's percentile methods
    (cudf quantiles.hpp:50 maps onto the same definitions)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from cudf_spark.queries.aggregates2 import _modes

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    grouped = df.agg(F.sort_array(F.collect_list("x")).alias("a"))
    m = _modes(F.col("a"), q)
    row = grouped.select(*[c.alias(k) for k, c in m.items()]).collect()[0]

    arr = np.array(sorted(vals))
    for mode, np_method in [
        ("q_linear", "linear"),
        ("q_lower", "lower"),
        ("q_higher", "higher"),
        ("q_midpoint", "midpoint"),
    ]:
        expect = float(np.percentile(arr, q * 100, method=np_method))
        assert math.isclose(row[mode], expect, rel_tol=1e-12, abs_tol=1e-9), (mode, q)
    # cudf NEAREST is explicit half-up on the fractional index; numpy's
    # 'nearest' rounds half-to-even, so compare against the direct definition.
    near = int(math.floor(q * (len(arr) - 1) + 0.5))
    assert row["q_nearest"] == arr[near]
