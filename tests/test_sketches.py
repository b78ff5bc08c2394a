"""Persisted-sketch merge (MERGE_TDIGEST/MERGE_HISTOGRAM analog,
aggregation.hpp:109-117): mergeability is EXACT, persistence survives a
parquet roundtrip, and quantile extraction honors the bin-width error
bound against exact order statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.operators.sketches import (
    histogram_sketch,
    merge_sketches,
    quantile_from_sketch,
)
from tests.conftest import SF_DIR

LO, HI, BINS = 0.0, 110000.0, 256
WIDTH = (HI - LO) / BINS


def _li(spark):
    return load(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("k"),
        F.col("l_extendedprice").cast("double").alias("v"),
        (F.col("l_orderkey") % 2).alias("run"),
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_equals_sketch_of_union(spark):
    li = _li(spark)
    whole = histogram_sketch(li, ["k"], "v", lo=LO, hi=HI, n_bins=BINS)
    part_a = histogram_sketch(
        li.filter(F.col("run") == 0), ["k"], "v", lo=LO, hi=HI, n_bins=BINS
    )
    part_b = histogram_sketch(
        li.filter(F.col("run") == 1), ["k"], "v", lo=LO, hi=HI, n_bins=BINS
    )
    merged = merge_sketches([part_a, part_b], ["k"])
    # Histogram merge is EXACT: same rows, bin for bin.
    assert _rows(merged) == _rows(whole)


def test_persisted_roundtrip_and_error_bound(spark, tmp_path):
    li = _li(spark)
    for run in (0, 1):
        histogram_sketch(
            li.filter(F.col("run") == run), ["k"], "v", lo=LO, hi=HI, n_bins=BINS
        ).write.parquet(str(tmp_path / f"sketch_run{run}"))

    # Later session: merge the PERSISTED sketches, never touching raw data.
    read_a = spark.read.parquet(str(tmp_path / "sketch_run0"))
    read_b = spark.read.parquet(str(tmp_path / "sketch_run1"))
    merged = merge_sketches([read_a, read_b], ["k"])

    exact = {
        r["k"]: (r["p10"], r["p50"], r["p90"])
        for r in li.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.1)").alias("p10"),
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.9)").alias("p90"),
        )
        .collect()
    }
    for qi, q in enumerate((0.1, 0.5, 0.9)):
        est = {r["k"]: r["q_est"] for r in quantile_from_sketch(merged, ["k"], q).collect()}
        assert est.keys() == exact.keys()
        for k, e in est.items():
            assert abs(e - exact[k][qi]) <= WIDTH, (q, k, e, exact[k][qi])


def test_bloom_merge_is_exact_and_no_false_negatives(spark):
    """bloom(A ∪ B) == bit_or-merge(bloom(A), bloom(B)) word-for-word, and
    every inserted key probes true (one-sided error)."""
    from pyspark.sql import functions as F

    from cudf_spark.operators.sketches import bloom_build, bloom_merge, bloom_probe

    a = spark.createDataFrame([("g", i) for i in range(50)], "grp string, k long")
    b = spark.createDataFrame([("g", i) for i in range(40, 90)], "grp string, k long")
    both = a.unionByName(b)
    merged = bloom_merge(
        [bloom_build(a, ["grp"], "k"), bloom_build(b, ["grp"], "k")], ["grp"]
    )
    direct = bloom_build(both, ["grp"], "k")
    m = {(r["grp"], r["word"]): r["bits"] for r in merged.collect()}
    d = {(r["grp"], r["word"]): r["bits"] for r in direct.collect()}
    assert m == d
    probes = spark.createDataFrame([("g", i) for i in range(90)], "grp string, k long")
    hits = bloom_probe(direct, probes, ["grp"], "k").collect()
    assert all(r["bloom_hit"] for r in hits)  # no false negatives ever


def test_native_hll_sketch_binary_merge(spark):
    """Spark 4's Datasketches HLL: the sketch is a PERSISTABLE binary —
    build per run, hll_union_agg the binaries later, estimate without raw
    data (the true MERGE_HLL workflow; complements the exact histogram
    and bloom sketches)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 60_000).select((F.col("id") % 50_000).alias("v"))
    b = spark.range(40_000, 100_000).select((F.col("id") % 50_000).alias("v"))
    sk = (
        a.agg(F.hll_sketch_agg("v").alias("s"))
        .unionByName(b.agg(F.hll_sketch_agg("v").alias("s")))
    )
    est = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("s")).alias("n")
    ).collect()[0]["n"]
    exact = 50_000  # both halves cover 0..49999 after the mod
    assert abs(est - exact) / exact < 0.05


def test_cms_exact_merge_and_never_underestimates(spark):
    """cms(A ∪ B) == merge(cms(A), cms(B)) cell-by-cell, and every
    estimate >= the true frequency (CMS can only overcount)."""
    from pyspark.sql import functions as F

    from cudf_spark.operators.sketches import cms_build, cms_estimate, cms_merge

    vals = [(i, f"tok{i % 13}") for i in range(400)] + [
        (400 + i, "hot") for i in range(150)
    ]
    df = spark.createDataFrame(vals, "id long, v string")
    a = df.filter(df.id % 2 == 0).select("v")
    b = df.filter(df.id % 2 == 1).select("v")
    df = df.select("v")
    whole = cms_build(df, [], "v", depth=3, width=32)
    merged = cms_merge([cms_build(a, [], "v", depth=3, width=32),
                        cms_build(b, [], "v", depth=3, width=32)], [])
    as_rows = lambda s: sorted(tuple(r) for r in s.collect())
    assert as_rows(whole) == as_rows(merged)

    truth = df.groupBy("v").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(whole, truth.select("v"), [], "v", depth=3, width=32)
    joined = truth.join(est, "v").collect()
    assert len(joined) == 14
    assert all(r["est"] >= r["true_cnt"] for r in joined)


def test_bloom_prefilter_prunes_without_false_negatives(spark):
    """Query-level contract of join_bloom_prefilter: every true build key
    passes the bloom (no false negatives), and at 4096 words the
    candidate set is strictly smaller than the unfiltered key set
    (the sketch actually prunes)."""
    from pyspark.sql import functions as F

    from cudf_spark.catalog import load
    from cudf_spark.operators.sketches import bloom_build, bloom_probe

    li = load(spark, SF_DIR, "lineitem")
    urgent = load(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    sketch = bloom_build(urgent, [], "o_orderkey", n_words=4096)
    keys = li.select("l_orderkey").distinct()
    hits = bloom_probe(sketch, keys, [], "l_orderkey", n_words=4096)

    n_all = keys.count()
    n_hits = hits.filter(F.col("bloom_hit")).count()
    true_keys = {
        r[0]
        for r in keys.join(
            urgent.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
        ).collect()
    }
    hit_keys = {r["l_orderkey"] for r in hits.filter(F.col("bloom_hit")).collect()}
    assert true_keys <= hit_keys          # no false negatives, ever
    assert n_hits < n_all                 # and it actually prunes


def test_bitmap_distinct_exact_merge(spark):
    """bitmap(A ∪ B) == OR-merge(bitmap(A), bitmap(B)) word-for-word and
    the merged count equals the true distinct count — the lossless-merge
    contract that distinguishes the bitmap from HLL."""
    from pyspark.sql import functions as F

    from cudf_spark.operators.sketches import bitmap_build, bitmap_count, bitmap_merge

    df = spark.createDataFrame(
        [(i, i % 200) for i in range(1000)], "row long, uid long"
    )
    a = df.filter(df.row % 2 == 0).select("uid")
    b = df.filter(df.row % 2 == 1).select("uid")
    whole = bitmap_build(df.select("uid"), [], "uid")
    merged = bitmap_merge(
        [bitmap_build(a, [], "uid"), bitmap_build(b, [], "uid")], []
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    n = bitmap_count(merged, []).collect()[0]["n_distinct"]
    assert n == 200


def test_histogram_sketch_ignores_nulls(spark):
    """A NULL value must not sketch: floor(NULL) is NULL but Spark's
    greatest/least SKIP null args, so pre-fix a NULL landed in bin 0 as
    a phantom count (v_min/v_max skipped it) and shifted every
    extracted quantile (round-8 review)."""
    from cudf_spark.operators.sketches import histogram_sketch, quantile_from_sketch

    rows = [("k", float(v)) for v in range(1, 11)] + [("k", None)] * 5
    df = spark.createDataFrame(rows, "k string, v double")
    sk = histogram_sketch(df, ["k"], "v", lo=0.0, hi=10.0, n_bins=10)
    assert sk.agg({"cnt": "sum"}).collect()[0][0] == 10  # nulls excluded
    [q] = quantile_from_sketch(sk, ["k"], q=0.5).collect()
    assert q.q_est is not None and 4.0 <= q.q_est <= 7.0
