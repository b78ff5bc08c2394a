"""A/B harness for VERDICT r10 item 4: graph_adamic_adar and
graph_jaccard_neighbors — part-keyed self-join (current) vs the
edge-iterator intersection form (per-supplier sorted part arrays +
array_intersect over the candidate pair set).

One execution per process (fresh-process warm protocol: one untimed run,
one timed). Usage: python scripts/ab_graph_r11.py <jac_base|jac_arr|aa_base|aa_arr>
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def hub_capped_keep(spark, min_dp=None):
    li = load(spark, SF, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("dp"))
    hist = pdeg.groupBy("dp").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    h2 = hist.select(F.col("dp").alias("dp2"), F.col("cnt").alias("cnt2"))
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("np"))
    cum = (
        hist.join(F.broadcast(h2), F.col("dp2") <= F.col("dp"))
        .groupBy("dp")
        .agg(F.sum("cnt2").cast("bigint").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    thr = cum.filter(F.col("cum") * 100 >= 99 * F.col("np")).agg(
        F.min("dp").cast("bigint").alias("thr")
    )
    cond = F.col("dp") <= F.col("thr")
    if min_dp:
        cond = cond & (F.col("dp") >= min_dp)
    return (
        edges.join(pdeg, "p").crossJoin(F.broadcast(thr)).filter(cond)
    )


def jac_base(spark):
    from cudf_spark.operators.windows import bounded_global_rank

    keep = hub_capped_keep(spark).select("s", "p")
    deg = keep.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a = keep.select(F.col("s").alias("sa"), "p")
    b = keep.select(F.col("s").alias("sb"), "p")
    inter = (
        a.join(b, "p")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
    )
    da = deg.select(F.col("s").alias("sa"), F.col("d").alias("da"))
    db = deg.select(F.col("s").alias("sb"), F.col("d").alias("db"))
    scored = (
        inter.join(da, "sa")
        .join(db, "sb")
        .withColumn("jac_u6", F.expr("nab * 1000000 div (da + db - nab)").cast("bigint"))
        .select("sa", "sb", "nab", "da", "db", "jac_u6")
    )
    return bounded_global_rank(scored, 20, [F.desc("jac_u6"), F.col("sa"), F.col("sb")])


def jac_arr(spark):
    """Intersection form: per-supplier sorted part arrays (one groupBy),
    candidate pairs from the part-keyed expansion (pair identity only,
    deduped), nab via array_intersect — deg rides along in the same
    supplier table, killing the separate deg branch + two keep
    recomputes."""
    from cudf_spark.operators.windows import bounded_global_rank

    keep = hub_capped_keep(spark).select("s", "p")
    sp = keep.groupBy("s").agg(
        F.sort_array(F.collect_list("p")).alias("ps"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    ).localCheckpoint(eager=False)
    a = keep.select(F.col("s").alias("sa"), "p")
    b = keep.select(F.col("s").alias("sb"), "p")
    cand = (
        a.join(b, "p")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
    )
    spa = sp.select(F.col("s").alias("sa"), F.col("ps").alias("pa"), F.col("d").alias("da"))
    spb = sp.select(F.col("s").alias("sb"), F.col("ps").alias("pb"), F.col("d").alias("db"))
    scored = (
        cand.join(spa, "sa")
        .join(spb, "sb")
        .withColumn("nab", F.size(F.array_intersect("pa", "pb")).cast("bigint"))
        .withColumn("jac_u6", F.expr("nab * 1000000 div (da + db - nab)").cast("bigint"))
        .select("sa", "sb", "nab", "da", "db", "jac_u6")
    )
    return bounded_global_rank(scored, 20, [F.desc("jac_u6"), F.col("sa"), F.col("sb")])


def aa_base(spark):
    from cudf_spark.operators.windows import bounded_global_rank

    keep = hub_capped_keep(spark, min_dp=2)
    weighted = keep.select(
        "s", "p",
        F.floor(F.lit(1000000000.0) / F.log(F.col("dp").cast("double")))
        .cast("bigint").alias("w"),
    ).localCheckpoint(eager=False)
    a = weighted.select(F.col("s").alias("sa"), "p", "w")
    b = weighted.select(F.col("s").alias("sb"), F.col("p").alias("p2"))
    pairs = (
        a.join(b, (F.col("p") == F.col("p2")) & (F.col("sa") < F.col("sb")))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"),
             F.sum("w").cast("bigint").alias("aa_u9"))
    )
    return bounded_global_rank(pairs, 20, [F.desc("aa_u9"), F.col("sa"), F.col("sb")])


def aa_arr(spark):
    """Intersection form for adamic-adar: per-supplier sorted arrays of
    (p,w) encoded as a single struct-free trick — two aligned arrays via
    sort on p; shared weight sum via zip of intersected positions is
    awkward, so encode w INTO the array element (p*2^20 + w-bucket is
    lossy) — instead intersect part arrays then SUM weights via a
    broadcast part->w lookup join on the exploded intersection."""
    from cudf_spark.operators.windows import bounded_global_rank

    keep = hub_capped_keep(spark, min_dp=2)
    weighted = keep.select(
        "s", "p",
        F.floor(F.lit(1000000000.0) / F.log(F.col("dp").cast("double")))
        .cast("bigint").alias("w"),
    ).localCheckpoint(eager=False)
    sp = weighted.groupBy("s").agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    ).localCheckpoint(eager=False)
    pw = weighted.select("p", "w").distinct()
    a = weighted.select(F.col("s").alias("sa"), "p")
    b = weighted.select(F.col("s").alias("sb"), F.col("p").alias("p2"))
    cand = (
        a.join(b, (F.col("p") == F.col("p2")) & (F.col("sa") < F.col("sb")))
        .select("sa", "sb")
        .distinct()
    )
    spa = sp.select(F.col("s").alias("sa"), F.col("ps").alias("pa"))
    spb = sp.select(F.col("s").alias("sb"), F.col("ps").alias("pb"))
    shared = (
        cand.join(spa, "sa").join(spb, "sb")
        .select("sa", "sb", F.explode(F.array_intersect("pa", "pb")).alias("p"))
    )
    pairs = (
        shared.join(F.broadcast(pw), "p")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"),
             F.sum("w").cast("bigint").alias("aa_u9"))
    )
    return bounded_global_rank(pairs, 20, [F.desc("aa_u9"), F.col("sa"), F.col("sb")])


VARIANTS = {"jac_base": jac_base, "jac_arr": jac_arr,
            "aa_base": aa_base, "aa_arr": aa_arr}

if __name__ == "__main__":
    which = sys.argv[1]
    spark = get_spark("ab_graph")
    fn = VARIANTS[which]
    fn(spark).count()  # untimed warm run
    t0 = time.perf_counter()
    n = fn(spark).count()
    print(f"{which} rows={n} secs={time.perf_counter() - t0:.3f}")
    spark.stop()
