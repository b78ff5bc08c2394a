"""Bucketed tables co-locate join keys so repeated joins skip the shuffle —
the cudf hash_partition (partitioning.hpp:103) + reusable build-side
(hash_join.hpp:70) story expressed as Spark bucketing. The assertion is on
the PLAN: bucketed scan feeds a sort-merge join with no shuffle exchange.

(With broadcast enabled the planner rightly prefers a broadcast join on
fixture-sized tables and ignores bucketing — so the test pins SMJ.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    from cudf_spark.catalog import load

    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        n = joined.count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final[:2000]
        assert "Bucketed: true" in final
        assert "SortMergeJoin" in final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")

    assert n == li.join(o, li.l_orderkey == o.o_orderkey).count()
