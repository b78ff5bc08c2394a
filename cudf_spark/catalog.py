"""Fixture-table catalog.

The driver materializes ten deterministic parquet tables per scale factor
(TESTDATA.md). This module is the single entry point for reading them so
every query goes through ``spark.read.parquet`` — the DataSource V2 scan
with column pruning + predicate pushdown (the Spark analogue of libcudf's
``read_parquet`` AST filter pushdown, cpp/include/cudf/io/parquet.hpp:94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor — a
# broadcast hint on these is always correct (region/nation are fixed-size).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table at the given scale-factor directory.

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    across fixture generations, so normalize by inspecting the read schema:
    nanos arrive as long (``nanosAsLong`` runtime SQLConf — Spark's
    vectorized reader rejects nanos otherwise) and are truncated to
    microsecond TimestampType — the documented semantic delta for cudf's
    TIMESTAMP_NANOSECONDS (SURVEY §1.2); micros arrive as TIMESTAMP_NTZ and
    are cast to session-tz TimestampType (a no-op under the UTC pin below).
    Either way the result matches DuckDB's ``CAST(ts AS TIMESTAMP)`` on the
    oracle side.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    # Every query's timestamp literals / date_format renderings assume UTC
    # (the DuckDB oracle is tz-naive). The driver may hand us a session it
    # built itself, so pin the tz here rather than in our session builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":  # nanos-as-long vintage
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for SQL-form queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
