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
    """Read one fixture table at the given scale-factor directory."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for SQL-form queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
