"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape, mirroring the
reference benchmark /root/reference/cpp/benchmarks/ndsh/q01.cpp:22-46) on the
sf0.001 fixtures. ``queries()``/``oracle_sql()`` expose the full
operator-coverage registry from :mod:`cudf_spark.queries` — one entry per
implemented operator family from SURVEY.md §2, each paired with a DuckDB
oracle when SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cudf_spark.queries import oracles_dict, queries_dict  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cudf_spark.queries import REGISTRY

    return REGISTRY["q01_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return oracles_dict()
