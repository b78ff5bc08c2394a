"""Query registry: name -> (spark builder, duckdb oracle SQL).

Contract (driver's correctness gate, see repo __spark_entry__.py):
- the builder takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle is ANSI SQL DuckDB runs on the same parquet tables;
- column names must match exactly (the comparator sorts columns by name
  and hashes values), so every computed column is aliased identically on
  both sides;
- floating-point aggregates are rounded on BOTH sides so the value hash
  is stable across engines (IEEE sums differ in final ULPs when the
  reduction order differs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
