"""Operator-coverage query registry.

Importing this package registers every query module. ``REGISTRY`` maps a
query name to a :class:`Query` carrying the PySpark builder and (when
SQL-expressible) the equivalent DuckDB oracle SQL used by the driver's
correctness gate.
"""

from cudf_spark.queries.registry import REGISTRY, Query, register  # noqa: F401

# Import for registration side effects.
#
# ORDER MATTERS: the driver's correctness gate checks ~50 queries per round
# in registration order, so families without a driver-green row yet are
# front-loaded; already-confirmed families (r01: aggregates/joins/lists/
# relational/relational2 head) rotate to the back.
from cudf_spark.queries import (  # noqa: F401, E402
    windows,
    text,
    scalars_strings,
    scalars_datetime,
    similarity,
    streaming_batch,
    relational3,
    aggregates2,
    text2,
    text3,
    decimals,
    extras,
    reshape,
    pipeline,
    scalars_math,
    relational2,
    aggregates,
    joins,
    lists,
    relational,
)


def queries_dict():
    """{name: callable(spark, sf_dir) -> DataFrame} for the driver."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracles_dict():
    """{name: oracle_sql} for every SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
