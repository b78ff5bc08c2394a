"""UDF surface (SURVEY §2.13) — the cudf Python-UDF entry points mapped to
Spark's Arrow-batched equivalents. Row-at-a-time Python UDFs are
deliberately NOT exposed: every wrapper here crosses the JVM/Python
boundary via Arrow batches (the columnar contract of the reference's
device columns).

| cudf                                   | here                  |
|----------------------------------------|-----------------------|
| Series.apply / .map  (scalar_function) | ``apply_series``      |
| GroupBy.apply (grouped map JIT)        | ``groupby_apply``     |
| HOST_UDF aggregation                   | ``groupby_agg_pandas``|
| transform / generic table transform    | ``map_batches``       |
| zero-copy Arrow interop (to/from_arrow)| ``map_arrow``         |
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_series(fn: Callable, return_type: str):
    """Elementwise Series→Series kernel as a vectorized pandas_udf
    (python/cudf/cudf/core/udf/scalar_function.py; Series.apply
    core/series.py:2605)."""
    return F.pandas_udf(fn, returnType=return_type)


def groupby_apply(df: DataFrame, keys: list[str], fn: Callable, schema: str) -> DataFrame:
    """Grouped-map: per-group pandas DataFrame in/out
    (GroupBy.apply, core/groupby/groupby.py; core/udf/groupby_*.py)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def groupby_agg_pandas(fn: Callable, return_type: str):
    """Grouped-aggregate pandas UDF (HOST_UDF kind, aggregation.hpp:108):
    Series→scalar, pluggable into ``.agg``."""
    return F.pandas_udf(fn, returnType=return_type, functionType=F.PandasUDFType.GROUPED_AGG)


def map_batches(df: DataFrame, fn: Callable, schema: str) -> DataFrame:
    """Partition-batch iterator transform (cudf::transform,
    transform.hpp:121) — mapInPandas over Arrow batches."""
    return df.mapInPandas(fn, schema=schema)


def map_arrow(df: DataFrame, fn: Callable, schema: str) -> DataFrame:
    """Raw ``pyarrow.RecordBatch`` iterator transform — ``mapInArrow``,
    the zero-pandas-materialization path (the Spark analogue of cudf's
    ``to_arrow``/``from_arrow`` interop, python/cudf/cudf/core/frame.py
    to_arrow): batches stay in Arrow memory end-to-end, so binary-heavy
    kernels (multimodal payloads, token-id arrays) skip the pandas
    object-boxing that mapInPandas pays. ``fn`` takes and yields an
    iterator of RecordBatches matching ``schema``."""
    return df.mapInArrow(fn, schema=schema)
