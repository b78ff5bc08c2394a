"""General-ddof variance/std — cudf's VARIANCE/STD aggregation kinds take
an arbitrary delta-degrees-of-freedom (cpp/include/cudf/aggregation.hpp
``make_variance_aggregation(size_type ddof)``); Spark only exposes
``var_samp`` (ddof=1) and ``var_pop`` (ddof=0).

The shim rescales the population moment: ``var_ddof = M2/(n-ddof) =
var_pop * n/(n-ddof)`` — one extra count aggregate, no second pass, and
the partial/merge aggregation path (the M2 merge, SURVEY §2.4) stays
entirely built-in. ``n <= ddof`` yields NULL, matching the reference's
undefined-denominator behavior (cudf returns null when dof <= 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def var_ddof(col: Column | str, ddof: int) -> Column:
    """Variance with arbitrary delta degrees of freedom (cudf semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    return F.when(n > ddof, F.var_pop(c) * n / (n - F.lit(ddof)))


def std_ddof(col: Column | str, ddof: int) -> Column:
    """Standard deviation with arbitrary ddof (sqrt of :func:`var_ddof`)."""
    return F.sqrt(var_ddof(col, ddof))
