"""Datetime helpers mirroring libcudf's datetime namespace
(cpp/include/cudf/datetime.hpp) where Spark has no single builtin.

- ``ceil_month`` / ``round_month`` — ceil/round_datetimes to month
  frequency (datetime.hpp:258-292); floor is ``F.date_trunc``.
- ``is_leap_year`` (datetime.hpp:189), ``days_in_month`` (:208).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ceil_month(col: Column) -> Column:
    """Smallest month boundary >= value (exact boundaries map to themselves)."""
    floor = F.date_trunc("month", col)
    return F.when(floor == col, col).otherwise(F.add_months(floor, 1).cast("timestamp"))


def round_month(col: Column) -> Column:
    """Nearest month boundary (>= mid-month rounds up, day 16 threshold)."""
    floor = F.date_trunc("month", col)
    return F.when(F.dayofmonth(col) >= 16, F.add_months(floor, 1).cast("timestamp")).otherwise(floor)


def is_leap_year(col: Column) -> Column:
    y = F.year(col)
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def days_in_month(col: Column) -> Column:
    return F.dayofmonth(F.last_day(col))
