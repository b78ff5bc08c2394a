"""Join operators beyond Spark's built-in surface.

The reference's join family (cpp/include/cudf/join/ — hash, sort-merge,
semi/anti, cross, conditional, mixed) maps 1:1 onto ``df.join`` modes; the
one genuinely missing primitive is the ordered **as-of join** (pandas
``merge_asof``; absent from the reference snapshot too, noted in SURVEY.md
§2.3). We implement it as a union + partitioned window — a single shuffle
on the key column, no driver involvement, so it scales like a sort-merge
join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    *,
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` (``<`` when inclusive=False), per
    ``on`` key. Left rows with no earlier right row keep NULLs.

    Plan shape: one hash shuffle on ``on`` + one in-partition sort —
    identical asymptotics to a sort-merge join, skew-safe via AQE.
    """
    lcols = left.columns
    payload = [F.col(c).alias(f"__r_{c}") for c in right_values]

    # Tag so that at equal timestamps the right row sorts before (inclusive)
    # or after (exclusive) the left row it may match.
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0 if inclusive else 2).alias("__tag"),
        *payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
        *lcols,
    )
    # Tie-break on the payload columns: when several right rows share the
    # same (key, timestamp), the greatest payload tuple wins deterministically
    # across plans/engines (matches an ORDER BY ... LAST_VALUE oracle).
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", *[F.col(f"__r_{c}") for c in right_values])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r.unionByName(l).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_values
        ],
    )
    return filled.filter(F.col("__tag") == 1).select(
        *lcols,
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_values],
    )
