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

from pyspark.sql import Column, DataFrame, Window
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
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """pandas/cudf ``merge_asof`` semantics on DataFrames.

    For every left row attach one right row per ``on`` key:

    - ``direction="backward"`` (default): the most recent right row with
      ``right_ts <= left_ts`` (``<`` when ``inclusive=False``);
    - ``direction="forward"``: the earliest right row with
      ``right_ts >= left_ts`` (``>`` when exclusive);
    - ``direction="nearest"``: the closer of the two, ties to backward.

    ``tolerance`` (a Column the timestamp difference compares against, e.g.
    ``F.expr("INTERVAL 30 MINUTES")`` for timestamps or a numeric literal
    for numeric order keys) nulls out matches farther than the bound.
    Left rows with no admissible right row keep NULLs.

    Plan shape: ONE hash shuffle on ``on`` + in-partition sort(s) — the
    same asymptotics as a sort-merge join, skew-safe via AQE; ``nearest``
    adds a second in-partition sort (descending), never a second shuffle.
    When several right rows share (key, timestamp) the greatest payload
    tuple wins deterministically (NULL payload fields order first in the
    tie-break). Matches are ROW-ATOMIC, exactly like pandas merge_asof:
    the chosen right row's payload is attached whole, NULL fields
    included — one fill of a single struct column, never per-column
    fills that could stitch different right rows together.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if "__row" in left.columns:
        # the other internal names (__k/__t/__tag) collide loudly as
        # duplicate-column analysis errors; withColumn("__row") would
        # silently OVERWRITE a left column of that name instead (a right
        # __row never propagates — the right side is projected away)
        raise ValueError("asof_join: left input already has a __row column")
    lcols = left.columns
    payload = [F.col(c).alias(f"__r_{c}") for c in right_values]

    # Tag so that at equal timestamps the right row sorts before (inclusive)
    # or after (exclusive) the left row it may match — in BOTH sort
    # directions, since ties order by tag after the timestamp.
    # a right row with a NULL timestamp can never be an as-of match, but
    # left in the union it sorts FIRST under the ascending fill window
    # and last(ignorenulls) would hand its payload to left rows that
    # have no admissible match (pandas merge_asof drops them too)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0 if inclusive else 2).alias("__tag"),
        F.col(right_ts).alias("__rt"),
        *payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
        *lcols,
    )
    u = r.unionByName(l)

    fill_cols = [*(f"__r_{c}" for c in right_values), "__rt"]
    # ONE row-atomic struct per right row (NULL on left rows so
    # last(ignorenulls) skips them): pandas merge_asof attaches the
    # matched ROW, NULL payload fields included — per-column
    # last(ignorenulls) fills would skip a NULL payload field and reach
    # back to an OLDER row's value, silently stitching two right rows
    # together whenever the most recent admissible row carries a NULL.
    u = u.withColumn(
        "__row",
        F.when(
            F.col("__tag") != 1,
            F.struct(*[F.col(c).alias(c) for c in fill_cols]),
        ),
    )

    def fill(prefix: str, descending: bool) -> Column:
        # Tie-break on the payload columns: when several right rows share the
        # same (key, timestamp), the greatest payload tuple wins
        # deterministically across plans/engines.
        w = (
            Window.partitionBy("__k")
            .orderBy(
                F.desc("__t") if descending else F.asc("__t"),
                "__tag",
                *[F.col(f"__r_{c}") for c in right_values],
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__row", ignorenulls=True).over(w).alias(f"{prefix}row")

    cols: list[Column] = []
    if direction in ("backward", "nearest"):
        cols.append(fill("__b_", descending=False))
    if direction in ("forward", "nearest"):
        cols.append(fill("__f_", descending=True))
    filled = u.select("*", *cols).filter(F.col("__tag") == 1)

    t = F.col("__t")
    if direction == "nearest":
        b_rt, f_rt = F.col("__b_row.__rt"), F.col("__f_row.__rt")
        use_b = f_rt.isNull() | (b_rt.isNotNull() & ((t - b_rt) <= (f_rt - t)))
        matched_row = F.when(use_b, F.col("__b_row")).otherwise(F.col("__f_row"))
    else:
        matched_row = F.col("__b_row" if direction == "backward" else "__f_row")

    if tolerance is not None:
        rt = matched_row.getField("__rt")
        dist = F.when(rt <= t, t - rt).otherwise(rt - t)
        keep = rt.isNotNull() & (dist <= tolerance)
        matched_row = F.when(keep, matched_row)

    return filled.select(
        *lcols,
        *[
            matched_row.getField(f"__r_{c}").alias(f"asof_{c}")
            for c in right_values
        ],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    n_salt: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading shuffle equi-join: the standard salting rewrite for
    hot keys (public technique; AQE's skew-join split handles *sort-merge*
    skew reactively, salting handles it structurally and also covers
    shuffled-hash builds and stream-side hotspots).

    Probe rows get a salt in ``[0, n_salt)`` derived from a per-row id
    (NOT from the join key — hot-key rows must spread); build rows
    replicate ``n_salt`` times. The join key becomes ``(key…, salt)``, so
    one hot key's rows land on ``n_salt`` different reducers instead of
    one straggler task. Result is row-identical to the plain join: each
    probe row matches exactly the one replica carrying its salt.

    Cost model: build side pays ``n_salt×`` replication through the
    shuffle — use when the build side is far smaller than the hot key's
    row count but too big (or too dynamic) to broadcast. Only ``inner``
    and ``left`` preserve semantics: in a right/full join every unmatched
    build REPLICA would null-extend, emitting ``n_salt`` duplicates.

    Salt values are intentionally allowed to differ across task retries
    (monotonically_increasing_id is volatile): every salt value has a
    matching replica on the build side, so any assignment yields the same
    rows — determinism of the *result*, not of the salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched build-side "
            "replicas; only inner/left preserve join semantics"
        )
    if n_salt < 1:
        raise ValueError(f"salted_join: n_salt ({n_salt}) must be >= 1")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("salted_join: input already has a __salt column")
    keys = [on] if isinstance(on, str) else list(on)
    l_s = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)).cast("int"),
    )
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return l_s.join(r_s.hint("shuffle_hash"), [*keys, "__salt"], how).drop("__salt")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Point-in-interval join WITHOUT a nested loop: the classic binning
    rewrite for Spark's non-equi-join weakness (the same trick Databricks'
    range-join optimization applies internally — public technique).

    Each point lands in one bin (``floor(p / bin_width)``); each interval
    fans out to the bins it overlaps (``len/bin_width + 1`` rows). The
    join is then a plain bin-keyed EQUI-join with the true
    ``start <= p <= end`` predicate as a residual filter — a keyed
    shuffle Catalyst can hash/sort-merge and AQE can skew-split, instead
    of the O(|P|·|I|) BroadcastNestedLoopJoin a raw BETWEEN join plans.

    Every (interval, point) pair appears EXACTLY once (the point's single
    bin matches at most one exploded row per interval) — no post-join
    dedup. Pick ``bin_width`` near the median interval length: wider bins
    cut the fan-out, narrower bins cut residual-filter waste. Axis must
    be INTEGRAL (days/epochs — it is cast to long): binning is pure int64
    floor division, exact across the whole axis including epoch-nanos
    (a double divide would mis-bin values >= 2^53) and negative values.

    At 100 TB: fan-out is bounded and explicit, the shuffle is keyed on
    ``__bin``, and a corpus partitioned/bucketed by bin turns the probe
    into a co-located join. Reference scope: conditional joins
    (cpp/include/cudf/join.hpp conditional_inner_join) — the reference
    executes the nested loop on-GPU; this is the shuffle-architecture
    answer to the same semantics.

    Degenerate inputs: ``bin_width <= 0`` is rejected loudly (it would
    yield null/zero-division bins and silently match nothing). An
    inverted interval (end < start) produces junk bins via Spark's
    descending ``sequence`` but CANNOT produce wrong matches — the
    residual ``start <= p <= end`` is unsatisfiable for it; such rows
    only waste join work, so feed sanitized intervals.
    """
    if bin_width <= 0:
        raise ValueError(f"range_join_binned: bin_width ({bin_width}) must be positive")

    def _with_bin(df: DataFrame, src: str, out: str) -> DataFrame:
        # Pure INTEGER floor division: `floor(col / w)` would route through
        # a double divide, which mis-bins values >= 2^53 (epoch-nanos!) and
        # silently drops matches near bin boundaries. Subtracting the
        # non-negative pmod makes the value exactly divisible by the width,
        # so integral `div` (truncating) equals floor for negatives too —
        # exact across the full int64 axis.
        c = F.col(src).cast("long")
        return df.withColumn("__exact", c - F.pmod(c, F.lit(bin_width))).withColumn(
            out, F.expr(f"__exact div {bin_width}")
        ).drop("__exact")

    p = _with_bin(points, point_col, "__bin")
    iv = _with_bin(
        _with_bin(intervals, start_col, "__bin_lo"), end_col, "__bin_hi"
    ).withColumn("__bin", F.explode(F.sequence(F.col("__bin_lo"), F.col("__bin_hi")))).drop(
        "__bin_lo", "__bin_hi"
    )
    return (
        iv.join(p, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )
