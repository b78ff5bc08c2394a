"""Persisted, mergeable quantile sketches — the Spark-first counterpart of
the reference's MERGE_TDIGEST / MERGE_HISTOGRAM aggregation kinds
(cpp/include/cudf/aggregation.hpp:109-117): build a sketch per run, store
it as a plain table, merge sketches from different runs later, and extract
quantiles from the merged state without revisiting the raw data.

Spark's own ``percentile_approx`` t-digest state is internal to one query
— it cannot be written out and merged across runs from the public API. So
the persisted sketch here is a fixed-bin histogram with per-bin min/max:

* exactly mergeable — ``sketch(A ∪ B) == merge(sketch(A), sketch(B))``
  bin by bin (counts add, mins/maxes combine), with no approximation
  introduced by the merge itself (t-digest merges, by contrast, lose
  precision on every merge);
* bounded error — a quantile read from the merged sketch lands inside the
  target bin's observed [v_min, v_max], so the error is at most the bin
  width (and usually far less, since interpolation uses the observed
  range, not the nominal bin edges);
* pure relational state — one (key, bin, cnt, v_min, v_max) row per
  non-empty bin: partial aggregation makes the build skew-immune, the
  sketch table is tiny (≤ n_bins rows per key), and merging N runs is a
  union + re-aggregate on (key, bin) — one shuffle of sketch rows, never
  of raw data.

In-query approximate quantiles stay on ``percentile_approx``
(agg_approx_sketches); this module is for the persist-then-merge
workflow.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Build the per-key histogram sketch of ``value_col``.

    Values outside [lo, hi] clamp into the edge bins (their true value
    still shows in v_min/v_max, so extraction stays honest about range).
    """
    if hi <= lo:
        raise ValueError(f"histogram_sketch: hi ({hi}) must exceed lo ({lo})")
    if n_bins < 1:
        raise ValueError(f"histogram_sketch: n_bins ({n_bins}) must be >= 1")
    # NULL values must not sketch: floor(NULL) is NULL but Spark's
    # greatest/least SKIP null args, so an unfiltered NULL would land in
    # bin 0 as a phantom count (while v_min/v_max skip it) and shift
    # every extracted quantile — same junk-row guard as bloom/cms build
    df = df.filter(F.col(value_col).isNotNull())
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    # clamp on the LONG floor result, THEN cast: an outlier value far
    # outside [lo, hi) would otherwise overflow the int cast (ANSI mode
    # raises CAST_OVERFLOW; non-ANSI wraps into an arbitrary bin) —
    # the documented contract is edge-bin clamping either way
    b = (
        F.least(
            F.lit(n_bins - 1).cast("bigint"),
            F.greatest(F.lit(0).cast("bigint"), F.floor((v - F.lit(lo)) / F.lit(width))),
        )
        .cast("int")
    )
    return df.groupBy(*keys, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
    )


def _union_fold(sketches: Sequence[DataFrame], what: str) -> DataFrame:
    """unionByName-fold shared by every sketch merge; loud on []."""
    if not sketches:
        raise ValueError(f"{what}: need at least one sketch table to merge")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged


def merge_sketches(sketches: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge persisted sketch tables (same keys/binning): counts add,
    observed ranges combine. Exact — introduces no new approximation."""
    merged = _union_fold(sketches, "merge_sketches")
    return merged.groupBy(*keys, "bin").agg(
        F.sum("cnt").alias("cnt"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def quantile_from_sketch(
    sketch: DataFrame, keys: Sequence[str], q: float
) -> DataFrame:
    """Per-key quantile estimate from a (merged) sketch.

    Finds the bin holding the rank-``floor(q·(n−1))+1`` value and
    interpolates inside the bin's OBSERVED [v_min, v_max] — error is
    bounded by the bin's observed width.
    """
    wb = Window.partitionBy(*keys).orderBy("bin")
    wp = Window.partitionBy(*keys)
    cum = sketch.select(
        *keys,
        "bin",
        "cnt",
        "v_min",
        "v_max",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(wp).alias("total"),
    )
    target = F.floor(F.lit(q) * (F.col("total").cast("double") - 1)).cast("bigint") + 1
    hits = cum.withColumn("target", target).filter(F.col("cum") >= F.col("target"))
    first = hits.withColumn(
        "rn", F.row_number().over(Window.partitionBy(*keys).orderBy("bin"))
    ).filter(F.col("rn") == 1)
    frac = (
        F.col("target") - (F.col("cum") - F.col("cnt")) - 1
    ).cast("double") / F.greatest(F.col("cnt") - 1, F.lit(1)).cast("double")
    return first.select(
        *keys,
        (F.col("v_min") + (F.col("v_max") - F.col("v_min")) * frac).alias("q_est"),
    )


BLOOM_WORDS = 16  # 16 words x 63 usable bits = 1008 bits
BLOOM_PROBES = 3
# 63 bits per word, not 64: a mask with bit 63 set is negative in two's
# complement and DuckDB's BIGINT << 63 raises OutOfRange — keeping masks
# positive makes sketch bytes identical and portable across engines.
BLOOM_BITS_PER_WORD = 63


def bloom_build(
    df: DataFrame,
    keys: Sequence[str],
    item: str,
    *,
    n_words: int = BLOOM_WORDS,
    n_probes: int = BLOOM_PROBES,
    seed: int = 100,
) -> DataFrame:
    """Per-key Bloom filter as a plain relational sketch — one
    (key, word, bits) row per non-zero word (63 usable bits each) (public Bloom 1970
    construction; the same structure Spark's runtime bloom joins build
    internally but cannot persist).

    Bit positions come from the cross-engine hash60, so the sketch bytes
    are engine-reproducible: probe j of value v sets bit
    ``hash60(v, seed+j) mod (63*n_words)`` — 63 usable bits per word,
    word = pos // 63, bit = pos % 63 (see BLOOM_BITS_PER_WORD for why
    bit 63 is never used). Build is explode(probes) +
    one (key, word)-keyed bit_or — partial aggregation makes it
    skew-immune, and the sketch is <= n_words rows per key regardless of
    input size. Merging runs is a union + bit_or on (key, word): sketch
    rows cross the wire, never raw values, and
    ``bloom(A ∪ B) == merge(bloom(A), bloom(B))`` EXACTLY by
    construction (OR is associative/commutative/idempotent).
    """
    from cudf_spark.functions.hashing import hash60

    # same null contract as cms_build: a null item hashes to null probes
    # and would survive as a junk (key, NULL, NULL) row in the persisted
    # sketch — drop at build; a null probe never equi-joins anyway
    df = df.filter(F.col(item).isNotNull())

    nbits = BLOOM_BITS_PER_WORD * n_words
    probes = F.array(
        *[
            (hash60(F.col(item).cast("string"), seed=seed + j) % nbits).alias(f"p{j}")
            for j in range(n_probes)
        ]
    )
    pos = df.select(*keys, F.explode(probes).alias("pos"))
    # shiftleft's bit count must be an expression, not the python-int-only
    # F.shiftleft argument — compute bit first, shift via expr.
    return (
        pos.select(
            *keys,
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("int").alias("word"),
            (F.col("pos") % BLOOM_BITS_PER_WORD).cast("int").alias("bit"),
        )
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .groupBy(*keys, "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(sketches: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """OR-merge bloom sketch tables from independent runs (exact)."""
    merged = _union_fold(sketches, "bloom_merge")
    return merged.groupBy(*keys, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    keys: Sequence[str],
    item: str,
    *,
    n_words: int = BLOOM_WORDS,
    n_probes: int = BLOOM_PROBES,
    seed: int = 100,
) -> DataFrame:
    """Membership test of ``probes`` rows against a per-key bloom sketch:
    hit iff ALL probe bits are set (no false negatives; false positives
    bounded by the standard (1-e^{-kn/m})^k rate).

    The probe explodes to n_probes (key, word, mask) lookups joined to
    the sketch on (key, word) — a sketch-row-sized broadcast in practice
    — then re-groups per probe requiring every mask matched.

    ``n_words``/``n_probes``/``seed`` MUST match the build call: the
    sketch table carries no parameter metadata, and a mismatch silently
    degrades to garbage membership (including false negatives). Persist
    the parameters next to the sketch table in production."""
    from cudf_spark.functions.hashing import hash60

    nbits = BLOOM_BITS_PER_WORD * n_words
    parr = F.array(
        *[
            (hash60(F.col(item).cast("string"), seed=seed + j) % nbits).alias(f"p{j}")
            for j in range(n_probes)
        ]
    )
    want = (
        probes.select(*keys, F.col(item).alias("__probe"), F.explode(parr).alias("pos"))
        .select(
            *keys,
            "__probe",
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("int").alias("word"),
            (F.col("pos") % BLOOM_BITS_PER_WORD).cast("int").alias("bit"),
        )
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .drop("bit")
    )
    joined = want.join(sketch, [*keys, "word"], "left")
    hit_bit = (F.col("bits").isNotNull()) & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return (
        joined.groupBy(*keys, "__probe")
        .agg(F.min(F.when(hit_bit, 1).otherwise(0)).alias("__allhit"))
        .select(*keys, F.col("__probe").alias(item), (F.col("__allhit") == 1).alias("bloom_hit"))
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_SEED = 200


def _cms_hash(item_col, row_col, *, seed: int):
    """hash60 with a per-depth-row seed: md5 of ``"{seed+r}|{item}"`` —
    identical text in both engines (see cms_build's oracle mirror)."""
    from cudf_spark.functions.hashing import hash60

    return hash60(
        F.concat((F.lit(seed) + row_col).cast("string"), F.lit("|"), item_col)
    )


def cms_build(
    df: DataFrame,
    keys: Sequence[str],
    item: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005 — public
    literature) as a plain relational table: one ``(*keys, r, c, cnt)``
    row per non-empty cell, ``depth × width`` cells max regardless of
    input size.

    Build is explode(depth) + one (keys, r, c)-keyed count — partial
    aggregation makes it skew-immune; the sketch rows are what persists
    and ships, never raw values. Exactly mergeable:
    ``cms(A ∪ B) == merge(cms(A), cms(B))`` cell by cell (counts add;
    the estimate-time min is taken after merging, so the merge itself
    introduces no error — same contract as histogram_sketch/bloom).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"cms_build: depth ({depth}) and width ({width}) must be >= 1")
    # null items hash to null cells that no probe can hit — drop them at
    # build so the sketch holds only real values (a null probe then
    # estimates 0, consistent with "null occurs zero times")
    df = df.filter(F.col(item).isNotNull())
    rows = df.select(
        *keys,
        F.col(item).cast("string").alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    return (
        rows.select(
            *keys,
            "r",
            (_cms_hash(F.col("__v"), F.col("r"), seed=seed) % width).cast("int").alias("c"),
        )
        .groupBy(*keys, "r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_merge(sketches: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Sum-merge count-min sketch tables from independent runs (exact)."""
    merged = _union_fold(sketches, "cms_merge")
    return merged.groupBy(*keys, "r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    keys: Sequence[str],
    item: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Frequency estimate per probe row: min over the ``depth`` cells the
    item hashes to (missing cell = 0). Never underestimates; overshoot
    bounded by ``e·N/width`` with probability ``1 - e^-depth``.

    ``depth``/``width``/``seed`` MUST match the build call — mismatched
    parameters silently probe the wrong cells (same contract as
    bloom_probe).
    """
    p = probes.select(
        *keys,
        F.col(item).alias("__item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).withColumn(
        "c",
        (_cms_hash(F.col("__item").cast("string"), F.col("r"), seed=seed) % width).cast(
            "int"
        ),
    )
    joined = p.join(sketch, [*keys, "r", "c"], "left")
    return (
        joined.groupBy(*keys, "__item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .withColumnRenamed("__item", item)
    )


def cms_oracle_cell_sql(value_expr: str, *, width: int = CMS_WIDTH, seed: int = CMS_SEED) -> str:
    """DuckDB mirror of the per-(row, value) CMS cell id: requires a
    ``rows_`` CTE in scope (see :func:`cms_oracle_cells_sql`)."""
    return (
        f"CAST(CAST(('0x' || substr(md5(CAST({seed} + rows_.r AS VARCHAR) "
        f"|| '|' || {value_expr}), 1, 15)) AS BIGINT) % {width} AS INT)"
    )


def cms_oracle_cells_sql(
    *, depth: int = CMS_DEPTH, width: int = CMS_WIDTH, seed: int = CMS_SEED
) -> str:
    """``rows_`` + ``cells`` CTE fragment replaying :func:`cms_build` in
    DuckDB over a CTE ``u(v)`` of string values — the single source both
    CMS oracles share (a parameter drift between build and oracle would
    silently desync exactly one query)."""
    return f"""rows_ AS (SELECT unnest(generate_series(0, {depth - 1})) AS r),
    cells AS (
        SELECT rows_.r, {cms_oracle_cell_sql('u.v', width=width, seed=seed)} AS c,
               CAST(count(*) AS BIGINT) AS cnt
        FROM u CROSS JOIN rows_ GROUP BY 1, 2)"""


def bitmap_build(
    df: DataFrame,
    keys: Sequence[str],
    item: str,
    *,
    bits_per_word: int = 63,
) -> DataFrame:
    """Per-key EXACT distinct-count bitmap over a non-negative integer id
    column: one ``(keys, word, bits)`` row per non-empty 63-bit word
    (the same positive-mask discipline as the Bloom sketch — bit 63
    would go negative and DuckDB's BIGINT << 63 raises). The exact,
    losslessly-mergeable counterpart of the HLL sketch (the
    roaring-bitmap aggregate ClickHouse/Iceberg expose): counts add
    under OR-merge with no error, state is ``max_id/63`` words per key
    at worst and only non-empty words materialize.

    Build = one keyed bit_or (map-side partial, skew-immune); merge =
    union + bit_or on (keys, word); count = sum of bit_count per key.
    """
    # integer division — `/` is double division in Spark and rounds for
    # ids above 2^53, which would assign the wrong word and corrupt the
    # exact count; `div` stays exact over the full bigint domain
    w = F.expr(f"CAST({item} AS BIGINT) div {int(bits_per_word)}").alias("word")
    b = (F.col(item) % bits_per_word).cast("int")
    return (
        df.filter(F.col(item) >= 0)
        .select(*keys, w, b.alias("bit"))
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .groupBy(*keys, "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bitmap_merge(sketches: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """OR-merge bitmap tables from independent runs (exact, lossless)."""
    merged = _union_fold(sketches, "bitmap_merge")
    return merged.groupBy(*keys, "word").agg(F.bit_or("bits").alias("bits"))


def bitmap_count(sketch: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact distinct count per key from a (merged) bitmap sketch."""
    return sketch.groupBy(*keys).agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
