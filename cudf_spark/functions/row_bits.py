"""row_bit_count (cudf/transform.hpp:445): per-row size in bits as the row
would be laid out in cudf's columnar format.

There is no Spark builtin, so this walks the DataFrame schema and builds
one arithmetic expression — pure JVM-side, codegen-friendly, no UDF.

Accounting (mirrors the cudf documentation for transform.hpp row_bit_count):
- fixed-width column: dtype bits + 1 validity bit
- string column: 8·octet_length + 32 (offset entry) + 1 validity bit
- list column: 32 (offset entry) + 1 validity bit + Σ element bits
  (each element likewise carries its own validity bit)
- struct column: 1 validity bit + Σ child bits

Null values still pay their fixed-width/offset footprint (columnar slots
exist regardless), matching cudf's accounting; a null string/list pays the
offset + validity but zero payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FIXED_BITS = {
    T.BooleanType: 8,  # cudf bool8
    T.ByteType: 8,
    T.ShortType: 16,
    T.IntegerType: 32,
    T.LongType: 64,
    T.FloatType: 32,
    T.DoubleType: 64,
    T.DateType: 32,
    T.TimestampType: 64,
    T.TimestampNTZType: 64,
}


def _bits_for(col: Column, dtype: T.DataType) -> Column:
    for cls, bits in _FIXED_BITS.items():
        if isinstance(dtype, cls):
            return F.lit(bits + 1)
    if isinstance(dtype, T.DecimalType):
        width = 32 if dtype.precision <= 9 else (64 if dtype.precision <= 18 else 128)
        return F.lit(width + 1)
    if isinstance(dtype, T.StringType):
        payload = F.coalesce(F.octet_length(col) * 8, F.lit(0))
        return payload + F.lit(32 + 1)
    if isinstance(dtype, T.BinaryType):
        payload = F.coalesce(F.octet_length(col) * 8, F.lit(0))
        return payload + F.lit(32 + 1)
    if isinstance(dtype, T.ArrayType):
        per_elem = F.aggregate(
            F.coalesce(col, F.array().cast(dtype)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + _bits_for(x, dtype.elementType).cast("long"),
        )
        return per_elem + F.lit(32 + 1)
    if isinstance(dtype, T.StructType):
        total: Column = F.lit(1)
        for f in dtype.fields:
            total = total + _bits_for(col.getField(f.name), f.dataType)
        return total
    raise TypeError(f"row_bit_count: unsupported type {dtype}")


def row_bit_count(df: DataFrame) -> Column:
    """One BIGINT column: total bits this row occupies in columnar layout."""
    total: Column = F.lit(0).cast("long")
    for f in df.schema.fields:
        total = total + _bits_for(F.col(f.name), f.dataType).cast("long")
    return total.alias("row_bits")


_INT_BYTE_WIDTHS = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.LongType: 8,
}
_FLOAT_BYTE_WIDTHS = {T.FloatType: 4, T.DoubleType: 8}


def byte_cast(col: Column, dtype: T.DataType, *, endian: str = "big") -> Column:
    """cudf ``byte_cast`` (cpp/include/cudf/reshape.hpp:99): each value of a
    fixed-width column becomes the list of its bytes, big- or little-endian.

    Integer types stay JVM-side — one shift+mask expression per byte, fully
    inside whole-stage codegen (the two's-complement low ``w`` bytes of the
    sign-extended long are exactly the value's bytes). Float types need a
    bit reinterpret Spark has no builtin for, so they go through one
    Arrow-batched pandas_udf (numpy ``view(uint8)``), nulls preserved.
    Returns ``array<int>`` with values 0-255 (cudf's uint8 list, widened —
    Spark has no unsigned type)."""
    if endian not in ("big", "little"):
        raise ValueError(f"byte_cast: endian must be 'big' or 'little', got {endian!r}")
    for cls, w in _INT_BYTE_WIDTHS.items():
        if isinstance(dtype, cls):
            shifts = [8 * (w - 1 - i) for i in range(w)]
            if endian == "little":
                shifts = shifts[::-1]
            v = col.cast("long")
            arr = F.array(
                *[
                    F.shiftrightunsigned(v, s).bitwiseAND(F.lit(255)).cast("int")
                    for s in shifts
                ]
            )
            # null value -> null list (not a list of nulls), cudf semantics
            return F.when(col.isNull(), F.lit(None).cast("array<int>")).otherwise(arr)
    for cls, w in _FLOAT_BYTE_WIDTHS.items():
        if isinstance(dtype, cls):
            np_t = "float32" if w == 4 else "float64"
            big = endian == "big"

            @F.pandas_udf("array<int>")
            def _bytes_of(s):  # type: ignore[no-untyped-def]
                import numpy as np
                import pandas as pd

                # Known null/NaN conflation (SURVEY §7 hard-part 3): pandas
                # delivers SQL NULL and float NaN identically, so a genuine
                # NaN VALUE byte-casts to NULL here where cudf would emit
                # the NaN bit pattern. Arrow validity buffers (map_arrow)
                # would disambiguate, at the cost of the Column-expression
                # API this function keeps.
                mask = s.isna()
                a = s.fillna(0.0).to_numpy(dtype=np_t)
                b = a.view(np.uint8).reshape(-1, w)
                if big:
                    b = b[:, ::-1]  # numpy host order is little-endian
                out = [None if m else row.tolist() for m, row in zip(mask, b.astype(int))]
                return pd.Series(out)

            return _bytes_of(col)
    raise TypeError(f"byte_cast: unsupported type {dtype}")


def zorder2(x: Column, y: Column, *, bits: int) -> Column:
    """Two-dimensional Morton (z-order) key: interleave the low ``bits``
    bits of ``x`` and ``y`` (x on even positions, y on odd). Data written
    sorted by this key clusters BOTH dimensions — every run of rows spans
    a small axis-aligned rectangle, so parquet row-group min/max prune on
    either column (the multi-dimensional-layout technique Delta/Iceberg
    expose as OPTIMIZE ZORDER — public; Morton 1966).

    Pure shift/mask integer arithmetic inside whole-stage codegen; inputs
    must already be reduced to ``bits``-bit non-negative range (mask or
    pmod upstream — this function masks defensively).

    ``bits`` is capped at 31: with bits=31 the highest position used is
    2*30+1 = 61, leaving bit 62 unused and bit 63 (the SIGN bit) safely
    clear; bits=32 would place y's top bit at position 63 and silently
    invert the sort order for half the keyspace. Inputs MUST be
    non-negative: the SQL
    mirror uses DuckDB's arithmetic ``>>`` while this side uses
    shiftrightunsigned, so the two diverge on negative inputs (the
    defensive ``& 1`` masking makes them agree only for x, y >= 0).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder2: bits must be in [1, 31], got {bits}")
    xs, ys = x.cast("long"), y.cast("long")
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftrightunsigned(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftrightunsigned(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder2_sql(x: str, y: str, *, bits: int) -> str:
    """DuckDB mirror of :func:`zorder2` (same shift/mask terms; same
    bits cap and non-negative-input requirement — DuckDB ``>>`` is an
    arithmetic shift, so negative inputs diverge from the Spark side)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder2_sql: bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
