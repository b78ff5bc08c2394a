"""Deterministic cross-engine hashing.

libcudf ships murmur3_x86_32 / xxhash64 / md5 / sha family
(cpp/include/cudf/hashing.hpp:53-194). Spark's ``F.hash`` IS
murmur3_x86_32 and ``F.xxhash64`` matches — but the DuckDB oracle has
neither, so for oracle-checked pipelines (min-hash dedup, fingerprints) we
derive a 60-bit integer hash from md5 (identical everywhere):

    hash60(s) = int(hex(md5(s))[:15], 16)

15 hex digits = 60 bits < 2^63, so the value fits a BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F



def hash60(col: Column, seed: int | None = None) -> Column:
    """60-bit integer hash via md5 hex prefix; identical in Spark and DuckDB."""
    s = F.concat(F.lit(f"{seed}|"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side mirror of :func:`hash60` as a SQL fragment."""
    s = f"'{seed}|' || {expr}" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"
