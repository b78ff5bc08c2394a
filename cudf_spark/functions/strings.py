"""String functions mirroring libcudf's strings namespace
(cpp/include/cudf/strings/) where Spark lacks an exact builtin.

- ``zfill``    — sign-aware zero pad (strings/padding.hpp:82).
- ``swapcase`` — per-character case flip (strings/case.hpp to_lower/upper
  family; pandas ``str.swapcase``).
- ``title``    — exact title-case, unlike ``initcap`` which also lowercases
  nothing... (strings/capitalize.hpp:53 ``title``).
- ``strptime_to_jvm`` — translate the reference's strptime-style datetime
  format strings (%Y-%m-%d, convert_datetime.hpp:79) to JVM patterns.

All pure Column expressions — codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zfill(col: Column, width: int) -> Column:
    """Zero-pad to ``width`` keeping a leading sign in place ('-42' → '-042').

    No-op on strings already >= width (cudf/pandas semantics) — Spark's
    ``lpad`` would otherwise truncate them ('-12345' with width 4 → '-123').
    """
    sign = F.substring(col, 1, 1)
    has_sign = sign.isin("-", "+")
    body = F.substring(col, 2, 1 << 30)
    padded = F.when(has_sign, F.concat(sign, F.lpad(body, width - 1, "0"))).otherwise(
        F.lpad(col, width, "0")
    )
    return F.when(F.length(col) >= width, col).otherwise(padded)


def swapcase(col: Column) -> Column:
    """Flip the case of every character (non-letters unchanged)."""
    return F.array_join(
        F.transform(
            F.split(col, ""),
            lambda c: F.when(F.upper(c) == c, F.lower(c)).otherwise(F.upper(c)),
        ),
        "",
    )


def title(col: Column) -> Column:
    """Title-case: first char of each space-separated word upper, rest lower."""
    return F.array_join(
        F.transform(
            F.split(col, " "),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 1 << 30))),
        ),
        " ",
    )


# strptime directive → JVM DateTimeFormatter pattern
_STRPTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH", "%I": "hh",
    "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%j": "DDD", "%b": "MMM",
    "%B": "MMMM", "%a": "EEE", "%A": "EEEE", "%p": "a", "%z": "xx", "%%": "%",
}


def strptime_to_jvm(fmt: str) -> str:
    """Translate a strptime-style format (cudf convert_datetime.hpp:79) to a
    JVM pattern usable with ``F.to_timestamp`` / ``F.date_format``.

    Literal text that could be mistaken for pattern letters — and any
    literal single quote — is emitted as ONE quoted section per maximal
    run, with internal quotes doubled (``o'clock`` → ``'o''clock'``):
    per-character quoting breaks down the moment a raw ``'`` lands
    between two quoted letters (verified against Spark's parser, which
    accepts ``'o''clock'`` and rejects the merged per-char form)."""
    out: list[str] = []
    run: list[str] = []  # pending literal chars needing a quoted section

    def flush() -> None:
        if run:
            out.append("'" + "".join(run).replace("'", "''") + "'")
            run.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok not in _STRPTIME:
                raise ValueError(f"unsupported strptime directive {tok!r}")
            flush()
            out.append(_STRPTIME[tok])
            i += 2
        elif fmt[i].isalpha() or fmt[i] == "'":
            run.append(fmt[i])
            i += 1
        else:
            flush()
            out.append(fmt[i])
            i += 1
    flush()
    return "".join(out)
