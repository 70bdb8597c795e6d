"""MySQL-dialect scalar functions the reference ships that Spark has no
direct builtin for (reference registry: gensrc/script/functions.py;
implementations be/src/exprs/string_functions.cpp,
time_functions.cpp). Everything here is built-in-expression
composition — JVM-side, codegen-friendly, no Python UDFs — and each
has a deterministic DuckDB twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- money_format
# Reference: string_functions.cpp money_format — round to cents
# (half-up) and group thousands: money_format(1234567.891) =
# '1,234,567.89'. Built from integer cents so BOTH engines format the
# identical exact integer (no double-formatting ambiguity): half-up in
# pure IEEE ops, then group the integer part, then append the 2-digit
# cent part.


def money_format(x: Column) -> Column:
    cents = F.floor(F.abs(x) * 100 + F.lit(0.5)).cast("long")
    whole = (cents / 100).cast("long")
    frac = cents % 100
    sign = F.when(x < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(
        sign,
        F.format_number(whole, 0),  # grouping of an exact integer
        F.lit("."),
        F.lpad(frac.cast("string"), 2, "0"),
    )


def sql_money_format(expr: str) -> str:
    cents = f"CAST(FLOOR(ABS({expr}) * 100 + 0.5) AS BIGINT)"
    return (
        f"(CASE WHEN ({expr}) < 0 THEN '-' ELSE '' END || "
        f"format('{{:,}}', {cents} // 100) || '.' || "
        f"lpad(CAST({cents} % 100 AS VARCHAR), 2, '0'))"
    )


# --------------------------------------------------------------- format_bytes
# Reference: string_functions.cpp format_bytes — binary-prefixed
# human-readable size ('1.50 KB'). Deterministic: pick the power-1024
# bucket, divide, round half-up to 2 decimals via integer math.

_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def format_bytes(n: Column) -> Column:
    out = F.concat(n.cast("string"), F.lit(" B"))
    for i, unit in enumerate(_UNITS[1:], start=1):
        lo, hi = float(1024 ** i), float(1024 ** (i + 1))
        hundredths = F.floor(n / F.lit(lo) * 100 + F.lit(0.5)).cast("long")
        txt = F.concat(
            (hundredths / 100).cast("long").cast("string"),
            F.lit("."),
            F.lpad((hundredths % 100).cast("string"), 2, "0"),
            F.lit(" " + unit),
        )
        cond = (n >= lo) & (n < hi) if i < len(_UNITS) - 1 else (n >= lo)
        out = F.when(cond, txt).otherwise(out)
    return out


def sql_format_bytes(expr: str) -> str:
    out = f"(CAST({expr} AS VARCHAR) || ' B')"
    for i, unit in enumerate(_UNITS[1:], start=1):
        lo, hi = float(1024 ** i), float(1024 ** (i + 1))
        h = f"CAST(FLOOR(({expr}) / {lo!r} * 100 + 0.5) AS BIGINT)"
        txt = (
            f"(CAST({h} // 100 AS VARCHAR) || '.' || "
            f"lpad(CAST({h} % 100 AS VARCHAR), 2, '0') || ' {unit}')"
        )
        cond = (
            f"({expr}) >= {lo!r} AND ({expr}) < {hi!r}"
            if i < len(_UNITS) - 1 else f"({expr}) >= {lo!r}"
        )
        out = f"(CASE WHEN {cond} THEN {txt} ELSE {out} END)"
    return out


# ----------------------------------------------------------------- time_slice
# Reference: time_functions.cpp time_slice(dt, INTERVAL n unit,
# FLOOR|CEIL) — align a timestamp to an n-unit grid anchored at epoch
# ('0001-01-01' in the reference; epoch 1970 here, matching its
# date_slice docs examples modulo anchor). CEIL = FLOOR + one slice
# for values not already on the grid.

_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def time_slice(ts: Column, n: int, unit: str, mode: str = "floor") -> Column:
    """Epoch-anchored n-unit bucketing. ``unit`` ∈ second/minute/hour/
    day/week (sub-month grids are fixed-width; month/year grids are the
    date_trunc family, which Spark covers natively)."""
    width = n * _UNIT_SECONDS[unit]
    epoch = F.unix_timestamp(ts)
    base = F.floor(epoch / width) * width
    if mode == "ceil":
        base = F.when(epoch % width == 0, base).otherwise(base + width)
    return F.timestamp_seconds(base.cast("long"))


def sql_time_slice(expr: str, n: int, unit: str,
                   mode: str = "floor") -> str:
    # DuckDB's epoch() keeps fractional seconds (and CAST rounds, where
    # Spark's unix_timestamp truncates) — floor to integer seconds
    # first so both engines bucket the identical integer.
    width = n * _UNIT_SECONDS[unit]
    epoch = f"CAST(FLOOR(epoch({expr})) AS BIGINT)"
    base = f"(({epoch} // {width}) * {width})"
    if mode == "ceil":
        base = (
            f"(CASE WHEN {epoch} % {width} = 0 THEN {base} "
            f"ELSE {base} + {width} END)"
        )
    # make_timestamp(micros) yields plain TIMESTAMP; to_timestamp()
    # yields TIMESTAMPTZ, which the driver's schema check rejects
    # against Spark's (ntz-rendered) TimestampType.
    return f"make_timestamp({base} * 1000000)"
