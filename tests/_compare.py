"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle query — a local mirror of the driver's t2 check so we
catch mismatches before the driver does.

Strict mode: values must match exactly after canonicalization (the
decimal-sum policy in queries/_util.py is designed to make that hold
even for floating-point aggregates).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # exact repr — the decimal-sum policy should make both engines
        # produce bit-identical doubles
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )


def assert_no_hugeint(duck_con, oracle_sql, name=""):
    """The driver's value-hash is type-sensitive: DuckDB SUM(int) yields
    HUGEINT (int128), which Spark can never produce (it gives BIGINT), so
    a bare integer SUM in an oracle hash-mismatches even when values are
    identical. Guard: every oracle output column must be a type Spark can
    emit — flag HUGEINT so the fix (CAST(... AS BIGINT)) happens locally,
    before the driver sees it."""
    # NOTE: cursor.description blurs every numeric to 'NUMBER' — only
    # rel.types exposes HUGEINT (this gap let a SUM(int) oracle reach
    # the full-suite audit before being caught)
    rel = duck_con.sql(f"SELECT * FROM ({oracle_sql}) q LIMIT 0")
    bad = [
        (col, str(dtype))
        for col, dtype in zip(rel.columns, rel.types)
        if "HUGEINT" in str(dtype).upper() or "INT128" in str(dtype).upper()
    ]
    assert not bad, (
        f"{name}: oracle emits HUGEINT column(s) {bad} — wrap in "
        f"CAST(... AS BIGINT) (driver hash is type-sensitive)"
    )


def assert_matches_oracle(spark_df, duck_con, oracle_sql, name=""):
    assert_no_hugeint(duck_con, oracle_sql, name)
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(oracle_sql)
    d_cols = [c[0].lower() for c in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
