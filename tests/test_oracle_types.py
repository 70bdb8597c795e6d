"""Mechanical oracle-typing audit.

DuckDB's SUM over integers returns HUGEINT (int128), which pyarrow
surfaces as a decimal and the driver's value-hash canonicalizes
differently from Spark's BIGINT — a silent hash-fail class that bit
rounds 1 AND 2 (`SUM(x)` forms in r1, `SUM(CAST(x AS BIGINT))` forms
in r2). This test runs EVERY registered oracle through DuckDB with a
LIMIT 0 and asserts no result column types as HUGEINT (or any other
int128), so the class can never reach the driver again.
"""

from __future__ import annotations

import pytest

from starrocks_spark import registry

_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_hugeint_columns(name, duck):
    rel = duck.sql(f"SELECT * FROM ({_ORACLES[name]}) q LIMIT 0")
    bad = [
        f"{col}:{dtype}"
        for col, dtype in zip(rel.columns, rel.types)
        if "INT128" in str(dtype).upper() or "HUGEINT" in str(dtype).upper()
    ]
    assert not bad, (
        f"oracle '{name}' emits HUGEINT column(s) {bad}; wrap the "
        "aggregate in an outer CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_driver_hostile_types(name, duck):
    """Three more type classes the driver's compare rejects even when
    VALUES are identical (all bit round 4):

    - TIMESTAMP WITH TIME ZONE (DuckDB to_timestamp()): schema-fails
      against Spark's ntz-rendered TimestampType → use make_timestamp.
    - LIST columns: the driver canonicalizes via pandas sort_values,
      which cannot factorize list cells → crash. Join arrays to strings.
    - DECIMAL wider than 18 digits: DuckDB's pandas export degrades it
      to float64 while Spark returns exact Decimal → hash-fail. Cast to
      BIGINT/DOUBLE explicitly.
    """
    rel = duck.sql(f"SELECT * FROM ({_ORACLES[name]}) q LIMIT 0")
    bad = []
    for col, dtype in zip(rel.columns, rel.types):
        s = str(dtype).upper()
        if "WITH TIME ZONE" in s or s == "TIMESTAMPTZ":
            bad.append(f"{col}:{s} (tz-aware; use make_timestamp)")
        elif s.endswith("[]") or s.startswith("LIST") or "STRUCT" in s:
            bad.append(f"{col}:{s} (list/struct; array_to_string it)")
        elif s.startswith("DECIMAL"):
            digits = int(s.split("(")[1].split(",")[0])
            if digits > 18:
                bad.append(f"{col}:{s} (wide decimal → float64 in pandas)")
    assert not bad, f"oracle '{name}' emits driver-hostile column(s) {bad}"
