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
