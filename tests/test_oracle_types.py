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


_WINDOW = list(registry.all_queries())[:50]


@pytest.mark.parametrize("name", _WINDOW)
def test_driver_window_spark_schema_not_hostile(name, spark, sf_dir,
                                                duck):
    """The r7 driver round proved the hash is type-sensitive at the
    PANDAS-EXPORT level, not just the logical-type level: Spark
    DecimalType collects as object-dtype Decimal while a DuckDB DECIMAL
    of the same precision exports as float64 (hash-fail with identical
    values — `dialect_sqltester_case_when`), and Spark DateType
    collects as object-dtype date while DuckDB DATE exports as
    datetime64. So for every query in the 50-slot driver window, build
    the Spark plan (schema only — no execution) and flag:

    - any DecimalType output column (cast to DOUBLE on both engines,
      or BIGINT when integral);
    - any DateType output column (render as a string on both engines);
    - a TimestampType column whose oracle twin is not TIMESTAMP.

    TimestampType-vs-TIMESTAMP is allowed: both export datetime64[ns]
    under the session's UTC zone (green driver rows since r2 prove it).
    """
    from pyspark.sql.types import DateType, DecimalType, TimestampType

    df = registry.all_queries()[name](spark, sf_dir)
    oracle = _ORACLES.get(name)
    duck_types = {}
    if oracle is not None:
        rel = duck.sql(f"SELECT * FROM ({oracle}) q LIMIT 0")
        duck_types = {c.lower(): str(t).upper()
                      for c, t in zip(rel.columns, rel.types)}
    bad = []
    for f in df.schema.fields:
        twin = duck_types.get(f.name.lower(), "")
        if isinstance(f.dataType, DecimalType):
            bad.append(f"{f.name}:{f.dataType} (object-dtype Decimal "
                       f"vs oracle {twin or 'n/a'} → cast both sides)")
        elif isinstance(f.dataType, DateType):
            bad.append(f"{f.name}:DateType (object-dtype date vs "
                       f"oracle {twin or 'n/a'} → string both sides)")
        elif isinstance(f.dataType, TimestampType) and \
                duck_types and twin != "TIMESTAMP":
            bad.append(f"{f.name}:TimestampType vs oracle {twin!r} "
                       "(pandas export mismatch)")
    assert not bad, (
        f"driver-window query '{name}' emits pandas-hostile column(s) "
        f"{bad} — normalize on BOTH engines before the driver sees it"
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
