"""The main correctness gate: every registered query whose oracle SQL
exists must match the DuckDB oracle at sf0.01 — exactly what the
driver's t2 check does."""

from __future__ import annotations

import pytest

from starrocks_spark import registry
from tests._compare import assert_matches_oracle

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, _ORACLES[name], name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_consistency():
    assert set(_ORACLES) <= set(_QUERIES)
