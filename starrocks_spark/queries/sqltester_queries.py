"""Driver queries for the SQL-tester acceptance tier: each entry runs
one of the REFERENCE's own end-to-end SQL suites
(``/root/reference/test/sql/<suite>/T/<case>``) through
``plans/sqltester.ScriptRunner`` — verbatim DDL (CREATE TABLE with
keys model / distribution → tables/models.py ManagedTable), verbatim
INSERTs (VALUES and INSERT..SELECT with the generate_series TVF), SET
no-ops — and returns one designated SELECT's result. The DuckDB
oracle compiles the SAME script into a single SELECT
(``duckdb_oracle_cast``: tables become CTEs of their inserts), so the
value-hash match proves the whole DDL+DML+query pipeline end-to-end.

The driver entry executes every non-SELECT statement plus the
designated SELECT (the full suite — every SELECT checked against the
reference's recorded R-file expectations — runs in
tests/test_sqltester.py). Designated selects are chosen to be
deterministic (the suites guarantee it: LIMIT-under-join counts,
≤LIMIT group counts, fully ORDER BY'ed outputs) and are renamed
positionally on BOTH engines so the driver's name-sorted value hash
compares the right columns (DuckDB SUM(int) is HUGEINT → cast to
BIGINT on the oracle side only; Spark's BIGINT is the reference's
own sum type, be/src/exprs/agg/sum.h).

Scale: fixture scripts (≤1.3M rows); every SELECT still plans through
Catalyst exactly like production queries — this tier tests the SQL
surface, not throughput.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from starrocks_spark.plans.sqltester import (
    REFERENCE_SQL_ROOT,
    ScriptRunner,
    classify,
    duckdb_oracle_cast,
    read_suite,
    split_statements,
)

reference_available = os.path.isdir(REFERENCE_SQL_ROOT)

# (suite, case, select index, output names, duck-side casts)
_SUITES: dict[str, tuple] = {
    "dialect_sqltester_case_when": (
        "test_case_when", "test_case_when", 3,
        ["region", "order_date", "income", "ship_mode", "ship_code"],
        {},
    ),
    "dialect_sqltester_agg_limit": (
        # limit-under-join counts + ≤LIMIT group-by selects on ~1.3M
        # generated rows; designated: the last max/sum-per-c1 select
        # on t5 (10 groups ≤ LIMIT 10 → deterministic)
        "test_agg", "test_agg_with_limit", -10,
        ["max_c3", "sc3", "c1"],
        {"sc3": "BIGINT"},
    ),
    "dialect_sqltester_grouping_set": (
        "test_agg", "test_grouping_set", -1,
        ["v2", "s", "ratio"],
        {"s": "BIGINT"},
    ),
    "dialect_sqltester_orderby_agg": (
        "test_agg", "test_orderby_agg", -1,
        ["potential_customer_rate", "v2"],
        {},
    ),
    "dialect_sqltester_tinyint_agg": (
        "test_agg", "test_tinyint_agg", -1,
        ["n"],
        {},
    ),
    # r7 additions: the new statement surfaces (join hints + <=>,
    # sum-over-outer-join rewrite, unnest TVF, :: shorthand casts
    # with CTAS) each proven end-to-end against the DuckDB twin
    "dialect_sqltester_null_safe_equal": (
        # join [bucket] + two-key <=> join, full * projection
        "test_join", "test_null_safe_equal", 2,
        ["a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4"],
        {},
    ),
    "dialect_sqltester_sum_rewrite": (
        # sum(expr) pushed through a right outer join, grouped+ordered
        "test_sum_rewrite", "test_sum_rewrite", -1,
        ["c0", "s1", "s2"],
        {"s1": "BIGINT", "s2": "BIGINT"},
    ),
    "dialect_sqltester_unnest": (
        # cartesian of two unnest TVFs with NULL elements
        "test_unnest", "test_unnest", 3,
        ["x0", "x1"],
        {},
    ),
    "dialect_sqltester_shorthand_cast": (
        # src.x::int = dim.y::int join over CTAS-era tables
        "test_cast", "test_shorthand_cast", -2,
        ["id", "xi", "k"],
        {},
    ),
    "dialect_sqltester_pk_partial_update": (
        # session-6 DML tier: UPDATE on a PRIMARY KEY table (column-
        # mode full-table update) + ALTER TABLE ADD COLUMN with a
        # DEFAULT, replayed on the oracle side as versioned CTEs
        "test_partial_update_column_mode",
        "test_partial_update_rowset_link", -1,
        ["k1", "k2", "v1", "v2", "v3", "v4", "v5", "v6"],
        {},
    ),
    "dialect_sqltester_delete_conditions": (
        # session-6 DML tier: chained DELETE WHERE over a low-
        # cardinality dup table; designated: the 4-way aggregate
        # between the value-delete and the delete-all
        "test_low_cardinality", "test_delete_conditions", -8,
        ["n", "nc0", "ndc0", "mx"],
        {"n": "BIGINT", "nc0": "BIGINT", "ndc0": "BIGINT"},
    ),
    "dialect_sqltester_asof_join": (
        # ASOF LEFT JOIN over datetime keys (session-3 desugar:
        # equi+inequality join pruned by row_number with the stored
        # insertion-order tie-break). The DuckDB oracle runs its own
        # NATIVE ASOF JOIN — two independent asof implementations
        # agreeing on the same script.
        "test_asof_join", "test_asof_join_basic.sql", 1,
        ["order_id", "user_id", "order_time", "price_time", "price"],
        {},
    ),
}


def _designated(script: str, idx: int) -> str:
    selects = [s for s in split_statements(script)
               if classify(s) == "select"]
    return selects[idx]


def _suite_query(suite: str, case: str, idx: int, out_names: list[str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        script = read_suite(suite, case)
        target = _designated(script, idx)
        # strict=False: environment-probe statements some suites open
        # with (show backends) are recorded as skips, not errors — the
        # designated SELECT still exercises the whole DDL+DML chain
        runner = ScriptRunner(spark, strict=False)
        for stmt in split_statements(script):
            if classify(stmt) != "select":
                runner.execute(stmt)
        # through execute() so session-var substitution applies
        return runner.execute(target).df.toDF(*out_names)

    return run


def _suite_oracle(suite: str, case: str, idx: int,
                  out_names: list[str], casts: dict[str, str]) -> str:
    script = read_suite(suite, case)
    return duckdb_oracle_cast(script, _designated(script, idx),
                              out_names, casts)


QUERIES = {}
ORACLE = {}
if reference_available:
    for _name, (_suite, _case, _idx, _names, _casts) in _SUITES.items():
        QUERIES[_name] = _suite_query(_suite, _case, _idx, _names)
        ORACLE[_name] = _suite_oracle(_suite, _case, _idx, _names,
                                       _casts)
