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

# (suite, case, select index, output names, duck-side casts,
#  spark-side normalization)
#
# BOTH cast maps exist because the round driver's value hash is
# type-sensitive at the pandas-export level, not just the logical-type
# level (r7 verdict #1): Spark DecimalType exports as object-dtype
# Decimal while DuckDB DECIMAL exports as float64 — identical values,
# different hash — and Spark DateType exports as object-dtype date
# while DuckDB DATE exports as datetime64. So every DECIMAL output is
# cast to DOUBLE on BOTH engines (same decimal → same nearest double,
# bit-identical) and every date/timestamp output is rendered as a
# string on BOTH engines. tests/test_oracle_types.py mechanically
# audits the whole driver window for this class.
_SPARK_NORM_HOSTILE = ("double", "datestr", "tsstr")
_SUITES: dict[str, tuple] = {
    "dialect_sqltester_case_when": (
        "test_case_when", "test_case_when", 3,
        ["region", "order_date", "income", "ship_mode", "ship_code"],
        {"income": "DOUBLE", "order_date": "VARCHAR"},
        {"income": "double", "order_date": "datestr"},
    ),
    "dialect_sqltester_agg_limit": (
        # limit-under-join counts + ≤LIMIT group-by selects on ~1.3M
        # generated rows; designated: the last max/sum-per-c1 select
        # on t5 (10 groups ≤ LIMIT 10 → deterministic)
        "test_agg", "test_agg_with_limit", -10,
        ["max_c3", "sc3", "c1"],
        {"sc3": "BIGINT"},
        {},
    ),
    "dialect_sqltester_grouping_set": (
        "test_agg", "test_grouping_set", -1,
        ["v2", "s", "ratio"],
        {"s": "BIGINT"},
        {},
    ),
    "dialect_sqltester_orderby_agg": (
        "test_agg", "test_orderby_agg", -1,
        ["potential_customer_rate", "v2"],
        {"potential_customer_rate": "DOUBLE"},
        {"potential_customer_rate": "double"},
    ),
    "dialect_sqltester_tinyint_agg": (
        "test_agg", "test_tinyint_agg", -1,
        ["n"],
        {},
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
        {},
    ),
    "dialect_sqltester_sum_rewrite": (
        # sum(expr) pushed through a right outer join, grouped+ordered
        "test_sum_rewrite", "test_sum_rewrite", -1,
        ["c0", "s1", "s2"],
        {"s1": "BIGINT", "s2": "BIGINT"},
        {},
    ),
    "dialect_sqltester_unnest": (
        # cartesian of two unnest TVFs with NULL elements
        "test_unnest", "test_unnest", 3,
        ["x0", "x1"],
        {},
        {},
    ),
    "dialect_sqltester_shorthand_cast": (
        # src.x::int = dim.y::int join over CTAS-era tables
        "test_cast", "test_shorthand_cast", -2,
        ["id", "xi", "k"],
        {},
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
        {},
    ),
    "dialect_sqltester_delete_conditions": (
        # session-6 DML tier: chained DELETE WHERE over a low-
        # cardinality dup table; designated: the 4-way aggregate
        # between the value-delete and the delete-all
        "test_low_cardinality", "test_delete_conditions", -8,
        ["n", "nc0", "ndc0", "mx"],
        {"n": "BIGINT", "nc0": "BIGINT", "ndc0": "BIGINT"},
        {},
    ),
    "dialect_sqltester_mv": (
        # r8 MV DDL tier: CREATE MATERIALIZED VIEW over a PK table
        # (correlated COUNT-DISTINCT-CASE subqueries, LEFT JOIN),
        # REFRESH ... WITH SYNC MODE, SELECT * from the MV. The DuckDB
        # oracle compiles the MV as a CTE of its defining query —
        # equal to the fresh snapshot because the refresh is the last
        # DML before the designated select.
        "test_materialized_view",
        "test_materialized_view_with_subquery", -1,
        ["col1", "dt_hour", "col2", "col3", "col4", "col5"],
        {"dt_hour": "VARCHAR"},
        {"dt_hour": "tsstr"},
    ),
    "dialect_sqltester_vector_index": (
        # r8 index DDL tier: ALTER TABLE ADD INDEX ... USING VECTOR,
        # probe routed through the stored IvfIndex lists (the
        # reference's VECTORINDEX path); DuckDB recomputes the same
        # ANN ordering brute-force over the verbatim script.
        "test_vector_index", "test_shared_data_add_vector_index", -1,
        ["id"],
        {"id": "BIGINT"},
        {},
    ),
    "dialect_sqltester_decimal": (
        # r9 decimal tier: integer-family multiply over the full
        # int128 domain — largeint's 39-digit extremes survive via
        # digit-string storage + _rw_wide_mul (be/src/types/
        # decimalv3.h scale_up semantics). DuckDB's HUGEINT computes
        # the same products natively; both sides render as VARCHAR.
        "test_decimal", "test_decimal_cast", 7,
        ["k1", "t1x", "i1x", "b1x", "l1x"],
        {"t1x": "VARCHAR", "i1x": "VARCHAR", "b1x": "VARCHAR",
         "l1x": "VARCHAR"},
        {"t1x": "str", "i1x": "str", "b1x": "str", "l1x": "str"},
    ),
    "dialect_sqltester_asof_join": (
        # ASOF LEFT JOIN over datetime keys (session-3 desugar:
        # equi+inequality join pruned by row_number with the stored
        # insertion-order tie-break). The DuckDB oracle runs its own
        # NATIVE ASOF JOIN — two independent asof implementations
        # agreeing on the same script.
        "test_asof_join", "test_asof_join_basic.sql", 1,
        ["order_id", "user_id", "order_time", "price_time", "price"],
        {"price": "DOUBLE", "order_time": "VARCHAR",
         "price_time": "VARCHAR"},
        {"price": "double", "order_time": "tsstr",
         "price_time": "tsstr"},
    ),
}


def _designated(script: str, idx: int) -> str:
    selects = [s for s in split_statements(script)
               if classify(s) == "select"]
    return selects[idx]


def _normalize(df: DataFrame, norm: dict[str, str]) -> DataFrame:
    """Spark-side mirror of the duck-side cast map: render driver-
    hostile output types the same way on both engines (see the
    _SUITES comment)."""
    from pyspark.sql import functions as F

    for col, kind in norm.items():
        if kind == "double":
            df = df.withColumn(col, F.col(col).cast("double"))
        elif kind == "str":
            df = df.withColumn(col, F.col(col).cast("string"))
        elif kind == "datestr":
            df = df.withColumn(col, F.col(col).cast("string"))
        elif kind == "tsstr":
            # whole-second render matching DuckDB CAST(ts AS VARCHAR)
            df = df.withColumn(
                col, F.date_format(col, "yyyy-MM-dd HH:mm:ss"))
        else:  # pragma: no cover - guarded by _SPARK_NORM_HOSTILE
            raise ValueError(f"unknown spark norm kind {kind!r}")
    return df


def _suite_query(suite: str, case: str, idx: int, out_names: list[str],
                 norm: dict[str, str]):
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
        df = runner.execute(target).df.toDF(*out_names)
        return _normalize(df, norm)

    return run


def _suite_oracle(suite: str, case: str, idx: int,
                  out_names: list[str], casts: dict[str, str]) -> str:
    script = read_suite(suite, case)
    return duckdb_oracle_cast(script, _designated(script, idx),
                              out_names, casts)


_FILES_FIXTURES = os.path.join(os.path.dirname(REFERENCE_SQL_ROOT),
                               "sql", "test_files", "csv_format")


def _files_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 FILES() tier driver row: replay the reference's csv_format
    staging steps (shell: ossutil64 cp → local scratch), read through
    FILES() with the suite's verbatim options, and aggregate. The
    DuckDB oracle reads the SAME shipped fixtures with read_csv —
    two independent CSV readers agreeing on typed values."""
    runner = ScriptRunner(spark, strict=False)
    for f in ("basic1.csv", "basic2.csv"):
        runner.execute(
            f"__shellfile__ shell: ossutil64 cp --force "
            f"./sql/test_files/csv_format/{f} "
            f"oss://bkt/test_files/csv_format/drv/")
    res = runner.execute(
        'select $1 as id, $2 as name, $3 + 1 as score1, '
        'cast($4 as int) as flag from files('
        '"path" = "oss://bkt/test_files/csv_format/drv/*", '
        '"format" = "csv", "csv.column_separator" = ",", '
        '"csv.row_delimiter" = "\\n") order by id')
    return res.df


_FILES_ORACLE = f"""
SELECT c1 AS id, c2 AS name, c3 + 1 AS score1,
       CAST(c4 AS INT) AS flag
FROM read_csv('{_FILES_FIXTURES}/basic[12].csv', header=false,
              columns={{'c1':'BIGINT','c2':'VARCHAR','c3':'DOUBLE',
                        'c4':'BOOLEAN'}})
ORDER BY id
"""



def _infoschema_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 information_schema tier driver row: CREATE TABLE through
    the runner, read engine-NEUTRAL column metadata back from
    information_schema.columns (fe SchemaColumnsScanner). The DuckDB
    oracle derives the same facts from its OWN catalog rendering
    (DESCRIBE over identically-typed columns) — two catalogs agreeing
    on names, ordinals, numeric scales, and datetime precision."""
    from starrocks_spark.plans.sqltester import ScriptRunner

    runner = ScriptRunner(spark, strict=False)
    runner.execute(
        "create table is_probe (id int NOT NULL, name varchar(150), "
        "score decimal(27,9), born date, seen datetime) "
        "duplicate key(id) distributed by hash(id) buckets 1")
    res = runner.execute(
        "select column_name, cast(ordinal_position as bigint) as "
        "ordinal_position, cast(numeric_scale as bigint) as "
        "numeric_scale, cast(datetime_precision as bigint) as "
        "dt_precision from information_schema.columns "
        "where table_name = 'is_probe'")
    return res.df.toDF("column_name", "ordinal_position",
                       "numeric_scale", "dt_precision")


_INFOSCHEMA_ORACLE = r"""
SELECT d.column_name AS column_name,
       CAST(row_number() OVER () AS BIGINT) AS ordinal_position,
       CAST(CASE WHEN d.column_type LIKE 'DECIMAL%'
                 THEN regexp_extract(d.column_type, ',(\d+)\)', 1)
                 WHEN d.column_type IN ('TINYINT', 'SMALLINT',
                                        'INTEGER', 'BIGINT',
                                        'HUGEINT')
                 THEN '0' END AS BIGINT) AS numeric_scale,
       CAST(CASE WHEN d.column_type = 'TIMESTAMP'
                 THEN 6 END AS BIGINT) AS dt_precision
FROM (DESCRIBE (
    SELECT CAST(NULL AS INTEGER) AS id,
           CAST(NULL AS VARCHAR) AS name,
           CAST(NULL AS DECIMAL(27,9)) AS score,
           CAST(NULL AS DATE) AS born,
           CAST(NULL AS TIMESTAMP) AS seen)) d
"""


QUERIES = {}
ORACLE = {}
if reference_available:
    for _name, (_suite, _case, _idx, _names, _casts,
                _norm) in _SUITES.items():
        QUERIES[_name] = _suite_query(_suite, _case, _idx, _names, _norm)
        ORACLE[_name] = _suite_oracle(_suite, _case, _idx, _names,
                                       _casts)
    QUERIES["dialect_sqltester_files"] = _files_query
    ORACLE["dialect_sqltester_files"] = _FILES_ORACLE
    QUERIES["dialect_sqltester_infoschema"] = _infoschema_query
    ORACLE["dialect_sqltester_infoschema"] = _INFOSCHEMA_ORACLE
