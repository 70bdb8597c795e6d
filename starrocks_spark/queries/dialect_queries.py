"""Dialect-layer queries — each runs *StarRocks-flavored SQL text*
through plans/dialect.translate() and Catalyst, proving the MySQL
compatibility surface (SURVEY.md hard parts #4/#5):

- MySQL date-format strings (be/src/exprs/time_functions.cpp)
- function aliases from the reference registry
  (gensrc/script/functions.py; fe/.../catalog/FunctionSet.java)
- INTERVAL call-form date arithmetic (StarRocks.g4 interval rule)
- QUALIFY clause (StarRocks.g4:2512)
- WITH RECURSIVE (StarRocks.g4:2456) — Spark 4 runs it natively

Oracles are DuckDB's own dialect (strftime/strptime/format), so a
value-hash match proves the *translation* is semantics-preserving,
not just string-identical. All queries remain fully declarative SQL →
Catalyst plans them with pushdown/pruning; nothing here adds a Python
hot path, so 100 TB behavior equals the underlying scan+agg plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from starrocks_spark.plans.dialect import starrocks_sql


def _q(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return starrocks_sql(spark, sql, sf_dir)

    return run


# --- MySQL date_format tokens --------------------------------------------

_DATE_FORMAT_SR = """
SELECT date_format(ts, '%Y-%m-%d %H:00') AS hr,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY hr, event_type
"""

_DATE_FORMAT_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d %H:00') AS hr,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY hr, event_type
"""

# --- str_to_date round-trip ----------------------------------------------

_STR_TO_DATE_SR = """
SELECT date_format(str_to_date(date_format(o_orderdate, '%Y-%m-%d'),
                               '%Y-%m-%d'),
                   '%W %M %Y') AS day_label,
       COUNT(*) AS n
FROM orders
GROUP BY day_label
"""

_STR_TO_DATE_ORACLE = """
SELECT strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'),
                '%A %B %Y') AS day_label,
       COUNT(*) AS n
FROM orders
GROUP BY day_label
"""

# --- INTERVAL call-form arithmetic ---------------------------------------

_INTERVAL_SR = """
SELECT date_format(date_add(o_orderdate, INTERVAL 3 MONTH), '%Y-%m') AS m3,
       date_format(days_add(o_orderdate, 45), '%Y-%m-%d') AS d45,
       date_format(date_sub(o_orderdate, INTERVAL 1 YEAR), '%Y') AS y_prev,
       COUNT(*) AS n
FROM orders
GROUP BY m3, d45, y_prev
"""

_INTERVAL_ORACLE = """
SELECT strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m') AS m3,
       strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS d45,
       strftime(o_orderdate - INTERVAL 1 YEAR, '%Y') AS y_prev,
       COUNT(*) AS n
FROM orders
GROUP BY m3, d45, y_prev
"""

# --- alias functions ------------------------------------------------------

_ALIASES_SR = """
SELECT dayname(o_orderdate) AS dow_name,
       monthname(o_orderdate) AS mon_name,
       ucase(o_orderpriority) AS pri_u,
       strleft(o_orderstatus, 1) AS st1,
       money_format(FLOOR(o_totalprice)) AS price_fmt,
       COUNT(*) AS n
FROM orders
GROUP BY dow_name, mon_name, pri_u, st1, price_fmt
"""

_ALIASES_ORACLE = """
SELECT dayname(o_orderdate) AS dow_name,
       monthname(o_orderdate) AS mon_name,
       upper(o_orderpriority) AS pri_u,
       left(o_orderstatus, 1) AS st1,
       format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) || '.00' AS price_fmt,
       COUNT(*) AS n
FROM orders
GROUP BY dow_name, mon_name, pri_u, st1, price_fmt
"""

# --- QUALIFY desugar ------------------------------------------------------

_QUALIFY_SR = """
SELECT user_id, event_id, event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) <= 2
ORDER BY user_id, event_id
LIMIT 500
"""

# DuckDB supports QUALIFY natively — same text is its own oracle.
_QUALIFY_ORACLE = _QUALIFY_SR

# --- WITH RECURSIVE -------------------------------------------------------

# month spine over the orders date range + left join: months with zero
# orders still appear (the reference covers this via generate_series;
# recursive CTE per StarRocks.g4:2456). The spine is 80 levels deep,
# beyond the reference's recursive_cte_max_depth default of 5
# (SessionVariable.java:2454) — the hint raises it, exactly as a
# StarRocks user must.
_RECURSIVE_SR = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT /*+ SET_VAR(recursive_cte_max_depth=100) */
  date_format(m, '%Y-%m') AS ym, COUNT(o_orderkey) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY ym
"""

_RECURSIVE_ORACLE = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT strftime(m, '%Y-%m') AS ym, COUNT(o_orderkey) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY ym
"""


QUERIES = {
    "dialect_date_format_mysql": _q(_DATE_FORMAT_SR),
    "dialect_str_to_date_roundtrip": _q(_STR_TO_DATE_SR),
    "dialect_interval_arith": _q(_INTERVAL_SR),
    "dialect_alias_functions": _q(_ALIASES_SR),
    "dialect_qualify_topn": _q(_QUALIFY_SR),
    "recursive_cte_months": _q(_RECURSIVE_SR),
}

ORACLE = {
    "dialect_date_format_mysql": _DATE_FORMAT_ORACLE,
    "dialect_str_to_date_roundtrip": _STR_TO_DATE_ORACLE,
    "dialect_interval_arith": _INTERVAL_ORACLE,
    "dialect_alias_functions": _ALIASES_ORACLE,
    "dialect_qualify_topn": _QUALIFY_ORACLE,
    "recursive_cte_months": _RECURSIVE_ORACLE,
}
