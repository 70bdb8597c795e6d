"""Sketch-state column queries: HLL_UNION and PERCENTILE_UNION value
columns on AGG_KEYS tables (operators/sketches.py; reference
be/src/exprs/agg/hll_union.h, percentile_union.h, types/hll.h) — the
flagship StarRocks rollup-table use case: keep a tiny re-mergeable
state per key, answer distinct/quantile queries off the rollup.

Oracle notes:
- HLL estimates are exact only at small per-key cardinality, so the
  table is keyed (event_type, user bucket) to keep each key's distinct
  user count tiny; the oracle is the exact COUNT(DISTINCT). (At real
  cardinalities the estimate is approximate by design — same as the
  reference's HLL.)
- The percentile state is a bucket histogram of exact counts, so its
  quantile read-out is bit-identical cross-engine at ANY cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.operators import sketches
from starrocks_spark.tables.models import ManagedTable, TableModel

_W = 2000.0   # percentile bucket width for l_extendedprice
_B = 64       # bucket count


def table_agg_keys_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG_KEYS table keyed (event_type, user bucket) with an
    HLL_UNION value column over user_id + a SUM count: 3 rowset
    inserts (each builds sketch states at ingest), compaction unions
    states, read estimates cardinality. Reference: HLL_UNION AGG
    column + hll_union_agg (hll_union.h)."""
    events = load_table(spark, sf_dir, "events")
    prepared = events.select(
        "event_id",
        "event_type",
        (F.col("user_id") % 32).alias("user_bucket"),
        F.col("user_id").alias("uv"),
        F.lit(1).cast("long").alias("n_events"),
    )
    t = ManagedTable.create(
        spark, TableModel.AGG_KEYS, ["event_type", "user_bucket"],
        agg_spec={"uv": "hll_union", "n_events": "sum"},
    )
    for i in range(3):
        # same keys across rowsets — forces the sketch-state union path
        t.insert(prepared.filter(F.col("event_id") % 3 == i))
    t.compact()
    return t.read().select(
        "event_type",
        "user_bucket",
        sketches.hll_estimate("uv").alias("approx_users"),
        "n_events",
    )


_HLL_SQL = """
SELECT event_type, user_id % 32 AS user_bucket,
       COUNT(DISTINCT user_id) AS approx_users,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def agg_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_UNION state algebra in one plan: partial histogram
    states per (returnflag, order shard) → element-wise merge to flag
    level → p50/p90/p99 read-out. The two-phase shape is exactly how
    a 1000-node cluster (or an AGG_KEYS rowset merge) computes
    quantiles off stored states. Reference: percentile_union.h,
    percentile_approx ingest/merge."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.groupBy(
            "l_returnflag", (F.col("l_orderkey") % 8).alias("_shard")
        )
        .agg(
            sketches.pct_state(F.col("l_extendedprice"), _W, _B)
            .alias("state")
        )
    )
    merged = partial.groupBy("l_returnflag").agg(
        sketches.pct_merge("state", _B).alias("state")
    )
    return merged.select(
        "l_returnflag",
        sketches.pct_quantile(F.col("state"), 0.5, _W).alias("q50"),
        sketches.pct_quantile(F.col("state"), 0.9, _W).alias("q90"),
        sketches.pct_quantile(F.col("state"), 0.99, _W).alias("q99"),
    ).orderBy("l_returnflag")


_BKT = sketches.sql_pct_bucket("l_extendedprice", _W, _B)

_PCT_SQL = f"""
WITH b AS (
  SELECT l_returnflag, {_BKT} AS bkt, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
), t AS (
  SELECT l_returnflag, bkt, c,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bkt) AS cum,
         SUM(c) OVER (PARTITION BY l_returnflag) AS total
  FROM b
)
SELECT l_returnflag,
       MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bkt END) * {_W!r} AS q50,
       MIN(CASE WHEN cum >= CEIL(0.9 * total) THEN bkt END) * {_W!r} AS q90,
       MIN(CASE WHEN cum >= CEIL(0.99 * total) THEN bkt END) * {_W!r} AS q99
FROM t
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "table_agg_keys_hll": table_agg_keys_hll,
    "agg_percentile_sketch": agg_percentile_sketch,
}

ORACLE = {
    "table_agg_keys_hll": _HLL_SQL,
    "agg_percentile_sketch": _PCT_SQL,
}
