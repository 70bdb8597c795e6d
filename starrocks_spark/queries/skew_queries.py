"""Skew-mitigation queries (operators/skew.py): results must be
IDENTICAL to the unsalted plans — the oracle is the plain SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.operators.skew import salted_aggregate, salted_skew_join
from starrocks_spark.queries._util import fixed, sql_dsum


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter aggregation: events by event_type (few hot keys)
    through 16-way salted two-phase agg."""
    events = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        events,
        keys=["event_type"],
        measures={
            "n": F.count(F.lit(1)),
            "value_f": F.sum(fixed(F.col("value"))),
            "max_user": F.max("user_id"),
        },
        merge={"n": "sum", "value_f": "sum", "max_user": "max"},
        n_salts=16,
        salt_source="event_id",
    )
    return out.select(
        "event_type", "n",
        (F.col("value_f").cast("double") / 1e4).alias("sum_value"),
        "max_user",
    )


_SALTED_AGG_SQL = f"""
SELECT event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value,
       MAX(user_id) AS max_user
FROM events
GROUP BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact→dim join via salt-replicated dimension: lineitem
    joined to part with 8 salts, aggregated by brand."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", fixed(F.col("l_extendedprice")).alias("price_f")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_skew_join(li, part, "l_partkey", "p_partkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("price_f").cast("double") / 1e4).alias("total_price"),
    )


_SALTED_JOIN_SQL = f"""
SELECT p_brand, COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS total_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}

ORACLE = {
    "skew_salted_agg": _SALTED_AGG_SQL,
    "skew_salted_join": _SALTED_JOIN_SQL,
}
