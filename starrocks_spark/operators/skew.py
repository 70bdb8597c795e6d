"""Skew mitigation: salted two-phase aggregation and salted replicated
join (SURVEY.md §2.4: rule/transformation/SkewJoinOptimizeRule.java,
§2.6 SplitWindowSkewToUnionRule.java; AQE's runtime skew-join handles
sort-merge joins, these helpers cover the shapes it doesn't — heavy
single-key aggregations and broadcast-averse skewed dim joins).

Why it scales: a hot key (one event_type holding 40% of 100 TB) pins
one reducer at shuffle time. Salting splits each hot key into
``n_salts`` sub-keys, spreading its rows over ``n_salts`` reducers;
a second (cheap — one row per (key, salt)) phase merges the partials.
The salt is derived deterministically from row content (hash % n), so
results are reproducible and no RNG is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    merge: dict[str, str],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``measures``: name → aggregate for phase 1 (per key+salt).
    ``merge``: name → 'sum'|'min'|'max' — how phase-2 merges partials.
    ``salt_source``: column whose hash spreads rows (defaults to a
    per-partition id + monotonically increasing row id, content-free).
    """
    if salt_source:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    else:
        salt = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[m.alias(f"__p_{k}") for k, m in measures.items()])
    )
    merge_fn = {"sum": F.sum, "min": F.min, "max": F.max}
    phase2 = phase1.groupBy(*keys).agg(
        *[merge_fn[merge[k]](f"__p_{k}").alias(k) for k in measures]
    )
    return phase2


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed equi-join without broadcast: replicate each dim row
    ``n_salts`` times (one per salt), salt fact rows deterministically,
    join on (key, salt). Each hot fact key now lands on ``n_salts``
    reducers instead of one. Dim inflation is bounded: |dim| × n_salts
    rows of keys, still broadcast-able for real dimensions."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(fact_key), F.spark_partition_id()),
               F.lit(n_salts)),
    )
    out = fact_salted.join(
        broadcast(dim_rep),
        (F.col(fact_key) == F.col(dim_key))
        & (fact_salted["__salt"] == dim_rep["__salt"]),
    )
    return out.select(
        *[fact_salted[c] for c in fact.columns],
        *[dim_rep[c] for c in dim.columns],
    )
