"""Large IN-list → join rewrite (SURVEY.md §4.1 [R]:
fe/.../rule/transformation/LargeInPredicateToJoinRule.java).

A multi-thousand-element ``isin`` list becomes a giant OR chain in
codegen — slow to compile and evaluate, and unreadable in plans. The
reference rewrites it into a join against an inline VALUES relation;
on Spark that is a broadcast LEFT SEMI (or LEFT ANTI for NOT IN)
against a local DataFrame, which also gives the scan a runtime
bloom/IN filter instead of an O(n) predicate per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# below this, a plain isin is fine (Catalyst converts to a hash set);
# the reference's threshold is session-configurable
DEFAULT_THRESHOLD = 64


def filter_in_values(df: DataFrame, col: str, values: list,
                     negate: bool = False,
                     threshold: int = DEFAULT_THRESHOLD) -> DataFrame:
    """``df WHERE col IN (values)`` choosing predicate vs semi-join by
    list size. NOT IN keeps SQL null semantics only when ``values``
    has no NULLs (callers with nullable lists should pre-filter —
    same contract as the reference's rule)."""
    if len(values) <= threshold:
        cond = F.col(col).isin(values)
        return df.filter(~cond if negate else cond)
    from starrocks_spark.queries._util import lit_frame

    spark = df.sparkSession
    lookup = lit_frame(
        spark, [(v,) for v in values],
        f"__in_value {df.schema[col].dataType.simpleString()}",
    ).distinct()
    how = "left_anti" if negate else "left_semi"
    return df.join(
        broadcast(lookup), F.col(col) == F.col("__in_value"), how
    )
