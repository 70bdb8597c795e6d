"""Range / list / expression partitioning for managed tables.

Reference: fe/fe-core/.../catalog/RangePartitionInfo.java:76 (ordered
[lower, upper) ranges per partition), ListPartitionInfo.java:65
(explicit value lists per partition), ExpressionRangePartitionInfo.java
(generated-column expression partitioning, e.g. date_trunc buckets),
and the FE partition pruner (sql/optimizer/rule/.../PartitionPruner).

Spark realization: the scheme derives a GENERATED partition column
(`__part`) from the data column; the table is written with
``partitionBy("__part")`` so every partition is a directory and
Spark's scan prunes directories from `__part` predicates. The pruner
below is the FE analog: it translates a predicate on the DATA column
into the list of partition names whose range/list intersects — pure
metadata math on the scheme, no data scan — and the reader applies
``__part IN (...)`` (directory pruning) plus the residual data-column
filter (row pruning inside surviving partitions).

Rows that belong to no partition are rejected at ingest, matching the
reference's load-time "no partition for value" error.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PART_COL = "__part"


class PartitionScheme:
    """Interface: derive __part from a row; prune names from bounds."""

    def partition_expr(self) -> Column:
        raise NotImplementedError

    def all_names(self) -> list[str]:
        raise NotImplementedError


@dataclass
class RangePartitioning(PartitionScheme):
    """Ordered ranges: partition i covers [bounds[i-1], bounds[i]).
    ``bounds`` maps partition name → exclusive upper bound, in
    ascending bound order (RangePartitionInfo.java:76). Values ≥ the
    last bound (or < nothing, i.e. any value) falling outside every
    range are rejected at ingest."""

    column: str
    bounds: list[tuple[str, object]]

    def partition_expr(self) -> Column:
        c = F.col(self.column)
        expr = F.lit(None).cast("string")
        lower = None
        for name, upper in self.bounds:
            cond = c < F.lit(upper)
            if lower is not None:
                cond = cond & (c >= F.lit(lower))
            expr = F.coalesce(expr, F.when(cond, F.lit(name)))
            lower = upper
        return expr

    def all_names(self) -> list[str]:
        return [n for n, _ in self.bounds]

    def prune_range(self, lo: object | None, hi: object | None) -> list[str]:
        """FE pruner analog: names whose [lower, upper) intersects
        [lo, hi] — metadata-only, drives `__part IN (...)`."""
        out = []
        lower = None
        for name, upper in self.bounds:
            if (lo is None or lo < upper) and \
               (hi is None or lower is None or hi >= lower):
                out.append(name)
            lower = upper
        return out


@dataclass
class ListPartitioning(PartitionScheme):
    """Explicit value lists per partition (ListPartitionInfo.java:65).
    A value in no list is rejected at ingest."""

    column: str
    lists: dict[str, list[object]]

    def partition_expr(self) -> Column:
        c = F.col(self.column)
        expr = F.lit(None).cast("string")
        for name, values in self.lists.items():
            expr = F.coalesce(expr, F.when(c.isin(*values), F.lit(name)))
        return expr

    def all_names(self) -> list[str]:
        return list(self.lists)

    def prune_values(self, values: list[object]) -> list[str]:
        vs = set(values)
        return [n for n, lv in self.lists.items() if vs & set(lv)]


@dataclass
class ExpressionPartitioning(PartitionScheme):
    """Generated-column partitioning: __part = fn(column) rendered as
    string (ExpressionRangePartitionInfo.java; e.g. date_trunc month).
    Open-ended — nothing is rejected, new expression values create new
    partitions, exactly the reference's automatic partition creation."""

    column: str
    fn: Callable[[Column], Column]

    def partition_expr(self) -> Column:
        return self.fn(F.col(self.column)).cast("string")

    def all_names(self) -> list[str]:  # open-ended
        raise ValueError("expression partitioning has no static name list")


def with_partition_col(df: DataFrame, scheme: PartitionScheme,
                       reject_unmatched: bool = True) -> DataFrame:
    """Attach __part; raise if any row has no partition (load-time
    validation, one cheap existence probe on the batch)."""
    out = df.withColumn(PART_COL, scheme.partition_expr())
    if reject_unmatched and not isinstance(scheme, ExpressionPartitioning):
        bad = out.filter(
            F.col(PART_COL).isNull() & F.col(scheme.column).isNotNull()
        ).limit(1).count()
        if bad:
            raise ValueError(
                f"value of {scheme.column!r} outside every partition "
                f"(reference: 'no partition for value' load error)"
            )
    return out
