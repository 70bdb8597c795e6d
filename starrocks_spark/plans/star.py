"""Star-schema join pruning via declared key constraints (reference:
PruneUKFKJoinRule.java / PruneUKFKGroupByKeysRule.java — drop a join
to a unique-key table when none of its columns are needed and the
foreign key is guaranteed to match; SURVEY §4.1 [R], the last open
rewrite).

Spark has no constraint metadata, so the constraints are declared
here: a ``StarSchema`` registers dimension tables with their (fk, pk)
relationship and an ``integrity`` promise. ``join_needed`` then builds
the fact→dims join tree with ONLY the dimensions that contribute a
requested column — the cardinality-preserving joins that would
contribute nothing are never constructed. At 100 TB that is the
difference between 1 and N broadcast builds (and their runtime
filters) per query.

Eliminating an INNER join is only semantics-preserving when every fact
row matches exactly one dim row — i.e. the pk is UNIQUE and the fk is
NON-NULL with referential integrity (the same precondition the
reference's UKFK rule checks from its constraint catalog). Declaring
``integrity="enforced"`` asserts that; without it the dim is joined
regardless of need.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class _Dim:
    dim: DataFrame
    fk: str
    pk: str
    integrity: str  # "enforced" | "none"


@dataclass
class StarSchema:
    fact: DataFrame
    dims: dict[str, _Dim] = field(default_factory=dict)
    #: dim names actually joined by the last join_needed (for tests)
    last_joined: list[str] = field(default_factory=list)

    def add_dim(self, name: str, dim: DataFrame, fk: str, pk: str,
                integrity: str = "enforced") -> None:
        if integrity not in ("enforced", "none"):
            raise ValueError("integrity must be 'enforced' or 'none'")
        self.dims[name] = _Dim(dim, fk, pk, integrity)

    def join_needed(self, needed_cols: list[str]) -> DataFrame:
        """Fact joined with exactly the dims that contribute one of
        ``needed_cols`` (or whose integrity is not declared — those
        must join because dropping them could change cardinality).
        Dims are left UNhinted: Spark's size estimate (parquet stats /
        AQE) broadcasts genuinely small dims and shuffles SF-scaling
        ones — a forced hint would OOM on a customer-sized dim at
        100×."""
        out = self.fact
        self.last_joined = []
        fact_cols = set(self.fact.columns)
        for name, d in self.dims.items():
            dim_cols = set(d.dim.columns) - {d.pk}
            contributes = bool(dim_cols & set(needed_cols) - fact_cols)
            if contributes or d.integrity != "enforced":
                out = out.join(
                    d.dim,
                    out[d.fk] == d.dim[d.pk],
                ).drop(d.dim[d.pk])
                self.last_joined.append(name)
            elif d.pk in needed_cols and d.pk not in fact_cols:
                # the declared (fk = pk) equivalence answers a pk-only
                # need from the fact side — the reference's rule
                # rewrites pk references to the fk the same way
                out = out.withColumn(d.pk, F.col(d.fk))
        return out
