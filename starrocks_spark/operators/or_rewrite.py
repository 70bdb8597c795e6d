"""OR → UNION join split (reference: SplitJoinORToUnionRule.java,
SplitScanORToUnionRule.java; SURVEY §4.1 [R]).

Spark executes a join whose ON clause is a disjunction of equalities
as a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the classic
scale killer. The reference rewrites it into a UNION of equi-join
branches; this operator does the same: branch i joins on cond_i AND
NOT (cond_0 ∨ … ∨ cond_{i-1}), so every output pair appears exactly
once (it is produced by the FIRST disjunct it satisfies) and every
branch is hash-joinable on its own equality.

At 100 TB: k disjuncts → k hash joins (each a single shuffle on its
own key) instead of one quadratic nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def or_split_join(left: DataFrame, right: DataFrame,
                  conds: list[Column]) -> DataFrame:
    """INNER join ``left × right`` on ``OR(conds)``, executed as a
    union of equi-join branches. Each cond should be an equality
    between one left and one right column (that's what makes the
    branch hash-joinable); earlier conds become branch FILTERS, which
    Spark attaches to the equi-join as residual conditions.

    NULL semantics match the OR join: a pair matches branch i when
    cond_i is TRUE and no earlier cond is TRUE (false or null).
    """
    if not conds:
        raise ValueError("need at least one join condition")
    out: DataFrame | None = None
    for i, c in enumerate(conds):
        branch = c
        for prev in conds[:i]:
            # "not previously matched", null-safe: NULL counts as no-match
            branch = branch & ~F.coalesce(prev, F.lit(False))
        b = left.join(right, branch, "inner")
        out = b if out is None else out.unionByName(b)
    return out
