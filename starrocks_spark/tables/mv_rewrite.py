"""Transparent materialized-view rewrite (reference:
fe/.../rule/transformation/materialization/ — 40+ rules that rewrite a
query's SPJG tree onto a registered MV when the MV's groups cover the
query's and its measures derive the requested aggregates; SURVEY §4.1
marks this [R]).

Spark realization: an ``MVCatalog`` registers async MaterializedViews
(tables/materialized_view.py) together with their aggregation contract
— dimension columns and measure definitions. ``serve_agg`` answers an
aggregate query either from a covering MV (re-aggregated to the
requested grain, with a PCT freshness check against the live source —
optionally refreshing first, which touches only changed partitions) or
from the base table. The chosen route is recorded for tests/EXPLAIN.

Derivability is the same lossless algebra as rollup indexes
(tables/models.py read_agg): SUM/MIN/MAX re-aggregate from stored
slices, COUNT re-aggregates as SUM over a stored count measure.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.tables.materialized_view import MaterializedView

_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


@dataclass
class _Entry:
    mv: MaterializedView
    source_name: str
    dims: list[str]
    #: measure column in the MV → ("sum"|"min"|"max"|"count", source col)
    measures: dict[str, tuple[str, str]]


@dataclass
class MVCatalog:
    entries: list[_Entry] = field(default_factory=list)
    #: route of the last serve_agg: "mv:<path>" or "__base__"
    last_route: str | None = None

    def register(self, mv: MaterializedView, source_name: str,
                 dims: list[str],
                 measures: dict[str, tuple[str, str]]) -> None:
        for m, (fn, col) in measures.items():
            if fn not in ("sum", "min", "max", "count"):
                raise ValueError(f"measure {m}: {fn} is not derivable")
            if fn == "count" and col != "*":
                # stored counts are COUNT(*); non-null COUNT(col) does
                # not derive from them (round-5 advice)
                raise ValueError(
                    f"measure {m}: count only stores COUNT(*) — "
                    "pass col='*'"
                )
        self.entries.append(_Entry(mv, source_name, list(dims),
                                   dict(measures)))

    # ------------------------------------------------------------ serving

    def _covering(self, source_name: str, group_cols: list[str],
                  aggs: dict[str, tuple[str, str]]) -> _Entry | None:
        def derives(e: _Entry, fn: str, col: str) -> str | None:
            """MV measure name that yields fn(col), else None."""
            for m, (mfn, mcol) in e.measures.items():
                if mfn == fn and (fn == "count" or mcol == col):
                    return m
            return None

        best: _Entry | None = None
        for e in self.entries:
            if e.source_name != source_name:
                continue
            if not set(group_cols) <= set(e.dims):
                continue
            if not all(derives(e, fn, col) for fn, col in aggs.values()):
                continue
            if best is None or len(e.dims) < len(best.dims):
                best = e  # narrowest covering MV = least re-aggregation
        return best

    def serve_agg(self, spark: SparkSession, source: DataFrame,
                  source_name: str, group_cols: list[str],
                  aggs: dict[str, tuple[str, str]],
                  freshness: str = "refresh") -> DataFrame:
        """Answer ``SELECT group_cols, aggs FROM source_name GROUP BY
        group_cols`` from a covering registered MV, else the base.

        ``freshness``: "refresh" PCT-refreshes a stale MV first (only
        changed partitions recompute); "base" falls back to the base
        table when stale; "stale_ok" serves the snapshot as-is (the
        reference's query_rewrite_consistency=LOOSE).
        """
        for name, (fn, col) in aggs.items():
            if fn == "count" and col != "*":
                raise ValueError(
                    f"agg {name}: count only derives COUNT(*) — "
                    "pass col='*'"
                )
        e = self._covering(source_name, group_cols, aggs)
        if e is not None:
            if freshness == "refresh":
                e.mv.refresh(source)  # PCT: a no-op when already fresh
            elif freshness == "base":
                fp = e.mv._fingerprints(source).collect()
                changed = e.mv._changed_vs_snapshot(fp)
                # None = never refreshed (no snapshot) — that is the
                # stalest possible state, not freshness
                if changed is None or changed:
                    e = None  # stale → serve from base
            # "stale_ok": serve the snapshot as-is
        if e is not None and not os.path.isdir(e.mv.path):
            e = None  # never materialized — nothing to serve
        if e is None:
            self.last_route = "__base__"
            out = [
                (F.count(F.lit(1)) if fn == "count"
                 else _MERGE_FNS[fn](col)).alias(name)
                for name, (fn, col) in aggs.items()
            ]
            return source.groupBy(*group_cols).agg(*out)

        self.last_route = f"mv:{e.mv.path}"

        def measure_for(fn: str, col: str) -> str:
            for m, (mfn, mcol) in e.measures.items():
                if mfn == fn and (fn == "count" or mcol == col):
                    return m
            raise AssertionError("covering check guaranteed this")

        out = []
        for name, (fn, col) in aggs.items():
            m = measure_for(fn, col)
            merge = F.sum if fn == "count" else _MERGE_FNS[fn]
            out.append(merge(m).alias(name))
        return e.mv.read().groupBy(*group_cols).agg(*out)
