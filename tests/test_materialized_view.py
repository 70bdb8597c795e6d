"""Unit tests for PCT materialized views
(tables/materialized_view.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from starrocks_spark.tables.materialized_view import MaterializedView


def _mv(spark):
    return MaterializedView(
        spark,
        definition=lambda src: src.groupBy("p").agg(
            F.sum("v").alias("total"), F.count("*").alias("n")
        ),
        partition_col="p",
        source_partition_expr="p",
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, "p string, v long")


def test_first_refresh_is_full_then_incremental(spark):
    mv = _mv(spark)
    s1 = _src(spark, [("a", 1), ("a", 2), ("b", 10)])
    assert mv.refresh(s1) == -1
    assert sorted(tuple(r) for r in mv.read().select("p", "total", "n").collect()) == [
        ("a", 3, 2), ("b", 10, 1),
    ]
    # change only partition 'b' → exactly one partition rewritten
    s2 = _src(spark, [("a", 1), ("a", 2), ("b", 10), ("b", 5)])
    assert mv.refresh(s2) == 1
    assert sorted(tuple(r) for r in mv.read().select("p", "total", "n").collect()) == [
        ("a", 3, 2), ("b", 15, 2),
    ]
    # identical source → zero partitions rewritten
    assert mv.refresh(s2) == 0
    mv.drop()


def test_new_partition_appears(spark):
    mv = _mv(spark)
    mv.refresh(_src(spark, [("a", 1)]))
    n = mv.refresh(_src(spark, [("a", 1), ("z", 7)]))
    assert n == 1
    assert sorted(tuple(r) for r in mv.read().select("p", "total", "n").collect()) == [
        ("a", 1, 1), ("z", 7, 1),
    ]
    mv.drop()


def test_row_update_detected_by_fingerprint(spark):
    """Same row count, different values — the xor-hash must catch it."""
    mv = _mv(spark)
    mv.refresh(_src(spark, [("a", 1), ("b", 2)]))
    assert mv.refresh(_src(spark, [("a", 99), ("b", 2)])) == 1
    assert sorted(tuple(r) for r in mv.read().select("p", "total", "n").collect()) == [
        ("a", 99, 1), ("b", 2, 1),
    ]
    mv.drop()


def test_transparent_rewrite_routes_and_freshness(spark, sf_dir):
    """Covered grouping → MV route with results equal to base; stale MV
    under freshness='base' → base route; PCT refresh under
    freshness='refresh' touches only changed partitions."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.tables.materialized_view import MaterializedView
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    orders = load_table(spark, sf_dir, "orders")
    src_all = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderpriority", "o_orderstatus",
        F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
        .alias("tp_f"),
    )
    src = src_all.filter(F.col("month") < "2001-01")

    def defn(s):
        return s.groupBy("month", "o_orderpriority").agg(
            F.sum("tp_f").alias("rev_f"),
            F.count(F.lit(1)).alias("n"),
        )

    mv = MaterializedView(spark, defn, partition_col="month",
                          source_partition_expr="month")
    cat = MVCatalog()
    cat.register(mv, "orders", ["month", "o_orderpriority"],
                 {"rev_f": ("sum", "tp_f"), "n": ("count", "*")})

    aggs = {"rev": ("sum", "tp_f"), "n": ("count", "*")}
    got = cat.serve_agg(spark, src, "orders", ["month"], aggs)
    assert cat.last_route.startswith("mv:")
    want = src.groupBy("month").agg(
        F.sum("tp_f").alias("rev"), F.count(F.lit(1)).alias("n"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # uncoverable grouping → base
    cat.serve_agg(spark, src, "orders", ["o_orderstatus"], aggs)
    assert cat.last_route == "__base__"

    # non-derivable agg (min not stored) → base
    cat.serve_agg(spark, src, "orders", ["month"],
                  {"m": ("min", "tp_f")})
    assert cat.last_route == "__base__"

    # stale source + freshness='base' → base route
    cat.serve_agg(spark, src_all, "orders", ["month"], aggs,
                  freshness="base")
    assert cat.last_route == "__base__"

    # freshness='refresh': PCT touches only the late months, then serves
    got2 = cat.serve_agg(spark, src_all, "orders", ["month"], aggs,
                         freshness="refresh")
    assert cat.last_route.startswith("mv:")
    want2 = src_all.groupBy("month").agg(
        F.sum("tp_f").alias("rev"), F.count(F.lit(1)).alias("n"))
    assert got2.exceptAll(want2).count() == 0
    mv.drop()


def test_transparent_rewrite_unrefreshed_mv_falls_back(spark, sf_dir):
    """Regression (code-review finding): a registered but NEVER
    refreshed MV must not be served — freshness='base' and 'stale_ok'
    both route to base instead of reading a nonexistent path."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.tables.materialized_view import MaterializedView
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    src = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.lit(1).cast("long").alias("one"),
    )

    def defn(s):
        return s.groupBy("month").agg(F.sum("one").alias("n"))

    mv = MaterializedView(spark, defn, partition_col="month",
                          source_partition_expr="month")
    cat = MVCatalog()
    cat.register(mv, "orders", ["month"], {"n": ("count", "*")})
    for mode in ("base", "stale_ok"):
        out = cat.serve_agg(spark, src, "orders", ["month"],
                            {"n": ("count", "*")}, freshness=mode)
        assert cat.last_route == "__base__", (mode, cat.last_route)
        assert out.count() > 0
    mv.drop()


def test_pct_refresh_deletes_vanished_partitions(spark, sf_dir):
    """Regression (code-review finding, live-repro'd): a partition that
    disappears from the source must be DELETED from the MV on refresh —
    dynamic overwrite alone leaves the stale directory in place while
    the meta write marks the MV fresh."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.tables.materialized_view import MaterializedView

    orders = load_table(spark, sf_dir, "orders")
    src_full = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.lit(1).cast("long").alias("one"),
    )

    def defn(s):
        return s.groupBy("month").agg(F.sum("one").alias("n"))

    mv = MaterializedView(spark, defn, partition_col="month",
                          source_partition_expr="month")
    mv.refresh(src_full)
    months = [r["month"] for r in mv.read().select("month").distinct()
              .collect()]
    victim = max(months)
    src_less = src_full.filter(F.col("month") != victim)
    n = mv.refresh(src_less)
    assert n >= 1
    left = {r["month"] for r in mv.read().select("month").distinct()
            .collect()}
    assert victim not in left
    # and the MV now exactly equals the recomputed definition
    want = defn(src_less)
    got = mv.read().select("month", "n")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    mv.drop()
