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


# ----------------------------------------------------- join-MV rewrite

def _star_fixture(spark):
    from starrocks_spark.plans.star import StarSchema

    fact = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 7), (1, 20, 3), (2, 20, 1), (1, 10, 2)],
        ["pk_fk", "sk_fk", "m"],
    )
    dim_p = spark.createDataFrame(
        [(1, "b1", "t1"), (2, "b2", "t2")], ["pk", "brand", "ptype"]
    )
    dim_s = spark.createDataFrame(
        [(10, "s10"), (20, "s20")], ["sk", "sname"]
    )
    star = StarSchema(fact)
    star.add_dim("p", dim_p, fk="pk_fk", pk="pk", integrity="enforced")
    star.add_dim("s", dim_s, fk="sk_fk", pk="sk", integrity="enforced")
    return fact, dim_p, dim_s, star


def _join_mv(spark, fact, dim_p, dim_s, tmp_path, name):
    from starrocks_spark.tables.materialized_view import MaterializedView

    def defn(src):
        return (
            src.join(F.broadcast(dim_p), src["pk_fk"] == dim_p["pk"])
            .join(F.broadcast(dim_s), F.col("sk_fk") == dim_s["sk"])
            .withColumn("part", F.lit("all"))
            .groupBy("part", "brand", "ptype")
            .agg(F.sum("m").alias("m_sum"), F.count(F.lit(1)).alias("n"))
        )

    return MaterializedView(spark, defn, partition_col="part",
                            source_partition_expr="'all'",
                            path=str(tmp_path / name))


def test_serve_star_routes_to_join_mv(spark, tmp_path):
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    fact, dim_p, dim_s, star = _star_fixture(spark)
    mv = _join_mv(spark, fact, dim_p, dim_s, tmp_path, "jmv")
    cat = MVCatalog()
    cat.register_join(
        mv, "fact",
        joins={"p": ("pk_fk", "pk"), "s": ("sk_fk", "sk")},
        dims=["part", "brand", "ptype"],
        measures={"m_sum": ("sum", "m"), "n": ("count", "*")},
    )
    out = cat.serve_star(
        spark, star, "fact", ["brand"],
        {"total": ("sum", "m"), "cnt": ("count", "*")},
    )
    assert cat.last_route.startswith("mv:")
    got = {r["brand"]: (r["total"], r["cnt"]) for r in out.collect()}
    assert got == {"b1": (10, 3), "b2": (8, 2)}


def test_serve_star_falls_back_when_dim_not_materialized(spark, tmp_path):
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    fact, dim_p, dim_s, star = _star_fixture(spark)
    mv = _join_mv(spark, fact, dim_p, dim_s, tmp_path, "jmv2")
    cat = MVCatalog()
    # MV materializes ONLY the p join — a query needing s must fall back
    cat.register_join(
        mv, "fact", joins={"p": ("pk_fk", "pk")},
        dims=["part", "brand", "ptype"],
        measures={"m_sum": ("sum", "m")},
    )
    out = cat.serve_star(
        spark, star, "fact", ["sname"], {"total": ("sum", "m")},
    )
    assert cat.last_route == "__base__"
    assert star.last_joined == ["s"]  # pruned: only the needed dim
    got = {r["sname"]: r["total"] for r in out.collect()}
    assert got == {"s10": 14, "s20": 4}


def test_serve_star_rejects_unenforced_extra_join(spark, tmp_path):
    """An MV that joined a dim WITHOUT declared integrity cannot serve
    queries that don't need that dim — multiplicity could differ."""
    from starrocks_spark.plans.star import StarSchema
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    fact, dim_p, dim_s, _ = _star_fixture(spark)
    star = StarSchema(fact)
    star.add_dim("p", dim_p, fk="pk_fk", pk="pk", integrity="enforced")
    star.add_dim("s", dim_s, fk="sk_fk", pk="sk", integrity="none")
    mv = _join_mv(spark, fact, dim_p, dim_s, tmp_path, "jmv3")
    cat = MVCatalog()
    cat.register_join(
        mv, "fact",
        joins={"p": ("pk_fk", "pk"), "s": ("sk_fk", "sk")},
        dims=["part", "brand", "ptype"],
        measures={"m_sum": ("sum", "m")},
    )
    cat.serve_star(spark, star, "fact", ["brand"],
                   {"total": ("sum", "m")})
    assert cat.last_route == "__base__"  # s join is extra + unenforced


def test_serve_star_rejects_count_col(spark, tmp_path):
    import pytest

    from starrocks_spark.tables.mv_rewrite import MVCatalog

    fact, dim_p, dim_s, star = _star_fixture(spark)
    cat = MVCatalog()
    with pytest.raises(ValueError, match="count"):
        cat.serve_star(spark, star, "fact", ["brand"],
                       {"c": ("count", "m")})
