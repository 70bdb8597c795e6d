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
