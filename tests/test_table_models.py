"""Unit tests for the table-model layer (tables/models.py): model
semantics, UPDATE, partitioned upsert with dynamic overwrite, and
compaction idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from starrocks_spark.tables.models import ManagedTable, TableModel


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_unique_partitioned_upsert_rewrites_only_touched_partitions(spark):
    df1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")], "k long, v long, p string"
    )
    t = ManagedTable.create(
        spark, TableModel.UNIQUE_KEYS, ["k"],
        version_cols=["v"], partition_by="p",
    )
    t.insert(df1)
    # second batch touches only partition 'a'; 'b' must survive untouched
    df2 = spark.createDataFrame([(1, 99, "a")], "k long, v long, p string")
    t.insert(df2)
    assert _rows(t.read().select("k", "v", "p")) == [
        (1, 99, "a"), (2, 20, "a"), (3, 30, "b"),
    ]
    t.drop()


def test_primary_update_and_delete(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, bal double"
    )
    t = ManagedTable.create(spark, TableModel.PRIMARY_KEYS, ["k"])
    t.insert(df)
    t.update({"bal": "bal * 2"}, "k <= 2")
    t.delete("k = 3")
    assert _rows(t.read()) == [(1, 20.0), (2, 40.0)]
    t.drop()


def test_agg_keys_min_max_replace(spark):
    t = ManagedTable.create(
        spark, TableModel.AGG_KEYS, ["k"],
        agg_spec={"lo": "min", "hi": "max", "total": "sum"},
    )
    t.insert(spark.createDataFrame(
        [(1, 5, 5, 5), (1, 3, 3, 3)], "k long, lo long, hi long, total long"
    ))
    t.insert(spark.createDataFrame(
        [(1, 4, 9, 2)], "k long, lo long, hi long, total long"
    ))
    assert _rows(t.read().select("k", "lo", "hi", "total")) == [(1, 3, 9, 10)]
    # compaction must not change query results
    t.compact()
    assert _rows(t.read().select("k", "lo", "hi", "total")) == [(1, 3, 9, 10)]
    t.drop()


def test_merge_into_update_and_insert(spark):
    t = ManagedTable.create(spark, TableModel.PRIMARY_KEYS, ["k"])
    t.insert(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    src = spark.createDataFrame([(2, 5.0), (9, 90.0)], "k long, v double")
    t.merge_into(src, update_set={"v": "t.v + s.v"})
    assert _rows(t.read()) == [(1, 10.0), (2, 25.0), (9, 90.0)]
    t.drop()


def test_dup_keys_append_lossless(spark):
    t = ManagedTable.create(spark, TableModel.DUP_KEYS, ["k"])
    d = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "k long, s string")
    t.insert(d)
    t.insert(d)
    assert t.read().count() == 6  # duplicates preserved — append-only
    t.compact()
    assert t.read().count() == 6
    t.drop()
