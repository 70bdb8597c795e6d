"""information_schema breadth beyond the columns view — the
tables / partitions / column-statistics scanners users actually query
(reference: be/src/schema_scanner/ has 121 scanners backed by FE
catalog state; fe exposes them as information_schema tables).

Spark realization: each view is a DataFrame over CATALOG-SCALE state —
schema metadata, partition directory footers, ANALYZE statistics —
never a data scan (except ``schema_tables``' row counts, which are one
count-star aggregate per table unioned into a single plan; counts
push down to parquet footer statistics)."""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def schema_tables(spark: SparkSession,
                  tables: dict[str, DataFrame]) -> DataFrame:
    """information_schema.tables: one row per registered table —
    column count (pure catalog metadata) and row count (count-star
    aggregates, footer-served for parquet sources)."""
    out = None
    for tname in sorted(tables):
        df = tables[tname]
        row = df.agg(
            F.count(F.lit(1)).alias("table_rows")
        ).select(
            F.lit(tname).alias("table_name"),
            F.lit(len(df.columns)).cast("long").alias("n_columns"),
            "table_rows",
        )
        out = row if out is None else out.unionByName(row)
    return out


def schema_partitions(spark: SparkSession, table_path: str,
                      partition_col: str) -> DataFrame:
    """information_schema.partitions over a partitioned managed table:
    partition value, file count, row count — all from directory
    listing + parquet FOOTERS (driver-side metadata, zero data I/O;
    the schema_scanner reads FE partition state the same way)."""
    import pyarrow.parquet as pq

    prefix = f"{partition_col}="
    rows = []
    for d in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, d)
        if not d.startswith(prefix) or not os.path.isdir(full):
            continue
        n_files = n_rows = 0
        for fn in os.listdir(full):
            if fn.endswith(".parquet"):
                n_files += 1
                n_rows += pq.ParquetFile(
                    os.path.join(full, fn)
                ).metadata.num_rows
        rows.append(Row(
            partition_value=unquote(d[len(prefix):]),
            n_files=n_files,
            n_rows=n_rows,
        ))
    return spark.createDataFrame(rows)


def schema_column_stats(spark: SparkSession, df: DataFrame,
                        table_name: str,
                        columns: list[str]) -> DataFrame:
    """information_schema column statistics: null_count / min / max per
    column, served from the CATALOG after ANALYZE (tables/analyze.py) —
    the reference's statistics tables read the FE statistic storage the
    same way. Values come back as catalog strings; integer columns are
    surfaced as BIGINT for exactness."""
    from starrocks_spark.tables.analyze import analyze_table, column_stats

    analyze_table(spark, df, table_name, columns=columns)
    rows = []
    for c in columns:
        st = column_stats(spark, table_name, c)
        rows.append(Row(
            column_name=c,
            null_count=int(st.get("num_nulls", "0")),
            min_value=int(st["min"]),
            max_value=int(st["max"]),
        ))
    return spark.createDataFrame(rows)


def snapshot_history(spark: SparkSession, table) -> DataFrame:
    """DESCRIBE HISTORY analog over a lakehouse SnapshotTable: one row
    per commit (version, operation, file/row counts) straight from the
    commit log — pure metadata, no data I/O (reference: the
    table-snapshot schema scanners; Delta's DESCRIBE HISTORY)."""
    rows = [
        Row(version=s.version, operation=s.operation,
            n_files=len(s.files), n_rows=int(s.n_rows))
        for s in table.history()
    ]
    return spark.createDataFrame(rows)
