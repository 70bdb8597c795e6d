"""Table-management layer: StarRocks table models re-expressed as
parquet-backed managed tables with Spark-native partitioning,
bucketing and copy-on-write DML (SURVEY.md §1.1, §2.13)."""

from starrocks_spark.tables.models import ManagedTable, TableModel

__all__ = ["ManagedTable", "TableModel"]
