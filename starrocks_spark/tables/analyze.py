"""ANALYZE / statistics collection (SURVEY.md §4.2; reference:
ANALYZE jobs in fe/.../com/starrocks/statistic/, consumed by
optimizer/statistics/ and CostModel.java:81).

On Spark the CBO (`spark.sql.cbo.enabled`, on in session.py) consumes
table/column statistics from the catalog; this helper materializes a
DataFrame as a managed table and runs
``ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]`` so join
reordering and broadcast decisions are cost-based — the exact analog
of the reference's ANALYZE → Cascades-cost pipeline.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def analyze_table(spark: SparkSession, df: DataFrame, name: str,
                  columns: list[str] | None = None,
                  histogram: bool = False) -> dict[str, str]:
    """Save ``df`` as managed table ``name``, ANALYZE it (table-level
    + per-column NDV/min/max/nulls; with ``histogram=True`` also
    equi-height histograms — the reference's ANALYZE ... WITH
    HISTOGRAM, statistic/HistogramStatisticsCollectJob.java — which
    the CBO uses for selectivity on skewed columns), and return the
    catalog stats."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)
    df.write.mode("overwrite").saveAsTable(name)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        prev = spark.conf.get("spark.sql.statistics.histogram.enabled")
        try:
            if histogram:
                spark.conf.set(
                    "spark.sql.statistics.histogram.enabled", "true"
                )
            spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}"
            )
        finally:
            spark.conf.set(
                "spark.sql.statistics.histogram.enabled", prev
            )
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    return {r["col_name"]: r["data_type"] for r in rows}


def column_stats(spark: SparkSession, name: str, column: str) -> dict[str, str]:
    """Catalog column statistics (NDV/min/max/nulls) for one column."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name} {column}").collect()
    return {r["info_name"]: r["info_value"] for r in rows}
