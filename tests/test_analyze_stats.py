"""ANALYZE → catalog statistics → CBO (tables/analyze.py)."""

from __future__ import annotations

from starrocks_spark.catalog import load_table
from starrocks_spark.tables.analyze import analyze_table, column_stats


def test_analyze_populates_table_and_column_stats(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    props = analyze_table(
        spark, nation, "stats_nation", columns=["n_nationkey", "n_name"]
    )
    assert "Statistics" in props  # table-level size/rowCount recorded
    assert "25 rows" in props["Statistics"]

    st = column_stats(spark, "stats_nation", "n_nationkey")
    assert st.get("distinct_count") == "25"
    assert st.get("min") == "0"
    assert st.get("max") == "24"
    assert st.get("num_nulls") == "0"

    # CBO is on, so these stats feed join reorder / broadcast choice
    assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
    spark.sql("DROP TABLE IF EXISTS stats_nation")
