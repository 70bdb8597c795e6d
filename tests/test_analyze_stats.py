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


def test_histogram_statistics_collected(spark, sf_dir):
    """ANALYZE ... WITH HISTOGRAM analog: equi-height histogram bins
    must land in the catalog column stats (the CBO's selectivity input
    for skewed predicates)."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.tables.analyze import analyze_table, column_stats

    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    analyze_table(spark, events, "ev_hist", ["user_id"], histogram=True)
    st = column_stats(spark, "ev_hist", "user_id")
    assert st.get("histogram") not in (None, "NULL"), st
    assert "height" in st["histogram"]
    spark.sql("DROP TABLE IF EXISTS ev_hist")
