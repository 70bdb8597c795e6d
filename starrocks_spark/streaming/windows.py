"""Streaming windowed aggregation + dedup — the Spark-native
equivalent of the reference's incremental-MV / IVM surface
(SURVEY.md §2.12: STREAM_AGG plan nodes PlanNodes.thrift:83-85,
be/src/exprs/agg/stream/). StarRocks has no watermark surface (late
data is handled by partition re-refresh); Spark's watermark + update
mode is the stream-native answer, so these operators take an
explicit watermark.

All aggregation state is keyed and bounded (per-window per-key), so
it shards across executors; watermarks bound state retention under
late data. Sums use the fixed-point policy so the settled streaming
answer hash-matches the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from starrocks_spark.queries._util import fixed


def tumbling_window_revenue(events: DataFrame, width: str = "1 hour",
                            watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window count + revenue per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(fixed(F.col("value"), 4)).alias("value_fixed"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_us"),
            "event_type",
            "n_events",
            (F.col("value_fixed").cast("double") / F.lit(1e4)).alias("total_value"),
        )
    )


def sliding_window_counts(events: DataFrame, width: str = "1 hour",
                          slide: str = "30 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Sliding (hopping) window: each event lands in width/slide
    overlapping windows (Spark expands via Expand, like the
    reference's REPEAT node)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_us"),
            "n_events",
        )
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Session windows per user: events closer than `gap` merge into
    one session (F.session_window — the streaming twin of the batch
    sessionize operator; reference session_number window.h:788)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, key_cols: list[str],
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state
    (dropDuplicatesWithinWatermark): the streaming analog of the
    PRIMARY_KEYS ingest dedup — duplicate keys arriving within the
    watermark horizon are suppressed, and state for expired keys is
    dropped."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
