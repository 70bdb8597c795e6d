from starrocks_spark.streaming.ingest import (
    read_events_stream,
    run_stream_to_memory,
    upsert_stream_into_table,
)
from starrocks_spark.streaming.windows import (
    dedup_within_watermark,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_revenue,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "upsert_stream_into_table",
    "dedup_within_watermark",
    "session_window_stats",
    "sliding_window_counts",
    "tumbling_window_revenue",
]
