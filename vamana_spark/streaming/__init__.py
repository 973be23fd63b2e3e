from vamana_spark.streaming.rollup import (
    read_events_stream,
    streaming_hourly_rollup,
    streaming_session_stats,
)

__all__ = [
    "read_events_stream",
    "streaming_hourly_rollup",
    "streaming_session_stats",
]
