from data_platform_spark.streaming.events import (
    dedup_events_stream,
    hourly_agg_stream,
    read_events_stream,
    sessionize_stream,
    user_running_totals_stream,
)

__all__ = [
    "dedup_events_stream",
    "hourly_agg_stream",
    "read_events_stream",
    "sessionize_stream",
    "user_running_totals_stream",
]
