from data_platform_spark.streaming.events import (
    hourly_agg_stream,
    read_events_stream,
    sessionize_stream,
    user_running_totals_stream,
)

__all__ = [
    "hourly_agg_stream",
    "read_events_stream",
    "sessionize_stream",
    "user_running_totals_stream",
]
