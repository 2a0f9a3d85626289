from data_lakehouse_spark.streaming.pipeline import (
    stream_dedup,
    stream_events,
    stream_running_counts,
    stream_tumbling_counts,
)

__all__ = [
    "stream_dedup",
    "stream_events",
    "stream_running_counts",
    "stream_tumbling_counts",
]
