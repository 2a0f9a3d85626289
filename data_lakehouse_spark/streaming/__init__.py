from data_lakehouse_spark.streaming.pipeline import (
    ROCKSDB_STATE_CONF,
    stream_dedup,
    stream_events,
    stream_running_counts,
    stream_running_counts_tws,
    stream_session_windows,
    stream_sliding_counts,
    stream_static_enrich,
    stream_stream_interval_join,
    make_catalog_sink,
    stream_to_catalog,
    stream_tumbling_counts,
)

__all__ = [
    "ROCKSDB_STATE_CONF",
    "stream_dedup",
    "stream_events",
    "stream_running_counts",
    "stream_running_counts_tws",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "make_catalog_sink",
    "stream_to_catalog",
    "stream_tumbling_counts",
]
