"""Structured Streaming surface (engine extension — SURVEY.md §2.10:
the reference has no streaming; its analogues are watermark-incremental
batch + ROW_NUMBER dedup, which these operators generalize).

The batch twins live in operators/relational.py (tumbling_window_agg)
and operators/silver.py (dedup) — same expressions, so batch results
are the golden reference for the streaming path in tests.

Scale notes: state-store size is bounded by the watermark; dedup keys
expire with it. Sinks should be partitioned by window date for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_events", "stream_tumbling_counts", "stream_dedup"]


def stream_events(
    spark: SparkSession, path: str, schema, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet directory (tests feed it one
    file at a time to simulate arrival)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame, *, key_cols: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the silver W1 dedup: dropDuplicates within the
    watermark horizon (late duplicates beyond it are the batch layer's
    job — same contract as the reference's watermark+dedup pairing)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols + [ts_col])
