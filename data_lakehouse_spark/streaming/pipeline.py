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

__all__ = [
    "stream_events",
    "stream_tumbling_counts",
    "stream_dedup",
    "stream_running_counts",
]


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


def stream_running_counts(
    events: DataFrame, *, key_col: str = "event_type"
) -> DataFrame:
    """Custom stateful operator: per-key cumulative event count and
    value sum across micro-batches via ``applyInPandasWithState``.

    The canonical shape for state Spark's built-ins can't express
    (counters, ML feature state, per-entity models): state lives in the
    state store partitioned by key, each micro-batch updates it through
    Arrow-batched pandas, and one updated row per key is emitted per
    batch. Bound state per key (two numbers) — safe at any key
    cardinality the state store can shard.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.withColumn("key", F.col(key_col)).groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key string, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    events: DataFrame, *, key_cols: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the silver W1 dedup: dropDuplicates within the
    watermark horizon (late duplicates beyond it are the batch layer's
    job — same contract as the reference's watermark+dedup pairing)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols + [ts_col])
