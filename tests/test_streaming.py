"""Structured Streaming surface vs its batch twins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_lakehouse_spark.streaming import (
    stream_dedup,
    stream_events,
    stream_tumbling_counts,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _rows(start_hour, n, typ="view"):
    base = dt.datetime(2024, 1, 1, start_hour)
    return [
        (start_hour * 100 + i, base + dt.timedelta(minutes=i), typ, 1.0)
        for i in range(n)
    ]


def test_stream_tumbling_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, _rows(10, 3) + _rows(11, 2))

    stream = stream_events(spark, src, SCHEMA)
    agg = stream_tumbling_counts(stream, duration="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert got == {
        ("2024-01-01T10:00:00", "view"): 3,
        ("2024-01-01T11:00:00", "view"): 2,
    }


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    src = str(tmp_path / "src2")
    t0 = dt.datetime(2024, 1, 1, 10)
    _write_batch(
        spark,
        src,
        [(1, t0, "view", 1.0), (1, t0, "view", 1.0), (2, t0, "cart", 2.0)],
    )
    stream = stream_events(spark, src, SCHEMA)
    deduped = stream_dedup(stream, key_cols=["event_id"], ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_out").first()["c"] == 2


def test_stream_running_counts_state_across_batches(spark, tmp_path):
    from data_lakehouse_spark.streaming import stream_running_counts

    src = str(tmp_path / "src3")
    t0 = dt.datetime(2024, 1, 1, 10)
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    _write_batch(spark, src, [(1, t0, "view", 1.0), (2, t0, "view", 2.0),
                              (3, t0, "cart", 5.0)])
    _write_batch(spark, src, [(4, t0, "view", 3.0)])

    stream = stream_events(spark, src, SCHEMA, max_files_per_trigger=1)
    counts = stream_running_counts(stream, key_col="event_type")
    q = (
        counts.writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_out").collect()
    # state accumulates across micro-batches: the final emitted row per
    # key carries the cumulative totals
    latest = {}
    for r in rows:
        latest[r["key"]] = (r["n_events"], r["total_value"])
    assert latest["view"] == (3, 6.0)
    assert latest["cart"] == (1, 5.0)
    # 'view' must have been emitted more than once (once per batch)
    assert sum(1 for r in rows if r["key"] == "view") >= 2
