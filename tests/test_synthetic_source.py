"""Python DataSource API connector: deterministic synthetic events in
batch and micro-batch streaming, and composition into the silver
pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.sources.synthetic import register_synthetic_source


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape_and_determinism(spark):
    register_synthetic_source(spark)
    df = _read(spark, partitions=3, rows_per_partition=50, seed=7)
    assert df.count() == 150
    assert df.rdd.getNumPartitions() == 3
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, partitions=3, rows_per_partition=50, seed=7).collect()))
    assert a == b
    # a different seed must actually change the data
    c = sorted(map(tuple, _read(spark, partitions=3, rows_per_partition=50, seed=8).collect()))
    assert a != c
    types = {r["event_type"] for r in df.collect()}
    assert types <= {"view", "click", "purchase", "remove_from_cart", "signup"}


def test_batch_read_feeds_silver_pipeline(spark):
    from data_lakehouse_spark.operators.silver import silver_events

    register_synthetic_source(spark)
    df = _read(spark, partitions=2, rows_per_partition=100, seed=11)
    silver = silver_events(df)
    assert silver.count() > 0
    assert silver.filter(F.col("event_unique_id").isNull()).count() == 0


def test_stream_read_micro_batches(spark, tmp_path):
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("partitions", 2)
        .option("rows_per_batch", 40)
        .option("max_batches", 3)
        .load()
    )
    # Python stream sources don't support Trigger.AvailableNow (Spark
    # falls back to one batch) — run the continuous micro-batch loop
    # and stop once the bounded offset range (max_batches) is drained.
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("synth_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM synth_out").first()["c"] >= 120:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM synth_out").collect()
    # 3 batches × (40 rows split over 2 partitions → 40)
    assert len(rows) == 120
    assert len({r["event_id"] for r in rows}) == 120
