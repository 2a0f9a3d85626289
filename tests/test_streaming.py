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
    stream_dedup_within_watermark,
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


def test_stream_dedup_within_watermark_collapses_restamped_retries(spark, tmp_path):
    """Same event_id re-sent 5 minutes later with a NEW timestamp:
    (key, ts) dedup keeps both rows, dropDuplicatesWithinWatermark
    collapses them to one."""
    src = str(tmp_path / "src2w")
    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        (1, t0, "view", 1.0),
        (1, t0 + dt.timedelta(minutes=5), "view", 1.0),  # re-stamped retry
        (2, t0, "cart", 2.0),
    ]
    _write_batch(spark, src, rows)
    stream = stream_events(spark, src, SCHEMA)
    deduped = stream_dedup_within_watermark(
        stream, key_cols=["event_id"], ts_col="ts", watermark="2 hours"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_ww_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_ww_out").first()["c"] == 2
    # the (key, ts) variant keeps the re-stamped retry as a distinct row
    q2 = (
        stream_dedup(stream_events(spark, src, SCHEMA), key_cols=["event_id"], ts_col="ts")
        .writeStream.format("memory")
        .queryName("dedup_ts_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_ts_out").first()["c"] == 3


def test_stream_sliding_counts(spark, tmp_path):
    from data_lakehouse_spark.streaming import stream_sliding_counts

    src = str(tmp_path / "src_slide")
    # 10:00-10:02 → 3 events; hour windows sliding by 30 min
    _write_batch(spark, src, _rows(10, 3))
    agg = stream_sliding_counts(
        stream_events(spark, src, SCHEMA), duration="1 hour", slide="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    # events at 10:00-10:02 belong to the 09:30 and 10:00 hour windows
    assert got == {("2024-01-01T09:30:00", 3), ("2024-01-01T10:00:00", 3)}


def test_stream_session_windows(spark, tmp_path):
    from data_lakehouse_spark.streaming import stream_session_windows

    src = str(tmp_path / "src_sess")
    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        (1, t0, "view", 1.0),
        (1, t0 + dt.timedelta(minutes=10), "view", 2.0),   # same session
        (1, t0 + dt.timedelta(hours=3), "view", 4.0),      # new session
        (2, t0, "cart", 8.0),
    ]
    _write_batch(spark, src, rows)
    sess = stream_session_windows(
        stream_events(spark, src, SCHEMA), key_col="event_id", gap="30 minutes"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert got == {(1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)}


def test_stream_static_enrich_and_catalog_sink(spark, tmp_path):
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import (
        stream_static_enrich,
        stream_to_catalog,
    )

    src = str(tmp_path / "src_enrich")
    t0 = dt.datetime(2024, 1, 1, 10)
    # two files → two micro-batches → two append commits
    _write_batch(spark, src, [(1, t0, "view", 1.0), (2, t0, "cart", 2.0)])
    _write_batch(spark, src, [(3, t0, "view", 3.0)])
    dim = spark.createDataFrame(
        [("view", "browse"), ("cart", "intent")], "event_type string, stage string"
    )
    enriched = stream_static_enrich(
        stream_events(spark, src, SCHEMA, max_files_per_trigger=1),
        dim,
        on="event_type",
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    q = stream_to_catalog(
        enriched, cat, "bronze_stream", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = {
        (r["event_id"], r["stage"]) for r in cat.read("bronze_stream").collect()
    }
    assert rows == {(1, "browse"), (2, "intent"), (3, "browse")}
    ops = [r["operation"] for r in cat.snapshots("bronze_stream").collect()]
    assert ops[0] == "create" and len(ops) == 2 and ops[1] == "append"


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases attribute to a preceding click of the same user within
    the delay window; outside-window or unmatched events drop."""
    from data_lakehouse_spark.streaming import stream_stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 10)
    clicks_path = str(tmp_path / "clicks")
    buys_path = str(tmp_path / "buys")
    click_schema = StructType(
        [
            StructField("user", LongType()),
            StructField("l_ts", TimestampType()),
            StructField("click_id", LongType()),
        ]
    )
    buy_schema = StructType(
        [
            StructField("user", LongType()),
            StructField("r_ts", TimestampType()),
            StructField("buy_id", LongType()),
        ]
    )
    spark.createDataFrame(
        [(1, t0, 100), (2, t0, 200), (3, t0, 300)], click_schema
    ).coalesce(1).write.parquet(clicks_path)
    spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=30), 1000),  # in window
            (2, t0 + dt.timedelta(hours=5), 2000),     # too late
        ],
        buy_schema,
    ).coalesce(1).write.parquet(buys_path)

    clicks = spark.readStream.schema(click_schema).parquet(clicks_path)
    buys = spark.readStream.schema(buy_schema).parquet(buys_path)
    joined = stream_stream_interval_join(
        clicks, buys, on="user", max_delay="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user"], r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM attrib_out").collect()
    }
    assert rows == {(1, 100, 1000)}


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


def test_rocksdb_state_store_matches_heap_results(spark, tmp_path):
    """The scale state backend: the same watermarked tumbling aggregate
    produces identical results under RocksDBStateStoreProvider (disk-
    backed, changelog-checkpointed — state bounded by disk, not
    executor heap). Provider is fixed per query at start, so the conf
    is set around the stream and restored after."""
    from data_lakehouse_spark.streaming import ROCKSDB_STATE_CONF

    src = str(tmp_path / "src")
    _write_batch(spark, src, _rows(10, 3) + _rows(11, 2))

    saved = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    try:
        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
        agg = stream_tumbling_counts(
            stream_events(spark, src, SCHEMA), duration="1 hour", watermark="2 hours"
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # the running query really used RocksDB state
        assert "RocksDBStateStoreProvider" in q.lastProgress["stateOperators"][0][
            "customMetrics"
        ].__str__() or "rocksdb" in str(q.lastProgress["stateOperators"][0]).lower()
        got = {
            (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM rocksdb_out").collect()
        }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got[("2024-01-01T10:00:00", "view")] == 3
    assert got[("2024-01-01T11:00:00", "view")] == 2


def test_catalog_sink_skips_replayed_batch(spark, tmp_path):
    """foreachBatch is at-least-once; the sink's batch-id marker makes
    the catalog table exactly-once: a re-delivered batch is a no-op."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import make_catalog_sink

    cat = Catalog(spark, str(tmp_path / "wh"))
    sink = make_catalog_sink(cat, "t")
    b0 = spark.createDataFrame([(1,), (2,)], "id long")
    b1 = spark.createDataFrame([(3,)], "id long")

    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay after a crash between commit and checkpoint
    sink(b0, 0)  # stale replay
    assert sorted(r["id"] for r in cat.read("t").collect()) == [1, 2, 3]
    assert cat.table_properties("t")["stream.last_batch_id"] == "1"
    # only the two real commits exist
    assert cat.snapshots("t").count() == 2

    # opting out reproduces the raw at-least-once behavior
    raw = make_catalog_sink(cat, "t_raw", exactly_once=False)
    raw(b0, 0)
    raw(b0, 0)
    assert cat.read("t_raw").count() == 4


def test_catalog_merge_sink_streaming_upsert(spark, tmp_path):
    """Per-batch MERGE INTO sink: the stream carries latest-state-per-key
    CDC rows; the table converges to the newest value per key, replays
    are no-ops, and within-batch duplicates resolve by the seq column."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import make_catalog_merge_sink

    cat = Catalog(spark, str(tmp_path / "wh"))
    sink = make_catalog_merge_sink(cat, "profiles", ["user_id"], seq_col="seq")

    b0 = spark.createDataFrame(
        [(1, "bronze", 1), (2, "bronze", 1)], "user_id long, tier string, seq long"
    )
    # batch 1: update user 1 twice (seq decides), insert user 3
    b1 = spark.createDataFrame(
        [(1, "silver", 2), (1, "gold", 3), (3, "bronze", 1)],
        "user_id long, tier string, seq long",
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay: must be a no-op (no extra snapshot, same rows)
    rows = {r["user_id"]: r["tier"] for r in cat.read("profiles").collect()}
    assert rows == {1: "gold", 2: "bronze", 3: "bronze"}
    assert cat.table_properties("profiles")["stream.last_batch_id"] == "1"
    assert cat.snapshots("profiles").count() == 2  # create + one merge


def test_catalog_cdc_sink_streaming_upsert(spark, tmp_path):
    """Per-batch ATOMIC eq-delete + append sink (the MOR twin of the
    merge sink): I/U/D change images apply in one commit per batch,
    deletes actually remove keys (the merge sink can't), replays are
    no-ops via the batch-id marker, within-batch duplicates resolve by
    seq, and each applied batch advances the version exactly once."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import make_catalog_cdc_sink

    cat = Catalog(spark, str(tmp_path / "wh"))
    sink = make_catalog_cdc_sink(
        cat, "profiles", ["user_id"], seq_col="seq"
    )
    sch = "user_id long, tier string, seq long, _op string"
    b0 = spark.createDataFrame(
        [(1, "bronze", 1, "I"), (2, "bronze", 1, "I")], sch
    )
    # batch 1: user 1 updated twice (seq decides), user 2 DELETED,
    # user 3 inserted
    b1 = spark.createDataFrame(
        [
            (1, "silver", 2, "U"),
            (1, "gold", 3, "U"),
            (2, None, 2, "D"),
            (3, "bronze", 1, "I"),
        ],
        sch,
    )
    sink(b0, 0)
    v1 = cat.current_version("profiles")
    sink(b1, 1)
    assert cat.current_version("profiles") == v1 + 1  # ONE atomic commit
    sink(b1, 1)  # replay: no-op (no extra snapshot, same rows)
    assert cat.current_version("profiles") == v1 + 1
    rows = {r["user_id"]: r["tier"] for r in cat.read("profiles").collect()}
    assert rows == {1: "gold", 3: "bronze"}  # 2 is GONE (real delete)
    assert cat.table_properties("profiles")["stream.last_batch_id"] == "1"
    # a delete-only FIRST batch on a fresh table creates nothing
    sink2 = make_catalog_cdc_sink(cat, "fresh", ["user_id"])
    sink2(
        spark.createDataFrame([(9, None, 0, "D")], sch), 0
    )
    assert not cat.table_exists("fresh")
    # first-batch ordering: seq compaction BEFORE the delete filter — a
    # key whose FINAL change is D must not materialize its stale image
    sink3 = make_catalog_cdc_sink(cat, "fresh2", ["user_id"], seq_col="seq")
    sink3(
        spark.createDataFrame(
            [(1, "stale", 1, "I"), (1, None, 2, "D"), (2, "ok", 1, "I")],
            sch,
        ),
        0,
    )
    assert {r["user_id"] for r in cat.read("fresh2").collect()} == {2}


def test_stream_cdc_to_catalog_end_to_end(spark, tmp_path):
    """Full streaming CDC: two micro-batch files of I/U/D images
    through stream_cdc_to_catalog; the table converges to the final
    state with deletes applied — each batch one atomic MOR commit."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import stream_cdc_to_catalog

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("tier", StringType()),
            StructField("seq", LongType()),
            StructField("_op", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "bronze", 1, "I"), (2, "bronze", 1, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cat = Catalog(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_cdc_to_catalog(
        stream, cat, "profiles", ["user_id"],
        checkpoint=str(tmp_path / "ckpt"), seq_col="seq",
    )
    q.awaitTermination(120)

    spark.createDataFrame(
        [(2, "gold", 2, "U"), (1, None, 2, "D"), (4, "silver", 1, "I")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_cdc_to_catalog(
        stream, cat, "profiles", ["user_id"],
        checkpoint=str(tmp_path / "ckpt"), seq_col="seq",
    )
    q2.awaitTermination(120)
    rows = {r["user_id"]: r["tier"] for r in cat.read("profiles").collect()}
    assert rows == {2: "gold", 4: "silver"}  # user 1 deleted


def test_stream_merge_to_catalog_end_to_end(spark, tmp_path):
    """Full streaming upsert: two micro-batch files through
    stream_merge_to_catalog; the table holds the latest row per key."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import stream_merge_to_catalog

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("tier", StringType()),
            StructField("seq", LongType()),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "bronze", 1), (2, "bronze", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cat = Catalog(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_merge_to_catalog(
        stream, cat, "profiles", ["user_id"],
        checkpoint=str(tmp_path / "ckpt"), seq_col="seq",
    )
    q.awaitTermination(120)

    spark.createDataFrame([(2, "gold", 2), (4, "silver", 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = stream_merge_to_catalog(
        stream, cat, "profiles", ["user_id"],
        checkpoint=str(tmp_path / "ckpt"), seq_col="seq",
    )
    q2.awaitTermination(120)
    rows = {r["user_id"]: r["tier"] for r in cat.read("profiles").collect()}
    assert rows == {1: "bronze", 2: "gold", 4: "silver"}


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark 4 arbitrary-state API (transformWithStateInPandas /
    StatefulProcessor) must reproduce the applyInPandasWithState twin:
    same per-key cumulative totals, same once-per-batch emission.

    ENVIRONMENT-GATED: the TWS state-server protocol needs
    ``google.protobuf``, which this container does not ship (and
    installs are off-limits) — the operator is then exercised only for
    plan construction; the full run executes wherever protobuf exists.
    """
    import importlib.util

    import pytest as _pytest

    from data_lakehouse_spark.streaming import stream_running_counts_tws as _tws

    try:
        have_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        have_protobuf = False
    if not have_protobuf:
        # still pin the API usage: building the streaming plan must
        # analyze cleanly even where execution is unavailable
        src0 = str(tmp_path / "src_tws_plan")
        _write_batch(spark, src0, [(1, dt.datetime(2024, 1, 1, 10), "view", 1.0)])
        plan_df = _tws(
            stream_events(spark, src0, SCHEMA), key_col="event_type"
        )
        assert [f.name for f in plan_df.schema.fields] == [
            "key", "n_events", "total_value",
        ]
        _pytest.skip("google.protobuf unavailable: TWS execution is environment-blocked")
    from data_lakehouse_spark.streaming import (
        ROCKSDB_STATE_CONF,
        stream_running_counts_tws,
    )

    src = str(tmp_path / "src_tws")
    t0 = dt.datetime(2024, 1, 1, 10)
    _write_batch(spark, src, [(1, t0, "view", 1.0), (2, t0, "view", 2.0),
                              (3, t0, "cart", 5.0)])
    _write_batch(spark, src, [(4, t0, "view", 3.0)])

    stream = stream_events(spark, src, SCHEMA, max_files_per_trigger=1)
    counts = stream_running_counts_tws(stream, key_col="event_type")
    # transformWithState requires the RocksDB state store provider
    saved = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    try:
        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
        q = (
            counts.writeStream.format("memory")
            .queryName("running_out_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    rows = spark.sql("SELECT * FROM running_out_tws").collect()
    latest = {}
    for r in rows:
        latest[r["key"]] = (r["n_events"], r["total_value"])
    assert latest["view"] == (3, 6.0)
    assert latest["cart"] == (1, 5.0)
    assert sum(1 for r in rows if r["key"] == "view") >= 2


def test_streaming_corpus_quality_intake(spark, tmp_path):
    """LLM-pipeline streaming intake: documents stream through the
    Arrow quality gate (mapInPandas runs inside the streaming plan)
    into the exactly-once catalog sink; only gate-passing docs land,
    and their signals match the batch path bit-for-bit."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.operators import corpus
    from data_lakehouse_spark.streaming import stream_to_catalog
    from pyspark.sql.types import StructField

    src = str(tmp_path / "docs_src")
    good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
    rows = [(1, good), (2, "tiny"), (3, good + " extra tail tokens")]
    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(doc_schema).parquet(src)
    gated = corpus.quality_signals(stream, engine="arrow").filter(
        F.col("gopher_pass")
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    q = stream_to_catalog(
        gated, cat, "corpus_signals", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    landed = cat.read("corpus_signals")
    batch = {
        r["doc_id"]: r.asDict()
        for r in corpus.quality_signals(
            spark.createDataFrame(rows, doc_schema), engine="arrow"
        )
        .filter(F.col("gopher_pass"))
        .collect()
    }
    got = {r["doc_id"]: r.asDict() for r in landed.collect()}
    assert set(got) == set(batch) == {1, 3}
    assert got == batch  # streaming plan == batch plan, bit-for-bit


def test_catalog_fanout_sink_atomic_and_exactly_once(spark, tmp_path):
    """One micro-batch fans out to two tables through a multi-table
    transaction: both visible after the sink returns, replays skip
    per-table, and a crash between intent and publish rolls forward on
    the next transaction."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import make_catalog_fanout_sink
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "wh"))
    routes = {
        "views": lambda df: df.filter(F.col("kind") == "view").select("id"),
        "buys": lambda df: df.filter(F.col("kind") == "buy").select("id"),
    }
    sink = make_catalog_fanout_sink(cat, routes)
    b0 = spark.createDataFrame(
        [(1, "view"), (2, "buy"), (3, "view")], "id long, kind string"
    )
    sink(b0, 0)
    assert sorted(r.id for r in cat.read("views").collect()) == [1, 3]
    assert sorted(r.id for r in cat.read("buys").collect()) == [2]

    sink(b0, 0)  # replay: both tables skip
    assert cat.read("views").count() == 2
    assert cat.read("buys").count() == 1

    # a route with no rows this batch writes nothing but others proceed
    b1 = spark.createDataFrame([(4, "view")], "id long, kind string")
    sink(b1, 1)
    assert sorted(r.id for r in cat.read("views").collect()) == [1, 3, 4]
    assert cat.read("buys").count() == 1
    assert cat.table_properties("views")["stream.last_batch_id"] == "1"
    assert cat.table_properties("buys")["stream.last_batch_id"] == "0"


def test_catalog_fanout_crash_mid_publish_recovers(spark, tmp_path):
    """Stage both outputs + write the intent, crash before any flip:
    the next fanout batch's transaction rolls the stuck one forward
    first, so no reader ever sees table A's batch without table B's."""
    import json as _json
    import os as _os

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.streaming import make_catalog_fanout_sink
    from data_lakehouse_spark.streaming.pipeline import LAST_BATCH_PROP

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_table("x", spark.createDataFrame([(0,)], "id long"))
    cat.create_table("y", spark.createDataFrame([(0,)], "id long"))
    txn = cat.transaction()
    txn.append("x", spark.createDataFrame([(1,)], "id long"),
               properties_update={LAST_BATCH_PROP: "5"})
    txn.append("y", spark.createDataFrame([(1,)], "id long"),
               properties_update={LAST_BATCH_PROP: "5"})
    tdir = _os.path.join(cat.root, "_txn")
    _os.makedirs(tdir, exist_ok=True)
    with open(_os.path.join(tdir, f"{txn.txn_id}.json"), "w") as f:
        _json.dump({"txn_id": txn.txn_id,
                    "tables": {n: v for n, (v, _) in txn._staged.items()}}, f)
    assert cat.read("x").count() == 1  # staged batch invisible

    sink = make_catalog_fanout_sink(
        cat, {"x": lambda df: df, "y": lambda df: df}
    )
    sink(spark.createDataFrame([(2,)], "id long"), 6)
    assert sorted(r.id for r in cat.read("x").collect()) == [0, 1, 2]
    assert sorted(r.id for r in cat.read("y").collect()) == [0, 1, 2]
