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
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_dedup",
    "stream_running_counts",
    "stream_running_counts_tws",
    "stream_to_catalog",
    "make_catalog_sink",
    "stream_to_catalog_fanout",
    "make_catalog_fanout_sink",
    "stream_merge_to_catalog",
    "make_catalog_merge_sink",
    "LAST_BATCH_PROP",
    "ROCKSDB_STATE_CONF",
]

#: Off-heap, disk-backed streaming state (RocksDB, bundled with Spark).
#: The default HDFSBackedStateStoreProvider keeps every key in executor
#: heap — fine for tests, an OOM for billions of dedup/session keys at
#: 100 TB. RocksDB spills to local disk with changelog checkpointing so
#: state size is bounded by disk, not heap, and commit cost is an
#: incremental changelog upload instead of a full snapshot. Apply via
#: ``extra_conf`` at session build (provider is fixed per query at
#: start; tests set it before starting the stream).
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


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


def stream_sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts per event_type: each event lands
    in ``duration / slide`` overlapping windows (state and output scale
    by the same factor — keep the ratio small at high volume)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), duration, slide), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def stream_session_windows(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (dynamic-length
    windows closing after ``gap`` of inactivity) — the streaming twin of
    the batch lag/cumsum sessionization in operators/relational.py.
    Sessions merge as events arrive; a session finalizes when the
    watermark passes its close, so state per key is bounded."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "session_value",
        )
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich the stream with a batch dimension.
    The static side is re-read per micro-batch (picks up dim updates)
    and broadcast when small — no streaming state at all, unlike
    stream-stream joins."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on a key within an event-time interval
    (right event follows the left within ``max_delay`` — e.g. purchase
    attributed to a preceding click).

    Both sides MUST be watermarked and the join MUST carry a time-range
    predicate: together they bound the buffered state (each side keeps
    only rows inside watermark + delay), which is what makes a
    stream-stream join runnable indefinitely. Without the range
    predicate Spark would buffer both streams forever.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])


#: Table property recording the newest committed micro-batch id.
LAST_BATCH_PROP = "stream.last_batch_id"


def make_catalog_sink(
    catalog,
    table: str,
    *,
    partition_by: list[str] | None = None,
    exactly_once: bool = True,
):
    """The foreachBatch function :func:`stream_to_catalog` installs,
    exposed separately so replay behavior is unit-testable.

    With ``exactly_once`` the sink implements the canonical idempotent-
    foreachBatch pattern: every append commit records its ``batch_id``
    in the table properties ATOMICALLY with the data (one manifest
    flip), and a re-delivered batch (failure between sink success and
    checkpoint write — foreachBatch is at-least-once by contract) sees
    ``batch_id <= recorded`` and skips. This is the same
    transactional-marker trick Delta/Iceberg streaming sinks use
    (txnVersion/txnAppId); single-writer per table like the catalog
    itself.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not catalog.table_exists(table):
            catalog.create_table(
                table,
                batch_df,
                partition_by=partition_by,
                properties={LAST_BATCH_PROP: str(batch_id)},
            )
            return
        if exactly_once:
            last = catalog.table_properties(table).get(LAST_BATCH_PROP)
            if last is not None and batch_id <= int(last):
                return  # replayed batch: already committed
        catalog.append(
            table, batch_df, properties_update={LAST_BATCH_PROP: str(batch_id)}
        )

    return sink


def stream_to_catalog(
    stream: DataFrame,
    catalog,
    table: str,
    *,
    checkpoint: str,
    partition_by: list[str] | None = None,
    exactly_once: bool = True,
) -> "object":
    """foreachBatch sink into a versioned Catalog table — the streaming
    bronze-ingestion path: each micro-batch lands as one atomic append
    commit, so downstream batch readers see complete snapshots only.
    End-to-end exactly-once = the checkpoint's replay (at-least-once)
    plus the sink's batch-id marker (idempotence; see
    :func:`make_catalog_sink`). Returns the started StreamingQuery.
    """
    sink = make_catalog_sink(
        catalog, table, partition_by=partition_by, exactly_once=exactly_once
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def make_catalog_fanout_sink(
    catalog,
    routes: dict[str, "object"],
    *,
    exactly_once: bool = True,
):
    """foreachBatch sink that fans ONE micro-batch out to SEVERAL
    catalog tables ATOMICALLY (e.g. silver events + per-type marts +
    a dead-letter table): every route's output is staged as a WAP
    snapshot, then the multi-table transaction's intent log publishes
    them all-or-nothing — a downstream reader never sees the batch in
    one table but not another, even across a crash mid-publish
    (recover_transactions rolls the decided batch forward on the next
    transaction).

    ``routes`` maps table name → ``transform(batch_df) -> DataFrame``.
    A route returning an empty frame writes nothing for that table this
    batch. Missing tables are created EMPTY first (schema from the
    transform output), so the data itself always lands through the
    transaction.

    Exactly-once: each staged append records ``batch_id`` in that
    table's properties in the same commit; on replay, tables at-or-past
    the batch are skipped individually (after a crash the transaction
    machinery guarantees they agree, but pre-existing per-table markers
    may legitimately differ).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)  # one source scan
        try:
            with catalog.transaction() as txn:
                for table, transform in routes.items():
                    out = transform(batch_df)
                    if out.isEmpty():
                        continue
                    if not catalog.table_exists(table):
                        catalog.create_table(table, out.limit(0))
                    if exactly_once:
                        last = catalog.table_properties(table).get(
                            LAST_BATCH_PROP
                        )
                        if last is not None and batch_id <= int(last):
                            continue
                    txn.append(
                        table,
                        out,
                        properties_update={LAST_BATCH_PROP: str(batch_id)},
                    )
        finally:
            batch_df.unpersist()

    return sink


def stream_to_catalog_fanout(
    stream: DataFrame,
    catalog,
    routes: dict[str, "object"],
    *,
    checkpoint: str,
    exactly_once: bool = True,
) -> "object":
    """Start a stream whose every micro-batch publishes to all of
    ``routes``'s tables atomically (see
    :func:`make_catalog_fanout_sink`)."""
    sink = make_catalog_fanout_sink(
        catalog, routes, exactly_once=exactly_once
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def make_catalog_merge_sink(
    catalog,
    table: str,
    on: list[str],
    *,
    seq_col: str | None = None,
    exactly_once: bool = True,
):
    """foreachBatch UPSERT sink: each micro-batch MERGEs into the
    catalog table (``catalog.merge_into`` — COW, dir-pruned) instead of
    appending — the streaming-CDC serving path where the stream carries
    the LATEST state per key (user profiles, inventory levels).

    ``seq_col`` handles multiple updates for one key inside a batch:
    the row with the highest sequence value wins (CDC ordering). Without
    it, duplicate keys in a batch raise (merge cardinality violation).

    Exactly-once: the batch id commits WITH the merge (one manifest
    flip); replayed batches skip. Replay safety holds for update-style
    merges because the skip happens before any rewrite."""
    from pyspark.sql import Window

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if seq_col is not None:
            w = Window.partitionBy(*on).orderBy(F.desc(seq_col))
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if not catalog.table_exists(table):
            catalog.create_table(
                table, batch_df, properties={LAST_BATCH_PROP: str(batch_id)}
            )
            return
        if exactly_once:
            last = catalog.table_properties(table).get(LAST_BATCH_PROP)
            if last is not None and batch_id <= int(last):
                return  # replayed batch: already merged
        catalog.merge_into(
            table,
            batch_df,
            on,
            properties_update={LAST_BATCH_PROP: str(batch_id)},
        )

    return sink


def stream_merge_to_catalog(
    stream: DataFrame,
    catalog,
    table: str,
    on: list[str],
    *,
    checkpoint: str,
    seq_col: str | None = None,
) -> "object":
    """Streaming upsert into a versioned Catalog table via per-batch
    MERGE INTO — see :func:`make_catalog_merge_sink`."""
    sink = make_catalog_merge_sink(catalog, table, on, seq_col=seq_col)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def make_catalog_cdc_sink(
    catalog,
    table: str,
    key_cols: list[str],
    *,
    op_col: str = "_op",
    seq_col: str | None = None,
    exactly_once: bool = True,
):
    """foreachBatch CDC sink — the MERGE-ON-READ twin of
    :func:`make_catalog_merge_sink`: each micro-batch of I/U/D change
    images applies through ``catalog.upsert_cdc`` as ONE atomic
    equality-delete + append commit. O(batch) per micro-batch — no
    table scan, no join, no COW rewrite — which is the cost profile a
    CDC stream into a 100 TB table needs (the merge sink's COW rewrite
    cost grows with the touched dirs; this one never touches them).
    Fold the accumulated delete files with
    ``catalog.rewrite_position_deletes`` on a maintenance cadence.

    Exactly-once: the batch-id marker commits atomically with the
    upsert (one manifest flip); a replayed batch skips — and even
    without the marker the upsert itself is key-idempotent (replay
    re-lists the same keys and re-appends identical images over them).
    A first batch that is delete-only creates nothing (no schema to
    infer images from); the table materializes on the first batch
    carrying images.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not catalog.table_exists(table):
            # op validation FIRST, mirroring upsert_cdc: a NULL op must
            # not silently act as a delete here (and raise on batch 2),
            # an unknown op must not materialize as data
            opc = F.lower(F.col(op_col).cast("string"))
            known = opc.isin(
                "i", "insert", "c", "create", "u", "update", "d", "delete"
            )
            if (
                batch_df.filter(~F.coalesce(known, F.lit(False)))
                .limit(1)
                .count()
            ):
                raise ValueError(
                    f"cdc sink: {op_col} values must be I/U/D "
                    "(insert/update/delete), found NULL or unknown"
                )
            # seq compaction next, delete-filter last — the same
            # order upsert_cdc uses: a key whose FINAL change in the
            # batch is a delete must not materialize its stale earlier
            # image
            if seq_col is not None:
                from pyspark.sql import Window

                w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
                batch_c = (
                    batch_df.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", seq_col)
                )
            else:
                batch_c = batch_df
            images = batch_c.filter(
                ~F.lower(F.col(op_col).cast("string")).isin("d", "delete")
            ).drop(op_col)
            if images.isEmpty():
                return  # delete-only first batch: nothing to create
            catalog.create_table(
                table, images, properties={LAST_BATCH_PROP: str(batch_id)}
            )
            return
        if exactly_once:
            last = catalog.table_properties(table).get(LAST_BATCH_PROP)
            if last is not None and batch_id <= int(last):
                return  # replayed batch: already applied
        catalog.upsert_cdc(
            table,
            batch_df,
            key_cols,
            op_col=op_col,
            seq_col=seq_col,
            properties_update={LAST_BATCH_PROP: str(batch_id)},
        )

    return sink


def stream_cdc_to_catalog(
    stream: DataFrame,
    catalog,
    table: str,
    key_cols: list[str],
    *,
    checkpoint: str,
    op_col: str = "_op",
    seq_col: str | None = None,
) -> "object":
    """Streaming CDC upsert into a versioned Catalog table via atomic
    per-batch equality-delete + append — see
    :func:`make_catalog_cdc_sink`."""
    sink = make_catalog_cdc_sink(
        catalog, table, key_cols, op_col=op_col, seq_col=seq_col
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
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


def stream_running_counts_tws(
    events: DataFrame, *, key_col: str = "event_type"
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`stream_running_counts` — the Spark 4 arbitrary-state API
    (StatefulProcessor + typed state handles) that supersedes
    ``applyInPandasWithState``.

    Same semantics (per-key cumulative count/sum, one updated row per
    key per micro-batch) so the two APIs are pinned equal in
    tests/test_streaming.py; new capability surface: named ValueState
    handles (plus list/map state and timers on the same handle), state
    schema evolution, and first-class RocksDB backing (the RocksDB
    provider — ROCKSDB_STATE_CONF — is REQUIRED by this operator).

    ENVIRONMENT NOTE: executing TWS needs ``google.protobuf`` for the
    Python↔state-server protocol; this container does not ship it, so
    the test verifies plan construction and skips execution — the same
    honest gating as the JDBC sink (S9).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withColumn("key", F.col(key_col))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningAgg(),
            outputStructType="key string, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def stream_dedup(
    events: DataFrame, *, key_cols: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the silver W1 dedup: dropDuplicates within the
    watermark horizon (late duplicates beyond it are the batch layer's
    job — same contract as the reference's watermark+dedup pairing)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols + [ts_col])


def stream_dedup_within_watermark(
    events: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` variant of :func:`stream_dedup`:
    dedups on the KEY alone, so duplicates whose event times differ
    (e.g. retries re-stamped at send time) still collapse as long as
    they arrive within the watermark delay of each other. Per-key state
    is evicted once the watermark passes — memory is bounded by the
    horizon, not by the number of distinct (key, ts) pairs, which is
    the property that matters when replaying days of a 100 TB firehose."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
