"""Sink operators (SURVEY.md §2.1, S6–S9).

Managed tables are partitioned Parquet directories (the lakehouse table
format is external to the engine; Iceberg drops in where its runtime jar
is available — same writeTo() calls). Partition columns are part of the
table contract: at 100 TB, date-partitioned gold tables give partition
pruning on every serving query.

- S6 append sink            (reference: spark/jobs/bronze_ingestion.py:180-182)
- S7/S8 incremental/replace (reference: dbt materializations; see plans/incremental.py)
- S9 JDBC sink              (reference: spark/jobs/sync_gold_to_clickhouse.py:89-98)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["append_table", "replace_table", "jdbc_sink", "write_bucketed"]


def _writer(
    df: DataFrame,
    partition_by: list[str] | None,
    sort_by: list[str] | None,
    fmt: str = "parquet",
):
    # sortWithinPartitions stands in for MergeTree ORDER BY / Iceberg
    # sort order: co-locates key ranges inside each file for min/max
    # skipping (reference: clickhouse/create_tables.sql:24,56-60).
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def append_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """S6/S7: append files to a managed table directory. ``fmt`` is any
    columnar format Spark ships ("parquet" default, "orc" for
    Hive-ecosystem interop) — both get vectorized scans, min/max
    skipping, and partition pruning."""
    _writer(df, partition_by, sort_by, fmt).mode("append").save(path)


def replace_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """S8: full-table CREATE OR REPLACE materialization."""
    _writer(df, partition_by, sort_by, fmt).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (CLUSTERED BY ... INTO n BUCKETS).

    THE pre-shuffle for repeated big joins/aggs on a stable key: both
    sides bucketed on the join key with the same bucket count join with
    NO Exchange on either side (SortMergeJoin reads co-located buckets
    directly; asserted in tests/test_plans.py). At 100 TB this converts
    every fact-to-fact join on the key from a full shuffle into a local
    merge — the bucketing shuffle is paid once at write time. Bucketed
    tables must go through the session catalog (``saveAsTable``), not a
    path — bucket metadata lives in the metastore.
    """
    w = df.write.format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).saveAsTable(table)


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    """S9: JDBC export (the reference syncs gold marts to ClickHouse).

    Note the reference's quirk: it claims overwrite idempotency but uses
    append (SURVEY.md §4 #2). We default to append for parity; pass
    mode='overwrite' with option truncate=true for the fixed behavior.
    """
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.mode(mode).save()
