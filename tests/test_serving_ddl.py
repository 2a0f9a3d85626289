"""Serving-engine DDL generation (serving_ddl.py): gold marts →
ClickHouse MergeTree DDL derived from live schemas, matched to the
reference's clickhouse/create_tables.sql clause for clause, plus the
JDBC sync job with generated createTableOptions
(sync_gold_to_clickhouse.py:96)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.pipeline import MedallionPipeline
from data_lakehouse_spark.serving_ddl import (
    GOLD_SERVING_SPECS,
    ServingSpec,
    clickhouse_ddl,
    clickhouse_type,
    create_table_options,
    gold_serving_ddl,
    sync_gold_marts,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _batch(ids, day, typ="purchase"):
    return [
        (
            i,
            dt.datetime(2024, 1, day, 10 + (i % 5)),
            i % 3 + 1,
            typ,
            10.0 * i,
            '{"k": 1}',
        )
        for i in ids
    ]


def _gold_catalog(spark, tmp_path) -> Catalog:
    cat = Catalog(spark, str(tmp_path / "w"))
    pipe = MedallionPipeline(
        spark, cat, cart_type="cart", as_of_date="2024-02-01"
    )
    pipe.ingest_bronze(
        spark.createDataFrame(_batch(range(1, 9), 1), EVENTS), "b.parquet"
    )
    pipe.build_silver()
    pipe.build_gold()
    return cat


def test_clickhouse_type_mapping():
    assert clickhouse_type(T.LongType()) == "Int64"
    assert clickhouse_type(T.DoubleType(), nullable=True) == "Nullable(Float64)"
    assert clickhouse_type(T.DecimalType(15, 2)) == "Decimal(15, 2)"
    assert clickhouse_type(T.DateType()) == "Date"
    assert clickhouse_type(T.TimestampType()) == "DateTime"
    assert clickhouse_type(T.BooleanType()) == "UInt8"
    assert (
        clickhouse_type(T.ArrayType(T.FloatType(), False)) == "Array(Float32)"
    )
    with pytest.raises(TypeError, match="no ClickHouse mapping"):
        clickhouse_type(T.MapType(T.StringType(), T.LongType()))


def test_daily_sales_ddl_reference_shape(spark, tmp_path):
    """The generated daily_sales_summary DDL carries the reference's
    exact engine clauses (create_tables.sql:22-25): monthly partition
    on sale_date, sale_date sort key, index_granularity 8192."""
    cat = _gold_catalog(spark, tmp_path)
    ddl = gold_serving_ddl(cat)
    assert set(ddl) == {
        "daily_sales_summary",
        "product_performance",
        "category_performance",
        "user_rfm_segments",
        "conversion_funnel_daily",
        "user_journey_funnel",
        "hourly_traffic",
    }
    d = ddl["daily_sales_summary"]
    assert d.startswith(
        "CREATE TABLE IF NOT EXISTS lakehouse.daily_sales_summary"
    )
    assert "ENGINE = MergeTree()" in d
    assert "PARTITION BY toYYYYMM(sale_date)" in d
    assert "ORDER BY sale_date" in d
    assert "SETTINGS index_granularity = 8192" in d
    # every mart column is present with a mapped type
    for col in cat.read("gold_daily_sales_summary").columns:
        assert f"    {col} " in d
    # hourly traffic: composite sort key like create_tables.sql:231
    h = ddl["hourly_traffic"]
    assert "PARTITION BY toYYYYMM(event_date)" in h
    assert "ORDER BY (event_date, " in h


def test_nullable_sort_keys_get_ifnull_guard(spark, tmp_path):
    """MergeTree sort keys reject NULLs; nullable key columns are
    wrapped ifNull(col, ''/0) exactly like create_tables.sql:58-59."""
    cat = _gold_catalog(spark, tmp_path)
    df = cat.read("gold_product_performance")
    spec = GOLD_SERVING_SPECS["gold_product_performance"]
    opts = create_table_options(df.schema, spec)
    nullable = {f.name for f in df.schema.fields if f.nullable}
    for key in spec.order_by:
        if key in nullable:
            assert f"ifNull({key}, " in opts
    assert "PARTITION BY" not in opts  # reference: no partition here


def test_ddl_rejects_unknown_sort_column(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(KeyError, match="not in mart schema"):
        clickhouse_ddl(df, ServingSpec("t", ("nope",)))


def test_sync_gold_marts_jdbc_roundtrip(spark, tmp_path):
    """The sync job lands every materialized mart over JDBC with
    generated per-table options and is idempotent on re-run
    (overwrite+truncate — the reference's claimed-but-unshipped
    behavior). Derby can't parse MergeTree clauses, so the test
    overrides createTableOptions; the generated clause itself is
    covered above."""
    cat = _gold_catalog(spark, tmp_path)
    url = f"jdbc:derby:{tmp_path}/serving;create=true"
    stats = sync_gold_marts(
        cat,
        url,
        driver=DERBY_DRIVER,
        options={"createTableOptions": ""},
    )
    assert stats["daily_sales_summary"] > 0
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "daily_sales_summary")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == stats["daily_sales_summary"]
    # idempotent re-sync: same counts, no duplication
    stats2 = sync_gold_marts(
        cat, url, driver=DERBY_DRIVER, options={"createTableOptions": ""}
    )
    assert stats2 == stats
    assert back.count() == stats["daily_sales_summary"]


def test_sync_propagates_empty_mart(spark, tmp_path):
    """Overwrite sync of a mart that became EMPTY truncates the serving
    table instead of leaving stale rows."""
    from data_lakehouse_spark.sources.writers import jdbc_sink

    cat = Catalog(spark, str(tmp_path / "w"))
    url = f"jdbc:derby:{tmp_path}/srv;create=true"
    full = spark.createDataFrame(
        [("2024-01-01", 5)], "sale_date string, total_orders int"
    )
    cat.create_table("gold_daily_sales_summary", full)
    sync_gold_marts(
        cat, url, driver=DERBY_DRIVER, options={"createTableOptions": ""}
    )
    # mart rebuilt empty upstream
    cat.overwrite("gold_daily_sales_summary", full.limit(0))
    sync_gold_marts(
        cat, url, driver=DERBY_DRIVER, options={"createTableOptions": ""}
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "daily_sales_summary")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == 0  # emptiness propagated
