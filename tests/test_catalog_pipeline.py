"""Catalog (versioned tables, schema evolution, time travel) and the
medallion pipeline end-to-end."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.pipeline import MedallionPipeline


def _catalog(spark, tmp_path) -> Catalog:
    return Catalog(spark, str(tmp_path / "warehouse"))


def test_create_append_time_travel(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1, "a")], "id long, s string"))
    cat.append("t", spark.createDataFrame([(2, "b")], "id long, s string"))
    assert cat.read("t").count() == 2
    assert cat.read("t", version=0).count() == 1  # VERSION AS OF
    snaps = cat.snapshots("t").collect()
    assert [r["operation"] for r in snaps] == ["create", "append"]


def test_overwrite_keeps_history(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    cat.overwrite("t", spark.createDataFrame([(9,), (8,)], "id long"))
    assert cat.read("t").count() == 2
    assert [r["id"] for r in cat.read("t", version=0).collect()] == [1]


def test_add_column_without_rewrite(spark, tmp_path):
    """Reference semantics (schema_add_column.py / schema_verify.py):
    old rows read back NULL in the new column; idempotent DDL."""
    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "ev", spark.createDataFrame([(1, "card")], "id long, pay string")
    )
    cat.add_column("ev", "payment_method", "string", comment="added later")
    cat.add_column("ev", "payment_method", "string")  # idempotent no-op
    cols = [d["col_name"] for d in cat.describe("ev")]
    assert cols == ["id", "pay", "payment_method"]
    old = cat.read("ev").collect()
    assert old[0]["payment_method"] is None
    # new writes carry the column; old rows stay NULL
    cat.append(
        "ev",
        spark.createDataFrame(
            [(2, "card", "paypal")], "id long, pay string, payment_method string"
        ),
    )
    rows = {r["id"]: r["payment_method"] for r in cat.read("ev").collect()}
    assert rows == {1: None, 2: "paypal"}
    # only one schema-change commit + no data rewrite for it
    ops = [r["operation"] for r in cat.snapshots("ev").collect()]
    assert ops == ["create", "add_column", "append"]


def test_partitioned_create(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    df = spark.createDataFrame([(1, "2024-01-01"), (2, "2024-01-02")], "id long, d string")
    cat.create_table("p", df, partition_by=["d"])
    assert cat.read("p").count() == 2
    assert set(cat.read("p").columns) == {"id", "d"}


EVENTS = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _batch(ids, day, typ="purchase"):
    return [
        (i, dt.datetime(2024, 1, day, 10 + (i % 5)), i % 3 + 1, typ, 10.0 * i, '{"k": 1}')
        for i in ids
    ]


def test_medallion_end_to_end_incremental(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    pipe = MedallionPipeline(spark, cat, cart_type="cart", as_of_date="2024-02-01")

    # batch 1
    raw1 = spark.createDataFrame(_batch(range(1, 6), 1), EVENTS)
    stats1 = pipe.run(raw1, "batch1.parquet")
    assert stats1["silver"]["mode"] == "create"
    assert all(v == 0 for v in stats1["silver_checks"].values())
    n1 = cat.read("silver_events").count()
    assert n1 == 5

    # batch 2 arrives later — silver must only append the new rows
    raw2 = spark.createDataFrame(_batch(range(6, 9), 2, "view"), EVENTS)
    stats2 = pipe.run(raw2, "batch2.parquet")
    assert stats2["silver"]["mode"] == "append"
    assert cat.read("silver_events").count() == 8
    # re-running with no new data must not duplicate
    stats3 = pipe.ingest_bronze(
        spark.createDataFrame([], EVENTS), "empty.parquet"
    )
    pipe.build_silver()
    assert cat.read("silver_events").count() == 8

    # gold marts materialized and queryable
    assert cat.read("gold_daily_sales_summary").count() == 2
    daily = {
        r["sale_date"].isoformat(): r["total_orders"]
        for r in cat.read("gold_daily_sales_summary").collect()
    }
    assert daily == {"2024-01-01": 5, "2024-01-02": 0}

    # verification battery runs
    v = pipe.verify_bronze()
    assert v["total"].first()["n"] == 8
