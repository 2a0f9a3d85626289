"""CDC-driven incremental aggregate maintenance (plans/cdc.py): the
mart must equal a full recompute after ANY mix of source DML, while
folding only the change feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.plans.cdc import CdcAggregate


def _full(cat: Catalog, source: str) -> dict:
    rows = (
        cat.read(source)
        .groupBy("day")
        .agg(
            F.sum(F.col("amount").cast("double")).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
        )
        .collect()
    )
    return {r["day"]: (r["revenue"], r["n"]) for r in rows}


def _mart(cat: Catalog, target: str) -> dict:
    return {
        r["day"]: (r["revenue"], r["n"])
        for r in cat.read(target).collect()
    }


def test_cdc_aggregate_matches_full_recompute(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "w"))
    src = spark.createDataFrame(
        [("d1", "view", 10.0), ("d1", "buy", 20.0), ("d2", "buy", 5.0)],
        ["day", "typ", "amount"],
    )
    cat.create_table("ev", src)  # v0
    agg = CdcAggregate(
        cat, "ev", "mart", ["day"],
        {"revenue": ("sum", "amount"), "n": ("count", None)},
    )
    assert agg.refresh()["mode"] == "full"
    assert _mart(cat, "mart") == _full(cat, "ev")

    # append + MOR delete + COW update, then one incremental refresh
    cat.append("ev", spark.createDataFrame(
        [("d2", "view", 7.0), ("d3", "buy", 100.0)],
        ["day", "typ", "amount"],
    ))
    cat.delete_where("ev", "amount = 20.0", mode="mor")
    cat.update_where("ev", "day = 'd2' and typ = 'buy'",
                     {"amount": "amount + 1"})
    res = agg.refresh()
    assert res["mode"] == "incremental"
    assert _mart(cat, "mart") == _full(cat, "ev")

    # group retirement: delete ALL of d1 -> its mart row disappears
    cat.delete_where("ev", "day = 'd1'")
    agg.refresh()
    m = _mart(cat, "mart")
    assert "d1" not in m and m == _full(cat, "ev")

    # no-op refresh when the source hasn't moved
    assert agg.refresh()["mode"] == "noop"


def test_cdc_refresh_reads_only_changed_dirs(spark, tmp_path):
    """The incremental path's scan set is the changed dirs, not the
    whole source: the v0 dir must not appear in the merge plan."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table("ev", spark.createDataFrame(
        [("d1", 1.0)], ["day", "amount"]
    ))  # v0
    agg = CdcAggregate(cat, "ev", "mart", ["day"],
                       {"revenue": ("sum", "amount")})
    agg.refresh()
    cat.append("ev", spark.createDataFrame(
        [("d2", 2.0)], ["day", "amount"]
    ))  # v1
    changes = cat.table_changes("ev", 0, 1)
    scanned = changes.inputFiles()
    assert scanned and all("/v00001/" in f for f in scanned)
    agg.refresh()
    assert {
        r["day"]: r["revenue"] for r in cat.read("mart").collect()
    } == {"d1": 1.0, "d2": 2.0}


def test_streaming_intake_feeds_cdc_mart(spark, tmp_path):
    """End-to-end: events stream into the catalog via the exactly-once
    sink; CdcAggregate.refresh() folds each landed batch into the mart
    from the change feed — the full streaming->lakehouse->incremental-
    serving path with no full recompute anywhere."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_lakehouse_spark.streaming import stream_to_catalog

    schema = StructType([
        StructField("day", StringType()),
        StructField("user_id", LongType()),
        StructField("amount", DoubleType()),
    ])
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("d1", 1, 10.0), ("d1", 2, 5.0), ("d2", 1, 3.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cat = Catalog(spark, str(tmp_path / "cat"))
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_to_catalog(
        stream, cat, "ev", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    agg = CdcAggregate(cat, "ev", "mart", ["day"],
                       {"revenue": ("sum", "amount"),
                        "n": ("count", None)})
    agg.refresh()
    assert _mart(cat, "mart") == _full(cat, "ev")

    # a second micro-batch lands; only the delta is folded
    spark.createDataFrame([("d2", 3, 7.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = stream_to_catalog(
        stream, cat, "ev", checkpoint=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    res = agg.refresh()
    assert res["mode"] == "incremental"
    assert _mart(cat, "mart") == _full(cat, "ev")
