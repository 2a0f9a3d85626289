"""Incremental high-watermark materializer (plans/incremental.py)."""

from __future__ import annotations

from data_lakehouse_spark.plans import IncrementalMaterializer


def test_first_run_then_increment(spark, tmp_path):
    target = str(tmp_path / "tbl")
    mat = IncrementalMaterializer(spark, target, watermark_col="v")

    batch1 = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    stats = mat.run(lambda: batch1)
    assert stats["mode"] == "create" and stats["watermark"] is None
    assert mat.read_target().count() == 2

    # second run: only rows above the watermark (v > 20) are appended
    batch2 = spark.createDataFrame(
        [(2, 20), (3, 30), (4, 40)], "id long, v long"
    )
    stats = mat.run(lambda: batch2)
    assert stats["mode"] == "append" and stats["watermark"] == 20
    rows = {(r["id"], r["v"]) for r in mat.read_target().collect()}
    assert rows == {(1, 10), (2, 20), (3, 30), (4, 40)}


def test_dedup_on_write_fixes_inert_unique_key(spark, tmp_path):
    """SURVEY.md §4 quirk #4: unique_key on append strategy is inert in
    the reference; dedup_on_write=True anti-joins existing keys away."""
    target = str(tmp_path / "tbl2")
    mat = IncrementalMaterializer(
        spark, target, watermark_col="v", unique_key="id", dedup_on_write=True
    )
    mat.run(lambda: spark.createDataFrame([(1, 10)], "id long, v long"))
    # id=1 arrives again with a NEWER watermark — plain append would dup it
    mat.run(lambda: spark.createDataFrame([(1, 99), (2, 50)], "id long, v long"))
    rows = sorted((r["id"], r["v"]) for r in mat.read_target().collect())
    assert rows == [(1, 10), (2, 50)]


def test_merge_upsert_updates_and_inserts(spark):
    from data_lakehouse_spark.plans.incremental import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    out = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}
