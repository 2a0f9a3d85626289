"""Incremental high-watermark materializer (plans/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_scd2_merge_history_and_idempotence(spark):
    """Kimball SCD2: changed keys close + reopen, new keys insert,
    unchanged keys are no-ops (so re-applying a batch is idempotent),
    history rows pass through untouched."""
    import datetime as dt

    from data_lakehouse_spark.plans.incremental import scd2_merge

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    dim = spark.createDataFrame(
        [
            # cust 1: one closed historical row + a current row
            (1, "bronze", t0, t1, False),
            (1, "silver", t1, None, True),
            # cust 2: current only
            (2, "gold", t0, None, True),
        ],
        "cust_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    t2 = dt.datetime(2024, 3, 1)
    updates = spark.createDataFrame(
        [
            (1, "gold", t2),     # changed -> close + reopen
            (2, "gold", t2),     # unchanged -> no-op
            (3, "bronze", t2),   # new key -> insert
        ],
        "cust_id long, tier string, updated_at timestamp",
    )

    merged = scd2_merge(
        dim, updates, keys=["cust_id"], tracked=["tier"], ts_col="updated_at"
    )
    rows = {
        (r["cust_id"], r["tier"], r["is_current"]): r for r in merged.collect()
    }
    assert len(rows) == 5
    # cust 1: bronze hist, silver closed at t2, gold current from t2
    assert rows[(1, "silver", False)]["valid_to"] == t2
    assert rows[(1, "gold", True)]["valid_from"] == t2
    assert rows[(1, "gold", True)]["valid_to"] is None
    # cust 2 untouched current
    assert rows[(2, "gold", True)]["valid_from"] == t0
    # cust 3 inserted
    assert rows[(3, "bronze", True)]["valid_from"] == t2

    # idempotent: the same batch again changes nothing
    again = scd2_merge(
        merged, updates, keys=["cust_id"], tracked=["tier"], ts_col="updated_at"
    )
    assert again.count() == 5
    assert (
        again.filter(F.col("is_current")).count()
        == merged.filter(F.col("is_current")).count()
    )


def test_scd2_merge_latest_update_wins_within_batch(spark):
    import datetime as dt

    from data_lakehouse_spark.plans.incremental import scd2_merge

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(1, "a", t0, None, True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "b", dt.datetime(2024, 2, 1)),
            (1, "c", dt.datetime(2024, 3, 1)),  # newest wins
        ],
        "k long, v string, updated_at timestamp",
    )
    out = scd2_merge(dim, updates, keys=["k"], tracked=["v"], ts_col="updated_at")
    cur = out.filter(F.col("is_current")).collect()
    assert len(cur) == 1 and cur[0]["v"] == "c"
