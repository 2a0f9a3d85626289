"""CDC-driven incremental aggregate maintenance (plans/cdc.py): the
mart must equal a full recompute after ANY mix of source DML, while
folding only the change feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.plans.cdc import CdcAggregate, CdcQuantile


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


def test_cdc_count_distinct_matches_full_recompute(spark, tmp_path):
    """Exact COUNT DISTINCT maintenance via the support table: deletes
    must decrement only when the LAST occurrence of a value dies, NULLs
    never count, retired groups drop, and every refresh equals a full
    recompute."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "ev",
        spark.createDataFrame(
            [
                ("d1", 1, 10.0),
                ("d1", 1, 20.0),  # duplicate user on d1
                ("d1", 2, 5.0),
                ("d2", 1, 3.0),
                ("d2", None, 4.0),  # NULL user: never counted
            ],
            "day string, user_id long, amount double",
        ),
    )
    agg = CdcAggregate(
        cat, "ev", "mart", ["day"],
        {
            "revenue": ("sum", "amount"),
            "n": ("count", None),
            "users": ("count_distinct", "user_id"),
        },
    )

    def full() -> dict:
        rows = (
            cat.read("ev")
            .groupBy("day")
            .agg(
                F.sum(F.col("amount").cast("double")).alias("revenue"),
                F.count("*").cast("bigint").alias("n"),
                F.countDistinct("user_id").cast("bigint").alias("users"),
            )
            .collect()
        )
        return {r["day"]: (r["revenue"], r["n"], r["users"]) for r in rows}

    def mart() -> dict:
        return {
            r["day"]: (r["revenue"], r["n"], r["users"])
            for r in cat.read("mart").collect()
        }

    assert agg.refresh()["mode"] == "full"
    assert mart() == full() == {"d1": (35.0, 3, 2), "d2": (7.0, 2, 1)}

    # delete ONE of user 1's two d1 rows: users must NOT drop (support
    # table still holds a live occurrence)
    cat.delete_where("ev", "day = 'd1' and amount = 20.0", mode="mor")
    assert agg.refresh()["mode"] == "incremental"
    assert mart() == full()
    assert mart()["d1"][2] == 2

    # delete the LAST occurrence: now users drops to 1
    cat.delete_where("ev", "day = 'd1' and amount = 10.0", mode="mor")
    agg.refresh()
    assert mart() == full()
    assert mart()["d1"][2] == 1

    # append a new group with ONLY a NULL distinct value -> users = 0
    cat.append(
        "ev",
        spark.createDataFrame(
            [("d3", None, 9.0)], "day string, user_id long, amount double"
        ),
    )
    agg.refresh()
    assert mart() == full()
    assert mart()["d3"][2] == 0

    # update moves a user between days: both sides re-derive exactly
    cat.update_where("ev", "day = 'd2' and user_id = 1", {"day": "'d3'"})
    agg.refresh()
    assert mart() == full()

    # group retirement cleans the mart row
    cat.delete_where("ev", "day = 'd1'")
    agg.refresh()
    m = mart()
    assert "d1" not in m and m == full()
    # support table's d1 rows are gone too (no zombie values)
    assert (
        cat.read("mart__dv_users").filter(F.col("day") == "d1").count() == 0
    )


def test_cdc_min_max_survive_extreme_deletion(spark, tmp_path):
    """MIN/MAX are not algebraic under deletes: removing the current
    extreme must surface the runner-up (support-table re-derivation),
    and a group with no live values lands on NULL, not a stale extreme."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "ev",
        spark.createDataFrame(
            [
                ("d1", 10.0),
                ("d1", 50.0),
                ("d1", 90.0),
                ("d2", 5.0),
            ],
            "day string, amount double",
        ),
    )
    agg = CdcAggregate(
        cat, "ev", "mart", ["day"],
        {
            "lo": ("min", "amount"),
            "hi": ("max", "amount"),
            "n": ("count", None),
        },
    )

    def full() -> dict:
        rows = (
            cat.read("ev")
            .groupBy("day")
            .agg(
                F.min("amount").alias("lo"),
                F.max("amount").alias("hi"),
                F.count("*").cast("bigint").alias("n"),
            )
            .collect()
        )
        return {r["day"]: (r["lo"], r["hi"], r["n"]) for r in rows}

    def mart() -> dict:
        return {
            r["day"]: (r["lo"], r["hi"], r["n"])
            for r in cat.read("mart").collect()
        }

    agg.refresh()
    assert mart() == full() == {"d1": (10.0, 90.0, 3), "d2": (5.0, 5.0, 1)}

    # delete the current MAX: the runner-up surfaces
    cat.delete_where("ev", "amount = 90.0", mode="mor")
    agg.refresh()
    assert mart() == full()
    assert mart()["d1"] == (10.0, 50.0, 2)

    # delete the current MIN via COW update (moves it up)
    cat.update_where("ev", "amount = 10.0", {"amount": "60.0"})
    agg.refresh()
    assert mart() == full()
    assert mart()["d1"] == (50.0, 60.0, 2)

    # duplicate extremes: deleting one occurrence keeps the extreme
    cat.append(
        "ev", spark.createDataFrame([("d2", 5.0)], "day string, amount double")
    )
    agg.refresh()
    assert mart()["d2"] == (5.0, 5.0, 2)
    cat.delete_where("ev", "day = 'd2' and amount = 5.0", mode="mor")
    # both occurrences died (predicate matches both) -> group retires
    agg.refresh()
    m = mart()
    assert "d2" not in m and m == full()

    # a NULL-amount-only group: count lives, extremes are NULL
    cat.append(
        "ev",
        spark.createDataFrame(
            [("d3", None)], "day string, amount double"
        ),
    )
    agg.refresh()
    assert mart() == full()
    assert mart()["d3"] == (None, None, 1)


def test_cdc_count_distinct_crash_replay_idempotent(spark, tmp_path):
    """Crash between the support commit and the mart commit: the replay
    must not double-fold the change feed into the support table."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "ev",
        spark.createDataFrame(
            [("d1", 1), ("d1", 2)], "day string, user_id long"
        ),
    )
    agg = CdcAggregate(
        cat, "ev", "mart", ["day"], {"users": ("count_distinct", "user_id")}
    )
    agg.refresh()
    cat.append(
        "ev", spark.createDataFrame([("d1", 3)], "day string, user_id long")
    )

    # simulate the crash: fold the support table forward, then "die"
    # before the mart commit by calling only the internal step
    signed = (
        cat.table_changes("ev", 0, 1)
        .withColumn(
            "_sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        .drop("_change_type")
    )
    agg._refresh_support("users", "user_id", signed, 0, 1)
    support_after_crash = sorted(
        (r["day"], r["_dv"], r["_dv_n"])
        for r in cat.read("mart__dv_users").collect()
    )

    # the real refresh replays the same span: support must be unchanged
    # (no double-fold) and the mart must land on the exact count
    assert agg.refresh()["mode"] == "incremental"
    assert (
        sorted(
            (r["day"], r["_dv"], r["_dv_n"])
            for r in cat.read("mart__dv_users").collect()
        )
        == support_after_crash
    )
    assert [
        (r["day"], r["users"]) for r in cat.read("mart").collect()
    ] == [("d1", 3)]


def test_cdc_crash_replay_with_source_advance(spark, tmp_path):
    """Crash between the support commit and the mart commit, AND the
    source advances before the retry: the retry's fold must cover only
    the span the support hasn't seen — re-folding the mart's full feed
    would re-apply the already-folded prefix and permanently corrupt
    the live-occurrence counts."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "ev",
        spark.createDataFrame(
            [("d1", 1), ("d1", 2)], "day string, user_id long"
        ),
    )  # v0
    agg = CdcAggregate(
        cat, "ev", "mart", ["day"], {"users": ("count_distinct", "user_id")}
    )
    agg.refresh()  # mart + support at v0
    cat.append(
        "ev", spark.createDataFrame([("d1", 2)], "day string, user_id long")
    )  # v1: duplicate occurrence of user 2

    # crashed refresh: support folds (0, 1] (user 2 count -> 2), mart
    # stays at v0
    agg._refresh_support(
        "users", "user_id", agg._signed_changes(0, 1), 0, 1
    )

    # source advances before the retry
    cat.append(
        "ev", spark.createDataFrame([("d1", 3)], "day string, user_id long")
    )  # v2

    assert agg.refresh()["mode"] == "incremental"
    support = {
        (r["day"], r["_dv"]): r["_dv_n"]
        for r in cat.read("mart__dv_users").collect()
    }
    # user 2 has exactly 2 live occurrences — a double-fold of (0, 1]
    # would have left 3
    assert support[("d1", 2)] == 2
    assert [
        (r["day"], r["users"]) for r in cat.read("mart").collect()
    ] == [("d1", 3)]

    # and the corruption would persist: delete the duplicate occurrence
    # and both the support and the distinct count must still be exact
    cat.delete_where("ev", "user_id = 2")
    agg.refresh()
    assert [
        (r["day"], r["users"]) for r in cat.read("mart").collect()
    ] == [("d1", 2)]


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


def _exact_quantile_window(cat, source, day, q, eps):
    """[lo, hi] = exact values at ranks (q-eps, q+eps) of the group's
    live distribution — the KLL accuracy contract window."""
    vals = sorted(
        r["amount"]
        for r in cat.read(source).filter(F.col("day") == day).collect()
    )
    n = len(vals)
    lo_i = max(0, int((q - eps) * n) - 1)
    hi_i = min(n - 1, int((q + eps) * n) + 1)
    return vals[lo_i], vals[hi_i]


def test_cdc_quantile_within_rank_error(spark, tmp_path):
    """Approximate percentile maintenance: after appends AND deletes,
    every reported quantile lies within KLL's rank-error window of the
    exact live distribution, delete-touched groups are rebuilt, and
    fully-deleted groups retire."""
    cat = Catalog(spark, str(tmp_path / "w"))
    rows = [("d1", float(i)) for i in range(1, 1001)] + [
        ("d2", float(10 * i)) for i in range(1, 101)
    ]
    cat.create_table(
        "ev", spark.createDataFrame(rows, "day string, amount double")
    )
    cq = CdcQuantile(
        cat, "ev", "qmart", ["day"], "amount",
        {"p50": 0.5, "p95": 0.95},
    )
    assert cq.refresh()["mode"] == "full"

    eps = 0.03  # ~1.65% rank error at k=200, with slack
    m = {r["day"]: r for r in cat.read("qmart").collect()}
    for day in ("d1", "d2"):
        for out, q in (("p50", 0.5), ("p95", 0.95)):
            lo, hi = _exact_quantile_window(cat, "ev", day, q, eps)
            assert lo <= m[day][out] <= hi, (day, out, m[day][out], lo, hi)

    # insert-only refresh: pure sketch merge, no rebuild
    cat.append(
        "ev",
        spark.createDataFrame(
            [("d1", float(2000 + i)) for i in range(500)],
            "day string, amount double",
        ),
    )
    res = cq.refresh()
    assert res["mode"] == "incremental" and res["rebuilt_groups"] == 0

    # delete the top half of d1: its sketch must be rebuilt, not stale
    cat.delete_where("ev", "day = 'd1' and amount > 500")
    res = cq.refresh()
    assert res["rebuilt_groups"] == 1
    m = {r["day"]: r for r in cat.read("qmart").collect()}
    for out, q in (("p50", 0.5), ("p95", 0.95)):
        lo, hi = _exact_quantile_window(cat, "ev", "d1", q, eps)
        assert lo <= m["d1"][out] <= hi, (out, m["d1"][out], lo, hi)
    # a stale (un-rebuilt) sketch would still report ~p95 ≈ 2400
    assert m["d1"]["p95"] <= 501.0
    assert m["d1"]["n_rows"] == 500

    # group retirement: deleting ALL of d2 drops its mart row
    cat.delete_where("ev", "day = 'd2'")
    cq.refresh()
    assert sorted(r["day"] for r in cat.read("qmart").collect()) == ["d1"]

    assert cq.refresh()["mode"] == "noop"


def test_cdc_quantile_crash_replay(spark, tmp_path):
    """Crash between the support commit and the mart commit with source
    advance: the sketch must not double-fold the already-seen span
    (n_rows would overcount and the quantiles would skew)."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "ev",
        spark.createDataFrame(
            [("d1", float(i)) for i in range(100)], "day string, amount double"
        ),
    )
    cq = CdcQuantile(cat, "ev", "qmart", ["day"], "amount", {"p50": 0.5})
    cq.refresh()
    cat.append(
        "ev",
        spark.createDataFrame(
            [("d1", float(i)) for i in range(100, 200)],
            "day string, amount double",
        ),
    )  # v1
    # simulate the crashed refresh: support folds (0, 1], mart stays
    signed = cq._signed_changes(0, 1)
    inserts = signed.filter(F.col("_sign") == 1).drop("_sign")
    merged = (
        cat.read(cq._kll_table)
        .unionByName(cq._sketch(inserts))
        .groupBy("day")
        .agg(
            F.kll_merge_agg_double("_kll").alias("_kll"),
            F.sum("_n").cast("bigint").alias("_n"),
        )
    )
    cq._commit_support(merged, 1)
    # source advances before the retry
    cat.append(
        "ev",
        spark.createDataFrame(
            [("d1", float(i)) for i in range(200, 250)],
            "day string, amount double",
        ),
    )  # v2
    cq.refresh()
    m = cat.read("qmart").first()
    assert m["n_rows"] == 250  # double-fold would report 350


def test_upsert_cdc_atomic_batch_semantics(spark, tmp_path):
    """catalog.upsert_cdc — the Flink-CDC/Debezium sink shape: ONE
    atomic commit (version advances exactly once) applies an I/U/D
    batch via a same-commit equality delete + data dir; at-least-once
    replay of the same batch is key-idempotent; seq_col compacts
    multiple changes per key within a batch to the last image."""
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
            "id long, seg string, amt double",
        ),
    )
    v0 = cat.current_version("t")
    batch = spark.createDataFrame(
        [(2, "b2", 22.0, "U"), (3, None, None, "D"), (4, "d", 4.0, "I")],
        "id long, seg string, amt double, _op string",
    )
    out = cat.upsert_cdc("t", batch, ["id"])
    assert out["keys_deleted"] == 3 and out["rows_appended"] == 2
    assert cat.current_version("t") == v0 + 1  # ONE commit, atomic
    state = sorted((r["id"], r["seg"]) for r in cat.read("t").collect())
    assert state == [(1, "a"), (2, "b2"), (4, "d")]
    # at-least-once replay: the insert's key is delete-listed too, so
    # re-applying the identical batch does not duplicate anything
    cat.upsert_cdc("t", batch, ["id"])
    assert sorted(
        (r["id"], r["seg"]) for r in cat.read("t").collect()
    ) == state
    # within-batch compaction: U then D for one key (by offset) nets
    # to deleted; a later I for a fresh key lands
    cat.upsert_cdc(
        "t",
        spark.createDataFrame(
            [
                (1, "a9", 9.0, "U", 10),
                (1, None, None, "D", 11),
                (5, "e", 5.0, "I", 12),
            ],
            "id long, seg string, amt double, _op string, off long",
        ),
        ["id"],
        seq_col="off",
    )
    assert sorted((r["id"], r["seg"]) for r in cat.read("t").collect()) == [
        (2, "b2"), (4, "d"), (5, "e"),
    ]
    # row_count agrees with the merged view; fold clears delete files
    assert cat.row_count("t") == 3
    cat.rewrite_position_deletes("t")
    assert cat.row_count("t") == 3
    # op validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="I/U/D"):
        cat.upsert_cdc(
            "t",
            spark.createDataFrame(
                [(9, "x", 1.0, "upsert")],
                "id long, seg string, amt double, _op string",
            ),
            ["id"],
        )
    # NULL op must fail validation, not silently act as a delete
    with _pytest.raises(ValueError, match="I/U/D"):
        cat.upsert_cdc(
            "t",
            spark.createDataFrame(
                [(9, "x", 1.0, None)],
                "id long, seg string, amt double, _op string",
            ),
            ["id"],
        )
    # a key column absent from the table refuses (an inert delete
    # would silently duplicate every update)
    with _pytest.raises(ValueError, match="not in"):
        cat.upsert_cdc(
            "t",
            spark.createDataFrame(
                [(9, "x", 1.0, "I")],
                "Id long, seg string, amt double, _op string",
            ),
            ["Id"],
        )
