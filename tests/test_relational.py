"""Relational operator surface: joins, top-k, unions, windows, sessions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import relational
from data_lakehouse_spark.sources.readers import load_tables


def test_semi_anti_partition(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "orders"], register_views=False)
    keys = t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct()
    semi = relational.semi_join(t["customer"], keys, ["c_custkey"]).count()
    anti = relational.anti_join(t["customer"], keys, ["c_custkey"]).count()
    assert semi + anti == t["customer"].count()


def test_top_k_matches_sort(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"], register_views=False)["orders"]
    top = relational.top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5)
    got = [r["o_orderkey"] for r in top.collect()]
    want = [
        r["o_orderkey"]
        for r in o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).collect()[:5]
    ]
    assert got == want


def test_union_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["region", "nation"], register_views=False)
    rows = {r["table_name"]: r["row_count"] for r in relational.union_counts(t).collect()}
    assert rows == {"region": t["region"].count(), "nation": t["nation"].count()}


def test_share_of_total_sums_to_100(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"], register_views=False)["orders"]
    out = relational.share_of_total(o, "o_orderstatus").collect()
    assert abs(sum(r["pct"] for r in out) - 100.0) < 0.1


def test_watermark_filter(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(10)], "id long, v long")
    target = spark.createDataFrame([(3, 30)], "id long, v long")
    out = relational.watermark_filter(df, target, "v", F.col("v"))
    assert out.count() == 6  # v > 30
    empty = spark.createDataFrame([], "id long, v long")
    assert relational.watermark_filter(df, empty, "v", F.col("v")).count() == 10


def test_sessionize_gap(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 7),
        (2, base + dt.timedelta(minutes=10), 7),   # same session
        (3, base + dt.timedelta(minutes=50), 7),   # gap 40min → new session
        (4, base, 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_timestamp timestamp, user_id long")
    out = relational.sessionize(df, gap_seconds=1800)
    per_user = (
        out.groupBy("user_id")
        .agg(F.countDistinct("session_idx").alias("n"))
        .collect()
    )
    n = {r["user_id"]: r["n"] for r in per_user}
    assert n == {7: 2, 8: 1}
    # session_idx is 0-based
    assert out.agg(F.min("session_idx")).first()[0] == 0


def test_rollup_has_grand_total(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"], register_views=False)["orders"]
    out = relational.rollup_agg(
        o, ["o_orderstatus"], [F.count("*").alias("n")]
    ).collect()
    grand = [r for r in out if r["o_orderstatus"] is None]
    assert len(grand) == 1 and grand[0]["n"] == o.count()


def test_tumbling_window_agg(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 15)),
        (2, dt.datetime(2024, 1, 1, 10, 45)),
        (3, dt.datetime(2024, 1, 1, 11, 5)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = relational.tumbling_window_agg(
        df, "ts", "1 hour", [F.count("*").alias("n")]
    ).collect()
    got = {r["window_start"].isoformat(): r["n"] for r in out}
    assert got == {"2024-01-01T10:00:00": 2, "2024-01-01T11:00:00": 1}


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), "p1"),
            (1, dt.datetime(2024, 1, 1, 12, 0), "p2"),
            (2, dt.datetime(2024, 1, 1, 9, 0), "p3"),   # before any right row
        ],
        "k long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9, 30), 100.0),
            (1, dt.datetime(2024, 1, 1, 11, 0), 200.0),
            (2, dt.datetime(2024, 1, 1, 9, 30), 300.0),
        ],
        "k long, rts timestamp, val double",
    )
    out = {
        r["tag"]: (r["asof_rts"], r["asof_val"])
        for r in relational.asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_value_cols=["val"],
        ).collect()
    }
    assert out["p1"] == (dt.datetime(2024, 1, 1, 9, 30), 100.0)
    assert out["p2"] == (dt.datetime(2024, 1, 1, 11, 0), 200.0)
    assert out["p3"] == (None, None)


def test_asof_join_inclusive_tie(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0))], "k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0), 7.0)],
        "k long, rts timestamp, val double",
    )
    row = relational.asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_value_cols=["val"],
    ).first()
    assert row["asof_val"] == 7.0  # right row at the same instant matches


def test_asof_join_carries_whole_row(spark):
    # a later right row with a NULL value column must NOT mix with an
    # earlier row's non-NULL value
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0))], "k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), 5.0),
            (1, dt.datetime(2024, 1, 1, 11, 0), None),
        ],
        "k long, rts timestamp, val double",
    )
    row = relational.asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_value_cols=["val"],
    ).first()
    assert row["asof_rts"] == dt.datetime(2024, 1, 1, 11, 0)
    assert row["asof_val"] is None


def test_pivot_agg_fixed_domain(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")], "g string, t string"
    )
    out = relational.pivot_agg(
        df, ["g"], "t", ["x", "y"], F.count(F.lit(1))
    )
    assert set(out.columns) == {"g", "x", "y"}  # 'z' excluded by the domain
    got = {r["g"]: (r["x"], r["y"]) for r in out.collect()}
    assert got["a"] == (2, 1)
    assert got["b"] == (None, None)


def test_cube_agg_combinations(spark):
    df = spark.createDataFrame([("a", "p", 1), ("b", "q", 2)], "x string, y string, v long")
    out = relational.cube_agg(df, ["x", "y"], [F.count("*").alias("n")]).collect()
    # cube over 2 distinct keys: 4 grouping sets -> (a,p),(b,q),(a,*),(b,*),(*,p),(*,q),(*,*)
    assert len(out) == 7


def test_keep_latest_dedup_preserves_max_timestamp(spark):
    """Folding the P9 watermark from the RAW projection is equivalent to
    folding it from deduped silver: keep-latest retains each key's max
    order timestamp, hence the global max (q_watermark_incremental)."""
    from data_lakehouse_spark.operators.silver import silver_events

    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        # one logical event observed twice (same uid parts, later ts wins)
        (1, t0, 7, "signup", 1.0, None),
        (2, t0 + dt.timedelta(hours=2), 7, "signup", 1.0, None),
        (3, t0 + dt.timedelta(hours=1), 8, "signup", 2.0, None),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    raw = spark.createDataFrame(rows, schema)
    silver = silver_events(raw)
    raw_max = raw.agg(F.max("ts")).first()[0]
    silver_max = silver.agg(F.max("event_timestamp")).first()[0]
    assert raw_max == silver_max


def test_range_join_half_open_bounds(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 50.0), (3, 99.9), (4, 100.0), (5, 250.0)],
        "id long, v double",
    )
    ranges = spark.createDataFrame(
        [("lo", 0.0, 100.0), ("hi", 100.0, 200.0)],
        "band string, lo double, hi double",
    )
    out = relational.range_join(
        facts, ranges, fact_col="v", start_col="lo", end_col="hi"
    )
    got = {(r["id"], r["band"]) for r in out.collect()}
    # half-open: 100.0 lands in 'hi' only; 250 matches nothing
    assert got == {(1, "lo"), (2, "lo"), (3, "lo"), (4, "hi")}
    # broadcast hint survives into the plan (nested loop over broadcast)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, label string"
    )
    plain = {(r["k"], r["payload"], r["label"])
             for r in left.join(right, "k").collect()}
    salted = relational.salted_join(left, right, ["k"], salt=8)
    got = {(r["k"], r["payload"], r["label"]) for r in salted.collect()}
    assert got == plain and len(got) == 1000
    # the shuffle key carries the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_asof_forward_and_tolerance(spark):
    """merge_asof parity: forward picks the smallest right_ts >= left_ts
    (equality matches); tolerance NULLs matches beyond the bound without
    dropping left rows."""
    import datetime as dt

    from data_lakehouse_spark.operators import relational

    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0)), (1, T(2024, 1, 1, 12, 0, 0)),
         (2, T(2024, 1, 1, 9, 0, 0))],
        ["k", "lts"],
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0), "at"),
         (1, T(2024, 1, 1, 11, 0, 0), "mid"),
         (2, T(2024, 1, 2, 9, 0, 1), "late")],
        ["k", "rts", "tag"],
    )
    out = {
        (r["k"], r["lts"]): r
        for r in relational.asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_value_cols=["tag"], direction="forward",
        ).collect()
    }
    assert out[(1, T(2024, 1, 1, 10))]["asof_tag"] == "at"  # equality matches
    assert out[(1, T(2024, 1, 1, 12))]["asof_tag"] is None  # nothing after
    assert out[(2, T(2024, 1, 1, 9))]["asof_tag"] == "late"

    tol = {
        (r["k"], r["lts"]): r
        for r in relational.asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_value_cols=["tag"], direction="forward",
            tolerance_seconds=3600.0,
        ).collect()
    }
    # k=2's only following view is >24h away: masked, row kept
    assert tol[(2, T(2024, 1, 1, 9))]["asof_tag"] is None
    assert tol[(1, T(2024, 1, 1, 10))]["asof_tag"] == "at"


def test_global_order_index_matches_global_window(spark):
    """The distributed total-order helper (range exchange + local ranks
    + bounded offset table) must be BIT-IDENTICAL to the global-window
    formulation it replaces: row_number, inclusive running sum, and
    exact NTILE(k) for several k — including ties on the metric (broken
    by id), skewed values, and n < k."""
    import random

    from pyspark.sql.window import Window

    random.seed(11)
    # heavy ties: metric drawn from 8 values over 4001 rows (the RFM
    # frequency-skew shape a range partitioner must split across tasks)
    rows = [
        (i, random.choice([1, 1, 1, 1, 2, 3, 5, 50]), float(i % 97) / 7)
        for i in range(4001)
    ]
    df = spark.createDataFrame(rows, "id long, m long, v double").repartition(7)
    order = [F.col("m").desc(), F.col("id").asc()]
    out, n, grand, _cached = relational.global_order_index(
        df, order, running_sum_col="v"
    )
    assert n == 4001
    assert abs(grand - sum(r[2] for r in rows)) < 1e-6

    w = Window.orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(run).alias("cum"),
        *[F.ntile(k).over(w).alias(f"t{k}") for k in (3, 5, 10)],
    )
    got = out.select(
        "id",
        F.col("_rn").alias("rn"),
        F.col("_cum").alias("cum"),
        *[
            relational.ntile_from_row_number(F.col("_rn"), n, k).alias(f"t{k}")
            for k in (3, 5, 10)
        ],
    )
    joined = got.alias("g").join(ref.alias("r"), "id")
    assert joined.filter("g.rn <> r.rn").count() == 0
    assert joined.filter("abs(g.cum - r.cum) > 1e-9").count() == 0
    for k in (3, 5, 10):
        assert joined.filter(f"g.t{k} <> r.t{k}").count() == 0

    # the point of the helper: no single-partition stage in its plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    # n < k edge: NTILE gives row i bucket i
    small = spark.createDataFrame([(1,), (2,)], "id long")
    o2, n2, _, _ = relational.global_order_index(small, [F.col("id").asc()])
    got2 = {
        r["id"]: r["t"]
        for r in o2.select(
            "id", relational.ntile_from_row_number(F.col("_rn"), n2, 5).alias("t")
        ).collect()
    }
    assert got2 == {1: 1, 2: 2}

    # empty input: no rows, no crash
    empty = spark.createDataFrame([], "id long, v double")
    o3, n3, g3, _ = relational.global_order_index(
        empty, [F.col("id").asc()], running_sum_col="v"
    )
    assert n3 == 0 and o3.count() == 0
