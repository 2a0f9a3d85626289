"""Experimentation operators (operators/experiments.py): A/B lift
statistics and within-session transition flows on crafted inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import experiments


def test_experiment_lift_two_proportion(spark):
    """Known counts → known rates, lift, and pooled z-score."""
    events = spark.createDataFrame(
        # control: users 1-4, converters 1,2; treat: users 5-8, conv 5,6,7
        [(u, "purchase") for u in (1, 2, 5, 6, 7)]
        + [(u, "view") for u in (1, 2, 3, 4, 5, 6, 7, 8)],
        "user_id long, event_type string",
    )
    assignments = spark.createDataFrame(
        [(u, "control") for u in (1, 2, 3, 4)]
        + [(u, "treat") for u in (5, 6, 7, 8)],
        "user_id long, variant string",
    )
    out = {
        r["variant"]: r
        for r in experiments.experiment_lift(
            events, assignments, success=F.col("event_type") == "purchase"
        ).collect()
    }
    assert out["control"]["users"] == 4
    assert out["control"]["converters"] == 2
    assert out["control"]["cvr_pct"] == 50.0
    assert out["control"]["lift_abs_pct"] == 0.0
    assert out["control"]["z_score"] == 0.0
    assert out["treat"]["cvr_pct"] == 75.0
    assert out["treat"]["lift_abs_pct"] == 25.0
    assert out["treat"]["lift_rel_pct"] == 50.0
    # pooled: p=5/8, se=sqrt(p(1-p)(1/4+1/4)), z=(0.75-0.5)/se
    se = math.sqrt((5 / 8) * (3 / 8) * 0.5)
    assert abs(out["treat"]["z_score"] - 0.25 / se) < 1e-3


def test_experiment_lift_unexposed_user_counts_as_nonconverter(spark):
    """An assigned user with NO events is a non-converter, not a drop."""
    events = spark.createDataFrame(
        [(1, "purchase")], "user_id long, event_type string"
    )
    assignments = spark.createDataFrame(
        [(1, "control"), (2, "control")], "user_id long, variant string"
    )
    r = experiments.experiment_lift(
        events, assignments, success=F.col("event_type") == "purchase"
    ).collect()[0]
    assert r["users"] == 2 and r["converters"] == 1
    assert r["cvr_pct"] == 50.0


def test_session_transitions_with_exit_state(spark):
    """Transitions respect session boundaries: the last event of a
    session goes to 'exit', not to the next session's first event."""
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # user 1 session A: view -> cart -> exit
        (1, ts("2024-01-01 10:00:00"), "view", "a1"),
        (1, ts("2024-01-01 10:10:00"), "cart", "a2"),
        # gap > 30 min → session B: view -> exit
        (1, ts("2024-01-01 12:00:00"), "view", "a3"),
        # user 2: single-event session
        (2, ts("2024-01-01 09:00:00"), "purchase", "b1"),
    ]
    silver = spark.createDataFrame(
        rows,
        "user_id long, event_timestamp timestamp, event_type string, "
        "event_unique_id string",
    )
    out = {
        (r["from_type"], r["to_type"]): r
        for r in experiments.session_transitions(silver).collect()
    }
    assert out[("view", "cart")]["n_transitions"] == 1
    assert out[("cart", "exit")]["n_transitions"] == 1
    assert out[("view", "exit")]["n_transitions"] == 1
    assert out[("purchase", "exit")]["n_transitions"] == 1
    assert ("cart", "view") not in out  # cross-session edge suppressed
    # row-normalized shares: view row splits 50/50
    assert out[("view", "cart")]["share_pct"] == 50.0
    assert out[("view", "exit")]["share_pct"] == 50.0
    # out-degree equals event count (exit is absorbing)
    assert sum(r["n_transitions"] for r in out.values()) == 4


def test_session_transitions_exact_gap_boundary(spark):
    """A gap of exactly gap_seconds does NOT start a new session
    (strict > on integer microseconds — no float truncation)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), "view", "a"),
        (1, dt.datetime(2024, 1, 1, 10, 30, 0), "cart", "b"),
        (1, dt.datetime(2024, 1, 1, 11, 0, 0, 1), "purchase", "c"),
    ]
    silver = spark.createDataFrame(
        rows,
        "user_id long, event_timestamp timestamp, event_type string, "
        "event_unique_id string",
    )
    out = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in experiments.session_transitions(silver).collect()
    }
    # 10:00→10:30 exactly 1800s → same session; 10:30→11:00:00.000001 →
    # 1800.000001s → new session
    assert out == {("view", "cart"): 1, ("cart", "exit"): 1,
                   ("purchase", "exit"): 1}


def test_funnel_step_timing(spark):
    import datetime as dt

    def ev(u, s, typ):
        return (u, dt.datetime.fromisoformat(s), typ)

    rows = [
        ev(1, "2024-01-01 10:00:00", "view"),
        ev(1, "2024-01-01 10:00:10", "cart"),
        ev(1, "2024-01-01 10:01:00", "purchase"),
        ev(2, "2024-01-01 09:00:00", "view"),
        ev(2, "2024-01-01 09:00:30", "cart"),
        # user 3: purchase BEFORE first view → excluded from d02
        ev(3, "2024-01-01 08:00:00", "purchase"),
        ev(3, "2024-01-01 08:30:00", "view"),
        # user 4: view only
        ev(4, "2024-01-01 07:00:00", "view"),
    ]
    silver = spark.createDataFrame(
        rows, "user_id long, event_timestamp timestamp, event_type string"
    )
    r = experiments.funnel_step_timing(silver).collect()[0]
    assert r["users_view"] == 4
    assert r["users_view_to_cart"] == 2
    assert r["users_view_to_purchase"] == 1
    assert r["median_sec_view_to_cart"] == 20.0  # interp of {10, 30}
    assert r["median_sec_view_to_purchase"] == 60.0


def test_linear_attribution_splits_revenue(spark):
    import datetime as dt

    def ev(u, s, typ, price, uid):
        return (u, dt.datetime.fromisoformat(s), typ, price, uid)

    rows = [
        # purchase 100.0 with two touches in window → 50/50
        ev(1, "2024-01-01 10:00:00", "view", None, "t1"),
        ev(1, "2024-01-02 10:00:00", "cart", None, "t2"),
        ev(1, "2024-01-03 10:00:00", "purchase", 100.0, "p1"),
        # touch OUTSIDE the 7-day window → direct
        ev(2, "2024-01-01 10:00:00", "view", None, "t3"),
        ev(2, "2024-01-20 10:00:00", "purchase", 30.0, "p2"),
    ]
    silver = spark.createDataFrame(
        rows,
        "user_id long, event_timestamp timestamp, event_type string, "
        "price double, event_unique_id string",
    )
    out = {
        (str(r["touch_date"]), r["touch_type"]): r
        for r in experiments.linear_attribution(silver).collect()
    }
    assert out[("2024-01-01", "view")]["attributed_revenue"] == 50.0
    assert out[("2024-01-02", "cart")]["attributed_revenue"] == 50.0
    assert out[("2024-01-20", "direct")]["attributed_revenue"] == 30.0
    # conservation: attributed totals equal purchase revenue
    assert sum(r["attributed_revenue"] for r in out.values()) == 130.0


def test_linear_attribution_uneven_split_is_exact(spark):
    """10.0 across 3 touches: quantized shares (3.333333) sum to
    9.999999 → 10.0 at cents — no float-order drift."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), "view", None, "t1"),
        (1, dt.datetime(2024, 1, 1, 11, 0, 0), "view", None, "t2"),
        (1, dt.datetime(2024, 1, 1, 12, 0, 0), "view", None, "t3"),
        (1, dt.datetime(2024, 1, 2, 10, 0, 0), "purchase", 10.0, "p1"),
    ]
    silver = spark.createDataFrame(
        rows,
        "user_id long, event_timestamp timestamp, event_type string, "
        "price double, event_unique_id string",
    )
    rows_out = experiments.linear_attribution(silver).collect()
    assert len(rows_out) == 1
    assert rows_out[0]["n_touches"] == 3
    assert rows_out[0]["attributed_revenue"] == 10.0


def test_experiment_lift_variant_of_matches_assignment_table(spark):
    """The deterministic-bucketing fast path (variant_of) produces the
    SAME statistics as an assignments table covering exactly the
    observed users — one events pass instead of two. Passing both or
    neither refuses."""
    import pytest

    events = spark.createDataFrame(
        [(u, t) for u in range(1, 9) for t in (["view"] + (["purchase"] if u % 2 else []))],
        "user_id long, event_type string",
    )
    bucket = lambda u: F.when(u % 2 == 0, F.lit("control")).otherwise(  # noqa: E731
        F.lit("treat")
    )
    assignments = events.select("user_id").distinct().select(
        "user_id", bucket(F.col("user_id")).alias("variant")
    )
    succ = F.col("event_type") == "purchase"
    via_table = sorted(
        tuple(r)
        for r in experiments.experiment_lift(
            events, assignments, success=succ
        ).collect()
    )
    via_expr = sorted(
        tuple(r)
        for r in experiments.experiment_lift(
            events, success=succ, variant_of=bucket
        ).collect()
    )
    assert via_table == via_expr
    with pytest.raises(ValueError, match="exactly one"):
        experiments.experiment_lift(events, assignments, success=succ, variant_of=bucket)
    with pytest.raises(ValueError, match="exactly one"):
        experiments.experiment_lift(events, success=succ)
