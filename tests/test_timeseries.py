"""Time-series completeness operators (operators/timeseries.py):
spine/resample/LOCF/linear-interpolation semantics, pinned on exact
synthetic values (the Timescale gapfill+locf+interpolate contract)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.operators import timeseries as ts


def _series(spark):
    """Two independent series with leading / interior / trailing gaps
    after resampling to a 6-bucket daily spine (d1..d6):

    a: d2=10.0, d4=40.0       -> leading gap d1, interior d3, trailing d5,d6
    b: d1=5.0,  d6=20.0       -> interior gap d2..d5
    """
    rows = [
        ("a", dt.date(2024, 1, 2), 10.0),
        ("a", dt.date(2024, 1, 4), 40.0),
        ("b", dt.date(2024, 1, 1), 5.0),
        ("b", dt.date(2024, 1, 6), 20.0),
    ]
    return spark.createDataFrame(rows, "k string, d date, v double")


@pytest.fixture(scope="module")
def grid(spark):
    m = _series(spark)
    spine = ts.time_spine(
        m, "d", step="interval 1 day", series=m.select("k").distinct()
    )
    return ts.resample_to_spine(m, spine, ["d", "k"])


def test_spine_is_dense_and_crossed(grid):
    # 6 days x 2 series
    assert grid.count() == 12
    days = [r["d"] for r in grid.select("d").distinct().orderBy("d").collect()]
    assert days == [dt.date(2024, 1, i) for i in range(1, 7)]


def test_locf_carries_forward_leaves_leading_null(grid):
    out = ts.locf(grid, "d", ["v"], series_cols=["k"])
    got = {
        (r["k"], r["d"].day): r["v_locf"]
        for r in out.collect()
    }
    # series a: leading gap stays NULL, interior + trailing carry
    assert got[("a", 1)] is None
    assert got[("a", 2)] == 10.0
    assert got[("a", 3)] == 10.0
    assert got[("a", 4)] == 40.0
    assert got[("a", 5)] == 40.0
    assert got[("a", 6)] == 40.0
    # series b: d1 observed, d2..d5 carry 5.0, d6 observed
    assert got[("b", 3)] == 5.0
    assert got[("b", 6)] == 20.0


def test_interpolate_blends_time_weighted(grid):
    out = ts.interpolate_linear(grid, "d", ["v"], series_cols=["k"])
    got = {(r["k"], r["d"].day): r["v_interp"] for r in out.collect()}
    # observed buckets pass through
    assert got[("a", 2)] == 10.0
    assert got[("a", 4)] == 40.0
    # interior gap: midpoint of (10 @ d2, 40 @ d4)
    assert got[("a", 3)] == pytest.approx(25.0)
    # leading/trailing gaps have no bracketing obs -> NULL
    assert got[("a", 1)] is None
    assert got[("a", 5)] is None
    assert got[("a", 6)] is None
    # series b: 5 @ d1 .. 20 @ d6, gap days blend by elapsed fraction
    for day, want in [(2, 8.0), (3, 11.0), (4, 14.0), (5, 17.0)]:
        assert got[("b", day)] == pytest.approx(want), day
    # series never leak into each other (b's values never appear in a)
    assert all(
        got[("a", d)] in (None, 10.0, 25.0, 40.0) for d in range(1, 7)
    )


def test_interpolate_timestamp_axis(spark):
    rows = [
        ("s", dt.datetime(2024, 1, 1, 0), 0.0),
        ("s", dt.datetime(2024, 1, 1, 3), 30.0),
    ]
    m = spark.createDataFrame(rows, "k string, t timestamp, v double")
    spine = ts.time_spine(
        m, "t", step="interval 1 hour", series=m.select("k").distinct()
    )
    grid = ts.resample_to_spine(m, spine, ["t", "k"])
    out = ts.interpolate_linear(grid, "t", ["v"], series_cols=["k"])
    got = {r["t"].hour: r["v_interp"] for r in out.collect()}
    assert got == {0: 0.0, 1: pytest.approx(10.0), 2: pytest.approx(20.0),
                   3: 30.0}


def test_windows_fuse_into_one_node(grid):
    """All prev/next value+time expressions share one partition
    ordering, so Catalyst must fuse them into a SINGLE Window node —
    the series rows shuffle once and are sorted once, regardless of how
    many value columns interpolate."""
    out = ts.interpolate_linear(grid, "d", ["v"], series_cols=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("+- Window ") == 1


def test_ses_forecast_matches_python_fold(spark):
    """The JVM aggregate fold reproduces the SES recurrence exactly
    (seeded with the first observation), projects flat over the
    horizon, and a single-point series forecasts itself."""
    rows = [
        ("a", dt.date(2024, 1, 1), 10.0),
        ("a", dt.date(2024, 1, 2), 20.0),
        ("a", dt.date(2024, 1, 3), 30.0),
        ("b", dt.date(2024, 1, 2), 5.0),
    ]
    daily = spark.createDataFrame(
        rows, "series string, d date, v double"
    )
    out = ts.ses_forecast(
        daily, series_cols=["series"], date_col="d", value_col="v",
        alpha=0.3, horizon=2,
    ).collect()
    level = 10.0
    for x in (20.0, 30.0):
        level = 0.3 * x + (1.0 - 0.3) * level
    import math
    exp = math.floor(level * 100 + 0.5) / 100
    a_rows = [r for r in out if r["series"] == "a"]
    assert [str(r["forecast_date"]) for r in a_rows] == [
        "2024-01-04", "2024-01-05"
    ]
    assert all(r["forecast"] == exp and r["n_obs"] == 3 for r in a_rows)
    b_rows = [r for r in out if r["series"] == "b"]
    assert [r["forecast"] for r in b_rows] == [5.0, 5.0]
    assert str(b_rows[0]["forecast_date"]) == "2024-01-03"


def test_holt_forecast_matches_python_recurrence(spark):
    """(level, trend) struct fold reproduces the textbook Holt
    recurrence (l2=x2, b2=x2-x1, fold from x3) and projects
    level + h*trend."""
    rows = [
        ("a", dt.date(2024, 1, 1), 10.0),
        ("a", dt.date(2024, 1, 2), 20.0),
        ("a", dt.date(2024, 1, 3), 30.0),
        ("a", dt.date(2024, 1, 4), 40.0),
        ("b", dt.date(2024, 1, 2), 5.0),  # single point: flat forecast
    ]
    daily = spark.createDataFrame(rows, "series string, d date, v double")
    out = ts.holt_forecast(
        daily, series_cols=["series"], date_col="d", value_col="v",
        alpha=0.3, beta=0.1, horizon=3,
    ).collect()
    l, b = 20.0, 10.0
    for x in (30.0, 40.0):
        ln = 0.3 * x + (1.0 - 0.3) * (l + b)
        b = 0.1 * (ln - l) + (1.0 - 0.1) * b
        l = ln
    import math

    a_rows = [r for r in out if r["series"] == "a"]
    for h, r in enumerate(a_rows, start=1):
        exp = math.floor((l + h * b) * 100 + 0.5) / 100
        assert r["forecast"] == exp, (h, r["forecast"], exp)
    assert str(a_rows[0]["forecast_date"]) == "2024-01-05"
    b_rows = [r for r in out if r["series"] == "b"]
    assert [r["forecast"] for r in b_rows] == [5.0, 5.0, 5.0]


def test_keyless_series_window_refuses(spark):
    """r10 verdict nit #1: a key-less LOCF/interpolation would plan
    Window.orderBy over the whole frame (one executor holds every
    row) — the library refuses and names the escape hatches."""
    grid = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "d int, v double"
    )
    with pytest.raises(ValueError, match="series_cols is required"):
        ts.locf(grid, "d", ["v"])
    with pytest.raises(ValueError, match="global_order_index"):
        ts.interpolate_linear(grid, "d", ["v"])
    # a constant series key is the documented single-series path
    one = ts.locf(
        grid.withColumn("k", F.lit(1)), "d", ["v"], series_cols=["k"]
    )
    assert [r["v_locf"] for r in one.orderBy("d").collect()] == [
        1.0, 1.0, 3.0,
    ]
