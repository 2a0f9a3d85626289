"""Mergeable sketch tiers: KLL quantile rollups and theta set algebra
(HLL union rollups are pinned in test_dedup_similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import sketches


def _values(spark):
    # two "days" with different distributions so day-local percentiles
    # cannot stand in for the merged one
    rows = [("d1", float(i)) for i in range(1000)] + [
        ("d2", float(10 * i)) for i in range(1000)
    ]
    return spark.createDataFrame(rows, "day string, v double")


def test_kll_rollup_matches_direct_sketch_and_exact(spark):
    df = _values(spark)
    daily = sketches.kll_sketch_table(df, ["day"], "v")
    rolled = sketches.kll_quantile_rollup(
        daily, [], quantiles=(0.5, 0.95, 0.99)
    ).collect()[0]
    # monotone quantiles and exact row accounting
    assert rolled["p50"] <= rolled["p95"] <= rolled["p99"]
    assert rolled["n_rows"] == 2000
    # merged estimate within KLL rank-error bounds of the exact value:
    # k=200 → ~1.65% rank error; at n=2000 that's ±33 ranks, and the
    # combined distribution's value gap per rank is ≤ 10
    exact_p50 = sorted(
        [r["v"] for r in df.collect()]
    )[1000]
    assert abs(rolled["p50"] - exact_p50) <= 400  # 33 ranks × 10 + slack
    # per-day p95s are NOT the merged p95 (the reason the sketch exists)
    per_day = {
        r["day"]: r["p95"]
        for r in sketches.kll_quantile_rollup(daily, ["day"]).collect()
    }
    assert per_day["d1"] < rolled["p95"] < per_day["d2"]


def test_theta_overlap_exact_at_small_cardinality(spark):
    """Below the sketch's nominal-entries threshold theta is EXACT, so
    the overlap estimates must equal the true set sizes."""
    rows = (
        [("view", u) for u in range(100)]
        + [("buy", u) for u in range(50, 120)]
        + [("signup", u) for u in range(200, 210)]
    )
    df = spark.createDataFrame(rows, "seg string, user bigint")
    out = {
        (r["segment_a"], r["segment_b"]): r
        for r in sketches.theta_audience_overlap(df, "seg", "user").collect()
    }
    vb = out[("buy", "view")]
    assert vb["overlap"] == 50  # users 50..99
    assert vb["union_size"] == 120  # users 0..119
    assert vb["only_a"] == 20  # buy-only users 100..119
    assert abs(vb["jaccard"] - 50 / 120) < 1e-9
    sv = out[("signup", "view")]
    assert sv["overlap"] == 0 and sv["union_size"] == 110
    # one row per unordered pair
    assert len(out) == 3


def test_hll_trailing_window_tracks_exact_stickiness(spark, sf_dir):
    """The sketch-merge trailing window approximates the exact
    DAU/WAU/MAU mart within HLL's rel-error envelope (lg_k=12 → ~1.6%
    standard error; pin 5%)."""
    from data_lakehouse_spark.operators import gold, sketches
    from data_lakehouse_spark.operators.silver import silver_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    silver = silver_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    exact = {
        str(r["activity_date"]): r
        for r in gold.active_user_stickiness(silver).collect()
    }
    daily = sketches.hll_sketch_table(silver, ["event_date"], "user_id")
    approx = sketches.hll_trailing_window(
        daily, "event_date", {"dau": 1, "wau": 7, "mau": 28}
    ).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[str(r["event_date"])]
        for col in ("dau", "wau", "mau"):
            assert abs(r[col] - e[col]) <= max(2, 0.05 * e[col]), (
                r["event_date"], col, r[col], e[col]
            )
