"""Unit tests for the derived-domain scalar operators (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.functions import scalars


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_price_bucket_edges(spark):
    df = spark.createDataFrame(
        [(None,), (-5.0,), (0.0,), (49.99,), (50.0,), (99.99,), (100.0,),
         (199.99,), (200.0,), (499.99,), (500.0,), (1e6,)],
        "price double",
    )
    got = [r[0] for r in df.select(scalars.price_bucket("price")).collect()]
    # negatives land in 0-50 (reference CASE has no negative guard)
    assert got == [
        "UNKNOWN", "0-50", "0-50", "0-50", "50-100", "50-100", "100-200",
        "100-200", "200-500", "200-500", "500+", "500+",
    ]


def test_validated_price(spark):
    df = spark.createDataFrame([(None,), (-1.0,), (3.14159,)], "p double")
    got = [r[0] for r in df.select(scalars.validated_price("p")).collect()]
    assert got[0] is None and got[1] is None and got[2] == 3.14


def test_time_of_day_bands(spark):
    df = spark.createDataFrame([(h,) for h in [0, 5, 6, 11, 12, 17, 18, 21, 22, 23]], "h int")
    got = [r[0] for r in df.select(scalars.time_of_day("h")).collect()]
    assert got == ["NIGHT", "NIGHT", "MORNING", "MORNING", "AFTERNOON",
                   "AFTERNOON", "EVENING", "EVENING", "NIGHT", "NIGHT"]


def test_is_weekend_sunday_first(spark):
    # 2024-01-06 Sat, 2024-01-07 Sun, 2024-01-08 Mon
    df = spark.createDataFrame(
        [("2024-01-06",), ("2024-01-07",), ("2024-01-08",)], "d string"
    ).select(F.col("d").cast("date").alias("d"))
    got = [r[0] for r in df.select(scalars.is_weekend("d")).collect()]
    assert got == [True, True, False]


def test_rfm_segment_reference_order(spark):
    cases = [
        (5, 5, 5, "Champions"),
        (3, 3, 3, "Loyal Customers"),
        (5, 1, 1, "Potential Loyalists"),
        (1, 5, 1, "At Risk"),
        (1, 3, 5, "Cannot Lose Them"),
        (1, 1, 5, "Hibernating"),   # shadows 'Lost' — reference parity
        (3, 1, 5, "New Customers"),
    ]
    df = spark.createDataFrame([(r, f, m) for r, f, m, _ in cases], "r int, f int, m int")
    got = [x[0] for x in df.select(scalars.rfm_segment("r", "f", "m")).collect()]
    assert got == [c[3] for c in cases]


def test_funnel_stage(spark):
    cases = [
        (5, 0, 0, "repeat_buyer"),
        (1, 2, 3, "purchaser"),
        (0, 1, 3, "cart_abandoner"),
        (0, 0, 3, "viewer_only"),
        (0, 0, 0, "unknown"),
    ]
    df = spark.createDataFrame([(p, c, v) for p, c, v, _ in cases], "p int, c int, v int")
    got = [x[0] for x in df.select(scalars.funnel_stage("p", "c", "v")).collect()]
    assert got == [c[3] for c in cases]


def test_split_category_arity(spark):
    df = spark.createDataFrame(
        [("a.b.c",), ("a.b",), ("a",), (None,)], "c string"
    )
    l1, l2, l3 = scalars.split_category("c")
    rows = df.select(l1.alias("l1"), l2.alias("l2"), l3.alias("l3")).collect()
    assert [tuple(r) for r in rows] == [
        ("a", "b", "c"), ("a", "b", None), ("a", None, None), (None, None, None)
    ]


def test_day_name(spark):
    df = spark.createDataFrame([(1,), (7,), (9,)], "d int")
    got = [r[0] for r in df.select(scalars.day_name("d")).collect()]
    assert got == ["Sunday", "Saturday", None]


def test_round_half_up(spark):
    df = spark.createDataFrame([(2.675,), (2.665,), (0.125,)], "x double")
    got = [r[0] for r in df.select(scalars.round_half_up("x", 2)).collect()]
    # pure double arithmetic: 2.675*100 = 267.49999... → floor(268.0-eps+0.5)
    assert got[2] == 0.13  # 0.125*100+0.5 = 13.0 exactly
