"""Mergeable-sketch pre-aggregation: HLL sketch tables and rollups.

The 100 TB distinct-count problem: ``COUNT(DISTINCT user_id)`` over a
month of events rescans the month every time, and distinct counts do
NOT add across days (Σ daily uniques ≠ monthly uniques). The standard
fix is a sketch table: aggregate each day ONCE into a fixed-size
HyperLogLog sketch (Datasketches HLL, exposed as Spark's
``hll_sketch_agg``), then answer any coarser rollup by MERGING the
sketches (``hll_union_agg`` — unions are lossless for HLL) and
estimating. A year of per-day-per-type sketches is a few thousand
rows of ~2^lgConfigK bytes regardless of event volume, so dashboard
queries touch KB instead of TB.

The same algebraic-aggregate shape is why Spark's partial aggregation
works at all; sketches extend it ACROSS materialization boundaries —
the sketch column survives being written to a table, something a
partial COUNT DISTINCT state cannot do in SQL.

Reference parity: the reference's marts recompute COUNT(DISTINCT ...)
per run (e.g. gold_daily_sales_summary.sql unique_customers); this is
the scale path beside them, like ``_approx_ntile`` beside exact NTILE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_sketch_table",
    "hll_rollup",
    "hll_trailing_window",
    "kll_sketch_table",
    "kll_quantile_rollup",
    "theta_sketch_table",
    "theta_audience_overlap",
]


def hll_sketch_table(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    *,
    lg_config_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch of ``distinct_col`` per ``keys`` group — the
    materialize-once side. One map-side-partial hash aggregation
    (sketch updates are algebraic, so Spark combines per-partition
    states before the shuffle); output rows are fixed-size regardless
    of group cardinality. Also carries exact per-group row counts
    (those DO add across rollups, no sketch needed)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col, F.lit(int(lg_config_k))).alias(
            sketch_col
        ),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    group_keys: list[str],
    *,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Roll a sketch table up to coarser keys: union the sketches
    (lossless, commutative — the estimate equals sketching the raw
    union directly, pinned in tests) and estimate. Input is the tiny
    sketch table, so this never touches raw data."""
    return sketches.groupBy(*group_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
        .cast("bigint")
        .alias(estimate_col),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def hll_trailing_window(
    sketches: DataFrame,
    date_col: str,
    windows: dict[str, int],
    *,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Trailing distinct counts over a per-day sketch table — the scale
    twin of :func:`~data_lakehouse_spark.operators.gold.
    active_user_stickiness`. The exact operator range-joins the
    collapsed (user, day) activity (``mau_days``× amplification of a
    user-cardinality table); this one range-joins the SKETCH table
    against itself — |days|² sketch merges, independent of user count.
    Per ``windows`` entry ``{out_col: trailing_days}``, estimates the
    distinct count over ``[d - days + 1, d]`` for every day ``d``.

    Merge-don't-rescan is the whole point: a year of history is 365
    fixed-size rows, so every trailing window for every day costs KB.
    """
    spine = sketches.select(F.col(date_col).alias("_d")).distinct()
    age = F.datediff(F.col("_d"), F.col(date_col))
    max_days = max(windows.values())
    j = sketches.join(
        F.broadcast(spine), (age >= 0) & (age < F.lit(max_days))
    )
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(
                F.when(age < F.lit(days), F.col(sketch_col))
            )
        )
        .cast("bigint")
        .alias(out_col)
        for out_col, days in windows.items()
    ]
    return (
        j.groupBy(F.col("_d").alias(date_col))
        .agg(*aggs)
        .orderBy(date_col)
    )


def kll_sketch_table(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Quantiles get the same treatment as distinct counts: percentiles
    do NOT add across days (p95 of daily p95s is meaningless), so the
    mergeable KLL sketch (Datasketches, Spark 4's
    ``kll_sketch_agg_double``) is the materialize-once side for
    percentile dashboards — fixed-size per group, lossless merge."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(int(k))
        ).alias(sketch_col),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def kll_quantile_rollup(
    sketches: DataFrame,
    group_keys: list[str],
    *,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Roll a KLL sketch table up to coarser keys and read quantiles
    off the merged sketch — a month's p99 from KB of daily sketches,
    never rescanning events. Rank error is the KLL guarantee (~1.65%
    at k=200), independent of data size."""
    merged = sketches.groupBy(*group_keys).agg(
        F.kll_merge_agg_double(sketch_col).alias("_m"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(float(q))).alias(
            f"p{int(q * 100)}"
        )
        for q in quantiles
    ]
    return merged.select(*group_keys, *qcols, "n_rows")


def theta_sketch_table(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    *,
    lg_k: int = 12,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Theta sketches are the SET-ALGEBRA tier above HLL: same
    mergeable-distinct-count contract, but sketches also intersect and
    difference — the operations that answer audience questions
    ("users who did X AND Y") that no union-only sketch can."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(distinct_col, F.lit(int(lg_k))).alias(sketch_col),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def theta_audience_overlap(
    df: DataFrame,
    segment_col: str,
    member_col: str,
    *,
    lg_k: int = 14,
) -> DataFrame:
    """Pairwise audience overlap between segments from ONE pass over
    the data: per-segment theta sketches, then |A∩B| / |A∪B| / |A\\B|
    estimated entirely in sketch space (``theta_intersection`` /
    ``theta_union`` / ``theta_difference`` on the tiny sketch table's
    cross pairs — |segments|² sketch ops, zero re-scans). The Jaccard
    column is the overlap score audience/dedup dashboards chart."""
    sk = df.groupBy(F.col(segment_col).alias("segment")).agg(
        F.theta_sketch_agg(member_col, F.lit(int(lg_k))).alias("s")
    )
    a = sk.select(
        F.col("segment").alias("segment_a"), F.col("s").alias("_sa")
    )
    b = sk.select(
        F.col("segment").alias("segment_b"), F.col("s").alias("_sb")
    )
    pairs = a.join(F.broadcast(b), F.col("segment_a") < F.col("segment_b"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("_sa"), F.col("_sb"))
    )
    union = F.theta_sketch_estimate(F.theta_union(F.col("_sa"), F.col("_sb")))
    only_a = F.theta_sketch_estimate(
        F.theta_difference(F.col("_sa"), F.col("_sb"))
    )
    return (
        pairs.select(
            "segment_a",
            "segment_b",
            inter.cast("bigint").alias("overlap"),
            union.cast("bigint").alias("union_size"),
            only_a.cast("bigint").alias("only_a"),
            (inter / union).alias("jaccard"),
        )
        .orderBy("segment_a", "segment_b")
    )
