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

__all__ = ["hll_sketch_table", "hll_rollup"]


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
