"""Generic relational operators rounding out the engine surface
(SURVEY.md §2.3 joins, §2.4 aggs, §2.5 windows, §2.6 sorts/top-k,
§2.7 set ops, plus rollup/cube extensions).

The reference only *uses* one join shape (J1 3-key left) but our engine
exposes the full surface; each helper is a thin, Catalyst-friendly
composition — no custom execution, so pushdown/AQE/codegen all apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "top_k",
    "semi_join",
    "anti_join",
    "union_counts",
    "share_of_total",
    "watermark_filter",
    "rollup_agg",
    "tumbling_window_agg",
    "top_1_per_group",
]


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3: ORDER BY … LIMIT k — Catalyst plans TakeOrderedAndProject
    (per-partition heap + single merge; no global sort at scale)."""
    return df.orderBy(*order).limit(k)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right``."""
    return left.join(right, on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """NOT EXISTS: rows of ``left`` without a match in ``right``."""
    return left.join(right, on=list(on), how="left_anti")


def union_counts(tables: dict[str, DataFrame]) -> DataFrame:
    """U1: k-way UNION ALL of per-table row counts
    (reference: dags/05_clickhouse_complete_setup.py:301-354)."""
    parts = [
        df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("row_count"),
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def share_of_total(
    df: DataFrame, group_col: str, *, count_alias: str = "cnt"
) -> DataFrame:
    """W4: grouped counts + % of grand total via an unbounded window
    (reference: bronze_ingestion.py:230-238). The window input is the
    tiny aggregated result, so the single-partition frame is safe."""
    counts = df.groupBy(group_col).agg(F.count("*").cast("bigint").alias(count_alias))
    total = F.sum(count_alias).over(Window.partitionBy())
    return counts.withColumn(
        "pct",
        F.floor(F.col(count_alias) * 100.0 / total * 100 + F.lit(0.5)).cast("double")
        / 100,
    )


def watermark_filter(
    df: DataFrame, watermark_df: DataFrame, col: str, watermark_expr: Column
) -> DataFrame:
    """P9: incremental high-watermark predicate
    ``WHERE col > (SELECT MAX(expr) FROM target)``.

    The scalar is reduced driver-side (one tiny job) and folded into the
    scan filter as a literal → parquet min/max skipping + partition
    pruning apply. NULL watermark (empty target) → full scan.
    """
    wm = watermark_df.agg(F.max(watermark_expr)).first()[0]
    if wm is None:
        return df
    return df.filter(F.col(col) > F.lit(wm))


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ROLLUP — subtotal hierarchy (engine extension; the
    reference computes totals with separate queries)."""
    return df.rollup(*keys).agg(*aggs)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Event-time tumbling window aggregate (batch twin of the
    streaming operator in streaming/pipeline.py)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *extra_keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "event_timestamp",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization (lag + running-sum windows; engine
    extension — the reference has no session logic).

    Adds ``session_idx`` (0-based per user). Both windows share one
    hash-partition on user_id, so this is a single shuffle; state never
    leaves the partition (same property Structured Streaming's
    session_window exploits).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # exact integer microsecond arithmetic (no float epoch drift)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_sess = F.when(
        prev_ts.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_sess", new_sess).withColumn(
        "session_idx", F.sum("_new_sess").over(running).cast("bigint") - 1
    ).drop("_new_sess")


def top_1_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """W2: rank-then-filter keep-best-per-group."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
