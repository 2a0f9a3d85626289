"""Incremental high-watermark materialization (SURVEY.md §2.1 S7, §2.2 P9).

Reimplements the reference's dbt-incremental semantics
(``silver_ecommerce_events.sql:1-18``: ``materialized='incremental',
incremental_strategy='append'`` + ``WHERE src.ingest_ts > (SELECT
MAX(tgt.ingest_ts) FROM target)``) as a small library:

- first run → full select, create table;
- later runs → watermark predicate (folded to a literal, so parquet
  min/max skipping and partition pruning prune the scan), append;
- optional ``unique_key`` merge fixes the reference quirk where
  ``unique_key`` on an append strategy is inert (SURVEY.md §4 #4):
  with ``dedup_on_write=True`` incoming rows already present are
  anti-joined away before append.

At 100 TB the watermark read touches only the target's footer stats
(one MAX over a partition-sorted column), and each incremental append
scans only new partitions.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalMaterializer", "merge_upsert", "scd2_merge"]


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE semantics as a pure DataFrame transform: source rows
    replace target rows sharing the key (WHEN MATCHED THEN UPDATE),
    unmatched source rows append (WHEN NOT MATCHED THEN INSERT).

    The dbt ``incremental_strategy='merge'`` / Iceberg MERGE INTO
    equivalent for plain-Parquet tables (the reference declares a
    ``unique_key`` its append strategy never enforces — SURVEY.md §4
    #4; this is the enforcing variant). One anti-join shuffle on the
    key; with both sides partitioned on the key it stays co-located.
    Caller rewrites the affected partitions with the result.
    """
    cols = target.columns
    surviving = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return surviving.select(*cols).unionByName(source.select(*cols))


class IncrementalMaterializer:
    def __init__(
        self,
        spark: SparkSession,
        target_path: str,
        watermark_col: str,
        *,
        partition_by: list[str] | None = None,
        unique_key: str | None = None,
        dedup_on_write: bool = False,
    ) -> None:
        self.spark = spark
        self.target_path = target_path
        self.watermark_col = watermark_col
        self.partition_by = partition_by
        self.unique_key = unique_key
        self.dedup_on_write = dedup_on_write

    # -- introspection -----------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self.target_path) and any(
            not n.startswith((".", "_")) for n in os.listdir(self.target_path)
        )

    def read_target(self) -> DataFrame:
        return self.spark.read.parquet(self.target_path)

    def high_watermark(self):
        if not self.exists():
            return None
        return self.read_target().agg(F.max(self.watermark_col)).first()[0]

    # -- materialization ---------------------------------------------------
    def run(self, select: Callable[[], DataFrame]) -> dict:
        """Materialize one increment; returns run stats."""
        df = select()
        wm = self.high_watermark()
        mode = "append"
        if wm is None:
            mode = "create"
        else:
            df = df.filter(F.col(self.watermark_col) > F.lit(wm))
        if self.dedup_on_write and self.unique_key and wm is not None:
            existing = self.read_target().select(self.unique_key)
            df = df.join(existing, on=self.unique_key, how="left_anti")

        writer = df.write.format("parquet")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.mode("append" if mode == "append" else "overwrite").save(
            self.target_path
        )
        return {"mode": mode, "watermark": wm}


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    *,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge: history-preserving
    dimension maintenance (Kimball SCD2) as a pure DataFrame transform.

    ``dim`` carries one row per (key, validity interval) with
    ``valid_from`` / ``valid_to`` timestamps and a ``current_flag``;
    ``updates`` carries (keys + tracked + ts_col) rows. For each update
    whose tracked attributes DIFFER from the key's current row (or
    whose key is new): the current row closes (``valid_to`` = update
    ts, flag false) and a new current row opens. Updates equal to the
    current row are no-ops, so re-applying a batch is idempotent.

    Shape: every join/agg is keyed on ``keys`` — one shuffle family;
    co-locates if dim and updates are partitioned on the key. History
    rows pass through untouched (at scale: keep the dimension
    partitioned so only touched partitions rewrite).

    Null-safe change detection via ``eqNullSafe`` — a tracked NULL ↔
    value transition IS a change.
    """
    if not keys or not tracked:
        raise ValueError("keys and tracked must be non-empty")
    out_cols = [*keys, *tracked, valid_from, valid_to, current_flag]
    cur = dim.filter(F.col(current_flag)).select(*out_cols)
    hist = dim.filter(~F.col(current_flag)).select(*out_cols)

    # newest update per key wins within a batch (ties: arbitrary but
    # deterministic via a total ordering on tracked values)
    w_latest = [F.col(ts_col).desc()] + [F.col(c).desc_nulls_last() for c in tracked]
    from pyspark.sql.window import Window as _W

    latest = (
        updates.select(*keys, *tracked, ts_col)
        .withColumn(
            "_rn",
            F.row_number().over(
                _W.partitionBy(*keys).orderBy(*w_latest)
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    u = latest.alias("u")
    c = cur.alias("c")
    same = None
    for t in tracked:
        eq = F.col(f"u.{t}").eqNullSafe(F.col(f"c.{t}"))
        same = eq if same is None else (same & eq)
    joined = u.join(c, on=keys, how="left")
    changed = joined.filter(
        F.col(f"c.{current_flag}").isNull() | ~same
    ).select("u.*")

    changed_keys = changed.select(*keys)
    closed = (
        cur.join(changed_keys, on=keys, how="inner")
        .join(
            changed.select(*keys, F.col(ts_col).alias("_close_ts")), on=keys
        )
        .withColumn(valid_to, F.col("_close_ts"))
        .withColumn(current_flag, F.lit(False))
        .drop("_close_ts")
        .select(*out_cols)
    )
    untouched_cur = cur.join(changed_keys, on=keys, how="left_anti")
    opened = changed.select(
        *keys,
        *tracked,
        F.col(ts_col).alias(valid_from),
        # open-ended validity typed like the event time itself (the
        # dimension may be versioned by timestamp, date, or epoch int)
        F.lit(None).cast(updates.schema[ts_col].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return (
        hist.unionByName(closed)
        .unionByName(untouched_cur)
        .unionByName(opened)
    )
