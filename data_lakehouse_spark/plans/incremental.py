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

__all__ = ["IncrementalMaterializer", "merge_upsert"]


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
