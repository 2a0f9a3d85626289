"""CDC-driven incremental aggregate maintenance.

The reference recomputes every gold mart from silver on each run
(``dbt/models/gold/*.sql`` are full ``GROUP BY`` selects; only silver
is incremental). At 100 TB a daily full recompute of a
months-spanning mart rescans months of data to refresh numbers only
the newest (and occasionally a corrected old) day changed. This
module maintains the mart from the CHANGE FEED instead:

- read ``catalog.table_changes(source, last_processed, current)`` —
  insert/delete row images, bounded by what actually changed;
- fold them into per-group DELTAS (inserts count +1, deletes −1 —
  every algebraic aggregate folds this way: SUM adds signed values,
  COUNT adds signs, AVG derives from SUM/COUNT);
- merge deltas into the mart (outer join on group keys, add, drop
  groups whose live row count reaches zero);
- commit the new mart AND the processed source version in the SAME
  catalog commit (exactly-once: a crashed refresh replays the span).

Correctness contract (pinned in tests/test_cdc_mart.py): after any
sequence of appends / COW or MOR deletes / updates on the source,
``refresh()`` produces the same mart as a full recompute — while
reading only changed directories. Non-algebraic aggregates
(COUNT DISTINCT, percentiles) are out of scope by design: maintain a
sketch column (operators/sketches.py) or recompute those marts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CdcAggregate"]

_LAST_VERSION_PROP = "cdc.last_source_version"


class CdcAggregate:
    """Incrementally-maintained SUM/COUNT aggregate table.

    ``measures`` maps output column → ("sum", expr) or ("count", None)
    where expr is a SQL string evaluated against source rows. The
    mart also always carries ``_n_rows`` (live row count per group)
    to decide group retirement.
    """

    def __init__(
        self,
        catalog,
        source: str,
        target: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str | None]],
    ) -> None:
        for out, (agg, _) in measures.items():
            if agg not in ("sum", "count"):
                raise ValueError(
                    f"{out}: only algebraic sum/count are CDC-maintainable"
                )
        self.catalog = catalog
        self.source = source
        self.target = target
        self.group_cols = list(group_cols)
        self.measures = dict(measures)

    # -- internals --------------------------------------------------------
    def _signed_aggs(self, sign: Column) -> list[Column]:
        aggs = []
        for out, (agg, expr) in self.measures.items():
            contrib = (
                sign.cast("double") * F.expr(expr).cast("double")
                if agg == "sum"
                else sign.cast("bigint")
            )
            aggs.append(F.sum(contrib).alias(out))
        aggs.append(F.sum(sign.cast("bigint")).alias("_n_rows"))
        return aggs

    def _aggregate(self, rows: DataFrame, sign: Column) -> DataFrame:
        return rows.groupBy(*self.group_cols).agg(*self._signed_aggs(sign))

    def _source_version(self) -> int:
        entries = self.catalog._load_manifest(
            self.catalog._handle(self.source)
        )
        if not entries:
            raise ValueError(f"source table {self.source} does not exist")
        return len(entries) - 1

    # -- API --------------------------------------------------------------
    def refresh(self) -> dict:
        """Bring the mart up to the source's current version. First call
        is a full build; later calls fold only the change feed."""
        cur = self._source_version()
        if not self.catalog.table_exists(self.target):
            full = self._aggregate(
                self.catalog.read(self.source), F.lit(1)
            )
            self.catalog.create_table(
                self.target,
                full,
                properties={_LAST_VERSION_PROP: str(cur)},
                mode="replace",
            )
            return {"mode": "full", "source_version": cur}

        props = self.catalog.table_properties(self.target)
        last = int(props[_LAST_VERSION_PROP])
        if last == cur:
            return {"mode": "noop", "source_version": cur}

        changes = self.catalog.table_changes(self.source, last, cur)
        signed = changes.withColumn(
            "_sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ).drop("_change_type")
        delta = self._aggregate(signed, F.col("_sign"))

        mart = self.catalog.read(self.target)
        merged_cols = [
            F.coalesce(F.col(f"m.{c}"), F.lit(0.0) if agg == "sum" else F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0.0) if agg == "sum" else F.lit(0))
            for c, (agg, _) in self.measures.items()
        ]
        merged = (
            mart.alias("m")
            .join(delta.alias("d"), on=self.group_cols, how="full_outer")
            .select(
                *self.group_cols,
                *[
                    c.alias(out)
                    for c, out in zip(merged_cols, self.measures)
                ],
                (
                    F.coalesce(F.col("m._n_rows"), F.lit(0))
                    + F.coalesce(F.col("d._n_rows"), F.lit(0))
                ).alias("_n_rows"),
            )
            .filter(F.col("_n_rows") > 0)  # group retirement
        )
        self.catalog.create_table(
            self.target,
            merged,
            properties={_LAST_VERSION_PROP: str(cur)},
            mode="replace",
        )
        return {"mode": "incremental", "from": last, "source_version": cur}
