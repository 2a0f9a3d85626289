"""Data-quality assertions — the reference's dbt schema tests as
reusable checks (SURVEY.md §5; dbt/models/{silver,gold}/schema.yml).

Each check returns the number of violating rows (0 == pass), mirroring
dbt's SELECT-violations convention. ``run_checks`` batches them into a
single report. All checks are plain aggregations — one job per call,
or use ``summarize`` to fuse several into one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_unique",
    "check_not_null",
    "check_accepted_values",
    "check_accepted_range",
    "check_freshness",
    "check_relationships",
    "run_checks",
    "split_quarantine",
    "schema_drift",
    "observe_quality",
]


def schema_drift(expected: DataFrame, batch: DataFrame) -> dict[str, list]:
    """Detect schema drift of an incoming batch against the table's
    expected schema — the operational complement to zero-rewrite ADD
    COLUMN (catalog.add_column): evolution you *chose* goes through the
    catalog; drift you *didn't* is surfaced before it corrupts a layer.

    Returns ``{"added": [...], "removed": [...], "retyped":
    [(col, expected_type, batch_type), ...], "compatible": bool}``.
    ``added`` columns are forward-compatible (the catalog can evolve);
    ``removed`` and ``retyped`` are breaking for an append pipeline.
    Pure metadata comparison — no job runs.
    """
    exp = {f.name: f.dataType.simpleString() for f in expected.schema.fields}
    got = {f.name: f.dataType.simpleString() for f in batch.schema.fields}
    added = sorted(set(got) - set(exp))
    removed = sorted(set(exp) - set(got))
    retyped = sorted(
        (c, exp[c], got[c]) for c in set(exp) & set(got) if exp[c] != got[c]
    )
    return {
        "added": added,
        "removed": removed,
        "retyped": retyped,
        "compatible": not removed and not retyped,
    }


def check_unique(df: DataFrame, col: str) -> int:
    """dbt `unique`: count of keys appearing more than once."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )


def check_not_null(df: DataFrame, col: str) -> int:
    return df.filter(F.col(col).isNull()).count()


def check_accepted_values(df: DataFrame, col: str, values: Sequence) -> int:
    return df.filter(
        F.col(col).isNotNull() & ~F.col(col).isin(list(values))
    ).count()


def check_relationships(
    child: DataFrame, col: str, parent: DataFrame, parent_col: str
) -> int:
    """dbt `relationships` (referential integrity): count of non-NULL
    child keys with no matching parent row. Anti-join on the key —
    broadcastable when the parent is a dim, shuffle-join otherwise;
    NULL children are not violations (dbt semantics)."""
    return (
        child.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("_k"))
        .join(
            parent.select(F.col(parent_col).alias("_k")).distinct(),
            on="_k",
            how="left_anti",
        )
        .count()
    )


def check_accepted_range(
    df: DataFrame,
    col: str,
    *,
    min_value=None,
    max_value=None,
    where: str | None = None,
) -> int:
    """dbt_utils `accepted_range` (reference: silver/schema.yml:42-45)."""
    d = df.filter(where) if where else df
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (F.col(col) < min_value)
    if max_value is not None:
        cond = cond | (F.col(col) > max_value)
    return d.filter(F.col(col).isNotNull() & cond).count()


def check_freshness(
    df: DataFrame,
    ts_col: str,
    *,
    warn_after_hours: float = 24.0,
    error_after_hours: float = 48.0,
    now=None,
) -> dict:
    """dbt source freshness SLA (reference:
    dbt/models/staging/bronze/sources.yml:57-59 — loaded_at
    ``_ingestion_time``, warn_after 24 h, error_after 48 h).

    One MAX aggregate — the loaded-at column is typically the partition/
    sort key so parquet footer stats answer it without a full scan.
    Returns {status: 'pass'|'warn'|'error', max_loaded_at, lag_hours};
    an empty/NULL source is 'error' (never loaded).
    """
    import datetime as _dt

    max_ts = df.agg(F.max(ts_col)).first()[0]
    if max_ts is None:
        return {"status": "error", "max_loaded_at": None, "lag_hours": None}
    now = now or _dt.datetime.now(tz=max_ts.tzinfo)
    lag_hours = (now - max_ts).total_seconds() / 3600.0
    status = (
        "error"
        if lag_hours > error_after_hours
        else "warn" if lag_hours > warn_after_hours else "pass"
    )
    return {
        "status": status,
        "max_loaded_at": max_ts,
        "lag_hours": round(lag_hours, 3),
    }


def run_checks(df: DataFrame, checks: Sequence[tuple]) -> dict[str, int]:
    """checks: sequence of (name, callable(df) -> violations)."""
    return {name: fn(df) for name, fn in checks}


def observe_quality(
    df: DataFrame, metrics: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, "object"]:
    """ZERO-EXTRA-PASS quality metrics via Spark's Observation API:
    attach named aggregate metrics (violation counts, totals) to a
    DataFrame so they're collected AS A SIDE EFFECT of whatever action
    the pipeline runs anyway (the write, the count) — at 100 TB, N
    separate ``check_*`` jobs re-scan the table N times; observed
    metrics ride the one scan that was already happening.

    ``metrics``: (name, aggregate_column) pairs, e.g.
    ``("null_ids", sum(when(col(id).isNull(), 1).otherwise(0)))``.
    Returns ``(observed_df, observation)`` — run exactly one action on
    ``observed_df``, then read ``observation.get`` (dict name → value;
    blocks until the action finishes). One Observation instance is
    single-use by Spark's contract: re-observe for a second action.
    """
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *[c.alias(n) for n, c in metrics]), obs


def split_quarantine(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Row-level gate: (good, quarantined) from per-row violation rules.

    ``rules`` are (name, violation_condition) pairs — a row matching ANY
    condition is quarantined with a ``_quarantine_reasons`` array naming
    every rule it tripped (the bad-records side-output pattern: the
    pipeline keeps flowing while violations land in a reviewable table).
    One narrow projection, evaluated once per row for both outputs —
    filters fuse into the scan, no shuffle. NULL conditions (e.g.
    comparisons on NULL) count as non-violations; write an explicit
    ``isNull`` rule for nullability.
    """
    reasons = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        )
    )
    tagged = df.withColumn("_quarantine_reasons", reasons)
    good = tagged.filter(F.size("_quarantine_reasons") == 0).drop(
        "_quarantine_reasons"
    )
    bad = tagged.filter(F.size("_quarantine_reasons") > 0)
    return good, bad
