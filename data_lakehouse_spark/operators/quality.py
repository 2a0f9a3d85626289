"""Data-quality assertions — the reference's dbt schema tests as
reusable checks (SURVEY.md §5; dbt/models/{silver,gold}/schema.yml).

Each check returns the number of violating rows (0 == pass), mirroring
dbt's SELECT-violations convention. ``run_checks`` batches them into a
single report. All checks are plain aggregations — one job per call,
or use ``summarize`` to fuse several into one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_unique",
    "check_not_null",
    "check_accepted_values",
    "check_accepted_range",
    "run_checks",
]


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


def run_checks(df: DataFrame, checks: Sequence[tuple]) -> dict[str, int]:
    """checks: sequence of (name, callable(df) -> violations)."""
    return {name: fn(df) for name, fn in checks}
