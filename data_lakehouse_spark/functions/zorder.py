"""Z-order (Morton) clustering value — multi-column data skipping.

Sorting a table by ``(a, b)`` gives perfect file-level min/max bounds
on ``a`` and useless ones on ``b``; interleaving the bits of both
coordinates orders rows along a space-filling curve, so every file
covers a small RECTANGLE in (a, b) space and min/max skipping works
for predicates on EITHER column (Delta ``OPTIMIZE ZORDER BY`` / the
classic Morton-code layout). This is a write-time layout choice: at
100 TB it converts "scan everything unless you filtered on the sort
key" into bounded file subsets for every clustered dimension.

Everything here is JVM bit arithmetic: each column is min/max scaled
to a ``bits``-wide integer rank (``width_bucket``-style uniform
scaling — rank quality degrades under heavy skew, where a
quantile-rank prepass would be the upgrade), and ranks interleave into
one long. Used by ``Catalog.compact(zorder_by=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "scaled_rank"]


def scaled_rank(
    c: Column, lo: Column | float, hi: Column | float, *, bits: int = 10
) -> Column:
    """Min/max scale ``c`` to an integer in [0, 2**bits): the per-column
    coordinate that feeds the interleave. NULLs rank first (0)."""
    span = F.lit(2**bits - 1)
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    width = hi_c - lo_c
    scaled = F.when(width <= 0, F.lit(0)).otherwise(
        F.floor((c.cast("double") - lo_c) / width * span)
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), span), F.lit(0)
    ).cast("long")


def zorder_value(ranks: list[Column], *, bits: int = 10) -> Column:
    """Interleave ``bits``-wide integer ranks into one Morton code:
    bit ``i`` of rank ``k`` lands at position ``i * n_cols + k``."""
    n = len(ranks)
    if n == 0:
        raise ValueError("zorder_value needs at least one rank column")
    z = F.lit(0).cast("long")
    for k, r in enumerate(ranks):
        for i in range(bits):
            bit = F.shiftrightunsigned(r, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + k)
    return z


def zorder_df(
    df: DataFrame, cols: list[str], *, bits: int = 10
) -> tuple[DataFrame, str]:
    """Attach the Morton code for ``cols`` as column ``_zorder`` →
    (df, column name). Bounds come from one tiny min/max aggregate
    (2·n_cols numbers on the driver — planning-time cost)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).first()
    ranks = []
    for i, c in enumerate(cols):
        lo, hi = row[2 * i], row[2 * i + 1]
        lo = 0.0 if lo is None else float(lo)
        hi = 0.0 if hi is None else float(hi)
        ranks.append(scaled_rank(F.col(c), lo, hi, bits=bits))
    return df.withColumn("_zorder", zorder_value(ranks, bits=bits)), "_zorder"
