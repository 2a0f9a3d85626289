"""Vector column functions over ``array<float|double>`` embeddings.

Built on higher-order functions (``zip_with`` + ``aggregate``) so the
arithmetic runs JVM-side inside codegen — no Python, no UDF, no
serialization. This is the primitive layer for similarity search
(operators/similarity.py).

Accumulation is in DOUBLE left-to-right over array order, which gives a
deterministic result identical to a sequential SQL fold — required for
oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot_product", "l2_norm", "cosine_similarity", "as_double_array"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i accumulated in double, array order."""
    prods = F.zip_with(
        as_double_array(a), as_double_array(b), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(as_double_array(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is 0."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0, F.lit(None).cast("double")).otherwise(num / den)
