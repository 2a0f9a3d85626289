"""Column-function library: the reference's derived-domain semantics
(D1–D11), plus text and vector helpers for the LLM-pipeline operators.

Everything here returns ``pyspark.sql.Column`` expressions built from
built-in functions — JVM-side, whole-stage-codegen friendly. No Python
UDFs in this package.
"""

from data_lakehouse_spark.functions.scalars import (
    clv,
    day_name,
    event_unique_id,
    funnel_stage,
    is_weekend,
    price_bucket,
    rfm_segment,
    split_category,
    time_of_day,
    validated_price,
)
from data_lakehouse_spark.functions.text import (
    doc_fingerprint,
    language_guess,
    quality_score,
    token_count,
)
from data_lakehouse_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "clv",
    "cosine_similarity",
    "day_name",
    "doc_fingerprint",
    "dot_product",
    "event_unique_id",
    "funnel_stage",
    "is_weekend",
    "l2_norm",
    "language_guess",
    "price_bucket",
    "quality_score",
    "rfm_segment",
    "split_category",
    "time_of_day",
    "token_count",
    "validated_price",
]
