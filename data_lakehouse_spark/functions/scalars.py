"""Derived-domain scalar operators (SURVEY.md §2.9, D1–D11).

Each function reproduces one reference-defined semantic exactly — the
CASE-expression "operators" of the silver/gold dbt models — as a pure
``Column`` expression (JVM-side, codegen-friendly, no UDFs).

Reference parity citations (read-only reference at /root/reference/):
- D1 price validation      dbt/models/silver/silver_ecommerce_events.sql:70-74
- D2 price_bucket          dbt/models/silver/silver_ecommerce_events.sql:77-84
- D3 time_of_day           dbt/models/silver/silver_ecommerce_events.sql:87-92
- D4 is_weekend            dbt/models/silver/silver_ecommerce_events.sql:95-98
- D5 category split        dbt/models/silver/silver_ecommerce_events.sql:46-61
- D6 event_unique_id       dbt/models/silver/silver_ecommerce_events.sql:24-29
- D7 RFM segment           dbt/models/gold/gold_user_rfm_segments.sql:56-89
- D8 funnel stage          dbt/models/gold/gold_user_journey_funnel.sql:46-52
- D9 behavior flags        dbt/models/gold/gold_user_journey_funnel.sql:55-62
- D10 day-name map         dbt/models/gold/gold_hourly_traffic.sql:16-24
- D11 CLV                  dbt/models/gold/gold_user_rfm_segments.sql:92
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "validated_price",
    "price_bucket",
    "time_of_day",
    "is_weekend",
    "split_category",
    "event_unique_id",
    "rfm_segment",
    "funnel_stage",
    "behavior_flags",
    "day_name",
    "clv",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def round_half_up(c: Column | str, scale: int = 2) -> Column:
    """ROUND half-up via ``floor(x * 10^s + 0.5) / 10^s`` on doubles.

    Spark's ROUND (BigDecimal HALF_UP on the decimal rendering) and other
    engines' float rounding disagree on .xx5 boundaries; this formula is
    pure double arithmetic, bit-identical on any IEEE-754 engine, so the
    DuckDB oracle can reproduce it exactly. Valid for non-negative x
    (all our rates/amounts).
    """
    m = float(10**scale)
    x = _col(c).cast("double")
    return F.floor(x * m + F.lit(0.5)).cast("double") / m


def validated_price(price: Column | str) -> Column:
    """D1: NULL when price is NULL or negative, else ROUND(price, 2)."""
    p = _col(price)
    return F.when(p.isNull() | (p < 0), F.lit(None).cast("double")).otherwise(
        round_half_up(p, 2)
    )


def price_bucket(price: Column | str) -> Column:
    """D2: left-closed price bands → UNKNOWN/0-50/50-100/100-200/200-500/500+.

    Operates on the RAW price: only NULL maps to UNKNOWN; negatives fall
    into '0-50' exactly as the reference CASE does (validation is D1's
    job, a separate column).
    """
    p = _col(price)
    return (
        F.when(p.isNull(), F.lit("UNKNOWN"))
        .when(p < 50, F.lit("0-50"))
        .when(p < 100, F.lit("50-100"))
        .when(p < 200, F.lit("100-200"))
        .when(p < 500, F.lit("200-500"))
        .otherwise(F.lit("500+"))
    )


def time_of_day(hour: Column | str) -> Column:
    """D3: MORNING [6,12), AFTERNOON [12,18), EVENING [18,22), else NIGHT."""
    h = _col(hour)
    return (
        F.when((h >= 6) & (h < 12), F.lit("MORNING"))
        .when((h >= 12) & (h < 18), F.lit("AFTERNOON"))
        .when((h >= 18) & (h < 22), F.lit("EVENING"))
        .otherwise(F.lit("NIGHT"))
    )


def is_weekend(ts_or_date: Column | str) -> Column:
    """D4: DAYOFWEEK IN (1,7) — Sunday=1 convention (Spark matches Hive)."""
    return F.dayofweek(_col(ts_or_date)).isin(1, 7)


def split_category(category_code: Column | str) -> tuple[Column, Column, Column]:
    """D5: dot-split a category code into 3 NULL-safe levels.

    ``SIZE(SPLIT(x,'.')) >= n`` gating mirrors the reference's arity
    checks; returns (level_1, level_2, level_3) columns.
    """
    c = _col(category_code)
    parts = F.split(c, r"\.")
    n = F.size(parts)

    def level(i: int) -> Column:
        return F.when(c.isNull() | (n < i + 1), F.lit(None).cast("string")).otherwise(
            parts.getItem(i)
        )

    return level(0), level(1), level(2)


def event_unique_id(*cols: Column | str, null_sentinel: str = "NULL") -> Column:
    """D6: MD5 over the concat of key parts, NULLs replaced by a sentinel.

    The reference concatenates user_id, COALESCE(product_id,'NULL'),
    event_type, event_time; we generalize to any key tuple. Callers must
    pre-format timestamps deterministically (see silver.py).
    """
    safe = [F.coalesce(_col(c).cast("string"), F.lit(null_sentinel)) for c in cols]
    return F.md5(F.concat_ws("|", *safe))


def rfm_segment(r: Column | str, fq: Column | str, m: Column | str) -> Column:
    """D7: ordered 8-label CASE over NTILE(5) R/F/M scores.

    Exact clause order from the reference (the 'Lost' arm is shadowed by
    'Hibernating' — preserved for parity):
    gold_user_rfm_segments.sql:56-89.
    """
    r, fq, m = _col(r), _col(fq), _col(m)
    return (
        F.when((r >= 4) & (fq >= 4) & (m >= 4), F.lit("Champions"))
        .when((r >= 3) & (fq >= 3) & (m >= 3), F.lit("Loyal Customers"))
        .when((r >= 4) & (fq <= 2), F.lit("Potential Loyalists"))
        .when((r <= 2) & (fq >= 4), F.lit("At Risk"))
        .when((r <= 2) & (fq >= 3) & (m >= 4), F.lit("Cannot Lose Them"))
        .when((r <= 2) & (fq <= 2), F.lit("Hibernating"))
        .when((r == 1) & (fq == 1), F.lit("Lost"))
        .otherwise(F.lit("New Customers"))
    )


def funnel_stage(
    purchase_count: Column | str,
    cart_count: Column | str,
    view_count: Column | str,
) -> Column:
    """D8: repeat_buyer (≥3 purchases) / purchaser / cart_abandoner /
    viewer_only / unknown — order-dependent CASE."""
    p, c, v = _col(purchase_count), _col(cart_count), _col(view_count)
    return (
        F.when(p >= 3, F.lit("repeat_buyer"))
        .when(p >= 1, F.lit("purchaser"))
        .when(c >= 1, F.lit("cart_abandoner"))
        .when(v >= 1, F.lit("viewer_only"))
        .otherwise(F.lit("unknown"))
    )


def behavior_flags(
    purchase_count: Column | str,
    cart_count: Column | str,
    view_count: Column | str,
    days_to_first_purchase: Column | str,
) -> dict[str, Column]:
    """D9: is_cart_abandoner, is_impulse_buyer, is_researcher flags."""
    p, c, v = _col(purchase_count), _col(cart_count), _col(view_count)
    d = _col(days_to_first_purchase)
    return {
        "is_cart_abandoner": (c >= 1) & (p == 0),
        "is_impulse_buyer": (p >= 1) & d.isNotNull() & (d <= 0),
        "is_researcher": v >= 5,
    }


def day_name(day_of_week_num: Column | str) -> Column:
    """D10: 1–7 (Sunday=1) → English day name."""
    d = _col(day_of_week_num)
    names = [
        "Sunday",
        "Monday",
        "Tuesday",
        "Wednesday",
        "Thursday",
        "Friday",
        "Saturday",
    ]
    expr = F.when(d == 1, F.lit(names[0]))
    for i in range(1, 7):
        expr = expr.when(d == i + 1, F.lit(names[i]))
    return expr.otherwise(F.lit(None).cast("string"))


def clv(monetary: Column | str, multiplier: float = 1.5) -> Column:
    """D11: ROUND(monetary * multiplier, 2)."""
    return round_half_up(_col(monetary) * F.lit(multiplier), 2)
