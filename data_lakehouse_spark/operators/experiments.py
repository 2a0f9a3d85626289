"""Experimentation analytics: A/B conversion lift and behavioral flow.

The reference's marts stop at descriptive funnels; an analytics engine
serving a product team also needs the comparative layer — which variant
converts better, and how users move between steps. Both operators here
are pure DataFrame compositions (no UDFs) engineered for the DuckDB
oracle's bit-exactness rules (counts exact, ratios divide identical
doubles, half-up rounding at fixed scale).

Scale: both collapse raw events to per-user (or per-step) aggregates
FIRST, so every join and window downstream runs over the collapsed
cardinality, never raw events.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_spark.functions.scalars import round_half_up

__all__ = [
    "experiment_lift",
    "session_transitions",
    "funnel_step_timing",
    "linear_attribution",
]


def experiment_lift(
    events: DataFrame,
    assignments: DataFrame | None = None,
    *,
    success: Column,
    user_col: str = "user_id",
    variant_col: str = "variant",
    control: str = "control",
    variant_of: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Two-proportion conversion lift per variant vs a control.

    ``assignments`` maps ``user_col`` → ``variant_col`` (one row per
    user — a real experiment system's exposure table; tests derive it
    deterministically from the user id). A user converts if ANY of
    their events satisfies ``success``.

    Output per variant: ``users``, ``converters``, ``cvr`` (conversion
    rate), ``lift_abs`` / ``lift_rel_pct`` vs control, and ``z_score``
    from the pooled two-proportion test — the number an experimentation
    dashboard thresholds (|z| ≳ 1.96 ⇒ p < .05). The p-value itself
    needs Φ(z), which SQL engines don't share bit-exactly; z is the
    portable statistic.

    Plan shape: events collapse to per-user converted flags (one
    map-side-combinable shuffle), join the assignment table on the user
    key (co-partitioned shuffle join — both sides user-keyed, neither
    broadcast: at scale assignments has one row per exposed user), then
    a per-variant aggregate (|variants| rows) with the 1-row control
    stats broadcast back across it.

    **Deterministic-bucketing fast path**: when the assignment is a
    pure function of the user key (hash-mod bucketing — the standard
    experimentation design when no exposure log exists), pass
    ``variant_of`` (user id Column → variant Column) instead of an
    ``assignments`` table. Exposure is then the users OBSERVED in
    ``events`` (with an exposure log, users assigned but eventless also
    count as non-converters — pass the table when that distinction
    matters). Exposure and conversion collapse into
    ONE per-user aggregate — one events pass, one shuffle — instead of
    two aggregations over the same input joined back together
    (measured ~1.4× end-to-end on the silver-events lift query).
    The ``per_variant`` frame (|variants| rows) is lazily
    ``localCheckpoint``-ed either way: the control row is consumed by
    a second plan branch, and without the cut that branch re-executes
    the whole upstream per-user pipeline.
    """
    if (assignments is None) == (variant_of is None):
        raise ValueError(
            "experiment_lift: pass exactly one of assignments (exposure-"
            "log denominator: assigned-but-eventless users count as "
            "non-converters) / variant_of (OBSERVED-USER exposure: only "
            "users present in events enter the denominator — lift/z "
            "differ between the two modes on sparse traffic)"
        )
    converted = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(F.when(success, F.lit(1)).otherwise(F.lit(0))).alias("_conv")
    )
    if variant_of is not None:
        assigned = converted.withColumn(
            "variant", variant_of(F.col("_u"))
        )
    else:
        assigned = assignments.select(
            F.col(user_col).alias("_u"), F.col(variant_col).alias("variant")
        ).join(converted, "_u", "left").na.fill({"_conv": 0})
    per_variant = assigned.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("users"),
        F.sum("_conv").cast("bigint").alias("converters"),
    ).localCheckpoint(eager=False)
    ctrl = per_variant.filter(F.col("variant") == control).select(
        F.col("users").alias("_cu"), F.col("converters").alias("_cc")
    )
    j = per_variant.crossJoin(F.broadcast(ctrl))
    p1 = F.col("converters") / F.col("users")
    p0 = F.col("_cc") / F.col("_cu")
    pool = (F.col("converters") + F.col("_cc")) / (
        F.col("users") + F.col("_cu")
    )
    se = F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("users") + F.lit(1.0) / F.col("_cu"))
    )
    out = j.select(
        "variant",
        "users",
        "converters",
        round_half_up(p1 * 100.0, 2).alias("cvr_pct"),
        round_half_up((p1 - p0) * 100.0, 2).alias("lift_abs_pct"),
        round_half_up(
            (p1 - p0) * 100.0 / F.when(p0 != 0, p0), 2
        ).alias("lift_rel_pct"),
        round_half_up(
            (p1 - p0) / F.when(se != 0, se), 4
        ).alias("z_score"),
    )
    return out.orderBy("variant")


def session_transitions(
    silver: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "event_timestamp",
    type_col: str = "event_type",
    tiebreak_col: str = "event_unique_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Markov-style transition matrix of consecutive event types within
    a session: how users actually flow (view→cart, cart→purchase,
    view→exit …). ``exit`` is the absorbing state after a session's
    last event, so each session's out-degree equals its event count.

    One window pass computes BOTH the session boundary (gap > N
    seconds) and the next event type over the same (user, time)
    ordering — Catalyst fuses them into a single Window node, so raw
    events shuffle once on the user key. The transition count then
    aggregates |from×to| rows.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # exact integer microseconds: engine-portable (no fractional-epoch
    # truncation ambiguity at the gap boundary)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds) * F.lit(1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = (
        silver.select(user_col, ts_col, type_col, tiebreak_col)
        .withColumn("_new", new_sess)
        .withColumn("_sess", F.sum("_new").over(w))
        .withColumn("_next", F.lead(type_col).over(w))
        .withColumn("_next_new", F.lead("_new").over(w))
    )
    to_type = F.when(
        F.col("_next").isNull() | (F.col("_next_new") == 1), F.lit("exit")
    ).otherwise(F.col("_next"))
    out = (
        df.select(
            F.col(type_col).alias("from_type"), to_type.alias("to_type")
        )
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    w_share = Window.partitionBy("from_type")
    out = out.withColumn(
        "share_pct",
        round_half_up(
            F.col("n_transitions")
            * 100.0
            / F.sum("n_transitions").over(w_share),
            2,
        ),
    )
    return out.orderBy("from_type", "to_type")


def funnel_step_timing(
    silver: DataFrame,
    *,
    steps: tuple[str, str, str] = ("view", "cart", "purchase"),
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """How long users take to move through the funnel: per user, the
    FIRST occurrence of each step; then the distribution (median / p90,
    seconds) of first-step → mid-step and first-step → last-step gaps
    over users who completed them in order.

    One groupBy collapses events to a per-user 3-timestamp row (exact
    integer microseconds — conditional MIN is map-side combinable);
    the timing distribution is a single global aggregate over that
    collapsed table (1 output row — the bounded SinglePartition shape).
    Exact ``percentile`` keeps the oracle bit-exact; swap in
    ``approx_percentile`` for sketch-sized state at extreme user
    counts.
    """
    s0, s1, s2 = steps
    us = F.unix_micros(F.col(ts_col))

    def first_of(step: str) -> Column:
        return F.min(F.when(F.col(type_col) == step, us))

    firsts = silver.groupBy(user_col).agg(
        first_of(s0).alias("_t0"),
        first_of(s1).alias("_t1"),
        first_of(s2).alias("_t2"),
    )
    sec01 = F.when(
        F.col("_t1") >= F.col("_t0"),
        (F.col("_t1") - F.col("_t0")) / F.lit(1000000.0),
    )
    sec02 = F.when(
        F.col("_t2") >= F.col("_t0"),
        (F.col("_t2") - F.col("_t0")) / F.lit(1000000.0),
    )
    with_d = firsts.filter(F.col("_t0").isNotNull()).select(
        sec01.alias("_d01"), sec02.alias("_d02")
    )
    return with_d.agg(
        F.count(F.lit(1)).cast("bigint").alias(f"users_{s0}"),
        F.count("_d01").cast("bigint").alias(f"users_{s0}_to_{s1}"),
        F.count("_d02").cast("bigint").alias(f"users_{s0}_to_{s2}"),
        round_half_up(F.percentile("_d01", F.lit(0.5)), 2).alias(
            f"median_sec_{s0}_to_{s1}"
        ),
        round_half_up(F.percentile("_d01", F.lit(0.9)), 2).alias(
            f"p90_sec_{s0}_to_{s1}"
        ),
        round_half_up(F.percentile("_d02", F.lit(0.5)), 2).alias(
            f"median_sec_{s0}_to_{s2}"
        ),
        round_half_up(F.percentile("_d02", F.lit(0.9)), 2).alias(
            f"p90_sec_{s0}_to_{s2}"
        ),
    )


def linear_attribution(
    silver: DataFrame,
    *,
    touch_types: tuple[str, ...] = ("view", "cart"),
    purchase_type: str = "purchase",
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "event_timestamp",
    type_col: str = "event_type",
    id_col: str = "event_unique_id",
    price_col: str = "price",
) -> DataFrame:
    """Linear multi-touch revenue attribution: each purchase's revenue
    splits EQUALLY across the user's qualifying touches in the
    preceding ``window_days``; purchases with no touch in window land
    in a ``direct`` bucket. Output: attributed revenue + touch counts
    per (touch_date, touch_type) — the marketing-mix view the
    last-touch mart can't give.

    Determinism (oracle-exact) trick: a SUM of per-touch quotients is
    order-DEPENDENT in floating point, so each quotient (price /
    n_touches, both sides bit-identical doubles) is half-up-rounded to
    6 dp and cast to DECIMAL(18,6) BEFORE the aggregate — decimal sums
    are order-independent, so Spark and any ANSI engine agree exactly;
    the result rounds to cents at the end.

    Plan shape: purchases and touches are both user-keyed slices of one
    silver scan; the range join shuffles on the user key only
    (co-partitioned, no broadcast — both sides scale with events), the
    per-purchase fan-out is bounded by touches-per-user-week, and the
    touch count comes from a window over the purchase key rather than a
    second join.
    """
    us = F.unix_micros(F.col(ts_col))
    purchases = silver.filter(
        (F.col(type_col) == purchase_type) & F.col(price_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        us.alias("_pts"),
        F.col(id_col).alias("_pid"),
        F.col(price_col).alias("_price"),
        F.to_date(F.col(ts_col)).alias("_pdate"),
    )
    touches = silver.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_u"),
        us.alias("_tts"),
        F.col(type_col).alias("touch_type"),
        F.to_date(F.col(ts_col)).alias("touch_date"),
    )
    span = F.lit(int(window_days) * 86_400_000_000)
    j = purchases.join(
        touches,
        (purchases["_u"] == touches["_u"])
        & (touches["_tts"] <= purchases["_pts"])
        & (touches["_tts"] >= purchases["_pts"] - span),
        "left",
    ).drop(touches["_u"])
    w = Window.partitionBy("_pid")
    j = j.withColumn("_n", F.count("touch_type").over(w))
    share = F.col("_price") / F.col("_n")
    share6 = (
        F.floor(share * F.lit(1_000_000.0) + F.lit(0.5))
        / F.lit(1_000_000.0)
    ).cast("decimal(18,6)")
    attributed = j.select(
        F.when(F.col("touch_type").isNull(), F.lit("direct"))
        .otherwise(F.col("touch_type"))
        .alias("touch_type"),
        F.coalesce(F.col("touch_date"), F.col("_pdate")).alias("touch_date"),
        F.when(F.col("_n") == 0, F.col("_price").cast("decimal(18,6)"))
        .otherwise(share6)
        .alias("_rev"),
    )
    out = attributed.groupBy("touch_date", "touch_type").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        round_half_up(F.sum("_rev").cast("double"), 2).alias(
            "attributed_revenue"
        ),
    )
    return out.orderBy("touch_date", "touch_type")
