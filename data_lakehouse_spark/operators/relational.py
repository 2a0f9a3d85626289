"""Generic relational operators rounding out the engine surface
(SURVEY.md §2.3 joins, §2.4 aggs, §2.5 windows, §2.6 sorts/top-k,
§2.7 set ops, plus rollup/cube extensions).

The reference only *uses* one join shape (J1 3-key left) but our engine
exposes the full surface; each helper is a thin, Catalyst-friendly
composition — no custom execution, so pushdown/AQE/codegen all apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "top_k",
    "semi_join",
    "anti_join",
    "union_counts",
    "share_of_total",
    "watermark_filter",
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_agg",
    "tumbling_window_agg",
    "top_1_per_group",
    "asof_join",
    "range_join",
    "salted_join",
    "global_order_index",
    "ntile_from_row_number",
]


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3: ORDER BY … LIMIT k — Catalyst plans TakeOrderedAndProject
    (per-partition heap + single merge; no global sort at scale)."""
    return df.orderBy(*order).limit(k)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right``."""
    return left.join(right, on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """NOT EXISTS: rows of ``left`` without a match in ``right``."""
    return left.join(right, on=list(on), how="left_anti")


def union_counts(tables: dict[str, DataFrame]) -> DataFrame:
    """U1: k-way UNION ALL of per-table row counts
    (reference: dags/05_clickhouse_complete_setup.py:301-354)."""
    parts = [
        df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("row_count"),
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def share_of_total(
    df: DataFrame, group_col: str, *, count_alias: str = "cnt"
) -> DataFrame:
    """W4: grouped counts + % of grand total via an unbounded window
    (reference: bronze_ingestion.py:230-238). The window input is the
    tiny aggregated result, so the single-partition frame is safe."""
    counts = df.groupBy(group_col).agg(F.count("*").cast("bigint").alias(count_alias))
    total = F.sum(count_alias).over(Window.partitionBy())
    return counts.withColumn(
        "pct",
        F.floor(F.col(count_alias) * 100.0 / total * 100 + F.lit(0.5)).cast("double")
        / 100,
    )


def watermark_filter(
    df: DataFrame,
    watermark_df: DataFrame,
    col: str,
    watermark_expr: Column,
    *,
    empty_means_full: bool = True,
) -> DataFrame:
    """P9: incremental high-watermark predicate
    ``WHERE col > (SELECT MAX(expr) FROM target)``.

    The scalar is reduced driver-side (one tiny job) and folded into the
    scan filter as a literal → parquet min/max skipping + partition
    pruning apply.

    NULL watermark (empty target): ``empty_means_full=True`` (default)
    returns the full scan — the incremental-materialization semantics
    (first run processes everything; the reference's dbt
    ``is_incremental()`` guard behaves the same). This deliberately
    DIVERGES from bare SQL ``col > (SELECT MAX(...))``, where the NULL
    scalar makes the predicate UNKNOWN and returns zero rows; pass
    ``empty_means_full=False`` for those SQL NULL semantics (used when
    comparing against a SQL oracle on a fixture whose watermark source
    can be empty).
    """
    wm = watermark_df.agg(F.max(watermark_expr)).first()[0]
    if wm is None:
        return df if empty_means_full else df.filter(F.lit(False))
    return df.filter(F.col(col) > F.lit(wm))


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ROLLUP — subtotal hierarchy (engine extension; the
    reference computes totals with separate queries)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations (engine
    extension)."""
    return df.cube(*keys).agg(*aggs)


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """GROUP BY GROUPING SETS — explicit grouping-set list (the general
    form rollup/cube specialize). One shuffle; Spark expands the sets
    map-side like ROLLUP/CUBE, so cost matches a union of grouped aggs
    without re-scanning the input per set."""
    return df.groupingSets([list(s) for s in sets], *keys).agg(*aggs)


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """GROUP BY + PIVOT with an explicit value list.

    The value list is mandatory: it fixes the output schema (required
    for any production sink) and skips the extra distinct-values job
    Spark otherwise runs — at 100 TB an unbounded pivot domain is a bug,
    not a feature.
    """
    return df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).agg(agg)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the nearest right row within
    the same ``on`` keys — ``direction="backward"`` (default) takes the
    greatest ``right_ts`` ≤ ``left_ts``, ``direction="forward"`` the
    smallest ``right_ts`` ≥ ``left_ts`` (pandas ``merge_asof``
    directions; DuckDB ``ASOF JOIN`` with ``>=`` resp. ``<=``).
    ``tolerance_seconds`` NULLs out matches farther than the bound
    (merge_asof ``tolerance``), applied post-carry so it never changes
    the join shape.

    Implemented as the scalable union+window pattern, not a range join:
    tag sides, union, then one hash-partition on the keys with a single
    sort by (ts, side) where right rows order before left rows at equal
    timestamps; ``last(value, ignorenulls=True)`` over the unbounded-
    preceding frame carries the latest right values forward. One
    shuffle, state never leaves the partition — the same shape Spark
    plans for sessionization, and it degrades gracefully under key skew
    (AQE splits the sort spill, no n×m range-join blowup).

    Output: all left rows + ``asof_<right_ts>`` + ``asof_<c>`` for each
    requested right value column (NULL when no prior right row).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    on = list(on)
    carry = [right_ts, *right_value_cols]
    from pyspark.sql.types import StructField, StructType

    carry_fields = {f.name: f for f in right.schema.fields}
    carry_type = StructType([StructField(c, carry_fields[c].dataType) for c in carry])

    # the carried right row travels as ONE struct so all asof_* outputs
    # come from the same right row even when value columns hold NULLs
    l2 = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(carry_type).alias("_rv"),
    )
    left_fields = {f.name: f.dataType for f in left.schema.fields}
    r2 = right.select(
        *[
            F.lit(None).cast(left_fields[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        *on,
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(c) for c in carry]).alias("_rv"),
    )
    u = l2.unionByName(r2)
    # backward: ascending time, right rows first at equal ts → the last
    # carried right row is the greatest right_ts ≤ left_ts. forward:
    # DESCENDING time (right still first at equal ts) → the last carried
    # right row is the smallest right_ts ≥ left_ts. Same single-shuffle
    # union+window shape either way.
    ts_order = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_rv_last", F.last("_rv", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(left_ts).cast("double")
            - F.col("_rv_last").getField(right_ts).cast("double")
        )
        out = out.withColumn(
            "_rv_last",
            F.when(gap <= F.lit(float(tolerance_seconds)), F.col("_rv_last")),
        )
    for c in carry:
        out = out.withColumn(f"asof_{c}", F.col("_rv_last").getField(c))
    return out.drop("_side", "_ats", "_rv", "_rv_last")


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    *,
    fact_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Interval containment join: fact rows matched to range rows where
    ``start_col <= fact_col < end_col`` (half-open, so adjacent ranges
    never double-match).

    A pure range predicate has no equi-key, so Spark plans a nested-loop
    join — correct but O(n·m). The scalable stance: the ranges side is a
    calendar/config dimension (thousands of rows, not billions), so
    BROADCAST it and the join is one streaming pass over the facts with
    an in-memory interval probe per row. If both sides are huge, don't
    use this — discretize the fact timestamp to a bucket key and
    equi-join on the bucket (the tumbling_window_agg shape).
    """
    r = F.broadcast(ranges) if broadcast_ranges else ranges
    cond = (facts[fact_col] >= r[start_col]) & (facts[fact_col] < r[end_col])
    return facts.join(r, cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: explode ONE hot-key shuffle partition into
    ``salt`` sub-partitions.

    The left (big, skewed) side gets a deterministic salt from
    ``xxhash64`` of its whole row pmod salt — spreading a hot key's rows
    across ``salt`` reducers; the right side replicates each row
    ``salt`` times (explode of a literal range) so every sub-partition
    still finds its match. Shuffle keys become (key..., _salt). Right
    side grows ×salt — use when the right side is far smaller than the
    hot key's row count but too big/high-cardinality to broadcast
    outright (the broadcast-vs-salt decision). AQE's skew-join handles
    sort-merge skew automatically (enabled in session.py); explicit
    salting remains for aggregation-feeding joins and engines where the
    hot key exceeds what AQE sub-splits.

    Deterministic (hash salt, not rand()) → reproducible across retries,
    which matters for exactly-once sinks.
    """
    on = list(on)
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l2 = left.withColumn("_salt", lsalt)
    r2 = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, on + ["_salt"], how).drop("_salt")


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Event-time tumbling window aggregate (batch twin of the
    streaming operator in streaming/pipeline.py)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *extra_keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "event_timestamp",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization (lag + running-sum windows; engine
    extension — the reference has no session logic).

    Adds ``session_idx`` (0-based per user). Both windows share one
    hash-partition on user_id, so this is a single shuffle; state never
    leaves the partition (same property Structured Streaming's
    session_window exploits).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # exact integer microsecond arithmetic (no float epoch drift)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_sess = F.when(
        prev_ts.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_sess", new_sess).withColumn(
        "session_idx", F.sum("_new_sess").over(running).cast("bigint") - 1
    ).drop("_new_sess")


def top_1_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """W2: rank-then-filter keep-best-per-group."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def global_order_index(
    df: DataFrame,
    order: Sequence[Column],
    *,
    running_sum_col: str | None = None,
    rn_col: str = "_rn",
    cum_col: str = "_cum",
    max_partitions: int = 100_000,
):
    """EXACT global row_number (and optional exact inclusive running
    sum) over a total order — with no single-partition stage at any
    input size.

    The classic ``Window.orderBy(...)`` global window funnels every row
    through ONE task; this helper is the distributed replacement when
    exact total-order semantics (NTILE parity, cumulative shares) must
    survive 100 TB:

    1. range-exchange on ``order`` (``repartitionByRange`` — parallel,
       skew-split because tie-breaking columns participate in the
       boundaries) + ``sortWithinPartitions`` (local sort, no shuffle);
    2. ``monotonically_increasing_id`` freezes (partition, local rank)
       into one long — pid in the upper bits, the post-sort row index
       in the lower 33;
    3. ONE bounded driver collect of per-partition (count[, sum]) —
       ≤ ``spark.sql.shuffle.partitions`` rows, fail-fast capped at
       ``max_partitions`` — turned into dense offset-array literals
       (O(1) ``element_at`` lookup per row);
    4. global row_number = row_offset[pid] + local_index + 1; the
       optional running sum adds a per-partition window
       (``partitionBy(_pid)`` — hash exchange, 1/P of the data per
       task, never a global funnel) plus the sum offset.

    This is the ``corpus.pack_shards`` offset design with the offset
    table lifted to the driver, so not even a P-row single-partition
    window remains in the plan.

    **Recompute safety**: range boundaries are SAMPLED per exchange
    execution (shuffle fetch order varies across executions, so a
    recompute can land different boundaries), and the driver-side
    offset literals are only valid for the one materialized
    partitioning. The exchanged frame is therefore
    ``localCheckpoint(eager=True)``-ed — the LINEAGE IS CUT, so no
    later action can ever silently recompute the exchange under stale
    offsets: results come from the checkpointed blocks or the job
    fails loudly (block loss), never wrong. This also closes the cache
    leak persist() had: RDD-level checkpoint blocks are released by
    the ContextCleaner when the frame is garbage collected, unlike
    CacheManager entries which outlive every reference until an
    explicit unpersist. The checkpointed handle is still returned for
    callers that want deterministic release (``unpersist`` on it is a
    safe no-op for correctness either way).

    Returns ``(out_df, n_total, grand_sum, cached)``: ``out_df`` has
    the input columns plus ``rn_col`` (bigint, 1-based) and — when
    ``running_sum_col`` is set — ``cum_col`` (inclusive prefix sum in
    the metric's Spark sum type); ``n_total`` is the exact row count,
    ``grand_sum`` the exact column total (python value, None when no
    sum column), ``cached`` the persisted intermediate frame.
    """
    order = list(order)
    d = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    pid = F.shiftrightunsigned(F.col("_mid"), 33)
    aggs = [F.count("*").alias("_n")]
    sum_type = None
    if running_sum_col is not None:
        aggs.append(F.sum(running_sum_col).alias("_s"))
        sum_type = (
            df.select(F.sum(running_sum_col).alias("_s"))
            .schema[0]
            .dataType.simpleString()
        )
    stats = d.groupBy(pid.alias("_pid")).agg(*aggs).collect()
    if len(stats) > max_partitions:
        raise ValueError(
            f"global_order_index: {len(stats)} partitions exceeds the "
            f"driver-side offset-table cap ({max_partitions}); lower "
            "spark.sql.shuffle.partitions or raise max_partitions"
        )
    by_pid = {r["_pid"]: r for r in stats}
    nparts = (max(by_pid) + 1) if by_pid else 1
    row_off: list[int] = []
    sum_off: list = []
    run_n = 0
    run_s = None
    if running_sum_col is not None:
        import decimal

        run_s = decimal.Decimal(0) if sum_type.startswith("decimal") else 0
    for p in range(nparts):
        row_off.append(run_n)
        if running_sum_col is not None:
            sum_off.append(run_s)
        r = by_pid.get(p)
        if r is not None:
            run_n += r["_n"]
            if running_sum_col is not None and r["_s"] is not None:
                run_s += r["_s"]
    n_total, grand_sum = run_n, run_s

    local_idx = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    idx = (pid + 1).cast("int")
    row_off_arr = F.array(*[F.lit(x) for x in row_off])
    out = d.withColumn(
        rn_col,
        (F.element_at(row_off_arr, idx) + local_idx + F.lit(1)).cast(
            "bigint"
        ),
    )
    if running_sum_col is not None:
        out = out.withColumn("_pid", pid)
        w = (
            Window.partitionBy("_pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sum_off_arr = F.array(
            *[F.lit(x).cast(sum_type) for x in sum_off]
        )
        out = out.withColumn(
            cum_col,
            (
                F.element_at(sum_off_arr, idx)
                + F.sum(running_sum_col).over(w)
            ).cast(sum_type),
        ).drop("_pid")
    return out.drop("_mid"), n_total, grand_sum, d


def ntile_from_row_number(rn: Column, n: int, k: int) -> Column:
    """Exact ``NTILE(k)`` bucket from a global 1-based row_number over
    the same total order, with ``n`` total rows known driver-side —
    SQL-standard semantics: the first ``n mod k`` buckets hold
    ``n div k + 1`` rows, the rest ``n div k``. Pairs with
    :func:`global_order_index` to replace a global-window NTILE with a
    distributed plan at identical results.

    Division runs on DECIMAL(38,0) so the floor is exact for any
    bigint row_number (no double mantissa loss).
    """
    q, r = divmod(n, k)
    if q == 0:
        # fewer rows than buckets: row i is bucket i
        return rn.cast("bigint")
    big = r * (q + 1)

    def _ceil_div(num: Column, den: int) -> Column:
        return F.floor(
            (num + F.lit(den - 1)).cast("decimal(38,0)") / F.lit(den)
        ).cast("bigint")

    return F.when(rn <= F.lit(big), _ceil_div(rn, q + 1)).otherwise(
        F.lit(r) + _ceil_div(rn - F.lit(big), q)
    )
