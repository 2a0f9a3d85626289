"""Silver-layer transform: clean → derive → dedup.

Reproduces the reference's silver model semantics
(``dbt/models/silver/silver_ecommerce_events.sql``) over any
event-shaped input via a column mapping:

- event_unique_id  MD5 over key parts, NULL sentinel   (:24-29, D6)
- timestamp parts  date/hour/day-of-week               (:32-35)
- normalization    LOWER/TRIM event_type, TRIM session, UPPER brand (:38-65)
- category split   dot-split → 3 NULL-safe levels      (:47-61, D5)
- price            validation + bucket                 (:70-84, D1/D2)
- time bands       time_of_day / is_weekend            (:87-98, D3/D4)
- dedup            ROW_NUMBER keep-latest              (:111-123, W1)

Scale notes: the whole transform is a single narrow projection fused
into the scan by codegen; the only shuffle is the dedup window's hash
partition on event_unique_id (a high-cardinality, well-distributed MD5 —
no skew). A deterministic tiebreaker column makes keep-latest total and
reproducible across engines/retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_spark.functions import scalars

__all__ = ["silver_events", "TS_FMT"]

#: Deterministic timestamp render used inside event_unique_id (both the
#: Spark plan and the DuckDB oracle format to microsecond precision).
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def silver_events(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    price_col: str = "value",
    product_col: str | None = None,
    category_col: str | None = None,
    brand_col: str | None = None,
    session_col: str | None = None,
    json_props_col: str | None = "props",
    dedup_tiebreaker: str | None = "event_id",
    order_by_col: str | None = None,
    dedup: bool = True,
    cluster_by: str | None = None,
) -> DataFrame:
    """Build the silver event table from a raw event-shaped DataFrame.

    ``order_by_col`` is the ingestion-time column the reference's W1
    dedup orders on (``_bronze_ingestion_time DESC``); defaults to the
    event timestamp when absent. ``dedup_tiebreaker`` totalizes the
    ordering (the reference leaves ties nondeterministic).

    ``dedup=False`` skips the keep-latest window (and its full-width
    hash-partition shuffle) entirely. ONLY for consumers whose result
    is provably dedup-invariant: the dedup key ``event_unique_id``
    functionally determines (user_id, event_type, event_timestamp) and
    therefore every timestamp-derived column, and dedup keeps exactly
    one row per key group — so any aggregate that depends only on the
    DISTINCT SET of key-determined column tuples (COUNT(DISTINCT …),
    MIN/MAX over them, HLL sketches of them) is identical with or
    without the window. Aggregates that count rows or read survivor-
    dependent columns (price, prop_k, event_id) MUST keep dedup=True.
    Skipping also lets Catalyst prune the md5/date_format expressions
    that exist only to build the dedup key.

    ``cluster_by`` (an OUTPUT column name, e.g. ``"user_id"``) makes the
    dedup exchange REUSABLE by downstream operators keyed on that
    column: rows are hash-repartitioned on it once (AQE-coalescible —
    no partition count pinned) and the keep-latest window partitions by
    ``(cluster_by, event_unique_id)`` instead of the key alone. The
    grouping is identical (``event_unique_id`` functionally determines
    user_id/event_type/timestamp), and ``hashpartitioning(cluster_by)``
    satisfies the window's clustered distribution, so the plan holds ONE
    full-width exchange where a downstream window/groupBy on
    ``cluster_by`` would otherwise force a second (guide §2.4). Only
    worth it when the consumer IS keyed by that column; hot-key skew on
    ``cluster_by`` behaves exactly like the consumer's own shuffle did.
    """
    ts_field = events.schema[ts_col].dataType.typeName()
    if ts_field in ("long", "bigint"):
        # Nanosecond parquet timestamps surfaced as long via
        # spark.sql.legacy.parquet.nanosAsLong → truncate to micros.
        ts = F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    else:
        ts = F.col(ts_col).cast("timestamp")

    def opt(name: str | None) -> Column:
        return F.col(name) if name else F.lit(None).cast("string")

    ts_str = F.date_format(ts, TS_FMT)
    uid = scalars.event_unique_id(
        F.col(user_col).cast("string"),
        opt(product_col),
        F.col(type_col),
        ts_str,
    )

    cat1, cat2, cat3 = scalars.split_category(opt(category_col))
    price = F.col(price_col).cast("double")

    event_hour = F.hour(ts).cast("bigint")
    derived = [
        uid.alias("event_unique_id"),
        ts.alias("event_timestamp"),
        F.to_date(ts).alias("event_date"),
        event_hour.alias("event_hour"),
        F.dayofweek(ts).cast("bigint").alias("day_of_week_num"),
        F.lower(F.trim(F.col(type_col))).alias("event_type"),
        F.col(user_col).cast("bigint").alias("user_id"),
        (
            F.trim(opt(session_col)) if session_col else F.lit(None).cast("string")
        ).alias("user_session"),
        (
            F.col(product_col).cast("bigint")
            if product_col
            else F.lit(None).cast("bigint")
        ).alias("product_id"),
        cat1.alias("category_level_1"),
        cat2.alias("category_level_2"),
        cat3.alias("category_level_3"),
        (
            F.when(opt(brand_col).isNotNull(), F.upper(F.trim(opt(brand_col))))
            if brand_col
            else F.lit(None).cast("string")
        ).alias("brand"),
        scalars.validated_price(price).alias("price"),
        scalars.price_bucket(price).alias("price_bucket"),
        scalars.time_of_day(event_hour).alias("time_of_day"),
        scalars.is_weekend(ts).alias("is_weekend"),
    ]
    passthrough = [
        F.col(c)
        for c in events.columns
        if c
        not in {
            "event_unique_id", "event_timestamp", "event_date", "event_hour",
            "day_of_week_num", "event_type", "user_id", "user_session",
            "product_id", "category_level_1", "category_level_2",
            "category_level_3", "brand", "price", "price_bucket",
            "time_of_day", "is_weekend",
        }
    ]
    # One select instead of a 17-deep withColumn chain: each withColumn
    # adds an analyzer/projection layer; a single projection is both
    # cheaper to plan and guaranteed to fuse into one codegen stage.
    out = events.filter(F.col(user_col).isNotNull()).select(*passthrough, *derived)

    # W1 dedup: keep the latest row per event_unique_id via the
    # rank-then-filter window. Measured against the max_by(struct(...))
    # hash-agg alternative: the wide payload struct pushes that plan
    # into ObjectHashAggregate outside whole-stage codegen and it loses
    # (~1.7× slower end-to-end at sf0.1), while row_number stays in the
    # codegen window exec — one hash-partition shuffle on a uniform MD5
    # key either way.
    if dedup:
        order_col = (
            F.col(order_by_col) if order_by_col else F.col("event_timestamp")
        )
        ordering = [order_col.desc()]
        if dedup_tiebreaker:
            ordering.append(F.col(dedup_tiebreaker).desc())
        part_cols = ["event_unique_id"]
        if cluster_by:
            out = out.repartition(F.col(cluster_by))
            part_cols = [cluster_by, "event_unique_id"]
            if order_by_col is None:
                # Shared-sort form (guide §2.4): event_timestamp is
                # key-determined (the dedup key md5's the microsecond-
                # rendered timestamp, lossless for Spark's µs
                # timestamps), so it is CONSTANT within each dedup
                # group — adding it to the PARTITION spec changes
                # neither the grouping nor the survivor, and the
                # keep-latest ordering reduces to the tiebreaker. The
                # window's required child ordering becomes
                # (cluster_by ASC, event_timestamp ASC,
                # event_unique_id ASC, tiebreak DESC), of which a
                # downstream window ordered (cluster_by, ts,
                # event_unique_id) is a PREFIX — its Sort node is
                # eliminated, so ONE sort serves both the dedup and
                # the consumer window. Only valid when the dedup
                # orders on the key-determined event time (order_by_col
                # None); an ingestion-time ordering column is NOT
                # key-determined and keeps the original spec.
                part_cols = [cluster_by, "event_timestamp", "event_unique_id"]
                if dedup_tiebreaker:
                    ordering = [F.col(dedup_tiebreaker).desc()]
        w = Window.partitionBy(*part_cols).orderBy(*ordering)
        out = (
            out.withColumn("row_num", F.row_number().over(w))
            .filter(F.col("row_num") == 1)
            .drop("row_num")
        )

    # JSON extraction AFTER the dedup filter: get_json_object is the
    # most expensive expression in the transform; running it post-dedup
    # parses only surviving rows and keeps the parsed column out of the
    # dedup shuffle. Safe because the dedup key/ordering never reads it.
    if json_props_col:
        out = out.withColumn(
            "prop_k", F.get_json_object(F.col(json_props_col), "$.k").cast("bigint")
        )
    return out
