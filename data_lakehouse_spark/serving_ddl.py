"""Serving-engine DDL generation: gold marts → ClickHouse MergeTree.

The reference hand-maintains ``clickhouse/create_tables.sql`` (7
MergeTree tables with monthly ``toYYYYMM`` partitions, sort keys, and
``index_granularity 8192`` — create_tables.sql:22-25,55-61) and passes
a ``createTableOptions`` literal on every JDBC sync
(``spark/jobs/sync_gold_to_clickhouse.py:96``). Hand-maintained DDL
drifts the moment a mart adds a column; here the DDL is DERIVED from
the mart's live Spark schema plus a small per-mart serving spec (sort
key + partition column), so schema evolution in the lakehouse
propagates to the serving layer automatically.

Pieces:

- ``clickhouse_type``: Spark type → ClickHouse type (DecimalType
  carries precision/scale through; nullables wrap in ``Nullable``).
- ``clickhouse_ddl``: full ``CREATE TABLE IF NOT EXISTS`` statement in
  the reference's exact shape — nullable sort-key columns are wrapped
  ``ifNull(col, <zero>)`` in ORDER BY the way create_tables.sql:58-59
  does, because MergeTree sort keys reject NULLs by default.
- ``create_table_options``: just the engine clause, the string Spark's
  JDBC writer passes as ``createTableOptions`` so a first sync creates
  the table correctly server-side.
- ``GOLD_SERVING_SPECS`` + ``gold_serving_ddl``: the reference's seven
  marts, spec'd to match create_tables.sql line for line.
- ``sync_gold_marts``: the sync job — reads each mart from the catalog
  and JDBC-writes it with the generated options (the
  sync_gold_to_clickhouse.py analog, minus its quirk of passing a
  sort-key-less ``ORDER BY tuple()``).

Scale note: the serving tables are aggregates (days × categories ×
hours), orders of magnitude smaller than the fact tables; the JDBC
write is the mart's own partition count in parallel connections —
``numPartitions`` caps it so a 1000-partition mart doesn't open 1000
inserts against the serving engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "clickhouse_type",
    "clickhouse_ddl",
    "create_table_options",
    "GOLD_SERVING_SPECS",
    "gold_serving_ddl",
    "sync_gold_marts",
]

#: Spark → ClickHouse scalar type map (create_tables.sql uses Date /
#: DateTime / Int64 / Float64 / String / Decimal(p,s) / UInt8)
_SIMPLE = {
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.BooleanType: "UInt8",
    T.DateType: "Date",
    T.TimestampType: "DateTime",
    T.BinaryType: "String",
}


def clickhouse_type(dt: T.DataType, *, nullable: bool = False) -> str:
    """Render one Spark type as ClickHouse DDL."""
    if isinstance(dt, T.DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.ArrayType):
        # ClickHouse arrays can't nest Nullable inside Array for sort
        # keys; element nullability maps through for plain columns
        inner = clickhouse_type(dt.elementType, nullable=dt.containsNull)
        return f"Array({inner})"
    else:
        base = _SIMPLE.get(type(dt))
        if base is None:
            raise TypeError(
                f"no ClickHouse mapping for Spark type {dt.simpleString()}"
            )
    return f"Nullable({base})" if nullable else base


def _ifnull_zero(dt: T.DataType) -> str:
    """The reference's ORDER BY null-guard default for a type
    (create_tables.sql:58-59: strings → '', numerics → 0)."""
    if isinstance(dt, T.StringType):
        return "''"
    if isinstance(dt, (T.DateType, T.TimestampType)):
        return "toDate(0)" if isinstance(dt, T.DateType) else "toDateTime(0)"
    return "0"


@dataclass(frozen=True)
class ServingSpec:
    """How one mart lands in the serving engine."""

    table: str  # serving-side name (reference strips the gold_ prefix)
    order_by: tuple[str, ...]  # sort key columns (mart column names)
    partition_month: str | None = None  # toYYYYMM(<col>) partition
    settings: dict[str, int] = field(
        default_factory=lambda: {"index_granularity": 8192}
    )


def clickhouse_ddl(
    df: DataFrame,
    spec: ServingSpec,
    *,
    database: str | None = "lakehouse",
) -> str:
    """One ``CREATE TABLE IF NOT EXISTS`` in the reference's shape,
    derived from the mart's LIVE schema (no hand-maintained column
    lists to drift)."""
    schema = df.schema
    byname = {f.name: f for f in schema.fields}
    for c in spec.order_by + (
        (spec.partition_month,) if spec.partition_month else ()
    ):
        if c not in byname:
            raise KeyError(f"{spec.table}: sort/partition column {c!r} "
                           f"not in mart schema {list(byname)}")
    cols = ",\n".join(
        f"    {f.name} "
        f"{clickhouse_type(f.dataType, nullable=f.nullable and f.name != spec.partition_month)}"
        for f in schema.fields
    )
    qualified = f"{database}.{spec.table}" if database else spec.table
    lines = [
        f"CREATE TABLE IF NOT EXISTS {qualified}",
        "(",
        cols,
        ")",
        create_table_options(schema, spec),
    ]
    return "\n".join(lines) + ";"


def create_table_options(schema: T.StructType, spec: ServingSpec) -> str:
    """The engine clause alone — what Spark's JDBC writer appends via
    ``createTableOptions`` (sync_gold_to_clickhouse.py:96), here with a
    REAL sort key instead of the reference's ``ORDER BY tuple()``."""
    byname = {f.name: f for f in schema.fields}
    keys = []
    for c in spec.order_by:
        f = byname[c]
        if f.nullable and f.name != spec.partition_month:
            keys.append(f"ifNull({c}, {_ifnull_zero(f.dataType)})")
        else:
            keys.append(c)
    order = keys[0] if len(keys) == 1 else "(" + ", ".join(keys) + ")"
    parts = ["ENGINE = MergeTree()"]
    if spec.partition_month:
        parts.append(f"PARTITION BY toYYYYMM({spec.partition_month})")
    parts.append(f"ORDER BY {order}")
    if spec.settings:
        parts.append(
            "SETTINGS "
            + ", ".join(f"{k} = {v}" for k, v in spec.settings.items())
        )
    return "\n".join(parts)


#: the reference's seven serving tables, matched to
#: clickhouse/create_tables.sql clause for clause (partition + sort key)
GOLD_SERVING_SPECS: dict[str, ServingSpec] = {
    "gold_daily_sales_summary": ServingSpec(
        "daily_sales_summary", ("sale_date",), partition_month="sale_date"
    ),
    "gold_product_performance": ServingSpec(
        "product_performance", ("category_level_1", "total_revenue")
    ),
    "gold_category_performance": ServingSpec(
        "category_performance",
        ("analysis_date", "category_level_1", "total_revenue"),
        partition_month="analysis_date",
    ),
    "gold_user_rfm_segments": ServingSpec(
        "user_rfm_segments", ("rfm_segment", "monetary_value")
    ),
    "gold_conversion_funnel_daily": ServingSpec(
        "conversion_funnel_daily",
        ("analysis_date", "category_level_1", "time_of_day"),
        partition_month="analysis_date",
    ),
    "gold_user_journey_funnel": ServingSpec(
        "user_journey_funnel", ("current_funnel_stage", "user_id")
    ),
    "gold_hourly_traffic": ServingSpec(
        "hourly_traffic",
        ("event_date", "event_hour"),
        partition_month="event_date",
    ),
}


def gold_serving_ddl(catalog, *, database: str | None = "lakehouse") -> dict[str, str]:
    """Generate the full create_tables.sql analog from the catalog's
    LIVE mart schemas: {serving_table: DDL}. Marts not yet
    materialized are skipped (the sync creates them on first landing
    via createTableOptions anyway)."""
    out: dict[str, str] = {}
    for mart, spec in GOLD_SERVING_SPECS.items():
        if not catalog.table_exists(mart):
            continue
        out[spec.table] = clickhouse_ddl(
            catalog.read(mart), spec, database=database
        )
    return out


def sync_gold_marts(
    catalog,
    url: str,
    *,
    driver: str | None = None,
    mode: str = "overwrite",
    num_partitions: int = 8,
    options: dict[str, str] | None = None,
) -> dict[str, int]:
    """The sync_gold_to_clickhouse.py analog over any JDBC serving
    engine: each materialized mart lands with its generated
    createTableOptions so a fresh serving database gets the right
    MergeTree layout on first sync. Returns {serving_table: rows}.

    Default ``mode='overwrite'`` (+ truncate) — the reference CLAIMS
    overwrite idempotency but ships append (SURVEY.md §4 #2); this is
    the fixed behavior, and re-running a sync stays idempotent."""
    from data_lakehouse_spark.sources.writers import jdbc_sink

    out: dict[str, int] = {}
    for mart, spec in GOLD_SERVING_SPECS.items():
        if not catalog.table_exists(mart):
            continue
        df = catalog.read(mart)
        n = df.count()
        if n == 0 and mode != "overwrite":
            continue  # append of nothing is a no-op; skip the write
        # an EMPTY mart still syncs under overwrite: truncate must
        # propagate emptiness, or dashboards keep serving stale rows
        # the lakehouse no longer has
        opts = {
            "createTableOptions": create_table_options(df.schema, spec),
            "numPartitions": str(num_partitions),
            "truncate": "true",
            **(options or {}),
        }
        if driver:
            opts["driver"] = driver
        jdbc_sink(df, url, spec.table, mode=mode, options=opts)
        out[spec.table] = n
    return out
