"""Source operators (SURVEY.md §2.1, S1–S5).

- S1 CSV scan with header + optional schema/inference
  (reference: spark/jobs/bronze_ingestion.py:156-159)
- S2 table scan by name/path
  (reference: spark/jobs/sync_gold_to_clickhouse.py:77)
- S4 in-memory rows source
  (reference: spark/jobs/schema_insert_data.py:20-31)

All reads are declarative ``spark.read`` — Catalyst gets predicate
pushdown, column pruning and partition pruning for free. At 100 TB the
parquet reader's vectorized scan + min/max skipping does the heavy
lifting; nothing imperative here.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet_table",
    "load_tables",
    "rows_source",
]

#: The driver fixture tables (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = True,
    header: bool = True,
) -> DataFrame:
    """S1: CSV scan. Prefer an explicit schema at scale — inference
    triggers an extra full pass over the files."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer).lower())
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    corrupt_column: str | None = "_corrupt_record",
) -> DataFrame:
    """S1 twin for JSON/NDJSON landing files.

    Default is line-delimited (one object per line — the splittable
    layout; ``multiline=True`` for whole-file documents, which cannot be
    split across tasks). With an explicit schema, malformed lines land
    in ``corrupt_column`` (PERMISSIVE mode) instead of failing the job —
    pair with ``quality.split_quarantine`` on that column for the
    bad-records side-output. Prefer an explicit schema at scale:
    inference is an extra full pass, and on NDJSON it samples every
    file.
    """
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        if corrupt_column and corrupt_column not in schema.fieldNames():
            from pyspark.sql.types import StringType

            schema = schema.add(corrupt_column, StringType(), True)
        if corrupt_column:
            reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
        reader = reader.schema(schema)
    return reader.json(path)


#: Cached-relation layer: memoized *logical plans* (DataFrame objects)
#: keyed by (Spark application id, path). ``spark.read.parquet`` re-lists
#: the directory and re-reads parquet footers on every call (~80 ms per
#: table locally, and a full object-store LIST at 100 TB); the fixture
#: tables are immutable, so the resolved relation — file index, schema,
#: statistics — can be built once per session and shared. Only the PLAN
#: is cached, never data: every action still scans parquet. This is the
#: same economics as a metastore-backed catalog table (resolve once,
#: query many) expressed for path-addressed fixtures. Keyed by
#: applicationId so a stopped/restarted session never sees a stale
#: relation bound to a dead JVM context.
_RELATION_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Resolve ``path`` as parquet once per (session, path); return the
    shared immutable DataFrame plan. Use ONLY for read-only inputs
    (fixture tables) — a path whose files mutate must use
    ``spark.read.parquet`` directly so the file index refreshes."""
    app = spark.sparkContext.applicationId
    key = (app, path)
    df = _RELATION_CACHE.get(key)
    if df is None:
        # evict entries from other (stopped/previous) sessions so the
        # cache never leaks plan objects bound to dead JVM contexts —
        # one live application's worth of relations is the bound
        for k in [k for k in _RELATION_CACHE if k[0] != app]:
            del _RELATION_CACHE[k]
        df = spark.read.parquet(path)
        _RELATION_CACHE[key] = df
    return df


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2: scan one fixture table (``{sf_dir}/{name}.parquet``)."""
    return cached_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S2 twin for ORC tables (Hive-ecosystem interop). Spark's native
    vectorized ORC reader gives the same pushdown/pruning/min-max
    skipping as parquet; partition directories discover identically."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: Iterable[str] = FIXTURE_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Scan fixture tables and (optionally) register them as temp views so
    both the DataFrame API and ``spark.sql`` entry points see them."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_parquet_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def rows_source(
    spark: SparkSession,
    rows: Sequence[tuple],
    columns: Sequence[str] | StructType,
) -> DataFrame:
    """S4: DataFrame from in-memory tuples."""
    if isinstance(columns, StructType):
        return spark.createDataFrame(rows, schema=columns)
    return spark.createDataFrame(rows, list(columns))
