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

__all__ = ["read_csv", "read_parquet_table", "load_tables", "rows_source"]

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


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2: scan one fixture table (``{sf_dir}/{name}.parquet``)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
