from data_lakehouse_spark.sources.readers import (
    load_tables,
    read_csv,
    read_parquet_table,
    rows_source,
)
from data_lakehouse_spark.sources.writers import (
    append_table,
    jdbc_sink,
    replace_table,
)

__all__ = [
    "append_table",
    "jdbc_sink",
    "load_tables",
    "read_csv",
    "read_parquet_table",
    "replace_table",
    "rows_source",
]
