"""Open-format interoperability: export catalog tables as Apache
Iceberg v2 tables readable by external engines, and read Iceberg
tables written by other engines."""

from data_lakehouse_spark.interop.iceberg import (  # noqa: F401
    export_iceberg,
    read_iceberg,
)

__all__ = ["export_iceberg", "read_iceberg"]
