"""Open-format interoperability: export catalog tables as Apache
Iceberg v2 or Delta Lake tables readable by external engines, and read
such tables written by other engines."""

from data_lakehouse_spark.interop.delta import (  # noqa: F401
    export_delta,
    export_delta_history,
    read_delta,
)
from data_lakehouse_spark.interop.iceberg import (  # noqa: F401
    export_iceberg,
    export_iceberg_history,
    read_iceberg,
)

__all__ = [
    "export_delta",
    "export_delta_history",
    "export_iceberg",
    "export_iceberg_history",
    "read_delta",
    "read_iceberg",
]
