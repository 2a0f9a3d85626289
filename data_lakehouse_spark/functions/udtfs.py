"""Python UDTF surface (Spark 4 ``@udtf``) — table-generating functions
for shapes the built-in generators don't cover, plus built-in twins
where they do.

The engine's stance (SURVEY.md §2.11): UDFs/UDTFs are the slow path —
every hot-path operator stays JVM-side. The UDTF here exists to cover
the API surface a reference user migrating custom table functions
needs, and its output is pinned EQUAL to the built-in
``explode(from_json(..))`` twin by tests (tests/test_udtf.py) and by
sharing the same DuckDB oracle in ``__spark_entry__`` — so claiming it
is backed by the same hash gate as everything else.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["json_kv_udtf", "explode_json_kv", "explode_json_kv_builtin"]


@udtf(returnType="prop_key: string, prop_value: string")
class _JsonKV:
    """Yield one (key, value-as-string) row per top-level JSON object
    entry. Scalars render like Spark's ``from_json → map<string,string>``
    coercion (numbers/booleans via their JSON literal text) so the UDTF
    and the built-in twin are row-for-row identical."""

    def eval(self, payload: str):  # noqa: D102 — UDTF protocol method
        if payload is None:
            return
        try:
            obj = json.loads(payload)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            if v is None:
                yield k, None
            elif isinstance(v, bool):
                yield k, "true" if v else "false"
            elif isinstance(v, str):
                yield k, v
            elif isinstance(v, float):
                # JSON floats: Spark renders via Jackson's text; repr()
                # matches for the common shortest-round-trip cases
                yield k, repr(v)
            elif isinstance(v, (dict, list)):
                # nested containers: Jackson-compact JSON text, like
                # from_json's string coercion of object/array values
                yield k, json.dumps(v, separators=(",", ":"))
            else:
                yield k, str(v)


# exported handle (the class object IS the registered UDTF callable)
json_kv_udtf = _JsonKV


def explode_json_kv(
    df: DataFrame, *, json_col: str = "props", id_col: str = "event_id"
) -> DataFrame:
    """UDTF path: lateral-join the Python UDTF against each row."""
    return df.lateralJoin(
        json_kv_udtf(F.col(json_col).outer())
    ).select(
        F.col(id_col).cast("bigint").alias(id_col), "prop_key", "prop_value"
    )


def explode_json_kv_builtin(
    df: DataFrame, *, json_col: str = "props", id_col: str = "event_id"
) -> DataFrame:
    """Built-in twin — the hot path: ``from_json`` to a string map and
    ``explode``; all JVM-side, whole-stage codegen eligible."""
    kv = F.explode(F.from_json(F.col(json_col), "map<string,string>"))
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        kv.alias("prop_key", "prop_value"),
    )
