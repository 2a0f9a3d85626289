"""ANALYZE TABLE column statistics (catalog.analyze_table /
column_stats / show_stats + the SQL router's ANALYZE / SHOW STATS
verbs). Stats are per-snapshot sidecars: never served for a version
they weren't computed at."""

from __future__ import annotations

import pytest

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.sql import SqlError, execute_sql


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [
            (1, "alpha", 10.0),
            (2, "beta", None),
            (3, "beta", 30.0),
            (4, None, 40.0),
        ],
        "id bigint, name string, amount double",
    )
    c.create_table("t", df)
    return c


def test_analyze_computes_exact_counts_and_bounds(cat):
    stats = cat.analyze_table("t")
    assert stats["row_count"] == 4
    cols = stats["columns"]
    assert set(cols) == {"id", "name", "amount"}
    assert cols["id"]["null_count"] == 0
    assert cols["name"]["null_count"] == 1
    assert cols["amount"]["null_count"] == 1
    assert cols["id"]["min"] == "1" and cols["id"]["max"] == "4"
    assert cols["name"]["min"] == "alpha" and cols["name"]["max"] == "beta"
    # tiny cardinalities: HLL++ is exact at this scale
    assert cols["id"]["ndv"] == 4
    assert cols["name"]["ndv"] == 2
    # avg serialized length only for strings
    assert cols["name"]["avg_len"] == pytest.approx(4.33, abs=0.01)
    assert "avg_len" not in cols["amount"]


def test_stats_are_version_pinned(cat, spark):
    cat.analyze_table("t", ["id"])
    v0 = cat.column_stats("t")["version"]
    cat.append("t", spark.createDataFrame(
        [(5, "gamma", 50.0)], "id bigint, name string, amount double"
    ))
    # the new head was never analyzed: no stale serving
    assert cat.column_stats("t") is None
    # the analyzed snapshot still answers under explicit version
    assert cat.column_stats("t", version=v0)["columns"]["id"]["ndv"] == 4
    # re-analyze picks up the append
    assert cat.analyze_table("t", ["id"])["row_count"] == 5


def test_analyze_unknown_column_refuses(cat):
    with pytest.raises(ValueError, match="unknown columns"):
        cat.analyze_table("t", ["nope"])


def test_show_stats_requires_analysis(cat):
    with pytest.raises(ValueError, match="no statistics"):
        cat.show_stats("t")


def test_sql_analyze_and_show_stats(cat):
    out = execute_sql(
        cat, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS id, name"
    )
    assert out == {
        "op": "analyze", "table": "t", "version": 0,
        "row_count": 4, "n_columns": 2,
    }
    rows = {
        r["column"]: r
        for r in execute_sql(cat, "SHOW STATS FOR t").collect()
    }
    assert set(rows) == {"id", "name"}
    assert rows["name"]["ndv"] == 2
    assert rows["name"]["null_count"] == 1
    assert rows["id"]["avg_len"] is None

    # FOR ALL COLUMNS and bare COMPUTE STATISTICS are the full set
    out = execute_sql(
        cat, "ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS"
    )
    assert out["n_columns"] == 3

    with pytest.raises(SqlError, match="ANALYZE TABLE"):
        execute_sql(cat, "ANALYZE TABLE t")
