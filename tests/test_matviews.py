"""Materialized views: CREATE/REFRESH/DROP MATERIALIZED VIEW on the SQL
surface, persisted definitions, and IVM refresh through
plans/cdc.py::CdcAggregate (REFRESH folds only the change feed — the
at-scale replacement for the reference's recompute-every-run dbt marts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.sql import SqlError, execute_sql


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame(
        [
            ("d1", "u1", 10.0),
            ("d1", "u2", 20.0),
            ("d2", "u1", 5.0),
            ("d2", "u1", 7.0),
        ],
        ["day", "user", "amount"],
    )
    c.create_table("ev", src)
    return c


def _recompute(cat):
    rows = (
        cat.read("ev")
        .groupBy("day")
        .agg(
            F.sum(F.col("amount").cast("double")).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user").cast("bigint").alias("users"),
            F.max(F.col("amount").cast("double")).alias("mx"),
        )
        .collect()
    )
    return {r["day"]: (r["revenue"], r["n"], r["users"], r["mx"]) for r in rows}


def _mart(cat):
    return {
        r["day"]: (r["revenue"], r["n"], r["users"], r["mx"])
        for r in cat.read("mv_daily").collect()
    }


MV_SQL = (
    "CREATE MATERIALIZED VIEW mv_daily AS "
    "SELECT day, SUM(amount) AS revenue, COUNT(*) AS n, "
    "COUNT(DISTINCT user) AS users, MAX(amount) AS mx "
    "FROM ev GROUP BY day"
)


def test_create_builds_and_refresh_folds_increment(cat, spark):
    out = execute_sql(cat, MV_SQL)
    assert out["refresh"]["mode"] == "full"
    assert _mart(cat) == _recompute(cat)

    # definition persists across catalog instances
    cat2 = Catalog(spark, cat.root)
    assert "mv_daily" in cat2.materialized_views()

    # source DML, then REFRESH must fold incrementally and match
    cat.append("ev", spark.createDataFrame(
        [("d2", "u3", 100.0), ("d3", "u1", 1.0)],
        ["day", "user", "amount"],
    ))
    cat.delete_where("ev", "amount = 20.0", mode="mor")
    out = execute_sql(cat, "REFRESH MATERIALIZED VIEW mv_daily")
    assert out["mode"] == "incremental"
    assert _mart(cat) == _recompute(cat)

    # no new source version -> noop
    out = execute_sql(cat, "REFRESH MATERIALIZED VIEW mv_daily")
    assert out["mode"] == "noop"


def test_show_tables_kinds_and_drop_cleans_support(cat):
    execute_sql(cat, MV_SQL)
    kinds = {
        r["name"]: r["kind"]
        for r in execute_sql(cat, "SHOW TABLES").collect()
    }
    assert kinds["mv_daily"] == "materialized_view"
    assert kinds["ev"] == "table"
    # COUNT DISTINCT + MAX created support tables
    dv_tables = [t for t in cat.tables() if t.startswith("mv_daily__dv_")]
    assert len(dv_tables) == 2

    out = execute_sql(cat, "DROP MATERIALIZED VIEW mv_daily")
    assert out["op"] == "drop_materialized_view"
    assert "mv_daily" not in cat.materialized_views()
    assert not cat.table_exists("mv_daily")
    assert not [t for t in cat.tables() if t.startswith("mv_daily__dv_")]
    # IF EXISTS tolerates the now-missing view
    out = execute_sql(cat, "DROP MATERIALIZED VIEW IF EXISTS mv_daily")
    assert out["skipped"] is True


def test_or_replace_redefines(cat):
    execute_sql(cat, MV_SQL)
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(cat, MV_SQL)
    out = execute_sql(
        cat,
        "CREATE OR REPLACE MATERIALIZED VIEW mv_daily AS "
        "SELECT day, SUM(amount) AS revenue FROM ev GROUP BY day",
    )
    assert out["refresh"]["mode"] == "full"
    assert cat.read("mv_daily").columns == ["day", "revenue", "_n_rows"]


def test_unsupported_shapes_refuse_loudly(cat):
    for bad, why in [
        ("CREATE MATERIALIZED VIEW m AS SELECT day, SUM(amount) AS r "
         "FROM ev WHERE day = 'd1' GROUP BY day", "shape"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day, AVG(amount) AS a "
         "FROM ev GROUP BY day", "AVG"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day, COUNT(amount) AS c "
         "FROM ev GROUP BY day", "COUNT"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day, user, SUM(amount) AS r "
         "FROM ev GROUP BY day", "match"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day FROM ev GROUP BY day",
         "aggregate"),
    ]:
        with pytest.raises(SqlError, match=why):
            execute_sql(cat, bad)
    # nothing was persisted or built by the refusals
    assert cat.materialized_views() == {}
    assert not cat.table_exists("m")


def test_plain_table_name_collision_refuses(cat, spark):
    cat.create_table("mv_daily", spark.createDataFrame(
        [("x",)], ["c"]
    ))
    with pytest.raises(ValueError, match="plain table"):
        execute_sql(cat, MV_SQL)
