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
    assert set(cat.read("mv_daily").columns) == {
        "day", "revenue", "_sum_n_revenue", "_n_rows"
    }


def test_unsupported_shapes_refuse_loudly(cat):
    for bad, why in [
        ("CREATE MATERIALIZED VIEW m AS SELECT day, SUM(amount) AS r "
         "FROM ev GROUP BY day HAVING SUM(amount) > 1", "match|shape"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day, "
         "PERCENTILE(amount, 0.5) AS p FROM ev GROUP BY day", "sketch"),
        ("CREATE MATERIALIZED VIEW m AS SELECT day, SUM(DISTINCT amount) "
         "AS r FROM ev GROUP BY day", "DISTINCT"),
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


def test_avg_count_col_where_ivm_equals_recompute(cat, spark):
    """The widened IVM surface: AVG (maintained SUM/COUNT pair),
    COUNT(col) (signed non-NULL count), and a WHERE scope — refresh
    after inserts AND deletes must equal a full recompute, including
    the avg-goes-NULL edge (every non-NULL value of a group deleted)."""
    c = cat
    # add NULL-able measure rows via a second source table
    extra = spark.createDataFrame(
        [("d3", "u9", None), ("d1", "u3", None)],
        "day string, user string, amount double",
    )
    c.append("ev", extra)
    execute_sql(
        c,
        "CREATE MATERIALIZED VIEW mv_scoped AS "
        "SELECT day, AVG(amount) AS avg_amt, COUNT(amount) AS n_vals, "
        "COUNT(*) AS n, SUM(amount) AS rev "
        "FROM ev WHERE user <> 'u2' GROUP BY day",
    )

    def recompute():
        rows = (
            c.read("ev")
            .filter("user <> 'u2'")
            .groupBy("day")
            .agg(
                F.avg("amount").alias("avg_amt"),
                F.count("amount").cast("bigint").alias("n_vals"),
                F.count("*").cast("bigint").alias("n"),
                F.sum("amount").alias("rev"),
            )
            .collect()
        )
        return {
            r["day"]: (r["avg_amt"], r["n_vals"], r["n"], r["rev"])
            for r in rows
        }

    def mart():
        return {
            r["day"]: (r["avg_amt"], r["n_vals"], r["n"], r["rev"])
            for r in c.read("mv_scoped").collect()
        }

    assert mart() == recompute()
    # d3 exists with only a NULL amount inside the scope
    assert mart()["d3"] == (None, 0, 1, None)
    # u2's rows are outside the WHERE scope: d1 ignores them
    assert mart()["d1"][2] == 2  # u1 + u3, not u2

    # advance the source: inserts (incl. out-of-scope rows that must
    # NOT fold) and deletes (incl. the last non-NULL value of d2)
    c.append(
        "ev",
        spark.createDataFrame(
            [("d1", "u1", 100.0), ("d1", "u2", 999.0), ("d3", "u9", 4.0)],
            "day string, user string, amount double",
        ),
    )
    execute_sql(c, "REFRESH MATERIALIZED VIEW mv_scoped")
    assert mart() == recompute()
    c.delete_where("ev", "day = 'd2'", mode="mor")
    c.delete_where("ev", "day = 'd3' AND amount IS NOT NULL", mode="mor")
    execute_sql(c, "REFRESH MATERIALIZED VIEW mv_scoped")
    assert mart() == recompute()
    # d2 fully retired; d3 back to NULL avg with its NULL row alive
    assert "d2" not in mart()
    assert mart()["d3"] == (None, 0, 1, None)
    # definition round-trips with the WHERE scope
    assert c.materialized_views()["mv_scoped"]["where"] == "user <> 'u2'"


def test_plain_table_name_collision_refuses(cat, spark):
    cat.create_table("mv_daily", spark.createDataFrame(
        [("x",)], ["c"]
    ))
    with pytest.raises(ValueError, match="plain table"):
        execute_sql(cat, MV_SQL)


# -- join-shaped views (delta-join IVM) --------------------------------------


@pytest.fixture()
def jcat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "jwh"))
    c.create_table(
        "sales",
        spark.createDataFrame(
            [
                ("d1", 1, 10.0), ("d1", 2, 20.0),
                ("d2", 1, 5.0), ("d2", 3, 7.0),
            ],
            ["day", "cust_id", "amount"],
        ),
    )
    c.create_table(
        "cust",
        spark.createDataFrame(
            [(1, "east"), (2, "west")], ["cust_id", "region"]
        ),
    )
    return c


def _jrecompute(cat, where=None):
    rows = cat.read("sales").join(cat.read("cust"), "cust_id", "inner")
    if where:
        rows = rows.filter(where)
    out = (
        rows.groupBy("region", "day")
        .agg(
            F.sum(F.col("amount").cast("double")).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
            F.avg(F.col("amount").cast("double")).alias("avg_amt"),
        )
        .collect()
    )
    return {
        (r["region"], r["day"]): (r["revenue"], r["n"], r["avg_amt"])
        for r in out
    }


def _jmart(cat, name="mv_region_daily"):
    return {
        (r["region"], r["day"]): (r["revenue"], r["n"], r["avg_amt"])
        for r in cat.read(name).collect()
    }


def test_join_matview_ivm_equals_recompute_both_sides(jcat, spark):
    """r10 verdict ask #6: delta-join IVM across append + delete +
    update on BOTH sides equals a full recompute at every step, and
    every refresh after the first is incremental."""
    execute_sql(
        jcat,
        "CREATE MATERIALIZED VIEW mv_region_daily AS "
        "SELECT region, day, SUM(amount) AS revenue, COUNT(*) AS n, "
        "AVG(amount) AS avg_amt "
        "FROM sales JOIN cust USING (cust_id) GROUP BY region, day",
    )
    assert _jmart(jcat) == _jrecompute(jcat)

    def refresh_incremental():
        res = jcat.refresh_materialized_view("mv_region_daily")
        assert res["mode"] == "incremental", res
        assert _jmart(jcat) == _jrecompute(jcat)

    # 1. fact append — including cust 4 with NO dim row (dropped by the
    # inner join until the dim side gains the key)
    jcat.append("sales", spark.createDataFrame(
        [("d2", 2, 30.0), ("d1", 4, 100.0)], ["day", "cust_id", "amount"]
    ))
    refresh_incremental()
    assert ("east", "d2") in _jmart(jcat)

    # 2. fact COW delete
    jcat.delete_where("sales", F.col("amount") < 8.0, mode="cow")
    refresh_incremental()

    # 3. dim append: cust 4 appears -> its fact rows ENTER the view
    jcat.append("cust", spark.createDataFrame(
        [(4, "east")], ["cust_id", "region"]
    ))
    refresh_incremental()
    assert _jmart(jcat)[("east", "d1")][1] >= 2

    # 4. dim UPDATE (region move): contributions migrate groups
    jcat.update_where("cust", F.col("cust_id") == 2,
                      {"region": F.lit("east")})
    refresh_incremental()
    assert ("west", "d1") not in _jmart(jcat)

    # 5. dim delete: cust 1's fact rows LEAVE the view
    jcat.delete_where("cust", F.col("cust_id") == 1, mode="cow")
    refresh_incremental()

    # 6. BOTH sides change before one refresh (exercises the
    # ΔF⋈D_old + F_new⋈ΔD cross term)
    jcat.append("sales", spark.createDataFrame(
        [("d3", 2, 1.5), ("d3", 4, 2.5)], ["day", "cust_id", "amount"]
    ))
    jcat.update_where("cust", F.col("cust_id") == 4,
                      {"region": F.lit("north")})
    jcat.append("cust", spark.createDataFrame(
        [(5, "south")], ["cust_id", "region"]
    ))
    refresh_incremental()

    # 7. noop
    assert jcat.refresh_materialized_view("mv_region_daily")["mode"] == "noop"


def test_join_matview_where_on_dim_column(jcat, spark):
    """The view-scope predicate may reference DIM columns: it runs on
    the joined change images, so dim-side scoping stays exact."""
    jcat.create_materialized_view(
        "mv_east_daily",
        source="sales",
        join_dim="cust",
        join_on=["cust_id"],
        group_cols=["day"],
        measures={"revenue": ("sum", "amount"), "n": ("count", None)},
        where="region = 'east'",
    )

    def recompute():
        rows = (
            jcat.read("sales").join(jcat.read("cust"), "cust_id")
            .filter("region = 'east'")
            .groupBy("day")
            .agg(F.sum(F.col("amount").cast("double")).alias("revenue"),
                 F.count("*").cast("bigint").alias("n"))
            .collect()
        )
        return {r["day"]: (r["revenue"], r["n"]) for r in rows}

    def mart():
        return {r["day"]: (r["revenue"], r["n"])
                for r in jcat.read("mv_east_daily").collect()}

    assert mart() == recompute()
    # a dim region flip moves rows across the predicate boundary
    jcat.update_where("cust", F.col("cust_id") == 2,
                      {"region": F.lit("east")})
    jcat.append("sales", spark.createDataFrame(
        [("d3", 2, 9.0)], ["day", "cust_id", "amount"]
    ))
    res = jcat.refresh_materialized_view("mv_east_daily")
    assert res["mode"] == "incremental"
    assert mart() == recompute()
    jcat.update_where("cust", F.col("cust_id") == 1,
                      {"region": F.lit("west")})
    assert jcat.refresh_materialized_view("mv_east_daily")["mode"] \
        == "incremental"
    assert mart() == recompute()


def test_join_matview_refusals(jcat):
    """Join form refuses non-algebraic measures and non-same-named
    keys; ON/USING forms parse equivalently."""
    with pytest.raises(SqlError, match="not join-maintainable"):
        execute_sql(
            jcat,
            "CREATE MATERIALIZED VIEW mv_bad AS "
            "SELECT region, COUNT(DISTINCT day) AS days "
            "FROM sales JOIN cust USING (cust_id) GROUP BY region",
        )
    with pytest.raises(SqlError, match="same-named"):
        execute_sql(
            jcat,
            "CREATE MATERIALIZED VIEW mv_bad2 AS "
            "SELECT region, COUNT(*) AS n "
            "FROM sales JOIN cust ON sales.cust_id = cust.other_id "
            "GROUP BY region",
        )
    # qualified ON with same-named keys parses
    execute_sql(
        jcat,
        "CREATE MATERIALIZED VIEW mv_on AS "
        "SELECT region, COUNT(*) AS n "
        "FROM sales JOIN cust ON sales.cust_id = cust.cust_id "
        "GROUP BY region",
    )
    mv = jcat.materialized_views()["mv_on"]
    assert mv["join_dim"] == "cust" and mv["join_on"] == ["cust_id"]
