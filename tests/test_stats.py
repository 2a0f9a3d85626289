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


# -- stats CONSUMPTION (round 9): the sidecar/manifest stats drive plan
# -- choices instead of being write-only artifacts ----------------------


def test_estimated_size_bytes_from_metadata(cat, spark):
    # metadata-only: no ANALYZE needed for the row-count × width path
    full = cat.estimated_size_bytes("t")
    assert full is not None and full > 0
    keys = cat.estimated_size_bytes("t", columns=["id"])
    # id-only estimate: 4 rows × (8 + 8 overhead)
    assert keys == 4 * 16
    assert keys < full
    # ANALYZE refines the string width from default 24 → avg_len 4.33
    before = cat.estimated_size_bytes("t", columns=["name"])
    cat.analyze_table("t", ["name"])
    after = cat.estimated_size_bytes("t", columns=["name"])
    assert after < before
    with pytest.raises(ValueError, match="unknown columns"):
        cat.estimated_size_bytes("t", columns=["nope"])


def test_merge_into_broadcast_side_is_stats_driven(cat, spark):
    src = spark.createDataFrame(
        [(2, "BETA", 2.0), (9, "iota", 9.0)],
        "id bigint, name string, amount double",
    )
    # default 10MB threshold: tiny source broadcasts (the classic side)
    res = cat.merge_into("t", src, ["id"])
    assert res["hit_probe"] == "broadcast_source"
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 1

    # source over the threshold, target under → the TARGET key set
    # broadcasts (manifest row stats × key widths say it fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try:
        src2 = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(200)],
            "id bigint, name string, amount double",
        )
        # 200 exact keys × (8 key + 8 overhead) = 3200 B > 1 KB
        res2 = cat.merge_into("t", src2, ["id"])
        assert res2["hit_probe"] == "broadcast_target"
        # neither side fits → shuffle, AQE picks the physical join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        src3 = spark.createDataFrame(
            [(1000, "x", 1.0)], "id bigint, name string, amount double"
        )
        res3 = cat.merge_into("t", src3, ["id"])
        assert res3["hit_probe"] == "shuffle"
        assert res3["inserted_rows"] == 1
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
    # semantics identical across probe strategies
    ids = {r["id"] for r in cat.read("t").collect()}
    assert 1000 in ids and set(range(200)) <= ids


def test_explain_surfaces_prune_hints(cat):
    hints = cat.prune_hints("t")
    assert any("t.id" in h and "prune=" in h for h in hints)
    # ANALYZE enriches the hint with global range + NDV
    cat.analyze_table("t", ["id"])
    hints = cat.prune_hints("t")
    idh = next(h for h in hints if "t.id" in h)
    assert "ndv" in idh and "'1'" in idh and "'4'" in idh
    plan = execute_sql(
        cat, "EXPLAIN SELECT id FROM t WHERE id > 2"
    ).collect()[0]["plan"]
    assert "prune hint: t.id" in plan
