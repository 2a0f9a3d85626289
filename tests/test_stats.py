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


def test_merge_into_string_key_width_is_measured(cat, spark):
    """ADVICE r9: string/binary merge keys are priced by avg(length)
    measured in the same cardinality-check job, not a flat 24 bytes —
    a merge keyed on long strings (URLs) must not broadcast a key set
    the threshold was meant to refuse."""
    cat2 = Catalog(
        spark, str(cat._handle("t").path).rsplit("/", 2)[0] + "/wh2"
    )
    rows = [(f"https://example.com/path/{'x' * 180}/{i}", float(i))
            for i in range(100)]
    df = spark.createDataFrame(rows, "url string, amount double")
    cat2.create_table("u", df)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4KB")
    try:
        # flat-24B pricing would say 100 × (8+24) = 3.2 KB < 4 KB and
        # broadcast the source; measured ~200-char keys say ~21 KB —
        # the source must NOT broadcast. The 100-row target key set
        # (manifest rows × sidecar-refined width) doesn't fit 4 KB
        # either → shuffle.
        src = spark.createDataFrame(rows[:100], "url string, amount double")
        res = cat2.merge_into("u", src, ["url"])
        assert res["hit_probe"] == "shuffle"
        assert res["matched_rows"] == 100

        # short string keys still take the broadcast fast path
        short = spark.createDataFrame(
            [(f"u{i}", 1.0) for i in range(50)], "url string, amount double"
        )
        res2 = cat2.merge_into("u", short, ["url"])
        assert res2["hit_probe"] == "broadcast_source"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_eq_delete_read_probe_is_stats_driven(cat, spark):
    """r9 verdict ask #7 (site 1): the MOR equality-delete anti-join on
    the read path broadcasts the key set only while its on-disk bytes
    fit the auto-broadcast threshold — an accumulated delete set past
    the threshold falls back to shuffle + AQE instead of shipping to
    every task."""
    cat.delete_where(
        "t", "name = 'beta'", mode="mor-eq", equality_cols=["id"]
    )
    plan = _plan(cat.read("t"))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        plan = _plan(cat.read("t"))
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
        # semantics identical on the shuffle path
        assert {r["id"] for r in cat.read("t").collect()} == {1, 4}
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )


def test_positional_delete_read_probe_is_stats_driven(cat, spark):
    """Companion to the eq-delete pin: the positional-delete anti-join
    broadcasts only while the delete dirs' on-disk bytes fit the
    threshold."""
    cat.delete_where("t", "name = 'beta'", mode="mor")
    plan = _plan(cat.read("t"))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        plan = _plan(cat.read("t"))
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
        assert {r["id"] for r in cat.read("t").collect()} == {1, 4}
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )


def test_cdc_affected_group_broadcast_is_stats_driven(cat, spark):
    """r9 verdict ask #7 (site 2): CdcAggregate/CdcQuantile hint their
    feed-derived group sets from the same estimated-size pricing
    merge_into uses — metadata-only change-feed bound, or an exact
    already-paid count × sidecar-refined widths; unknown estimates
    withhold the hint."""
    from data_lakehouse_spark.plans.cdc import _stats_broadcast_hint

    cat.append("t", cat.spark.createDataFrame(
        [(10, "kappa", 1.0), (11, "kappa", 2.0)],
        "id bigint, name string, amount double",
    ))
    # metadata-only feed bound over the append span (v0 -> v1]
    est = cat.estimated_changes_size_bytes("t", 0, 1, columns=["name"])
    assert est == 2 * (24 + 8)  # 2 rows x (default str width + overhead)
    groups = cat.read("t").select("name").distinct()

    def hinted(g):
        return "hint" in g._jdf.queryExecution().logical().toString().lower()

    assert hinted(_stats_broadcast_hint(cat, "t", ["name"], groups, 0, 1))
    # exact count dominates the span bound when the caller paid it
    big = _stats_broadcast_hint(
        cat, "t", ["name"], groups, 0, 1, n_exact=10_000_000
    )
    assert not hinted(big)
    # an in-span MOR delete makes the dir-level bound unsound -> None
    # -> no hint (shuffle + AQE, never a blind broadcast)
    cat.delete_where(
        "t", "id = 10", mode="mor-eq", equality_cols=["id"]
    )
    v = cat.current_version("t")
    assert cat.estimated_changes_size_bytes("t", 0, v) is None
    assert not hinted(_stats_broadcast_hint(cat, "t", ["name"], groups, 0, v))
    # broadcasting disabled (thr <= 0) always withholds
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not hinted(
            _stats_broadcast_hint(cat, "t", ["name"], groups, 0, 1)
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )


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
