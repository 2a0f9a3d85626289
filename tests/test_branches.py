"""Catalog branches and tags (Iceberg refs): isolated lineages,
retention contracts, fast-forward."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog


def _cat(spark, tmp_path) -> Catalog:
    return Catalog(spark, str(tmp_path / "w"))


def _ids(df) -> list:
    return sorted(r["id"] for r in df.collect())


def test_tag_pins_snapshot_and_survives_expiry(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))  # v0
    cat.append("t", spark.createDataFrame([(2,)], "id long"))  # v1
    cat.create_tag("t", "training-freeze", version=1)
    cat.overwrite("t", spark.createDataFrame([(9,)], "id long"))  # v2
    cat.append("t", spark.createDataFrame([(10,)], "id long"))  # v3

    assert _ids(cat.read("t", tag="training-freeze")) == [1, 2]
    # expire everything but the last snapshot: the tagged one survives
    res = cat.expire_snapshots("t", keep_last=1)
    assert res["versions_expired"] > 0
    assert _ids(cat.read("t", tag="training-freeze")) == [1, 2]
    assert _ids(cat.read("t")) == [9, 10]
    # v0 (untagged, unretained) is really gone
    with pytest.raises(ValueError, match="expired"):
        cat.read("t", version=0)
    # dropping the tag releases the contract; the next expiry reclaims
    cat.drop_tag("t", "training-freeze")
    cat.expire_snapshots("t", keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        cat.read("t", version=1)


def test_branch_isolates_lineages_both_ways(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))  # v0
    cat.create_branch("t", "backfill")  # v1
    cat.append(
        "t", spark.createDataFrame([(100,)], "id long"), branch="backfill"
    )  # v2 on branch
    # main is untouched by the branch commit
    assert _ids(cat.read("t")) == [1]
    assert _ids(cat.read("t", branch="backfill")) == [1, 100]
    # main commits after a branch commit inherit MAIN's dirs only
    cat.append("t", spark.createDataFrame([(2,)], "id long"))  # v3 main
    assert _ids(cat.read("t")) == [1, 2]
    # and the branch is equally unaffected by main's commit
    assert _ids(cat.read("t", branch="backfill")) == [1, 100]
    branches = {
        r["version"]: r["branch"] for r in cat.snapshots("t").collect()
    }
    assert branches == {0: None, 1: "backfill", 2: "backfill", 3: None}


def test_fast_forward_and_divergence_refusal(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    cat.create_branch("t", "wip")
    cat.append("t", spark.createDataFrame([(2,)], "id long"), branch="wip")
    cat.fast_forward("t", "wip")
    assert _ids(cat.read("t")) == [1, 2]

    # divergence: cut a branch, then move main; fast-forward must refuse
    cat.create_branch("t", "wip2")
    cat.append("t", spark.createDataFrame([(50,)], "id long"), branch="wip2")
    cat.append("t", spark.createDataFrame([(3,)], "id long"))  # main moves
    with pytest.raises(ValueError, match="fast-forward"):
        cat.fast_forward("t", "wip2")
    # both lineages intact after the refusal
    assert _ids(cat.read("t")) == [1, 2, 3]
    assert _ids(cat.read("t", branch="wip2")) == [1, 2, 50]


def test_commit_to_missing_branch_fails(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="create_branch"):
        cat.append(
            "t", spark.createDataFrame([(2,)], "id long"), branch="nope"
        )
    with pytest.raises(ValueError, match="does not exist"):
        cat.read("t", branch="nope")


def test_drop_branch_releases_expiry_protection(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    cat.create_branch("t", "exp")
    cat.append(
        "t", spark.createDataFrame([(100,)], "id long"), branch="exp"
    )
    cat.append("t", spark.createDataFrame([(2,)], "id long"))  # main
    # live branch survives expiry
    cat.expire_snapshots("t", keep_last=1)
    assert _ids(cat.read("t", branch="exp")) == [1, 100]
    # dropped branch stops resolving and loses protection
    cat.drop_branch("t", "exp")
    with pytest.raises(ValueError, match="does not exist"):
        cat.read("t", branch="exp")
    cat.expire_snapshots("t", keep_last=1)
    assert _ids(cat.read("t")) == [1, 2]


def test_merge_into_upsert_with_dir_pruning(spark, tmp_path):
    """MERGE INTO: matched dirs rewrite, untouched dirs carry forward,
    inserts ride the same commit."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a", 10.0)], "id long, k string, v double")
    )  # v0
    cat.append(
        "t", spark.createDataFrame([(2, "b", 20.0)], "id long, k string, v double")
    )  # v1
    src = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "id long, k string, v double"
    )
    res = cat.merge_into("t", src, ["id"])
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 1
    # only the dir holding id=2 was rewritten
    assert res["rewritten_dirs"] == ["v00001"] and res["kept_dirs"] == ["v00000"]
    rows = {r["id"]: (r["k"], r["v"]) for r in cat.read("t").collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}
    # time travel to pre-merge intact
    assert sorted(
        r["id"] for r in cat.read("t", version=1).collect()
    ) == [1, 2]


def test_merge_into_update_exprs_delete_and_no_insert(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ),
    )
    src = spark.createDataFrame(
        [(1, 5.0), (2, 99.0), (9, 1.0)], "id long, v double"
    )
    res = cat.merge_into(
        "t",
        src,
        ["id"],
        when_matched={"v": "v + _s_v"},  # accumulate instead of replace
        when_matched_delete="_s_v > 50",  # source v=99 deletes id=2
        insert_not_matched=False,  # id=9 is dropped
    )
    assert res["inserted_rows"] == 0
    rows = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert rows == {1: 15.0, 3: 30.0}


def test_shallow_clone_zero_copy_and_independent_evolution(spark, tmp_path):
    """SHALLOW CLONE: the clone's first snapshot references the
    source's dirs (no data copied); both tables then evolve
    independently; schema-evolved source dirs still project correctly
    through the clone's carried writer metadata."""
    import os

    cat = _cat(spark, tmp_path)
    cat.create_table("src", spark.createDataFrame([(1,)], "id long"))
    cat.add_column("src", "tag", "string", default="old")
    cat.append(
        "src", spark.createDataFrame([(2, "new")], "id long, tag string")
    )
    cat.clone_table("src", "dup")
    # zero copy: the clone dir holds only its manifest
    clone_dir = os.path.join(str(tmp_path / "w"), "dup")
    assert sorted(os.listdir(clone_dir)) == ["_manifest.json"]
    rows = {r["id"]: r["tag"] for r in cat.read("dup").collect()}
    assert rows == {1: "old", 2: "new"}  # initial default survives
    # metadata-only count through foreign dir stats
    assert cat.row_count("dup") == 2

    # independent evolution in both directions
    cat.append("dup", spark.createDataFrame([(3, "c")], "id long, tag string"))
    cat.append("src", spark.createDataFrame([(9, "s")], "id long, tag string"))
    assert sorted(r["id"] for r in cat.read("dup").collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in cat.read("src").collect()) == [1, 2, 9]
    # the clone's own DML never touches source dirs
    cat.delete_where("dup", "id = 3")
    assert sorted(r["id"] for r in cat.read("dup").collect()) == [1, 2]
    assert sorted(r["id"] for r in cat.read("src").collect()) == [1, 2, 9]
    # COW DML on a row living in a FOREIGN (cloned) dir: the clone
    # rewrites that dir's survivors into its OWN storage; the source
    # keeps the row (regression: substring containment silently
    # no-opped on cloned dirs)
    res = cat.delete_where("dup", "id = 1")
    assert res["affected_rows"] == 1 and res["rewritten_dirs"]
    assert sorted(r["id"] for r in cat.read("dup").collect()) == [2]
    assert sorted(r["id"] for r in cat.read("src").collect()) == [1, 2, 9]
    # re-materialization cuts the dependency on source storage
    cat.compact("dup")
    files = cat.read("dup").inputFiles()
    assert files and all("/dup/" in f for f in files)


def test_merge_into_duplicate_source_keys_refused(spark, tmp_path):
    import pytest

    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1, 1.0)], "id long, v double"))
    src = spark.createDataFrame(
        [(1, 2.0), (1, 3.0)], "id long, v double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.merge_into("t", src, ["id"])


def test_branch_write_audit_then_fast_forward_quality_gate(spark, tmp_path):
    """The WAP pattern generalized: land data on a branch, audit it
    there with the quality gate, fast-forward only if it passes."""
    from data_lakehouse_spark.operators.quality import check_not_null

    cat = _cat(spark, tmp_path)
    cat.create_table(
        "ev", spark.createDataFrame([(1, "a")], "id long, k string")
    )
    cat.create_branch("ev", "intake")
    cat.append(
        "ev",
        spark.createDataFrame([(2, "b"), (3, "c")], "id long, k string"),
        branch="intake",
    )
    audited = cat.read("ev", branch="intake")
    assert check_not_null(audited, "id") == 0
    assert check_not_null(audited, "k") == 0
    cat.fast_forward("ev", "intake")
    assert _ids(cat.read("ev")) == [1, 2, 3]
