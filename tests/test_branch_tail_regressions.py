"""Regressions: main-lineage ops while a BRANCH commit is the manifest
tail, plus the bloom type-drift, MERGE NULL-key, and CDC support-replay
fixes.

Branch commits land at the manifest tail, so every main-lineage
operation that naively based itself on ``entries[-1]`` used to read the
BRANCH head — leaking branch data into main (DML, schema DDL,
maintenance), returning branch properties, or expiring the still-live
main head. Each test here sets up a table whose manifest TAIL is a
branch commit, then runs a main-lineage op and asserts both lineages
stay intact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog


def _cat(spark, tmp_path) -> Catalog:
    return Catalog(spark, str(tmp_path / "w"))


def _ids(df) -> list:
    return sorted(r["id"] for r in df.collect())


def _branch_tail_table(cat, spark):
    """t: main = {1, 2}, branch 'b' = {1, 2, 100}; tail entry is the
    branch commit."""
    cat.create_table("t", spark.createDataFrame([(1,), (2,)], "id long"))
    cat.create_branch("t", "b")
    cat.append("t", spark.createDataFrame([(100,)], "id long"), branch="b")
    return cat


def test_delete_where_with_branch_tail(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    res = cat.delete_where("t", "id = 1")
    assert res["affected_rows"] == 1
    assert _ids(cat.read("t")) == [2]
    # branch lineage untouched — no branch rows leaked, none lost
    assert _ids(cat.read("t", branch="b")) == [1, 2, 100]


def test_update_where_with_branch_tail(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    cat.update_where("t", "id = 2", {"id": "id + 10"})
    assert _ids(cat.read("t")) == [1, 12]
    assert _ids(cat.read("t", branch="b")) == [1, 2, 100]


def test_mor_delete_with_branch_tail(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    res = cat.delete_where("t", "id = 1", mode="mor")
    assert res["affected_rows"] == 1
    assert _ids(cat.read("t")) == [2]
    assert _ids(cat.read("t", branch="b")) == [1, 2, 100]
    # and folding the deletes keeps main clean
    cat.rewrite_position_deletes("t")
    assert _ids(cat.read("t")) == [2]


def test_merge_into_with_branch_tail(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    cat.create_branch("t", "b")
    cat.append(
        "t",
        spark.createDataFrame([(100, "z")], "id long, v string"),
        branch="b",
    )
    res = cat.merge_into(
        "t",
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        on=["id"],
    )
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 1
    got = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # no 100 leaked from branch
    assert _ids(cat.read("t", branch="b")) == [1, 2, 100]


def test_schema_ddl_with_branch_tail(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    cat.add_column("t", "tag", "string", default="x")
    cols = [d["col_name"] for d in cat.describe("t")]
    assert cols == ["id", "tag"]
    df = cat.read("t")
    assert sorted((r["id"], r["tag"]) for r in df.collect()) == [
        (1, "x"),
        (2, "x"),
    ]
    # main data dirs only — the branch's 100 must not appear
    assert _ids(df.select("id")) == [1, 2]


def test_schema_ddl_preserves_mor_deletes(spark, tmp_path):
    """delete_dirs must survive a schema commit — dropping them would
    resurrect merge-on-read-deleted rows."""
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,), (2,), (3,)], "id long"))
    cat.delete_where("t", "id = 2", mode="mor")
    assert _ids(cat.read("t")) == [1, 3]
    cat.add_column("t", "tag", "string")
    assert _ids(cat.read("t").select("id")) == [1, 3]


def test_table_properties_and_describe_with_branch_tail(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(1,)], "id long"),
        properties={"owner": "main"},
    )
    cat.create_branch("t", "b")
    cat.append(
        "t",
        spark.createDataFrame([(100,)], "id long"),
        branch="b",
        properties_update={"owner": "branch"},
    )
    assert cat.table_properties("t")["owner"] == "main"
    assert [d["col_name"] for d in cat.describe("t")] == ["id"]


def test_compact_with_branch_tail(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    cat.compact("t")
    assert _ids(cat.read("t")) == [1, 2]
    assert _ids(cat.read("t", branch="b")) == [1, 2, 100]


def test_expire_snapshots_protects_main_head_behind_branch_tail(
    spark, tmp_path
):
    """ADVICE repro: v0 main, v1 create_branch, v2 branch append —
    expire_snapshots(keep_last=1) must keep main readable."""
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))  # v0
    cat.create_branch("t", "b")  # v1
    cat.append("t", spark.createDataFrame([(100,)], "id long"), branch="b")
    for keep in (1, 2):
        cat.expire_snapshots("t", keep_last=keep)
        assert _ids(cat.read("t")) == [1]
        assert _ids(cat.read("t", branch="b")) == [1, 100]


def test_table_changes_default_targets_main_head(spark, tmp_path):
    cat = _branch_tail_table(_cat(spark, tmp_path), spark)
    cat.append("t", spark.createDataFrame([(3,)], "id long"))  # main
    cat.append("t", spark.createDataFrame([(200,)], "id long"), branch="b")
    feed = cat.table_changes("t", 0).collect()
    assert sorted(r["id"] for r in feed) == [3]
    assert all(r["_change_type"] == "insert" for r in feed)


def test_publish_staged_with_branch_tail(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    cat.create_branch("t", "b")
    cat.append("t", spark.createDataFrame([(2,)], "id long"), staged=True)
    cat.append("t", spark.createDataFrame([(100,)], "id long"), branch="b")
    # staged snapshot is not at the tail anymore — publish must still
    # find it on the main lineage
    cat.publish("t")
    assert _ids(cat.read("t")) == [1, 2]
    assert _ids(cat.read("t", branch="b")) == [1, 100]


def test_merge_into_null_keys_nullsafe(spark, tmp_path):
    """A NULL-key source row must UPDATE the NULL-key target row (the
    merge join is eqNullSafe), not insert a duplicate next to it."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(None, "old-null"), (1, "a")], "id long, v string"
        ),
    )
    res = cat.merge_into(
        "t",
        spark.createDataFrame(
            [(None, "new-null"), (2, "b")], "id long, v string"
        ),
        on=["id"],
    )
    assert res["matched_rows"] == 1
    assert res["inserted_rows"] == 1
    rows = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert rows == {None: "new-null", 1: "a", 2: "b"}
    assert cat.read("t").count() == 3  # no duplicate NULL-key row


def test_bloom_probe_after_type_widening(spark, tmp_path):
    """prune_eq on a bloom column must not produce false negatives
    after alter_column_type widening: the sidecar hashed ints, the
    declared type is now bigint — probes must hash at the RECORDED
    build type."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(i,) for i in range(1000)], "id int"),
        properties={"bloom.columns": "id"},
    )
    cat.alter_column_type("t", "id", "long")
    hit = cat.read("t", prune_eq={"id": 7}).filter(F.col("id") == 7)
    assert hit.count() == 1
    # and new dirs written AFTER the widening (sidecar built at long)
    # probe correctly alongside the old int-built sidecar
    cat.append(
        "t", spark.createDataFrame([(5000,)], "id long")
    )
    hit2 = cat.read("t", prune_eq={"id": 5000}).filter(F.col("id") == 5000)
    assert hit2.count() == 1
    hit3 = cat.read("t", prune_eq={"id": 7}).filter(F.col("id") == 7)
    assert hit3.count() == 1


def test_remove_orphan_files(spark, tmp_path):
    """Crashed-write debris (a fully written dir with no manifest
    entry) is reclaimed; referenced dirs and RECENT unreferenced dirs
    (possible in-flight commits) are untouched."""
    import os
    import shutil
    import time as _time

    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,), (2,)], "id long"))
    cat.append("t", spark.createDataFrame([(3,)], "id long"))
    h = cat._handle("t")

    # simulate a crashed write: copy a real dir to an unreferenced name
    old_orphan = os.path.join(h.path, "v99990")
    shutil.copytree(os.path.join(h.path, "v00000"), old_orphan)
    stale = _time.time() - 48 * 3600
    for dp, _, fs in os.walk(old_orphan):
        os.utime(dp, (stale, stale))
        for f in fs:
            os.utime(os.path.join(dp, f), (stale, stale))
    fresh_orphan = os.path.join(h.path, "v99991")
    shutil.copytree(os.path.join(h.path, "v00000"), fresh_orphan)

    dry = cat.remove_orphan_files("t", dry_run=True)
    assert dry["orphan_dirs"] == ["v99990"] and dry["bytes_reclaimed"] > 0
    assert os.path.isdir(old_orphan)  # dry run deletes nothing

    res = cat.remove_orphan_files("t")
    assert res["orphan_dirs"] == ["v99990"]
    assert not os.path.isdir(old_orphan)
    assert os.path.isdir(fresh_orphan)  # too recent: kept
    assert _ids(cat.read("t")) == [1, 2, 3]  # table intact
    # the fresh orphan qualifies once the margin is waived
    assert cat.remove_orphan_files("t", older_than_hours=0)[
        "orphan_dirs"
    ] == ["v99991"]
    assert _ids(cat.read("t")) == [1, 2, 3]


def test_concurrent_appends_all_land(spark, tmp_path):
    """The commit lock serializes concurrent appends: N threads each
    append once; every row lands, versions are distinct, no manifest
    corruption."""
    import threading

    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(0,)], "id long"))
    errors = []

    def worker(i: int) -> None:
        try:
            cat.append(
                "t", spark.createDataFrame([(i,)], "id long")
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors
    assert _ids(cat.read("t")) == list(range(7))
    versions = [e["version"] for e in cat._load_manifest(cat._handle("t"))]
    assert versions == sorted(set(versions))  # dense, no duplicates


def test_expire_snapshots_older_than_window(spark, tmp_path):
    """Time-based retention: versions committed at/after older_than
    stay readable even beyond keep_last; older unprotected ones expire."""
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))  # v0
    cat.append("t", spark.createDataFrame([(2,)], "id long"))  # v1
    cat.append("t", spark.createDataFrame([(3,)], "id long"))  # v2
    # cutoff BEFORE every commit: everything retained despite keep_last=1
    res = cat.expire_snapshots("t", keep_last=1, older_than="2000-01-01 00:00:00")
    assert res["versions_expired"] == 0
    assert _ids(cat.read("t", version=0)) == [1]
    # cutoff AFTER every commit: falls back to keep_last retention
    cat.expire_snapshots("t", keep_last=1, older_than="2100-01-01 00:00:00")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="expired"):
        cat.read("t", version=0)
    assert _ids(cat.read("t")) == [1, 2, 3]


def test_compact_where_scopes_to_touched_partitions(spark, tmp_path):
    """OPTIMIZE ... WHERE: only snapshot dirs holding matching rows
    rewrite; other dirs' files carry forward byte-identical, and all
    rows of touched dirs (matching or not) survive."""
    import os as _os

    from pyspark.sql import functions as F  # noqa: F811

    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(i, "d1") for i in range(50)],
                              "id long, day string"),
    )  # v0: only d1
    cat.append(
        "t",
        spark.createDataFrame(
            [(i, "d2") for i in range(50, 90)] + [(99, "d1")],
            "id long, day string",
        ),
    )  # v1: d2 rows + ONE d1 straggler
    before_files = set(cat.read("t").inputFiles())

    res = cat.compact("t", where="day = 'd2'")
    # v0 has no d2 rows -> kept; v1 touched
    assert res["kept_dirs"] == ["v00000"] and res["rewritten_dirs"] == ["v00001"]
    after_files = set(cat.read("t").inputFiles())
    v0_files = {f for f in before_files if "/v00000/" in f}
    assert v0_files <= after_files  # untouched dir: same physical files
    # every row survives, including v1's non-matching d1 straggler
    got = cat.read("t")
    assert got.count() == 91
    assert got.filter(F.col("id") == 99).count() == 1
    # no-match predicate: clean no-op
    res = cat.compact("t", where="day = 'nope'")
    assert res["rewritten_dirs"] == []
