"""Commit-path crash atomicity: a writer dying at ANY point before the
manifest flip must leave the table bit-identical to the prior snapshot,
with the debris reclaimable by remove_orphan_files and the commit lock
self-healing — the invariants that make DML safe on a real cluster."""

from __future__ import annotations

import os
import time

import pytest

from data_lakehouse_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_table(
        "t",
        spark.createDataFrame(
            [(i, f"r{i}", float(i)) for i in range(10)],
            "id int, name string, amt double",
        ),
    )
    return c


def _die_on_next_manifest_save(cat, monkeypatch):
    real = Catalog._save_manifest
    state = {"armed": True}

    def dying(self, h, entries):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("simulated crash before manifest flip")
        return real(self, h, entries)

    monkeypatch.setattr(Catalog, "_save_manifest", dying)
    return state


def test_crashed_append_leaves_table_unchanged(spark, cat, monkeypatch):
    before = sorted(map(tuple, cat.read("t").collect()))
    _die_on_next_manifest_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cat.append(
            "t", spark.createDataFrame(
                [(99, "x", 1.0)], "id int, name string, amt double"
            )
        )
    # table state and version count unchanged; lock released
    assert sorted(map(tuple, cat.read("t").collect())) == before
    assert cat.read("t", version=0).count() == 10
    assert not os.path.exists(
        os.path.join(cat.root, "t", "_commit.lock")
    )
    # the crashed write's data dir is debris on disk ...
    dirs = [d for d in os.listdir(os.path.join(cat.root, "t"))
            if d.startswith("v")]
    assert len(dirs) == 2  # v00000 (live) + the orphaned v00001
    # ... that maintenance reclaims without touching live data
    cat.remove_orphan_files("t", older_than_hours=0.0)
    dirs = [d for d in os.listdir(os.path.join(cat.root, "t"))
            if d.startswith("v")]
    assert dirs == ["v00000"]
    assert sorted(map(tuple, cat.read("t").collect())) == before
    # and the NEXT commit reuses the slot cleanly
    cat.append(
        "t", spark.createDataFrame(
            [(99, "x", 1.0)], "id int, name string, amt double"
        )
    )
    assert cat.read("t").count() == 11


def test_crashed_eq_delete_and_cdc_upsert_leave_table_unchanged(
    spark, cat, monkeypatch
):
    """The new merge-on-read write shapes keep the same atomicity
    contract: a crash before the manifest flip of an equality delete
    (key file already on disk) or of a one-commit CDC upsert (key file
    AND data dir on disk) leaves the table bit-identical, with the
    debris orphan-reclaimable."""
    before = sorted(map(tuple, cat.read("t").collect()))
    state = _die_on_next_manifest_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cat.delete_where("t", "id = 1", mode="mor-eq", equality_cols=["id"])
    assert sorted(map(tuple, cat.read("t").collect())) == before
    # the orphaned key dir is on disk and reclaimable
    tdir = os.path.join(cat.root, "t")
    assert any(d.startswith("e") for d in os.listdir(tdir))
    cat.remove_orphan_files("t", older_than_hours=0.0)
    assert not any(d.startswith("e") for d in os.listdir(tdir))
    assert sorted(map(tuple, cat.read("t").collect())) == before

    state["armed"] = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        cat.upsert_cdc(
            "t",
            spark.createDataFrame(
                [(1, "nope", 0.0, "U"), (2, None, None, "D")],
                "id int, name string, amt double, _op string",
            ),
            ["id"],
        )
    assert sorted(map(tuple, cat.read("t").collect())) == before
    cat.remove_orphan_files("t", older_than_hours=0.0)
    assert sorted(map(tuple, cat.read("t").collect())) == before
    # the next upsert lands cleanly in the reused slot
    out = cat.upsert_cdc(
        "t",
        spark.createDataFrame(
            [(1, "new", 9.0, "U")], "id int, name string, amt double, _op string"
        ),
        ["id"],
    )
    assert out["rows_appended"] == 1
    assert {r["name"] for r in cat.read("t").filter("id = 1").collect()} == {
        "new"
    }


def test_crashed_cow_delete_preserves_all_rows(spark, cat, monkeypatch):
    _die_on_next_manifest_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cat.delete_where("t", "id < 5")
    assert cat.read("t").count() == 10  # nothing deleted
    # retry after the "restart" applies cleanly
    cat.delete_where("t", "id < 5")
    assert sorted(r.id for r in cat.read("t").collect()) == [5, 6, 7, 8, 9]


def test_crashed_merge_preserves_target(spark, cat, monkeypatch):
    src = spark.createDataFrame(
        [(1, "upd", 100.0), (42, "new", 1.0)],
        "id int, name string, amt double",
    )
    before = sorted(map(tuple, cat.read("t").collect()))
    _die_on_next_manifest_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cat.merge_into("t", src, ["id"])
    assert sorted(map(tuple, cat.read("t").collect())) == before
    stats = cat.merge_into("t", src, ["id"])
    assert stats["n_inserted"] == 1 if "n_inserted" in stats else True
    rows = {r.id: r.name for r in cat.read("t").collect()}
    assert rows[1] == "upd" and rows[42] == "new"


def test_torn_manifest_tmp_is_ignored(spark, cat):
    # a writer that died between writing _manifest.json.tmp and the
    # os.replace leaves a torn tmp file; reads and later commits must
    # ignore and overwrite it
    tmp = os.path.join(cat.root, "t", "_manifest.json.tmp")
    with open(tmp, "w") as f:
        f.write('{"torn": tru')  # invalid JSON, mid-write
    assert cat.read("t").count() == 10
    cat.append(
        "t", spark.createDataFrame(
            [(50, "y", 2.0)], "id int, name string, amt double"
        )
    )
    assert cat.read("t").count() == 11


def test_stale_lock_is_broken_promptly(spark, cat):
    lock = os.path.join(cat.root, "t", "_commit.lock")
    with open(lock, "w"):
        pass
    old = time.time() - 1000  # > 10x the 60s default timeout? no: 600s
    os.utime(lock, (old, old))
    t0 = time.time()
    cat.append(
        "t", spark.createDataFrame(
            [(77, "z", 3.0)], "id int, name string, amt double"
        )
    )
    assert time.time() - t0 < 30  # broke the stale lock, did not wait
    assert cat.read("t").count() == 11


def test_live_lock_times_out_with_clear_error(spark, cat):
    h = cat._handle("t")
    with cat._commit_lock(h):
        with pytest.raises(TimeoutError, match="commit lock"):
            with cat._commit_lock(h, timeout=1.0):
                pass
