"""Iceberg v2 export / read round-trip (interop/iceberg.py).

The manifests are written by the Apache Avro JAVA library (bundled
with Spark — the implementation Iceberg itself uses) and read back by
the module's from-scratch pure-Python Avro decoder, so every
round-trip here is a genuine cross-implementation check of the
produced files, not a writer reading its own bytes."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.interop.iceberg import (
    _read_avro_file,
    export_iceberg,
    read_iceberg,
)


def _cat(spark, tmp_path) -> Catalog:
    return Catalog(spark, str(tmp_path / "w"))


def _rows(df) -> list:
    return sorted(tuple(r) for r in df.collect())


def test_zero_copy_export_roundtrip(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, x double"
        ),
    )
    cat.append(
        "t",
        spark.createDataFrame([(3, "c", 3.5)], "id long, name string, x double"),
    )
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert not res["materialized"]
    assert res["rows"] == 3
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id", "name", "x")) == _rows(cat.read("t"))


def test_export_metadata_is_spec_shaped(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a")], "id long, name string")
    )
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == res["snapshot_id"]
    assert meta["refs"]["main"]["snapshot-id"] == res["snapshot_id"]
    # field ids in the exported schema ARE the catalog's stable ids
    cat_ids = {
        f["name"]: f["metadata"]["field_id"]
        for f in cat._load_manifest(cat._handle("t"))[-1]["schema"]["fields"]
    }
    ice_ids = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert ice_ids == cat_ids
    # name mapping present for the id-less parquet files
    mapping = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {m["names"][0]: m["field-id"] for m in mapping} == cat_ids
    # manifest list totals agree with the data
    snap = meta["snapshots"][0]
    _, manifests = _read_avro_file(snap["manifest-list"])
    assert len(manifests) == 1
    assert manifests[0]["added_rows_count"] == 1
    assert manifests[0]["added_snapshot_id"] == res["snapshot_id"]
    _, entries = _read_avro_file(manifests[0]["manifest_path"])
    assert all(e["status"] == 1 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 1
    assert all(
        e["data_file"]["file_format"] == "PARQUET"
        and os.path.getsize(e["data_file"]["file_path"])
        == e["data_file"]["file_size_in_bytes"]
        for e in entries
    )


def test_export_mor_deletes_as_position_delete_files(spark, tmp_path):
    """r10 verdict ask #5 (mirrored onto the positional tier): MOR
    positional deletes export ZERO-COPY as one spec content=1 delete
    file — (file_path, pos) with the reserved field ids — instead of
    rewriting the data; the module's independent reader applies it."""
    import pyarrow.parquet as papq

    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(i,) for i in range(10)], "id long")
    )
    cat.delete_where("t", "id >= 7", mode="mor")
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert not res["materialized"]
    assert res["position_delete_files"] == 1
    assert not os.path.exists(os.path.join(dest, "data"))  # no rewrite
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id")) == _rows(cat.read("t"))
    # the delete file is the spec wire shape with reserved field ids
    del_dir = os.path.join(dest, "deletes")
    pf = next(
        os.path.join(del_dir, f) for f in os.listdir(del_dir)
        if f.endswith(".parquet")
    )
    sch = papq.read_schema(pf)
    assert [f.name for f in sch] == ["file_path", "pos"]
    assert sch.field("file_path").metadata[b"PARQUET:field_id"] \
        == b"2147483546"
    assert papq.read_metadata(pf).num_rows == 3  # O(deleted rows)


def test_export_pos_deletes_fall_back_past_broadcast_threshold(
    spark, tmp_path
):
    """The driver-side re-encode is gated on the delete dirs' bytes vs
    the broadcast threshold: past it the export materializes, and an
    explicit materialize=False refuses with the remedy."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(i,) for i in range(50)], "id long")
    )
    cat.delete_where("t", "id % 5 = 0", mode="mor")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16")
        res = export_iceberg(cat, "t", str(tmp_path / "ice"))
        assert res["materialized"] and res["position_delete_files"] == 0
        assert _rows(read_iceberg(spark, str(tmp_path / "ice"))
                     .select("id")) == _rows(cat.read("t"))
        with pytest.raises(ValueError, match="broadcast threshold"):
            export_iceberg(cat, "t", str(tmp_path / "ice2"),
                           materialize=False)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_export_pos_deletes_partitioned_and_mixed_with_eq(spark, tmp_path):
    """Positional + equality deletes export together: the delete
    manifest carries BOTH content kinds (position deletes ride the
    unpartitioned spec next to the global eq deletes), and the replay
    matches the catalog read."""
    cat = _cat(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b") for i in range(10)],
        "id long, part string",
    )
    cat.create_table("t", df, partition_by=["part"])
    cat.delete_where("t", "id IN (1, 8)", mode="mor")
    cat.delete_where("t", "id = 3", mode="mor-eq", equality_cols=["id"])
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert not res["materialized"]
    assert res["position_delete_files"] == 1 and res["delete_files"] >= 1
    out = read_iceberg(spark, dest)
    assert {r["id"] for r in out.collect()} == set(range(10)) - {1, 3, 8}
    assert out.filter(F.col("part") == "b").count() == 4


def test_identity_partitioned_zero_copy(spark, tmp_path):
    """Identity hive partitioning exports ZERO-COPY: the metadata
    carries a real identity partition spec, manifests carry per-file
    partition structs parsed from the dir layout, and the reader
    restores the column values per the spec's identity reading rule."""
    cat = _cat(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2"), (4, None)], "id long, day string"
    )
    cat.create_table("t", df, partition_by=["day"])
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert not res["materialized"]
    assert res["partition_columns"] == ["day"]
    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    spec = meta["partition-specs"][0]["fields"]
    assert spec and spec[0]["transform"] == "identity"
    assert spec[0]["field-id"] == 1000
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id", "day")) == _rows(
        cat.read("t").select("id", "day")
    )
    # int partition values restore with their declared type
    cat.create_table(
        "t2",
        spark.createDataFrame([(1, 10), (2, 20)], "id long, b int"),
        partition_by=["b"],
    )
    d2 = str(tmp_path / "ice_int")
    assert not export_iceberg(cat, "t2", d2)["materialized"]
    got2 = read_iceberg(spark, d2)
    assert dict(got2.dtypes)["b"] == "int"
    assert _rows(got2.select("id", "b")) == [(1, 10), (2, 20)]


def test_transform_partitioned_zero_copy_via_derived_column(spark, tmp_path):
    """Hidden-transform partitioning (days(ts)): the catalog
    materializes the derived column into the table schema, so the
    export degenerates to identity over that column and stays
    zero-copy — the reader restores BOTH the source timestamp (from
    the files) and the derived day (from partition structs)."""
    cat = _cat(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-02-01 11:00:00")],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    cat.create_table("t", df, partition_by=["days(ts)"])
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert not res["materialized"] and res["partition_columns"]
    got = read_iceberg(spark, dest)
    want = cat.read("t")
    assert sorted(got.columns) == sorted(want.columns)
    common = sorted(want.columns)
    assert _rows(got.select(*common)) == _rows(want.select(*common))


def test_export_complex_types(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, [1.0, 2.0], {"k": "v"})],
            "id long, emb array<double>, props map<string,string>",
        ),
    )
    dest = str(tmp_path / "ice")
    export_iceberg(cat, "t", dest)
    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    by_name = {f["name"]: f["type"] for f in meta["schemas"][0]["fields"]}
    assert by_name["emb"]["type"] == "list"
    assert by_name["emb"]["element"] == "double"
    assert by_name["props"]["type"] == "map"
    # nested ids are assigned PAST the top-level id space, all distinct
    nested = [
        by_name["emb"]["element-id"],
        by_name["props"]["key-id"],
        by_name["props"]["value-id"],
    ]
    top = [f["id"] for f in meta["schemas"][0]["fields"]]
    assert len(set(nested + top)) == len(nested + top)
    assert meta["last-column-id"] == max(nested + top)
    got = read_iceberg(spark, dest)
    r = got.orderBy("id").first()
    assert r["emb"] == [1.0, 2.0] and r["props"] == {"k": "v"}


def test_read_iceberg_time_travel_by_snapshot(spark, tmp_path):
    """Re-export after more commits: each export is its own frozen
    snapshot; reading an old export still works."""
    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    d1 = str(tmp_path / "ice1")
    export_iceberg(cat, "t", d1)
    cat.append("t", spark.createDataFrame([(2,)], "id long"))
    d2 = str(tmp_path / "ice2")
    export_iceberg(cat, "t", d2)
    assert _rows(read_iceberg(spark, d1).select("id")) == [(1,)]
    assert _rows(read_iceberg(spark, d2).select("id")) == [(1,), (2,)]


def test_read_iceberg_applies_position_deletes(spark, tmp_path):
    """v2 merge-on-read: a position-delete manifest (written with the
    same Java-Avro machinery, as another engine would) anti-joins the
    scan on (file, row position) — deleted rows must vanish, equality
    deletes must refuse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_lakehouse_spark.interop import iceberg as ice

    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(i,) for i in range(10)], "id long")
        .coalesce(1),
    )
    dest = str(tmp_path / "icemor")
    res = export_iceberg(cat, "t", dest)
    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        meta = json.load(f)
    snap = meta["snapshots"][0]
    _, manifests = _read_avro_file(snap["manifest-list"])
    _, entries = _read_avro_file(manifests[0]["manifest_path"])
    data_file = entries[0]["data_file"]["file_path"]
    first_two = [
        r["id"]
        for r in spark.read.parquet(data_file).limit(2).collect()
    ]

    # position-delete parquet: kill rows 0 and 1 of that file
    del_file = os.path.join(meta_dir, "pos-deletes.parquet")
    pq.write_table(
        pa.table(
            {"file_path": [data_file] * 2, "pos": pa.array([0, 1], pa.int64())}
        ),
        del_file,
    )
    # delete manifest via the same Avro writer (content=1 entries)
    del_manifest = os.path.join(meta_dir, "del-m0.avro")
    ice._write_avro(
        spark, del_manifest, ice._MANIFEST_ENTRY_SCHEMA,
        [{
            "status": 1, "snapshot_id": 7, "sequence_number": 2,
            "file_sequence_number": 2,
            "data_file": {
                "content": 1, "file_path": del_file,
                "file_format": "PARQUET", "partition": None,
                "record_count": 2,
                "file_size_in_bytes": os.path.getsize(del_file),
            },
        }],
        {"format-version": "2", "content": "deletes"},
    )
    # new snapshot: old data manifest + the delete manifest
    new_list = os.path.join(meta_dir, "snap-7-1-deletes.avro")
    base = dict(manifests[0])
    ice._write_avro(
        spark, new_list, ice._MANIFEST_LIST_SCHEMA,
        [base, {**base, "manifest_path": del_manifest, "content": 1,
                "added_snapshot_id": 7}],
        {"format-version": "2"},
    )
    meta2 = dict(meta)
    meta2["current-snapshot-id"] = 7
    meta2["snapshots"] = meta["snapshots"] + [
        {**snap, "snapshot-id": 7, "sequence-number": 2,
         "manifest-list": new_list}
    ]
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(meta2, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")

    got = sorted(r["id"] for r in read_iceberg(spark, dest).collect())
    assert got == sorted(set(range(10)) - set(first_two))
    assert res["rows"] == 10  # original export untouched

    # equality deletes WITHOUT equality_ids refuse instead of wrong rows
    eq_manifest = os.path.join(meta_dir, "eq-m0.avro")
    ice._write_avro(
        spark, eq_manifest, ice._MANIFEST_ENTRY_SCHEMA,
        [{
            "status": 1, "snapshot_id": 8, "sequence_number": 3,
            "file_sequence_number": 3,
            "data_file": {
                "content": 2, "file_path": del_file,
                "file_format": "PARQUET", "partition": None,
                "record_count": 2, "file_size_in_bytes": 1,
            },
        }],
        {"format-version": "2"},
    )
    ice._write_avro(
        spark, os.path.join(meta_dir, "snap-8.avro"),
        ice._MANIFEST_LIST_SCHEMA,
        [base, {**base, "manifest_path": eq_manifest, "content": 1}],
        {"format-version": "2"},
    )
    meta3 = dict(meta2)
    meta3["current-snapshot-id"] = 8
    meta3["snapshots"] = meta2["snapshots"] + [
        {**snap, "snapshot-id": 8,
         "manifest-list": os.path.join(meta_dir, "snap-8.avro")}
    ]
    with open(os.path.join(meta_dir, "v3.metadata.json"), "w") as f:
        json.dump(meta3, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("3")
    with pytest.raises(ValueError, match="equality delete"):
        read_iceberg(spark, dest).collect()


def _entry_schema_with_equality_ids() -> dict:
    """Manifest entry schema as other engines (Flink) write it: the
    optional equality_ids list on data_file (spec field 135) — now
    part of the module's own entry schema (the export writes equality
    deletes itself), so this is a passthrough kept for the test's
    narrative."""
    from data_lakehouse_spark.interop import iceberg as ice

    return ice._MANIFEST_ENTRY_SCHEMA


def test_read_iceberg_applies_equality_deletes(spark, tmp_path):
    """v2 equality deletes (the Flink-CDC write shape): rows matching
    the delete file's key columns vanish from data files with LOWER
    sequence numbers; rows written AFTER the delete (higher seq)
    survive — the spec's ordering rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_lakehouse_spark.interop import iceberg as ice

    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(i,) for i in range(10)], "id long")
        .coalesce(1),
    )
    dest = str(tmp_path / "iceeq")
    export_iceberg(cat, "t", dest)
    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        meta = json.load(f)
    snap = meta["snapshots"][0]
    _, manifests = _read_avro_file(snap["manifest-list"])
    base = dict(manifests[0])
    id_field = next(
        f["id"] for f in meta["schemas"][0]["fields"] if f["name"] == "id"
    )

    # a LATER data file (seq 3): its rows must survive the seq-2 delete
    late_file = os.path.join(meta_dir, "late.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 102], pa.int64())}), late_file
    )
    eq_schema = _entry_schema_with_equality_ids()
    late_manifest = os.path.join(meta_dir, "late-m0.avro")
    ice._write_avro(
        spark, late_manifest, eq_schema,
        [{
            "status": 1, "snapshot_id": 7, "sequence_number": 3,
            "file_sequence_number": 3,
            "data_file": {
                "content": 0, "file_path": late_file,
                "file_format": "PARQUET", "partition": None,
                "record_count": 2,
                "file_size_in_bytes": os.path.getsize(late_file),
            },
        }],
        {"format-version": "2", "content": "data"},
    )
    # equality delete at seq 2 on id in {1, 2}
    eq_file = os.path.join(meta_dir, "eq-del.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), eq_file)
    eq_manifest = os.path.join(meta_dir, "eq-m1.avro")
    ice._write_avro(
        spark, eq_manifest, eq_schema,
        [{
            "status": 1, "snapshot_id": 7, "sequence_number": 2,
            "file_sequence_number": 2,
            "data_file": {
                "content": 2, "file_path": eq_file,
                "file_format": "PARQUET", "partition": None,
                "record_count": 2,
                "file_size_in_bytes": os.path.getsize(eq_file),
                "equality_ids": [id_field],
            },
        }],
        {"format-version": "2", "content": "deletes"},
    )
    new_list = os.path.join(meta_dir, "snap-7-eq.avro")
    ice._write_avro(
        spark, new_list, ice._MANIFEST_LIST_SCHEMA,
        [
            base,
            {**base, "manifest_path": late_manifest, "sequence_number": 3},
            {**base, "manifest_path": eq_manifest, "content": 1,
             "sequence_number": 2},
        ],
        {"format-version": "2"},
    )
    meta2 = dict(meta)
    meta2["current-snapshot-id"] = 7
    meta2["snapshots"] = meta["snapshots"] + [
        {**snap, "snapshot-id": 7, "sequence-number": 3,
         "manifest-list": new_list}
    ]
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(meta2, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")

    got = sorted(r["id"] for r in read_iceberg(spark, dest).collect())
    # seq-1 rows 1,2 die; late (seq 3) rows 1 and 102 SURVIVE
    assert got == [0, 1, 3, 4, 5, 6, 7, 8, 9, 102]


def test_eq_delete_write_path_catalog_semantics(spark, tmp_path):
    """delete_where(mode='mor-eq'): key-scoped suppression with
    sequence-number semantics engine-side — a deleted key RE-APPENDED
    after the delete survives; time travel to the pre-delete version
    sees everything; the CDF surfaces delete images; the fold rewrite
    clears the delete files at identical contents."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, seg string, amt double",
        ),
    )
    cat.append(
        "t", spark.createDataFrame([(4, "c", 40.0)], "id long, seg string, amt double")
    )
    out = cat.delete_where(
        "t", "seg = 'a'", mode="mor-eq", equality_cols=["id"]
    )
    # key scope: rows 1 and 3 suppressed (2 keys, 2 rows)
    assert out["deleted_keys"] == 2 and out["affected_rows"] == 2
    assert sorted(r["id"] for r in cat.read("t").collect()) == [2, 4]
    # sequence rule: the same key written AFTER the delete survives
    cat.append(
        "t", spark.createDataFrame([(1, "a2", 11.0)], "id long, seg string, amt double")
    )
    assert sorted((r["id"], r["seg"]) for r in cat.read("t").collect()) == [
        (1, "a2"), (2, "b"), (4, "c"),
    ]
    # a SECOND delete kills the re-appended row (its seq is lower now)
    cat.delete_where("t", "id = 1", mode="mor-eq", equality_cols=["id"])
    assert sorted(r["id"] for r in cat.read("t").collect()) == [2, 4]
    # time travel: pre-delete snapshot is intact
    assert cat.read("t", version=1).count() == 4
    # CDF across the first delete: both suppressed rows image as deletes
    ch = cat.table_changes("t", 1, 2)
    assert sorted(
        (r["id"], r["_change_type"]) for r in ch.collect()
    ) == [(1, "delete"), (3, "delete")]
    # fold: identical contents, delete files gone
    before = _rows(cat.read("t"))
    folded = cat.rewrite_position_deletes("t")
    assert folded["delete_dirs_removed"] == 2
    assert _rows(cat.read("t")) == before
    # validation: equality_cols is required and must exist
    with pytest.raises(ValueError, match="equality_cols"):
        cat.delete_where("t", "id = 2", mode="mor-eq")
    with pytest.raises(ValueError, match="schema"):
        cat.delete_where(
            "t", "id = 2", mode="mor-eq", equality_cols=["nope"]
        )


def test_eq_delete_zero_copy_export_roundtrip(spark, tmp_path):
    """The equality-delete WRITE path round-trips through genuine
    Iceberg v2: zero-copy export emits a delete manifest (content=2
    entries with equality_ids + per-file sequence numbers, manifests
    written by the Java Avro library) and the independent pure-Python
    spec reader reproduces the catalog's survivors — including a
    deleted key re-appended after the delete."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, seg string, amt double",
        ),
    )
    cat.delete_where("t", "seg = 'a'", mode="mor-eq", equality_cols=["id"])
    cat.append(
        "t", spark.createDataFrame([(1, "a2", 11.0)], "id long, seg string, amt double")
    )
    dest = str(tmp_path / "ice")
    out = export_iceberg(cat, "t", dest)
    assert out["materialized"] is False
    assert out["delete_files"] == 1
    assert _rows(read_iceberg(spark, dest)) == _rows(cat.read("t"))
    # the delete manifest is spec-shaped: content=1 in the manifest
    # list, content=2 + equality_ids on the entry
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        v = f.read().strip()
    with open(os.path.join(dest, "metadata", f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert meta["last-sequence-number"] > 1
    _, manifests = _read_avro_file(
        meta["snapshots"][0]["manifest-list"]
    )
    by_content = {m["content"]: m for m in manifests}
    assert set(by_content) == {0, 1}
    _, dentries = _read_avro_file(by_content[1]["manifest_path"])
    assert dentries[0]["data_file"]["content"] == 2
    assert dentries[0]["data_file"]["equality_ids"] == [1]  # id's field id
    # data files written AFTER the delete carry a higher sequence
    dseq = dentries[0]["sequence_number"]
    _, entries = _read_avro_file(by_content[0]["manifest_path"])
    seqs = sorted({e["sequence_number"] for e in entries})
    assert seqs[0] < dseq < seqs[-1]


def test_eq_delete_pinned_scope_materialize_export_roundtrip(
    spark, tmp_path
):
    """applies_to-PINNED equality deletes (the clone shapes) at history
    depth: a clone inherits its source's eq-delete with coverage pinned
    to a fixed dir list, takes clone-local appends (including a
    re-append of a deleted key, which must SURVIVE — it is outside the
    pinned dirs), a clone-local eq-delete, while the source grows
    branch commits. Zero-copy export of the clone must REFUSE (the
    spec's strictly-lower sequence rule cannot express pinned
    coverage); materialize=True must round-trip through read_iceberg to
    exactly the catalog's survivors. The SOURCE stays zero-copy
    exportable and round-trips unchanged."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
            "id long, seg string, amt double",
        ),
    )
    cat.delete_where("t", "id <= 2", mode="mor-eq", equality_cols=["id"])
    cat.clone_table("t", "c")
    # clone-local history: re-append a deleted key (survives: outside
    # the pinned dirs), append fresh rows, then a clone-local eq-delete
    cat.append(
        "c",
        spark.createDataFrame(
            [(1, "a2", 11.0), (9, "z", 90.0)], "id long, seg string, amt double"
        ),
    )
    cat.delete_where("c", "id = 4", mode="mor-eq", equality_cols=["id"])
    # source keeps evolving independently (branch + main commits)
    cat.create_branch("t", "dev")
    cat.append(
        "t",
        spark.createDataFrame([(7, "g", 70.0)], "id long, seg string, amt double"),
        branch="dev",
    )
    cat.append(
        "t",
        spark.createDataFrame([(8, "h", 80.0)], "id long, seg string, amt double"),
    )
    expect_clone = _rows(cat.read("c"))
    assert sorted(r[0] for r in expect_clone) == [1, 3, 9]
    # pinned scopes refuse zero-copy, loudly and by name
    with pytest.raises(ValueError, match="fixed dir list"):
        export_iceberg(cat, "c", str(tmp_path / "ice0"), materialize=False)
    dest = str(tmp_path / "ice1")
    out = export_iceberg(cat, "c", dest)  # default: must materialize
    assert out["materialized"] is True
    assert _rows(read_iceberg(spark, dest)) == expect_clone
    # a materialized export carries NO delete manifests — survivors only
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        v = f.read().strip()
    with open(os.path.join(dest, "metadata", f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    _, manifests = _read_avro_file(meta["snapshots"][0]["manifest-list"])
    assert {m["content"] for m in manifests} == {0}
    # the source (local eq-delete, no pinned scope) still zero-copies
    dest_src = str(tmp_path / "ice_src")
    out_src = export_iceberg(cat, "t", dest_src)
    assert out_src["materialized"] is False
    assert _rows(read_iceberg(spark, dest_src)) == _rows(cat.read("t"))


def test_eq_delete_partitioned_export_uses_unpartitioned_spec(
    spark, tmp_path
):
    """Equality deletes on a PARTITIONED table export under an ADDED
    unpartitioned spec (spec-id 1). Per the Iceberg spec only delete
    files in an unpartitioned spec apply globally — a content=2 entry
    under the partitioned spec 0 with null partition values would be
    scoped to the null partition by external readers and the deleted
    rows would resurrect. Round-trips rows AND pins the manifest-list/
    metadata shape."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame(
            [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d2", 40.0)],
            "id long, day string, amt double",
        ),
        partition_by=["day"],
    )
    cat.delete_where("t", "amt < 25.0", mode="mor-eq", equality_cols=["id"])
    cat.append(
        "t",
        spark.createDataFrame(
            [(1, "d1", 11.0)], "id long, day string, amt double"
        ),
    )
    dest = str(tmp_path / "ice")
    out = export_iceberg(cat, "t", dest)
    assert out["materialized"] is False
    assert out["delete_files"] >= 1
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id", "day", "amt")) == _rows(
        cat.read("t").select("id", "day", "amt")
    )
    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    assert set(specs) == {0, 1}
    assert specs[0]["fields"], "data spec must stay partitioned"
    assert specs[1]["fields"] == [], "delete spec must be unpartitioned"
    assert meta["default-spec-id"] == 0
    _, manifests = _read_avro_file(meta["snapshots"][0]["manifest-list"])
    by_content = {m["content"]: m for m in manifests}
    assert by_content[0]["partition_spec_id"] == 0
    assert by_content[1]["partition_spec_id"] == 1
    # delete entries are readable and carry no partition scoping
    _, dentries = _read_avro_file(by_content[1]["manifest_path"])
    for e in dentries:
        assert e["data_file"]["content"] == 2
        assert e["data_file"]["equality_ids"] == [1]
        assert e["data_file"]["partition"] in (None, {}, ())


def test_eq_delete_survives_clone_and_clone_local_appends(spark, tmp_path):
    """Cloned equality deletes pin their coverage to the dirs shipped
    with the clone (applies_to): the delete's sequence lives in SOURCE
    version space while clone-local appends number from 0, so a naive
    strictly-lower comparison would wrongly suppress rows appended to
    the CLONE after the delete. Also: row_count and drop_column on
    mor-eq tables (review findings: row_count used to TypeError on the
    dict entries; dropping a live eq-key column used to brick reads)."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "src", spark.createDataFrame([(1, "a"), (2, "b")], "id long, seg string")
    )
    cat.append("src", spark.createDataFrame([(3, "c")], "id long, seg string"))
    cat.delete_where("src", "id <= 2", mode="mor-eq", equality_cols=["id"])
    cat.clone_table("src", "c")
    # the clone sees the source's survivors
    assert sorted(r["id"] for r in cat.read("c").collect()) == [3]
    # a deleted key appended to the CLONE (clone-local dir v00001,
    # which would decode BELOW the source-space seq) must survive
    cat.append("c", spark.createDataFrame([(1, "a2")], "id long, seg string"))
    assert sorted((r["id"], r["seg"]) for r in cat.read("c").collect()) == [
        (1, "a2"), (3, "c"),
    ]
    # the source is untouched
    assert sorted(r["id"] for r in cat.read("src").collect()) == [3]
    # row_count over mor-eq tables: merged-view fallback, correct value
    assert cat.row_count("c") == 2
    assert cat.row_count("src") == 1
    # dropping a live eq-key column refuses with the fold hint...
    with pytest.raises(ValueError, match="equality delete"):
        cat.drop_column("src", "id")
    # ...and works after the fold (metadata-only count path restored)
    cat.rewrite_position_deletes("src")
    cat.drop_column("src", "id")
    assert cat.row_count("src") == 1
    assert cat.read("src").columns == ["seg"]


def test_eq_delete_renamed_key_forces_materialize(spark, tmp_path):
    """A key column renamed after an equality delete cannot export
    zero-copy (the delete parquet carries the old name) — the export
    refuses and materialize=True rewrites cleanly."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, seg string")
    )
    cat.delete_where("t", "id = 1", mode="mor-eq", equality_cols=["id"])
    cat.rename_column("t", "id", "ident")
    # the catalog read itself resolves the rename via field ids
    assert sorted(r["ident"] for r in cat.read("t").collect()) == [2]
    with pytest.raises(ValueError, match="renamed"):
        export_iceberg(cat, "t", str(tmp_path / "ice0"), materialize=False)
    dest = str(tmp_path / "ice1")
    out = export_iceberg(cat, "t", dest, materialize=True)
    assert out["materialized"] is True
    assert sorted(r["ident"] for r in read_iceberg(spark, dest).collect()) == [2]


def test_eq_delete_carries_across_branches(spark, tmp_path):
    """Branches share the table's version space (unlike clones), so an
    equality delete committed on main is honored on a branch created
    after it, and branch-local appends of a deleted key survive (their
    commit versions are strictly above the delete's sequence)."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, seg string")
    )
    cat.delete_where("t", "id = 1", mode="mor-eq", equality_cols=["id"])
    cat.create_branch("t", "dev")
    assert sorted(r["id"] for r in cat.read("t", branch="dev").collect()) == [2]
    # re-append the deleted key ON THE BRANCH: survives the older delete
    cat.append(
        "t",
        spark.createDataFrame([(1, "a2")], "id long, seg string"),
        branch="dev",
    )
    assert sorted(
        (r["id"], r["seg"]) for r in cat.read("t", branch="dev").collect()
    ) == [(1, "a2"), (2, "b")]
    # main is untouched by the branch append
    assert sorted(r["id"] for r in cat.read("t").collect()) == [2]


def test_eq_delete_committed_on_clone_scopes_correctly(spark, tmp_path):
    """A NEW equality delete committed ON a clone (mixed version
    spaces: cloned dirs decode to SOURCE versions, clone-local commits
    number from 0) pins its coverage to the pre-delete snapshot
    (applies_to) — cloned rows of the key die even when their
    source-space seq is >= the clone-local delete seq, clone-local rows
    appended AFTER the delete survive, and the export refuses zero-copy
    (the spec's sequence rule can't express the pinned scope) but
    materializes correctly."""
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "src", spark.createDataFrame([(1, "a")], "id long, seg string")
    )
    cat.append("src", spark.createDataFrame([(3, "c")], "id long, seg string"))
    # src now at version 1; row id=3 lives in source dir v00001
    cat.clone_table("src", "c")
    # clone-local delete commits at clone version 1 == the SOURCE seq
    # of v00001 — the cross-space collision the applies_to pin closes
    out = cat.delete_where("c", "id = 3", mode="mor-eq", equality_cols=["id"])
    assert out["affected_rows"] == 1
    assert sorted(r["id"] for r in cat.read("c").collect()) == [1]
    # clone-local re-append of the deleted key survives
    cat.append("c", spark.createDataFrame([(3, "c2")], "id long, seg string"))
    assert sorted((r["id"], r["seg"]) for r in cat.read("c").collect()) == [
        (1, "a"), (3, "c2"),
    ]
    # source untouched
    assert sorted(r["id"] for r in cat.read("src").collect()) == [1, 3]
    # zero-copy export refuses the pinned scope; materialize works
    with pytest.raises(ValueError, match="fixed dir list"):
        export_iceberg(cat, "c", str(tmp_path / "ice0"), materialize=False)
    dest = str(tmp_path / "ice1")
    export_iceberg(cat, "c", dest, materialize=True)
    assert sorted(
        (r["id"], r["seg"]) for r in read_iceberg(spark, dest).collect()
    ) == [(1, "a"), (3, "c2")]


def test_eq_delete_random_interleavings_match_python_model(spark, tmp_path):
    """Property pin: arbitrary interleavings of appends and equality
    deletes must match a 40-line pure-Python reference model of the
    spec's sequence rule (a delete at commit k suppresses rows written
    at commits < k whose key is in the delete set; later writers of the
    same key survive until a later delete). Deterministic seeds, three
    scripts, keys reused across commits on purpose."""
    import random

    for seed in (7, 41, 1999):
        rng = random.Random(seed)
        cat = _cat(spark, tmp_path / f"s{seed}")
        # python model: list of (commit, id, payload) live rows
        model: list[tuple[int, int, str]] = []
        commit = 0
        first = [(i, f"r{seed}-0-{i}") for i in range(rng.randint(2, 5))]
        cat.create_table(
            "t",
            spark.createDataFrame(first, "id long, payload string"),
        )
        model += [(0, i, p) for i, p in first]
        commit = 1
        for step in range(6):
            if rng.random() < 0.45 and model:
                # equality delete on a random subset of known keys
                keys = sorted(
                    {i for _, i, _ in model if rng.random() < 0.5}
                )
                if not keys:
                    keys = [model[0][1]]
                cat.delete_where(
                    "t",
                    F.col("id").isin([int(k) for k in keys]),
                    mode="mor-eq",
                    equality_cols=["id"],
                )
                model = [
                    (c, i, p)
                    for (c, i, p) in model
                    if not (i in keys and c < commit)
                ]
            else:
                rows = [
                    (rng.randint(0, 6), f"r{seed}-{commit}-{j}")
                    for j in range(rng.randint(1, 3))
                ]
                cat.append(
                    "t",
                    spark.createDataFrame(rows, "id long, payload string"),
                )
                model += [(commit, i, p) for i, p in rows]
            commit += 1
        got = sorted(
            (r["id"], r["payload"]) for r in cat.read("t").collect()
        )
        want = sorted((i, p) for _, i, p in model)
        assert got == want, (seed, got, want)
        # the same state must round-trip through genuine Iceberg v2
        dest = str(tmp_path / f"ice{seed}")
        out = export_iceberg(cat, "t", dest)
        assert out["materialized"] is False
        assert (
            sorted(
                (r["id"], r["payload"])
                for r in read_iceberg(spark, dest).collect()
            )
            == want
        )


def test_export_history_time_travel(spark, tmp_path):
    """Full-history export: every published catalog version becomes an
    Iceberg snapshot; external VERSION AS OF (snapshot_id) reproduces
    catalog time travel, and the current snapshot is the head."""
    from data_lakehouse_spark.interop.iceberg import export_iceberg_history

    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))  # v0
    cat.append("t", spark.createDataFrame([(2,)], "id long"))  # v1
    cat.overwrite("t", spark.createDataFrame([(9,)], "id long"))  # v2
    cat.append("t", spark.createDataFrame([(10,)], "id long"))  # v3
    dest = str(tmp_path / "icehist")
    res = export_iceberg_history(cat, "t", dest)
    snaps = {s["catalog_version"]: s["snapshot_id"] for s in res["snapshots"]}
    assert sorted(snaps) == [0, 1, 2, 3]

    for v, want in [(0, [(1,)]), (1, [(1,), (2,)]), (2, [(9,)]),
                    (3, [(9,), (10,)])]:
        got = read_iceberg(spark, dest, snapshot_id=snaps[v])
        assert _rows(got.select("id")) == want, v
    # default read = head
    assert _rows(read_iceberg(spark, dest).select("id")) == [(9,), (10,)]

    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    # monotone history: sequence numbers and snapshot-log timestamps
    seqs = [s["sequence-number"] for s in meta["snapshots"]]
    assert seqs == sorted(seqs) == list(range(1, 5))
    ts = [e["timestamp-ms"] for e in meta["snapshot-log"]]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    # parent chain
    parents = [s.get("parent-snapshot-id") for s in meta["snapshots"]]
    assert parents[0] is None
    assert parents[1:] == [s["snapshot-id"] for s in meta["snapshots"][:-1]]


def test_export_history_refuses_mor_and_spec_change(spark, tmp_path):
    from data_lakehouse_spark.interop.iceberg import export_iceberg_history

    cat = _cat(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,), (2,)], "id long"))
    cat.delete_where("t", "id = 1", mode="mor")
    with pytest.raises(ValueError, match="MOR delete"):
        export_iceberg_history(cat, "t", str(tmp_path / "h1"))

    cat.create_table(
        "p",
        spark.createDataFrame([(1, "a")], "id long, k string"),
        partition_by=["k"],
    )
    cat.set_partition_spec("p", None)
    cat.append("p", spark.createDataFrame([(2, "b")], "id long, k string"))
    with pytest.raises(ValueError, match="partition spec changed"):
        export_iceberg_history(cat, "p", str(tmp_path / "h2"))
