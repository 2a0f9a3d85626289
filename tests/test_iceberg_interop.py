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


def test_export_materializes_mor_deletes(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.create_table(
        "t", spark.createDataFrame([(i,) for i in range(10)], "id long")
    )
    cat.delete_where("t", "id >= 7", mode="mor")
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)  # auto-materialize
    assert res["materialized"] and res["rows"] == 7
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id")) == _rows(cat.read("t"))
    # zero-copy is refused explicitly, not silently wrong
    with pytest.raises(ValueError, match="MOR delete"):
        export_iceberg(cat, "t", str(tmp_path / "ice2"), materialize=False)


def test_export_materializes_partitioned_layout(spark, tmp_path):
    """Hive-partitioned dirs keep partition values OUT of the files —
    zero-copy export would read NULLs; materialization restores them."""
    cat = _cat(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2")], "id long, day string"
    )
    cat.create_table("t", df, partition_by=["day"])
    dest = str(tmp_path / "ice")
    res = export_iceberg(cat, "t", dest)
    assert res["materialized"]
    got = read_iceberg(spark, dest)
    assert _rows(got.select("id", "day")) == _rows(
        cat.read("t").select("id", "day")
    )


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
