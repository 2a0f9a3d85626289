"""S12 object-store landing tier: put/stat/list semantics and the
land → discover → spark.read bronze path (reference:
dags/01_download_kaggle_dataset.py:197-234, dags/02:25-39)."""

from __future__ import annotations

import os
import threading

import pytest

from data_lakehouse_spark.sources.objectstore import ObjectStore


def test_put_stat_list_semantics(tmp_path):
    store = ObjectStore(str(tmp_path / "minio"))
    store.make_bucket("warehouse")
    assert store.bucket_exists("warehouse")
    assert not store.bucket_exists("nope")

    info = store.put_object("warehouse", "raw/a.txt", b"hello")
    assert info.size == 5
    assert info.etag == "5d41402abc4b2a76b9719d911017c592"  # md5("hello")
    assert store.get_object("warehouse", "raw/a.txt") == b"hello"

    # stat of a missing object raises (upload-verification contract)
    with pytest.raises(FileNotFoundError):
        store.stat_object("warehouse", "raw/missing.txt")
    # puts into a missing bucket raise
    with pytest.raises(FileNotFoundError):
        store.put_object("nope", "x", b"y")
    # traversal refuses
    with pytest.raises(ValueError):
        store.path("warehouse", "../../etc/passwd")

    store.put_object("warehouse", "raw/sub/c.txt", b"c")
    store.put_object("warehouse", "raw/b.txt", b"b")
    store.put_object("warehouse", "other/d.txt", b"d")
    keys = [o.object_name for o in store.list_objects("warehouse", "raw/")]
    assert keys == ["raw/a.txt", "raw/b.txt", "raw/sub/c.txt"]  # sorted
    top = [
        o.object_name
        for o in store.list_objects("warehouse", recursive=False)
    ]
    assert top == []  # all objects live under sub-prefixes

    store.remove_object("warehouse", "raw/b.txt")
    keys = [o.object_name for o in store.list_objects("warehouse", "raw/")]
    assert keys == ["raw/a.txt", "raw/sub/c.txt"]


def test_atomic_visibility_under_concurrent_listing(tmp_path):
    """A lister racing a writer sees whole objects or nothing — never a
    partial write (the S3 PUT contract the landing tier relies on)."""
    store = ObjectStore(str(tmp_path / "minio"))
    store.make_bucket("b")
    payload = b"x" * (1 << 20)
    seen_sizes = set()
    stop = threading.Event()

    def lister():
        while not stop.is_set():
            for o in store.list_objects("b"):
                seen_sizes.add(o.size)

    t = threading.Thread(target=lister)
    t.start()
    try:
        for i in range(20):
            store.put_object("b", f"o{i}.bin", payload)
    finally:
        stop.set()
        t.join()
    assert seen_sizes <= {len(payload)}


def test_land_discover_bronze_path(spark, tmp_path):
    """The full pre-engine flow: land CSVs → discover by prefix →
    spark.read → bronze rows."""
    csvs = []
    for i in range(2):
        p = tmp_path / f"part{i}.csv"
        p.write_text("id,v\n" + "".join(f"{j},{i}\n" for j in range(5)))
        csvs.append(str(p))
    (tmp_path / "notes.txt").write_text("not a csv")

    store = ObjectStore(str(tmp_path / "minio"))
    landed = store.land_files(
        "warehouse", csvs + [str(tmp_path / "notes.txt")],
        prefix="raw/ecommerce",
    )
    assert len(landed) == 3 and all(m["etag"] for m in landed)

    paths = store.discover("warehouse", "raw/ecommerce", suffix=".csv")
    assert len(paths) == 2 and paths == sorted(paths)
    df = spark.read.option("header", True).csv(paths)
    assert df.count() == 10
    assert set(df.columns) == {"id", "v"}
