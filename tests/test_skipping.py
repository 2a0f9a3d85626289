"""Dir-level bloom-filter point-lookup skipping and partition-spec
evolution (Iceberg metadata-only op analogs)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog


def _catalog(spark, tmp_path) -> Catalog:
    return Catalog(spark, str(tmp_path / "warehouse"))


def _keys(tag: str, n: int) -> list[str]:
    """Hash-like keys: every dir's [min, max] spans ~the whole hex
    domain, so footer min/max stats CANNOT prune point lookups —
    exactly the regime the bloom sidecar exists for."""
    return [hashlib.md5(f"{tag}:{i}".encode()).hexdigest() for i in range(n)]


def _bloom_table(spark, cat: Catalog):
    batches = [_keys(tag, 200) for tag in ("a", "b", "c")]
    dfs = [
        spark.createDataFrame([(k, tag) for k in batch], "doc_key string, src string")
        for batch, tag in zip(batches, "abc")
    ]
    cat.create_table(
        "docs", dfs[0], properties={"bloom.columns": "doc_key"}
    )
    cat.append("docs", dfs[1])
    cat.append("docs", dfs[2])
    return batches


def test_bloom_point_lookup_prunes_to_one_dir(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    batches = _bloom_table(spark, cat)
    probe = batches[1][17]  # lives only in the second dir (v00001)
    df = cat.read("docs", prune_eq={"doc_key": probe})
    files = df.inputFiles()
    assert files, "probe dir must survive pruning"
    assert all("/v00001/" in f for f in files), files
    rows = df.filter(F.col("doc_key") == probe).collect()
    assert len(rows) == 1 and rows[0]["src"] == "b"
    # min/max alone could NOT have pruned: the range tier keeps all dirs
    eq = {"doc_key": (probe, probe)}
    entries = cat._load_manifest(cat._handle("docs"))
    kept = [
        e for e in entries[:3] if not Catalog._dir_prunable(e.get("stats"), eq)
    ]
    assert len(kept) == 3


def test_bloom_absent_key_prunes_every_dir(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    _bloom_table(spark, cat)
    df = cat.read("docs", prune_eq={"doc_key": "not-a-real-key"})
    assert df.inputFiles() == []
    assert df.count() == 0
    # schema survives the empty-scan path
    assert df.columns == ["doc_key", "src"]


def test_bloom_pruned_read_equals_full_scan(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    batches = _bloom_table(spark, cat)
    for probe in (batches[0][0], batches[2][199]):
        pruned = (
            cat.read("docs", prune_eq={"doc_key": probe})
            .filter(F.col("doc_key") == probe)
            .collect()
        )
        full = (
            cat.read("docs").filter(F.col("doc_key") == probe).collect()
        )
        assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))


def test_compaction_regenerates_bloom_sidecars(spark, tmp_path):
    """OPTIMIZE rewrites dirs through the same commit path, so the
    compacted dir gets fresh bloom sidecars: absent-key lookups still
    open zero files after compaction."""
    cat = _catalog(spark, tmp_path)
    batches = _bloom_table(spark, cat)
    cat.compact("docs")
    assert cat.read("docs", prune_eq={"doc_key": "nope"}).inputFiles() == []
    probe = batches[1][3]
    hits = (
        cat.read("docs", prune_eq={"doc_key": probe})
        .filter(F.col("doc_key") == probe)
        .collect()
    )
    assert len(hits) == 1


def test_prune_eq_range_tier_without_blooms(spark, tmp_path):
    """Tables without bloom.columns still get the min/max tier for
    prune_eq (lo = hi = value) — ordered keys prune by footer stats."""
    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "m", spark.createDataFrame([(i,) for i in range(100)], "id long")
    )
    cat.append(
        "m", spark.createDataFrame([(i,) for i in range(1000, 1100)], "id long")
    )
    df = cat.read("m", prune_eq={"id": 1050})
    assert df.inputFiles() and all("/v00001/" in f for f in df.inputFiles())


def test_parquet_native_bloom_written(spark, tmp_path):
    """The file tier: parquet-native bloom filters are present in the
    written files for bloom.columns (Spark's reader consults them for
    pushed equality predicates). This pyarrow build doesn't expose
    bloom_filter_offset, so presence is asserted by the byte overhead a
    bloom-bearing file carries over the identical bloom-less write,
    plus plain (non-dictionary) encoding of the bloom column —
    parquet-mr suppresses blooms on fully dict-encoded columns."""
    import pyarrow.parquet as pq

    cat = _catalog(spark, tmp_path)
    _bloom_table(spark, cat)
    plain = Catalog(spark, str(tmp_path / "warehouse_plain"))
    keys = _keys("a", 200)
    plain.create_table(
        "docs",
        spark.createDataFrame([(k, "a") for k in keys], "doc_key string, src string"),
    )

    def _bytes(root: str) -> int:
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    with_bloom = _bytes(os.path.join(str(tmp_path / "warehouse"), "docs", "v00000"))
    without = _bytes(os.path.join(str(tmp_path / "warehouse_plain"), "docs", "v00000"))
    assert with_bloom > without
    pfile = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(
            os.path.join(str(tmp_path / "warehouse"), "docs", "v00000")
        )
        for f in fs
        if f.endswith(".parquet")
    )
    col = pq.read_metadata(pfile).row_group(0).column(0)
    assert col.path_in_schema == "doc_key"
    assert not col.has_dictionary_page


def test_partition_spec_evolution_mixed_layouts(spark, tmp_path):
    """Spec evolution is metadata-only: old dirs keep the old layout,
    new appends use the new spec, reads union both."""
    cat = _catalog(spark, tmp_path)
    df1 = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1), ("2024-01-02 11:00:00", 2)],
        "ts_s string, v long",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "v")
    cat.create_table("ev", df1, partition_by=["days(ts)"])
    cat.set_partition_spec("ev", ["months(ts)"])
    df2 = spark.createDataFrame(
        [("2024-02-05 09:00:00", 3)], "ts_s string, v long"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "v")
    cat.append("ev", df2)

    root = os.path.join(str(tmp_path / "warehouse"), "ev")
    assert any(d.startswith("ts_day=") for d in os.listdir(f"{root}/v00000"))
    assert any(d.startswith("ts_month=") for d in os.listdir(f"{root}/v00002"))
    # all rows visible; no data was rewritten for the spec change
    out = cat.read("ev")
    assert sorted(r["v"] for r in out.collect()) == [1, 2, 3]
    ops = [r["operation"] for r in cat.snapshots("ev").collect()]
    assert ops == ["create", "set_partition_spec", "append"]


def test_catalog_sql_views(spark, tmp_path):
    """Named SQL views over catalog tables: logical (track snapshots),
    stackable (view-over-view), visible to spark.sql after
    register_views — the dbt-model naming layer."""
    import pytest

    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "orders",
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 5.0)],
            "id long, seg string, amt double",
        ),
    )
    cat.create_view(
        "seg_totals",
        "SELECT seg, SUM(amt) AS total FROM orders GROUP BY seg",
    )
    cat.create_view(
        "big_segs", "SELECT * FROM seg_totals WHERE total > 12"
    )
    out = {r["seg"]: r["total"] for r in cat.read_view("seg_totals").collect()}
    assert out == {"A": 15.0, "B": 20.0}
    assert sorted(
        r["seg"] for r in cat.read_view("big_segs").collect()
    ) == ["A", "B"]

    # logical: a new append is visible through the view immediately
    cat.append(
        "orders", spark.createDataFrame([(4, "B", 1.0)], "id long, seg string, amt double")
    )
    out = {r["seg"]: r["total"] for r in cat.read_view("seg_totals").collect()}
    assert out["B"] == 21.0

    with pytest.raises(ValueError, match="already exists"):
        cat.create_view("seg_totals", "SELECT 1")
    cat.create_view("seg_totals", "SELECT seg, COUNT(*) AS total FROM orders GROUP BY seg", replace=True)
    assert {r["seg"]: r["total"] for r in cat.read_view("seg_totals").collect()} == {"A": 2, "B": 2}
    cat.drop_view("big_segs")
    with pytest.raises(ValueError, match="does not exist"):
        cat.read_view("big_segs")
    with pytest.raises(ValueError, match="as a table"):
        cat.create_view("orders", "SELECT 1")


def test_check_constraints_enforced_on_write(spark, tmp_path):
    """Delta-style CHECK constraints: violating commits refuse before
    any manifest change; DML that would create a violation refuses;
    maintenance rewrites skip the re-check."""
    import pytest

    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        properties={"check.constraints": "v >= 0; id IS NOT NULL"},
    )
    with pytest.raises(ValueError, match="CHECK constraint"):
        cat.append("t", spark.createDataFrame([(3, -1.0)], "id long, v double"))
    with pytest.raises(ValueError, match="CHECK constraint"):
        cat.append(
            "t", spark.createDataFrame([(None, 1.0)], "id long, v double")
        )
    # refused commits left no trace
    assert cat.snapshots("t").count() == 1
    assert cat.read("t").count() == 2
    cat.append("t", spark.createDataFrame([(3, 0.0)], "id long, v double"))
    assert cat.read("t").count() == 3
    # an UPDATE that would break the constraint refuses too
    with pytest.raises(ValueError, match="CHECK constraint"):
        cat.update_where("t", "id = 1", {"v": "-5.0"})
    assert {r["id"]: r["v"] for r in cat.read("t").collect()}[1] == 10.0
    # compaction (carries validated rows) passes untouched
    cat.compact("t")
    assert cat.read("t").count() == 3


def test_sort_columns_property_clusters_files(spark, tmp_path):
    """sort.columns is a declared write order: every commit clusters key
    ranges within files, so per-row-group min/max spans shrink from
    ~whole-domain (random order) to tight slices."""
    import pyarrow.parquet as pq

    def spans(root: str) -> list[tuple[int, int]]:
        out = []
        for dp, _, fs in os.walk(root):
            for fname in fs:
                if not fname.endswith(".parquet"):
                    continue
                md = pq.read_metadata(os.path.join(dp, fname))
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(0).statistics
                    out.append((st.min, st.max))
        return out

    rows = [(i * 37 % 10_000,) for i in range(10_000)]  # shuffled keys
    df = lambda: spark.createDataFrame(rows, "k long").repartition(8)  # noqa: E731

    sorted_cat = Catalog(spark, str(tmp_path / "w_sorted"))
    sorted_cat.create_table(
        "t",
        df(),
        properties={"sort.columns": "k", "sort.distribute": "range"},
    )
    plain_cat = Catalog(spark, str(tmp_path / "w_plain"))
    plain_cat.create_table("t", df())

    sorted_spans = spans(str(tmp_path / "w_sorted" / "t" / "v00000"))
    plain_spans = spans(str(tmp_path / "w_plain" / "t" / "v00000"))
    avg = lambda xs: sum(b - a for a, b in xs) / len(xs)  # noqa: E731
    # clustered row groups cover far less of the key domain each
    assert avg(sorted_spans) < avg(plain_spans) / 2
    # rows unchanged
    assert sorted_cat.read("t").count() == 10_000


def test_alter_column_type_widening_zero_rewrite(spark, tmp_path):
    """int→long widening is manifest-only: old dirs keep the narrow
    physical type and reads cast per directory; values past int range
    land in new dirs; narrowing refuses."""
    import pytest

    cat = _catalog(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1,)], "id int"))
    cat.alter_column_type("t", "id", "long")
    cat.append(
        "t", spark.createDataFrame([(2**40,)], "id long")
    )
    out = cat.read("t")
    assert dict(out.dtypes)["id"] == "bigint"
    assert sorted(r["id"] for r in out.collect()) == [1, 2**40]
    # time travel to the pre-widen version still reads (as int)
    assert [r["id"] for r in cat.read("t", version=0).collect()] == [1]
    # narrowing / scale reinterpretation refuse
    with pytest.raises(ValueError, match="widening"):
        cat.alter_column_type("t", "id", "int")
    cat.add_column("t", "price", "decimal(10,2)")
    cat.alter_column_type("t", "price", "decimal(14,2)")  # precision ok
    with pytest.raises(ValueError, match="widening"):
        cat.alter_column_type("t", "price", "decimal(14,4)")  # scale no
    ops = [r["operation"] for r in cat.snapshots("t").collect()]
    assert ops == [
        "create", "alter_column_type", "append", "add_column",
        "alter_column_type",
    ]


def test_add_column_initial_default(spark, tmp_path):
    """Iceberg-v3 initial default: files lacking the column read the
    default recorded in the field metadata — zero rewrite; files that
    carry the column keep their written values."""
    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "ev", spark.createDataFrame([(1,)], "id long")
    )
    cat.add_column("ev", "status", "string", default="active")
    # old rows (file predates the column): default, not NULL
    assert [r["status"] for r in cat.read("ev").collect()] == ["active"]
    # a later append WITHOUT the column also reads the default
    cat.append("ev", spark.createDataFrame([(2,)], "id long"))
    # and one WITH the column keeps its explicit values (incl. NULL)
    cat.append(
        "ev",
        spark.createDataFrame(
            [(3, "churned"), (4, None)], "id long, status string"
        ),
    )
    rows = {r["id"]: r["status"] for r in cat.read("ev").collect()}
    assert rows == {1: "active", 2: "active", 3: "churned", 4: None}


def test_partition_spec_evolution_to_unpartitioned(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    cat.create_table(
        "t",
        spark.createDataFrame([("x", 1)], "k string, v long"),
        partition_by=["k"],
    )
    cat.set_partition_spec("t", None)
    cat.append("t", spark.createDataFrame([("y", 2)], "k string, v long"))
    assert sorted(r["v"] for r in cat.read("t").collect()) == [1, 2]
    root = os.path.join(str(tmp_path / "warehouse"), "t")
    assert not any(d.startswith("k=") for d in os.listdir(f"{root}/v00002"))


def test_partition_filters_push_through_catalog_read(spark, tmp_path):
    """A filter on the hive partition column must land as
    PartitionFilters in EVERY per-dir scan of the union — the property
    that makes `day = X` on a date-partitioned table read one
    partition, not the table."""
    from pyspark.sql import functions as F

    from data_lakehouse_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "w"))
    mk = lambda lo: spark.range(lo, lo + 300).select(  # noqa: E731
        F.col("id"), (F.col("id") % 3).cast("int").alias("b")
    )
    cat.create_table("p", mk(0), partition_by=["b"])
    cat.append("p", mk(300))
    plan = (
        cat.read("p").filter("b = 1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 2  # one per snapshot dir
    for ln in scans:
        assert "PartitionFilters: [isnotnull(b" in ln and "= 1)" in ln
