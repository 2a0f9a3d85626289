"""Z-order clustering: the Morton layout must give TIGHT per-file
min/max bounds on every clustered column, where a linear sort gives
tight bounds only on its leading key — verified from the actual
parquet footers, not the plan."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.functions.zorder import scaled_rank, zorder_value


def _file_ranges(path: str, col: str) -> list[float]:
    """Per-file (max - min) width of ``col`` from parquet footers."""
    widths = []
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        widths.append(float(hi) - float(lo))
    return widths


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long")
    # a=0b011, b=0b101 at 3 bits -> z = interleave(a->even, b->odd bits)
    z = df.select(
        zorder_value(
            [F.col("a").cast("long"), F.col("b").cast("long")], bits=3
        ).alias("z")
    ).first()["z"]
    # bit layout: pos 2i holds a_i, pos 2i+1 holds b_i
    expect = sum(((3 >> i) & 1) << (2 * i) for i in range(3)) + sum(
        ((5 >> i) & 1) << (2 * i + 1) for i in range(3)
    )
    assert z == expect


def test_scaled_rank_bounds_and_nulls(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (None,)], "x double")
    ranks = [
        r["r"]
        for r in df.select(
            scaled_rank(F.col("x"), 0.0, 100.0, bits=4).alias("r")
        ).collect()
    ]
    assert ranks[0] == 0 and ranks[2] == 15 and 6 <= ranks[1] <= 8
    assert ranks[3] == 0  # NULLs rank first instead of erroring


def test_compact_zorder_tightens_both_columns(spark, tmp_path):
    """A 64x64 (x, y) grid written in x-major order: linear layout gives
    full-width y bounds per file; z-order compaction must shrink the
    mean y width dramatically while keeping x bounded too."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # x-major linear order, 16 files: each file spans ALL x values
    cat.create_table("g", grid.orderBy("y", "x").coalesce(1))
    stats = cat.compact("g", target_file_bytes=1, zorder_by=["x", "y"])
    assert stats["files_after"] > 4  # actually split into many files

    table_dir = os.path.join(str(tmp_path / "wh"), "g")
    latest = sorted(
        d for d in os.listdir(table_dir) if d.startswith("v")
    )[-1]
    zx = _file_ranges(os.path.join(table_dir, latest), "x")
    zy = _file_ranges(os.path.join(table_dir, latest), "y")
    # every file covers a rectangle: both dimensions bounded well below
    # the full 0..63 extent on average
    assert sum(zx) / len(zx) < 40
    assert sum(zy) / len(zy) < 40
    # and the data survived intact
    assert cat.read("g").count() == 64 * 64
