"""Incremental MinHash index: build-on-prefix + add_batch(rest) must
reproduce exactly the batch pipeline's verified pairs that involve a
new document — same hash family, same bucket guard, same verification.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.operators import dedup
from data_lakehouse_spark.plans.incremental_dedup import IncrementalNearDupIndex

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    cat = Catalog(spark, str(tmp_path / "wh"))
    idx = IncrementalNearDupIndex(cat, "sigs")
    idx.build(old)
    rows_after_build = cat.read("sigs").count()
    assert rows_after_build == old.count() * idx.bands

    got = _pairs(idx.add_batch(new, docs, threshold=0.5))

    # batch reference: full-corpus LSH candidates → exact verify,
    # restricted to pairs touching a new doc
    cands = dedup.minhash_lsh_candidates(docs)
    batch = dedup.ngram_jaccard_pairs(docs, cands, threshold=0.5)
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {
        p
        for p in _pairs(batch)
        if p[0] in new_ids or p[1] in new_ids
    }
    assert got == want
    assert len(got) > 0  # fixture actually exercises the join

    # the batch folded into the index
    assert cat.read("sigs").count() == docs.count() * idx.bands


def test_second_batch_sees_first(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d0 = docs.filter(F.col("doc_id") % 3 == 0)
    d1 = docs.filter(F.col("doc_id") % 3 == 1)
    d2 = docs.filter(F.col("doc_id") % 3 == 2)

    cat = Catalog(spark, str(tmp_path / "wh2"))
    idx = IncrementalNearDupIndex(cat, "sigs")
    idx.build(d0)
    p1 = _pairs(idx.add_batch(d1, docs, threshold=0.5))
    p2 = _pairs(idx.add_batch(d2, docs, threshold=0.5))

    ids1 = {r["doc_id"] for r in d1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in d2.select("doc_id").collect()}
    assert all(a in ids1 or b in ids1 for a, b, _ in p1)
    assert all(a in ids2 or b in ids2 for a, b, _ in p2)
    # batches never re-emit earlier batches' pairs
    assert not (p1 & p2)

    # union over batches == batch pipeline pairs touching d1 ∪ d2
    cands = dedup.minhash_lsh_candidates(docs)
    batch = dedup.ngram_jaccard_pairs(docs, cands, threshold=0.5)
    want = {
        p
        for p in _pairs(batch)
        if p[0] in ids1 | ids2 or p[1] in ids1 | ids2
    }
    assert (p1 | p2) == want


def test_parameter_drift_refused(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    cat = Catalog(spark, str(tmp_path / "wh3"))
    IncrementalNearDupIndex(cat, "sigs", bands=16).build(docs)
    drifted = IncrementalNearDupIndex(cat, "sigs", bands=8)
    with pytest.raises(ValueError, match="drifted"):
        drifted.add_batch(docs, docs)
