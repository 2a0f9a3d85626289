"""End-to-end near-dup pipeline (LSH candidates → exact verify →
connected components): refinement + recall properties against the
exact-Jaccard clustering on the sf0.001 fixture.

Pipeline edges are a subset of exact-Jaccard edges (verification is
exact), so every pipeline cluster must sit INSIDE one exact cluster —
a structural guarantee independent of LSH luck. Recall (pipeline pair
coverage of exact pairs) depends on the MinHash family; the default
64-hash/16-band config must reach 1.0 on the fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import dedup, graph

SF_DIR = "/root/testdata/sf0.001"


def _clusters(df, id_col="doc_id"):
    return {r[id_col]: r["component_id"] for r in df.collect()}


def test_pipeline_refines_exact_clustering(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    cands = dedup.minhash_lsh_candidates(docs)
    verified = dedup.ngram_jaccard_pairs(docs, cands, threshold=0.5)
    pipe = _clusters(
        graph.connected_components(verified, vertices=docs, vertex_col="doc_id")
    )

    exact_pairs = dedup.ngram_jaccard_similar_pairs(docs, threshold=0.5)
    exact = _clusters(
        graph.connected_components(exact_pairs, vertices=docs, vertex_col="doc_id")
    )

    # refinement: a pipeline cluster never straddles two exact clusters
    by_pipe: dict[int, set[int]] = {}
    for doc, comp in pipe.items():
        by_pipe.setdefault(comp, set()).add(exact[doc])
    assert all(len(s) == 1 for s in by_pipe.values())

    # recall on the fixture: the default LSH config finds every
    # verified-similar pair, so the clusterings coincide
    assert pipe == exact


def test_pipeline_canonical_flags(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cands = dedup.minhash_lsh_candidates(docs)
    verified = dedup.ngram_jaccard_pairs(docs, cands, threshold=0.5)
    out = graph.connected_components(
        verified, vertices=docs, vertex_col="doc_id"
    ).withColumn("is_duplicate", F.col("component_id") != F.col("doc_id"))
    rows = out.collect()
    assert len(rows) == docs.count()
    # component label is the minimum member id: the canonical doc of
    # every cluster is not flagged duplicate
    comps: dict[int, list] = {}
    for r in rows:
        comps.setdefault(r["component_id"], []).append(r)
    for comp_id, members in comps.items():
        assert min(m["doc_id"] for m in members) == comp_id
        flags = {m["doc_id"]: m["is_duplicate"] for m in members}
        assert flags[comp_id] is False
        assert all(flags[d] for d in flags if d != comp_id)
