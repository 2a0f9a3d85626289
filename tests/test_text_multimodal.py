"""Text-analysis functions and multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark import multimodal
from data_lakehouse_spark.functions import text as T

DOCS = "doc_id long, text string"


def test_token_count_and_empty(spark):
    df = spark.createDataFrame([(1, "a b  c"), (2, "   "), (3, "one")], DOCS)
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", T.token_count("text").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 1}


def test_stopword_ratio_and_quality(spark):
    text = "the cat sat on the mat with a hat " * 3  # 27 tokens, 9 stopwords
    df = spark.createDataFrame([(1, text)], DOCS)
    r = df.select(
        T.stopword_ratio("text").alias("swr"),
        T.quality_score("text").alias("q"),
    ).first()
    assert r["swr"] == 0.3333  # the(x2) + a → 9 of 27
    assert r["q"] == 1.0


def test_language_guess(spark):
    rows = [
        (1, "the cat and the dog of the house"),
        (2, "el perro y la casa de madrid"),
        (3, "der hund und die katze"),
        (4, "xyz qqq zzz"),
    ]
    got = {r["doc_id"]: r["g"] for r in spark.createDataFrame(rows, DOCS).select(
        "doc_id", T.language_guess("text").alias("g")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "unknown"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([(1, "A  b\tC"), (2, "a b c")], DOCS)
    fps = [r["f"] for r in df.select(T.doc_fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1]


def test_multimodal_decode_stub(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "worldly")], DOCS)
    decoded = multimodal.decode_image_stub(multimodal.attach_binary_payload(df))
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows[1]["n_bytes"] == 5 and rows[2]["n_bytes"] == 7
    assert rows[1]["channels"] == 3 and rows[1]["format"] == "fake/raw"


def test_frame_sample_stub(spark):
    df = spark.createDataFrame([(1, "x" * 150)], DOCS)
    frames = multimodal.frame_sample_stub(
        multimodal.attach_binary_payload(df), every_n_bytes=64
    ).collect()
    assert [r["offset"] for r in frames] == [0, 64, 128]


def test_binary_meta_matches_md5(spark):
    df = spark.createDataFrame([(1, "abc")], DOCS)
    r = multimodal.extract_binary_meta(
        multimodal.attach_binary_payload(df)
    ).first()
    assert r["n_bytes"] == 3
    assert r["content_md5"] == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')


def test_multimodal_resize_stub(spark):
    df = spark.createDataFrame([(1, "hello world " * 10)], "doc_id long, text string")
    out = multimodal.resize_image_stub(
        multimodal.attach_binary_payload(df), target_width=8, target_height=4
    ).first()
    assert out["width"] == 8 and out["height"] == 4
    assert len(out["payload"]) == 32  # truncated/padded to w*h


def test_multimodal_feature_extract_feeds_similarity(spark):
    from data_lakehouse_spark.operators import similarity

    rows = [(i, f"document number {i} with some repeated words " * 3) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = multimodal.feature_extract_stub(
        multimodal.attach_binary_payload(df), dim=8
    )
    first = emb.orderBy("doc_id").first()
    assert len(first["embedding"]) == 8
    # unit-normalized
    assert abs(sum(x * x for x in first["embedding"]) - 1.0) < 1e-9
    # deterministic: same payload -> same vector
    again = multimodal.feature_extract_stub(
        multimodal.attach_binary_payload(df), dim=8
    ).orderBy("doc_id").first()
    assert again["embedding"] == first["embedding"]
    # plugs into the similarity surface end-to-end
    top = similarity.cosine_topk(
        emb, first["embedding"], vec_col="embedding", id_col="doc_id", k=3
    ).collect()
    assert top[0]["doc_id"] == 0 and abs(top[0]["cosine_sim"] - 1.0) < 1e-9
