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


def test_bpe_ish_token_count(spark):
    rows = [
        (1, "hello world"),            # 2 letter runs
        (2, "don't stop!"),            # don + ' + t + stop + ! → 5
        (3, "x=y+42;"),                # x = y + 42 ; → 6
        (4, ""),                       # 0
    ]
    got = {r["doc_id"]: r["n"] for r in spark.createDataFrame(rows, DOCS).select(
        "doc_id", T.bpe_ish_token_count("text").alias("n")).collect()}
    assert got == {1: 2, 2: 5, 3: 6, 4: 0}


def test_winnow_fingerprints_position_robust(spark):
    """A shared passage yields shared fingerprints regardless of where
    it sits in the document; unrelated text shares none."""
    from data_lakehouse_spark.operators import dedup

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, passage + " extra tail words here"),
        (2, "completely different preamble first " + passage),
        (3, "nothing in common with those documents at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, DOCS)
    fp = dedup.winnow_fingerprint_df(df, k=5, window=4)
    by_doc = {
        i: {r["fingerprint"] for r in fp.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]          # shared passage → shared prints
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # matches the single-expression convenience form
    conv = {
        (r["doc_id"], f)
        for r in df.select(
            "doc_id", T.winnow_fingerprints("text", k=5, window=4).alias("fps")
        ).collect()
        for f in r["fps"]
    }
    assert conv == {(i, f) for i in by_doc for f in by_doc[i]}


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


def test_frame_embed_stub_fanout_and_determinism(spark):
    """One video row fans out to ceil(bytes/frame_bytes) embedded frame
    rows; embeddings are unit-normalized and deterministic, and
    identical frames embed identically (the cross-modal dedup hook)."""
    text = "x" * 100  # 100 bytes -> frames of 64 -> 2 frames
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    frames = multimodal.frame_embed_stub(
        multimodal.attach_binary_payload(df), frame_bytes=64, dim=8
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {len(v) for v in by_doc.values()} == {2}
    for r in frames:
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9
    # same payload -> same per-frame vectors across docs
    v1 = sorted((r["frame_idx"], tuple(r["embedding"])) for r in by_doc[1])
    v2 = sorted((r["frame_idx"], tuple(r["embedding"])) for r in by_doc[2])
    assert v1 == v2


def test_audio_window_stub_overlap_contract(spark):
    """Windows advance by hop (< window): a 256-byte payload with
    window=128/hop=64 yields 4 windows starting at 0,64,128,192; RMS
    and peak are exact for a constant payload."""
    payload_text = chr(65) * 256  # byte value 65 throughout
    df = spark.createDataFrame([(7, payload_text)], "doc_id long, text string")
    wins = multimodal.audio_window_stub(
        multimodal.attach_binary_payload(df), window_bytes=128, hop_bytes=64
    ).orderBy("window_idx").collect()
    assert [w["start_byte"] for w in wins] == [0, 64, 128, 192]
    for w in wins:
        assert abs(w["rms"] - 65.0) < 1e-9 and w["peak"] == 65.0


def test_entry_multimodal_shared_generation_memoizes(spark):
    """The multimodal feature gates share ONE persisted decoded
    generation per (session, sf, source vintage) — the RFM/ANN-index
    amortization pattern: decode is a write-time feature-store cost,
    so repeated invocations must reuse the persisted table (same
    handle), and results must be identical across calls."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    sf_dir = "/root/testdata/sf0.001"
    a = em.queries()["multimodal_features"](spark, sf_dir)
    b = em.queries()["multimodal_features"](spark, sf_dir)
    ra = [(r["doc_id"], round(r["cosine_sim"], 9)) for r in a.collect()]
    rb = [(r["doc_id"], round(r["cosine_sim"], 9)) for r in b.collect()]
    assert ra == rb and len(ra) > 0
    # the memo handed both calls the SAME persisted feature frame
    key_tags = {k[0] for k in em._MM_MEMO}
    assert "entry.multimodal_features" in key_tags
    frames1 = em._mm_shared(
        spark, sf_dir, "entry.multimodal_features", lambda: None
    )
    frames2 = em._mm_shared(
        spark, sf_dir, "entry.multimodal_features", lambda: None
    )
    assert frames1 is frames2  # build() never re-ran (lambda: None would throw)
