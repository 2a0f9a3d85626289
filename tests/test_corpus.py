"""Corpus-construction operators: deterministic sampling, eval-set
decontamination, token-budget shard packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import corpus


def _docs(spark, n=400, vocab=("alpha", "beta", "gamma", "delta", "eps")):
    rows = [
        (i, " ".join(vocab[(i * 7 + j) % len(vocab)] for j in range(12)), "src%d" % (i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_hash_sample_fraction_and_determinism(spark):
    df = _docs(spark, 2000)
    kept = corpus.hash_sample(df, "doc_id", 0.25, seed=3)
    n = kept.count()
    assert abs(n / 2000 - 0.25) < 0.05
    # deterministic: same rows again, and invariant to partitioning
    again = corpus.hash_sample(df.repartition(13), "doc_id", 0.25, seed=3)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_hash_sample_subset_lattice(spark):
    """The 25% sample contains the 10% sample for the same seed —
    growing a mix never churns previously selected docs."""
    df = _docs(spark, 1000)
    small = {r.doc_id for r in corpus.hash_sample(df, "doc_id", 0.1, seed=5).collect()}
    big = {r.doc_id for r in corpus.hash_sample(df, "doc_id", 0.25, seed=5).collect()}
    assert small <= big


def test_hash_sample_no_shuffle(spark):
    plan = corpus.hash_sample(
        _docs(spark, 100), "doc_id", 0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_fractions(spark):
    df = _docs(spark, 3000)
    kept = corpus.stratified_hash_sample(
        df, "doc_id", "source", {"src0": 1.0, "src1": 0.2}, default_fraction=0.0
    )
    by_src = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("src0") == 1000  # fraction 1.0 keeps every row
    assert abs(by_src.get("src1", 0) / 1000 - 0.2) < 0.06
    assert "src2" not in by_src  # default 0.0 drops unlisted strata


def test_contamination_and_decontaminate(spark):
    # doc 0/1 share their full text with eval doc 100; doc 2 is disjoint.
    rows = [
        (0, "one two three four five six"),
        (1, "zero one two three four five"),
        (2, "seven eight nine ten eleven twelve"),
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id bigint, text string"
    )
    hits = {
        r.doc_id: r.n_overlap
        for r in corpus.contamination_hits(train, ev, shingle_n=4).collect()
    }
    assert hits[0] == 3  # all three 4-grams of doc 0 appear in eval
    assert hits[1] == 2  # suffix overlap only
    assert 2 not in hits
    clean = corpus.decontaminate(train, ev, shingle_n=4)
    assert [r.doc_id for r in clean.select("doc_id").collect()] == [2]
    # a stricter threshold keeps the partial-overlap doc
    clean3 = corpus.decontaminate(train, ev, shingle_n=4, min_overlap=3)
    assert sorted(r.doc_id for r in clean3.select("doc_id").collect()) == [1, 2]


def test_pack_shards_matches_naive_cumsum(spark):
    df = _docs(spark, 257)
    out = corpus.pack_shards(
        df, budget=100, chunk_span=40  # several chunks, docs span budgets
    ).collect()
    got = {r.doc_id: (r.n_tokens, r.shard_id) for r in out}
    # naive single-stream reference
    cum = 0
    for i in sorted(got):
        toks, shard = got[i]
        assert shard == cum // 100
        cum += toks
    # chunking granularity must not change the assignment
    one_chunk = corpus.pack_shards(df, budget=100, chunk_span=10**9).collect()
    assert {r.doc_id: r.shard_id for r in one_chunk} == {
        i: s for i, (_, s) in got.items()
    }


def test_pack_shards_within_chunk_window_is_partitioned(spark):
    plan = (
        corpus.pack_shards(_docs(spark, 100), budget=50, chunk_span=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-sized window runs partitioned by chunk, and the chunk
    # offset table reaches the probe side as a broadcast
    assert "windowspecdefinition(_chunk" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_quality_signals_hand_checked(spark):
    rows = [
        # 60 distinct-ish tokens, clean prose shape -> passes the gate
        (1, " ".join(f"tok{i} word{i}" for i in range(30))),
        # heavy repetition: one bigram dominates -> fails top_bigram/distinct
        (2, "spam ham " * 40),
        # symbol-heavy -> fails symbol ratio
        (3, " ".join("### ..." for _ in range(30))),
        # short doc -> fails length band
        (4, "tiny doc here"),
        (5, ""),
        (6, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in corpus.quality_signals(df).collect()}

    assert out[1]["n_tokens"] == 60
    assert out[1]["distinct_token_ratio"] == 1.0
    assert out[1]["gopher_pass"] is True

    # "spam ham" repeated: 80 tokens, 2 distinct; bigrams alternate
    # "spam ham" (40x) and "ham spam" (39x) -> top bigram 40/79
    assert out[2]["n_tokens"] == 80
    assert out[2]["distinct_token_ratio"] == round(2 / 80, 4)
    assert out[2]["top_bigram_ratio"] == round(40 / 79, 4)
    assert out[2]["dup_trigram_ratio"] == 1.0
    assert out[2]["gopher_pass"] is False

    assert out[3]["alpha_word_ratio"] == 0.0
    assert out[3]["symbol_word_ratio"] > 0.1
    assert out[3]["gopher_pass"] is False

    assert out[4]["gopher_pass"] is False

    # empty text: 0 tokens, every ratio NULL, gate concrete False
    assert out[5]["n_tokens"] == 0
    assert out[5]["mean_word_len"] is None
    assert out[5]["top_bigram_ratio"] is None
    assert out[5]["gopher_pass"] is False

    # single token: no bigrams/trigrams -> NULL ratios, not a crash
    assert out[6]["n_tokens"] == 1
    assert out[6]["top_bigram_ratio"] is None
    assert out[6]["dup_trigram_ratio"] is None
    assert out[6]["gopher_pass"] is False


def test_quality_signals_engines_agree(spark):
    """The Arrow kernel must be BIT-exact with the expression path,
    including the whitespace/empty-token edge cases of Spark's split
    (trailing empties kept, leading empty on tab-start, trim strips
    spaces only)."""
    rows = [
        (1, " ".join(f"tok{i} word" for i in range(30))),
        (2, "spam ham " * 40),
        (3, " ".join("### ..." for _ in range(30))),
        (4, "tiny doc here"),
        (5, ""),
        (6, "single"),
        (7, "\tstarts with tab and ends with newline\n"),
        (8, "  padded   with   spaces  "),
        (9, "a#b c...d ....e #"),
        (10, "x " * 60 + "x"),  # 61 identical tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = df.columns  # noqa: F841
    exp = {
        r["doc_id"]: r.asDict()
        for r in corpus.quality_signals(df, engine="expr").collect()
    }
    arw = {
        r["doc_id"]: r.asDict()
        for r in corpus.quality_signals(df, engine="arrow").collect()
    }
    assert exp.keys() == arw.keys()
    for k in exp:
        assert exp[k] == arw[k], f"doc {k}: {exp[k]} != {arw[k]}"


def test_quality_signals_single_scan_no_shuffle(spark):
    df = _docs(spark, 50)
    plan = (
        corpus.quality_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_redact_pii_counts_and_masks(spark):
    rows = [
        (1, "mail me at jo.doe+x@site.org or call +1 (555) 123-4567 now"),
        (2, "server 10.0.0.1 and 192.168.1.255 pinged"),
        (3, "clean text only"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in corpus.redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "[EMAIL]" in out[1]["redacted_text"]
    assert "[PHONE]" in out[1]["redacted_text"]
    assert "jo.doe" not in out[1]["redacted_text"]
    assert out[2]["n_ipv4"] == 2 and out[2]["redacted_text"].count("[IPV4]") == 2
    assert out[3]["n_pii_total"] == 0 and out[3]["redacted_text"] == "clean text only"


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(130))  # 130 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "")], "doc_id bigint, text string"
    )
    chunks = corpus.chunk_documents(df, chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0, 56, 112 -> 3 chunks; last one is the tail
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in c1] == [64, 64, 130 - 112]
    # overlap: chunk 1 starts 8 tokens before chunk 0 ends
    assert c1[0]["chunk_text"].split()[56:] == c1[1]["chunk_text"].split()[:8]
    # every token appears in at least one chunk
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert len(covered) == 130
    # short doc: one chunk; empty doc: no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 2
    assert 3 not in by_doc


def test_bloom_decontamination_superset_of_exact(spark):
    """The Bloom path must flag EVERY truly contaminated doc (no false
    negatives) with per-doc probable-overlap >= the exact distinct
    overlap; over-flagging is bounded by the filter's fpp."""
    docs = _docs(spark, 120)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in corpus.contamination_hits(train, ev, shingle_n=4).collect()
    }
    bloom = {
        r["doc_id"]: r["n_probable_overlap"]
        for r in corpus.contamination_hits_bloom(
            train, ev, shingle_n=4, fpp=1e-6
        ).collect()
    }
    # no false negatives, and counts can only grow
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n
    # false positives bounded: at fpp=1e-6 on this fixture, expect none
    extra = set(bloom) - set(exact)
    assert len(extra) <= 1

    # driver-compile guard trips instead of OOMing
    import pytest

    with pytest.raises(ValueError, match="max_eval_shingles"):
        corpus.contamination_hits_bloom(
            train, ev, shingle_n=4, max_eval_shingles=2
        )


def test_pack_shards_shuffled_deterministic_and_shuffled(spark):
    """Seeded shuffle-order packing: invariant to partitioning and
    chunk granularity, differs from id order, and changes with seed."""
    df = _docs(spark, 300)
    a = {r.doc_id: r.shard_id for r in corpus.pack_shards(df, budget=100, shuffle_seed=7).collect()}
    b = {
        r.doc_id: r.shard_id
        for r in corpus.pack_shards(df.repartition(17), budget=100, shuffle_seed=7).collect()
    }
    assert a == b  # partition-layout invariant
    ident = {r.doc_id: r.shard_id for r in corpus.pack_shards(df, budget=100).collect()}
    assert a != ident  # genuinely shuffled vs id order
    other = {r.doc_id: r.shard_id for r in corpus.pack_shards(df, budget=100, shuffle_seed=8).collect()}
    assert a != other  # seed changes the permutation
    # naive single-stream reference over the same md5(seed:id) order
    import hashlib

    toks = {r.doc_id: r.n_tokens for r in corpus.pack_shards(df, budget=100, shuffle_seed=7).collect()}
    order = sorted(
        toks, key=lambda d: (hashlib.md5(f"7:{d}".encode()).hexdigest(), d)
    )
    cum = 0
    for d in order:
        assert a[d] == cum // 100, d
        cum += toks[d]


def test_intra_doc_dedup_first_occurrence_order(spark):
    """Line-granularity check (the real-corpus configuration): repeated
    lines vanish, first occurrences keep document order, distinct docs
    never interact."""
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta"),
            (2, "x\nx\nx"),
            (3, "one"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.dedup_intra_doc_segments(docs, sep="\n").collect()
    }
    assert out[1]["dedup_text"] == "alpha\nbeta\ngamma"
    assert out[1]["n_unique_segments"] == 3
    assert out[2]["dedup_text"] == "x"
    assert out[2]["n_unique_segments"] == 1
    assert out[3]["dedup_text"] == "one"


def test_intra_doc_dedup_shuffles_are_doc_keyed(spark):
    docs = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    plan = (
        corpus.dedup_intra_doc_segments(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two doc-keyed hash exchanges (first-occurrence agg + reassembly),
    # nothing corpus-global: no range partitioning, no single-partition
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_unigram_logprob_scores_hand_checked(spark):
    """4 'the' + 2 'cat' + 2 'sat' = 8 tokens; doc scores follow from
    exact counts; vocab cap routes tail tokens to the OOV floor."""
    import math

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the cat sat"), (3, "the")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in corpus.unigram_logprob_scores(docs).collect()
    }

    def rhu6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    lp = {t: rhu6(math.log10(c / 8)) for t, c in
          {"the": 4, "cat": 2, "sat": 2}.items()}
    assert rows[3]["n_tokens"] == 1
    assert rows[3]["sum_logprob"] == lp["the"]
    expected_doc1 = round(lp["the"] + lp["cat"] + lp["sat"], 6)
    assert abs(rows[1]["sum_logprob"] - expected_doc1) < 1e-9
    assert rows[1]["avg_logprob"] == rhu6(rows[1]["sum_logprob"] / 3)

    # vocab_size=1 keeps only 'the'; everything else scores the
    # add-half OOV floor log10(0.5/8)
    capped = {
        r["doc_id"]: r
        for r in corpus.unigram_logprob_scores(docs, vocab_size=1).collect()
    }
    oov = rhu6(math.log10(0.5 / 8))
    assert abs(capped[1]["sum_logprob"] - round(lp["the"] + 2 * oov, 6)) < 1e-9


def test_unigram_model_broadcasts(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} common") for i in range(20)], ["doc_id", "text"]
    )
    plan = (
        corpus.unigram_logprob_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the model joins to the corpus via broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_mix_greedy_boundary_and_lattice(spark):
    """Per-source greedy: tokens-before < budget keeps the doc (one-doc
    overshoot max); shrinking a budget removes only the tail of the
    same deterministic order (selection lattice)."""
    rows = [(i, "wiki" if i % 2 == 0 else "web", "tok " * 10) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    big = corpus.token_budget_mix(
        docs, {"wiki": 1_000_000, "web": 55}, seed=3
    )
    got = big.collect()
    wiki = [r for r in got if r["source"] == "wiki"]
    web = sorted(
        (r for r in got if r["source"] == "web"), key=lambda r: r["doc_id"]
    )
    assert len(wiki) == 20  # budget never binds: everything kept
    # each doc is 10 tokens; budget 55 → 6 docs (before-values 0..50)
    assert len(web) == 6
    # lattice: the 35-token selection is a prefix (subset) of the 55 one
    small = corpus.token_budget_mix(docs, {"wiki": 0, "web": 35}, seed=3)
    small_ids = {r["doc_id"] for r in small.collect()}
    assert small_ids <= {r["doc_id"] for r in web}
    assert len(small_ids) == 4

    # determinism across partitionings
    again = {
        (r["doc_id"], r["source"])
        for r in corpus.token_budget_mix(
            docs.repartition(7), {"wiki": 1_000_000, "web": 55}, seed=3
        ).collect()
    }
    assert again == {(r["doc_id"], r["source"]) for r in got}


def test_token_budget_mix_no_global_sort(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i%3}", "a b c") for i in range(30)],
        ["doc_id", "source", "text"],
    )
    plan = (
        corpus.token_budget_mix(docs, {"s0": 100})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every window is partitioned; the corpus never funnels into one
    # partition and never takes a global range sort
    assert "SinglePartition" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_heavy_hitters_exact_vs_groupby(spark):
    """Two-pass Misra–Gries + exact verify returns EXACTLY the naive
    GROUP BY ... HAVING n*m > total result, on a skewed stream with a
    vocabulary far larger than the summary."""
    import random

    rng = random.Random(7)
    tokens = (
        ["the"] * 500
        + ["of"] * 300
        + ["spark"] * 120
        + [f"rare{i}" for i in range(2000)]  # huge tail vocabulary
        + [f"mid{i % 50}" for i in range(500)]
    )
    rng.shuffle(tokens)
    df = spark.createDataFrame([(t,) for t in tokens], "term string")
    m = 20
    got = {
        (r["term"], r["n"])
        for r in corpus.heavy_hitters(df, "term", m=m).collect()
    }
    total = df.count()
    want = {
        (r["term"], r["n"])
        for r in df.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") * m > total)
        .collect()
    }
    assert got == want and len(want) >= 2  # 'the' and 'of' qualify


def test_heavy_hitters_summary_never_holds_full_vocab(spark):
    """The pass-1 summary is capped: even with an all-distinct stream
    (worst case) the candidate set stays <= cap per partition, and the
    result is empty (nothing exceeds total/m)."""
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "term string"
    ).repartition(4)
    out = corpus.heavy_hitters(df, "term", m=10, summary_cap_factor=2)
    assert out.count() == 0


def test_scrub_duplicate_spans_hand_checked(spark):
    """A span repeated across two docs is scrubbed from both; unique
    prose and short docs survive verbatim."""
    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"one two three {shared} four"),
        (3, "totally unique sentence with no repeats anywhere at all ok"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in corpus.scrub_duplicate_spans(df, span_tokens=8).collect()
    }
    # doc 1: 13 tokens, the 9 shared ones covered by dup 8-gram windows
    assert out[1]["n_tokens"] == 13 and out[1]["n_removed"] == 9
    assert out[1]["scrubbed_text"] == "alpha beta gamma delta"
    assert out[2]["scrubbed_text"] == "one two three four"
    assert out[3]["n_removed"] == 0
    assert out[3]["scrubbed_text"].startswith("totally unique")
    # shorter than the span: no windows, untouched
    assert out[4]["n_removed"] == 0 and out[4]["scrubbed_text"] == "tiny doc"


def test_scrub_duplicate_spans_within_doc_repetition(spark):
    """min_occurrences counts occurrences, not documents: a span
    repeated twice INSIDE one doc is scrubbed too."""
    loop = "ra pid re peat ed boiler plate text"  # 8 tokens
    df = spark.createDataFrame(
        [(1, f"{loop} {loop} tail words here")], "doc_id long, text string"
    )
    out = corpus.scrub_duplicate_spans(df, span_tokens=8).collect()[0]
    assert out["n_removed"] >= 16
    assert "tail" in out["scrubbed_text"]


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

def _dsir_corpus(spark):
    """Two domains: 'sci' docs share a distinctive vocabulary; 'web'
    docs share another. The target seed is the sci domain."""
    rows = []
    for i in range(30):
        rows.append((i, "quark lepton boson hadron quark meson", "sci"))
    for i in range(30, 90):
        rows.append((i, "click buy deal sale click offer promo", "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_dsir_selects_target_like_docs(spark):
    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("src") == "sci")
    out = corpus.dsir_importance_sample(docs, target, 20, seed=0)
    rows = out.collect()
    assert len(rows) == 20
    # importance sampling must overwhelmingly pick the sci domain: its
    # docs score ~0 under the target LM while web docs are pure OOV
    picked = {r["doc_id"] for r in rows}
    sci_picked = sum(1 for d in picked if d < 30)
    assert sci_picked >= 18
    # log_ratio of sci docs is strictly higher than any web doc's
    by_dom = {True: [], False: []}
    for r in rows:
        by_dom[r["doc_id"] < 30].append(r["log_ratio"])
    if by_dom[False]:
        assert min(by_dom[True]) > max(by_dom[False])
    # output is ordered by the sampling key
    keys = [r["sample_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_dsir_deterministic_across_partitionings(spark):
    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("src") == "sci")
    a = corpus.dsir_importance_sample(docs, target, 15, seed=3).collect()
    b = corpus.dsir_importance_sample(
        docs.repartition(13), target.coalesce(1), 15, seed=3
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dsir_reseed_redeal(spark):
    """Different seeds re-deal the Gumbel noise: selection changes (the
    weights don't), proving the noise actually participates."""
    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("src") == "sci")
    s0 = {r["doc_id"] for r in
          corpus.dsir_importance_sample(docs, target, 10, seed=0).collect()}
    s1 = {r["doc_id"] for r in
          corpus.dsir_importance_sample(docs, target, 10, seed=99).collect()}
    assert s0 != s1


def test_ccnet_buckets_tercile_split(spark):
    """Buckets are ~equal thirds; head scores >= middle >= tail; no
    global window in the plan (cutoffs come from one aggregate)."""
    rows = [(i, " ".join(["common"] * 8 + [f"rare{i}"] * (i % 7)), "s")
            for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = corpus.ccnet_quality_buckets(docs)
    got = out.collect()
    by = {}
    for r in got:
        by.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert set(by) == {"head", "middle", "tail"}
    # discrete-percentile thirds: each bucket within ±20% of N/3
    for b in by.values():
        assert 0.8 * 30 - 6 <= len(b) <= 1.2 * 30 + 6
    assert min(by["head"]) >= max(by["middle"]) >= max(by["tail"]) or (
        min(by["head"]) > max(by["middle"]) and min(by["middle"]) > max(by["tail"])
    )
    # scale shape: no Window in the physical plan (the NTILE anti-
    # pattern this operator replaces)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_temperature_sample_flattens_skew(spark):
    """τ-sampling (XLM-R): a 10:1 skewed two-source corpus resampled at
    τ=5 comes out much flatter; τ=1 preserves proportions; fractions
    cap at 1 (no replication); deterministic across partitionings."""
    rows = [(i, "big") for i in range(500)] + [
        (500 + i, "small") for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.temperature_sample(
        docs, id_col="doc_id", temperature=5.0, target_rows=200, seed=1
    )
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    # raw mix is 10:1; τ=5 targets n_s^(1/5) ∝ 3.47 : 2.19 (~1.6:1)
    assert by["big"] < 4 * by["small"]
    assert by["small"] >= 30  # small source strongly upweighted
    # fraction capped at 1.0: nothing replicated, keep ≤ stratum size
    assert by["small"] <= 50
    fr = {
        r["source"]: r["keep_fraction"]
        for r in out.select("source", "keep_fraction").distinct().collect()
    }
    assert fr["small"] <= 1.0 and fr["big"] < fr["small"]

    # τ=1 ≈ plain proportional sample
    flat = corpus.temperature_sample(
        docs, id_col="doc_id", temperature=1.0, target_rows=200, seed=1
    )
    byf = {
        r["source"]: r["count"]
        for r in flat.groupBy("source").count().collect()
    }
    assert byf["big"] > 5 * byf["small"]

    # deterministic across partitionings
    a = sorted(
        r["doc_id"]
        for r in corpus.temperature_sample(
            docs, id_col="doc_id", temperature=5.0, target_rows=200, seed=1
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in corpus.temperature_sample(
            docs.repartition(17), id_col="doc_id", temperature=5.0,
            target_rows=200, seed=1,
        ).collect()
    )
    assert a == b


def test_temperature_sample_rejects_bad_tau(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="temperature"):
        corpus.temperature_sample(docs, temperature=0.0)


def test_temperature_sample_target_fraction_no_extra_action(spark):
    """target_fraction sizes the target inside the counts aggregate —
    same selection as the equivalent precomputed target_rows."""
    rows = [(i, "big") for i in range(400)] + [
        (400 + i, "small") for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(
        r["doc_id"]
        for r in corpus.temperature_sample(
            docs, temperature=2.0, target_fraction=0.5, seed=2
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in corpus.temperature_sample(
            docs, temperature=2.0, target_rows=220, seed=2
        ).collect()
    )
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        corpus.temperature_sample(
            docs, target_rows=10, target_fraction=0.5
        )


def test_temperature_sample_null_stratum_participates(spark):
    """NULL strata are a real stratum: they must be sampleable (the
    equi-join would silently drop them while their count inflated z)."""
    rows = [(i, "a") for i in range(200)] + [(200 + i, None) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.temperature_sample(
        docs, temperature=1.0, target_fraction=0.5, seed=3
    )
    by = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert None in by and by[None] > 50  # ~100 expected of 200
    assert "a" in by and by["a"] > 50


def test_dsir_target_without_id_column(spark):
    """A seed corpus with only a text column is a valid DSIR target —
    the target LM fit never needs ids."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)]
        + [(100 + i, "zeta eta theta iota") for i in range(20)],
        "doc_id long, text string",
    )
    # a 10-doc target corpus: the add-half OOV floor scales with the
    # target token total, so zeta-docs score ~20x less likely
    target = spark.createDataFrame(
        [("alpha beta gamma delta",)] * 10, "text string"
    )
    out = corpus.dsir_importance_sample(docs, target, 10, seed=0).collect()
    assert len(out) == 10
    # alpha/beta/gamma docs dominate the selection
    assert sum(1 for r in out if r["doc_id"] < 100) >= 8


def test_bigram_lm_is_context_aware(spark):
    """The motivating property over the unigram scorer: documents with
    consistent word ORDER score higher than shuffled bag-of-words text
    with identical unigram counts."""
    fluent = "the cat sat on the mat"
    shuffled = "mat the on sat cat the"  # same unigrams, broken bigrams
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(10)] + [(100, shuffled)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.bigram_logprob_scores(docs).collect()}
    assert out[0]["n_bigrams"] == 5
    # every fluent doc outscores the shuffled one
    assert out[0]["avg_logprob"] > out[100]["avg_logprob"]
    # unigram model CANNOT tell them apart (same token counts)
    uni = {
        r["doc_id"]: r["avg_logprob"]
        for r in corpus.unigram_logprob_scores(docs).collect()
    }
    assert uni[0] == uni[100]
    # short docs (< 2 tokens) stay visible: one row each, zero bigram
    # positions, NULL scores — inner joins on the frame keep them
    short = spark.createDataFrame([(1, "one"), (2, "")], "doc_id long, text string")
    srows = {r["doc_id"]: r for r in corpus.bigram_logprob_scores(short).collect()}
    assert set(srows) == {1, 2}
    for r in srows.values():
        assert r["n_bigrams"] == 0
        assert r["sum_logprob"] is None
        assert r["avg_logprob"] is None


def test_source_kl_divergence_semantics(spark):
    """KL is ~0 for a source matching the corpus distribution and
    strictly larger for a divergent one; all KLs >= 0 (up to
    quantization)."""
    # two identical-distribution sources + one divergent source
    base = "alpha beta gamma delta"
    rows = (
        [(i, base, "a") for i in range(50)]
        + [(100 + i, base, "b") for i in range(50)]
        + [(200 + i, "omega omega omega psi", "weird") for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in corpus.source_kl_divergence(docs).collect()}
    assert set(out) == {"a", "b", "weird"}
    # identical sources diverge only because 'weird' shifts the corpus
    # distribution — equal for a and b, small
    assert out["a"]["kl_divergence"] == out["b"]["kl_divergence"]
    assert out["weird"]["kl_divergence"] > out["a"]["kl_divergence"] > 0
    assert all(r["kl_divergence"] >= -1e-4 for r in out.values())
    assert out["weird"]["n_terms"] == 2  # omega, psi


def test_kn5_lm_context_beyond_bigrams(spark):
    """The motivating property of the order-5 KN gate: text that
    preserves local bigrams but breaks longer-range order (a rotation)
    is penalized MORE sharply by KN5 than by the bigram gate — the
    bigram model sees almost-all-seen pairs, KN5 sees broken 5-grams."""
    fluent = "a b c d e f g h"
    rotated = "e f g h a b c d"  # all interior bigrams survive; order broken
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(10)] + [(100, rotated)],
        "doc_id long, text string",
    )
    kn = {r["doc_id"]: r for r in corpus.kn5_logprob_scores(docs).collect()}
    assert kn[0]["n_scored"] == 8
    assert kn[0]["avg_logprob"] > kn[100]["avg_logprob"]
    bi = {r["doc_id"]: r for r in corpus.bigram_logprob_scores(docs).collect()}
    margin_kn = float(kn[0]["avg_logprob"]) - float(kn[100]["avg_logprob"])
    margin_bi = float(bi[0]["avg_logprob"]) - float(bi[100]["avg_logprob"])
    assert margin_kn > margin_bi, (margin_kn, margin_bi)

    # shuffled bag-of-words separates too (same unigrams as fluent)
    shuffled = "h a f c e b g d"
    docs2 = spark.createDataFrame(
        [(i, fluent) for i in range(10)] + [(100, shuffled)],
        "doc_id long, text string",
    )
    kn2 = {r["doc_id"]: r for r in corpus.kn5_logprob_scores(docs2).collect()}
    assert kn2[0]["avg_logprob"] > kn2[100]["avg_logprob"]

    # degenerate docs: 1 token scores (BOS context), 0 tokens stays
    # visible with NULL scores
    short = spark.createDataFrame(
        [(1, "one"), (2, "")], "doc_id long, text string"
    )
    srows = {r["doc_id"]: r for r in corpus.kn5_logprob_scores(short).collect()}
    assert srows[1]["n_scored"] == 1 and srows[1]["avg_logprob"] is not None
    assert srows[2]["n_scored"] == 0 and srows[2]["avg_logprob"] is None


def test_kn5_broadcast_and_hash_join_paths_identical(spark):
    """The Arrow broadcast-dict path (default) and the distributed
    hash-join scale path must be BIT-identical — same counts, same
    doubles — including under count pruning."""
    texts = [
        "the cat sat on the mat and then the cat slept",
        "the dog sat on the rug and then the dog slept",
        "the cat sat on the mat and then the cat slept",
        "one two three four five six seven",
        "tiny",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] * 3, "doc_id long, text string"
    ).dropDuplicates(["doc_id"])
    for prune in (None, 2):
        fast = {
            r["doc_id"]: (r["n_scored"], r["sum_logprob"], r["avg_logprob"])
            for r in corpus.kn5_logprob_scores(
                docs, prune_min_count=prune
            ).collect()
        }
        slow = {
            r["doc_id"]: (
                r["n_scored"],
                float(r["sum_logprob"]) if r["sum_logprob"] is not None else None,
                r["avg_logprob"],
            )
            for r in corpus.kn5_logprob_scores(
                docs, prune_min_count=prune, broadcast_model=False
            ).collect()
        }
        assert fast == slow, {k: (fast[k], slow[k]) for k in fast if fast[k] != slow.get(k)}


def test_kn5_auto_dispatch_threshold(spark):
    """broadcast_model='auto' (the default) dispatches on MEASURED
    model size: at or under broadcast_max_grams the plan scores through
    the Arrow MapInPandas broadcast-dict stage; above it the plan is
    pure distributed hash joins (no Python stage). Both sides of the
    threshold return bit-identical results, and the pure dispatch
    predicate is pinned at the boundary."""
    from data_lakehouse_spark.operators.corpus import _kn5_use_broadcast

    assert _kn5_use_broadcast(10, 10) is True
    assert _kn5_use_broadcast(11, 10) is False
    assert _kn5_use_broadcast(0, 0) is True

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat and then the cat slept") for i in range(6)]
        + [(100, "one two three four five six seven")],
        "doc_id long, text string",
    )
    under = corpus.kn5_logprob_scores(docs, broadcast_model="auto")
    over = corpus.kn5_logprob_scores(
        docs, broadcast_model="auto", broadcast_max_grams=1
    )
    plan_u = under._jdf.queryExecution().executedPlan().toString()
    plan_o = over._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_u  # small model -> broadcast probe
    assert "MapInPandas" not in plan_o  # over cap -> hash-join path
    rows_u = {r["doc_id"]: r["avg_logprob"] for r in under.collect()}
    rows_o = {
        r["doc_id"]: r["avg_logprob"] for r in over.collect()
    }
    assert rows_u == rows_o


def test_ccnet_buckets_precomputed_scores_short_circuit(spark):
    """The scores= hook: terciles cut over a PRECOMPUTED score frame
    must equal the from-scratch lm='kn5' run — the model-sharing path
    (one kn5 build feeding both the score gate and the bucketing)."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog slept") for i in range(9)]
        + [(100, "mat dog the on slept and sat the cat the"), (200, "")],
        "doc_id long, text string",
    )
    scratch = {
        r["doc_id"]: (r["bucket"], r["avg_logprob"])
        for r in corpus.ccnet_quality_buckets(docs, lm="kn5").collect()
    }
    pre = corpus.kn5_logprob_scores(docs).withColumnRenamed(
        "n_scored", "n_tokens"
    )
    shared = {
        r["doc_id"]: (r["bucket"], r["avg_logprob"])
        for r in corpus.ccnet_quality_buckets(
            docs, lm="kn5", scores=pre
        ).collect()
    }
    assert scratch == shared


def test_ccnet_buckets_kn5_lm(spark):
    """lm='kn5' terciles on the KN model: fluent repeated docs out-rank
    a shuffled outlier (which the unigram scorer cannot separate), and
    zero-token docs land in tail instead of vanishing."""
    fluent = "the cat sat on the mat and the dog slept"
    shuffled = "mat dog the on slept and sat the cat the"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(12)] + [(100, shuffled), (200, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.ccnet_quality_buckets(docs, lm="kn5").collect()}
    assert len(out) == 14
    assert out[100]["bucket"] == "tail"
    assert out[200]["bucket"] == "tail" and out[200]["avg_logprob"] is None
    assert out[0]["avg_logprob"] > out[100]["avg_logprob"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unigram"):
        corpus.ccnet_quality_buckets(docs, lm="trigram")


def test_hash_embeddings_deterministic_unit_norm(spark):
    """Feature-hash embedder: deterministic across runs/partitionings,
    unit-norm for non-empty text, all-zero for empty text, identical
    text -> identical vector (the property the RAG-ingest gate's
    recall floor rests on)."""
    import math

    df = spark.createDataFrame(
        [
            (0, "spark vector join spark"),
            (1, "spark vector join spark"),
            (2, "completely different words here"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, chunk_text string",
    )
    out = {
        r["doc_id"]: list(r["embedding"])
        for r in corpus.hash_embeddings(df, dim=16).collect()
    }
    assert out[0] == out[1] != out[2]
    for i in (0, 2):
        assert math.isclose(
            sum(x * x for x in out[i]), 1.0, rel_tol=1e-9
        )
    assert out[3] == [0.0] * 16 and out[4] == [0.0] * 16
    # repartitioning does not change vectors (batch-boundary freedom)
    out2 = {
        r["doc_id"]: list(r["embedding"])
        for r in corpus.hash_embeddings(df.repartition(5), dim=16).collect()
    }
    assert out2 == out
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim"):
        corpus.hash_embeddings(df, dim=0)
