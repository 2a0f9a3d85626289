"""Distributed BPE (operators/bpe.py) pinned against an independent
pure-Python reference implementation: identical merge tables from the
trainer, identical token counts from the encoder."""

from __future__ import annotations

from data_lakehouse_spark.operators.bpe import (
    EOW,
    bpe_encode,
    merges_df,
    train_bpe,
    word_counts,
)


# -- reference implementation (plain Python, no Spark) ----------------------


def _ref_word_counts(texts: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            out[w] = out.get(w, 0) + 1
    return out


def _ref_train(
    counts: dict[str, int], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    vocab = {w: list(w) + [EOW] for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            j, merged = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            vocab[w] = merged
    return merges


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> int:
    ranks = {p: i for i, p in enumerate(merges)}
    s = list(word) + [EOW]
    while len(s) > 1:
        cands = [
            (ranks[(s[i], s[i + 1])], i)
            for i in range(len(s) - 1)
            if (s[i], s[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        s = s[:i] + [s[i] + s[i + 1]] + s[i + 2 :]
    return len(s)


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and a rat",
    "the rat sat on the hat",
    "matter of the scattered hatter",
    "batting and matting and hatting",
]


def test_word_counts(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {
        r.word: r["count"] for r in word_counts(df).collect()
    }
    assert got == _ref_word_counts(TEXTS)


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = train_bpe(df, num_merges=15)
    want = _ref_train(_ref_word_counts(TEXTS), 15)
    assert got == want
    assert len(got) > 5  # the corpus genuinely supports merges
    # the merge table artifact round-trips
    mdf = merges_df(spark, got)
    assert [
        (r.left, r.right) for r in mdf.orderBy("rank").collect()
    ] == got


def test_train_bpe_early_stop(spark):
    # every word unique, no pair reaches min_pair_count=100
    df = spark.createDataFrame([("xy zq",)], "text string")
    assert train_bpe(df, num_merges=10, min_pair_count=100) == []


def test_bpe_encode_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = train_bpe(df, num_merges=12)
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_words)
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        want = sum(_ref_encode(w, merges) for w in words)
        assert got[i] == (want, len(words)), f"doc {i}"
    # trained merges genuinely compress vs characters
    assert got[0][0] < sum(len(w) + 1 for w in TEXTS[0].split())


def test_bpe_encode_unknown_words_fall_back_to_chars(spark):
    docs = spark.createDataFrame([(0, "zzzz")], "doc_id long, text string")
    out = bpe_encode(docs, [("t", "h")]).collect()[0]
    assert out.n_tokens == 5  # 4 chars + EOW, no merge applies


def test_driver_and_distributed_paths_identical(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    fast = train_bpe(df, num_merges=10)  # vocab << bound -> driver path
    slow = train_bpe(df, num_merges=10, max_driver_vocab=0)  # forced dist
    assert fast == slow
