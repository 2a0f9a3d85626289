"""Distributed byte-pair-encoding: train a merge table over a corpus
and tokenize with it — the real version of the "BPE-ish" token
counting every LLM-data pipeline needs (training-corpus token budgets,
shard packing, mixture weighting are all denominated in tokens of an
actual learned vocabulary).

Scale shape (the standard trick, done Spark-side):

1. ONE corpus scan aggregates to the WORD-FREQUENCY table
   ``(word, count)`` — the only pass over the 100 TB corpus. Every
   subsequent merge round runs over this table, whose size is the
   corpus VOCABULARY (millions of rows, not billions of tokens), kept
   cached across rounds.
2. Each merge round: adjacent-pair counts weighted by word frequency
   (posexplode → groupBy(pair) → sum) pick the max pair
   (deterministic tie-break: count desc, then pair lexicographic), and
   an Arrow ``mapInPandas`` pass rewrites each word's symbol array —
   adjacent-merge is inherently sequential per word, so it's a kernel,
   not an expression.
3. Encoding (:func:`bpe_encode`) is embarrassingly parallel: one scan,
   each document tokenized against the broadcast merge-rank table.

The trainer is O(num_merges) Spark jobs over the cached word table —
an ITERATIVE algorithm (hence rows-only correctness gates; there is no
SQL oracle for a loop), with the per-round reduction fully
distributed. Unit tests pin the whole pipeline against an independent
pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_counts", "train_bpe", "bpe_encode", "merges_df"]

#: end-of-word marker (classic BPE: lets the vocabulary distinguish
#: "est" in "estimate" from "est</w>" in "smallest")
EOW = "</w>"


def word_counts(
    df: DataFrame, *, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The one corpus-wide pass: whitespace words → (word, count).
    Map-side partial aggregation shrinks the shuffle to the vocabulary.
    """
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    out = df.select(w).filter(F.col("word") != "")
    if lowercase:
        out = out.select(F.lower(F.col("word")).alias("word"))
    return out.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("count")
    )


def _symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def _train_driver(
    counts: dict[str, int], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over a SMALL word-frequency table — the
    identical algorithm to the distributed rounds (same tie-break:
    count desc, pair lexicographic asc), pinned equal in tests."""
    vocab = {w: list(w) + [EOW] for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
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


def train_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    lowercase: bool = True,
    max_driver_vocab: int = 500_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges over the corpus; returns the
    ordered merge list (rank = position). Stops early when no adjacent
    pair reaches ``min_pair_count``. Deterministic: ties break on
    (count desc, pair lexicographic asc).

    Strategy pick (one count decides, like ``cosine_pairs``): a word
    table at or under ``max_driver_vocab`` rows collects to the driver
    and the merge loop runs locally (each round costs milliseconds, not
    a Spark job); a bigger vocabulary runs the fully distributed
    rounds. Both paths execute the SAME algorithm and tie-break, so the
    choice is invisible in the result (pinned in tests)."""
    import pandas as pd

    wc = word_counts(df, text_col=text_col, lowercase=lowercase).persist()
    try:
        n_vocab = wc.count()
        if n_vocab <= max_driver_vocab:
            counts = {r["word"]: r["count"] for r in wc.collect()}
            return _train_driver(
                counts, int(num_merges), int(min_pair_count)
            )
        return _train_distributed(
            wc, int(num_merges), int(min_pair_count)
        )
    finally:
        wc.unpersist()


def _train_distributed(
    wc: DataFrame, num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The vocabulary-scale path: each merge round is a distributed
    pair-count reduction over the cached word table plus an Arrow
    rewrite of the symbol arrays."""
    import pandas as pd

    words = wc.select(
        "count",
        # characters + end-of-word marker; split with an empty pattern
        # yields one element per character in Spark 3+/4
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )
    words = words.persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(int(num_merges)):
            pairs = (
                words.select(
                    "count",
                    F.explode(
                        F.zip_with(
                            F.slice(
                                "syms", 1, F.size("syms") - 1
                            ),
                            F.slice("syms", 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("a"), b.alias("b")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("count").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0]["n"] < min_pair_count:
                break
            a, b = pairs[0]["a"], pairs[0]["b"]
            merges.append((a, b))

            def apply_merge(batches, _a=a, _b=b):
                for pdf in batches:
                    out = []
                    for syms in pdf["syms"]:
                        s = list(syms)
                        j, merged = 0, []
                        while j < len(s):
                            if (
                                j + 1 < len(s)
                                and s[j] == _a
                                and s[j + 1] == _b
                            ):
                                merged.append(_a + _b)
                                j += 2
                            else:
                                merged.append(s[j])
                                j += 1
                        out.append(merged)
                    yield pd.DataFrame(
                        {"count": pdf["count"], "syms": out}
                    )

            new_words = words.mapInPandas(
                apply_merge, "count long, syms array<string>"
            ).persist()
            new_words.count()  # materialize before dropping the parent
            words.unpersist()
            words = new_words
    finally:
        words.unpersist()
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merge table as a DataFrame (rank = merge order) — the
    artifact a pipeline persists next to its corpus."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize each document with a trained merge table: one scan,
    Arrow-batched, merge ranks broadcast. Returns
    (doc_id, n_tokens, n_words, tokens_per_word). Encoding applies the
    LOWEST-rank applicable merge first (standard BPE greedy order), so
    any engine with the same merge table produces identical tokens."""
    import pandas as pd

    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def encode_word(word: str, rank_map) -> int:
        s = _symbols(word)
        while len(s) > 1:
            best_rank, best_i = None, -1
            for i in range(len(s) - 1):
                r = rank_map.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            s = s[:best_i] + [s[best_i] + s[best_i + 1]] + s[best_i + 2 :]
        return len(s)

    def gen(batches):
        rank_map = bc.value
        cache: dict[str, int] = {}
        for pdf in batches:
            n_tokens, n_words = [], []
            for text in pdf["text"]:
                words = [
                    (w.lower() if lowercase else w)
                    for w in (text or "").split()
                ]
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w, rank_map)
                    total += cache[w]
                n_tokens.append(total)
                n_words.append(len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": n_tokens,
                    "n_words": n_words,
                }
            )

    src = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    out = src.mapInPandas(
        gen, "doc_id bigint, n_tokens bigint, n_words bigint"
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_words",
        (
            F.col("n_tokens")
            / F.when(F.col("n_words") > 0, F.col("n_words"))
        ).alias("tokens_per_word"),
    )
