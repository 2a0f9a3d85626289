"""Training-corpus construction operators: deterministic sampling,
eval-set decontamination, and token-budget shard packing.

These are the steps between "deduplicated document pool" and "corpus a
trainer can read": pick a reproducible subset (optionally re-weighting
sources/languages), drop documents that leak evaluation data, and pack
what remains into fixed-token-budget shards.

Scale notes (the 100 TB contract):

- Sampling is a pure map-side FILTER — no shuffle, no driver state, no
  RNG. Membership is ``md5(seed:key) < threshold`` on the hex string,
  so the same row set is selected on every engine, cluster size, retry,
  and partitioning (unlike ``df.sample``, whose output depends on
  partition layout). Lexicographic comparison of equal-length lowercase
  hex strings IS numeric comparison of the 128-bit hash, which is
  uniform, so the kept fraction converges to ``fraction``.
- Decontamination is the inverted-index join shape shared with
  :func:`~data_lakehouse_spark.operators.dedup.ngram_jaccard_pairs`:
  explode n-gram shingles, hash them to fixed 8-byte keys, and join the
  (huge) training side against the (small, broadcast) eval side — never
  an all-pairs comparison. The real-world instance is the 13-gram
  benchmark-overlap filter every LLM corpus pipeline runs.
- Shard packing is a distributed prefix sum: per-chunk window cumsum +
  a tiny chunk-offset aggregate broadcast back. No global-order window
  over the data (that is a single-partition sort); the only total-order
  step runs over ``n_chunks`` rows, which is bounded and tiny.

Reference parity: the reference has no corpus tier; these extend the
engine for LLM-pipeline workloads (driver brief) alongside
``operators/dedup.py`` and ``operators/similarity.py``.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.text import (
    bpe_ish_token_count,
    normalized_text,
)
from data_lakehouse_spark.operators.dedup import _shingle_explode

__all__ = [
    "sample_threshold",
    "hash_sample",
    "stratified_hash_sample",
    "contamination_hits",
    "decontaminate",
    "pack_shards",
    "quality_signals",
    "redact_pii",
    "chunk_documents",
    "dedup_intra_doc_segments",
    "unigram_logprob_scores",
    "token_budget_mix",
    "heavy_hitters",
    "scrub_duplicate_spans",
    "dsir_importance_sample",
    "ccnet_quality_buckets",
    "temperature_sample",
    "bigram_logprob_scores",
    "kn5_logprob_scores",
    "source_kl_divergence",
]

#: Deliberately simple, oracle-portable PII patterns (same regex class
#: syntax under Java regex and RE2): email, international-ish phone,
#: IPv4. Production pipelines swap in their compliance-grade library;
#: the OPERATOR SHAPE (one scan, regexp_count + regexp_replace, no
#: Python) is what scales.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def sample_threshold(fraction: float) -> str:
    """32-hex-digit threshold such that a uniform md5 hex string is
    ``< threshold`` with probability ``fraction``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * 16**32), 16**32 - 1), "032x")


def _sample_hash(key: Column, seed: int) -> Column:
    # seed:key — a reseed re-deals membership; key cast to string so
    # integer and string keys render identically on any SQL oracle.
    return F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, seed: int = 0
) -> DataFrame:
    """Deterministic ``fraction``-sample keyed on ``key_col``.

    A map-side filter (no shuffle, no RNG): a row is kept iff
    ``md5(seed:key) < sample_threshold(fraction)``. Reproducible across
    engines, retries, partitionings, and cluster sizes — the property
    ``df.sample`` does not give you — and the selection is a stable
    *subset lattice*: the 10% sample is a superset of the 5% sample for
    the same seed, so growing a training mix never churns previously
    selected documents.
    """
    if fraction >= 1.0:
        return df
    return df.filter(
        _sample_hash(F.col(key_col), seed) < F.lit(sample_threshold(fraction))
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. downsample crawl to 10%, keep wiki at 100%).

    Same map-side hash filter as :func:`hash_sample`, with the
    threshold chosen per stratum by a CASE over ``stratum_col``; strata
    not listed get ``default_fraction``. Still zero shuffles.
    """
    expr: Column = F.lit(sample_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(sample_threshold(frac))
        ).otherwise(expr)
    return df.filter(_sample_hash(F.col(key_col), seed) < expr)


def contamination_hits(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
    hashed: bool = True,
) -> DataFrame:
    """Per-training-doc count of distinct ``shingle_n``-gram shingles
    shared with ``eval_docs`` → ``(doc_id, n_overlap)``, hits only.

    The benchmark-decontamination primitive: production pipelines run
    this with 13-grams against held-out eval sets before training.
    Shape: both sides explode to distinct (doc, shingle) rows; the eval
    side collapses to distinct shingles and is broadcast (eval sets are
    tiny relative to the corpus), so the training side is one narrow
    scan + broadcast-hash semi-probe + one groupBy on doc_id. With
    ``hashed=True`` shingles travel as 8-byte ``xxhash64`` keys.
    """
    train = _shingle_explode(
        docs, text_col, id_col, shingle_n, distinct=True, hashed=hashed
    )
    ev = (
        _shingle_explode(
            eval_docs, text_col, id_col, shingle_n, distinct=True, hashed=hashed
        )
        .select("shingle")
        .distinct()
    )
    return (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )


def contamination_hits_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
    fpp: float = 1e-4,
    max_eval_shingles: int = 50_000_000,
) -> DataFrame:
    """Bloom-filter twin of :func:`contamination_hits` — the 100 TB
    decontamination path: the eval side compiles into a broadcast bit
    array and the training corpus is ONE narrow scan with a vectorized
    Arrow membership probe — no join, no shuffle of the corpus at all
    (the exact variant still broadcast-probes but pays a distinct
    (doc, shingle) shuffle for the per-doc overlap counts).

    Guarantees: NO false negatives (every truly contaminated doc is
    flagged — the property decontamination must have); false positives
    over-drop clean docs at rate ≤ ``fpp`` per probed shingle. Returns
    ``(doc_id, n_probable_overlap)``, hits only. Bits are derived from
    the same ``xxhash64`` shingle keys as the exact path via
    Kirsch-Mitzenmacher double hashing (h1 + i·h2), so results are
    deterministic across engines, retries, and partitionings.

    ``max_eval_shingles`` bounds the driver-side compile (eval sets are
    benchmark-sized; 50M shingles ≈ tens of MB of bits at 1e-4) —
    exceeding it raises rather than silently OOMing the driver.
    """
    import math

    import numpy as np
    import pandas as pd

    ev = (
        _shingle_explode(
            eval_docs, text_col, id_col, shingle_n, distinct=True, hashed=True
        )
        .select("shingle")
        .distinct()
    )
    # xxhash64 values arrive as signed 64-bit; view-cast to uint64 (NumPy
    # rejects out-of-bound negative ints on direct uint64 construction)
    hashes = np.array(
        [r["shingle"] for r in ev.collect()], dtype=np.int64
    ).view(np.uint64)
    n = max(len(hashes), 1)
    if n > max_eval_shingles:
        raise ValueError(
            f"eval shingle count {n} exceeds max_eval_shingles "
            f"{max_eval_shingles}; raise the bound or pre-shard the eval set"
        )
    # standard Bloom sizing: m = -n ln p / (ln 2)^2, k = (m/n) ln 2
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, int(round(m / n * math.log(2))))
    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    h1 = hashes & np.uint64(0xFFFFFFFF)
    h2 = (hashes >> np.uint64(32)) | np.uint64(1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(
            bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast((bits, m, k))

    # Shingle production stays on the codegen explode-index path
    # (_shingle_explode: generate → project in one whole-stage span;
    # the per-doc-array higher-order lambda variant is interpreted and
    # measured ~20× slower at sf0.1). distinct=False keeps the corpus
    # scan shuffle-free — shingles flow WITH multiplicity and only the
    # flagged HITS are deduped per doc afterwards, so the only shuffle
    # is over contaminated rows (rare by construction). Same xxhash64
    # keys as the eval side.
    from data_lakehouse_spark.operators.dedup import _shingle_explode as _sx

    train = _sx(docs, text_col, id_col, shingle_n, distinct=False, hashed=True)

    def probe(batches):
        b_bits, b_m, b_k = bc.value
        for pdf in batches:
            h = pdf["shingle"].to_numpy(dtype=np.int64).view(np.uint64)
            p1 = h & np.uint64(0xFFFFFFFF)
            p2 = (h >> np.uint64(32)) | np.uint64(1)
            hit = np.ones(len(h), dtype=bool)
            for i in range(b_k):
                idx = (p1 + np.uint64(i) * p2) % np.uint64(b_m)
                word = b_bits[(idx >> np.uint64(6)).astype(np.int64)]
                hit &= (
                    word & (np.uint64(1) << (idx & np.uint64(63)))
                ).astype(bool)
            out = pdf.loc[hit, ["doc_id", "shingle"]]
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"].to_numpy(dtype=np.int64),
                    "shingle": out["shingle"].to_numpy(dtype=np.int64),
                }
            )

    flagged = train.mapInPandas(probe, "doc_id bigint, shingle bigint")
    # per-doc distinct over the FLAGGED rows only (the corpus itself
    # never shuffled; multiplicity collapses here)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").cast("bigint").alias(
                "n_probable_overlap"
            )
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop training docs sharing ≥ ``min_overlap`` distinct shingles
    with the eval set (left-anti join against :func:`contamination_hits`)."""
    hits = contamination_hits(
        docs, eval_docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).filter(F.col("n_overlap") >= min_overlap)
    return docs.join(
        hits, docs[id_col] == hits["doc_id"], "left_anti"
    )


def pack_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    budget: int,
    chunk_span: int = 100_000,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Assign each doc to a fixed-token-budget shard in ``id_col``
    order → ``(doc_id, n_tokens, shard_id)``.

    ``shard_id = floor(tokens_before_this_doc / budget)`` — the greedy
    in-order packer that turns a document pool into trainer-readable
    shards of ~``budget`` tokens each. Token cost is ``token_col`` if
    given, else :func:`bpe_ish_token_count` of ``text_col``.

    Distributed prefix-sum shape (NOT a global-order window, which
    Spark executes as a single-partition sort of the whole corpus):

    1. chunk = ``floor(id / chunk_span)`` — deterministic, contiguous
       in id order, so chunks partition the global order;
    2. within-chunk cumulative sum (window partitioned BY chunk — a
       real hash-partitioned window);
    3. per-chunk totals (tiny aggregate: one row per chunk) get a
       running offset via a window over chunks — total-order, but over
       ``n_docs / chunk_span`` rows, not ``n_docs`` — and broadcast-join
       back.

    Pick ``chunk_span`` so a chunk's rows fit an executor partition
    (default 100k docs/chunk → ~10k chunks per billion docs: the offset
    table stays driver-trivial).

    ``shuffle_seed`` packs in DETERMINISTIC SHUFFLED order instead of
    id order — the training-order requirement (reproducible "random"
    document order, identical on any cluster size, retry, or engine):
    the order key becomes ``md5(seed:id)`` and chunks become the key's
    leading 3 hex digits (4096 uniform buckets) — a prefix of the order
    key, so chunks still partition the global order and the same
    prefix-sum shape applies unchanged.
    """
    tokens = (
        F.col(token_col).cast("bigint")
        if token_col
        else bpe_ish_token_count(text_col)
    )
    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        tokens.alias("n_tokens"),
    )
    if shuffle_seed is None:
        base = base.withColumn("_chunk", F.floor(F.col("doc_id") / chunk_span))
        order_cols = [F.col("doc_id")]
    else:
        base = base.withColumn(
            "_ord",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(shuffle_seed)),
                    F.col("doc_id").cast("string"),
                )
            ),
        ).withColumn(
            "_chunk", F.conv(F.substring("_ord", 1, 3), 16, 10).cast("bigint")
        )
        order_cols = [F.col("_ord"), F.col("doc_id")]

    w_in = (
        Window.partitionBy("_chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("_chunk")
        .agg(F.sum("n_tokens").alias("_chunk_tokens"))
        .select(
            "_chunk",
            F.coalesce(F.sum("_chunk_tokens").over(w_off), F.lit(0)).alias(
                "_offset"
            ),
        )
    )
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "_chunk")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.col("_offset") + F.col("_cum") - F.col("n_tokens"))
                / F.lit(budget)
            )
            .cast("bigint")
            .alias("shard_id"),
        )
    )


# --------------------------------------------------------------------------
# Gopher/C4-style quality signals
# --------------------------------------------------------------------------

_QS_SCHEMA = (
    "doc_id bigint, n_tokens bigint, mean_word_len double, "
    "distinct_token_ratio double, top_bigram_ratio double, "
    "dup_trigram_ratio double, symbol_word_ratio double, "
    "alpha_word_ratio double, gopher_pass boolean"
)


def _quality_signals_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int,
    max_tokens: int,
) -> DataFrame:
    """Arrow-kernel twin of the expression path: same signals computed
    per row in Python (Counter-based n-gram stats are O(n) per doc vs
    the O(n log n) sort-fold expression, and C-speed). Bit-exact with
    the expression path — integer counts divided as doubles, the shared
    floor-half-up rounding, Java-\\s tokenization (ASCII class, trailing
    empties kept as Spark's split does) — pinned by
    tests/test_corpus.py::test_quality_signals_engines_agree and the
    ``doc_quality_gopher`` oracle."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    sym = re.compile(r"#|\.\.\.")
    alpha = re.compile(r"[a-z]")

    def r4(x: float) -> float:
        return math.floor(x * 10000.0 + 0.5) / 10000.0

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, raw in zip(pdf["doc_id"], pdf["_text"]):
                t = raw.lower().strip(" ")
                toks = ws.split(t) if t != "" else []
                n = len(toks)
                if n == 0:
                    rows.append(
                        (did, 0, None, None, None, None, None, None, False)
                    )
                    continue
                mwl = r4(sum(map(len, toks)) / n)
                dist = r4(len(set(toks)) / n)
                top_bi = dup_tri = None
                if n >= 2:
                    bc = Counter(zip(toks, toks[1:]))
                    top_bi = r4(max(bc.values()) / (n - 1))
                if n >= 3:
                    tc = Counter(zip(toks, toks[1:], toks[2:]))
                    dup_tri = r4(
                        sum(v for v in tc.values() if v >= 2) / (n - 2)
                    )
                symr = r4(len(sym.findall(raw)) / n)
                alr = r4(sum(1 for tk in toks if alpha.search(tk)) / n)
                ok = (
                    min_tokens <= n <= max_tokens
                    and 3.0 <= mwl <= 10.0
                    and symr < 0.1
                    and alr > 0.8
                    and (top_bi if top_bi is not None else 1.0) < 0.2
                    and (dup_tri if dup_tri is not None else 1.0) < 0.3
                    and dist > 0.3
                )
                rows.append(
                    (did, n, mwl, dist, top_bi, dup_tri, symr, alr, bool(ok))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_tokens",
                    "mean_word_len",
                    "distinct_token_ratio",
                    "top_bigram_ratio",
                    "dup_trigram_ratio",
                    "symbol_word_ratio",
                    "alpha_word_ratio",
                    "gopher_pass",
                ],
            )

    staged = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("_text"),
    )
    return staged.mapInPandas(kernel, _QS_SCHEMA)


def quality_signals(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    engine: str = "expr",
) -> DataFrame:
    """Repetition/quality signals in the Gopher (Rae et al. 2021) and
    C4 (Raffel et al. 2020) filtering tradition, plus the composite
    ``gopher_pass`` gate — the standard pre-training corpus filter.

    Per document: token count, mean word length, distinct-token ratio
    (inverse of repetition), top-bigram fraction (Gopher "top 2-gram"),
    duplicate-trigram fraction (Gopher "duplicate n-gram"), symbol-to-
    word ratio (# and ellipsis), and alphabetic-word ratio (C4's
    "contains an alphabetic character" rule). ``gopher_pass`` ANDs the
    published thresholds (length band, word length 3-10, symbols < 0.1,
    alpha > 0.8, top-bigram < 0.2, dup-trigram < 0.3, distinct > 0.3).

    ``engine='expr'`` (default) is pure JVM higher-order-function
    expression — no Python, one scan, no shuffle — and every ratio has
    an exact DuckDB list-lambda equivalent (oracle:
    ``doc_quality_gopher``). ``engine='arrow'`` computes the same
    signals in a Counter-based mapInPandas kernel (O(n) n-gram counts
    at C speed vs the interpreted O(n log n) sort-fold; bit-exact,
    engine-agreement pinned in tests) — the faster choice when the
    gate runs standalone; both shapes are one scan, no shuffle.
    Token and n-gram arrays materialize ONCE as projection stages so
    Catalyst does not re-evaluate the tokenizer per reference (the
    expression-tree duplication documented at
    ``functions.text.winnow_fingerprints``). The n-gram occurrence
    counts are O(len²) per row in the document's OWN length — constant
    per row, embarrassingly parallel, no cross-row state — which is the
    scale-safe shape (cf. dedup shingling at operators/dedup.py).
    """
    from data_lakehouse_spark.functions.scalars import round_half_up

    if engine == "arrow":
        return _quality_signals_arrow(
            df, text_col, id_col, min_tokens, max_tokens
        )
    t = F.trim(F.lower(F.col(text_col)))
    empty = F.array().cast("array<string>")
    staged = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.when(t == "", empty).otherwise(F.split(t, r"\s+")).alias("_toks"),
    )
    n = F.size("_toks")
    # F.get is 0-based and NULL-safe; sequence guarded because Spark's
    # sequence(1, 0) DESCENDS instead of returning empty.
    bigram = lambda i: F.concat_ws(" ", F.get("_toks", i), F.get("_toks", i + 1))
    trigram = lambda i: F.concat_ws(
        " ", F.get("_toks", i), F.get("_toks", i + 1), F.get("_toks", i + 2)
    )
    staged = staged.select(
        "doc_id",
        "_text",
        "_toks",
        F.when(
            n >= 2, F.transform(F.sequence(F.lit(0), n - 2), bigram)
        ).otherwise(empty).alias("_bi"),
        F.when(
            n >= 3, F.transform(F.sequence(F.lit(0), n - 3), trigram)
        ).otherwise(empty).alias("_tri"),
    )

    n = F.size("_toks")
    nb = F.size("_bi")
    nt = F.size("_tri")
    dbl = lambda c: c.cast("double")

    mean_word_len = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(
            dbl(F.length(F.concat_ws("", F.col("_toks")))) / n, 4
        )
    )
    distinct_ratio = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(dbl(F.size(F.array_distinct("_toks"))) / n, 4)
    )
    # Occurrence statistics via ONE pass over the sorted n-gram array
    # (equal values are adjacent, so "count of x" = run length): the
    # max count is the longest run, and the duplicated-instance count
    # is the sum of runs >= 2. O(n log n) per row instead of the naive
    # O(n²) count-per-element lambda (measured ~3x on the bench docs;
    # higher-order functions are interpreted, not codegen'd, so lambda
    # evaluations are the cost that matters). The values are identical
    # to the quadratic formula the DuckDB oracle keeps.
    def _run_stats(arr: Column) -> Column:
        acc0 = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("dup"),
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            flushed_dup = acc["dup"] + F.when(
                (x != acc["prev"]) & (acc["run"] >= 2), acc["run"]
            ).otherwise(F.lit(0))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
                flushed_dup.alias("dup"),
            )

        def finish(acc):
            return F.struct(
                acc["best"].alias("best"),
                (
                    acc["dup"]
                    + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0))
                ).alias("dup"),
            )

        return F.aggregate(F.array_sort(arr), acc0, step, finish)

    bi_stats = _run_stats(F.col("_bi"))
    tri_stats = _run_stats(F.col("_tri"))
    top_bigram = F.when(nb == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(dbl(bi_stats["best"]) / nb, 4)
    )
    dup_trigram = F.when(nt == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(dbl(tri_stats["dup"]) / nt, 4)
    )
    symbol_ratio = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(
            dbl(F.regexp_count(F.col("_text"), F.lit(r"#|\.\.\."))) / n, 4
        )
    )
    alpha_ratio = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(
            dbl(F.size(F.filter("_toks", lambda x: x.rlike("[a-z]")))) / n, 4
        )
    )

    sig = staged.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        distinct_ratio.alias("distinct_token_ratio"),
        top_bigram.alias("top_bigram_ratio"),
        dup_trigram.alias("dup_trigram_ratio"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
    )
    gate = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("alpha_word_ratio") > 0.8)
        & (F.coalesce("top_bigram_ratio", F.lit(1.0)) < 0.2)
        & (F.coalesce("dup_trigram_ratio", F.lit(1.0)) < 0.3)
        & (F.col("distinct_token_ratio") > 0.3)
    )
    # n < min_tokens short-circuits every NULL ratio case to FALSE, so
    # the gate is always a concrete boolean.
    return sig.withColumn("gopher_pass", F.coalesce(gate, F.lit(False)))


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: Mapping[str, str] = PII_PATTERNS,
) -> DataFrame:
    """PII scrub — the compliance pass every public-corpus pipeline
    runs before training: per-document hit counts per pattern class
    plus the redacted text (matches replaced by ``[CLASS]`` tokens).

    One scan, all JVM regex (``regexp_count`` + chained
    ``regexp_replace``); no shuffle. Returns
    (doc_id, n_<class>... , n_pii_total, redacted_text).
    """
    out = [F.col(id_col).cast("bigint").alias("doc_id")]
    total = F.lit(0)
    red = F.col(text_col)
    for cls, pat in patterns.items():
        n = F.regexp_count(F.col(text_col), F.lit(pat))
        out.append(n.cast("bigint").alias(f"n_{cls}"))
        total = total + n
        red = F.regexp_replace(red, pat, f"[{cls.upper()}]")
    out.append(total.cast("bigint").alias("n_pii_total"))
    out.append(red.alias("redacted_text"))
    return df.select(*out)


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into ~``chunk_tokens``-token windows with
    ``overlap`` tokens of context carry-over → one row per chunk
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens) — the
    context-window packing step between a cleaned corpus and an
    embedding/training job.

    Whitespace tokenization (the cheap, oracle-portable stand-in for a
    real tokenizer — swap :func:`~data_lakehouse_spark.functions.text.
    bpe_ish_token_count`'s regex in for sub-word budgets). Shape: the
    token array materializes once, chunk starts come from a
    ``sequence`` (stride = chunk - overlap), and ``posexplode`` fans
    out — one scan, no shuffle, output rows ∝ input tokens.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    staged = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"), toks.alias("_toks")
    ).withColumn(
        "_starts",
        F.when(F.size("_toks") == 0, F.array().cast("array<int>")).otherwise(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.size("_toks") - 1 - F.lit(overlap)) / stride, F.lit(0)
                ).cast("int")
                * stride,
                F.lit(stride),
            )
        ),
    )
    chunk = F.slice(F.col("_toks"), F.col("start") + 1, chunk_tokens)
    return (
        staged.select(
            "doc_id", "_toks", F.posexplode("_starts").alias("chunk_idx", "start")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        )
    )


def hash_embeddings(
    df: DataFrame,
    *,
    text_col: str = "chunk_text",
    dim: int = 64,
    seed: int = 1,
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic feature-hashing text embedder (the classic
    "hashing trick"): each whitespace token CRC32-hashes to one of
    ``dim`` buckets with a hash-derived ±1 sign; the bucket sums are
    L2-normalized. Output: the input columns plus ``out_col``
    (``array<double>``, unit-norm; all-zero for empty/degenerate
    text, mirroring the ANN tiers' zero-norm stance).

    This is the PIPELINE stand-in for an external neural embedding
    model (which lives outside the engine — same stance as the
    multimodal decode fakes): deterministic across engines, runs,
    partitionings, and batch boundaries, so gates built on it are
    reproducible. The Spark-side plumbing — Arrow batch kernel, schema,
    no shuffle, embarrassingly parallel — is exactly what a real
    encoder UDF uses; swapping in a model is a one-function change.
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    in_schema = df.schema

    def encode(batches):
        import zlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            acc = np.zeros((n, dim), dtype=np.float64)
            texts = pdf[text_col].fillna("")
            for i, txt in enumerate(texts):
                for t in txt.split():
                    h = zlib.crc32(t.encode("utf-8"), seed) & 0xFFFFFFFF
                    b = h % dim
                    acc[i, b] += 1.0 if (h >> 16) & 1 else -1.0
            nrm = np.linalg.norm(acc, axis=1)
            nz = nrm > 0
            acc[nz] /= nrm[nz, None]
            out = pdf.copy()
            out[out_col] = list(acc.tolist())
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )
    return df.mapInPandas(encode, f"{fields}, {out_col} array<double>")


def dedup_intra_doc_segments(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Order-preserving WITHIN-document segment dedup: split each
    document on ``sep``, keep the FIRST occurrence of every distinct
    segment, and reassemble in original order (RefinedWeb-style exact
    line dedup; on real corpora ``sep`` is a newline — the synthetic
    fixture exercises the identical shape at token granularity, where
    its repetition actually lives).

    Shape for scale: posexplode → (doc, segment) MIN(pos) hash agg →
    per-doc ordered fold via sort_array(collect_list(struct)). Two
    shuffles, both keyed by document (never corpus-global); the per-doc
    collect is bounded by document length — the same per-doc memory
    contract as chunk_documents. No windows, no Python.
    """
    segs = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "seg"),
    )
    firsts = segs.groupBy(id_col, "seg").agg(F.min("pos").alias("pos"))
    return (
        firsts.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_unique_segments"),
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "seg"))),
                    lambda x: x["seg"],
                ),
            ).alias("dedup_text"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """CCNet-style language-model quality score: mean unigram log10
    probability per document, with the unigram model ESTIMATED FROM THE
    CORPUS ITSELF (two-pass: tiny vocab aggregate broadcast back, then
    an embarrassingly-parallel scoring scan — the BM25/TF-IDF stats
    shape). Low scores flag rare-token/OOV-heavy documents; real
    pipelines use the same signal from a pretrained KenLM — the
    OPERATOR SHAPE (broadcast model, one scan) is identical.

    ``vocab_size`` caps the broadcast model for web-scale vocabularies
    (out-of-vocab tokens then score at the add-half floor
    ``log10(0.5/total)``); None keeps the full vocabulary.

    Determinism: per-token logprobs round half-up to ``round_dp`` then
    accumulate as DECIMAL — the document sum is order-independent and
    bit-identical across engines/partitionings; only the final mean
    divides doubles.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    # ONE definition of the determinism-critical fit (rounding scheme,
    # vocab cap, add-half OOV floor) shared with the DSIR path
    probs, oov_probs = _unigram_lm(toks, vocab_size, round_dp)
    scale = F.lit(float(10 ** round_dp))
    scored = (
        toks.join(F.broadcast(probs), "tok", "left")
        .crossJoin(F.broadcast(oov_probs))
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("oov_logp")).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("logp").cast("double").alias("sum_logprob"),
        (
            F.floor(
                F.sum("logp").cast("double") / F.count("*") * scale + F.lit(0.5)
            )
            / scale
        ).alias("avg_logprob"),
    )


def token_budget_mix(
    df: DataFrame,
    budgets: Mapping[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    token_col: str | None = None,
    default_budget: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Data-mixing selection: per ``source_col`` stratum, keep documents
    in deterministic shuffled order until that source's TOKEN budget is
    met → the \"2T web / 300B code / 50B wiki\" mixing step of corpus
    construction, expressed by token volume rather than row fraction
    (which :func:`stratified_hash_sample` covers).

    Greedy boundary rule: a doc is kept iff the tokens accumulated
    BEFORE it (within its source, in ``md5(seed:id)`` order) are below
    the budget — so each source overshoots by at most one document, and
    shrinking a budget only ever removes the tail of the same order
    (stable selection lattice, like hash sampling). Sources absent from
    ``budgets`` get ``default_budget``.

    Shape for scale: the same chunked prefix-sum as :func:`pack_shards`
    — the order key's leading 2 hex digits (256 uniform buckets) chunk
    each source's order, within-(source, chunk) window cumsums run hash-
    partitioned, and only the tiny per-(source, chunk) offset table pays
    a per-source total-order window before broadcasting back. No global
    sort, no driver state.
    """
    tokens = (
        F.col(token_col).cast("bigint")
        if token_col
        else bpe_ish_token_count(text_col)
    )
    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(source_col).alias("_src"),
        tokens.alias("n_tokens"),
    ).withColumn(
        "_ord",
        F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col("doc_id").cast("string"))
        ),
    ).withColumn(
        "_chunk", F.conv(F.substring("_ord", 1, 2), 16, 10).cast("bigint")
    )
    budget_expr: Column = F.lit(int(default_budget))
    for src, b in sorted(budgets.items()):
        budget_expr = F.when(
            F.col("_src") == F.lit(src), F.lit(int(b))
        ).otherwise(budget_expr)

    w_in = (
        Window.partitionBy("_src", "_chunk")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = (
        Window.partitionBy("_src")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_src", "_chunk")
        .agg(F.sum("n_tokens").alias("_chunk_tokens"))
        .select(
            "_src",
            "_chunk",
            F.coalesce(F.sum("_chunk_tokens").over(w_off), F.lit(0)).alias(
                "_offset"
            ),
        )
    )
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), ["_src", "_chunk"])
        .filter(
            (F.col("_offset") + F.col("_cum") - F.col("n_tokens"))
            < budget_expr
        )
        .select(
            "doc_id",
            F.col("_src").alias(source_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def heavy_hitters(
    tokens: DataFrame,
    key_col: str = "term",
    *,
    m: int = 200,
    summary_cap_factor: int = 4,
) -> DataFrame:
    """EXACT frequent-items (keys with count·m > total) without ever
    shuffling the full key space — the two-pass sketch-then-verify
    pattern (Misra–Gries 1982; Frequent/SpaceSaving family).

    Pass 1 runs a batched Misra–Gries summary with ``m`` counters
    INSIDE each partition (``mapInPandas``, no shuffle): whenever the
    summary exceeds ``summary_cap_factor·m`` keys it subtracts the
    (m+1)-th largest count from every counter and drops the non-positive
    ones. Each unit of subtraction hits ≥ m+1 keys, so total undercount
    per key ≤ n_p/(m+1) — any key with partition count > n_p/m is
    guaranteed to survive. A global heavy hitter (count > n/m = Σn_p/m)
    must exceed n_p/m in at least one partition (pigeonhole), so the
    union of partition summaries is a SUPERSET of the true answer:
    ≤ cap·n_partitions candidate keys, independent of vocabulary size.

    Pass 2 exact-counts ONLY the candidates — a broadcast semi-join
    prunes the token stream before its one hash aggregation — and
    applies the true threshold. Output is therefore exactly the SQL
    ``GROUP BY key HAVING count(*)·m > total`` (oracle-verified), while
    the full-vocabulary shuffle that a naive GROUP BY pays at web scale
    (vocab ~ O(corpus)) never happens.

    No reference analogue (reference has no corpus tier); the shape is
    the standard first step of tokenizer induction / stopword discovery
    over a 100 TB corpus.
    """
    import pandas as pd

    spark = tokens.sparkSession
    cap = max(int(summary_cap_factor) * m, m + 1)

    src = tokens.select(F.col(key_col).alias("_k"))

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for k, c in pdf["_k"].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                thresh = vals[m]
                counters = {
                    k: v - thresh for k, v in counters.items() if v > thresh
                }
        yield pd.DataFrame({"_k": list(counters.keys())})

    candidates = (
        src.mapInPandas(summarize, f"_k {dict(src.dtypes)['_k']}")
        .distinct()
    )
    total = src.count()
    return (
        src.join(F.broadcast(candidates), "_k", "left_semi")
        .groupBy("_k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") * F.lit(int(m)) > F.lit(int(total)))
        .select(F.col("_k").alias(key_col), "n")
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicate-span scrubbing (Lee et al. 2021,
    arXiv:2107.06499 — "Deduplicating Training Data Makes Language
    Models Better"): REMOVE every token covered by a ``span_tokens``-
    gram that occurs ≥ ``min_occurrences`` times corpus-wide (across or
    within documents), keeping the rest of each document. The
    span-level counterpart of whole-doc dedup: boilerplate, licenses,
    and quoted chunks vanish while the unique prose stays.

    Distributed shape (no suffix array needed): explode positioned
    n-gram windows (codegen explode-index path, xxhash64 keys), one
    hash-agg occurrence count keyed on the 8-byte hash, semi-join the
    duplicated keys back to get per-doc duplicated start positions,
    collect them per doc (bounded by doc length), and rebuild the text
    with one JVM higher-order filter — token i survives iff no
    duplicated window starts in (i - n, i]. Shuffles are keyed on
    window hash and doc id only; nothing is ever pairwise.

    Returns (doc_id, n_tokens, n_removed, scrubbed_text). Exactly
    SQL-expressible → oracle-verified (query ``doc_scrub_dup_spans``).
    """
    n = int(span_tokens)
    toks_df = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        # NULL text ≡ empty doc (renders '' on both engines)
        F.filter(
            F.split(
                F.coalesce(normalized_text(text_col), F.lit("")), r"\s+"
            ),
            lambda t: t != "",
        ).alias("_toks"),
    )
    ex = toks_df.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("_toks") >= n,
                F.sequence(F.lit(0), F.size("_toks") - n),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_i"),
        "_toks",
    ).select(
        "doc_id",
        "_i",
        F.xxhash64(
            F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, n))
        ).alias("_h"),
    )
    dup = (
        ex.groupBy("_h")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= int(min_occurrences))
        .select("_h")
    )
    starts = (
        ex.join(dup, "_h", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("_i")).alias("_starts"))
    )
    out = toks_df.join(starts, "doc_id", "left").withColumn(
        "_starts", F.coalesce("_starts", F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            F.col("_starts"), lambda s: (i >= s) & (i < s + F.lit(n))
        ),
    )
    return out.select(
        "doc_id",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.concat_ws(" ", kept).alias("scrubbed_text"),
    )


def _unigram_lm(
    toks: DataFrame, vocab_size: int | None, round_dp: int
) -> tuple[DataFrame, DataFrame]:
    """Fit an add-half-floored unigram LM from a (doc_id, tok) frame:
    returns (probs(tok, logp), oov(oov_logp)) with per-token log10
    probabilities floor-rounded half-up to ``round_dp`` (the
    determinism scheme of :func:`unigram_logprob_scores`). Both frames
    are tiny (vocab-sized / 1 row) and meant to be broadcast."""
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    if vocab_size is not None:
        vocab = vocab.orderBy(F.desc("cnt"), F.asc("tok")).limit(vocab_size)
    total = toks.agg(F.count("*").alias("total"))
    scale = F.lit(float(10 ** round_dp))
    logp = F.floor(
        F.log10(F.col("cnt").cast("double") / F.col("total").cast("double"))
        * scale
        + F.lit(0.5)
    ) / scale
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok", logp.cast(f"decimal(18,{round_dp})").alias("logp")
    )
    oov = F.floor(
        F.log10(F.lit(0.5) / F.col("total").cast("double")) * scale
        + F.lit(0.5)
    ) / scale
    oov_probs = total.select(
        oov.cast(f"decimal(18,{round_dp})").alias("oov_logp")
    )
    return probs, oov_probs


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # id kept as-is (string/uuid ids must not silently collapse to one
    # NULL group), aliased so downstream code has one name to group on
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
        ).alias("tok"),
    ).filter(F.col("tok") != "")


def dsir_importance_sample(
    docs: DataFrame,
    target: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    seed: int = 0,
    round_dp: int = 6,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): select ``n`` documents from the raw corpus
    with probability proportional to the importance ratio
    ``p_target(doc) / p_corpus(doc)`` under two hashed-feature LMs (here
    the engine's deterministic unigram LMs — the operator shape the
    paper's hashed-ngram variant needs is identical: two broadcast
    models, one corpus scan).

    Per document: ``log_ratio`` = (mean log10 prob under the TARGET
    LM) − (mean log10 prob under the CORPUS LM) — length-normalized so
    long documents aren't favored. Sampling ∝ exp(weight) without
    replacement uses the Gumbel-top-k trick with DETERMINISTIC noise:
    ``u`` comes from the first 13 hex digits of ``md5(seed:doc_id)``
    (52 bits — exactly representable, bit-identical on any SQL engine),
    ``g = −ln(−ln(u))``, and the top ``n`` docs by the 6-dp-quantized
    key ``ln(10)·log_ratio + g`` are kept. Reproducible across engines,
    retries, partitionings, and cluster sizes — reruns of a corpus
    build select the same documents.

    Scale shape: ONE token scan of the corpus joined against two
    broadcast LM tables (vocab-capped via ``vocab_size`` for web-scale
    vocabularies); the target fit scans only the (small) seed set; the
    final top-k is Spark's TakeOrdered (no global sort materialized).

    Returns (doc_id, n_tokens, logp_target, logp_corpus, log_ratio,
    sample_key) for the selected docs, highest key first.
    """
    toks = _doc_tokens(docs, text_col, id_col)
    # the target fit only needs tokens — a seed corpus loaded as a bare
    # text column (no ids) is a natural DSIR target and must work
    target_toks = target.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
        ).alias("tok")
    ).filter(F.col("tok") != "")
    t_probs, t_oov = _unigram_lm(target_toks, vocab_size, round_dp)
    b_probs, b_oov = _unigram_lm(toks, vocab_size, round_dp)
    scale = F.lit(float(10 ** round_dp))
    scored = (
        toks.join(
            F.broadcast(t_probs.withColumnRenamed("logp", "t_logp")),
            "tok",
            "left",
        )
        .join(
            F.broadcast(b_probs.withColumnRenamed("logp", "b_logp")),
            "tok",
            "left",
        )
        .crossJoin(F.broadcast(t_oov.withColumnRenamed("oov_logp", "t_oov")))
        .crossJoin(F.broadcast(b_oov.withColumnRenamed("oov_logp", "b_oov")))
        .select(
            "doc_id",
            F.coalesce(F.col("t_logp"), F.col("t_oov")).alias("t"),
            F.coalesce(F.col("b_logp"), F.col("b_oov")).alias("b"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (
                F.floor(
                    F.sum("t").cast("double") / F.count("*") * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("logp_target"),
            (
                F.floor(
                    F.sum("b").cast("double") / F.count("*") * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("logp_corpus"),
        )
        .withColumn(
            "log_ratio", F.col("logp_target") - F.col("logp_corpus")
        )
    )
    # deterministic Gumbel noise: u in (0, 1) from a 52-bit md5 prefix
    # (never exactly 0/1: the +0.5 offset keeps ln defined)
    u = (
        F.conv(
            F.substring(
                _sample_hash(F.col("doc_id"), seed), 1, 13
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16 ** 13))
    gumbel = -F.log(-F.log(u))
    key = (
        F.floor(
            (F.col("log_ratio") * F.lit(math.log(10.0)) + gumbel) * scale
            + F.lit(0.5)
        )
        / scale
    )
    return (
        scored.withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(int(n))
    )


def ccnet_quality_buckets(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    round_dp: int = 6,
    lm: str = "unigram",
    prune_min_count: int | None = None,
    scores: DataFrame | None = None,
) -> DataFrame:
    """CCNet head/middle/tail quality split (Wenzek et al. 2020,
    arXiv:1911.00359): score every document with the LM, cut the corpus
    into terciles, and label head (best third), middle, tail. Real
    pipelines keep head+middle for pretraining and mine tail for
    filters.

    ``lm`` picks the scorer: ``"unigram"`` (cheap, the default) or
    ``"kn5"`` — the order-5 interpolated Kneser-Ney model
    (:func:`kn5_logprob_scores`), which is the configuration CCNet
    itself runs (a 5-gram KenLM); ``prune_min_count`` passes through to
    the KN model. Documents the KN scorer cannot score (zero tokens)
    bucket as ``tail``. The score column is normalized to
    ``(n_tokens, avg_logprob)`` for both scorers.

    Scale shape: cutoffs are ONE ``percentile_disc`` aggregate row
    broadcast back as a map-side CASE — no global window, no NTILE
    single-partition sort (the anti-pattern this replaces). Discrete
    percentiles pick actual score values, so the cuts are bit-stable on
    any SQL engine; ties land deterministically via >= / > boundaries.

    ``scores`` short-circuits the scorer with a PRECOMPUTED per-doc
    score frame (``id_col``, ``n_tokens``, ``avg_logprob``) — the
    model-sharing hook: a pipeline that already scored the corpus
    (e.g. a persisted :func:`kn5_logprob_scores` result feeding both a
    score gate and this bucketing) cuts terciles without rebuilding
    the LM.
    """
    if scores is not None:
        pass
    elif lm == "kn5":
        scores = kn5_logprob_scores(
            docs, text_col=text_col, id_col=id_col,
            prune_min_count=prune_min_count, round_dp=round_dp,
        ).withColumnRenamed("n_scored", "n_tokens")
    elif lm == "unigram":
        scores = unigram_logprob_scores(
            docs, text_col=text_col, id_col=id_col, vocab_size=vocab_size,
            round_dp=round_dp,
        )
    else:
        raise ValueError(f"lm must be 'unigram' or 'kn5', got {lm!r}")
    cuts = scores.selectExpr(
        "percentile_disc(0.3333333333333333) WITHIN GROUP "
        "(ORDER BY avg_logprob) AS c1",
        "percentile_disc(0.6666666666666666) WITHIN GROUP "
        "(ORDER BY avg_logprob) AS c2",
    )
    return (
        scores.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            "n_tokens",
            "avg_logprob",
            F.when(F.col("avg_logprob") > F.col("c2"), F.lit("head"))
            .when(F.col("avg_logprob") > F.col("c1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def temperature_sample(
    docs: DataFrame,
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 2.0,
    target_rows: int | None = None,
    target_fraction: float | None = None,
    seed: int = 0,
    round_dp: int = 6,
) -> DataFrame:
    """Temperature-scaled stratum rebalancing (the multilingual
    τ-sampling of XLM-R, Conneau et al. 2020, arXiv:1911.02116 §3):
    resample so stratum proportions follow ``p_s^(1/τ)`` (renormalized)
    instead of the raw corpus proportions — τ>1 upweights small
    sources/languages, τ=1 is a plain uniform sample, τ→∞ approaches
    equal shares.

    Per-stratum keep-fractions derive from ONE tiny groupBy(stratum)
    count aggregate: ``keep_s = target · q_s / n_s`` (capped at 1 — no
    replication; callers wanting oversampling repeat epochs instead),
    where ``q_s ∝ n_s^(1/τ)``. The filter itself is the engine's
    deterministic md5 keep-rule with a NUMERIC uniform: the first 13
    hex digits of ``md5(seed:id)`` are 52 bits — exact in a double on
    any engine — and a row is kept iff ``u < keep_s`` with ``keep_s``
    floor-rounded half-up to ``round_dp``. Map-side filter against a
    broadcast fraction table: zero data shuffles, reproducible across
    engines/retries/partitionings, and the kept set is a subset lattice
    in ``target_rows`` (growing the target never churns prior picks).

    ``target_rows=None`` keeps the total corpus size (resampling only
    shifts the mix); ``target_fraction`` sizes the target as
    ``floor(fraction · corpus)`` INSIDE the counts aggregate — no extra
    driver-side count action when the input is an expensive lineage.
    Returns the kept rows + ``keep_fraction``.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if target_rows is not None and target_fraction is not None:
        raise ValueError("pass target_rows or target_fraction, not both")
    # NULL strata form a real stratum: joins on the raw column would
    # drop every NULL-stratum row while its count still inflated z
    # (deflating everyone else's fractions) — join null-safely instead
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").alias("n_total"),
        F.sum(F.pow(F.col("n_s").cast("double"), 1.0 / temperature)).alias(
            "z"
        ),
    )
    scale = F.lit(float(10 ** round_dp))
    if target_rows is not None:
        target = F.lit(int(target_rows))
    elif target_fraction is not None:
        target = F.floor(
            F.col("n_total").cast("double") * F.lit(float(target_fraction))
        ).cast("double")
    else:
        target = F.col("n_total").cast("double")
    frac = F.least(
        F.lit(1.0),
        F.floor(
            (
                target
                * F.pow(F.col("n_s").cast("double"), 1.0 / temperature)
                / F.col("z")
                / F.col("n_s").cast("double")
            )
            * scale
            + F.lit(0.5)
        )
        / scale,
    )
    fracs = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col, frac.alias("keep_fraction")
    )
    u = F.conv(
        F.substring(_sample_hash(F.col(id_col), seed), 1, 13), 16, 10
    ).cast("double") / F.lit(float(16 ** 13))
    return (
        docs.join(
            F.broadcast(fracs.withColumnRenamed(stratum_col, "_stratum")),
            F.col(stratum_col).eqNullSafe(F.col("_stratum")),
        )
        .drop("_stratum")
        .filter(u < F.col("keep_fraction"))
    )


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Bigram-LM quality score: mean log10 conditional probability
    ``p(w_i | w_{i-1})`` per document, the order-2 step from
    :func:`unigram_logprob_scores` toward the 5-gram KenLM CCNet uses —
    context-aware scoring separates fluent text from bag-of-words spam
    that a unigram model scores identically.

    Model: MLE ``cnt(w_{i-1} w_i) / ctx(w_{i-1})`` where the context
    count is the number of bigrams starting with ``w_{i-1}`` (the exact
    conditional denominator); unseen bigrams floor at the add-half rate
    ``0.5 / total_bigrams``. Both model tables derive from ONE bigram
    explode of the corpus (groupBy pair / groupBy first token),
    broadcast back over a second scoring scan — the same two-pass
    broadcast shape as every LM op here. Documents with < 2 tokens
    emit one row with ``n_bigrams=0`` and NULL scores (explode_outer —
    no bigram positions, but inner joins on the score frame must not
    silently lose them). Per-position logprobs floor-round
    half-up to ``round_dp`` and accumulate as DECIMAL — order-
    independent, bit-identical across engines (oracle-verified).

    ``vocab_size`` caps the broadcast bigram table to the most frequent
    pairs for web-scale corpora; dropped pairs score at the floor.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(
            F.trim(F.lower(F.col(text_col))), r"\s+", -1
        ).alias("_t"),
    ).select(
        id_col,
        F.filter(F.col("_t"), lambda t: t != "").alias("_t"),
    )
    bi = toks.select(
        id_col,
        F.explode_outer(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("_t", i),
                        F.element_at("_t", i + 1),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bigram"),
    )
    # model tables fit on real bigram positions only — the NULL rows
    # explode_outer emits for <2-token docs are score-side placeholders
    model_bi = bi.filter(F.col("bigram").isNotNull())
    pair_cnt = model_bi.groupBy("bigram").agg(F.count("*").alias("cnt"))
    if vocab_size is not None:
        pair_cnt = pair_cnt.orderBy(
            F.desc("cnt"), F.asc("bigram")
        ).limit(vocab_size)
    ctx_cnt = model_bi.select(
        F.split(F.col("bigram"), " ", 2).getItem(0).alias("ctx")
    ).groupBy("ctx").agg(F.count("*").alias("ctx_cnt"))
    total = model_bi.agg(F.count("*").alias("total"))
    scale = F.lit(float(10 ** round_dp))
    logp = F.floor(
        F.log10(F.col("cnt").cast("double") / F.col("ctx_cnt").cast("double"))
        * scale
        + F.lit(0.5)
    ) / scale
    probs = (
        pair_cnt.withColumn(
            "ctx", F.split(F.col("bigram"), " ", 2).getItem(0)
        )
        .join(ctx_cnt, "ctx")
        .select(
            "bigram", logp.cast(f"decimal(18,{round_dp})").alias("logp")
        )
    )
    # try_divide: an all-short corpus has total=0 bigrams; the floor is
    # then NULL (never applied — every lp is NULL too), not a crash
    floor_lp = F.floor(
        F.log10(F.try_divide(F.lit(0.5), F.col("total").cast("double")))
        * scale
        + F.lit(0.5)
    ) / scale
    floor_probs = total.select(
        floor_lp.cast(f"decimal(18,{round_dp})").alias("floor_logp")
    )
    return (
        bi.join(F.broadcast(probs), "bigram", "left")
        .crossJoin(F.broadcast(floor_probs))
        .select(
            id_col,
            # NULL lp for the placeholder row of a <2-token doc — it
            # must not score at the floor, and count("lp") skips it
            F.when(
                F.col("bigram").isNotNull(),
                F.coalesce(F.col("logp"), F.col("floor_logp")),
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("lp").cast("bigint").alias("n_bigrams"),
            F.sum("lp").cast("double").alias("sum_logprob"),
            (
                F.floor(
                    F.try_divide(
                        F.sum("lp").cast("double"), F.count("lp")
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("avg_logprob"),
        )
    )


def _kn5_use_broadcast(n_grams: int, cap: int) -> bool:
    """Size-based KN5 path dispatch: a model whose surviving 5-gram
    table fits the broadcast cap scores through the collected-dict
    Arrow path (KenLM-probe shape); anything larger scores through the
    distributed hash joins. Factored out so the threshold is testable
    without building a >cap model."""
    return n_grams <= cap


def kn5_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    prune_min_count: int | None = None,
    round_dp: int = 6,
    broadcast_model: bool | str = "auto",
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """Order-5 interpolated Kneser-Ney LM quality score — the
    KenLM-grade gate CCNet-style pipelines actually use (a 5-gram KN
    model), completing the unigram -> bigram track
    (:func:`unigram_logprob_scores`, :func:`bigram_logprob_scores`)
    with real context modeling and principled backoff.

    Model (Chen & Goodman 1999, interpolated KN, fixed discount ``D``):

    - every document is padded with four BOS sentinels (``\x01``) so
      EVERY real token position scores through the same full-context
      order-5 path (no per-position truncation classes);
    - the top level uses raw 5-gram counts:
      ``P5(w|h) = max(c5(hw)-D,0)/c5(h.) + D*N1+(h.)/c5(h.) * P4`` —
      an UNSEEN 4-token context backs off with weight 1;
    - lower levels use continuation counts (``N1+(.g)`` = distinct
      left-extending tokens), the defining KN ingredient: frequent-but-
      context-bound tokens ("francisco") stop inflating backoff mass;
    - the base case interpolates to uniform over the continuation
      vocabulary, which algebraically collapses to
      ``P1(w) = (max(cc1(w)-D,0) + D)/ct1`` — OOV tokens floor at
      ``D/ct1 > 0``.

    Every table derives from ONE corpus scan: the position explode
    yields 5-gram strings; 4/3/2/1-gram raw+continuation tables are
    suffix re-aggregations of the 5-gram table (windows all end at real
    token positions, so lower-order counts are exact suffix sums — no
    second scan). With ``broadcast_model`` (default) the pruned 5-gram
    table is collected once (bounded, fail-fast at
    ``broadcast_max_grams``), the lower orders are driver-side dict
    folds, and scoring is a single Arrow ``mapInPandas`` stage probing
    the broadcast model — the production shape (a pretrained KenLM is
    likewise a broadcast native model probed from a vectorized UDF).
    With ``broadcast_model=False`` every table stays a lazy
    re-aggregation and scoring runs as nine distributed hash joins on
    the gram keys. The DEFAULT ``"auto"`` dispatches on measured model
    size: one count job over the persisted pruned 5-gram table picks
    the broadcast path at ≤ ``broadcast_max_grams`` surviving grams and
    the hash-join path above it — the scale path engages without the
    caller knowing the knob (same auto-dispatch contract as
    ``similarity.cosine_pairs``). ``prune_min_count`` drops rare
    5-grams BEFORE the lower-order derivation (KenLM-style count
    pruning; pruned mass resurfaces via backoff, never as a crash).
    The two paths are bit-identical (pinned in tests/test_corpus.py).

    Determinism: probabilities evaluate in IEEE doubles with a fixed
    parenthesization mirrored by the oracle SQL; per-position log10
    probabilities floor-round half-up at ``round_dp`` and accumulate as
    DECIMAL (order-independent, bit-identical across engines).
    Zero-token documents keep one row with ``n_scored=0`` and NULL
    scores (explode_outer — same contract as
    :func:`bigram_logprob_scores`).
    """
    BOS = "\x01"
    D = float(discount)
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1),
            lambda t: t != "",
        ).alias("_t"),
    ).select(
        id_col,
        F.concat(
            F.array_repeat(F.lit(BOS), 4), F.col("_t")
        ).alias("_p"),
        F.size("_t").alias("_n"),
    )
    # one 5-token window per REAL token position (padded index i+4)
    pos = toks.select(
        id_col,
        F.explode_outer(
            F.when(
                F.col("_n") > 0,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n")),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_p"), i, 5)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("g5"),
    )
    grams = pos.filter(F.col("g5").isNotNull())

    def _part(start: int, length: int) -> Column:
        return F.concat_ws(
            " ", F.slice(F.split(F.col("g5"), " ", -1), start, length)
        )

    def _gpart(col: str, start: int, length: int) -> Column:
        return F.concat_ws(
            " ", F.slice(F.split(F.col(col), " ", -1), start, length)
        )

    cnt5 = grams.groupBy("g5").agg(F.count("*").alias("c5"))
    if prune_min_count is not None:
        cnt5 = cnt5.filter(F.col("c5") >= int(prune_min_count))

    cap = int(broadcast_max_grams)
    auto = broadcast_model == "auto"
    if auto:
        # Size-based dispatch: persist the pruned 5-gram table so the
        # sizing count and whichever path follows share ONE aggregation
        # (the broadcast path collects from cache; the join path reuses
        # it across its nine suffix/context re-aggregations).
        from pyspark import StorageLevel

        cnt5 = cnt5.persist(StorageLevel.MEMORY_AND_DISK)
        use_broadcast = _kn5_use_broadcast(cnt5.count(), cap)
    else:
        use_broadcast = bool(broadcast_model)

    if use_broadcast:
        # Fast path: ONE aggregation job collects the (pruned) 5-gram
        # table — bounded, fail-fast — the lower-order tables are
        # trivial driver-side dict folds, and scoring runs as a single
        # Arrow ``mapInPandas`` stage against the broadcast model (the
        # production shape: a pretrained KenLM is likewise a broadcast
        # native model probed from a vectorized UDF). This replaces ~10
        # SEQUENTIAL tiny shuffle stages + nine joins with one job and
        # one map stage; bit-equality with the hash-join path is pinned
        # in tests/test_corpus.py.
        rows = cnt5.collect()
        if auto:
            # model now lives in driver dicts; the exchange is done
            cnt5.unpersist(blocking=False)
        elif len(rows) > cap:
            raise ValueError(
                f"kn5 model has {len(rows)} surviving 5-grams - too "
                "large to collect/broadcast; raise prune_min_count or "
                "set broadcast_model=False for the hash-join path "
                "(broadcast_model='auto' dispatches on size itself)"
            )
        c5_map = {r["g5"]: r["c5"] for r in rows}

        def _suffix_fold(m: dict) -> dict:
            out: dict[str, int] = {}
            for k in m:
                kk = k.split(" ", 1)[1]
                out[kk] = out.get(kk, 0) + 1
            return out

        a4_map = _suffix_fold(c5_map)
        a3_map = _suffix_fold(a4_map)
        a2_map = _suffix_fold(a3_map)
        a1_map = _suffix_fold(a2_map)

        def _ctx_fold(m: dict) -> dict:
            out: dict[str, list[int]] = {}
            for k, v in m.items():
                e = out.setdefault(k.rsplit(" ", 1)[0], [0, 0])
                e[0] += v
                e[1] += 1
            return out

        ctx_maps = (
            _ctx_fold(c5_map),
            _ctx_fold(a4_map),
            _ctx_fold(a3_map),
            _ctx_fold(a2_map),
        )
        ct1_val = sum(a1_map.values())
        bc = docs.sparkSession.sparkContext.broadcast(
            (c5_map, a4_map, a3_map, a2_map, a1_map, ctx_maps, ct1_val)
        )
        micro = 10 ** round_dp

        def _score(batches):
            import math

            import pandas as pd

            c5m, a4m, a3m, a2m, a1m, (cx5, cx4, cx3, cx2), ct1 = bc.value
            for pdf in batches:
                lps = []
                for g in pdf["g5"]:
                    if g is None or ct1 == 0:
                        lps.append(None)
                        continue
                    t = g.split(" ")
                    # same arithmetic, same order as the join path:
                    # (max(cc-D,0) + D*n1p*p_lower) / ctot per level
                    p = (max(a1m.get(t[4], 0) - D, 0.0) + D) / ct1
                    for gm, cxm, lo in (
                        (a2m, cx2, 3),
                        (a3m, cx3, 2),
                        (a4m, cx4, 1),
                        (c5m, cx5, 0),
                    ):
                        ctx = cxm.get(" ".join(t[lo:4]))
                        if ctx is not None:
                            p = (
                                max(gm.get(" ".join(t[lo:]), 0) - D, 0.0)
                                + D * ctx[1] * p
                            ) / ctx[0]
                    # CROSS-LIBM NOTE: this path quantizes with
                    # CPython's math.log10 while the hash-join twin and
                    # the DuckDB oracle use JVM/DuckDB log10. IEEE-754
                    # does not require correctly-rounded log10, so libm
                    # implementations may differ in the last ulp and
                    # the floor(x*1e6+0.5) rounding could flip at an
                    # exact .5*10^-6 boundary on some platforms. The
                    # bit-equality test vs the join path
                    # (tests/test_corpus_lm.py) pins THIS host's libms
                    # agree on the fixture's probability set; if a
                    # platform divergence ever surfaces, route both
                    # paths' log10 through one engine (e.g. compute p
                    # here and log10+floor JVM-side post-mapInPandas).
                    lps.append(math.floor(math.log10(p) * micro + 0.5))
                yield pd.DataFrame(
                    {
                        "_id": pdf[pdf.columns[0]],
                        "lpm": pd.array(lps, dtype="Int64"),
                    }
                )

        id_type = pos.schema[id_col].dataType.simpleString()
        sc_micro = F.lit(float(micro))
        return (
            pos.mapInPandas(_score, f"_id {id_type}, lpm long")
            .groupBy(F.col("_id").alias(id_col))
            .agg(
                F.count("lpm").cast("bigint").alias("n_scored"),
                (F.sum("lpm").cast("double") / sc_micro).alias(
                    "sum_logprob"
                ),
                (
                    F.floor(
                        F.try_divide(
                            F.sum("lpm").cast("double") / sc_micro,
                            F.count("lpm"),
                        )
                        * sc_micro
                        + F.lit(0.5)
                    )
                    / sc_micro
                ).alias("avg_logprob"),
            )
        )

    # Scale path (broadcast_model=False, or auto above the gram cap):
    # every table stays a lazy suffix/prefix re-aggregation of the
    # 5-gram table (no driver materialization); the joins below run as
    # distributed hash joins on the gram keys.
    if auto:
        # auto persisted cnt5 for the sizing count; keep it pinned
        # (nine downstream re-aggregations) one generation at a time
        from data_lakehouse_spark import cacheutil

        cacheutil.rotate("corpus.kn5_cnt5", [cnt5])
    a4 = cnt5.groupBy(_gpart("g5", 2, 4).alias("g4")).agg(
        F.count("*").alias("cc4")
    )
    a3 = a4.groupBy(_gpart("g4", 2, 3).alias("g3")).agg(
        F.count("*").alias("cc3")
    )
    a2 = a3.groupBy(_gpart("g3", 2, 2).alias("g2")).agg(
        F.count("*").alias("cc2")
    )
    a1 = a2.groupBy(_gpart("g2", 2, 1).alias("g1")).agg(
        F.count("*").alias("cc1")
    )
    # context totals + distinct-continuation counts per level
    ctx5 = cnt5.groupBy(_gpart("g5", 1, 4).alias("h4")).agg(
        F.sum("c5").alias("tot5"), F.count("*").alias("n1p5")
    )
    cx4 = a4.groupBy(_gpart("g4", 1, 3).alias("h3")).agg(
        F.sum("cc4").alias("ct4"), F.count("*").alias("np4")
    )
    cx3 = a3.groupBy(_gpart("g3", 1, 2).alias("h2")).agg(
        F.sum("cc3").alias("ct3"), F.count("*").alias("np3")
    )
    cx2 = a2.groupBy(_gpart("g2", 1, 1).alias("h1")).agg(
        F.sum("cc2").alias("ct2"), F.count("*").alias("np2")
    )
    sc = a1.agg(F.sum("cc1").alias("ct1"))

    side = lambda d: d  # noqa: E731 - hash joins; model never collected
    j = (
        pos.withColumn("h4", _part(1, 4))
        .withColumn("g4", _part(2, 4))
        .withColumn("h3", _part(2, 3))
        .withColumn("g3", _part(3, 3))
        .withColumn("h2", _part(3, 2))
        .withColumn("g2", _part(4, 2))
        .withColumn("h1", _part(4, 1))
        .withColumn("g1", _part(5, 1))
        .join(side(cnt5), "g5", "left")
        .join(side(ctx5), "h4", "left")
        .join(side(a4), "g4", "left")
        .join(side(cx4), "h3", "left")
        .join(side(a3), "g3", "left")
        .join(side(cx3), "h2", "left")
        .join(side(a2), "g2", "left")
        .join(side(cx2), "h1", "left")
        .join(side(a1), "g1", "left")
        .crossJoin(side(sc))
    )
    dlit = F.lit(D)
    z = F.lit(0.0)

    def _lvl(cc: Column, ctot: Column, np_: Column, lower: Column) -> Column:
        seen = (
            F.greatest(F.coalesce(cc, F.lit(0)).cast("double") - dlit, z)
            + dlit * np_.cast("double") * lower
        ) / ctot.cast("double")
        return F.when(ctot.isNull(), lower).otherwise(seen)

    p1 = (
        F.greatest(F.coalesce(F.col("cc1"), F.lit(0)).cast("double") - dlit, z)
        + dlit
    ) / F.col("ct1").cast("double")
    p2 = _lvl(F.col("cc2"), F.col("ct2"), F.col("np2"), p1)
    p3 = _lvl(F.col("cc3"), F.col("ct3"), F.col("np3"), p2)
    p4 = _lvl(F.col("cc4"), F.col("ct4"), F.col("np4"), p3)
    p5 = _lvl(F.col("c5"), F.col("tot5"), F.col("n1p5"), p4)

    scale = F.lit(float(10 ** round_dp))
    lp = F.when(
        F.col("g5").isNotNull(),
        (F.floor(F.log10(p5) * scale + F.lit(0.5)) / scale).cast(
            f"decimal(18,{round_dp})"
        ),
    ).alias("lp")
    return (
        j.select(id_col, lp)
        .groupBy(id_col)
        .agg(
            F.count("lp").cast("bigint").alias("n_scored"),
            F.sum("lp").cast("double").alias("sum_logprob"),
            (
                F.floor(
                    F.try_divide(F.sum("lp").cast("double"), F.count("lp"))
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("avg_logprob"),
        )
    )


def source_kl_divergence(
    docs: DataFrame,
    *,
    stratum_col: str = "source",
    text_col: str = "text",
    round_dp: int = 6,
) -> DataFrame:
    """Per-source KL divergence (log10 base) of the source's unigram
    distribution from the whole-corpus distribution — the domain-
    divergence diagnostic data-mixing work reads before choosing
    weights (a source with near-zero KL adds little diversity; a
    high-KL source shifts the mix). ``KL(p_s ‖ p_corpus) =
    Σ_w p_s(w) · log10(p_s(w)/p(w))``, summed over the source's own
    vocabulary (terms with ``p_s(w)=0`` contribute 0; ``p(w)`` is never
    0 for those terms since the corpus contains the source).

    Shape: one token explode → one (source, token) count agg; the
    global token table derives from re-aggregating those counts (never
    a second corpus scan) and joins back BY TOKEN (hash join — the
    token table can exceed broadcast size at web scale). Per-term
    contributions quantize to ``round_dp`` and sum as DECIMAL —
    order-independent, hash-verifiable.

    Returns (source, n_tokens, n_terms, kl_divergence) — KL ≥ 0 up to
    quantization.
    """
    toks = docs.select(
        F.col(stratum_col).alias("source"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    sc = toks.groupBy("source", "tok").agg(F.count("*").alias("cnt_s"))
    totals = sc.groupBy("source").agg(F.sum("cnt_s").alias("tot_s"))
    gc = sc.groupBy("tok").agg(F.sum("cnt_s").alias("cnt_g"))
    gt = gc.agg(F.sum("cnt_g").alias("tot_g"))
    scale = F.lit(float(10 ** round_dp))
    term = (
        sc.join(gc, "tok")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "cnt_s",
            (
                F.floor(
                    (
                        F.col("cnt_s").cast("double")
                        / F.col("tot_s").cast("double")
                        * F.log10(
                            (
                                F.col("cnt_s").cast("double")
                                / F.col("tot_s").cast("double")
                            )
                            / (
                                F.col("cnt_g").cast("double")
                                / F.col("tot_g").cast("double")
                            )
                        )
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).cast(f"decimal(18,{round_dp})").alias("term"),
        )
    )
    return term.groupBy("source").agg(
        F.sum("cnt_s").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("term").cast("double").alias("kl_divergence"),
    )
