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

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.text import bpe_ish_token_count
from data_lakehouse_spark.operators.dedup import _shingle_explode

__all__ = [
    "sample_threshold",
    "hash_sample",
    "stratified_hash_sample",
    "contamination_hits",
    "decontaminate",
    "pack_shards",
]


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
    """
    tokens = (
        F.col(token_col).cast("bigint")
        if token_col
        else bpe_ish_token_count(text_col)
    )
    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        tokens.alias("n_tokens"),
    ).withColumn("_chunk", F.floor(F.col("doc_id") / chunk_span))

    w_in = (
        Window.partitionBy("_chunk")
        .orderBy("doc_id")
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
