"""Full-text keyword retrieval over the documents table: BM25 ranking
as pure DataFrame expressions.

Okapi BM25 (Robertson & Spärck Jones lineage; the Lucene-default
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` variant) for a FIXED query
term set:

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·dl/avgdl))

Shape for scale: the per-document term frequencies are per-row
higher-order-function expressions over the tokenized text (one scan, no
shuffle, no explode — the query term set is small and fixed, so tf per
term is a column, not a posting list). The corpus statistics (N, avgdl,
per-term document frequencies) are ONE tiny global aggregate whose
single row is broadcast back with a literal-free cross join — the same
two-phase stats-then-score shape the TF-IDF operator uses
(``corpus.py``). Nothing driver-side, nothing quadratic; at 100 TB the
stats pass is a full scan (unavoidable — BM25 needs global df) and the
scoring pass is embarrassingly parallel.

The per-term score addends are summed in EXPLICIT term order so the
float result is bit-stable and reproducible against the DuckDB oracle
(floating-point addition does not commute across arbitrary aggregation
orders).

Reference parity: the reference has no search tier (ClickHouse serves
pre-aggregated marts); this extends the LLM-corpus surface — keyword
retrieval over a training corpus is the standard first-stage ranker
next to the ANN tier (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse"]


def _tokens(text_col: str) -> Column:
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``terms`` → (doc_id, per-term tf
    columns, bm25 double). Documents matching no term score 0."""
    if not terms:
        raise ValueError("bm25_scores: empty query term set")
    def _eq(term: str):
        # single-parameter closure: a two-parameter lambda would be
        # treated by F.filter as the (element, index) form
        lit = F.lit(term)
        return lambda x: x == lit

    staged = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        _tokens(text_col).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("double").alias("_dl"),
        *[
            F.size(F.filter("_toks", _eq(t))).cast("double").alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )

    stats = staged.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = staged.crossJoin(F.broadcast(stats))

    def addend(i: int) -> Column:
        tf = F.col(f"_tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        return F.when(tf > 0, idf * tf * (k1 + 1.0) / denom).otherwise(F.lit(0.0))

    # left-to-right sum in declared term order — reproducible float
    score = addend(0)
    for i in range(1, len(terms)):
        score = score + addend(i)
    return scored.select(
        "doc_id",
        *[
            F.col(f"_tf_{i}").cast("bigint").alias(f"tf_{t}")
            for i, t in enumerate(terms)
        ],
        score.alias("bm25"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k matching documents by BM25. The ordering key is the
    ROUNDED score (then doc_id), so the cutoff is deterministic and
    engine-independent — raw double ordering could disagree with an
    oracle in the last ulp. Catalyst rewrites the sort+limit to
    TakeOrderedAndProject (no global sort materialization)."""
    from data_lakehouse_spark.functions.scalars import round_half_up

    scored = bm25_scores(
        df, terms, text_col=text_col, id_col=id_col, k1=k1, b=b
    )
    return (
        scored.filter(F.col("bm25") > 0)
        .withColumn("bm25", round_half_up(F.col("bm25"), round_digits))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str, str, str]],
    k_rrf: int = 60,
    top_k: int = 20,
    id_out: str = "doc_id",
    score_out: str = "rrf_score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    ranked retrieval lists: ``score(d) = Σ_lists 1/(k + rank_l(d))``.

    ``ranked`` is a list of ``(df, id_col, score_col, rank_out)``: each
    df is one system's (already top-k'd) result list; its rank is the
    ROW_NUMBER over (score desc, id asc) — a total order so the fused
    score is deterministic. Documents missing from a list contribute
    nothing for it (rank column stays NULL in the output).

    Shape for scale: the inputs are top-k lists (tens to thousands of
    rows — bounded by construction, NOT corpus-sized), so the
    unpartitioned rank windows and the full-outer id join are
    intentionally tiny; the heavy lifting happened in the upstream
    rankers (BM25 scan / ANN probe). The addends sum in explicit list
    order for bit-stable floats.
    """
    fused: DataFrame | None = None
    rank_cols: list[str] = []
    from pyspark.sql.window import Window

    for df, id_col, score_col, rank_out in ranked:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        one = df.select(
            F.col(id_col).cast("bigint").alias(id_out),
            F.row_number().over(w).cast("bigint").alias(rank_out),
        )
        rank_cols.append(rank_out)
        fused = one if fused is None else fused.join(one, id_out, "full_outer")
    assert fused is not None, "rrf_fuse needs at least one ranked list"
    score = None
    for rc in rank_cols:
        addend = F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rc)), F.lit(0.0)
        )
        score = addend if score is None else score + addend
    return (
        fused.withColumn(
            score_out, F.floor(score * 1000000 + F.lit(0.5)) / 1000000
        )
        .orderBy(F.desc(score_out), F.asc(id_out))
        .limit(top_k)
    )
