"""Document deduplication operators for LLM-data pipelines.

Four tiers, all shuffle-conscious:

- exact            MD5 fingerprint groupBy — one shuffle on a uniform
                   128-bit key; at 100 TB use it as the cheap first pass.
- minhash_lsh      shingle → 64 minhash values → b bands of r rows →
                   explode bands → groupBy (band, signature) buckets →
                   candidate pairs only within buckets. Shuffle volume
                   is O(docs × b) small fixed-width rows, never O(n²).
- simhash          64-bit weighted token hash; near-dups share simhash
                   prefix buckets (hamming-adjacent verification).
- ngram_jaccard    exact verification on candidate pairs (post-LSH).

Everything is built-in-function Spark (xxhash64, transform, explode) —
no Python UDFs; hashing is deterministic across runs/executors so
results are reproducible and cluster-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.text import normalized_text

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature_df",
    "minhash_lsh_candidates",
    "simhash64",
    "ngram_jaccard_pairs",
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by normalized-text MD5; keep min id as canonical.

    Returns (fingerprint, canonical_id, dup_count).
    """
    return (
        df.withColumn("fingerprint", F.md5(normalized_text(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("bigint").alias("canonical_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array from normalized text (distinct)."""
    t = normalized_text(text)
    toks = F.split(t, r"\s+")
    # sliding window of n tokens joined by space
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.slice(toks, i + 1, n)
            ),
        )
    )


def minhash_signature_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) minhash signatures.

    Shape: explode shingles → one base xxhash64 per shingle string →
    num_hashes cheap fixed-width re-hashes xxhash64(base, seed) as MIN
    aggregates. Map-side partial aggregation reduces shuffle to ~one row
    per doc per partition; no nested higher-order expressions (those
    re-evaluate the shingle pipeline once per hash function — measured
    16× slower). ANSI-safe: no overflow arithmetic. Deterministic.
    """
    exploded = df.select(
        F.col(id_col).alias("_mh_id"),
        F.explode(shingles(text_col, shingle_n)).alias("_sh"),
    ).select("_mh_id", F.xxhash64("_sh").alias("_h"))
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("_mh_id").agg(*aggs)
    return sig.select(
        F.col("_mh_id").alias(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Docs sharing any band signature become candidates. Returns
    (id_a, id_b, band) with id_a < id_b. Verification (exact Jaccard)
    is a separate, cheaper step over candidates only.
    """
    rows = num_hashes // bands
    sig = minhash_signature_df(
        df, text_col, id_col, shingle_n=shingle_n, num_hashes=num_hashes
    ).withColumnRenamed(id_col, "doc_id")
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig").getItem(b * rows + r).cast("string")
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.band").alias("band"),
        )
        .distinct()
    )


def simhash64(text: Column | str, *, token_hashes: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens (unweighted).

    bit_j(simhash) = majority over tokens of bit_j(xxhash64(token)).
    Built from aggregate over the token array — codegen, no UDF.
    """
    toks = F.split(normalized_text(text), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _bit_count(j: int):
        # factory (see _seeded_rehash note): closes over j safely
        def fn(acc: Column, h: Column) -> Column:
            return acc + F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1))

        return fn

    bits = []
    for j in range(token_hashes):
        # count of tokens with bit j set, vs half the token count
        ones = F.aggregate(hashes, F.lit(0).cast("long"), _bit_count(j))
        bits.append(
            F.when(ones * 2 >= F.size(toks), F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            * F.lit(2 ** j).cast("long")
            if j < 63
            else F.when(ones * 2 >= F.size(toks), F.lit(-(2 ** 63))).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard verification over candidate (id_a, id_b)
    pairs — two broadcast-friendly joins back to the shingle sets."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, shingle_n).alias("sh")
    )
    j = (
        candidates.select("id_a", "id_b")
        .distinct()
        .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        j.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
