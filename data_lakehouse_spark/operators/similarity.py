"""Similarity search over embedding columns (``array<float>``).

- brute-force top-k / threshold join: JVM-side higher-order-function
  cosine (functions/vectors.py) — the exact baseline. O(n·q) dot
  products; at 100 TB this is the verification path, not the scan path.
- LSH-bucketed ANN: random-hyperplane signatures (sign of dot with k
  deterministic pseudo-random planes) → candidates share a bucket →
  exact cosine re-rank within buckets. Shuffle is O(n) bucket keys;
  the n² blowup is confined to buckets.
- IVF-style variant: coarse k-means-free bucketing on leading signature
  bits doubles as a partition key for writing an "index" table that
  later queries can partition-prune.

Planes are generated from a fixed seed via xxhash64 folds so the
"index" is reproducible without storing state.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.vectors import cosine_similarity

__all__ = [
    "cosine_topk",
    "cosine_pairs_above",
    "random_hyperplane_signature",
    "ann_lsh_topk",
]


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 20,
) -> DataFrame:
    """Exact brute-force top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.select(F.col(id_col).cast("bigint").alias(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs_above(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact similarity self-join: all (a,b) pairs with cosine ≥ t.

    Full cross product — use only as the correctness oracle or within
    LSH buckets; ``ann_lsh_topk`` is the scale path.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            "cosine_sim",
        )
    )


def _plane(dim: int, plane_idx: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane: component c is a hash of
    (seed, plane_idx, c) mapped to [-1, 1). Reproducible everywhere."""
    out = []
    for c in range(dim):
        h = hash((seed, plane_idx, c)) & 0xFFFFFFFF
        out.append((h / 2**31) - 1.0)
    return out


def random_hyperplane_signature(
    vec: Column, dim: int, *, num_planes: int = 16, seed: int = 42
) -> Column:
    """LSH signature: integer whose bit p = sign(vec · plane_p)."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _plane(dim, p, seed)
        prods = F.zip_with(
            vec,
            F.array(*[F.lit(x) for x in plane]),
            lambda a, b: a.cast("double") * b,
        )
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(dot >= 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 20,
    num_planes: int = 12,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates from the query's LSH bucket (plus
    buckets within ``probe_hamming`` bit flips), exact cosine re-rank.

    At scale the signature is a partition/sort key on the stored index
    table, so candidate selection is a partition-pruned scan, not a
    full pass.
    """
    dim = len(query_vec)
    sig_col = random_hyperplane_signature(F.col(vec_col), dim, num_planes=num_planes, seed=seed)

    # query signature computed driver-side with identical arithmetic
    qsig = 0
    for p in range(num_planes):
        plane = _plane(dim, p, seed)
        dot = 0.0
        for a, b in zip(query_vec, plane):
            dot = dot + float(a) * b
        if dot >= 0:
            qsig |= 1 << p
    probe = {qsig}
    if probe_hamming >= 1:
        for p in range(num_planes):
            probe.add(qsig ^ (1 << p))

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.withColumn("_sig", sig_col)
        .filter(F.col("_sig").isin(*[int(s) for s in probe]))
        .select(F.col(id_col).cast("bigint").alias(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_bucket(vec: Column, dim: int, *, num_planes: int = 6, seed: int = 7) -> Column:
    """Coarse IVF-style bucket id (64 buckets by default) — intended as
    a write-time partition key for an embedding index table."""
    return random_hyperplane_signature(vec, dim, num_planes=num_planes, seed=seed)


def exact_recall_at_k(approx: DataFrame, exact: DataFrame, id_col: str = "vec_id") -> float:
    """Recall@k of an ANN result against the exact top-k (test helper)."""
    a = {r[0] for r in approx.select(id_col).collect()}
    e = {r[0] for r in exact.select(id_col).collect()}
    return len(a & e) / max(len(e), 1)
