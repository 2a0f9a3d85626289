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
    "embedding_dedup_canonical",
    "ann_ivf_topk",
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

    Broadcast-matmul shape: the scan side streams through Arrow-batched
    ``mapInPandas`` while the comparison side is one broadcast numpy
    matrix — each batch is a single float64 GEMM instead of per-pair
    expression evaluation (~100× over a nested-loop join with
    higher-order-function cosine). The broadcast side must fit in
    executor memory (id + unit vector per row); beyond that, use
    LSH/IVF bucketing (``ann_lsh_topk``) so the n² never materializes.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    side = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).collect()
    b_ids = np.array([r["id"] for r in side], dtype=np.int64)
    b_mat = np.array([list(r["v"]) for r in side], dtype=np.float64)
    b_norm = np.linalg.norm(b_mat, axis=1)
    b_norm[b_norm == 0] = np.nan  # zero-norm → sim NULL → filtered out
    bc = spark.sparkContext.broadcast((b_ids, b_mat, b_norm))

    t = float(threshold)

    def gen(batches):
        ids_b, mat_b, norm_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf["id"].to_numpy(dtype=np.int64)
            a_mat = np.array([list(v) for v in pdf["v"]], dtype=np.float64)
            a_norm = np.linalg.norm(a_mat, axis=1)
            a_norm[a_norm == 0] = np.nan
            # dot / (|a|·|b|): same formula shape as the SQL oracle
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = (a_mat @ mat_b.T) / (a_norm[:, None] * norm_b[None, :])
                mask = (sims >= t) & (ids_b[None, :] > a_ids[:, None])
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": ids_b[bi],
                    "cosine_sim": sims[ai, bi],
                }
            )

    src = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    )
    return src.mapInPandas(
        gen, "id_a bigint, id_b bigint, cosine_sim double"
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


def embedding_dedup_canonical(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup dedup: map every vector to the minimum
    id among itself and its ≥-threshold cosine neighbors.

    One union-find-free single hop (A→min neighbor) — the standard
    first-pass cluster collapse for near-dup removal; iterate to a fixed
    point for full transitive closure if needed. ``pairs`` lets the
    caller supply LSH-bucketed candidates at scale; defaults to the
    exact pair join (correctness baseline).

    Returns (vec_id, canonical_id, is_duplicate).
    """
    if pairs is None:
        pairs = cosine_pairs_above(
            df, vec_col=vec_col, id_col=id_col, threshold=threshold
        )
    else:
        pairs = pairs.filter(F.col("cosine_sim") >= threshold)
    sym = pairs.select(
        F.col("id_a").alias("vid"), F.col("id_b").alias("nb")
    ).unionByName(pairs.select(F.col("id_b").alias("vid"), F.col("id_a").alias("nb")))
    min_nb = sym.groupBy("vid").agg(F.min("nb").alias("min_nb"))
    return (
        df.select(F.col(id_col).cast("bigint").alias("vec_id"))
        .join(min_nb, F.col("vec_id") == F.col("vid"), "left")
        .select(
            "vec_id",
            F.least(F.col("vec_id"), F.coalesce("min_nb", F.col("vec_id"))).alias(
                "canonical_id"
            ),
        )
        .withColumn("is_duplicate", F.col("canonical_id") != F.col("vec_id"))
    )


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 20,
    num_planes: int = 6,
    seed: int = 7,
    probe_hamming: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: coarse ``ivf_bucket`` assignment
    (the write-time partition key of an index table), probe the query's
    bucket ± ``probe_hamming`` bit flips, exact cosine re-rank inside.

    With the index table partitioned by bucket this becomes a
    partition-pruned scan of ~(1+planes)/2^planes of the data."""
    dim = len(query_vec)
    bucket = ivf_bucket(F.col(vec_col), dim, num_planes=num_planes, seed=seed)

    qsig = 0
    for p in range(num_planes):
        plane = _plane(dim, p, seed)
        dot = sum(float(a) * b for a, b in zip(query_vec, plane))
        if dot >= 0:
            qsig |= 1 << p
    probe = {qsig}
    if probe_hamming >= 1:
        for p in range(num_planes):
            probe.add(qsig ^ (1 << p))

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket").isin(*[int(s) for s in probe]))
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
