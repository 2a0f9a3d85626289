"""Skew stress: pathological key/bucket distributions must stay
work-bounded — the failure mode that kills 100 TB jobs is not wrong
answers but one reducer receiving the whole hot key (or one LSH bucket
going n²).

Assertions are on WORK BOUNDS (rows per reducer, candidate-pair
counts), not wall-clock: local[4] timings are noise, but the row/pair
distribution is exactly what determines the straggler at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_spark.operators import dedup, relational

N_ROWS = 20_000
HOT_FRACTION = 0.9  # 90% of fact rows on one key


def _skewed_fact(spark):
    """20k rows, 90% on key 0, the rest uniform over 1..99."""
    return spark.range(N_ROWS).select(
        F.when(
            F.col("id") < int(N_ROWS * HOT_FRACTION), F.lit(0)
        ).otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .cast("long").alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_and_spreads_hot_key(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    salted = relational.salted_join(fact, dim, ["k"], salt=8).agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])

    # the work-bound: under (k, _salt) distribution the hot key's rows
    # spread across ~salt reducers instead of one. Measure the actual
    # max-reducer share by hashing the salted shuffle key the way the
    # exchange would.
    salt = 8
    salted_key_rows = (
        fact.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                   F.lit(salt)).cast("int"),
        )
        .groupBy("k", "_salt")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()["mx"]
    )
    unsalted_max = (
        fact.groupBy("k").count().agg(F.max("count").alias("mx")).first()["mx"]
    )
    assert unsalted_max >= N_ROWS * HOT_FRACTION  # the skew is real
    # largest single reducer unit shrinks by ~salt (allow 2x slack for
    # hash imbalance)
    assert salted_key_rows <= unsalted_max / salt * 2


def test_lsh_hot_bucket_stays_bounded(spark):
    """One band bucket holding 10% of docs (2k identical texts among
    20k) must NOT produce the ~2M-pair clique: max_bucket_size drops
    the degenerate bucket, keeping candidate count linear-ish, while
    the uniform corpus is unaffected by the cap."""
    n, hot = 2_000, 200  # 10% of docs share one text
    # every token id-derived => shingle sets are disjoint across docs
    uniq = spark.range(n - hot).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{p}_"), F.col("id") * p + F.lit(p))
                for p in (3, 7, 11, 13, 17, 19, 23, 29)
            ],
        ).alias("text"),
    )
    dups = spark.range(n - hot, n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the exact same viral boilerplate text repeated verbatim "
            "across the whole mirror set of pages again and again"
        ).alias("text"),
    )
    corpus = uniq.unionByName(dups)

    capped = dedup.minhash_lsh_candidates(
        corpus, bands=8, num_hashes=32, max_bucket_size=50
    )
    n_capped = capped.count()
    # the clique alone would be hot*(hot-1)/2 = 19900 pairs per band;
    # the cap keeps the total at least an order of magnitude below it
    clique_pairs = hot * (hot - 1) // 2
    assert n_capped < clique_pairs / 10

    # and the cap is surgical: a uniform corpus yields IDENTICAL
    # candidates with and without it
    uni_capped = dedup.minhash_lsh_candidates(
        uniq, bands=8, num_hashes=32, max_bucket_size=50
    ).count()
    uni_uncapped = dedup.minhash_lsh_candidates(
        uniq, bands=8, num_hashes=32, max_bucket_size=None
    ).count()
    assert uni_capped == uni_uncapped


def test_skewed_groupby_partial_agg_bounds_shuffle(spark):
    """A 90%-hot-key groupBy must partial-aggregate map-side: the
    shuffle then carries O(distinct keys × maps), not O(rows). Checked
    on the PLAN (partial_count before the exchange), the property that
    holds at any scale."""
    fact = _skewed_fact(spark)
    agg = fact.groupBy("k").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    first_agg = plan.find("partial_count")
    exchange = plan.find("Exchange")
    assert first_agg != -1 and exchange != -1
    # partial aggregate sits BELOW the exchange in the printed tree
    # (printed top-down: Exchange line appears before the partial agg)
    assert exchange < first_agg
    got = {r["k"]: r["n"] for r in agg.collect()}
    assert got[0] == int(N_ROWS * HOT_FRACTION)
