"""Property-style parity tests for the determinism contract.

The whole oracle-correctness story rests on a handful of shared
formulas (half-up rounding, bucket boundaries, quantization math,
shingle windows) producing BIT-identical results on Spark and DuckDB.
These tests hammer each formula with seeded random values plus the
exact boundary grid where engines could disagree, batched as ONE
DataFrame per property (a per-example round-trip would cost a Spark
job each).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import numpy as np

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lakehouse_spark.functions.scalars import round_half_up  # noqa: E402

RNG = np.random.default_rng(20260814)


def test_round_half_up_matches_duckdb_formula(spark):
    # random magnitudes across 12 decades, negatives, and exact .xx5
    # boundaries (the values bare ROUND disagrees on)
    vals = list((RNG.random(500) - 0.5) * np.logspace(-6, 6, 500))
    vals += [x + 0.005 for x in np.arange(0, 2, 0.01)]
    vals += [-x for x in vals[:200]]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [
        r["r"]
        for r in df.select(round_half_up("x", 2).alias("r"))
        .orderBy("x")
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = [
        r[0]
        for r in con.execute(
            "SELECT floor(x * 100 + 0.5) / 100 FROM t ORDER BY x"
        ).fetchall()
    ]
    assert got == want  # bit-exact, including negatives


def test_price_bucket_and_time_of_day_boundaries(spark):
    # the exact left-closed boundary grid plus random fill
    prices = [None, -0.01, 0.0, 49.99, 50.0, 99.99, 100.0, 199.99, 200.0,
              499.99, 500.0, 500.01] + [float(x) for x in RNG.random(200) * 600]
    hours = list(range(24))
    rows = [
        (i, p, hours[i % 24])
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, "id bigint, value double, h int")
    bucket = (
        F.when(F.col("value").isNull(), "UNKNOWN")
        .when(F.col("value") < 50, "0-50")
        .when(F.col("value") < 100, "50-100")
        .when(F.col("value") < 200, "100-200")
        .when(F.col("value") < 500, "200-500")
        .otherwise("500+")
    )
    tod = (
        F.when((F.col("h") >= 6) & (F.col("h") < 12), "MORNING")
        .when((F.col("h") >= 12) & (F.col("h") < 18), "AFTERNOON")
        .when((F.col("h") >= 18) & (F.col("h") < 22), "EVENING")
        .otherwise("NIGHT")
    )
    got = {
        r["id"]: (r["b"], r["t"])
        for r in df.select("id", bucket.alias("b"), tod.alias("t")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT id,
                CASE WHEN value IS NULL THEN 'UNKNOWN'
                     WHEN value < 50 THEN '0-50'
                     WHEN value < 100 THEN '50-100'
                     WHEN value < 200 THEN '100-200'
                     WHEN value < 500 THEN '200-500'
                     ELSE '500+' END,
                CASE WHEN h >= 6 AND h < 12 THEN 'MORNING'
                     WHEN h >= 12 AND h < 18 THEN 'AFTERNOON'
                     WHEN h >= 18 AND h < 22 THEN 'EVENING'
                     ELSE 'NIGHT' END
            FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_int8_quantization_math_matches_duckdb(spark):
    # random vectors + degenerate constant vectors (scale = 0 guard)
    vecs = [[float(x) for x in RNG.normal(size=16)] for _ in range(80)]
    vecs += [[1.5] * 16, [0.0] * 16, [-2.25] * 16]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, e array<double>"
    )
    mn, mx = F.array_min("e"), F.array_max("e")
    scale = F.when(mx == mn, F.lit(0.0)).otherwise((mx - mn) / 255.0)
    b = df.select("vec_id", "e", mn.alias("mn"), mx.alias("mx"), scale.alias("s"))
    q = F.when(
        F.col("mx") == F.col("mn"),
        F.transform("e", lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            "e",
            lambda x: F.floor((x - F.col("mn")) / F.col("s") + F.lit(0.5)).cast(
                "bigint"
            ),
        )
    )
    got = {r["vec_id"]: r["q"] for r in b.select("vec_id", q.alias("q")).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            """
            WITH b AS (
                SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx
                FROM t
            )
            SELECT vec_id,
                CASE WHEN mx = mn
                     THEN list_transform(e, x -> CAST(0 AS BIGINT))
                     ELSE list_transform(e, x ->
                        CAST(floor((x - mn) / ((mx - mn) / 255.0) + 0.5)
                             AS BIGINT)) END
            FROM b
            """
        ).fetchall()
    }
    for k in got:
        assert list(got[k]) == list(want[k]), k
    # every code is an int8 code point
    assert all(0 <= c <= 255 for v in got.values() for c in v)


def test_shingle_windows_match_duckdb(spark):
    """dedup's n-gram window indexing == the oracle's list_transform
    slice for every token count around the window size (0..8 tokens,
    n=3), including repeated tokens (distinct semantics)."""
    from data_lakehouse_spark.operators.dedup import _shingle_df

    texts = ["", "a", "a b", "a b c", "a b c d", "a a a a",
             "x y x y x", "p q r s t u v w"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    sh = _shingle_df(df, "text", "doc_id", 3)
    got = {
        r["doc_id"]: sorted(r["_sh"]) for r in sh.collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: sorted(r[1])
        for r in con.execute(
            """
            SELECT doc_id,
                list_distinct(list_transform(
                    range(0, greatest(len(toks) - 3, 0) + 1),
                    i -> array_to_string(toks[i + 1:i + 3], ' ')))
            FROM (SELECT doc_id,
                         string_split(trim(regexp_replace(lower(text),
                             '\\s+', ' ', 'g')), ' ') AS toks
                  FROM t)
            """
        ).fetchall()
    }
    assert got == want


def test_half_up_rounding_formula_is_floorlike_for_negatives():
    """Document the contract: the shared formula rounds half toward
    +inf for negatives (NOT half-away-from-zero), identically on any
    IEEE engine — pure-python reference check."""
    f = lambda x: math.floor(x * 100 + 0.5) / 100  # noqa: E731
    assert f(-1.005) == -1.0
    assert f(-1.006) == -1.01
    # 1.005 the double is 1.00499999…, so the formula yields 1.0 — the
    # exact case where decimal-string ROUND implementations answer 1.01
    # instead. Pinning it documents why BOTH engines must use this one
    # formula rather than their native ROUND.
    assert f(1.005) == 1.0
    assert f(1.0150000000000001) == 1.02


def test_scrub_duplicate_spans_matches_naive_reference(spark):
    """Randomized docs from a tiny vocabulary (forcing frequent span
    collisions) scrubbed by the distributed operator must equal a
    naive O(corpus²) Python reference, including full-scrub and
    short-doc edges."""
    from collections import Counter

    from data_lakehouse_spark.operators.corpus import scrub_duplicate_spans

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(6)]
    n = 4  # span_tokens small so collisions are common
    docs = []
    for i in range(40):
        ln = int(rng.integers(0, 12))
        docs.append((i, " ".join(rng.choice(vocab, ln))))
    docs.append((98, ""))     # empty
    docs.append((99, None))   # NULL text

    # naive reference
    toks = {d: (t.split() if t else []) for d, t in docs}
    counts = Counter(
        " ".join(tk[i : i + n])
        for tk in toks.values()
        for i in range(max(len(tk) - n + 1, 0))
    )
    expect = {}
    for d, tk in toks.items():
        covered = set()
        for i in range(max(len(tk) - n + 1, 0)):
            if counts[" ".join(tk[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        expect[d] = (len(tk), len(tk) - len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_text"])
        for r in scrub_duplicate_spans(df, span_tokens=n).collect()
    }
    assert got == expect
