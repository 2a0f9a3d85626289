"""Scale a testdata fixture N× with cross-table key consistency — the
local stand-in for a bigger driver-generated SF, used by
tools/scale_check.py to measure how per-query cost scales with data.

Each copy ``i`` shifts every key domain by ``i * (max_key + 1)`` so
foreign keys stay valid (orders still join customers, lineitem still
joins orders/part/supplier) and uniqueness holds (no duplicate
event_ids to be deduped away). Dimension tables (region, nation) stay
fixed — dims don't scale with fact volume. Content columns are
perturbed per copy where replication would create a pathological
corpus rather than a bigger one:

- ``documents.text``: every token gets a per-copy suffix, so copies
  are NOT near-duplicates of each other (verbatim replication would
  make every doc a 10-way near-dup cluster and the LSH candidate set
  would grow quadratically by construction, not by data size);
- ``embeddings.embedding``: rotated by ``i`` positions (norm-
  preserving; cross-copy cosine drops to noise instead of 1.0).

Timestamps are left unchanged: a time window then holds N× the rows,
which is exactly the density growth a larger SF would bring.

Usage: python tools/scale_fixture.py <src_sf_dir> <dest_dir> <factor>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_lakehouse_spark.session import get_spark  # noqa: E402

#: key columns per table, grouped by shared domain
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

DIMS = ["region", "nation"]
FACTS = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _copy_df(df: DataFrame, table: str, i: int, offsets: dict) -> DataFrame:
    for domain, cols in KEY_DOMAINS.items():
        for t, c in cols:
            if t == table:
                df = df.withColumn(c, F.col(c) + F.lit(i * offsets[domain]))
    if table == "documents" and i > 0:
        df = df.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1~{i}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and i > 0:
        # rotate by i mod dim (norm-preserving); once the rotations
        # wrap (factor > dim), negate the wrapped generation so copy
        # i and copy i-dim read cosine ≈ -1, not 1 — replication must
        # not manufacture cross-copy near-duplicates
        n = "size(embedding)"
        r = f"({i} % {n})"
        df = df.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, {r} + 1, {n} - {r}), "
                f"slice(embedding, 1, {r}))"
            ),
        )
        if i >= 2:  # generation = i // dim; dim is data-dependent, so
            # negate when the expr says this copy wrapped an odd
            # number of times
            df = df.withColumn(
                "embedding",
                F.expr(
                    f"CASE WHEN ({i} div {n}) % 2 = 1 "
                    "THEN transform(embedding, x -> -x) "
                    "ELSE embedding END"
                ),
            )
    return df


def main() -> None:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("scale-fixture")
    os.makedirs(dest, exist_ok=True)

    offsets = {}
    for domain, cols in KEY_DOMAINS.items():
        t, c = cols[0]
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        offsets[domain] = int(
            df.agg(F.max(F.col(c)).cast("long")).first()[0]
        ) + 1
    print(f"key offsets: {offsets}", file=sys.stderr)

    for t in DIMS:
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dest, f"{t}.parquet"))

    for t in FACTS:
        base = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        out = None
        for i in range(factor):
            c = _copy_df(base, t, i, offsets)
            out = c if out is None else out.unionByName(c)
        # ~factor× the source's file count keeps per-file sizes stable
        out.repartition(
            max(4, base.rdd.getNumPartitions() * factor // 2)
        ).write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
        print(f"scaled {t} ×{factor}", file=sys.stderr)
    print(f"done: {dest}")


if __name__ == "__main__":
    main()
