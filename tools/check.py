"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column set,
and the order-insensitive multiset of values (exact equality — stricter
than any hash).

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # normalize bytes/None representations
            df[c] = s.map(lambda v: None if pd.isna(v) else v)
        elif str(s.dtype).startswith(("float", "Float")):
            df[c] = s.astype("float64")
        elif str(s.dtype).startswith(("int", "Int", "uint")):
            df[c] = s.astype("Int64")
        elif str(s.dtype).startswith("bool"):
            df[c] = s.astype("boolean")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if set(spark_df.columns) != set(duck_df.columns):
        problems.append(
            f"columns differ: spark-only={set(spark_df.columns) - set(duck_df.columns)}"
            f" duck-only={set(duck_df.columns) - set(spark_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            sa, sb = a[c], b[c]
            if str(sa.dtype) == "float64":
                import numpy as np

                neq = ~(
                    (sa.isna() & sb.isna())
                    | np.isclose(
                        sa.fillna(0), sb.fillna(0), rtol=0, atol=0, equal_nan=True
                    )
                )
            else:
                neq = ~((sa.isna() & sb.isna()) | (sa == sb))
            n_bad = int(neq.sum())
            if n_bad:
                idx = neq[neq].index[:3]
                problems.append(
                    f"col {c}: {n_bad} mismatched values, e.g. "
                    f"spark={list(sa[idx])} duck={list(sb[idx])}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
