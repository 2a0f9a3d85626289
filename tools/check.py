"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column set,
and the order-insensitive multiset of values (exact equality — stricter
than any hash).

Usage: python tools/check.py [sf_dir] [query_name ...]

A machine-readable summary lands in CHECK_SUMMARY.json next to this
repo's root on every FULL sweep (per-query status + the ok/skip/fail
split), so a reviewer can read the gate result without re-running it.
"""

from __future__ import annotations

import json
import os
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
    statuses: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            statuses[name] = {"status": "fail", "error": str(e)[:200]}
            failures += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            statuses[name] = {"status": "skip_no_oracle", "rows": len(sdf)}
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            statuses[name] = {"status": "fail", "error": str(e)[:200]}
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print(f"      {p}")
            statuses[name] = {"status": "fail", "problems": problems[:5]}
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            statuses[name] = {"status": "ok", "rows": len(sdf)}
    print("failures:", failures)
    if not only:  # full sweep: persist the gate result for reviewers
        by = {"ok": 0, "skip_no_oracle": 0, "fail": 0}
        for v in statuses.values():
            by[v["status"]] += 1
        summary = {
            "sf_dir": sf_dir,
            "ran_at": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
            "n_queries": len(statuses),
            "counts": by,
            "failures": failures,
            "queries": statuses,
        }
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CHECK_SUMMARY.json",
        )
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"summary: {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
