"""Second-decade scaling evidence (r10 verdict ask #2).

One 10x step (SCALING.md's 152-query table) is a single data point:
regime cliffs — spill thresholds, broadcast-to-shuffle flips, driver
residue guards — often appear only at the NEXT decade. This tool runs
a bounded flagship subset (the 7 reference gold marts, silver_events,
the sub-quadratic near-dup pipeline, the training-chunk pipeline and
TPC-H q21) at 1x / 10x / 100x of the sf0.1 fixture under the round-10
bench methodology — interleaved passes, min-of-N with a 4-rep floor,
the constant control workload sampled per (pass, scale) so each
scale's floor normalizes out host drift — and reports BOTH decade
ratios per query. The regime-cliff signature is a second-step ratio
materially above the first-step ratio; anything flagged gets a note
or a fix, not a shrug.

Fixtures come from tools/scale_fixture.py (key-consistent copies:
joins stay valid, documents/embeddings are perturbed per copy so
replication does not manufacture near-duplicates).

Usage:
  python tools/scale_decades.py [--work /tmp/dls_decades] [--reps 4]
      [--json SCALING_DECADES.json]

Writes the JSON next to the repo root and prints a markdown table to
stdout (pasted into SCALING.md's second-decade section).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from data_lakehouse_spark.session import get_spark  # noqa: E402

#: the bounded flagship subset (verdict r10 ask #2)
SUBSET = [
    "silver_events",
    "gold_daily_sales_summary",
    "gold_product_performance",
    "gold_user_rfm_segments",
    "gold_user_journey_funnel",
    "gold_conversion_funnel_daily",
    "gold_hourly_traffic",
    "gold_category_performance",
    "near_dup_pipeline",
    "training_chunks_pipeline",
    "tpch_q21_waiting_suppliers",
]

BASE = "/root/testdata/sf0.1"


def ensure_fixture(work: str, factor: int) -> str:
    dest = os.path.join(work, f"sf0.1x{factor}")
    marker = os.path.join(dest, "_COMPLETE")
    if os.path.exists(marker):
        return dest
    print(f"building {factor}x fixture at {dest} ...", file=sys.stderr)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "scale_fixture.py"),
         BASE, dest, str(factor)],
        check=True,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return dest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/dls_decades")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--json", default=os.path.join(ROOT, "SCALING_DECADES.json")
    )
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    scales = {
        1: BASE,
        10: ensure_fixture(args.work, 10),
        100: ensure_fixture(args.work, 100),
    }

    import __spark_entry__ as entrymod

    spark = get_spark("scale-decades")
    queries = entrymod.queries()
    missing = [q for q in SUBSET if q not in queries]
    if missing:
        raise SystemExit(f"subset queries missing from entry: {missing}")

    # the bench control job: constant cost by construction — its floor
    # per scale-run window normalizes host drift out of the ratios
    def control() -> float:
        t0 = time.time()
        spark.range(200_000_000).selectExpr(
            "avg(cast(xxhash64(id) as double)) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up: JIT, parquet footers, Arrow daemons (bench.py's recipe)
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for sf_dir in scales.values():
        queries["silver_events"](spark, sf_dir).limit(1).count()
    control()  # JIT-cold control sample discarded

    samples: dict[tuple[str, int], list[float]] = {}
    ctl: dict[int, list[float]] = {f: [] for f in scales}
    for rep in range(args.reps):
        for factor, sf_dir in scales.items():
            ctl[factor].append(control())
            order = list(SUBSET)
            random.Random(rep).shuffle(order)
            for name in order:
                t0 = time.time()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dur = round(time.time() - t0, 3)
                samples.setdefault((name, factor), []).append(dur)
                print(
                    f"pass {rep + 1} {factor:>3}x {name}: {dur:.2f}s",
                    file=sys.stderr,
                )
            ctl[factor].append(control())

    # p25 control floor per scale (bench.py's idle-floor rule)
    def p25(xs: list[float]) -> float:
        s = sorted(xs)
        return s[max(0, len(s) // 4)]

    floors = {f: p25(v) for f, v in ctl.items()}
    ref = floors[1]
    out = {
        "base": BASE,
        "reps": args.reps,
        "control_floors_sec": {str(f): round(v, 3) for f, v in floors.items()},
        "queries": {},
    }
    rows = []
    for name in SUBSET:
        t = {
            f: min(samples[(name, f)]) / (floors[f] / ref)
            for f in scales
        }
        spread = {
            f: (max(samples[(name, f)]) - min(samples[(name, f)]))
            / max(min(samples[(name, f)]), 1e-9)
            for f in scales
        }
        r1 = t[10] / max(t[1], 1e-9)
        r2 = t[100] / max(t[10], 1e-9)
        cliff = r2 > max(1.5 * r1, r1 + 1.0)
        out["queries"][name] = {
            "sec": {str(f): round(t[f], 3) for f in scales},
            "spread_pct": {
                str(f): round(100 * spread[f], 1) for f in scales
            },
            "step1_ratio_10x": round(r1, 2),
            "step2_ratio_10x": round(r2, 2),
            "cliff_flag": cliff,
        }
        rows.append((name, t, r1, r2, cliff))

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| query | sec @1x | @10x | @100x | step1 | step2 | cliff? |")
    print("|---|---|---|---|---|---|---|")
    for name, t, r1, r2, cliff in sorted(
        rows, key=lambda r: -r[3]
    ):
        print(
            f"| {name} | {t[1]:.2f} | {t[10]:.2f} | {t[100]:.2f} "
            f"| {r1:.1f}x | {r2:.1f}x | {'FLAG' if cliff else ''} |"
        )
    print(
        f"\ncontrol floors (s): "
        + ", ".join(f"{f}x={floors[f]:.3f}" for f in scales)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
