"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Execution is forced with the noop sink (full materialization, no driver
collect). The quadratic embedding_similar_pairs oracle query is excluded
(it's the correctness baseline for the LSH path, not a scale query);
ann_lsh_topk covers similarity at bench scale.
"""

from __future__ import annotations

import json
import os
import random
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402

#: Queries EXCLUDED from the bench, with the reason logged at runtime.
#: Everything else in ``queries()`` is timed — derived dynamically so a
#: newly added query can never be silently dropped from the bench.
BENCH_EXCLUDED = {
    "embedding_similar_pairs": (
        "quadratic exact-pair oracle for the LSH path; "
        "dedup_embedding_cosine + minhash_lsh_candidates cover similarity "
        "at bench scale"
    ),
    "matview_ivm": (
        "IVM SCENARIO (tmp catalog build + matview create + append + "
        "MOR delete + two refreshes) — timing measures catalog write "
        "churn, not a read query; the oracle gate verifies "
        "refresh-equals-recompute end-to-end"
    ),
    "matview_ivm_join": (
        "delta-join IVM SCENARIO (tmp catalog build + join matview + "
        "two-sided appends/deletes/updates + two refreshes) — same "
        "write-churn shape as matview_ivm; the oracle gate verifies "
        "refresh-equals-recompute end-to-end"
    ),
    "delta_column_mapping_roundtrip": (
        "column-mapping interop SCENARIO (action-by-action mapped "
        "Delta write + rename commit + two log replays) — timing "
        "measures tmp-dir export writes, not a read query; the oracle "
        "gate verifies physical->logical resolution end-to-end"
    ),
    "iceberg_pos_delete_roundtrip": (
        "position-delete interop SCENARIO (catalog build + MOR delete "
        "+ zero-copy export with content=1 re-encode + spec-reader "
        "read) — timing measures tmp-dir catalog/manifest writes, not "
        "a read query; the oracle gate verifies survivors end-to-end"
    ),
    "delta_history_roundtrip": (
        "multi-commit export SCENARIO (catalog build + append + COW "
        "delete + history export + two log replays) — timing measures "
        "tmp-dir catalog writes, not a read query; the oracle gate "
        "verifies it end-to-end"
    ),
    "delta_dv_roundtrip": (
        "deletion-vector interop SCENARIO (catalog build + Delta "
        "export + per-file DV sidecar writes + two log replays) — "
        "timing measures tmp-dir export/sidecar writes, not a read "
        "query; the oracle gate verifies the filtered rendering "
        "end-to-end"
    ),
    "stream_cdf_nation": (
        "streaming SCENARIO (CDF twin of stream_source_nation): fixed "
        "StreamingQuery lifecycle overhead, not read cost; oracle gate "
        "verifies insert+delete images end-to-end"
    ),
    "stream_source_nation": (
        "streaming SCENARIO: a full StreamingQuery lifecycle (source "
        "registration, microbatch planning, checkpoint+sink commit) "
        "whose fixed ~10s overhead is startup cost, not query cost; "
        "the oracle gate verifies rows+provenance end-to-end"
    ),
    "corpus_bpe_token_stats": (
        "iterative TRAINING scenario (12 distributed merge rounds over "
        "the word table before the one-scan encode) — timing measures "
        "the trainer loop's fixed per-round job overhead at toy scale, "
        "not query cost; tests/test_bpe.py pins trainer+encoder "
        "bit-for-bit against a pure-Python reference"
    ),
    "sql_dml_pipeline": (
        "multi-commit DML SCENARIO (CTAS + UPDATE + MOR DELETE + MERGE "
        "through the SQL front-end) — timing measures tmp-dir catalog "
        "writes, not a read query; the oracle gate verifies the final "
        "state end-to-end"
    ),
    "dbt_models_run": (
        "model-runner SCENARIO (two-batch incremental materialization "
        "into a tmp catalog) — write-path heavy by design; the oracle "
        "gate verifies incremental-equals-recompute end-to-end"
    ),
    "cdc_mart_incremental": (
        "multi-commit DML maintenance SCENARIO (catalog build + append + "
        "MOR delete + incremental refresh), not a read query — timing it "
        "would measure tmp-dir catalog writes; the oracle gate verifies "
        "it end-to-end and tests/test_cdc_mart.py times nothing else"
    ),
    "orders_cdc_upsert": (
        "multi-commit CDC SCENARIO (catalog build + one atomic "
        "eq-delete+append upsert commit) — timing measures tmp-dir "
        "catalog writes, not a read query; the oracle gate verifies the "
        "final state end-to-end (cdc_mart_incremental precedent)"
    ),
    "rag_ingest_pipeline": (
        "RAG-ingest SCENARIO (chunk + embed + per-call tmp-catalog "
        "IVF-PQ index BUILD + probe + in-gate recall assertion) — "
        "timing measures index construction, not probe cost; "
        "ann_ivf_pq_topk times the amortized-index probe"
    ),
    "catalog_maintenance_pipeline": (
        "maintenance SCENARIO (4 appends + MOR delete + CDC upsert + "
        "compact/fold/expire sweep + before/after parity checks) — "
        "timing measures tmp-dir catalog write churn, not a read "
        "query; the oracle gate verifies result-invariance end-to-end"
    ),
    "iceberg_eq_delete_roundtrip": (
        "multi-commit interop SCENARIO (catalog build + equality delete "
        "+ re-append + Iceberg v2 export + spec-reader read) — timing "
        "measures tmp-dir catalog/manifest writes, not a read query; "
        "the oracle gate verifies the survivors end-to-end "
        "(cdc_mart_incremental precedent)"
    ),
}


def attribute_suspects(
    control_samples: list[tuple[float, float]],
    windows: dict[str, list[tuple[float, float]]],
    *,
    sample_thresh: float,
) -> tuple[float, dict[str, bool]]:
    """Window-level disturbance attribution (pure function, pinned in
    tests/test_bench_attribution.py).

    ``control_samples``: (wall offset, duration) of each constant
    control-workload sample, in any order (sorted by offset here — the
    before/after nearest-sample lookup depends on it). ``windows``: per
    query, the (start, end) wall offsets of each rep. The idle floor is
    the p25 control duration, floored at the second-smallest sample
    (min-based floors false-flag on one lucky-low sample, and with <8
    samples a bare p25 index degenerates to exactly that minimum); a
    sample is ELEVATED above ``floor × sample_thresh``; a rep is
    SHADOWED when the nearest control samples on both sides are
    elevated (open-ended windows use the one bounding sample); a query
    is SUSPECT when EVERY rep is shadowed — its min never saw an idle
    host. Returns (floor, {query: suspect})."""
    control_samples = sorted(control_samples)
    durs = sorted(d for _, d in control_samples)
    floor = max(durs[len(durs) // 4], durs[min(1, len(durs) - 1)])

    def _hot(d: float | None) -> bool:
        return d is not None and d > floor * sample_thresh

    def _shadowed(start: float, end: float) -> bool:
        before = [d for off, d in control_samples if off <= start]
        after = [d for off, d in control_samples if off >= end]
        lo = before[-1] if before else None
        hi = after[0] if after else None
        if lo is None:
            return _hot(hi)
        if hi is None:
            return _hot(lo)
        return _hot(lo) and _hot(hi)

    return floor, {
        name: all(_shadowed(s, e) for s, e in ws)
        for name, ws in windows.items()
    }


def _task_time_ms(spark) -> int | None:
    """Total executor task time (ms) so far, via the UI REST API.

    Wall time at sf0.1 is session-floor-bound (median query ~1 s vs a
    ~0.3 s control floor), so per-query WALL cannot show core scaling —
    the delta of this counter across a query's timed window measures
    the work actually parallelized (sum of task durations), which is
    the signal a low-core vs high-core comparison needs. One tiny
    constant-size localhost GET per snapshot; returns None (and the
    bench records no task time) when the UI is disabled."""
    try:
        sc = spark.sparkContext
        url = (
            f"{sc.uiWebUrl}/api/v1/applications/"
            f"{sc.applicationId}/executors"
        )
        with urllib.request.urlopen(url, timeout=5) as r:
            data = json.loads(r.read())
        return sum(int(e.get("totalDuration", 0)) for e in data)
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    queries = entrymod.queries()
    bench_queries = [q for q in queries if q not in BENCH_EXCLUDED]
    for name, reason in BENCH_EXCLUDED.items():
        print(f"bench: skipping {name}: {reason}", file=sys.stderr)

    # Warm the JVM (codegen, JIT, parquet footer cache) AND the Python
    # worker pool (Arrow mapInPandas daemons fork on first use) so
    # per-query timings measure the queries, not first-touch session
    # overhead.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    queries["silver_events"](spark, sf_dir).limit(1).count()
    # Materialize the ANN index up front: the build is a write-time cost
    # (standard index economics), so the timed ann_ivf_topk measures the
    # partition-pruned probe, not index construction.
    entrymod._ann_index_catalog(spark, sf_dir)
    entrymod._kmeans_index_catalog(spark, sf_dir)
    entrymod._pq_index_catalog(spark, sf_dir)
    entrymod._pq_incr_index_catalog(spark, sf_dir)
    entrymod._neardup_index(spark, sf_dir)
    entrymod._events_bloom_catalog(spark, sf_dir)

    # Each query is timed BENCH_REPS times and the MIN is reported: the
    # min over repetitions estimates the true cost of the plan, while
    # any single run can absorb multi-second host-level noise spikes
    # (observed: the same query varying 2.4 s ↔ 15 s across back-to-back
    # runs on an otherwise idle VM). Reps are interleaved across the
    # whole suite — full passes, not back-to-back per query — so a
    # transient spike lands in at most one rep of any given query.
    # 4+ passes ≈ the C2-JIT warm plateau on a freshly booted host
    # (observed: the same plan timing 4.7 → 2.4 → 1.6 → 1.5 s across
    # back-to-back runs after reboot).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    # Floor: every query gets AT LEAST this many reps before the SOFT
    # wall budget is allowed to stop a pass. r8 lesson: the budget cut
    # pass 3 mid-flight and left 14 queries with n_reps=2 exactly where
    # a host disturbance sat, manufacturing the suite's only 2x
    # violation on unchanged code. min-of-2 is not a min; r9 showed
    # min-of-3 leaves burst spreads of 3900% unhedged, so the floor is
    # now 4 (r9 verdict ask #3). Because min_reps overrides the soft
    # budget, total wall time is NOT bounded by SPARK_GRAFT_BENCH_MAX_SEC
    # alone — the HARD ceiling below (2× max_sec of absolute wall,
    # control included) is the last-resort escape that keeps a slow or
    # disturbed host from overrunning a caller timeout.
    min_reps = min(int(os.environ.get("SPARK_GRAFT_BENCH_MIN_REPS", "4")),
                   max(reps, 1))

    # STEAL DETECTOR: a constant control workload (pure JVM codegen,
    # no I/O, fixed input) interleaved through the run. Its cost is
    # invariant by construction, so any spread in its samples is HOST
    # noise (CPU steal, cgroup throttling, a co-tenant build), not the
    # engine. When the control spread exceeds the threshold the run is
    # flagged "disturbed": true in the printed line and bench_full.json
    # — a noisy driver checkpoint then reads as "rerun me", not as a
    # regression (r7: recorded 0.856 s/q vs 0.79-0.88 idle re-runs of
    # the same commit).
    CONTROL_EVERY = 25  # queries between control samples within a pass
    # Each sample is (wall-clock offset from bench_start, duration):
    # the offsets let disturbance be attributed per WINDOW, not just
    # per run — r8's tail-localized host steal passed the whole-run
    # median test while doubling the 14 queries that happened to sit
    # between the two elevated tail samples.
    control_samples: list[tuple[float, float]] = []
    bench_start = time.time()
    control_sec_total = 0.0  # excluded from the wall-budget accounting

    def control(warmup: bool = False) -> None:
        nonlocal control_sec_total
        t0 = time.time()
        # double avg: immune to ANSI long-overflow on the hash sum
        spark.range(200_000_000).selectExpr(
            "avg(cast(xxhash64(id) as double)) as s"
        ).write.format("noop").mode("overwrite").save()
        dur = time.time() - t0
        control_sec_total += dur
        if not warmup:
            control_samples.append(
                (round(t0 - bench_start, 3), round(dur, 3))
            )

    control(warmup=True)  # JIT-cold sample would inflate the spread
    control()  # baseline sample before pass 1
    # Soft wall-clock budget: the first MIN_REPS passes normally
    # complete (min-of-4 for every query, never a truncated tail);
    # extra noise-reduction passes stop once the budget is spent.
    # Control sample time is excluded from the accounting — the
    # detector must not eat the passes it protects. Sized so the
    # 4-pass floor (~150-190 s/pass) fits with total wall staying
    # near the ~900 s envelope prior driver-recorded runs survived —
    # a 5th pass only happens on a fast idle host (r9 verdict ask #3:
    # min n_reps ≥ 4 is the requirement, not pass count).
    max_sec = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_SEC", "850"))
    # HARD absolute ceiling (ADVICE r9): min_reps overrides the soft
    # budget, so on a pathologically slow host the run could otherwise
    # grow without bound; past 2× max_sec of TOTAL wall (control
    # included) the run stops wherever it is — a truncated tail beats a
    # caller-timeout kill that records nothing.
    hard_max_sec = 2.0 * max_sec
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    # (start_offset, end_offset) per rep, for window attribution
    windows: dict[str, list[tuple[float, float]]] = {}
    # per-query executor task-time samples (sec) — scaling evidence
    task_samples: dict[str, list[float]] = {}
    for rep in range(max(reps, 1)):
        # Seeded per-pass shuffle: a localized host steal spreads its
        # damage across different queries each pass instead of landing
        # on the same suite tail every rep (deterministic: seed=rep).
        order = list(bench_queries)
        random.Random(rep).shuffle(order)
        for qi, name in enumerate(order):
            wall = time.time() - bench_start
            budget_spent = wall - control_sec_total
            if wall > hard_max_sec:
                print(
                    f"bench: HARD ceiling {hard_max_sec}s hit; stopping "
                    f"even min_reps (pass {rep + 1}, at {name})",
                    file=sys.stderr,
                )
                break
            if rep >= min_reps and budget_spent > max_sec:
                print(
                    f"bench: wall budget {max_sec}s spent; stopping extra "
                    f"reps (pass {rep + 1}, at {name})",
                    file=sys.stderr,
                )
                break
            if qi and qi % CONTROL_EVERY == 0:
                control()
            fn = queries[name]
            task0 = _task_time_ms(spark)  # outside the timed window
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            task1 = _task_time_ms(spark) if task0 is not None else None
            t = round(t1 - t0, 3)
            timings[name] = min(timings.get(name, t), t)
            samples.setdefault(name, []).append(t)
            windows.setdefault(name, []).append(
                (round(t0 - bench_start, 3), round(t1 - bench_start, 3))
            )
            if task0 is not None and task1 is not None:
                task_samples.setdefault(name, []).append(
                    round((task1 - task0) / 1000.0, 3)
                )
        else:
            control()  # end-of-pass sample
            continue
        break

    # Window attribution (attribute_suspects): a query whose EVERY rep
    # ran between elevated control samples gets suspect=true — its min
    # never saw an idle host, so a regression call on it is unsafe.
    # Idle floor = p25 of the control durations, not the minimum: the
    # control job has ~±20% inherent scheduling jitter, so a single
    # lucky-low sample under a min-based floor false-flags an idle run
    # (observed: min 0.171 vs typical 0.24).
    ctl_durs = [d for _, d in control_samples]
    sample_thresh = 1.0 + float(
        os.environ.get("SPARK_GRAFT_BENCH_SAMPLE_PCT", "40")
    ) / 100.0
    ctl_floor, suspect = attribute_suspects(
        control_samples, windows, sample_thresh=sample_thresh
    )
    elevated = [
        (off, d) for off, d in control_samples if d > ctl_floor * sample_thresh
    ]

    # Per-query noise context: host steal historically moves single
    # samples ±15%+, so a regression call needs the SPREAD next to the
    # min — a query whose min moved less than its own spread is noise,
    # not signal. spread_pct = (max - min) / min over this run's reps.
    def _median(ts: list[float]) -> float:
        s = sorted(ts)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    variance = {
        name: {
            "n_reps": len(ts),
            "min": min(ts),
            # median next to min (r9 verdict ask #3): min estimates the
            # true plan cost; median carries the statistical power a
            # regression call needs when bursts inflate single reps
            "med": round(_median(ts), 3),
            "max": max(ts),
            "spread_pct": round(
                100.0 * (max(ts) - min(ts)) / max(min(ts), 1e-9), 1
            ),
            "suspect": suspect[name],
            # executor task-time (sum of task durations, sec): wall at
            # sf0.1 is session-floor-bound, so THIS is the core-scaling
            # signal — task_sec ≈ constant across core counts while
            # wall shrinks for genuinely parallel queries; task_sec ≈ 0
            # marks a driver/overhead-bound query whose wall ratio
            # carries no parallelism information.
            "task_min": (
                min(task_samples[name]) if task_samples.get(name) else None
            ),
            "task_med": (
                round(_median(task_samples[name]), 3)
                if task_samples.get(name)
                else None
            ),
        }
        for name, ts in samples.items()
    }

    # The verdict keys on MEDIAN-vs-floor, not max-vs-min: per-query
    # timings are min-of-N, so one isolated spike in the control series
    # (tolerated by the min) must not flag the run — only SUSTAINED
    # disturbance (half the samples inflated above the idle plateau)
    # invalidates the mins.
    ctl_sorted = sorted(ctl_durs)
    ctl_min, ctl_max = ctl_sorted[0], ctl_sorted[-1]
    ctl_med = ctl_sorted[len(ctl_sorted) // 2]
    ctl_spread = round(100.0 * (ctl_max - ctl_min) / max(ctl_min, 1e-9), 1)
    ctl_sustained = round(
        100.0 * (ctl_med - ctl_floor) / max(ctl_floor, 1e-9), 1
    )
    disturbed_pct = float(
        os.environ.get("SPARK_GRAFT_BENCH_DISTURBED_PCT", "25")
    )
    disturbed = ctl_sustained > disturbed_pct

    total = round(sum(timings.values()), 3)
    total_med = round(sum(v["med"] for v in variance.values()), 3)
    # HOST normalization (r9 verdict ask #2): the control workload is
    # constant by construction, so its idle floor measures HOST speed.
    # The reference floor is the r8 recorded control series (p25 = 0.21 s
    # on the host state the r01–r8 trend was recorded under); dividing
    # the headline by (this run's floor / 0.21) makes sec_per_query
    # comparable across rounds when the sandbox host itself speeds up or
    # slows down (r8→r9: floor 0.21 → 0.275 = the host got 31% slower,
    # which was the ENTIRE r9 headline regression).
    control_floor_ref = float(
        os.environ.get("SPARK_GRAFT_BENCH_FLOOR_REF", "0.21")
    )
    host_ratio = round(ctl_floor / control_floor_ref, 3)
    sec_per_query = round(total / max(len(timings), 1), 3)
    result = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # core count the session actually ran with (local[$SPARK_GRAFT_CPUS])
        # — pairs with the per-query task_min/task_med in bench_full.json
        # so low-core vs high-core runs can compare parallel work, not
        # session-floor-bound wall time
        "cpus": spark.sparkContext.defaultParallelism,
        # normalization context: the query set GROWS every round,
        # so totals are not comparable across rounds — sec/query is
        "n_queries": len(timings),
        "sec_per_query": sec_per_query,
        "sec_per_query_median": round(total_med / max(len(timings), 1), 3),
        "control_floor": ctl_floor,
        "host_ratio_vs_ref": host_ratio,
        "sec_per_query_normalized": round(
            sec_per_query / max(host_ratio, 1e-9), 3
        ),
        # steal detector verdict: sustained control-series inflation
        # means the HOST was busy during this run — prefer a rerun over
        # reading per-query deltas as regressions
        "disturbed": disturbed,
        "control_sustained_pct": ctl_sustained,
        # window attribution: queries whose every rep ran between
        # elevated control samples — their mins never saw an idle host
        "suspect_queries": sorted(n for n, s in suspect.items() if s),
    }
    # Full per-query detail always lands on disk for the judge/plan work
    # (bench_full.json only: the variance block would blow the one-line
    # budget of the printed JSON).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    with open(full_path, "w") as f:
        json.dump(
            dict(
                result,
                variance=variance,
                control={
                    "samples": [d for _, d in control_samples],
                    "sample_offsets": [off for off, _ in control_samples],
                    "elevated_samples": elevated,
                    "floor_p25": ctl_floor,
                    "spread_pct": ctl_spread,
                    "sustained_pct": ctl_sustained,
                    "threshold_pct": disturbed_pct,
                    "sample_threshold_pct": round(
                        (sample_thresh - 1.0) * 100.0, 1
                    ),
                    "control_sec_total": round(control_sec_total, 3),
                    "workload": "avg(xxhash64(id)) over range(2e8), noop sink",
                },
            ),
            f,
            indent=1,
        )

    # The driver keeps only the LAST ~2000 chars of output and parses the
    # JSON line out of that tail (BENCH_r02.json recorded parsed=null when
    # the 66-query line overran the window). Guarantee the printed line
    # fits: round per-query values to 2 decimals and, if still too long,
    # keep only the slowest queries (most informative for perf review),
    # recording how many were omitted and where the full dict lives.
    LINE_BUDGET = 1600
    compact = {k: round(v, 2) for k, v in timings.items()}
    line_obj = dict(result, queries=compact)
    if len(line_obj["suspect_queries"]) > 8:
        line_obj["suspect_queries"] = len(result["suspect_queries"])
        line_obj["suspect_queries_full"] = "bench_full.json"
    by_cost = sorted(compact, key=compact.get, reverse=True)
    kept = len(by_cost)
    while kept > 0 and len(json.dumps(line_obj)) > LINE_BUDGET:
        kept -= 1
        line_obj["queries"] = {k: compact[k] for k in by_cost[:kept]}
        line_obj["queries_omitted"] = len(compact) - kept
        line_obj["queries_full"] = "bench_full.json"
    print(json.dumps(line_obj))


if __name__ == "__main__":
    main()
