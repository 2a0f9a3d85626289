"""Attribute the sub-second tail's fixed per-query cost (r11 verdict #7).

For each named query, measures per rep:
  wall       noop-sink wall time (bench methodology)
  plan_s     driver-side time to build the DataFrame + reach executedPlan
             (analysis + optimization + physical planning, pre-execution)
  task_s     executor task-time delta (REST /executors totalDuration)
  jobs       number of Spark jobs the action spawned

wall - task_s/cores - plan_s ~ scheduling + AQE replanning + codegen +
commit overhead. Run once with default conf and once with
--conf spark.sql.codegen.cache.maxEntries=N (static conf — applied at
session build) to isolate codegen-recompile cost.

Usage: python tools/tail_profile.py [--reps N] [--conf k=v ...] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    confs: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1); confs[k] = v; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tail_profile", extra_conf=confs or None)
    sc = spark.sparkContext
    queries = entrymod.queries()

    def task_ms() -> int:
        url = (f"{sc.uiWebUrl}/api/v1/applications/"
               f"{sc.applicationId}/executors")
        with urllib.request.urlopen(url, timeout=5) as r:
            return sum(int(e.get("totalDuration", 0))
                       for e in json.loads(r.read()))

    def n_jobs() -> int:
        st = sc.statusTracker()
        return len(st.getJobIdsForGroup(None))

    # bench.py warmup recipe
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()
    queries["silver_events"](spark, sf_dir).limit(1).count()

    for name in names:
        fn = queries[name]
        rows = []
        for _ in range(reps):
            t_a = time.time()
            df = fn(spark, sf_dir)
            df._jdf.queryExecution().executedPlan()  # force planning
            plan_s = time.time() - t_a
            j0, k0 = n_jobs(), task_ms()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            j1, k1 = n_jobs(), task_ms()
            rows.append((wall, plan_s, (k1 - k0) / 1000.0, j1 - j0))
        best = min(rows)
        print(
            f"{name:36s} wall={best[0]:.3f} plan={best[1]:.3f} "
            f"task={best[2]:.3f} jobs={best[3]} "
            f"(all walls: {[round(r[0], 2) for r in rows]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
