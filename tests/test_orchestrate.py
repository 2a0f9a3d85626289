"""DAG orchestration runner (orchestrate.py): Airflow-shaped fan-out/
fan-in, retries, per-attempt execution timeouts (Spark job-group
cancellation), upstream-failure propagation — the engine-side twin of
the reference's dags/04_gold_aggregation.py graph."""

from __future__ import annotations

import datetime as dt
import time

import pytest

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.orchestrate import (
    Dag,
    DagRunError,
    Task,
    backfill,
    due_logical_dates,
    gold_aggregation_dag,
    medallion_dag,
    run_due,
)
from data_lakehouse_spark.pipeline import MedallionPipeline

EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _batch(ids, day, typ="purchase"):
    return [
        (
            i,
            dt.datetime(2024, 1, day, 10 + (i % 5)),
            i % 3 + 1,
            typ,
            10.0 * i,
            '{"k": 1}',
        )
        for i in ids
    ]


def test_dag_fanout_runs_concurrently_and_fans_in():
    """start >> [a, b, c] >> join: the three middle tasks overlap in
    wall-clock (true fan-out), and join sees all of their results."""
    spans: dict[str, tuple[float, float]] = {}

    def work(name: str):
        t0 = time.monotonic()
        time.sleep(0.3)
        spans[name] = (t0, time.monotonic())
        return name

    dag = Dag("fan", max_workers=4)
    start = dag.task("start")
    mids = [dag.task(n, lambda n=n: work(n)) for n in ("a", "b", "c")]
    join = dag.task("join", lambda: sorted(spans))
    start >> mids >> join
    t0 = time.monotonic()
    out = dag.run()
    assert out["state"] == "success"
    assert out["tasks"]["join"]["result"] == ["a", "b", "c"]
    # overlapped: serial would be >= 0.9s of work inside a tighter wall
    assert time.monotonic() - t0 < 0.85
    starts = [spans[n][0] for n in ("a", "b", "c")]
    ends = [spans[n][1] for n in ("a", "b", "c")]
    assert max(starts) < min(ends)  # every pair overlaps
    # join started only after every middle task ended (fan-in barrier)
    assert out["tasks"]["join"]["state"] == "success"


def test_dag_retries_then_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    dag = Dag("retry")
    dag.task("flaky", flaky, retries=1, retry_delay=0.05)
    out = dag.run()
    assert out["state"] == "success"
    t = out["tasks"]["flaky"]
    assert t["attempts"] == 2 and t["result"] == "ok" and t["state"] == "success"


def test_dag_upstream_failure_skips_downstream_but_not_cleanup():
    ran: list[str] = []

    dag = Dag("fail")
    boom = dag.task("boom", lambda: 1 / 0, retries=1, retry_delay=0.0)
    down = dag.task("down", lambda: ran.append("down"))
    further = dag.task("further", lambda: ran.append("further"))
    cleanup = dag.task(
        "cleanup", lambda: ran.append("cleanup"), trigger_rule="all_done"
    )
    boom >> down >> further
    boom >> cleanup
    out = dag.run()
    assert out["state"] == "failed"
    assert out["tasks"]["boom"]["state"] == "failed"
    assert out["tasks"]["boom"]["attempts"] == 2  # retried, then failed
    assert "ZeroDivisionError" in out["tasks"]["boom"]["error"]
    assert out["tasks"]["down"]["state"] == "upstream_failed"
    assert out["tasks"]["further"]["state"] == "upstream_failed"
    assert out["tasks"]["cleanup"]["state"] == "success"
    assert ran == ["cleanup"]
    with pytest.raises(DagRunError):
        dag.run(raise_on_failure=True)


def test_dag_execution_timeout_pure_python_abandon():
    """A pure-Python stall is failed at the deadline (the zombie thread
    is abandoned); the run does not wait the task out — and despite
    retries=1 the task is NOT retried, because a retry would run
    concurrently with the still-alive zombie."""
    dag = Dag("slow")
    dag.task(
        "stall", lambda: time.sleep(8), execution_timeout=0.3, retries=1
    )
    after = dag.task("after", lambda: "never")
    dag.tasks["stall"] >> after
    t0 = time.monotonic()
    out = dag.run()
    assert time.monotonic() - t0 < 5
    assert out["tasks"]["stall"]["state"] == "failed"
    assert out["tasks"]["stall"]["attempts"] == 1  # terminal, no retry
    assert "abandoned without retry" in out["tasks"]["stall"]["error"]
    assert out["tasks"]["after"]["state"] == "upstream_failed"


def test_dag_execution_timeout_cancels_spark_job(spark):
    """A Spark action past its deadline is killed via job-group
    cancellation — the attempt fails promptly instead of running the
    full job."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def napper(x):
        time.sleep(30)
        return x

    def big_job():
        return (
            spark.range(64)
            .repartition(64)
            .select(napper("id").alias("v"))
            .agg(F.sum("v"))
            .collect()
        )

    dag = Dag("cancel")
    dag.task("spark_stall", big_job, execution_timeout=3.0)
    t0 = time.monotonic()
    out = dag.run(spark)
    assert time.monotonic() - t0 < 25  # far less than the 30s job
    assert out["state"] == "failed"
    assert out["tasks"]["spark_stall"]["state"] == "failed"


def test_dag_cycle_detection():
    dag = Dag("cyc")
    a, b = dag.task("a"), dag.task("b")
    a >> b
    b >> a
    with pytest.raises(ValueError, match="cycle"):
        dag.run()


def test_dag_duplicate_task_id_rejected():
    dag = Dag("dup")
    dag.task("x")
    with pytest.raises(ValueError, match="duplicate"):
        dag.add(Task("x"))


def test_gold_aggregation_dag_reference_shape(spark, tmp_path):
    """The reference's DAG 04 graph (dags/04_gold_aggregation.py:110)
    end-to-end: parallel group builds -> gold tests -> docs; every mart
    lands, the grain tests pass, and the docs manifest covers them."""
    cat = Catalog(spark, str(tmp_path / "w"))
    pipe = MedallionPipeline(
        spark, cat, cart_type="cart", as_of_date="2024-02-01"
    )
    raw = spark.createDataFrame(_batch(range(1, 9), 1), EVENTS)
    pipe.ingest_bronze(raw, "b1.parquet")
    pipe.build_silver()

    dag = gold_aggregation_dag(pipe)
    # reference wiring: start fans out to the three groups, which fan
    # into the test task
    assert dag.tasks["start_gold_aggregation"].downstream == {
        "build_gold_core",
        "build_gold_funnel",
        "build_gold_traffic",
    }
    assert dag.tasks["test_gold"].upstream == {
        "build_gold_core",
        "build_gold_funnel",
        "build_gold_traffic",
    }
    assert dag.tasks["docs_generate"].upstream == {"test_gold"}

    out = dag.run(spark, raise_on_failure=True)
    assert out["state"] == "success"
    for g in ("core", "funnel", "traffic"):
        assert out["tasks"][f"build_gold_{g}"]["state"] == "success"
    assert cat.read("gold_daily_sales_summary").count() > 0
    assert cat.read("gold_hourly_traffic").count() > 0
    # dbt-test analog: zero violations on every mart grain
    assert all(v == 0 for v in out["tasks"]["test_gold"]["result"].values())
    docs = out["tasks"]["docs_generate"]["result"]
    assert "gold_daily_sales_summary" in docs
    assert docs["gold_daily_sales_summary"]["rows"] > 0
    assert "sale_date" in docs["gold_daily_sales_summary"]["columns"]


def test_medallion_dag_end_to_end(spark, tmp_path):
    """Bronze -> freshness -> silver -> silver tests gate the gold
    fan-out; one graph, all green."""
    cat = Catalog(spark, str(tmp_path / "w"))
    pipe = MedallionPipeline(
        spark, cat, cart_type="cart", as_of_date="2024-02-01"
    )
    raw = spark.createDataFrame(_batch(range(1, 9), 1), EVENTS)
    dag = medallion_dag(pipe, raw, "b1.parquet")
    out = dag.run(spark, raise_on_failure=True)
    assert out["state"] == "success"
    assert cat.read("silver_events").count() == 8
    assert cat.read("gold_daily_sales_summary").count() > 0
    # silver tests gate gold: wiring is silver_test >> start_gold
    assert "start_gold_aggregation" in dag.tasks["silver_test"].downstream


def test_gold_test_task_fails_on_violations(spark, tmp_path):
    """The dbt-test analog must FAIL on violations, or it can't gate:
    inject a duplicate-grain gold table and assert the DAG fails at
    test_gold with docs_generate upstream_failed."""
    cat = Catalog(spark, str(tmp_path / "w"))
    pipe = MedallionPipeline(
        spark, cat, cart_type="cart", as_of_date="2024-02-01"
    )
    raw = spark.createDataFrame(_batch(range(1, 9), 1), EVENTS)
    pipe.ingest_bronze(raw, "b1.parquet")
    pipe.build_silver()
    dag = gold_aggregation_dag(pipe)
    out = dag.run(spark)
    assert out["state"] == "success"
    # corrupt a mart's grain: duplicate every row
    mart = cat.read("gold_daily_sales_summary")
    cat.overwrite("gold_daily_sales_summary", mart.union(mart))
    # rerun only the test task's logic via a fresh dag whose builders
    # are no-ops (the marts already exist)
    from data_lakehouse_spark.orchestrate import _test_gold

    with pytest.raises(ValueError, match="gold data tests failed"):
        _test_gold(pipe)


def test_due_logical_dates_catchup_arithmetic():
    """Airflow's catchup arithmetic, pure: a run is due for every
    CLOSED data interval after start_date (and after the last run);
    catchup=False keeps only the most recent backlog entry."""
    due = due_logical_dates(
        "@daily", dt.date(2024, 1, 1), now=dt.datetime(2024, 1, 4, 12)
    )
    assert due == [
        dt.datetime(2024, 1, 1),
        dt.datetime(2024, 1, 2),
        dt.datetime(2024, 1, 3),
    ]
    # the Jan-4 interval has not closed at noon Jan 4
    assert dt.datetime(2024, 1, 4) not in due
    # resume after the last run
    assert due_logical_dates(
        "@daily",
        dt.date(2024, 1, 1),
        now=dt.datetime(2024, 1, 4, 12),
        last_logical_date=dt.datetime(2024, 1, 2),
    ) == [dt.datetime(2024, 1, 3)]
    # catchup=False: skip the backlog, take only the latest due run
    assert due_logical_dates(
        "@daily",
        dt.date(2024, 1, 1),
        now=dt.datetime(2024, 1, 4, 12),
        catchup=False,
    ) == [dt.datetime(2024, 1, 3)]
    # nothing due before the first interval closes
    assert (
        due_logical_dates(
            "@daily", dt.date(2024, 1, 1), now=dt.datetime(2024, 1, 1, 23)
        )
        == []
    )
    # hourly preset + Dag.due_runs plumbing
    d = Dag(
        "x", schedule="@hourly", start_date=dt.datetime(2024, 1, 1), catchup=True
    )
    assert d.due_runs(now=dt.datetime(2024, 1, 1, 3, 30)) == [
        dt.datetime(2024, 1, 1, 0),
        dt.datetime(2024, 1, 1, 1),
        dt.datetime(2024, 1, 1, 2),
    ]


def test_dag_run_logical_date_context():
    """A dated run hands the Airflow-shaped context to tasks that
    declare a required positional parameter; zero-arg and default-only
    callables keep the legacy contract."""
    seen = {}

    dag = Dag("ctx", schedule="@daily")
    dag.task("aware", lambda context: seen.setdefault("ctx", context))
    dag.task("legacy", lambda: seen.setdefault("legacy", "ran"))
    dag.task("default_only", lambda x=41: seen.setdefault("default", x + 1))
    out = dag.run(logical_date=dt.datetime(2024, 3, 5), raise_on_failure=True)
    ctx = seen["ctx"]
    assert ctx["ds"] == "2024-03-05"
    assert ctx["logical_date"] == dt.datetime(2024, 3, 5)
    assert ctx["data_interval_start"] == dt.datetime(2024, 3, 5)
    assert ctx["data_interval_end"] == dt.datetime(2024, 3, 6)
    assert ctx["run_type"] == "manual" and "2024-03-05" in ctx["run_id"]
    assert seen["legacy"] == "ran" and seen["default"] == 42
    assert out["logical_date"] == "2024-03-05T00:00:00"
    # undated runs keep working: context-aware tasks receive None
    seen.clear()
    out = dag.run(raise_on_failure=True)
    assert seen["ctx"] is None and out["logical_date"] is None


def test_context_injection_gated_on_parameter_name():
    """Only a required positional parameter NAMED ``context`` opts in
    to context injection (Airflow's shape). A zero-arg-contract task
    with an accidental required parameter under any other name must
    keep failing fast with TypeError, not silently receive the context
    dict (or None on undated runs) as its argument."""
    dag = Dag("ctxgate", schedule="@daily")
    dag.task("oops", lambda names: names)  # accidental required param
    out = dag.run(logical_date=dt.datetime(2024, 3, 5))
    st = out["tasks"]["oops"]
    assert st["state"] == "failed"
    assert "positional argument" in st["error"]
    # positional-only `context` still opts in
    seen = {}

    def aware(context, /):
        seen["ctx"] = context

    dag2 = Dag("ctxgate2", schedule="@daily")
    dag2.task("aware", aware)
    dag2.run(logical_date=dt.datetime(2024, 3, 5), raise_on_failure=True)
    assert seen["ctx"]["ds"] == "2024-03-05"


def test_run_due_scheduler_tick():
    """run_due is one scheduler heartbeat: it runs exactly the due
    logical dates, returns the new high-water logical date as state,
    and a second tick at the same `now` is a no-op."""
    ran: list[str] = []
    dag = Dag(
        "tick",
        schedule="@daily",
        start_date=dt.date(2024, 1, 1),
        catchup=True,
    )
    dag.task("t", lambda context: ran.append(context["ds"]))
    reports, last = run_due(dag, now=dt.datetime(2024, 1, 3, 12))
    assert ran == ["2024-01-01", "2024-01-02"]
    assert last == dt.datetime(2024, 1, 2)
    assert [r["run_id"] for r in reports] == [
        "scheduled__2024-01-01T00:00:00",
        "scheduled__2024-01-02T00:00:00",
    ]
    # same tick again: nothing due, state unchanged
    reports2, last2 = run_due(
        dag, now=dt.datetime(2024, 1, 3, 12), last_logical_date=last
    )
    assert reports2 == [] and last2 == last
    # the next interval closes -> exactly one more run
    reports3, last3 = run_due(
        dag, now=dt.datetime(2024, 1, 4, 0, 5), last_logical_date=last2
    )
    assert ran[-1] == "2024-01-03" and last3 == dt.datetime(2024, 1, 3)

    # failure semantics: a failed date STOPS the tick; state advances
    # only through the consecutive successes, so the next tick retries
    # the failed date instead of re-running the landed ones
    attempts: list[str] = []

    def flaky(context):
        attempts.append(context["ds"])
        if context["ds"] == "2024-02-02" and attempts.count("2024-02-02") == 1:
            raise ValueError("boom")

    fdag = Dag(
        "flaky", schedule="@daily", start_date=dt.date(2024, 2, 1), catchup=True
    )
    fdag.task("t", flaky)
    reps, last_f = run_due(fdag, now=dt.datetime(2024, 2, 4, 12))
    assert [r["state"] for r in reps] == ["success", "failed"]
    assert last_f == dt.datetime(2024, 2, 1)  # progress kept, stop at fail
    assert attempts == ["2024-02-01", "2024-02-02"]
    # retry tick: the failed date runs first (succeeds now), then the rest
    reps2, last_f2 = run_due(
        fdag, now=dt.datetime(2024, 2, 4, 12), last_logical_date=last_f
    )
    assert [r["state"] for r in reps2] == ["success", "success"]
    assert last_f2 == dt.datetime(2024, 2, 3)
    assert attempts == [
        "2024-02-01", "2024-02-02", "2024-02-02", "2024-02-03",
    ]


def test_medallion_backfill_three_dates_idempotent(spark, tmp_path):
    """The verdict's backfill gate: replaying 3 logical dates through
    medallion_dag lands each date's rows exactly once (bronze ingests
    only its data interval, past the event-time watermark), and
    RE-RUNNING the completed backfill lands nothing — bronze appends 0
    rows per date, the bronze table version does not advance, and
    silver/gold row counts are unchanged."""
    cat = Catalog(spark, str(tmp_path / "w"))
    pipe = MedallionPipeline(
        spark, cat, cart_type="cart", as_of_date="2024-02-01"
    )
    raw = spark.createDataFrame(
        _batch(range(1, 5), 1)
        + _batch(range(5, 9), 2)
        + _batch(range(9, 13), 3),
        EVENTS,
    )
    dag = medallion_dag(pipe, raw, "b1.parquet", event_time_col="ts")
    reports = backfill(dag, dt.date(2024, 1, 1), dt.date(2024, 1, 3), spark=spark)
    assert [r["state"] for r in reports] == ["success"] * 3
    assert [r["run_id"] for r in reports] == [
        "backfill__2024-01-01T00:00:00",
        "backfill__2024-01-02T00:00:00",
        "backfill__2024-01-03T00:00:00",
    ]
    # each date landed exactly its own 4 rows
    appended = [r["tasks"]["bronze_ingest"]["result"]["rows_appended"] for r in reports]
    assert appended == [4, 4, 4]
    assert cat.read("bronze_events").count() == 12
    assert cat.read("silver_events").count() == 12
    v_bronze = cat.current_version("bronze_events")
    n_silver = cat.read("silver_events").count()
    n_gold = cat.read("gold_daily_sales_summary").count()

    # replaying the SAME range is a complete no-op on the data
    replays = backfill(dag, dt.date(2024, 1, 1), dt.date(2024, 1, 3), spark=spark)
    assert [r["state"] for r in replays] == ["success"] * 3
    for r in replays:
        res = r["tasks"]["bronze_ingest"]["result"]
        assert res["rows_appended"] == 0 and res["skipped"] is True
    assert cat.current_version("bronze_events") == v_bronze
    assert cat.read("bronze_events").count() == 12
    assert cat.read("silver_events").count() == n_silver == 12
    assert cat.read("gold_daily_sales_summary").count() == n_gold


def test_maintenance_dag_sweeps_tables(spark, tmp_path):
    """maintenance_dag: one maintain task per table fanned out; a
    small-file table compacts during the run, an already-tidy table
    reports no actions; sweeps are idempotent on replay."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.orchestrate import maintenance_dag

    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table("a", spark.createDataFrame([(0,)], "id long"))
    for i in range(1, 5):
        cat.append("a", spark.createDataFrame([(i,)], "id long"))
    cat.create_table(
        "b", spark.createDataFrame([(i,) for i in range(50)], "id long").coalesce(1)
    )
    dag = maintenance_dag(cat, ["a", "b"], min_files_to_compact=4)
    out = dag.run(spark, raise_on_failure=True)
    assert out["state"] == "success"
    acts = {
        t: [x["action"] for x in out["tasks"][f"maintain_{t}"]["result"]["actions"]]
        for t in ("a", "b")
    }
    assert acts["a"] == ["compact"] and acts["b"] == []
    assert cat.read("a").count() == 5
    # replay: idempotent — the compacted table reports nothing to do
    out2 = dag.run(spark, raise_on_failure=True)
    assert out2["tasks"]["maintain_a"]["result"]["actions"] == []
    # tables=None resolves the catalog at run time
    dag_all = maintenance_dag(cat, min_files_to_compact=999)
    out3 = dag_all.run(spark, raise_on_failure=True)
    assert set(out3["tasks"]["maintain_all"]["result"]) == {"a", "b"}


def test_attempt_finishing_past_deadline_still_fails():
    """An attempt that completes AFTER its execution_timeout (even
    inside the cancellation grace window) fails its SLO — a 1.3s task
    against a 0.5s timeout must not be recorded success."""
    dag = Dag("slo")
    dag.task("late", lambda: time.sleep(1.3) or "done", execution_timeout=0.5)
    out = dag.run()
    assert out["state"] == "failed"
    t = out["tasks"]["late"]
    assert t["state"] == "failed"
    assert "execution_timeout" in t["error"]
    assert t["result"] is None  # the late result is discarded


def test_zombie_does_not_block_interpreter_exit():
    """Abandoned attempts run on daemon threads: a process whose DAG
    abandoned an unkillable task still exits promptly (the old
    ThreadPoolExecutor joined workers at interpreter shutdown and hung
    forever)."""
    import subprocess
    import sys

    code = (
        "import time\n"
        "from data_lakehouse_spark.orchestrate import Dag\n"
        "dag = Dag('z')\n"
        "dag.task('spin', lambda: time.sleep(3600), execution_timeout=0.3)\n"
        "out = dag.run()\n"
        "assert out['tasks']['spin']['state'] == 'failed'\n"
        "print('REPORT_OK')\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-500:]
    assert "REPORT_OK" in p.stdout
