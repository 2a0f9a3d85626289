"""In-process DAG orchestration: fan-out/fan-in, retries, timeouts.

The engine-side twin of the reference's Airflow task graphs — e.g.
``start >> [dbt_run_core, dbt_run_funnel, dbt_run_traffic] >>
dbt_test_gold >> dbt_docs >> end`` (reference
``dags/04_gold_aggregation.py:110``) with ``retries: 1`` /
``retry_delay`` default args (``dags/04_gold_aggregation.py:10-12``)
and per-task ``execution_timeout`` SLOs
(``dags/03_silver_dbt_transformation.py:77``,
``dags/04_gold_aggregation.py:35,47,59``).

Architecture: Airflow schedules OS processes around a cluster; here the
long-lived driver owns one SparkSession, so the DAG runner schedules
Python callables on a thread pool instead. That is the Spark-idiomatic
shape — ``spark.sql`` is thread-safe on a shared session, each task's
jobs run under its own job group, and the fan-out genuinely overlaps on
the cluster (FAIR scheduler interleaves the stages) rather than queuing
behind one another.

Semantics implemented (Airflow-equivalent, tested in
``tests/test_orchestrate.py``):

- ``a >> [b, c] >> d`` dependency wiring (also ``<<``), cycle check.
- Fan-out: all ready tasks run concurrently (bounded by
  ``max_workers``); fan-in: a task starts only when every upstream
  reached a terminal state that its trigger rule accepts.
- ``retries`` / ``retry_delay``: a failed attempt re-queues with a
  not-before timestamp; attempt counts reported per task.
- ``execution_timeout``: enforced PER ATTEMPT. The runner cancels the
  task's Spark job group (``interruptOnCancel``), which aborts any
  running Spark action and fails the attempt promptly; a pure-Python
  stall is detected at the same deadline and the attempt is failed and
  abandoned (threads can't be killed — the zombie's eventual result is
  discarded), matching Airflow's "the task instance fails at the
  deadline" contract.
- Trigger rules ``all_success`` (default) and ``all_done`` (cleanup
  tasks run regardless); upstream failure marks ``all_success``
  downstreams ``upstream_failed`` transitively, like Airflow.
- Logical-date scheduling (Airflow's data-interval model): a Dag may
  declare ``schedule`` / ``start_date`` / ``catchup`` (the reference
  sets all three on every DAG — ``dags/02_bronze_ingestion_to_iceberg
  .py:56-61``); ``run(logical_date=...)`` parameterizes the run, tasks
  that declare a required positional argument receive the Airflow-shaped
  context (``logical_date``, ``ds``, ``data_interval_start/end``,
  ``run_id``, ``run_type``); ``due_logical_dates`` computes the
  catchup set and :func:`backfill` replays a date range through the
  graph one logical date at a time (``max_active_runs=1`` ordering),
  idempotently when the tasks key their writes on the interval (the
  medallion bronze task's event-time watermark makes replays no-ops).

Scale note: the runner moves NO data — tasks are catalog/DataFrame
materializations; concurrency here is control-plane only, so the same
DAG object drives a 1000-executor cluster unchanged (parallel tasks
become parallel Spark job groups sharing the cluster via FAIR pools).
"""

from __future__ import annotations

import datetime as _dt
import inspect
import threading
import time
from collections.abc import Callable
from concurrent.futures import FIRST_COMPLETED, Future, wait

__all__ = [
    "Task",
    "Dag",
    "DagRunError",
    "schedule_interval",
    "due_logical_dates",
    "run_due",
    "backfill",
    "gold_aggregation_dag",
    "maintenance_dag",
    "medallion_dag",
]

#: terminal task states
SUCCESS = "success"
FAILED = "failed"
UPSTREAM_FAILED = "upstream_failed"
#: non-terminal
PENDING = "pending"
RUNNING = "running"


class DagRunError(RuntimeError):
    """Raised by ``Dag.run(raise_on_failure=True)`` when any task fails."""


def schedule_interval(schedule) -> _dt.timedelta:
    """Normalize a ``schedule`` declaration to one data interval.

    Accepts a ``timedelta``, a number of seconds, or the Airflow preset
    strings ``"@hourly"`` / ``"@daily"`` / ``"@weekly"`` (the shapes the
    reference's DAG headers use)."""
    if isinstance(schedule, _dt.timedelta):
        return schedule
    if isinstance(schedule, (int, float)):
        return _dt.timedelta(seconds=float(schedule))
    presets = {
        "@hourly": _dt.timedelta(hours=1),
        "@daily": _dt.timedelta(days=1),
        "@weekly": _dt.timedelta(weeks=1),
    }
    if schedule in presets:
        return presets[schedule]
    raise ValueError(
        f"unsupported schedule {schedule!r}: use a timedelta, seconds, "
        "or one of @hourly/@daily/@weekly"
    )


def _as_dt(d) -> _dt.datetime:
    """date|datetime|ISO string → datetime (midnight for a bare date)."""
    if isinstance(d, _dt.datetime):
        return d
    if isinstance(d, _dt.date):
        return _dt.datetime(d.year, d.month, d.day)
    if isinstance(d, str):
        return _dt.datetime.fromisoformat(d)
    raise TypeError(f"expected date/datetime/ISO string, got {type(d).__name__}")


def due_logical_dates(
    schedule,
    start_date,
    *,
    now,
    last_logical_date=None,
    catchup: bool = True,
) -> list[_dt.datetime]:
    """The logical dates a scheduler owes runs for — Airflow's catchup
    arithmetic: a run exists for every data interval
    ``[L, L + interval)`` with ``L >= start_date`` whose interval has
    CLOSED (``L + interval <= now``) and that is after the last run
    (``L > last_logical_date``). With ``catchup=False`` only the most
    recent such interval is due (Airflow skips the backlog); a
    :func:`backfill` replays the skipped ones on demand.

    Pure driver arithmetic — this never touches data; the idempotency
    of actually re-running a date belongs to the tasks (see
    ``medallion_dag``'s watermarked bronze ingest)."""
    step = schedule_interval(schedule)
    if step <= _dt.timedelta(0):
        raise ValueError(f"schedule interval must be positive, got {step}")
    start = _as_dt(start_date)
    now = _as_dt(now)
    last = _as_dt(last_logical_date) if last_logical_date is not None else None
    due: list[_dt.datetime] = []
    ld = start
    # advance in one arithmetic hop when resuming far past start (the
    # loop below then walks at most a handful of intervals)
    if last is not None and last >= start:
        n_done = int((last - start) / step)
        ld = start + n_done * step
    while ld + step <= now:
        if last is None or ld > last:
            due.append(ld)
        ld += step
    if not catchup and len(due) > 1:
        due = due[-1:]
    return due


class Task:
    """One node: a Python callable plus its scheduling contract.

    ``fn`` takes no arguments and returns a JSON-able payload (recorded
    in the run report). ``fn=None`` is an Airflow ``EmptyOperator`` —
    a pure synchronization point that always succeeds instantly.
    """

    def __init__(
        self,
        task_id: str,
        fn: Callable[[], object] | None = None,
        *,
        retries: int = 0,
        retry_delay: float = 0.0,
        execution_timeout: float | None = None,
        trigger_rule: str = "all_success",
    ) -> None:
        if trigger_rule not in ("all_success", "all_done"):
            raise ValueError(f"unknown trigger_rule {trigger_rule!r}")
        self.task_id = task_id
        self.fn = fn
        # context-aware callables declare a REQUIRED positional
        # parameter NAMED ``context`` (Airflow's `def fn(context)`
        # shape); default-only parameters (the `lambda names=names:`
        # closure idiom) keep the zero-arg contract so existing
        # factories are untouched. The name gate matters: a zero-arg-
        # contract task with an ACCIDENTAL required parameter must keep
        # failing fast with TypeError at run time, not silently receive
        # the context dict as its argument.
        self.accepts_context = False
        if fn is not None:
            try:
                params = inspect.signature(fn).parameters.values()
                self.accepts_context = any(
                    p.name == "context"
                    and p.default is inspect.Parameter.empty
                    and p.kind
                    in (
                        inspect.Parameter.POSITIONAL_ONLY,
                        inspect.Parameter.POSITIONAL_OR_KEYWORD,
                    )
                    for p in params
                )
            except (TypeError, ValueError):
                pass
        self.retries = int(retries)
        self.retry_delay = float(retry_delay)
        self.execution_timeout = execution_timeout
        self.trigger_rule = trigger_rule
        self.upstream: set[str] = set()
        self.downstream: set[str] = set()
        self._dag: Dag | None = None

    # -- Airflow-style wiring: a >> [b, c] >> d ----------------------------
    def __rshift__(self, other):
        for t in other if isinstance(other, (list, tuple)) else [other]:
            _link(self, t)
        return other

    def __lshift__(self, other):
        for t in other if isinstance(other, (list, tuple)) else [other]:
            _link(t, self)
        return other

    def __rrshift__(self, others):  # [a, b] >> c
        for t in others:
            _link(t, self)
        return self

    def __rlshift__(self, others):  # [a, b] << c
        for t in others:
            _link(self, t)
        return self

    def __repr__(self) -> str:
        return f"Task({self.task_id!r})"


def _link(up: Task, down: Task) -> None:
    up.downstream.add(down.task_id)
    down.upstream.add(up.task_id)
    # tasks registered on a Dag pull linked tasks into the same Dag so
    # `with Dag(...) as d: a >> b` and manual wiring both work
    dag = up._dag or down._dag
    if dag is not None:
        dag.add(up)
        dag.add(down)


class Dag:
    """A named task graph with an Airflow-shaped threaded runner."""

    def __init__(
        self,
        dag_id: str,
        *,
        max_workers: int = 8,
        schedule=None,
        start_date=None,
        catchup: bool = False,
    ) -> None:
        self.dag_id = dag_id
        self.max_workers = max_workers
        self.tasks: dict[str, Task] = {}
        #: Airflow-shaped scheduling contract (the reference declares
        #: schedule/start_date/catchup on every DAG header). The graph
        #: runner itself stays time-agnostic; these feed due_runs() /
        #: backfill() and default the data interval of dated runs.
        self.schedule = schedule
        self.start_date = start_date
        self.catchup = bool(catchup)

    def due_runs(self, *, now, last_logical_date=None) -> list:
        """Logical dates this dag owes runs for at ``now`` (requires
        ``schedule`` and ``start_date``) — see :func:`due_logical_dates`."""
        if self.schedule is None or self.start_date is None:
            return []
        return due_logical_dates(
            self.schedule,
            self.start_date,
            now=now,
            last_logical_date=last_logical_date,
            catchup=self.catchup,
        )

    def add(self, task: Task) -> Task:
        have = self.tasks.get(task.task_id)
        if have is not None and have is not task:
            raise ValueError(f"duplicate task_id {task.task_id!r}")
        self.tasks[task.task_id] = task
        task._dag = self
        return task

    def task(self, task_id: str, fn=None, **kw) -> Task:
        """Create-and-register shorthand."""
        return self.add(Task(task_id, fn, **kw))

    # -- validation ---------------------------------------------------------
    def _toposort(self) -> list[str]:
        indeg = {
            k: len(t.upstream & self.tasks.keys())
            for k, t in self.tasks.items()
        }
        order, ready = [], sorted(k for k, d in indeg.items() if d == 0)
        while ready:
            k = ready.pop()
            order.append(k)
            for d in sorted(self.tasks[k].downstream & self.tasks.keys()):
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        if len(order) != len(self.tasks):
            cyc = sorted(set(self.tasks) - set(order))
            raise ValueError(f"dependency cycle among {cyc}")
        return order

    # -- runner ---------------------------------------------------------------
    def run(
        self,
        spark=None,
        *,
        raise_on_failure: bool = False,
        poll: float = 0.05,
        logical_date=None,
        run_type: str = "manual",
    ) -> dict:
        """Execute the graph; returns the run report::

            {"dag_id": ..., "state": "success"|"failed",
             "logical_date": ..., "run_id": ...,
             "tasks": {id: {"state", "attempts", "duration",
                            "error", "result"}}}

        ``spark`` enables job-group timeout cancellation (pass the
        session whose jobs the tasks submit).

        ``logical_date`` parameterizes the run (Airflow data-interval
        model): tasks whose callable declares a required positional
        argument receive the context dict — ``logical_date``, ``ds``
        (YYYY-MM-DD), ``data_interval_start``/``data_interval_end``
        (the dag's schedule interval, daily when unscheduled),
        ``run_id``, ``run_type``, ``dag_id``. Zero-arg callables run
        exactly as before, dated or not.
        """
        self._toposort()  # cycle check up front
        context = None
        run_id = None
        if logical_date is not None:
            ld = _as_dt(logical_date)
            step = schedule_interval(
                self.schedule if self.schedule is not None else "@daily"
            )
            run_id = f"{run_type}__{ld.isoformat()}"
            context = {
                "dag_id": self.dag_id,
                "logical_date": ld,
                "ds": ld.strftime("%Y-%m-%d"),
                "data_interval_start": ld,
                "data_interval_end": ld + step,
                "run_id": run_id,
                "run_type": run_type,
            }
        states = {k: PENDING for k in self.tasks}
        report: dict[str, dict] = {
            k: {
                "state": PENDING,
                "attempts": 0,
                "duration": 0.0,
                "error": None,
                "result": None,
            }
            for k in self.tasks
        }
        #: queued attempts not yet submitted: task_id -> not_before ts
        queued: dict[str, float] = {}
        #: in-flight: future -> (task_id, submit_time, start-holder);
        #: the holder's "started" is set by the worker when the attempt
        #: actually begins (deadlines measure execution, not queueing)
        inflight: dict[Future, tuple[str, float, dict]] = {}
        #: attempts whose deadline passed with no Spark job to cancel —
        #: abandoned zombies; their eventual results are discarded
        abandoned: set[Future] = set()

        def ready(t: Task) -> bool:
            ups = t.upstream & self.tasks.keys()
            if t.trigger_rule == "all_done":
                return all(
                    states[u] in (SUCCESS, FAILED, UPSTREAM_FAILED)
                    for u in ups
                )
            return all(states[u] == SUCCESS for u in ups)

        def propagate_upstream_failed() -> None:
            changed = True
            while changed:
                changed = False
                for k, t in self.tasks.items():
                    if states[k] != PENDING or t.trigger_rule == "all_done":
                        continue
                    ups = t.upstream & self.tasks.keys()
                    if any(
                        states[u] in (FAILED, UPSTREAM_FAILED) for u in ups
                    ):
                        states[k] = UPSTREAM_FAILED
                        report[k]["state"] = UPSTREAM_FAILED
                        changed = True

        def attempt(task: Task, holder: dict):
            # execution_timeout is measured from ACTUAL start (Airflow
            # semantics), not from submit — a task queued behind a full
            # worker pool must not burn its budget while waiting
            holder["started"] = time.monotonic()
            group = f"dag:{self.dag_id}:{task.task_id}"
            if spark is not None:
                # thread-local: every Spark job this attempt submits is
                # cancellable as a unit at the execution_timeout
                spark.sparkContext.setJobGroup(
                    group, f"{self.dag_id}.{task.task_id}", True
                )
            try:
                if task.fn is None:
                    return None
                if task.accepts_context:
                    return task.fn(context)
                return task.fn()
            finally:
                if spark is not None:
                    spark.sparkContext.setJobGroup("", "", False)

        def spawn(task: Task, holder: dict) -> Future:
            # DAEMON thread per attempt instead of ThreadPoolExecutor:
            # concurrent.futures joins every worker at interpreter exit
            # (threading._register_atexit), so an abandoned zombie
            # would hang process shutdown forever. Daemon threads die
            # with the process; the scheduler bounds live concurrency
            # itself (len(inflight) < max_workers), so no hidden queue
            # exists and deadlines always measure real execution.
            fut: Future = Future()
            fut.set_running_or_notify_cancel()

            def run() -> None:
                try:
                    fut.set_result(attempt(task, holder))
                except BaseException as e:  # surfaced via fut.exception()
                    fut.set_exception(e)

            threading.Thread(
                target=run,
                name=f"dag-{self.dag_id}-{task.task_id}",
                daemon=True,
            ).start()
            return fut

        try:
            while True:
                now = time.monotonic()
                # pull every PENDING task whose upstreams reached an
                # acceptable terminal state into the queue (roots on the
                # first pass; retry re-queues carry their own backoff
                # timestamp and are already present)
                busy = {k for (k, _, _) in inflight.values()}
                for k, t in self.tasks.items():
                    if (
                        states[k] == PENDING
                        and k not in queued
                        and k not in busy
                        and ready(t)
                    ):
                        queued[k] = 0.0
                if not queued and not inflight:
                    break
                # submit every queued attempt that is ready, past its
                # retry backoff, and within the concurrency bound
                # (abandoned zombies do NOT hold a slot — oversubscribing
                # beats deadlocking the graph behind runaways)
                for k in sorted(queued):
                    if len(inflight) >= self.max_workers:
                        break
                    t = self.tasks[k]
                    if states[k] in (UPSTREAM_FAILED,):
                        queued.pop(k)
                        continue
                    if queued[k] <= now and ready(t):
                        queued.pop(k)
                        states[k] = RUNNING
                        report[k]["state"] = RUNNING
                        report[k]["attempts"] += 1
                        holder: dict = {"started": None}
                        fut = spawn(t, holder)
                        inflight[fut] = (k, now, holder)
                if not inflight:
                    time.sleep(poll)
                    propagate_upstream_failed()
                    # drop queued tasks that just became upstream_failed
                    for k in [
                        k for k in queued if states[k] == UPSTREAM_FAILED
                    ]:
                        queued.pop(k)
                    continue
                done, _ = wait(
                    inflight, timeout=poll, return_when=FIRST_COMPLETED
                )
                now = time.monotonic()
                # enforce per-attempt deadlines (measured from the
                # attempt's ACTUAL start — a still-queued future has
                # holder["started"] None and is never timed out).
                # Collect every expired attempt first, cancel all their
                # job groups, then ONE collective grace wait — serial
                # 1s waits would stall the scheduler N seconds when N
                # tasks expire in the same poll window.
                expired: list[tuple[Future, str, float]] = []
                for fut, (k, submitted, holder) in list(inflight.items()):
                    t = self.tasks[k]
                    begun = holder["started"]
                    if (
                        fut in done
                        or t.execution_timeout is None
                        or begun is None
                        or now < begun + t.execution_timeout
                    ):
                        continue
                    expired.append((fut, k, begun))
                    if spark is not None:
                        spark.sparkContext.cancelJobGroup(
                            f"dag:{self.dag_id}:{t.task_id}"
                        )
                if expired:
                    # give the cancellations a beat to surface
                    pending = [f for f, _, _ in expired if not f.done()]
                    if pending:
                        wait(pending, timeout=1.0)
                for fut, k, begun in expired:
                    t = self.tasks[k]
                    inflight.pop(fut, None)
                    done = set(done) - {fut}
                    killed = fut.done()
                    if not killed:
                        # can't be killed (pure-Python stall, or a
                        # Spark action slow to unwind): abandon the
                        # zombie — and never retry, a retry would run
                        # concurrently with it and interleave writes
                        abandoned.add(fut)
                    # an attempt that FINISHED past its deadline (even
                    # inside the grace window, even with a result) still
                    # failed its SLO — Airflow semantics: the task
                    # instance fails at the deadline. Killed attempts
                    # retry normally; zombies fail terminally.
                    dur = round(
                        report[k]["duration"] + (time.monotonic() - begun), 4
                    )
                    if killed and report[k]["attempts"] <= t.retries:
                        states[k] = PENDING
                        report[k]["state"] = PENDING
                        report[k]["duration"] = dur
                        report[k]["error"] = (
                            "execution_timeout: attempt exceeded "
                            f"{t.execution_timeout}s"
                        )
                        queued[k] = time.monotonic() + t.retry_delay
                    else:
                        states[k] = FAILED
                        report[k]["state"] = FAILED
                        report[k]["duration"] = dur
                        report[k]["error"] = (
                            "execution_timeout: attempt exceeded "
                            f"{t.execution_timeout}s"
                            + (
                                ""
                                if killed
                                else (
                                    " and could not be cancelled; "
                                    "abandoned without retry"
                                )
                            )
                        )
                for fut in done:
                    if fut not in inflight:
                        continue
                    k, submitted, holder = inflight.pop(fut)
                    started = holder["started"] or submitted
                    t = self.tasks[k]
                    err = fut.exception()
                    if err is None:
                        states[k] = SUCCESS
                        report[k].update(
                            state=SUCCESS,
                            duration=round(
                                report[k]["duration"]
                                + (time.monotonic() - started),
                                4,
                            ),
                            result=fut.result(),
                            error=None,
                        )
                    else:
                        self._settle(
                            t,
                            states,
                            report,
                            queued,
                            error=f"{type(err).__name__}: {err}",
                            started=started,
                        )
                propagate_upstream_failed()
                for k in [k for k in queued if states[k] == UPSTREAM_FAILED]:
                    queued.pop(k)
        finally:
            # nothing to shut down: attempts run on daemon threads, so
            # abandoned zombies neither block this return nor block
            # interpreter exit (their results are discarded)
            pass
        failed = [
            k
            for k, s in states.items()
            if s in (FAILED, UPSTREAM_FAILED, PENDING, RUNNING)
        ]
        out = {
            "dag_id": self.dag_id,
            "state": FAILED if failed else SUCCESS,
            "logical_date": (
                context["logical_date"].isoformat() if context else None
            ),
            "run_id": run_id,
            "tasks": report,
        }
        if failed and raise_on_failure:
            raise DagRunError(
                f"dag {self.dag_id}: tasks not successful: {sorted(failed)}"
            )
        return out

    def _settle(
        self, t: Task, states, report, queued, *, error: str, started: float
    ) -> None:
        """Record a failed attempt; re-queue with backoff or fail."""
        k = t.task_id
        report[k]["duration"] = round(
            report[k]["duration"] + (time.monotonic() - started), 4
        )
        report[k]["error"] = error
        if report[k]["attempts"] <= t.retries:
            states[k] = PENDING
            report[k]["state"] = PENDING
            queued[k] = time.monotonic() + t.retry_delay
        else:
            states[k] = FAILED
            report[k]["state"] = FAILED


def run_due(
    dag: Dag,
    *,
    now,
    last_logical_date=None,
    spark=None,
    raise_on_failure: bool = False,
):
    """One SCHEDULER TICK: run every logical date ``dag`` owes at
    ``now`` (per its schedule/start_date/catchup — the loop an Airflow
    scheduler heartbeat performs), sequentially ascending, and return
    ``(reports, new_last_logical_date)`` for the caller to persist as
    its scheduler state. A dag with no due runs returns ``([],
    last_logical_date)`` — ticks are idempotent between interval
    closes. With ``catchup=False`` the backlog collapses to the most
    recent due interval (Airflow semantics); replay skipped history
    explicitly with :func:`backfill`.

    Failure semantics (scheduler heartbeats default to not raising): a
    failed date's report lands in ``reports`` with ``state='failed'``
    and the tick STOPS there — ``new_last_logical_date`` advances only
    through the consecutive successes, so the next tick retries the
    failed date first instead of re-running the dates that already
    landed (progress is never lost, and later intervals never run
    ahead of a broken one — the same ordering the watermark idempotency
    contract needs). ``raise_on_failure=True`` raises
    :class:`DagRunError` AFTER the stop (for callers that alert on
    exceptions); the progress rule is identical — persist the state
    from the reports before re-raising if you need it, or leave the
    default and read the failed report."""
    due = dag.due_runs(now=now, last_logical_date=last_logical_date)
    new_last = (
        _as_dt(last_logical_date) if last_logical_date is not None else None
    )
    reports: list[dict] = []
    for ld in due:
        rep = dag.run(
            spark,
            raise_on_failure=False,
            logical_date=ld,
            run_type="scheduled",
        )
        reports.append(rep)
        if rep["state"] != SUCCESS:
            if raise_on_failure:
                raise DagRunError(
                    f"run_due {dag.dag_id}: logical date "
                    f"{ld.isoformat()} failed (completed "
                    f"{len(reports) - 1} earlier date(s) this tick)"
                )
            break
        new_last = ld
    return reports, new_last


def backfill(
    dag: Dag,
    start,
    end,
    *,
    spark=None,
    raise_on_failure: bool = True,
) -> list[dict]:
    """Replay every logical date in ``[start, end]`` through ``dag`` —
    the ``airflow dags backfill -s … -e …`` verb. Dates step by the
    dag's schedule interval (daily when unscheduled) and run
    SEQUENTIALLY in ascending order (Airflow's backfill
    ``max_active_runs=1`` default: interval N+1 must observe interval
    N's writes — the watermark idempotency contract depends on it).

    Idempotency belongs to the tasks, exactly as in Airflow: a task
    that keys its writes on the run's data interval and skips rows at
    or below its high watermark (``medallion_dag``'s bronze ingest)
    makes a REPLAYED date a no-op, so re-running a completed backfill
    lands nothing. Returns one run report per logical date; with
    ``raise_on_failure`` the backfill stops at the first failed date
    (later intervals must not run ahead of a broken one).
    """
    step = schedule_interval(
        dag.schedule if dag.schedule is not None else "@daily"
    )
    if step <= _dt.timedelta(0):
        raise ValueError(
            f"backfill: schedule interval must be positive, got {step} "
            "(a zero/negative step would replay the same logical date "
            "forever)"
        )
    ld = _as_dt(start)
    stop = _as_dt(end)
    if ld > stop:
        raise ValueError(f"backfill start {ld} is after end {stop}")
    reports: list[dict] = []
    while ld <= stop:
        reports.append(
            dag.run(
                spark,
                raise_on_failure=raise_on_failure,
                logical_date=ld,
                run_type="backfill",
            )
        )
        ld += step
    return reports


# ---------------------------------------------------------------------------
# reference-parity DAG factories
# ---------------------------------------------------------------------------

#: the reference's gold model groups (dbt --select gold.core /
#: gold.funnel / gold.traffic) mapped to this engine's mart names
GOLD_GROUPS: dict[str, list[str]] = {
    "core": [
        "gold_daily_sales_summary",
        "gold_product_performance",
        "gold_category_performance",
        "gold_user_rfm_segments",
    ],
    "funnel": ["gold_user_journey_funnel", "gold_conversion_funnel_daily"],
    "traffic": ["gold_hourly_traffic"],
}


def gold_aggregation_dag(pipeline, *, timeouts: bool = True) -> Dag:
    """The reference's DAG 04 (``dags/04_gold_aggregation.py:110``)::

        start >> [core, funnel, traffic] >> test >> docs >> end

    with its default ``retries=1`` and per-group ``execution_timeout``
    SLOs (20/15/10 min — ``dags/04_gold_aggregation.py:35,47,59``).
    The three groups genuinely build in parallel on the shared session.
    """
    dag = Dag("gold_aggregation", max_workers=4)
    slo = {"core": 1200.0, "funnel": 900.0, "traffic": 600.0}
    start = dag.task("start_gold_aggregation")
    groups = [
        dag.task(
            f"build_gold_{g}",
            (lambda names=names: pipeline.build_gold(only=names)),
            retries=1,
            retry_delay=0.0,
            execution_timeout=slo[g] if timeouts else None,
        )
        for g, names in GOLD_GROUPS.items()
    ]
    test = dag.task("test_gold", lambda: _test_gold(pipeline), retries=1)
    docs = dag.task("docs_generate", lambda: generate_docs(pipeline.catalog))
    end = dag.task("end_gold_aggregation")
    start >> groups >> test >> docs >> end
    return dag


def medallion_dag(
    pipeline, raw, source_file: str, *, event_time_col: str | None = None
) -> Dag:
    """End-to-end bronze → silver → gold as one graph (reference DAGs
    02→03→04 chained), with the silver 30-min SLO
    (``dags/03_silver_dbt_transformation.py:77``) and the reference's
    DAG-header scheduling contract (schedule/start_date/catchup —
    ``dags/02_bronze_ingestion_to_iceberg.py:56-61``).

    ``event_time_col`` turns the bronze ingest logical-date-aware: a
    dated run (``run(logical_date=…)`` or :func:`backfill`) ingests
    only the raw rows in its data interval that are past the bronze
    event-time watermark (``Pipeline.ingest_bronze_interval``), so a
    replayed date appends nothing while silver/gold rebuild from
    whatever bronze actually advanced — idempotent end to end. Undated
    runs (or ``event_time_col=None``) keep the full-batch ingest.
    """
    dag = Dag(
        "medallion",
        max_workers=4,
        schedule="@daily",
        start_date=_dt.date(2026, 1, 1),
        catchup=False,
    )

    def _ingest(context):
        if context is None or event_time_col is None:
            return pipeline.ingest_bronze(raw, source_file)
        return pipeline.ingest_bronze_interval(
            raw,
            source_file,
            event_time_col=event_time_col,
            interval_start=context["data_interval_start"],
            interval_end=context["data_interval_end"],
        )

    bronze = dag.task("bronze_ingest", _ingest, retries=1)
    fresh = dag.task(
        "bronze_freshness", lambda: pipeline.check_bronze_freshness()
    )
    silver = dag.task(
        "silver_build",
        lambda: pipeline.build_silver(),
        retries=1,
        execution_timeout=1800.0,
    )
    def _check_silver_gating():
        # violations must FAIL the task, or this node can't actually
        # gate the gold fan-out (dbt-test semantics)
        out = pipeline.check_silver()
        bad = {k: v for k, v in out.items() if v > 0}
        if bad:
            raise ValueError(f"silver data tests failed: {bad}")
        return out

    silver_test = dag.task("silver_test", _check_silver_gating)
    bronze >> fresh >> silver >> silver_test
    gold = gold_aggregation_dag(pipeline)
    # graft the gold graph in: silver tests gate the gold fan-out
    for t in gold.tasks.values():
        dag.add(t)
    silver_test >> gold.tasks["start_gold_aggregation"]
    return dag


def maintenance_dag(
    catalog,
    tables: list[str] | None = None,
    *,
    schedule="@daily",
    start_date=None,
    max_workers: int = 4,
    **policy,
) -> Dag:
    """The scheduled TABLE-SERVICE loop: one independent ``maintain``
    task per table (compact / fold MOR deletes / expire per the policy
    kwargs — see :meth:`Catalog.maintain`), fanned out across the
    worker pool since tables maintain independently. ``tables=None``
    resolves the catalog's full table list AT RUN TIME (each run sees
    tables created since the dag was built). Pair with
    :func:`run_due` / :func:`backfill` for the scheduler loop; sweeps
    are idempotent (a compacted table reports no actions next tick),
    so replays are safe."""
    dag = Dag(
        "table_maintenance",
        max_workers=max_workers,
        schedule=schedule,
        start_date=start_date or _dt.date(2026, 1, 1),
        catchup=False,
    )
    if tables is None:
        def sweep_all():
            # per-table failure isolation, same contract as the
            # explicit fan-out: one broken table must not starve the
            # rest of their compaction/expiry; failures surface in the
            # report AND fail the task (so the run is visibly red)
            out: dict[str, dict] = {}
            errors: dict[str, str] = {}
            for t in catalog.tables():
                try:
                    out[t] = catalog.maintain(t, **policy)
                except Exception as e:  # noqa: BLE001 - isolate per table
                    errors[t] = f"{type(e).__name__}: {e}"
            if errors:
                raise RuntimeError(
                    f"maintenance failed for {sorted(errors)}: {errors}; "
                    f"succeeded: {sorted(out)}"
                )
            return out

        dag.task("maintain_all", sweep_all)
        return dag
    start = dag.task("start_maintenance")
    end = dag.task("end_maintenance", trigger_rule="all_done")
    for t in tables:
        node = dag.task(
            f"maintain_{t}", (lambda t=t: catalog.maintain(t, **policy))
        )
        start >> node >> end
    return dag


def _test_gold(pipeline) -> dict:
    """Post-build gold data tests (the dbt ``test --select gold``
    analog): row presence + grain uniqueness per mart. Any violation
    RAISES — the reference's dbt-test Airflow task fails on any test
    failure, which is what lets the test node actually gate docs/
    downstream; a task that only returns counts can never gate."""
    from data_lakehouse_spark.operators import quality

    out: dict[str, int] = {}
    grain = {
        "gold_daily_sales_summary": ["sale_date"],
        "gold_product_performance": ["product_id"],
        "gold_category_performance": [
            "analysis_date",
            "category_level_1",
            "category_level_2",
        ],
        "gold_user_rfm_segments": ["user_id"],
        "gold_user_journey_funnel": ["user_id"],
        "gold_conversion_funnel_daily": [
            "analysis_date",
            "category_level_1",
            "category_level_2",
            "time_of_day",
            "is_weekend",
        ],
        "gold_hourly_traffic": ["event_date", "event_hour"],
    }
    for name, keys in grain.items():
        if not pipeline.catalog.table_exists(name):
            continue
        df = pipeline.catalog.read(name)
        from pyspark.sql import functions as F

        def unique_grain(d, keys=keys):
            # group on the ACTUAL key columns — string concatenation
            # can alias distinct grains ('a','bc' vs 'ab','c') and
            # concat_ws silently skips NULL components
            return d.groupBy(*keys).count().filter(F.col("count") > 1).count()

        checks = [
            ("not_null", lambda d: quality.check_not_null(d, keys[0])),
            ("unique_grain", unique_grain),
        ]
        out.update(
            {
                f"{name}.{k}": v
                for k, v in quality.run_checks(df, checks).items()
            }
        )
    bad = {k: v for k, v in out.items() if v > 0}
    if bad:
        raise ValueError(f"gold data tests failed: {bad}")
    return out


def generate_docs(catalog) -> dict:
    """The ``dbt docs generate`` analog: one JSON-able manifest of every
    table — schema, partitioning, current version, row count — straight
    from the catalog (no separate metadata store to drift)."""
    docs: dict[str, dict] = {}
    for name in catalog.tables():
        df = catalog.read(name)
        docs[name] = {
            "columns": {f.name: f.dataType.simpleString() for f in df.schema},
            "version": catalog.current_version(name),
            "rows": df.count(),
        }
    return docs
