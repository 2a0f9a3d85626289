"""Long-lived multi-client SQL endpoint — the engine's analog of the
reference's Spark Thrift Server serving dbt and BI clients
(``dbt/profiles.yml:5-9`` connects dbt to a thrift endpoint that
``spark/entrypoint.sh:30-55`` keeps running).

Architecture parity, protocol pragmatism: ONE long-lived driver
process owns the SparkSession and the registered catalog views; N
concurrent clients submit SQL and get result sets back. The idiomatic
Spark 4 transport would be Spark Connect (gRPC) — this environment
ships no gRPC/protobuf Python stack, so the endpoint speaks minimal
HTTP/JSON over the standard library instead. Client concurrency is
real: ``ThreadingHTTPServer`` hands each request its own thread and
``spark.sql`` is thread-safe on a shared session (each query gets its
own Spark job; the scheduler interleaves them — set
``spark.scheduler.mode=FAIR`` for latency fairness on a busy
endpoint).

API
---
- ``POST /sql`` body ``{"sql": "...", "limit": 1000,
  "session": "optional-name"}`` → ``{"columns": [...],
  "rows": [[...], ...], "n": int, "truncated": bool}``. Naming a
  ``session`` keeps a stateful router across requests — that is what
  carries ``BEGIN … COMMIT/ROLLBACK`` over the wire (the Thrift
  session analog): the transaction and its read-your-own-writes live
  on the named session, other clients read published snapshots until
  COMMIT. While any transaction is open, newly submitted statements
  serialize on the endpoint (RYOW temp views are global on the shared
  SparkSession); with none open, statements run fully parallel.
- ``GET /tables`` → ``{"tables": [...], "views": [...]}``
- ``GET /health`` → ``{"ok": true, ...}``
- ``GET /dashboard`` → the declarative BI bundle (serving.py): title,
  slug, layout, chart slugs
- ``GET /chart/<slug>`` → compile that chart spec to its SQL and run it
  against the LATEST marts — the live twin of the reference's Superset
  chart "warmup" (dags/06_superset_dashboard.py:514-531), except the
  tile's exact query is served, not a cache poke

Every request re-registers catalog views, so clients always see the
LATEST published snapshots (the endpoint serves reads; writes go
through the engine APIs and become visible at their commit).

Scale note: result sets are driver-materialized (``limit`` caps them,
default 1000, hard server cap) — this is a SERVING endpoint for
dashboards/dbt-style queries over marts, not a bulk-extract path; bulk
egress belongs in a sink (``sources/writers.py``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["SqlEndpoint"]

#: hard ceiling on rows returned per request, whatever the client asks
MAX_ROWS = 100_000


class SqlEndpoint:
    """Serve ``catalog`` over HTTP/JSON on ``host:port`` (port 0 picks
    a free port — read it back from ``.port`` after ``start()``)."""

    def __init__(
        self,
        catalog,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        read_only: bool = False,
        assets=None,
    ):
        self.catalog = catalog
        #: declarative BI bundle served at /dashboard and /chart/<slug>
        #: (defaults to the reference-parity assets)
        if assets is None:
            from data_lakehouse_spark import serving as _serving

            assets = _serving.reference_assets()
        self.assets = assets
        #: True → reject DML/DDL/maintenance before execution (a
        #: dashboard-facing endpoint); default read-write, because the
        #: reference's Thrift endpoint is what dbt MATERIALIZES through
        #: (dbt/profiles.yml:5-9) — writes are the point.
        self.read_only = read_only
        self._lock = threading.Lock()  # view (re-)registration only
        #: named stateful SQL sessions (BEGIN…COMMIT over the wire —
        #: the Thrift-session analog). Keyed by the client-chosen
        #: ``"session"`` field of POST /sql.
        self._sessions: dict[str, object] = {}
        #: session ids with an OPEN transaction. While non-empty, every
        #: statement executes under the big lock: a transaction's
        #: read-your-own-writes temp views are session-global on the
        #: shared SparkSession, so serialization is what keeps other
        #: clients' reads on published snapshots. With no open
        #: transaction (the common case) statements run fully parallel,
        #: exactly as before.
        self._txn_open: set[str] = set()
        endpoint = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet: no stderr spam
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"ok": True})
                elif self.path == "/tables":
                    self._json(
                        200,
                        {
                            "tables": endpoint.catalog.tables(),
                            "views": sorted(endpoint.catalog.views()),
                        },
                    )
                elif self.path == "/dashboard":
                    dash = endpoint.assets.dashboard
                    self._json(
                        200,
                        {
                            "title": dash.title,
                            "slug": dash.slug,
                            "charts": {
                                _chart_slug(c.name): {
                                    "name": c.name,
                                    "viz_type": c.viz_type,
                                    "dataset": c.dataset_key,
                                    "position": dash.layout.get(c.name),
                                }
                                for c in endpoint.assets.charts
                            },
                        },
                    )
                elif self.path.startswith("/chart/"):
                    slug = self.path[len("/chart/"):]
                    try:
                        self._json(200, endpoint.run_chart(slug))
                    except KeyError:
                        self._json(404, {"error": f"no chart {slug!r}"})
                    except Exception as e:
                        self._json(400, {"error": str(e).split("\n")[0]})
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/sql":
                    self._json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    sql = req["sql"]
                    limit = min(int(req.get("limit", 1000)), MAX_ROWS)
                    session = req.get("session")
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                try:
                    self._json(
                        200, endpoint.execute(sql, limit, session=session)
                    )
                except Exception as e:  # surface analysis errors to client
                    self._json(400, {"error": str(e).split("\n")[0]})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def execute(
        self, sql: str, limit: int = 1000, *, session: str | None = None
    ) -> dict:
        """Route one SQL statement through the dialect router
        (:mod:`data_lakehouse_spark.sql`): queries return a JSON-able
        result set; DML/DDL/maintenance dispatch to the catalog's
        transactional verbs and return their commit stats — the full
        dbt-over-Thrift statement surface, not just SELECT.

        ``session`` names a stateful router kept across requests, which
        is what makes ``BEGIN … COMMIT/ROLLBACK`` work over the wire:
        the transaction (and its read-your-own-writes) lives on the
        named session; other sessions keep reading published snapshots
        until COMMIT."""
        from data_lakehouse_spark.sql import LakehouseSql, SqlError, is_query

        if self.read_only and not is_query(sql):
            raise SqlError("endpoint is read-only: only queries accepted")
        if session is not None:
            with self._lock:
                if session not in self._sessions:
                    if len(self._sessions) >= 128:
                        raise SqlError(
                            "too many named sessions (128); reuse or "
                            "close transactions"
                        )
                    self._sessions[session] = LakehouseSql(self.catalog)
                router = self._sessions[session]
        else:
            router = LakehouseSql(self.catalog)
        serialize = bool(self._txn_open)
        if serialize:
            self._lock.acquire()
        try:
            if not serialize:
                with self._lock:
                    # re-register so every query sees the latest
                    # snapshots; locked because two threads
                    # re-registering the same view name concurrently is
                    # a needless race (queries themselves run unlocked
                    # and in parallel)
                    self.catalog.register_views()
            else:
                self.catalog.register_views()
            result = router.execute(sql)
        finally:
            if serialize:
                self._lock.release()
        with self._lock:
            if session is not None:
                if router._txn is not None:
                    self._txn_open.add(session)
                elif session in self._txn_open:
                    # transaction just resolved: re-register published
                    # snapshots so its RYOW temp views stop shadowing
                    self._txn_open.discard(session)
                    self.catalog.register_views()
        if isinstance(result, dict):  # DML/DDL commit stats
            return {
                "columns": ["key", "value"],
                "rows": [
                    [k, _plain(v)] for k, v in result.items()
                ],
                "n": len(result),
                "truncated": False,
                "stats": {k: _plain(v) for k, v in result.items()},
            }
        df = result
        rows = df.limit(limit + 1).collect()
        truncated = len(rows) > limit
        rows = rows[:limit]
        return {
            "columns": df.columns,
            "rows": [[_plain(v) for v in r] for r in rows],
            "n": len(rows),
            "truncated": truncated,
        }

    def run_chart(self, slug: str) -> dict:
        """Compile the chart spec to its ONE deterministic SQL statement
        (serving.compile_chart) and execute it against the latest
        registered marts. Raises ``KeyError`` for an unknown slug."""
        from data_lakehouse_spark import serving as _serving

        for chart in self.assets.charts:
            if _chart_slug(chart.name) == slug:
                stmt = _serving.compile_chart(
                    chart, self.assets.dataset(chart.dataset_key)
                )
                out = self.execute(stmt, limit=max(chart.row_limit, 1))
                out["chart"] = chart.name
                out["sql"] = stmt
                return out
        raise KeyError(slug)

    def start(self) -> "SqlEndpoint":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)

    def serve_forever(self) -> None:
        """Foreground variant for the CLI ``serve`` subcommand."""
        self._server.serve_forever()


def _chart_slug(name: str) -> str:
    import re

    return re.sub(r"[^0-9a-zA-Z]+", "-", name).strip("-").lower()


def _plain(v):
    """JSON-safe rendering of a Spark row value."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode("ascii")
    if isinstance(v, list):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    try:  # Row (struct)
        return {k: _plain(x) for k, x in v.asDict().items()}
    except AttributeError:
        return v
