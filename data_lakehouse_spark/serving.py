"""Declarative BI / serving asset layer — the Superset-parity tier.

The reference provisions its BI surface imperatively against a live
Superset server (reference: dags/06_superset_dashboard.py — 6 SQL
datasets at :88-163, 7 charts at :181-280, one positioned dashboard at
:462-478, idempotent create-or-update CRUD at :392-460).  This module
re-expresses that surface as DATA:

* :class:`Dataset` / :class:`Chart` / :class:`Dashboard` specs are plain
  frozen dataclasses — versionable, diffable, testable without a BI
  server in the loop.
* Every chart COMPILES to one deterministic ANSI aggregate statement
  (:func:`compile_chart`), so the exact query a tile renders is
  executable on the engine (``spark.sql``) AND on an external oracle —
  the reference can only "warm" charts through Superset's HTTP layer
  (dags/06:514-531) and never sees the SQL it will run.
* :func:`export_superset_bundle` emits the standard Superset
  import-bundle layout (``metadata.yaml`` + ``databases/`` +
  ``datasets/`` + ``charts/`` + ``dashboards/`` + a zip), with
  deterministic UUIDs, so the assets can still be loaded into a real
  Superset (``superset import-dashboards``) — idempotently, like the
  reference's find-then-create loops (dags/06:372-390).

Scale note: chart compilation happens entirely on the driver (string
assembly over specs); the compiled statements are ordinary grouped
aggregates over the gold marts, which are already small serving tables —
nothing here adds a scan or shuffle beyond the chart's own GROUP BY.
"""

from __future__ import annotations

import json
import re
import uuid
import zipfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "Dataset",
    "Metric",
    "Chart",
    "Dashboard",
    "ServingAssets",
    "reference_assets",
    "compile_chart",
    "validate_assets",
    "export_superset_bundle",
]

#: Chart forms the compiler understands.  Superset viz plugins differ in
#: control keys (dags/06:168-176 keeps fallback keys for that reason);
#: for compilation they all reduce to "dimensions + metrics + order +
#: limit" — pivot/heatmap tables emit the LONG form (rows ⊕ columns as
#: grouping keys); the pivot to a wide grid is presentation, which is
#: exactly how Superset itself treats it (the server sends long rows).
VIZ_TYPES = ("line", "bar", "pie", "pivot_table", "treemap")


@dataclass(frozen=True)
class Dataset:
    """A virtual dataset: a name + the SQL that defines it (the
    reference's ``DATASETS`` entries, dags/06:88-163)."""

    key: str
    name: str
    sql: str


@dataclass(frozen=True)
class Metric:
    """A SQL-expression metric (``sql_metric``, dags/06:177-178)."""

    label: str
    sql: str

    @property
    def alias(self) -> str:
        """Stable snake_case column name for the compiled statement."""
        slug = re.sub(r"[^0-9a-zA-Z]+", "_", self.label).strip("_").lower()
        return slug or "metric"


@dataclass(frozen=True)
class Chart:
    """One tile: dataset + viz form + grouping + metrics.

    ``dimensions`` are the grouping columns (``groupby`` / ``x_axis`` /
    pivot ``rows``); ``pivot_columns`` keeps the pivot's column axis
    separate so the bundle export round-trips the original control set.
    ``order_by`` entries are SQL expressions (may reference metric
    aliases); compiled output always appends the dimensions as the final
    sort keys so every chart query is deterministically ordered.
    """

    name: str
    dataset_key: str
    viz_type: str
    dimensions: tuple[str, ...] = ()
    pivot_columns: tuple[str, ...] = ()
    metrics: tuple[Metric, ...] = ()
    row_limit: int = 1000
    order_by: tuple[str, ...] = ()


@dataclass(frozen=True)
class Dashboard:
    """A titled, slugged grid of charts (dags/06:481-512).

    ``layout`` maps chart name -> (x, y, w, h) on Superset's 48-wide
    grid, mirroring ``_build_position_json`` (dags/06:462-478).
    """

    title: str
    slug: str
    layout: dict[str, tuple[int, int, int, int]] = field(default_factory=dict)


@dataclass(frozen=True)
class ServingAssets:
    """The full bundle: what dags/06 creates server-side, as one value."""

    datasets: tuple[Dataset, ...]
    charts: tuple[Chart, ...]
    dashboard: Dashboard

    def dataset(self, key: str) -> Dataset:
        for d in self.datasets:
            if d.key == key:
                return d
        raise KeyError(f"unknown dataset key: {key!r}")


# --------------------------------------------------------------------------
# The reference-parity asset bundle
# --------------------------------------------------------------------------

def reference_assets() -> ServingAssets:
    """The reference dashboard re-expressed over the engine's gold marts.

    Dataset SQL bodies project the same columns the reference's atomic
    datasets expose (dags/06:88-163) but read the engine's mart views
    (``gold_*`` — the ClickHouse copies ``lakehouse.*`` are the same
    seven marts, clickhouse/create_tables.sql:7-232).  Charts mirror
    dags/06:181-280 one-for-one; the layout mirrors :462-478.
    """
    datasets = (
        Dataset(
            "daily_sales",
            "Daily Sales Atomic",
            "SELECT sale_date, total_revenue, total_orders, avg_order_value,"
            " conversion_rate, cart_abandonment_rate, total_carts"
            " FROM gold_daily_sales_summary",
        ),
        Dataset(
            "funnel_daily",
            "Conversion Funnel Atomic",
            "SELECT analysis_date, stage_1_view_users, stage_2_cart_users,"
            " stage_3_purchase_users FROM gold_conversion_funnel_daily",
        ),
        Dataset(
            "product_perf",
            "Product Performance Atomic",
            "SELECT product_id, brand, category_level_1, total_revenue"
            " FROM gold_product_performance",
        ),
        Dataset(
            "rfm",
            "RFM Atomic",
            "SELECT user_id, rfm_segment, monetary_value"
            " FROM gold_user_rfm_segments WHERE rfm_segment IS NOT NULL",
        ),
        Dataset(
            "hourly",
            "Hourly Traffic Atomic",
            "SELECT event_hour, day_of_week, total_events"
            " FROM gold_hourly_traffic",
        ),
        Dataset(
            "category_perf",
            "Category Performance Atomic",
            "SELECT category_level_1, category_level_2, total_revenue"
            " FROM gold_category_performance"
            " WHERE category_level_1 IS NOT NULL",
        ),
    )
    charts = (
        Chart(
            name="Daily Revenue & Orders",
            dataset_key="daily_sales",
            viz_type="line",
            dimensions=("sale_date",),
            metrics=(
                Metric("Revenue", "SUM(total_revenue)"),
                Metric("Orders", "SUM(total_orders)"),
            ),
            row_limit=1000,
        ),
        Chart(
            name="Conversion Funnel (Users)",
            dataset_key="funnel_daily",
            viz_type="bar",
            dimensions=("analysis_date",),
            metrics=(
                Metric("Views", "SUM(stage_1_view_users)"),
                Metric("Carts", "SUM(stage_2_cart_users)"),
                Metric("Purchases", "SUM(stage_3_purchase_users)"),
            ),
            row_limit=60,
        ),
        Chart(
            name="Top 10 Products by Revenue",
            dataset_key="product_perf",
            viz_type="bar",
            dimensions=("product_id",),
            metrics=(Metric("Revenue", "SUM(total_revenue)"),),
            row_limit=10,
            order_by=("revenue DESC",),
        ),
        Chart(
            name="RFM Segments (Customer Count)",
            dataset_key="rfm",
            viz_type="pie",
            dimensions=("rfm_segment",),
            metrics=(Metric("Customers", "COUNT(user_id)"),),
            row_limit=50,
        ),
        Chart(
            name="Hourly Traffic Heatmap",
            dataset_key="hourly",
            viz_type="pivot_table",
            dimensions=("event_hour",),
            pivot_columns=("day_of_week",),
            metrics=(Metric("Events", "SUM(total_events)"),),
            row_limit=500,
        ),
        Chart(
            name="Category Revenue Treemap",
            dataset_key="category_perf",
            viz_type="treemap",
            dimensions=("category_level_1", "category_level_2"),
            metrics=(Metric("Revenue", "SUM(total_revenue)"),),
            row_limit=15,
            order_by=("revenue DESC",),
        ),
        Chart(
            name="Abandonment vs Conversion Rate",
            dataset_key="daily_sales",
            viz_type="line",
            dimensions=("sale_date",),
            metrics=(
                Metric("Abandonment", "AVG(cart_abandonment_rate)"),
                Metric("Conversion", "AVG(conversion_rate)"),
            ),
            row_limit=1000,
        ),
    )
    # dags/06:462-478 — two half-width KPIs, full-width funnel, two
    # half-width breakdowns, full-width heatmap, full-width treemap.
    layout = {
        "Daily Revenue & Orders": (0, 0, 18, 6),
        "Abandonment vs Conversion Rate": (18, 0, 18, 6),
        "Conversion Funnel (Users)": (0, 6, 36, 7),
        "Top 10 Products by Revenue": (0, 13, 18, 7),
        "RFM Segments (Customer Count)": (18, 13, 18, 7),
        "Hourly Traffic Heatmap": (0, 20, 36, 7),
        "Category Revenue Treemap": (0, 27, 36, 8),
    }
    dashboard = Dashboard(
        title="E-Commerce Lakehouse Analytics",
        slug="ecommerce-lakehouse-analytics",
        layout=layout,
    )
    return ServingAssets(datasets=datasets, charts=charts, dashboard=dashboard)


# --------------------------------------------------------------------------
# Chart compilation
# --------------------------------------------------------------------------

def compile_chart(chart: Chart, dataset: Dataset) -> str:
    """Compile a chart spec to ONE deterministic ANSI SQL statement.

    The statement groups the dataset by the chart's dimensions (for a
    pivot, rows ⊕ columns), computes each metric under its stable alias,
    applies the chart's ordering (falling back to the first metric,
    descending, for ranked forms) and ALWAYS appends the dimensions as
    final sort keys — so ties cannot reorder between engines and the
    LIMIT keeps the same rows everywhere.  Runs unchanged on Spark SQL
    and on DuckDB (the oracle gate `serving_chart_*` queries pin that).
    """
    if chart.viz_type not in VIZ_TYPES:
        raise ValueError(
            f"chart {chart.name!r}: unknown viz_type {chart.viz_type!r}"
        )
    if not chart.metrics:
        raise ValueError(f"chart {chart.name!r}: at least one metric required")
    dims = tuple(chart.dimensions) + tuple(chart.pivot_columns)
    select = [f"{d}" for d in dims]
    select += [f"{m.sql} AS {m.alias}" for m in chart.metrics]
    aliases = [m.alias for m in chart.metrics]
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"chart {chart.name!r}: duplicate metric aliases")
    order: list[str] = list(chart.order_by)
    if not order and chart.viz_type in ("pie", "treemap"):
        # ranked forms default to biggest-first like Superset's
        # order_desc (dags/06:229-233)
        order = [f"{chart.metrics[0].alias} DESC"]
    order += [f"{d} ASC" for d in dims]
    sql = [
        "SELECT " + ", ".join(select),
        f"FROM ({dataset.sql}) AS _ds",
    ]
    if dims:
        sql.append("GROUP BY " + ", ".join(dims))
    sql.append("ORDER BY " + ", ".join(order))
    sql.append(f"LIMIT {int(chart.row_limit)}")
    return "\n".join(sql)


# --------------------------------------------------------------------------
# Validation
# --------------------------------------------------------------------------

def validate_assets(
    spark: SparkSession,
    assets: ServingAssets,
    *,
    views: dict[str, DataFrame] | None = None,
    run: bool = True,
) -> dict:
    """Validate the bundle end to end against a live session.

    * registers ``views`` (mart name -> DataFrame) as temp views,
    * runs every dataset's SQL and records its schema,
    * compiles every chart and (``run=True``) executes the compiled
      statement, checking the result carries dimension + metric columns,
    * checks the dashboard layout references exactly the defined charts
      and that no two tiles overlap on the grid.

    Returns ``{"datasets": {key: [cols]}, "charts": {name: rows|None},
    "errors": [...]}`` — empty ``errors`` is the pass signal.  This is
    the engine-side analog of the reference's ``verify_end_to_end``
    (dags/06:533-553), which can only count HTTP 200s.
    """
    errors: list[str] = []
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)

    ds_cols: dict[str, list[str]] = {}
    for ds in assets.datasets:
        try:
            ds_cols[ds.key] = spark.sql(ds.sql).columns
        except Exception as e:  # noqa: BLE001 — collect, report all
            errors.append(f"dataset {ds.key}: {e}")

    chart_rows: dict[str, int | None] = {}
    for ch in assets.charts:
        try:
            ds = assets.dataset(ch.dataset_key)
        except KeyError as e:
            errors.append(f"chart {ch.name}: {e}")
            continue
        cols = ds_cols.get(ch.dataset_key)
        if cols is not None:
            missing = [
                d
                for d in (*ch.dimensions, *ch.pivot_columns)
                if d not in cols
            ]
            if missing:
                errors.append(
                    f"chart {ch.name}: dimensions {missing} not in dataset "
                    f"{ch.dataset_key} columns {cols}"
                )
                continue
        try:
            stmt = compile_chart(ch, ds)
            if run:
                out = spark.sql(stmt)
                want = (
                    list(ch.dimensions)
                    + list(ch.pivot_columns)
                    + [m.alias for m in ch.metrics]
                )
                if out.columns != want:
                    errors.append(
                        f"chart {ch.name}: compiled columns {out.columns} "
                        f"!= expected {want}"
                    )
                chart_rows[ch.name] = out.count()
            else:
                chart_rows[ch.name] = None
        except Exception as e:  # noqa: BLE001
            errors.append(f"chart {ch.name}: {e}")

    chart_names = {c.name for c in assets.charts}
    laid_out = set(assets.dashboard.layout)
    if laid_out != chart_names:
        errors.append(
            f"dashboard layout mismatch: missing={sorted(chart_names - laid_out)} "
            f"unknown={sorted(laid_out - chart_names)}"
        )
    boxes = list(assets.dashboard.layout.items())
    for i, (na, (xa, ya, wa, ha)) in enumerate(boxes):
        if wa <= 0 or ha <= 0 or xa < 0 or ya < 0 or xa + wa > 48:
            errors.append(f"dashboard tile {na}: invalid box {(xa, ya, wa, ha)}")
        for nb, (xb, yb, wb, hb) in boxes[i + 1:]:
            if xa < xb + wb and xb < xa + wa and ya < yb + hb and yb < ya + ha:
                errors.append(f"dashboard tiles overlap: {na} / {nb}")

    return {"datasets": ds_cols, "charts": chart_rows, "errors": errors}


# --------------------------------------------------------------------------
# Superset import-bundle export
# --------------------------------------------------------------------------

_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 ns:URL


def _uuid(kind: str, key: str) -> str:
    """Deterministic asset UUID — re-exporting yields an identical
    bundle (the declarative twin of the reference's find-then-update
    idempotency, dags/06:372-390)."""
    return str(uuid.uuid5(_NS, f"data-lakehouse-spark/{kind}/{key}"))


def _yaml(obj: dict) -> str:
    import yaml

    return yaml.safe_dump(obj, sort_keys=False, allow_unicode=True)


def export_superset_bundle(
    assets: ServingAssets,
    out_dir: str | Path,
    *,
    database_name: str = "Lakehouse SQL Endpoint",
    sqlalchemy_uri: str = "lakehouse://localhost:8000/default",
    make_zip: bool = True,
) -> list[str]:
    """Write the bundle in Superset's importable directory layout.

    Layout: ``metadata.yaml``, ``databases/<db>.yaml``,
    ``datasets/<db>/<key>.yaml`` (virtual datasets carrying the SQL),
    ``charts/<slug>.yaml`` (viz params as Superset expects them,
    including the fallback control keys the reference sets at
    dags/06:168-176), ``dashboards/<slug>.yaml`` with ``position`` built
    like ``_build_position_json`` (dags/06:462-478).  Returns the list
    of files written (bundle zip last when ``make_zip``).
    """
    root = Path(out_dir)
    root.mkdir(parents=True, exist_ok=True)
    written: list[str] = []

    def emit(rel: str, text: str) -> None:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)
        written.append(str(p))

    emit(
        "metadata.yaml",
        _yaml({"version": "1.0.0", "type": "Dashboard"}),
    )
    db_slug = re.sub(r"[^0-9a-zA-Z]+", "_", database_name).strip("_").lower()
    db_uuid = _uuid("database", db_slug)
    emit(
        f"databases/{db_slug}.yaml",
        _yaml(
            {
                "database_name": database_name,
                "sqlalchemy_uri": sqlalchemy_uri,
                "cache_timeout": None,
                "expose_in_sqllab": True,
                "uuid": db_uuid,
                "version": "1.0.0",
            }
        ),
    )
    ds_uuid: dict[str, str] = {}
    for ds in assets.datasets:
        ds_uuid[ds.key] = _uuid("dataset", ds.key)
        emit(
            f"datasets/{db_slug}/{ds.key}.yaml",
            _yaml(
                {
                    "table_name": ds.name,
                    "main_dttm_col": None,
                    "description": None,
                    "sql": ds.sql,
                    "cache_timeout": 300,  # CACHE_TIMEOUT, dags/06:28
                    "schema": None,
                    "uuid": ds_uuid[ds.key],
                    "database_uuid": db_uuid,
                    "version": "1.0.0",
                }
            ),
        )
    chart_uuid: dict[str, str] = {}
    for ch in assets.charts:
        slug = re.sub(r"[^0-9a-zA-Z]+", "_", ch.name).strip("_").lower()
        chart_uuid[ch.name] = _uuid("chart", slug)
        metrics = [
            {
                "label": m.label,
                "expressionType": "SQL",
                "sqlExpression": m.sql,
            }
            for m in ch.metrics
        ]
        params: dict = {"row_limit": ch.row_limit, "metrics": metrics}
        if ch.viz_type == "line":
            params["x_axis"] = ch.dimensions[0]
            params["x"] = ch.dimensions[0]  # fallback key, dags/06:176
        elif ch.viz_type == "pivot_table":
            params["rows"] = list(ch.dimensions)
            params["columns"] = list(ch.pivot_columns)
        else:
            params["groupby"] = list(ch.dimensions)
        if ch.viz_type == "pie":
            params["metric"] = metrics[0]
        if ch.order_by:
            params["order_by_cols"] = list(ch.order_by)
            params["order_desc"] = any(
                o.upper().endswith(" DESC") for o in ch.order_by
            )
        emit(
            f"charts/{slug}.yaml",
            _yaml(
                {
                    "slice_name": ch.name,
                    "viz_type": ch.viz_type,
                    "params": json.dumps(params, sort_keys=True),
                    "cache_timeout": 300,
                    "uuid": chart_uuid[ch.name],
                    "dataset_uuid": ds_uuid[ch.dataset_key],
                    "version": "1.0.0",
                }
            ),
        )
    position: dict = {
        "DASHBOARD_VERSION_KEY": "v2",
        "ROOT_ID": {"type": "ROOT", "id": "ROOT_ID", "children": ["GRID_ID"]},
        "GRID_ID": {
            "type": "GRID",
            "id": "GRID_ID",
            "children": [
                f"CHART-{chart_uuid[name][:8]}"
                for name in assets.dashboard.layout
            ],
        },
    }
    for name, (x, y, w, h) in assets.dashboard.layout.items():
        cid = f"CHART-{chart_uuid[name][:8]}"
        position[cid] = {
            "type": "CHART",
            "id": cid,
            "meta": {"uuid": chart_uuid[name], "width": w, "height": h},
            "position": {"x": x, "y": y, "w": w, "h": h},
        }
    emit(
        f"dashboards/{assets.dashboard.slug}.yaml",
        _yaml(
            {
                "dashboard_title": assets.dashboard.title,
                "slug": assets.dashboard.slug,
                "published": True,
                "position": position,
                "metadata": {"refresh_frequency": 0},
                "uuid": _uuid("dashboard", assets.dashboard.slug),
                "version": "1.0.0",
            }
        ),
    )
    if make_zip:
        zpath = root / "bundle.zip"
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for f in written:
                z.write(f, arcname=str(Path(f).relative_to(root)))
        written.append(str(zpath))
    return written
