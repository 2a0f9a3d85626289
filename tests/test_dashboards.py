"""BI/serving asset layer (data_lakehouse_spark/serving.py).

The reference provisions 6 datasets / 7 charts / 1 dashboard against a
live Superset (dags/06_superset_dashboard.py:88-281,462-512); here the
same assets are declarative specs whose charts COMPILE to executable
SQL and whose bundle exports to Superset's import format.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import pytest
import yaml

from data_lakehouse_spark import serving
from data_lakehouse_spark.operators import gold
from data_lakehouse_spark.operators.silver import silver_events


@pytest.fixture(scope="module")
def assets() -> serving.ServingAssets:
    return serving.reference_assets()


@pytest.fixture(scope="module")
def mart_views(spark, sf_dir):
    silver = silver_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return {
        "gold_daily_sales_summary": gold.daily_sales_summary(
            silver, cart_type="click"
        ),
        "gold_conversion_funnel_daily": gold.conversion_funnel_daily(
            silver, cart_type="click"
        ),
        "gold_product_performance": gold.product_performance(
            silver, cart_type="click", as_of_date="2024-02-01",
            product_col="prop_k",
        ),
        "gold_user_rfm_segments": gold.user_rfm_segments(
            silver, as_of_date="2024-02-01"
        ),
        "gold_hourly_traffic": gold.hourly_traffic(silver, cart_type="click"),
        "gold_category_performance": gold.category_performance(silver),
    }


def test_reference_parity_counts(assets):
    # dags/06: 6 DATASETS entries, 7 CHARTS entries, one dashboard
    assert len(assets.datasets) == 6
    assert len(assets.charts) == 7
    assert assets.dashboard.slug == "ecommerce-lakehouse-analytics"
    # every chart's dataset resolves
    for ch in assets.charts:
        assets.dataset(ch.dataset_key)


def test_validate_assets_green(spark, assets, mart_views):
    report = serving.validate_assets(spark, assets, views=mart_views)
    assert report["errors"] == []
    # every chart executed and returned a row count
    assert set(report["charts"]) == {c.name for c in assets.charts}
    # the fixture has purchases on every day, so the KPI line has rows
    assert report["charts"]["Daily Revenue & Orders"] > 0
    # category columns are NULL in the fixture: the treemap runs but
    # its NOT NULL dataset filter leaves it empty — still a pass
    assert report["charts"]["Category Revenue Treemap"] == 0


def test_compiled_chart_is_deterministic_and_limited(spark, assets, mart_views):
    for name, df in mart_views.items():
        df.createOrReplaceTempView(name)
    ch = next(c for c in assets.charts if c.name == "Top 10 Products by Revenue")
    stmt = serving.compile_chart(ch, assets.dataset(ch.dataset_key))
    assert "LIMIT 10" in stmt
    # ranked + tiebroken: explicit metric order then the dimension
    assert "ORDER BY revenue DESC, product_id ASC" in stmt
    rows = spark.sql(stmt).collect()
    assert len(rows) <= 10
    rev = [r["revenue"] for r in rows]
    assert rev == sorted(rev, reverse=True)


def test_pivot_compiles_long_form(assets):
    ch = next(c for c in assets.charts if c.viz_type == "pivot_table")
    stmt = serving.compile_chart(ch, assets.dataset(ch.dataset_key))
    # rows ⊕ columns both group; presentation pivot is client-side
    assert "GROUP BY event_hour, day_of_week" in stmt


def test_compile_rejects_bad_specs(assets):
    ds = assets.dataset("daily_sales")
    with pytest.raises(ValueError, match="viz_type"):
        serving.compile_chart(
            serving.Chart(
                name="x", dataset_key="daily_sales", viz_type="gauge",
                dimensions=("sale_date",),
                metrics=(serving.Metric("m", "SUM(total_orders)"),),
            ),
            ds,
        )
    with pytest.raises(ValueError, match="metric"):
        serving.compile_chart(
            serving.Chart(
                name="x", dataset_key="daily_sales", viz_type="line",
                dimensions=("sale_date",),
            ),
            ds,
        )
    with pytest.raises(ValueError, match="duplicate"):
        serving.compile_chart(
            serving.Chart(
                name="x", dataset_key="daily_sales", viz_type="line",
                dimensions=("sale_date",),
                metrics=(
                    serving.Metric("Total Revenue", "SUM(total_revenue)"),
                    serving.Metric("total revenue", "SUM(total_orders)"),
                ),
            ),
            ds,
        )


def test_layout_validation_catches_overlap(spark, assets, mart_views):
    bad = serving.ServingAssets(
        datasets=assets.datasets,
        charts=assets.charts,
        dashboard=serving.Dashboard(
            title="t",
            slug="s",
            layout={
                **assets.dashboard.layout,
                # collide with "Daily Revenue & Orders" at (0, 0, 18, 6)
                "Abandonment vs Conversion Rate": (10, 0, 18, 6),
            },
        ),
    )
    report = serving.validate_assets(spark, bad, views=mart_views, run=False)
    assert any("overlap" in e for e in report["errors"])


def test_bundle_export_layout_and_determinism(assets, tmp_path):
    out1 = tmp_path / "b1"
    out2 = tmp_path / "b2"
    w1 = serving.export_superset_bundle(assets, out1)
    w2 = serving.export_superset_bundle(assets, out2)
    rel1 = sorted(str(Path(p).relative_to(out1)) for p in w1)
    rel2 = sorted(str(Path(p).relative_to(out2)) for p in w2)
    assert rel1 == rel2
    assert "metadata.yaml" in rel1
    assert any(p.startswith("databases/") for p in rel1)
    assert sum(p.startswith("datasets/") for p in rel1) == 6
    assert sum(p.startswith("charts/") for p in rel1) == 7
    assert sum(p.startswith("dashboards/") for p in rel1) == 1
    # deterministic UUIDs: identical bundle bytes across exports
    for rel in rel1:
        if rel.endswith(".zip"):
            continue
        assert (out1 / rel).read_text() == (out2 / rel).read_text()

    # referential integrity: chart dataset_uuids resolve, dashboard
    # position references every chart uuid
    ds_uuids = set()
    for p in (out1 / "datasets").rglob("*.yaml"):
        ds_uuids.add(yaml.safe_load(p.read_text())["uuid"])
    chart_uuids = set()
    for p in (out1 / "charts").glob("*.yaml"):
        doc = yaml.safe_load(p.read_text())
        assert doc["dataset_uuid"] in ds_uuids
        json.loads(doc["params"])  # params must be valid JSON
        chart_uuids.add(doc["uuid"])
    dash = yaml.safe_load(
        next((out1 / "dashboards").glob("*.yaml")).read_text()
    )
    pos_uuids = {
        v["meta"]["uuid"]
        for v in dash["position"].values()
        if isinstance(v, dict) and v.get("type") == "CHART"
    }
    assert pos_uuids == chart_uuids

    # the zip carries the same tree
    with zipfile.ZipFile(out1 / "bundle.zip") as z:
        assert sorted(z.namelist()) == sorted(
            p for p in rel1 if not p.endswith(".zip")
        )


def test_gate_charts_share_compiled_sql(spark, sf_dir):
    """The oracle gates run the exact compiled statement via temp
    views — pin that the Spark result column set matches the spec."""
    import __spark_entry__ as entry

    for key in entry._SERVING_GATE_CHARTS:
        df = entry.queries()[key](spark, sf_dir)
        _, chart = entry._SERVING_GATE_CHARTS[key]
        want = (
            list(chart.dimensions)
            + list(chart.pivot_columns)
            + [m.alias for m in chart.metrics]
        )
        assert df.columns == want
        assert df.count() > 0
