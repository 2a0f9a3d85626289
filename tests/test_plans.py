"""Physical-plan shape assertions: the 100 TB design claims (pushdown,
column pruning, broadcast joins, bounded shuffles, top-k rewrite) hold
in the plans Catalyst actually produces, not just in docstrings."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from data_lakehouse_spark.operators.silver import silver_events  # noqa: E402
from data_lakehouse_spark.sources.readers import load_tables  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_prunes_and_pushes_down(spark, sf_dir):
    df = entry.q_tpch_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    # column pruning: the 16-column lineitem scan reads only what Q1 needs
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "l_comment" not in scan and "l_suppkey" not in scan
    # predicate pushdown reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_top_customers_broadcasts_dims(spark, sf_dir):
    plan = _plan(entry.q_top_customers(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2  # customer + nation
    assert "SortMergeJoin" not in plan


def test_top_k_plans_take_ordered(spark, sf_dir):
    plan = _plan(entry.q_top_customers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_silver_dedup_is_single_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(silver_events(events))
    # one hash-partition exchange for the dedup window, nothing else
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange rangepartitioning") == 0


def test_gold_agg_has_partial_aggregation(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from data_lakehouse_spark.operators import gold

    plan = _plan(gold.hourly_traffic(silver_events(events), cart_type="click"))
    # map-side partial agg before the exchange (partial_ or merge_ phase)
    assert "partial_" in plan or "merge_" in plan


def test_semi_anti_join_operators(spark, sf_dir):
    plan = _plan(entry.q_customers_without_orders(spark, sf_dir))
    assert "LeftAnti" in plan
    plan = _plan(entry.q_priority_with_returns(spark, sf_dir))
    assert "LeftSemi" in plan


def test_watermark_folds_to_literal_filter(spark, sf_dir):
    """The incremental watermark is reduced driver-side and lands in the
    scan as a comparable literal (min/max skipping applies)."""
    from data_lakehouse_spark.operators import relational

    orders = load_tables(spark, sf_dir, ["orders"], register_views=False)["orders"]
    wm_src = orders.filter(F.col("o_orderstatus") == "P")
    fresh = relational.watermark_filter(
        orders, wm_src, "o_orderdate", F.col("o_orderdate")
    )
    plan = _plan(fresh)
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate" in plan
