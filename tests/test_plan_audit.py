"""Whole-surface plan audit: every `queries()` entry is planned and
swept for the two 100 TB scale killers —

1. single-partition funnels (`SinglePartition` exchanges / unpartitioned
   windows): all data through one task;
2. nested-loop / cartesian joins: O(n·m) comparisons.

Each occurrence must be WHITELISTED here with a justification that its
input is bounded (post-aggregation row counts, top-k results, per-chunk
offset tables, broadcast scalars). A new query that introduces an
unbounded funnel or cross product fails this test until it is either
fixed or explicitly justified — the discipline the per-query plan tests
pin for flagships, enforced surface-wide.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402

#: query -> justification for a SinglePartition exchange in its plan.
#: "bounded:" = the single-partition input is provably small.
SINGLE_PARTITION_OK = {
    # single-row global aggregates (stats / ratios / watermark scalars)
    "tpch_q6_forecast_revenue": "bounded: single-row global agg",
    "tpch_q14_promo_effect": "bounded: single-row ratio agg",
    "tpch_q17_small_qty_revenue": "bounded: single-row result",
    "tpch_q19_discounted_revenue": "bounded: single-row revenue agg",
    "tpch_q15_top_supplier": "bounded: 1-row MAX fold over the revenue view",
    "tpch_q22_sales_opportunity": "bounded: 1-row AVG fold",
    "tpch_q11_important_parts": "bounded: 1-row fraction-of-total fold",
    "doc_bm25_search": "bounded: 1-row corpus-stats agg (N/avgdl/df)",
    "doc_lm_unigram_score": "bounded: 1-row token-total agg",
    "serving_business_metrics": "bounded: single-row grand totals",
    "funnel_step_timing": "bounded: 1-row timing-distribution agg over per-user firsts",
    "purchase_frequency": "bounded: share window over |distinct purchase counts| rows (post-agg)",
    "union_all_counts": "bounded: one count row per branch",
    # windows/sorts over post-aggregation or top-k outputs
    "event_type_share": "bounded: share window over |event types| rows",
    "doc_hybrid_rrf_search": "bounded: rank windows over two top-50 lists",
    "orders_daily_gapfill": "bounded: 2-row calendar endpoints agg",
    "events_hourly_interpolate": "bounded: 1-row spine-endpoint agg; series windows partition by event_type",
    "orders_rolling_7d": "bounded: RANGE frame over the per-day agg (≤ |days| rows)",
    "gold_user_rfm_segments_scalable": "bounded: 1-row percentile-boundary fold; scoring is approx, no global sort",
    # distributed prefix sums: the only total order is the per-chunk
    # offset table (n_chunks rows), never the data
    "corpus_pack_shards": "bounded: chunk-offset table (n_docs/chunk_span rows)",
    "corpus_pack_shards_shuffled": "bounded: 4096-bucket offset table",
    # round-5 corpus-selection tier
    "corpus_dsir_sample": (
        "bounded: 1-row token-total folds (partial-agg merges) + "
        "TakeOrdered final k — the LM tables broadcast, documents "
        "never funnel"
    ),
    "corpus_temperature_sample": (
        "bounded: 1-row (n_total, z) fold over the |sources|-row "
        "count table"
    ),
    "corpus_ccnet_buckets": (
        "percentile_disc cutoff agg receives ONE double per doc (16 "
        "bytes/doc — metadata-sized next to the corpus; the exact "
        "cut is what the oracle pins). At extreme doc counts swap "
        "approx_percentile, same operator shape"
    ),
    "corpus_ccnet_buckets_kn5": (
        "inherits corpus_ccnet_buckets' per-doc-score percentile_disc "
        "cutoff agg; the kn5 scorer itself is one model aggregation + "
        "an Arrow map stage, never a funnel"
    ),
    "corpus_pretrain_mix": (
        "inherits the LM 1-row folds and the CCNet per-doc-score "
        "cutoff agg; the document stream itself never single-partitions"
    ),
    "doc_lm_bigram_score": (
        "bounded: 1-row bigram-total fold (partial-agg merge); both "
        "model tables broadcast, bigram stream never funnels"
    ),
    "corpus_source_kl": (
        "bounded: 1-row grand-total fold over the re-aggregated token "
        "table; the (source, token) stream joins by token (hash)"
    ),
}

#: query -> justification for BroadcastNestedLoopJoin / CartesianProduct.
NESTED_LOOP_OK = {
    "region_nation_cross": "intentional CROSS JOIN demo: 5 x 25 dims",
    "orders_price_band_range_join": "range join vs literal band rows (broadcast side is the band table)",
    "active_user_stickiness": (
        "trailing-window range join: broadcast side is the distinct "
        "date spine (|days| rows), stream side is the collapsed "
        "(user, day) activity table — amplification bounded at 28x"
    ),
    "events_hourly_interpolate": "spine x distinct-types cross join: hours x |event types| rows, both bounded",
    "doc_bm25_search": "1-row corpus-stats broadcast (scalar cross join)",
    "doc_lm_unigram_score": "1-row total + 1-row OOV-floor broadcast",
    "doc_hybrid_rrf_search": "inherits the BM25 1-row stats broadcast",
    "gold_user_rfm_segments_scalable": "1-row percentile-boundary broadcast",
    "tpch_q22_sales_opportunity": "1-row AVG broadcast",
    "experiment_lift": "1-row control-stats broadcast across |variants| rows",
    "active_user_stickiness_hll": (
        "trailing-window range join over the per-day SKETCH table — "
        "|days| fixed-size rows on both sides, user count irrelevant"
    ),
    "tpch_q11_important_parts": "1-row fraction-of-total broadcast",
    "theta_audience_overlap": (
        "pairwise sketch join over |segments| rows (one fixed-size "
        "sketch per segment) — |segments|^2 sketch ops, never row data"
    ),
    # round-5 corpus-selection tier: the 1-row scalar-broadcast
    # pattern shared with doc_lm_unigram_score
    "corpus_dsir_sample": "two 1-row OOV-floor broadcasts (target + corpus LMs)",
    "corpus_ccnet_buckets": "1-row OOV floor + 1-row tercile-cutoff broadcast",
    "corpus_ccnet_buckets_kn5": "1-row tercile-cutoff broadcast (the CCNet cut pattern)",
    "corpus_temperature_sample": "1-row (n_total, z) broadcast across |sources| rows",
    "corpus_pretrain_mix": "inherits the LM/cutoff 1-row broadcasts; fraction table joins by source (hash)",
    "doc_lm_bigram_score": "1-row unseen-pair floor broadcast (the LM scalar cross-join pattern)",
    "corpus_source_kl": "1-row grand-total broadcast (the LM scalar cross-join pattern)",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            out[name] = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - surface as failure
            out[name] = f"PLANNING_ERROR: {exc}"
    return out


def test_every_query_plans(plans):
    errs = {k: v for k, v in plans.items() if v.startswith("PLANNING_ERROR")}
    assert not errs, errs


def test_single_partition_only_where_justified(plans):
    offenders = {
        name: "SinglePartition"
        for name, plan in plans.items()
        if "SinglePartition" in plan and name not in SINGLE_PARTITION_OK
    }
    assert not offenders, (
        f"unjustified single-partition funnels: {sorted(offenders)} — "
        "fix the plan or whitelist with a bounded-input justification"
    )


def test_nested_loop_joins_only_where_justified(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if (
            "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        )
        and name not in NESTED_LOOP_OK
    ]
    assert not offenders, (
        f"unjustified nested-loop/cartesian joins: {sorted(offenders)} — "
        "fix the join or whitelist with a bounded-side justification"
    )


def test_no_stale_whitelist_entries(plans):
    """Whitelists must shrink when plans improve: every whitelisted name
    still exists; entries whose plans no longer contain the pattern are
    flagged for removal."""
    known = set(entry.queries())
    assert set(SINGLE_PARTITION_OK) <= known
    assert set(NESTED_LOOP_OK) <= known
    stale_sp = [
        n for n in SINGLE_PARTITION_OK
        if n in plans and "SinglePartition" not in plans[n]
    ]
    stale_nl = [
        n for n in NESTED_LOOP_OK
        if n in plans
        and "BroadcastNestedLoopJoin" not in plans[n]
        and "CartesianProduct" not in plans[n]
    ]
    assert not stale_sp, f"remove stale SinglePartition whitelist: {stale_sp}"
    assert not stale_nl, f"remove stale nested-loop whitelist: {stale_nl}"
