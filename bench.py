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
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402

#: Queries timed at bench scale (all sf0.1-safe).
BENCH_QUERIES = [
    "silver_events",
    "gold_daily_sales_summary",
    "gold_product_performance",
    "gold_user_rfm_segments",
    "gold_user_journey_funnel",
    "gold_conversion_funnel_daily",
    "gold_hourly_traffic",
    "gold_category_performance",
    "tpch_pricing_summary",
    "top_customers",
    "priority_with_returns",
    "union_all_counts",
    "orders_rollup",
    "event_type_share",
    "hourly_tumbling",
    "user_sessions",
    "purchase_asof_cart",
    "window_battery",
    "event_type_pivot",
    "orders_cube",
    "part_category_split",
    "events_json_props",
    "monthly_sales_rollup",
    "segments_intersect_except",
    "doc_text_stats",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "minhash_lsh_candidates",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "approx_distinct_users",
    "multimodal_decode",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Warm the JVM (codegen, JIT, parquet footer cache) so per-query
    # timings measure the queries, not first-touch session overhead.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    queries["silver_events"](spark, sf_dir).limit(1).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
