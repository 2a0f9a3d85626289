"""Capture .explain('formatted') for round-12 target queries.

Usage: python tools/r12_plans.py <suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: the
round-12 optimization target set).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402

TARGETS = [
    "session_transitions",
    "user_sessions",
    "gold_conversion_funnel_daily",
    "gold_daily_sales_summary",
    "gold_user_journey_funnel",
    "gold_hourly_traffic",
    "active_user_stickiness",
    "new_vs_returning",
    "gold_category_performance",
    "doc_text_stats",
    "experiment_lift",
    "purchase_last_touch",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r12_plans")
    queries = entrymod.queries()
    os.makedirs("/root/repo/plans/r12", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"/root/repo/plans/r12/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
