"""Product-analytics tour over the events table — the behavioral-
analytics surface in one script, each stage a contract operator:

    funnel (K ordered steps) -> weekly retention cohorts -> Markov
    transition matrix -> per-user EWMA -> hourly gap-fill + forward
    fill -> z-score outliers -> per-type OLS trend

Run:

    python examples/pipelines/behavior_analytics.py [SF_DIR]

(defaults to /root/testdata/sf0.01). Every operator's 100 TB posture is
documented in SCALE.md; every output shown here is value-oracle-checked
by scripts/check_correctness.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from dynamicqueryengine_spark import get_spark
from dynamicqueryengine_spark.workloads.temporal import (
    TEMPORAL_QUERIES,
)
from dynamicqueryengine_spark.workloads.trends import TREND_QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("behavior-analytics", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    stages = [
        ("K-step funnel (view->click->purchase)", TEMPORAL_QUERIES["events_funnel_3step"]),
        ("funnel step-completion report", TEMPORAL_QUERIES["events_funnel_steps"]),
        ("weekly retention cohorts", TEMPORAL_QUERIES["events_retention_cohorts"]),
        ("event-type transition matrix", TREND_QUERIES["events_transition_matrix"]),
        ("per-user EWMA of value", TREND_QUERIES["events_ewma_user"]),
        ("hourly gap-fill + forward fill", TREND_QUERIES["events_gapfill_ffill"]),
        ("z-score outliers (|z| >= 2.5)", TREND_QUERIES["events_zscore_outliers"]),
        ("per-type OLS value trend", TREND_QUERIES["events_value_trend"]),
    ]
    for title, wl in stages:
        df = wl.spark_fn()(spark, sf_dir)
        print(f"\n=== {title} ({df.count()} rows) ===")
        df.show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
