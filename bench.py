"""Headline-query benchmark.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing counts full query execution (plan + shuffle + collect-to-count)
but not Spark session startup — startup is fixed overhead that
amortizes to zero on a real cluster run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from forest_open_data_pipelines_spark.plans.catalog import QUERIES
from forest_open_data_pipelines_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "nations_trade_volume",
    "region_nation_rollup",
    "top_customers",
    "monthly_by_region",
    "top_nations_yoy",
    "rolling_12m",
    "freshness_cadence",
    "events_sessionize",
    "text_quality",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("forest-pipelines-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # engine, not first-call JIT (the driver compares steady-state
    # throughput with the reference).
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
