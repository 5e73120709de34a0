"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect cost). Timings include plan + execution, excluding
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.session import get_spark

# Headline set: the heavy shuffle/join/agg paths plus one per extension family.
BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "flagship_nation_price_dev",
    "window_max_fill",
    "events_session_window",
    "events_tumbling_window",
    "token_topk",
    "dedup_exact_groups",
    "neardup_minhash_lsh",
    "knn_join_topk",
    "doc_fingerprint_simhash",
    "steam_job1_prices_etl",
    "world_map_job2_deviation",
    "lang_id_ngram",
    "simsearch_lsh_topk",
    "tpch_q6_revenue_forecast",
    "tpch_q13_customer_distribution",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_sole_late_supplier",
    "trainset_selection_pipeline",
    "scd2_purchase_history",
    "merge_upsert_user_state",
    "moments_skew_kurtosis",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()

    # Warm-up: run every benchmark plan once at the smallest scale factor so
    # the timed runs measure steady-state throughput (whole-stage codegen is
    # compiled per plan shape; a cold first run pays class-loading + codegen,
    # which a long-running cluster amortizes away).
    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warm-up is best-effort; the timed run reports real errors

    # Two timed repetitions, report the min: this VM shows bursty hypervisor
    # steal time, and min-of-2 measures the plan, not the neighbor.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
