#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall-clock seconds.

Metric definition (BASELINE.md): per-query wall-clock on the SURVEY §2
inventory at sf0.1, AQE on. Each query executes to completion via a
count() over the result (forces full evaluation, no driver collect of
payload rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_streams_spark import get_session
from datafusion_streams_spark.operators import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per operator family (full inventory
# runs in the correctness gate; bench tracks the scale-relevant ones).
HEADLINE = [
    "ref_kafka_pipeline",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "agg_rollup",
    "join_broadcast_dim",
    "window_topk_per_group",
    "sort_topk_global",
    "events_tumbling_hour",
    "events_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "similarity_pairs_vectorized",
    "text_quality_score",
    "text_fingerprint",
    "multimodal_binary_meta",
    "streaming_ref_pipeline",
    "streaming_tumbling_hour",
]


def main() -> None:
    spark = get_session(app_name="dfs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # queries, not first-run class loading.
    REGISTRY["ref_kafka_pipeline"].fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
