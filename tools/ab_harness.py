#!/usr/bin/env python3
"""A/B micro-harness for the optimization round: time a named subset of
registered queries with the bench's exact methodology (warm session,
count() action, min-of-N) so a candidate change can be measured in
isolation before it touches the engine.

Usage:
    python tools/ab_harness.py q1,q2,... [reps]
Environment:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    plus whatever env the experiment needs (TMPDIR, SPARK_LOCAL_DIRS...)

Prints one JSON line {"total": s, "q": {...}, "calib": s}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_streams_spark import get_session
from datafusion_streams_spark.operators import REGISTRY


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same calibration as bench.py, before the session exists
    import bench

    calib = bench.cpu_calibration()
    spark = get_session(app_name="dfs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["ref_kafka_pipeline"].fn(spark, sf).count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(lambda it: it, "id long").count()
    from pyspark.sql import functions as F

    tiny = spark.range(0, 64, 1, 8)
    dim = spark.range(0, 2).select(F.col("id").alias("k"))
    tiny.join(F.broadcast(dim), (tiny.id % 2) == F.col("k")).count()
    tiny.groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda p: p[["id"]], "id long"
    ).count()

    out: dict[str, float] = {}
    allr: dict[str, list[float]] = {}
    for n in names:
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[n].fn(spark, sf).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[n] = min(runs)
        allr[n] = runs
    from datafusion_streams_spark.operators import release_shared_caches

    release_shared_caches(spark)
    print(json.dumps({"total": round(sum(out.values()), 3), "q": out,
                      "all": allr, "calib": calib}))


if __name__ == "__main__":
    main()
