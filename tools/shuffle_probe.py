#!/usr/bin/env python3
"""Measure SHUFFLE BYTES — the currency of a 100 TB aggregation — for
the mergeable-sketch rollup vs the exact formulation it stands in for.

`agg_hll_mergeable`'s scale claim is that the per-(type, day) HLL
sketch shuffle is O(groups x 2^lgK registers) regardless of user
cardinality, while exact COUNT(DISTINCT) must shuffle every distinct
(type, user) pair. This probe puts measured wire bytes on that claim:
synthesize an events-shaped relation at growing distinct-user
cardinality, run both formulations, and read the per-stage
`shuffleWriteBytes` from Spark's status REST API (its own session with
the UI enabled on an ephemeral port — the engine session keeps the UI
off, so the probe builds a measurement session; every parity-relevant
config is irrelevant here because nothing is value-compared).

    python tools/shuffle_probe.py            # 3 cardinalities, one JSON line

Expected shape (and what r9 measured): exact-distinct shuffle bytes
grow ~linearly with distinct users; sketch bytes stay ~flat. The
crossover is why the sketch is the only viable distinct-count shape at
100 TB. Wall time at these fixture sizes is noise — bytes are the
signal that scales.
"""

from __future__ import annotations

import json
import sys
import urllib.request


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("shuffle-probe")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.port.maxRetries", "32")
        .getOrCreate()
    )


def _ui_base(spark) -> str:
    # the bound port may differ from 4099 under maxRetries
    url = spark.sparkContext.uiWebUrl
    if not url:
        raise RuntimeError("Spark UI did not come up; cannot read stage metrics")
    return url


def _shuffle_write_bytes_total(spark) -> int:
    base = _ui_base(spark)
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _events(spark, n_rows: int, n_users: int):
    from pyspark.sql import functions as F

    return spark.range(0, n_rows, 1, 8).select(
        F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
        F.pmod("id", F.lit(5)).cast("string").alias("event_type"),
        F.pmod("id", F.lit(30)).alias("day"),
    )


def main() -> int:
    from pyspark.sql import functions as F

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 64, 1, 8).count()  # warm

    out = {"probe": "hll_vs_exact_shuffle_bytes", "rows": 2_000_000, "cards": {}}
    for n_users in (20_000, 200_000, 2_000_000):
        ev = _events(spark, out["rows"], n_users)

        before = _shuffle_write_bytes_total(spark)
        ev.select("event_type", "user_id").distinct().groupBy("event_type").agg(
            F.count(F.lit(1))
        ).collect()
        mid = _shuffle_write_bytes_total(spark)
        ev.groupBy("event_type", "day").agg(
            F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
        ).groupBy("event_type").agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))")
        ).collect()
        after = _shuffle_write_bytes_total(spark)

        exact_b, sketch_b = mid - before, after - mid
        out["cards"][n_users] = {
            "exact_shuffle_bytes": exact_b,
            "sketch_shuffle_bytes": sketch_b,
            "exact_over_sketch": round(exact_b / sketch_b, 1) if sketch_b else None,
        }
    c = out["cards"]
    out["exact_growth_100x_users"] = round(
        c[2_000_000]["exact_shuffle_bytes"] / c[20_000]["exact_shuffle_bytes"], 1
    )
    out["sketch_growth_100x_users"] = round(
        c[2_000_000]["sketch_shuffle_bytes"] / c[20_000]["sketch_shuffle_bytes"], 1
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
