#!/usr/bin/env python3
"""Measure SHUFFLE BYTES — the currency of a 100 TB aggregation — for
the repo's compressed-shuffle aggregate shapes vs the exact
formulations they stand in for.

Three probes (r9 measured the first; the r9 verdict asked for the
other two at HEAD with the same status-API method):

- hll:   `agg_hll_mergeable` — per-(type, day) HLL sketch shuffle is
         O(groups x 2^lgK registers) regardless of user cardinality,
         while exact COUNT(DISTINCT) shuffles every distinct pair.
- bitmap: `agg_bitmap_distinct` — packed 64-bit containers shuffle
         <= distinct/64 rows per day vs one row per distinct user,
         and stay EXACT (the claimed ~56x compression, re-measured).
- heavy_hitters: `agg_heavy_hitters` — phase-1 local-support
         candidates bound the shuffle at O(P/s) rows independent of
         key cardinality, vs a full GROUP BY shuffling every distinct
         key.

Each synthesizes an events-shaped relation at growing distinct-key
cardinality, runs both formulations, and reads per-stage
`shuffleWriteBytes` from Spark's status REST API (its own session with
the UI enabled on an ephemeral port — the engine session keeps the UI
off; parity configs are irrelevant because nothing is value-compared).

    python tools/shuffle_probe.py            # one JSON line, all probes

Expected shape: exact bytes grow ~linearly with cardinality; the
compressed shapes stay flat (sketch/candidates) or /64 (bitmap). Wall
time at these fixture sizes is noise — bytes are the signal that
scales.
"""

from __future__ import annotations

import json
import sys
import time
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


def _shuffle_write_bytes_total(spark, settle_s: float = 0.2, max_wait_s: float = 10.0) -> int:
    """Total shuffleWriteBytes over completed stages, read STABLY.

    The AppStatusStore is populated asynchronously from the listener
    bus (r9 ADVICE): a read taken immediately after collect() can miss
    the final stage, crediting its bytes to the NEXT measurement
    window. Poll until two consecutive reads agree on (completed-stage
    count, total bytes); bail out at max_wait_s with the last read —
    by then the bus has had 10 s, and a still-moving count means an
    unrelated job is running, which no amount of waiting fixes."""
    base = _ui_base(spark)
    app = spark.sparkContext.applicationId

    def _read() -> tuple[int, int]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        return len(stages), sum(s.get("shuffleWriteBytes", 0) for s in stages)

    prev = _read()
    deadline = time.monotonic() + max_wait_s
    while time.monotonic() < deadline:
        time.sleep(settle_s)
        cur = _read()
        if cur == prev:
            break
        prev = cur
    return prev[1]


def _events(spark, n_rows: int, n_users: int):
    from pyspark.sql import functions as F

    return spark.range(0, n_rows, 1, 8).select(
        F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
        F.pmod("id", F.lit(5)).cast("string").alias("event_type"),
        F.pmod("id", F.lit(30)).alias("day"),
    )


def _measure(spark, run_exact, run_compressed) -> tuple[int, int]:
    """(exact_bytes, compressed_bytes) for two formulations, each
    bracketed by stable status-API reads."""
    before = _shuffle_write_bytes_total(spark)
    run_exact()
    mid = _shuffle_write_bytes_total(spark)
    run_compressed()
    after = _shuffle_write_bytes_total(spark)
    return mid - before, after - mid


def _growth(cards: dict, lo: int, hi: int, exact_k: str, comp_k: str) -> dict:
    return {
        "exact_growth": round(cards[hi][exact_k] / cards[lo][exact_k], 1),
        "compressed_growth": round(cards[hi][comp_k] / cards[lo][comp_k], 1),
    }


def probe_hll(spark) -> dict:
    from pyspark.sql import functions as F

    out = {"rows": 2_000_000, "cards": {}}
    for n_users in (20_000, 200_000, 2_000_000):
        ev = _events(spark, out["rows"], n_users)
        exact_b, sketch_b = _measure(
            spark,
            lambda: ev.select("event_type", "user_id")
            .distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)))
            .collect(),
            lambda: ev.groupBy("event_type", "day")
            .agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk"))
            .groupBy("event_type")
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
            .collect(),
        )
        out["cards"][n_users] = {
            "exact_shuffle_bytes": exact_b,
            "sketch_shuffle_bytes": sketch_b,
            "exact_over_sketch": round(exact_b / sketch_b, 1) if sketch_b else None,
        }
    out.update(
        _growth(out["cards"], 20_000, 2_000_000,
                "exact_shuffle_bytes", "sketch_shuffle_bytes")
    )
    return out


def probe_bitmap(spark) -> dict:
    """agg_bitmap_distinct's shape: per-day distinct via packed 64-bit
    containers (bit_or + popcount — EXACT) vs distinct-then-count. The
    claimed win: the exchange carries one 8-byte word per occupied
    container instead of one row per distinct (day, user) pair."""
    from pyspark.sql import functions as F

    out = {"rows": 2_000_000, "cards": {}}
    for n_users in (20_000, 200_000, 2_000_000):
        ev = _events(spark, out["rows"], n_users)
        exact_b, bitmap_b = _measure(
            spark,
            lambda: ev.select("day", "user_id")
            .distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)))
            .collect(),
            lambda: ev.select(
                "day",
                F.shiftright("user_id", 6).alias("container"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
                ).alias("bit"),
            )
            .groupBy("day", "container")
            .agg(F.bit_or("bit").alias("bitmap"))
            .groupBy("day")
            .agg(F.sum(F.bit_count("bitmap")))
            .collect(),
        )
        out["cards"][n_users] = {
            "exact_shuffle_bytes": exact_b,
            "bitmap_shuffle_bytes": bitmap_b,
            "exact_over_bitmap": round(exact_b / bitmap_b, 1) if bitmap_b else None,
        }
    out.update(
        _growth(out["cards"], 20_000, 2_000_000,
                "exact_shuffle_bytes", "bitmap_shuffle_bytes")
    )
    return out


def probe_heavy_hitters(spark) -> dict:
    """agg_heavy_hitters' shape: phase-1 per-batch local-support
    candidates (map-only, O(P/s) emissions) + broadcast semi-join
    recount, vs the full GROUP BY that shuffles every distinct key.
    The tail keys are unique-ish (xxhash64 spread over n_cold keys) so
    the exact shuffle grows with cardinality; 30% of rows sit in 3 hot
    keys (ids 0/1/2 mod 10 map to id%5 in {0,1,2}, ~10% of rows each)
    so real heavy hitters exist at support 0.05%."""
    from pyspark.sql import functions as F

    support = 0.0005
    n_rows = 2_000_000
    threshold = int(support * n_rows) + 1
    out = {"rows": n_rows, "support": support, "cards": {}}
    for n_cold in (20_000, 200_000, 2_000_000):
        keys = spark.range(0, n_rows, 1, 8).select(
            F.when(F.pmod("id", F.lit(10)) < 3, F.pmod("id", F.lit(5)))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_cold)) + 100)
            .alias("user_id")
        )

        def _two_phase(df=keys):
            import pandas as pd

            def local_candidates(batches):
                for pdf in batches:
                    counts = pdf["user_id"].value_counts()
                    keep = counts[counts >= support * len(pdf)]
                    yield pd.DataFrame({"user_id": keep.index.astype("int64")})

            candidates = df.mapInPandas(
                local_candidates, "user_id long"
            ).distinct()
            (
                df.join(F.broadcast(candidates), "user_id", "left_semi")
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= threshold)
                .collect()
            )

        exact_b, phased_b = _measure(
            spark,
            lambda: keys.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold)
            .collect(),
            _two_phase,
        )
        out["cards"][n_cold] = {
            "exact_shuffle_bytes": exact_b,
            "two_phase_shuffle_bytes": phased_b,
            "exact_over_two_phase": round(exact_b / phased_b, 1) if phased_b else None,
        }
    out.update(
        _growth(out["cards"], 20_000, 2_000_000,
                "exact_shuffle_bytes", "two_phase_shuffle_bytes")
    )
    return out


def main() -> int:
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 64, 1, 8).count()  # warm
    # warm the Arrow python-worker pool too (heavy-hitters phase 1)
    spark.range(0, 8, 1, 8).mapInPandas(lambda it: it, "id long").count()

    out = {
        "probe": "compressed_vs_exact_shuffle_bytes",
        "hll": probe_hll(spark),
        "bitmap": probe_bitmap(spark),
        "heavy_hitters": probe_heavy_hitters(spark),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
