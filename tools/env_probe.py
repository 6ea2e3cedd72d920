#!/usr/bin/env python3
"""Per-round environment re-probe (r9 verdict item 8).

Two capabilities are implemented-but-env-gated; their tests skip with
a pinned reason while the sandbox lacks the dependency:

- ``transformWithStateInPandas`` — the Spark 4 arbitrary-state API
  needs ``google.protobuf`` in the python worker (pip is DNS-blocked
  here; ``applyInPandasWithState`` covers the semantics meanwhile);
- live Kafka round trip — needs the ``spark-sql-kafka`` connector jar
  (jar download DNS-blocked) AND a reachable broker
  (``KAFKA_HOST``).

Run once per round and paste the line into SCALE_NOTES.md's env-gate
table, so the round the sandbox ever changes is the round both
capabilities re-activate (their tests un-skip by themselves — this
probe exists so nobody has to remember to check).

    python tools/env_probe.py        # one JSON line
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def probe() -> dict:
    try:
        # find_spec raises (rather than returning None) when the parent
        # "google" namespace package itself is absent
        have_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        have_protobuf = False

    # the connector jar would make format("kafka") resolvable; probe
    # the same way session startup would find it — on the classpath
    # dirs Spark uses — without starting a JVM
    jar_hit = None
    spark_home = os.environ.get("SPARK_HOME")
    search_dirs = []
    if spark_home:
        search_dirs.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        search_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    for d in search_dirs:
        if os.path.isdir(d):
            for name in os.listdir(d):
                if "spark-sql-kafka" in name:
                    jar_hit = os.path.join(d, name)
                    break
        if jar_hit:
            break

    return {
        "probe": "env_gates",
        "google_protobuf_present": have_protobuf,
        "spark_sql_kafka_jar": jar_hit,
        "kafka_host_set": "KAFKA_HOST" in os.environ,
        "gates_active": {
            "transformWithStateInPandas": not have_protobuf,
            "live_kafka_roundtrip": jar_hit is None or "KAFKA_HOST" not in os.environ,
        },
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
    sys.exit(0)
