#!/usr/bin/env python3
"""CPU-scaling demonstration probe (r15 verdict item 7).

Every shipped fixture is a single parquet file with ONE row group, so
every scan is one task and the sf0.1 bench cannot show parallel
speedup: the r15 driver measured c8/c32 wall ratios ~= 1 across the
board, and the repo's 100 TB claims rested on plan shape plus the
volume-ratio probes alone. This tool closes that gap with a measured
CORES axis on a fixture that actually has partitions to parallelize:

  1. build a 16x token-suffixed replica of documents.parquet (probe-C
     recipe: suffixing keeps cross-copy shingles disjoint so dup
     structure scales k-fold, not quadratically) and a 16x vec_id-offset
     replica of embeddings.parquet, each written as 16 part files
     (16 row groups -> 16 scan tasks);
  2. run the three heaviest data-parallel queries
     (dedup_ngram_jaccard, text_bpe_fertility,
     similarity_pairs_vectorized) to completion, min-of-N warm, in a
     FRESH subprocess per core count — local[32] vs local[8], shuffle
     partitions following the core count exactly as the driver's bench
     does via $SPARK_GRAFT_CPUS;
  3. print one JSON line with per-query walls and the c8/c32 ratios.

A ratio materially above 1 demonstrates the compute genuinely rides
the core count once the input stops being a single task — the
"fixture physics" argument as a measurement. Paste the line into
SCALE_NOTES.md.

    cd /tmp && python /root/repo/tools/cpu_scaling_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = (
    "dedup_ngram_jaccard",
    "text_bpe_fertility",
    "similarity_pairs_vectorized",
)
COPIES = 16
N_FILES = 16


def build_replica(spark, sf_dir: str, land: str) -> dict:
    """16x multi-file documents + embeddings replicas under ``land``."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", rf"$1q{i}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(COPIES)
    ]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionAll(p)
    scaled.repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(land, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    eparts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "embedding"
        )
        for i in range(COPIES)
    ]
    escaled = eparts[0]
    for p in eparts[1:]:
        escaled = escaled.unionAll(p)
    escaled.repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(land, "embeddings.parquet")
    )
    return {
        "docs": spark.read.parquet(os.path.join(land, "documents.parquet")).count(),
        "vecs": spark.read.parquet(os.path.join(land, "embeddings.parquet")).count(),
        "files_per_table": N_FILES,
    }


def worker(cpus: int, land: str, reps: int, build_from: str | None) -> None:
    """One core-count arm in its own JVM: optionally build the replica,
    then min-of-N each query. Prints one JSON line."""
    from datafusion_streams_spark import get_session
    from datafusion_streams_spark.operators import (
        REGISTRY,
        release_model_memos,
        release_shared_caches,
    )

    spark = get_session(app_name=f"cpu-scaling-c{cpus}", cpus=str(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    meta = {}
    if build_from:
        meta = build_replica(spark, build_from, land)
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(lambda it: it, "id long").count()
    out: dict[str, float] = {}
    allr: dict[str, list[float]] = {}
    for name in QUERIES:
        runs: list[float] = []
        for _ in range(reps):
            release_model_memos(spark)  # bench methodology: fit included
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, land).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(runs)
        allr[name] = runs
    release_shared_caches(spark)
    print(json.dumps({"cpus": cpus, "q": out, "all": allr, "meta": meta}))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", default="32,8", help="core counts, measured in order")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--worker-cpus", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--land", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--build-from", default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    if args.worker:
        worker(args.worker_cpus, args.land, args.reps, args.build_from)
        return 0

    import bench  # calibration sextet before any JVM exists

    calibs = {
        "calib": bench.cpu_calibration(),
        "pcalib": bench.parallel_cpu_calibration(),
    }
    calibs["fcalib"], calibs["mcalib"] = bench.mem_calibrations()
    calibs["pfcalib"], calibs["pmcalib"] = bench.parallel_mem_calibrations()

    land = tempfile.mkdtemp(prefix="cpu_scaling_")
    cpu_list = [int(c) for c in args.cpus.split(",")]
    arms: dict[int, dict] = {}
    try:
        for i, cpus in enumerate(cpu_list):
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--worker-cpus",
                str(cpus),
                "--land",
                land,
                "--reps",
                str(args.reps),
            ]
            if i == 0:
                cmd += ["--build-from", args.sf_dir]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600, cwd=REPO
            )
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.strip().startswith("{")
                ),
                None,
            )
            if line is None:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"worker c{cpus} printed no JSON")
            arms[cpus] = json.loads(line)
    finally:
        shutil.rmtree(land, ignore_errors=True)

    base = cpu_list[0]
    ratios = {}
    for other in cpu_list[1:]:
        ratios[f"c{other}_over_c{base}"] = {
            q: round(arms[other]["q"][q] / arms[base]["q"][q], 2) for q in QUERIES
        }
    print(
        json.dumps(
            {
                "probe": "cpu_scaling_multifile",
                "copies": COPIES,
                "files_per_table": N_FILES,
                "meta": arms[base].get("meta", {}),
                "walls": {f"c{c}": arms[c]["q"] for c in cpu_list},
                "all_reps": {f"c{c}": arms[c]["all"] for c in cpu_list},
                "ratios": ratios,
                **calibs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
