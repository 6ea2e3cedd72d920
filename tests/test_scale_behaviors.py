"""Scale-behavior demonstrations: AQE skew handling, console sink
plumbing, and engine error adaptation (SURVEY.md §2 A8)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from datafusion_streams_spark.sources.kafka import kafka_like_stream
from tests.conftest import SF_DIR, SF_DIR_SMALL


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join: a 95%-hot key must be split at runtime instead of
    serializing one reducer — the mechanism that saves skewed joins at
    100 TB. Asserted on the executed (adaptive) plan."""
    hot = spark.range(0, 200_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(0, 5_000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("payload")
    )
    left = hot.union(cold)
    right = spark.range(0, 51).select(F.col("id").alias("k"), F.lit("x").alias("tag"))

    old_thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
    }
    try:
        # force a sort-merge join and make the skew detector sensitive
        # enough to trip on test-sized data
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's QueryExecution, so the AQE
        # final plan is inspectable afterwards (count() builds a new one)
        assert len(joined.collect()) == 205_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, "AQE should mark the hot partition as skewed"
    finally:
        for k, v in old_thresholds.items():
            spark.conf.set(k, v)


def test_console_sink_runs(spark, capfd):
    """Console sink — the reference's only sink (print_batches,
    /root/reference/tests/basic_tests.rs:67) — drains without error."""
    msgs = kafka_like_stream(spark, SF_DIR_SMALL).select(
        F.length(F.col("value").cast("string")).alias("len_value")
    )
    q = (
        msgs.writeStream.format("console")
        .option("numRows", "5")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_error_adaptation(spark):
    """A8: source errors surface as StreamingQueryException (the
    reference wraps KafkaError into DataFusionStreamError,
    /root/reference/src/lib.rs:14-26)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    # declare an existing column with an incompatible type: the parquet
    # reader fails inside the stream (a missing column would just read
    # as NULL under schema-evolution semantics)
    bad = (
        spark.readStream.schema("event_type double, event_id string")
        .parquet(f"{SF_DIR_SMALL}/events*.parquet")
        .select((F.col("event_type") * 2).alias("x"))
    )
    q = (
        bad.writeStream.format("memory")
        .queryName("err_test")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_quadratic_baseline_is_fenced(spark, monkeypatch):
    """similarity_pairs is the O(n^2) correctness baseline; it must
    refuse a corpus larger than its documented ceiling instead of
    silently launching a cartesian join."""
    from datafusion_streams_spark.operators import similarity

    monkeypatch.setattr(similarity, "MAX_QUADRATIC_ROWS", 10)
    with pytest.raises(ValueError, match="quadratic"):
        similarity.similarity_pairs(spark, SF_DIR_SMALL)


def test_components_chain_converges_in_log_rounds(spark):
    """Pointer doubling (r12): chain-shaped dup clusters (gradual-drift
    chains, the adversarial diameter case) must converge in O(log d)
    label rounds, not O(d) — a 64-node chain (diameter 63) within 8
    rounds, and every node labeled with the chain minimum. Before r12
    this took ~63 rounds and a 512-node chain blew the 64-round safety
    bound."""
    from datafusion_streams_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    labels = {
        r.doc_id: r.canonical_id
        for r in dedup.min_label_components(pairs, "doc_id").collect()
    }
    assert labels == {i: 0 for i in range(64)}
    assert dedup.LAST_CONVERGENCE_ROUNDS <= 8


def test_components_match_union_find_on_random_graphs(spark):
    """min_label_components must equal a driver-side union-find oracle
    on ARBITRARY graph shapes, not just the chain/star cases the other
    pins cover: three seeded random graphs mixing sparse random edges
    (hubs, triangles, isolated pairs emerge at this density) with one
    embedded 30-node chain so the doubling path is exercised alongside
    the propagation path in the same fixpoint."""
    import random

    from datafusion_streams_spark.operators import dedup

    for seed in (7, 41, 1913):
        rng = random.Random(seed)
        n = 120
        edges = set()
        for _ in range(90):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        base = rng.randrange(0, n - 30)
        for i in range(base, base + 29):
            edges.add((i, i + 1))

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({x for e in edges for x in e})
        members: dict[int, list[int]] = {}
        for x in touched:
            members.setdefault(find(x), []).append(x)
        expect = {
            x: min(group) for group in members.values() for x in group
        }

        pairs = spark.createDataFrame(
            sorted(edges), "a_id long, b_id long"
        )
        got = {
            r.doc_id: r.canonical_id
            for r in dedup.min_label_components(pairs, "doc_id").collect()
        }
        assert got == expect, f"seed {seed}"


def test_pairs_vectorized_never_collects_corpus(spark):
    """The block-partitioned scorer must build its plan without any
    driver-side materialization of the embeddings table (round-1
    verdict item #2): plan construction triggers no collect beyond the
    row-count job, and the result matches the guarded baseline."""
    from datafusion_streams_spark.operators import similarity

    fast = {
        (r.a_id, r.b_id): r.score
        for r in similarity.similarity_pairs_vectorized(spark, SF_DIR_SMALL).collect()
    }
    slow = {
        (r.a_id, r.b_id): r.score
        for r in similarity.similarity_pairs(spark, SF_DIR_SMALL).collect()
    }
    assert fast == slow


def test_lsh_candidates_grow_subquadratically(spark):
    """The parametric LSH rule (bits per band += log2(n/base)) must keep
    candidate-pair growth ~linear: 8x the vectors => far fewer than the
    64x candidates a fixed configuration would produce. Synthetic
    deterministic corpora, anchored at base_rows=500 so the same
    production formula is exercised at test scale."""
    import numpy as np

    from datafusion_streams_spark.operators.similarity import (
        N_SIGN_BANDS,
        _lsh_candidates,
        _lsh_signature_df,
        lsh_bits_per_band,
    )

    def corpus(n):
        rng = np.random.RandomState(n)
        vecs = rng.standard_normal((n, 64))
        return spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id LONG, embedding ARRAY<DOUBLE>",
        ).repartition(8)

    base = 500
    counts = {}
    for n in (base, 8 * base):
        bits = lsh_bits_per_band(n, base_rows=base)
        sig = _lsh_signature_df(corpus(n), N_SIGN_BANDS, bits)
        counts[n] = _lsh_candidates(sig, N_SIGN_BANDS, bits).count()

    assert lsh_bits_per_band(8 * base, base_rows=base) > lsh_bits_per_band(
        base, base_rows=base
    )
    growth = counts[8 * base] / max(counts[base], 1)
    assert growth < 20, f"candidate growth {growth:.1f}x at 8x vectors (quadratic = 64x)"


def test_prefix_filter_candidates_grow_subquadratically(spark):
    """AllPairs prefix filtering must keep exact-Jaccard candidate pairs
    sub-quadratic on a boilerplate-heavy corpus — the workload where
    all-shingle blocking degenerates: a shared header makes EVERY doc
    pair a candidate (n^2/2), while prefix filtering only blocks on each
    doc's rarest shingles, which boilerplate never enters. Synthetic
    deterministic corpus; 4x docs must yield far fewer than 16x
    candidates and stay a tiny fraction of the naive count."""
    import numpy as np

    from pyspark.sql import functions as F

    from datafusion_streams_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _prefix_candidates,
    )

    boiler = "terms of service apply to all content on this site".split()

    def shingle_df(n):
        rng = np.random.RandomState(7)
        vocab = [f"w{i}" for i in range(n * 4)]
        rows = []
        prev_words = None
        for d in range(n):
            words = boiler + [vocab[i] for i in rng.randint(0, len(vocab), 24)]
            # every 10th doc is a near-duplicate of its predecessor (two
            # words swapped) — the linear-in-n signal the filter must keep
            if d % 10 == 9 and prev_words is not None:
                words = list(prev_words)
                words[12] = vocab[int(rng.randint(0, len(vocab)))]
                words[20] = vocab[int(rng.randint(0, len(vocab)))]
            prev_words = words
            sh = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
            rows.extend((d, s) for s in sh)
        return spark.createDataFrame(rows, "doc_id LONG, shingle STRING").repartition(8)

    counts, naive = {}, {}
    for n in (250, 1000):
        sh = shingle_df(n).cache()
        counts[n] = _prefix_candidates(sh, JACCARD_THRESHOLD).count()
        a, b = sh.alias("a"), sh.alias("b")
        naive[n] = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id").distinct().count()
        )
        sh.unpersist()

    # boilerplate makes naive blocking fully quadratic
    assert naive[250] == 250 * 249 // 2
    assert naive[1000] == 1000 * 999 // 2
    # prefix filtering: tiny fraction of naive, sub-quadratic growth
    assert counts[250] < 0.05 * naive[250], (counts, naive)
    assert counts[1000] < 0.05 * naive[1000], (counts, naive)
    growth = counts[1000] / max(counts[250], 1)
    assert growth < 8, f"candidate growth {growth:.1f}x at 4x docs (quadratic = 16x)"
    print("PREFIX_DATAPOINT", counts, naive)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning: when a selective dimension
    filter feeds a shuffle join, Catalyst injects a bloom filter on the
    fact side so non-matching rows die before the exchange — at 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the ~matching fraction. Thresholds are lowered to trip
    the optimization at test scale; the assertion is on the optimized
    plan, the mechanism is identical at any scale."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "l_extendedprice", "o_orderpriority"
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and the result is still correct
        n = joined.count()
        assert n > 0
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_pattern_match_bounds_per_user_history(spark, tmp_path):
    """r5 verdict item #3: a single machine actor with a 10^6-event
    history must flow through events_pattern_match without a giant
    per-group row. The month-chunked rewrite collects at most one
    month of one user per group; correctness of the 2-symbol carry is
    checked against an independent Python count over the full
    sequence (str.count == the non-overlapping replace() count for a
    pattern with no self-overlap)."""
    from pyspark.sql import functions as F

    from datafusion_streams_spark.operators import REGISTRY

    n = 1_000_000
    base_us = 1_577_836_800_000_000  # 2020-01-01 UTC
    step_us = 120_000_000  # 2 min apart -> ~3.8 years, ~46 month chunks
    types = ["view", "click", "purchase", "other"]
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(base_us + F.col("id") * step_us)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in types]),
            ((F.col("id") * 2654435761) % 4 + 1).cast("int"),
        ).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = REGISTRY["events_pattern_match"].fn(spark, str(tmp_path)).collect()
    seq = "".join(types[(i * 2654435761) % 4][0] for i in range(n))
    expected = seq.count("vcp")
    assert expected > 0
    assert len(out) == 1
    row = out[0]
    assert row["seq_len"] == n
    assert row["n_patterns"] == expected


def test_minhash_label_memo_rebuilds_on_dead_handle(spark):
    """r5/r6 ADVICE: localCheckpoint blocks are not fault-tolerant — if
    an executor died, the memoized labels handle fails on fetch. The
    memo must detect a dead handle (full-block count() probe — take(1)
    would miss loss in untouched partitions) and rebuild instead of
    serving it to the three consumer queries."""
    from datafusion_streams_spark.operators import dedup
    from tests.conftest import SF_DIR

    good = dedup.minhash_labels(spark, SF_DIR)
    n = good.count()

    class DeadHandle:
        def count(self):
            raise RuntimeError("block fetch failed (simulated lost executor)")

    dedup._MINHASH_LABELS_MEMO[SF_DIR] = (spark, DeadHandle())
    rebuilt = dedup.minhash_labels(spark, SF_DIR)
    assert not isinstance(rebuilt, DeadHandle)
    assert rebuilt.count() == n
    # and the memo now holds the live handle again
    assert dedup._MINHASH_LABELS_MEMO[SF_DIR][1] is rebuilt


def test_minhash_consumers_survive_real_checkpoint_block_loss(spark):
    """r6 verdict item #3: kill the ACTUAL localCheckpoint blocks (the
    faithful lost-executor simulation — lineage is truncated, so a
    stale handle raises rather than recomputing) and show a consumer
    query rebuilds the labels and returns the same result."""
    from datafusion_streams_spark.operators import dedup
    from datafusion_streams_spark.operators import REGISTRY
    from tests.conftest import SF_DIR

    labels = dedup.minhash_labels(spark, SF_DIR)
    before = sorted((r.doc_id, r.canonical_id) for r in labels.collect())
    assert dedup._MINHASH_LABELS_MEMO[SF_DIR][1] is labels

    # Drop every persisted RDD's blocks through the JVM — this includes
    # the LocalCheckpointRDD backing the memo handle. Plain .cache()ed
    # relations recompute from lineage; only the checkpoint handle is
    # left dead, exactly like losing the executor that held it.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)

    # The stale handle must now be detected by the probe (not served),
    # and the consumer must come back with identical labels.
    stats = REGISTRY["dedup_component_stats"].fn(spark, SF_DIR)
    assert stats.count() > 0
    rebuilt = dedup._MINHASH_LABELS_MEMO[SF_DIR][1]
    assert rebuilt is not labels
    after = sorted((r.doc_id, r.canonical_id) for r in rebuilt.collect())
    assert after == before


def test_release_shared_caches_keeps_storage_flat(spark):
    """r6 verdict item #6: a long-lived session running repeated
    registry sweeps must not accumulate executor storage. Run the
    cache-creating queries twice with release_shared_caches between
    and after; persisted-RDD count returns to zero each time."""
    from datafusion_streams_spark.operators import REGISTRY, release_shared_caches
    from tests.conftest import SF_DIR_SMALL

    def persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_shared_caches(spark)  # start clean regardless of test order
    assert persisted() == 0
    for _ in range(2):
        # one per shared cache: shingle arrays + labels (dedup),
        # simhash signatures (multimodal), BPE vocabulary (text)
        REGISTRY["dedup_components"].fn(spark, SF_DIR_SMALL).count()
        REGISTRY["multimodal_simhash_neardup"].fn(spark, SF_DIR_SMALL).count()
        REGISTRY["text_bpe_merges"].fn(spark, SF_DIR_SMALL).count()
        assert persisted() > 0  # the sweep really did persist state
        release_shared_caches(spark)
        assert persisted() == 0
    # and consumers still work after a release (memo rebuilds)
    assert REGISTRY["dedup_component_stats"].fn(spark, SF_DIR_SMALL).count() > 0


def test_memoized_layout_builds_once_under_concurrency():
    """r5 ADVICE: two concurrent first calls for the same layout key
    must not race the build — exactly one build() runs, both callers
    get the same path."""
    import threading
    import time as _time

    from datafusion_streams_spark import layouts

    calls = []
    paths = []

    def build(path):
        calls.append(path)
        _time.sleep(0.2)  # widen the race window

    key = ("/tmp/race-test-sf", "race_layout")
    layouts._LAYOUT_MEMO.pop(key, None)
    threads = [
        threading.Thread(
            target=lambda: paths.append(
                layouts.memoized_layout(key[0], key[1], build)
            )
        )
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f"build ran {len(calls)} times"
    assert len(set(paths)) == 1


def test_pattern_match_carry_spans_three_chunks(spark, tmp_path):
    """The hardest chunk-boundary case: a motif whose three symbols
    live in THREE consecutive month chunks (the middle month has a
    single event). The 2-symbol carry is rebuilt from the previous TWO
    chunks precisely so this match is found — and found exactly once.
    Also pins: a motif split 2|1 across two chunks, and no
    double-count for a motif ending at a chunk's last symbol."""
    from pyspark.sql import functions as F

    from datafusion_streams_spark.operators import REGISTRY

    def ts(month, step):
        return 1_577_836_800_000_000 + (month * 32 * 86_400 + step) * 1_000_000

    rows = []
    # user 1: v | c | p in three consecutive months (1 event/month)
    rows += [(0, ts(0, 0), 1, "view"), (1, ts(1, 0), 1, "click"),
             (2, ts(2, 0), 1, "purchase")]
    # user 2: [v c] | [p v] | [c p] -> motif at positions 1-3 and 4-6 (2 total)
    rows += [(10, ts(0, 0), 2, "view"), (11, ts(0, 1), 2, "click"),
             (12, ts(1, 0), 2, "purchase"), (13, ts(1, 1), 2, "view"),
             (14, ts(2, 0), 2, "click"), (15, ts(2, 1), 2, "purchase")]
    # user 3: motif ends exactly at a chunk boundary [o v c p] | [o o]
    rows += [(20, ts(0, 0), 3, "other"), (21, ts(0, 1), 3, "view"),
             (22, ts(0, 2), 3, "click"), (23, ts(0, 3), 3, "purchase"),
             (24, ts(1, 0), 3, "other"), (25, ts(1, 1), 3, "other")]
    # user 4: no motif at all (c v p) -> filtered out
    rows += [(30, ts(0, 0), 4, "click"), (31, ts(1, 0), 4, "view"),
             (32, ts(2, 0), 4, "purchase")]
    ev = spark.createDataFrame(
        [(i, t, u, e) for i, t, u, e in rows],
        "event_id long, ts_us long, user_id long, event_type string",
    ).select(
        "event_id",
        F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.user_id: (r.seq_len, r.n_patterns)
        for r in REGISTRY["events_pattern_match"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 1), 2: (6, 2), 3: (6, 1)}


def test_source_overlap_wide_catalog_chunked_masks(spark, tmp_path):
    """r8 (r7 verdict item 2): dedup_source_overlap must handle
    catalogs wider than one 64-bit mask. 70 sources span two 63-bit
    mask chunks (bits are chunked 63-wide — bit 63 is LongType's sign
    bit); every source shares one boilerplate shingle (cross-chunk
    pairs exercised) and even sources share a second. Verified against
    the SAME DuckDB oracle SQL the driver runs, on the synthetic
    documents table."""
    import duckdb
    import pandas as pd

    from datafusion_streams_spark.operators import REGISTRY
    from tests.conftest import assert_frames_match

    n_sources = 70
    rows = []
    for i in range(n_sources):
        text = f"alpha beta gamma uniq{i}a uniq{i}b uniq{i}c"
        if i % 2 == 0:
            text += " shared even phrase tail"
        rows.append((i, f"src{i:03d}", text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    p = f"{tmp_path}/documents.parquet"
    pdf.to_parquet(p)

    spec = REGISTRY["dedup_source_overlap"]
    a = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    b = con.execute(spec.oracle).fetchdf()
    con.close()
    # every pair shares "alpha beta gamma"; the result is all C(70,2)
    # pairs, so both chunks' masks are exercised on both join sides
    assert len(a) == n_sources * (n_sources - 1) // 2
    assert_frames_match(a, b, "dedup_source_overlap@70src")


def test_source_overlap_chunk_boundary_widths(spark, tmp_path):
    """Chunk-boundary widths for the 63-bit source masks: 63 (exactly
    one full chunk), 64 (the historical overflow point — first source
    in a second chunk), 127 (three chunks, the last holding one bit).
    Every source shares one boilerplate shingle, so the expected
    answer is all C(n,2) pairs with identical share counts — any
    dropped/doubled (chunk, bit) coordinate shows up as a missing or
    duplicated pair."""
    import pandas as pd

    from datafusion_streams_spark.operators import REGISTRY

    spec = REGISTRY["dedup_source_overlap"]
    for n_sources in (63, 64, 127):
        rows = [
            (i, f"src{i:03d}", f"alpha beta gamma uniq{i}a uniq{i}b")
            for i in range(n_sources)
        ]
        sub = tmp_path / f"w{n_sources}"
        sub.mkdir()
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
            f"{sub}/documents.parquet"
        )
        a = spec.fn(spark, str(sub)).toPandas()
        assert len(a) == n_sources * (n_sources - 1) // 2, n_sources
        assert set(a["n_shared_shingles"]) == {1}, n_sources
