"""Streaming-module tests: the streaming twins must agree with their batch
anchors (which are themselves DuckDB-oracle-checked via queries.py)."""

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from xdump_spark.catalog import read_events
from xdump_spark.streaming import (
    hourly_rollup,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_events(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """The events table re-written as 4 parquet files so maxFilesPerTrigger
    can split the stream into several micro-batches."""
    d = tmp_path_factory.mktemp("events_stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(d / "parts")
    raw.repartition(4).write.parquet(out)
    yield out
    shutil.rmtree(str(d), ignore_errors=True)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_events_dir_is_multifile(events_dir):
    assert len(glob.glob(f"{events_dir}/part-*.parquet")) == 4


def test_hourly_rollup_stream_matches_batch(spark, events_batch, events_dir):
    stream = read_events_stream(spark, f"{events_dir}/part-*.parquet")
    assert stream.isStreaming
    q = run_to_memory(hourly_rollup(stream), "hr_stream", output_mode="complete")
    try:
        got = rows_set(spark.table("hr_stream"))
        want = rows_set(hourly_rollup(events_batch))
        assert got == want
    finally:
        q.stop()


def test_sessionize_batch_semantics(spark):
    # gap boundary: exactly 30 min merges; 30 min + 1 µs splits
    rows = [
        (1, 0),
        (1, 1_800_000_000),  # == gap → same session
        (2, 0),
        (2, 1_800_000_001),  # > gap → new session
    ]
    df = spark.createDataFrame(rows, "user_id long, us long").withColumn(
        "ts", F.timestamp_micros("us")
    ).withColumn("value", F.lit(1.0))
    out = {(r.user_id, r.n_events) for r in sessionize(df).collect()}
    assert out == {(1, 2), (2, 1), (2, 1)} or out == {(1, 2), (2, 1)}
    n_sessions = sessionize(df).count()
    assert n_sessions == 3


def test_sessionize_stream_subset_of_batch(spark, events_batch, events_dir):
    """Append-mode session output (only watermark-finalized sessions emit in
    an availableNow run) must be a subset of the batch sessionization."""
    stream = read_events_stream(spark, f"{events_dir}/part-*.parquet")
    q = run_to_memory(
        sessionize(stream, watermark="1 hour"), "sess_stream", output_mode="append"
    )
    try:
        got = rows_set(spark.table("sess_stream"))
        want = rows_set(sessionize(events_batch))
        assert got.issubset(want)
    finally:
        q.stop()


def test_running_user_totals_final_state_matches_batch(spark, events_batch, events_dir):
    """Multi-micro-batch run: the LAST emitted row per user must equal the
    batch per-user totals (state accumulates correctly across batches)."""
    stream = read_events_stream(
        spark, f"{events_dir}/part-*.parquet", max_files_per_trigger=1
    )
    q = run_to_memory(running_user_totals(stream), "totals_stream")
    try:
        sink = spark.table("totals_stream")
        # update-mode memory sink appends every update; per user the max
        # n_events row is the final state (totals only grow)
        final = (
            sink.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
            .select("user_id", "s.n_events", "s.total_value")
        )
        want = events_batch.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        assert rows_set(final) == rows_set(want)
    finally:
        q.stop()


def test_state_survives_restart_via_checkpoint(spark, events_batch, tmp_path):
    """Two separate availableNow runs over a growing directory with one
    checkpoint: the second run must resume file-source progress AND state
    (running totals double for re-ingested users) — the exactly-once /
    recovery contract a production stream relies on."""
    import shutil as _sh

    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    raw.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        rows = []
        stream = read_events_stream(spark, src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return rows

    run_once()
    # second wave: the same events land again as new files
    part = [p for p in __import__("glob").glob(f"{src}/part-*.parquet")][0]
    _sh.copy(part, f"{src}/part-wave2.parquet")
    wave2 = run_once()

    want = {
        r.user_id: r.n for r in events_batch.groupBy("user_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    got = {r.user_id: r.n_events for r in wave2}
    assert got, "second run emitted nothing — state/checkpoint not resumed"
    for uid, n in got.items():
        assert n == 2 * want[uid], f"user {uid}: {n} != 2*{want[uid]}"


def test_watermark_drops_late_events(spark, tmp_path):
    """Event-time watermark semantics on the session stream: events older
    than the watermark carried in the checkpoint are dropped; sessions emit
    (append mode) only once the watermark passes their end."""
    src = str(tmp_path / "wm_incoming")
    ckpt = str(tmp_path / "wm_ckpt")
    T = 1_700_000_000 * 10**9  # ns epoch base
    H = 3600 * 10**9

    def write_wave(rows):
        df = spark.createDataFrame(
            [(i, ts, uid, "click", 1.0, "{}") for i, (ts, uid) in enumerate(rows)],
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        df.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        rows = []
        stream = read_events_stream(spark, src)
        q = (
            sessionize(stream, gap="30 minutes", watermark="1 hour")
            .writeStream.foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return {r.user_id for r in rows}

    # wave A: users 1,2 at T; user 99 at T+3h advances the watermark to
    # T+2h, finalizing the T-sessions (end = T+30min < T+2h)
    write_wave([(T, 1), (T, 2), (T + 3 * H, 99)])
    emitted1 = run_once()
    assert {1, 2} <= emitted1 and 99 not in emitted1

    # wave B against the checkpointed watermark (T+2h):
    #   user 3 at T        → LATE (ts < watermark) → dropped forever
    #   user 5 at T+2h20m  → valid; session end T+2h50m < new watermark
    #   user 4 at T+4h     → advances watermark to T+3h; own session open
    write_wave([(T, 3), (T + 2 * H + 20 * 60 * 10**9, 5), (T + 4 * H, 4)])
    emitted2 = run_once()
    assert 5 in emitted2, "on-time session did not emit"
    assert 3 not in emitted2, "late event survived the watermark"
    assert 4 not in emitted2, "open session emitted early"


def test_stream_dedup_drops_redelivered_events(spark, events_batch, events_dir, tmp_path):
    """At-least-once redelivery: feed every event file TWICE (distinct
    file names, duplicate contents); the watermarked dropDuplicates
    stream must emit each (event_id, ts) once, matching the single-copy
    batch aggregate (itself DuckDB-oracle-checked as events_dedup)."""
    import os

    from xdump_spark.streaming.events import dedup_counts, dedup_events

    redelivered = str(tmp_path / "redelivered")
    os.makedirs(redelivered)
    for i, f in enumerate(sorted(glob.glob(f"{events_dir}/part-*.parquet"))):
        shutil.copy(f, os.path.join(redelivered, f"a{i}.parquet"))
        shutil.copy(f, os.path.join(redelivered, f"b{i}.parquet"))

    stream = read_events_stream(spark, f"{redelivered}/*.parquet", max_files_per_trigger=3)
    # watermark=None: redelivered copies here arrive ARBITRARILY out of
    # event-time order (files span the whole range), so a horizon would
    # also drop genuinely-late originals. Production with in-order
    # sources sets the watermark to the max redelivery lag to bound state
    # (see dedup_events docstring).
    deduped = dedup_events(
        stream.select("event_id", "ts", "event_type", "value"), watermark=None
    )
    q = run_to_memory(deduped, "dedup_stream", output_mode="append")
    try:
        got = spark.table("dedup_stream")
        # every event exactly once, despite 2x delivery
        assert got.count() == events_batch.count()
        want = rows_set(
            dedup_counts(events_batch.select("event_id", "ts", "event_type", "value"))
        )
        agg = got.groupBy("event_type").agg(
            F.count("*").alias("n_unique"), F.round(F.sum("value"), 2).alias("sum_value")
        )
        assert rows_set(agg) == want
    finally:
        q.stop()


def test_sessionize_on_rocksdb_state_store(spark, events_batch, events_dir):
    """The production state-store provider (RocksDB, bundled with Spark)
    must hold the session/window state — same results as the default
    HDFS-backed provider and as the batch anchor."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, f"{events_dir}/part-*.parquet",
                                    max_files_per_trigger=2)
        q = run_to_memory(sessionize(stream), "sess_rocks", output_mode="complete")
        try:
            got = rows_set(spark.table("sess_rocks"))
            want = rows_set(sessionize(events_batch))
            assert got == want
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_static_enrichment_matches_batch(spark, events_batch, events_dir):
    """Stream-static dimension join: the streaming aggregate over
    enriched events must equal the batch twin (itself oracle-checked as
    events_enriched_segment)."""
    from xdump_spark.streaming.events import enrich_by_segment

    customers = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    stream = read_events_stream(spark, f"{events_dir}/part-*.parquet",
                                max_files_per_trigger=2)
    q = run_to_memory(
        enrich_by_segment(stream, customers), "enrich_stream", output_mode="complete"
    )
    try:
        got = rows_set(spark.table("enrich_stream"))
        want = rows_set(enrich_by_segment(events_batch, customers))
        assert got == want
    finally:
        q.stop()


def test_dedup_counts_survivor_independent(spark):
    """Rows that share (event_id, ts) but differ in value are DISTINCT
    events (matching the SQL DISTINCT oracle), not duplicates — the
    aggregate must not depend on which physical copy survives."""
    from xdump_spark.streaming.events import dedup_counts

    rows = [
        (1, 1000, "click", 1.0),
        (1, 1000, "click", 1.0),   # exact redelivery: dropped
        (1, 1000, "click", 9.0),   # same key, different value: kept
        (2, 2000, "view", 5.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts long, event_type string, value double")
    got = {r.event_type: (r.n_unique, r.sum_value) for r in dedup_counts(ev, watermark=None).collect()}
    assert got == {"click": (2, 10.0), "view": (1, 5.0)}
