"""Structured-Streaming operators over the ``events`` table.

The reference engine has no streaming surface (SURVEY.md §2.2 — "Streaming:
none"); this module is the §7.2-step-9 scale extension: the same event
analytics exposed batch-first (so DuckDB can oracle-check them) with a
streaming twin that shares the transformation code path. Patterns:

- file-source ``readStream`` with an explicit schema (schema inference is
  disabled on streams for a reason — never rely on it),
- event-time watermarks + tumbling windows for late data,
- ``session_window`` gap sessionization (Spark-native, no UDF),
- ``applyInPandasWithState`` for custom per-key running state that window
  functions cannot express incrementally.

At 100 TB / real Kafka scale the same code applies: only the reader config
changes (``format("kafka")`` + ``from_json``); every aggregation below is
incremental, partitioned by key, and never collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery


def _vsum():
    """Order-independent value sum (same policy as queries._msum): exact
    decimal accumulation — associative, so micro-batch merge order and
    batch partitioning give identical bits — rounded to cents IN DECIMAL
    (HALF_UP matches DuckDB; rounding the double instead diverges on
    .x95 representational ties), then presented as double. Keeps the
    stream twins bit-equal to their batch anchors at any scale. The
    outer F.round at call sites is an identity on scale-2 values."""
    return F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2).cast("double")

# Reference source schema for the CURRENT driver events layout (ts stored
# as a parquet µs timestamp). Kept for callers that construct compatible
# streams; read_events_stream probes the real files instead of trusting it,
# because the layout has changed once already (int64 ns → timestamp[us]).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over event parquet files (``path`` may be a glob).

    Schema inference is disabled on file streams, so the source schema is
    taken from a one-off BATCH probe of the same path (footers only — no
    data scan). That keeps the stream layout-adaptive the same way
    ``catalog.read_events`` is: both the current timestamp[us] layout and
    the older int64-ns layout normalize to ts TIMESTAMP + ts_ns LONG via
    ``catalog.normalize_events_ts``. New files appearing later must match
    the layout present at stream definition time — standard file-source
    semantics (the schema is fixed per stream).

    ``maxFilesPerTrigger`` splits the backlog into multiple micro-batches —
    used by tests to exercise true incremental state; production would point
    at an arriving-files directory or swap in a Kafka reader.

    NOTE: sets ``spark.sql.legacy.parquet.nanosAsLong`` for the *session*
    and leaves it set — the conf must hold for every micro-batch of the
    returned stream, so it cannot be save/restored here (batch reads use
    ``catalog.read_events``, which does restore it). It is a no-op for
    µs-timestamp files; for ns files it surfaces ts as long instead of
    erroring.
    """
    from xdump_spark.catalog import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(path)
    reader = spark.readStream.schema(probe.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return normalize_events_ts(df, source=f"events stream at {path!r}")


def _maybe_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    # withWatermark is streaming-only; the batch twin (what the DuckDB
    # oracle checks) runs the identical aggregation without it.
    if events.isStreaming and watermark is not None:
        return events.withWatermark("ts", watermark)
    return events


def hourly_rollup(events: DataFrame, watermark: str | None = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count + value sum.

    Incremental on a stream (partial aggregation per micro-batch, state
    keyed by (window, event_type)); a plain hash aggregate in batch.
    """
    src = _maybe_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(_vsum(), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Gap-based sessionization via ``session_window`` (no UDF, mergeable
    session state on streams). A session groups a user's events where each
    event starts within ``gap`` of the previous one; ``session_end`` is
    last-event-time + gap, per Spark/standard session-window semantics.
    """
    src = _maybe_watermark(events, watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(_vsum(), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_events(
    events: DataFrame, keys: list[str] | None = None, watermark: str | None = "2 hours"
) -> DataFrame:
    """Exactly-once-ify an at-least-once event stream: drop redelivered
    events by key within the watermark horizon (``dropDuplicates`` keyed
    state, expired as the watermark advances — the streaming twin of the
    corpus exact-dedup operator). In batch the same call is a plain
    keyed dedup, so a SQL oracle can check the semantics.

    The event-time column must be part of ``keys`` (or a watermark alone
    cannot bound state): default key is (event_id, ts).

    Watermark semantics caveat: ``dropDuplicates`` + watermark drops any
    event OLDER than the horizon, duplicate or not — so the horizon must
    cover the source's redelivery lag *in event time*. For sources that
    redeliver arbitrarily out of order, pass ``watermark=None``
    (unbounded state, exact batch semantics)."""
    keys = keys or ["event_id", "ts"]
    src = _maybe_watermark(events, watermark)
    return src.dropDuplicates(keys)


def dedup_counts(events: DataFrame, watermark: str | None = "2 hours") -> DataFrame:
    """Aggregated view of ``dedup_events`` suitable for a value-hash
    oracle regardless of which physical duplicate survives: dedup keys
    are EVERY projected column (exact full-row dedup — the same set the
    SQL DISTINCT oracle uses), so rows sharing (event_id, ts) but
    differing in value/event_type count as distinct events rather than
    leaving sum_value survivor-dependent. Redelivered copies are
    byte-identical, so this is still the exactly-once view."""
    deduped = dedup_events(events, keys=list(events.columns), watermark=watermark)
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n_unique"),
        F.round(_vsum(), 2).alias("sum_value"),
    )


def enrich_by_segment(
    events: DataFrame, customers: DataFrame, watermark: str | None = "2 hours"
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a STATIC
    dimension (customer, broadcast — the static side is re-read per
    micro-batch but never shuffles the stream) and aggregate per market
    segment. The canonical streaming-enrichment pattern: stream-static
    joins need no watermark on the static side and no state beyond the
    aggregation's."""
    src = _maybe_watermark(events, watermark)
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        src.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(_vsum(), 2).alias("sum_value"),
        )
    )


# -- custom stateful operator (applyInPandasWithState) ----------------------

_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running state and emit
    the updated running totals (Arrow-batched: each pdf is a chunk of the
    group, never the whole partition in memory)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime running totals, emitted every micro-batch — the
    custom-stateful-operator pattern (brief: ``applyInPandasWithState``).

    Unlike a windowed agg, state here is unbounded per key and the operator
    emits on every update; at scale, state lives in the state store
    partitioned by user_id (RocksDB provider in production).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "update", timeout: int = 120
) -> "StreamingQuery":
    """Drain all available input into an in-memory table ``name`` with
    ``trigger(availableNow=True)`` and block until done (test/dev sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not drain within {timeout}s; "
            "stopped to avoid reading a partially-committed memory table"
        )
    return q
