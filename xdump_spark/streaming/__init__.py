from xdump_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_counts,
    dedup_events,
    enrich_by_segment,
    hourly_rollup,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    sessionize,
)
from xdump_spark.streaming.ingest import INGEST_KINDS, run_ingest

__all__ = [
    "INGEST_KINDS",
    "run_ingest",
    "EVENTS_SCHEMA",
    "dedup_counts",
    "dedup_events",
    "enrich_by_segment",
    "hourly_rollup",
    "read_events_stream",
    "run_to_memory",
    "running_user_totals",
    "sessionize",
]
