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

__all__ = [
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
