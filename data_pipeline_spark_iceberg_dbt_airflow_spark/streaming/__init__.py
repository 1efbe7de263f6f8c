"""Structured Streaming jobs (SURVEY.md §2.9)."""

from .jobs import (  # noqa: F401
    RUNNING_COUNT_SCHEMA,
    correlate_streams,
    dedup_stream,
    enrich_stream,
    ingest_stream_dedup,
    read_events_stream,
    run_to_memory_sink,
    running_counts,
    windowed_counts,
)
