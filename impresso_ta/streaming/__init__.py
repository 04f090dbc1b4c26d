"""Structured Streaming extensions (incremental ingest, windowed aggs)."""

from impresso_ta.streaming.ingest import (  # noqa: F401
    stream_canonical_issues,
    stream_windowed_event_counts,
)
