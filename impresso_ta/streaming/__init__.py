"""Structured Streaming extensions (incremental ingest, windowed aggs,
stateful sessionization)."""

from impresso_ta.streaming.ann import stream_ivf_ingest  # noqa: F401
from impresso_ta.streaming.ingest import (  # noqa: F401
    stream_canonical_issues,
    stream_windowed_event_counts,
)
from impresso_ta.streaming.sessions import stream_sessionize  # noqa: F401
