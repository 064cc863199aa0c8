"""Structured Streaming surface (SURVEY.md §2.11 extension).

The reference has no streaming; the driver's `events` table motivates a
stream-shaped surface. Batch queries over events live in
operators/relational.py; this package holds the true Structured
Streaming pipelines (watermarks, windows, session windows, streaming
dedup) plus the synchronous test harness.
"""

from .events import (
    run_stream_to_batch,
    stream_dedup_events,
    stream_hourly_counts,
    stream_session_windows,
    stream_sliding_avg,
)

__all__ = [
    "run_stream_to_batch",
    "stream_dedup_events",
    "stream_hourly_counts",
    "stream_session_windows",
    "stream_sliding_avg",
]
