"""Structured-Streaming operators.

The reference "streams" bounded data with backpressure only — no
event-time/watermark/window semantics (SURVEY.md §2.8). This package is
the driver-mandated extension: real Structured Streaming over the
events table, with batch twins for the correctness gate.
"""

from neo4j_arrow_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    sessionize_batch,
    stateful_user_counts,
    windowed_event_agg,
)
from neo4j_arrow_spark.streaming.ingest import refresh_graph, start_rel_ingest

__all__ = [
    "read_event_stream",
    "refresh_graph",
    "run_to_memory",
    "sessionize_batch",
    "start_rel_ingest",
    "stateful_user_counts",
    "windowed_event_agg",
]
