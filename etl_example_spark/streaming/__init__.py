"""Structured Streaming surface of the engine.

The reference has no streaming path (SURVEY §2.8) — this package is the
additive capability tier: file-stream sources, watermarked event-time
windows (tumbling / sliding / session), custom stateful operators via
``applyInPandasWithState``, and memory / foreachBatch-parquet sinks.

Everything is expressed against the same event-time semantics as the
batch twins in plans/relational.py (q20/q21), so each streaming query is
DuckDB-oracle-checkable: run the stream to completion with
``Trigger.AvailableNow`` and compare against the batch SQL with the
watermark cutoff written out explicitly.
"""

from etl_example_spark.streaming.sinks import run_to_memory, stream_to_parquet
from etl_example_spark.streaming.sources import read_events_stream
from etl_example_spark.streaming.stateful import first_seen_dedup
from etl_example_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "stream_to_parquet",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "first_seen_dedup",
]
