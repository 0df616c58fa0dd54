"""Stream-static joins: enrich a stream with a batch dimension table.

The canonical streaming enrichment: the static side is a plain batch
DataFrame (re-read per micro-batch, so dimension updates between batches
are picked up), the stream side never buffers state for it, and with a
small dimension the per-batch join is a broadcast hash join — the same
plan a batch enrichment gets, applied incrementally. Stateless, so no
watermark is required; any output mode works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join a streaming DataFrame against a static dimension.

    ``F.broadcast`` on the static side pins the broadcast-hash plan per
    micro-batch (inner and left-outer are the stream-static modes Spark
    supports for the static right side)."""
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    )
