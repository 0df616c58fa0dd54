"""Streaming sinks and the run-to-completion harness.

``run_to_memory`` drives a streaming DataFrame with
``Trigger.AvailableNow`` into a memory sink and returns the result as a
plain DataFrame — the bridge that lets streaming queries live in the same
oracle-checked registry as batch queries. AvailableNow processes all
currently-available input, runs the trailing no-data micro-batch (which
advances the watermark past the final event and flushes every closeable
window), then terminates.

``stream_to_parquet`` is the production sink shape: ``foreachBatch``
writing each micro-batch to parquet. foreachBatch gets a *batch*
DataFrame, so the full batch writer surface (partitionBy, compression,
dynamic overwrite) applies; exactly-once comes from the checkpoint's
batch-id tracking plus idempotent per-batch writes.
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame

_SEQ = itertools.count()


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink; return the sink contents as a batch DataFrame.

    Pass an explicit ``checkpoint`` to resume a prior run's state (the
    restart path: watermark, window state, and GroupState all come back
    from the checkpoint, and already-processed files are skipped)."""
    table = name or f"stream_result_{next(_SEQ)}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix=f"ckpt_{table}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sdf.sparkSession.table(table)


def stream_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """foreachBatch parquet sink, run to completion with AvailableNow.

    Each micro-batch lands as zstd parquet under ``path`` (optionally
    partitioned); the checkpoint makes restarts resume-not-reprocess.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append").option("compression", "zstd")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    query = (
        sdf.writeStream.foreachBatch(write_batch)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ckpt_parquet_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
