"""Event-time windowed aggregations with watermarks.

Three window shapes over the event stream, all pure built-ins
(``F.window`` / ``F.session_window`` + hash aggregation — state lives in
the HDFS-backed state store, partitioned by window key, so a 1000-executor
cluster shards window state the same way it shards a batch groupBy):

- tumbling: fixed 1h buckets, complete mode (no watermark — the full
  result table re-emits per batch; correct twin of batch q21);
- sliding + watermark, append mode: only windows the watermark has closed
  are emitted — late-data semantics made visible in the output set;
- session windows + watermark: per-user gap-based sessions
  (``F.session_window(ts, gap)``), the streaming twin of batch q20.

Append-mode emission rule (mirrored verbatim in the DuckDB oracles): a
window is emitted iff ``window.end <= watermark`` where the final
watermark after AvailableNow's trailing no-data batch is
``max(event_time) - delay``. Session windows: ``end = last_event + gap``;
two events are one session iff their gap is strictly < ``gap`` (i.e. a
new session starts at gap >= 30min).

Exact value sums use the scaled-integer pattern
(functions/numeric.as_scaled_long): integer partials are shuffle-cheap
and re-aggregation-order-proof — in streaming they are also *state-store*
values, where exactness across micro-batch re-merges matters even more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_example_spark.functions.numeric import as_scaled_long


def _exact_value_sum() -> Column:
    return (F.sum(as_scaled_long("value")).cast("double") / 100).alias(
        "total_value"
    )


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows: count + exact value sum per bucket."""
    return (
        events.groupBy(F.window("ts", width).alias("w"))
        .agg(F.count("*").alias("n_events"), _exact_value_sum())
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows with a watermark: each event lands in
    width/slide overlapping buckets; append mode emits a bucket once the
    watermark passes its end (late rows older than the watermark are
    dropped instead of reopening state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), _exact_value_sum())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def click_view_attribution(
    clicks: DataFrame,
    views: DataFrame,
    within: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: attribute each view to same-user clicks
    that happened in the ``within`` window before it.

    Both streams carry watermarks and the join condition bounds event-time
    distance, so Spark can evict join state once the watermark passes a
    row's attribution horizon — bounded state on two unbounded streams.
    Emission itself is not watermark-gated for inner joins (matches emit
    as they are found), so a single-batch run equals the batch time-range
    self-join exactly — which is what the DuckDB oracle states.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") > F.col("click_ts"))
        & (F.col("view_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        "click_ts",
        "view_ts",
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user gap-based session windows (session closes after ``gap`` of
    inactivity; window end = last event + gap). State is keyed by
    (user_id, session) and evicted as the watermark passes each session's
    end — bounded memory on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), _exact_value_sum())
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
