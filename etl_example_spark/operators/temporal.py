"""Temporal join operators Spark lacks as built-ins, composed Spark-first.

- ``as_of_join``: each left row picks the latest right row at-or-before
  its timestamp (per key). The naive formulation — non-equi join + argmax
  — explodes to a range join (BroadcastNestedLoop at best). This
  implementation is the union-sort composition: tag both sides, one
  shuffle on the key, and a running ``last(..., ignorenulls=True)`` window
  carries the most recent right payload forward onto left rows. O(n log n)
  per key, no pair explosion, exactly one exchange — the plan you want at
  100 TB.

- ``binned_range_join``: equi-join acceleration for bounded time-range
  predicates (``right_ts ∈ [left_ts, left_ts + width)``). Each left row
  is expanded to the (few) time bins its window overlaps; the join becomes
  an equi-join on (key, bin) followed by the exact range filter. Turns a
  nested-loop range join into a shuffle join whose fan-out is
  ``ceil(width/bin) + 1`` — the standard interval-bucketing trick.

Both are deterministic (ties broken by explicit sort keys) and
oracle-checked: DuckDB runs a native ASOF JOIN / plain range join over the
same inputs (plans/relational.py q46/q47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: attach to every left row the payload of the latest
    right row with ``right_ts <= left_ts`` for the same key (nulls when no
    such row). ``right`` must be unique per (key, right_ts) — pre-aggregate
    if needed, or the carried payload is ill-defined.
    """
    # Payload travels as ONE struct so a single last(ignorenulls) carries it
    # atomically: if the newest right row has NULL in one payload column,
    # that NULL is carried as-is rather than silently backfilled from an
    # older right row (per-column last() would mix rows — a result no true
    # ASOF join produces).
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        F.struct(*payload_cols).alias("_payload"),
    )
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(r_tag.schema["_payload"].dataType).alias("_payload"),
        F.struct(*left.columns).alias("_left"),
    )
    r_tag = r_tag.withColumn(
        "_left", F.lit(None).cast(l_tag.schema["_left"].dataType)
    )
    # right rows sort before left rows at equal timestamps (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tag.unionByName(l_tag).withColumn(
        "_carried", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_src") == 1).select(
        F.col("_left.*"),
        *[F.col("_carried")[c].alias(c) for c in payload_cols],
    )


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_ts: str,
    right_ts: str,
    width_seconds: int,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Inner join of right rows with ``left_ts <= right_ts < left_ts +
    width`` on matching keys, executed as an equi-join on (key, time bin).

    Left rows replicate into every bin their window overlaps
    (``width/bin + 1`` bins); right rows land in exactly one bin. The
    equi-join on (key, bin) prunes all non-overlapping pairs before the
    exact predicate runs."""
    bin_s = bin_seconds or width_seconds
    # a half-open window of length `width` placed anywhere overlaps at most
    # width//bin + 2 bins (the +2 covers both misaligned edges); the exact
    # predicate below prunes the over-covered pairs
    n_bins = width_seconds // bin_s + 2

    def epoch_us(col: str):
        # TIMESTAMP_NTZ has no direct long cast; coerce via TIMESTAMP
        # (session tz is UTC, so wall time == epoch) then exact micros
        return F.unix_micros(F.col(col).cast("timestamp"))

    l_bin = F.floor(epoch_us(left_ts) / (bin_s * 1_000_000))
    l_expanded = left.withColumn(
        "_lbin",
        F.explode(F.sequence(l_bin, l_bin + F.lit(n_bins - 1))),
    )
    r_binned = right.withColumn(
        "_rbin", F.floor(epoch_us(right_ts) / (bin_s * 1_000_000))
    )
    width_us = width_seconds * 1_000_000
    return (
        l_expanded.join(
            r_binned,
            (F.col(key_left) == F.col(key_right))
            & (F.col("_lbin") == F.col("_rbin")),
        )
        .drop("_lbin", "_rbin")
        .filter(
            (epoch_us(right_ts) >= epoch_us(left_ts))
            # exact integer microseconds — no truncation at the boundary
            & (epoch_us(right_ts) < epoch_us(left_ts) + width_us)
        )
    )


def resample_daily_ffill(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Gap-filled daily resample with forward fill, per key.

    Aggregates to (key, day) — count + exact-cents value sum — then
    expands each key's [first_day, last_day] span to a dense day grid
    (``F.sequence`` + explode: the grid generates distributed, next to
    each key's span row, never on the driver) and left-joins the
    aggregates back. Missing days get ``n_events = 0`` and carry the
    most recent prior day's value via ``last(..., ignorenulls)`` — the
    time-series gap-fill/LOCF primitive.

    Scale shape: one shuffle to the (key, day) aggregate, one to the
    per-key span, and the fill window partitions by key — parallel
    across keys, no global sort. Span explosion is bounded by the
    calendar (days), not the event count.
    """
    day = F.date_trunc("day", F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    daily = events.groupBy(F.col(key), day.alias("d")).agg(
        F.count("*").alias("n_events"),
        F.sum(cents).alias("value_cents"),
    )
    span = daily.groupBy(key).agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = span.select(
        key,
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, [key, "d"], "left")
        .select(
            key,
            "d",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            (
                F.last("value_cents", ignorenulls=True).over(w).cast("double")
                / 100
            ).alias("filled_value"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP (half-open:
    ``l_start < r_end AND r_start < l_end``) on matching keys — the
    general interval×interval case of ``binned_range_join``.

    Both sides replicate into every time bin their interval touches and
    the join runs as an equi-join on (key, bin). Because an overlapping
    pair shares every bin the overlap spans, the join would emit
    duplicates; instead of a post-join ``distinct`` (an extra shuffle of
    the matched pairs), each pair is counted only in its overlap's
    FIRST bin — ``bin == floor(greatest(l_start, r_start) / bin_s)`` —
    which is unique per pair by construction. Fan-out is bounded by
    interval length / bin width; the exact predicate prunes bin-grazing
    false candidates.
    """

    def epoch_us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    bin_us = bin_seconds * 1_000_000

    def expanded(df: DataFrame, start: str, end: str, out: str):
        lo = F.floor(epoch_us(start) / bin_us)
        # half-open end: an interval ending exactly on a bin boundary
        # does not touch that bin
        hi = F.floor((epoch_us(end) - 1) / bin_us)
        return df.withColumn(out, F.explode(F.sequence(lo, hi)))

    l_exp = expanded(left, left_start, left_end, "_lbin")
    r_exp = expanded(right, right_start, right_end, "_rbin")
    anchor = F.floor(
        F.greatest(epoch_us(left_start), epoch_us(right_start)) / bin_us
    )
    return (
        l_exp.join(
            r_exp,
            (F.col(key_left) == F.col(key_right))
            & (F.col("_lbin") == F.col("_rbin")),
        )
        .filter(
            (epoch_us(left_start) < epoch_us(right_end))
            & (epoch_us(right_start) < epoch_us(left_end))
            & (F.col("_lbin") == anchor)
        )
        .drop("_lbin", "_rbin")
    )
