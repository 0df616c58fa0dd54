"""Exact global order statistics without the single-task funnel.

``Window.orderBy(...)`` with no partition spec is the one Spark
construct that is *always* wrong at scale: EnsureRequirements plans
``Exchange SinglePartition`` beneath it, so the window's entire input —
a 100 M-term vocabulary, a 100 TB corpus scan — sorts on ONE task
(Spark itself logs "Moving all data to a single partition" every time).
Yet exact global ``row_number``/``NTILE``/running totals are legitimate
asks (decile budgeting, coverage curves, hybrid-retrieval rank fusion).

This module computes them the way a distributed engine should — the
classic two-pass range-partitioned rank:

1. ``repartitionByRange(order)`` — Spark's range partitioner (the same
   machinery behind ``orderBy``) splits the input into partitions that
   are globally ordered BETWEEN partitions; rows sort locally WITHIN
   each via an ordinary partitioned window keyed on
   ``spark_partition_id()``.
2. Per-partition row counts (a ``numPartitions``-row aggregate — bounded
   by cluster topology, not data) turn into exclusive prefix offsets
   with one window over those few rows; a broadcast join adds each
   partition's offset to its local ranks.

``global rank = local rank + (rows in all earlier range partitions)`` —
exact, deterministic, and every corpus-sized structure stays
distributed. The only single-partition window left is over the
``numPartitions``-row count table, which is bounded input by
construction (plan-lint recognizes the ``__gr_pid`` key).

Both consumers of the range exchange (the local-rank window and the
count aggregate) share one canonicalized subtree, so Catalyst's
ReuseExchange (and AQE stage reuse) materializes the range shuffle
ONCE — the per-partition counts and the local ranks are guaranteed to
see the same partition boundaries. ``tests/test_rank.py`` pins
the reuse in the physical plan, because the offsets would silently
mis-align if the two branches ever recomputed the exchange with
different sampled boundaries.

Correctness requires the order to be a TOTAL order (callers pass a
unique tie-break column, the same discipline every registered top-k
query already follows): range boundaries may split ties across
partitions, which is harmless for row_number only when no two rows
compare equal.

Replaces the reference pattern of ``NTILE(n) OVER (ORDER BY ...)`` /
``ROW_NUMBER() OVER (ORDER BY ...)`` (PostgreSQL window SQL, cf.
/root/reference/sql/queries.sql) at scales where a one-task sort is
not an option.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Internal column names — prefixed so plan-lint can recognize the
#: bounded offsets window and callers' columns never collide.
_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFF = "__gr_off"
_CNT = "__gr_cnt"
_SUM_LOCAL = "__gr_sum_local"
_SUM_OFF = "__gr_sum_off"


def global_row_number(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "rank",
    running_sum_col: str | Column | None = None,
    running_sum_out: str = "running_sum",
    total_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY order)`` as a new long column
    ``out`` — two-pass range-partitioned, no single-task sort.

    ``order`` must be a total order over ``df`` (include a unique
    tie-break column). When ``running_sum_col`` is given, the running
    ``SUM(col) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING..CURRENT)``
    is also computed (same two-pass trick: local running sum + the
    earlier partitions' total rides the same offsets join) into
    ``running_sum_out``. When ``total_out`` is given, the TOTAL row
    count rides along as a constant column of that name — folded from
    the numPartitions-row count table (one more reuse of the range
    exchange), never a second scan of ``df``.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    order = list(order)

    ranged = df.repartitionByRange(n, *order).withColumn(
        _PID, F.spark_partition_id()
    )

    w_local = Window.partitionBy(_PID).orderBy(*order)
    local_cols = [F.row_number().over(w_local).alias(_LOCAL)]
    sum_expr = (
        F.col(running_sum_col)
        if isinstance(running_sum_col, str)
        else running_sum_col
    )
    if sum_expr is not None:
        local_cols.append(
            F.sum(sum_expr)
            .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
            .alias(_SUM_LOCAL)
        )
    local = ranged.select("*", *local_cols)

    # Pass 2: per-partition totals -> exclusive prefix offsets. The
    # aggregate is numPartitions rows; the prefix window over it is the
    # ONLY single-partition window, over bounded input by construction.
    aggs = [F.count("*").alias(_CNT)]
    if sum_expr is not None:
        aggs.append(F.sum(sum_expr).alias(_SUM_OFF + "_part"))
    counts = ranged.groupBy(_PID).agg(*aggs)
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
    ]
    if sum_expr is not None:
        off_cols.append(
            F.coalesce(
                F.sum(_SUM_OFF + "_part").over(w_off), F.lit(0)
            ).alias(_SUM_OFF)
        )
    offsets = counts.select(*off_cols)

    joined = local.join(F.broadcast(offsets), _PID)
    if total_out is not None:
        total = counts.agg(F.sum(_CNT).cast("long").alias(total_out))
        joined = joined.crossJoin(F.broadcast(total))
    result_cols = [
        (F.col(_LOCAL) + F.col(_OFF)).cast("long").alias(out)
    ]
    if sum_expr is not None:
        result_cols.append(
            (F.col(_SUM_LOCAL) + F.col(_SUM_OFF)).alias(running_sum_out)
        )
    drop = [_PID, _LOCAL, _OFF] + (
        [_SUM_LOCAL, _SUM_OFF] if sum_expr is not None else []
    )
    return joined.select("*", *result_cols).drop(*drop)


def global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    n_buckets: int,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n_buckets) OVER (ORDER BY order)`` as a new long
    column ``out`` — derived arithmetically from the two-pass global
    row_number plus the total row count, so no corpus-sized input ever
    crosses a single task.

    NTILE semantics (ANSI, matching both Spark and DuckDB): with ``c``
    rows and ``n`` buckets, the first ``c mod n`` buckets hold
    ``c div n + 1`` rows and the rest ``c div n``; bucket(rank) inverts
    that piecewise-linear cumulative. ``order`` must be a total order
    (NTILE over ties is engine-ambiguous anyway — every caller here
    already carries a unique tie-break key).

    The divisions run in doubles then truncate — exact while counts stay
    under 2^53 (~9e15 rows; comfortably past 100 TB of any row width).
    The ``q == 0`` case (fewer rows than buckets) never reaches the
    ``/ q`` branch: ``big_span == c`` there, so every rank takes the
    first branch.
    """
    ranked = global_row_number(
        df,
        order,
        out="__gr_rank",
        total_out="__gr_total",
        num_partitions=num_partitions,
    )
    r, c, n = F.col("__gr_rank"), F.col("__gr_total"), F.lit(n_buckets)
    q = (c / n).cast("long")  # floor: both operands non-negative
    rem = c % n
    big_span = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = F.when(
        r <= big_span, ((r - 1) / (q + 1)).cast("long") + 1
    ).otherwise(rem + ((r - big_span - 1) / q).cast("long") + 1)
    return (
        ranked.select("*", bucket.cast("long").alias(out))
        .drop("__gr_rank", "__gr_total")
    )
