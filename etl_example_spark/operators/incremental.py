"""Incremental aggregate maintenance — merge a delta into a rollup
without recomputing from the base table.

The 100 TB pattern: a daily ingest appends one partition; the per-key
rollup (counts, sums, mins, maxes — any algebraic aggregate) must absorb
it. Recomputing scans everything ever ingested; merging re-aggregates the
old rollup with the delta's partial aggregate — work proportional to
|delta| + |affected keys|, not |history|. The merge is a union + one
hash aggregate: Spark's partial/final aggregation already knows how to
combine partials, so the "incremental" operator is just aggregation
applied to (previous result ∪ new partials) — same plan shape at any
scale, and the result is bit-identical to the full recompute for
algebraic aggregates (exact integer sums; avg derives as sum/count at
read time).

Non-algebraic aggregates (exact distinct counts, medians) do NOT merge
this way — keep their inputs (or a mergeable sketch: HLL, KLL) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: merge function per aggregate kind: how two partials combine
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts combine by summing
    "min": F.min,
    "max": F.max,
}


def partial_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Per-key partial aggregate of a batch. ``aggs`` maps output name →
    (kind, column), kind ∈ {sum, count, min, max}."""
    first = {
        "sum": lambda c: F.sum(c),
        "count": lambda c: F.count(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
    }
    return df.groupBy(*keys).agg(
        *[first[kind](col).alias(name) for name, (kind, col) in aggs.items()]
    )


def merge_partials(
    state: DataFrame, delta: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """New rollup state = old state ∪ delta partials, re-aggregated with
    each aggregate's merge function. Bit-identical to full recompute for
    these algebraic kinds."""
    return state.unionByName(delta).groupBy(*keys).agg(
        *[
            _MERGE[kind](name).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
