"""Skew mitigation: salted aggregation and salted broadcast-side joins.

AQE's skew-join splitting (on in the session factory) handles most skew at
runtime by splitting oversized shuffle partitions. These helpers cover the
two cases AQE can't fix:

- **Hot-key aggregation** (``salted_agg``): one reduce task receives one
  giant key. Salting splits each key into ``salt`` sub-keys for a partial
  aggregate, then re-aggregates the (now tiny) per-key partials. Works for
  any algebraic aggregate (sum/count/min/max and compositions).
- **Hot-key shuffle join**: a shuffle join where one side's hot keys
  overload single tasks. First choice: ``F.broadcast`` the small side —
  a broadcast join never shuffles the skewed side, so its skew is
  irrelevant. When neither side broadcasts, ``salt_explode_join`` salts
  the big side and explodes the small side by salt so hot keys spread
  over ``salt`` tasks.

Salts come from ``monotonically_increasing_id`` (per-row unique, so even
fully identical duplicate rows — the degenerate hot-key shape — spread
across all ``salt`` sub-groups); stable for a fixed input partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    """Salt column in [0, salt) from a per-row unique source
    (``monotonically_increasing_id``): consecutive rows round-robin across
    sub-groups, so even *identical* duplicate rows — which a content-hash
    salt would collapse onto one reduce task — spread evenly. Any value in
    [0, salt) is equally correct (the salt only routes, phase 2 merges), so
    the id's dependence on input partitioning is harmless."""
    return df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )


#: phase-1 aggregate and its phase-2 partial-merge, per aggregate kind
_AGG_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # partial counts merge by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups by (key, _salt) — a hot key's rows split across
    ``salt`` reduce tasks; phase 2 re-aggregates the (tiny) per-key
    partials. ``aggs`` maps output name → (kind, column) with kind in
    {sum, count, min, max}; the kind determines both the phase-1
    aggregate and the correct partial merge (counts merge by summing).
    """
    phase1 = (
        with_salt(df, salt)
        .groupBy(*group_by, "_salt")
        .agg(
            *[
                _AGG_KINDS[kind][0](col).alias(name)
                for name, (kind, col) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*group_by).agg(
        *[
            _AGG_KINDS[kind][1](name).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salt_explode_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Skewed shuffle join fallback when the small side is too large to
    broadcast: salt the big side, explode the small side ``salt``× so every
    (key, salt) bucket finds its match. Result equals ``big.join(small,
    key)``; the hot key's rows now land on ``salt`` tasks instead of one."""
    big_salted = with_salt(big, salt)
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")
