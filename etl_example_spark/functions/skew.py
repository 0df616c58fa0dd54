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

Salts are **deterministic per row content** (``xxhash64`` over every
column): a row re-computed under a stage/task retry lands in the same
sub-group it did the first time. A nondeterministic salt (e.g.
``monotonically_increasing_id``/``rand``) can re-route rows between
reduce partitions across retries, double-counting or dropping them
(the SPARK-23207 failure class) — invisible on single-node tests, real
on a 1000-executor cluster. The cost is that *bit-identical* duplicate
rows share a sub-group; if exact duplicates dominate a hot key,
pre-aggregate them first (``groupBy(all columns).count()`` + weighted
phase-1 aggregates) — the duplicate-collapse shuffle has distinct keys
and therefore no skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def with_salt(
    df: DataFrame, salt: int, salt_cols: Sequence[str] | None = None
) -> DataFrame:
    """Salt column in [0, salt): ``pmod(xxhash64(<salt_cols>), salt)``.

    Content-derived, so the salt is **stable across re-computation** — a
    task retry reproduces the same routing and phase-2 merges exactly the
    partials it would have the first time. (Any value in [0, salt) is
    semantically correct — the salt only routes, phase 2 merges — but it
    must be the SAME value every time the row is computed; see module
    docstring for why nondeterministic sources are unsafe under retries.)
    Distinct rows of a hot key spread uniformly; bit-identical duplicates
    share a sub-group (pre-aggregate duplicates first if that shape
    dominates).

    ``salt_cols`` defaults to every *hashable* column: MapType columns are
    excluded (Spark forbids hashing maps — DATATYPE_MISMATCH under the
    default ``spark.sql.legacy.allowHashOnMapType=false``), and narrowing
    to a few high-cardinality columns also cuts per-row hash cost on wide
    rows. Passing an explicit subset is the fast path; determinism only
    requires that the chosen columns are stable row content.

    An all-MapType schema raises ``ValueError``: with no hashable
    column the only deterministic salt would be a constant, which
    routes every row of the hot key to ONE sub-group — silently
    disabling the spreading this helper exists for. Pass explicit
    ``salt_cols`` derived from the maps instead (e.g.
    ``df.withColumn("_mk", F.map_keys("m"))`` then
    ``salt_cols=["_mk"]``)."""
    if salt_cols is None:
        salt_cols = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
        if not salt_cols:
            raise ValueError(
                "with_salt: every column is a MapType (unhashable in "
                "Spark); a constant salt would route the hot key to one "
                "sub-group, defeating the salting. Pass explicit "
                "salt_cols derived from the maps (e.g. a map_keys()/"
                "map_values() column)."
            )
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt))
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
    dedup_first: bool = False,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups by (key, _salt) — a hot key's rows split across
    ``salt`` reduce tasks; phase 2 re-aggregates the (tiny) per-key
    partials. ``aggs`` maps output name → (kind, column) with kind in
    {sum, count, min, max}; the kind determines both the phase-1
    aggregate and the correct partial merge (counts merge by summing).

    ``dedup_first=True`` handles the degenerate hot-key shape where
    *bit-identical* duplicate rows dominate (a content-derived salt
    routes them to one sub-group): collapse exact duplicates with a
    ``groupBy(<all referenced columns>).count()`` — distinct keys, so
    that shuffle has no skew — then run weighted phase-1 aggregates
    (sum → sum(col·n), count → sum(n); min/max unchanged). Both paths
    are deterministic under task retry (see ``with_salt``).
    """
    if dedup_first:
        agg_cols = {col for _, (_, col) in aggs.items()}
        if not all(isinstance(c, str) for c in agg_cols):
            raise ValueError("dedup_first requires string column names")
        cols = list(group_by) + sorted(agg_cols - set(group_by) - {"*"})
        collapsed = df.groupBy(*cols).agg(F.count("*").alias("_dup"))
        weighted = {
            "sum": lambda c: F.sum(F.col(c) * F.col("_dup")),
            # COUNT(col) skips nulls — weight only non-null rows so the
            # dedup path matches the plain F.count(col) aggregate;
            # COUNT(*) counts every row, so it keeps the raw weight sum.
            "count": lambda c: (
                F.sum("_dup")
                if c == "*"
                else F.sum(
                    F.when(F.col(c).isNotNull(), F.col("_dup")).otherwise(
                        F.lit(0)
                    )
                )
            ),
            "min": F.min,
            "max": F.max,
        }
        phase1 = (
            with_salt(collapsed, salt)
            .groupBy(*group_by, "_salt")
            .agg(
                *[
                    weighted[kind](col).alias(name)
                    for name, (kind, col) in aggs.items()
                ]
            )
        )
    else:
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
