"""Z-order (Morton) clustering for multi-dimensional data skipping.

Sorting a fact table by one column gives tight per-file min/max stats on
that column only; filters on any other column skip nothing. Interleaving
the bits of k columns into one Morton key and range-partitioning + sorting
by it gives every file a compact hyper-rectangle of the key space — so
min/max pruning works on EVERY interleaved dimension at once. This is the
layout lever behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; at 100 TB it is
the difference between scanning one dimension's slice and scanning
everything for the second predicate.

The key is pure integer arithmetic (shift/mask/or), expressible
identically in Spark and any SQL engine — no UDF, stays inside
whole-stage codegen, and the write path is one range exchange + in-
partition sort (exactly what a global ORDER BY costs).

Columns must be non-negative integers below ``2^bits``; map real columns
onto that grid first (e.g. ``pmod(hash(col), 2^bits)`` for categorical,
epoch-time bucketing for timestamps) — standard Z-order practice, the
grid only drives layout, never query results. Match ``bits`` to the
columns' ACTUAL ranges: bits a column never uses are constant zeros, the
interleave degenerates toward a 1-D sort on the other columns, and the
under-ranged dimension's files go unbounded (measured in
tests/test_zorder.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key: bit i of column j lands at position ``i * k + j``.

    With the default 16 bits and k ≤ 4 columns the key fits a long with
    headroom. The expansion is ``bits × k`` shift/mask terms — all
    codegen'd integer ops, constant-folded shifts."""
    k = len(cols)
    if not 1 <= k <= 4:
        raise ValueError(f"zvalue interleaves 1-4 columns, got {k}")
    if bits * k > 62:
        raise ValueError(f"bits * k must fit a long: {bits} * {k}")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def sql_zvalue(exprs: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as portable SQL arithmetic (oracle twin)."""
    k = len(exprs)
    terms = [
        f"(((({e}) >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, e in enumerate(exprs)
    ]
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-ordered on ``cols``: range-partition by the Morton
    key (balanced files via range-exchange sampling), sort within each
    partition, drop the key. Each output file then covers a compact
    rectangle in (cols) space — parquet min/max stats prune on every
    clustered column."""
    zed = df.withColumn("_z", zvalue(list(cols), bits))
    parts = (
        zed.repartitionByRange(num_files, "_z")
        if num_files
        else zed.repartitionByRange("_z")
    )
    (
        parts.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )
