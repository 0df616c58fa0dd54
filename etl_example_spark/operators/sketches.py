"""Count-min sketch — the bounded-memory frequency summary for
streaming/merge-friendly heavy-hitter tracking, as relational algebra.

The sketch is a (depth × width) grid of counters; item x increments one
cell per row (col = md5-derived hash of (row, x) mod width) and its
estimate is the MIN over its cells — never an underestimate, over by at
most the collision mass (ε = e/width of the total count, with
probability 1 − e^−depth). The grid is depth·width integers regardless
of corpus size, mergeable by cell-wise addition — why production
pipelines sketch per partition and merge, instead of shuffling exact
counts.

Determinism contract: hashes are md5-derived integers (portable to the
DuckDB oracle), counters are exact integer sums, so the whole sketch —
and every estimate read from it — hash-compares across engines. The
never-underestimates guarantee is emitted as a boolean column and so is
itself externally certified (the q22a error-bound-certificate pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(row: int, item: Column, width: int) -> Column:
    """Column index of ``item`` in sketch row ``row``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}|"), item)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def countmin_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: (row, col, cnt) cells, ≤ depth·width rows.

    One pass over the items: each row explodes to its ``depth`` cells
    (an array of structs, not a union of scans), then one partial-
    aggregated shuffle on the (row, col) pair — the grid is tiny by
    construction, so every downstream read broadcasts."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cell(r, F.col(item_col), width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("cell"))
        .groupBy(
            F.col("cell.row").alias("row"), F.col("cell.col").alias("col")
        )
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``queries`` from a built sketch:
    min over the item's ``depth`` cells. The query set fans out to its
    cells (array explode), joins the broadcast grid, and folds back
    with one MIN — estimate reads never touch the raw items."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cell(r, F.col(item_col), width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    probes = queries.select(
        item_col, F.explode(cells).alias("cell")
    ).select(
        item_col,
        F.col("cell.row").alias("row"),
        F.col("cell.col").alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cm_estimate"))
    )
