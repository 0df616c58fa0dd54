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
    # LEFT join + count 0: an item never inserted has empty cells that
    # the grid simply doesn't store; an inner join would drop it from
    # the output (or take MIN over its nonzero cells only, inflating
    # the estimate). The CMS answer for an absent item is 0.
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cm_estimate"))
    )


def heavy_hitters_certificate(
    items: DataFrame,
    sketch: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """The certified heavy-hitter read shared by the batch (d78) and
    streaming (st48) registrations: exact top-``k`` items joined to
    their sketch estimates, with the never-underestimates CMS guarantee
    emitted as an externally-verifiable boolean.

    ``depth``/``width`` MUST match the dims the sketch was built with —
    probing a grid with foreign dims would address non-existent cells,
    coalesce them to 0, and silently falsify the certificate."""
    exact = (
        items.groupBy("item")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), "item")
        .limit(k)
    )
    return (
        countmin_estimate(
            sketch, exact.select("item"), depth=depth, width=width
        )
        .join(exact, "item")
        .select(
            "item",
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
        )
        .orderBy(F.desc("exact_count"), "item")
    )


#: DuckDB twin of countmin_build + heavy_hitters_certificate over the
#: documents table's whitespace tokens — shared verbatim by the d78
#: (batch) and st48 (stream-merged) oracles, which must stay identical:
#: stream-merged == batch-built IS the property st48 certifies.
CMS_HEAVY_HITTERS_ORACLE = """
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
               AS item
        FROM documents
        WHERE length(trim(text)) > 0
    ),
    grid AS (
        SELECT r.r AS row,
               CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|'
                    || item), 1, 8)) AS BIGINT) % 256 AS col,
               COUNT(*) AS cnt
        FROM tok CROSS JOIN (SELECT unnest(range(4)) AS r) r
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT item, COUNT(*) AS exact_count FROM tok
        GROUP BY item ORDER BY exact_count DESC, item LIMIT 20
    ),
    est AS (
        SELECT e.item, e.exact_count, MIN(g.cnt) AS cm_estimate
        FROM exact e
        CROSS JOIN (SELECT unnest(range(4)) AS r) r
        JOIN grid g
          ON g.row = r.r
         AND g.col = CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR)
                          || '|' || e.item), 1, 8)) AS BIGINT) % 256
        GROUP BY e.item, e.exact_count
    )
    SELECT item, CAST(exact_count AS BIGINT) AS exact_count,
           CAST(cm_estimate AS BIGINT) AS cm_estimate,
           cm_estimate >= exact_count AS never_underestimates
    FROM est
    ORDER BY exact_count DESC, item
"""


def hll_ranks(
    items: DataFrame,
    item_col: str = "item",
    carry: tuple[str, ...] = (),
    bucket_hex: int = 2,
) -> DataFrame:
    """Per-item HyperLogLog observation (Flajolet et al. 2007): hash
    the item with md5, split the digest into a bucket index (the first
    ``bucket_hex`` hex digits — m = 16^bucket_hex buckets) and a 48-bit
    rank window (the next 12 hex digits), and emit rank = position of
    the window's first 1-bit (leading zeros + 1; all-zero window
    saturates at 49). Everything is integer arithmetic over the
    portable md5 digest, so the DuckDB oracle re-derives every rank
    from the same hex — the d78 count-min determinism contract applied
    to distinct counting. ``carry`` names pass-through columns (e.g. a
    shard key for per-shard sketches)."""
    h = F.md5(F.col(item_col))
    w = F.conv(F.substring(h, bucket_hex + 1, 12), 16, 10).cast("long")
    return items.select(
        *[F.col(c) for c in carry],
        F.conv(F.substring(h, 1, bucket_hex), 16, 10)
        .cast("int")
        .alias("bucket"),
        F.when(w == 0, F.lit(49))
        .otherwise(F.lit(49) - F.length(F.bin(w)))
        .cast("int")
        .alias("rank"),
    )


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant α_m (table values for small
    m, the asymptotic formula otherwise)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )


def hll_registers(
    ranks: DataFrame, spark=None, m: int = 256
) -> DataFrame:
    """Fold rank observations into the dense m-row register table
    (max rank per bucket; never-hit buckets hold 0). MAX is the whole
    state — idempotent and commutative, which is exactly why HLL
    sketches merge: max(merge of per-shard maxes) == global max. The
    shuffle is m rows wide regardless of corpus size."""
    spark = spark or ranks.sparkSession
    got = ranks.groupBy("bucket").agg(F.max("rank").alias("register"))
    dense = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    return dense.join(got, "bucket", "left").select(
        "bucket",
        F.coalesce("register", F.lit(0)).cast("int").alias("register"),
    )


def hll_estimate_cols() -> list[Column]:
    """Scalar estimate columns over an aggregated register table
    (expects ``register`` values; call under a global agg). S is the
    EXACT integer Σ 2^(49−register) — the harmonic-mean denominator
    scaled by 2^49 so it stays a bigint. S can exceed 2^53, but the
    int64→double conversion is IEEE round-to-nearest in both the JVM
    (JLS 5.1.2) and libstdc++, so the raw estimate α_m·m²·2^49/S is
    bit-identical across engines when the oracle mirrors the
    operation order."""
    s = F.sum(
        F.expr("shiftleft(CAST(1 AS BIGINT), 49 - register)")
    ).alias("s_num")
    v = F.sum(
        F.when(F.col("register") == 0, F.lit(1)).otherwise(F.lit(0))
    ).alias("n_zero")
    return [s, v]


def hll_estimate_expr(m: int = 256) -> Column:
    """Rounded cardinality estimate from (s_num, n_zero). The
    small-range branch (raw E ≤ 2.5m with empty buckets) is Flajolet's
    linear counting m·ln(m/V); ln is the one libm call in the whole
    sketch, so the estimate is rounded to 4 decimals to absorb
    last-ulp divergence between java.lang.Math.log and libm log. The
    α_m·m² factor is pre-multiplied driver-side; since m is a power of
    two the product is an exact scaling of α_m and the oracle's
    runtime ``α × m²`` multiply lands on the identical double."""
    raw = (
        F.lit(hll_alpha(m) * m * m)
        * F.lit(float(1 << 49))
        / F.col("s_num").cast("double")
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero"))
    return F.round(
        F.when(
            (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), linear
        ).otherwise(raw),
        4,
    )
