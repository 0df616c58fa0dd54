"""Graph operators over relational tables — PageRank on the event
transition graph (the sibling of dedup.dedup_clusters' connected
components: iterative driver loop, edge-table-sized distributed work per
round, nothing corpus-scale ever reaches the driver).

Determinism contract (the registry-wide rule): ranks live in integer
micro-units (initial 1,000,000 per node) and every update is integer
arithmetic — contribution ``(r·c) div W``, damping
``teleport + (d_pct · inbound) div 100`` — so the k-iteration fixpoint
is bit-identical across engines and the DuckDB oracle can unroll the
same iterations as chained CTEs. Truncation makes total rank drift
below N·1e6 (as does dangling-node leakage, the standard simplified
variant); ORDERING of ranks — what PageRank is used for — is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transition_edges(
    events: DataFrame,
    node_col,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Weighted directed edges from consecutive per-user events:
    ``(src, dst, c)`` where c counts user-step transitions src→dst.
    One window shuffle on the user key; edge weights aggregate
    map-side before their shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    steps = events.select(
        node_col.alias("src"), F.lead(node_col).over(w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    return steps.groupBy("src", "dst").agg(F.count("*").alias("c"))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 4,
    damping_pct: int = 85,
) -> DataFrame:
    """``iters`` rounds of integer-exact PageRank over (src, dst, c)
    edges; ``nodes`` is a one-column (node) table fixing the vertex set
    (sources, sinks, and isolates all get the teleport term).

    Per round: one edge⋈rank join on src (the rank table is
    node-count-sized — broadcastable in practice, and AQE decides), one
    shuffle of (dst, long) pairs for the inbound sum, one left join back
    to the vertex set. ``localCheckpoint`` pins each round so round k+1
    does not replay rounds 1..k (linear lineage, like bpe_train).
    Returns (node, rank_micro).
    """
    teleport = (100 - damping_pct) * 10_000
    outw = edges.groupBy("src").agg(F.sum("c").alias("w"))
    ranks = nodes.select(
        F.col("node"), F.lit(1_000_000).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * c) div w").alias("contrib"),
            )
        )
        inbound = contrib.groupBy("node").agg(
            F.sum("contrib").alias("inbound")
        )
        ranks = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({teleport} + ({damping_pct} * "
                    "coalesce(inbound, 0)) div 100 AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def pagerank_oracle_sql(iters: int = 4, damping_pct: int = 85) -> str:
    """Unrolled DuckDB twin of :func:`pagerank` over the event
    transition graph (node = the ``k`` prop; edges from per-user
    consecutive events ordered by (ts, event_id))."""
    teleport = (100 - damping_pct) * 10_000
    head = """
        ev AS (
            SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS page
            FROM events
        ),
        tr AS (
            SELECT page AS src,
                   LEAD(page) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
            FROM ev
        ),
        edges AS (
            SELECT src, dst, COUNT(*) AS c FROM tr
            WHERE dst IS NOT NULL GROUP BY src, dst
        ),
        outw AS (SELECT src, SUM(c) AS w FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT page AS node FROM ev),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(
            f"""
        r{i} AS (
            SELECT n.node,
                   CAST({teleport} + ({damping_pct} * COALESCE(inb.s, 0))
                        // 100 AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, SUM((p.r * e.c) // o.w) AS s
                FROM edges e
                JOIN r{i - 1} p ON p.node = e.src
                JOIN outw o ON o.src = e.src
                GROUP BY e.dst
            ) inb ON inb.node = n.node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f""" SELECT node, r AS rank_micro FROM r{iters} ORDER BY node"""
    )
