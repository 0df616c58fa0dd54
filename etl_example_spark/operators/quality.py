"""Table-level data-quality validation — the expectations layer.

The reference validates by eyeballing logged counts (``src/job.py:302``,
``README.md:21-23``). The engine generalizes that into a declarative
constraint check: one pass over the table computes every metric
(conditional aggregation — never N scans for N rules), and referential
integrity is one broadcast anti-join per FK. Output is a narrow metrics
row per rule, the shape a pipeline gate consumes ("fail the run if any
`violations > 0`").

At 100 TB: all row-level rules fold into a single scan's aggregates
(map-side partials, one tiny shuffle); each FK check streams the fact
against a broadcast dim key set. Nothing here is quadratic and nothing
collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One named constraint: ``violations`` counts rows where ``cond`` is
    False or NULL (NULL comparisons count as violations — a NULL in
    ``x BETWEEN a AND b`` is a data problem, not a pass)."""

    name: str
    cond: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def unique_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key groups (empty = key is unique). GroupBy on the key —
    one shuffle, no self-join."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"range_{col}", (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def accepted_values(col: str, values: list) -> Rule:
    return Rule(f"accepted_{col}", F.col(col).isin(values))


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All row-level rules in ONE aggregation pass: (rule, n_rows,
    violations) per rule, unpivoted to one row per rule."""
    counts = df.agg(
        F.count("*").alias("_n"),
        *[
            F.sum(
                F.when(r.cond, F.lit(0)).otherwise(F.lit(1))
            ).alias(r.name)
            for r in rules
        ],
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col(r.name).alias("violations"),
            )
            for r in rules
        ]
    )
    return counts.select(F.explode(entries).alias("e")).select(
        "e.rule", "e.n_rows", "e.violations"
    )


def fk_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Fact rows whose key has no match in the dim — broadcast anti-join
    against the (small) dim key set; the fact never shuffles."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.join(F.broadcast(keys), fact_key, "left_anti")
