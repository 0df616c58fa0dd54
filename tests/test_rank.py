"""functions/rank.py — exact two-pass global rank/ntile vs the
single-partition window it replaces.

The primitive exists so that exact global order statistics (rank,
running totals, NTILE) never funnel corpus-sized input through the one
task that `Window.orderBy` without a partition spec requires. These
tests pin (a) bit-exact agreement with the window semantics, including
NULL ordering and fewer-rows-than-buckets NTILE edges, and (b) the plan
property the design depends on: the range exchange is materialized ONCE
and reused (AQE ReusedExchange), so the count pass and the local-rank
pass are guaranteed to see identical partition boundaries.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_example_spark.functions.rank import global_ntile, global_row_number


@pytest.fixture(scope="module")
def skewed(spark):
    # skewed modulus + unique tie-break, deliberately unsorted; a NULL
    # stripe exercises the nulls-last ordering path end to end
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 13 != 0, F.xxhash64("id") % 97).alias("v"),
        F.col("id"),
    )


def ORDER():
    # built lazily: Column constructors need an active SparkContext
    return [F.desc_nulls_last("v"), F.asc("id")]


def test_global_row_number_matches_window(skewed):
    got = global_row_number(
        skewed, ORDER(), out="r",
        running_sum_col=F.coalesce("v", F.lit(0)),
        running_sum_out="rs", total_out="tot",
    )
    w = Window.orderBy(*ORDER())
    exp = skewed.select(
        "*",
        F.row_number().over(w).alias("r"),
        F.sum(F.coalesce("v", F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("rs"),
    )
    assert {tuple(x) for x in got.select("v", "id", "r", "rs").collect()} == {
        tuple(x) for x in exp.collect()
    }
    assert got.select("tot").distinct().collect()[0][0] == 20000


@pytest.mark.parametrize("nb", [4, 7, 10])
def test_global_ntile_matches_window(skewed, nb):
    got = global_ntile(skewed, ORDER(), nb, out="b")
    exp = skewed.select(
        "*", F.ntile(nb).over(Window.orderBy(*ORDER())).alias("b")
    )
    assert {tuple(x) for x in got.select("v", "id", "b").collect()} == {
        tuple(x) for x in exp.collect()
    }


def test_global_ntile_fewer_rows_than_buckets(spark):
    tiny = spark.range(0, 3)
    got = global_ntile(tiny, [F.asc("id")], 10, out="b")
    assert sorted(tuple(x) for x in got.collect()) == [(0, 1), (1, 2), (2, 3)]


def test_range_exchange_is_reused_not_resampled(skewed):
    """Offsets are only correct if the count pass and the local-rank pass
    see the SAME range boundaries. Spark samples boundaries per exchange
    materialization, so the two branches MUST resolve to one reused
    exchange — assert AQE's final plan says so."""
    got = global_row_number(skewed, ORDER(), out="r", total_out="tot")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert re.search(
        r"ReusedExchange \[[^\]]*\], Exchange rangepartitioning", plan
    ), plan[:3000]


def test_no_unbounded_single_partition_window(skewed):
    """The only SinglePartition exchange in the primitive's plan feeds
    the numPartitions-row offsets window (HashAggregate keyed on
    __gr_pid) — bounded input by construction."""
    got = global_row_number(skewed, ORDER(), out="r")
    plan = got._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = " ".join(lines[i + 1 : i + 4])
            assert "__gr_pid" in below, below
