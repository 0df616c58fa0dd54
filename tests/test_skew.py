"""Skew-mitigation helpers: salted plans must produce byte-identical
results to their unsalted equivalents (salting changes the physical
distribution, never the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_example_spark.functions.skew import (
    salt_explode_join,
    salted_agg,
    with_salt,
)
from etl_example_spark.sources.loaders import load_table


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, r.qty, r.mx)
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, r.qty, r.mx)
        for r in salted_agg(
            lineitem,
            ["l_returnflag"],
            {
                "n": ("count", "l_quantity"),
                "qty": ("sum", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            salt=8,
        ).collect()
    }
    assert salted == plain


def test_salt_explode_join_equals_plain_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = lineitem.join(orders, "l_orderkey")
    salted = salt_explode_join(lineitem, orders, "l_orderkey", salt=4)
    assert salted.count() == plain.count()
    key = lambda r: (r.l_orderkey, r.l_quantity, r.o_totalprice)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_salt_spreads_hot_key(spark):
    """A single hot key must land in >1 salt bucket (the whole point)."""
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )
    buckets = with_salt(hot, 8).select("_salt").distinct().count()
    assert buckets == 8


def test_salt_spreads_identical_duplicate_rows(spark):
    """Fully identical duplicate rows (the degenerate hot-key shape) must
    still spread — a content-hash salt would collapse them onto one salt."""
    dup = spark.range(10_000).select(
        F.lit(1).alias("k"), F.lit("same").alias("v")
    )
    buckets = with_salt(dup, 8).select("_salt").distinct().count()
    assert buckets == 8
