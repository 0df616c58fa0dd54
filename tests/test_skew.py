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


def test_salt_is_deterministic_across_materializations(spark):
    """The salt must be a pure function of row content: recomputing the
    same plan twice (a proxy for a stage retry) must route every row to
    the same sub-group — a nondeterministic salt (rand /
    monotonically_increasing_id) can double-count or drop rows when a
    retried task re-salts them (SPARK-23207 class)."""
    df = spark.range(5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    # shuffle upstream so a retry-order change is at least plausible
    shuffled = df.repartition(8, "v")
    first = {
        (r.k, r.v): r._salt for r in with_salt(shuffled, 8).collect()
    }
    second = {
        (r.k, r.v): r._salt for r in with_salt(shuffled, 8).collect()
    }
    assert first == second


def test_salted_agg_dedup_first_null_handling(spark):
    """COUNT(col) skips nulls; the dedup_first weighted path must too
    (and COUNT(*) must keep counting every row)."""
    dup = spark.createDataFrame(
        [(1, None), (1, None), (1, 2.0), (1, 2.0), (1, 5.0)],
        "k int, v double",
    )
    plain = dup.groupBy("k").agg(
        F.count("v").alias("n"),
        F.count("*").alias("n_star"),
        F.sum("v").alias("s"),
    ).collect()[0]
    assert (plain.n, plain.n_star, plain.s) == (3, 5, 9.0)
    salted = salted_agg(
        dup,
        ["k"],
        {
            "n": ("count", "v"),
            "n_star": ("count", "*"),
            "s": ("sum", "v"),
        },
        salt=4,
        dedup_first=True,
    ).collect()[0]
    assert (salted.n, salted.n_star, salted.s) == (
        plain.n,
        plain.n_star,
        plain.s,
    )


def test_with_salt_skips_map_columns(spark):
    """xxhash64 rejects MapType (DATATYPE_MISMATCH); with_salt must salt
    schemas carrying map columns by hashing only the hashable ones."""
    df = spark.sql(
        "SELECT id AS k, map('a', id) AS m FROM range(100)"
    )
    salted = with_salt(df, 8)
    assert salted.select("_salt").distinct().count() > 1
    # explicit salt_cols narrows the hash to the named columns
    narrow = with_salt(df, 8, salt_cols=["k"])
    assert narrow.select("_salt").distinct().count() > 1


def test_with_salt_all_map_schema_raises(spark):
    """An all-MapType schema has no deterministic non-constant salt
    source; with_salt must refuse (a constant salt silently disables
    the spreading) and point at explicit salt_cols. A map-derived
    column satisfies it."""
    import pytest

    df = spark.sql("SELECT map('a', id) AS m FROM range(100)")
    with pytest.raises(ValueError, match="salt_cols"):
        with_salt(df, 8)
    keyed = df.withColumn("_mv", F.map_values("m"))
    salted = with_salt(keyed, 8, salt_cols=["_mv"])
    assert salted.select("_salt").distinct().count() > 1


def test_salted_agg_dedup_first_equals_plain_agg(spark):
    """dedup_first handles the identical-duplicate hot-key shape (content
    salt would pile them on one sub-group) via exact-duplicate collapse +
    weighted partials — and must still equal the plain aggregate."""
    dup = spark.range(10_000).select(
        F.lit(1).alias("k"),
        (F.col("id") % 3).cast("double").alias("v"),
    )
    plain = dup.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).collect()[0]
    salted = salted_agg(
        dup,
        ["k"],
        {
            "n": ("count", "v"),
            "s": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
        salt=8,
        dedup_first=True,
    ).collect()[0]
    assert (salted.n, salted.s, salted.mn, salted.mx) == (
        plain.n,
        plain.s,
        plain.mn,
        plain.mx,
    )
