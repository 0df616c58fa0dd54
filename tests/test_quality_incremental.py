"""Data-quality gate, incremental aggregate maintenance, and IVF Lloyd
training."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_example_spark.operators import quality, similarity
from etl_example_spark.operators.incremental import merge_partials, partial_agg
from etl_example_spark.sources.loaders import load_table


def test_check_rules_counts_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 5, "A"), (2, None, "B"), (3, 99, "A"), (None, 7, "C")],
        "k long, v long, tag string",
    )
    got = {
        r.rule: (r.n_rows, r.violations)
        for r in quality.check_rules(
            df,
            [
                quality.not_null("k"),
                quality.in_range("v", 1, 50),
                quality.accepted_values("tag", ["A", "B"]),
            ],
        ).collect()
    }
    assert got["not_null_k"] == (4, 1)
    # NULL v fails the range rule (NULL comparisons are violations)
    assert got["range_v"] == (4, 2)
    assert got["accepted_tag"] == (4, 1)


def test_unique_key_and_fk(spark):
    fact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (9, 13)], "k long, v long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    dups = quality.unique_key(fact, ["k"]).collect()
    assert [(r.k, r.n) for r in dups] == [(1, 2)]
    bad = quality.fk_violations(fact, "k", dim, "k").collect()
    assert [r.k for r in bad] == [9]


def test_incremental_merge_equals_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    aggs = {
        "n": ("count", "o_orderkey"),
        "cents": ("sum", "cents"),
        "lo": ("min", "o_orderdate"),
        "hi": ("max", "o_orderdate"),
    }
    cutoff = F.lit("1997-01-01").cast("timestamp")
    state = partial_agg(
        orders.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], aggs
    )
    # split the delta into two batches: merging must be associative
    d1 = partial_agg(
        orders.filter(
            (F.col("o_orderdate") >= cutoff)
            & (F.col("o_orderkey") % 2 == 0)
        ),
        ["o_custkey"],
        aggs,
    )
    d2 = partial_agg(
        orders.filter(
            (F.col("o_orderdate") >= cutoff)
            & (F.col("o_orderkey") % 2 == 1)
        ),
        ["o_custkey"],
        aggs,
    )
    merged = merge_partials(
        merge_partials(state, d1, ["o_custkey"], aggs),
        d2,
        ["o_custkey"],
        aggs,
    )
    full = partial_agg(orders, ["o_custkey"], aggs)
    key = lambda r: (r.o_custkey, r.n, r.cents, r.lo, r.hi)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, full.collect())
    )


def _inertia(spark, emb, centroids) -> float:
    sim = similarity.cosine("embedding", "centroid_vec")
    best = (
        emb.crossJoin(F.broadcast(centroids))
        .groupBy("vec_id")
        .agg(F.max(sim).alias("best_sim"))
    )
    return best.agg(F.sum(F.lit(1.0) - F.col("best_sim"))).collect()[0][0]


def test_ivf_train_improves_quantization(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    seed = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    trained = similarity.ivf_train(emb, n_centroids=8, iters=2)
    assert trained.count() == 8
    assert len(trained.collect()[0].centroid_vec) == len(
        emb.first().embedding
    )
    before = _inertia(spark, emb, seed)
    after = _inertia(spark, emb, trained)
    assert after <= before + 1e-9, (before, after)
