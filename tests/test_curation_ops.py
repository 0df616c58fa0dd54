"""Curation-operator unit tests: deterministic sampling, repetition
metrics, PII scrubbing, batched similarity search."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_example_spark.operators import sampling, similarity, text
from etl_example_spark.sources.loaders import load_table


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 0.5, "src1": 0.25}
    s1 = sampling.stratified_sample(docs, rates, default_rate=0.1)
    s2 = sampling.stratified_sample(docs, rates, default_rate=0.1)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # pure function of (id, stratum, rate)
    # kept fraction tracks the stratum rate (hash-uniform, finite-sample)
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r.source: r.n for r in s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for stratum, rate in rates.items():
        frac = kept.get(stratum, 0) / totals[stratum]
        assert abs(frac - rate) < 0.2, (stratum, frac, rate)


def test_stratified_sample_default_rate_zero_drops_unknown(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    only_known = sampling.stratified_sample(docs, {"src0": 1.0})
    assert only_known.select("source").distinct().collect() == [
        ("src0",)
    ] or {r.source for r in only_known.select("source").distinct().collect()} == {"src0"}
    # rate 1.0 keeps the whole stratum
    n_src0 = docs.filter("source = 'src0'").count()
    assert only_known.count() == n_src0


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.repetition_metrics(df).collect()}
    r1 = rows[1]
    assert (r1.n_tokens, r1.n_distinct_tokens) == (4, 1)
    assert r1.rep_token_x1e6 == 750_000  # floor(3e6 / 4)
    assert r1.n_2grams == 3  # "a a" x3, 1 distinct
    assert r1.rep_2gram_x1e6 == 666_666  # floor(2e6 / 3)
    r2 = rows[2]
    assert r2.rep_token_x1e6 == 0 and r2.rep_2gram_x1e6 == 0
    r3 = rows[3]
    assert (r3.n_tokens, r3.n_2grams, r3.rep_token_x1e6) == (0, 0, 0)
    r4 = rows[4]
    assert (r4.n_tokens, r4.n_2grams) == (1, 0)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk and http://x.org/a_b plus bob@ex.io")],
        "doc_id long, text string",
    )
    n_emails, n_urls = text.pii_counts("text")
    row = df.select(
        n_emails.alias("e"), n_urls.alias("u"),
        text.scrub_pii("text").alias("s"),
    ).collect()[0]
    assert (row.e, row.u) == (2, 1)
    assert row.s == "mail <EMAIL> and <URL> plus <EMAIL>"


def test_batch_topk_head_matches_single_query(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    batch = similarity.batch_topk(emb, n_queries=3, k=5).collect()
    qids = sorted({r.query_id for r in batch})
    assert len(qids) == 3
    for qid in qids:
        single = similarity.brute_force_topk(emb, query_id=qid, k=5).collect()
        got = [
            (r.neighbor_id, r.cosine_sim) for r in batch if r.query_id == qid
        ]
        want = [(r.neighbor_id, r.cosine_sim) for r in single]
        assert got == want, qid


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=100) guarantees rank error <= 1/100:
    each estimate must be an actual data value whose rank is within
    n/100 of the target rank."""
    orders = load_table(spark, sf_dir, "orders")
    approx = {
        r.o_orderstatus: r.approx_quantiles
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.25, 0.5, 0.75, 0.95], 100
            ).alias("approx_quantiles")
        )
        .collect()
    }
    for status, estimates in approx.items():
        vals = sorted(
            r.o_totalprice
            for r in orders.filter(F.col("o_orderstatus") == status).collect()
        )
        n = len(vals)
        for q, est in zip([0.25, 0.5, 0.75, 0.95], estimates):
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est) - 1
            target = q * n
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / 100 + 1, (status, q, est, err, n)


def test_weighted_mean_udaf_matches_builtin(spark, sf_dir):
    """The pandas_udf grouped-agg kernel must equal the built-in SQL
    arithmetic exactly (int64 sums, one division)."""
    from etl_example_spark.plans.registry import load_all

    reg = load_all()
    got = {
        r.source: r.weighted_mean_chars
        for r in reg["d44_weighted_stats"].spark_builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {
        r.source: r.wm
        for r in docs.withColumn("w", F.col("doc_id") % 7 + 1)
        .groupBy("source")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_chars")).cast("double")
                / F.sum("w").cast("double")
            ).alias("wm")
        )
        .collect()
    }
    assert got == want
