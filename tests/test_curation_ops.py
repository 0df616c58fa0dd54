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


def test_token_budget_plan_invariants(spark):
    """Exact-arithmetic planner laws on a skewed synthetic corpus: a
    stratum too small for its weighted share is flagged
    needs_upsampling with rate clamped at 10^6 ppm; planned <= target
    (double floor); the planned total never exceeds the budget;
    unweighted strata plan to zero."""
    rows = (
        [(i, "en", "one two three four five six seven eight") for i in range(50)]
        + [(100 + i, "rare", "tiny doc") for i in range(2)]
        + [(200 + i, "junk", "dropped text here") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plan = {
        r.lang: r
        for r in sampling.token_budget_plan(
            docs, {"en": 1, "rare": 1}, budget_ppm=800_000, stratum_col="lang"
        ).collect()
    }
    # weighted corpus = 50*8 + 2*2 = 404 tokens; budget = 323; each
    # weighted stratum's target = 161 — far beyond rare's 4 tokens
    assert plan["en"].tokens == 400 and plan["rare"].tokens == 4
    assert plan["en"].target_tokens == 161
    assert plan["rare"].needs_upsampling and not plan["en"].needs_upsampling
    assert plan["rare"].rate_ppm == 1_000_000
    assert plan["rare"].planned_tokens == 4  # clamped: all it has
    for r in plan.values():
        assert r.planned_tokens <= max(r.target_tokens, r.tokens)
        assert 0 <= r.rate_ppm <= 1_000_000
    assert plan["junk"].rate_ppm == 0 and plan["junk"].planned_tokens == 0
    budget = (404 * 800_000) // 1_000_000
    assert sum(
        r.planned_tokens for r in plan.values() if r.lang != "junk"
    ) <= budget


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


def test_normalize_text_nfc_controls_whitespace(spark):
    """NFC on real combining characters, Cf stripping (ZWSP), control
    removal, and ASCII-whitespace collapse — the cases the ASCII-only
    driver corpus can't exercise."""
    import unicodedata

    from etl_example_spark.operators.text import normalize_text

    decomposed = "Café"  # e + COMBINING ACUTE
    rows = [
        (1, decomposed + "  menu"),
        (2, "zero​width"),          # Cf: ZERO WIDTH SPACE
        (3, "ctrl\x07bell\tand\nlines"),  # Cc stripped, \t \n collapse
        (4, "  lead and trail  "),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text("text").alias("norm")
        ).collect()
    }
    assert got[1] == unicodedata.normalize("NFC", decomposed) + " menu"
    # strip-before-NFC: a Cf char between base and combining mark must
    # not block composition (idempotence counterexample if it did)
    zwnj_split = "e\u200c\u0301x"
    extra = spark.createDataFrame([(9, zwnj_split)], ["doc_id", "text"])
    got9 = extra.select(normalize_text("text").alias("n")).collect()[0].n
    assert got9 == "\u00e9x"
    assert len(got[1].split(" ")[0]) == 4  # composed é: 4 chars not 5
    assert got[2] == "zerowidth"
    assert got[3] == "ctrlbell and lines"
    assert got[4] == "lead and trail"
    assert got[5] == ""
    assert got[6] is None


def test_containment_pairs_subset_detection(spark):
    """A short doc quoted inside a long one scores low Jaccard but is
    caught by containment, with the correct direction flag."""
    from etl_example_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zz{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], ["doc_id", "text"]
    )
    pairs = containment_pairs(df, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].a_in_b and not pairs[0].b_in_a
    # Jaccard at the same strictness misses it (union-normalized)
    assert jaccard_pairs(df, threshold=0.6).count() == 0


def test_hashed_linear_quality_trained_weights_path(spark):
    """With an explicit weight table, the score is the exact mean
    milli-weight of the tokens' buckets — verified by hand."""
    from pyspark.sql import functions as F

    from etl_example_spark.operators.text import (
        hashed_feature_bucket,
        hashed_linear_quality,
    )

    df = spark.createDataFrame(
        [(1, "good good"), (2, "bad")], ["doc_id", "text"]
    )
    buckets = {
        r.tok: r.b
        for r in spark.createDataFrame(
            [("good",), ("bad",)], ["tok"]
        ).select("tok", hashed_feature_bucket("tok", 1024).alias("b"))
        .collect()
    }
    weights = spark.createDataFrame(
        [(buckets["good"], 500), (buckets["bad"], -250)],
        ["bucket", "w_int"],
    )
    got = {
        r.doc_id: r
        for r in hashed_linear_quality(df, 1024, weights=weights).collect()
    }
    assert got[1].w_sum == 1000 and got[1].n_toks == 2 and got[1].keep
    assert abs(got[1].score - 0.5) < 1e-9
    assert got[2].w_sum == -250 and not got[2].keep


def _reference_bpe(word_counts, n_merges):
    """Canonical BPE trainer (pure Python) — the semantics lock for
    operators/bpe.bpe_train: count all adjacent pairs weighted by word
    frequency, merge the (count DESC, pair ASC) argmax via one-pass
    leftmost non-overlapping rewrite."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for units, c in vocab.items():
            for i in range(len(units) - 1):
                counts[(units[i], units[i + 1])] = (
                    counts.get((units[i], units[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, f"{a} {b}", cnt))
        new_vocab = {}
        for units, c in vocab.items():
            out, i = [], 0
            while i < len(units):
                if (
                    i + 1 < len(units)
                    and units[i] == a
                    and units[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    from etl_example_spark.operators.bpe import bpe_train

    texts = [
        "the theme of the thesis",
        "then the weather thawed",
        "low lower lowest newer newest",
        "aaa aaaa banana bandana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    expected = _reference_bpe(counts, 8)
    got = bpe_train(df, n_merges=8)
    assert got == expected


def test_bpe_train_early_stop_when_fully_merged(spark):
    from etl_example_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    got = bpe_train(df, n_merges=5)
    # one merge (a,b) collapses every word to a single unit; no pairs left
    assert got == [(1, "a b", 3)]


def test_containment_sampled_recall_on_planted_subsets(spark):
    """High-containment planted pairs must survive the sampled
    estimator; unrelated docs must not appear."""
    from etl_example_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_sampled,
    )

    base = " ".join(f"w{i}" for i in range(120))
    rows = [(1, base), (2, base + " " + " ".join(f"x{i}" for i in range(400)))]
    rows += [(10 + k, " ".join(f"z{k}_{i}" for i in range(50))) for k in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {(r.doc_a, r.doc_b) for r in containment_pairs(df, 0.9).collect()}
    sampled = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs_sampled(df, 0.9, sample_mod=8).collect()
    }
    assert (1, 2) in exact
    assert (1, 2) in sampled          # recall on the planted pair
    assert sampled <= exact | {(1, 2)}  # no unrelated pair invented


def test_quality_classifier_stateless_form_equals_shuffle_form(spark, sf_dir):
    """hashed_linear_quality_cols (fold, no shuffle) must agree exactly
    with hashed_linear_quality (explode + groupBy) on every document."""
    from pyspark.sql import functions as F

    from etl_example_spark.operators.text import (
        hashed_linear_quality,
        hashed_linear_quality_cols,
    )
    from etl_example_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n, w = hashed_linear_quality_cols("text", 1024)
    stateless = docs.select(
        "doc_id", n.alias("n_toks"), w.alias("w_sum")
    )
    shuffled = hashed_linear_quality(docs, 1024).select(
        "doc_id", "n_toks", "w_sum"
    )
    assert stateless.exceptAll(shuffled).count() == 0
    assert shuffled.exceptAll(stateless).count() == 0


def test_mmr_diversifies_planted_near_dup_cluster(spark):
    """With the top of the relevance ranking packed with near-identical
    vectors, plain top-k returns the clones; MMR spends the budget on
    coverage after taking one clone."""
    from etl_example_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    # query along e1; clones share the off-query direction e2 (mutual
    # sim ~1, rel ~0.894 + epsilon edge over the diverse set); each
    # diverse candidate has its own extra dimension (mutual sim 0.8)
    rows = [(0, [1.0, 0.0, 0.0, 0.0, 0.0])]
    rows += [
        (i, [2.0 + 0.001 * i, 1.0, 0.0, 0.0, 0.0]) for i in (1, 2, 3)
    ]
    rows += [
        (10, [2.0, 0.0, 1.0, 0.0, 0.0]),
        (11, [2.0, 0.0, 0.0, 1.0, 0.0]),
        (12, [2.0, 0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plain = [r.neighbor_id for r in brute_force_topk(df, k=3).collect()]
    mmr = [r.vec_id for r in mmr_rerank(df, k=3, pool=6).collect()]
    assert set(plain) == {1, 2, 3}          # clones crowd plain top-k
    assert len(set(mmr) & {1, 2, 3}) == 1   # MMR keeps one clone
    assert len(set(mmr) & {10, 11, 12}) == 2  # and spends budget on coverage


def test_pagerank_hub_outranks_leaves_and_conserves_order(spark):
    """Star graph: every leaf points at the hub; the hub must dominate,
    leaves (teleport-only) must tie exactly."""
    from etl_example_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, 0, 1) for i in range(1, 5)], ["src", "dst", "c"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    got = {r.node: r.rank_micro for r in pagerank(edges, nodes, iters=4).collect()}
    assert got[0] > got[1]
    assert len({got[i] for i in range(1, 5)}) == 1
    # hand-check one round: r1(hub) = 150000 + 85*4*1000000//100 // ...
    # leaves have no inbound: teleport only
    assert got[1] == 150_000


def test_countmin_mergeable_and_never_underestimates(spark):
    """Cell-wise addition of two partition sketches must equal the
    whole-corpus sketch (the merge law), and every estimate must be
    >= the exact count."""
    from etl_example_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    items = [(f"t{i % 13}",) for i in range(200)] + [("hot",)] * 50
    df = spark.createDataFrame(items, ["item"])
    half_a = spark.createDataFrame(items[:125], ["item"])
    half_b = spark.createDataFrame(items[125:], ["item"])
    whole = countmin_build(df)
    merged = (
        countmin_build(half_a)
        .unionByName(countmin_build(half_b))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0

    exact = df.groupBy("item").agg(F.count("*").alias("exact"))
    est = countmin_estimate(whole, exact.select("item")).join(exact, "item")
    bad = est.filter(F.col("cm_estimate") < F.col("exact")).count()
    assert bad == 0
    hot = est.filter(F.col("item") == "hot").collect()[0]
    assert hot.cm_estimate >= 50


def test_countmin_certificate_respects_nondefault_dims(spark):
    """heavy_hitters_certificate must probe with the SAME depth/width the
    sketch was built with — a mismatched probe addresses non-existent
    cells, coalesces to 0, and falsifies the never-underestimates
    certificate (the r6 ADVICE finding)."""
    from etl_example_spark.operators.sketches import (
        countmin_build,
        heavy_hitters_certificate,
    )

    items = [(f"t{i % 7}",) for i in range(300)] + [("hot",)] * 80
    df = spark.createDataFrame(items, ["item"])
    sketch = countmin_build(df, depth=2, width=64)
    cert = heavy_hitters_certificate(
        df, sketch, k=5, depth=2, width=64
    ).collect()
    assert cert and all(r.never_underestimates for r in cert)
    assert cert[0].item == "hot" and cert[0].cm_estimate >= 80


def test_triangle_count_hand_graph(spark):
    """K4 has 4 triangles; adding a pendant edge changes nothing."""
    from etl_example_spark.operators.graph import triangle_count

    k4 = [(a, b, 1) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(
        k4 + [(3, 9, 1)], ["src", "dst", "c"]
    )
    assert triangle_count(edges).collect()[0].n_triangles == 4


def test_bfs_levels_path_graph(spark):
    """Path 0-1-2-3-4-5 from 0 with max_depth=4: node 5 unreached."""
    from etl_example_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(5)], ["src", "dst", "c"]
    )
    got = {r.node: r.dist for r in bfs_levels(edges, 0, max_depth=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_observed_quality_filter_free_telemetry(spark):
    """Observation metrics must match exact counts and cost no second
    scan: one action yields both the filtered data and the counts."""
    from etl_example_spark.operators.curation import observed_quality_filter

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1), (4, 2_000_000), (5, 10)],
        "id long, quantity int",
    )
    filtered, obs = observed_quality_filter(df, "quantity")
    kept = filtered.count()  # the ONE action; metrics ride along
    assert kept == 2
    m = obs.get
    assert m["rows_scanned"] == 5
    assert m["rows_kept"] == 2
    assert m["rows_problematic"] == 3


def test_bpe_apply_units_compresses_trained_words(spark):
    """Encoding with learned merges shrinks trained words' unit counts
    and leaves unseen-character words at character granularity."""
    from etl_example_spark.operators.bpe import bpe_apply_units, bpe_train

    df = spark.createDataFrame(
        [(1, "the the the the cat"), (2, "the thermos")],
        ["doc_id", "text"],
    )
    # (t,h) and (h,e) tie at 6 occurrences; pair-ASC tie-break picks
    # 'h e' first, then (t,he) merges to 'the'
    merges = bpe_train(df, n_merges=2)
    assert [m[1] for m in merges] == ["h e", "t he"]
    units = {r.word: r.n_units for r in bpe_apply_units(df, merges).collect()}
    assert units["the"] == 1          # fully merged
    assert units["thermos"] == 5      # the+r+m+o+s
    assert units["cat"] == 3          # untouched by the merges


def test_containment_sampled_hot_shingle_guard(spark):
    """max_shingle_df drops boilerplate-shingle buckets from the sampled
    self-join: a shared boilerplate block stops generating pairs, while
    a genuine whole-document containment pair survives (its specific
    shingles stay under the cap)."""
    from etl_example_spark.operators.dedup import containment_pairs_sampled

    boiler = " ".join(f"b{i}" for i in range(60))
    rows = [(k, boiler + f" unique{k}x unique{k}y") for k in range(1, 9)]
    body = " ".join(f"w{i}" for i in range(120))
    rows += [(20, body), (21, body + " " + " ".join(f"x{i}" for i in range(200)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    unguarded = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs_sampled(df, 0.9, sample_mod=2).collect()
    }
    guarded = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs_sampled(
            df, 0.9, sample_mod=2, max_shingle_df=4
        ).collect()
    }
    boiler_pairs = {(a, b) for a in range(1, 9) for b in range(1, 9) if a < b}
    assert unguarded & boiler_pairs          # boilerplate floods unguarded
    assert not (guarded & boiler_pairs)      # guard removes the flood
    assert (20, 21) in guarded               # genuine containment survives


def test_bpe_apply_oracle_survives_early_exhaustion(spark):
    """A vocabulary that fully merges before n_merges rounds must give
    the SAME encode stats in Spark and the unrolled oracle (the apply
    oracle's per-round LEFT JOIN passes exhausted rounds through)."""
    import duckdb

    from etl_example_spark.operators.bpe import (
        bpe_apply_oracle_sql,
        bpe_fit,
    )

    rows = [(1, "aa aa aa", "s0")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    _merges, fitted = bpe_fit(df, n_merges=3)  # exhausts after 1 merge
    spark_units = {r.word: r.u for r in fitted.collect()}
    assert spark_units == {"aa": ["aa"]}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'aa aa aa' AS text,"
        " 's0' AS source"
    )
    got = con.execute(bpe_apply_oracle_sql(3)).fetchall()
    # (source, n_words, n_chars, n_units): 3 words, 6 chars, 3 units
    assert got == [("s0", 3, 6, 3)]


def test_intradoc_line_dedup_first_occurrence_order(spark):
    """d94: within one doc, only the first occurrence of each line
    survives and order is preserved; other docs' identical lines are
    untouched (NOT a corpus-wide pass); empty text stays empty."""
    from etl_example_spark.operators.dedup import intradoc_line_dedup

    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\na"),
            (2, "a\na"),  # same lines as doc 1 — must keep its own 'a'
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["text"])
        for r in intradoc_line_dedup(docs).collect()
    }
    assert out[1] == (6, 3, "a\nb\nc")
    assert out[2] == (2, 1, "a")
    assert out[3] == (1, 1, "")  # split('') -> ['']
    assert out[4] == (1, 1, "")  # NULL text coalesces to ''


def test_hll_merges_under_any_shard_split_and_bounds_error(spark):
    """HLL registers must be identical no matter how the corpus is
    sharded (cell-wise MAX merge == global build), and the m=256
    estimate must land within the ~3σ relative-error window."""
    from pyspark.sql import functions as F

    from etl_example_spark.operators.sketches import (
        hll_estimate_cols,
        hll_estimate_expr,
        hll_ranks,
        hll_registers,
    )

    df = spark.range(3000).select(
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("item")
    )
    whole = hll_registers(hll_ranks(df), spark)

    # 3-way split on a hash — different from d118's doc_id % 4 split
    parts = [
        df.filter(F.crc32("item") % 3 == i).select("item") for i in range(3)
    ]
    merged = (
        hll_registers(hll_ranks(parts[0]), spark)
        .unionByName(hll_registers(hll_ranks(parts[1]), spark))
        .unionByName(hll_registers(hll_ranks(parts[2]), spark))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )

    est = (
        whole.agg(*hll_estimate_cols())
        .withColumn("estimate", hll_estimate_expr())
        .collect()[0]["estimate"]
    )
    # σ ≈ 1.04/sqrt(256) ≈ 6.5% — allow 3σ
    assert abs(est - 3000) / 3000 < 0.20, est
