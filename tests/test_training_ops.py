"""Unit tests for training-pipeline operators: sequence packing,
benchmark contamination, temperature mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_example_spark.operators.dedup import contamination_report
from etl_example_spark.operators.packing import (
    pack_concat_chunks,
    pack_stats,
)
from etl_example_spark.operators.sampling import (
    temperature_rates,
    temperature_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


class TestPacking:
    def test_offsets_are_running_token_sums(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c", "s"),  # 3 tokens, start 0
                (2, "d e", "s"),  # 2 tokens, start 3
                (3, "f g h i", "s"),  # 4 tokens, start 5
            ],
        )
        got = {
            r.doc_id: (r.n_tokens, r.start_offset, r.bin_id)
            for r in pack_concat_chunks(df, budget=4).collect()
        }
        assert got == {1: (3, 0, 0), 2: (2, 3, 0), 3: (4, 5, 1)}

    def test_groups_pack_independently(self, spark):
        df = _docs(
            spark,
            [(1, "a b", "x"), (2, "c d", "y"), (3, "e f", "x")],
        )
        got = {
            r.doc_id: r.start_offset
            for r in pack_concat_chunks(df, budget=100).collect()
        }
        # group y restarts at offset 0; x packs 1 then 3
        assert got == {1: 0, 2: 0, 3: 2}

    def test_stats_conserve_tokens(self, spark):
        df = _docs(
            spark,
            [(i, "w " * (i + 1), "s") for i in range(20)],
        )
        packed = pack_concat_chunks(df, budget=16)
        stats = pack_stats(packed)
        total = stats.agg(
            F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")
        ).collect()[0]
        assert total.t == sum(i + 1 for i in range(20))
        assert total.d == 20

    def test_empty_text_counts_zero(self, spark):
        df = _docs(spark, [(1, "", "s"), (2, "a", "s")])
        got = {
            r.doc_id: (r.n_tokens, r.start_offset)
            for r in pack_concat_chunks(df, budget=8).collect()
        }
        assert got == {1: (0, 0), 2: (1, 0)}


class TestContamination:
    def test_exact_copy_hits_every_shingle(self, spark):
        bench = _docs(spark, [(100, "one two three four five six", "b")])
        corpus = _docs(
            spark,
            [
                (1, "one two three four five six", "c"),  # identical
                (2, "totally different words here now ok", "c"),
            ],
        )
        rows = contamination_report(corpus, bench, n=5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.doc_id == 1 and r.n_hits == r.n_shingles == 2

    def test_partial_overlap_counts_shared_shingles(self, spark):
        bench = _docs(spark, [(100, "a b c d e", "b")])  # one 5-gram
        corpus = _docs(
            spark, [(1, "x a b c d e y", "c")]  # contains that 5-gram
        )
        r = contamination_report(corpus, bench, n=5).collect()[0]
        assert r.n_hits == 1 and r.n_shingles == 3

    def test_disjoint_corpus_is_clean(self, spark):
        bench = _docs(spark, [(100, "p q r s t", "b")])
        corpus = _docs(spark, [(1, "u v w x y z", "c")])
        assert contamination_report(corpus, bench, n=5).count() == 0


class TestTemperature:
    def test_alpha_one_is_uniform_rate(self):
        rates = temperature_rates({"a": 100, "b": 300}, 1.0, 0.25)
        assert rates["a"] == pytest.approx(0.25)
        assert rates["b"] == pytest.approx(0.25)

    def test_alpha_zero_equalizes_quotas(self):
        rates = temperature_rates({"a": 100, "b": 300}, 0.0, 0.5)
        # equal quotas of 100 docs each -> small stratum saturates at 1.0
        assert rates["a"] == 1.0
        assert rates["b"] == pytest.approx(100 / 300)

    def test_small_alpha_upweights_small_strata(self):
        rates = temperature_rates({"a": 100, "b": 10000}, 0.5, 0.3)
        assert rates["a"] > rates["b"]

    def test_rates_cap_at_one(self):
        rates = temperature_rates({"a": 1, "b": 10000}, 0.1, 0.9)
        assert all(r <= 1.0 for r in rates.values())

    def test_empty_counts(self):
        assert temperature_rates({}, 0.5, 0.3) == {}

    def test_sample_is_deterministic_filter(self, spark):
        df = spark.createDataFrame(
            [(i, "t", "en" if i % 4 else "de") for i in range(400)],
            "doc_id long, text string, lang string",
        )
        a = {r.doc_id for r in temperature_sample(df).collect()}
        b = {
            r.doc_id
            for r in temperature_sample(df.repartition(7)).collect()
        }
        assert a == b  # layout-independent membership
        assert 0 < len(a) < 400


class TestChunking:
    def test_chunks_cover_and_overlap(self, spark):
        from etl_example_spark.operators.text import chunk_text

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(100)))],
            "doc_id long, text string",
        )
        rows = sorted(
            chunk_text(df, chunk_tokens=10, overlap_tokens=3).collect(),
            key=lambda r: r.chunk_id,
        )
        # starts step by 7; last start covers the tail
        assert [r.start_token for r in rows] == list(range(0, 92, 7))
        assert all(r.n_tokens == 10 for r in rows[:-1])
        assert rows[-1].start_token + rows[-1].n_tokens == 100
        # consecutive chunks share exactly 3 tokens
        first = rows[0].chunk_text.split()
        second = rows[1].chunk_text.split()
        assert first[-3:] == second[:3]

    def test_short_doc_single_chunk(self, spark):
        from etl_example_spark.operators.text import chunk_text

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "")], "doc_id long, text string"
        )
        rows = chunk_text(df, chunk_tokens=10, overlap_tokens=3).collect()
        assert len(rows) == 1  # empty doc yields no chunks
        assert rows[0].chunk_text == "a b c" and rows[0].n_tokens == 3

    def test_rejects_bad_overlap(self, spark):
        import pytest

        from etl_example_spark.operators.text import chunk_text

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_text(df, chunk_tokens=8, overlap_tokens=8)


class TestNaiveBayesLangid:
    """d112/d113: the trained language-ID gate must actually LEARN —
    the point of replacing the d29 heuristic with a fit model — plus
    the untrained-class and empty-corpus contracts."""

    def test_gate_recovers_function_word_signal(self, spark, sf_dir):
        from etl_example_spark.plans.registry import load_all

        df = load_all()["d113_langid_gate"].spark_builder(spark, sf_dir)
        agg = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("correct").cast("int")).alias("ok"),
        ).collect()[0]
        assert agg["n"] > 0
        assert agg["ok"] / agg["n"] >= 0.95, (
            f"langid gate accuracy {agg['ok']}/{agg['n']} — the NB fit "
            "failed to recover the injected function-word signal"
        )

    def test_untrained_class_scores_null(self, spark):
        from etl_example_spark.operators.text import (
            nb_langid_scores,
            nb_langid_train,
        )

        df = spark.createDataFrame(
            [(1, "en", "the of and"), (2, "en", "to is the")],
            "doc_id long, lang string, text string",
        )
        weights, priors = nb_langid_train(df, ("en", "zz"), dim=16)
        assert set(weights) == {"en"}  # 'zz' has no documents
        out = df.select(
            "doc_id",
            *nb_langid_scores(("en", "zz"), weights, priors, dim=16),
        ).collect()
        assert all(r["s_zz"] is None for r in out)
        assert all(r["s_en"] is not None for r in out)

    def test_empty_corpus_trains_empty_model(self, spark):
        from etl_example_spark.operators.text import nb_langid_train

        df = spark.createDataFrame(
            [], "doc_id long, lang string, text string"
        )
        weights, priors = nb_langid_train(df, ("en", "de"), dim=16)
        assert weights == {} and priors == {}

    def test_tokenless_doc_scores_its_prior(self, spark):
        from etl_example_spark.operators.text import (
            _ln_micro,
            nb_langid_scores,
            nb_langid_train,
        )

        df = spark.createDataFrame(
            [(1, "en", "the of"), (2, "en", ""), (3, "de", "der und")],
            "doc_id long, lang string, text string",
        )
        weights, priors = nb_langid_train(df, ("en", "de"), dim=16)
        row = (
            df.filter(F.col("doc_id") == 2)
            .select(*nb_langid_scores(("en", "de"), weights, priors, 16))
            .collect()[0]
        )
        assert row["s_en"] == priors["en"] == _ln_micro(2 / 3)
        assert row["s_de"] == priors["de"] == _ln_micro(1 / 3)
