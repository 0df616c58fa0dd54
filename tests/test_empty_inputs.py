"""Degenerate-input checks: every registered query must run over a
dataset with the right schemas and ZERO rows — the null-handling and
empty-aggregation edge the fixtures never hit — and the oracle-bearing
queries must still agree with DuckDB on that input."""

from __future__ import annotations

import os

import pytest

from etl_example_spark.plans.registry import load_all
from etl_example_spark.schemas import TESTDATA_TABLES
from etl_example_spark.sources.loaders import load_table
from tests.oracle import duckdb_connection, run_differential

# Known zero-row divergences (run-only on empty input, still differential
# on real data):
# - m34: scalar-aggregate oracle (no GROUP BY) emits one row over zero
#   rows while the groupBy builder emits none — oracle-formulation artifact
# - q13/q45/q48: Spark plans rollup/grouping-sets/cube as Expand+groupBy,
#   so empty input yields no groups at all; DuckDB (and the SQL standard)
#   emit the grand-total grouping as one zero-count row — engine difference
# - s33a/s40a/s42a/s49a: recall certificates whose oracle is the
#   expected (k, TRUE) row for the REAL corpus; on an empty corpus the
#   exact top-k is empty and the certificate is vacuously (0, False) —
#   run-only here, hash-checked on real data
SKIP_DIFFERENTIAL = {
    "m34_multimodal_stats",
    "q13_rollup",
    "q45_grouping_sets",
    "q48_cube",
    "s33a_ann_recall_bound",
    "s40a_ivf_recall_bound",
    "s42a_pq_recall_bound",
    "s49a_sq8_recall_bound",
    "s58a_ivfpq_recall_bound",
    "s60a_ivfpq_residual_recall_bound",
    "s61_ivfpq_artifact_law",  # empty corpus -> (0, TRUE), vacuously
    "s59a_ivf_artifact_law",  # same vacuous (0, TRUE) shape
    "s63_ivfpq_residual_artifact_law",  # same
    "s64_sampled_quantizer_bound",  # recall-certificate shape, same
    "s65_ivfpq_fully_served_law",  # same vacuous (0, TRUE) shape
    "s66_residual_fully_served_law",  # same
    "s67_sampled_residual_bound",  # recall-certificate shape, same
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """A testdata directory with every table present but empty."""
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name).limit(0)
        df.coalesce(1).write.parquet(os.path.join(out, f"{name}.parquet"))
    return out


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import threading

    from tests.sweep import parallel_sweep

    registry = load_all()
    local = threading.local()

    def check(name):
        q = registry[name]
        if q.oracle and name not in SKIP_DIFFERENTIAL:
            if not hasattr(local, "con"):
                local.con = duckdb_connection(empty_sf_dir)
            problems = run_differential(spark, local.con, q, empty_sf_dir)
            if problems:
                return f"{name}: {problems[:2]}"
        else:
            q.spark_builder(spark, empty_sf_dir).count()
        return None

    failures = parallel_sweep(check, list(registry))
    assert not failures, "\n".join(failures)


class TestNewOpsDegenerate:
    def test_pack_empty_corpus(self, spark):
        from etl_example_spark.operators.packing import (
            pack_concat_chunks,
            pack_stats,
        )

        empty = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert pack_concat_chunks(empty, budget=8).count() == 0
        assert pack_stats(pack_concat_chunks(empty, budget=8)).count() == 0

    def test_contamination_empty_benchmark(self, spark):
        from etl_example_spark.operators.dedup import contamination_report

        corpus = spark.createDataFrame(
            [(1, "a b c d e f", "s")],
            "doc_id long, text string, source string",
        )
        empty = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert contamination_report(corpus, empty, n=5).count() == 0
        assert contamination_report(empty, corpus, n=5).count() == 0

    def test_temperature_sample_empty(self, spark):
        from etl_example_spark.operators.sampling import temperature_sample

        empty = spark.createDataFrame(
            [], "doc_id long, text string, lang string"
        )
        assert temperature_sample(empty).count() == 0

    def test_resample_empty(self, spark):
        from etl_example_spark.operators.temporal import resample_daily_ffill

        empty = spark.createDataFrame(
            [], "user_id long, ts timestamp, value double"
        )
        assert (
            resample_daily_ffill(empty, "user_id", "ts", "value").count()
            == 0
        )
