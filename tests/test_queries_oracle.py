"""Differential tests: every oracle-checked registered query must match
DuckDB on the same parquet inputs (mirrors the driver's t2 gate).

Runs at sf0.001 for speed; set SPARK_GRAFT_SF_SMOKE=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_example_spark.plans.registry import load_all
from tests.oracle import duckdb_connection, run_differential

REGISTRY = load_all()
ORACLE_CHECKED = [name for name, q in REGISTRY.items() if q.oracle]


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_duckdb_oracle(spark, con, sf_dir, name):
    problems = run_differential(spark, con, REGISTRY[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark, sf_dir):
    """Every registered query (oracle or not) runs and yields a stable
    schema. Thread-pooled (tests/sweep.py): 285 independent queries,
    previously ~10 sequential minutes of this suite's wall."""
    from tests.sweep import parallel_sweep

    def check(name):
        df = REGISTRY[name].spark_builder(spark, sf_dir)
        if not df.columns:
            return f"{name}: no columns"
        df.limit(1).collect()
        return None

    failures = parallel_sweep(check, list(REGISTRY))
    assert not failures, "\n".join(failures)


def test_differential_harness_detects_injected_errors(spark, con, sf_dir):
    """The gate must not be vacuous: a perturbed query (wrong constant,
    dropped row, renamed column) has to produce mismatches."""
    import copy

    base = REGISTRY["q2_top_products"]

    wrong_value = copy.copy(base)
    wrong_value.spark_builder = lambda s, d: base.spark_builder(s, d).withColumn(
        "unidades", F.col("unidades") + 1
    )
    assert run_differential(spark, con, wrong_value, sf_dir)

    wrong_rows = copy.copy(base)
    wrong_rows.spark_builder = lambda s, d: base.spark_builder(s, d).limit(3)
    assert run_differential(spark, con, wrong_rows, sf_dir)

    wrong_cols = copy.copy(base)
    wrong_cols.spark_builder = lambda s, d: base.spark_builder(
        s, d
    ).withColumnRenamed("unidades", "units")
    assert run_differential(spark, con, wrong_cols, sf_dir)
