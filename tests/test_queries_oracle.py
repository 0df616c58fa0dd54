"""Differential tests: every oracle-checked registered query must match
DuckDB on the same parquet inputs (mirrors the driver's t2 gate).

Runs at sf0.001 for speed; set SPARK_GRAFT_SF_SMOKE=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import pytest

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
    """Every registered query (oracle or not) runs and yields a stable schema."""
    for name, q in REGISTRY.items():
        df = q.spark_builder(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(1).collect()
