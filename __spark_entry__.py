"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``etl_example_spark.plans.registry`` — the single source
of truth for the engine's query surface. Each registered Query carries its
Spark builder and (where SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_example_spark.plans.registry import load_all  # noqa: E402
from etl_example_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    configure_session(spark)
    return registry["q0_pricing_summary"].spark_builder(
        spark, "/root/testdata/sf0.001"
    )


def _configured(builder: Callable[[SparkSession, str], DataFrame]):
    """Apply engine session settings at the contract boundary (the driver
    hands a vanilla session), then build — loaders stay side-effect-free."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return builder(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: _configured(q.spark_builder) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
