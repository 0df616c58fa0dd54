"""Declarative sources.

The reference's only source is "read a .sql file, split on ';', execute each
statement against Postgres" (``src/job.py:46-98``, operator S1 in SURVEY §2.1).
Here the idiomatic equivalents:

- parquet loaders for the testdata star schema (columnar scan, predicate
  pushdown and column pruning reach the file scan via Catalyst),
- typed literal-row loaders (``spark.createDataFrame`` with an explicit
  schema) replacing file-of-INSERTs,
- a thin SQL-script runner (sources/sql_script.py) for parity with S1.

At 100 TB the parquet path is the real one: a date-partitioned,
optionally bucketed table layout; the loader keeps the API identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_example_spark.schemas import TESTDATA_TABLES

# Warm-table cache: the engine's buffer pool. The reference's baseline
# numbers are warm-server Postgres latencies (BASELINE.md) — the Spark
# analog is tables pinned in the in-memory columnar store. Keyed by
# (session id, sf_dir, table); populated explicitly via warm_tables().
_WARM: dict[tuple[int, str, str], DataFrame] = {}


def warm_tables(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    partitions: int | None = None,
) -> None:
    """Pin tables in memory, optionally repartitioned for parallel scans.

    The testdata parquet files are single-row-group, so a cold scan is a
    single task no matter the cluster size; repartitioning the cached copy
    restores scan parallelism. (At 100 TB the inverse holds: many files →
    natural parallelism, and warm_tables would pin only hot dimensions.)
    """
    for name in names or TESTDATA_TABLES:
        key = (id(spark), sf_dir, name)
        if key in _WARM:
            continue
        df = load_table(spark, sf_dir, name)
        if partitions and name in ("lineitem", "orders", "events"):
            df = df.repartition(partitions)
        df = df.persist()
        df.count()
        _WARM[key] = df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (``{sf_dir}/{name}.parquet``).

    A plain ``spark.read.parquet`` so every downstream filter/projection is
    eligible for pushdown into the vectorized parquet reader.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's reader
    rejects by default; read it as nanos-since-epoch and convert to a
    microsecond timestamp (schema repair at the source boundary — the same
    derive-don't-mutate pattern as operators/curation.py).
    """
    warm = _WARM.get((id(spark), sf_dir, name))
    if warm is not None:
        return warm
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Requires spark.sql.legacy.parquet.nanosAsLong=true (set by
        # session.get_spark / session.configure_session at the session
        # boundary — loaders themselves never mutate caller config).
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # physical TIMESTAMP(NANOS) surfaced as nanos-since-epoch
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df  # re-written copies carry a proper timestamp already
    return spark.read.parquet(path)


def load_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV source with an explicit schema — never ``inferSchema`` at
    scale (inference is a full extra pass over the data). Malformed rows
    surface as nulls under the default PERMISSIVE mode; pass
    ``mode=FAILFAST`` semantics by validating downstream (curation ops)."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def load_json(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an explicit schema: unknown fields are
    pruned at parse time (schema projection), nested structs map to
    StructType columns."""
    return spark.read.schema(schema).json(path)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load testdata tables; optionally register each as a temp view so the
    SQL API (``spark.sql``) sees the same catalog the DataFrame API uses."""
    tables: dict[str, DataFrame] = {}
    for name in names or TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        tables[name] = df
    return tables
