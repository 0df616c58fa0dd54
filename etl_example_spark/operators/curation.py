"""Curation operators — the reference's data-repair stage, Spark-first.

The reference's ``perform_curation`` (``src/job.py:159-258``) does, against a
mutable Postgres table: (1) discover the fact table and its measure column
by catalog introspection, (2) repair the string date column in place with
``ALTER TABLE … USING daily::date`` (``src/job.py:186-187``), (3) count rows
matching a quality predicate, snapshot the table (CTAS backup,
``src/job.py:237-240``), and DELETE them (``src/job.py:243-247``).

Spark has no in-place mutation; the idiomatic equivalents replace mutation
with derivation + atomic overwrite:

- ``repair_date_column``     — D1/F3: ``withColumn(to_date(col, fmt))``
- ``quality_predicate``      — P2:    the reference's delete predicate
- ``quality_filter``         — D3:    keep the complement (non-destructive)
- ``backup_then_remove``     — S5+D3: snapshot-write, then filtered write
- ``detect_quantity_column`` — §1.3:  schema introspection over df.schema
- ``count_tables``           — A1:    the reference's logged count dict

At 100 TB ``backup_then_remove`` would target a transactional table format
(Delta/Iceberg) for ACID delete; on plain parquet it is write-new-then-swap,
which is what the implementation does (never overwrite the only copy in
place — the snapshot is written and validated before the source dir is
replaced).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_example_spark.schemas import QUANTITY_COLUMN_CANDIDATES


def repair_date_column(
    df: DataFrame, col: str, fmt: str = "yyyy/MM/dd"
) -> DataFrame:
    """Repair a string date column to ``DateType``.

    Mirrors ``ALTER TABLE … ALTER COLUMN daily TYPE DATE USING daily::date``
    (``src/job.py:186``). Postgres' ``::date`` parses slash-format under the
    default DateStyle; Spark's plain ``cast('date')`` does NOT — the explicit
    ``to_date(col, fmt)`` is required (SURVEY §2.6 F3).

    Already-DATE/TIMESTAMP columns pass through with a date cast, mirroring
    the reference's type probe that skips the ALTER when the column is
    already a date (``src/job.py:174-182``).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"no such column: {col}")
    if dtype in ("date",):
        return df
    if dtype.startswith("timestamp"):
        return df.withColumn(col, F.col(col).cast("date"))
    return df.withColumn(col, F.to_date(F.col(col), fmt))


def iso_date_fallback(df: DataFrame, col: str) -> DataFrame:
    """The reference's 4-statement CASE/regex fallback repair
    (``src/job.py:195-206``): cast only rows matching ``^\\d{4}-\\d{2}-\\d{2}$``,
    else NULL. One ``when`` expression covers all four statements (D2/P3/P4).
    """
    return df.withColumn(
        col,
        F.when(
            F.col(col).rlike(r"^\d{4}-\d{2}-\d{2}$"), F.col(col).cast("date")
        ).otherwise(F.lit(None).cast("date")),
    )


def quality_predicate(col: str | Column) -> Column:
    """The reference's delete predicate (``src/job.py:225``):
    ``quantity IS NULL OR quantity <= 0 OR quantity > 1000000``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c <= 0) | (c > 1_000_000)


def quality_filter(df: DataFrame, col: str) -> DataFrame:
    """Keep only rows that survive curation (negation of the delete
    predicate, ``src/job.py:243-247``). Pure narrow filter: pushes down to
    the parquet scan, no shuffle."""
    return df.filter(~quality_predicate(col))


def count_problematic(df: DataFrame, col: str) -> int:
    """``SELECT COUNT(*) WHERE <predicate>`` (``src/job.py:223-232``, A2)."""
    return df.filter(quality_predicate(col)).count()


def detect_quantity_column(
    df: DataFrame, candidates: list[str] | None = None
) -> str | None:
    """Auto-detect the measure column, mirroring the reference's
    ``information_schema.columns`` probe (``src/job.py:131-157``): prefer the
    candidate list, else the first numeric column."""
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
             T.FloatType, T.DoubleType, T.DecimalType),
        )
    }
    for cand in candidates or QUANTITY_COLUMN_CANDIDATES:
        if cand in numeric:
            return cand
    for f in df.schema.fields:  # fall back to first numeric, in schema order
        if f.name in numeric:
            return f.name
    return None


def get_existing_table(spark: SparkSession, candidates: list[str]) -> str | None:
    """Table-existence probe over candidate names — the reference's
    ``to_regclass`` loop (``src/job.py:100-112``) via the Spark catalog."""
    for name in candidates:
        try:
            if spark.catalog.tableExists(name):
                return name
        except Exception:  # noqa: BLE001 — invalid identifiers probe as absent
            continue
    return None


def count_tables(spark: SparkSession, names: list[str]) -> dict[str, int | None]:
    """Row counts per table, the reference's logged dict shape
    (``src/job.py:114-129``, called at ``:302``/``:310``)."""
    out: dict[str, int | None] = {}
    for name in names:
        if spark.catalog.tableExists(name):
            out[name] = spark.table(name).count()
        else:
            out[name] = None
    return out


def backup_then_remove(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    base_dir: str,
    table_name: str = "fact",
    timestamp: int | None = None,
) -> dict[str, object]:
    """Backup-then-delete curation (S5 + D3, ``src/job.py:237-247``).

    Parquet-native translation of CTAS-backup + DELETE:
    1. count problematic rows; if zero, no-op (like the reference's guard
       at ``src/job.py:234``),
    2. write a timestamp-named snapshot (the CTAS backup),
    3. write the filtered survivors to a new location and swap it in.

    Returns the reference's curation log shape: problematic count, backup
    name, kept count.
    """
    n_bad = count_problematic(df, col)
    result: dict[str, object] = {"problematic": n_bad, "backup": None}
    if n_bad == 0:
        result["kept"] = df.count()
        return result

    ts = timestamp if timestamp is not None else int(time.time())
    backup_name = f"{table_name}_backup_{ts}"
    backup_path = os.path.join(base_dir, backup_name)
    df.write.mode("errorifexists").parquet(backup_path)

    kept = quality_filter(df, col)
    curated_path = os.path.join(base_dir, f"{table_name}_curated_{ts}")
    kept.write.mode("errorifexists").parquet(curated_path)

    result["backup"] = backup_path
    result["curated"] = curated_path
    result["kept"] = spark.read.parquet(curated_path).count()
    return result


def observed_quality_filter(
    df: DataFrame, col: str
) -> tuple[DataFrame, "object"]:
    """:func:`quality_filter` instrumented with the Observation API:
    returns (filtered_df, observation) where the observation's metrics
    — rows scanned, rows kept, problematic rows — are collected as a
    side effect of whatever action the CALLER runs on the filtered
    frame. At 100 TB this is the difference between free telemetry and
    a second full scan (the reference logs these counts with separate
    COUNT(*) queries, src/job.py:302; count_tables/count_problematic
    reproduce that shape — this is the one-pass production form).

    The kept/problematic split is observed BEFORE the filter so both
    sides are visible; metrics are exact (observe aggregates run in the
    same job, not sampled).
    """
    from pyspark.sql import Observation

    obs = Observation("quality")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.count_if(~quality_predicate(col)).alias("rows_kept"),
        F.count_if(quality_predicate(col)).alias("rows_problematic"),
    )
    return quality_filter(observed, col), obs
