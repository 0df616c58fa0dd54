"""DuckDB differential-oracle harness.

Mirrors the driver's t2 correctness gate: run the Spark query and the
DuckDB oracle SQL over the same parquet tables, then compare row count,
column names, and an order-insensitive value comparison (columns sorted by
name, rows sorted by their full stringified value tuple).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from etl_example_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB con with each testdata table registered as a view, like the
    driver does."""
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):  # Spark-written table = directory of parts
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        # unify timestamp flavors (ns/us, tz-naive) to ISO strings
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[col] = s.map(_stringify)
    rows = df.astype(str).values.tolist()
    rows.sort()
    return pd.DataFrame(rows, columns=df.columns)


def _stringify(v: object) -> str:
    import datetime
    import decimal

    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_stringify(x) for x in v) + "]"
    return str(v)


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_rel_tol: float = 0.0
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems

    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    n_diff = 0
    for i in range(len(a)):
        ra, rb = list(a.iloc[i]), list(b.iloc[i])
        if ra != rb:
            if float_rel_tol and _rows_close(ra, rb, float_rel_tol):
                continue
            n_diff += 1
            if n_diff <= 5:
                problems.append(f"row {i}: spark={ra} oracle={rb}")
    if n_diff > 5:
        problems.append(f"... {n_diff} differing rows total")
    return problems


def _rows_close(ra: list[str], rb: list[str], rel_tol: float) -> bool:
    for x, y in zip(ra, rb):
        if x == y:
            continue
        try:
            if not math.isclose(float(x), float(y), rel_tol=rel_tol):
                return False
        except ValueError:
            return False
    return True


def run_differential(spark, con, query, sf_dir: str) -> list[str]:
    """Run one registered Query both ways; return mismatch list."""
    sdf = query.spark_builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = con.execute(query.oracle).fetchdf()
    return compare_frames(spark_pdf, oracle_pdf)
