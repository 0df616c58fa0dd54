"""Literal LocalRelation DataFrames for model-sized driver-held state.

``spark.createDataFrame(rows, schema)`` in PySpark wraps the rows in an
RDD (``Scan ExistingRDD`` in plans), so every ``collect()`` over such a
tiny frame launches a Spark job and every broadcast build materializes
one — measured at 0.1–0.4 s of pure scheduling per occurrence, which
dominates serve-path queries whose real work is a bucket-pruned probe
(round-13: job-count overhead measured per guide §1; the fix removes accidental work per §2.4).

``local_df`` renders the same rows as a ``SELECT CAST(...) FROM
VALUES`` statement instead: the analyzer constant-folds it into a true
``LocalRelation``, whose ``collect()`` is a driver-local fast path
(ZERO jobs) and whose broadcast build never schedules a task. Values
round-trip exactly: ints and strings are literal text, doubles go
through ``repr`` (shortest-round-trip decimal) inside a string→double
CAST (correctly-rounded, so the parsed double is bit-identical to the
Python float), and every column is cast to its declared type so the
schema matches ``createDataFrame``'s. Supported value types are the
model-state ones: int, float, str, bool, None, and (nested) lists
thereof — a deliberate subset; anything else raises rather than
guessing.

Use it for MODEL-SIZED literals only (query workloads, centroids,
codebooks, totals rows — the bounded-collect sanction); corpora go
through real sources.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _sql_scalar(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS {typ})"
    if isinstance(v, float):
        if math.isnan(v):
            s = "NaN"
        elif math.isinf(v):
            s = "Infinity" if v > 0 else "-Infinity"
        else:
            s = repr(v)
        return f"CAST('{s}' AS {typ})"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"CAST('{esc}' AS {typ})"
    raise TypeError(f"local_df: unsupported scalar {type(v).__name__}")


def _sql_value(v, typ: str) -> str:
    typ = typ.strip()
    if isinstance(v, (list, tuple)):
        low = typ.lower()
        if not low.startswith("array<") or not typ.endswith(">"):
            raise TypeError(f"local_df: list value for non-array type {typ}")
        elem = typ[6:-1]
        if not v:
            return f"CAST(ARRAY() AS {typ})"
        # the outer CAST pins containsNull=true at every nesting level
        # (a DDL array type parses nullable) — without it an all-literal
        # array is typed containsNull=false, and expressions DERIVED
        # from it can inherit a wrongly non-nullable element type that
        # runtime NULLs then corrupt (observed: array_max over a
        # transform() of such an array misread NULL similarities and
        # array_position returned 0)
        arr = "ARRAY(" + ", ".join(_sql_value(x, elem) for x in v) + ")"
        return f"CAST({arr} AS {typ})"
    if v is None:
        return f"CAST(NULL AS {typ})"
    return _sql_scalar(v, typ)


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a true-LocalRelation DataFrame from ``rows`` (sequences of
    int/float/str/bool/None/nested-list values) and a DDL ``schema``
    string ("name type, name type, ...). A value type outside the
    supported subset falls back to ``createDataFrame`` — identical
    rows, just without the zero-job fast path."""
    try:
        return _local_df(spark, rows, schema)
    except TypeError:
        return spark.createDataFrame(rows, schema)


def _local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    cols = []
    for field in _split_top(schema):
        name, typ = field.strip().split(None, 1)
        cols.append((name, typ.strip()))
    # Column TYPES are pinned by the per-cell CASTs, and ARRAY values
    # are cast to their declared type so element nullability matches
    # createDataFrame's (containsNull=true — see _sql_value; narrower
    # element types were observed to corrupt NULL handling in derived
    # expressions). Top-level column nullability may still come out
    # NARROWER for all-literal scalar columns — true information about
    # genuinely non-null literals, and no consumer compares it.
    if not rows:
        sel = ", ".join(
            f"CAST(NULL AS {typ}) AS {name}" for name, typ in cols
        )
        return spark.sql(f"SELECT {sel} WHERE 1 = 0")
    rendered = []
    for row in rows:
        if len(row) != len(cols):
            raise ValueError("local_df: row arity != schema arity")
        cells = ", ".join(
            _sql_value(v, typ) for v, (_, typ) in zip(row, cols)
        )
        rendered.append(f"({cells})")
    names = ", ".join(name for name, _ in cols)
    return spark.sql(
        f"SELECT * FROM VALUES {', '.join(rendered)} AS t({names})"
    )


def _split_top(schema: str) -> list[str]:
    """Split a DDL schema on top-level commas (commas inside
    ``array<...>`` etc. don't split)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(schema[start:i])
            start = i + 1
    parts.append(schema[start:])
    return [p for p in parts if p.strip()]
