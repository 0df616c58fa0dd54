"""SQL-script source/runner — parity with the reference's S1 operator.

The reference reads ``.sql`` files, naively splits on ``;`` and executes each
statement via psycopg2, tolerating empty fragments and duplicate-object
errors (``src/job.py:46-98``; split at ``:74``, duplicate-skip at ``:82-84``).

This module re-expresses that as a Spark-native runner: each statement goes
through ``spark.sql``. The statement splitter is string-literal-aware
(an improvement over the reference's naive split — safe for values
containing ``;``) but still tolerates trailing ``;;`` like the reference
does for ``ddl/combined_sellout.sql:101008``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def split_sql_statements(text: str) -> list[str]:
    """Split a SQL script into statements on ``;``, respecting single-quoted
    string literals (with ``''`` escapes) and ``--`` line comments."""
    statements: list[str] = []
    buf: list[str] = []
    in_string = False
    in_comment = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_comment:
            buf.append(ch)
            if ch == "\n":
                in_comment = False
        elif in_string:
            buf.append(ch)
            if ch == "'":
                # '' inside a string is an escaped quote, not a terminator.
                if i + 1 < n and text[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_string = False
        elif ch == "'":
            in_string = True
            buf.append(ch)
        elif ch == "-" and i + 1 < n and text[i + 1] == "-":
            in_comment = True
            buf.append(ch)
        elif ch == ";":
            statements.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    statements.append("".join(buf))
    return [s.strip() for s in statements if s.strip()]


def strip_comments(stmt: str) -> str:
    """Drop full-line ``--`` comments (Spark SQL accepts inline comments,
    but stripping keeps logged statements readable)."""
    return "\n".join(
        line for line in stmt.splitlines() if not line.lstrip().startswith("--")
    ).strip()


@dataclass
class SqlScriptResult:
    executed: int = 0
    skipped: int = 0
    results: list[DataFrame] = field(default_factory=list)


def run_sql_script(
    spark: SparkSession,
    path_or_text: str,
    is_path: bool = True,
    skip_errors: tuple[str, ...] = ("TABLE_OR_VIEW_ALREADY_EXISTS",),
) -> SqlScriptResult:
    """Execute a SQL script statement-by-statement via ``spark.sql``.

    Mirrors the reference's duplicate-object tolerance (``src/job.py:82-84``):
    errors whose class matches ``skip_errors`` are skipped, everything else
    raises. Returns the DataFrames of query statements so callers can act on
    them (the reference fetches + tabulates; see plans/presentation).
    """
    if is_path:
        with open(path_or_text, encoding="utf-8") as fh:
            text = fh.read()
    else:
        text = path_or_text

    out = SqlScriptResult()
    for stmt in split_sql_statements(text):
        stmt = strip_comments(stmt)
        if not stmt:
            continue
        try:
            df = spark.sql(stmt)
            out.results.append(df)
            out.executed += 1
        except Exception as exc:  # noqa: BLE001 — classify then re-raise
            if any(code in str(exc) for code in skip_errors):
                out.skipped += 1
                continue
            raise
    return out
