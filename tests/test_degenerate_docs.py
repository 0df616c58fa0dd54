"""Degenerate-DOCUMENT differential sweep: every oracle-checked query
that reads the documents table must agree with DuckDB on a corpus
containing a NULL-text document, an empty-text document, a whitespace-
only document, and a single-token document — the cells real crawls
contain and fixture data never does.

This is the corpus-level sibling of tests/test_empty_inputs.py (zero
ROWS there; degenerate CELLS here). The tokenization contract it pins:
NULL text ≡ empty text on both engines (operators/text.tokens and the
SQL_TOKS/SQL_NTOKS oracle macros coalesce identically — without that,
Spark's size(null array) = -1 silently shifts corpus token totals that
an oracle SUM skips).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from etl_example_spark.plans.registry import load_all
from etl_example_spark.schemas import TESTDATA_TABLES
from etl_example_spark.sources.loaders import load_table
from tests.oracle import duckdb_connection, run_differential

#: appended to the sf0.001 documents table; ids far above the real range
DEGENERATE_DOCS = [
    Row(doc_id=9_000_001, text=None, lang="en", source="src0", n_chars=0),
    Row(doc_id=9_000_002, text="", lang="de", source="src1", n_chars=0),
    Row(doc_id=9_000_003, text="   ", lang="es", source="src2", n_chars=3),
    Row(doc_id=9_000_004, text="solo", lang="fr", source="src3", n_chars=4),
    # tab/newline classes: DuckDB/Spark trim() strips SPACES only, so
    # any oracle tokenizing with a raw (unfiltered) string_split_regex
    # grows a phantom '' token on these — the exact trap the SQL_TOKS
    # macro exists for (caught live in the s56/d56 chunking oracles)
    Row(
        doc_id=9_000_005,
        text="\thello\tworld\n",
        lang="en",
        source="src4",
        n_chars=14,
    ),
    Row(doc_id=9_000_006, text="\n\t ", lang="de", source="src5", n_chars=3),
    Row(
        doc_id=9_000_007,
        text="first line\nsecond line",
        lang="es",
        source="src6",
        n_chars=22,
    ),
]

# Nothing is exempted: the once-suspect NULL-text ops (d30/d74/d54 —
# fingerprint/normalization md5-of-NULL handling) now pass the sweep
# since their engine/oracle NULL conventions were aligned; SKIP stays
# as the hook for any future genuinely-non-comparable op.
SKIP = set()


@pytest.fixture(scope="module")
def degen_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """Testdata layout clone: each table ONE parquet FILE (not a Spark
    output directory — the streaming sources symlink the file path, and
    a directory behind the symlink streams zero rows)."""
    import glob
    import shutil

    out = str(tmp_path_factory.mktemp("sf_degen"))
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "documents":
            extra = spark.createDataFrame(DEGENERATE_DOCS, df.schema)
            df = df.unionByName(extra)
        tmp = os.path.join(out, f"_{name}_dir")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp)
    return out


def _reads_documents(q) -> bool:
    return q.oracle is not None and "documents" in q.oracle


def test_every_documents_query_survives_degenerate_cells(
    spark, degen_sf_dir
):
    """Thread-pooled (tests/sweep.py); each worker call opens its own
    DuckDB connection (the connection object is not thread-safe; view
    registration over parquet is cheap)."""
    import threading

    from tests.sweep import parallel_sweep

    registry = load_all()
    local = threading.local()

    def check(name):
        if not hasattr(local, "con"):
            local.con = duckdb_connection(degen_sf_dir)
        problems = run_differential(spark, local.con, registry[name], degen_sf_dir)
        if problems:
            return f"{name}: {problems[:2]}"
        return None

    names = [
        n for n, q in registry.items()
        if _reads_documents(q) and n not in SKIP
    ]
    assert len(names) > 60, f"sweep matched too few queries ({len(names)})"
    failures = parallel_sweep(check, names)
    assert not failures, f"{len(failures)} queries diverge:\n" + "\n".join(
        failures
    )
