"""Degenerate-RELATIONAL sweep: every oracle-checked query reading
lineitem, orders, or a perturbed dimension (customer/supplier/part)
must agree with DuckDB when each such table contains a row that is
NULL in every non-key column — the rows a real ETL ingest produces
from malformed upstream records (TPC-H's NOT NULL spec is a property
of the generator, not of production data).

Completes the degenerate-input coverage across all fact tables
(documents / embeddings / events / lineitem+orders). Contracts pinned
here: NULLS LAST wherever a NULL can reach an ORDER BY (q90's NTILE
boundaries), SQL-standard UNPIVOT NULL exclusion (q80), and
empty-array guards where collect_list skips every element (q71's
lower-median once crashed on element_at index 0).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_example_spark.plans.registry import load_all
from etl_example_spark.schemas import TESTDATA_TABLES
from etl_example_spark.sources.loaders import load_table
from tests.oracle import duckdb_connection, run_differential

#: (table, key columns preserved with a far-out-of-range id)
PERTURBED = {
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}


@pytest.fixture(scope="module")
def degen_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_degen_rel"))
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        if name in PERTURBED:
            keys = PERTURBED[name]
            extra = df.limit(1).select(
                *[
                    (
                        F.lit(9_000_001).cast(df.schema[c].dataType)
                        if c in keys
                        else F.lit(None).cast(df.schema[c].dataType)
                    ).alias(c)
                    for c in df.columns
                ]
            )
            df = df.unionByName(extra)
        tmp = os.path.join(out, f"_{name}_dir")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp)
    return out


def _reads_facts(q) -> bool:
    return q.oracle is not None and any(
        t in q.oracle for t in PERTURBED
    )


def test_every_fact_query_survives_null_rows(spark, degen_sf_dir):
    import threading

    from tests.sweep import parallel_sweep

    registry = load_all()
    local = threading.local()

    def check(name):
        if not hasattr(local, "con"):
            local.con = duckdb_connection(degen_sf_dir)
        problems = run_differential(
            spark, local.con, registry[name], degen_sf_dir
        )
        if problems:
            return f"{name}: {problems[:2]}"
        return None

    names = [n for n, q in registry.items() if _reads_facts(q)]
    assert len(names) > 40, f"sweep matched too few queries ({len(names)})"
    failures = parallel_sweep(check, names)
    assert not failures, f"{len(failures)} queries diverge:\n" + "\n".join(
        failures
    )
