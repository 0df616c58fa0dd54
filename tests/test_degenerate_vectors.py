"""Degenerate-VECTOR differential sweep: every oracle-checked query that
reads the embeddings table must agree with DuckDB on a corpus containing
a ZERO vector (cosine's divide-by-zero — the ADVICE-r8 ivf_assign edge)
— the vectors real embedding jobs emit (a failed forward pass writes
zeros) and fixture data never does.

Sibling of tests/test_degenerate_docs.py (documents) and
tests/test_empty_inputs.py (zero rows).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import Row

from etl_example_spark.plans.registry import load_all
from etl_example_spark.schemas import TESTDATA_TABLES
from etl_example_spark.sources.loaders import load_table
from tests.oracle import duckdb_connection, run_differential

DIM = 64

#: appended to the sf0.001 embeddings table; ids far above the real
#: range so every id-derived batch/query split keeps its real members
DEGENERATE_VECS = [
    Row(vec_id=9_000_001, embedding=[0.0] * DIM, label=1),
    Row(vec_id=9_000_003, embedding=[0.0] * DIM, label=2),
]

# Recall-bound certificates: their oracle is the constant (k, TRUE) row
# measured on the REAL corpus; perturbing the corpus can legitimately
# move recall across the documented floor. Run-only here (the empty-
# input test documents the same exemption).
SKIP_DIFFERENTIAL = {
    "s33a_ann_recall_bound",
    "s40a_ivf_recall_bound",
    "s42a_pq_recall_bound",
    "s49a_sq8_recall_bound",
}


@pytest.fixture(scope="module")
def degen_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_degen_vec"))
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "embeddings":
            extra = spark.createDataFrame(DEGENERATE_VECS, df.schema)
            df = df.unionByName(extra)
        tmp = os.path.join(out, f"_{name}_dir")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp)
    return out


def _reads_embeddings(q) -> bool:
    return q.oracle is not None and "embeddings" in q.oracle


def test_every_embeddings_query_survives_zero_vectors(
    spark, degen_sf_dir
):
    import threading

    from tests.sweep import parallel_sweep

    registry = load_all()
    local = threading.local()

    def check(name):
        if name in SKIP_DIFFERENTIAL:
            registry[name].spark_builder(spark, degen_sf_dir).count()
            return None
        if not hasattr(local, "con"):
            local.con = duckdb_connection(degen_sf_dir)
        problems = run_differential(
            spark, local.con, registry[name], degen_sf_dir
        )
        if problems:
            return f"{name}: {problems[:2]}"
        return None

    names = [n for n, q in registry.items() if _reads_embeddings(q)]
    assert len(names) > 10, f"sweep matched too few queries ({len(names)})"
    failures = parallel_sweep(check, names)
    assert not failures, f"{len(failures)} queries diverge:\n" + "\n".join(
        failures
    )
