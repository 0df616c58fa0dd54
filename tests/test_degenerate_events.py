"""Degenerate-EVENT differential sweep: every oracle-checked query that
reads the events table must agree with DuckDB on a log containing a
NULL-timestamp row and a row with NULL user/type/value/props — the rows
real event pipelines receive from malformed client payloads.

Completes the degenerate-input trilogy (documents / embeddings /
events). The contracts it pins:

- event-time operators (windows, sessions, as-of, CDC sequencing,
  transition graphs) REQUIRE their time and key columns — malformed
  rows are dropped at the operator boundary on BOTH engines, never
  half-processed (and never crash a streaming job: the stateful dedup
  kernel once died on int(None) of a NULL group key);
- where a NULL survives into an ORDER BY, the engine pins NULLS LAST
  explicitly (Spark's ASC default is nulls-FIRST, DuckDB's is
  nulls-LAST — a silent sequence rewrite in running windows).
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


@pytest.fixture(scope="module")
def degen_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_degen_events"))
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "events":
            max_ts = df.agg({"ts": "max"}).collect()[0][0]
            extra = spark.createDataFrame(
                [
                    Row(event_id=9_000_001, ts=None, user_id=13,
                        event_type="click", value=1.0, props='{"k": 1}'),
                    Row(event_id=9_000_002, ts=max_ts, user_id=None,
                        event_type=None, value=None, props=None),
                    # pages that exist ONLY in NULL-ts / NULL-user rows:
                    # the graph queries must not emit them as isolated
                    # vertices (engine vertex set == the oracles' ev
                    # filter — graph.event_graph_nodes)
                    Row(event_id=9_000_003, ts=None, user_id=77,
                        event_type="click", value=1.0,
                        props='{"k": 9999999}'),
                    Row(event_id=9_000_004, ts=max_ts, user_id=None,
                        event_type="click", value=1.0,
                        props='{"k": 9999998}'),
                ],
                df.schema,
            )
            df = df.unionByName(extra)
        tmp = os.path.join(out, f"_{name}_dir")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp)
    return out


def _reads_events(q) -> bool:
    return q.oracle is not None and "events" in q.oracle


def test_every_events_query_survives_malformed_rows(spark, degen_sf_dir):
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

    names = [n for n, q in registry.items() if _reads_events(q)]
    assert len(names) > 20, f"sweep matched too few queries ({len(names)})"
    failures = parallel_sweep(check, names)
    assert not failures, f"{len(failures)} queries diverge:\n" + "\n".join(
        failures
    )
