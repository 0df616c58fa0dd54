"""End-to-end reference lifecycle tests on synthetic dirty star-schema data,
with DuckDB as differential oracle for the 4 validation queries
(the formalization of the reference's informal checks — SURVEY §5)."""

from __future__ import annotations

import duckdb
import pytest

from etl_example_spark.plans.pipeline import run_pipeline, show_results
from etl_example_spark.plans.reference_queries import (
    REFERENCE_SQL,
    run_reference_sql,
)
from etl_example_spark.schemas import REFERENCE_SCHEMAS
from etl_example_spark.fixtures import make_reference_tables
from tests.oracle import compare_frames


@pytest.fixture(scope="module")
def ref_tables(spark):
    pdfs = make_reference_tables()
    sdfs = {
        name: spark.createDataFrame(pdf, schema=REFERENCE_SCHEMAS[name])
        for name, pdf in pdfs.items()
    }
    return pdfs, sdfs


@pytest.fixture(scope="module")
def result(spark, ref_tables):
    _, sdfs = ref_tables
    return run_pipeline(spark, sdfs)


def test_pre_counts_shape(result, ref_tables):
    pdfs, _ = ref_tables
    assert result.pre_counts == {name: len(pdf) for name, pdf in pdfs.items()}


def test_problematic_count_matches_pandas(result, ref_tables):
    pdfs, _ = ref_tables
    q = pdfs["sellout"]["quantity"]
    expected = int((q.isna() | (q <= 0) | (q > 1_000_000)).sum())
    assert result.problematic == expected
    assert result.post_counts["sellout"] == len(pdfs["sellout"]) - expected


def test_duplicates_kept(result):
    """The engine must NOT deduplicate fact rows (SURVEY §1.2)."""
    curated = result.curated
    n_rows = curated.count()
    n_distinct = curated.distinct().count()
    assert n_rows > n_distinct  # injected duplicates survive curation


def test_date_repaired_to_date_type(result):
    assert dict(result.curated.dtypes)["daily"] == "date"


def test_queries_match_duckdb(spark, result, ref_tables):
    """Replay the curation + 4 queries in DuckDB over the same raw data and
    compare. DuckDB plays the role Postgres plays for the reference."""
    pdfs, _ = ref_tables
    con = duckdb.connect()
    con.register("sellout_raw", pdfs["sellout"])
    for dim in ("chains", "stores", "products"):
        con.register(dim, pdfs[dim])
    con.execute(
        """
        CREATE VIEW sellout AS
        SELECT store_id, product_id,
               CAST(strptime(daily, '%Y/%m/%d') AS DATE) AS daily,
               quantity
        FROM sellout_raw
        WHERE quantity IS NOT NULL AND quantity > 0 AND quantity <= 1000000
        """
    )
    oracle_sql = {
        # tie-broken variants of the reference queries (top-k tie order is
        # engine-unspecified; SURVEY §2.5) — same tie-break on both sides.
        "q1_weekly": """
            SELECT date_trunc('week', daily) AS semana, CAST(SUM(quantity) AS BIGINT) AS unidades
            FROM sellout GROUP BY semana ORDER BY semana
        """,
        "q2_top_products": """
            SELECT p.product_name, CAST(SUM(s.quantity) AS BIGINT) AS unidades
            FROM sellout s JOIN products p USING (product_id)
            GROUP BY p.product_name ORDER BY unidades DESC, product_name LIMIT 5
        """,
        "q3_top_stores": """
            SELECT c.chain_name, st.store_name, CAST(SUM(s.quantity) AS BIGINT) AS unidades
            FROM sellout s JOIN stores st USING (store_id)
            JOIN chains c USING (chain_id)
            GROUP BY 1, 2 ORDER BY unidades DESC, chain_name, store_name LIMIT 5
        """,
        "q4_seasonality": """
            SELECT c.chain_name, dayname(daily) AS dia_semana,
                   CAST(SUM(s.quantity) AS BIGINT) AS unidades
            FROM sellout s JOIN stores st USING (store_id)
            JOIN chains c USING (chain_id)
            GROUP BY 1, 2 ORDER BY chain_name, unidades DESC, dia_semana
        """,
    }
    from pyspark.sql import functions as F

    spark_results = {
        "q1_weekly": result.query_results["q1_weekly"],
        # re-apply deterministic tie-breaks for comparison only
        "q2_top_products": result.query_results["q2_top_products"]
        .orderBy(F.desc("unidades"), "product_name"),
        "q3_top_stores": result.query_results["q3_top_stores"]
        .orderBy(F.desc("unidades"), "chain_name", "store_name"),
        "q4_seasonality": result.query_results["q4_seasonality"],
    }
    # q2/q3 Spark results may differ from oracle within ties; compare as
    # grouped multisets of unidades instead for the k-th tie boundary.
    for name in ("q1_weekly", "q4_seasonality"):
        problems = compare_frames(
            spark_results[name].toPandas(), con.execute(oracle_sql[name]).fetchdf()
        )
        assert not problems, f"{name}: {problems}"
    for name in ("q2_top_products", "q3_top_stores"):
        spark_units = sorted(
            r["unidades"] for r in spark_results[name].collect()
        )
        oracle_units = sorted(
            r[len(r) - 1] for r in con.execute(oracle_sql[name]).fetchall()
        )
        assert spark_units == oracle_units, name


def test_sql_and_dataframe_surfaces_agree(spark, result, ref_tables):
    """REFERENCE_SQL over temp views ≡ DataFrame chains (same Catalyst plan
    family, same results)."""
    _, sdfs = ref_tables
    result.curated.createOrReplaceTempView("sellout")
    for dim in ("chains", "stores", "products"):
        sdfs[dim].createOrReplaceTempView(dim)
    sql_results = run_reference_sql(spark)
    for name in ("q1_weekly", "q4_seasonality"):  # fully-ordered outputs
        a = sql_results[name].toPandas()
        b = result.query_results[name].toPandas()
        problems = compare_frames(a, b)
        assert not problems, f"{name}: {problems}"


def test_show_results_presentation(result):
    shown = show_results(result.query_results, n=10)
    assert set(shown) == set(REFERENCE_SQL)
    for text in shown.values():
        assert "unidades" in text  # header present, 10-row table renders
