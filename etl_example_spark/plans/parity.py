"""Reference-parity queries, re-targeted at the driver's testdata star schema.

The reference runs 4 analytical queries over its retail star schema
(``sql/queries.sql:1-33``; operator rows A3-A6, J1-J2, O1-O4 in SURVEY §2).
The testdata mapping: fact ``sellout`` → ``lineitem``; dims ``products`` →
``part``, ``stores`` → ``supplier``, ``chains`` → ``nation``; measure
``quantity`` → ``l_quantity``; date ``daily`` → ``l_shipdate``.

Determinism notes:
- ``l_quantity`` is integral-valued (whole-number doubles), so ``SUM`` is
  exact and order-independent — no decimal cast needed.
- Top-k queries (the reference's ``ORDER BY … DESC LIMIT 5``,
  ``sql/queries.sql:12-13,21-22``) get explicit tie-break keys; tie order
  across engines is otherwise unspecified (SURVEY §2.5 note).
- ``DATE_TRUNC('week')`` is Monday-start in both Spark and DuckDB/Postgres
  (SURVEY §2.6 F1); both return timestamps.
- Day-of-week names: Spark ``date_format(…,'EEEE')`` ≡ DuckDB ``dayname()``
  — unpadded English names (the reference's Postgres ``TO_CHAR(…,'Day')``
  blank-pads to 9 chars, ``sql/queries.sql:26``; padding is presentation
  only and is normalized away here, SURVEY §2.6 F2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_example_spark.functions.numeric import as_scaled_long
from etl_example_spark.plans.registry import register
from etl_example_spark.sources.loaders import load_table


@register(
    "q1_weekly_units",
    "Weekly unit sales: SUM(quantity) GROUP BY date_trunc('week') — reference "
    "Q1 (sql/queries.sql:2-5, operator A3/O1).",
    oracle="""
        SELECT date_trunc('week', l_shipdate) AS semana,
               SUM(l_quantity) AS unidades
        FROM lineitem
        GROUP BY semana
        ORDER BY semana
    """,
    category="parity",
    bench=True,
)
def q1_weekly_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.date_trunc("week", "l_shipdate").alias("semana"))
        .agg(F.sum("l_quantity").alias("unidades"))
        .orderBy("semana")
    )


@register(
    "q2_top_products",
    "Top-5 products by units: join fact→dim + agg + top-k — reference Q2 "
    "(sql/queries.sql:8-13, operators J1/A4/O2). The 2k-row part dim is "
    "broadcast (hint explicit; at 100 TB the dim is still MBs vs TBs of fact).",
    oracle="""
        SELECT p_name AS product_name, SUM(l_quantity) AS unidades
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name
        ORDER BY unidades DESC, product_name
        LIMIT 5
    """,
    category="parity",
    bench=True,
)
def q2_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(
            F.broadcast(part), lineitem.l_partkey == part.p_partkey, "inner"
        )
        .groupBy(F.col("p_name").alias("product_name"))
        .agg(F.sum("l_quantity").alias("unidades"))
        .orderBy(F.desc("unidades"), "product_name")
        .limit(5)
    )


@register(
    "q3_top_stores",
    "Top-5 (chain, store) by units: 3-way join fact→dim→dim + agg + top-k — "
    "reference Q3 (sql/queries.sql:16-22, operators J2/A5/O3). Chained "
    "broadcast joins: no shuffle of the fact table at all.",
    oracle="""
        SELECT n_name AS chain_name, s_name AS store_name,
               SUM(l_quantity) AS unidades
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, s_name
        ORDER BY unidades DESC, chain_name, store_name
        LIMIT 5
    """,
    category="parity",
    bench=True,
)
def q3_top_stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("chain_name"),
            F.col("s_name").alias("store_name"),
        )
        .agg(F.sum("l_quantity").alias("unidades"))
        .orderBy(F.desc("unidades"), "chain_name", "store_name")
        .limit(5)
    )


@register(
    "q4_seasonality",
    "Chain × day-of-week seasonality: 3-way join + day-name agg + multi-key "
    "sort — reference Q4 (sql/queries.sql:25-32, operators A6/O4, function F2).",
    oracle="""
        SELECT n_name AS chain_name,
               dayname(l_shipdate) AS dia_semana,
               SUM(l_quantity) AS unidades
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY chain_name, dia_semana
        ORDER BY chain_name, unidades DESC, dia_semana
    """,
    category="parity",
    bench=True,
)
def q4_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("chain_name"),
            F.date_format("l_shipdate", "EEEE").alias("dia_semana"),
        )
        .agg(F.sum("l_quantity").alias("unidades"))
        .orderBy("chain_name", F.desc("unidades"), "dia_semana")
    )


@register(
    "q5_curation_filter",
    "Quality-predicate curation: keep rows where the measure is non-null, "
    "> 0 and <= 1,000,000 — the negation of the reference's delete predicate "
    "(src/job.py:225, operators P2/D3/A2) — then summarize survivors.",
    oracle="""
        SELECT event_type,
               COUNT(*) AS kept_rows,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS total_value
        FROM events
        WHERE value IS NOT NULL AND value > 0 AND value <= 1000000
        GROUP BY event_type
        ORDER BY event_type
    """,
    category="parity",
)
def q5_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_example_spark.operators.curation import quality_filter

    events = load_table(spark, sf_dir, "events")
    kept = quality_filter(events, "value")
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("kept_rows"),
            (F.sum(as_scaled_long("value")).cast("double") / 100).alias(
                "total_value"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q6_date_repair",
    "String→date schema repair: parse 'yyyy/MM/dd' strings with an explicit "
    "format — reference's ALTER COLUMN … USING daily::date (src/job.py:186, "
    "operators D1/F3; Spark's plain cast cannot parse slash dates). "
    "Round-trips o_orderdate through the dirty string format, then "
    "aggregates monthly to prove the repaired dates behave as dates.",
    oracle="""
        WITH dirty AS (
            SELECT strftime(o_orderdate, '%Y/%m/%d') AS daily, o_totalprice
            FROM orders
        ),
        repaired AS (
            SELECT CAST(strptime(daily, '%Y/%m/%d') AS DATE) AS d, o_totalprice
            FROM dirty
        )
        SELECT date_trunc('month', d) AS mes,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total_price
        FROM repaired
        GROUP BY mes
        ORDER BY mes
    """,
    category="parity",
)
def q6_date_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_example_spark.operators.curation import repair_date_column

    orders = load_table(spark, sf_dir, "orders")
    dirty = orders.select(
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("daily"),
        "o_totalprice",
    )
    repaired = repair_date_column(dirty, "daily", fmt="yyyy/MM/dd").withColumnRenamed(
        "daily", "d"
    )
    return (
        repaired.groupBy(F.date_trunc("month", "d").alias("mes"))
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(as_scaled_long("o_totalprice")).cast("double") / 100).alias(
                "total_price"
            ),
        )
        .orderBy("mes")
    )


@register(
    "q0_pricing_summary",
    "Flagship: TPC-H-Q1-shaped pricing summary — multi-aggregate scan "
    "(SUM/AVG/COUNT over derived expressions) with partial aggregation "
    "map-side; the plan is a single scan + 2-phase hash aggregate, no join. "
    "Money measures aggregate as exact scaled integers "
    "(functions/numeric.py) so results are order-independent.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS sum_base_price,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000 AS sum_disc_price,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                        * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
                    AS DOUBLE) / 1000000 AS sum_charge,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    category="parity",
    bench=True,
)
def q0_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    price_c = as_scaled_long("l_extendedprice")  # exact cents
    disc_c = 100 - as_scaled_long("l_discount")  # exact (1-d)*100
    tax_c = 100 + as_scaled_long("l_tax")  # exact (1+t)*100
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100).alias("sum_base_price"),
            (F.sum(price_c * disc_c).cast("double") / 10_000).alias(
                "sum_disc_price"
            ),
            (F.sum(price_c * disc_c * tax_c).cast("double") / 1_000_000).alias(
                "sum_charge"
            ),
            (F.sum("l_quantity").cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price_c).cast("double") / 100 / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
