"""Source-format round-trips (CSV / JSON with explicit schemas) and a
global plan hygiene audit: no registered query may fall back to a
CartesianProduct (an unpartitionable all-pairs loop at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_example_spark.plans.registry import load_all
from etl_example_spark.sources.loaders import load_csv, load_json, load_table

SUBSET_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events_subset(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _events_subset(spark, sf_dir)
    path = str(tmp_path / "ev_csv")
    src.write.option("header", "true").csv(path)
    back = load_csv(spark, path, SUBSET_SCHEMA)
    assert back.schema == SUBSET_SCHEMA
    key = lambda r: (r.event_id, r.user_id, r.event_type, r.value)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, src.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = _events_subset(spark, sf_dir)
    path = str(tmp_path / "ev_json")
    src.write.json(path)
    back = load_json(spark, path, SUBSET_SCHEMA)
    assert back.schema == SUBSET_SCHEMA
    key = lambda r: (r.event_id, r.user_id, r.event_type, r.value)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, src.collect()))


def test_json_schema_projection_prunes_unknown_fields(spark, tmp_path):
    path = str(tmp_path / "extra")
    spark.createDataFrame(
        [(1, "a", "junk")], "event_id long, event_type string, noise string"
    ).write.json(path)
    narrow = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    rows = load_json(spark, path, narrow).collect()
    assert rows == [(1, "a")] or [tuple(r) for r in rows] == [(1, "a")]


def test_no_registered_query_plans_a_cartesian_product(spark, sf_dir):
    """Every batch query must avoid CartesianProduct — non-equi pair
    generation is allowed only via broadcast nested-loop (small side
    bounded), bucket joins, or candidate pre-filters."""
    for name, q in load_all().items():
        if q.category == "streaming":
            continue  # streaming plans are audited by their own tests
        df = q.spark_builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"


class TestPythonDataSources:
    def test_synthetic_reader_partition_parallel(self, spark):
        from etl_example_spark.sources.python_datasource import (
            register_python_datasources,
            synthetic_row,
        )

        register_python_datasources(spark)
        df = (
            spark.read.format("synthetic_docs")
            .option("rows", 100)
            .option("partitions", 7)
            .load()
        )
        assert df.rdd.getNumPartitions() == 7
        rows = sorted(df.collect())
        assert len(rows) == 100
        assert tuple(rows[5]) == synthetic_row(5)

    def test_manifest_jsonl_writer_round_trip(self, spark, tmp_path):
        import json
        import os

        from etl_example_spark.sources.python_datasource import (
            read_manifest,
            register_python_datasources,
        )

        register_python_datasources(spark)
        out = str(tmp_path / "sink")
        df = spark.range(50).selectExpr("id", "id * 2 AS twice")
        df.repartition(4).write.format("manifest_jsonl").mode(
            "append"
        ).option("path", out).save()

        # stray uncommitted file must be invisible to the manifest path
        with open(os.path.join(out, "part-stray.jsonl"), "w") as fh:
            fh.write('{"id": 999, "twice": 1998}\n')

        manifest, files = read_manifest(out)
        assert manifest["total_rows"] == 50
        assert len(files) == 4
        got = []
        for f in files:
            with open(f) as fh:
                got += [json.loads(line) for line in fh]
        assert sorted(r["id"] for r in got) == list(range(50))
        assert all(r["twice"] == r["id"] * 2 for r in got)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on append: files written before a column existed
    read back as NULL for it under mergeSchema — the contract that lets
    a 100 TB table gain columns without rewriting history."""
    from pyspark.sql import functions as F

    dest = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], ["id", "a"]).write.parquet(dest)
    spark.createDataFrame(
        [(2, "y", 10)], ["id", "a", "b"]
    ).write.mode("append").parquet(dest)
    merged = spark.read.option("mergeSchema", "true").parquet(dest)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].b is None and rows[2].b == 10
    # pruning still reaches the scan: selecting only `a` must not read b
    scan = merged.select("a")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in scan and "b" not in scan.split("ReadSchema")[1][:60]


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC read/write parity with parquet, including filter pushdown
    reaching the ORC scan (same PushedFilters contract)."""
    from pyspark.sql import functions as F

    from etl_example_spark.sources.loaders import load_orc, load_table

    dest = str(tmp_path / "orders_orc")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.orc(dest)
    back = load_orc(spark, dest)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    filtered = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan
