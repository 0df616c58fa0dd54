"""Physical-layout audits for the write path: partition pruning must reach
the scan, and identically-bucketed joins must plan with zero exchanges.
These are the layout guarantees the 100 TB design leans on — asserted on
the actual physical plan, not assumed."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from etl_example_spark.sources.loaders import load_table
from etl_example_spark.sources.writers import (
    write_bucketed_table,
    write_partitioned,
)


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    lineitem = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_part")
    write_partitioned(lineitem, path, ["l_returnflag"])

    back = spark.read.parquet(path)
    # partition column round-trips; data round-trips
    assert back.count() == lineitem.count()

    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = pruned.queryExecution if False else _plan(pruned)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "filter on the partition key must prune directories"
    assert pruned.count() == lineitem.filter(F.col("l_returnflag") == "R").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "t_orders_b", ["o_orderkey"], num_buckets=8,
        sort_by=["o_orderkey"],
    )
    write_bucketed_table(
        lineitem, "t_lineitem_b", ["l_orderkey"], num_buckets=8,
        sort_by=["l_orderkey"],
    )
    with _conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        joined = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "identically-bucketed tables must join without a shuffle:\n" + plan
        )
        # and the result is still correct
        assert joined.count() == lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()


def test_bucket_pruning_single_key_lookup(spark, sf_dir):
    """Point lookups on the bucket key scan only the matching bucket."""
    if not spark.catalog.tableExists("t_orders_b"):
        write_bucketed_table(
            load_table(spark, sf_dir, "orders"),
            "t_orders_b",
            ["o_orderkey"],
            num_buckets=8,
        )
    # a lone scan has no operator that benefits, so the planner turns the
    # bucketed read off by default — force it on to audit the pruning
    with _conf(
        spark,
        **{"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"},
    ):
        df = spark.table("t_orders_b").filter(F.col("o_orderkey") == 1)
        plan = _plan(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC is the second columnar format Spark ships natively — schema
    and values must round-trip (zstd, same as the parquet path)."""
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    assert back.schema == nation.schema
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(
        map(key, nation.collect())
    )


def test_dynamic_partition_overwrite_replaces_only_touched(
    spark, sf_dir, tmp_path
):
    """Dynamic partitionOverwriteMode: an overwrite write replaces ONLY
    the partitions present in the incoming data — the incremental
    reprocess pattern (re-run one ingest day without clobbering the
    table). Static mode (the default) would truncate everything."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_dyn")
    orders.write.mode("overwrite").partitionBy("yr").parquet(path)
    total = orders.count()
    one_year = orders.filter(F.col("yr") == 1995)
    n_1995 = one_year.count()
    assert 0 < n_1995 < total
    # rewrite JUST 1995 with doubled rows, dynamic mode
    with _conf(
        spark, **{"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        one_year.unionByName(one_year).write.mode("overwrite").partitionBy(
            "yr"
        ).parquet(path)
    back = spark.read.parquet(path)
    assert back.filter(F.col("yr") == 1995).count() == 2 * n_1995
    # every other partition is untouched
    assert back.filter(F.col("yr") != 1995).count() == total - n_1995


def test_observation_metrics(spark, sf_dir):
    """df.observe: pipeline instrumentation riding the action itself —
    metrics come from the same pass as the result, no second scan."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    n_rows = observed.count()
    assert obs.get["n"] == n_rows
    expect_cents = orders.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert obs.get["cents"] == expect_cents


class TestCompaction:
    def test_compacts_small_files_preserving_rows(self, spark, tmp_path):
        from etl_example_spark.sources.writers import compact_small_files

        path = str(tmp_path / "landing")
        df = spark.range(10_000).selectExpr(
            "id", "id % 7 AS k", "repeat('x', 50) AS pad"
        )
        # simulate a streaming landing zone: many tiny files
        df.repartition(64).write.parquet(path)
        before = spark.read.parquet(path)
        before_rows = before.count()
        before_sum = before.agg({"id": "sum"}).collect()[0][0]

        stats = compact_small_files(
            spark, path, target_file_bytes=10 * 1024 * 1024
        )
        assert stats["files_before"] == 64
        assert stats["files_after"] == 1  # well under one target file

        after = spark.read.parquet(path)
        assert after.count() == before_rows
        assert after.agg({"id": "sum"}).collect()[0][0] == before_sum

    def test_swap_is_repoint_with_retention(self, spark, tmp_path):
        """Write-new-then-repoint: after compaction `path` is a symlink
        to a fresh versioned dir, the replaced generation stays on disk
        for draining readers, and a SECOND compaction is a pure atomic
        repoint that sweeps only generations older than the one it just
        replaced."""
        import os

        from etl_example_spark.sources.writers import compact_small_files

        path = str(tmp_path / "landing")
        spark.range(2_000).repartition(16).write.parquet(path)

        s1 = compact_small_files(spark, path, target_file_bytes=1 << 30)
        assert os.path.islink(path)
        assert os.path.realpath(path) == s1["data_dir"]
        # old generation retained: a reader holding the old file listing
        # still sees every row
        retired = [
            d
            for d in os.listdir(tmp_path)
            if d.startswith("landing.compact.retired.")
        ]
        assert len(retired) == 1
        assert (
            spark.read.parquet(str(tmp_path / retired[0])).count() == 2_000
        )

        gen1 = s1["data_dir"]
        s2 = compact_small_files(spark, path, target_file_bytes=1 << 30)
        assert os.path.realpath(path) == s2["data_dir"] != gen1
        assert os.path.isdir(gen1)  # just-replaced generation retained
        # the original plain-dir generation (two back) is swept
        assert not any(
            d.startswith("landing.compact.retired.")
            for d in os.listdir(tmp_path)
        )
        assert spark.read.parquet(path).count() == 2_000

    def test_pointer_publish_mode_without_symlinks(
        self, spark, tmp_path, monkeypatch
    ):
        """publish='pointer' — the object-store-portable swap: a
        _CURRENT pointer file names the live generation and is
        republished by atomic rename. Must work end-to-end with
        symlink creation DISABLED (the filesystems this mode exists
        for), retain the prior generation, and sweep older ones."""
        import os

        from etl_example_spark.sources.writers import (
            compact_small_files,
            resolve_dataset_path,
        )

        def no_symlink(*a, **k):
            raise OSError("symlinks unavailable on this filesystem")

        monkeypatch.setattr(os, "symlink", no_symlink)

        path = str(tmp_path / "landing")
        spark.range(2_000).repartition(16).write.parquet(path)

        s1 = compact_small_files(
            spark, path, target_file_bytes=1 << 30, publish="pointer"
        )
        pointer = str(tmp_path / "landing._CURRENT")
        assert os.path.isfile(pointer)
        assert not os.path.islink(path)  # original dir never renamed
        assert resolve_dataset_path(path) == s1["data_dir"]
        assert s1["files_after"] == 1
        # readers resolve through the pointer to the compacted copy
        assert (
            spark.read.parquet(resolve_dataset_path(path)).count() == 2_000
        )
        # prior generation (the original dir) still serves old listings
        assert spark.read.parquet(path).count() == 2_000

        gen1 = s1["data_dir"]
        s2 = compact_small_files(
            spark, path, target_file_bytes=1 << 30, publish="pointer"
        )
        assert resolve_dataset_path(path) == s2["data_dir"] != gen1
        assert os.path.isdir(gen1)  # just-replaced generation retained
        s3 = compact_small_files(
            spark, path, target_file_bytes=1 << 30, publish="pointer"
        )
        assert resolve_dataset_path(path) == s3["data_dir"]
        assert os.path.isdir(s2["data_dir"])  # prior kept
        assert not os.path.isdir(gen1)  # two-back generation swept
        assert (
            spark.read.parquet(resolve_dataset_path(path)).count() == 2_000
        )

    def test_partitioned_compaction_keeps_layout(self, spark, tmp_path):
        import os

        from etl_example_spark.sources.writers import compact_small_files

        path = str(tmp_path / "part")
        df = spark.range(5_000).selectExpr("id", "id % 3 AS k")
        df.repartition(32).write.partitionBy("k").parquet(path)
        stats = compact_small_files(
            spark, path, target_file_bytes=10 * 1024 * 1024, partition_col="k"
        )
        assert stats["files_after"] < stats["files_before"]
        # hive-style partition dirs survive the rewrite
        assert sorted(
            d for d in os.listdir(path) if d.startswith("k=")
        ) == ["k=0", "k=1", "k=2"]
        assert spark.read.parquet(path).count() == 5_000


class TestCatalogBackup:
    def test_backup_restore_round_trip(self, spark, sf_dir, tmp_path):
        """Whole-catalog snapshot + restore (reference sql/backup.sh
        parity): every table round-trips with identical rows, the
        manifest records counts/schemas, and restore re-registers
        views."""
        import json
        import os

        from etl_example_spark.sources.loaders import load_table
        from etl_example_spark.sources.writers import (
            backup_catalog,
            restore_catalog,
        )

        tables = {
            name: load_table(spark, sf_dir, name)
            for name in ("region", "nation", "supplier")
        }
        dest = str(tmp_path / "backups")
        backup_dir = backup_catalog(
            spark, dest, tables=tables, label="t0"
        )
        assert os.path.basename(backup_dir) == "backup_t0"
        manifest = json.load(
            open(os.path.join(backup_dir, "_MANIFEST.json"))
        )
        assert set(manifest) == set(tables)

        restored = restore_catalog(spark, backup_dir)
        for name, df in tables.items():
            assert manifest[name]["rows"] == df.count()
            assert sorted(map(tuple, restored[name].collect())) == sorted(
                map(tuple, df.collect())
            )
            # restore registers the view under the table's name
            assert spark.table(name).count() == df.count()

    def test_restore_rejects_damaged_snapshot(self, spark, sf_dir, tmp_path):
        import os

        from etl_example_spark.sources.loaders import load_table
        from etl_example_spark.sources.writers import (
            backup_catalog,
            restore_catalog,
        )

        import pytest

        backup_dir = backup_catalog(
            spark,
            str(tmp_path),
            tables={"region": load_table(spark, sf_dir, "region")},
            label="dmg",
        )
        # truncate the snapshot's table data behind the manifest's back
        region = load_table(spark, sf_dir, "region")
        region.limit(2).write.mode("overwrite").parquet(
            os.path.join(backup_dir, "region")
        )
        with pytest.raises(ValueError, match="damaged"):
            restore_catalog(spark, backup_dir)


class TestPartitionPruning:
    def test_partition_filter_prunes_scan(self, spark, sf_dir, tmp_path):
        """Date-partitioned layout + partition-pruned scan: the filter on
        the partition column becomes a PartitionFilter (directory-level
        pruning, zero data read outside the month) rather than a row
        filter — the layout decision that matters most at 100 TB."""
        import re

        from pyspark.sql import functions as F

        from etl_example_spark.sources.loaders import load_table

        path = str(tmp_path / "lineitem_by_month")
        li = load_table(spark, sf_dir, "lineitem").withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        )
        li.write.partitionBy("ship_month").parquet(path)

        df = (
            spark.read.parquet(path)
            .filter(F.col("ship_month") == "1996-03")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("s"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "ship_month" in m.group(1), plan[:800]
        # row-level PushedFilters must NOT carry the partition predicate
        # (it is resolved at planning, against the file index)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert pf is None or "ship_month" not in pf.group(1)

        expected = (
            load_table(spark, sf_dir, "lineitem")
            .filter(F.date_format("l_shipdate", "yyyy-MM") == "1996-03")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("s"))
            .collect()[0]
            .s
        )
        assert df.collect()[0].s == expected


class TestSchemaEvolution:
    def test_merge_schema_on_read(self, spark, tmp_path):
        """Schema evolution at the file level: a later batch adds a
        column; mergeSchema=true reads the union schema with NULLs for
        the pre-evolution files — the append-only evolution path a
        landing zone relies on."""
        path = str(tmp_path / "evolving")
        spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(
            path, mode="append"
        )
        spark.range(5, 10).selectExpr(
            "id", "id * 2 AS a", "'new' AS b"
        ).write.parquet(path, mode="append")

        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"id", "a", "b"}
        rows = {r.id: (r.a, r.b) for r in merged.collect()}
        assert rows[2] == (4, None)  # old file: evolved column is NULL
        assert rows[7] == (14, "new")
        assert len(rows) == 10
