"""functions/rank.py — exact two-pass global rank/ntile vs the
single-partition window it replaces.

The primitive exists so that exact global order statistics (rank,
running totals, NTILE) never funnel corpus-sized input through the one
task that `Window.orderBy` without a partition spec requires. These
tests pin (a) bit-exact agreement with the window semantics, including
NULL ordering and fewer-rows-than-buckets NTILE edges, and (b) the
property the design depends on: the partition id is a pure function of
the row's key, so the count pass and the local-rank pass agree even
when Catalyst materializes their subtrees independently — exchange
reuse OFF is the adversarial configuration that broke the previous
spark_partition_id()-based design (column pruning de-duplicated the
range exchanges, each resampled boundaries, NTILE(10) returned 11
buckets).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_example_spark.functions.rank import Ord, global_ntile, global_row_number


@pytest.fixture(scope="module")
def skewed(spark):
    # skewed modulus + unique tie-break, deliberately unsorted; a NULL
    # stripe exercises the nulls-last ordering path end to end
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 13 != 0, F.xxhash64("id") % 97).alias("v"),
        F.col("id"),
    )


ORDER = [Ord("v", asc=False, nulls_last=True), Ord("id")]


def _window_order():
    return [F.desc_nulls_last("v"), F.asc("id")]


def test_global_row_number_matches_window(skewed):
    got = global_row_number(
        skewed, ORDER, out="r",
        running_sum_col=F.coalesce("v", F.lit(0)),
        running_sum_out="rs", total_out="tot",
    )
    w = Window.orderBy(*_window_order())
    exp = skewed.select(
        "*",
        F.row_number().over(w).alias("r"),
        F.sum(F.coalesce("v", F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("rs"),
    )
    assert {tuple(x) for x in got.select("v", "id", "r", "rs").collect()} == {
        tuple(x) for x in exp.collect()
    }
    assert got.select("tot").distinct().collect()[0][0] == 20000


@pytest.mark.parametrize("nb", [4, 7, 10])
def test_global_ntile_matches_window(skewed, nb):
    got = global_ntile(skewed, ORDER, nb, out="b")
    exp = skewed.select(
        "*", F.ntile(nb).over(Window.orderBy(*_window_order())).alias("b")
    )
    assert {tuple(x) for x in got.select("v", "id", "b").collect()} == {
        tuple(x) for x in exp.collect()
    }


def test_global_ntile_fewer_rows_than_buckets(spark):
    tiny = spark.range(0, 3)
    got = global_ntile(tiny, [Ord("id")], 10, out="b")
    assert sorted(tuple(x) for x in got.collect()) == [(0, 1), (1, 2), (2, 3)]


def test_exact_with_exchange_reuse_disabled(spark, skewed):
    """The adversarial configuration: every fork of the lineage
    materializes its own subtree (no ReuseExchange, no AQE stage reuse).
    A partition id derived from execution state (repartitionByRange +
    spark_partition_id) gives WRONG offsets here, because each branch's
    range exchange samples boundaries with a different rdd.id seed. The
    deterministic in-row pid must stay exact."""
    prev_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = global_row_number(skewed, ORDER, out="r", total_out="tot")
        rows = got.select("r").collect()
        ranks = sorted(x[0] for x in rows)
        assert ranks == list(range(1, 20001))
    finally:
        spark.conf.set("spark.sql.exchange.reuse", prev_reuse)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_pid_spreads_rows_across_partitions(skewed):
    """The point of the primitive: no corpus-sized single task. With
    default partitioning the deterministic boundaries must spread the
    20k rows over many pids, the largest holding a small fraction —
    checked for BOTH boundary paths (the lazy in-plan subquery and the
    eager driver-side artifact)."""
    from etl_example_spark.functions.rank import (
        _PID,
        _boundaries_column,
        _BNDS,
        _deterministic_boundaries,
        _pid_column,
        _pid_from_bounds,
    )

    bounds = _deterministic_boundaries(skewed, ORDER, 8)
    assert len(bounds) >= 4
    in_plan = (
        skewed.withColumn(_BNDS, _boundaries_column(skewed, ORDER, 8))
        .withColumn(_PID, _pid_from_bounds(ORDER, F.col(_BNDS)))
        .drop(_BNDS)
    )
    artifact = skewed.withColumn(_PID, _pid_column(skewed, ORDER, bounds))
    for ranged in (in_plan, artifact):
        dist = ranged.groupBy(_PID).count().collect()
        assert len(dist) >= 4
        assert max(r["count"] for r in dist) < 20000 * 0.6


def test_no_unbounded_single_partition_window(skewed):
    """The only SinglePartition exchange in the primitive's plan feeds
    the bounded offsets window (HashAggregate keyed on __gr_pid) or the
    one-row total aggregate — bounded input by construction."""
    got = global_row_number(skewed, ORDER, out="r")
    plan = got._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = " ".join(lines[i + 1 : i + 4])
            assert "__gr_pid" in below, below


def test_requires_ord_specs(skewed):
    with pytest.raises(TypeError):
        global_row_number(skewed, [F.desc("v")], out="r")


def test_build_and_explain_launch_no_jobs(spark, skewed):
    """The cost-placement contract: constructing / EXPLAINing a rank
    plan must launch ZERO Spark jobs — the boundary sample is a scalar
    subquery executed at the first action, not a driver-side collect at
    plan build (plan audits and registry lints build every registered
    query; a build-time job would make printing a plan cost a corpus
    pass). Job counts come from the status tracker, the same signal the
    driver's audits see."""
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup() or [])

    before = n_jobs()
    g = global_row_number(
        skewed, ORDER, out="r",
        running_sum_col=F.coalesce("v", F.lit(0)),
        running_sum_out="rs", total_out="tot",
    )
    nt = global_ntile(skewed, ORDER, 10, out="b")
    _ = g._jdf.queryExecution().executedPlan().toString()
    _ = nt._jdf.queryExecution().executedPlan().toString()
    assert n_jobs() == before, "building/explaining a rank plan ran a job"
    assert g.count() == 20000  # ...and the plan still executes


def test_boundaries_artifact_matches_in_plan(skewed):
    """The stored-stats contract: a precomputed ``boundaries=`` artifact
    (the _deterministic_boundaries output) must produce the identical
    rank column as the default in-plan sampling subquery."""
    from etl_example_spark.functions.rank import _deterministic_boundaries

    bounds = _deterministic_boundaries(skewed, ORDER, 8)
    got = global_row_number(skewed, ORDER, out="r", boundaries=bounds)
    exp = global_row_number(skewed, ORDER, out="r")
    assert {tuple(x) for x in got.collect()} == {
        tuple(x) for x in exp.collect()
    }


def test_unsorted_duplicated_boundaries_normalized(skewed):
    """A caller-supplied ``boundaries=`` artifact is normalized (sorted
    under the order spec, deduplicated) before it feeds the unrolled
    binary search — an unsorted or duplicate-bearing artifact must
    produce the same exact ranks as the canonical one, not silently
    wrong pids."""
    from etl_example_spark.functions.rank import _deterministic_boundaries

    bounds = _deterministic_boundaries(skewed, ORDER, 8)
    assert len(bounds) >= 3
    mangled = list(reversed(bounds)) + [bounds[0], bounds[-1]]
    got = global_row_number(skewed, ORDER, out="r", boundaries=mangled)
    exp = global_row_number(skewed, ORDER, out="r", boundaries=bounds)
    assert {tuple(x) for x in got.collect()} == {
        tuple(x) for x in exp.collect()
    }


def test_release_rank_caches(spark, skewed):
    """materialize='cache' intermediates are registered for explicit
    reclamation: release_rank_caches() unpersists every tracked entry
    and empties the registry; a second call is a no-op."""
    from etl_example_spark.functions.rank import (
        _CACHE_REGISTRY,
        release_rank_caches,
    )

    release_rank_caches()  # drain entries left by earlier tests
    got = global_row_number(skewed, ORDER, out="r", materialize="cache")
    assert got.count() == 20000
    assert len(_CACHE_REGISTRY) == 1
    assert release_rank_caches() == 1
    assert not _CACHE_REGISTRY
    assert release_rank_caches() == 0
    # the released frame still recomputes correctly (pure-key pid)
    assert got.count() == 20000


@pytest.mark.parametrize("mode", ["cache", "none", "local_checkpoint"])
def test_materialize_modes_agree(skewed, mode):
    """Every materialization strategy yields the same ranks — the pid
    is a pure key function, so correctness never depends on whether or
    how the intermediate is pinned."""
    got = global_row_number(skewed, ORDER, out="r", materialize=mode)
    ranks = sorted(x[0] for x in got.select("r").collect())
    assert ranks == list(range(1, 20001))


def test_materialize_reliable_checkpoint(spark, skewed, tmp_path):
    """The cluster-durability opt-in: reliable checkpoint to the
    configured directory — same ranks, blocks survive executor loss."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    got = global_row_number(
        skewed, ORDER, out="r", materialize="checkpoint"
    )
    ranks = sorted(x[0] for x in got.select("r").collect())
    assert ranks == list(range(1, 20001))


def test_materialize_rejects_unknown_mode(skewed):
    with pytest.raises(ValueError):
        global_row_number(skewed, ORDER, out="r", materialize="bogus")
