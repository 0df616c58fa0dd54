"""Temporal join semantics on hand-built fixtures: the <=-tie rule of the
as-of join, null behavior with no prior right row, and bin-expansion
equivalence to the naive range join under awkward widths/alignments."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_example_spark.operators.temporal import as_of_join, binned_range_join


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 5, 1, 12, minute, second)


def test_as_of_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (1, _ts(5)), (2, _ts(30))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(15), "b"), (3, _ts(0), "z")],
        "user_id long, rts timestamp, tag string",
    )
    out = {
        (r.user_id, r.ts): r.tag
        for r in as_of_join(
            left, right, key="user_id", left_ts="ts", right_ts="rts",
            payload_cols=["tag"],
        ).collect()
    }
    assert out[(1, _ts(10))] == "a"  # equal timestamp counts (<=)
    assert out[(1, _ts(20))] == "b"  # latest prior wins
    assert out[(1, _ts(5))] is None  # nothing at-or-before
    assert out[(2, _ts(30))] is None  # key never on the right


def test_as_of_join_payload_is_atomic(spark):
    """If the newest right row has NULL in one payload column, that NULL
    carries as-is — it must NOT backfill from an older right row (a
    mixed-row payload no true ASOF join produces)."""
    left = spark.createDataFrame([(1, _ts(30))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), "old_a", "old_b"), (1, _ts(20), "new_a", None)],
        "user_id long, rts timestamp, a string, b string",
    )
    row = as_of_join(
        left, right, key="user_id", left_ts="ts", right_ts="rts",
        payload_cols=["a", "b"],
    ).collect()[0]
    assert row.a == "new_a"
    assert row.b is None  # from the same (newest) right row — not "old_b"


def test_binned_range_join_equals_naive(spark, sf_dir):
    """For misaligned widths/bins, binning must reproduce the naive
    non-equi join exactly (the exact predicate prunes over-coverage)."""
    from etl_example_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    width = 100_000  # ~1.16 days — deliberately not bin-aligned
    binned = binned_range_join(
        orders, events,
        key_left="o_custkey", key_right="user_id",
        left_ts="o_orderdate", right_ts="ts",
        width_seconds=width, bin_seconds=86_400,
    )
    naive = (
        orders.join(events, orders.o_custkey == events.user_id)
        .filter(
            (F.col("ts") >= F.col("o_orderdate"))
            & (
                F.unix_micros(F.col("ts").cast("timestamp"))
                < F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                + width * 1_000_000
            )
        )
    )
    key = lambda r: (r.o_orderkey, r.event_id)  # noqa: E731
    assert sorted(key(r) for r in binned.collect()) == sorted(
        key(r) for r in naive.collect()
    )


class TestResampleDailyFfill:
    def test_gaps_filled_with_locf(self, spark):
        from etl_example_spark.operators.temporal import resample_daily_ffill

        events = spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", 1.50),
                (1, "2024-01-01 11:00:00", 2.50),
                # Jan 2-3 silent
                (1, "2024-01-04 09:00:00", 10.00),
                (2, "2024-01-02 00:00:00", 5.00),
            ],
            "user_id long, ts string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = {
            (r.user_id, str(r.d)[:10]): (r.n_events, r.filled_value)
            for r in resample_daily_ffill(
                events, "user_id", "ts", "value"
            ).collect()
        }
        assert rows[(1, "2024-01-01")] == (2, 4.0)
        assert rows[(1, "2024-01-02")] == (0, 4.0)  # gap, carried
        assert rows[(1, "2024-01-03")] == (0, 4.0)
        assert rows[(1, "2024-01-04")] == (1, 10.0)
        assert rows[(2, "2024-01-02")] == (1, 5.0)
        assert len(rows) == 5  # span is per-user, not global


class TestIntervalOverlapJoin:
    def test_matches_nested_loop_with_boundaries(self, spark):
        """Anchor-bin dedup yields exactly the nested-loop pair set,
        including half-open boundary cases (touching intervals do NOT
        overlap) and intervals spanning many bins."""
        import datetime as dtm

        from etl_example_spark.operators.temporal import (
            interval_overlap_join,
        )

        base = dtm.datetime(2024, 1, 1)

        def t(s):
            return base + dtm.timedelta(seconds=s)

        lrows = [
            (1, 1, t(0), t(10)),     # overlaps r1, touches r2 (no)
            (2, 1, t(25), t(100)),   # long: spans many bins, hits r3 once
            (3, 2, t(0), t(50)),     # other key
        ]
        rrows = [
            (10, 1, t(5), t(7)),     # inside l1
            (11, 1, t(10), t(20)),   # touches l1 at 10 -> NOT overlap
            (12, 1, t(30), t(90)),   # long overlap with l2
            (13, 2, t(49), t(60)),   # 1s overlap with l3
        ]
        ldf = spark.createDataFrame(
            lrows, "lid int, lk int, ls timestamp, le timestamp"
        )
        rdf = spark.createDataFrame(
            rrows, "rid int, rk int, rs timestamp, re timestamp"
        )
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                ldf, rdf, "lk", "rk", "ls", "le", "rs", "re",
                bin_seconds=4,
            ).collect()
        )
        expect = sorted(
            (lid, rid)
            for lid, lk, ls, le in lrows
            for rid, rk, rs, re in rrows
            if lk == rk and ls < re and rs < le
        )
        assert got == expect == [(1, 10), (2, 12), (3, 13)]
