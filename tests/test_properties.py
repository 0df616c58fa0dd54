"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the reference's informal correctness story
(SURVEY §5) hardened into laws.

Sessions are expensive, so strategies stay small and deterministic
(fixed seeds via hypothesis derandomization in CI-like runs)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_example_spark.functions.numeric import as_scaled_long
from etl_example_spark.operators.curation import (
    quality_filter,
    quality_predicate,
    repair_date_column,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

quantities = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(10**7), max_value=10**7)),
    min_size=1,
    max_size=50,
)


@given(qs=quantities)
@SETTINGS
def test_quality_filter_partitions_rows(spark, qs):
    """filter(pred) and filter(~pred) partition the table exactly."""
    df = spark.createDataFrame([(q,) for q in qs], "quantity int")
    kept = quality_filter(df, "quantity").count()
    dropped = df.filter(quality_predicate("quantity")).count()
    assert kept + dropped == len(qs)
    # and the kept side satisfies the reference's keep-contract
    for r in quality_filter(df, "quantity").collect():
        assert r.quantity is not None and 0 < r.quantity <= 1_000_000


@given(
    dates=st.lists(
        st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_date_repair_roundtrip(spark, dates):
    """Any yyyy/MM/dd string parses back to the original date."""
    rows = [(d.strftime("%Y/%m/%d"),) for d in dates]
    df = repair_date_column(
        spark.createDataFrame(rows, "daily string"), "daily"
    )
    assert [r.daily for r in df.collect()] == list(dates)
    assert dict(df.dtypes)["daily"] == "date"


@given(
    vals=st.lists(
        st.decimals(
            min_value=-(10**6), max_value=10**6, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@SETTINGS
def test_exact_sum_is_order_independent(spark, vals, seed):
    """The scaled-integer sum gives the same answer for any row order and
    any partitioning — the invariant naive double sums break."""
    import random

    rows = [(float(v),) for v in vals]
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)

    def total(rs, parts):
        df = spark.createDataFrame(rs, "x double").repartition(parts)
        return df.agg(
            (F.sum(as_scaled_long("x")).cast("double") / 100).alias("s")
        ).collect()[0].s

    assert total(rows, 1) == total(shuffled, 7)
