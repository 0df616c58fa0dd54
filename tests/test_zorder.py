"""Z-order clustering: key correctness vs a Python reference, and the
actual data-skipping payoff measured from written parquet footer stats —
z-ordered files must bound BOTH clustered dimensions, where a 1-D sort
bounds only its own column."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_example_spark.functions.zorder import cluster_by_zorder, zvalue
from etl_example_spark.sources.loaders import load_table


def _py_zvalue(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_zvalue_matches_python_reference(spark):
    df = spark.range(200).select(
        (F.col("id") * 7 % 251).alias("x"), (F.col("id") * 13 % 241).alias("y")
    )
    rows = df.withColumn("z", zvalue(["x", "y"], bits=8)).collect()
    assert rows, "empty frame"
    for r in rows:
        assert r.z == _py_zvalue([r.x, r.y], 8), (r.x, r.y)
    # hand case: x=0b11, y=0b01 -> interleaved 0b0111
    one = spark.createDataFrame([(3, 1)], "x long, y long")
    assert one.select(zvalue(["x", "y"], 2).alias("z")).collect()[0].z == 7


def _file_ranges(path: str, col_a: str, col_b: str) -> list[tuple[int, int]]:
    """(max-min) span of each column per parquet file, from footer stats."""
    import glob

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                name = c.path_in_schema
                st = c.statistics
                if name == col_a:
                    lo_a = st.min if lo_a is None else min(lo_a, st.min)
                    hi_a = st.max if hi_a is None else max(hi_a, st.max)
                elif name == col_b:
                    lo_b = st.min if lo_b is None else min(lo_b, st.min)
                    hi_b = st.max if hi_b is None else max(hi_b, st.max)
        spans.append((hi_a - lo_a, hi_b - lo_b))
    return spans


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """The grid must match data cardinality: bits beyond a column's actual
    range are constant zeros, the interleave degenerates toward a 1-D
    sort on the other column, and that dimension's files go unbounded —
    so both columns map onto a 4-bit grid they fully occupy."""
    events = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 16).alias("ub"),
        (F.expr("unix_micros(ts) div 3600000000") % 16).alias("hb"),
        "event_id",
    )
    z_path = str(tmp_path / "z")
    cluster_by_zorder(events, ["ub", "hb"], z_path, bits=4, num_files=16)
    # baseline: 1-D sort on hb only
    s_path = str(tmp_path / "s")
    (
        events.repartitionByRange(16, "hb")
        .sortWithinPartitions("hb")
        .write.mode("overwrite")
        .parquet(s_path)
    )
    full = events.agg(
        (F.max("ub") - F.min("ub")).alias("ub_span"),
        (F.max("hb") - F.min("hb")).alias("hb_span"),
    ).collect()[0]
    z_spans = _file_ranges(z_path, "ub", "hb")
    s_spans = _file_ranges(s_path, "ub", "hb")
    z_ub = sum(a for a, _ in z_spans) / len(z_spans)
    z_hb = sum(b for _, b in z_spans) / len(z_spans)
    s_ub = sum(a for a, _ in s_spans) / len(s_spans)
    # z-order bounds BOTH dims well below their full spans...
    assert z_ub <= 0.5 * full.ub_span, (z_ub, full.ub_span)
    assert z_hb <= 0.5 * full.hb_span, (z_hb, full.hb_span)
    # ...while the hb-sorted layout leaves ub effectively unbounded
    assert s_ub >= 0.8 * full.ub_span, (s_ub, full.ub_span)
    assert z_ub < 0.6 * s_ub, (z_ub, s_ub)
    # layout changes nothing about the data itself
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(s_path).count()
        == events.count()
    )
