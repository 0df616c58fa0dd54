"""Round-14 measurement: VALUES-rendered array literals vs a single
from_json string literal, at the s60 codebook sizes.

Measures (driver-side, per guide §1):
  1. wall time of local_df construction + .collect() (zero-job path)
     for the current VALUES form vs a from_json form,
  2. whether the from_json form still optimizes to a LocalRelation
     (zero-job collect, task-free broadcast build),
  3. bit-exactness of the round trip (doubles via repr, NaN/Inf, NULLs).

Run: python tools/opt_r14_localjson.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_example_spark.functions.localrel import local_df
from etl_example_spark.session import get_spark


def fj_df(spark, rows, schema):
    """from_json variant: each array cell rendered as ONE json string."""
    from etl_example_spark.functions.localrel import _split_top

    cols = []
    for field in _split_top(schema):
        name, typ = field.strip().split(None, 1)
        cols.append((name, typ.strip()))
    rendered = []
    for row in rows:
        cells = []
        for v, (_, typ) in zip(row, cols):
            if isinstance(v, (list, tuple)):
                s = json.dumps(v).replace("\\", "\\\\").replace("'", "\\'")
                cells.append(f"from_json('{s}', '{typ}')")
            elif isinstance(v, float):
                cells.append(f"CAST('{v!r}' AS {typ})")
            else:
                cells.append(f"CAST({v} AS {typ})")
        rendered.append("(" + ", ".join(cells) + ")")
    names = ", ".join(n for n, _ in cols)
    sel = ", ".join(
        f"{c.split('(')[0] and ''}" for c in []
    )
    # SELECT from VALUES of the rendered expressions directly
    return spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(rendered)
        + f" AS t({names})"
    )


def main() -> None:
    spark = get_spark(app_name="opt_r14_localjson", shuffle_partitions=4)
    sc = spark.sparkContext

    import random

    rng = random.Random(60)
    m, n_codes, sub_d = 16, 32, 4
    rows = [
        (j, [[rng.random() for _ in range(sub_d)] for _ in range(n_codes)])
        for j in range(m)
    ]
    schema = "j int, cvs array<array<double>>"

    # correctness first: same rows?
    a = local_df(spark, rows, schema).collect()
    b = fj_df(spark, rows, schema).collect()
    assert a == b, "row mismatch"
    # NaN / Inf / NULL corners through from_json
    corner = [
        (0, [[float("nan"), float("inf"), float("-inf")], None, [1.0, None]]),
    ]
    ca = local_df(spark, corner, schema).collect()
    cb = fj_df(spark, corner, schema).collect()

    def canon(rows):
        out = []
        for r in rows:
            vs = []
            for arr in r[1] or []:
                vs.append(
                    None
                    if arr is None
                    else [
                        None
                        if x is None
                        else ("nan" if math.isnan(x) else repr(x))
                        for x in arr
                    ]
                )
            out.append((r[0], vs))
        return out

    print("corner VALUES   :", canon(ca))
    print("corner from_json:", canon(cb))
    print("corner match:", canon(ca) == canon(cb))

    # does the from_json form stay a LocalRelation after optimization?
    dfb = fj_df(spark, rows, schema)
    opt = dfb._jdf.queryExecution().optimizedPlan()
    print("from_json optimized node:", opt.getClass().getSimpleName())

    # zero-job collect?
    before = sc.statusTracker().getJobIdsForGroup(None)
    n0 = len(before) if before else 0
    fj_df(spark, rows, schema).collect()
    after = sc.statusTracker().getJobIdsForGroup(None)
    n1 = len(after) if after else 0
    print("jobs for from_json collect:", n1 - n0)

    # timing: construction + analysis + collect, interleaved A/B
    def t_values():
        t0 = time.perf_counter()
        local_df(spark, rows, schema).collect()
        return time.perf_counter() - t0

    def t_json():
        t0 = time.perf_counter()
        fj_df(spark, rows, schema).collect()
        return time.perf_counter() - t0

    va, ja = [], []
    for _ in range(3):  # warm both
        t_values(), t_json()
    for _ in range(9):
        va.append(t_values())
        ja.append(t_json())
    va.sort(), ja.sort()
    print(f"VALUES  median {va[4]*1000:.1f} ms  (min {va[0]*1000:.1f})")
    print(f"fromjson median {ja[4]*1000:.1f} ms  (min {ja[0]*1000:.1f})")

    # also the ivf_assign pack size: 1 row, 16 x 64 doubles
    rows2 = [
        (
            [[rng.random() for _ in range(64)] for _ in range(16)],
            list(range(16)),
        )
    ]
    schema2 = "cvs array<array<double>>, cds array<bigint>"
    a2 = local_df(spark, rows2, schema2).collect()
    b2 = fj_df(spark, rows2, schema2).collect()
    print("pack row match:", a2 == b2)
    va2, ja2 = [], []
    for _ in range(9):
        t0 = time.perf_counter()
        local_df(spark, rows2, schema2).collect()
        va2.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fj_df(spark, rows2, schema2).collect()
        ja2.append(time.perf_counter() - t0)
    va2.sort(), ja2.sort()
    print(f"pack VALUES  median {va2[4]*1000:.1f} ms")
    print(f"pack fromjson median {ja2[4]*1000:.1f} ms")

    spark.stop()


if __name__ == "__main__":
    main()
