"""Round-13 optimization harness: per-query timing + plan capture.

Reproduces bench.py's methodology exactly (warm_tables, double warm-up,
median of 5 noop-sink runs, shuffle_partitions as bench sets them) for a
NAMED subset of registry queries, so a change's effect can be measured
solo without paying a full 34-query sweep. Optionally dumps
``explain("formatted")`` to plans/r13/<query>_<tag>.txt — the judge-facing
before/after plan evidence.

Usage:
    python tools/opt_r13_measure.py [--plans TAG] [--runs N] q1 q2 ...
    python tools/opt_r13_measure.py --plans before s60_ivfpq_residual_topk
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_example_spark.plans.registry import load_all
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import warm_tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dump plans with tag")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--warmups", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="opt_r13_measure", shuffle_partitions=8)
    warm_tables(spark, sf_dir, partitions=8)

    registry = load_all()
    out: dict[str, float] = {}
    for name in args.names:
        q = registry[name]
        spark.sparkContext.setJobDescription(name)

        def once() -> float:
            t0 = time.perf_counter()
            df = q.spark_builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        for _ in range(args.warmups):
            once()
        times = sorted(once() for _ in range(args.runs))
        out[name] = round(times[args.runs // 2], 4)
        if args.plans:
            plan_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = q.spark_builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{args.plans}.txt").write_text(txt)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
