"""Round-14: decompose s60's warm wall into py4j-visible phases.

cProfile the warm run; py4j blocking reads under each DataFrame method
attribute driver+cluster time to the Python call that triggered it.

Run: python tools/opt_r14_s60_decomp.py
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_example_spark.plans.registry import load_all
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import warm_tables


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="opt_r14_s60", shuffle_partitions=8)
    warm_tables(spark, sf_dir, partitions=8)
    q = load_all()["s60_ivfpq_residual_topk"]

    def once():
        df = q.spark_builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    once()
    once()  # double warm-up
    t0 = time.perf_counter()
    once()
    print(f"warm wall: {time.perf_counter() - t0:.3f}s")

    pr = cProfile.Profile()
    pr.enable()
    once()
    pr.disable()
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative").print_stats(45)
    print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
