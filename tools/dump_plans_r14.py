"""Dump .explain('formatted') for the round-14 touched queries.

Usage: python tools/dump_plans_r14.py OUTDIR SUFFIX [names...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_example_spark.plans.registry import load_all
from etl_example_spark.session import get_spark

DEFAULT = [
    "s60_ivfpq_residual_topk", "s47_ivf_append", "s49_sq8_topk",
    "s53_bm25_index_serve", "s31_cosine_topk", "s62_ivfpq_residual_append",
    "s48_pq_append", "d83_bigram_logprob_quality", "d53_curation_pipeline",
    "d97_web_curation_v2", "g05_connected_components",
    "d106_perceptron_train",
]


def main() -> None:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plans_r14", shuffle_partitions=8)
    registry = load_all()
    for n in names:
        df = registry[n].spark_builder(spark, "/root/testdata/sf0.1")
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (outdir / f"{n}_{suffix}.txt").write_text(txt)
        print(n, "->", f"{n}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
