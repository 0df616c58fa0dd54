"""Flooded-corpus proof for the line-dedup aggregate rewrite.

The hot-line-skew hard case for d62: ONE identical 10-token boilerplate
line (cookie-banner style) prepended to >= 50% of documents of the x8
replicated corpus (SCALING.md's standard replication: copies append two
unique tokens). Under the old ``row_number`` window formulation every
copy of that line landed in a single task — the straggler this measures
the absence of. The aggregate formulation partial-aggregates the hot
line map-side (one pre-shuffle row per upstream task), so flooded and
unflooded walls should be indistinguishable.

Prints per corpus: wall (noop-sink full execution — a bare count() lets
Catalyst eliminate the reassembly join and would under-measure), the
aggregate strategy extracted from the AQE final physical plan, and the
flooded line's copy count.

Run from the repo root: ``python tools/scale_flooded_line_dedup.py [N]``.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.dedup import line_dedup  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

#: exactly 10 tokens -> one derived line, identical in every flooded doc
BOILERPLATE = (
    "cookie banner accept terms privacy policy navigation home about contact"
)


def replicated_docs(spark, n: int, flood: bool):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    copies = [base]
    for i in range(1, n):
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(
                    "text", F.lit(f" replica{i}tok xcopy{i}tok")
                ).alias("text"),
                "source",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    if flood:  # even doc ids (>= 50% of the corpus) lead with THE line
        out = out.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(BOILERPLATE + " "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    return out.repartition(32).cache()


def run(spark, docs) -> tuple[float, str]:
    df = line_dedup(docs)
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    # AQE final plan: the aggregate operators actually executed
    final = df._jdf.queryExecution().executedPlan().toString()
    aggs = sorted(set(re.findall(r"(\w*Aggregate)\b", final)))
    return wall, "/".join(aggs) or "none"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="scale-flooded-line-dedup")
    for flood in (False, True):
        docs = replicated_docs(spark, n, flood)
        total = docs.count()
        hot = docs.filter(
            F.col("text").startswith(BOILERPLATE)
        ).count()
        wall, aggs = run(spark, docs)
        label = "flooded" if flood else "unflooded"
        print(
            f"x{n} {label}: {total} docs, hot-line copies={hot}, "
            f"wall={wall:.1f} s, aggregates={aggs}"
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
