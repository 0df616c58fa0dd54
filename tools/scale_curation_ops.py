"""Measure line_dedup / host caps / unigram_rarity at replicated scale.

SCALING.md method: replicate sf0.1 documents N× with distinct ids; each
copy appends two unique tokens, so ~80% of every copy's 10-token lines
are exact duplicates of its source's lines — the planted-duplicate hard
case for line dedup, and a 5000-doc-per-host head for the frequency
caps (hosts replicate with the corpus: same host set, N× the docs).

Run from the repo root: ``python tools/scale_curation_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.dedup import line_dedup  # noqa: E402
from etl_example_spark.operators.sampling import (  # noqa: E402
    host_frequency_cap,
    host_frequency_cap_approx,
)
from etl_example_spark.operators.text import unigram_rarity  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark, n: int):
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
    return out.repartition(32).cache()


def timed(label: str, fn) -> None:
    fn()  # warm-up
    t0 = time.monotonic()
    n = fn()
    print(f"  {label}: {time.monotonic() - t0:.1f} s ({n} rows)")


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-curation-ops")
    for n in scales:
        docs = replicated_docs(spark, n)
        total = docs.count()
        print(f"x{n}: {total} docs")
        hosted = docs.select(
            "doc_id",
            F.concat(
                F.lit("www."), F.lower("source"), F.lit(".example.com")
            ).alias("host"),
        )
        timed("d62 line_dedup", lambda: line_dedup(docs).count())
        timed("d65 unigram_rarity", lambda: unigram_rarity(docs).count())
        timed(
            "d64 host_cap exact",
            lambda: host_frequency_cap(hosted, cap=100).count(),
        )
        timed(
            "d64 host_cap approx",
            lambda: host_frequency_cap_approx(hosted, cap=100).count(),
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
