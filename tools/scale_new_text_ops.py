"""Measure d73 quality classifier / d74 normalize / d75 containment /
d76 BPE training at replicated scale (SCALING.md method: sf0.1 documents
replicated N× with distinct ids; copies append two unique tokens, so
near-all shingles of each copy duplicate its source's — the worst case
for the containment self-join's bucket density).

Run from the repo root: ``python tools/scale_new_text_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.bpe import (  # noqa: E402
    bpe_apply_units,
    bpe_train,
)
from etl_example_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    containment_pairs_sampled,
)
from etl_example_spark.operators.text import (  # noqa: E402
    hashed_linear_quality,
    normalize_text,
)
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
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark()
    for n in ns:
        docs = replicated_docs(spark, n)
        total = docs.count()
        print(f"x{n}: {total} docs")
        timed(
            "d73 quality classifier",
            lambda: hashed_linear_quality(
                docs.filter(F.length(F.trim("text")) > 0)
            ).count(),
        )
        timed(
            "d74 normalize (NFC pandas UDF)",
            lambda: docs.select(
                normalize_text("text").alias("t")
            ).filter(F.length("t") >= 0).count(),
        )
        timed(
            "d75 containment pairs",
            lambda: containment_pairs(docs, threshold=0.9).count(),
        )
        timed(
            "d77 sampled containment",
            lambda: containment_pairs_sampled(docs, threshold=0.9).count(),
        )
        t0 = time.monotonic()
        merges = bpe_train(docs, n_merges=6)
        print(
            f"  d76 bpe_train(6): {time.monotonic() - t0:.1f} s "
            f"(last merge {merges[-1]!r})"
        )
        timed(
            "d79 bpe_apply(6)",
            lambda: bpe_apply_units(docs, merges).count(),
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
