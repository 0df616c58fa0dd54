"""Measure the round-8 operators at replicated scale: d80/d82 span
dedup, d83 bigram LM scoring, d84 soft-dedup weights (SCALING.md
method: sf0.1 documents replicated N× with distinct ids; copies append
two unique tokens, so near-all 8-token spans of every copy duplicate
its source's — the worst case for the span-anchor aggregate, and the
hot-bigram worst case for the LM joins).

Uses the noop sink (full execution — a bare count() lets Catalyst prune
joins/explodes on apply-shaped queries).

Run from the repo root: ``python tools/scale_span_lm_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.dedup import (  # noqa: E402
    duplicated_spans,
    duplicated_spans_df_floor,
    remove_duplicated_spans,
    soft_dedup_weights,
)
from etl_example_spark.operators.text import (  # noqa: E402
    bigram_logprob_score,
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


def timed(label: str, df) -> None:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-span-lm-ops")
    for n in scales:
        docs = replicated_docs(spark, n)
        print(f"x{n}: {docs.count()} docs")
        timed("d80 duplicated_spans", duplicated_spans(docs, span_tokens=8))
        timed(
            "d81 remove_duplicated_spans",
            remove_duplicated_spans(docs, span_tokens=8),
        )
        timed(
            "d82 df_floor(3)",
            duplicated_spans_df_floor(docs, span_tokens=8, min_span_df=3),
        )
        timed("d83 bigram_logprob", bigram_logprob_score(docs))
        timed("d84 soft_dedup_weights", soft_dedup_weights(docs))
        docs.unpersist()


if __name__ == "__main__":
    main()
