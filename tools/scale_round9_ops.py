"""Measure the round-9 operators at replicated scale: d87 newline line
dedup, d88/d89 boilerplate audits, d90/d91 span-level benchmark
decontamination (SCALING.md method: sf0.1 documents replicated N× with
distinct ids; copies append two unique tokens so the duplicate-dense
worst case holds; the benchmark side of d90/d91 stays FIXED — the
unreplicated src0 slice — while the corpus scales, the production
shape of a decontamination pass).

Newline-mode operators (d87/d89) run on text with the literal token
``line`` turned into ``\\n`` (the registrations' own transform — the
testdata carries no raw newlines).

Uses the noop sink (full execution — a bare count() lets Catalyst prune
joins/explodes on apply-shaped queries).

Run from the repo root: ``python tools/scale_round9_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.dedup import (  # noqa: E402
    benchmark_span_overlap,
    clear_staged_caches,
    line_dedup,
    remove_benchmark_spans,
    top_duplicated_lines,
    top_duplicated_spans,
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


def with_newlines(docs):
    return docs.select(
        "doc_id",
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit("line"), F.lit("\n")
        ).alias("text"),
    )


def timed(label: str, df) -> None:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-round9-ops")
    for n in scales:
        docs = replicated_docs(spark, n)
        print(f"x{n}: {docs.count()} docs")
        nl = with_newlines(docs)
        bench = docs.filter(F.col("source") == "src0").filter(
            F.col("doc_id") < 10_000_000  # unreplicated slice only
        )
        corpus = docs.filter(F.col("source") != "src0")
        timed("d87 newline line_dedup", line_dedup(nl, separator="\n"))
        timed(
            "d88 top_duplicated_spans",
            top_duplicated_spans(docs, k=20, span_tokens=8),
        )
        timed(
            "d89 top_duplicated_lines(sep)",
            top_duplicated_lines(nl, k=20, separator="\n"),
        )
        timed(
            "d90 benchmark_span_overlap",
            benchmark_span_overlap(corpus, bench, span_tokens=13),
        )
        timed(
            "d91 remove_benchmark_spans",
            remove_benchmark_spans(corpus, bench, span_tokens=13),
        )
        docs.unpersist()
        clear_staged_caches()


if __name__ == "__main__":
    main()
