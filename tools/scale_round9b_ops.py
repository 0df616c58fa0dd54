"""Measure the round-9b additions at replicated scale: the SQ8 family
(s49 encode+topk, s50 incremental append), the d95 token-budget mixture
plan, and the d97 end-to-end web-curation-v2 chain (SCALING.md method:
sf0.1 inputs replicated N× with distinct ids; document copies append
two unique tokens so the duplicate-dense worst case holds; the
benchmark side of d97's decontamination stage stays FIXED — the
unreplicated src0 slice — while the corpus scales).

Uses the noop sink (full execution — a bare count() lets Catalyst prune
joins/explodes on apply-shaped queries).

Run from the repo root: ``python tools/scale_round9b_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import dedup, similarity  # noqa: E402
from etl_example_spark.operators.sampling import (  # noqa: E402
    temperature_sample,
    token_budget_plan,
)
from etl_example_spark.operators.text import token_count  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated(spark, table: str, n: int, id_col: str, extra=None):
    base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    copies = [base]
    for i in range(1, n):
        c = base.withColumn(
            id_col, F.col(id_col) + F.lit(i * 10_000_000)
        )
        if extra is not None:
            c = extra(c, i)
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).cache()


def timed(label: str, df) -> None:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def curation_v2(docs):
    """The d97 chain on a raw docs frame (structure derived inline,
    matching the registration)."""
    structured = docs.select(
        "doc_id",
        "lang",
        "source",
        F.replace(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("line"),
            F.lit("\n"),
        ).alias("text"),
    )
    corpus = structured.filter(F.col("source") != "src0")
    bench = structured.filter(F.col("source") == "src0").filter(
        F.col("doc_id") < 10_000_000  # unreplicated benchmark
    )
    cleaned = dedup.intradoc_line_dedup(corpus).select("doc_id", "text")
    c1 = cleaned.join(corpus.select("doc_id", "lang"), "doc_id")
    gated = c1.filter(token_count("text") >= 5)
    keepers = dedup.exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    c2 = gated.join(keepers, "doc_id", "left_semi")
    hits = (
        dedup.benchmark_span_overlap(c2, bench, span_tokens=13)
        .select("doc_id")
        .distinct()
    )
    c3 = c2.join(hits, "doc_id", "left_anti")
    sampled = temperature_sample(
        c3, alpha=0.5, keep_fraction=0.7, stratum_col="lang",
        id_col="doc_id",
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text").cast("long")).alias("n_tokens"),
        )
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-round9b-ops")
    for n in scales:
        docs = replicated(
            spark,
            "documents",
            n,
            "doc_id",
            extra=lambda c, i: c.withColumn(
                "text",
                F.concat("text", F.lit(f" replica{i}tok xcopy{i}tok")),
            ),
        )
        emb = replicated(spark, "embeddings", n, "vec_id")
        print(f"x{n}: {docs.count()} docs, {emb.count()} vectors")

        bounds = similarity.sq8_train(emb)
        codes = similarity.sq8_encode(emb, bounds)
        queries = codes.filter(F.col("vec_id") % 97 == 0)
        timed("s49 sq8 encode (all)", codes)
        timed("s49 sq8 topk (6 q/M vecs)", similarity.sq8_topk(
            codes, queries.limit(6), k=10))
        old = emb.filter(F.col("vec_id") % 4 != 0)
        new = emb.filter(F.col("vec_id") % 4 == 0)
        b_old = similarity.sq8_train(old)
        timed(
            "s50 sq8 append (1/4 batch)",
            similarity.sq8_append(
                similarity.sq8_encode(old, b_old), new, b_old
            ),
        )
        timed(
            "d95 token_budget_plan",
            token_budget_plan(
                docs,
                {"de": 1, "en": 2, "es": 1, "fr": 1, "zh": 1},
                budget_ppm=500_000,
                stratum_col="lang",
            ),
        )
        timed("d97 web_curation_v2 chain", curation_v2(docs))
        docs.unpersist()
        emb.unpersist()
        dedup.clear_staged_caches()


if __name__ == "__main__":
    main()
