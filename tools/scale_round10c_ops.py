"""x1/x4/x8 walls for the round-10 third wave: SQ8 k-means training
(s55 — embeddings replicated with distinct ids) and quality-bucketed
token budgeting (d109 — documents replicated). Same SCALING.md method:
noop sink / timed end-to-end for the training loop (actions included).

Run from the repo root: ``python tools/scale_round10c_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from etl_example_spark.operators import similarity, text  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated(spark, n: int, table: str, idc: str):
    base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    out = base
    for i in range(1, n):
        out = out.unionByName(
            base.withColumn(idc, F.col(idc) + F.lit(i * 10_000_000))
        )
    return out.repartition(32).cache()


def timed(label, df):
    df.write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-r10c", shuffle_partitions=32)
    for n in ns:
        print(f"x{n}:", flush=True)
        emb = replicated(spark, n, "embeddings", "vec_id")
        emb.count()
        codes = similarity.sq8_encode(emb, similarity.sq8_train(emb))
        t0 = time.monotonic()
        cents, assign = similarity.sq8_kmeans(codes, k=8, iters=2)
        assign.write.format("noop").mode("overwrite").save()
        print(
            f"  s55_sq8_kmeans (2 iters + final assign): "
            f"{time.monotonic() - t0:.1f} s",
            flush=True,
        )
        emb.unpersist()

        docs = replicated(spark, n, "documents", "doc_id")
        docs.count()
        ent = text.token_entropy(docs)
        w = Window.orderBy("entropy_micro", "doc_id")
        b = ent.select(
            "doc_id", "n_tokens",
            F.ntile(4).over(w).cast("long").alias("qb"),
        )
        per = b.groupBy("qb").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
        timed("d109_quality_bucket_budget", per)
        docs.unpersist()


if __name__ == "__main__":
    main()
