"""Scale measurements for the round-13 late wave, SCALING.md method
(double-run noop sink, warm cached input, shuffle_partitions=32):

- s70 SemDeDup pair bounding: candidate pairs actually compared
  (Σ|cell|²-ish) vs the global n² a naive pass would pay, and wall vs
  corpus size at FIXED cell count vs cells GROWING with the corpus
  (the production sqrt(n)-cells discipline keeps cell size ~constant,
  so pair work stays ~linear).
- d118 HLL: sketch build wall vs exact COUNT(DISTINCT) wall at
  x1/x4/x8 duplicated corpora — the sketch's shuffle is 256 ints per
  shard regardless of rows, exact distinct shuffles every raw key.
- st64-class IVF serve: per-batch candidate rows touched vs corpus
  size at fixed nprobe/n_cells (the nprobe/n_cells scan fraction is
  the contract).

Run from the repo root: ``python tools/scale_round13b_ops.py``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import similarity  # noqa: E402
from etl_example_spark.operators.sketches import (  # noqa: E402
    hll_ranks,
    hll_registers,
)
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated_emb(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = base
    for i in range(1, n):
        out = out.unionByName(
            base.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                # rotate two coords so copies are near- but not exact dups
                F.concat(
                    F.slice("embedding", 2, 63),
                    F.slice("embedding", 1, 1),
                ).alias("embedding"),
                "label",
            )
        )
    return out.cache()


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("scale-r13b", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    print("== s70 SemDeDup: pair bounding and cell-count discipline ==")
    for mult in (1, 2, 4):
        emb = replicated_emb(spark, mult)
        n = emb.count()
        for cells in (16, int((n / 20) ** 0.5) ** 2 or 16):
            t = timed(
                similarity.semdedup(emb, n_centroids=cells, threshold=0.4)
            )
            # candidate pairs actually compared (pre-threshold)
            assign = similarity.ivf_assign(emb, cells)
            pairs = (
                assign.groupBy("centroid_id")
                .count()
                .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
                .collect()[0][0]
            )
            print(
                f"n={n} cells={cells}: wall={t:.2f}s "
                f"pairs={int(pairs):,} (n²/2={n*(n-1)//2:,}, "
                f"{2*pairs/(n*(n-1)):.1%})"
            )
        emb.unpersist()

    print("== d118 HLL vs exact distinct ==")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for mult in (1, 4, 8):
        docs = base
        for i in range(1, mult):
            docs = docs.unionByName(
                base.withColumn(
                    "doc_id", F.col("doc_id") + 1_000_000 * i
                )
            )
        docs = docs.select(
            F.coalesce("text", F.lit("")).alias("item")
        ).cache()
        docs.count()
        t_h = timed(hll_registers(hll_ranks(docs), spark))
        t0 = time.perf_counter()
        nd = docs.select(F.countDistinct("item")).collect()[0][0]
        t_e = time.perf_counter() - t0
        print(
            f"x{mult}: hll={t_h:.2f}s exact_distinct={t_e:.2f}s "
            f"(true={nd:,}; sketch is 256 ints/shard on the wire, "
            f"exact ships every distinct key)"
        )
        docs.unpersist()

    print("== st64-class IVF serve: candidates touched vs corpus ==")
    for mult in (1, 2, 4):
        emb = replicated_emb(spark, mult)
        n = emb.count()
        cents = (
            emb.orderBy("vec_id")
            .limit(16)
            .select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            )
        )
        assign = similarity.ivf_assign_with_centroids(emb, cents).filter(
            F.col("centroid_id").isNotNull()
        ).cache()
        assign.count()
        queries = emb.filter(F.col("vec_id") % 512 == 0)
        nq = queries.count()
        served = similarity.ivf_topk_batch(
            queries, cents, assign, k=5, nprobe=2
        )
        t = timed(served)
        # candidate rows the rerank touches (cells joined, pre-top-k)
        probe = (
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            .crossJoin(F.broadcast(cents))
            .select(
                "query_id",
                "centroid_id",
                F.round(
                    similarity.cosine("query_vec", "centroid_vec"), 6
                ).alias("q_sim"),
            )
            .filter(F.col("q_sim").isNotNull())
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("q_sim"), F.asc("centroid_id")
        )
        cells = (
            probe.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 2)
            .select("query_id", "centroid_id")
        )
        touched = (
            cells.join(
                assign.groupBy("centroid_id").count(), "centroid_id"
            )
            .agg(F.sum("count"))
            .collect()[0][0]
        )
        print(
            f"n={n} queries={nq}: wall={t:.2f}s candidates={touched:,} "
            f"({touched/(n*nq):.1%} of corpus x queries)"
        )
        assign.unpersist()
        emb.unpersist()


if __name__ == "__main__":
    main()
