"""Measure the IVF recall-vs-nprobe curve at replicated scale — the
number an ANN operator tunes FIRST in production.

The gate-scale recall certificates (s33a/s40a/s42a) pin one operating
point at sf0.01; this tool sweeps ``nprobe`` over a corpus replicated
N× (default ×8: replicas get new ids and a deterministic small rotation
of the embedding so they are near-duplicates, not exact copies — the
realistic crawl-duplication shape) and reports, per nprobe:

- mean recall@k against the exact brute-force top-k, over ``n_queries``
  distinct query vectors (not just the min-id one);
- the measured scan fraction (candidate rows / corpus rows) — the cost
  lever recall is being traded against.

Usage: python tools/ivf_recall_curve.py [replicas] [n_centroids]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_example_spark.operators import similarity
from etl_example_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 8


def replicated_embeddings(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = [base]
    for i in range(1, n):
        # near-duplicate replica: shift ids, nudge one coordinate —
        # same neighborhood structure, no exact ties
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x
                    + F.when(j == (i % 8), F.lit(0.001 * i)).otherwise(
                        F.lit(0.0)
                    ),
                ).alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).cache()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="ivf-recall-curve")
    emb = replicated_embeddings(spark, n)
    total = emb.count()
    query_ids = [
        r.vec_id
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    exact = {
        qid: [
            r.neighbor_id
            for r in similarity.brute_force_topk(
                emb, query_id=qid, k=K
            ).collect()
        ]
        for qid in query_ids
    }

    curve = []
    for nprobe in (1, 2, 4, 8, n_centroids):
        recalls = []
        for qid in query_ids:
            got = [
                r.neighbor_id
                for r in similarity.ivf_topk(
                    emb,
                    query_id=qid,
                    k=K,
                    n_centroids=n_centroids,
                    nprobe=nprobe,
                ).collect()
            ]
            recalls.append(
                len(set(got) & set(exact[qid])) / len(exact[qid])
            )
        # scan fraction: members of the probed cells / corpus size, for
        # the first query (cell sizes are query-independent)
        assign = similarity.ivf_assign(emb, n_centroids)
        cells = (
            assign.groupBy("centroid_id")
            .count()
            .orderBy(F.desc("count"))
            .collect()
        )
        # upper bound: the nprobe largest cells
        worst_scan = sum(c["count"] for c in cells[:nprobe]) / total
        curve.append(
            {
                "nprobe": nprobe,
                "mean_recall_at_10": round(
                    sum(recalls) / len(recalls), 3
                ),
                "min_recall_at_10": round(min(recalls), 3),
                "worst_case_scan_fraction": round(worst_scan, 3),
            }
        )
        print(json.dumps(curve[-1]))

    print(
        json.dumps(
            {
                "corpus_vectors": total,
                "replicas": n,
                "n_centroids": n_centroids,
                "k": K,
                "n_queries": N_QUERIES,
                "curve": curve,
            }
        )
    )


if __name__ == "__main__":
    main()
