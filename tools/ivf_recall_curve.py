"""Measure the IVF recall-vs-nprobe curve (and a PQ recall point) at
x8-replicated scale — the number an ANN operator tunes FIRST in
production.

The gate-scale recall certificates (s33a/s40a/s42a) pin one operating
point at sf0.01; this tool scales the corpus 8x and sweeps ``nprobe``.
Two designs that silently produce a USELESS curve, and how this tool
avoids them (learned by measuring both):

- Replicas must not be near-duplicates of their source: a query's true
  top-k would then be its own replica family, which lands in the same
  IVF cell by construction — recall reads 1.0 at nprobe=1 no matter how
  bad the index is. Replicas here get a deterministic per-replica SIGN
  PATTERN on the coordinates (norm- and distribution-preserving, so
  cell population stays balanced) — the x8 corpus is 8x more vectors
  from the same distribution, with genuinely scattered neighbors.
- Queries must not be the centroid seeds: ivf_assign seeds centroids
  from the lowest-id vectors, and a query that IS a centroid trivially
  probes its own cell first. Queries are sampled from the id range
  ABOVE the seed block.

Reports per nprobe: mean/min recall@10 against exact brute force over
``N_QUERIES`` queries, plus the worst-case scan fraction (the nprobe
largest cells / corpus) — the cost that recall is being traded against.
Also one PQ-ADC recall point (m=8, n_codes=16, shortlist=100) at the
same scale.

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
        # deterministic sign pattern per (replica, coordinate): keeps
        # norms and the coordinate distribution, scrambles neighborhoods
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x
                    * (1 - 2 * ((j * 31 + F.lit(i * 17)) % 2)).cast(
                        "double"
                    ),
                ).alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).cache()


def recall(got: list, want: list) -> float:
    return len(set(got) & set(want)) / len(want)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="ivf-recall-curve")
    emb = replicated_embeddings(spark, n)
    total = emb.count()
    # query ids: spread through the id space, past the centroid seeds
    ids = [
        r.vec_id
        for r in emb.select("vec_id").orderBy("vec_id").collect()
    ]
    step = (len(ids) - n_centroids) // (N_QUERIES + 1)
    query_ids = [
        ids[n_centroids + (q + 1) * step] for q in range(N_QUERIES)
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

    assign = similarity.ivf_assign(emb, n_centroids)
    cell_sizes = sorted(
        (r["count"] for r in assign.groupBy("centroid_id").count().collect()),
        reverse=True,
    )

    curve = []
    for nprobe in (1, 2, 4, 8, n_centroids):
        recalls = [
            recall(
                [
                    r.neighbor_id
                    for r in similarity.ivf_topk(
                        emb,
                        query_id=qid,
                        k=K,
                        n_centroids=n_centroids,
                        nprobe=nprobe,
                    ).collect()
                ],
                exact[qid],
            )
            for qid in query_ids
        ]
        curve.append(
            {
                "nprobe": nprobe,
                "mean_recall_at_10": round(sum(recalls) / len(recalls), 3),
                "min_recall_at_10": round(min(recalls), 3),
                "worst_case_scan_fraction": round(
                    sum(cell_sizes[:nprobe]) / total, 3
                ),
            }
        )
        print(json.dumps(curve[-1]))

    pq_recalls = [
        recall(
            [
                r.neighbor_id
                for r in similarity.pq_topk(
                    emb, k=K, m=8, n_codes=16, query_id=qid
                ).collect()
            ],
            exact[qid],
        )
        for qid in query_ids
    ]
    print(
        json.dumps(
            {
                "corpus_vectors": total,
                "replicas": n,
                "n_centroids": n_centroids,
                "k": K,
                "n_queries": N_QUERIES,
                "curve": curve,
                "pq_m8_codes16_shortlist100_mean_recall": round(
                    sum(pq_recalls) / len(pq_recalls), 3
                ),
                "pq_min_recall": round(min(pq_recalls), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
