"""Measure keep_best_per_cluster / leakage_safe_split at replicated scale.

SCALING.md method: replicate sf0.1 documents N× with distinct ids; each
copy gets two extra unique tokens so it stays a ~J=0.93 near-dup of its
source — the hard case where EVERY document is clustered, i.e. the
cluster-label table is corpus-sized and a forced broadcast of it would
be a scale-killer. Pairs come from the production path (MinHash-LSH).

Prints wall times and the join strategy AQE actually picked for the
cluster-label join at each scale.

Run from the repo root: ``python tools/scale_cluster_ops.py [N ...]``.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import dedup  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    copies = [base]
    for i in range(1, n):
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(
                    "text", F.lit(f" replica{i}tok xcopy{i}tok")
                ).alias("text"),
                "n_chars",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).cache()


def label_join_strategy(df) -> str:
    """The join node that consumes the cluster labels in the FINAL
    (AQE-adapted) plan — run after an action so AQE has re-planned."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    kinds = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
        r".*LeftOuter",
        plan,
    )
    return ",".join(dict.fromkeys(kinds)) or "none-found"


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 8]
    spark = get_spark(app_name="scale-cluster-ops")
    for n in scales:
        docs = replicated_docs(spark, n)
        n_docs = docs.count()
        pairs = dedup.minhash_lsh_dedup(docs, threshold=0.6, n=3).cache()
        n_pairs = pairs.count()

        t0 = time.monotonic()
        kb = dedup.keep_best_per_cluster(docs, pairs, score_col="n_chars")
        n_clusters = kb.count()
        t_kb = time.monotonic() - t0

        t0 = time.monotonic()
        sp = dedup.leakage_safe_split(docs, pairs, train_fraction=0.8)
        n_split = sp.count()
        t_sp = time.monotonic() - t0

        print(
            f"x{n}: docs={n_docs} pairs={n_pairs} "
            f"d58 {t_kb:.1f}s ({n_clusters} clusters, "
            f"join={label_join_strategy(kb)}) "
            f"d60 {t_sp:.1f}s ({n_split} rows, "
            f"join={label_join_strategy(sp)})",
            flush=True,
        )
        docs.unpersist()
        pairs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
