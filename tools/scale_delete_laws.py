"""Scale measurement for the s71/s72 deletion laws, SCALING.md method:

- DELETE cost: computing the delete set's totals + writing the
  tombstone id set — O(|deleted|), flat in INDEXED corpus size.
- REBUILD cost: re-tokenizing + re-bucketing the surviving corpus —
  linear in corpus size. The gap is why production indexes tombstone.
- SERVE overhead: the bucket-pruned BM25 probe with vs without the
  tombstone anti-join.

Run from the repo root: ``python tools/scale_delete_laws.py``.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import text  # noqa: E402
from etl_example_spark.operators.text import _bm25_rank  # noqa: E402
from etl_example_spark.plans.llm_ops import BM25_SERVE_QUERIES  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402
from etl_example_spark.sources.writers import (  # noqa: E402
    write_bucketed_table,
)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scale-deletes", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    for mult in (1, 4, 16):
        docs = base
        for i in range(1, mult):
            docs = docs.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i)
            )
        docs = docs.localCheckpoint()
        name = f"bm25_delscale_{mult}"
        write_bucketed_table(
            text.bm25_postings(docs, None), name, ["term"], 32,
            sort_by=["term"],
        )

        deleted = docs.filter(F.col("doc_id") % 5 == 0)
        t0 = time.perf_counter()
        row = deleted.select(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(
                    text.token_count(F.coalesce(F.col("text"), F.lit("")))
                ),
                F.lit(0),
            ).alias("t"),
        ).collect()[0]
        tomb_name = f"bm25_tombstones_{mult}"
        deleted.select("doc_id").write.mode("overwrite").saveAsTable(
            tomb_name
        )
        t_delete = time.perf_counter() - t0

        t0 = time.perf_counter()
        write_bucketed_table(
            text.bm25_postings(docs.filter(F.col("doc_id") % 5 != 0), None),
            f"{name}_rebuilt", ["term"], 32, sort_by=["term"],
        )
        t_rebuild = time.perf_counter() - t0

        queries = spark.createDataFrame(
            BM25_SERVE_QUERIES, "query_id int, term string"
        )
        terms = tuple(sorted({t for _, t in BM25_SERVE_QUERIES}))
        totals = F.broadcast(
            spark.createDataFrame(
                [(1, 1)], "n_docs bigint, t_total bigint"
            )
        )

        def serve(with_tombstones: bool) -> float:
            matched = spark.table(name).filter(F.col("term").isin(*terms))
            if with_tombstones:
                matched = matched.join(
                    F.broadcast(spark.table(tomb_name)),
                    "doc_id",
                    "left_anti",
                )
            out = _bm25_rank(matched, queries, totals, k=10)
            out.write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        s_plain = serve(False)
        s_tomb = serve(True)
        print(
            f"x{mult} ({docs.count():,} docs): delete(tombstone+totals)="
            f"{t_delete:.2f}s rebuild={t_rebuild:.2f}s "
            f"serve_plain={s_plain:.2f}s serve_tombstoned={s_tomb:.2f}s"
        )


def cdc_vs_rebuild() -> None:
    """CDC-maintenance cost (diff + tokenize touched docs + tombstones)
    vs full v2 rebuild, replicated sf0.1 — the s73 scale claim."""
    from etl_example_spark.operators.corpus import snapshot_diff

    spark = get_spark("scale-cdc", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for mult in (1, 4, 16):
        docs = base
        for i in range(1, mult):
            docs = docs.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i)
            )
        docs = docs.localCheckpoint()
        v1 = docs.filter(F.col("doc_id") % 11 != 0)
        v2 = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")), F.lit(" v2")
                ),
            ).otherwise(F.col("text")),
        )
        write_bucketed_table(
            text.bm25_postings(v1, None), f"cdc_base_{mult}",
            ["term"], 32, sort_by=["term"],
        )
        t0 = time.perf_counter()
        diff = snapshot_diff(v1, v2).localCheckpoint()
        gone = diff.filter(
            F.col("status").isin("removed", "changed")
        ).select("doc_id")
        arriving = v2.join(
            F.broadcast(
                diff.filter(
                    F.col("status").isin("added", "changed")
                ).select("doc_id")
            ),
            "doc_id",
        )
        write_bucketed_table(
            text.bm25_postings(arriving, None), f"cdc_delta_{mult}",
            ["term"], 32, sort_by=["term"],
        )
        gone.write.mode("overwrite").saveAsTable(f"cdc_tomb_{mult}")
        n_touch = arriving.count() + gone.count()
        t_cdc = time.perf_counter() - t0
        t0 = time.perf_counter()
        write_bucketed_table(
            text.bm25_postings(v2, None), f"cdc_rebuild_{mult}",
            ["term"], 32, sort_by=["term"],
        )
        t_rebuild = time.perf_counter() - t0
        print(
            f"x{mult} ({docs.count():,} docs, {n_touch:,} touched): "
            f"cdc_maintain={t_cdc:.2f}s rebuild_v2={t_rebuild:.2f}s"
        )


if __name__ == "__main__":
    main()
    cdc_vs_rebuild()
