"""Round-13 measurement: bucketed BM25 ingest, append vs full rebuild.

Reproduces the SCALING.md round-13 s68 table: wall time of ingesting a
FIXED-size document batch (500 docs) into the term-bucketed BM25
postings artifact (bucketBy(32, term), the layout s57/s59/s68 serve
from), two ways, as the already-indexed corpus grows x1/x4/x16:

- append (s68 path): postings of the batch alone written in append
  mode under the same bucket spec + a one-row stats-sidecar add —
  work is O(batch tokens), independent of the indexed corpus;
- rebuild: postings of corpus+batch recomputed and rewritten — work is
  O(corpus tokens), the cost s68 exists to avoid.

Expected shape: append flat in corpus size, rebuild linear. At a 100 TB
corpus with a daily crawl batch, the rebuild path is a full-corpus
tokenize+shuffle per ingest; the append path prices ingest at the
batch. (Serve-equality of the two paths is certified externally by the
s68 oracle; pruning survival by tests/test_llm_ops.py.)

Run solo (the numbers are meaningless next to a concurrent sweep):

    python tools/scale_bm25_append.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_example_spark.operators import text
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import load_table
from etl_example_spark.sources.writers import write_bucketed_table


def main() -> None:
    spark = get_spark(app_name="scale-bm25-append", shuffle_partitions=8)
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )

    def replicate(times: int):
        big = docs
        for i in range(1, times):
            big = big.unionByName(
                docs.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    "text",
                )
            )
        return big.repartition(8).localCheckpoint(eager=True)

    batch = docs.limit(500).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    # replicate(1) for x1 too: all corpora share the same 8-partition
    # in-memory representation, so the sweep varies SIZE only
    corpora = [("x1 (5k)", replicate(1)), ("x4 (20k)", replicate(4)),
               ("x16 (80k)", replicate(16))]
    # warm-up: JVM/codegen + catalog, covering BOTH measured plan
    # shapes (plain write and union-rebuild write)
    write_bucketed_table(
        text.bm25_postings(docs.limit(100), None),
        "bm25_scale_warm", ["term"], 32, sort_by=["term"],
    )
    write_bucketed_table(
        text.bm25_postings(docs.limit(100).unionByName(batch), None),
        "bm25_scale_warm", ["term"], 32, sort_by=["term"],
    )

    results = []
    for name, corpus in corpora:
        tbl = "bm25_scale_probe"
        write_bucketed_table(
            text.bm25_postings(corpus, None), tbl, ["term"], 32,
            sort_by=["term"],
        )
        t0 = time.time()
        write_bucketed_table(
            text.bm25_postings(batch, None), tbl, ["term"], 32,
            sort_by=["term"], mode="append",
        )
        t_append = time.time() - t0
        t0 = time.time()
        write_bucketed_table(
            text.bm25_postings(corpus.unionByName(batch), None),
            "bm25_scale_rebuild", ["term"], 32, sort_by=["term"],
        )
        t_rebuild = time.time() - t0
        results.append(
            {"corpus": name, "append_s": round(t_append, 2),
             "rebuild_s": round(t_rebuild, 2)}
        )
        print(json.dumps(results[-1]), flush=True)

    for tbl in ("bm25_scale_warm", "bm25_scale_probe",
                "bm25_scale_rebuild"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
