"""Scale measurements for the round-12 wave, SCALING.md method
(double-run noop sink, warm cached input, shuffle_partitions=32):

- d115-class FILE-BACKED WET reading: wall vs file count (x1/x4/x8 of
  4x400-record .wet files) and the maxPartitionBytes split mode on one
  big file — both should scale linearly with bytes, and the split mode
  must match the per-file mode (partitions do more, smaller slices).
- Raw vs RESIDUAL IVF-PQ recall under increasingly harsh quantization
  (the artifact-size/recall trade: BOTH layouts store the same m
  log2(n_codes)-bit codes per vector — residual encoding buys recall
  at IDENTICAL bytes, paying only one broadcast join to form
  displacements).
- m49-class interleaved packing: wall vs corpus size (x1/x4/x8
  documents) — metadata-only arithmetic, so it should budget like a
  token-count pass.
- rank-primitive build silence: jobs launched while CONSTRUCTING and
  EXPLAINing the q90-shaped plan (must be 0 — the round's fix).

Run from the repo root: ``python tools/scale_round12_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.functions.rank import Ord, global_ntile  # noqa: E402
from etl_example_spark.operators import similarity  # noqa: E402
from etl_example_spark.operators.multimodal import (  # noqa: E402
    interleaved_segments,
)
from etl_example_spark.operators.packing import pack_segments  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402
from etl_example_spark.sources.warc import (  # noqa: E402
    register_wet_datasource,
    write_synthetic_crawl_files,
)

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


def wet_rollup(df):
    from etl_example_spark.operators import text

    return (
        df.filter(text.token_count("text") >= 5)
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.min("url").alias("keep_url"), F.count("*").alias("n"))
    )


def recall(spark, emb, fn, **kw) -> int:
    exact = {
        r.neighbor_id
        for r in similarity.brute_force_topk(emb, k=10).collect()
    }
    approx = {r.neighbor_id for r in fn(emb, k=10, **kw).collect()}
    return len(exact & approx)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-r12", shuffle_partitions=32)
    register_wet_datasource(spark)

    # --- file-backed WET read: wall vs file count --------------------
    rows_x1 = 50_000
    tmp = tempfile.mkdtemp(prefix="scale_wet_")
    for n in ns:
        d = f"{tmp}/x{n}"
        write_synthetic_crawl_files(
            d, rows=rows_x1 * n, n_files=4 * n, dup_every=7, wet=True
        )
        df = (
            spark.read.format("synthetic_wet").option("path", d).load()
        )
        timed(
            f"x{n} WET file-mode read+gate+dedup "
            f"({rows_x1 * n} records, {4*n} files)",
            wet_rollup(df),
        )
    # split mode: ONE big file sliced by maxPartitionBytes — same
    # records, more+smaller ranged reads; must cost about the same
    big = f"{tmp}/big"
    write_synthetic_crawl_files(
        big, rows=rows_x1 * max(ns), n_files=1, dup_every=7, wet=True
    )
    whole = spark.read.format("synthetic_wet").option("path", big).load()
    sliced = (
        spark.read.format("synthetic_wet")
        .option("path", big)
        .option("maxPartitionBytes", 1 << 20)
        .load()
    )
    timed(f"x{max(ns)} WET one file, ONE partition", wet_rollup(whole))
    timed(
        f"x{max(ns)} WET one file, 1 MiB slices "
        f"({sliced.rdd.getNumPartitions()} partitions)",
        wet_rollup(sliced),
    )

    # --- raw vs residual IVF-PQ recall under harsh quantization ------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()
    print("  raw-vs-residual IVFPQ recall@10 (same bytes per vector):",
          flush=True)
    for m, n_codes, shortlist in [(16, 32, 200), (8, 16, 50),
                                  (4, 16, 30), (2, 8, 20)]:
        raw = recall(
            spark, emb, similarity.ivfpq_topk,
            n_centroids=16, nprobe=8, m=m, n_codes=n_codes,
            iters=2, shortlist=shortlist,
        )
        res = recall(
            spark, emb, similarity.ivfpq_residual_topk,
            n_centroids=16, nprobe=8, m=m, n_codes=n_codes,
            iters=2, shortlist=shortlist,
        )
        bits = m * max(1, (n_codes - 1).bit_length())
        print(
            f"    m={m} n_codes={n_codes} shortlist={shortlist} "
            f"({bits} bits/vec): raw {raw}/10, residual {res}/10",
            flush=True,
        )

    # --- interleaved packing wall vs corpus size ---------------------
    for n in ns:
        docs = replicated(spark, n, "documents", "doc_id")
        docs.count()
        timed(
            f"x{n} m49 interleaved segment packing",
            pack_segments(interleaved_segments(docs), budget=512),
        )

    # --- rank build silence ------------------------------------------
    docs = replicated(spark, 1, "documents", "doc_id")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    plan = global_ntile(
        docs.select("doc_id", "source"),
        [Ord("source"), Ord("doc_id")],
        10,
    )
    _ = plan._jdf.queryExecution().executedPlan().toString()
    after = len(tracker.getJobIdsForGroup() or [])
    print(f"  rank build+EXPLAIN jobs: {after - before} (must be 0)",
          flush=True)


if __name__ == "__main__":
    main()
