"""x1/x4/x8 walls for the round-11 wave, SCALING.md method (double-run
noop sink, warm cached input, shuffle_partitions=32):

- q90-class exact global NTILE: the OLD unpartitioned-window form vs
  the NEW deterministic two-pass ``functions/rank.global_ntile`` —
  the point is the FUNNEL, so both forms are timed side by side
  (replicated sf0.1 lineitem; at x8 the old form sorts ~4.8M rows on
  ONE task while the new form's largest task is ~1/32 of that).
- d109 quality-bucket budgeting on the new two-pass path (replicated
  documents).
- m48 video codec class: per-doc MJPEG/AVI mux -> demux -> sampled
  JPEG decode through the Arrow boundary (x1/x8 — codec throughput
  scales with payload count, like m43/m47).
- d112/d113 NB language-ID: fit (counting pass) + zero-shuffle gate.
- s53 vs s57 BM25 serving: flat-artifact semi-join serve vs
  term-bucketed bucket-pruned serve, artifact build excluded (paid
  once) — the serve delta is what the bucket layout buys.

Run from the repo root: ``python tools/scale_round11_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from etl_example_spark.functions.rank import Ord, global_ntile  # noqa: E402
from etl_example_spark.operators import text  # noqa: E402
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


def timed_e2e(label, build_fn):
    """Build-INCLUSIVE timing for plans whose construction runs eager
    jobs (the rank primitive's sampling pass + localCheckpoint): a
    noop-only timing of the returned frame would hide the corpus-sized
    work in the build. Warm once, then time build+execute together."""
    build_fn().write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    build_fn().write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def ntile_decile_agg(b):
    return (
        b.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("cents_sum"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-r11", shuffle_partitions=32)
    for n in ns:
        print(f"x{n}:", flush=True)
        li = replicated(spark, n, "lineitem", "l_orderkey")
        li.count()
        cents = F.round(F.col("l_extendedprice") * 100).cast("long")
        narrow = li.select(
            cents.alias("cents"),
            "l_extendedprice", "l_orderkey", "l_linenumber",
        )
        # OLD: unpartitioned NTILE — the single-task funnel
        w = Window.orderBy(
            F.asc_nulls_last("l_extendedprice"),
            "l_orderkey", "l_linenumber",
        )
        timed(
            "q90 ntile OLD single-partition window",
            ntile_decile_agg(
                narrow.select(
                    "cents", F.ntile(10).over(w).alias("decile")
                )
            ),
        )
        # NEW: deterministic two-pass rank (build-inclusive: the
        # sampling pass + checkpoint materialization are the plan)
        timed_e2e(
            "q90 ntile NEW two-pass global_ntile (incl build)",
            lambda: ntile_decile_agg(
                global_ntile(
                    narrow,
                    [
                        Ord("l_extendedprice", nulls_last=True),
                        Ord("l_orderkey"),
                        Ord("l_linenumber"),
                    ],
                    10,
                    out="decile",
                )
            ),
        )
        li.unpersist()

        docs = replicated(spark, n, "documents", "doc_id")
        docs.count()

        def build_d109():
            ent = text.token_entropy(docs)
            b = global_ntile(
                ent.select("doc_id", "n_tokens", "entropy_micro"),
                [Ord("entropy_micro"), Ord("doc_id")],
                4,
                out="qb",
            )
            return b.groupBy("qb").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("tokens"),
            )

        timed_e2e(
            "d109 quality buckets (two-pass NTILE, incl build)",
            build_d109,
        )

        # NB language ID: fit is a bounded collect, gate is a pure map
        from etl_example_spark.plans.llm_ops import (
            _LANGID_DIM,
            _LANGID_LANGS,
            _langid_marked,
        )

        marked = _langid_marked(docs)
        t0 = time.monotonic()
        weights, priors = text.nb_langid_train(
            marked, _LANGID_LANGS, dim=_LANGID_DIM
        )
        print(
            f"  d112 NB langid fit: {time.monotonic() - t0:.1f} s",
            flush=True,
        )
        timed(
            "d113 NB langid gate (zero-shuffle map)",
            marked.select(
                "doc_id",
                *text.nb_langid_scores(
                    _LANGID_LANGS, weights, priors, dim=_LANGID_DIM
                ),
            ),
        )

        if n in (1, 8):
            from etl_example_spark.plans.registry import load_all

            reg = load_all()
            # m48 video codec class over the replicated corpus
            import etl_example_spark.plans.llm_ops as llm

            saved = llm.load_table
            try:
                llm.load_table = lambda s, d, t: docs  # noqa: ARG005
                timed(
                    "m48 video mux+demux+decode",
                    reg["m48_video_frame_stats"].spark_builder(
                        spark, SF_DIR
                    ),
                )
            finally:
                llm.load_table = saved
        docs.unpersist()

    # BM25 serving comparison at x1 (artifact build excluded — paid once)
    from etl_example_spark.plans.llm_ops import (
        BM25_SERVE_QUERIES,
        _stage_bm25_bucketed,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    queries = spark.createDataFrame(
        BM25_SERVE_QUERIES, "query_id int, term string"
    )
    table, n_docs, t_total = _stage_bm25_bucketed(spark, SF_DIR)
    # flat artifact as parquet-on-disk too, so both serves read a
    # stored artifact and the delta is purely the bucket layout
    import tempfile

    flat, _n, _t = text.bm25_index_build(
        docs, tempfile.mkdtemp(prefix="bm25_flat_")
    )
    print("serving (x1, build excluded):", flush=True)
    timed(
        "s53 flat-artifact serve (semi-join, scans all files)",
        text.bm25_topk_from_postings(
            flat, queries, n_docs, t_total, k=10
        ),
    )
    timed(
        "s57 bucketed serve (bucket-pruned scan)",
        text.bm25_topk_from_bucketed(
            spark, table, queries, n_docs, t_total, k=10
        ),
    )


if __name__ == "__main__":
    main()
