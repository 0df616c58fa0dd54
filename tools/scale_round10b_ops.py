"""Measure the round-10 second-wave additions at replicated scale:
batch-perceptron training (d106/d107 — 3 epochs, dim 64), positional
phrase search (s54), the DCT perceptual hash through the JPEG codec
(m46), and the streaming per-source admission quota (st57, measured
over an n-file landing zone so the state store sees n micro-batches).

SCALING.md method: sf0.1 documents replicated N× with distinct ids;
noop sink (full execution); one warm-up then one timed run. Training
is timed end-to-end (feature checkpoint + every epoch's scan+collect)
— the number a capacity plan needs.

Run from the repo root: ``python tools/scale_round10b_ops.py [N ...]``.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import text  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = [base]
    for i in range(1, n):
        copies.append(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).cache()


def timed(label: str, df) -> None:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.monotonic() - t0:.1f} s", flush=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-r10b", shuffle_partitions=32)
    import pandas as pd  # noqa: F401 — mapInPandas workers

    from etl_example_spark.plans.llm_ops import (
        _PTRON_DIM,
        _PTRON_EPOCHS,
        m46_dct_phash,
    )
    from etl_example_spark.streaming.sinks import run_to_memory
    from etl_example_spark.streaming.sources import DOCUMENTS_SCHEMA
    from etl_example_spark.streaming.stateful import quota_admission

    for n in ns:
        print(f"x{n}:", flush=True)
        docs = replicated(spark, n)
        docs.count()

        # d106: end-to-end training wall (3 epochs, actions included)
        t0 = time.monotonic()
        text.perceptron_train(
            docs, F.col("lang") == "en", dim=_PTRON_DIM,
            epochs=_PTRON_EPOCHS,
        )
        print(
            f"  d106_perceptron_train: {time.monotonic() - t0:.1f} s",
            flush=True,
        )

        timed(
            "s54_phrase_search",
            text.phrase_search(docs, ["slow", "hash", "batch"]),
        )

        # m46 via the SHARED kernel (llm_ops.m46_hash_frame) over the
        # replicated frame — the benchmark cannot drift from the op
        from etl_example_spark.plans.llm_ops import m46_hash_frame

        timed("m46_dct_phash", m46_hash_frame(docs))

        # st57: n-file landing zone -> n micro-batches through the
        # state store (maxFilesPerTrigger=1)
        land = tempfile.mkdtemp(prefix="quota_land_")
        for i in range(n):
            part = docs.filter(
                (F.col("doc_id") >= i * 10_000_000)
                & (F.col("doc_id") < (i + 1) * 10_000_000)
            )
            tmp = os.path.join(land, f"_b{i}")
            part.coalesce(1).write.parquet(tmp)
            import glob as _glob
            import shutil as _shutil

            p = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            _shutil.move(p, os.path.join(land, f"b{i:03d}.parquet"))
            _shutil.rmtree(tmp)
        stream = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(land)
        )
        t0 = time.monotonic()
        run_to_memory(
            quota_admission(stream, quota=10), output_mode="append"
        )
        print(
            f"  st57_quota_admission ({n} micro-batches): "
            f"{time.monotonic() - t0:.1f} s",
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
