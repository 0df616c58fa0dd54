"""Re-measure d99 gopher_repetition at replicated scale after the
round-10 zero-shuffle rewrite (sort + sequential-walk per document, no
explode, no exchange). SCALING.md method: sf0.1 documents replicated N×
with distinct ids; noop sink; one warm-up then one timed run.

Run from the repo root: ``python tools/scale_d99_rewrite.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators.text import (  # noqa: E402
    gopher_repetition_fractions,
)
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


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark(app_name="scale-d99", shuffle_partitions=32)
    for n in ns:
        docs = replicated(spark, n)
        docs.count()  # materialize the cache
        df = gopher_repetition_fractions(docs)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"d99 x{n}: {time.monotonic() - t0:.1f} s", flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()
