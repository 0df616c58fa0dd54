"""Measure the round-10 additions at replicated scale: the composed
clean_text chain (d101), the WARC crawl source + extraction (d102) and
the crawl-to-corpus chain (d103, scaled via the source's ``rows``
option), the full-vocabulary BM25 index build + serve (s53), the
scale-invariant phash (m45), and the corpus snapshot diff (d104).

SCALING.md method: sf0.1 documents replicated N× with distinct ids
(crawl ops scale the synthetic record count instead — the source IS the
dataset); noop sink (full execution); one warm-up then one timed run.

Run from the repo root: ``python tools/scale_round10_ops.py [N ...]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_example_spark.operators import extraction, multimodal, text  # noqa: E402
from etl_example_spark.operators.corpus import snapshot_diff  # noqa: E402
from etl_example_spark.session import get_spark  # noqa: E402
from etl_example_spark.sources.warc import (  # noqa: E402
    register_warc_datasource,
)

SF_DIR = "/root/testdata/sf0.1"
BASE_CRAWL = 4000


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
    spark = get_spark(app_name="scale-r10", shuffle_partitions=32)
    register_warc_datasource(spark)

    import pandas as pd  # noqa: F401 — mapInPandas workers

    for n in ns:
        print(f"x{n}:", flush=True)
        docs = replicated(spark, n)
        docs.count()

        # d101: HTML wrap + mojibake corruption + composed clean_text
        corrupted = F.concat(
            F.lit("<html><body><p>"),
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" "),
                F.lit("Ã&nbsp; "),
            ),
            F.lit("</p></body></html>"),
        )
        timed(
            "d101 clean_text chain",
            docs.select(
                "doc_id", corrupted.alias("html")
            ).select(
                "doc_id", extraction.clean_text("html").alias("text")
            ),
        )

        # d102/d103: crawl source scaled by record count
        crawl = (
            spark.read.format("synthetic_warc")
            .option("rows", BASE_CRAWL * n)
            .option("partitions", 32)
            .option("dupEvery", 7)
            .load()
        )
        timed(
            f"d102 warc_extract ({BASE_CRAWL * n} records)",
            crawl.select(
                "url", extraction.strip_html("html").alias("text")
            ),
        )
        txt = crawl.select(
            "url", extraction.strip_html("html").alias("text")
        )
        timed(
            "d103 crawl_to_corpus",
            txt.filter(text.token_count("text") >= 5)
            .groupBy(F.md5("text").alias("_fp"))
            .agg(
                F.min("url").alias("keep_url"),
                F.count("*").alias("n_copies"),
            ),
        )

        # s53: full-vocabulary postings build (the corpus-scaled cost)
        timed("s53 postings build", text.bm25_postings(docs, None))

        # m45: decode -> resize -> hash through the real codec, 2 scales
        def hashes(batches):
            import hashlib

            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = []
                for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                    d = hashlib.md5((t or "").encode()).digest()
                    vals = np.frombuffer(d, dtype=np.uint8).reshape(2, 8)
                    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
                    up = np.repeat(np.repeat(img, 2, 0), 2, 1)
                    hs = [
                        multimodal.average_hash(
                            multimodal.nn_resize(
                                multimodal.decode_media(
                                    multimodal.encode_jpeg(im), "jpeg"
                                ),
                                8,
                                8,
                            )
                        )
                        for im in (img, up)
                    ]
                    lo, hi = multimodal.ahash_words(hs[0])
                    rows.append((doc_id, lo, hi, hs[0] == hs[1]))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "lo", "hi", "inv"]
                )

        timed(
            "m45 scale_invariant_phash",
            docs.select("doc_id", "text").mapInPandas(
                hashes,
                "doc_id long, lo long, hi long, inv boolean",
            ),
        )

        # d104: snapshot diff at corpus scale
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
        timed("d104 snapshot_diff", snapshot_diff(v1, v2))

        docs.unpersist()


if __name__ == "__main__":
    main()
