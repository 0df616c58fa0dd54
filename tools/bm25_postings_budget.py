"""Measure the FULL-VOCABULARY BM25 postings build's real shuffle
volume (the s53 index-once artifact) and state the 100 TB budget.

The build's one inherent cost is the unrestricted token explode into
the (doc, term) tf aggregate — corpus-token-scaled, the d80/span-index
cost class. Unlike the span pass, the explode rows partial-aggregate
map-side (repeated terms within a document fold before the shuffle),
so bytes-per-token lands BELOW the span pass's despite a similar row
width; this tool reads the actual number from the Spark UI REST API.

Usage: python tools/bm25_postings_budget.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_example_spark.operators import text
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import load_table
from tools.span_shuffle_budget import rest, shuffle_bytes_since


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="bm25-postings-budget",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        F.count("*").alias("docs"),
        F.sum(F.length(F.coalesce("text", F.lit("")))).alias("bytes"),
        F.sum(text.token_count(F.coalesce("text", F.lit("")))).alias(
            "tokens"
        ),
    ).collect()[0]

    app = rest(spark, "applications")[0]["id"]
    job_floor = max(
        (j["jobId"] for j in rest(spark, f"applications/{app}/jobs")),
        default=-1,
    ) + 1

    postings = text.bm25_postings(docs, None)
    postings.write.format("noop").mode("overwrite").save()

    w, r = shuffle_bytes_since(spark, job_floor)
    n_postings = postings.count()  # AFTER the measurement window
    per_token = w / stats.tokens
    per_byte = w / stats.bytes
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "docs": stats.docs,
                "corpus_bytes": int(stats.bytes),
                "corpus_tokens": int(stats.tokens),
                "postings_rows": int(n_postings),
                "shuffle_write_bytes": int(w),
                "shuffle_read_bytes": int(r),
                "shuffle_write_per_token": round(per_token, 2),
                "shuffle_write_per_corpus_byte": round(per_byte, 3),
                "projected_shuffle_at_100TB_corpus_TB": round(
                    per_byte * 100e12 / 1e12, 1
                ),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
