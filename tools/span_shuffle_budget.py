"""Measure the span-dedup pass's REAL shuffle volume and state the
100 TB budget from it.

The one inherent cost of substring dedup (d80/d81) is the occurrence
stream: one (doc_id, pos, _h1, _h2) row PER CORPUS TOKEN enters the
first-occurrence aggregate, and distinct spans don't partial-aggregate
away — so unlike every other operator in the dedup family, the detect
pass's shuffle volume scales with corpus tokens, not with duplicate
count. This tool runs the pass at sf0.1 and reads the ACTUAL shuffle
write bytes from the Spark UI REST API (sum over the job's stages), then
normalizes to bytes-per-corpus-token and bytes-per-corpus-byte — the two
numbers a 100 TB launch plans around.

Usage: python tools/span_shuffle_budget.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_example_spark.operators import dedup
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import load_table


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def shuffle_bytes_since(spark, job_floor: int) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all stages
    of jobs with jobId >= job_floor."""
    app = rest(spark, "applications")[0]["id"]
    jobs = rest(spark, f"applications/{app}/jobs")
    stage_ids = {
        s
        for j in jobs
        if j["jobId"] >= job_floor
        for s in j["stageIds"]
    }
    stages = rest(spark, f"applications/{app}/stages")
    w = sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s["stageId"] in stage_ids
    )
    r = sum(
        s.get("shuffleReadBytes", 0)
        for s in stages
        if s["stageId"] in stage_ids
    )
    return w, r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # the engine session disables the UI; this tool needs the REST
    # metrics endpoint, so re-enable it for this process only
    spark = get_spark(
        app_name="span-shuffle-budget",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = load_table(spark, sf_dir, "documents")

    stats = docs.select(
        F.count("*").alias("docs"),
        F.sum(F.length(F.coalesce("text", F.lit("")))).alias("bytes"),
        F.sum(
            F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
        ).alias("tokens"),
    ).collect()[0]

    app = rest(spark, "applications")[0]["id"]
    job_floor = max(
        (j["jobId"] for j in rest(spark, f"applications/{app}/jobs")),
        default=-1,
    ) + 1

    # The detect pass WITHOUT the staged-artifact reuse (fresh scan →
    # aggregate → anti-join): the full inherent cost of one pass.
    dedup.clear_staged_caches()
    out = dedup.duplicated_spans(docs, span_tokens=8)
    out.write.format("noop").mode("overwrite").save()

    w, r = shuffle_bytes_since(spark, job_floor)
    per_token = w / stats.tokens
    per_byte = w / stats.bytes
    corpus_100tb = 100e12
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "docs": stats.docs,
                "corpus_bytes": int(stats.bytes),
                "corpus_tokens": int(stats.tokens),
                "shuffle_write_bytes": int(w),
                "shuffle_read_bytes": int(r),
                "shuffle_write_per_token": round(per_token, 2),
                "shuffle_write_per_corpus_byte": round(per_byte, 3),
                "projected_shuffle_at_100TB_corpus_TB": round(
                    per_byte * corpus_100tb / 1e12, 1
                ),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
