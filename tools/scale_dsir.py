"""Round-13 measurement: DSIR selection (d117) cost split at scale.

Wall time of the three DSIR stages over replicated sf0.1 documents
(x1/x4/x8):

- fit: two hashed-n-gram counting passes (target + raw), each ending
  in a dim-row model-sized collect — linear in corpus tokens but
  partial-aggregated map-side to <= dim rows, one pass each;
- score+select: the in-row literal-array fold + Gumbel key + top-100
  TakeOrderedAndProject — map-only, no shuffle.

Expected shape: both stages linear in corpus size (every DSIR stage
must read the pool once — that is the algorithm's floor), with
score+select well under fit (one pass vs two, no aggregation), and
NO superlinear term (no shuffle of corpus-sized data anywhere: the
only reduced data is the dim-row model and the 100-row shortlist).

Run solo (the numbers are meaningless next to a concurrent sweep):

    python tools/scale_dsir.py
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

DIM = 256


def main() -> None:
    spark = get_spark(app_name="scale-dsir", shuffle_partitions=8)
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )

    def replicate(times: int):
        big = docs
        for i in range(1, times):
            big = big.unionByName(
                docs.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    "text",
                    "lang",
                )
            )
        return big.repartition(8).localCheckpoint(eager=True)

    corpora = [("x1 (5k)", replicate(1)), ("x4 (20k)", replicate(4)),
               ("x8 (40k)", replicate(8))]
    # warm-up: codegen for both plan shapes
    warm = replicate(1).limit(200).localCheckpoint(eager=True)
    d0 = text.dsir_delta_train(
        warm.filter("lang = 'en'"), warm, dim=DIM
    )
    warm.select(
        "doc_id", text.dsir_logweight(d0, dim=DIM).alias("lw")
    ).orderBy(F.desc("lw")).limit(100).collect()

    results = []
    for name, pool in corpora:
        t0 = time.time()
        delta = text.dsir_delta_train(
            pool.filter("lang = 'en'"), pool, dim=DIM
        )
        t_fit = time.time() - t0
        t0 = time.time()
        keyed = pool.select(
            "doc_id",
            text.dsir_logweight(delta, dim=DIM).alias("logw_micro"),
        ).withColumn(
            "key_micro",
            F.col("logw_micro") + text.gumbel_micro("doc_id"),
        )
        n = (
            keyed.orderBy(F.desc("key_micro"), "doc_id")
            .limit(100)
            .count()
        )
        t_sel = time.time() - t0
        results.append(
            {"corpus": name, "fit_s": round(t_fit, 2),
             "select_s": round(t_sel, 2), "selected": n}
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
