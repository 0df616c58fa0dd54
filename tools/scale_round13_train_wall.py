"""Round-13 measurement: the ANN training wall, full-corpus vs sampled.

Reproduces the SCALING.md round-13 table: wall time of the full
quantizer pair (ivf_train 16 cells x 2 iters + pq_train m=16 x 32
codes x 4 iters) over replicated sf0.1 embeddings, with and without
``max_train_rows=256`` (the deterministic hash-bottom training sample
— FAISS practice: quantizers train on a bounded sample, only the
assignment/encode pass is corpus-sized). Expected shape: the sampled
trainer is flat in corpus size (the fixed cost of 6 bounded Lloyd
jobs); the full trainer carries a linear corpus term that at 10^9+
vectors is the training-cost wall.

Run solo (the numbers are meaningless next to a concurrent sweep):

    python tools/scale_round13_train_wall.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_example_spark.operators.similarity import ivf_train, pq_train
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import load_table


def main() -> None:
    spark = get_spark(
        app_name="scale-round13-train-wall", shuffle_partitions=8
    )
    emb = load_table(
        spark, "/root/testdata/sf0.1", "embeddings"
    ).select("vec_id", "embedding")

    def replicate(times: int):
        big = emb
        for i in range(1, times):
            big = big.unionByName(
                emb.select(
                    (F.col("vec_id") + i * 100000).alias("vec_id"),
                    "embedding",
                )
            )
        return big.repartition(8).localCheckpoint(eager=True)

    corpora = [("x1 (2k)", emb), ("x4 (8k)", replicate(4)),
               ("x16 (32k)", replicate(16)), ("x64 (128k)", replicate(64))]
    # one throwaway bounded run absorbs JVM/codegen warm-up
    ivf_train(emb, 16, iters=1, max_train_rows=64).count()

    results = []
    for name, df in corpora:
        for mtr in (None, 256):
            t0 = time.time()
            ivf_train(df, 16, iters=2, max_train_rows=mtr).count()
            pq_train(
                df, m=16, n_codes=32, iters=4, max_train_rows=mtr
            ).count()
            results.append(
                {"corpus": name, "max_train_rows": mtr,
                 "wall_sec": round(time.time() - t0, 2)}
            )
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
