"""``python -m etl_example_spark`` — run the reference ETL lifecycle.

The runnable-container entry, mirroring the reference's
``CMD ["python", "src/job.py"]`` (``/root/reference/Dockerfile:22``,
``src/job.py:286-331`` main()): load the star schema, log pre-counts,
curate (date repair + quality delete with backup snapshot), log
post-counts, run the 4 validation queries, and print each result's first
10 rows as a table — the same observable lifecycle, executed by Spark
instead of a Postgres server.

Input selection:
- default: the deterministic synthetic dirty star schema
  (:mod:`etl_example_spark.fixtures`) — self-contained demo, no files
  needed;
- ``--ddl-dir DIR``: replay the reference's own ``*.sql`` DDL scripts
  (DROP/CREATE/INSERT) through the SQL-script source for full parity
  with the reference's file-driven load
  (``src/job.py:12-17`` STARTUP_SQL_FILES).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time


def _run_curation(spark, log, args) -> int:
    """``--curate``: the LLM-corpus half of the engine as a CLI — gate,
    dedup, near-dup removal, mixture sampling, optional shard export.
    Every stage decision is the deterministic one the registry verifies
    (d53 for the chain, d66/d67 for the shard manifest)."""
    import os

    from etl_example_spark.operators.corpus import corpus_stats, curate_corpus
    from etl_example_spark.operators.sampling import shard_assign
    from etl_example_spark.sources.writers import write_training_shards

    src = os.path.join(args.curate, "documents.parquet")
    docs = spark.read.parquet(src)
    log.info("corpus: %d documents from %s", docs.count(), src)
    # materialize once: the count, stats, shard manifest, and shard
    # write below would otherwise each re-run the whole chain
    # (including the LSH near-dup stage)
    curated = curate_corpus(docs).localCheckpoint(eager=True)
    log.info("curated: %d documents survive", curated.count())
    for row in corpus_stats(curated).collect():
        log.info(
            "stratum %s: %d docs, %d tokens",
            row[0], row["n_docs"], row["n_tokens"],
        )
    if args.shards_dest:
        sharded = shard_assign(curated, hex_digits=args.shard_digits)
        manifest = write_training_shards(sharded, args.shards_dest)
        for shard in sorted(manifest):
            log.info("shard %s: %d docs", shard, manifest[shard])
        log.info(
            "shards written: %s (%d shards, %d docs)",
            args.shards_dest, len(manifest), sum(manifest.values()),
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m etl_example_spark",
        description="Run the reference-parity ETL pipeline on Spark.",
    )
    parser.add_argument(
        "--ddl-dir",
        default=None,
        help="directory of reference-style *.sql DDL scripts to replay "
        "(default: generate the synthetic demo star schema in-process)",
    )
    parser.add_argument(
        "--rows",
        type=int,
        default=20_000,
        help="synthetic fact rows when no --ddl-dir is given",
    )
    parser.add_argument(
        "--backup-dest",
        default=None,
        help="after the pipeline, snapshot every table (curated fact "
        "included) to this directory — the reference's post-job "
        "backup.sh step (any Hadoop path, e.g. s3a://bucket/backups)",
    )
    parser.add_argument(
        "--curate",
        default=None,
        metavar="SRC_DIR",
        help="run the training-corpus curation pipeline instead of the "
        "reference lifecycle: read SRC_DIR/documents.parquet, apply the "
        "quality gate + exact dedup + MinHash-LSH near-dup removal + "
        "temperature mixture sampling, and report per-language stats",
    )
    parser.add_argument(
        "--shards-dest",
        default=None,
        help="with --curate: also export the curated corpus as "
        "hash-assigned training shards to this directory and log the "
        "per-shard manifest",
    )
    parser.add_argument(
        "--shard-digits",
        type=int,
        default=1,
        help="with --shards-dest: md5 hex digits in the shard key "
        "(16^N shards; default 1 = 16 shards)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        stream=sys.stdout,
    )
    log = logging.getLogger("etl_example_spark")

    from etl_example_spark.plans.pipeline import run_pipeline, show_results
    from etl_example_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(app_name="etl_example_spark")

    if args.curate:
        rc = _run_curation(spark, log, args)
        log.info("pipeline finished in %.2fs", time.time() - t0)
        spark.stop()
        return rc

    if args.ddl_dir:
        from etl_example_spark.sources.sql_script import load_star_schema

        tables = load_star_schema(spark, args.ddl_dir)
    else:
        from etl_example_spark.fixtures import make_reference_tables
        from etl_example_spark.schemas import REFERENCE_SCHEMAS

        tables = {
            name: spark.createDataFrame(pdf, schema=REFERENCE_SCHEMAS[name])
            for name, pdf in make_reference_tables(n_fact=args.rows).items()
        }

    result = run_pipeline(spark, tables)
    log.info("pre-curation counts: %s", result.pre_counts)
    log.info("problematic rows: %s", result.problematic)
    log.info("post-curation counts: %s", result.post_counts)
    for name, table in show_results(result.query_results).items():
        log.info("query %s:\n%s", name, table)
    if args.backup_dest:
        from etl_example_spark.sources.writers import backup_catalog

        snapshot = dict(tables)
        if result.curated is not None:
            snapshot["sellout"] = result.curated
        backup_dir = backup_catalog(spark, args.backup_dest, tables=snapshot)
        log.info("catalog backup written: %s", backup_dir)
    log.info("pipeline finished in %.2fs", time.time() - t0)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
