"""MERGE / CDC-apply — the upsert operator, Spark-first.

The reference's only mutation is DELETE-with-backup (``src/job.py:237-247``,
operators/curation.backup_then_remove). Real ingest pipelines need the
general form: apply a batch of keyed changes (inserts, updates, deletes —
a CDC stream's compacted output) to a large table. Transactional formats
spell this ``MERGE INTO``; on plain parquet the engine expresses it as a
pure transformation plus the same write-new-then-swap discipline as the
curation delete.

Plan shape: one anti-join of target against the (small) change-key set +
one union — the change batch broadcasts, so the 100 TB target shuffles
ZERO times: surviving target rows stream through, changed rows append.
Per-key conflict resolution (late-arriving CDC events) is a ranking
window over the change batch only, never the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Compact a CDC batch to its final state per key: the change with the
    highest ``sequence_col`` wins; a same-sequence tie goes to the delete
    (the conservative reading)."""
    # ascending op puts 'D' before 'I'/'U', so a same-sequence delete wins
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(sequence_col), F.asc(op_col)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    sequence_col: str | None = None,
) -> DataFrame:
    """Merged table state after applying ``changes`` to ``target``.

    ``changes`` carries full row images in the target's schema plus
    ``op_col`` ('U'/'I'/``delete_op``) and optionally ``sequence_col``.
    Matched keys are replaced (or dropped for deletes); unmatched
    non-delete changes insert. Result schema == target schema.
    """
    if sequence_col is not None:
        changes = latest_change_per_key(
            changes, key_cols, sequence_col, op_col
        ).drop(sequence_col)
    keys = changes.select(*key_cols)
    survivors = target.join(F.broadcast(keys), key_cols, "left_anti")
    upserts = changes.filter(F.col(op_col) != delete_op).select(
        *target.columns
    )
    return survivors.unionByName(upserts)
