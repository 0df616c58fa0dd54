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
    tombstone_col: str | None = None,
) -> DataFrame:
    """Merged table state after applying ``changes`` to ``target``.

    ``changes`` carries full row images in the target's schema plus
    ``op_col`` ('U'/'I'/``delete_op``) and optionally ``sequence_col``.
    Matched keys are replaced (or dropped for deletes); unmatched
    non-delete changes insert. Result schema == target schema.

    **Cross-batch staleness**: when the *target itself carries*
    ``sequence_col`` (the applied-sequence-per-key state), changes whose
    sequence is not strictly newer than the target's are dropped — a
    late-replayed batch carrying older sequences can no longer overwrite
    newer state, and replaying the same batch is a no-op. Pass
    ``tombstone_col`` (also persisted in the target) to make deletes
    leave a flagged tombstone row instead of vanishing, so a stale
    update arriving *after* the delete cannot resurrect the key. Without
    a target sequence column the merge is single-batch last-writer-wins
    (within-batch compaction only), as before.
    """
    if sequence_col is not None and sequence_col in target.columns:
        return _apply_cdc_sequenced(
            target, changes, key_cols, op_col, delete_op,
            sequence_col, tombstone_col,
        )
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


def _apply_cdc_sequenced(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str,
    delete_op: str,
    sequence_col: str,
    tombstone_col: str | None,
) -> DataFrame:
    """Sequence-aware merge: the target persists the applied sequence per
    key (and optionally a delete tombstone), so batches may arrive out of
    order or be replayed — only strictly-newer changes apply.

    Plan shape (the target never shuffles): one broadcast-semi scan of
    the target to fetch current sequences for the (small) change-key set,
    one broadcast-anti scan for survivors, one union. The per-key current
    sequences are at most |change keys| rows, so both joins broadcast.
    """
    compacted = latest_change_per_key(
        changes, key_cols, sequence_col, op_col
    )
    keys = compacted.select(*key_cols)
    current = (
        target.join(F.broadcast(keys), key_cols, "left_semi")
        .select(*key_cols, F.col(sequence_col).alias("_cur_seq"))
    )
    effective = (
        compacted.join(F.broadcast(current), key_cols, "left")
        .filter(
            F.col("_cur_seq").isNull()
            | (F.col(sequence_col) > F.col("_cur_seq"))
        )
        .drop("_cur_seq")
    )
    survivors = target.join(
        F.broadcast(effective.select(*key_cols)), key_cols, "left_anti"
    )
    if tombstone_col is not None:
        upserts = effective.withColumn(
            tombstone_col, F.col(op_col) == delete_op
        ).select(*target.columns)
    else:
        # no tombstones: a delete forgets the key's sequence, so a stale
        # update arriving after it would re-insert — callers needing
        # out-of-order delete safety must persist tombstone_col
        upserts = effective.filter(F.col(op_col) != delete_op).select(
            *target.columns
        )
    return survivors.unionByName(upserts)


def retire_tombstones(
    target: DataFrame,
    older_than_seq: int,
    sequence_col: str,
    tombstone_col: str,
) -> DataFrame:
    """Retention sweep for sequenced-CDC tombstones: drop tombstone rows
    whose applied sequence is strictly below ``older_than_seq``.

    Tombstones exist to block stale resurrection (a late update older
    than the delete must not re-insert the key), but without retirement
    the target grows monotonically with deletes. The caller supplies the
    retention watermark — typically "the oldest sequence any still-
    replayable batch could carry" (e.g. the CDC source's retention
    horizon).

    **The accepted risk, stated**: after a tombstone is retired, a stale
    update for that key with sequence >= ``older_than_seq``-old but
    below the delete's sequence is indistinguishable from a fresh
    insert and WILL re-insert the key. Choosing the watermark IS
    choosing that trade: set it no higher than the minimum sequence the
    transport can still replay. Live rows are never touched — only rows
    with ``tombstone_col`` true and ``sequence_col`` < the watermark.

    Plan shape: a single filter over the target — no shuffle, no join;
    composes with the write-new-then-swap discipline like every other
    mutation here.
    """
    return target.filter(
        ~(
            F.col(tombstone_col)
            & (F.col(sequence_col) < F.lit(older_than_seq))
        )
    )


def retractable_state(
    deltas: DataFrame,
    key_col: str = "user_id",
    op_col: str = "op",
    cents_col: str = "cents",
) -> DataFrame:
    """Materialized-view state from a changelog of signed deltas
    (op = +1 insert / −1 retraction): per key, live row count and exact
    cents sum. The retraction algebra every incremental engine
    (Flink/Materialize-style) runs on: state is a pair of SUMs, so
    maintenance is one partial-aggregated shuffle per batch and two
    states merge by addition (:func:`merge_retractable_states` — the
    law tests/test_merge.py pins). The state deliberately keeps
    non-positive counts: a retraction can land in an earlier batch than
    its insert, so filtering liveness per batch would break the merge
    law — liveness is a READ-time filter (:func:`live_rows`), and a
    fully retracted key vanishes there without any tombstone because
    the count IS the liveness.
    """
    return deltas.groupBy(key_col).agg(
        F.sum(op_col).alias("n_live"),
        F.sum(F.col(op_col) * F.col(cents_col)).alias("cents_sum"),
    )


def merge_retractable_states(
    a: DataFrame, b: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Combine two retractable states by addition — the incremental
    maintenance step: state(batch₁ ∪ batch₂) =
    merge(state(batch₁), state(batch₂)). Full-outer join on the key
    (both sides are state-sized, not changelog-sized), coalesced sums,
    no liveness filter (read through :func:`live_rows`)."""
    an = a.select(
        F.col(key_col),
        F.col("n_live").alias("_n_a"),
        F.col("cents_sum").alias("_c_a"),
    )
    bn = b.select(
        F.col(key_col),
        F.col("n_live").alias("_n_b"),
        F.col("cents_sum").alias("_c_b"),
    )
    zero = F.lit(0).cast("long")
    return (
        an.join(bn, key_col, "full_outer")
        .select(
            key_col,
            (F.coalesce("_n_a", zero) + F.coalesce("_n_b", zero)).alias(
                "n_live"
            ),
            (F.coalesce("_c_a", zero) + F.coalesce("_c_b", zero)).alias(
                "cents_sum"
            ),
        )
    )


def live_rows(state: DataFrame) -> DataFrame:
    """The queryable view of a retractable state: keys with at least one
    un-retracted insert."""
    return state.filter(F.col("n_live") > 0)
