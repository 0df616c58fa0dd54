"""CDC-apply semantics on hand-built fixtures: update/insert/delete,
per-key compaction by sequence, and the conservative same-sequence rule."""

from __future__ import annotations

from etl_example_spark.operators.merge import (
    apply_cdc,
    latest_change_per_key,
    retire_tombstones,
)


def test_apply_cdc_update_insert_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 22.0, "U"),   # update existing
            (3, None, None, "D"),   # delete existing
            (4, "d", 40.0, "I"),    # insert new
            (5, None, None, "D"),   # delete of absent key: no-op
        ],
        "k long, name string, v double, op string",
    )
    got = sorted(
        (r.k, r.name, r.v)
        for r in apply_cdc(target, changes, ["k"]).collect()
    )
    assert got == [(1, "a", 10.0), (2, "b2", 22.0), (4, "d", 40.0)]


def test_apply_cdc_sequence_compaction(spark):
    target = spark.createDataFrame([(1, "a")], "k long, name string")
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 3),   # latest wins
            (1, "a-dead", "D", 2),
            (2, "b1", "I", 1),
            (2, None, "D", 2),   # delete after insert: key never lands
        ],
        "k long, name string, op string, seq long",
    )
    got = sorted(
        (r.k, r.name)
        for r in apply_cdc(
            target, changes, ["k"], sequence_col="seq"
        ).collect()
    )
    assert got == [(1, "a2")]


def test_apply_cdc_out_of_order_batches_converge(spark):
    """Sequence-persistent merge: when the target carries the sequence
    column (and a tombstone flag), applying change batches in ANY order
    converges to the same live state — a late batch with older sequences
    can't clobber newer state, and a stale update can't resurrect a
    deleted key."""
    from pyspark.sql import functions as F

    batch_a = spark.createDataFrame(
        [(1, "new", "U", 10), (2, None, "D", 12), (3, "c3", "I", 11)],
        "k long, name string, op string, seq long",
    )
    batch_b = spark.createDataFrame(
        [(1, "old", "U", 5), (2, "stale-after-delete", "U", 6)],
        "k long, name string, op string, seq long",
    )
    empty_state = (
        spark.createDataFrame([], "k long, name string, seq long")
        .withColumn("_deleted", F.lit(False))
    )

    def apply_all(batches):
        state = empty_state
        for b in batches:
            state = apply_cdc(
                state, b, ["k"], sequence_col="seq",
                tombstone_col="_deleted",
            )
        return sorted(
            (r.k, r.name)
            for r in state.filter("NOT _deleted").collect()
        )

    in_order = apply_all([batch_b, batch_a])
    out_of_order = apply_all([batch_a, batch_b])
    assert in_order == out_of_order == [(1, "new"), (3, "c3")]
    # replaying a batch is a no-op
    replayed = apply_all([batch_b, batch_a, batch_a, batch_b])
    assert replayed == in_order


def test_retire_tombstones_retention_contract(spark):
    """The retention sweep's documented contract: before retirement a
    stale update is blocked by the tombstone; after retirement the same
    stale update re-inserts (the caller-accepted risk of choosing the
    watermark), while fresh updates work identically in both worlds and
    live rows are never swept."""
    from pyspark.sql import functions as F

    empty_state = (
        spark.createDataFrame([], "k long, name string, seq long")
        .withColumn("_deleted", F.lit(False))
    )
    deletes = spark.createDataFrame(
        [(1, None, "D", 10), (2, None, "D", 50), (3, "live", "I", 40)],
        "k long, name string, op string, seq long",
    )
    state = apply_cdc(
        empty_state, deletes, ["k"], sequence_col="seq",
        tombstone_col="_deleted",
    ).localCheckpoint()
    stale = spark.createDataFrame(
        [(1, "stale", "U", 5)], "k long, name string, op string, seq long"
    )
    fresh = spark.createDataFrame(
        [(1, "fresh", "U", 99)], "k long, name string, op string, seq long"
    )

    def live(df):
        return sorted(
            (r.k, r.name) for r in df.filter("NOT _deleted").collect()
        )

    # pre-retirement: tombstone blocks the stale update
    blocked = apply_cdc(
        state, stale, ["k"], sequence_col="seq", tombstone_col="_deleted"
    )
    assert live(blocked) == [(3, "live")]

    # retire tombstones below seq 20: k=1's (seq 10) goes, k=2's
    # (seq 50) and the live row k=3 stay
    swept = retire_tombstones(state, 20, "seq", "_deleted").localCheckpoint()
    assert sorted((r.k, bool(r._deleted)) for r in swept.collect()) == [
        (2, True), (3, False),
    ]

    # post-retirement: the same stale update is a (documented) re-insert
    resurrected = apply_cdc(
        swept, stale, ["k"], sequence_col="seq", tombstone_col="_deleted"
    )
    assert live(resurrected) == [(1, "stale"), (3, "live")]

    # fresh updates behave identically post-retirement
    updated = apply_cdc(
        swept, fresh, ["k"], sequence_col="seq", tombstone_col="_deleted"
    )
    assert live(updated) == [(1, "fresh"), (3, "live")]


def test_same_sequence_delete_wins(spark):
    changes = spark.createDataFrame(
        [(1, "u", "U", 5), (1, None, "D", 5)],
        "k long, name string, op string, seq long",
    )
    final = latest_change_per_key(changes, ["k"], "seq").collect()
    assert len(final) == 1 and final[0].op == "D"


def test_chunk_audio_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_example_spark.operators import multimodal
    from etl_example_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = multimodal.attach_mixed_media(docs)
    chunks = multimodal.chunk_audio(media, chunk_ms=2000, max_chunks=16)
    durations = {
        r.doc_id: r.media.duration_ms
        for r in media.collect()
        if r.media.modality == "audio"
    }
    rows = chunks.collect()
    assert {r.doc_id for r in rows} == set(durations)
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        dur = durations[doc_id]
        assert len(rs) == min((dur + 1999) // 2000, 16)
        for i, r in enumerate(rs):
            assert r.chunk_idx == i
            assert r.start_ms == i * 2000
            assert r.end_ms == min((i + 1) * 2000, dur)
    # chunks never overlap and are contiguous until the cap
    assert all(
        rs[i].end_ms == rs[i + 1].start_ms or rs[i].end_ms == 2000 * (i + 1)
        for rs in per_doc.values()
        for i in range(len(rs) - 1)
    )


class TestRetractableState:
    def test_merge_law_including_retraction_before_insert(self, spark):
        """state(b1 ∪ b2) == merge(state(b1), state(b2)) even when a
        retraction lands in an earlier batch than its insert — the case
        a per-batch liveness filter would corrupt."""
        from etl_example_spark.operators.merge import (
            live_rows,
            merge_retractable_states,
            retractable_state,
        )

        b1 = spark.createDataFrame(
            # u2's retraction arrives BEFORE its insert (in b2)
            [(1, 1, 500), (1, 1, 300), (2, -1, 700)],
            ["user_id", "op", "cents"],
        )
        b2 = spark.createDataFrame(
            [(1, -1, 500), (2, 1, 700), (3, 1, 100)],
            ["user_id", "op", "cents"],
        )
        whole = retractable_state(b1.unionByName(b2))
        merged = merge_retractable_states(
            retractable_state(b1), retractable_state(b2)
        )
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )
        live = {r.user_id: (r.n_live, r.cents_sum) for r in live_rows(merged).collect()}
        assert live == {1: (1, 300), 3: (1, 100)}  # u2 fully retracted
