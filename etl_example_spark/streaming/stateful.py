"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for semantics the built-in windows can't express: the
stream is grouped by key, each micro-batch hands the operator that key's
new rows (as Arrow-batched pandas) plus a per-key ``GroupState`` that
persists across batches in the state store. Partitioning is by group key,
so state shards across executors exactly like a shuffle.

``first_seen_dedup`` is the canonical instance: streaming exact-dedup
that emits only the first occurrence of each (user_id, event_type) pair
— the streaming analog of batch keep-first dedup
(operators/dedup.exact_dedup). Within a batch, rows are ordered by
(ts, event_id) before the first is chosen, so output is deterministic
and oracle-checkable (ROW_NUMBER() = 1 in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("first_event_id", T.LongType()),
    ]
)

#: per-key state: has this key emitted yet?
_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # key already emitted in an earlier micro-batch
    best: pd.DataFrame | None = None
    for pdf in batches:
        cand = pdf.sort_values(["ts", "event_id"]).head(1)
        if best is None or (
            cand.iloc[0]["ts"],
            cand.iloc[0]["event_id"],
        ) < (best.iloc[0]["ts"], best.iloc[0]["event_id"]):
            best = cand
    if best is None:
        return
    state.update((True,))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "event_type": [str(key[1])],
            "first_ts": [best.iloc[0]["ts"]],
            "first_event_id": [int(best.iloc[0]["event_id"])],
        }
    )


def first_seen_dedup(events: DataFrame) -> DataFrame:
    """Streaming keep-first dedup over (user_id, event_type): one output
    row per key, ever, carrying the earliest (ts, event_id) occurrence.

    Ingestion contract (enforced here, not assumed): rows missing the
    key or the event time are dropped BEFORE grouping — a NULL key
    would reach the state kernel as a (None, None) group and crash its
    int()/str() emit path (a single malformed event must never kill a
    streaming job), and a NULL ts cannot be anyone's "first"."""
    valid = events.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return valid.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _quota_schema(key_field: T.StructField) -> T.StructType:
    """Output schema of :func:`quota_admission`: the quota key keeps
    its INPUT name and type (a caller capping by a long host_id must
    get a long back, not a stringified copy), then (doc_id,
    admit_seq)."""
    return T.StructType(
        [
            T.StructField(key_field.name, key_field.dataType),
            T.StructField("doc_id", T.LongType()),
            T.StructField("admit_seq", T.LongType()),
        ]
    )


#: per-key state: documents admitted so far
_QUOTA_STATE_SCHEMA = T.StructType(
    [T.StructField("n_admitted", T.LongType())]
)


def _quota_fn_factory(quota: int, key_col: str):
    def _quota_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n_admitted,) = state.get if state.exists else (0,)
        n_admitted = int(n_admitted)
        if n_admitted >= quota:
            return  # key exhausted in earlier micro-batches
        rows = pd.concat(list(batches), ignore_index=True)
        take = rows.sort_values("doc_id").head(quota - n_admitted)
        if take.empty:
            return
        state.update((n_admitted + len(take),))
        yield pd.DataFrame(
            {
                # key value passes through UNCOERCED — name and type
                # are the caller's (see _quota_schema)
                key_col: [key[0]] * len(take),
                "doc_id": take["doc_id"].astype("int64").to_numpy(),
                "admit_seq": n_admitted
                + pd.RangeIndex(1, len(take) + 1).to_numpy(),
            }
        )

    return _quota_fn


def quota_admission(
    docs: DataFrame, quota: int = 10, key_col: str = "source"
) -> DataFrame:
    """Streaming per-key ADMISSION QUOTA: admit at most ``quota``
    documents per ``key_col`` across the whole stream — the ingest-time
    form of the per-host/per-domain frequency cap (operators'
    d64/d105 batch caps), enforced while the corpus arrives instead of
    by a later full-corpus pass. Per-key GroupState carries the
    admitted count across micro-batches; within a batch, candidates
    admit in doc_id order, so with an id-ordered landing zone the
    admitted set is exactly ROW_NUMBER() OVER (PARTITION BY key ORDER
    BY doc_id) <= quota — externally oracle-checkable.

    Ingestion contract (enforced, not assumed): rows missing the key
    or the id are dropped before grouping — a NULL key has no quota
    bucket (and would otherwise occupy a None group in the state
    store), and a NULL id cannot take a deterministic admission slot.
    The key column keeps its input NAME and TYPE in the output (see
    :func:`_quota_schema`) so the admission log joins back to the
    payload on the original key.

    At scale: state is ONE counter per key (bytes, not documents);
    partitioning is by the quota key, so hot domains shard the same
    way their documents already shuffle. Emitted rows carry
    (key, doc_id, admit_seq) — the admission LOG; joining it back to
    the payload is the consumer's (cheap, semi-join) choice, so
    document text never passes through the Python state kernel."""
    valid = docs.filter(
        F.col(key_col).isNotNull() & F.col("doc_id").isNotNull()
    )
    return valid.groupBy(F.col(key_col)).applyInPandasWithState(
        _quota_fn_factory(quota, key_col),
        outputStructType=_quota_schema(docs.schema[key_col]),
        stateStructType=_QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
