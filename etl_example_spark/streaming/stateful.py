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
