"""Sequence packing: assign documents to fixed-token-budget training bins.

The standard "concat-and-chunk" packing used to build LLM training
examples (GPT-style): documents are laid end-to-end in a deterministic
order and the token stream is cut every ``budget`` tokens; a document
belongs to the chunk where it *starts*. The assignment is a pure
function of (group, order, token counts) — integer arithmetic only, so
it is reproducible across engines and cluster layouts and hash-checked
against a DuckDB oracle (plans/llm_ops d46).

Scale shape: ONE window cumulative sum partitioned by ``group_col``
(shard/source), so packing parallelizes across groups and never needs a
global sort. At 100 TB you pack per shard — add a shard key derived from
the layout (file, bucket) to ``group_col``; a single global ordering
would serialize the cumsum and is deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_example_spark.operators.text import token_count


def pack_concat_chunks(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Per-document bin assignment under concat-and-chunk packing.

    Within each ``group_col`` partition, documents are concatenated in
    ``id_col`` order; ``bin_id = start_offset // budget`` where
    ``start_offset`` is the running token count before the document.
    Returns the input keys plus (n_tokens, start_offset, bin_id).
    """
    toks = n_tokens if n_tokens is not None else token_count(text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        F.col(group_col),
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
    ).select(
        group_col,
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "start_offset"
        ),
    ).withColumn("bin_id", F.floor(F.col("start_offset") / budget))


def pack_stats(
    packed: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(group, bin) packing profile: documents started, tokens
    contributed, and first/last document — the audit table a packing job
    materializes next to the chunks themselves."""
    return packed.groupBy(group_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def pack_segments(
    seg: DataFrame,
    budget: int,
    group_col: str = "source",
    order_cols: tuple[str, ...] = ("doc_id", "seg_idx"),
) -> DataFrame:
    """Concat-and-chunk packing over SEGMENT rows — the multimodal
    generalization of :func:`pack_concat_chunks`: segments (media
    placeholders, text spans) are laid end-to-end per ``group_col`` in
    ``order_cols`` order and the interleaved token stream is cut every
    ``budget`` tokens; a segment belongs to the bin where it starts.
    Same scale shape: ONE window cumulative sum per group, parallel
    across groups, never a global sort. Input must carry ``n_tokens``;
    all input columns ride through plus (start_offset, bin_id)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seg.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    ).withColumn("bin_id", F.floor(F.col("start_offset") / budget))
