"""BPE tokenizer training on the corpus — the tokenizer-fitting step of
an LLM data pipeline, as distributed relational algebra.

Architecture (the same one production tokenizer trainers use): the corpus
is scanned ONCE to build the (word, count) vocabulary — Heap's law makes
that table tiny relative to the corpus — and every merge iteration then
runs on the vocab table only. The per-round argmax collects exactly ONE
row to the driver (like Lloyd's centroids in similarity.ivf_build);
document text never shuffles and never returns to the driver.

The merge rewrite is CANONICAL leftmost-greedy BPE, done at the unit-
array level with higher-order functions (no strings are rewritten, so no
shared-separator artifacts). Occurrences of pair (a, b) can only overlap
when a == b — inside runs of identical units — where greedy selection is
the alternation from each run's start. That makes the selected set
closed-form per position (no sequential scan):

    sel(p) = u[p]=a ∧ u[p+1]=b ∧ (a ≠ b ∨ (p - runstart(p)) even)

with runstart(p) = 1 + max{j < p : u[j] ≠ a} (0 if none). The rebuild is
``flatten(transform(...))`` emitting [ab] at selected positions, [] just
after them, [u[j]] elsewhere. The identical expressions exist in DuckDB
(list_transform/list_filter/flatten), so the full k-round iterative
training loop is hash-verified against an unrolled k-stage SQL oracle
(:func:`bpe_oracle_sql`), not rows-only-checked.

Determinism contract: pair counts are exact integers (every adjacent
pair counted, the canonical get_stats); the argmax tie-break is
(count DESC, pair ASC); characters are codepoints (corpus contract is
BMP text — astral pairs would split surrogates under Java regex).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Words longer than this are excluded from training (HF-tokenizers'
#: max_input_chars_per_word discipline): a single unbroken 10 kB token
#: (minified JS, base64 blobs) would make the per-word O(len²) merge
#: expression the whole job, while contributing no useful merges. The
#: oracle applies the identical cap.
MAX_WORD_CHARS = 64


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) vocabulary — the one corpus-wide scan + shuffle.
    Degenerate super-long words are dropped (``MAX_WORD_CHARS``)."""
    from etl_example_spark.operators.text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(
            (F.length("word") > 0)
            & (F.length("word") <= MAX_WORD_CHARS)
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _char_units(word: Column) -> Column:
    """``'abc'`` → ``['a', 'b', 'c']`` (codepoint units)."""
    return F.split(
        F.trim(F.regexp_replace(word, "(.)", "$1 ")), " "
    ).cast("array<string>")


def _adjacent_pairs(u: Column) -> Column:
    """All adjacent unit pairs as ``'left right'`` strings (canonical
    get_stats: every occurrence counts, including overlapping ones)."""
    return F.when(F.size(u) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(u) - 1),
            lambda p: F.concat_ws(
                " ", F.element_at(u, p), F.element_at(u, p + 1)
            ),
        )
    )


def pair_counts(units: DataFrame) -> DataFrame:
    """Adjacent-pair counts over all words, weighted by word count."""
    return (
        units.select("cnt", F.explode(_adjacent_pairs(F.col("u"))).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_pair(u: Column, a: str, b: str) -> Column:
    """Canonical leftmost-greedy merge of (a, b) in unit array ``u``.

    ``sel[p]`` marks merged occurrence starts (1-based); ``runstart`` is
    computed by an O(|word|²) prefix filter — words are tiny, the vocab
    table is small, and the expression stays wholly inside codegen.
    """
    la, lb = F.lit(a), F.lit(b)

    def runstart_even(p: Column) -> Column:
        prev_non_a = F.array_max(
            F.concat(
                F.array(F.lit(0)),
                F.when(
                    p == 1, F.array().cast("array<int>")
                ).otherwise(
                    F.filter(
                        F.sequence(F.lit(1), p - 1),
                        lambda j: F.element_at(u, j) != la,
                    )
                ),
            )
        )
        return (p - prev_non_a - 1) % 2 == 0

    def sel_at(p: Column) -> Column:
        occurrence = (
            (p < F.size(u))
            & (F.element_at(u, p) == la)
            & (F.element_at(u, p + 1) == lb)
        )
        if a == b:
            return occurrence & runstart_even(p)
        return occurrence

    sel = F.transform(F.sequence(F.lit(1), F.size(u)), sel_at)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(u)),
            lambda j: F.when(
                F.element_at(sel, j), F.array(F.concat(la, lb))
            )
            .when(
                (j > 1) & F.element_at(sel, j - 1),
                F.array().cast("array<string>"),
            )
            .otherwise(F.array(F.element_at(u, j))),
        )
    )


def bpe_fit(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
):
    """Learn ``n_merges`` BPE merges AND return the encoded vocabulary:
    ``(merges, units_df)`` with merges =
    ``[(rank, 'left right', pair_count), …]`` in merge order and
    units_df = (word, cnt, u) after every merge — the training
    by-product that IS the apply result for the training corpus, so
    fit-then-encode costs one corpus scan total (d79 reads it
    directly; :func:`bpe_apply_units` re-encodes a DIFFERENT corpus).

    Each round: count adjacent unit pairs across the vocab (weighted by
    word frequency), pick the (count DESC, pair ASC) argmax, rewrite
    every word's unit array with :func:`_merge_pair`. The vocab table is
    ``localCheckpoint``-pinned per round so round k+1 does not replay
    rounds 1..k's rewrites from the scan (linear, not quadratic,
    lineage). Stops early if no pair remains (all words fully merged).
    """
    units = (
        word_vocab(df, text_col)
        .select("word", "cnt", _char_units(F.col("word")).alias("u"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(units)
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["pair_count"])
        merges.append((rank, pair, cnt))
        a, b = pair.split(" ")
        units = units.select(
            "word", "cnt", _merge_pair(F.col("u"), a, b).alias("u")
        ).localCheckpoint(eager=True)
    return merges, units


def bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> list[tuple[int, str, int]]:
    """The merges alone (see :func:`bpe_fit`)."""
    merges, _units = bpe_fit(df, n_merges, text_col)
    return merges


def bpe_merges_df(
    df: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """:func:`bpe_train` as a DataFrame (merge_rank, pair, pair_count) —
    the registry surface. The result is merge-list-sized (k rows)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    merges = bpe_train(df, n_merges, text_col)
    schema = StructType(
        [
            StructField("merge_rank", LongType(), False),
            StructField("pair", StringType(), False),
            StructField("pair_count", LongType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(r), p, int(c)) for r, p, c in merges], schema
    )


def bpe_oracle_sql(n_merges: int = 6) -> str:
    """Generate the unrolled k-round DuckDB twin of :func:`bpe_train`.

    Round k's CTEs: ``u{k}`` (unit arrays), ``p{k}`` (pair counts),
    ``m{k}`` (the argmax row, split into pa/pb), ``u{k+1}`` (the
    canonical greedy rewrite — the same closed-form selection as
    :func:`_merge_pair`, in DuckDB list HOFs). The final SELECT unions
    the k argmax rows with their ranks.

    The learned pair is correlated through the CROSS JOIN of the one-row
    ``m{k}`` — the SQL is static; no training result is interpolated.
    """
    parts = _bpe_rounds_sql(n_merges)
    finals = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, pair, "
        f"CAST(pair_count AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f" SELECT * FROM ({finals}) ORDER BY merge_rank"
    )


def _bpe_rounds_sql(n_merges: int) -> list[str]:
    """The shared CTE chain (w, u1, then per-round p/m/s/u) used by both
    the training oracle (:func:`bpe_oracle_sql`) and the encode oracle
    (:func:`bpe_apply_oracle_sql`); ``word`` is carried through every
    round so the final unit arrays can join back to the corpus. Each
    round's s/u CTEs LEFT-join the one-row argmax so a vocabulary that
    fully merges before round k passes through unchanged — the exact
    mirror of bpe_train's early stop."""
    parts = [
        f"""
        w AS (
            SELECT tok AS word, COUNT(*) AS cnt FROM (
                SELECT unnest(string_split_regex(trim(lower(text)),
                                                 '\\s+')) AS tok
                FROM documents
            ) WHERE length(tok) > 0 AND length(tok) <= {MAX_WORD_CHARS} GROUP BY tok
        ),
        u1 AS (
            SELECT word, cnt,
                   list_transform(range(1, length(word) + 1),
                                  i -> word[i]) AS u
            FROM w
        )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""
        p{k} AS (
            SELECT u[i] || ' ' || u[i + 1] AS pair,
                   SUM(cnt) AS pair_count
            FROM (SELECT cnt, u, unnest(range(1, len(u))) AS i FROM u{k})
            GROUP BY pair
        ),
        m{k} AS (
            SELECT pair, pair_count,
                   string_split(pair, ' ')[1] AS pa,
                   string_split(pair, ' ')[2] AS pb
            FROM p{k} ORDER BY pair_count DESC, pair ASC LIMIT 1
        ),
        s{k} AS (
            SELECT word, cnt, u, pa, pb,
                   list_transform(range(1, len(u) + 1), p ->
                       p < len(u) AND u[p] = pa AND u[p + 1] = pb
                       AND (pa != pb OR
                            (p - list_max(list_concat([0],
                                 list_filter(range(1, p),
                                             j -> u[j] != pa))) - 1)
                            % 2 = 0)
                   ) AS sel
            FROM u{k} LEFT JOIN m{k} ON TRUE
        ),
        u{k + 1} AS (
            SELECT word, cnt,
                   flatten(list_transform(range(1, len(u) + 1), j ->
                       CASE WHEN sel[j] THEN [pa || pb]
                            WHEN j > 1 AND sel[j - 1] THEN []
                            ELSE [u[j]] END)) AS u
            FROM s{k}
        )"""
        )
    return parts


def bpe_apply_units(
    df: DataFrame,
    merges: list[tuple[int, str, int]],
    text_col: str = "text",
):
    """ENCODE a corpus with an already-learned merge list: the
    (word, n_units) table after applying every merge in rank order to
    ``df``'s vocabulary — for encoding a corpus OTHER than the one the
    merges were fit on (for the training corpus itself, :func:`bpe_fit`
    already returns the encoded vocabulary; reusing it saves this
    function's one corpus scan). Work after the scan is vocab-sized
    (Heap's law), per-merge one narrow rewrite. Words over
    ``MAX_WORD_CHARS`` are absent — callers fall back to character
    count (the same cap as training).
    """
    units = word_vocab(df, text_col).select(
        "word", _char_units(F.col("word")).alias("u")
    ).localCheckpoint(eager=True)
    for _rank, pair, _cnt in merges:
        a, b = pair.split(" ")
        units = units.select(
            "word", _merge_pair(F.col("u"), a, b).alias("u")
        ).localCheckpoint(eager=True)
    return units.select("word", F.size("u").alias("n_units"))


def bpe_apply_oracle_sql(n_merges: int = 6) -> str:
    """Unrolled DuckDB twin of train-then-encode: the same round CTEs as
    :func:`bpe_oracle_sql`, with the final unit arrays joined back to
    the exploded corpus for per-source token accounting (char-count
    fallback for words beyond the training cap, mirroring the Spark
    side)."""
    parts = _bpe_rounds_sql(n_merges)
    final_u = f"u{n_merges + 1}"
    return (
        "WITH "
        + ",".join(parts)
        + f""",
        corpus AS (
            SELECT source,
                   unnest(string_split_regex(trim(lower(text)),
                                             '\\s+')) AS word
            FROM documents
        )
        SELECT c.source,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(length(c.word)) AS BIGINT) AS n_chars,
               CAST(SUM(CASE WHEN v.word IS NULL THEN length(c.word)
                             ELSE len(v.u) END) AS BIGINT) AS n_units
        FROM (SELECT source, word FROM corpus WHERE length(word) > 0) c
        LEFT JOIN {final_u} v ON v.word = c.word
        GROUP BY c.source
        ORDER BY c.source"""
    )
