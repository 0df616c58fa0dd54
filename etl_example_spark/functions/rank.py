"""Exact global order statistics without the single-task funnel.

``Window.orderBy(...)`` with no partition spec is the one Spark
construct that is *always* wrong at scale: EnsureRequirements plans
``Exchange SinglePartition`` beneath it, so the window's entire input —
a 100 M-term vocabulary, a 100 TB corpus scan — sorts on ONE task
(Spark itself logs "Moving all data to a single partition" every time).
Yet exact global ``row_number``/``NTILE``/running totals are legitimate
asks (decile budgeting, coverage curves, hybrid-retrieval rank fusion).

This module computes them as the classic two-pass rank — local rank
within a range partition + the earlier partitions' row counts — with
one deliberate twist: the range partition id is a **pure function of
the row's own key**, never of execution state.

Why not ``repartitionByRange`` + ``spark_partition_id()``: Spark's
range partitioner samples its boundaries with a seed derived from the
materialized RDD's id, so two materializations of the same logical
subtree pick DIFFERENT boundaries. Any DAG that forks above the
exchange (the count pass and the local-rank pass both consume it)
is only consistent if Catalyst's ReuseExchange deduplicates the two
subtrees — and per-branch column pruning silently defeats that (the
count branch prunes payload columns, the rank branch keeps them, the
canonical forms diverge, each branch samples its own boundaries, and
the offsets mis-align: an observed, reproducible wrong answer, 11
"deciles" from NTILE(10)). Cache is no stronger: a recomputed cached
partition (executor loss — routine on a 1000-node cluster) replays the
nondeterministic sample per-branch. Correctness may not depend on an
optimizer rule firing.

So the boundaries are computed once, deterministically, from the data —
**inside the plan**, as a scalar subquery, so that *building* or
EXPLAINing the plan never launches a Spark job (plan audits and
registry lints build every registered query; a build-time corpus scan
would make printing a plan cost a corpus pass):

1. A bounded sampling subquery: the ``S`` rows with the smallest
   ``xxhash64`` of the key (``orderBy(hash).limit(S)`` — a
   TakeOrderedAndProject per-partition heap, one scan, ≤ S narrow key
   tuples). A hash-bottom-S sample is a uniform random sample that any
   re-execution reproduces bit-for-bit.
2. The sample collapses to ONE row holding the key tuples as an array
   (``collect_list`` — the same ≤ S tuples the driver used to collect,
   now reduced executor-side); pure array expressions sort it under
   the requested order spec (``array_sort`` with an explicit
   lexicographic comparator honoring per-column direction and null
   placement) and keep ``numPartitions − 1`` evenly spaced,
   deduplicated boundary keys.
3. The one-row boundary array enters the main plan as a scalar
   subquery (``DataFrame.scalar()`` — executed once at the first
   action, its ≤ P-element result inlined). In-row,
   ``__gr_pid = |{b : b <ₛₚₑ𝚌 key(row)}|`` (an ``F.filter`` fold over
   the boundary array with the same comparator). The count of a fixed
   set under a monotone predicate is monotone in the key, so
   ``global order ≡ (pid, local order)`` holds for ANY fixed boundary
   set — sampling quality affects balance only, never correctness —
   and every fork/recompute assigns identical pids.
4. Local rank: ordinary window partitioned by ``__gr_pid``; offsets:
   per-pid counts (a ``≤ numPartitions``-row aggregate) turned into
   exclusive prefix sums by the one remaining single-partition window —
   over bounded input by construction (plan-lint recognizes the
   ``__gr_pid`` key) — then broadcast-joined back.

Cost: the sampling subquery re-evaluates the key expressions once at
execution time. That is not an overhead vs ``orderBy``: Spark's own
range sort runs the same hidden sampling job over its child; this one
is merely deterministic — and lazy, like Spark's own (no job until an
action). Callers that already hold a boundary artifact (the same
contract as BM25 serving's stored stats) pass ``boundaries=`` and skip
the sampling subquery entirely.

The per-row pid is an UNROLLED log₂(P) bitwise binary search over the
sorted boundary array (each step its own projection — a single inlined
expression would grow ~3^depth nodes): measured, the naive O(P) filter
fold degrades 5.3 s → 135 s going P=32 → P=512 on the same input,
while the search stays flat — P in the thousands is exactly the
production regime.

Correctness requires the order to be a TOTAL order (callers pass a
unique tie-break column, the same discipline every registered top-k
query already follows).

Replaces the reference pattern of ``NTILE(n) OVER (ORDER BY ...)`` /
``ROW_NUMBER() OVER (ORDER BY ...)`` (PostgreSQL window SQL, cf.
/root/reference/sql/queries.sql) at scales where a one-task sort is
not an option.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Internal column names — prefixed so plan-lint can recognize the
#: bounded offsets window / bounded sampling subquery and callers'
#: columns never collide.
_PID = "__gr_pid"
_BNDS = "__gr_bounds"
_SAMPLE = "__gr_sample"
_LOCAL = "__gr_local"
_OFF = "__gr_off"
_CNT = "__gr_cnt"
_SUM_LOCAL = "__gr_sum_local"
_SUM_OFF = "__gr_sum_off"

#: sample size per requested partition — enough for a few-percent
#: balance error; the boundary subquery never reduces more than
#: _SAMPLES_PER_PART * P narrow key tuples into its one-row array.
_SAMPLES_PER_PART = 40

#: materialization strategies for the ranged intermediate (the frame
#: both the count pass and the local-rank pass consume).
_MATERIALIZE_MODES = ("cache", "local_checkpoint", "checkpoint", "none")
_MATERIALIZE_CONF = "spark.etl_example_spark.rank.materialize"

#: Every ranged intermediate persisted under ``materialize='cache'``.
#: Unlike the old localCheckpoint RDDs (reclaimed by ContextCleaner
#: once the frame is released), CacheManager entries live until an
#: explicit unpersist — a long-lived session issuing many transient
#: ranks would otherwise accumulate disk-backed cache blocks without
#: bound. Strong references on purpose: the JVM cache entry is keyed
#: by logical plan, so once the Python wrapper is gone there is no
#: handle left to unpersist THAT entry with; the wrappers themselves
#: are tiny plan objects. Call :func:`release_rank_caches` when the
#: rank outputs have been consumed (or pass ``materialize='none'`` /
#: ``'local_checkpoint'`` for transient ranks).
_CACHE_REGISTRY: list[DataFrame] = []


def release_rank_caches() -> int:
    """Unpersist every ranged intermediate this module cached under the
    default ``materialize='cache'`` mode and clear the registry —
    the cleanup half of the cache contract (see
    :func:`global_row_number`'s materialize docs). Blocking=False: the
    blocks are dead the moment the call returns; reclamation is async.
    Returns the number of entries released. Safe to call at any time:
    a released rank frame recomputes correctly (the pid is a pure key
    function), it just loses the shared-scan saving."""
    n = 0
    while _CACHE_REGISTRY:
        df = _CACHE_REGISTRY.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            # a stopped session can no longer unpersist — nothing to
            # reclaim there anyway
            pass
    return n


@dataclass(frozen=True)
class Ord:
    """One column of an order spec: expression, direction, null placement.

    ``nulls_last=None`` takes Spark's defaults (ASC → nulls first,
    DESC → nulls last), matching ``F.asc``/``F.desc``.
    """

    expr: str
    asc: bool = True
    nulls_last: bool | None = None

    @property
    def effective_nulls_last(self) -> bool:
        return (not self.asc) if self.nulls_last is None else self.nulls_last

    def spark_col(self) -> Column:
        c = F.col(self.expr)
        if self.asc:
            return (
                c.asc_nulls_last()
                if self.effective_nulls_last
                else c.asc_nulls_first()
            )
        return (
            c.desc_nulls_last()
            if self.effective_nulls_last
            else c.desc_nulls_first()
        )

    def py_cmp(self, x, y) -> int:
        """Driver-side comparator for explicit ``boundaries=`` artifacts —
        only picks WHICH keys become boundaries (balance), never their
        correctness, so Python/JVM collation drift is harmless."""
        if x is None and y is None:
            return 0
        if x is None:
            return 1 if self.effective_nulls_last else -1
        if y is None:
            return -1 if self.effective_nulls_last else 1
        if x == y:
            return 0
        lt = x < y
        return (-1 if lt else 1) if self.asc else (1 if lt else -1)

    def field_before(self, x: Column, y: Column) -> Column:
        """Strict 'x sorts before y' on this field, in-engine."""
        nulls_first = not self.effective_nulls_last
        base = (x < y) if self.asc else (x > y)
        return (
            F.when(x.isNull() & y.isNull(), F.lit(False))
            .when(x.isNull(), F.lit(nulls_first))
            .when(y.isNull(), F.lit(not nulls_first))
            .otherwise(base)
        )


def _key_before(order: Sequence[Ord], xs: list[Column], ys: list[Column]) -> Column:
    """Lexicographic strict 'xs before ys' under the order spec."""
    out = F.lit(False)
    for i in range(len(order) - 1, -1, -1):
        o = order[i]
        out = F.when(
            o.field_before(xs[i], ys[i]), F.lit(True)
        ).when(xs[i].eqNullSafe(ys[i]), out).otherwise(F.lit(False))
    return out


def _struct_fields(order: Sequence[Ord], s: Column) -> list[Column]:
    return [s[f"_b{i}"] for i in range(len(order))]


def _boundaries_column(
    df: DataFrame, order: Sequence[Ord], n_parts: int
) -> Column:
    """The deterministic boundary array as a LAZY scalar subquery.

    One bounded sampling subquery (hash-bottom-S TakeOrdered heap over
    the key projection) reduces to a single row via ``collect_list``;
    array expressions then sort the ≤ S key tuples under the order spec
    and pick ≤ n_parts − 1 evenly spaced, deduplicated split keys —
    the exact arithmetic (``keys[min(i·c // n, c − 1)]``, strictly
    increasing dedupe) the driver-side artifact path uses. Nothing
    executes until the enclosing query's first action, so building or
    EXPLAINing a plan that embeds this column launches zero jobs.
    """
    cols = [o.expr for o in order]
    s = _SAMPLES_PER_PART * n_parts
    h = F.xxhash64(*[F.col(c) for c in cols])
    sample = (
        df.select(*cols)
        .orderBy(h.asc(), *[o.spark_col() for o in order])
        .limit(s)
    )
    packed = sample.agg(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)]
            )
        ).alias(_SAMPLE)
    )

    def cmp(x: Column, y: Column) -> Column:
        xs, ys = _struct_fields(order, x), _struct_fields(order, y)
        return (
            F.when(_key_before(order, xs, ys), F.lit(-1))
            .when(_key_before(order, ys, xs), F.lit(1))
            .otherwise(F.lit(0))
        )

    # The sort gets its OWN projection: lambda-bearing expressions
    # evaluate interpreted with no common-subexpression elimination,
    # so inlining `array_sort` into the pick transform re-sorts the
    # whole S-element sample once PER PICK — measured 108 s for the
    # one-row subquery at P=512 (O(P·S log S)); staged, it sorts once.
    sorted_df = packed.select(
        F.array_sort(F.col(_SAMPLE), cmp).alias(_SAMPLE)
    )
    skeys = F.col(_SAMPLE)
    c = F.size(skeys)
    # element_at is 1-based; min(i*c // n, c-1) is the 0-based driver pick
    picks = F.transform(
        F.sequence(F.lit(1), F.lit(n_parts - 1)),
        lambda i: F.element_at(
            skeys,
            (
                F.least(
                    F.floor(i.cast("long") * c / F.lit(n_parts)),
                    (c - 1).cast("long"),
                )
                + 1
            ).cast("int"),
        ),
    )
    empty = F.slice(skeys, 1, 0)  # typed empty array<struct<...>>
    bounds = F.when(c >= 2, F.array_distinct(picks)).otherwise(empty)
    return sorted_df.select(bounds.alias(_BNDS)).scalar()


def _pid_from_bounds(order: Sequence[Ord], bounds: Column) -> Column:
    """``|{b : b <spec key}|`` over the boundary array — the
    deterministic, fork-safe range partition id. Works identically over
    the lazy subquery column and a literal artifact array. O(P)
    comparator evaluations per row — fine through ~100 boundaries;
    the default path uses :func:`_attach_pid` (O(log P) binary
    search), measured 25× faster at P=512."""
    key = [F.col(o.expr) for o in order]
    return F.size(
        F.filter(
            bounds,
            lambda b: _key_before(order, _struct_fields(order, b), key),
        )
    )


def _attach_pid(
    df: DataFrame, order: Sequence[Ord], n_parts: int
) -> DataFrame:
    """Attach ``_PID`` = ``|{b : b <spec key}|`` via an UNROLLED
    bitwise binary search over the sorted boundary array in ``_BNDS``
    — the classic bisect (``pos += bit`` iff ``bounds[pos+bit] <spec
    key``), valid because the deduplicated boundaries are strictly
    increasing under the spec.

    Each of the ⌈log₂ P⌉ steps lands in its OWN projection
    (``withColumn`` chain): the step expression references the running
    position three times, so inlining the chain into one expression
    would grow ~3^depth nodes — the exact codegen blow-up the linear
    fold hits at high P (measured: the O(P) fold is 5.3 s at P=32 but
    135 s at P=512 on the same input; the search stays flat). Catalyst
    keeps non-cheap multiply-referenced aliases in separate projects,
    and whole-stage codegen fuses them into one function with one
    local per step — O(log P) comparator evaluations per row.

    ``try_element_at`` (not ``element_at``): the probe index exceeds
    the array size on purpose mid-search; under ANSI mode the plain
    form would throw where NULL is wanted (the ``idx <= size``
    conjunct then forces the step's condition false — FALSE AND NULL
    is FALSE)."""
    key = [F.col(o.expr) for o in order]
    bit = 1
    while bit * 2 <= max(1, n_parts - 1):
        bit *= 2
    df = df.withColumn(_PID, F.lit(0))
    while bit >= 1:
        idx = F.col(_PID) + F.lit(bit)
        probe = F.try_element_at(F.col(_BNDS), idx.cast("int"))
        step = F.when(
            (idx <= F.size(F.col(_BNDS)))
            & _key_before(order, _struct_fields(order, probe), key),
            idx,
        ).otherwise(F.col(_PID))
        df = df.withColumn(_PID, step)
        bit //= 2
    return df.withColumn(_PID, F.col(_PID).cast("int"))


def _deterministic_boundaries(
    df: DataFrame, order: Sequence[Ord], n_parts: int
) -> list[tuple]:
    """EAGER driver-side variant of the boundary computation — the
    ``boundaries=`` artifact producer (compute once, reuse across many
    rank calls, the stored-stats contract BM25 serving uses). The
    default in-plan path (:func:`_boundaries_column`) computes the same
    arithmetic lazily; this one runs a job NOW, so call it only when
    you want the artifact."""
    cols = [o.expr for o in order]
    s = _SAMPLES_PER_PART * n_parts
    h = F.xxhash64(*[F.col(c) for c in cols])
    sample = (
        df.select(*cols)
        .orderBy(h.asc(), *[o.spark_col() for o in order])
        .limit(s)
        .collect()
    )
    if len(sample) < 2:
        return []

    def tup_cmp(a, b):
        for i, o in enumerate(order):
            c = o.py_cmp(a[i], b[i])
            if c:
                return c
        return 0

    keys = sorted((tuple(r) for r in sample), key=functools.cmp_to_key(tup_cmp))
    bounds: list[tuple] = []
    for i in range(1, n_parts):
        k = keys[min(i * len(keys) // n_parts, len(keys) - 1)]
        if not bounds or tup_cmp(bounds[-1], k) < 0:
            bounds.append(k)
    return bounds


def _normalize_boundaries(
    order: Sequence[Ord], bounds: Sequence[tuple]
) -> list[tuple]:
    """Sort + dedupe a caller-supplied ``boundaries=`` artifact under
    the order spec before it becomes the bisect's literal array.

    The O(P) filter fold this module used to ship was correct for ANY
    fixed boundary set; the unrolled binary search that replaced it
    assumes the array is sorted and duplicate-free — an unsorted or
    duplicated artifact would silently mis-assign pids. Normalizing
    here (tuple-wise :meth:`Ord.py_cmp` via ``cmp_to_key``, the same
    driver-side comparator :func:`_deterministic_boundaries` sorts
    with) keeps the artifact contract what it always was: any fixed
    key set partitions correctly; order and multiplicity are the
    engine's problem, not the caller's."""

    def tup_cmp(a, b):
        for i, o in enumerate(order):
            c = o.py_cmp(a[i], b[i])
            if c:
                return c
        return 0

    keys = sorted(
        (tuple(b) for b in bounds), key=functools.cmp_to_key(tup_cmp)
    )
    out: list[tuple] = []
    for k in keys:
        if not out or tup_cmp(out[-1], k) != 0:
            out.append(k)
    return out


def _literal_bounds_column(
    df: DataFrame, order: Sequence[Ord], bounds: list[tuple]
) -> Column:
    """A precomputed boundary artifact as a typed literal array."""
    fields = [o.expr for o in order]
    types = {
        f.name: f.dataType for f in df.select(*fields).schema.fields
    }
    return F.array(
        *[
            F.struct(
                *[
                    F.lit(b[i]).cast(types[fields[i]]).alias(f"_b{i}")
                    for i in range(len(fields))
                ]
            )
            for b in bounds
        ]
    )


def _pid_column(
    df: DataFrame, order: Sequence[Ord], bounds: list[tuple]
) -> Column:
    """pid from an explicit (driver-side) boundary artifact."""
    if not bounds:
        return F.lit(0)
    return _pid_from_bounds(order, _literal_bounds_column(df, order, bounds))


def _as_ord(order: Sequence[Ord]) -> list[Ord]:
    out = []
    for o in order:
        if not isinstance(o, Ord):
            raise TypeError(
                "order must be a sequence of rank.Ord specs (the "
                "primitive needs direction/null placement introspectable "
                "to build its deterministic partitioner); got "
                f"{type(o).__name__}"
            )
        out.append(o)
    return out


def global_row_number(
    df: DataFrame,
    order: Sequence[Ord],
    out: str = "rank",
    running_sum_col: str | Column | None = None,
    running_sum_out: str = "running_sum",
    total_out: str | None = None,
    num_partitions: int | None = None,
    boundaries: Sequence[tuple] | None = None,
    materialize: str | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY order)`` as a new long column
    ``out`` — two-pass rank over deterministic data-derived range
    partitions, no single-task sort.

    ``order`` must be a total order over ``df`` (include a unique
    tie-break column). When ``running_sum_col`` is given, the running
    ``SUM(col) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING..CURRENT)``
    is also computed (same two-pass trick: local running sum + the
    earlier partitions' total rides the same offsets join) into
    ``running_sum_out``. When ``total_out`` is given, the TOTAL row
    count rides along as a constant column of that name — folded from
    the bounded count table, never a second scan of ``df``.

    Building the returned frame launches NO Spark job: the boundary
    sample is a scalar subquery executed at the first action. Pass
    ``boundaries=`` (a sorted list of key tuples, e.g. from
    :func:`_deterministic_boundaries` or a stored artifact) to skip the
    sampling subquery entirely — the stored-stats contract.

    ``materialize`` picks how the ranged intermediate (consumed by both
    the count pass and the local-rank pass) is pinned:

    - ``"cache"`` (default): lazy ``persist(MEMORY_AND_DISK)`` — one
      materialization at the first action, shared by both passes via
      the cache manager's plan match (both consume the SAME logical
      subtree). Lineage is retained, so an evicted or executor-lost
      block recomputes — and recomputation is CORRECT here because the
      pid is a pure key function (the exact property this module
      exists to provide; a nondeterministic partitioner is what makes
      cache unsafe elsewhere). Cache entries outlive the returned
      frame (CacheManager holds them until an explicit unpersist), so
      each intermediate is registered module-side — long-lived
      sessions issuing many transient ranks call
      :func:`release_rank_caches` once the outputs are consumed, or
      pass ``materialize='none'``. The only truly lazy strategy: Dataset
      ``localCheckpoint``/``checkpoint`` call ``toRdd`` at BUILD time,
      which under AQE executes the boundary subquery — a measured
      build-time job, the exact cost placement this design forbids.
    - ``"local_checkpoint"``: ``localCheckpoint(eager=False)`` —
      truncates lineage (no recompute storms), but blocks are
      executor-local and non-replicated (a lost executor fails the
      query), and the ``toRdd`` at build runs the boundary subquery as
      one bounded job per call site. Opt-in for iterative callers that
      re-derive on top of the rank many times.
    - ``"checkpoint"``: reliable ``checkpoint(eager=False)`` to the
      configured ``sparkContext.setCheckpointDir`` — survives executor
      loss; the right choice for long-lived 1000-node deployments.
      Same bounded build-time subquery job as ``local_checkpoint``.
    - ``"none"``: no materialization — each pass re-derives the
      upstream pipeline (still CORRECT: the pid is a pure key function,
      so forked recomputations agree), paying a second upstream scan
      whenever per-branch pruning defeats ReuseExchange.

    Unset, the mode comes from the Spark conf
    ``spark.etl_example_spark.rank.materialize`` (default ``cache``),
    so cluster deployments choose durability without editing call
    sites.
    """
    order = _as_ord(order)
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    mode = (
        materialize
        if materialize is not None
        else spark.conf.get(_MATERIALIZE_CONF, "cache")
    )
    if mode not in _MATERIALIZE_MODES:
        raise ValueError(
            f"materialize must be one of {_MATERIALIZE_MODES}, got {mode!r}"
        )

    if boundaries is not None:
        bl = _normalize_boundaries(order, boundaries)
        if not bl:
            ranged = df.withColumn(_PID, F.lit(0))
        else:
            ranged = _attach_pid(
                df.withColumn(
                    _BNDS, _literal_bounds_column(df, order, bl)
                ),
                order,
                len(bl) + 1,
            ).drop(_BNDS)
    elif n < 2:
        ranged = df.withColumn(_PID, F.lit(0))
    else:
        ranged = _attach_pid(
            df.withColumn(_BNDS, _boundaries_column(df, order, n)),
            order,
            n,
        ).drop(_BNDS)
    # Materialize (lazily) so the count pass and the local-rank pass
    # read one computed intermediate instead of re-deriving the whole
    # upstream pipeline when per-branch column pruning defeats
    # ReuseExchange — for a rank over an aggregate (d109's entropy)
    # that re-derivation is a second full corpus pass. The default is
    # the one strategy with NO build-time job: building the plan must
    # not run an input-sized (or any) job — plan audits and EXPLAIN
    # build every registered query. Correctness never depends on the
    # materialization (the pid is deterministic).
    if mode == "cache":
        from pyspark.storagelevel import StorageLevel

        ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
        # registered for explicit reclamation: CacheManager entries
        # outlive the Python wrapper, so sessions issuing many ranks
        # call release_rank_caches() once the outputs are consumed
        _CACHE_REGISTRY.append(ranged)
    elif mode == "local_checkpoint":
        ranged = ranged.localCheckpoint(eager=False)
    elif mode == "checkpoint":
        ranged = ranged.checkpoint(eager=False)

    w_local = Window.partitionBy(_PID).orderBy(
        *[o.spark_col() for o in order]
    )
    local_cols = [F.row_number().over(w_local).alias(_LOCAL)]
    sum_expr = (
        F.col(running_sum_col)
        if isinstance(running_sum_col, str)
        else running_sum_col
    )
    if sum_expr is not None:
        local_cols.append(
            F.sum(sum_expr)
            .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
            .alias(_SUM_LOCAL)
        )
    local = ranged.select("*", *local_cols)

    # Pass 2: per-partition totals -> exclusive prefix offsets. The
    # aggregate is <= numPartitions rows; the prefix window over it is
    # the ONLY single-partition window, over bounded input by
    # construction. This branch re-evaluates the (deterministic) pid —
    # fork-safe by design, no exchange reuse required.
    aggs = [F.count("*").alias(_CNT)]
    if sum_expr is not None:
        aggs.append(F.sum(sum_expr).alias(_SUM_OFF + "_part"))
    counts = ranged.groupBy(_PID).agg(*aggs)
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
    ]
    if sum_expr is not None:
        off_cols.append(
            F.coalesce(
                F.sum(_SUM_OFF + "_part").over(w_off), F.lit(0)
            ).alias(_SUM_OFF)
        )
    if total_out is not None:
        # the grand total rides the SAME bounded window + broadcast
        # hash join as the offsets — no separate one-row crossJoin
        # branch (and no BroadcastNestedLoopJoin in the plan)
        off_cols.append(
            F.sum(_CNT)
            .over(
                w_off.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias(total_out)
        )
    offsets = counts.select(*off_cols)

    joined = local.join(F.broadcast(offsets), _PID)
    result_cols = [
        (F.col(_LOCAL) + F.col(_OFF)).cast("long").alias(out)
    ]
    if sum_expr is not None:
        result_cols.append(
            (F.col(_SUM_LOCAL) + F.col(_SUM_OFF)).alias(running_sum_out)
        )
    drop = [_PID, _LOCAL, _OFF] + (
        [_SUM_LOCAL, _SUM_OFF] if sum_expr is not None else []
    )
    return joined.select("*", *result_cols).drop(*drop)


def global_ntile(
    df: DataFrame,
    order: Sequence[Ord],
    n_buckets: int,
    out: str = "bucket",
    num_partitions: int | None = None,
    boundaries: Sequence[tuple] | None = None,
    materialize: str | None = None,
) -> DataFrame:
    """Exact ``NTILE(n_buckets) OVER (ORDER BY order)`` as a new long
    column ``out`` — derived arithmetically from the two-pass global
    row_number plus the total row count, so no corpus-sized input ever
    crosses a single task.

    NTILE semantics (ANSI, matching both Spark and DuckDB): with ``c``
    rows and ``n`` buckets, the first ``c mod n`` buckets hold
    ``c div n + 1`` rows and the rest ``c div n``; bucket(rank) inverts
    that piecewise-linear cumulative. ``order`` must be a total order
    (NTILE over ties is engine-ambiguous anyway — every caller here
    already carries a unique tie-break key).

    The divisions run in doubles then truncate — exact while counts stay
    under 2^53 (~9e15 rows; comfortably past 100 TB of any row width).
    The ``q == 0`` case (fewer rows than buckets) never reaches the
    ``/ q`` branch: ``big_span == c`` there, so every rank takes the
    first branch.
    """
    ranked = global_row_number(
        df,
        order,
        out="__gr_rank",
        total_out="__gr_total",
        num_partitions=num_partitions,
        boundaries=boundaries,
        materialize=materialize,
    )
    r, c, n = F.col("__gr_rank"), F.col("__gr_total"), F.lit(n_buckets)
    q = (c / n).cast("long")  # floor: both operands non-negative
    rem = c % n
    big_span = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = F.when(
        r <= big_span, ((r - 1) / (q + 1)).cast("long") + 1
    ).otherwise(rem + ((r - big_span - 1) / q).cast("long") + 1)
    return (
        ranked.select("*", bucket.cast("long").alias(out))
        .drop("__gr_rank", "__gr_total")
    )
