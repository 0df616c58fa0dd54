"""Similarity search over embedding columns (``array<float>``).

- ``cosine``: built-in-function cosine similarity (zip_with product,
  left-fold sum — fixed summation order in index order, so results are
  bit-deterministic and match a C-loop oracle).
- ``brute_force_topk``: exact top-k neighbors of a query vector. The
  baseline: one broadcast of the query + a narrow map over the corpus +
  TakeOrderedAndProject. Scales linearly; at 100 TB it's one scan.
- ``cosine_near_dup_pairs``: all-pairs ≥ threshold. Quadratic by nature;
  the scale path is ``signed_projection_buckets`` (random-hyperplane LSH)
  to restrict pairs to same-bucket candidates.
- ``signed_projection_buckets`` / ``ann_topk``: sub-linear ANN — an
  n-bit sign signature from deterministic ±1 hyperplanes (md5-parity
  derived, so no RNG state ships to executors); candidates come from the
  query's bucket, optionally within Hamming radius 1.

No UDFs anywhere: dot products run as Catalyst higher-order functions.
For very wide vectors (≥1k dims) a Pandas-UDF BLAS path wins; at 64-dim
the JVM expression is faster than the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_example_spark.functions.localrel import local_df


def _as_double(col: Column | str) -> Column:
    """``CAST(col AS array<double>)`` — element-wise, exactly the
    per-element ``transform(x -> CAST(x AS double))`` it replaces
    (round-14: the transform-lambda build cost ~4 py4j round trips per
    call and an ArrayTransform at runtime where a single Cast suffices;
    float→double widening is exact either way, NULL arrays/elements
    pass through identically — :func:`_cosine_sims` already documented
    the CAST form as the same arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], folded in index order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def _cosine_sql(a: str, b: str) -> str:
    """The :func:`cosine` arithmetic as SQL text over two column NAMES —
    term-for-term the Python-builder form (same casts, same fold seeds,
    same operand order), so values are bit-identical; one F.expr parse
    instead of ~10 py4j lambda-builder round trips (round-14)."""
    da, db = f"CAST(`{a}` AS array<double>)", f"CAST(`{b}` AS array<double>)"
    return (
        f"try_divide(aggregate(zip_with({da}, {db}, (x, y) -> x * y), "
        "0D, (acc, x) -> acc + x), "
        f"sqrt(aggregate(transform({da}, x -> x * x), "
        "0D, (acc, x) -> acc + x)) * "
        f"sqrt(aggregate(transform({db}, x -> x * x), "
        "0D, (acc, x) -> acc + x)))"
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (not an ANSI DIVIDE_BY_ZERO error) when
    either vector has zero norm — cosine is undefined there, and NULL
    lets downstream operators make an explicit keep/quarantine decision
    (ivf_assign_with_centroids keeps the row with NULL centroid_id)
    instead of the whole corpus pass aborting on one degenerate row."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_cosine_sql(a, b))
    da, db = _as_double(a), _as_double(b)
    return F.try_divide(dot(da, db), norm(da) * norm(db))


def _cosine_sims(vec_col: str, cvs_col: str = "cvs") -> Column:
    """``transform(cvs, cv -> round(cosine(vec, cv), 6))`` as one
    SQL-text expression — the in-row form of the rounded :func:`cosine`
    column, evaluated against a PACKED array of centroid vectors
    (round-13: the trainers/assigners pick the nearest centroid inside
    the row instead of expanding corpus × centroids through a join).
    Identical arithmetic to ``round(cosine(...), 6)`` term for term
    (same casts, same fold seeds, same operand order), so the
    similarity values are bit-identical; SQL-text lambdas, not
    Python-lambda builders, for the variable-collision reason
    :func:`_sq_l2` documents."""
    return F.expr(
        f"transform({cvs_col}, cv -> round(try_divide("
        f"aggregate(zip_with(CAST({vec_col} AS array<double>), "
        "CAST(cv AS array<double>), (x, y) -> x * y), "
        "0D, (acc, x) -> acc + x), "
        f"sqrt(aggregate(transform(CAST({vec_col} AS array<double>), "
        "x -> x * x), 0D, (acc, x) -> acc + x)) * "
        "sqrt(aggregate(transform(CAST(cv AS array<double>), "
        "x -> x * x), 0D, (acc, x) -> acc + x))), 6))"
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_id: int | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of one corpus vector (default: the
    min-id vector, so the query is deterministic without parameters)."""
    if query_id is None:
        query = embeddings.orderBy(id_col).limit(1)
    else:
        query = embeddings.filter(F.col(id_col) == query_id)
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    return (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


def batch_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors (the ``n_queries``
    lowest-id corpus vectors — deterministic without parameters) in one
    pass: broadcast the query block, one narrow map computes all
    query×corpus similarities, and a per-query ranking window takes the
    top k. The corpus is scanned once regardless of query count — the
    right shape when serving many probes against 100 TB of vectors
    (queries are the small side by definition)."""
    q = (
        embeddings.orderBy(id_col)
        .limit(n_queries)
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold (id_a < id_b). Exact and
    quadratic — correct at any scale, affordable at verification scale; use
    the LSH bucket variant to pre-filter candidates at corpus scale."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    sim = F.round(cosine("vec_a", "vec_b"), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _hyperplane_sign(plane: int, dim: int) -> Column:
    """Deterministic ±1: parity of the first hex digit of md5('plane|dim').
    Pure-literal per (plane, dim) — constant-folded by Catalyst."""
    import hashlib

    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()
    return F.lit(1.0 if int(h[0], 16) >= 8 else -1.0)


def signed_projection_buckets(
    embeddings: DataFrame,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit j is the sign of
    Σ_i ±1·v[i] with a deterministic ±1 pattern per hyperplane."""
    v = _as_double(vec_col)
    bit_cols = []
    for j in range(bits):
        proj = sum(
            (F.element_at(v, i + 1) * _hyperplane_sign(j, i) for i in range(dims)),
            start=F.lit(0.0),
        )
        bit_cols.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select(
        F.col(id_col), F.col(vec_col), F.concat(*bit_cols).alias("bucket")
    )


def ivf_assign_with_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest of the GIVEN centroids
    (max cosine, ties to the lower centroid id) — the shared kernel of
    :func:`ivf_assign` (seeded centroids) and :func:`ivf_append`
    (stored centroids).

    In-row argmax (round-13 optimization, guide §2.4/§3.1): previously a
    broadcast-crossJoin expanded corpus × centroids and a packed-bigint
    max folded it back per (id, vec) — correct and HashAggregate-
    shaped, but the expansion plus the corpus-keyed aggregate (the
    full VECTOR was a group key) measured as the whole cost. The
    centroid table is MODEL-SIZED by contract (it broadcast before),
    so collect it, pack it as ONE row (centroid vectors + ids ordered
    by centroid_id ASC NULLS FIRST — the order the old dense
    row_number codes encoded), and take the argmax inside the row:
    the corpus is a pure map now — no expansion, no aggregate, no
    shuffle at any scale. The centroid table is EAGERLY collected at
    plan-construction time (a limit(2^21-row) probe bounds what can
    reach the driver; an over-contract table raises the old "too many
    centroids" error before materializing — round-14). Old semantics
    replicated exactly, with two documented divergences (ADVICE r13):
    (1) NaN — the old packed round(sim*1e6) CAST collapsed a NaN
    cosine to sim 0.0, while array_max sorts NaN greatest, so a
    NaN-similarity centroid now WINS with c_sim NaN (matching
    ivf_train's never-packed max_by semantics); (2) duplicate input
    ids — the old per-(id, vec) aggregate collapsed exact-duplicate
    rows to one output row, the in-row map emits one row per INPUT row
    (observable only when the unique-id contract is violated). Ties
    break to the lower centroid id (array_position returns the first
    match in id order, == the old complement-code max); degenerate
    (zero-norm) vectors have every cosine NULL, array_max ignores
    NULLs so an all-NULL row yields NULL centroid_id/c_sim — the old
    LEFT-join survival; c_sim is the same round(cosine, 6) double the
    packed micro-units round-tripped to; an empty centroid table
    yields the empty result the old crossJoin produced. Returns
    (id, vec, centroid_id, c_sim)."""
    spark = embeddings.sparkSession
    cid_col, cvec_col = centroids.columns[0], centroids.columns[1]
    cid_type = centroids.schema[cid_col].dataType.simpleString()
    cvec_type = centroids.schema[cvec_col].dataType.simpleString()
    # limit(bound) probe: at most bound rows ever reach the driver —
    # hitting the bound means the artifact is over the same 2^21
    # centroid-count contract the packed max asserted, so the raise is
    # the old behavior, now BEFORE an unbounded collect (round-14)
    cent_rows = sorted(
        centroids.select(
            F.col(cid_col).alias("centroid_id"),
            F.col(cvec_col).alias("centroid_vec"),
        )
        .limit(_MODEL_ROWS_BOUND)
        .collect(),
        key=lambda r: (r["centroid_id"] is not None, r["centroid_id"]),
    )
    if len(cent_rows) >= _MODEL_ROWS_BOUND:
        raise ValueError("too many centroids")
    if not cent_rows:
        return (
            embeddings.select(F.col(id_col), F.col(vec_col))
            .filter(F.lit(False))
            .withColumn("centroid_id", F.lit(None).cast(cid_type))
            .withColumn("c_sim", F.lit(None).cast("double"))
        )
    packed = local_df(
        spark,
        [
            (
                [
                    list(r["centroid_vec"])
                    if r["centroid_vec"] is not None
                    else None
                    for r in cent_rows
                ],
                [r["centroid_id"] for r in cent_rows],
            )
        ],
        f"cvs array<{cvec_type}>, cds array<{cid_type}>",
    )
    pos = F.expr(
        "CASE WHEN array_max(_ss) IS NULL THEN CAST(NULL AS INT) "
        "ELSE CAST(array_position(_ss, array_max(_ss)) AS INT) END"
    )
    return (
        embeddings.crossJoin(F.broadcast(packed))
        .withColumn("_ss", _cosine_sims(vec_col))
        .withColumn("_bp", pos)
        .select(
            id_col,
            vec_col,
            F.expr("cds[_bp - 1]").alias("centroid_id"),
            F.expr("_ss[_bp - 1]").alias("c_sim"),
        )
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max cosine, ties to the lower centroid id).

    Centroids are the ``n_centroids`` lowest-id corpus vectors —
    deterministic seeding; production IVF runs a few Lloyd iterations
    (or pyspark.ml KMeans) over the same assign step, which changes only
    centroid *values*, not the plan shape."""
    centroids = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    return ivf_assign_with_centroids(embeddings, centroids, id_col, vec_col)


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication with the pairwise work BOUNDED by coarse clusters.
    Assign every vector to its nearest centroid (:func:`ivf_assign` /
    :func:`ivf_assign_with_centroids`), compare pairs ONLY within a
    cluster, and inside each duplicate pair keep the vector LESS
    similar to its cluster centroid (the paper's diversity-preserving
    keep rule — near-centroid redundancy is what gets dropped), ties
    to the lower id. A vector is removed iff SOME same-cluster
    neighbor with rounded cosine ≥ ``threshold`` dominates it
    ((c_sim, id) greater under the keep rule) — a single EXISTS, no
    transitive closure, so the decision is order-free and replayable.

    Scale shape: the global all-pairs O(n²) becomes one equi-join ON
    THE CLUSTER KEY — Σ|cluster|² comparisons, shuffle keyed by
    centroid_id. At 100 TB the cluster count scales with the corpus
    (FAISS-style sqrt(n) cells) keeping cells ~constant-sized; a
    pathological mega-cluster is the same skew problem as any hot key
    (salt the pair join or cap per-cell membership upstream). Zero-norm
    vectors carry a NULL centroid and are always kept — the equi-join
    drops NULL keys so they never pair.

    Returns (id, centroid_id, c_sim, keep) for EVERY input row — the
    full decision table, not just the survivors, so the gate is
    auditable (the d45/d100 discipline)."""
    assign = (
        ivf_assign(embeddings, n_centroids, id_col, vec_col)
        if centroids is None
        else ivf_assign_with_centroids(embeddings, centroids, id_col, vec_col)
    )
    a = assign.select(
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("_vec_a"),
        F.col("centroid_id").alias("_cell"),
        F.col("c_sim").alias("_sim_a"),
    )
    b = assign.select(
        F.col(id_col).alias("_id_b"),
        F.col(vec_col).alias("_vec_b"),
        F.col("centroid_id").alias("_cell"),
        F.col("c_sim").alias("_sim_b"),
    )
    removed = (
        a.join(b, "_cell")
        .filter(F.col("_id_a") != F.col("_id_b"))
        .filter(F.round(cosine("_vec_a", "_vec_b"), 6) >= threshold)
        .filter(
            (F.col("_sim_a") > F.col("_sim_b"))
            | (
                (F.col("_sim_a") == F.col("_sim_b"))
                & (F.col("_id_a") > F.col("_id_b"))
            )
        )
        .select(F.col("_id_a").alias(id_col))
        .distinct()
    )
    return (
        assign.join(
            removed.withColumn("_removed", F.lit(True)), id_col, "left"
        )
        .select(
            id_col,
            "centroid_id",
            "c_sim",
            F.coalesce(~F.col("_removed"), F.lit(True)).alias("keep"),
        )
    )


def ivf_append(
    assignments: DataFrame,
    new_vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INCREMENTAL IVF index maintenance: assign only the arriving
    vectors against the STORED centroids and append to the stored
    assignment artifact — the indexed corpus is never rescanned (the
    discipline the text side already has: d55's MinHash probe, d70's
    line-index probe). Work per ingest is O(batch × centroids).

    Law: with centroids held fixed, ``ivf_append(assign(old), new, C)``
    == ``ivf_assign_with_centroids(old ∪ new, C)`` — incremental equals
    full rebuild restricted to the same quantizer. Proven two ways: the
    s47_ivf_append registration's DuckDB oracle recomputes the FULL
    assignment from scratch and hash-compares it to this incremental
    output, and tests/test_llm_ops.py::TestIncrementalAnn asserts
    incremental == full-rebuild row-for-row in Spark. Re-training
    centroids (the full ``ivf_train``) is the periodic offline job;
    between runs the index stays probe-consistent.
    """
    new_assign = ivf_assign_with_centroids(
        new_vectors, centroids, id_col, vec_col
    )
    return assignments.unionByName(new_assign)


def _train_sample(
    df: DataFrame, id_col: str, max_train_rows: int
) -> DataFrame:
    """Deterministic hash-bottom training sample: the ``max_train_rows``
    rows with the smallest ``xxhash64(id)`` (id tie-break) — a uniform
    random sample any re-execution reproduces bit-for-bit, taken as one
    TakeOrderedAndProject heap pass (the rank primitive's boundary-
    sampling discipline, never a global sort). Eagerly pinned: every
    Lloyd iteration re-reads it, and it is bounded by contract."""
    h = F.xxhash64(F.col(id_col))
    return (
        df.orderBy(h.asc(), F.col(id_col).asc())
        .limit(max_train_rows)
        .localCheckpoint(eager=True)
    )


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int | None = None,
) -> DataFrame:
    """Lloyd iterations over the IVF coarse quantizer: assign every
    training vector to its nearest centroid (in-row argmax over the
    packed driver-held centroid state — see the loop comment), then
    recompute each centroid as the element-wise mean of its members
    (posexplode → per-(cell, dim) average → bounded driver collect of
    model-sized means). One shuffle per iteration on (centroid, dim).
    Empty cells keep their previous centroid. Returns (centroid_id,
    centroid_vec) ready to feed the probe/rerank stages.

    ``max_train_rows`` bounds EVERY Lloyd pass (and the seed pick) to a
    deterministic hash-bottom sample of that many rows — FAISS practice
    (coarse quantizers train on ~100k–1M vectors regardless of corpus
    size; only the assignment/encode pass touches the full corpus). At
    100 TB, full-corpus Lloyd is the ANN training-cost wall: per
    iteration it is a corpus × centroids scan, while the sampled
    trainer is O(max_train_rows × centroids) — flat in corpus size.
    The sampled quantizer still certifies the recall floor (the s64
    registration externalizes it, SCALING.md carries the measurement).
    Default ``None`` trains on the full corpus, byte-identical to the
    historical behavior.

    Iteration materialization (round-13 optimization): centroids are
    MODEL-SIZED (≤ n_centroids rows by contract), so each Lloyd round
    ends in a bounded driver collect and re-enters the next round as a
    literal local relation — the d106 parameter-server discipline,
    replacing the per-round ``localCheckpoint`` job (checkpoint
    materialization + old-centroid left join). The assign + per-(cell,
    dim) mean pipeline — the float-summation-order-bearing part — is
    unchanged, so trained centroids are bit-identical; the collect /
    literal round trip through Python floats is exact (IEEE-754
    doubles both sides)."""
    train = (
        embeddings
        if max_train_rows is None
        else _train_sample(embeddings, id_col, max_train_rows)
    )
    spark = embeddings.sparkSession
    id_type = embeddings.schema[id_col].dataType.simpleString()
    cent_schema = f"centroid_id {id_type}, centroid_vec array<double>"
    # driver-held model state: {centroid_id: vec as a Python list}
    cent_state: dict = {
        r["centroid_id"]: (
            list(r["centroid_vec"])
            if r["centroid_vec"] is not None
            else None
        )
        for r in train.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            _as_double(vec_col).alias("centroid_vec"),
        )
        .collect()
    }

    def cents_df() -> DataFrame:
        rows = [
            (cid, cent_state[cid])
            for cid in sorted(
                cent_state, key=lambda c: (c is not None, c)
            )
        ]
        return local_df(spark, rows, cent_schema)

    # in-row argmax (round-13 optimization, guide §2.4/§3.1): the Lloyd
    # assign previously expanded train × centroids through a
    # broadcast-crossJoin and folded back with
    # max_by(centroid_id, struct(c_sim, -centroid_id)) — measured on
    # the PQ sibling, the expansion + per-id fold was the iteration
    # cost, not the cosine arithmetic. Centroids are driver-held
    # state, so pack them as ONE broadcast row (vectors + ids ordered
    # by centroid_id ASC NULLS FIRST) and take the argmax inside the
    # row. max_by's exact semantics are replicated: highest rounded
    # cosine wins, similarity ties break to the LOWEST centroid id
    # (array_position returns the first match in id order — the old
    # -centroid_id tiebreak), NaN sorts greatest and wins (array_max
    # shares the SQL double ordering), and an all-NULL similarity row
    # (degenerate vector) falls to the lowest NON-NULL centroid id —
    # which is what struct(NULL, -cid) maximization did (NULL ids lose
    # ties; all ids NULL -> NULL), precomputed here as a literal.
    cid_vals = sorted(cent_state, key=lambda c: (c is not None, c))
    fallback_cid = next((c for c in cid_vals if c is not None), None)

    def packed_df() -> DataFrame:
        return local_df(
            spark,
            [([cent_state[c] for c in cid_vals], cid_vals)],
            f"cvs array<array<double>>, cds array<{id_type}>",
        )

    pos = F.expr(
        "CAST(array_position(_ss, array_max(_ss)) AS INT)"
    )
    for _ in range(iters):
        assign = (
            train.crossJoin(F.broadcast(packed_df()))
            .withColumn("_ss", _cosine_sims(vec_col))
            .withColumn(
                "centroid_id",
                F.when(
                    F.expr("array_max(_ss)").isNull(),
                    F.lit(fallback_cid).cast(id_type),
                ).otherwise(F.expr("cds")[pos - 1]),
            )
        )
        mean_rows = (
            assign.select(
                "centroid_id",
                F.posexplode(_as_double(vec_col)).alias("dim", "x"),
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        upd: dict = {}
        for r in mean_rows:
            # a NULL centroid_id mean (all-degenerate cell) never
            # equi-joined the old centroid table — skip, as before
            if r["centroid_id"] is None:
                continue
            upd.setdefault(r["centroid_id"], {})[r["dim"]] = r["m"]
        # empty cells keep their previous centroid (the old left-join
        # + coalesce semantics)
        for cid, dims in upd.items():
            cent_state[cid] = [dims[d] for d in sorted(dims)]
    return cents_df()


def ivf_topk(
    embeddings: DataFrame,
    query_id: int | None = None,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` cells whose centroids
    are nearest the query, exact-rerank only their members. Expected scan
    fraction is nprobe/n_centroids of the corpus — the inverted-file
    trade: coarser cells = fewer probes = lower recall.

    ``centroids`` (centroid_id, centroid_vec) and ``assignments`` (the
    :func:`ivf_assign` output — id, vec, centroid_id, c_sim; the s47
    append-maintained artifact) accept the STORED index — the
    production serving contract the PQ side got first
    (:func:`ivfpq_topk`'s ``centroids=``/``codebooks=``): assign once
    offline, maintain incrementally, and every query is a pure probe —
    broadcast centroid block picks the cells, the stored assignment
    table supplies their members, the corpus is NEVER re-assigned at
    query time (at 100 TB the per-query coarse assignment IS a corpus
    pass; the stored table turns it into a semi-join against
    nprobe/n_centroids of the artifact). Passing neither self-assigns
    per call (the demo composition, byte-identical to the historical
    behavior). Law: artifact-served == in-query for the same centroid
    set (the s59a registration certifies it externally the way s61
    does for IVF-PQ)."""
    if centroids is None:
        centroids = (
            embeddings.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"),
            )
        )
    else:
        centroids = centroids.select(
            F.col(centroids.columns[0]).alias("centroid_id"),
            F.col(centroids.columns[1]).alias("centroid_vec"),
        )
    if assignments is None:
        assign = ivf_assign_with_centroids(
            embeddings, centroids, id_col, vec_col
        )
    else:
        assign = assignments
    if query_id is None:
        query = assign.orderBy(id_col).limit(1)
    else:
        query = assign.filter(F.col(id_col) == query_id)
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine("centroid_vec", "query_vec"), 6).alias("q_sim"),
        )
        .orderBy(F.desc("q_sim"), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    return (
        assign.join(F.broadcast(probe_cells), "centroid_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


def ivf_topk_batch(
    queries: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a BATCH of queries from the stored IVF index — the
    many-query form of :func:`ivf_topk`'s artifact path, the shape a
    streaming serve loop needs (st64): each arriving micro-batch of
    queries probes the stored (centroids, assignments) pair; the
    indexed corpus is never re-assigned. Per batch: queries × centroid
    block (broadcast — tiny both sides) picks each query's ``nprobe``
    cells, one equi-join on the CELL KEY pulls only those cells'
    members from the assignment artifact (write the artifact
    partitioned by centroid_id and the broadcast join's dynamic
    partition pruning skips the other cells' files — the s57
    SelectedBucketsCount discipline for vectors), then the exact
    rerank touches candidates only. Zero-norm queries and zero-norm
    candidates are filtered explicitly (cosine NULL), so NULL-ordering
    never reaches a window sort — both engines replay rank-for-rank.

    Returns (query_id, neighbor_id, cosine_sim, rk), rk 1..k per
    query, ties broken by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    cents = centroids.select(
        F.col(centroids.columns[0]).alias("centroid_id"),
        F.col(centroids.columns[1]).alias("centroid_vec"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("q_sim"), F.asc("centroid_id")
    )
    probe_cells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "query_vec",
            "centroid_id",
            F.round(cosine("query_vec", "centroid_vec"), 6).alias("q_sim"),
        )
        .filter(F.col("q_sim").isNotNull())
        .withColumn("_rk", F.row_number().over(w_probe))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "query_vec", "centroid_id")
    )
    w_rerank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        assignments.join(F.broadcast(probe_cells), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim").isNotNull())
        .withColumn("rk", F.row_number().over(w_rerank))
        .filter(F.col("rk") <= k)
    )


def ann_topk(
    embeddings: DataFrame,
    query_id: int | None = None,
    k: int = 10,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket plus Hamming-1 neighbor buckets (probing widens recall).
    The candidate set is corpus_size / 2^bits per probe on average —
    sub-linear scan at scale, same TakeOrdered tail as brute force."""
    bucketed = signed_projection_buckets(embeddings, bits, dims, id_col, vec_col)
    if query_id is None:
        query = bucketed.orderBy(id_col).limit(1)
    else:
        query = bucketed.filter(F.col(id_col) == query_id)
    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col("bucket").alias("query_bucket"),
    )
    # Hamming ≤ 1: equal, or differing in exactly one bit position.
    hamming = F.aggregate(
        F.zip_with(
            F.split(F.col("bucket"), ""),
            F.split(F.col("query_bucket"), ""),
            lambda x, y: F.when(x == y, 0).otherwise(1),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        bucketed.crossJoin(F.broadcast(q))
        .filter((F.col(id_col) != F.col("query_id")) & (hamming <= 1))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


# --- Product quantization -------------------------------------------------


def _sq_l2(a: str, b: str) -> Column:
    """Squared L2 distance between two bound array<double> columns, as a
    SQL-lambda expression (SQL lambdas, not Python-lambda builders: two
    Python-lambda HOF columns in one projection collide on lambda
    variable names)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0D, (acc, v) -> acc + v)"
    )


def l2_normalize(df: DataFrame, vec_col: str) -> DataFrame:
    """Replace ``vec_col`` with its unit-norm version (zero vectors pass
    through unchanged). The norm binds to a real column first so the
    per-element division does not re-evaluate the fold per element."""
    return (
        df.withColumn("_nrm", norm(_as_double(vec_col)))
        .withColumn(
            vec_col,
            F.when(F.col("_nrm") == 0, _as_double(vec_col)).otherwise(
                F.expr(
                    f"transform(cast({vec_col} AS array<double>), "
                    "x -> x / _nrm)"
                )
            ),
        )
        .drop("_nrm")
    )


def _slices_sql(vec_sql: str, m: int, sub_d: int) -> str:
    """``array(slice(v, 1, d), slice(v, d+1, d), ...)`` as SQL text over
    a vector EXPRESSION — one parsed expression instead of m py4j
    slice-builder round trips (round-14); identical slice arithmetic."""
    return (
        "array("
        + ", ".join(
            f"slice({vec_sql}, {j * sub_d + 1}, {sub_d})" for j in range(m)
        )
        + ")"
    )


#: Model-size bound on driver-collected quantizer state (centroid
#: tables, codebooks) — the packing bound the join-era kernels asserted
#: in-plan (2^21 codes). Round-14: enforced with a ``limit(bound)``
#: probe BEFORE the collect materializes (an over-contract artifact
#: fails fast with a clear error instead of flooding the driver —
#: ADVICE r13), and the SQL render of a near-bound model falls back to
#: binary createDataFrame transport inside local_df (VERDICT r13 #3).
_MODEL_ROWS_BOUND = 1 << 21


def _zip_sub_py(a, b):
    """``zip_with(a, b, (x, y) -> x - y)`` replayed on driver-held
    floats: subtraction is an exact IEEE-754 double op in both engines,
    and the NULL/length semantics are mirrored (zip_with pads the
    shorter side with NULL; a NULL operand nulls that element)."""
    if a is None or b is None:
        return None
    n = max(len(a), len(b))
    return [
        (a[i] - b[i])
        if i < len(a)
        and i < len(b)
        and a[i] is not None
        and b[i] is not None
        else None
        for i in range(n)
    ]


def _sq_l2_py(a, b):
    """:func:`_sq_l2` replayed on driver-held floats — the exact
    left-fold ``aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0D,
    acc + v)``: subtract/multiply/add in index order are exact IEEE
    double ops both sides (bit-identical results); NULL semantics
    mirrored (NULL array -> NULL, a length mismatch pads with NULL and
    a NULL term nulls the whole fold)."""
    if a is None or b is None:
        return None
    if len(a) != len(b):
        return None
    acc = 0.0
    for x, y in zip(a, b):
        if x is None or y is None:
            return None
        d = x - y
        acc = acc + d * d
    return acc


def _residual(vec_col: str, cent_col: str = "centroid_vec") -> Column:
    """``v − c`` element-wise in double — the Python-lambda zip_with it
    replaces, as one parsed expression (round-14 py4j-chatter cut);
    identical arithmetic (same casts, same subtraction order)."""
    return F.expr(
        f"zip_with(CAST(`{vec_col}` AS array<double>), "
        f"CAST(`{cent_col}` AS array<double>), (x, y) -> x - y)"
    )


def _subvectors(df: DataFrame, m: int, dim: int, id_col: str, vec_col: str):
    """(id, j, sv): the m equal slices of each (unit-normalized) vector."""
    sub_d = dim // m
    slices = F.expr(
        _slices_sql(f"CAST(`{vec_col}` AS array<double>)", m, sub_d)
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("j", "sv")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    max_train_rows: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks: per subspace j (of ``m`` equal
    vector slices), ``n_codes`` centroids trained by Lloyd iterations —
    all subspaces trained TOGETHER in one plan (rows are (id, j,
    subvector); assignment and re-estimation group by j, so adding
    subspaces adds rows, not stages).

    Seeds are the ``n_codes`` lowest-id vectors' slices (deterministic).
    Returns (j, code, cv) with ``cv`` the centroid subvector. Same
    iterative discipline as ``ivf_train``: one shuffle per iteration,
    localCheckpoint truncates the growing lineage, empty codes keep
    their previous centroid.

    ``normalize=False`` trains on the input vectors AS GIVEN — the
    residual-encoding path (:func:`ivfpq_residual_topk`): residuals
    ``v − centroid`` are displacement vectors whose magnitude IS the
    signal; unit-normalizing them would destroy exactly what PQ is
    quantizing there.

    ``max_train_rows`` bounds the Lloyd passes (and the seed pick) to
    a deterministic hash-bottom sample — the :func:`ivf_train`
    contract: codebook training cost goes flat in corpus size (FAISS
    trains PQ codebooks on a bounded sample; only the ENCODE pass is
    corpus-sized), the sampled codebooks still certify the recall
    floor (s64). Default ``None`` trains on the full corpus,
    byte-identical to the historical behavior.

    Iteration materialization (round-13 optimization): the codebook is
    MODEL-SIZED state (≤ m·n_codes rows by contract), so each round
    ends in a bounded driver collect and the next round's broadcast is
    a literal local relation — the d106 parameter-server discipline.
    This replaces the previous per-iteration ``localCheckpoint`` of the
    codebook frame (an extra cluster job per round: the checkpoint
    materialization plus the old-codebook left join it fed) while the
    per-round ASSIGN + per-(j, code, dim) mean pipeline — the part
    whose float summation order determines the trained values — is
    unchanged, so the trained codebooks are bit-identical (asserted by
    the s63/s65/s66 equality laws and the oracle hash of s55).
    Python's float IS an IEEE-754 double, so the collect/literal round
    trip is exact. Plan-sized win at any scale: one fewer pass per
    Lloyd round over state that was never cluster-sized to begin with.
    """
    normalized = (
        l2_normalize(embeddings, vec_col) if normalize else embeddings
    )
    if max_train_rows is not None:
        normalized = _train_sample(normalized, id_col, max_train_rows)
    # Seeds come from the TRAINING set (the sample, when one is
    # requested): a seed outside it would have no subvectors in ``sub``
    # and its codebook row would silently vanish. One MODEL-SIZED
    # collect (n_codes lowest-id training vectors) supplies the seed
    # order, the initial codebook values (sliced driver-side with the
    # exact indexing :func:`_subvectors` uses — a pure slice, no
    # arithmetic: Python ``v[a:b]`` and Spark ``slice`` agree on
    # short/empty/NULL inputs), the empty-corpus check, AND the vector
    # dimension — round-14: the separate ``limit(1)`` dim-probe was a
    # second corpus-touching job for a value the seed collect already
    # carries (guide §5 bounded collects; empty seeds ⟺ empty corpus).
    spark = embeddings.sparkSession
    seed_rows = (
        normalized.orderBy(id_col)
        .limit(n_codes)
        .select(F.col(id_col), _as_double(vec_col).alias("_v"))
        .collect()
    )
    if not seed_rows:  # empty corpus -> empty codebook, right schema
        return embeddings.sparkSession.createDataFrame(
            [], "j int, code int, cv array<double>"
        )
    dim = len(next((r["_v"] for r in seed_rows if r["_v"] is not None), None))
    sub = _subvectors(normalized, m, dim, id_col, vec_col).localCheckpoint(
        eager=True
    )
    sub_d = dim // m
    # driver-held model state: {(j, code): cv as a Python list}
    cb_state: dict[tuple, list] = {}
    for code, r in enumerate(seed_rows):
        v = r["_v"]
        for j in range(m):
            cb_state[(j, code)] = (
                None if v is None else list(v[j * sub_d : (j + 1) * sub_d])
            )

    def cb_df() -> DataFrame:
        rows = [(j, c, cb_state[(j, c)]) for (j, c) in sorted(cb_state)]
        return local_df(
            spark, rows, "j int, code int, cv array<double>"
        )

    # in-row argmin (round-13 optimization, guide §2.4/§3.1): the Lloyd
    # assign previously expanded sub × codebook (rows·n_codes joined
    # rows) through a broadcast join and folded back with
    # min_by(struct(d2, code)) — measured, the iteration cost was the
    # row EXPANSION plus that struct-keyed min_by (no mutable buffer,
    # so it compiled to Sort + Exchange + SortAggregate), not the
    # distance arithmetic. The codebook is driver-held state, so pack
    # it per subspace (one array<array<double>> row per j, m rows,
    # broadcast) and pick the nearest code inside the row over the
    # packed array. The argmin replicates min_by's exact semantics:
    # NULL d2 sorts FIRST (the exists() branch picks the first NULL,
    # i.e. the lowest code), distance ties break to the lower code
    # (array_position returns the first match; cvs is ordered by code,
    # codes contiguous 0..n-1 from the seed enumeration, so position-1
    # IS the code), NaN sorts greatest (array_min shares the SQL
    # double ordering). The per-pair distance stays the exact
    # _sq_l2 fold (bit-identical floats); an UNROLLED per-code variant
    # was measured and rejected — at n_codes CASE branches per row the
    # Catalyst analysis of the big tree cost more per iteration than
    # the interpreted fold it saved (plans are rebuilt every
    # iteration). One row per input (id, j) comes out, exactly the
    # rows the old groupBy produced — ``id_col`` keys the code
    # artifact throughout this module (pq_append/ivf_append join on
    # it), same as before.
    codes_present = list(range(len(seed_rows)))
    js_present = list(range(m))

    def cbj_df() -> DataFrame:
        rows = [
            (j, [cb_state[(j, c)] for c in codes_present])
            for j in js_present
        ]
        return local_df(
            spark, rows, "j int, cvs array<array<double>>"
        )

    d2s = F.expr(
        "transform(cvs, cv -> aggregate(zip_with(sv, cv, "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"
    )
    best_code = F.expr(
        "CASE WHEN exists(_ds, x -> x IS NULL) THEN "
        "CAST(array_position("
        "transform(_ds, x -> CAST(x IS NULL AS INT)), 1) AS INT) - 1 "
        "ELSE CAST(array_position(_ds, array_min(_ds)) AS INT) - 1 END"
    )
    for _ in range(iters):
        assign = (
            sub.join(F.broadcast(cbj_df()), "j")
            .withColumn("_ds", d2s)
            .withColumn("code", best_code)
        )
        mean_rows = (
            assign.select("j", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("j", "code", "dim")
            .agg(F.avg("x").alias("mx"))
            .collect()
        )
        upd: dict[tuple, dict[int, float]] = {}
        for r in mean_rows:
            # a NULL code (all-null-distance group) never equi-joined
            # the old codebook — skip, as the old left join did
            if r["code"] is None:
                continue
            upd.setdefault((r["j"], r["code"]), {})[r["dim"]] = r["mx"]
        # empty codes ((j, code) absent from the means) keep their
        # previous centroid — the old left-join + coalesce semantics
        for key, dims in upd.items():
            cb_state[key] = [dims[d] for d in sorted(dims)]
    return cb_df()


def pq_encode(
    sub: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """(id, codes): nearest code per subspace, assembled in j order.
    ``round_digits`` rounds the squared distance before the argmin (ties
    then break to the lower code) — the cross-engine-deterministic mode
    the oracle-checked s48 registration uses, mirroring the rounded-
    cosine convention of the search queries.

    In-row argmin (round-13 optimization, guide §2.4/§3.1): the encode
    previously expanded sub × codebook (rows·n_codes joined rows)
    through a broadcast join and folded back per (id, j) — min over a
    packed bigint (rounded mode) or a struct-keyed min_by that
    compiled to Sort + Exchange + SortAggregate (unrounded mode).
    Measured, that expansion + fold dominated the encode. The codebook
    is MODEL-SIZED by contract (m·n_codes rows — the same contract
    that lets pq_train hold it in driver state), so collect it EAGERLY
    at plan-construction time (round-14: a limit(2^21-row) probe
    bounds what can reach the driver; an over-contract codebook raises
    a clear model-size error before materializing), pack
    it per subspace ordered by code (NULL codes first, mirroring how a
    NULL code won the old struct min_by on a distance tie), and pick
    the nearest code inside the row: one output row per input (id, j),
    no expansion, no per-(id, j) shuffle fold. Old-fold semantics are
    replicated exactly: per-pair distance is the same _sq_l2 fold
    (bit-identical floats), NULL distance sorts first in the unrounded
    mode (exists() branch -> first NULL position -> lowest code) but
    is SKIPPED by the rounded mode's min (array_min ignores NULLs; all
    NULL -> NULL code, as min over an all-NULL column was), ties break
    to the lower code (array_position returns the first match in
    code order), NaN sorts greatest, a NULL-j codebook row never
    equi-joins (excluded from the pack), and a j absent from the
    codebook drops its sub rows (the packed table only carries js with
    entries, and the inner join stays). The rounded mode's in-plan
    packing-range assert becomes a driver-side check on the collected
    artifact (same contract: int codes in [0, 2^21)). Duplicate-id
    caveat (ADVICE r13): the final groupBy(id) assembles ONE codes
    array per id from every (id, j) row — a duplicated input id
    contributes 2m per-subspace rows and would assemble a length-2m
    array; the unique-id contract is assumed, as the join-era fold
    assumed it."""
    cb_rows = _collect_codebook(codebooks)
    types = (
        codebooks.schema["j"].dataType.simpleString(),
        codebooks.schema["code"].dataType.simpleString(),
        codebooks.schema["cv"].dataType.simpleString(),
    )
    return _pq_encode_rows(sub, cb_rows, types, id_col, round_digits)


def _collect_codebook(codebooks: DataFrame):
    """The model-sized (j, code, cv) rows, probe-bounded (round-14): a
    limit(bound) keeps an over-contract codebook from flooding the
    driver — it raises the clear model-size error instead."""
    rows = (
        codebooks.select("j", "code", "cv")
        .limit(_MODEL_ROWS_BOUND)
        .collect()
    )
    if len(rows) >= _MODEL_ROWS_BOUND:
        raise ValueError("codebook exceeds the model-size bound")
    return rows


def _pq_encode_rows(
    sub: DataFrame,
    cb_rows,
    types: tuple[str, str, str],
    id_col: str,
    round_digits: int | None,
) -> DataFrame:
    """:func:`pq_encode` body over PRE-COLLECTED codebook rows — the
    encode-path entry points collect the codebook once (for sub_d and
    the pack) instead of once per consumer (round-14: the second
    parquet read of a stored codebook was one full job per streaming
    micro-batch in st50/st61)."""
    spark = sub.sparkSession
    j_type, code_type, cv_type = types
    by_j: dict = {}
    for r in cb_rows:
        if r["j"] is None:  # a NULL j never equi-joined sub
            continue
        by_j.setdefault(r["j"], []).append(
            (r["code"], list(r["cv"]) if r["cv"] is not None else None)
        )
    if round_digits is not None:
        n_codes = 1 << 21  # matches the ivf packing bound
        for entries in by_j.values():
            for c, _ in entries:
                if c is None or not (0 <= c < n_codes):
                    raise ValueError("code out of packing range")
    packed = [
        (
            j,
            [cv for _, cv in sorted(es, key=lambda e: (e[0] is not None, e[0]))],
            [c for c, _ in sorted(es, key=lambda e: (e[0] is not None, e[0]))],
        )
        for j, es in sorted(by_j.items())
    ]
    cbp = local_df(
        spark, packed,
        f"j {j_type}, cvs array<{cv_type}>, cds array<{code_type}>",
    )
    ds = F.expr(
        "transform(cvs, cv -> aggregate(zip_with(sv, cv, "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"
    )
    if round_digits is not None:
        scale = repr(10.0**round_digits)
        us = F.expr(
            f"transform(_ds, d -> CAST(round(round(d, {round_digits}) "
            f"* {scale}D) AS LONG))"
        )
        code = F.expr(
            "CASE WHEN array_min(_us) IS NULL THEN CAST(NULL AS INT) "
            "ELSE CAST(cds[CAST(array_position(_us, array_min(_us)) "
            "AS INT) - 1] AS INT) END"
        )
        per_subspace = (
            sub.join(F.broadcast(cbp), "j")
            .withColumn("_ds", ds)
            .withColumn("_us", us)
            .select(F.col(id_col), "j", code.alias("code"))
        )
    else:
        code = F.expr(
            "CASE WHEN exists(_ds, x -> x IS NULL) THEN "
            "cds[CAST(array_position("
            "transform(_ds, x -> CAST(x IS NULL AS INT)), 1) AS INT) - 1] "
            "ELSE cds[CAST(array_position(_ds, array_min(_ds)) "
            "AS INT) - 1] END"
        )
        per_subspace = (
            sub.join(F.broadcast(cbp), "j")
            .withColumn("_ds", ds)
            .select(F.col(id_col), "j", code.alias("code"))
        )
    return per_subspace.groupBy(id_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, code))), "
            "s -> s.code)"
        ).alias("codes")
    )


def pq_encode_vectors(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """End-to-end PQ encode of raw vectors against trained codebooks:
    l2-normalize, slice into ``m`` subvectors, nearest code per
    subspace. The (id, codes) artifact this emits is what a PQ index
    stores per vector.

    Round-14: the codebook is collected ONCE (probe-bounded) and
    supplies both the slicing width (sub_d = the stored subvector
    length — the artifact defines the geometry, == dim//m for any
    consistently-trained pair) and the encode pack — previously a
    batch-side limit(1) dim probe plus a second codebook read cost two
    extra jobs per call, one full job each per streaming micro-batch
    (st50/st61). An empty/degenerate codebook falls back to the old
    input dim probe."""
    normalized = l2_normalize(vectors, vec_col)
    cb_rows = _collect_codebook(codebooks)
    types = (
        codebooks.schema["j"].dataType.simpleString(),
        codebooks.schema["code"].dataType.simpleString(),
        codebooks.schema["cv"].dataType.simpleString(),
    )
    sub_d = next(
        (len(r["cv"]) for r in cb_rows if r["cv"] is not None), None
    )
    if sub_d is None:
        first = normalized.select(vec_col).limit(1).collect()
        if not first:  # empty input -> empty artifact, right schema
            # id type from the input so the empty artifact unions
            # cleanly with real codes for non-long id columns
            id_type = vectors.schema[id_col].dataType.simpleString()
            return vectors.sparkSession.createDataFrame(
                [], f"{id_col} {id_type}, codes array<int>"
            )
        sub_d = len(first[0][0]) // m
    sub = normalized.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                _slices_sql(f"CAST(`{vec_col}` AS array<double>)", m, sub_d)
            )
        ).alias("j", "sv"),
    )
    return _pq_encode_rows(sub, cb_rows, types, id_col, round_digits)


def pq_append(
    codes: DataFrame,
    new_vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """INCREMENTAL PQ index maintenance: encode only the arriving
    vectors against the STORED codebooks and append to the stored code
    artifact — no re-encoding of the indexed corpus (the d55/d70/
    ivf_append discipline). Work per ingest is O(batch × m × n_codes).

    Law: with codebooks held fixed, ``pq_append(encode(old), new, cb)``
    == ``pq_encode_vectors(old ∪ new, cb)`` — incremental equals full
    rebuild under the same quantizer. Proven two ways: the
    s48_pq_append registration's DuckDB oracle re-encodes the FULL
    corpus from scratch (normalize → slice → seeded codebook → rounded
    argmin) and hash-compares it to this incremental output, and
    tests/test_llm_ops.py::TestIncrementalAnn asserts incremental ==
    full-rebuild row-for-row in Spark. Codebook re-training
    (``pq_train``) is the periodic offline job.
    """
    return codes.unionByName(
        pq_encode_vectors(
            new_vectors, codebooks, m, id_col, vec_col, round_digits
        )
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    shortlist: int = 100,
    query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC similarity search with exact re-rank — the memory-bound
    scale path: the corpus is represented by ``m`` small codes per
    vector (here 8 bytes instead of 256 for the raw floats), the query
    builds an (m × n_codes) distance lookup table, approximate distances
    are one broadcast join + sum per vector, and only the ``shortlist``
    best candidates are re-ranked with exact cosine against the raw
    vectors. Unit-normalizing first makes L2 order == cosine order, so
    the ADC shortlist targets the same ground truth as brute force.

    Output schema matches ``brute_force_topk`` (query_id, neighbor_id,
    cosine_sim).
    """
    normalized = l2_normalize(embeddings, vec_col).localCheckpoint(
        eager=True
    )
    first = normalized.select(vec_col).limit(1).collect()
    if not first:  # empty corpus -> empty result with the output schema
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double"
        )
    dim = len(first[0][0])
    cb = pq_train(embeddings, m, n_codes, iters, id_col, vec_col)
    sub = _subvectors(normalized, m, dim, id_col, vec_col)
    codes = pq_encode(sub, cb, id_col)

    if query_id is None:
        query = normalized.orderBy(id_col).limit(1)
    else:
        query = normalized.filter(F.col(id_col) == query_id)
    q_sub = _subvectors(query, m, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        "j",
        F.col("sv").alias("qv"),
    )
    adc_table = (
        cb.join(F.broadcast(q_sub), "j")
        .withColumn("d2", _sq_l2("qv", "cv"))
        .select("query_id", "j", "code", "d2")
    )
    approx = (
        codes.select(id_col, F.posexplode("codes").alias("j", "code"))
        .join(F.broadcast(adc_table), ["j", "code"])
        .groupBy(id_col, "query_id")
        .agg(F.sum("d2").alias("approx_d2"))
        .filter(F.col(id_col) != F.col("query_id"))
        .orderBy("approx_d2", id_col)
        .limit(shortlist)
    )
    q_vec = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    return (
        approx.join(normalized.select(id_col, vec_col), id_col)
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    shortlist: int = 100,
    query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    assignments: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """COMPOSED IVF-PQ ANN — the production serving layout (FAISS
    IVFPQ lineage) assembled from the engine's two proven halves: the
    inverted-file coarse probe (s40) restricts candidates to
    ``nprobe/n_centroids`` of the corpus, PQ-ADC (s42) scores ONLY
    those candidates from ``m`` byte codes per vector, and the exact
    re-rank touches only the ``shortlist``. Cost per query =
    (corpus · nprobe/n_centroids) code-table lookups + shortlist
    exact cosines — BOTH compression axes at once, which is what makes
    billion-vector serving fit in memory: cells bound the scan,
    codes bound the bytes.

    Variant note: canonical IVFPQ encodes RESIDUALS (v − centroid) for
    tighter codes; this composition encodes the raw normalized vectors
    with corpus-wide codebooks, so ONE PQ artifact serves every cell
    (and the s48/s50 append paths maintain it unchanged) at some
    recall cost — the floor is certificate-verified externally (s58a).
    The residual layout ships as :func:`ivfpq_residual_topk`.
    Unit-normalizing first makes L2 order == cosine order, as in
    :func:`pq_topk`.

    ``centroids`` (centroid_id, centroid_vec) and ``codebooks``
    (j, code, cv) accept the STORED quantizer artifacts (the s47/s48
    outputs) — the production serving contract: train once offline,
    serve from the artifact; passing neither self-trains per call (the
    demo composition). Law: artifact-served == self-trained for the
    same seeds (tests/test_llm_ops.py::TestIvfPq).

    ``assignments`` (the :func:`ivf_assign` output over the NORMALIZED
    corpus) and ``codes`` (the (id, codes) table :func:`pq_encode_vectors`
    emits — what a PQ index stores per vector) complete the serving
    contract: with all four artifacts given, the per-query work is
    probe (centroids × query) → candidate ids (stored assignment ⋈
    probed cells) → ADC (stored codes ⋈ the ≤ m·n_codes lookup table)
    → exact re-rank of the shortlist — NO corpus-sized assignment and
    NO candidate re-encoding at query time, which at 100 TB is the
    difference between an index probe and a per-query encode pass over
    nprobe/n_centroids of the corpus. The s65 registration certifies
    fully-served == self-trained externally.

    Output schema matches ``brute_force_topk`` (query_id, neighbor_id,
    cosine_sim)."""
    normalized = l2_normalize(embeddings, vec_col).localCheckpoint(
        eager=True
    )
    if centroids is None:
        # Round-14: one model-sized collect supplies the empty-corpus
        # check (empty centroids ⟺ empty corpus), the vector dimension
        # and a literal LocalRelation for every downstream centroid
        # reference — see ivfpq_residual_topk for the rationale.
        cent_rows = (
            normalized.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"),
            )
            .collect()
        )
        if not cent_rows:  # empty corpus -> empty result, output schema
            return embeddings.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine_sim double"
            )
        dim = len(
            next(
                (
                    r["centroid_vec"]
                    for r in cent_rows
                    if r["centroid_vec"] is not None
                ),
                None,
            )
        )
        id_type = normalized.schema[id_col].dataType.simpleString()
        centroids = local_df(
            embeddings.sparkSession,
            [
                (
                    r["centroid_id"],
                    list(r["centroid_vec"])
                    if r["centroid_vec"] is not None
                    else None,
                )
                for r in cent_rows
            ],
            f"centroid_id {id_type}, centroid_vec array<double>",
        )
    else:
        first = normalized.select(vec_col).limit(1).collect()
        if not first:  # empty corpus -> empty result, output schema
            return embeddings.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine_sim double"
            )
        dim = len(first[0][0])
        centroids = centroids.select(
            F.col(centroids.columns[0]).alias("centroid_id"),
            F.col(centroids.columns[1]).alias("centroid_vec"),
        )
    assign = (
        assignments
        if assignments is not None
        else ivf_assign_with_centroids(
            normalized, centroids, id_col, vec_col
        )
    )
    if query_id is None:
        query = assign.orderBy(id_col).limit(1)
    else:
        query = assign.filter(F.col(id_col) == query_id)
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine("centroid_vec", "query_vec"), 6).alias("q_sim"),
        )
        .orderBy(F.desc("q_sim"), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    cand = assign.join(F.broadcast(probe_cells), "centroid_id").select(
        id_col, vec_col
    )

    # PQ codebooks are the cell-agnostic artifact: stored (production)
    # or trained here on the FULL corpus (demo); only the probed
    # candidates are encoded + scored either way. Self-training uses
    # the CHECKPOINTED normalized frame: pq_train's own l2_normalize
    # is a no-op over unit vectors, so this reuses the materialized
    # intermediate instead of re-normalizing the corpus from source
    # (seed ids are unchanged).
    cb = (
        codebooks
        if codebooks is not None
        else pq_train(normalized, m, n_codes, iters, id_col, vec_col)
    )
    if codes is not None:
        # the stored per-vector code artifact: candidates' codes are a
        # semi-join against the probed cells' member ids — nothing is
        # re-encoded at query time
        cand_codes = codes.join(cand.select(id_col), id_col)
    else:
        cand_codes = pq_encode(
            _subvectors(cand, m, dim, id_col, vec_col), cb, id_col
        )
    q_sub = _subvectors(
        query.select(id_col, vec_col), m, dim, id_col, vec_col
    ).select(
        F.col(id_col).alias("query_id"), "j", F.col("sv").alias("qv")
    )
    adc_table = (
        cb.join(F.broadcast(q_sub), "j")
        .withColumn("d2", _sq_l2("qv", "cv"))
        .select("query_id", "j", "code", "d2")
    )
    approx = (
        cand_codes.select(id_col, F.posexplode("codes").alias("j", "code"))
        .join(F.broadcast(adc_table), ["j", "code"])
        .groupBy(id_col, "query_id")
        .agg(F.sum("d2").alias("approx_d2"))
        .filter(F.col(id_col) != F.col("query_id"))
        .orderBy("approx_d2", id_col)
        .limit(shortlist)
    )
    return (
        approx.join(normalized.select(id_col, vec_col), id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


def ivfpq_residual_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the RESIDUAL IVF-PQ quantizer pair — (coarse centroids,
    residual codebooks) — exactly as :func:`ivfpq_residual_topk`'s
    self-training path does, but as a standalone artifact producer:
    write both frames to the index store once, then serve every query
    through ``ivfpq_residual_topk(centroids=, codebooks=)`` and
    maintain the code artifact with :func:`ivfpq_residual_encode`
    (append) — the full production lifecycle the raw-layout siblings
    (s47/s48/st49/st50) have. Centroids are the ``n_centroids``
    lowest-id normalized vectors (deterministic, SQL-replayable);
    codebooks are Lloyd-trained on ALL residuals with
    ``normalize=False`` (a displacement's magnitude IS the signal).
    ``max_train_rows`` bounds the ENTIRE training pass — the sample is
    taken before the coarse assignment, so training-time work is
    O(sample × centroids) assignment + bounded Lloyd, never a corpus
    pass (the corpus-sized assignment happens once, at ENCODE time,
    where it is the index build itself); the sample is the same
    deterministic hash-bottom set :func:`pq_train` uses."""
    normalized = l2_normalize(embeddings, vec_col).localCheckpoint(
        eager=True
    )
    centroids = (
        normalized.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    train = (
        normalized
        if max_train_rows is None
        else _train_sample(normalized, id_col, max_train_rows)
    )
    assign = ivf_assign_with_centroids(
        train, centroids, id_col, vec_col
    )
    res = (
        assign.join(F.broadcast(centroids), "centroid_id")
        .select(
            F.col(id_col),
            _residual(vec_col).alias("_res"),
        )
    )
    codebooks = pq_train(
        res,
        m,
        n_codes,
        iters,
        id_col,
        "_res",
        normalize=False,
    )
    return centroids, codebooks


def ivfpq_residual_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    shortlist: int = 100,
    query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """RESIDUAL-encoded IVF-PQ — the canonical FAISS IVFPQ layout
    :func:`ivfpq_topk` documents as the forgone alternative: every
    vector is PQ-encoded as its displacement from its assigned coarse
    centroid (``r = v − c``), and the query is re-expressed per probed
    cell (``q_res = q − c``), so the codebooks quantize the SMALL
    residual distribution instead of the whole sphere — materially
    tighter codes for the same bytes, which is why it is the layout
    FAISS actually ships.

    The ADC identity that makes it exact-in-expectation: within cell
    ``c``, ``‖q − v‖² = ‖(q − c) − (v − c)‖² = ‖q_res − r_v‖²`` — so
    scoring residual codes against the per-cell query residual
    approximates the true L2 directly; no cross-cell bias term.
    Codebooks are corpus-wide (one artifact, trained on ALL residuals
    with ``pq_train(normalize=False)`` — normalizing a displacement
    would destroy the magnitude PQ is quantizing), matching FAISS's
    shared-codebook IVFPQ. Cost shape is identical to
    :func:`ivfpq_topk` — nprobe/n_centroids bounds the scan, m byte
    codes bound the bytes, the exact re-rank touches only the
    shortlist — plus one broadcast join against the ≤ n_centroids
    centroid block to form residuals. Recall floor is certified
    externally at 8/10 (s60a, vs the raw-vector variant's 5/10).

    ``centroids`` (centroid_id, centroid_vec) and ``codebooks``
    (j, code, cv over RESIDUAL subvectors) accept the STORED quantizer
    artifacts (the :func:`ivfpq_residual_train` outputs) — train once
    offline, serve from the artifact, the same contract
    :func:`ivfpq_topk` carries; passing neither self-trains per call.
    Law: artifact-served == self-trained for the same seeds (the s63
    registration certifies it externally the way s61 does for the raw
    layout).

    ``codes`` accepts the stored PER-VECTOR artifact — the
    (id, centroid_id, codes) table :func:`ivfpq_residual_encode` emits
    and s62/st61 maintain. With it (requires ``centroids`` and
    ``codebooks`` too), the per-query work is probe → stored codes of
    the probed cells ⋈ the per-cell ADC table → exact re-rank of the
    shortlist: the corpus is neither re-assigned NOR re-encoded at
    query time (the s66 registration certifies fully-served ==
    self-trained externally).

    Eager-collect behavior (round-14): the query row, the probe
    ranking, the codebook (bounded by a limit(2^21-row) probe) and the
    ADC table are model-sized and are materialized on the DRIVER at
    plan-construction time — build-time Spark jobs fire even if the
    returned frame is never acted on, and an over-contract codebook
    raises before materializing.

    Output schema matches ``brute_force_topk`` (query_id, neighbor_id,
    cosine_sim)."""
    if codes is not None and (centroids is None or codebooks is None):
        raise ValueError(
            "codes= serving requires the matching centroids= and "
            "codebooks= artifacts (the probe and the ADC table are "
            "built from them)"
        )
    normalized = l2_normalize(embeddings, vec_col).localCheckpoint(
        eager=True
    )
    spark = embeddings.sparkSession
    if centroids is None:
        # Round-14: ONE model-sized collect of the self-trained coarse
        # centroids supplies the empty-corpus check (empty centroids ⟺
        # empty corpus — they are the n_centroids lowest-id corpus
        # vectors), the vector dimension, AND a literal LocalRelation
        # serving every downstream centroid reference — previously the
        # orderBy/limit subtree over the checkpointed corpus
        # re-executed inside the probe, the residual join and the
        # candidate restriction, plus a separate limit(1) dim-probe
        # job (guide §2.4/§5).
        cent_rows = (
            normalized.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"),
            )
            .collect()
        )
        if not cent_rows:  # empty corpus -> empty result, output schema
            return embeddings.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine_sim double"
            )
        dim = len(
            next(
                (
                    r["centroid_vec"]
                    for r in cent_rows
                    if r["centroid_vec"] is not None
                ),
                None,
            )
        )
        id_type = normalized.schema[id_col].dataType.simpleString()
        centroids = local_df(
            spark,
            [
                (
                    r["centroid_id"],
                    list(r["centroid_vec"])
                    if r["centroid_vec"] is not None
                    else None,
                )
                for r in cent_rows
            ],
            f"centroid_id {id_type}, centroid_vec array<double>",
        )
    else:
        cent_rows = None
        first = normalized.select(vec_col).limit(1).collect()
        if not first:  # empty corpus -> empty result, output schema
            return embeddings.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine_sim double"
            )
        dim = len(first[0][0])
        centroids = centroids.select(
            F.col(centroids.columns[0]).alias("centroid_id"),
            F.col(centroids.columns[1]).alias("centroid_vec"),
        )
    if codes is None:
        assign = ivf_assign_with_centroids(
            normalized, centroids, id_col, vec_col
        )
        # residual frame: r = v − c(v), double-precision displacement.
        # Degenerate (zero-norm) vectors carry NULL centroid_id and
        # drop out here — they can never be probed candidates anyway.
        res = (
            assign.join(F.broadcast(centroids), "centroid_id")
            .select(
                F.col(id_col),
                F.col("centroid_id"),
                _residual(vec_col).alias("_res"),
            )
            .localCheckpoint(eager=True)
        )
        cb = (
            codebooks
            if codebooks is not None
            else pq_train(
                res.select(id_col, F.col("_res")),
                m,
                n_codes,
                iters,
                id_col,
                "_res",
                normalize=False,
            )
        )
    else:
        # fully-served path: the stored (id, centroid_id, codes)
        # artifact supplies both the cell membership and the codes —
        # no corpus assignment, no residual formation at query time
        res = None
        cb = codebooks

    # Round-14 (guide §2.4/§5): the query block, the probe and the ADC
    # table are MODEL-SIZED (1 row, ≤ nprobe rows, ≤ nprobe·m·n_codes
    # rows) but were built as plan subtrees whose corpus-touching
    # limit scans re-executed inside every downstream reference (two
    # broadcast builds of the probe, one of q, one of q_sub — each an
    # AQE stage job of the final plan). Collect the query row once —
    # in the self-trained default-query case it IS the first collected
    # centroid row (both are the lowest-id normalized vector), zero
    # extra jobs — rank the probe with a tiny Spark plan over the
    # collected blocks (the round/try_divide arithmetic stays Spark's,
    # bit for bit), replay the query-residual subtraction and the
    # _sq_l2 fold on the driver (exact IEEE double ops — no rounding
    # or division in that chain), and hand every consumer a literal
    # LocalRelation.
    id_type = normalized.schema[id_col].dataType.simpleString()
    if query_id is None and cent_rows is not None and n_centroids > 0:
        q_rows = [
            {
                "query_id": cent_rows[0]["centroid_id"],
                "query_vec": cent_rows[0]["centroid_vec"],
            }
        ]
    else:
        if query_id is None:
            query = normalized.orderBy(id_col).limit(1)
        else:
            query = normalized.filter(F.col(id_col) == query_id)
        q_rows = query.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        ).collect()
    q = local_df(
        spark,
        [
            (
                r["query_id"],
                list(r["query_vec"])
                if r["query_vec"] is not None
                else None,
            )
            for r in q_rows
        ],
        f"query_id {id_type}, query_vec array<double>",
    )
    probe_rows = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            "centroid_vec",
            "query_id",
            "query_vec",
            F.round(cosine("centroid_vec", "query_vec"), 6).alias("q_sim"),
        )
        .orderBy(F.desc("q_sim"), "centroid_id")
        .limit(nprobe)
        .collect()
    )
    probe_cells = local_df(
        spark,
        [(r["centroid_id"],) for r in probe_rows],
        f"centroid_id {id_type}",
    )
    # ADC lookup rows per (cell, subspace, code), replayed driver-side:
    # q_res = query − centroid (zip_with subtraction), _subvectors'
    # pure slices, then the _sq_l2 fold against each codebook entry —
    # the exact per-(j) inner join the in-plan build did (NULL j never
    # equi-joined; j outside the slice set had no q_sub row).
    sub_d = dim // m
    cb_rows = (
        cb.select("j", "code", "cv").limit(_MODEL_ROWS_BOUND).collect()
    )
    if len(cb_rows) >= _MODEL_ROWS_BOUND:
        raise ValueError("codebook exceeds the model-size bound")
    adc_rows = []
    for pr in probe_rows:
        qres = _zip_sub_py(pr["query_vec"], pr["centroid_vec"])
        for r in cb_rows:
            j = r["j"]
            if j is None or not (0 <= j < m):
                continue
            qsub = (
                None
                if qres is None
                else qres[j * sub_d : (j + 1) * sub_d]
            )
            adc_rows.append(
                (
                    pr["centroid_id"],
                    pr["query_id"],
                    j,
                    r["code"],
                    _sq_l2_py(
                        qsub,
                        list(r["cv"]) if r["cv"] is not None else None,
                    ),
                )
            )
    j_type = cb.schema["j"].dataType.simpleString()
    code_type = cb.schema["code"].dataType.simpleString()
    adc_table = local_df(
        spark,
        adc_rows,
        f"centroid_id {id_type}, query_id {id_type}, j {j_type}, "
        f"code {code_type}, d2 double",
    )
    # candidates: residual codes of the probed cells only — from the
    # stored per-vector artifact when given (a pure semi-join, nothing
    # re-encoded), else encoded here from the residual frame
    if codes is not None:
        exploded = (
            codes.join(
                F.broadcast(probe_cells.select("centroid_id")),
                "centroid_id",
            )
            .select(
                F.col(id_col),
                F.col("centroid_id"),
                F.posexplode("codes").alias("j", "code"),
            )
        )
    else:
        cand_codes = pq_encode(
            res.join(
                F.broadcast(probe_cells.select("centroid_id")),
                "centroid_id",
            ).select(
                F.col(id_col),
                F.col("centroid_id").alias("_cell"),
                F.posexplode(
                    F.expr(_slices_sql("`_res`", m, sub_d))
                ).alias("j", "sv"),
            ).select(id_col, "j", "sv"),
            cb,
            id_col,
        )
        cells = res.select(id_col, F.col("centroid_id"))
        exploded = (
            cand_codes.join(cells, id_col)
            .join(
                F.broadcast(probe_cells.select("centroid_id")),
                "centroid_id",
            )
            .select(
                id_col,
                "centroid_id",
                F.posexplode("codes").alias("j", "code"),
            )
        )
    approx = (
        exploded
        .join(F.broadcast(adc_table), ["centroid_id", "j", "code"])
        .groupBy(id_col, "query_id")
        .agg(F.sum("d2").alias("approx_d2"))
        .filter(F.col(id_col) != F.col("query_id"))
        .orderBy("approx_d2", id_col)
        .limit(shortlist)
    )
    return (
        approx.join(normalized.select(id_col, vec_col), id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "neighbor_id")
        .limit(k)
    )


def ivfpq_residual_encode(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Encode vectors into the RESIDUAL IVF-PQ artifact under STORED
    quantizers: assign to the given coarse centroids, form the
    displacement ``r = v − c``, nearest residual code per subspace —
    the (id, centroid_id, codes) row a residual index stores per
    vector. Because both quantizers are frozen inputs, this is the
    append kernel, and the s48 law carries over unchanged:

    ``old_codes ∪ ivfpq_residual_encode(new, C, CB)`` ==
    ``ivfpq_residual_encode(old ∪ new, C, CB)`` — incremental equals
    full rebuild under the same artifacts (asserted row-for-row in
    tests/test_llm_ops.py::TestIvfPq, and externally via the s62
    registration's from-scratch DuckDB oracle). Work per ingest is
    O(batch × (n_centroids + m × n_codes)). ``round_digits`` is the
    :func:`pq_encode` cross-engine-deterministic argmin mode the
    oracle-checked registrations use.

    Degenerate (zero-norm) vectors get NULL centroid assignment and
    drop out, matching :func:`ivfpq_residual_topk`'s corpus side.

    Round-14: the codebook is collected ONCE (probe-bounded) and
    supplies both the slicing width (sub_d = the stored subvector
    length — the artifact defines the geometry) and the encode pack —
    previously a batch-side limit(1) dim probe plus a second codebook
    read cost two extra jobs per call, one full job each per streaming
    micro-batch (st61). An empty/degenerate codebook falls back to the
    old input dim probe."""
    normalized = l2_normalize(vectors, vec_col)
    cb_rows = _collect_codebook(codebooks)
    types = (
        codebooks.schema["j"].dataType.simpleString(),
        codebooks.schema["code"].dataType.simpleString(),
        codebooks.schema["cv"].dataType.simpleString(),
    )
    sub_d = next(
        (len(r["cv"]) for r in cb_rows if r["cv"] is not None), None
    )
    if sub_d is None:
        first = normalized.select(vec_col).limit(1).collect()
        if not first:
            id_type = vectors.schema[id_col].dataType.simpleString()
            return vectors.sparkSession.createDataFrame(
                [],
                f"{id_col} {id_type}, centroid_id long, codes array<int>",
            )
        sub_d = len(first[0][0]) // m
    cents = centroids.select(
        F.col(centroids.columns[0]).alias("centroid_id"),
        F.col(centroids.columns[1]).alias("centroid_vec"),
    )
    assign = ivf_assign_with_centroids(normalized, cents, id_col, vec_col)
    res = assign.join(F.broadcast(cents), "centroid_id").select(
        F.col(id_col),
        F.col("centroid_id"),
        _residual(vec_col).alias("_res"),
    )
    sub = res.select(
        F.col(id_col),
        F.posexplode(
            F.expr(_slices_sql("`_res`", m, sub_d))
        ).alias("j", "sv"),
    )
    return _pq_encode_rows(sub, cb_rows, types, id_col, round_digits).join(
        res.select(id_col, "centroid_id"), id_col
    ).select(id_col, "centroid_id", "codes")


def knn_graph_blocked(
    embeddings: DataFrame,
    block_col: str = "label",
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-nearest-neighbor GRAPH (every vector's top-k cosine neighbors),
    blocked by ``block_col``: candidates come only from the same block,
    so the pair space is Σ block² instead of corpus² — the blocked
    all-pairs recipe behind embedding dedup clusters, semantic graph
    construction, and label propagation.

    Locally the block is the testdata ``label``; at 100 TB it is an IVF
    cell assignment (``ivf_assign``) or LSH bucket (``sign_lsh``) — same
    plan: one equi-self-join on the block key (never a cross join), a
    narrow cosine map, and a per-vector ranking window. Block-size skew
    bounds the worst task; cap cells at assignment time as IVF does.

    Returns (vec_id, neighbor_id, cosine_sim, rk), rk 1..k per vector,
    deterministic via the rounded-similarity + neighbor-id tie-break.
    """
    left = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).alias("_va"),
    )
    right = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).alias("_vb"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        left.join(right, "_blk")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(cosine("_va", "_vb"), 6).alias("cosine_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a keyword ranking
    (query-term occurrence count over the text) and a semantic ranking
    (cosine vs the min-id corpus vector as the deterministic query) are
    fused as Σ 1_000_000 // (rrf_k + rank) — RRF in exact integer
    arithmetic, so the fused ordering is engine-portable.

    The RAG retrieval shape: both rankings come from single corpus
    scans (the query vector broadcasts; the term list is a literal).
    Because the OUTPUT exposes each arm's exact global rank, the arms
    rank via :func:`functions.rank.global_row_number` — the two-pass
    range-partitioned rank over the narrow (doc_id, score) projection —
    never an unpartitioned window (which would funnel the corpus
    through one task). Only the fused top-k survives
    (TakeOrderedAndProject). At 100 TB a shortlist-serving deployment
    drops the exact-global-rank contract and serves each arm from its
    index (BM25 postings: text.bm25_topk_from_postings; ANN:
    ivf_topk) — the fusion arithmetic is unchanged either way.

    Returns (doc_id, kw_score, kw_rank, cosine_sim, sem_rank,
    rrf_score) for the fused top-k, ties broken by doc_id.
    """
    from etl_example_spark.functions.rank import Ord, global_row_number
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    kw_score = None
    for t in query_terms:
        c = F.size(F.filter(toks, lambda x: x == F.lit(t)))
        kw_score = c if kw_score is None else kw_score + c
    scored_kw = docs.select(
        F.col(id_col).alias("doc_id"), kw_score.alias("kw_score")
    )
    query = (
        embeddings.orderBy(vec_id_col)
        .limit(1)
        .select(F.col(vec_col).alias("query_vec"))
    )
    scored_sem = (
        embeddings.crossJoin(F.broadcast(query))
        .select(
            F.col(vec_id_col).alias("doc_id"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("cosine_sim"),
        )
    )
    ranked_kw = global_row_number(
        scored_kw,
        [Ord("kw_score", asc=False), Ord("doc_id")],
        out="kw_rank",
    )
    ranked_sem = global_row_number(
        scored_sem,
        [Ord("cosine_sim", asc=False), Ord("doc_id")],
        out="sem_rank",
    )
    ranked = (
        ranked_kw.join(ranked_sem, "doc_id")
        .withColumn(
            "rrf_score",
            F.expr(f"1000000 div ({rrf_k} + kw_rank)")
            + F.expr(f"1000000 div ({rrf_k} + sem_rank)"),
        )
    )
    return (
        ranked.orderBy(F.desc("rrf_score"), "doc_id")
        .limit(k)
        .select(
            "doc_id", "kw_score", "kw_rank", "cosine_sim",
            "sem_rank", "rrf_score",
        )
    )


def rrf_fuse_shortlists(
    kw: DataFrame,
    sem: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two INDEX-SERVED shortlists — the
    100 TB serving form of :func:`hybrid_search_rrf`'s fusion: each arm
    arrives as a bounded (id, rank) shortlist from its own index (BM25
    postings / bucketed artifact for keywords, IVF/IVFPQ for vectors),
    so the fusion never touches the corpus — a full-outer join of two
    ≤ shortlist-sized frames plus the same exact integer arithmetic
    (``1_000_000 div (rrf_k + rank)``; a document missing from an arm
    contributes 0 for that arm, the standard shortlist-RRF convention).

    ``kw`` must carry (id_col, kw_rank); ``sem`` (id_col, sem_rank).
    Returns the fused top-``k`` as (id_col, kw_rank, sem_rank,
    rrf_score), ties broken by id — ranks stay NULL for the arm that
    did not surface the document.
    """
    fused = kw.join(sem, id_col, "full_outer")
    rrf = (
        F.coalesce(
            F.expr(f"1000000 div ({rrf_k} + kw_rank)"), F.lit(0)
        )
        + F.coalesce(
            F.expr(f"1000000 div ({rrf_k} + sem_rank)"), F.lit(0)
        )
    ).cast("long")
    return (
        fused.select(
            id_col, "kw_rank", "sem_rank", rrf.alias("rrf_score")
        )
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
    )


def rrf_fuse_shortlists_by_query(
    kw: DataFrame,
    sem: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    query_col: str = "query_id",
) -> DataFrame:
    """Per-query reciprocal-rank fusion of two index-served shortlist
    BATCHES — :func:`rrf_fuse_shortlists` generalized to many queries
    (the shape a streaming serve loop fuses per micro-batch): the
    full-outer join keys on (query, id), the integer RRF arithmetic is
    identical, and the top-``k`` cut is a per-query window over the
    joined shortlists — bounded input by construction (each arm ships
    ≤ shortlist rows per query), never the corpus.

    ``kw`` must carry (query_col, id_col, kw_rank); ``sem``
    (query_col, id_col, sem_rank). Returns (query_col, id_col,
    kw_rank, sem_rank, rrf_score, rk), rk 1..k per query, ties broken
    by id."""
    fused = kw.join(sem, [query_col, id_col], "full_outer")
    rrf = (
        F.coalesce(
            F.expr(f"1000000 div ({rrf_k} + kw_rank)"), F.lit(0)
        )
        + F.coalesce(
            F.expr(f"1000000 div ({rrf_k} + sem_rank)"), F.lit(0)
        )
    ).cast("long")
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.select(
            query_col, id_col, "kw_rank", "sem_rank",
            rrf.alias("rrf_score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def mmr_rerank(
    embeddings: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedily select the
    candidate maximizing ``lam·relevance − mu·max_sim_to_selected`` —
    the standard diversity re-rank for retrieval-augmented training-data
    selection (a plain top-k returns near-duplicate neighbors; MMR
    spends the budget on coverage).

    Architecture: the two corpus-scale steps are distributed — the
    relevance scan (broadcast query × corpus, TakeOrderedAndProject to
    ``pool``) and the pool's pairwise similarity matrix (pool² rows,
    same fixed-order :func:`cosine` fold as every similarity op). Only
    the greedy k-step argmax runs on the driver, over the ≤ pool²
    collected scalars — the bounded re-rank stage every production
    retrieval stack runs driver-side. ``lam``/``mu`` are independent
    literals (not ``1−lam``) so the score arithmetic is bit-identical
    in Python, Spark, and the unrolled SQL oracle
    (:func:`mmr_oracle_sql`); relevances and similarities enter it
    rounded to 6 decimals; ties break on the id.
    """
    query = embeddings.orderBy(id_col).limit(1)
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    cand = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            F.round(cosine(vec_col, "query_vec"), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "cid")
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("cid").alias("ia"), F.col("cv").alias("va"))
    b = cand.select(F.col("cid").alias("ib"), F.col("cv").alias("vb"))
    sims = {
        (r.ia, r.ib): r.s
        for r in a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", F.round(cosine("va", "vb"), 6).alias("s"))
        .collect()
    }
    rels = [(r.cid, r.rel) for r in cand.select("cid", "rel").collect()]
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for rank in range(1, min(k, len(rels)) + 1):
        best = None
        for cid, rel in rels:
            if cid in chosen:
                continue
            if chosen:
                score = lam * rel - mu * max(
                    sims[(cid, s)] for s in chosen
                )
            else:
                score = rel
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, rel)
        chosen.append(best[1])
        selected.append((rank, best[1], best[2]))

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("mmr_rank", IntegerType(), False),
            StructField(id_col, LongType(), False),
            StructField("relevance", DoubleType(), False),
        ]
    )
    return embeddings.sparkSession.createDataFrame(
        [(r, int(c), float(v)) for r, c, v in selected], schema
    )


def mmr_oracle_sql(
    k: int = 5, pool: int = 20, lam: float = 0.7, mu: float = 0.3
) -> str:
    """Unrolled k-step DuckDB twin of :func:`mmr_rerank` — each step is
    a CTE selecting the argmax of ``lam·rel − mu·max_sim_to_selected``
    over the not-yet-selected pool, with the selected set accumulated by
    UNION ALL (the same chained-CTE pattern as bpe_oracle_sql). Pass the
    SAME lam/mu as the Spark call — the literals are rendered with
    repr(), so both engines parse the identical decimal to the identical
    double."""
    head = f"""
        q AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings ORDER BY vec_id LIMIT 1
        ),
        cand AS (
            SELECT e.vec_id AS cid, CAST(e.embedding AS DOUBLE[]) AS cv,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), qv), 6) AS rel
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != qid
            ORDER BY rel DESC, cid LIMIT {pool}
        ),
        sim AS (
            SELECT a.cid AS ia, b.cid AS ib,
                   ROUND(list_cosine_similarity(a.cv, b.cv), 6) AS s
            FROM cand a JOIN cand b ON a.cid != b.cid
        ),
        pick1 AS (
            SELECT cid, rel FROM cand ORDER BY rel DESC, cid LIMIT 1
        ),
        sel1 AS (SELECT cid, rel FROM pick1)"""
    parts = [head]
    for i in range(2, k + 1):
        parts.append(
            f"""
        pick{i} AS (
            SELECT c.cid, c.rel FROM cand c
            WHERE c.cid NOT IN (SELECT cid FROM sel{i - 1})
            ORDER BY {lam!r} * c.rel - {mu!r} * (
                SELECT MAX(s.s) FROM sim s
                JOIN sel{i - 1} p ON s.ib = p.cid
                WHERE s.ia = c.cid
            ) DESC, c.cid
            LIMIT 1
        ),
        sel{i} AS (
            SELECT cid, rel FROM sel{i - 1}
            UNION ALL SELECT cid, rel FROM pick{i}
        )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {i} AS mmr_rank, cid, rel FROM pick{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f""" SELECT mmr_rank, cid AS vec_id, rel AS relevance
        FROM ({finals}) ORDER BY mmr_rank"""
    )


# ── Uniform 8-bit scalar quantization (SQ8) ──────────────────────────
#
# The fourth vector-compression path next to sign-LSH / IVF / PQ:
# faiss's QT_8bit_uniform — ONE global (lo, hi) bound pair for the whole
# corpus, every element linearly quantized to an int code in [0, 255].
# With a uniform scalar step, integer L2 over code arrays is EXACTLY
# rank-equivalent to L2 over the dequantized vectors (d2_float =
# step² · d2_int), so the symmetric search path is pure 64-bit integer
# arithmetic — bit-identical across engines at any scale, which is why
# sq8_topk can be hash-verified against a SQL oracle instead of only
# recall-bounded like the float-scored IVF/PQ paths.
#
# Scale posture: train is one min/max aggregate (order-independent,
# partial-aggregable); encode is a narrow zero-shuffle map (4× size
# reduction vs float32 before any search runs); append encodes only the
# arriving batch against the FROZEN stored bounds (O(batch), the
# ivf_append/pq_append discipline); topk broadcasts the query block and
# scans the code corpus once.


def sq8_train(
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the uniform quantizer: a 1-row (lo, hi) bounds artifact
    from the global element min/max of the corpus. Exact picks of
    existing values — no float arithmetic, so the artifact is
    engine-portable by construction."""
    v = _as_double(vec_col)
    return vectors.select(
        F.min(F.array_min(v)).alias("lo"),
        F.max(F.array_max(v)).alias("hi"),
    )


def sq8_encode(
    vectors: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize every element against the 1-row bounds artifact:
    ``code = clamp(floor(round((x − lo)·255/(hi − lo), 6)), 0, 255)``.

    The round-to-6 before floor is the pq_encode round_digits
    discipline: it pins the one float expression to a cross-engine-
    deterministic value so the floor can't straddle an ulp. Values
    outside [lo, hi] (possible only for post-training appends under
    frozen bounds) clamp to the edge codes; a degenerate hi == lo
    corpus encodes as all-zero codes rather than dividing by zero.
    Plan shape: broadcast of one row + a narrow map — zero shuffles.
    """
    lo, hi = F.col("lo"), F.col("hi")

    def q(x: Column) -> Column:
        t = F.floor(F.round((x - lo) * F.lit(255.0) / (hi - lo), 6))
        return (
            F.when(hi == lo, F.lit(0))
            .otherwise(F.least(F.lit(255), F.greatest(F.lit(0), t)))
            .cast("int")
        )

    return vectors.crossJoin(F.broadcast(bounds)).select(
        id_col, F.transform(_as_double(vec_col), q).alias("codes")
    )


def sq8_append(
    codes: DataFrame,
    new_vectors: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INCREMENTAL SQ8 index maintenance: encode only the arriving
    vectors against the STORED bounds and append to the stored code
    artifact — the indexed corpus is never re-encoded (the ivf_append/
    pq_append discipline). Work per ingest is O(batch × dim).

    Law: with bounds held fixed, ``sq8_append(encode(old), new, b)`` ==
    ``sq8_encode(old ∪ new, b)`` — incremental equals full rebuild
    under the same quantizer. Proven two ways: the s50_sq8_append
    registration's DuckDB oracle re-encodes the FULL corpus from
    scratch against the old-corpus bounds and hash-compares it to this
    incremental output, and tests/test_llm_ops.py asserts incremental
    == full-rebuild row-for-row in Spark. Re-training bounds
    (``sq8_train``) is the periodic offline job; between runs the index
    stays probe-consistent because every stored code used the same
    (lo, hi)."""
    return codes.unionByName(
        sq8_encode(new_vectors, bounds, id_col, vec_col)
    )


def sq8_topk(
    codes: DataFrame,
    query_codes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric SQ8 top-k: 64-bit integer L2 between code arrays,
    ranked ascending with the neighbor id as the deterministic
    tie-break. Because the quantizer step is one global scalar,
    d2_float = step²·d2_int — the integer ranking IS the dequantized-L2
    ranking, exactly, so this whole search path is hash-verifiable.

    Plan shape: broadcast the (small by definition) query block, one
    narrow map over the code corpus computes all query×corpus
    distances inside whole-stage codegen, a per-query ranking window
    over k·|queries| rows takes the top k. The corpus is scanned once
    regardless of query count."""
    q = query_codes.select(
        F.col(id_col).alias("query_id"),
        F.col("codes").alias("query_codes"),
    )
    # SQL lambda, not a Python-lambda builder chain: nested HOFs built
    # from Python lambdas collide on lambda variable names (see _sq_l2)
    d2 = F.expr(
        "aggregate(zip_with(codes, query_codes, "
        "(x, y) -> cast(x - y as bigint) * cast(x - y as bigint)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            d2.alias("d2"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def sq8_kmeans(
    codes: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    max_train_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over SQ8-QUANTIZED vectors, integer-exact end to
    end — the FAISS-style coarse-quantizer training step (train the
    cluster structure on compressed codes, not raw floats) made
    externally hash-verifiable: distances are 64-bit integer squared
    L2 between code arrays, ties break to the lower centroid id, and
    the centroid update is the per-dimension FLOOR mean (integer
    division) — no float ever enters, so an oracle can replay every
    iteration (the ivf_train float path can only be rows-only/recall
    checked; this is the quantized twin that hashes).

    Seeding is the ``k`` lowest-id vectors' codes (the ivf_assign
    discipline: deterministic, engine-portable). Empty cells keep
    their previous centroid.

    Plan per iteration: the driver-held centroid state (k rows)
    broadcasts as one packed row into the code scan, the assign argmin
    folds IN-ROW over the k-term distance array (no corpus × centroid
    expansion, no per-id aggregate — see assign_to's comment), and the
    update shuffles (cid, dim, partial-sum) triples — ≤ k·dims groups
    after map-side partials — into a bounded driver collect (the d106
    parameter-server discipline shared with ivf_train/pq_train).
    Codes are 4× smaller than float32, so even the one corpus-wide
    scan per iteration reads a quarter of the raw-vector bytes.

    ``max_train_rows`` bounds the Lloyd passes (and the seed pick) to
    a deterministic hash-bottom sample (:func:`_train_sample` — the
    ivf_train/pq_train contract, completing sampled training across
    ALL of the engine's quantizer trainers); the returned assignment
    still covers the FULL input under the final centroids.

    Returns ``(centroids, assignment)``: (centroid_id, cent) with
    cent an int array, and (vec_id, centroid_id, d2) under the FINAL
    centroids."""
    train = (
        codes
        if max_train_rows is None
        else _train_sample(codes, id_col, max_train_rows)
    )

    # in-row argmin (round-13 optimization, guide §2.4/§3.1): previously
    # a broadcast-crossJoin expanded src × centroids and a struct-keyed
    # min_by folded it back per id (Sort + Exchange + SortAggregate —
    # measured on the PQ sibling as the real iteration cost). The
    # centroids are driver-held state, so pack them as ONE broadcast
    # row (cent arrays + dense ids, id order) and take the argmin
    # inside the row. min_by(struct(d2, centroid_id)) semantics
    # replicated exactly: NULL d2 sorts FIRST (the exists() branch
    # picks the first NULL, i.e. the lowest centroid id), distance
    # ties break to the lower id (array_position returns the first
    # match in id order), the winning d2 rides along (NULL in the
    # NULL-win case, as min_by carried it). Integer arithmetic is the
    # same CAST/fold, so distances are exact either way. One output
    # row per input row — ids key the artifact, as before.
    spark = codes.sparkSession
    elem = train.schema[codes_col].dataType.simpleString()  # array<...>

    def assign_to(src: DataFrame = codes) -> DataFrame:
        cds = sorted(cent_state)
        if not cds:  # empty training set: the old crossJoin with an
            # empty centroid table produced no rows at all
            return (
                src.select(F.col(id_col), F.col(codes_col))
                .filter(F.lit(False))
                .withColumn("centroid_id", F.lit(None).cast("long"))
                .withColumn("d2", F.lit(None).cast("long"))
            )
        packed = local_df(
            spark,
            [([cent_state[c] for c in cds], [int(c) for c in cds])],
            f"cvs array<{elem}>, cds array<bigint>",
        )
        ds = F.expr(
            f"transform(cvs, cv -> aggregate(zip_with({codes_col}, cv, "
            "(a, b) -> CAST((a - b) AS BIGINT) * CAST((a - b) AS BIGINT)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x))"
        )
        pos = F.expr(
            "CASE WHEN exists(_ds, x -> x IS NULL) THEN "
            "CAST(array_position("
            "transform(_ds, x -> CAST(x IS NULL AS INT)), 1) AS INT) "
            "ELSE CAST(array_position(_ds, array_min(_ds)) AS INT) END"
        )
        return (
            src.crossJoin(F.broadcast(packed))
            .withColumn("_ds", ds)
            .withColumn("_bp", pos)
            .select(
                id_col,
                codes_col,
                F.expr("cds[_bp - 1]").alias("centroid_id"),
                F.expr("_ds[_bp - 1]").alias("d2"),
            )
        )

    # seeds: the k lowest-id codes, re-keyed 0..k-1 in id order (the
    # previous row_number window, done on the driver over k rows —
    # model-sized state, the d106 parameter-server discipline; NULL ids
    # sort first, matching Spark's ASC nulls-first window order)
    seed_rows = sorted(
        train.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("cid0"),
            F.col(codes_col).alias("cent"),
        )
        .collect(),
        key=lambda r: (r["cid0"] is not None, r["cid0"]),
    )
    cent_state: dict[int, list | None] = {
        i: (list(r["cent"]) if r["cent"] is not None else None)
        for i, r in enumerate(seed_rows)
    }

    def cents_df() -> DataFrame:
        rows = [(cid, cent_state[cid]) for cid in sorted(cent_state)]
        return local_df(
            spark, rows, f"centroid_id long, cent {elem}"
        )

    for _ in range(iters):
        assign = assign_to(train)
        mean_rows = (
            assign.select(
                "centroid_id",
                F.posexplode(codes_col).alias("dim", "x"),
            )
            .groupBy("centroid_id", "dim")
            .agg(
                F.sum(F.col("x").cast("long")).alias("sx"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        upd: dict[int, dict[int, int]] = {}
        for r in mean_rows:
            if r["centroid_id"] is None:
                continue
            sx, n = r["sx"], r["n"]
            # Spark's `sx DIV n` truncates toward zero; replicate for
            # any sign (codes are nonnegative in practice, where this
            # equals floor division)
            q = abs(sx) // n if sx is not None else None
            m = None if q is None else (q if sx >= 0 else -q)
            upd.setdefault(r["centroid_id"], {})[r["dim"]] = m
        # empty cells keep their previous centroid (old left-join +
        # coalesce semantics)
        for cid, dims in upd.items():
            cent_state[cid] = [dims[d] for d in sorted(dims)]
    return cents_df(), assign_to()
