"""In-row argmin/argmax semantics of the reworked ANN kernels (r13).

The round-13 optimization replaced the corpus × centroids/codes
broadcast-join expansion + min_by/max_by fold with an in-row pick over
the packed model (operators/similarity.py). These tests pin the fold
semantics the rewrite replicates, on inputs the fixtures never contain:
distance TIES break to the lower code/centroid id, NULL distances win a
min_by-shaped pick (NULL-first struct ordering) but lose an argmax, and
NaN sorts greatest. The oracle suite already hash-checks the well-formed
paths; these are the adversarial corners."""

from pyspark.sql import functions as F

from etl_example_spark.operators import similarity as S


def test_pq_encode_tie_breaks_to_lower_code(spark):
    sub = spark.createDataFrame(
        [(1, 0, [1.0, 0.0])], "vec_id long, j int, sv array<double>"
    )
    # codes 7 and 3 have IDENTICAL centroid subvectors -> equal d2;
    # min_by(struct(d2, code)) picked the lower code
    cb = spark.createDataFrame(
        [(0, 7, [0.0, 0.0]), (0, 3, [0.0, 0.0]), (0, 9, [5.0, 5.0])],
        "j int, code int, cv array<double>",
    )
    out = S.pq_encode(sub, cb, "vec_id").collect()
    assert out[0]["codes"] == [3]


def test_pq_encode_null_distance_wins_unrounded_mode(spark):
    sub = spark.createDataFrame(
        [(1, 0, [1.0, 0.0])], "vec_id long, j int, sv array<double>"
    )
    # code 5's centroid is NULL -> d2 NULL -> sorts FIRST in the old
    # struct min_by; the in-row pick must preserve that
    cb = spark.createDataFrame(
        [(0, 5, None), (0, 1, [1.0, 0.0])],
        "j int, code int, cv array<double>",
    )
    out = S.pq_encode(sub, cb, "vec_id").collect()
    assert out[0]["codes"] == [5]


def test_pq_encode_rounded_mode_skips_null_distance(spark):
    sub = spark.createDataFrame(
        [(1, 0, [1.0, 0.0])], "vec_id long, j int, sv array<double>"
    )
    # rounded mode aggregated min over packed units, and MIN ignores
    # NULLs -> the NULL-centroid code loses; exact match (d2=0) wins
    cb = spark.createDataFrame(
        [(0, 5, None), (0, 1, [1.0, 0.0])],
        "j int, code int, cv array<double>",
    )
    out = S.pq_encode(sub, cb, "vec_id", round_digits=6).collect()
    assert out[0]["codes"] == [1]


def test_ivf_assign_similarity_tie_breaks_to_lower_centroid_id(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    # both centroids have cosine 1.0 with the vector (same direction);
    # the old max_by(struct(c_sim, -centroid_id)) picked the LOWER id
    cents = spark.createDataFrame(
        [(20, [2.0, 2.0]), (10, [0.5, 0.5])],
        "centroid_id long, centroid_vec array<double>",
    )
    got = S.ivf_assign_with_centroids(emb, cents).collect()[0]
    assert got["centroid_id"] == 10 and got["c_sim"] == 1.0


def test_ivf_assign_empty_centroid_table_yields_no_rows(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [], "centroid_id long, centroid_vec array<double>"
    )
    out = S.ivf_assign_with_centroids(emb, cents)
    assert out.count() == 0
    assert out.columns == ["vec_id", "embedding", "centroid_id", "c_sim"]


def test_kernels_identical_across_the_sql_render_threshold(
    spark, monkeypatch
):
    """Round-14 size guard (VERDICT r13 #3/#4): past _SQL_RENDER_MAX the
    packed model ships via binary createDataFrame instead of VALUES SQL
    — same kernel expression, bit-identical results. Run both paths on
    the same inputs and compare row for row."""
    from etl_example_spark.functions import localrel

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, -0.5 * i, 2.0]) for i in range(1, 9)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 1.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    sub = spark.createDataFrame(
        [(i, j, [float(i), -float(j)]) for i in range(3) for j in range(2)],
        "vec_id long, j int, sv array<double>",
    )
    cb = spark.createDataFrame(
        [(j, c, [0.5 * c, float(j)]) for j in range(2) for c in range(3)],
        "j int, code int, cv array<double>",
    )
    normal_assign = sorted(
        map(repr, S.ivf_assign_with_centroids(emb, cents).collect())
    )
    normal_codes = sorted(map(repr, S.pq_encode(sub, cb).collect()))
    monkeypatch.setattr(localrel, "_SQL_RENDER_MAX", 4)
    assert (
        sorted(map(repr, S.ivf_assign_with_centroids(emb, cents).collect()))
        == normal_assign
    )
    assert sorted(map(repr, S.pq_encode(sub, cb).collect())) == normal_codes


def test_model_rows_bound_fails_fast_before_collect(spark, monkeypatch):
    """Round-14 (ADVICE r13): an over-contract centroid table/codebook
    raises the clear model-size error via a limit(bound) probe instead
    of materializing unbounded rows on the driver."""
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "centroid_id long, centroid_vec array<double>",
    )
    sub = spark.createDataFrame(
        [(1, 0, [1.0])], "vec_id long, j int, sv array<double>"
    )
    cb = spark.createDataFrame(
        [(0, c, [float(c)]) for c in range(4)],
        "j int, code int, cv array<double>",
    )
    monkeypatch.setattr(S, "_MODEL_ROWS_BOUND", 3)
    with pytest.raises(Exception, match="too many centroids"):
        S.ivf_assign_with_centroids(emb, cents)
    with pytest.raises(Exception, match="model-size bound"):
        S.pq_encode(sub, cb)


def test_sq8_assignment_tie_and_null_handling(spark):
    codes = spark.createDataFrame(
        [(1, [5, 5]), (2, None)], "vec_id long, codes array<int>"
    )
    cents, assign = S.sq8_kmeans(codes, k=2, iters=0)
    got = {r["vec_id"]: (r["centroid_id"], r["d2"]) for r in assign.collect()}
    # centroid 1 is seeded from vec 2's NULL codes, so EVERY vector has
    # a NULL distance to it — and NULL sorts FIRST in the old
    # min_by(struct(d2, centroid_id)), so the NULL-distance centroid
    # WINS even against an exact match (d2=0). The in-row pick must
    # preserve exactly that (first NULL position); for the all-NULL row
    # (vec 2) the tie breaks to the lowest centroid id.
    assert got[1] == (1, None)
    assert got[2] == (0, None)
