"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the reference's informal correctness story
(SURVEY §5) hardened into laws.

Sessions are expensive, so strategies stay small and deterministic
(fixed seeds via hypothesis derandomization in CI-like runs)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_example_spark.functions.numeric import as_scaled_long
from etl_example_spark.operators.curation import (
    quality_filter,
    quality_predicate,
    repair_date_column,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

quantities = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(10**7), max_value=10**7)),
    min_size=1,
    max_size=50,
)


@given(qs=quantities)
@SETTINGS
def test_quality_filter_partitions_rows(spark, qs):
    """filter(pred) and filter(~pred) partition the table exactly."""
    df = spark.createDataFrame([(q,) for q in qs], "quantity int")
    kept = quality_filter(df, "quantity").count()
    dropped = df.filter(quality_predicate("quantity")).count()
    assert kept + dropped == len(qs)
    # and the kept side satisfies the reference's keep-contract
    for r in quality_filter(df, "quantity").collect():
        assert r.quantity is not None and 0 < r.quantity <= 1_000_000


@given(
    dates=st.lists(
        st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_date_repair_roundtrip(spark, dates):
    """Any yyyy/MM/dd string parses back to the original date."""
    rows = [(d.strftime("%Y/%m/%d"),) for d in dates]
    df = repair_date_column(
        spark.createDataFrame(rows, "daily string"), "daily"
    )
    assert [r.daily for r in df.collect()] == list(dates)
    assert dict(df.dtypes)["daily"] == "date"


@given(
    vals=st.lists(
        st.decimals(
            min_value=-(10**6), max_value=10**6, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@SETTINGS
def test_exact_sum_is_order_independent(spark, vals, seed):
    """The scaled-integer sum gives the same answer for any row order and
    any partitioning — the invariant naive double sums break."""
    import random

    rows = [(float(v),) for v in vals]
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)

    def total(rs, parts):
        df = spark.createDataFrame(rs, "x double").repartition(parts)
        return df.agg(
            (F.sum(as_scaled_long("x")).cast("double") / 100).alias("s")
        ).collect()[0].s

    assert total(rows, 1) == total(shuffled, 7)


cdc_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),          # key
        st.sampled_from(["U", "I", "D"]),               # op
        st.integers(min_value=0, max_value=99),         # payload
        st.integers(min_value=0, max_value=20),         # sequence
    ),
    min_size=0,
    max_size=25,
)


@given(changes=cdc_changes)
@SETTINGS
def test_apply_cdc_matches_reference_model(spark, changes):
    """apply_cdc == a dict-based reference model: compact the batch to
    the winning change per key (max sequence, delete wins ties), then
    replay upserts/deletes over the initial state."""
    from etl_example_spark.operators.merge import apply_cdc

    target_rows = [(k, -1) for k in range(5)]  # keys 0..4 pre-exist

    # reference model
    winner: dict[int, tuple] = {}
    for k, op, v, seq in changes:
        cur = winner.get(k)
        # higher sequence wins; same sequence: 'D' < 'I' < 'U' ascending
        # puts D first -> D wins ties
        rank = (seq, {"D": 2, "I": 1, "U": 0}[op])
        if cur is None or rank > cur[0]:
            winner[k] = (rank, op, v)
    expect = {k: v for k, v in target_rows}
    for k, (_, op, v) in winner.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    target = spark.createDataFrame(target_rows, "k long, v long")
    if changes:
        ch = spark.createDataFrame(
            [(k, v, op, seq) for k, op, v, seq in changes],
            "k long, v long, op string, seq long",
        )
        merged = apply_cdc(target, ch, ["k"], sequence_col="seq")
    else:
        merged = target
    got = {r.k: r.v for r in merged.collect()}
    assert got == expect


pack_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=999),   # doc id (deduped below)
        st.integers(min_value=0, max_value=40),    # token count
        st.sampled_from(["a", "b"]),               # group
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(docs=pack_docs, budget=st.integers(min_value=1, max_value=64))
@SETTINGS
def test_packing_matches_reference_model(spark, docs, budget):
    """pack_concat_chunks == the sequential reference model: per group in
    id order, each doc starts at the running token total and lands in
    bin start // budget."""
    from etl_example_spark.operators.packing import pack_concat_chunks

    df = spark.createDataFrame(
        [(i, "w " * n, g) for i, n, g in docs],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.start_offset, r.bin_id)
        for r in pack_concat_chunks(df, budget=budget).collect()
    }

    expect = {}
    offsets: dict[str, int] = {}
    for i, n, g in sorted(docs):
        start = offsets.get(g, 0)
        expect[i] = (start, start // budget)
        offsets[g] = start + n
    assert got == expect


count_dicts = st.dictionaries(
    st.sampled_from(["en", "de", "fr", "zh", "es"]),
    st.integers(min_value=1, max_value=10**6),
    min_size=1,
    max_size=5,
)


@given(
    counts=count_dicts,
    alpha=st.floats(min_value=0.0, max_value=1.0),
    keep=st.floats(min_value=0.01, max_value=1.0),
)
@SETTINGS
def test_temperature_rates_laws(counts, alpha, keep):
    """Rates are valid probabilities; realized quota never exceeds the
    target; with no binding caps the quota hits the target exactly."""
    from etl_example_spark.operators.sampling import temperature_rates

    rates = temperature_rates(counts, alpha, keep)
    assert set(rates) == set(counts)
    assert all(0.0 <= r <= 1.0 for r in rates.values())
    total = sum(counts.values())
    quota = sum(rates[s] * counts[s] for s in counts)
    assert quota <= keep * total * (1 + 1e-9)
    if all(r < 1.0 for r in rates.values()):
        assert abs(quota - keep * total) <= 1e-6 * total


asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=50),   # ts (seconds)
        st.integers(min_value=0, max_value=99),   # payload
    ),
    min_size=0,
    max_size=20,
)


@given(left=asof_rows, right=asof_rows)
@SETTINGS
def test_as_of_join_matches_reference_model(spark, left, right):
    """as_of_join == per-row argmax over right rows with ts <= left ts
    (same key). Right side deduped to (key, ts) as the operator's
    contract requires."""
    from etl_example_spark.operators.temporal import as_of_join

    base = dt.datetime(2024, 1, 1)
    right_dedup = {}
    for k, ts, v in right:
        right_dedup[(k, ts)] = v  # unique per (key, ts): last wins
    rrows = [
        (k, base + dt.timedelta(seconds=ts), v)
        for (k, ts), v in sorted(right_dedup.items())
    ]
    lrows = [
        (k, base + dt.timedelta(seconds=ts), v) for k, ts, v in left
    ]
    ldf = spark.createDataFrame(
        lrows or [], "k int, lts timestamp, lv int"
    )
    rdf = spark.createDataFrame(
        rrows or [], "k int, rts timestamp, rv int"
    )
    if not lrows:
        return
    got = sorted(
        (r.k, r.lts, r.lv, r.rv)
        for r in as_of_join(ldf, rdf, "k", "lts", "rts", ["rv"]).collect()
    )

    expect = []
    for k, lt, lv in lrows:
        cands = [
            (rt, rv) for (rk, rtsec), rv in right_dedup.items()
            if rk == k
            for rt in [base + dt.timedelta(seconds=rtsec)]
            if rt <= lt
        ]
        rv = max(cands)[1] if cands else None
        expect.append((k, lt, lv, rv))
    assert got == sorted(expect)


@given(left=asof_rows, right=asof_rows)
@SETTINGS
def test_binned_range_join_matches_nested_loop(spark, left, right):
    """binned_range_join == the O(n*m) nested-loop reference: all pairs
    with same key and right_ts in [left_ts, left_ts + width)."""
    from etl_example_spark.operators.temporal import binned_range_join

    width = 7
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=ts))
        for i, (k, ts, _v) in enumerate(left)
    ]
    rrows = [
        (j, k, base + dt.timedelta(seconds=ts))
        for j, (k, ts, _v) in enumerate(right)
    ]
    if not lrows or not rrows:
        return
    ldf = spark.createDataFrame(lrows, "lid int, lk int, lts timestamp")
    rdf = spark.createDataFrame(rrows, "rid int, rk int, rts timestamp")
    got = sorted(
        (r.lid, r.rid)
        for r in binned_range_join(
            ldf, rdf, "lk", "rk", "lts", "rts", width_seconds=width,
            bin_seconds=3,
        ).collect()
    )
    expect = sorted(
        (li, rj)
        for li, lk, lt in lrows
        for rj, rk, rt in rrows
        if lk == rk and lt <= rt < lt + dt.timedelta(seconds=width)
    )
    assert got == expect


@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=5,
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.floats(min_value=0.1, max_value=10.0, allow_nan=False),
        min_size=1,
        max_size=5,
    ),
)
@SETTINGS
def test_mixture_rates_laws(counts, weights):
    """mixture_rates invariants for ANY counts/weights: (1) rates in
    [0,1]; (2) no-weight strata are dropped; (3) the binding stratum
    keeps (essentially) all its rows; (4) among unsaturated strata, the
    realized kept masses are proportional to the target weights."""
    from etl_example_spark.operators.sampling import mixture_rates

    rates = mixture_rates(counts, weights)
    assert set(rates) == set(counts)
    assert all(0.0 <= r <= 1.0 for r in rates.values())
    active = {
        s for s in counts if weights.get(s, 0) > 0
    }
    for s in set(counts) - active:
        assert rates[s] == 0.0
    if not active:
        return
    # binding stratum saturates
    assert any(rates[s] > 1.0 - 1e-9 for s in active)
    kept = {s: rates[s] * counts[s] for s in active}
    w = {s: weights[s] for s in active}
    unsat = [s for s in active if rates[s] < 1.0 - 1e-9]
    for s in unsat:
        for t in unsat:
            # kept_s / kept_t == w_s / w_t (proportionality law)
            assert abs(kept[s] * w[t] - kept[t] * w[s]) <= 1e-6 * max(
                kept[s] * w[t], kept[t] * w[s], 1.0
            )


@given(
    urls=st.lists(
        st.builds(
            lambda scheme, host, path, track, keep, frag: (
                f"{scheme}://{host}/{path}"
                + (f"?utm_source={track}" if track else "")
                + (
                    ("&" if track else "?") + f"id={keep}"
                    if keep
                    else ""
                )
                + (f"#{frag}" if frag else "")
            ),
            st.sampled_from(["HTTP", "https", "HtTpS"]),
            st.sampled_from(["Example.COM", "sub.Host.net", "x.org"]),
            st.sampled_from(["a/b", "item/1", "p"]),
            st.sampled_from(["", "tw", "feed"]),
            st.sampled_from(["", "7", "42"]),
            st.sampled_from(["", "sec2"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_canonicalize_url_idempotent(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u) for any URL in
    the generated grammar, the output never carries fragments or
    tracking params, and the authority is lowercased."""
    from etl_example_spark.operators.text import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url("url").alias("c1"))
    twice = once.select(
        "c1", canonicalize_url("c1").alias("c2")
    ).collect()
    for r in twice:
        assert r.c2 == r.c1
        assert "#" not in r.c1 and "utm_" not in r.c1
        scheme_host = r.c1.split("/")[2] if "://" in r.c1 else ""
        assert scheme_host == scheme_host.lower()


texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0xFFFF
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@given(ts=texts)
@SETTINGS
def test_normalize_text_idempotent(spark, ts):
    """normalize(normalize(x)) == normalize(x) for arbitrary BMP text —
    the law that makes the pre-fingerprint stage safe to re-run."""
    from etl_example_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
    )
    once = df.select(
        "doc_id", normalize_text("text").alias("text")
    )
    twice = once.select(
        "doc_id", normalize_text("text").alias("text")
    )
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b


word_lists = st.lists(
    st.lists(
        st.sampled_from(["ab", "abc", "aab", "ba", "a", "aaa", "bab"]),
        min_size=1,
        max_size=6,
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(docs=word_lists)
@SETTINGS
def test_bpe_train_order_invariant_and_matches_reference(spark, docs):
    """Learned merges are a pure function of the word MULTISET — row
    order must not matter — and equal the canonical Python trainer."""
    from tests.test_curation_ops import _reference_bpe
    from etl_example_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rev = spark.createDataFrame(
        [(i, t) for i, t in enumerate(reversed(docs))],
        "doc_id long, text string",
    )
    counts: dict[str, int] = {}
    for t in docs:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    want = _reference_bpe(counts, 4)
    assert bpe_train(df, n_merges=4) == want
    assert bpe_train(rev, n_merges=4) == want


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
    ),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
)
@SETTINGS
def test_wav_codec_roundtrip_any_samples(samples, rate):
    """encode→decode is the identity for every int16 sequence/rate."""
    import numpy as np

    from etl_example_spark.operators.multimodal import decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    r, ch, out = decode_wav(encode_wav(arr, rate=rate))
    assert r == rate and ch == 1 and (out == arr).all()


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@SETTINGS
def test_ppm_codec_roundtrip_any_raster(shape, seed):
    """encode→decode is the identity for every uint8 RGB raster."""
    import numpy as np

    from etl_example_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(arr))
    assert (out == arr).all()


deltas_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),      # key
        st.sampled_from([1, -1]),                   # op
        st.integers(min_value=-500, max_value=500),  # cents
    ),
    min_size=0,
    max_size=12,
)


@given(d1=deltas_strategy, d2=deltas_strategy)
@SETTINGS
def test_retractable_merge_law_random_batches(spark, d1, d2):
    """state(b1 ∪ b2) == merge(state(b1), state(b2)) for ANY batch
    split, including negative interim counts."""
    from etl_example_spark.operators.merge import (
        merge_retractable_states,
        retractable_state,
    )

    schema = "user_id long, op int, cents long"
    b1 = spark.createDataFrame(d1 or [], schema)
    b2 = spark.createDataFrame(d2 or [], schema)
    whole = retractable_state(b1.unionByName(b2))
    merged = merge_retractable_states(
        retractable_state(b1), retractable_state(b2)
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
    ),
    channels=st.sampled_from([1, 2, 3, 4]),
    mode=st.sampled_from(["cycle", "zero"]),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_png_codec_roundtrip_any_raster(shape, channels, mode, seed):
    """encode→decode is the identity for every 8-bit raster in every
    supported color type, whichever scanline filters the encoder used
    (the cycle mode walks all five)."""
    import numpy as np

    from etl_example_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_mode=mode))
    assert out.shape == arr.shape and (out == arr).all()


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 43) - 1),
            st.integers(min_value=0, max_value=(1 << 20) - 1),
        ),
        min_size=2,
        max_size=20,
    )
)
@SETTINGS
def test_packed_occurrence_order_matches_lexicographic(spark, pairs):
    """min over the packed bigint must pick the lexicographic min
    (doc_id, pos) for ANY in-bounds occurrence set — the law that lets
    the first-occurrence aggregates run as HashAggregate."""
    from etl_example_spark.operators.dedup import (
        _pack_occurrence,
        _unpack_occurrence,
    )

    df = spark.createDataFrame(pairs, "doc_id long, pos int")
    packed_min = df.select(
        _pack_occurrence(F.col("doc_id"), F.col("pos")).alias("k")
    ).agg(F.min("k").alias("k"))
    d, p = _unpack_occurrence(F.col("k"))
    got = packed_min.select(d.alias("d"), p.alias("p")).collect()[0]
    want = min(pairs)
    assert (got.d, got.p) == want


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=1, max_value=28),
    ),
    color=st.booleans(),
    rst=st.sampled_from([0, 1, 2, 5]),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_jpeg_codec_roundtrip_bounded_error(shape, color, rst, seed):
    """Baseline JPEG at unit quantization: encode→decode reproduces any
    raster within the FDCT/IDCT round-off budget — ±1 per grayscale
    sample (one rint each way), ±3 per RGB sample (adds two YCbCr
    rounding hops) — across arbitrary (non-multiple-of-8) dimensions
    and restart intervals. Exactness on DC-only content is pinned
    separately (flat-block test + the m43 external oracle)."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    size = (*shape, 3) if color else shape
    arr = rng.integers(0, 256, size=size, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, restart_interval=rst))
    assert out.shape == arr.shape
    err = np.abs(out.astype(np.int64) - arr.astype(np.int64)).max()
    assert err <= (3 if color else 1), f"round-trip error {err}"


@given(
    blocks=st.integers(min_value=1, max_value=6),
    rows=st.integers(min_value=1, max_value=3),
    rst=st.sampled_from([0, 3]),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_jpeg_flat_blocks_roundtrip_exact(blocks, rows, rst, seed):
    """DC-only content is EXACT: a grayscale image of flat 8x8 blocks
    survives encode→decode bit-for-bit (the m43 oracle's construction:
    a flat block's DC is 8(v-128) — integral under unit quant — and a
    DC-only IDCT is exactly flat)."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(rows, blocks), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, restart_interval=rst))
    assert (out == img).all()


@given(
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_jpeg_420_smooth_chroma_bounded(seed):
    """4:2:0 subsampling with chroma constant per 2x2: the only loss is
    YCbCr rounding, so the round trip stays within the color budget."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    out = decode_jpeg(encode_jpeg(img, subsampling=(2, 2)))
    assert out.shape == img.shape
    err = np.abs(out.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 3, f"4:2:0 smooth round-trip error {err}"


def test_jpeg_lossy_quant_table_still_decodes_sanely():
    """A real (coarse) quant table loses information but the decode must
    stay structurally correct: a smooth gradient survives within the
    quantization budget, and the quant table round-trips through DQT."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    # gradient image; coarse-ish table (DC step 16, AC step 24)
    x = np.linspace(40, 215, 32)
    img = np.clip(np.rint(x[None, :] + x[:, None] / 2), 0, 255).astype(
        np.uint8
    )
    quant = [16] + [24] * 63
    out = decode_jpeg(encode_jpeg(img, quant=quant))
    err = np.abs(out.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 40, f"gradient error {err} exceeds quant budget"
    assert abs(float(out.mean()) - float(img.mean())) <= 4.0


def test_jpeg_rejects_progressive_and_garbage():
    import pytest

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # flip baseline SOF0 (0xC0) to progressive SOF2 (0xC2)
    import numpy as np

    payload = bytearray(
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    )
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(payload))


@given(
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_jpeg_422_smooth_chroma_bounded(seed):
    """4:2:2 (horizontal-only) subsampling with chroma constant per
    1x2 pair: YCbCr rounding is the only loss."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(16, 10, 3), dtype=np.uint8)
    img = np.repeat(base, 2, axis=1)
    out = decode_jpeg(encode_jpeg(img, subsampling=(2, 1)))
    assert out.shape == img.shape
    err = np.abs(out.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 3, f"4:2:2 smooth round-trip error {err}"


@given(seed=st.integers(min_value=0, max_value=2**16))
@SETTINGS
def test_jpeg_truncation_fuzz_never_raw_index_error(seed):
    """A codec at the Arrow batch boundary must fail catchably: EVERY
    truncation of a valid JPEG either still decodes (cuts that only
    drop the EOI marker — entropy data was already complete) or raises
    ValueError — never a raw IndexError/struct.error from half-parsed
    state."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    payload = encode_jpeg(img)
    for cut in range(0, len(payload), 3):
        try:
            out = decode_jpeg(payload[:cut])
        except ValueError:
            continue
        assert out.shape == img.shape  # EOI-only truncation decoded fine


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
    ),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_jpeg_optimal_and_fixed_tables_decode_identically(shape, seed):
    """Huffman tables change the bitstream, never the pixels: the
    frequency-optimal length-limited canonical tables (variable code
    lengths — the real-encoder shape) and the fixed-length tables must
    decode to identical arrays. Exercises the decoder's Annex-C walk
    across code lengths.

    Size: the optimal table minimizes the SCAN's coded bits, not the
    file — its DHT segment can be longer than the fixed table's, and on
    a one-block image that overhead can exceed the entropy win by a few
    bytes (hypothesis found a 13x1 image where the 'optimized' file is
    1 byte larger). The honest invariant is therefore bounded by the
    table-declaration overhead (16 length counts + at most the extra
    declared values), not a strict <=."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    p_opt = encode_jpeg(img, optimize_huffman=True)
    p_fix = encode_jpeg(img, optimize_huffman=False)
    assert (decode_jpeg(p_opt) == decode_jpeg(p_fix)).all()
    assert len(p_opt) <= len(p_fix) + 64  # DHT-overhead slack


def test_jpeg_optimal_tables_win_when_data_dominates():
    """Where the entropy-coded scan dwarfs the table declarations (a
    64x64 random image, ~64 blocks), the frequency-optimal tables must
    produce a strictly-no-larger file — the size claim the
    property test above can only make with overhead slack."""
    import numpy as np

    from etl_example_spark.operators.multimodal import encode_jpeg

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    p_opt = encode_jpeg(img, optimize_huffman=True)
    p_fix = encode_jpeg(img, optimize_huffman=False)
    assert len(p_opt) <= len(p_fix)


@given(
    n=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=2**16),
    skew=st.sampled_from(["uniform", "zipf", "fibonacci"]),
)
@SETTINGS
def test_optimal_huff_tables_always_valid(n, seed, skew):
    """_optimal_huff must produce a legal JPEG table for ANY frequency
    distribution: ≤16-bit lengths (Annex K.3 fold — fibonacci
    frequencies force maximal unclamped depth), prefix-free canonical
    codes, the all-ones codeword never assigned (the dummy-slot
    reservation), and every input symbol present exactly once."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        _huff_encode_table,
        _optimal_huff,
    )

    rng = np.random.default_rng(seed)
    if skew == "uniform":
        freqs = {s: 1 + int(rng.integers(0, 10)) for s in range(n)}
    elif skew == "zipf":
        freqs = {s: max(1, int(10_000 / (s + 1))) for s in range(n)}
    else:
        a, b, freqs = 1, 1, {}
        for s in range(min(n, 80)):
            freqs[s] = a
            a, b = b, a + b
    bits, vals = _optimal_huff(freqs)
    assert sorted(vals) == sorted(freqs)
    assert sum(bits) == len(freqs)
    tbl = _huff_encode_table(bits, vals)
    pairs = [(ln, code) for code, ln in tbl.values()]
    assert all(ln <= 16 for ln, _ in pairs)
    assert all(code != (1 << ln) - 1 for ln, code in pairs)
    for i, (l1, c1) in enumerate(pairs):
        for l2, c2 in pairs[i + 1 :]:
            la, ca, lb, cb = (
                (l1, c1, l2, c2) if l1 <= l2 else (l2, c2, l1, c1)
            )
            assert (cb >> (lb - la)) != ca, "prefix violation"


@given(
    n_frames=st.integers(min_value=1, max_value=6),
    rows=st.integers(min_value=1, max_value=3),
    blocks=st.integers(min_value=1, max_value=8),
    fps=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_avi_mjpeg_container_roundtrip_exact(n_frames, rows, blocks, fps, seed):
    """The AVI container is lossless plumbing: ANY frame list survives
    mux -> demux bit-for-bit (flat-block JPEGs so the frame payloads
    themselves are exact), the header metadata round-trips, and the
    idx1 seek table points at exactly the frame bytes (odd-length
    frames exercise the RIFF even-padding rule — the pad byte must
    never leak into a frame slice)."""
    import numpy as np

    from etl_example_spark.operators.multimodal import (
        decode_avi_frame,
        encode_avi_mjpeg,
        encode_jpeg,
        parse_avi_mjpeg,
    )

    rng = np.random.default_rng(seed)
    imgs = [
        np.repeat(
            np.repeat(
                rng.integers(0, 256, size=(rows, blocks), dtype=np.uint8),
                8, axis=0,
            ),
            8, axis=1,
        )
        for _ in range(n_frames)
    ]
    frames = [encode_jpeg(im, restart_interval=2) for im in imgs]
    avi = encode_avi_mjpeg(
        frames, width=blocks * 8, height=rows * 8, fps=fps
    )
    meta, tbl = parse_avi_mjpeg(avi)
    assert meta["n_frames"] == n_frames
    assert (meta["width"], meta["height"]) == (blocks * 8, rows * 8)
    assert meta["handler"] == "MJPG"
    assert meta["fps_rate"] == fps and meta["fps_scale"] == 1
    assert len(tbl) == n_frames
    for i, fb in enumerate(frames):
        off, ln = tbl[i]
        assert avi[off : off + ln] == fb  # seek slice IS the frame
        assert (decode_avi_frame(avi, tbl, i) == imgs[i]).all()


def test_avi_mjpeg_rejects_damage():
    """Corrupt containers fail loudly, never decode garbage: non-RIFF
    payloads, truncated RIFF, an idx1 pointing between chunks, and an
    avih/idx1 frame-count disagreement are each detected."""
    import struct

    import numpy as np
    import pytest

    from etl_example_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        parse_avi_mjpeg,
    )

    img = np.full((8, 8), 77, dtype=np.uint8)
    avi = encode_avi_mjpeg(
        [encode_jpeg(img)] * 2, width=8, height=8, fps=10
    )
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"JUNK" + avi[4:])
    with pytest.raises(ValueError):
        # claim a longer RIFF body than the payload carries
        parse_avi_mjpeg(
            avi[:4] + struct.pack("<I", len(avi) + 100) + avi[8:]
        )
    # shift the second idx1 frame offset off its chunk header
    idx_at = avi.rindex(b"00dc")  # last idx1 entry
    bad = bytearray(avi)
    bad[idx_at + 8] ^= 0x01
    with pytest.raises(ValueError):
        parse_avi_mjpeg(bytes(bad))
    # tamper the avih total-frame count
    avih_at = avi.index(b"avih") + 8
    bad2 = bytearray(avi)
    bad2[avih_at + 16] = 9  # dwTotalFrames
    with pytest.raises(ValueError):
        parse_avi_mjpeg(bytes(bad2))


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=60,
    ),
    asc=st.booleans(),
    nulls_last=st.booleans(),
    nparts=st.integers(min_value=2, max_value=6),
)
@SETTINGS
def test_global_rank_matches_window_for_any_order_spec(
    spark, vals, asc, nulls_last, nparts
):
    """functions/rank law: for ANY value column (duplicates, NULLs),
    ANY direction/null-placement, and ANY partition count, the
    deterministic two-pass global_row_number equals the unpartitioned
    window's ROW_NUMBER under the same total order (unique id
    tie-break)."""
    from pyspark.sql import Window

    from etl_example_spark.functions.rank import Ord, global_row_number

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    order = [Ord("v", asc=asc, nulls_last=nulls_last), Ord("id")]
    got = {
        (r["id"], r["r"])
        for r in global_row_number(
            df, order, out="r", num_partitions=nparts
        ).collect()
    }
    exp = {
        (r["id"], r["r"])
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.orderBy(*[o.spark_col() for o in order]))
            .alias("r"),
        ).collect()
    }
    assert got == exp
