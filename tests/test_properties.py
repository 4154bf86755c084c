"""Property-based tests (hypothesis) for the pure utilities, plus a
randomized Spark-vs-Python equivalence for shingling. Spark calls stay out
of the hypothesis loops (one DataFrame per test, not per example)."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from cdk_datalake_analytics_comercial_spark.core import magic_dates as md
from cdk_datalake_analytics_comercial_spark.core.periods import (
    get_periods,
    get_previous_period,
    period_bounds,
    period_of,
)

dates = st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 12, 31))
periods_st = st.dates(min_value=dt.date(1950, 1, 1), max_value=dt.date(2100, 12, 1)).map(
    period_of
)


@given(dates)
def test_magic_codecs_roundtrip(d):
    assert md.py_magic_2008_to_date(md.py_date_to_magic_2008(d)) == d
    assert md.py_magic_1900_to_date(md.py_date_to_magic_1900(d)) == d


@given(dates)
def test_magic_codecs_monotone(d):
    # monotonicity is what makes magic_period_filter's BETWEEN exact
    n = md.py_date_to_magic_2008(d)
    assert md.py_date_to_magic_2008(d + dt.timedelta(days=1)) == n + 1


@given(st.integers(min_value=1, max_value=240), dates)
def test_get_periods_properties(n, as_of):
    ps = get_periods(n, as_of)
    assert len(ps) == n
    assert ps == sorted(ps)
    assert ps[-1] == period_of(as_of)
    # consecutive: each element is the previous period of its successor
    for a, b in zip(ps, ps[1:]):
        assert get_previous_period(b) == a


@given(periods_st, st.integers(min_value=0, max_value=600))
def test_previous_period_inverse(p, k):
    # going back k then forward k via month arithmetic is identity
    back = get_previous_period(p, k)
    assert get_previous_period(back, -k) == p


@given(periods_st)
def test_period_bounds_cover_month(p):
    lo, hi = period_bounds(p)
    assert period_of(lo) == p and period_of(hi) == p
    assert lo.day == 1
    assert (hi + dt.timedelta(days=1)).day == 1


def test_shingles_match_python_reference(spark):
    """Randomized docs: Spark shingling == the Python reference used by the
    dedup tests (whitespace-normalized, k=3, short-doc whole-text rule)."""
    import random

    from pyspark.sql import functions as F

    from cdk_datalake_analytics_comercial_spark.operators import text as T

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "x1", "y2", "z3", "qq", "ww"]
    docs = [
        " ".join(rng.choices(words, k=rng.randint(1, 12))) for _ in range(100)
    ]

    def py_shingles(text, k=3):
        toks = text.lower().split()
        if len(toks) <= k:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", T.shingles(F.col("text"), 3).alias("sh")).collect()
    }
    for i, doc in enumerate(docs):
        assert got[i] == py_shingles(doc), f"doc {i}: {doc!r}"


# ---------------------------------------------------------------------------
# Codec properties (operators._codecs): pure functions, no Spark needed.

import numpy as np
from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

from cdk_datalake_analytics_comercial_spark.operators import _codecs as C

_dims = _st.integers(min_value=1, max_value=16)


@_given(_dims, _dims, _st.integers(min_value=0, max_value=2**32 - 1))
@_settings(max_examples=30, deadline=None)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)


@_given(_dims, _dims, _dims, _dims, _st.integers(min_value=0, max_value=2**32 - 1))
@_settings(max_examples=30, deadline=None)
def test_resize_nearest_shape_and_palette(w, h, tw, th, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = C.resize_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    # nearest-neighbor invents no colors
    src = {tuple(p) for p in img.reshape(-1, 3)}
    assert {tuple(p) for p in out.reshape(-1, 3)} <= src


@_given(_st.lists(_st.integers(min_value=1, max_value=6), min_size=1, max_size=5),
        _st.integers(min_value=0, max_value=2**32 - 1))
@_settings(max_examples=30, deadline=None)
def test_ppm_stream_split_inverts_concat(sizes, seed):
    rng = np.random.default_rng(seed)
    frames = []
    for s in sizes:
        img = rng.integers(0, 256, size=(s, s, 3), dtype=np.uint8)
        frames.append(C.encode_ppm(img))
    got = C.split_ppm_stream(b"".join(frames))
    assert got == frames


@_given(_st.lists(_st.integers(min_value=-32768, max_value=32767),
                  min_size=1, max_size=400),
        _st.sampled_from([8000, 16000, 44100]))
@_settings(max_examples=30, deadline=None)
def test_wav_roundtrip_samples(samples, rate):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    decoded, got_rate = C.decode_wav(wav)
    assert got_rate == rate
    assert len(decoded) == len(samples)
    assert np.allclose(decoded, np.array(samples) / 32768.0)


# ---------------------------------------------------------------------------
# Chunking / packing invariants (pure-Python mirrors of the Column math,
# hypothesis-driven; the Spark twin is pinned by test_text_ops hand cases
# and the doc_chunks/doc_pack oracles).


@_given(
    n=_st.integers(min_value=0, max_value=5000),
    size=_st.integers(min_value=1, max_value=512),
    stride_frac=_st.integers(min_value=1, max_value=512),
)
def test_chunk_math_covers_every_token(n, size, stride_frac):
    stride = min(stride_frac, size)  # stride > size would skip tokens
    n_eff = max(n, 1)  # shingle/token fallback: empty doc still yields 1 token
    n_chunks = (max(n_eff - size, 0) + stride - 1) // stride + 1
    covered = set()
    for i in range(n_chunks):
        start = i * stride
        covered.update(range(start, min(start + size, n_eff)))
    assert covered == set(range(n_eff))
    # last chunk must be non-empty (its start is inside the doc)
    assert (n_chunks - 1) * stride < n_eff


@_given(
    tokens=_st.lists(_st.integers(min_value=0, max_value=4096), min_size=1, max_size=200),
    budget=_st.integers(min_value=1, max_value=8192),
)
def test_pack_sequence_invariants(tokens, budget):
    start = 0
    prev_bin = 0
    for t_count in tokens:
        bin_id = start // budget
        offset = start % budget
        assert 0 <= offset < budget
        assert bin_id >= prev_bin          # bins are monotone in pack order
        prev_bin = bin_id
        start += t_count
    assert start == sum(tokens)            # offsets conserve the token count


# ---------------------------------------------------------------------------
# JPEG codec properties (pure numpy — no Spark in the hypothesis loop)

from hypothesis import given as _g2, settings as _s2
import numpy as _np


@_s2(max_examples=20, deadline=None)
@_g2(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([60, 85, 95]),
    st.booleans(),
)
def test_jpeg_roundtrip_any_shape(h, w, seed_, quality, subsample):
    """decode(encode(img)) must preserve shape exactly and content within
    JPEG's lossy envelope for ANY image size (odd sizes exercise the MCU
    edge padding) — and never crash or loop."""
    from cdk_datalake_analytics_comercial_spark.operators import _jpeg as J

    rng = _np.random.default_rng(seed_)
    # smooth-ish content (random low-res upsampled): JPEG's intended regime
    base = rng.integers(0, 256, size=(max(1, h // 4), max(1, w // 4), 3))
    img = _np.repeat(_np.repeat(base, 4, axis=0), 4, axis=1)[:h, :w, :].astype(
        _np.uint8
    )
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=quality, subsample=subsample))
    assert dec.shape == img.shape
    mse = _np.mean((dec.astype(float) - img.astype(float)) ** 2)
    if subsample:
        # 4:2:0 throws away 3/4 of the chroma samples BY DESIGN, so full-RGB
        # MSE on adversarial random color patches is dominated by chroma loss
        # (measured worst over 700 random q60 cases: 834; one Hypothesis seed
        # hit 1055). The codec's fidelity contract under subsampling is the
        # LUMA channel: measured worst luma-MSE 88 at q60 — assert < 400
        # (>4x margin) plus a loose full-RGB sanity ceiling.
        y_o = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(float)
        y_d = (
            0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2]
        ).astype(float)
        assert _np.mean((y_d - y_o) ** 2) < 400
        assert mse < 2500
    else:
        assert mse < 900  # PSNR > ~18.6 dB even at q60 4:4:4 on blocky content


@_s2(max_examples=30, deadline=None)
@_g2(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300, unique=True))
def test_kmv_hll_sketch_invariants(values):
    """Pure-python twins of the sketch math: KMV is exactly right below
    saturation, HLL's linear-counting regime is near-exact for n << m, and
    both are duplicate-invariant by construction (hash sets)."""
    import hashlib

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    hs = sorted({h60(v) for v in values})
    n = len(hs)
    # KMV (k=64): unsaturated == exact
    if n < 64:
        assert len(hs[:64]) == n
    else:
        kth = hs[63]
        est = 63.0 / (kth / float(2**60))
        assert abs(est - n) / n < 0.75  # 3-ish sigma at k=64 plus slack
    # HLL p=8 linear counting for n << m: registers-used ≈ distinct
    m = 256
    buckets = {h & (m - 1) for h in hs}
    if n <= 25:
        import math

        est = m * math.log(m / (m - len(buckets)))
        assert abs(est - n) <= max(3, 0.25 * n)
