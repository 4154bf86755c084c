"""Baseline JPEG codec tests: table structure, DCT identity, round-trip
PSNR bounds across qualities/shapes/subsampling, and the Spark multimodal
integration (sniff → decode_jpeg inside image_features)."""

import numpy as np
import pytest

from cdk_datalake_analytics_comercial_spark.operators import _jpeg as J
from cdk_datalake_analytics_comercial_spark.operators import _codecs


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def gradient_image(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


def test_huffman_tables_complete_and_canonical():
    # _self_check runs at import; re-run explicitly so a regression has a
    # named test, and pin the canonical first codes of the luma DC table
    J._self_check()
    codes = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)  # T.81 table K.3: size-0 symbol = '00'
    assert all(length <= 16 for _, length in codes.values())


def test_zigzag_is_the_standard_permutation():
    # first diagonal steps of the T.81 zigzag in natural (row*8+col) index
    assert J.ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))


def test_dct_idct_identity():
    rng = np.random.default_rng(3)
    b = rng.uniform(-128, 127, size=(8, 8))
    assert np.allclose(J.idct2(J.dct2(b)), b, atol=1e-9)
    # orthonormality: DC coefficient of a flat block is 8×the level
    flat = np.full((8, 8), 10.0)
    coef = J.dct2(flat)
    assert abs(coef[0, 0] - 80.0) < 1e-9
    assert np.all(np.abs(coef.reshape(-1)[1:]) < 1e-9)


@pytest.mark.parametrize("quality,floor", [(95, 48), (85, 42), (60, 36)])
def test_roundtrip_psnr_444(quality, floor):
    img = gradient_image(48, 64)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    assert psnr(img, dec) > floor


def test_roundtrip_psnr_420_subsampled():
    img = gradient_image(40, 56)
    enc444 = J.encode_jpeg(img, quality=85)
    enc420 = J.encode_jpeg(img, quality=85, subsample=True)
    dec = J.decode_jpeg(enc420)
    assert dec.shape == img.shape
    assert psnr(img, dec) > 35
    assert len(enc420) < len(enc444)  # subsampling must actually save bytes


def test_roundtrip_odd_sizes_and_noise():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23)]:
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert psnr(img, dec) > 22  # noise is the worst case for JPEG


def test_flat_image_is_exact():
    flat = np.full((17, 23, 3), 130, dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(flat, quality=85))
    assert np.array_equal(dec, flat)


def test_grayscale_input():
    g = gradient_image(32, 32)[:, :, 0]
    dec = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert dec.shape == (32, 32, 3)
    assert psnr(np.stack([g, g, g], axis=2), dec) > 45


def test_decode_rejects_arithmetic_and_truncated():
    img = gradient_image(16, 16)
    enc = bytearray(J.encode_jpeg(img, quality=85))
    # flip SOF0 (0xC0) to SOF9 (arithmetic): honest NotImplementedError
    sof = enc.find(b"\xff\xc0")
    arith = enc[:sof] + b"\xff\xc9" + enc[sof + 2 :]
    with pytest.raises(NotImplementedError, match="0xc9"):
        J.decode_jpeg(bytes(arith))
    # flipping to SOF2 makes the baseline full-band SOS header invalid as
    # a progressive scan (Ss=0 requires Se=0) — rejected, not misdecoded
    prog = enc[:sof] + b"\xff\xc2" + enc[sof + 2 :]
    with pytest.raises(ValueError, match="Se=0"):
        J.decode_jpeg(bytes(prog))
    with pytest.raises((EOFError, ValueError)):
        J.decode_jpeg(bytes(enc[: len(enc) // 2]))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")


# --------------------------------------------------------------------------
# progressive (SOF2)


@pytest.mark.parametrize(
    "shape,subsample,quality",
    [((48, 64), False, 85), ((40, 56), True, 85), ((17, 23), False, 40),
     ((25, 33), True, 95), ((1, 1), False, 90)],
)
def test_progressive_decodes_bit_identical_to_baseline(shape, subsample, quality):
    """Baseline and progressive encoders quantize through the identical
    expression, so after a COMPLETE scan script the decoded pixels must
    match bit for bit — any coefficient lost anywhere in the progressive
    path (EOB runs, refinement bits, band bookkeeping) breaks this."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=(*shape, 3)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=quality, subsample=subsample))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(img, quality=quality, subsample=subsample)
    )
    assert np.array_equal(base, prog)
    # noise + subsampling is JPEG's worst case; this is only a sanity floor
    assert psnr(img, prog) > 10


def test_progressive_spectral_selection_only_script():
    # no successive approximation at all: DC scan + per-component AC bands
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(30, 42, 3)).astype(np.uint8)
    scans = [(None, 0, 0, 0, 0), (0, 1, 8, 0, 0), (0, 9, 63, 0, 0),
             (1, 1, 63, 0, 0), (2, 1, 63, 0, 0)]
    base = J.decode_jpeg(J.encode_jpeg(img, quality=80))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=80, scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_restart_intervals():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(30, 42, 3)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=80))
    for ri in (1, 2, 7):
        enc = J.encode_jpeg_progressive(img, quality=80, restart_interval=ri)
        assert np.array_equal(base, J.decode_jpeg(enc))


def test_progressive_flat_image_exercises_long_eob_runs():
    # every AC block is empty → EOBn with n>0 across whole scans
    flat = np.full((33, 47, 3), 130, dtype=np.uint8)
    enc = J.encode_jpeg_progressive(flat, quality=85)
    assert np.array_equal(J.decode_jpeg(enc), flat)


def test_progressive_grayscale_and_gradient():
    g = gradient_image(32, 32)[:, :, 0]
    base = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(g, quality=90))
    assert np.array_equal(base, prog)
    img = gradient_image(48, 64)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(img, quality=85, subsample=True)),
        J.decode_jpeg(J.encode_jpeg_progressive(img, quality=85, subsample=True)),
    )


def test_progressive_truncated_raises():
    img = gradient_image(24, 24)
    enc = J.encode_jpeg_progressive(img, quality=85)
    with pytest.raises((EOFError, ValueError)):
        J.decode_jpeg(enc[: len(enc) // 2])


def test_optimal_huffman_is_complete_and_canonical():
    # skewed frequencies over a handful of symbols, incl. a singleton
    freq = [0] * 256
    freq[0x01], freq[0x11], freq[0x00], freq[0xF0], freq[0x21] = 500, 120, 80, 3, 1
    bits, vals = J._optimal_huffman(freq)
    assert sorted(vals) == sorted([0x01, 0x11, 0x00, 0xF0, 0x21])
    codes = J._canonical_codes(bits, vals)  # raises if not canonical
    assert all(length <= 16 for _, length in codes.values())
    # prefix-freedom: no code is a prefix of another
    as_bits = {format(c, f"0{l}b") for c, l in codes.values()}
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)


def test_spark_image_features_on_progressive_jpeg(spark):
    from cdk_datalake_analytics_comercial_spark.operators import multimodal as M

    red = np.zeros((12, 10, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    enc = J.encode_jpeg_progressive(red, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(enc))], "media_id long, payload binary"
    )
    row = M.image_features(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (10, 12)
    assert abs(row["mean_luma"] - 0.299) < 0.01


def test_sniff_and_decode_image_dispatch():
    img = gradient_image(8, 8)
    enc = J.encode_jpeg(img, quality=95)
    assert _codecs.sniff(enc) == "jpeg"
    assert psnr(_codecs.decode_image(enc), img) > 45


def test_spark_image_features_on_jpeg(spark):
    from cdk_datalake_analytics_comercial_spark.operators import multimodal as M

    red = np.zeros((12, 10, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    enc = J.encode_jpeg(red, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(enc))], "media_id long, payload binary"
    )
    row = M.image_features(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (10, 12)
    # Rec.601 red luma ≈ 0.299 (JPEG quantization gives small slack)
    assert abs(row["mean_luma"] - 0.299) < 0.01


def test_spark_skip_and_flag_on_broken_jpeg(spark):
    from cdk_datalake_analytics_comercial_spark.operators import multimodal as M

    good = J.encode_jpeg(gradient_image(8, 8), quality=85)
    broken = good[: len(good) // 2]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(broken))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in M.image_features(df, fake=False, on_error="skip").collect()
    }
    assert rows[1]["error"] is None and rows[1]["width"] == 8
    assert rows[2]["error"] is not None and rows[2]["width"] is None


def test_bitreader_skips_marker_fill_bytes():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may pad before a marker.
    The reader must report the first non-0xFF byte as the marker (a padded
    RST previously surfaced as bogus marker 0xFF), and treat FF FF 00 as a
    fill byte followed by a stuffed 0xFF data byte (libjpeg semantics)."""
    import pytest

    # entropy byte 0xAB, then fill-padded RST0 (FF FF FF D0)
    r = J._BitReader(bytes([0xAB, 0xFF, 0xFF, 0xFF, 0xD0]), 0)
    assert r.bits(8) == 0xAB
    with pytest.raises(EOFError):
        r.bits(8)
    assert r.align_to_marker() == 0xD0

    # fill byte then stuffed data byte: FF FF 00 decodes as data 0xFF
    r = J._BitReader(bytes([0xFF, 0xFF, 0x00, 0x12]), 0)
    assert r.bits(8) == 0xFF
    assert r.bits(8) == 0x12

    # align_to_marker at a fill-padded boundary
    r = J._BitReader(bytes([0xFF, 0xFF, 0xD9]), 0)
    assert r.align_to_marker() == 0xD9

    # plain unstuffed path still intact
    r = J._BitReader(bytes([0xFF, 0x00, 0xFF, 0xD0]), 0)
    assert r.bits(8) == 0xFF
    with pytest.raises(EOFError):
        r.bit()
    assert r.align_to_marker() == 0xD0
