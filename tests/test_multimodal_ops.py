"""Multimodal plumbing tests: schemas, mapInPandas batch shape, fake decode
determinism; the real decode is stubbed (no media libs in container)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from cdk_datalake_analytics_comercial_spark.operators import multimodal as M


def media_df(spark):
    rows = [(i, bytes(range(10 + i * 3)) * (i + 1)) for i in range(5)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_media_meta(spark):
    df = M.attach_media_meta(media_df(spark))
    for r in df.collect():
        assert r["n_bytes"] == len(r["payload"])


def test_image_features_fake_decode(spark):
    df = media_df(spark)
    out = M.image_features(df, fake=True, feature_dim=4)
    assert out.schema == M.IMAGE_FEATURES_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for r in got.values():
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 0.0 <= r["mean_luma"] <= 1.0
        assert len(r["features"]) == 4
    # deterministic: same input → same features
    again = {r["media_id"]: r for r in M.image_features(df, fake=True, feature_dim=4).collect()}
    assert all(got[k]["features"] == again[k]["features"] for k in got)


def test_image_features_real_path_raises(spark):
    out = M.image_features(media_df(spark), fake=False)
    with pytest.raises(PythonException, match="NotImplementedError|real image decode"):
        out.collect()


def test_frame_sample_fake(spark):
    out = M.frame_sample(media_df(spark), fake=True, every_ms=500)
    rows = out.collect()
    assert len(rows) >= 5
    for r in rows:
        assert r["ts_ms"] == r["frame_idx"] * 500
        assert isinstance(r["frame"], (bytes, bytearray))


def test_image_resize_fake(spark):
    out = M.image_resize(media_df(spark), fake=True, target_w=64, target_h=64)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["width"] == 64 and r["height"] == 64
        assert len(r["payload"]) == 64 * 64 // 64


def test_audio_features_fake(spark):
    out = M.audio_features(media_df(spark), fake=True, n_mfcc=4)
    got = {r["media_id"]: r for r in out.collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for r in got.values():
        assert r["duration_ms"] > 0
        assert 0.0 <= r["rms"] <= 1.0
        assert len(r["mfcc"]) == 4


# ---------------------------------------------------------------------------
# REAL decode path (fake=False): uncompressed formats via operators._codecs.


def _ppm_bytes(w, h, rgb):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _bmp_bytes(w, h, rgb):
    import struct

    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    row = img[:, :, ::-1].tobytes()  # BGR, top-down rows; we store bottom-up
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    pixel_rows = b"".join(
        img[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_rows), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_rows), 0, 0, 0, 0)
    return header + pixel_rows, img


def _wav_bytes(samples16, rate=8000):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_image_features_ppm_and_bmp(spark):
    ppm, _ = _ppm_bytes(10, 4, (255, 0, 0))         # pure red
    bmp, _ = _bmp_bytes(6, 8, (0, 255, 0))          # pure green
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in M.image_features(df, fake=False).collect()}
    assert (got[1]["width"], got[1]["height"]) == (10, 4)
    assert (got[2]["width"], got[2]["height"]) == (6, 8)
    # Rec.601: red 0.299·255/255, green 0.587
    assert abs(got[1]["mean_luma"] - 0.299) < 1e-6
    assert abs(got[2]["mean_luma"] - 0.587) < 1e-6
    # single-color image → histogram mass in exactly one bin
    for r in got.values():
        feats = list(r["features"])
        assert abs(sum(feats) - 1.0) < 1e-6
        assert max(feats) == 1.0


def test_real_image_resize_roundtrip(spark):
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators import _codecs

    ppm, img = _ppm_bytes(8, 8, (10, 20, 30))
    df = spark.createDataFrame([(1, bytearray(ppm))], "media_id long, payload binary")
    out = M.image_resize(df, fake=False, target_w=4, target_h=2).collect()[0]
    assert (out["width"], out["height"]) == (4, 2)
    back = _codecs.decode_ppm(bytes(out["payload"]))
    assert back.shape == (2, 4, 3)
    assert np.all(back == np.array([10, 20, 30], dtype=np.uint8))


def test_real_audio_features_wav(spark):
    import math

    rate = 8000
    # 1-second 1kHz sine at half amplitude
    samples = [int(16383 * math.sin(2 * math.pi * 1000 * t / rate)) for t in range(rate)]
    wav = _wav_bytes(samples, rate)
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary")
    got = M.audio_features(df, fake=False).collect()[0]
    assert got["duration_ms"] == 1000
    # sine RMS = amplitude/√2 = 0.5/√2 ≈ 0.3536
    assert abs(got["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert len(got["mfcc"]) == 8
    assert all(abs(float(c)) < 1e3 for c in got["mfcc"])


def test_real_frame_sample_ppm_stream(spark):
    ppm1, _ = _ppm_bytes(4, 4, (1, 1, 1))
    ppm2, _ = _ppm_bytes(4, 4, (2, 2, 2))
    ppm3, _ = _ppm_bytes(4, 4, (3, 3, 3))
    stream = ppm1 + ppm2 + ppm3
    df = spark.createDataFrame([(1, bytearray(stream))], "media_id long, payload binary")
    # every 2000 ms at 1 fps → frames 0 and 2
    got = sorted(
        (r["frame_idx"], r["ts_ms"], bytes(r["frame"]))
        for r in M.frame_sample(df, fake=False, every_ms=2000).collect()
    )
    assert [(i, t) for i, t, _ in got] == [(0, 0), (2, 2000)]
    assert got[0][2] == ppm1 and got[1][2] == ppm3


def test_compressed_formats_still_raise(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8fakejpeg"))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception) as exc:
        M.image_features(df, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_attach_media_meta_sniffs_formats_jvm_side(spark):
    ppm, _ = _ppm_bytes(2, 2, (0, 0, 0))
    bmp, _ = _bmp_bytes(2, 2, (0, 0, 0))
    wav = _wav_bytes([0, 1, 2, 3])
    rows = [
        (1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(wav)),
        (4, bytearray(b"\x89PNGxxxx")), (5, bytearray(b"\xff\xd8xxxx")),
        (6, bytearray(b"plain text")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = M.attach_media_meta(df)
    # no Python evaluation in the plan: pure Column expressions
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["media_id"]: (r["format"], r["media_type"], r["n_bytes"])
           for r in out.collect()}
    assert got[1] == ("ppm", "image", len(ppm))
    assert got[2] == ("bmp", "image", len(bmp))
    assert got[3] == ("wav", "audio", len(wav))
    assert got[4][0:2] == ("png", "image")
    assert got[5][0:2] == ("jpeg", "image")
    assert got[6][0:2] == ("unknown", "unknown")
