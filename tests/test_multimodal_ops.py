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
