"""Container-level media parsing: the ISO-BMFF (MP4) box/sample-table
parser and the MPEG audio (MP3) frame walker — spec-layout assertions on
hand-built boxes, builder/parser roundtrips, and the Spark operators
(container_probe / keyframe_extract) over a mixed binary column."""

import struct

import pytest

from cdk_datalake_analytics_comercial_spark.operators import _mp3, _mp4
from cdk_datalake_analytics_comercial_spark.operators import multimodal as M


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


# ---------------------------------------------------------------------------
# MP4 box walking


def test_iter_boxes_plain_large_and_to_end():
    a = _box(b"aaaa", b"x" * 4)
    # largesize form: size field == 1, 64-bit size after the fourcc
    big_body = b"y" * 5
    big = struct.pack(">I", 1) + b"bbbb" + struct.pack(">Q", 16 + 5) + big_body
    # size == 0: runs to end of scope
    tail = struct.pack(">I", 0) + b"cccc" + b"z" * 3
    boxes = list(_mp4.iter_boxes(a + big + tail))
    assert [t for t, *_ in boxes] == [b"aaaa", b"bbbb", b"cccc"]
    _, hdr, b0, b1 = boxes[1]
    assert hdr == 16 and (a + big + tail)[b0:b1] == big_body
    assert boxes[2][3] == len(a + big + tail)


def test_iter_boxes_rejects_overrun_and_truncation():
    with pytest.raises(_mp4.Mp4Error, match="overruns"):
        list(_mp4.iter_boxes(struct.pack(">I", 99) + b"aaaa" + b"x"))
    with pytest.raises(_mp4.Mp4Error, match="truncated"):
        list(_mp4.iter_boxes(b"\x00\x00\x00"))


def test_probe_requires_ftyp_and_moov():
    with pytest.raises(_mp4.Mp4Error, match="ftyp"):
        _mp4.probe(b"RIFFxxxxWAVE")
    only_ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    with pytest.raises(_mp4.Mp4Error, match="moov"):
        _mp4.probe(only_ftyp)


def test_mp4_roundtrip_video_probe_and_table():
    samples = [bytes([i]) * (10 + 3 * i) for i in range(12)]
    b = _mp4.build_mp4(
        samples, timescale=1000, sample_delta=40, width=320, height=240,
        codec=b"avc1", sync_every=5,
    )
    p = _mp4.probe(b)
    assert p["brand"] == "isom"
    (trk,) = p["tracks"]
    assert trk["handler"] == "vide" and trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (320, 240)
    assert trk["n_samples"] == 12 and trk["n_sync_samples"] == 3
    assert p["duration_sec"] == 12 * 40 / 1000

    table = _mp4.sample_table(b)
    assert [s["size"] for s in table] == [len(s) for s in samples]
    assert [s["pts"] for s in table] == [i * 40 for i in range(12)]
    assert [s["is_sync"] for s in table] == [i % 5 == 0 for i in range(12)]
    # offsets are file-absolute and contiguous within the single chunk
    for s, raw in zip(table, samples):
        assert b[s["offset"] : s["offset"] + s["size"]] == raw


def test_mp4_roundtrip_audio_track():
    b = _mp4.build_mp4(
        [b"frame%d" % i for i in range(5)],
        handler=b"soun", codec=b"mp4a",
        sample_rate=22050, channels=1, timescale=22050, sample_delta=1024,
    )
    (trk,) = _mp4.probe(b)["tracks"]
    assert trk["handler"] == "soun" and trk["codec"] == "mp4a"
    assert trk["sample_rate"] == 22050 and trk["channels"] == 1


def test_mp4_extract_sync_only_and_indices():
    samples = [bytes([65 + i]) * 6 for i in range(9)]
    b = _mp4.build_mp4(samples, sync_every=4)
    assert [s for _, _, s in _mp4.extract_samples(b)] == samples
    syncs = _mp4.extract_samples(b, sync_only=True)
    assert [i for i, _, _ in syncs] == [0, 4, 8]
    picked = _mp4.extract_samples(b, indices=[2, 7])
    assert [(i, s) for i, _, s in picked] == [(2, samples[2]), (7, samples[7])]


def test_mp4_multi_chunk_stsc_expansion_and_co64():
    """Hand-built sample table: 5 samples over chunks of (2, 2, 1) via a
    TWO-run stsc, chunk offsets in co64 — the spec paths the single-chunk
    builder never emits."""
    samples = [bytes([i + 1]) * (i + 2) for i in range(5)]
    mdat_samples = b"".join(samples)

    def full(typ, body):
        return _box(typ, b"\x00\x00\x00\x00" + body)

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    stsd = full(
        b"stsd",
        struct.pack(">I", 1)
        + _box(
            b"mp4v",
            b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70,
        ),
    )
    stts = full(b"stts", struct.pack(">III", 1, 5, 100))
    # runs: chunks 1.. → 2 samples/chunk, chunks 3.. → 1 sample/chunk
    stsc = full(
        b"stsc", struct.pack(">I", 2) + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 3, 1, 1)
    )
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, 5)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )

    def build(o1, o2, o3):
        co64 = full(b"co64", struct.pack(">IQQQ", 3, o1, o2, o3))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
        minf = _box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"x\x00")
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 500) + b"\x00" * 4)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", mdia)
        mvhd = full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, 1000, 500) + b"\x00" * 80,
        )
        moov = _box(b"moov", mvhd + trak)
        return ftyp + moov + _box(b"mdat", mdat_samples)

    probe_len = len(build(0, 0, 0))
    base = probe_len - len(mdat_samples)
    # chunk 1: samples 0-1, chunk 2: samples 2-3, chunk 3: sample 4
    o1 = base
    o2 = base + len(samples[0]) + len(samples[1])
    o3 = o2 + len(samples[2]) + len(samples[3])
    payload = build(o1, o2, o3)
    table = _mp4.sample_table(payload)
    assert [s["size"] for s in table] == [len(s) for s in samples]
    for s, raw in zip(table, samples):
        assert payload[s["offset"] : s["offset"] + s["size"]] == raw
    # no stss box ⇒ every sample is sync (spec default)
    assert all(s["is_sync"] for s in table)


def test_mp4_stsc_stsz_disagreement_raises():
    b = bytearray(_mp4.build_mp4([b"ab", b"cd", b"ef"]))
    # corrupt stsz's sample count (layout: fourcc + verflags + fixed + count)
    i = bytes(b).index(b"stsz")
    b[i + 12 : i + 16] = struct.pack(">I", 7)
    with pytest.raises(_mp4.Mp4Error):
        _mp4.sample_table(bytes(b))


# ---------------------------------------------------------------------------
# MP3 frame walking


def test_mp3_cbr_padding_schedule_and_probe():
    b = _mp3.build_mp3(50, bitrate_kbps=128, sample_rate=44100)
    frames = _mp3.frame_offsets(b)
    # 144·128000/44100 = 417.96…: mostly padded 418s with periodic 417s,
    # and the mean rate must come out at 128 kbps
    assert {f["size"] for f in frames} == {417, 418}
    p = _mp3.probe(b)
    assert p["n_frames"] == 50 and p["cbr"] is True
    assert p["sample_rate"] == 44100 and p["layer"] == 3 and p["version"] == "1"
    assert abs(p["bitrate_kbps"] - 128) < 0.5
    assert p["duration_sec"] == round(50 * 1152 / 44100, 6)


def test_mp3_exact_size_rate_never_pads():
    b = _mp3.build_mp3(10, bitrate_kbps=128, sample_rate=48000)
    assert all(f["size"] == 384 for f in _mp3.frame_offsets(b))


def test_mp3_id3v2_and_id3v1_are_skipped():
    core = _mp3.build_mp3(4, id3v2_bytes=100)
    with_v1 = core + b"TAG" + bytes(125)
    assert _mp3.probe(with_v1)["n_frames"] == 4
    assert _mp3.frame_offsets(core)[0]["offset"] == 110  # 10-byte header + 100


def test_mp3_mono_flag_and_extract():
    b = _mp3.build_mp3(6, mono=True)
    p = _mp3.probe(b)
    assert p["mode"] == "mono"
    got = _mp3.extract_frames(b, indices=[0, 5])
    assert [i for i, _ in got] == [0, 5]
    # frame bodies are fill^idx — distinct per frame, header is 4 bytes
    assert got[0][1][4] == 0xA5 and got[1][1][4] == 0xA5 ^ 5


def test_mp3_mpeg2_header_fields():
    # MPEG-2 Layer III, 64 kbps, 22050 Hz: spf 576, size 72·64000/22050
    h = (
        0x7FF << 21 | 2 << 19 | 1 << 17 | 1 << 16
        | _mp3._BITRATES[(1, 3)].index(64) << 12 | 0 << 10
    )
    hdr = _mp3._parse_header(struct.pack(">I", h), 0)
    assert hdr["version"] == "2" and hdr["samples_per_frame"] == 576
    assert hdr["size"] == 72 * 64000 // 22050


def test_mp3_lost_sync_and_truncation_raise():
    b = _mp3.build_mp3(3)
    with pytest.raises(_mp3.Mp3Error, match="lost sync"):
        _mp3.frame_offsets(b[:417] + b"XX" + b[417:])
    with pytest.raises(_mp3.Mp3Error, match="truncated"):
        _mp3.frame_offsets(b[:-10])
    with pytest.raises(_mp3.Mp3Error):
        _mp3.frame_offsets(b"")


# ---------------------------------------------------------------------------
# Spark operators


def _media_df(spark):
    mp4 = _mp4.build_mp4(
        [bytes([i]) * 8 for i in range(10)],
        width=128, height=96, codec=b"avc1", sync_every=3,
    )
    mp3 = _mp3.build_mp3(25, bitrate_kbps=64, sample_rate=32000)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 64) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", 64) + bytes(64)
    )
    return spark.createDataFrame(
        [(1, mp4), (2, mp3), (3, wav), (4, b"not media at all")],
        "media_id long, payload binary",
    )


def test_container_probe_routes_all_formats(spark):
    out = {
        r["media_id"]: r.asDict()
        for r in M.container_probe(
            _media_df(spark), on_error="skip"
        ).collect()
    }
    v = out[1]
    assert (v["container"], v["media_type"], v["codec"]) == ("mp4", "video", "avc1")
    assert (v["width"], v["height"], v["n_frames"], v["n_sync_frames"]) == (
        128, 96, 10, 4,
    )
    a = out[2]
    assert (a["container"], a["sample_rate"], a["n_frames"]) == ("mp3", 32000, 25)
    assert a["duration_ms"] == int(round(25 * 1152 / 32000 * 1000))
    w = out[3]
    assert (w["container"], w["codec"], w["sample_rate"], w["channels"]) == (
        "wav", "pcm_s16le", 16000, 2,
    )
    assert w["n_frames"] == 16  # 64 data bytes / (2ch · 2B)
    assert out[4]["container"] is None and "unrecognized" in out[4]["error"]


def test_container_probe_strict_mode_raises(spark):
    from pyspark.sql.utils import PythonException

    with pytest.raises(PythonException, match="unrecognized container"):
        M.container_probe(_media_df(spark)).collect()


def test_keyframe_extract_mp4_sync_samples(spark):
    df = _media_df(spark).filter("media_id = 1")
    rows = sorted(
        (r["frame_idx"], r["pts_ms"], bytes(r["frame"]))
        for r in M.keyframe_extract(df).collect()
    )
    assert [(i, p) for i, p, _ in rows] == [(0, 0), (3, 120), (6, 240), (9, 360)]
    assert all(fb == bytes([i]) * 8 for i, _, fb in rows)


def test_keyframe_extract_mp3_every_n(spark):
    df = _media_df(spark).filter("media_id = 2")
    rows = M.keyframe_extract(df, sync_only=False, every_n=10).collect()
    idx = sorted(r["frame_idx"] for r in rows)
    assert idx == [0, 10, 20]
    by_idx = {r["frame_idx"]: r["pts_ms"] for r in rows}
    assert by_idx[10] == 10 * 1152 * 1000 // 32000


def test_attach_media_meta_sniffs_containers(spark):
    got = {
        r["media_id"]: (r["format"], r["media_type"])
        for r in M.attach_media_meta(_media_df(spark)).collect()
    }
    assert got[1] == ("mp4", "video")
    assert got[2] == ("mp3", "audio")
    assert got[3] == ("wav", "audio")
    assert got[4] == ("unknown", "unknown")
    # bare-sync mp3 (no ID3) sniffs too
    bare = spark.createDataFrame(
        [(9, _mp3.build_mp3(2))], "media_id long, payload binary"
    )
    assert M.attach_media_meta(bare).collect()[0]["format"] == "mp3"


# ---------------------------------------------------------------------------
# Compressed A/V decoded END-TO-END in-repo: MJPEG-in-MP4 video (container
# via _mp4, samples via the pure-numpy JPEG codec) and G.711/PCM audio in
# MP4 and WAV — through the REAL (fake=False) multimodal operators.


def test_g711_anchors_and_roundtrip():
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators import _codecs as C

    # Sun/CCITT 16-bit table anchors
    assert C.decode_g711_ulaw(b"\x00")[0] * 32768 == -32124
    assert C.decode_g711_ulaw(b"\x7f")[0] == 0.0
    assert C.decode_g711_ulaw(b"\xff")[0] == 0.0
    assert C.decode_g711_alaw(b"\xd5")[0] * 32768 == 8
    a = C.decode_g711_alaw(bytes(range(256)))
    assert a.max() * 32768 == 32256 and a.min() * 32768 == -32256
    # encode/decode roundtrip error bounded by the largest companding step
    x = np.linspace(-0.95, 0.95, 2001)
    err = np.abs(x - C.decode_g711_ulaw(C.encode_g711_ulaw(x))).max()
    assert err < 0.031, err


def _mjpeg_mp4(n=4, w=24, h=16, seed=3):
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators._jpeg import (
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)
    ]
    payload = _mp4.build_mp4(
        [encode_jpeg(f, quality=95) for f in frames],
        codec=b"jpeg", width=w, height=h, sync_every=0,
    )
    return payload, frames


def test_mjpeg_mp4_decodes_end_to_end(spark):
    import numpy as np

    payload, frames = _mjpeg_mp4()
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    rows = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in M.frame_sample(df, every_ms=1000).collect()
    )
    assert [i for i, _ in rows] == [0, 1, 2, 3]
    from cdk_datalake_analytics_comercial_spark.operators import _codecs as C

    for (_, p6), orig in zip(rows, frames):
        img = C.decode_ppm(p6)
        assert img.shape == orig.shape
        # JPEG q95 on random noise: lossy but close
        mse = float(np.mean((img.astype(float) - orig.astype(float)) ** 2))
        assert mse < 600, mse


def test_mp4_audio_tracks_feed_audio_features(spark):
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators import _codecs as C

    t = np.sin(np.linspace(0, 40 * np.pi, 8000)) * 0.5
    pcm = (t * 32767).astype("<i2").tobytes()
    mk = lambda codec, body: _mp4.build_mp4(
        [body], handler=b"soun", codec=codec,
        sample_rate=8000, channels=1, timescale=8000, sample_delta=8000,
    )
    df = spark.createDataFrame(
        [
            (1, mk(b"sowt", pcm)),
            (2, mk(b"ulaw", C.encode_g711_ulaw(t))),
        ],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r.asDict() for r in M.audio_features(df).collect()
    }
    # 8000 samples at 8 kHz = 1000 ms through both codecs
    assert out[1]["duration_ms"] == 1000 and out[2]["duration_ms"] == 1000
    # same sine through PCM and G.711: nearly identical energy (~0.5/√2)
    assert abs(out[1]["rms"] - 0.3536) < 0.01
    assert abs(out[1]["rms"] - out[2]["rms"]) < 0.01
    assert len(out[1]["mfcc"]) == len(out[2]["mfcc"]) == 8


def test_wav_g711_format_codes_decode(spark):
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators import _codecs as C

    t = np.sin(np.linspace(0, 16 * np.pi, 4000)) * 0.4
    mu = C.encode_g711_ulaw(t)

    def wav(fmt_code, body):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body
        )

    samples, rate = C.decode_wav(wav(7, mu))
    assert rate == 8000
    assert np.abs(samples - t).max() < 0.02
    # unsupported code still refuses loudly
    with pytest.raises(NotImplementedError):
        C.decode_wav(wav(3, mu))


def test_mp4_avc_still_refuses_toward_plugins(spark):
    from pyspark.sql.utils import PythonException

    payload = _mp4.build_mp4([b"nal" * 5], codec=b"avc1")
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    with pytest.raises(PythonException, match="avc1"):
        M.frame_sample(df).collect()
    flagged = M.frame_sample(df, on_error="skip").collect()
    assert len(flagged) == 1 and "avc1" in flagged[0]["error"]


# ---------------------------------------------------------------------------
# Round-8 regressions (r7 ADVICE): multi-track track resolution, WAV
# format-code probing, zero-timescale robustness.


def _two_track_mp4():
    """Audio track at index 0, video track at index 1 — the layout that
    used to make keyframe_extract pull audio samples with a video
    timescale."""
    audio = [b"A%d" % i * 4 for i in range(6)]
    video = [b"V%d" % i * 4 for i in range(8)]
    return _mp4.build_mp4_multi(
        [
            {
                "samples": audio,
                "handler": b"soun",
                "codec": b"ulaw",
                "timescale": 8000,
                "sample_delta": 160,
                "sample_rate": 8000,
                "channels": 1,
            },
            {
                "samples": video,
                "handler": b"vide",
                "codec": b"jpeg",
                "timescale": 600,
                "sample_delta": 30,
                "width": 32,
                "height": 24,
                "sync_every": 4,
            },
        ]
    )


def test_build_mp4_multi_probe_and_sample_tables():
    b = _two_track_mp4()
    p = _mp4.probe(b)
    assert [t["handler"] for t in p["tracks"]] == ["soun", "vide"]
    assert p["tracks"][0]["timescale"] == 8000
    assert p["tracks"][1]["timescale"] == 600
    assert (p["tracks"][1]["width"], p["tracks"][1]["height"]) == (32, 24)
    # each track's byte ranges resolve to ITS OWN payload bytes
    t0 = _mp4.sample_table(b, 0)
    t1 = _mp4.sample_table(b, 1)
    assert [b[s["offset"] : s["offset"] + s["size"]] for s in t0] == [
        b"A%d" % i * 4 for i in range(6)
    ]
    assert [b[s["offset"] : s["offset"] + s["size"]] for s in t1] == [
        b"V%d" % i * 4 for i in range(8)
    ]
    assert [s["is_sync"] for s in t1] == [True, False, False, False] * 2


def test_keyframe_extract_resolves_video_track_index(spark):
    df = spark.createDataFrame(
        [(7, _two_track_mp4())], "media_id long, payload binary"
    )
    rows = sorted(
        (r["frame_idx"], r["pts_ms"], bytes(r["frame"]))
        for r in M.keyframe_extract(df).collect()
    )
    # sync samples 0 and 4 of the VIDEO track, pts in the VIDEO timescale
    # (600 units/s, delta 30 -> 50 ms/frame)
    assert [(i, p) for i, p, _ in rows] == [(0, 0), (4, 200)]
    assert [fb for _, _, fb in rows] == [b"V0" * 4, b"V4" * 4]


def test_container_probe_wav_g711_format_codes(spark):
    def wav(fmt_code, bits, body):
        block = max(bits // 8, 1)
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * block, block, bits)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body
        )

    df = spark.createDataFrame(
        [
            (1, wav(7, 8, bytes(80))),
            (2, wav(6, 8, bytes(40))),
            (3, wav(1, 16, bytes(64))),
            (4, wav(2, 4, bytes(32))),  # ADPCM: probed, named, not decodable
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r.asDict() for r in M.container_probe(df).collect()}
    assert out[1]["codec"] == "pcm_mulaw" and out[1]["n_frames"] == 80
    assert out[2]["codec"] == "pcm_alaw" and out[2]["n_frames"] == 40
    assert out[3]["codec"] == "pcm_s16le" and out[3]["n_frames"] == 32
    assert out[4]["codec"] == "wav_fmt_2"
    assert out[1]["duration_ms"] == 10  # 80 samples @ 8 kHz


def test_keyframe_extract_zero_timescale_does_not_fail(spark):
    payload = _mp4.build_mp4_multi(
        [{"samples": [b"x" * 8, b"y" * 8], "timescale": 0, "sync_every": 1}]
    )
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    # guarded fallback timescale: runs in strict mode, no ZeroDivisionError
    rows = M.keyframe_extract(df).collect()
    assert len(rows) == 2 and all(r["pts_ms"] is not None for r in rows)
