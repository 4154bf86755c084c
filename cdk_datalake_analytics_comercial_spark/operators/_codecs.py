"""Pure-Python/numpy decoders for UNCOMPRESSED media formats.

The engine's multimodal operators decode real payloads where the format is
parseable without native codec libraries (none are in this environment):

- images: PPM (binary ``P6``), uncompressed 24-bit BMP (``BM``, BI_RGB),
  8-bit PNG (all color types, all row filters — PNG is zlib + per-row
  filtering, fully decodable with stdlib ``zlib`` and numpy), and
  JPEG — baseline sequential AND progressive (full T.81 decoder in
  ``_jpeg.py`` — Huffman, IDCT, subsampling, restart markers, spectral
  selection + successive approximation; arithmetic coding raises)
- audio:  PCM WAV (``RIFF..WAVE``, 16-bit + G.711 format codes), MP4 PCM
  and G.711 tracks, and MPEG-1/2 Layer III (full decode pipeline in
  ``_mp3l3.py`` — side info, bit reservoir, scalefactors, Huffman,
  requantization, IMDCT, polyphase synthesis; streams selecting Huffman
  tables beyond the shipped verified subset refuse loudly, see that
  module's scope statement)
- video:  a concatenated-P6 frame stream (an MJPEG-shaped uncompressed
  container: back-to-back PPM frames) and MJPEG-in-MP4

Remaining env-blocked codecs (H.264/HEVC video, AAC, arithmetic JPEG)
raise ``NotImplementedError`` — they need ffmpeg-class dependencies; the
operators keep the same Arrow-batched plumbing either way, so plugging a
real codec in later does not change any plan shape.

All functions take/return plain ``bytes``/numpy so they are directly
unit-testable without Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

REC601 = (0.299, 0.587, 0.114)


def sniff(payload: bytes) -> str:
    """Identify the container from magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"\x89PNG":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


# ---------------------------------------------------------------------------
# images


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, pixel-data offset) of a binary P6 header.

    Header: ``P6 <w> <h> <maxval>`` with whitespace/comments, then raw RGB.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return w, h, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8."""
    w, h, offset = _parse_ppm_header(payload)
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=offset)
    return data.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → HxWx3 uint8
    (RGB order, top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → HxWx3 uint8 RGB, pure stdlib ``zlib`` + numpy.

    PNG is a zlib-deflated stream of per-row-filtered scanlines — fully
    decodable without native codec libraries. Supported: 8-bit depth, all
    five color types (grayscale, RGB, palette, gray+alpha, RGBA — alpha is
    dropped, palette resolved through PLTE), all five row filters
    (None/Sub/Up/Average/Paeth). Adam7 interlacing and 1/2/4/16-bit depths
    raise ``NotImplementedError``."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + body + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, np.uint8, stride, offset=base + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 255
        elif ftype == 1:  # Sub — sequential left dependency
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 255
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 255
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    px = out.reshape(h, w, channels)
    if color == 2:  # truecolor
        return np.ascontiguousarray(px)
    if color == 6:  # RGBA → drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    if color == 0:  # grayscale
        return np.repeat(px, 3, axis=2)
    if color == 4:  # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(plte[px[:, :, 0]])  # palette


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → PNG (color type 2, filter 0 rows) — the
    round-trip partner of :func:`decode_png` for property tests."""
    h, w = img.shape[:2]
    body = img.astype(np.uint8).reshape(h, w * 3)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from ._jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"image codec '{kind}' needs a native library not present here; "
        "supported formats: PPM (P6), 24-bit BMP, 8-bit PNG, baseline JPEG"
    )


def luma(img: np.ndarray) -> np.ndarray:
    r, g, b = REC601
    return r * img[..., 0] + g * img[..., 1] + b * img[..., 2]


def luma_histogram(img: np.ndarray, bins: int) -> list[float]:
    """Normalized luma histogram — the real counterpart of the fake
    feature vector (a compact, deterministic per-image signature)."""
    hist, _ = np.histogram(luma(img), bins=bins, range=(0.0, 255.0))
    total = max(int(hist.sum()), 1)
    return [float(x) / total for x in hist]


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return img[yi[:, None], xi[None, :]]


# ---------------------------------------------------------------------------
# audio


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float64 mono samples in [-1, 1], sample_rate). Walks the
    RIFF chunk list; supports 16-bit PCM (format 1), any channel count
    (channels average to mono)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 6 and bits == 8:  # WAVE_FORMAT_ALAW
        samples = decode_g711_alaw(data)
    elif audio_format == 7 and bits == 8:  # WAVE_FORMAT_MULAW
        samples = decode_g711_ulaw(data)
    elif audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            "WAV formats supported: 16-bit PCM, 8-bit G.711 A-law/µ-law"
        )
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, sample_rate


def mfcc(
    samples: np.ndarray,
    sample_rate: int,
    n_mfcc: int = 8,
    n_fft: int = 512,
    n_mels: int = 20,
) -> list[float]:
    """Compact MFCC-style coefficients: power spectrum (numpy FFT) → mel
    filterbank → log → DCT-II, averaged over frames. Textbook DSP, no
    external library."""
    if len(samples) < n_fft:
        samples = np.pad(samples, (0, n_fft - len(samples)))
    n_frames = len(samples) // n_fft
    frames = samples[: n_frames * n_fft].reshape(n_frames, n_fft)
    window = np.hanning(n_fft)
    spec = np.abs(np.fft.rfft(frames * window, axis=1)) ** 2  # (frames, bins)

    # mel filterbank
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = mel_to_hz(np.linspace(0.0, hz_to_mel(sample_rate / 2.0), n_mels + 2))
    bin_pts = np.floor((n_fft + 1) * mel_pts / sample_rate).astype(int)
    fbank = np.zeros((n_mels, spec.shape[1]))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bin_pts[m - 1], bin_pts[m], bin_pts[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fbank[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fbank[m - 1, k] = (hi - k) / (hi - ctr)
    mel_energy = np.log(spec @ fbank.T + 1e-10)  # (frames, n_mels)

    # DCT-II over the mel axis
    n = np.arange(n_mels)
    basis = np.cos(np.pi * np.outer(np.arange(n_mfcc), (2 * n + 1) / (2.0 * n_mels)))
    coeffs = mel_energy @ basis.T  # (frames, n_mfcc)
    return [float(x) for x in coeffs.mean(axis=0)]


# ---------------------------------------------------------------------------
# video (concatenated-P6 stream)


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a back-to-back P6 stream into per-frame byte slices."""
    frames = []
    i = 0
    while payload[i : i + 2] == b"P6":
        w, h, offset = _parse_ppm_header(payload[i:])
        end = i + offset + w * h * 3
        frames.append(payload[i:end])
        i = end
    return frames


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T G.711 µ-law / A-law — pure table math, the
# one compressed-audio family that needs no entropy coding). Decode targets
# the conventional 16-bit linear scale (the audioop/Sun table: µ-law 0x00 →
# -32124, 0x7F/0xFF → 0).


def decode_g711_ulaw(data: bytes) -> np.ndarray:
    """µ-law bytes → float64 samples in [-1, 1] (16-bit linear scale:
    0x00 → -32124, 0x7F/0xFF → 0 — the Sun/CCITT table)."""
    u = (~np.frombuffer(data, dtype=np.uint8)).astype(np.int32)
    sign = u & 0x80
    exponent = (u >> 4) & 7
    mantissa = u & 0xF
    t = (((mantissa << 3) + 0x84) << exponent) - 0x84
    lin = np.where(sign != 0, -t, t)
    return lin.astype(np.float64) / 32768.0


def decode_g711_alaw(data: bytes) -> np.ndarray:
    """A-law bytes → float64 samples in [-1, 1] (16-bit linear scale:
    0xD5 → +8, the Sun/CCITT table; sign bit SET means positive)."""
    a = (np.frombuffer(data, dtype=np.uint8) ^ 0x55).astype(np.int32)
    sign = a & 0x80
    exponent = (a >> 4) & 7
    mantissa = a & 0xF
    t = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    lin = np.where(sign != 0, t, -t)
    return lin.astype(np.float64) / 32768.0


def encode_g711_ulaw(samples: np.ndarray) -> bytes:
    """Float [-1, 1] → µ-law bytes (segmented companding on the 16-bit
    scale, Sun's linear2ulaw) — the exact inverse family of
    :func:`decode_g711_ulaw`."""
    x = np.clip((samples * 32768.0).round().astype(np.int32), -32768, 32767)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    v = mag >> 7
    exponent = np.minimum(
        np.floor(np.log2(np.maximum(v, 1))).astype(np.int32), 7
    )
    mantissa = (mag >> (exponent + 3)) & 0xF
    return ((~(sign | (exponent << 4) | mantissa)) & 0xFF).astype(
        np.uint8
    ).tobytes()


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF) media decode: container parsing is fully handled by
# operators._mp4; samples decode HERE when the sample codec is one this
# repo genuinely implements — MJPEG video ('jpeg'/'mjpa' fourcc: every
# sample is a baseline/progressive JPEG, decoded by operators._jpeg) and
# uncompressed / G.711 audio ('sowt'/'twos'/'ulaw'/'alaw'). Entropy-coded
# A/V (avc1/hevc/mp4a-AAC) still raises toward the plugin chain.


def decode_mp4_frames(payload: bytes) -> list[np.ndarray]:
    """MP4 video samples → list of HxWx3 uint8 frames (MJPEG tracks)."""
    from . import _mp4

    p = _mp4.probe(payload)
    idx_codec = [
        (i, t.get("codec", "")) for i, t in enumerate(p["tracks"])
        if t.get("handler") == "vide"
    ]
    if not idx_codec:
        raise ValueError("MP4 has no video track")
    track, codec = idx_codec[0]
    if codec not in ("jpeg", "mjpa", "mjpb"):
        raise NotImplementedError(
            f"MP4 video codec '{codec}' needs a native decoder; "
            "in-repo decodable: MJPEG ('jpeg'/'mjpa' — JPEG per sample)"
        )
    return [
        decode_image(b) for _i, _pts, b in _mp4.extract_samples(payload, track)
    ]


def decode_mp4_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """MP4 audio samples → (float64 mono samples in [-1, 1], rate) for
    PCM ('sowt' LE / 'twos' BE, 16-bit) and G.711 ('ulaw'/'alaw')."""
    from . import _mp4

    p = _mp4.probe(payload)
    tracks = [
        (i, t) for i, t in enumerate(p["tracks"]) if t.get("handler") == "soun"
    ]
    if not tracks:
        raise ValueError("MP4 has no audio track")
    track, meta = tracks[0]
    codec = meta.get("codec", "")
    rate = int(meta.get("sample_rate") or 8000)
    channels = int(meta.get("channels") or 1)
    data = b"".join(b for _i, _pts, b in _mp4.extract_samples(payload, track))
    if codec == "sowt":
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif codec == "twos":
        samples = np.frombuffer(data, dtype=">i2").astype(np.float64) / 32768.0
    elif codec == "ulaw":
        samples = decode_g711_ulaw(data)
    elif codec == "alaw":
        samples = decode_g711_alaw(data)
    else:
        raise NotImplementedError(
            f"MP4 audio codec '{codec}' needs a native decoder; "
            "in-repo decodable: sowt/twos PCM, ulaw/alaw G.711"
        )
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Audio container dispatch: WAV (PCM-16 + G.711 format codes), MP4
    (PCM/G.711 tracks), or MPEG audio (Layer III via the pure-numpy
    `_mp3l3` pipeline — full decode chain; streams selecting Huffman
    tables beyond the shipped verified set refuse loudly naming the
    table, see `_mp3l3.py`'s scope statement)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return decode_mp4_audio(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        from . import _mp3l3

        return _mp3l3.decode_mp3(payload)
    raise NotImplementedError(
        "audio container not recognized (WAV, MP4, and MPEG Layer III "
        "supported)"
    )
