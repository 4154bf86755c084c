"""Pure-Python MPEG audio (MP3) frame walker + builder.

Implements the public MPEG-1/2/2.5 audio frame header layout (ISO/IEC
11172-3 / 13818-3) at the CONTAINER level — no Huffman/MDCT decode:

- :func:`probe` — version/layer/bitrate/sample-rate/mode, frame count,
  duration, CBR-vs-VBR, Xing/Info tag detection, ID3v2/ID3v1 skip.
- :func:`frame_offsets` — every frame's (offset, size, n_pcm_samples) so
  audio segments can be extracted by byte range without decoding.
- :func:`extract_frames` — the raw frame bytes.
- :func:`build_mp3` — deterministic spec-valid CBR frames for fixtures.

PCM decode stays behind the multimodal audio plugin registry; frame
parsing/extraction here is complete and real.
"""

from __future__ import annotations

import struct


class Mp3Error(ValueError):
    """Structurally invalid MP3 payload."""


# bitrate (kbps) tables, indexed [version_group][layer][bitrate_index];
# version_group: 0 = MPEG-1, 1 = MPEG-2/2.5. Index 0 is "free", 15 invalid.
_BITRATES = {
    (0, 1): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 1): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_RATES = {  # by version bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _parse_header(b: bytes, o: int) -> dict | None:
    """Decode the 4-byte frame header at offset ``o``; None if not a
    valid sync."""
    if o + 4 > len(b):
        return None
    h = struct.unpack_from(">I", b, o)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3
    if vbits == 1:
        return None  # reserved version
    layer = 4 - ((h >> 17) & 3)  # bits 01→III(3), 10→II(2), 11→I(1)
    if (h >> 17) & 3 == 0:
        return None  # reserved layer
    bidx = (h >> 12) & 0xF
    ridx = (h >> 10) & 3
    if bidx == 15 or ridx == 3:
        return None
    vgroup = 0 if vbits == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][bidx] * 1000
    if bitrate == 0:
        return None  # "free" bitrate needs out-of-band framing — refuse
    rate = _RATES[vbits][ridx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    mode_ext = (h >> 4) & 3
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
        spf = 384
    else:
        # Layer III MPEG-2/2.5 halves samples-per-frame (and the factor)
        factor = 144 if (layer == 2 or vgroup == 0) else 72
        size = factor * bitrate // rate + padding
        spf = 1152 if (layer == 2 or vgroup == 0) else 576
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[vbits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "mode": _MODES[mode],
        "mode_extension": mode_ext,
        "size": size,
        "samples_per_frame": spf,
    }


def _skip_id3v2(b: bytes) -> int:
    """Offset past a leading ID3v2 tag (syncsafe 28-bit size), else 0."""
    if len(b) >= 10 and b[:3] == b"ID3":
        size = (
            (b[6] & 0x7F) << 21
            | (b[7] & 0x7F) << 14
            | (b[8] & 0x7F) << 7
            | (b[9] & 0x7F)
        )
        return 10 + size
    return 0


def frame_offsets(
    payload: bytes, allow_truncated_final: bool = False
) -> list[dict]:
    """Every MPEG audio frame: ``{"offset", "size", "n_samples",
    "bitrate", "sample_rate"}`` — walks header-to-header (resyncs are NOT
    attempted: a mid-stream junk byte raises, which is the honest corpus
    behavior — flag the blob, don't guess). ``allow_truncated_final``
    drops a cut-off final frame instead of raising (real-world corpora
    routinely truncate the last frame — gsutil's own MP3 test asset
    does)."""
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":
        end -= 128  # trailing ID3v1
    o = _skip_id3v2(payload)
    frames = []
    while o < end:
        hdr = _parse_header(payload, o)
        if hdr is None:
            raise Mp3Error(
                f"lost sync at byte {o} (frame {len(frames)}) — "
                "not a clean MPEG audio stream"
            )
        if o + hdr["size"] > end:
            if allow_truncated_final and frames:
                break
            raise Mp3Error(f"truncated final frame at byte {o}")
        frames.append(
            {
                "offset": o,
                "size": hdr["size"],
                "n_samples": hdr["samples_per_frame"],
                "bitrate": hdr["bitrate"],
                "sample_rate": hdr["sample_rate"],
            }
        )
        o += hdr["size"]
    if not frames:
        raise Mp3Error("no MPEG audio frames")
    return frames


def probe(payload: bytes) -> dict:
    """Stream metadata from the frame walk: version/layer/mode of the
    first frame, frame count, exact duration (Σ samples / rate), mean
    bitrate, CBR flag, and whether a Xing/Info (VBR) tag is present in
    the first frame."""
    frames = frame_offsets(payload)
    first = _parse_header(payload, frames[0]["offset"])
    assert first is not None
    total_samples = sum(f["n_samples"] for f in frames)
    total_bytes = sum(f["size"] for f in frames)
    rate = first["sample_rate"]
    duration = total_samples / rate
    first_body = payload[
        frames[0]["offset"] : frames[0]["offset"] + frames[0]["size"]
    ]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "mode": first["mode"],
        "sample_rate": rate,
        "n_frames": len(frames),
        "duration_sec": round(duration, 6),
        "bitrate_kbps": round(total_bytes * 8 / duration / 1000.0, 3),
        "cbr": len({f["bitrate"] for f in frames}) == 1,
        "has_xing": b"Xing" in first_body or b"Info" in first_body,
    }


def extract_frames(
    payload: bytes, indices: list[int] | None = None
) -> list[tuple[int, bytes]]:
    """Raw frame payloads as ``(index, bytes)`` — byte-range extraction,
    zero decode."""
    frames = frame_offsets(payload)
    want = set(indices) if indices is not None else None
    return [
        (i, payload[f["offset"] : f["offset"] + f["size"]])
        for i, f in enumerate(frames)
        if want is None or i in want
    ]


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3v2_bytes: int = 0,
    fill: int = 0xA5,
) -> bytes:
    """Deterministic CBR MPEG-1 Layer III stream: ``n_frames`` valid
    frames (correct per-frame padding for the 44100-family rates), an
    optional leading ID3v2 tag, frame bodies filled with ``fill`` XOR
    the frame index (distinct, position-checkable bytes)."""
    bidx = _BITRATES[(0, 3)].index(bitrate_kbps)
    ridx = _RATES[3].index(sample_rate)
    out = bytearray()
    if id3v2_bytes:
        body = bytes(id3v2_bytes)
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (id3v2_bytes >> 21) & 0x7F,
                (id3v2_bytes >> 14) & 0x7F,
                (id3v2_bytes >> 7) & 0x7F,
                id3v2_bytes & 0x7F,
            ]
        ) + body
    # Classic CBR padding schedule: pad when the exact frame length
    # 144·bitrate/rate has a fractional remainder that the running
    # accumulator crosses (this is how encoders hit the exact bitrate).
    exact = 144 * bitrate_kbps * 1000 / sample_rate
    base = int(144 * bitrate_kbps * 1000 // sample_rate)
    acc = 0.0
    for i in range(n_frames):
        acc += exact - base
        padding = 1 if acc >= 1.0 else 0
        if padding:
            acc -= 1.0
        h = (
            0x7FF << 21
            | 3 << 19            # MPEG-1
            | 1 << 17            # Layer III
            | 1 << 16            # no CRC
            | bidx << 12
            | ridx << 10
            | padding << 9
            | (3 if mono else 0) << 6
        )
        size = base + padding
        frame = bytearray(struct.pack(">I", h))
        frame += bytes([(fill ^ i) & 0xFF] * (size - 4))
        out += frame
    return bytes(out)
