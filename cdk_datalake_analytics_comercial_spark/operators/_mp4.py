"""Pure-Python ISO Base Media File Format (MP4) container parser + builder.

Implements the public spec ISO/IEC 14496-12 (box structure, movie/track
headers, the sample table) far enough to do CONTAINER-level work without
any codec dependency:

- :func:`probe` — brand, movie duration, per-track handler/codec
  fourcc/dimensions/sample-rate/sample-count (the ffprobe subset a corpus
  pipeline filters and routes on).
- :func:`sample_table` — per-sample (offset, size, pts, is_sync) resolved
  from stsz + stsc + stco/co64 + stts + stss, so frame payloads can be
  EXTRACTED by byte range (keyframe sampling at the container level).
- :func:`extract_samples` — the raw sample bytes themselves.
- :func:`build_mp4` — a minimal but spec-valid single-track writer used by
  fixtures and tests (ftyp + moov + mdat, one chunk run).

Decoding extracted samples to pixels/PCM still needs a real codec and
stays behind the multimodal plugin registries (`multimodal.py`); parsing
and extraction here are complete and real. This module has NO reference
counterpart: it is an LLM-data-pipeline extension (the reference is a
tabular AWS Glue pipeline with no media handling), built from the public
ISO/IEC 14496-12 specification only.

Box layout note: a box is ``uint32 size + fourcc type + payload``;
``size == 1`` switches to a trailing uint64 largesize (huge mdat),
``size == 0`` means "to end of file" (last box only). Container boxes
(moov/trak/mdia/minf/stbl/edts/udta) nest child boxes directly.
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta", b"mvex",
}


class Mp4Error(ValueError):
    """Structurally invalid / truncated MP4 payload."""


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def _u64(b: bytes, o: int) -> int:
    return struct.unpack_from(">Q", b, o)[0]


def iter_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield ``(fourcc, header_size, body_start, body_end)`` for each
    sibling box in ``payload[start:end]``."""
    end = len(payload) if end is None else end
    o = start
    while o < end:
        if o + 8 > end:
            raise Mp4Error(f"truncated box header at {o}")
        size = _u32(payload, o)
        typ = payload[o + 4 : o + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if o + 16 > end:
                raise Mp4Error(f"truncated largesize header at {o}")
            size = _u64(payload, o + 8)
            hdr = 16
        elif size == 0:  # to end of enclosing scope
            size = end - o
        if size < hdr or o + size > end:
            raise Mp4Error(f"box {typ!r} at {o} overruns its scope")
        yield typ, hdr, o + hdr, o + size
        o += size


def _find(payload: bytes, path: list[bytes], start: int = 0, end: int | None = None):
    """Body range of the FIRST box at a nested path, or None."""
    for typ, _hdr, b0, b1 in iter_boxes(payload, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find(payload, path[1:], b0, b1)
    return None


def _find_all(payload: bytes, typ: bytes, start: int, end: int):
    return [
        (b0, b1)
        for t, _h, b0, b1 in iter_boxes(payload, start, end)
        if t == typ
    ]


def _fullbox(payload: bytes, o: int) -> tuple[int, int, int]:
    """(version, flags, first-field offset) of a full box body."""
    vf = _u32(payload, o)
    return vf >> 24, vf & 0xFFFFFF, o + 4


def _mvhd(payload: bytes, b0: int) -> tuple[int, int]:
    """(timescale, duration) from mvhd — version 0 (32-bit) or 1 (64-bit)."""
    ver, _flags, o = _fullbox(payload, b0)
    if ver == 1:
        return _u32(payload, o + 16), _u64(payload, o + 20)
    return _u32(payload, o + 8), _u32(payload, o + 12)


def _mdhd(payload: bytes, b0: int) -> tuple[int, int]:
    ver, _flags, o = _fullbox(payload, b0)
    if ver == 1:
        return _u32(payload, o + 16), _u64(payload, o + 20)
    return _u32(payload, o + 8), _u32(payload, o + 12)


def _tkhd_dims(payload: bytes, b0: int) -> tuple[float, float]:
    """(width, height) from tkhd's trailing 16.16 fixed-point fields."""
    ver, _flags, o = _fullbox(payload, b0)
    o += (32 if ver == 1 else 20) + 52  # ids/times + reserved/matrix
    return _u32(payload, o) / 65536.0, _u32(payload, o + 4) / 65536.0


def _stsd_entry(payload: bytes, b0: int, b1: int, handler: str) -> dict:
    """First sample-description entry: codec fourcc + the fixed fields
    video (width/height) and audio (channels/samplerate) entries carry."""
    _ver, _flags, o = _fullbox(payload, b0)
    n = _u32(payload, o)
    if n < 1 or o + 12 > b1:
        return {}
    entry_start = o + 4
    fourcc = payload[entry_start + 4 : entry_start + 8].decode(
        "ascii", "replace"
    )
    out = {"codec": fourcc}
    body = entry_start + 8 + 8  # box header + 6 reserved + 2 data_ref_idx
    if handler == "vide" and body + 70 <= b1:
        out["width"] = struct.unpack_from(">H", payload, body + 16)[0]
        out["height"] = struct.unpack_from(">H", payload, body + 18)[0]
    elif handler == "soun" and body + 20 <= b1:
        out["channels"] = struct.unpack_from(">H", payload, body + 8)[0]
        out["sample_rate"] = _u32(payload, body + 16) >> 16  # 16.16
    return out


def probe(payload: bytes) -> dict:
    """Container metadata: ``{"brand", "duration_sec", "tracks": [...]}``.

    Each track: handler ('vide'/'soun'/...), codec fourcc, n_samples,
    timescale, duration_sec, and handler-specific dims/rate fields."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise Mp4Error("not an ISO-BMFF payload (no leading ftyp)")
    brand = payload[8:12].decode("ascii", "replace")
    moov = _find(payload, [b"moov"])
    if moov is None:
        raise Mp4Error("no moov box (fragmented/streaming-only MP4?)")
    m0, m1 = moov
    out: dict = {"brand": brand, "duration_sec": 0.0, "tracks": []}
    mvhd = _find(payload, [b"mvhd"], m0, m1)
    if mvhd is not None:
        ts, dur = _mvhd(payload, mvhd[0])
        out["duration_sec"] = round(dur / ts, 6) if ts else 0.0
    for t0, t1 in _find_all(payload, b"trak", m0, m1):
        trk: dict = {}
        tkhd = _find(payload, [b"tkhd"], t0, t1)
        mdia = _find(payload, [b"mdia"], t0, t1)
        if mdia is None:
            continue
        d0, d1 = mdia
        hdlr = _find(payload, [b"hdlr"], d0, d1)
        handler = (
            payload[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
            if hdlr
            else "????"
        )
        trk["handler"] = handler
        mdhd = _find(payload, [b"mdhd"], d0, d1)
        if mdhd is not None:
            ts, dur = _mdhd(payload, mdhd[0])
            trk["timescale"] = ts
            trk["duration_sec"] = round(dur / ts, 6) if ts else 0.0
        stbl = _find(payload, [b"minf", b"stbl"], d0, d1)
        if stbl is not None:
            s0, s1 = stbl
            stsd = _find(payload, [b"stsd"], s0, s1)
            if stsd is not None:
                trk.update(_stsd_entry(payload, stsd[0], stsd[1], handler))
            stsz = _find(payload, [b"stsz"], s0, s1)
            if stsz is not None:
                _ver, _fl, o = _fullbox(payload, stsz[0])
                fixed = _u32(payload, o)
                trk["n_samples"] = _u32(payload, o + 4)
                trk["fixed_sample_size"] = fixed or None
            stss = _find(payload, [b"stss"], s0, s1)
            if stss is not None:
                _ver, _fl, o = _fullbox(payload, stss[0])
                trk["n_sync_samples"] = _u32(payload, o)
        if handler == "vide" and tkhd is not None and "width" not in trk:
            w, h = _tkhd_dims(payload, tkhd[0])
            trk["width"], trk["height"] = int(w), int(h)
        out["tracks"].append(trk)
    return out


def sample_table(payload: bytes, track: int = 0) -> list[dict]:
    """Per-sample ``{"offset", "size", "pts", "is_sync"}`` for one track,
    resolved from the stbl boxes (file-absolute offsets; pts in track
    timescale units). Raises on tables that disagree with each other."""
    moov = _find(payload, [b"moov"])
    if moov is None:
        raise Mp4Error("no moov box")
    traks = _find_all(payload, b"trak", *moov)
    if track >= len(traks):
        raise Mp4Error(f"track {track} out of range ({len(traks)} tracks)")
    stbl = _find(payload, [b"mdia", b"minf", b"stbl"], *traks[track])
    if stbl is None:
        raise Mp4Error("track has no sample table")
    s0, s1 = stbl

    stsz = _find(payload, [b"stsz"], s0, s1)
    if stsz is None:
        raise Mp4Error("no stsz")
    _v, _f, o = _fullbox(payload, stsz[0])
    fixed, n = _u32(payload, o), _u32(payload, o + 4)
    sizes = (
        [fixed] * n
        if fixed
        else [_u32(payload, o + 8 + 4 * i) for i in range(n)]
    )

    stco = _find(payload, [b"stco"], s0, s1)
    co64 = _find(payload, [b"co64"], s0, s1)
    if stco is not None:
        _v, _f, o = _fullbox(payload, stco[0])
        nch = _u32(payload, o)
        chunk_offsets = [_u32(payload, o + 4 + 4 * i) for i in range(nch)]
    elif co64 is not None:
        _v, _f, o = _fullbox(payload, co64[0])
        nch = _u32(payload, o)
        chunk_offsets = [_u64(payload, o + 4 + 8 * i) for i in range(nch)]
    else:
        raise Mp4Error("no stco/co64")

    stsc = _find(payload, [b"stsc"], s0, s1)
    if stsc is None:
        raise Mp4Error("no stsc")
    _v, _f, o = _fullbox(payload, stsc[0])
    nruns = _u32(payload, o)
    runs = [
        (
            _u32(payload, o + 4 + 12 * i),      # first_chunk (1-based)
            _u32(payload, o + 8 + 12 * i),      # samples_per_chunk
        )
        for i in range(nruns)
    ]
    # expand runs → samples-per-chunk for every chunk
    per_chunk: list[int] = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < nruns else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first + 1))
    if sum(per_chunk) != n:
        raise Mp4Error(
            f"stsc chunks cover {sum(per_chunk)} samples, stsz declares {n}"
        )

    stts = _find(payload, [b"stts"], s0, s1)
    pts: list[int] = []
    if stts is not None:
        _v, _f, o = _fullbox(payload, stts[0])
        ne = _u32(payload, o)
        tcur = 0
        for i in range(ne):
            cnt = _u32(payload, o + 4 + 8 * i)
            delta = _u32(payload, o + 8 + 8 * i)
            for _ in range(cnt):
                pts.append(tcur)
                tcur += delta
    if len(pts) < n:
        pts.extend([0] * (n - len(pts)))

    sync = None
    stss = _find(payload, [b"stss"], s0, s1)
    if stss is not None:
        _v, _f, o = _fullbox(payload, stss[0])
        ns = _u32(payload, o)
        sync = {_u32(payload, o + 4 + 4 * i) for i in range(ns)}  # 1-based

    out = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(per_chunk[ci]):
            out.append(
                {
                    "offset": off,
                    "size": sizes[si],
                    "pts": pts[si],
                    # no stss box ⇒ every sample is a sync sample (spec)
                    "is_sync": sync is None or (si + 1) in sync,
                }
            )
            off += sizes[si]
            si += 1
    return out


def extract_samples(
    payload: bytes, track: int = 0, indices: list[int] | None = None,
    sync_only: bool = False,
) -> list[tuple[int, int, bytes]]:
    """Raw sample payloads as ``(index, pts, bytes)`` — container-level
    frame extraction with zero codec work. ``sync_only=True`` keeps only
    keyframes (stss); ``indices`` restricts further."""
    table = sample_table(payload, track)
    want = set(indices) if indices is not None else None
    out = []
    for i, s in enumerate(table):
        if sync_only and not s["is_sync"]:
            continue
        if want is not None and i not in want:
            continue
        b = payload[s["offset"] : s["offset"] + s["size"]]
        if len(b) != s["size"]:
            raise Mp4Error(f"sample {i} range overruns the payload")
        out.append((i, s["pts"], b))
    return out


_TRACK_DEFAULTS = {
    "timescale": 1000,
    "sample_delta": 40,
    "handler": b"vide",
    "codec": b"mp4v",
    "width": 64,
    "height": 48,
    "sample_rate": 48000,
    "channels": 2,
    "sync_every": 5,
}


def build_mp4(
    samples: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
    handler: bytes = b"vide",
    codec: bytes = b"mp4v",
    width: int = 64,
    height: int = 48,
    sample_rate: int = 48000,
    channels: int = 2,
    sync_every: int = 5,
) -> bytes:
    """Minimal spec-valid single-track MP4 (see :func:`build_mp4_multi`)."""
    return build_mp4_multi(
        [
            {
                "samples": samples,
                "timescale": timescale,
                "sample_delta": sample_delta,
                "handler": handler,
                "codec": codec,
                "width": width,
                "height": height,
                "sample_rate": sample_rate,
                "channels": channels,
                "sync_every": sync_every,
            }
        ]
    )


def build_mp4_multi(tracks: list[dict]) -> bytes:
    """Minimal spec-valid MULTI-track MP4: ftyp + moov(mvhd, trak* (tkhd,
    mdia(mdhd, hdlr, minf(stbl(stsd stts stsc stsz stco [stss]))))) +
    mdat. Each track dict carries ``samples`` plus any of the
    ``_TRACK_DEFAULTS`` keys; each track's samples land in ONE chunk,
    chunks concatenated in track order inside mdat. Deterministic bytes
    for fixtures and sink plumbing; every field round-trips through
    :func:`probe` / :func:`sample_table`. Multi-track files exercise the
    track-index resolution paths (video track not at index 0)."""
    if not tracks:
        raise ValueError("need at least one track")
    cfgs = [{**_TRACK_DEFAULTS, **t} for t in tracks]

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    def full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(typ, struct.pack(">I", (ver << 24) | flags) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # movie duration in the mvhd timescale (first track's), longest track
    mv_ts = cfgs[0]["timescale"]
    mv_dur = max(
        int(
            len(c["samples"]) * c["sample_delta"] * mv_ts // (c["timescale"] or 1)
        )
        for c in cfgs
    )

    def trak_bytes(c: dict, track_id: int, chunk_offset: int) -> bytes:
        samples = c["samples"]
        n = len(samples)
        duration = n * c["sample_delta"]
        handler, codec = c["handler"], c["codec"]
        tkhd = full(
            b"tkhd", 0, 7,
            struct.pack(">III", 0, 0, track_id)
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 16
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", c["width"] << 16, c["height"] << 16),
        )
        mdhd = full(
            b"mdhd", 0, 0,
            struct.pack(">II", 0, 0)
            + struct.pack(">II", c["timescale"], duration)
            + struct.pack(">HH", 0x55C4, 0),  # 'und' language
        )
        hdlr = full(
            b"hdlr", 0, 0,
            b"\x00" * 4 + handler + b"\x00" * 12 + b"parser\x00",
        )
        if handler == b"vide":
            entry = (
                b"\x00" * 6
                + struct.pack(">H", 1)            # data_reference_index
                + b"\x00" * 16
                + struct.pack(">HH", c["width"], c["height"])
                + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
                + b"\x00" * 4
                + struct.pack(">H", 1)            # frame count
                + b"\x00" * 32                    # compressor name
                + struct.pack(">Hh", 24, -1)      # depth, color table
            )
            mhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        else:
            entry = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(">HH", c["channels"], 16)
                + b"\x00" * 4
                + struct.pack(">I", c["sample_rate"] << 16)
            )
            mhd = full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        stsd = full(
            b"stsd", 0, 0,
            struct.pack(">I", 1) + box(codec, entry),
        )
        stts = full(
            b"stts", 0, 0, struct.pack(">III", 1, n, c["sample_delta"])
        )
        stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        stbl_children = [stsd, stts, stsc, stsz, stco]
        if handler == b"vide" and c["sync_every"] > 0:
            syncs = list(range(1, n + 1, c["sync_every"]))
            stbl_children.append(
                full(
                    b"stss", 0, 0,
                    struct.pack(">I", len(syncs))
                    + b"".join(struct.pack(">I", s) for s in syncs),
                )
            )
        stbl = box(b"stbl", b"".join(stbl_children))
        dinf = box(
            b"dinf",
            full(b"dref", 0, 0, struct.pack(">I", 1) + full(b"url ", 0, 1, b"")),
        )
        minf = box(b"minf", mhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        return box(b"trak", tkhd + mdia)

    def moov_bytes(chunk_offsets: list[int]) -> bytes:
        mvhd = full(
            b"mvhd", 0, 0,
            struct.pack(">II", 0, 0)
            + struct.pack(">II", mv_ts, mv_dur)
            + struct.pack(">I", 0x00010000)  # rate 1.0
            + struct.pack(">H", 0x0100)      # volume 1.0
            + b"\x00" * 10
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + b"\x00" * 24
            + struct.pack(">I", len(cfgs) + 1),  # next track id
        )
        traks = b"".join(
            trak_bytes(c, i + 1, off)
            for i, (c, off) in enumerate(zip(cfgs, chunk_offsets))
        )
        return box(b"moov", mvhd + traks)

    # stco is 4 bytes whatever the offset value, so the moov length is
    # offset-independent: build once to size it, once more with the real
    # mdat payload positions
    moov_len = len(moov_bytes([0] * len(cfgs)))
    base = len(ftyp) + moov_len + 8  # + mdat header
    offsets, cur = [], base
    for c in cfgs:
        offsets.append(cur)
        cur += sum(len(s) for s in c["samples"])
    moov = moov_bytes(offsets)
    mdat = box(
        b"mdat", b"".join(s for c in cfgs for s in c["samples"])
    )
    return ftyp + moov + mdat
