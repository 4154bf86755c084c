"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

Closes the "entropy-coded image formats need native libs" gap for JPEG:
baseline sequential DCT JPEGs — the overwhelming majority of stored
images — are decodable with nothing but bit twiddling and an 8×8 IDCT,
both of which numpy does fine. The decoder handles grayscale and YCbCr
color, arbitrary sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0),
restart intervals, and multi-table DQT/DHT segments. Progressive (SOF2),
arithmetic-coded, and 12-bit variants raise ``NotImplementedError`` with
the marker name — same honest-failure contract as the other codecs.

The encoder (4:4:4 or 4:2:0, quality-scaled Annex-K quantization tables,
standard Annex-K Huffman tables) exists so the codec is testable end to
end offline: round-trip PSNR bounds at several qualities/shapes pin the
whole pipeline (DCT ↔ IDCT, zigzag, DC prediction, run-length, Huffman,
byte stuffing, subsampling). Structural self-checks on import verify the
Huffman tables are complete and canonical — a transcription typo fails
fast, not as silently-wrong bitstreams.

Performance note: this is NOT the hot path at 100 TB — multimodal decode
runs inside Arrow-batched ``mapInPandas`` workers where a native codec
should be plugged in (`operators/multimodal.py` docstring); this keeps
the pipeline *functional* and testable in native-lib-less environments.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag (generated, not transcribed), quant + Huffman tables


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, derived from the diagonal walk."""
    order = []
    for d in range(15):
        rng = range(d + 1)
        idx = [(d - j, j) for j in rng] if d % 2 == 0 else [(j, d - j) for j in rng]
        order.extend((r, c) for r, c in idx if r < 8 and c < 8)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()          # natural index for each zigzag position
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance K.1, chrominance K.2), row-major.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16] code-length histogram, symbol list).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical T.81 assignment."""
    if sum(bits) != len(vals):
        raise ValueError("Huffman spec: bits histogram disagrees with values")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman spec: canonical code overflow")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _self_check() -> None:
    """Import-time structural validation of the transcribed tables: a typo
    in bits/vals breaks completeness or canonicality and fails HERE."""
    for bits, vals, need in (
        (DC_LUMA_BITS, DC_LUMA_VALS, set(range(12))),
        (DC_CHROMA_BITS, DC_CHROMA_VALS, set(range(12))),
        (
            AC_LUMA_BITS,
            AC_LUMA_VALS,
            {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0},
        ),
        (
            AC_CHROMA_BITS,
            AC_CHROMA_VALS,
            {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0},
        ),
    ):
        codes = _canonical_codes(bits, vals)
        missing = need - set(codes)
        if missing:
            raise ValueError(f"Huffman spec incomplete: missing {sorted(missing)[:5]}")
    if sorted(ZIGZAG.tolist()) != list(range(64)):
        raise ValueError("zigzag derivation broken")


_self_check()


def _dct_matrix() -> np.ndarray:
    M = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(0.5) if i == 0 else 1.0
        for j in range(8):
            M[i, j] = 0.5 * c * np.cos((2 * j + 1) * i * np.pi / 16.0)
    return M


DCT_M = _dct_matrix()


def dct2(block: np.ndarray) -> np.ndarray:
    return DCT_M @ block @ DCT_M.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return DCT_M.T @ coef @ DCT_M


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.buf)


class _BitReader:
    """Reads entropy-coded data; unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past marker")
        if self.pos >= len(self.data):
            raise EOFError("truncated JPEG stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
            # marker; skip them so FF FF D0 reads as marker 0xD0 (not a
            # bogus marker 0xFF), and FF FF 00 as a stuffed 0xFF data byte
            # after a fill (libjpeg's jdhuff semantics)
            while self.pos < len(self.data) and self.data[self.pos] == 0xFF:
                self.pos += 1
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise EOFError("hit marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte; return the marker at the boundary (either one
        already tripped by ``_fill`` or one sitting at the current byte)."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None:
            m, self.marker = self.marker, None
            return m
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            # skip 0xFF fill bytes preceding the marker (T.81 B.1.1.2); a
            # trailing 0x00 after the fills means stuffed data, not a marker
            j = self.pos + 1
            while j < len(self.data) and self.data[j] == 0xFF:
                j += 1
            if j < len(self.data) and self.data[j] != 0x00:
                self.pos = j + 1
                return self.data[j]
        return None


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a size-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bitsize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# decoder


class _HuffTree:
    """Flat canonical-code decoder: (first_code, first_index) per length."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                if code >= self.min_code[length]:
                    return self.vals[self.val_ptr[length] + code - self.min_code[length]]
        raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to HxWx3 uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTree] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte: next byte may start the real marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                i += 64
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz  # stored in zigzag order
                qtables[tid] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _HuffTree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (progressive/arithmetic) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS/image data found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = r.align_to_marker()
                if m is not None and not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got 0x{m:02x}")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = htables[(0, scan[c["id"]][0])]
                ac_t = htables[(1, scan[c["id"]][1])]
                qt = qtables[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_t.decode(r)
                        diff = _extend(r.bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(r)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        nat = np.empty(64, dtype=np.int64)
                        nat[ZIGZAG] = zz
                        block = idct2((nat * qt).reshape(8, 8).astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full res, crop, level shift
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder


def _encode_block(bw, block, qt, dc_codes, ac_codes, pred):
    coef = np.round(dct2(block) / qt.reshape(8, 8)).astype(np.int64)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    size = _bitsize(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        size = _bitsize(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) as baseline JFIF.
    ``subsample=True`` writes 4:2:0 (2×2 luma MCUs, averaged chroma)."""
    gray = img.ndim == 2
    if gray:
        img = np.stack([img, img, img], axis=2)
    h, w = img.shape[:2]
    ql, qc = quality_tables(quality)
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2] - 128.0
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    hs = vs = 2 if subsample else 1
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)

    def padded(p, ph, pw):
        out = np.empty((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    ypad = padded(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cbp = padded(cb, mcuy * vs * 8, mcux * hs * 8)
        crp = padded(cr, mcuy * vs * 8, mcux * hs * 8)
        cbs = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbs = padded(cb, mcuy * 8, mcux * 8)
        crs = padded(cr, mcuy * 8, mcux * 8)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    pred[0] = _encode_block(
                        bw, ypad[y0 : y0 + 8, x0 : x0 + 8], ql, dc_l, ac_l, pred[0]
                    )
            y0, x0 = my * 8, mx * 8
            pred[1] = _encode_block(
                bw, cbs[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c, pred[1]
            )
            pred[2] = _encode_block(
                bw, crs[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c, pred[2]
            )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(tbl[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + scan
        + b"\xff\xd9"
    )
