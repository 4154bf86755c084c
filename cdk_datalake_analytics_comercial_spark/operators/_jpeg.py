"""JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

Closes the "entropy-coded image formats need native libs" gap for JPEG:
baseline sequential (SOF0/1) AND progressive (SOF2) DCT JPEGs — together
the overwhelming majority of stored images — are decodable with nothing
but bit twiddling and an 8×8 IDCT, both of which numpy does fine. The
decoder handles grayscale and YCbCr color, arbitrary sampling factors up
to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, multi-table DQT/DHT
segments, and for progressive streams the full spectral-selection +
successive-approximation scan model of T.81 Annex G (DC first/refine,
AC first with EOB runs, AC refinement with correction bits — the same
control structure as the public libjpeg ``jdphuff`` decoder).
Arithmetic-coded and 12-bit variants raise ``NotImplementedError`` with
the marker name — same honest-failure contract as the other codecs.

The encoders (baseline 4:4:4 or 4:2:0; progressive with a configurable
scan script and per-scan optimal Huffman tables built by the Annex-K
frequency-merge algorithm) exist so the codec is testable end to end
offline: round-trip PSNR bounds pin the pipeline, and because both
encoders quantize through the identical expression, a baseline and a
progressive encoding of the same image must decode to BIT-IDENTICAL
pixels — the strongest offline cross-check of the progressive path.
Structural self-checks on import verify the Huffman tables are complete
and canonical — a transcription typo fails fast, not as silently-wrong
bitstreams.

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

    def restart(self, n: int) -> None:
        """Pad to a byte boundary (1s per T.81) and emit RSTn. Appended
        directly: marker bytes are never 0xFF-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])


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
    """Decode a baseline or progressive JPEG to HxWx3 uint8 RGB
    (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTree] = {}  # (class, id)
    frame = None
    coefs: list[np.ndarray] | None = None  # progressive coefficient grids
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
            if frame is not None and frame.get("prog"):
                return _assemble(frame, coefs, qtables)
            break
        if pos + 2 > len(payload):
            raise EOFError("truncated JPEG stream")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) < seglen - 2:
            raise EOFError("truncated JPEG segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps, "prog": marker == 0xC2}
            if frame["prog"]:
                # per-component zigzag coefficient grids, sized for the
                # full interleaved MCU padding (non-interleaved scans only
                # touch the ceil(comp/8) prefix; the rest stays zero)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (lossless/arithmetic) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            order = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0xF)
                order.append(cid)
            if not frame.get("prog"):
                return _decode_scan(
                    payload, pos + seglen, frame, scan, qtables, htables, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            pos = _progressive_scan(
                payload, pos + seglen, frame, order, scan,
                ss, se, ah, al, htables, restart_interval, coefs,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("prog") and coefs is not None:
        return _assemble(frame, coefs, qtables)  # tolerate a missing EOI
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
    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _planes_to_rgb(planes, comps, hmax, vmax, h, w):
    """Upsample component planes to full resolution, crop, level shift,
    and convert Y/YCbCr to RGB (shared by the baseline and progressive
    decode paths so both produce bit-identical pixels from identical
    coefficients)."""
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
# progressive (SOF2) decoding — T.81 Annex G, libjpeg-jdphuff control flow


def _progressive_scan(data, pos, frame, order, scan, ss, se, ah, al,
                      htables, restart_interval, coefs):
    """Decode ONE progressive scan into the per-component zigzag
    coefficient grids; returns the payload offset at which marker parsing
    resumes. DC scans (Ss=0) may interleave several components in MCU
    order; AC scans are single-component in block-raster order over the
    component's own ceil(dim/8) grid (T.81 G.2)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    idx = {c["id"]: i for i, c in enumerate(comps)}
    sel = [idx[cid] for cid in order]
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    r = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = [0] * len(comps)

    def restart_check(n):
        if restart_interval and n and n % restart_interval == 0:
            m = r.align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got {m}")
            for i in range(len(pred)):
                pred[i] = 0
            state["eobrun"] = 0

    if ss == 0 and len(sel) > 1:  # interleaved DC scan
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart_check(n)
                n += 1
                for ci in sel:
                    c = comps[ci]
                    tree = htables[(0, scan[c["id"]][0])] if ah == 0 else None
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _dc_prog(r, blk, tree, pred, ci, ah, al)
    else:  # non-interleaved: one block per MCU over the component grid
        ci = sel[0]
        c = comps[ci]
        cw = -(-(w * c["h"]) // hmax)  # component sample dims (ceil)
        ch = -(-(h * c["v"]) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        tree = None
        if ss == 0:
            if ah == 0:
                tree = htables[(0, scan[c["id"]][0])]
        else:
            tree = htables[(1, scan[c["id"]][1])]
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                restart_check(n)
                n += 1
                blk = coefs[ci][by, bx]
                if ss == 0:
                    _dc_prog(r, blk, tree, pred, ci, ah, al)
                elif ah == 0:
                    _ac_first_dec(r, blk, tree, ss, se, al, state)
                else:
                    _ac_refine_dec(r, blk, tree, ss, se, al, state)
    # hand back the next-marker offset: if _fill tripped a marker the two
    # bytes before r.pos are 0xFF+marker (fill bytes are 0xFF too, so the
    # main loop's marker walk re-finds it either way)
    return r.pos - 2 if r.marker is not None else r.pos


def _dc_prog(r, blk, tree, pred, ci, ah, al):
    """DC coefficient, first pass (Huffman diff, point transform Al) or
    refinement pass (one raw bit ORed at position Al — two's-complement
    OR is correct for negative values, as in libjpeg)."""
    if ah == 0:
        size = tree.decode(r)
        diff = _extend(r.bits(size), size)
        pred[ci] += diff
        blk[0] = pred[ci] << al
    elif r.bit():
        blk[0] |= 1 << al


def _ac_first_dec(r, blk, tree, ss, se, al, state):
    """AC band [Ss,Se], first pass at approximation Al, with EOBn runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = tree.decode(r)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eob = 1 << run
            if run:
                eob += r.bits(run)
            state["eobrun"] = eob - 1  # this block is the first of the run
            break
        k += run
        if k > se:
            raise ValueError("AC coefficient past band end")
        blk[k] = _extend(r.bits(size), size) << al
        k += 1


def _ac_refine_dec(r, blk, tree, ss, se, al, state):
    """AC refinement pass: newly-significant coefficients arrive as ±1 at
    bit position Al; every already-nonzero coefficient passed on the way
    consumes one correction bit (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = tree.decode(r)
            run, size = rs >> 4, rs & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    eob = 1 << run
                    if run:
                        eob += r.bits(run)
                    state["eobrun"] = eob
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                if size != 1:
                    raise ValueError("refinement scan magnitude must be 1")
                newval = p1 if r.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.bit() and (int(blk[k]) & p1) == 0:
                        blk[k] = int(blk[k]) + (p1 if blk[k] >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # EOB run: correction bits only, rest of the band
            if blk[k] != 0:
                if r.bit() and (int(blk[k]) & p1) == 0:
                    blk[k] = int(blk[k]) + (p1 if blk[k] >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _assemble(frame, coefs, qtables):
    """Dequantize + IDCT the accumulated progressive coefficient grids.
    Uses the exact per-block expressions of the baseline path so a
    baseline and a progressive encoding of the same coefficients decode
    to bit-identical pixels."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        qt = qtables[c["q"]]
        grid = coefs[ci]
        nby, nbx = grid.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = grid[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct2(
                    (nat * qt).reshape(8, 8).astype(np.float64)
                )
        planes.append(plane)
    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


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


def _padded(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a plane to (ph, pw) by replicating the last row/column."""
    out = np.empty((ph, pw))
    out[: p.shape[0], : p.shape[1]] = p
    out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
    out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
    return out


def _prep_planes(img: np.ndarray, subsample: bool):
    """RGB→YCbCr, level shift, pad to MCU multiples, subsample chroma.
    Returns (h, w, hs, vs, mcux, mcuy, ypad, cbs, crs) — shared by the
    baseline and progressive encoders so both quantize identical data."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2] - 128.0
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    hs = vs = 2 if subsample else 1
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)

    ypad = _padded(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cbp = _padded(cb, mcuy * vs * 8, mcux * hs * 8)
        crp = _padded(cr, mcuy * vs * 8, mcux * hs * 8)
        cbs = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbs = _padded(cb, mcuy * 8, mcux * 8)
        crs = _padded(cr, mcuy * 8, mcux * 8)
    return h, w, hs, vs, mcux, mcuy, ypad, cbs, crs


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tid: int, tbl: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(tbl[ZIGZAG].astype(np.uint8)))


def _dht_seg(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _sof_seg(marker: int, h: int, w: int, hs: int, vs: int) -> bytes:
    return _seg(
        marker,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )


def _app0_seg() -> bytes:
    return _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) as baseline JFIF.
    ``subsample=True`` writes 4:2:0 (2×2 luma MCUs, averaged chroma)."""
    gray = img.ndim == 2
    if gray:
        img = np.stack([img, img, img], axis=2)
    ql, qc = quality_tables(quality)
    h, w, hs, vs, mcux, mcuy, ypad, cbs, crs = _prep_planes(img, subsample)

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

    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _app0_seg()
        + _dqt_seg(0, ql)
        + _dqt_seg(1, qc)
        + _sof_seg(0xC0, h, w, hs, vs)
        + _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + scan
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# progressive (SOF2) encoder: scan-scripted, per-scan optimal Huffman


# libjpeg's standard 10-scan YCbCr script: DC first at Al=1, AC bands at
# decreasing approximation, then the refinement chain down to Al=0.
# Entries are (component index or None for all-interleaved, Ss, Se, Ah, Al).
DEFAULT_PROGRESSIVE_SCANS: list[tuple[int | None, int, int, int, int]] = [
    (None, 0, 0, 0, 1),
    (0, 1, 5, 0, 2),
    (1, 1, 63, 0, 1),
    (2, 1, 63, 0, 1),
    (0, 6, 63, 0, 2),
    (0, 1, 63, 2, 1),
    (None, 0, 0, 1, 0),
    (1, 1, 63, 1, 0),
    (2, 1, 63, 1, 0),
    (0, 1, 63, 1, 0),
]


def _grid_coefs(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficient grid (nby, nbx, 64) for a padded
    plane. Uses the IDENTICAL expression as the baseline `_encode_block`
    so baseline and progressive encodings share bit-equal coefficients."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    g = np.zeros((nby, nbx, 64), dtype=np.int64)
    q8 = qt.reshape(8, 8)
    for by in range(nby):
        for bx in range(nbx):
            coef = np.round(
                dct2(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]) / q8
            ).astype(np.int64)
            g[by, bx] = coef.reshape(64)[ZIGZAG]
    return g


def _optimal_huffman(freq_in: list[int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited (≤16) Huffman table from symbol frequencies
    — the T.81 Annex K.2 / libjpeg ``jpeg_gen_optimal_table`` frequency-
    merge algorithm, including the reserved all-ones guard symbol."""
    freq = list(freq_in) + [0] * (257 - len(freq_in))
    freq[256] = 1  # guard: ensures no real symbol gets the all-ones code
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if freq[i] > 0 and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(257):
            if i != c1 and freq[i] > 0 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for length in range(32, 16, -1):  # limit code lengths to 16 bits
        while bits[length] > 0:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    length = 16
    while bits[length] == 0:
        length -= 1
    bits[length] -= 1  # drop the guard symbol's code
    vals = []
    for size in range(1, 33):
        for i in range(256):
            if codesize[i] == size:
                vals.append(i)
    return bits[1:17], vals


class _ScanEmitter:
    """Two-pass scan emitter: pass 1 (no writer) counts Huffman symbol
    frequencies; pass 2 writes codes and raw bits through a _BitWriter."""

    def __init__(self, codes=None, bw: _BitWriter | None = None) -> None:
        self.freq = [0] * 256
        self.codes = codes
        self.bw = bw

    def symbol(self, s: int) -> None:
        if self.bw is None:
            self.freq[s] += 1
        else:
            code, length = self.codes[s]
            self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n and self.bw is not None:
            self.bw.write(v & ((1 << n) - 1), n)

    def restart(self, n: int) -> None:
        if self.bw is not None:
            self.bw.restart(n)


def _flush_eobrun(em: _ScanEmitter, state: dict) -> None:
    """Emit the pending EOBn symbol (+ its extension bits) and any
    buffered AC-refinement correction bits that ride along with it."""
    n = state["eobrun"]
    if n > 0:
        nb = n.bit_length() - 1
        em.symbol(nb << 4)
        if nb:
            em.bits(n & ((1 << nb) - 1), nb)
    for b in state["bbuf"]:
        em.bits(b, 1)
    state["eobrun"] = 0
    state["bbuf"] = []


def _emit_dc(em, blk, pred, ci, ah, al) -> None:
    if ah == 0:
        v = int(blk[0]) >> al  # DC point transform: arithmetic shift
        diff = v - pred[ci]
        pred[ci] = v
        size = _bitsize(diff)
        em.symbol(size)
        if size:
            em.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
    else:
        em.bits((int(blk[0]) >> al) & 1, 1)


def _emit_ac_first(em, blk, ss, se, al, state) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al  # AC point transform truncates toward zero
        if t == 0:
            run += 1
            continue
        if v < 0:
            t = -t
        if state["eobrun"] > 0:
            _flush_eobrun(em, state)
        while run > 15:
            em.symbol(0xF0)
            run -= 16
        size = _bitsize(t)
        em.symbol((run << 4) | size)
        em.bits(t if t >= 0 else t + (1 << size) - 1, size)
        run = 0
    if run > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(em, state)


def _emit_ac_refine(em, blk, ss, se, al, state) -> None:
    """Mirror of `_ac_refine_dec` (libjpeg encode_mcu_AC_refine):
    newly-significant coefficients emit (run,1)+sign; already-significant
    ones buffer a correction bit that is appended to the next emitted
    symbol or rides with the pending EOB run."""
    absval = [0] * (se + 1)
    eobpos = ss - 1  # position of the LAST newly-significant coefficient
    for k in range(ss, se + 1):
        t = abs(int(blk[k])) >> al
        absval[k] = t
        if t == 1:
            eobpos = k
    run = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absval[k]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eobpos:
            _flush_eobrun(em, state)
            em.symbol(0xF0)
            run -= 16
            for b in br:
                em.bits(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _flush_eobrun(em, state)
        em.symbol((run << 4) | 1)
        em.bits(1 if int(blk[k]) > 0 else 0, 1)
        for b in br:
            em.bits(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["bbuf"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["bbuf"]) > 930:
            _flush_eobrun(em, state)


def _run_prog_scan(em, grids, comps, h, w, scan_def, restart_interval) -> None:
    """Drive one scan of the script through an emitter (shared by the
    frequency-counting and the code-writing pass so both see the exact
    same symbol stream)."""
    comp_sel, ss, se, ah, al = scan_def
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    state = {"eobrun": 0, "bbuf": []}
    pred = [0] * len(comps)
    sel = list(range(len(comps))) if comp_sel is None else [comp_sel]

    def maybe_restart(n):
        if restart_interval and n and n % restart_interval == 0:
            if ss != 0:
                _flush_eobrun(em, state)
            em.restart(n // restart_interval - 1)
            for i in range(len(pred)):
                pred[i] = 0

    if ss == 0 and len(sel) > 1:  # interleaved DC scan, MCU order
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n)
                n += 1
                for ci in sel:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = grids[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _emit_dc(em, blk, pred, ci, ah, al)
    else:  # non-interleaved: block raster over the component's own grid
        ci = sel[0]
        c = comps[ci]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(n)
                n += 1
                blk = grids[ci][by, bx]
                if ss == 0:
                    _emit_dc(em, blk, pred, ci, ah, al)
                elif ah == 0:
                    _emit_ac_first(em, blk, ss, se, al, state)
                else:
                    _emit_ac_refine(em, blk, ss, se, al, state)
        if ss != 0:
            _flush_eobrun(em, state)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    scans: list[tuple[int | None, int, int, int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) as a progressive (SOF2)
    JFIF stream. ``scans`` is a list of (comp|None, Ss, Se, Ah, Al)
    entries (default: libjpeg's standard 10-scan script); each scan gets
    its own optimal Huffman table, as progressive encoders require."""
    gray = img.ndim == 2
    if gray:
        img = np.stack([img, img, img], axis=2)
    ql, qc = quality_tables(quality)
    h, w, hs, vs, mcux, mcuy, ypad, cbs, crs = _prep_planes(img, subsample)
    grids = [_grid_coefs(ypad, ql), _grid_coefs(cbs, qc), _grid_coefs(crs, qc)]
    comps = [
        {"id": 1, "h": hs, "v": vs, "q": 0},
        {"id": 2, "h": 1, "v": 1, "q": 1},
        {"id": 3, "h": 1, "v": 1, "q": 1},
    ]

    out = bytearray(
        b"\xff\xd8"
        + _app0_seg()
        + _dqt_seg(0, ql)
        + _dqt_seg(1, qc)
        + _sof_seg(0xC2, h, w, hs, vs)
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for sd in scans if scans is not None else DEFAULT_PROGRESSIVE_SCANS:
        comp_sel, ss, se, ah, al = sd
        counter = _ScanEmitter()
        _run_prog_scan(counter, grids, comps, h, w, sd, restart_interval)
        codes = None
        if any(counter.freq):  # DC-refinement scans emit no symbols
            bits, vals = _optimal_huffman(counter.freq)
            out += _dht_seg(0 if ss == 0 else 1, 0, bits, vals)
            codes = _canonical_codes(bits, vals)
        bw = _BitWriter()
        _run_prog_scan(
            _ScanEmitter(codes=codes, bw=bw), grids, comps, h, w, sd, restart_interval
        )
        sel = list(range(len(comps))) if comp_sel is None else [comp_sel]
        body = bytes([len(sel)])
        for ci in sel:
            body += bytes([comps[ci]["id"], 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, body) + bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
