"""GIF codec — stdlib + numpy only, no PIL.

Extends the real-decoder set (BMP/PNG/WAV in ``codecs.py``, baseline
JPEG in ``jpeg.py``) with the one common ANIMATED raster container, so
video-style frame sampling has a REAL decode path (mp4 remains the
documented stub — its demux genuinely needs ffmpeg).

Scope: GIF87a/GIF89a, global and local color tables, interlaced and
non-interlaced frames, full LZW decompression (variable code width up
to 12 bits, clear/EOI handling, deferred clears), multi-frame
animations with disposal methods 0/1 (draw over) and 2
(restore-to-background) and per-frame transparency. Unsupported
corners (disposal 3 restore-to-previous) raise ``NotImplementedError``
naming the feature, same honesty contract as the other codecs.

The ENCODER exists for tests: it emits a spec-valid LZW stream using
the classic minimal strategy (a CLEAR code before every pixel code, so
the code width never grows) — maximally simple to write, and it
exercises the decoder's clear-handling on every single pixel.

Everything is per-row worker-side code invoked from Arrow-batched
``mapInPandas`` stages — no Spark imports.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# Hard cap on canvas/frame pixel counts from untrusted headers: 64M
# pixels = 192 MB RGB canvas, far above any real GIF, far below an
# executor-killing allocation.
MAX_PIXELS = 1 << 26


# -- LZW -------------------------------------------------------------------

class _BitReaderLSB:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0          # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("truncated LZW stream")
            bit = (self._d[byte] >> (self._pos & 7)) & 1
            out |= bit << i
            self._pos += 1
        return out


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: variable width starting at min+1 bits, dictionary
    codes up to 4095, CLEAR resets, EOI terminates. Returns exactly
    ``n_pixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReaderLSB(data)
    out = bytearray()

    def reset():
        return ({i: bytes([i]) for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return bytes(out[:n_pixels])


def lzw_encode_trivial(indices: bytes, min_code_size: int) -> bytes:
    """Spec-valid LZW with zero compression: CLEAR before every pixel
    code keeps the code width pinned at min+1 bits. ~2x the raw size —
    fine for fixtures, and it hammers the decoder's reset path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    bits: list[int] = []

    def emit(code: int):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    for px in indices:
        emit(px)
        emit(clear)
    emit(eoi)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << j
        out.append(b)
    return bytes(out)


# -- container parsing ------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(payload[pos:pos + n])
        pos += n
    return b"".join(chunks), pos


def gif_frames(payload: bytes, max_frames: int | None = None
               ) -> list[np.ndarray]:
    """Decode a (possibly animated) GIF into composed RGB frames.

    Each returned array is the full (h, w, 3) uint8 canvas AFTER the
    frame is drawn — i.e. what a viewer shows — honoring frame
    rectangles, transparency, and disposal 0/1 (leave) / 2 (restore to
    background). ``max_frames`` bounds work on long animations (the
    frame-sampling case: decode k, stop parsing)."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    # untrusted header dims drive np.zeros and the LZW output size — a
    # hostile 65535x65535 header would be a ~12.9 GB allocation whose
    # MemoryError aborts the whole stage; cap BEFORE allocating so bad
    # rows fail with the ValueError the sentinel-row path catches
    if w * h > MAX_PIXELS or w == 0 or h == 0:
        raise ValueError(f"GIF canvas {w}x{h} outside sane bounds "
                         f"(max {MAX_PIXELS} pixels)")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_idx % len(gct)]
    bg = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    pending_d3 = False
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:                                   # trailer
            break
        if b == 0x21:                                   # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:                           # graphic control
                blk, pos = _read_subblocks(payload, pos)
                flags = blk[0]
                disposal = (flags >> 2) & 7
                transparent = blk[3] if flags & 1 else None
            else:                                       # comment/app/text
                _, pos = _read_subblocks(payload, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block {b:#x}")
        if pending_d3:
            # the PREVIOUS frame asked for restore-to-previous and a
            # later frame now needs to composite over it — only here is
            # the unsupported method actually load-bearing (first/last
            # frame and beyond-max_frames decodes stay fine)
            raise NotImplementedError(
                "GIF disposal method 3 (restore to previous)")
        fl, ft, fw, fh, fp = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw * fh > MAX_PIXELS or fw == 0 or fh == 0:
            raise ValueError(f"GIF frame {fw}x{fh} outside sane bounds "
                             f"(max {MAX_PIXELS} pixels)")
        pal = gct
        if fp & 0x80:
            n = 2 << (fp & 7)
            pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(lzw_decode(data, min_code, fw * fh),
                            np.uint8).reshape(fh, fw)
        if fp & 0x40:
            idx = _deinterlace(idx)
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        region = canvas[ft:ft + fh, fl:fl + fw]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
        # disposal applies when COMPOSITING the next frame, so an
        # unsupported method only matters if a later frame arrives
        if disposal == 2:
            canvas[ft:ft + fh, fl:fl + fw] = bg[ft:ft + fh, fl:fl + fw]
        elif disposal == 3:
            pending_d3 = True
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first composed frame as (h, w, 3) uint8 RGB."""
    return gif_frames(payload, max_frames=1)[0]


def gif_feature(payload: bytes, meta: dict | None = None,
                dim: int = 8) -> list[float]:
    """Same 8-dim RGB descriptor as the BMP/PNG/JPEG paths."""
    from .codecs import _rgb_feature
    return _rgb_feature(decode_gif(payload), dim)


# -- encoder (fixtures) -----------------------------------------------------

def encode_gif(frames: "np.ndarray | list[np.ndarray]",
               transparent_last: bool = False) -> bytes:
    """Encode one frame or an animation. All frames must be (h, w, 3)
    uint8 with <= 256 distinct colors TOTAL (one global table). With
    ``transparent_last`` the last palette slot is declared transparent
    for frames 2+ wherever a pixel equals frame 1 (tests the
    transparency compositing path)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    max_colors = 255 if transparent_last else 256
    if len(colors) > max_colors:
        raise ValueError(
            f"fixture encoder supports <= {max_colors} colors "
            f"({'one slot reserved for transparency' if transparent_last else '8-bit table'})")
    lut = {tuple(c): i for i, c in enumerate(colors)}
    n_pal = 1
    while (1 << n_pal) < max(len(colors) + (1 if transparent_last else 0),
                             2):
        n_pal += 1
    pal = np.zeros((1 << n_pal, 3), np.uint8)
    pal[:len(colors)] = colors
    trans_idx = len(colors) if transparent_last else None
    min_code = max(n_pal, 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n_pal - 1), 0, 0)
    out += pal.tobytes()
    for fi, f in enumerate(frames):
        idx = np.array([[lut[tuple(px)] for px in row] for row in f],
                       dtype=np.uint8)
        if trans_idx is not None and fi > 0:
            same = np.all(f == frames[0], axis=-1)
            idx = np.where(same, np.uint8(trans_idx), idx)
        out += bytes([0x21, 0xF9, 4,
                      (1 if (trans_idx is not None and fi > 0) else 0),
                      0, 0, trans_idx or 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out += bytes([min_code])
        stream = lzw_encode_trivial(idx.tobytes(), min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
