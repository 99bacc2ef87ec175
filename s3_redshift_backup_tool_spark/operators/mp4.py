"""ISO-BMFF (MP4) metadata extraction — from-scratch, stdlib-only.

The reference pipelines treat video as opaque blobs (its multimodal
tables carry mp4 payloads it never opens); this engine's round-7 position
was an honest "needs ffmpeg" stub. This module closes the seam the way a
manifest/audit pipeline actually needs it closed WITHOUT a codec: the
ISO base-media container (ISO/IEC 14496-12, a public spec) is a plain
length-prefixed box tree, so brand, timescale/duration, per-track codec
fourcc, video dimensions, sample counts, and — the part that matters for
distributed frame extraction — KEYFRAME BYTE RANGES (stss x stsc x stsz
x stco join) are all readable with struct.unpack. Frame DECODE still
requires a codec library and still raises NotImplementedError; a
production deploy hands the byte ranges this module computes to its
ffmpeg workers so each executor seeks straight to a sync sample instead
of demuxing the whole file.

Everything is bounded against hostile headers (box count, recursion
depth, sample-table sizes are all capped — same contract as gif.py's
MAX_PIXELS) and per-row worker-side (invoked from Arrow-batched
mapInPandas in operators/multimodal.py style); no Spark imports here.

A minimal writer (``encode_mp4``) produces real, spec-shaped fixtures
(ftyp + moov[mvhd, trak[tkhd, mdia[mdhd, hdlr, minf.stbl[stsd, stts,
stss, stsc, stsz, stco]]]] + mdat) so the parser is tested against the
actual binary layout, not a mock.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

#: hostile-header caps (cf. gif.py MAX_PIXELS): a crafted size field must
#: cost O(cap), never O(claimed size)
MAX_BOXES = 10_000
MAX_DEPTH = 16
MAX_SAMPLES = 1_000_000
MAX_KEYFRAMES_OUT = 64

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@dataclass
class TrackInfo:
    track_id: int = 0
    handler: str | None = None        # 'vide' | 'soun' | ...
    codec: str | None = None          # sample-entry fourcc: avc1, mp4a, ...
    width: int | None = None
    height: int | None = None
    timescale: int | None = None
    duration_ms: int | None = None
    n_samples: int = 0
    sample_sizes: list[int] = field(default_factory=list)
    sync_samples: list[int] = field(default_factory=list)   # 1-based
    chunk_offsets: list[int] = field(default_factory=list)
    stsc: list[tuple[int, int]] = field(default_factory=list)  # (first_chunk, per_chunk)


@dataclass
class Mp4Info:
    brand: str | None = None
    compatible: list[str] = field(default_factory=list)
    timescale: int | None = None
    duration_ms: int | None = None
    tracks: list[TrackInfo] = field(default_factory=list)


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def _u64(b: bytes, o: int) -> int:
    return struct.unpack_from(">Q", b, o)[0]


def iter_boxes(buf: bytes, start: int, end: int, *, _count: list[int],
               depth: int = 0):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Bounded: raises ValueError past MAX_BOXES/MAX_DEPTH or on a size
    field that escapes the enclosing extent (truncated/hostile file)."""
    if depth > MAX_DEPTH:
        raise ValueError("box nesting exceeds MAX_DEPTH")
    off = start
    while off + 8 <= end:
        _count[0] += 1
        if _count[0] > MAX_BOXES:
            raise ValueError("box count exceeds MAX_BOXES")
        size = _u32(buf, off)
        btype = buf[off + 4: off + 8]
        body = off + 8
        if size == 1:                       # 64-bit largesize
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            size = _u64(buf, body)
            body += 8
        elif size == 0:                     # box extends to end of extent
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"box {btype!r} size {size} escapes extent")
        yield btype, body, off + size
        off += size


def _parse_full(buf: bytes, o: int) -> tuple[int, int]:
    """FullBox header -> (version, body offset after version/flags)."""
    return buf[o], o + 4


def _parse_stsd(buf: bytes, body: int, end: int, tr: TrackInfo) -> None:
    _v, o = _parse_full(buf, body)
    n = _u32(buf, o)
    o += 4
    if n < 1 or o + 8 > end:
        return
    # first sample entry: uint32 size + fourcc, then codec-specific bytes
    entry_size = _u32(buf, o)
    tr.codec = buf[o + 4: o + 8].decode("ascii", "replace")
    if tr.handler == "vide" and o + 8 + 28 + 4 <= min(o + entry_size, end):
        # VisualSampleEntry: 6 reserved + 2 data_ref, 16 pre-defined/rsvd,
        # then width/height uint16 at offset 24 from entry body start
        eb = o + 8
        tr.width = struct.unpack_from(">H", buf, eb + 24)[0]
        tr.height = struct.unpack_from(">H", buf, eb + 26)[0]


def _parse_track_leaves(buf: bytes, body: int, end: int, tr: TrackInfo,
                        count: list[int], depth: int) -> None:
    for btype, b, e in iter_boxes(buf, body, end, _count=count, depth=depth):
        if btype in _CONTAINERS:
            _parse_track_leaves(buf, b, e, tr, count, depth + 1)
        elif btype == b"tkhd":
            v, o = _parse_full(buf, b)
            tr.track_id = _u32(buf, o + (8 if v == 0 else 16))
        elif btype == b"mdhd":
            v, o = _parse_full(buf, b)
            if v == 1:
                tr.timescale = _u32(buf, o + 16)
                dur = _u64(buf, o + 20)
            else:
                tr.timescale = _u32(buf, o + 8)
                dur = _u32(buf, o + 12)
            if tr.timescale:
                tr.duration_ms = dur * 1000 // tr.timescale
        elif btype == b"hdlr":
            _v, o = _parse_full(buf, b)
            tr.handler = buf[o + 4: o + 8].decode("ascii", "replace")
        elif btype == b"stsd":
            _parse_stsd(buf, b, e, tr)
        elif btype == b"stsz":
            _v, o = _parse_full(buf, b)
            fixed = _u32(buf, o)
            n = _u32(buf, o + 4)
            if n > MAX_SAMPLES:
                raise ValueError("stsz sample count exceeds MAX_SAMPLES")
            tr.n_samples = n
            if fixed:
                tr.sample_sizes = [fixed] * n
            else:
                tr.sample_sizes = [
                    _u32(buf, o + 8 + 4 * i)
                    for i in range(min(n, (e - o - 8) // 4))]
        elif btype == b"stss":
            _v, o = _parse_full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("stss entry count exceeds MAX_SAMPLES")
            tr.sync_samples = [
                _u32(buf, o + 4 + 4 * i)
                for i in range(min(n, (e - o - 4) // 4))]
        elif btype == b"stsc":
            _v, o = _parse_full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("stsc entry count exceeds MAX_SAMPLES")
            tr.stsc = [
                (_u32(buf, o + 4 + 12 * i), _u32(buf, o + 8 + 12 * i))
                for i in range(min(n, (e - o - 4) // 12))]
        elif btype in (b"stco", b"co64"):
            _v, o = _parse_full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("chunk count exceeds MAX_SAMPLES")
            wide = btype == b"co64"
            step, rd = (8, _u64) if wide else (4, _u32)
            tr.chunk_offsets = [
                rd(buf, o + 4 + step * i)
                for i in range(min(n, (e - o - 4) // step))]


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse an ISO-BMFF payload into container/track metadata. Raises
    ValueError on non-BMFF or structurally hostile input (the NULL-row
    sentinel contract is applied by the Spark-side caller)."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")
    info = Mp4Info()
    count = [0]
    for btype, b, e in iter_boxes(buf, 0, len(buf), _count=count):
        if btype == b"ftyp":
            info.brand = buf[b: b + 4].decode("ascii", "replace")
            info.compatible = [
                buf[o: o + 4].decode("ascii", "replace")
                for o in range(b + 8, e, 4)]
        elif btype == b"moov":
            for t2, b2, e2 in iter_boxes(buf, b, e, _count=count, depth=1):
                if t2 == b"mvhd":
                    v, o = _parse_full(buf, b2)
                    if v == 1:
                        info.timescale = _u32(buf, o + 16)
                        dur = _u64(buf, o + 20)
                    else:
                        info.timescale = _u32(buf, o + 8)
                        dur = _u32(buf, o + 12)
                    if info.timescale:
                        info.duration_ms = dur * 1000 // info.timescale
                elif t2 == b"trak":
                    tr = TrackInfo()
                    _parse_track_leaves(buf, b2, e2, tr, count, 2)
                    info.tracks.append(tr)
    return info


def keyframe_byte_ranges(tr: TrackInfo,
                         limit: int = MAX_KEYFRAMES_OUT
                         ) -> list[tuple[int, int, int]]:
    """(sample_number, byte_offset, byte_size) for each sync sample —
    the stss x stsc x stco x stsz join. This is what lets a 1000-executor
    frame-extraction job seek straight to keyframes instead of demuxing
    100 TB of mdat through one reader. Offsets are absolute file offsets
    exactly as stco records them."""
    if not tr.chunk_offsets or not tr.sample_sizes:
        return []
    # expand stsc runs -> samples-per-chunk per chunk index (1-based)
    n_chunks = len(tr.chunk_offsets)
    per_chunk = [0] * n_chunks
    runs = tr.stsc or [(1, tr.n_samples or len(tr.sample_sizes))]
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        for c in range(first, min(last, n_chunks) + 1):
            per_chunk[c - 1] = spc
    # sample number -> (chunk, index within chunk), then offset
    out: list[tuple[int, int, int]] = []
    sync = tr.sync_samples or list(range(1, len(tr.sample_sizes) + 1))
    sync_set = sorted(s for s in sync if 1 <= s <= len(tr.sample_sizes))
    sample = 1
    for c in range(n_chunks):
        base = tr.chunk_offsets[c]
        off = base
        for _ in range(per_chunk[c]):
            if sample > len(tr.sample_sizes):
                break
            size = tr.sample_sizes[sample - 1]
            if sync_set and sync_set[0] == sample:
                out.append((sample, off, size))
                sync_set.pop(0)
                if len(out) >= limit:
                    return out
            off += size
            sample += 1
    return out


# -- minimal writer (real binary layout for fixtures) ----------------------

def _box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, *parts: bytes) -> bytes:
    return _box(btype, struct.pack(">I", version << 24), *parts)


def encode_mp4(width: int, height: int, sample_sizes: list[int],
               keyframe_every: int = 4, timescale: int = 600,
               sample_duration: int = 100,
               with_audio: bool = False) -> bytes:
    """Write a minimal, structurally-valid ISO-BMFF file: one video track
    (avc1 sample entry WITHOUT codec config — metadata fixture, not a
    playable stream; the samples are deterministic filler bytes), plus an
    optional empty audio (mp4a) track. Single chunk per track, contiguous
    mdat. Spec-shaped enough that any demuxer's box walker reads the same
    numbers this module's parser does."""
    n = len(sample_sizes)
    dur = n * sample_duration
    keyframes = list(range(1, n + 1, max(1, keyframe_every)))

    def visual_entry() -> bytes:
        return _box(b"avc1",
                    b"\x00" * 6 + struct.pack(">H", 1),       # data_ref=1
                    b"\x00" * 16,
                    struct.pack(">HH", width, height),
                    struct.pack(">II", 0x480000, 0x480000),   # 72 dpi
                    b"\x00" * 4, struct.pack(">H", 1),        # frame_count
                    b"\x00" * 32,
                    struct.pack(">Hh", 24, -1))               # depth, -1

    def audio_entry() -> bytes:
        return _box(b"mp4a",
                    b"\x00" * 6 + struct.pack(">H", 1),
                    b"\x00" * 8,
                    struct.pack(">HH", 2, 16),                # channels, bits
                    b"\x00" * 4,
                    struct.pack(">I", 16000 << 16))           # sample rate

    def stbl(entry: bytes, sizes: list[int], syncs: list[int],
             chunk_off_placeholder: int) -> bytes:
        stsd = _full(b"stsd", 0, struct.pack(">I", 1), entry)
        stts = _full(b"stts", 0, struct.pack(">III", 1, len(sizes),
                                             sample_duration))
        stss = _full(b"stss", 0, struct.pack(">I", len(syncs)),
                     b"".join(struct.pack(">I", s) for s in syncs))
        stsc = _full(b"stsc", 0, struct.pack(">I", 1),
                     struct.pack(">III", 1, len(sizes), 1))
        stsz = _full(b"stsz", 0, struct.pack(">II", 0, len(sizes)),
                     b"".join(struct.pack(">I", s) for s in sizes))
        stco = _full(b"stco", 0, struct.pack(">I", 1),
                     struct.pack(">I", chunk_off_placeholder))
        return _box(b"stbl", stsd, stts, *([stss] if syncs else []),
                    stsc, stsz, stco)

    def trak(track_id: int, handler: bytes, entry: bytes,
             sizes: list[int], syncs: list[int], chunk_off: int) -> bytes:
        tkhd = _full(b"tkhd", 0, struct.pack(">II", 0, 0),
                     struct.pack(">I", track_id), b"\x00" * 4,
                     struct.pack(">I", dur), b"\x00" * 52,
                     struct.pack(">II", width << 16, height << 16))
        mdhd = _full(b"mdhd", 0, struct.pack(">II", 0, 0),
                     struct.pack(">II", timescale, dur),
                     struct.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, b"\x00" * 4, handler, b"\x00" * 12,
                     b"h\x00")
        minf = _box(b"minf", stbl(entry, sizes, syncs, chunk_off))
        return _box(b"trak", tkhd, _box(b"mdia", mdhd, hdlr, minf))

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"mp42")
    mvhd = _full(b"mvhd", 0, struct.pack(">II", 0, 0),
                 struct.pack(">II", timescale, dur), b"\x00" * 80)

    def build(video_off: int, audio_off: int) -> bytes:
        traks = [trak(1, b"vide", visual_entry(), sample_sizes, keyframes,
                      video_off)]
        if with_audio:
            traks.append(trak(2, b"soun", audio_entry(), [8], [],
                              audio_off))
        return _box(b"moov", mvhd, *traks)

    # two-pass: moov size depends only on entry counts, not offsets
    probe = build(0, 0)
    mdat_data = len(ftyp) + len(probe) + 8           # after mdat header
    video_bytes = sum(sample_sizes)
    moov = build(mdat_data, mdat_data + video_bytes)
    assert len(moov) == len(probe)
    payload = bytearray()
    for i, s in enumerate(sample_sizes):
        payload += bytes([(i * 37 + 11) & 0xFF]) * s
    if with_audio:
        payload += b"\xAA" * 8
    return ftyp + moov + _box(b"mdat", bytes(payload))
