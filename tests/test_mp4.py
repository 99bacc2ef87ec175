"""ISO-BMFF parser/writer tests (operators/mp4.py) and the Spark-side
video_metadata operator.

The parser is tested against the module's own spec-shaped writer AND
against hand-packed boxes for the paths the writer doesn't emit (64-bit
largesize, co64, version-1 mvhd/mdhd), plus hostile-input bounds — the
same contract as gif.py's MAX_PIXELS caps: a crafted header must cost
O(cap), never O(claimed size).
"""

from __future__ import annotations

import struct

import pytest

from s3_redshift_backup_tool_spark.operators.mp4 import (
    MAX_BOXES, Mp4Info, TrackInfo, encode_mp4, iter_boxes,
    keyframe_byte_ranges, parse_mp4)


def _sizes(n, base=100):
    return [base + i % 7 for i in range(n)]


def test_roundtrip_video_only():
    b = encode_mp4(640, 360, _sizes(12), keyframe_every=3)
    info = parse_mp4(b)
    assert info.brand == "isom" and "mp42" in info.compatible
    assert info.timescale == 600
    assert info.duration_ms == 12 * 100 * 1000 // 600
    assert len(info.tracks) == 1
    v = info.tracks[0]
    assert (v.handler, v.codec) == ("vide", "avc1")
    assert (v.width, v.height) == (640, 360)
    assert v.n_samples == 12
    assert v.sync_samples == [1, 4, 7, 10]
    assert v.sample_sizes == _sizes(12)


def test_roundtrip_with_audio_track():
    b = encode_mp4(320, 240, _sizes(8), with_audio=True)
    info = parse_mp4(b)
    assert [t.handler for t in info.tracks] == ["vide", "soun"]
    assert info.tracks[1].codec == "mp4a"


def test_keyframe_byte_ranges_point_at_samples():
    sizes = _sizes(20)
    b = encode_mp4(64, 64, sizes, keyframe_every=5)
    v = parse_mp4(b).tracks[0]
    kf = keyframe_byte_ranges(v)
    assert [s for s, _o, _z in kf] == [1, 6, 11, 16]
    for s, off, size in kf:
        fill = ((s - 1) * 37 + 11) & 0xFF
        assert b[off] == fill and b[off + size - 1] == fill
        assert size == sizes[s - 1]
    # relative offsets = sum of preceding sample sizes (single chunk)
    assert kf[1][1] - kf[0][1] == sum(sizes[:5])


def test_keyframe_limit_caps_output():
    b = encode_mp4(32, 32, _sizes(40), keyframe_every=1)
    v = parse_mp4(b).tracks[0]
    assert len(keyframe_byte_ranges(v, limit=7)) == 7


def test_not_bmff_rejected():
    with pytest.raises(ValueError):
        parse_mp4(b"RIFF....WAVEfmt ")
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 4)


def test_box_size_escaping_extent_rejected():
    good = encode_mp4(32, 32, _sizes(4))
    bad = bytearray(good)
    # claim the moov box is 100 MB: must raise, not allocate/scan
    moov_at = good.index(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, 100 * 1024 * 1024)
    with pytest.raises(ValueError, match="escapes extent"):
        parse_mp4(bytes(bad))


def test_truncated_payload_rejected_or_partial():
    good = encode_mp4(32, 32, _sizes(4))
    with pytest.raises(ValueError):
        parse_mp4(good[: len(good) // 2])


def test_box_count_bomb_bounded():
    # ftyp + MAX_BOXES+ empty 'free' boxes: must stop at the cap
    blob = bytearray(struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00")
    blob += (struct.pack(">I", 8) + b"free") * (MAX_BOXES + 10)
    with pytest.raises(ValueError, match="MAX_BOXES"):
        parse_mp4(bytes(blob))


def test_largesize_and_co64_and_v1_headers():
    """Hand-packed paths the minimal writer doesn't emit."""
    # 64-bit largesize box wrapping: size field == 1 + uint64 size
    body = b"isom" + struct.pack(">I", 0) + b"isom"
    ftyp64 = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(body)) + body
    # mvhd version 1: 64-bit times, timescale at +16, duration u64 at +20
    mvhd1 = (struct.pack(">I", 8 + 4 + 28) + b"mvhd"
             + struct.pack(">I", 1 << 24)        # version 1
             + struct.pack(">QQ", 0, 0)          # ctime, mtime
             + struct.pack(">I", 1000)           # timescale
             + struct.pack(">Q", 2500))          # duration -> 2500 ms
    moov = struct.pack(">I", 8 + len(mvhd1)) + b"moov" + mvhd1
    info = parse_mp4(ftyp64 + moov)
    assert info.brand == "isom"
    assert info.timescale == 1000 and info.duration_ms == 2500
    # co64 chunk offsets parse as 64-bit
    tr = TrackInfo(sample_sizes=[10, 20], n_samples=2,
                   chunk_offsets=[1 << 33], stsc=[(1, 2)],
                   sync_samples=[2])
    assert keyframe_byte_ranges(tr) == [(2, (1 << 33) + 10, 20)]


def test_multi_chunk_offsets():
    """stsc runs spanning several chunks resolve correct per-sample
    offsets (2 samples in chunk 1, then 1 per chunk)."""
    tr = TrackInfo(sample_sizes=[5, 7, 11, 13], n_samples=4,
                   chunk_offsets=[100, 200, 300],
                   stsc=[(1, 2), (2, 1)],
                   sync_samples=[1, 2, 3, 4])
    kf = keyframe_byte_ranges(tr)
    assert kf == [(1, 100, 5), (2, 105, 7), (3, 200, 11), (4, 300, 13)]


def test_video_metadata_operator_null_sentinel(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, video_metadata)
    good = encode_mp4(48, 32, _sizes(6))
    rows = [(1, bytearray(good)), (2, bytearray(b"not a video")), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="video",
                         fmt="mp4")
    out = {r["media_id"]: r for r in video_metadata(media).collect()}
    assert out[1]["video_codec"] == "avc1"
    assert out[1]["width"] == 48 and out[1]["height"] == 32
    assert out[1]["n_keyframes"] == 2
    assert len(out[1]["keyframe_offsets"]) == 2
    assert out[2]["brand"] is None and out[2]["n_bytes"] == 11
    assert out[3]["brand"] is None and out[3]["n_bytes"] == 0


def test_synth_corpus_matches_parser(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        synth_mp4_corpus, video_metadata)
    docs = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    out = video_metadata(synth_mp4_corpus(docs)).collect()
    assert len(out) == 16
    for r in out:
        d = r["media_id"]
        assert r["width"] == 16 * (1 + d % 8)
        assert r["n_samples"] == 8 + d % 24
        assert r["audio_codec"] == ("mp4a" if d % 2 == 1 else None)


def test_sample_keyframes_slices_and_sentinel(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, sample_keyframes)
    good = encode_mp4(32, 32, _sizes(10), keyframe_every=4)
    rows = [(1, bytearray(good)), (2, bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="video",
                         fmt="mp4")
    out = sample_keyframes(media).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["sample_no"] for r in sorted(by_id[1],
                                           key=lambda r: r["sample_no"])] \
        == [1, 5, 9]
    for r in by_id[1]:
        fill = ((r["sample_no"] - 1) * 37 + 11) & 0xFF
        assert bytes(r["frame_bytes"])[0] == fill
        assert len(r["frame_bytes"]) == _sizes(10)[r["sample_no"] - 1]
        assert bytes(good)[r["byte_offset"]] == fill
    assert by_id[2][0]["sample_no"] == -1          # corrupt sentinel
    assert by_id[2][0]["frame_bytes"] is None
