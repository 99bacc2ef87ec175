"""Multimodal plumbing: payload columns, decode/feature/resize/frame
stages (Arrow-batched mapInPandas; kernels stubbed deterministically)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.multimodal import (
    DecoderRegistry, attach_media, extract_features, payload_stats,
    resize_images, sample_frames)


@pytest.fixture(scope="module")
def media(documents):
    return attach_media(documents.limit(50), "text", "doc_id",
                        media_type="image", fmt="raw")


def test_attach_and_stats(media):
    row = payload_stats(media).first()
    assert row["media_type"] == "image"
    assert row["n_items"] == 50 and row["total_bytes"] > 0


def test_extract_features_deterministic(media):
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(media).orderBy("media_id").collect()
    assert a == b
    assert len(a[0]["feature"]) == 8
    assert abs(sum(a[0]["feature"]) - 1.0) < 1e-6   # normalized histogram


def test_unregistered_media_type_raises(spark, documents):
    DecoderRegistry._decoders.pop("pdf", None)
    bad = attach_media(documents.limit(1), "text", "doc_id", media_type="pdf")
    with pytest.raises(Exception, match="no decoder registered"):
        extract_features(bad).collect()


def test_resize_updates_payload_and_meta(media):
    out = resize_images(media, 16, 4).collect()
    assert all(len(r["payload"]) == 64 for r in out)
    assert all(r["meta"]["width"] == 16 and r["meta"]["height"] == 4
               for r in out)


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    agg = (frames.groupBy("media_id")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("frame_idx").alias("max_idx")).collect())
    assert len(agg) == 50
    assert all(1 <= r["n"] <= 4 and r["max_idx"] == r["n"] - 1 for r in agg)
    row = frames.first()
    assert isinstance(row["frame"], (bytes, bytearray)) and len(row["frame"]) <= 64


# -- real codecs (BMP / WAV, stdlib+numpy) ---------------------------------

def test_bmp_roundtrip_exact():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_bmp, encode_bmp)
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd width: padding path
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_feature_matches_numpy():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        bmp_feature, encode_bmp)
    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    f = bmp_feature(encode_bmp(px))
    assert f[0] == 8.0 and f[1] == 4.0          # w, h
    assert f[2] == 1.0 and f[3] == 0.0 and f[4] == 0.0  # channel means
    assert f[7] == 2.0                          # aspect ratio


def test_bmp_resize_nearest_neighbor():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        bmp_resize, decode_bmp, encode_bmp)
    # 2x2 checkerboard upscaled 2x: each pixel becomes a 2x2 block
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    big = decode_bmp(bmp_resize(encode_bmp(px), 4, 4))
    assert big.shape == (4, 4, 3)
    assert np.array_equal(big[0, 0], [255, 0, 0])
    assert np.array_equal(big[0, 3], [0, 255, 0])
    assert np.array_equal(big[3, 0], [0, 0, 255])
    assert np.array_equal(big[1, 1], [255, 0, 0])  # block fill


def test_wav_features_physical():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        encode_wav, wav_feature)
    sr, f_hz = 16000, 440.0
    t = np.arange(sr) / sr                      # 1 second
    x = 0.5 * np.sin(2 * np.pi * f_hz * t)
    f = wav_feature(encode_wav(x, sr))
    assert abs(f[0] - 1.0) < 1e-3               # duration
    assert abs(f[1] - 0.5 / 2 ** 0.5) < 1e-2    # rms of sine = A/sqrt(2)
    assert abs(f[2] - 2 * f_hz / sr) < 1e-3     # zero-crossing rate
    assert abs(f[3] - 0.5) < 1e-2               # peak
    assert f[5] > 0.99                          # 440 Hz lives in the low band


def test_real_decoders_ride_the_arrow_path(spark):
    """extract_features dispatches by (media_type, format): BMP payloads
    get REAL decoded features through the same mapInPandas stage."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_bmp
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, extract_features)

    rows = []
    for i in range(6):
        px = np.full((2, 4, 3), i * 40, dtype=np.uint8)
        rows.append((i, bytearray(encode_bmp(px))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    media = attach_media(df, "content", "doc_id", media_type="image",
                         fmt="bmp")
    out = {r["media_id"]: r["feature"]
           for r in extract_features(media).collect()}
    assert len(out) == 6
    for i, feat in out.items():
        assert feat[0] == 4.0 and feat[1] == 2.0     # real w, h
        expect = (i * 40) / 255.0
        assert abs(feat[2] - expect) < 1e-6          # real channel mean


def test_unknown_format_falls_back_to_registered_type(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        DecoderRegistry, deterministic_fake)
    # webp has no format-specific decoder -> media_type fallback (stub)
    # (jpeg graduated to a real kernel in round 4, gif in round 5)
    f = DecoderRegistry.decode("image", b"\x01\x02\x03",
                               {"format": "webp"})
    assert f == deterministic_fake(b"\x01\x02\x03", {})


def test_resize_images_uses_real_bmp_kernel(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_bmp, encode_bmp)
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, resize_images)

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = [200, 10, 30]
    df = spark.createDataFrame([(1, bytearray(encode_bmp(px)))],
                               "doc_id long, content binary")
    media = attach_media(df, "content", "doc_id", fmt="bmp")
    row = resize_images(media, 4, 4).first()
    out = decode_bmp(bytes(row["payload"]))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[0, 0], [200, 10, 30])
    assert row["meta"]["width"] == 4 and row["meta"]["height"] == 4


def test_wav_decoder_rides_the_arrow_path(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_wav
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, extract_features)

    sr = 8000
    t = np.arange(sr // 2) / sr                 # 0.5 s sine per row
    rows = [(i, bytearray(encode_wav(0.1 * (i + 1) * np.sin(2 * np.pi * 100 * t), sr)))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    media = attach_media(df, "content", "doc_id", media_type="audio",
                         fmt="wav")
    out = {r["media_id"]: r["feature"]
           for r in extract_features(media).collect()}
    assert len(out) == 4
    for i, feat in out.items():
        assert abs(feat[0] - 0.5) < 1e-3                       # duration
        amp = 0.1 * (i + 1)
        assert abs(feat[1] - amp / 2 ** 0.5) < 1e-2            # rms scales


# -- PNG (stdlib zlib codec) ------------------------------------------------

def test_png_roundtrip_exact():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_png, encode_png)
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def _png_with_filters(px, filters):
    """Hand-build a PNG applying a given filter type per scanline, so the
    decoder's unfilter path is exercised against spec-forward filtering."""
    import struct
    import zlib

    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        _paeth, _png_chunk, _PNG_SIG)
    h, w, _ = px.shape
    bpp, stride = 3, w * 3
    flat = px.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    for y, ftype in zip(range(h), filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        line = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                line[x] = cur[x]
            elif ftype == 1:
                line[x] = cur[x] - a
            elif ftype == 2:
                line[x] = cur[x] - b
            elif ftype == 3:
                line[x] = cur[x] - (a + b) // 2
            elif ftype == 4:
                line[x] = cur[x] - _paeth(a, b, c)
        raw += bytes([ftype]) + bytes((line & 0xFF).astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_decode_reverses_all_five_filters():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import decode_png
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    got = decode_png(_png_with_filters(px, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, px)


def test_png_gray_and_rgba_color_types():
    import struct
    import zlib

    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_png, _png_chunk, _PNG_SIG)

    def build(ctype, channels, body_px):
        h, w = body_px.shape[:2]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + body_px[y].tobytes() for y in range(h))
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b""))

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    out = decode_png(build(0, 1, gray))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray[:, :, 0])
    assert np.array_equal(out[:, :, 1], gray[:, :, 0])

    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 0] = 200
    rgba[..., 3] = 7  # alpha must be dropped, not blended
    out = decode_png(build(6, 4, rgba))
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[..., 0], np.full((2, 2), 200))
    assert np.array_equal(out[..., 1], np.zeros((2, 2)))


def test_png_interlaced_rejected():
    import struct
    import zlib

    import numpy as np
    import pytest
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_png, _png_chunk, _PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_png_feature_matches_bmp_feature():
    """Same pixels through either container must land on the same point
    in feature space — the descriptor is format-independent."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        bmp_feature, encode_bmp, encode_png, png_feature)
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert png_feature(encode_png(px)) == bmp_feature(encode_bmp(px))


def test_png_resize_nearest_neighbor():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_png, encode_png, png_resize)
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    big = decode_png(png_resize(encode_png(px), 4, 4))
    assert big.shape == (4, 4, 3)
    assert np.array_equal(big[0, 0], [255, 0, 0])
    assert np.array_equal(big[3, 3], [255, 255, 255])


def test_png_decoder_rides_the_arrow_path(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_png
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, extract_features)
    rows = []
    for i in range(4):
        px = np.full((3, 5, 3), i * 60, dtype=np.uint8)
        rows.append((i, bytearray(encode_png(px))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    media = attach_media(df, "content", "doc_id", media_type="image",
                         fmt="png")
    out = {r["media_id"]: r["feature"]
           for r in extract_features(media).collect()}
    assert len(out) == 4
    for i, feat in out.items():
        assert feat[0] == 5.0 and feat[1] == 3.0
        assert abs(feat[2] - (i * 60) / 255.0) < 1e-6


def test_resize_images_uses_real_png_kernel(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        decode_png, encode_png)
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, resize_images)
    px = np.full((8, 8, 3), 99, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_png(px)))],
                               "doc_id long, content binary")
    media = attach_media(df, "content", "doc_id", media_type="image",
                         fmt="png")
    row = resize_images(media, 4, 2).collect()[0]
    out = decode_png(bytes(row["payload"]))
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out, np.full((2, 4, 3), 99, dtype=np.uint8))
    assert row["meta"]["width"] == 4 and row["meta"]["height"] == 2


# ------------------------------------------------------------------ JPEG

def test_jpeg_roundtrip_close():
    """Lossy but close: a smooth image survives encode->decode within
    JPEG's usual error envelope, at non-multiple-of-8 dimensions."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg)
    y, x = np.mgrid[0:37, 0:53]
    img = np.stack([40 + y * 2, 60 + x * 2, 80 + (x + y)],
                   axis=-1).clip(0, 255).astype(np.uint8)
    blob = encode_jpeg(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    back = decode_jpeg(blob)
    assert back.shape == img.shape and back.dtype == np.uint8
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 40


def test_jpeg_survives_noise_and_byte_stuffing():
    """Random noise maximizes entropy-coded data (exercises the 0xFF
    stuffing path on both sides); decode must reproduce dimensions and
    stay broadly faithful (noise is JPEG's worst case, so only a loose
    error bound holds)."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    blob = encode_jpeg(img)
    back = decode_jpeg(blob)
    assert back.shape == img.shape
    # quantization of noise is coarse; just require correlation, not
    # closeness: decoded luma must track input luma
    lum_in = img.mean(axis=-1).ravel()
    lum_out = back.astype(float).mean(axis=-1).ravel()
    assert np.corrcoef(lum_in, lum_out)[0, 1] > 0.8


def test_jpeg_unsupported_profiles_named():
    import numpy as np
    import pytest
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg)
    img = np.zeros((8, 8, 3), np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2                       # pretend progressive
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_feature_and_resize():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import (
        bmp_feature, encode_bmp)
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, jpeg_feature, jpeg_resize)
    y, x = np.mgrid[0:32, 0:32]
    img = np.stack([y * 4, x * 4, (x + y) * 2], axis=-1) \
        .clip(0, 255).astype(np.uint8)
    feat = jpeg_feature(encode_jpeg(img))
    ref = bmp_feature(encode_bmp(img))
    assert len(feat) == len(ref) == 8
    assert feat[0] == ref[0] and feat[1] == ref[1]       # exact w/h
    for a, b in zip(feat[2:], ref[2:]):                  # lossy channels
        assert abs(a - b) < 0.05
    small = decode_jpeg(jpeg_resize(encode_jpeg(img), 16, 8))
    assert small.shape == (8, 16, 3)


def test_jpeg_registered_in_decoder_registry():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import encode_jpeg
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        DecoderRegistry)
    img = np.full((16, 16, 3), 128, np.uint8)
    feat = DecoderRegistry.decode("image", encode_jpeg(img),
                                  {"format": "jpeg"})
    assert len(feat) == 8 and feat[0] == 16.0 and feat[1] == 16.0


def test_jpeg_grayscale_single_component():
    """(h, w) input -> 1-component file; decoder replicates to RGB."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg)
    y, x = np.mgrid[0:24, 0:17]
    gray = (30 + 4 * y + 2 * x).clip(0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(gray))
    assert back.shape == (24, 17, 3)
    assert np.array_equal(back[..., 0], back[..., 1])
    err = np.abs(back[..., 0].astype(int) - gray.astype(int))
    assert err.mean() < 3.0


def test_jpeg_tiny_images_pad_and_crop():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg)
    for shape in ((1, 1, 3), (3, 9, 3), (8, 1, 3)):
        img = np.full(shape, 77, np.uint8)
        back = decode_jpeg(encode_jpeg(img))
        assert back.shape == shape
        assert abs(int(back.mean()) - 77) < 6     # flat field survives


# -- progressive-JPEG dispatch (PIL-gated) ----------------------------------

def _progressive_jpeg_stub() -> bytes:
    """SOI + minimal SOF2 (progressive) segment: enough for the header
    walk to classify the profile; not a full decodable file."""
    import struct
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    return (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 2 + len(sof2))
            + sof2 + b"\xff\xd9")


def test_progressive_jpeg_raises_named_profile_without_pil():
    import pytest
    from s3_redshift_backup_tool_spark.operators.jpeg import decode_jpeg
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: dispatch path covered by the fake test")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="SOF marker 0xc2"):
        decode_jpeg(_progressive_jpeg_stub())


def test_progressive_jpeg_dispatches_to_pil_kernel(monkeypatch):
    """The codec-registry seam: when Pillow IS importable, profiles the
    stdlib decoder fences off decode through it with no caller change.
    PIL is absent in this container, so prove the dispatch with a fake
    module — the same plan shape a production deploy gets."""
    import io
    import sys
    import types

    import numpy as np
    from s3_redshift_backup_tool_spark.operators import jpeg as jp

    decoded = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)

    class _FakeIm:
        def convert(self, mode):
            assert mode == "RGB"
            return decoded
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False

    fake_image = types.SimpleNamespace(
        open=lambda fh: (_ for _ in ()).throw(AssertionError("not BytesIO"))
        if not isinstance(fh, io.BytesIO) else _FakeIm())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)

    out = jp.decode_jpeg(_progressive_jpeg_stub())
    assert out.shape == (8, 8, 3) and (out == decoded).all()

    # explicit opt-out keeps the honest error even with PIL importable
    import pytest
    with pytest.raises(NotImplementedError):
        jp.decode_jpeg(_progressive_jpeg_stub(), allow_pil=False)


def test_baseline_jpeg_roundtrip_unaffected_by_dispatch():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.jpeg import (
        decode_jpeg, decode_jpeg_baseline, encode_jpeg)
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(px)
    a = decode_jpeg(payload)
    b = decode_jpeg_baseline(payload)
    assert (a == b).all()


# -- GIF codec (operators/gif.py) -------------------------------------------

def _rand_rgb(rng, h, w, levels=6):
    import numpy as np
    return (rng.integers(0, levels, (h, w, 1)).repeat(3, axis=2)
            .astype(np.uint8) * 40)


def test_gif_roundtrip_and_animation_compose():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.gif import (
        decode_gif, encode_gif, gif_frames)
    rng = np.random.default_rng(2)
    f1 = _rand_rgb(rng, 11, 19)
    assert (decode_gif(encode_gif(f1)) == f1).all()
    f2 = f1.copy(); f2[2:6, 3:9] = [200, 10, 10]
    f3 = f1.copy(); f3[0:4, 0:4] = [10, 200, 10]
    frames = gif_frames(encode_gif([f1, f2, f3]))
    assert len(frames) == 3
    assert (frames[1] == f2).all() and (frames[2] == f3).all()
    # bounded decode: only k frames of work
    assert len(gif_frames(encode_gif([f1, f2, f3]), max_frames=2)) == 2


def test_gif_hostile_dimensions_rejected_before_allocation():
    """A corrupt/hostile header declaring e.g. 65535x65535 must raise
    ValueError (caught by the sentinel-row path) BEFORE np.zeros would
    attempt a ~12.9 GB canvas and OOM the stage."""
    import struct

    import numpy as np
    import pytest

    from s3_redshift_backup_tool_spark.operators.gif import (
        MAX_PIXELS, encode_gif, gif_frames)
    rng = np.random.default_rng(5)
    payload = bytearray(encode_gif(_rand_rgb(rng, 4, 4)))
    # hostile logical-screen dims
    struct.pack_into("<HH", payload, 6, 65535, 65535)
    with pytest.raises(ValueError, match="outside sane bounds"):
        gif_frames(bytes(payload))
    # hostile FRAME dims (canvas sane, frame rectangle huge)
    payload = bytearray(encode_gif(_rand_rgb(rng, 4, 4)))
    i = payload.index(0x2C, 13)
    struct.pack_into("<HH", payload, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="outside sane bounds"):
        gif_frames(bytes(payload))
    # zero-sized canvas is equally invalid
    payload = bytearray(encode_gif(_rand_rgb(rng, 4, 4)))
    struct.pack_into("<HH", payload, 6, 0, 0)
    with pytest.raises(ValueError, match="outside sane bounds"):
        gif_frames(bytes(payload))
    assert 65535 * 65535 > MAX_PIXELS  # the attack the cap must stop


def test_gif_transparency_composits_over_previous_frame():
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.gif import (
        encode_gif, gif_frames)
    rng = np.random.default_rng(3)
    f1 = _rand_rgb(rng, 9, 9)
    f2 = f1.copy(); f2[4:7, 1:5] = [120, 120, 0]
    frames = gif_frames(encode_gif([f1, f2], transparent_last=True))
    assert (frames[1] == f2).all()        # unchanged pixels came from f1


def test_gif_interlaced_decodes():
    """Hand-build an interlaced frame: rows stored in pass order must
    come back in display order."""
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.gif import (
        decode_gif, encode_gif)
    rng = np.random.default_rng(4)
    img = _rand_rgb(rng, 16, 5)
    payload = bytearray(encode_gif(img))
    # rewrite the single image descriptor: set interlace flag and
    # re-encode pixel rows in interlace pass order
    from s3_redshift_backup_tool_spark.operators.gif import (
        _INTERLACE_PASSES, lzw_encode_trivial)
    import struct
    i = payload.index(0x2C, 13)           # image separator
    fl, ft, w, h, fp = struct.unpack_from("<HHHHB", payload, i + 1)
    assert (w, h) == (5, 16)
    payload[i + 9] = fp | 0x40
    # palette indexing copied from the encoder
    colors = np.unique(img.reshape(-1, 3), axis=0)
    lut = {tuple(c): j for j, c in enumerate(colors)}
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, 16, step)]
    idx = np.array([[lut[tuple(px)] for px in img[y]] for y in order],
                   dtype=np.uint8)
    min_code = payload[i + 10]
    stream = lzw_encode_trivial(idx.tobytes(), min_code)
    rebuilt = payload[:i + 11]
    for j in range(0, len(stream), 255):
        chunk = stream[j:j + 255]
        rebuilt += bytes([len(chunk)]) + chunk
    rebuilt += b"\x00\x3B"
    assert (decode_gif(bytes(rebuilt)) == img).all()


def test_gif_registry_and_spark_frame_sampling(spark):
    import numpy as np
    import pandas as pd
    from s3_redshift_backup_tool_spark.operators.codecs import _rgb_feature
    from s3_redshift_backup_tool_spark.operators.gif import (
        encode_gif, gif_frames)
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, extract_features, sample_gif_frames)
    rng = np.random.default_rng(5)
    payloads = []
    for s in range(4):
        f1 = _rand_rgb(rng, 8, 8)
        f2 = f1.copy(); f2[1:4, 1:4] = [200, 0, 0]
        payloads.append(encode_gif([f1, f2]))
    pdf = pd.DataFrame({"media_id": range(4),
                        "payload": payloads})
    df = spark.createDataFrame(pdf)
    media = attach_media(df, "payload", "media_id",
                         media_type="image", fmt="gif")
    feats = {r["media_id"]: r["feature"]
             for r in extract_features(media).collect()}
    want0 = _rgb_feature(gif_frames(payloads[0], 1)[0])
    assert np.allclose(feats[0], want0, atol=1e-6)

    frames = sample_gif_frames(media, max_frames=8).collect()
    assert len(frames) == 8               # 4 gifs x 2 frames
    by_key = {(r["media_id"], r["frame_idx"]): r["feature"] for r in frames}
    want11 = _rgb_feature(gif_frames(payloads[1], 2)[1])
    assert np.allclose(by_key[(1, 1)], want11, atol=1e-6)


def test_gif_disposal3_only_fails_when_load_bearing():
    """Disposal 3 on the LAST decoded frame (or beyond max_frames) is
    harmless; it raises only when a later frame must composite."""
    import struct
    import numpy as np
    import pytest
    from s3_redshift_backup_tool_spark.operators.gif import (
        decode_gif, encode_gif, gif_frames)
    rng = np.random.default_rng(9)
    f1, f2 = _rand_rgb(rng, 6, 6), _rand_rgb(rng, 6, 6)
    payload = bytearray(encode_gif([f1, f2]))
    # set disposal=3 in the FIRST graphic-control extension
    i = payload.index(bytes([0x21, 0xF9, 4]))
    payload[i + 3] |= (3 << 2)
    # first-frame-only decodes fine; full decode hits the gap honestly
    assert (decode_gif(bytes(payload)) == f1).all()
    assert len(gif_frames(bytes(payload), max_frames=1)) == 1
    with pytest.raises(NotImplementedError, match="disposal method 3"):
        gif_frames(bytes(payload))


def test_gif_corrupt_lzw_raises_value_error_not_keyerror():
    import pytest
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.gif import lzw_decode
    # first code after CLEAR out of range -> contract error, not KeyError
    # width 3 (min 2): emit clear(100) then code 7 (>= next_code 6)
    bits = [0, 0, 1, 1, 1, 1]           # clear=4 (100 LSB), then 7 (111)
    data = bytes([sum(b << i for i, b in enumerate(bits))])
    with pytest.raises(ValueError, match="bad LZW code"):
        lzw_decode(data, 2, 4)


def test_sample_gif_frames_survives_corrupt_rows(spark):
    import numpy as np
    import pandas as pd
    from s3_redshift_backup_tool_spark.operators.gif import encode_gif
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        attach_media, sample_gif_frames)
    rng = np.random.default_rng(13)
    good = encode_gif([_rand_rgb(rng, 6, 6), _rand_rgb(rng, 6, 6)])
    pdf = pd.DataFrame({"media_id": [0, 1, 2],
                        "payload": [good, b"NOT A GIF",
                                    good[:20]]})   # truncated
    media = attach_media(spark.createDataFrame(pdf), "payload",
                         "media_id", media_type="image", fmt="gif")
    rows = sample_gif_frames(media, max_frames=4).collect()
    ok = [r for r in rows if r["frame_idx"] >= 0]
    bad = [r for r in rows if r["frame_idx"] == -1]
    assert len(ok) == 2 and {r["media_id"] for r in ok} == {0}
    assert {r["media_id"] for r in bad} == {1, 2}
    assert all(r["feature"] is None for r in bad)


def test_gif_encoder_allows_256_colors_without_transparency():
    import numpy as np
    import pytest
    from s3_redshift_backup_tool_spark.operators.gif import (
        decode_gif, encode_gif)
    # exactly 256 distinct colors in one 16x16 frame
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([vals, vals[::-1], vals.T], axis=-1)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 256
    assert (decode_gif(encode_gif(img)) == img).all()
    with pytest.raises(ValueError, match="255"):
        encode_gif([img, img], transparent_last=True)
