"""Dependency-free PNG codec (operators/png.py).

PNG is lossless, so the roundtrip assertions are exact equality. The
golden literal is decode-side only: zlib COMPRESSION bytes may differ
across zlib builds (any of them inflate identically), so pinning the
encoder's exact output would be brittle where pinning the decoder's
interpretation of a fixed stream is not.
"""

from __future__ import annotations

import numpy as np
import pytest

from protarrow_spark.operators.png import PNG_MAGIC, decode_png_gray, encode_png

#: encode_png(arange(48).reshape(6,8) * 5) from the build environment —
#: a complete signature/IHDR/IDAT/IEND file with filter types 0..4
#: cycling across the 6 rows.
GOLDEN_6x8_HEX = (
    "89504e470d0a1a0a0000000d4948445200000008000000060800000000db6e80"
    "270000002a49444154789c636060e5e21791945366d4608500260d28600e1087"
    "00169814c389b397aedf79f8ec350087650a2a6f2033990000000049454e44ae"
    "426082"
)
GOLDEN_PIXELS = (np.arange(48, dtype=np.uint8).reshape(6, 8) * 5).astype(np.uint8)


def test_golden_bytes_decode():
    w, h, gray = decode_png_gray(bytes.fromhex(GOLDEN_6x8_HEX))
    assert (w, h) == (8, 6)
    assert np.array_equal(gray, GOLDEN_PIXELS)


def test_gray_roundtrip_lossless_all_filters_cycled():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    blob = encode_png(img)
    assert blob.startswith(PNG_MAGIC)
    w, h, gray = decode_png_gray(blob)
    assert (w, h) == (17, 13)
    assert np.array_equal(gray, img)


@pytest.mark.parametrize("ftype", range(5))
def test_each_filter_type_individually(ftype):
    rng = np.random.default_rng(100 + ftype)
    img = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    _, _, gray = decode_png_gray(encode_png(img, filters=[ftype] * 6))
    assert np.array_equal(gray, img)


def test_truecolor_luma_matches_bmp_formula():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    w, h, gray = decode_png_gray(encode_png(rgb, color=True))
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    expected = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    assert (w, h) == (11, 9)
    assert np.array_equal(gray, expected)


def test_equal_channel_truecolor_is_identity():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(4, 16), dtype=np.uint8)
    rgb = np.repeat(px[..., None], 3, axis=2)
    _, _, gray = decode_png_gray(encode_png(rgb, color=True))
    assert np.array_equal(gray, px)


def test_non_png_returns_none():
    assert decode_png_gray(b"") is None
    assert decode_png_gray(b"\x89PNG") is None  # partial signature
    assert decode_png_gray(b"BM" + b"\x00" * 60) is None


def test_corrupt_structures_raise_value_error():
    blob = encode_png(GOLDEN_PIXELS)
    flipped = bytearray(blob)
    flipped[30] ^= 0xFF  # inside IHDR payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(flipped))
    with pytest.raises(ValueError):
        decode_png_gray(blob[:40])  # truncated IDAT


def test_boundaries_raise_not_implemented():
    blob = bytearray(encode_png(GOLDEN_PIXELS))
    # IHDR payload starts at byte 16: w(4) h(4) depth color comp filt interlace
    import struct
    import zlib

    def patch_ihdr(offset, value):
        b = bytearray(blob)
        b[16 + offset] = value
        payload = bytes(b[16:29])
        b[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF)
        return bytes(b)

    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png_gray(patch_ihdr(8, 16))  # bit depth
    # color type 3 is SUPPORTED since r8 — claiming it without a PLTE
    # chunk is structural corruption; an invalid type code likewise
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_gray(patch_ihdr(9, 3))
    with pytest.raises(ValueError, match="color type"):
        decode_png_gray(patch_ihdr(9, 5))
    # Adam7 is SUPPORTED since r8 — claiming interlace on a stream
    # serialized sequentially is CORRUPT (pass framing mismatch), and
    # a genuinely unknown interlace method is structural
    with pytest.raises(ValueError):
        decode_png_gray(patch_ihdr(12, 1))
    with pytest.raises(ValueError, match="interlace"):
        decode_png_gray(patch_ihdr(12, 7))


def test_adam7_interlace_roundtrips():
    """Adam7 encode -> decode is lossless and equals the sequential
    encoding of the same pixels, across odd sizes that leave some
    passes empty, for gray AND truecolor."""
    rng = np.random.default_rng(5)
    for size in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 17), (33, 41)]:
        g = rng.integers(0, 256, size).astype(np.uint8)
        w, h, got = decode_png_gray(encode_png(g, interlace=True))
        assert (w, h) == (size[1], size[0])
        assert np.array_equal(got, g)
        c = rng.integers(0, 256, size + (3,)).astype(np.uint8)
        plain = decode_png_gray(encode_png(c, color=True))[2]
        inter = decode_png_gray(encode_png(c, color=True, interlace=True))[2]
        assert np.array_equal(plain, inter)
    # truncated pass data raises, never a silently short image
    blob = bytearray(encode_png(rng.integers(0, 256, (16, 16)).astype(np.uint8), interlace=True))
    with pytest.raises(ValueError):
        decode_png_gray(bytes(blob[:60]))


def test_decode_real_image_dispatches_png():
    from protarrow_spark.operators.multimodal import decode_real_image

    out = decode_real_image(encode_png(GOLDEN_PIXELS))
    assert out["width"] == 8 and out["height"] == 6
    assert np.array_equal(out["gray"], GOLDEN_PIXELS)


def test_all_color_types_roundtrip():
    """Color types 3 (palette via PLTE), 4 (gray+alpha), 6 (RGBA) are
    supported since r8 — each round-trips to the same gray raster as
    its plain counterpart, sequential AND Adam7."""
    rng = np.random.default_rng(9)
    for size in [(1, 1), (7, 5), (9, 17)]:
        g = rng.integers(0, 256, size).astype(np.uint8)
        c = rng.integers(0, 256, size + (3,)).astype(np.uint8)
        plain_rgb = decode_png_gray(encode_png(c, color=True))[2]
        for il in (False, True):
            assert np.array_equal(
                decode_png_gray(encode_png(g, color_type=3, interlace=il))[2], g
            )
            assert np.array_equal(
                decode_png_gray(encode_png(g, color_type=4, interlace=il))[2], g
            )
            assert np.array_equal(
                decode_png_gray(encode_png(c, color_type=6, interlace=il))[2],
                plain_rgb,
            )
    # palette PNG without a PLTE chunk is structurally corrupt
    blob = bytearray(encode_png(np.zeros((4, 4), np.uint8), color_type=3))
    plte = blob.find(b"PLTE")
    stripped = bytes(blob[: plte - 4]) + bytes(blob[plte + 8 + 768 :])
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_gray(stripped)
