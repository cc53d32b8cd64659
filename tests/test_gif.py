"""Dependency-free GIF codec (operators/gif.py). GIF is lossless, so
roundtrip assertions are exact; the LZW layer gets direct unit tests
including the KwKwK corner and the 12-bit dictionary reset."""

from __future__ import annotations

import numpy as np
import pytest

from protarrow_spark.operators.gif import (
    GIF_MAGICS,
    _lzw_compress,
    _lzw_decompress,
    decode_gif_gray,
    encode_gif_gray,
)


def test_roundtrip_lossless_various_shapes():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (5, 7), (13, 17), (64, 64)]:
        img = rng.integers(0, 256, shape, np.uint8)
        blob = encode_gif_gray(img)
        assert blob.startswith(GIF_MAGICS[1]) and blob.endswith(b"\x3b")
        w, h, gray = decode_gif_gray(blob)
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(gray, img)


def test_dictionary_reset_at_12_bits():
    """Enough distinct runs to push the LZW table past 4096 entries
    forces a mid-stream CLEAR + reset; the roundtrip must survive it."""
    img = np.tile(np.arange(256, dtype=np.uint8), 600).reshape(300, 512)
    _, _, gray = decode_gif_gray(encode_gif_gray(img))
    assert np.array_equal(gray, img)


def test_constant_image_kwkwk_patterns():
    img = np.full((40, 40), 7, np.uint8)
    _, _, gray = decode_gif_gray(encode_gif_gray(img))
    assert np.array_equal(gray, img)


def test_lzw_layer_directly_including_kwkwk():
    data = b"\x01\x01\x01\x01\x02\x02\x01\x01\x01"
    comp = _lzw_compress(data, 2)
    assert bytes(_lzw_decompress(comp, 2, len(data))) == data


#: Image descriptor offset in encode_gif_gray output: 6-byte header +
#: 7-byte logical screen descriptor + 768-byte global color table.
#: (Searching for the 0x2C introducer would be wrong — the gray
#: palette itself contains bytes 0x2C at intensity 44.)
_DESC = 6 + 7 + 768


def test_extension_blocks_are_skipped():
    """A graphic-control extension spliced before the image descriptor
    (the GIF89a animation shape) must be skipped, not rejected."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_gif_gray(img)
    assert blob[_DESC] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = blob[:_DESC] + gce + blob[_DESC:]
    _, _, gray = decode_gif_gray(patched)
    assert np.array_equal(gray, img)


def test_non_gif_returns_none():
    assert decode_gif_gray(b"") is None
    assert decode_gif_gray(b"GIF") is None
    assert decode_gif_gray(b"NOTAGIF" + b"\x00" * 20) is None


def test_boundaries_and_corruption():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = bytearray(encode_gif_gray(img))
    # interlace is SUPPORTED since r8: a genuine 4-pass encoding
    # round-trips exactly (incl. heights that leave passes empty)
    for shape in ((8, 8), (3, 5), (9, 4)):
        im = np.arange(shape[0] * shape[1], dtype=np.uint8).reshape(shape)
        _, _, got = decode_gif_gray(encode_gif_gray(im, interlace=True))
        assert np.array_equal(got, im)
    # flipping the flag on sequentially-stored rows decodes a
    # row-permuted image — still structurally valid, so pin that the
    # permutation is exactly the 4-pass scatter
    interlaced = bytearray(blob)
    interlaced[_DESC + 9] |= 0x40
    _, _, perm = decode_gif_gray(bytes(interlaced))
    from protarrow_spark.operators.gif import _gif_interlace_order

    expect = np.empty_like(img)
    expect[_gif_interlace_order(img.shape[0])] = img
    assert np.array_equal(perm, expect)
    # local color tables are SUPPORTED since r8: a genuine local-
    # palette encoding round-trips exactly...
    w, h, gray = decode_gif_gray(encode_gif_gray(img, local_palette=True))
    assert np.array_equal(gray, img)
    # ...and the local-palette blob really has no global table
    assert encode_gif_gray(img, local_palette=True)[10] & 0x80 == 0
    # flipping the LCT bit on a blob with no actual table bytes makes
    # the decoder eat LZW data as palette -> structural ValueError
    local_ct = bytearray(blob)
    local_ct[_DESC + 9] |= 0x80
    with pytest.raises(ValueError):
        decode_gif_gray(bytes(local_ct))
    with pytest.raises(ValueError):
        decode_gif_gray(bytes(blob[: len(blob) // 2]))


def test_decode_real_image_dispatches_gif():
    from protarrow_spark.operators.multimodal import decode_real_image

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_real_image(encode_gif_gray(img))
    assert out["width"] == 8 and np.array_equal(out["gray"], img)
