"""Total-function fuzz contract for every real-format decoder.

At corpus scale a decode UDF sees arbitrary bytes — scraped files,
truncated downloads, bit rot. The operator contract is that a decoder
either returns a value, returns None (not this format), or raises
ValueError / NotImplementedError (both handled by the null path in
decode_image_features); ANY other exception (IndexError, struct.error,
zlib.error, OverflowError, infinite loop) would kill the whole Spark
stage. These hypothesis tests pin that contract over random garbage,
magic-prefixed garbage, truncations, and bit flips of valid files.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from protarrow_spark.operators.jpeg import (
    QUANT_UNITY,
    encode_jpeg_gray,
    decode_jpeg_gray,
)
from protarrow_spark.operators.multimodal import (
    decode_bmp_gray,
    decode_pgm_gray,
    decode_wav_pcm16,
    encode_bmp_gray,
    encode_pgm_gray,
    encode_wav_g711,
    encode_wav_pcm16,
)
from protarrow_spark.operators.gif import decode_gif_gray, encode_gif_gray
from protarrow_spark.operators.png import decode_png_gray, encode_png

_IMG = (np.arange(256, dtype=np.uint8).reshape(16, 16) * 7 % 256).astype(np.uint8)
VALID = {
    "jpeg": encode_jpeg_gray(_IMG, quant=QUANT_UNITY),
    # restart-interval stream: RSTn resync + DC-reset paths fuzzed too
    "jpeg_rst": encode_jpeg_gray(_IMG, quant=QUANT_UNITY, restart_interval=1),
    "png": encode_png(_IMG),
    "gif": encode_gif_gray(_IMG),
    "bmp": encode_bmp_gray(_IMG),
    "pgm": encode_pgm_gray(_IMG),
    "wav": encode_wav_pcm16((_IMG.astype(np.int16).flatten() - 128) * 256),
    "wav_ulaw": encode_wav_g711(_IMG.flatten()),
}
DECODERS = {
    "jpeg": decode_jpeg_gray,
    "jpeg_rst": decode_jpeg_gray,
    "png": decode_png_gray,
    "gif": decode_gif_gray,
    "bmp": decode_bmp_gray,
    "pgm": decode_pgm_gray,
    "wav": decode_wav_pcm16,
    "wav_ulaw": decode_wav_pcm16,
}
MAGICS = [b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"P5", b"RIFF", b""]


def _assert_total(data: bytes) -> None:
    for name, dec in DECODERS.items():
        try:
            dec(data)
        except (ValueError, NotImplementedError):
            pass  # the contract's error channel — operator null path


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from(MAGICS),
    body=st.binary(min_size=0, max_size=400),
)
def test_decoders_total_on_magic_prefixed_garbage(prefix, body):
    _assert_total(prefix + body)


@settings(max_examples=150, deadline=None)
@given(
    fmt=st.sampled_from(sorted(VALID)),
    cut=st.integers(min_value=0, max_value=1000),
)
def test_decoders_total_on_truncations(fmt, cut):
    blob = VALID[fmt]
    _assert_total(blob[: cut % (len(blob) + 1)])


@settings(max_examples=200, deadline=None)
@given(
    fmt=st.sampled_from(sorted(VALID)),
    pos=st.integers(min_value=0, max_value=10**9),
    mask=st.integers(min_value=1, max_value=255),
)
def test_decoders_total_on_bit_flips(fmt, pos, mask):
    blob = bytearray(VALID[fmt])
    blob[pos % len(blob)] ^= mask
    _assert_total(bytes(blob))


def test_jpeg_sos_zero_components_raises_valueerror():
    """Pinned r9 falsifying example (fmt='jpeg', pos=12868, mask=1): a
    bit flip that zeroes the SOS component count produced an empty
    scan_states list and an IndexError in _block_units. The decoder
    must reject ns=0 through the contracted ValueError channel."""
    blob = bytearray(VALID["jpeg"])
    blob[12868 % len(blob)] ^= 1
    _assert_total(bytes(blob))
    # Direct construction too, independent of fixture byte layout: find
    # the SOS marker and zero its ns byte.
    raw = bytearray(VALID["jpeg"])
    i = raw.find(b"\xff\xda")
    assert i >= 0
    raw[i + 4] = 0  # ns lives right after the 2-byte segment length
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(raw))


@pytest.mark.parametrize("fmt", sorted(VALID))
def test_valid_blobs_still_decode(fmt):
    """The fuzz fixtures themselves are genuine decodable files."""
    out = DECODERS[fmt](VALID[fmt])
    assert out is not None


@pytest.mark.parametrize("fmt", sorted(VALID))
def test_decoders_total_on_stride_bit_flip_sweep(fmt):
    """Deterministic coverage floor under the hypothesis budget: flip
    two mask levels at every 8th byte of each fixture. The r9 ns=0
    crash sat in the JPEG marker region that random example budgets
    kept missing; a strided sweep touches every segment of every
    format on every run. (A one-off exhaustive every-byte x 3-mask
    sweep of all fixtures runs clean as of r10.)"""
    blob = VALID[fmt]
    dec = DECODERS[fmt]
    for pos in range(0, len(blob), 8):
        for mask in (0x01, 0x80):
            b = bytearray(blob)
            b[pos] ^= mask
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass
