"""Dependency-free baseline JPEG codec (operators/jpeg.py).

Same strategy as the BMP/PGM/WAV codec tests: genuine encoded bytes
through the real decoder, a checked-in golden byte literal pinning the
wire format, independent-recomputation checks for the math stages, and
explicit tests of the documented boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from protarrow_spark.operators.jpeg import (
    QUANT_ANNEX_K,
    QUANT_UNITY,
    ZIGZAG,
    _dct_matrix,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

#: encode_jpeg_gray(kron([[7,200],[91,13]], ones(8,8)), QUANT_UNITY) —
#: a full SOI/APP0/DQT/SOF0/DHT/DHT/SOS/EOI baseline file. Pins the
#: wire format against silent encoder drift; the decode test below
#: pins the decoder against it independently of the encoder.
GOLDEN_16x16_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb00430001010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101ffc0000b080010"
    "001001011100ffc4001f00000105010101010101000000000000000001020304"
    "05060708090a0bffc400b5100002010303020403050504040000017d01020300"
    "041105122131410613516107227114328191a1082342b1c11552d1f024336272"
    "82090a161718191a25262728292a3435363738393a434445464748494a535455"
    "565758595a636465666768696a737475767778797a838485868788898a929394"
    "95969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9"
    "cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda"
    "0008010100003f00fe0debfd822bf897afe63ebfffd9"
)
GOLDEN_PIXELS = np.kron(
    np.array([[7, 200], [91, 13]], dtype=np.uint8), np.ones((8, 8), np.uint8)
)


def test_golden_bytes_encode():
    blob = encode_jpeg_gray(GOLDEN_PIXELS, quant=QUANT_UNITY)
    assert blob.hex() == GOLDEN_16x16_HEX


def test_golden_bytes_decode():
    w, h, gray = decode_jpeg_gray(bytes.fromhex(GOLDEN_16x16_HEX))
    assert (w, h) == (16, 16)
    assert np.array_equal(gray, GOLDEN_PIXELS)


def test_block_constant_unity_roundtrip_exact():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    w, h, gray = decode_jpeg_gray(encode_jpeg_gray(img, quant=QUANT_UNITY))
    assert (w, h) == (40, 24)
    assert np.array_equal(gray, img)


def test_unity_quant_near_lossless_odd_size():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(29, 37), dtype=np.uint8)
    w, h, gray = decode_jpeg_gray(encode_jpeg_gray(img, quant=QUANT_UNITY))
    assert (w, h) == (37, 29)
    assert np.abs(gray.astype(int) - img.astype(int)).max() <= 2


def test_annex_k_lossy_but_compressive():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = ((xx * 2 + yy) % 256).astype(np.uint8)
    blob = encode_jpeg_gray(img, quant=QUANT_ANNEX_K)
    assert len(blob) < img.size / 2  # actually compresses
    w, h, gray = decode_jpeg_gray(blob)
    assert (w, h) == (64, 48)
    assert np.median(np.abs(gray.astype(int) - img.astype(int))) <= 6


def test_byte_stuffing_occurs_and_decodes():
    """Random data reliably produces 0xFF bytes in the entropy stream;
    the stuffed 0x00s must be emitted by the writer and skipped by the
    reader (a miss corrupts every later coefficient)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    blob = encode_jpeg_gray(img, quant=QUANT_UNITY)
    scan = blob[blob.find(b"\xff\xda") + 14 : -2]
    assert scan.count(b"\xff\x00") > 0
    _, _, gray = decode_jpeg_gray(blob)
    assert np.abs(gray.astype(int) - img.astype(int)).max() <= 2


def test_dct_matrix_orthonormal_and_zigzag_involution():
    a = _dct_matrix()
    assert np.allclose(a @ a.T, np.eye(8))  # orthonormal basis
    # zigzag is a permutation of 0..63 with the spec's first diagonal
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[:6] == [0, 1, 8, 16, 9, 2]


def test_idct_matches_direct_cosine_sum():
    """The einsum IDCT must equal the textbook T.81 A.3.3 double sum,
    computed here independently element by element."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    blob = encode_jpeg_gray(img, quant=QUANT_UNITY)
    _, _, gray = decode_jpeg_gray(blob)

    # independent direct forward DCT + inverse on the same block
    f = img.astype(np.float64) - 128.0
    c = lambda u: (1 / np.sqrt(2)) if u == 0 else 1.0
    F = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = sum(
                f[x, y]
                * np.cos((2 * x + 1) * u * np.pi / 16)
                * np.cos((2 * y + 1) * v * np.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            F[u, v] = c(u) * c(v) * s / 4
    Fq = np.rint(F)  # unity quant
    rec = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            rec[x, y] = (
                sum(
                    c(u)
                    * c(v)
                    * Fq[u, v]
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                    for u in range(8)
                    for v in range(8)
                )
                / 4
            )
    expected = np.clip(np.rint(rec) + 128, 0, 255).astype(np.uint8)
    assert np.array_equal(gray, expected)


def test_non_jpeg_returns_none():
    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(b"BMnot a jpeg") is None
    assert decode_jpeg_gray(b"\xff\xd8") is None  # SOI alone: too short


def test_truncated_raises_value_error():
    blob = encode_jpeg_gray(GOLDEN_PIXELS, quant=QUANT_UNITY)
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:40])
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:150])


def test_progressive_and_color_boundaries():
    blob = bytearray(encode_jpeg_gray(GOLDEN_PIXELS, quant=QUANT_UNITY))
    sof = blob.find(b"\xff\xc0")
    prog = bytes(blob[:sof]) + b"\xff\xc2" + bytes(blob[sof + 2 :])
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_gray(prog)
    color = bytearray(blob)
    color[sof + 9] = 3  # ncomp byte of the SOF0 payload
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg_gray(bytes(color))


def test_decode_real_image_dispatches_jpeg():
    from protarrow_spark.operators.multimodal import decode_real_image

    out = decode_real_image(encode_jpeg_gray(GOLDEN_PIXELS, quant=QUANT_UNITY))
    assert out["width"] == 16 and out["height"] == 16
    assert np.array_equal(out["gray"], GOLDEN_PIXELS)
    with pytest.raises(NotImplementedError):  # WebP still a stub
        decode_real_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 64)
