"""Dependency-free PNG codec (RFC 2083 / ISO 15948) for the multimodal
path — grayscale and truecolor, 8-bit, all five scanline filters.

PNG's compression layer is DEFLATE, which Python ships in the stdlib
(``zlib``), so unlike JPEG nothing here needs an external library: the
container (signature, length/type/CRC chunk framing, IHDR/IDAT/IEND),
the filter pipeline (None/Sub/Up/Average/Paeth, per the spec's exact
integer arithmetic), and the zlib stream are all the public format.
PNG is LOSSLESS, so decode(encode(x)) == x bit-for-bit and a SQL
oracle can pin every pixel of a fixture from the source data — the
same gate strategy as the BMP/PGM codecs, now over a compressed
format.

Honest boundaries (documented ``NotImplementedError``): bit depths
other than 8, palette/alpha color types (3/4/6), and Adam7 interlace.
A blob that does not start with the 8-byte PNG signature returns
``None`` (the operator's null path); structural corruption (bad CRC,
truncated chunks, wrong IDAT length) raises ``ValueError``.

Reference parity: the reference repo has no media codecs; this extends
the engine's multimodal surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_GRAY = 0
_COLOR_RGB = 2


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The spec's predictor (left, up, up-left) — exact integer form."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels, color: bool = False, filters=None) -> bytes:
    """(h, w) uint8 grayscale — or (h, w, 3) uint8 RGB with
    ``color=True`` — to a GENUINE PNG. ``filters`` optionally gives a
    per-row filter type (0..4); default cycles through all five so a
    decoder must implement every filter to read the fixture."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if color:
        h, w, _ = px.shape
        bpp, ctype = 3, _COLOR_RGB
        rows = px.reshape(h, w * 3).astype(np.int32)
    else:
        h, w = px.shape
        bpp, ctype = 1, _COLOR_GRAY
        rows = px.astype(np.int32)
    raw = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.int32)
    for y in range(h):
        ftype = (filters[y] if filters is not None else y) % 5
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:
            pred = np.fromiter(
                (
                    _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
                    for i in range(len(cur))
                ),
                dtype=np.int32,
                count=len(cur),
            )
            filt = cur - pred
        raw.append(ftype)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes):
    """Parse a REAL PNG into ``(width, height, gray)`` — gray is a
    row-major uint8 (h, w) array; truecolor converts via the same
    integer BT.601 luma as the BMP path. Returns ``None`` when the
    blob lacks the PNG signature; ``NotImplementedError`` at the
    documented boundaries; ``ValueError`` on corrupt structure."""
    import numpy as np

    if len(data) < 8 or data[:8] != PNG_MAGIC:
        return None
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(data):
        length = struct.unpack(">I", data[pos : pos + 4])[0]
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise NotImplementedError(f"{depth}-bit PNG")
            if color not in (_COLOR_GRAY, _COLOR_RGB):
                raise NotImplementedError(
                    f"PNG color type {color} (palette/alpha)"
                )
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace")
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, color)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, color = ihdr
    bpp = 3 if color == _COLOR_RGB else 1
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad IDAT zlib stream: {exc}") from None
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT decodes to {len(raw)} bytes, want {h * (stride + 1)}"
        )
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    lines = arr[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y]
        if f == 0:
            row = cur
        elif f == 1:  # Sub: recon[i] = cur[i] + recon[i-bpp]
            row = cur.copy()
            # per-channel prefix sums mod 256 (vectorized Sub)
            for c in range(bpp):
                row[c::bpp] = np.cumsum(cur[c::bpp]) % 256
        elif f == 2:  # Up
            row = (cur + prev) % 256
        elif f == 3:  # Average — sequential in i (depends on left recon)
            row = np.empty_like(cur)
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (cur[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth — sequential in i
            row = np.empty_like(cur)
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                row[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(upleft))) % 256
            row = row % 256
        else:
            raise ValueError(f"unknown filter type {f} on row {y}")
        recon[y] = row
        prev = row
    if color == _COLOR_RGB:
        rgb = recon.reshape(h, w, 3).astype(np.int64)
        gray = (
            (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
        ).astype(np.uint8)
    else:
        gray = recon.astype(np.uint8)
    return w, h, gray
