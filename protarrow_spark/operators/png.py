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
other than 8. ALL five 8-bit color types are supported — gray,
truecolor, palette (PLTE lookup + BT.601 luma), gray+alpha, RGBA
(alpha ignored: the operator contract is a gray raster) — and Adam7
interlace is SUPPORTED (r8): the seven passes unfilter independently and scatter
onto the full-resolution grid; ``encode_png(..., interlace=True)``
emits a spec-valid interlaced stream for the round-trip tests.
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
_COLOR_PALETTE = 3
_COLOR_GRAY_ALPHA = 4
_COLOR_RGBA = 6
#: channels per pixel, by color type
_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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


def _filter_rows(rows, bpp: int, filters=None) -> bytearray:
    """Serialize an (n, stride) int32 raster as n filtered scanlines
    (1 filter byte + stride bytes each), cycling filter types unless
    ``filters`` pins them — one independent filter chain (prev row
    starts at zero), used per image or per Adam7 pass."""
    import numpy as np

    raw = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.int32)
    for y in range(rows.shape[0]):
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
    return raw


def encode_png(pixels, color: bool = False, filters=None,
               interlace: bool = False, color_type: int | None = None) -> bytes:
    """(h, w) uint8 grayscale — or (h, w, 3) uint8 RGB with
    ``color=True`` — to a GENUINE PNG. ``filters`` optionally gives a
    per-row filter type (0..4); default cycles through all five so a
    decoder must implement every filter to read the fixture.
    ``interlace=True`` emits Adam7: the seven passes serialize their
    reduced grids as independent filter chains (each pass filtered
    with the same per-row cycle). ``color_type`` overrides the layout:
    3 = palette (the gray raster stored as indices over an identity
    gray PLTE), 4 = gray+alpha, 6 = RGBA (alpha 255) — the fixtures
    for the decoder's full color-type matrix."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    plte_chunk = b""
    if color_type == _COLOR_PALETTE:
        h, w = px.shape
        bpp, ctype = 1, _COLOR_PALETTE
        rows = px.astype(np.int32)  # index == intensity
        plte_chunk = _chunk(
            b"PLTE", bytes(v for x in range(256) for v in (x, x, x))
        )
    elif color_type == _COLOR_GRAY_ALPHA:
        h, w = px.shape
        bpp, ctype = 2, _COLOR_GRAY_ALPHA
        ga = np.empty((h, w * 2), dtype=np.int32)
        ga[:, 0::2] = px
        ga[:, 1::2] = 255
        rows = ga
    elif color_type == _COLOR_RGBA:
        h, w, _ = px.shape
        bpp, ctype = 4, _COLOR_RGBA
        rgba = np.empty((h, w * 4), dtype=np.int32)
        flat = px.reshape(h, w * 3)
        for c in range(3):
            rgba[:, c::4] = flat[:, c::3]
        rgba[:, 3::4] = 255
        rows = rgba
    elif color:
        h, w, _ = px.shape
        bpp, ctype = 3, _COLOR_RGB
        rows = px.reshape(h, w * 3).astype(np.int32)
    else:
        h, w = px.shape
        bpp, ctype = 1, _COLOR_GRAY
        rows = px.astype(np.int32)

    if interlace:
        flat = rows  # (h, w*bpp)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            ridx = np.arange(ph) * dy + y0
            cidx = np.arange(pw) * dx + x0
            sub = np.empty((ph, pw * bpp), dtype=np.int32)
            for c in range(bpp):
                sub[:, c::bpp] = flat[np.ix_(ridx, cidx * bpp + c)]
            raw += _filter_rows(sub, bpp, filters)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        return (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + plte_chunk
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    raw = _filter_rows(rows, bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + plte_chunk
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


#: Adam7 pass grid: (x0, y0, dx, dy) per pass, spec order.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse the five scanline filters over ``h`` serialized rows of
    ``1 + stride`` bytes; returns an (h, stride) int32 array. Exact
    spec integer arithmetic (mod-256 at every step)."""
    import numpy as np

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
    return recon


def _deinterlace_adam7(raw: bytes, w: int, h: int, bpp: int):
    """Unfilter the seven Adam7 passes (each an independent filter
    chain over its reduced grid) and scatter them onto the full
    (h, w*bpp) raster."""
    import numpy as np

    full = np.zeros((h, w * bpp), dtype=np.int32)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pstride = pw * bpp
        need = ph * (pstride + 1)
        chunk = raw[pos : pos + need]
        if len(chunk) != need:
            raise ValueError("truncated Adam7 pass data")
        pos += need
        sub = _unfilter(chunk, ph, pstride, bpp)
        rows = np.arange(ph) * dy + y0
        cols = np.arange(pw) * dx + x0
        for c in range(bpp):
            full[np.ix_(rows, cols * bpp + c)] = sub[:, c::bpp]
    if pos != len(raw):
        raise ValueError("trailing bytes after Adam7 passes")
    return full


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
    plte = None
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
            if color not in _BPP:
                raise ValueError(f"invalid PNG color type {color}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, color, interlace)
        elif ctype == b"PLTE":
            if length % 3 or length > 768:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, color, interlace = ihdr
    if color == _COLOR_PALETTE and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")
    bpp = _BPP[color]
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad IDAT zlib stream: {exc}") from None
    if interlace:
        recon = _deinterlace_adam7(raw, w, h, bpp)
    else:
        recon = _unfilter(raw, h, stride, bpp)
    if color == _COLOR_RGB:
        rgb = recon.reshape(h, w, 3).astype(np.int64)
        gray = _luma(rgb)
    elif color == _COLOR_RGBA:
        rgba = recon.reshape(h, w, 4).astype(np.int64)
        gray = _luma(rgba[..., :3])  # alpha ignored (metadata contract)
    elif color == _COLOR_GRAY_ALPHA:
        gray = recon.reshape(h, w, 2)[..., 0].astype(np.uint8)
    elif color == _COLOR_PALETTE:
        idx = recon.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index outside PLTE")
        gray = _luma(plte[idx].astype(np.int64))
    else:
        gray = recon.astype(np.uint8)
    return w, h, gray


def _luma(rgb):
    """Integer BT.601 luma, same coefficients as the BMP/GIF paths."""
    import numpy as np

    return (
        (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    ).astype(np.uint8)
