"""Dependency-free GIF codec (GIF87a/89a, the public CompuServe spec)
for the multimodal path — LZW-compressed, palette-indexed, lossless.

GIF's compression is the variable-code-width LZW variant defined by
the spec (clear + end-of-information codes, dictionary growth to 12
bits, sub-block framing); both directions are implemented here in
plain Python over the public specification. Grayscale rasters use a
256-entry gray palette whose index IS the intensity, so — like PNG —
decode(encode(x)) == x exactly and a SQL oracle can pin every pixel of
a fixture from the source data.

Interlace (the spec's 4-pass row ordering) and local color tables are
SUPPORTED (r8). Honest boundaries: transparency handling beyond
ignoring the extension; only the FIRST image of an animation is decoded (the
metadata operator's contract is one gray raster per blob). Non-GIF
blobs return ``None``; structural corruption raises ``ValueError``.

Reference parity: the reference repo has no media codecs; this extends
the engine's multimodal surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """Spec LZW: emit CLEAR, build the dictionary as runs extend, emit
    EOI; variable code width grows at 2^width, capped at 12 bits (emit
    CLEAR and reset at cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs codes LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for idx in indices:
        cur = prev + bytes([idx])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([idx])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, expect: int) -> bytearray:
    """Inverse of :func:`_lzw_compress`; stops after ``expect`` output
    bytes or EOI. Raises ValueError on invalid code streams."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code > eoi:
            entry = table[code]
        elif code < clear:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < (1 << 12):
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError(f"LZW output short: {len(out)} of {expect} bytes")
    return out[:expect]


def _gif_interlace_order(h: int):
    import numpy as np

    return np.concatenate(
        [np.arange(start, h, step) for start, step in
         ((0, 8), (4, 8), (2, 4), (1, 2))]
    )


def encode_gif_gray(pixels, local_palette: bool = False,
                    interlace: bool = False) -> bytes:
    """Grayscale (h, w) uint8 raster -> a GENUINE GIF89a: logical
    screen descriptor, 256-entry gray color table (index ==
    intensity), image descriptor, real LZW-compressed indices in
    sub-block framing, trailer. ``local_palette=True`` ships the gray
    table as the image's LOCAL color table and no global one — the
    per-frame-palette layout animated GIFs use; ``interlace=True``
    stores rows in the spec's 4-pass order with the interlace flag
    set."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    out = bytearray(b"GIF89a")
    palette = bytes(v for x in range(256) for v in (x, x, x))
    if local_palette:
        # logical screen WITHOUT a global color table
        out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)
        # image descriptor: LCT flag set, table size 2^(7+1)=256
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0xC7 if interlace else 0x87)
        out += palette
    else:
        # logical screen: GCT flag + 8-bit color resolution + size 256
        out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        out += palette
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)  # descriptor
    min_code_size = 8
    out.append(min_code_size)
    rows = px[_gif_interlace_order(h)] if interlace else px
    lzw = _lzw_compress(rows.reshape(-1), min_code_size)
    for i in range(0, len(lzw), 255):  # sub-block framing
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_gray(data: bytes):
    """Parse a REAL GIF into ``(width, height, gray)``; the first
    image's palette entries map through integer BT.601 luma (identity
    for the gray palette). Returns ``None`` without a GIF87a/89a
    signature; ``NotImplementedError`` at the documented boundaries;
    ``ValueError`` on corrupt structure."""
    import numpy as np

    if len(data) < 13 or data[:6] not in GIF_MAGICS:
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image")
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated extension sub-blocks")
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        interlaced = bool(ipacked & 0x40)
        ct = gct
        if ipacked & 0x80:  # local color table overrides the global
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            ct = np.frombuffer(
                data, np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("image without any color table")
        if w == 0 or h == 0:
            raise ValueError("degenerate image dimensions")
        if pos >= len(data):
            raise ValueError("truncated LZW header")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated image sub-blocks")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            if pos + size > len(data):
                raise ValueError("truncated image sub-block")
            lzw += data[pos : pos + size]
            pos += size
        indices = _lzw_decompress(bytes(lzw), min_code_size, w * h)
        idx = np.frombuffer(bytes(indices), np.uint8).reshape(h, w)
        if interlaced:
            # GIF 4-pass interlace (89a spec appendix E): rows stored
            # pass-by-pass; scatter them back to display order
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in
                 ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            display = np.empty_like(idx)
            display[order] = idx
            idx = display
        if int(idx.max()) >= len(ct):
            raise ValueError("pixel index outside color table")
        rgb = ct[idx].astype(np.int64)
        gray = (
            (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
        ).astype(np.uint8)
        return w, h, gray
    raise ValueError("no image block found")
