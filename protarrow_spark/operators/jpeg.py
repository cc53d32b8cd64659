"""Dependency-free baseline JPEG (ITU-T T.81) codec — grayscale AND
YCbCr color (4:4:4, 4:2:2, 4:2:0).

JPEG dominates real image corpora, so the multimodal path needs a real
decoder, not a stub. This module implements the public baseline
sequential DCT process from the spec alone — SOI/APPn/DQT/SOF0/DHT/
SOS/EOI marker parsing, Huffman entropy coding with byte stuffing,
DPCM DC / run-length AC coefficient coding, zigzag, dequantization, a
separable float IDCT, interleaved multi-component MCU scans with
sampling factors up to 2x2 (covering the 4:2:0 layout essentially all
real color JPEGs use, with replication chroma upsampling), and the
JFIF YCbCr<->RGB conversions — plus matching grayscale AND color
encoders so tests push GENUINE entropy-coded bytes through the decoder
(same pattern as the BMP/PGM/WAV codecs in ``operators.multimodal``).

Honest boundaries (documented ``NotImplementedError``, not silent
wrong answers): progressive (SOF2) and other non-baseline frames,
sampling factors above 2, non-interleaved multi-scan files, 16-bit
quantization tables, restart intervals, and arithmetic coding. A blob
that does not start with the SOI marker returns ``None`` (the
operator's null path, like the other codecs).

Determinism note for oracle-gated queries: baseline JPEG is lossy in
general, but an 8x8-block-constant image encoded with an all-ones
quantization table round-trips EXACTLY — such a block has only a DC
coefficient (an integer, ``8 * (v - 128)``), quantization at step 1 is
the identity, and the IDCT of a DC-only block is constant — so a SQL
oracle can pin every decoded pixel from the source data. The same
argument covers color: 4:4:4 with 8x8-block-constant planes, 4:2:0
with 16x16-MCU-constant planes (the 2x2 chroma mean and the
replication upsample are both identities on constants).

Reference parity: the reference repo has no media codecs; this extends
the engine's multimodal surface (SURVEY.md §2.3) the way a
training-data pipeline needs.
"""

from __future__ import annotations

import re
import struct

#: First non-stuffed marker = end of entropy-coded data (B.1.1.5).
_MARKER_RE = re.compile(rb"\xff[^\x00]")

# --- public constant tables from ITU-T T.81 ---------------------------------

#: Zigzag scan order: zigzag index -> raster index (Figure 5 / A.3.6).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance quantization table (quality ~50), raster order.
QUANT_ANNEX_K = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: All-ones table: quantization is the identity (near-lossless mode;
#: EXACTLY lossless on 8x8-block-constant rasters — see module doc).
QUANT_UNITY = [1] * 64

#: Annex K.3 typical luminance Huffman tables: BITS (codes per length
#: 1..16) and HUFFVAL (symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_HUFFVAL = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_HUFFVAL = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Annex K.2 chrominance quantization table (quality ~50), raster order.
QUANT_ANNEX_K_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 typical chrominance Huffman tables.
DC_BITS_CHROMA = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_HUFFVAL_CHROMA = list(range(12))
AC_BITS_CHROMA = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_HUFFVAL_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Progressive-scan AC Huffman table: every symbol an AC band scan can
#: emit — (run<<4)|size for run 0-15 / size 1-10, EOBn (r<<4) for
#: r 0-14, ZRL 0xF0 — as a flat 9-bit code (176 codes < 2^9, all-ones
#: prefix reserved, T.81 C.2-valid). Annex K's baseline AC tables lack
#: the EOBn symbols for n > 0 (baseline only ever emits EOB0), so
#: progressive encoders ship scan-specific tables; a fixed-length one
#: keeps this encoder simple at some size cost.
PROG_AC_HUFFVAL = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}
    | {0xF0}
)
PROG_AC_BITS = [0] * 8 + [len(PROG_AC_HUFFVAL)] + [0] * 7

JPEG_MAGIC = b"\xff\xd8"  # SOI

_M_SOI, _M_EOI, _M_SOS, _M_DQT, _M_DHT, _M_SOF0, _M_DRI = (
    0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xC0, 0xDD,
)
_M_SOF2 = 0xC2  # progressive DCT, Huffman (T.81 Annex G)


def _dct_matrix():
    """8x8 DCT-II basis A with A[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    F = A f A^T, f = A^T F A (T.81 A.3.3)."""
    import numpy as np

    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    a[0, :] = 1 / (2 * np.sqrt(2))
    return a


def _build_codes(bits, huffval):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2 — codes
    assigned in increasing length order, counting up within a length.
    Raises ValueError on a malformed table (BITS describing more codes
    than HUFFVAL supplies, or than length-N prefixes exist)."""
    if sum(bits) > len(huffval):
        raise ValueError("DHT BITS describe more codes than HUFFVAL holds")
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("DHT BITS overflow the prefix space")
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit stream with T.81 byte stuffing (0x00 after 0xFF)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:  # pad with 1s (T.81 F.1.2.3)
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


#: Decode-LUT cache keyed by the table's canonical item tuple — the
#: standard Annex-K tables repeat across blobs, so each worker builds
#: their LUTs once, not once per image.
_LUT_CACHE: dict = {}


def _build_lut(table: dict) -> list:
    """(code, length) -> symbol table to a flat 2^16-entry decode LUT:
    ``lut[next16bits] = (symbol << 5) | code_length`` (0 = invalid
    prefix). One list index replaces a bit-by-bit tree walk — the
    classic fast-Huffman layout; 16 is the spec's max code length."""
    import numpy as np

    key = tuple(sorted(table.items()))
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (code, length), sym in table.items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        lut[lo:hi] = (sym << 5) | length
    out = lut.tolist()
    if len(_LUT_CACHE) > 32:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


def _category(v: int) -> int:
    """Coefficient magnitude category (bit length of |v|)."""
    return abs(v).bit_length()


def _extend(value: int, size: int) -> int:
    """T.81 F.12 EXTEND: map ``size`` received bits to a signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def encode_jpeg_gray(pixels, quant=None, restart_interval: int = 0) -> bytes:
    """Grayscale (h, w) uint8 raster -> a GENUINE baseline JPEG
    (JFIF APP0, DQT, SOF0 1-component, Annex-K Huffman DHTs, SOS,
    entropy-coded scan with byte stuffing, EOI). ``quant`` is a 64-entry
    raster-order quantization table (default :data:`QUANT_ANNEX_K`;
    pass :data:`QUANT_UNITY` for the near-lossless mode).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (cyclic D0-D7) after every that-many MCUs: the bit stream is
    byte-aligned (1-padded) before each marker and the DC predictor
    resets after it — T.81 F.1.2.2.2, the camera-output resync feature
    real-world JPEGs carry."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    q = np.asarray(quant if quant is not None else QUANT_ANNEX_K, dtype=np.int32)
    bh, bw = -(-h // 8), -(-w // 8)
    # Edge replication padding (the common convention; any padding is
    # spec-legal since the decoder crops to (h, w)).
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0

    a = _dct_matrix()
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coefs = a @ blocks @ a.T  # F = A f A^T, broadcast over blocks
    quantized = np.rint(coefs / q.reshape(8, 8)).astype(np.int64)

    dc_codes = _build_codes(DC_BITS, DC_HUFFVAL)
    ac_codes = _build_codes(AC_BITS, AC_HUFFVAL)
    # Vectorized per-block prep: zigzag reorder, DC DPCM differences,
    # and last-nonzero-AC index across ALL blocks at once; the Python
    # loop below only walks actual nonzero coefficients.
    zz = np.asarray(ZIGZAG)
    flat_all = quantized.reshape(-1, 64)[:, zz]
    dcs = flat_all[:, 0]
    diffs = np.empty_like(dcs)
    diffs[0] = dcs[0]
    diffs[1:] = dcs[1:] - dcs[:-1]
    ri = int(restart_interval)
    if ri > 0:
        # DC prediction restarts from 0 after every RSTn
        diffs[ri::ri] = dcs[ri::ri]
    has_ac = (flat_all[:, 1:] != 0).any(axis=1)
    last_nz = np.where(
        has_ac, 63 - np.argmax(flat_all[:, :0:-1] != 0, axis=1), 0
    )
    writer = _BitWriter()
    write = writer.write
    eob_code, eob_len = ac_codes[0x00]
    zrl_code, zrl_len = ac_codes[0xF0]
    scan_parts = []
    for bi in range(flat_all.shape[0]):
        if ri > 0 and bi and bi % ri == 0:
            scan_parts.append(writer.flush())
            scan_parts.append(bytes([0xFF, 0xD0 + ((bi // ri - 1) & 7)]))
            writer = _BitWriter()
            write = writer.write
        diff = int(diffs[bi])
        s = _category(diff)
        code, length = dc_codes[s]
        write(code, length)
        if s:
            write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        end = int(last_nz[bi])
        run = 0
        row = flat_all[bi]
        for i in range(1, end + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                write(zrl_code, zrl_len)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            write(code, length)
            write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if end < 63:
            write(eob_code, eob_len)
    scan_parts.append(writer.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, huffval) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(huffval)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(_M_DQT, bytes([0x00]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    if ri > 0:
        out += seg(_M_DRI, struct.pack(">H", ri))
    out += seg(
        _M_SOF0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    out += seg(_M_DHT, dht(0x00, DC_BITS, DC_HUFFVAL))
    out += seg(_M_DHT, dht(0x10, AC_BITS, AC_HUFFVAL))
    out += seg(_M_SOS, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive DCT (T.81 Annex G) — encode side (scan-type coverage for
# the decoder's hermetic round-trip tests; spec-valid output)
# ---------------------------------------------------------------------------


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.1 — NOT an arithmetic shift for negatives)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_dc_first(writer, dc_codes, shifted_dcs):
    """DC first scan (Ah=0): DPCM diffs of the point-transformed DCs."""
    prev = 0
    for dc in shifted_dcs:
        diff = int(dc) - prev
        prev = int(dc)
        s = _category(diff)
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_ac_first(writer, ac_codes, rows, ss, se, al):
    """AC first scan for band [ss, se] at approximation Al, with EOBn
    run coding across blocks (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        while eobrun:
            chunk = min(eobrun, 32767)
            r = chunk.bit_length() - 1
            code, length = ac_codes[r << 4]
            writer.write(code, length)
            if r:
                writer.write(chunk - (1 << r), r)
            eobrun -= chunk

    zrl_code, zrl_len = ac_codes[0xF0]
    for row in rows:
        band = [_pt_ac(int(row[k]), al) for k in range(ss, se + 1)]
        last_nz = -1
        for i in range(len(band) - 1, -1, -1):
            if band[i]:
                last_nz = i
                break
        if last_nz < 0:
            eobrun += 1
            continue
        flush_eobrun()
        run = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.write(zrl_code, zrl_len)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < len(band) - 1:
            eobrun += 1
    flush_eobrun()


def _enc_ac_refine(writer, ac_codes, rows, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3 encode side, the cjpeg
    structure): newly-significant coefficients emit (run<<4)|1 + a
    sign bit; already-significant ones owe a correction bit, buffered
    and flushed after the next emitted symbol; all-insignificant
    tails fold into an EOBn run whose buffered correction bits flush
    with it."""
    # Two correction-bit buffers (the jcphuff.c structure): ``be`` =
    # bits owed to the PENDING EOB RUN (completed blocks' tails,
    # emitted right after the EOBn symbol), ``br`` = the CURRENT
    # block's in-flight bits (emitted right after the next ZRL /
    # newly-significant symbol). Conflating them interleaves another
    # block's bits into this block's symbol stream — decoder desync.
    eobrun = 0
    be: list[int] = []
    br: list[int] = []

    def emit_bits(buf):
        for b in buf:
            writer.write(b, 1)
        buf.clear()

    def flush_eobrun():
        nonlocal eobrun
        if not eobrun:
            return
        while eobrun:
            chunk = min(eobrun, 32767)
            r = chunk.bit_length() - 1
            code, length = ac_codes[r << 4]
            writer.write(code, length)
            if r:
                writer.write(chunk - (1 << r), r)
            eobrun -= chunk
        emit_bits(be)

    zrl_code, zrl_len = ac_codes[0xF0]
    for row in rows:
        vals = [int(row[k]) for k in range(ss, se + 1)]
        absvals = [(v if v >= 0 else -v) >> al for v in vals]
        eob = -1  # last newly-significant position in the band
        for i, t in enumerate(absvals):
            if t == 1:
                eob = i
        r = 0
        for i, t in enumerate(absvals):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eobrun()
                writer.write(zrl_code, zrl_len)
                r -= 16
                emit_bits(br)
            if t > 1:  # significant before this scan: correction bit
                br.append(t & 1)
                continue
            # newly significant (t == 1)
            flush_eobrun()
            code, length = ac_codes[(r << 4) | 1]
            writer.write(code, length)
            writer.write(1 if vals[i] >= 0 else 0, 1)
            emit_bits(br)
            r = 0
        if r > 0 or br:  # trailing zeros/bits fold into an EOB run
            eobrun += 1
            be.extend(br)
            br.clear()
            if eobrun == 32767:
                flush_eobrun()
    flush_eobrun()


def _enc_dc_refine(writer, shifted_dcs, al_bit):
    for dc in shifted_dcs:
        writer.write((int(dc) >> al_bit) & 1, 1)


def encode_jpeg_progressive_gray(pixels, quant=None) -> bytes:
    """Grayscale (h, w) uint8 raster -> a GENUINE progressive JPEG
    (SOF2) exercising all four scan types: DC first (Al=1), AC first
    for two spectral bands (Al=1), AC refinement for both bands
    (Ah=1, Al=0), DC refinement (Ah=1, Al=0). Fully refined, so the
    decoded image is bit-identical to the baseline encoding at the
    same quantization table."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    q = np.asarray(quant if quant is not None else QUANT_ANNEX_K, dtype=np.int32)
    bh, bw = -(-h // 8), -(-w // 8)
    rows = _plane_zigzag_coefs(px, q, bh, bw)
    dcs = rows[:, 0]

    dc_codes = _build_codes(DC_BITS, DC_HUFFVAL)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_HUFFVAL)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, huffval) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(huffval)

    def sos(comp_tbl, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_tbl)])
        for cid, td, ta in comp_tbl:
            body += bytes([cid, (td << 4) | ta])
        return seg(_M_SOS, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(_M_DQT, bytes([0x00]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    out += seg(_M_SOF2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(_M_DHT, dht(0x00, DC_BITS, DC_HUFFVAL))
    out += seg(_M_DHT, dht(0x10, PROG_AC_BITS, PROG_AC_HUFFVAL))

    def scan(enc, ss, se, ah, al):
        nonlocal out
        out += sos([(1, 0, 0)], ss, se, ah, al)
        wtr = _BitWriter()
        enc(wtr)
        out += wtr.flush()

    shifted = dcs >> 1  # numpy arithmetic shift (DC point transform)
    scan(lambda wr: _enc_dc_first(wr, dc_codes, shifted), 0, 0, 0, 1)
    scan(lambda wr: _enc_ac_first(wr, ac_codes, rows, 1, 5, 1), 1, 5, 0, 1)
    scan(lambda wr: _enc_ac_first(wr, ac_codes, rows, 6, 63, 1), 6, 63, 0, 1)
    scan(lambda wr: _enc_ac_refine(wr, ac_codes, rows, 1, 5, 0), 1, 5, 1, 0)
    scan(lambda wr: _enc_ac_refine(wr, ac_codes, rows, 6, 63, 0), 6, 63, 1, 0)
    scan(lambda wr: _enc_dc_refine(wr, dcs, 0), 0, 0, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_multiscan(
    y, cb, cr, quant_luma=None, quant_chroma=None, subsample=False
) -> bytes:
    """YCbCr planes -> a BASELINE (SOF0) color JPEG whose components
    arrive in THREE single-component sequential scans (T.81 A.2
    non-interleaved order) instead of one interleaved scan — the
    multi-scan baseline layout some encoders emit. Every block is
    fully coded (DC diff + run-length AC, Annex-K tables); per-scan
    DC predictors."""
    import numpy as np

    ql = np.asarray(
        quant_luma if quant_luma is not None else QUANT_ANNEX_K, dtype=np.int32
    )
    qc = np.asarray(
        quant_chroma if quant_chroma is not None else QUANT_ANNEX_K_CHROMA,
        dtype=np.int32,
    )
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if subsample:
        hy, vy = 2, 2

        def shrink(p):
            p = np.asarray(p, dtype=np.float64)
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            pad = np.empty((eh, ew), dtype=np.float64)
            pad[:h, :w] = p
            pad[h:, :w] = p[h - 1 : h, :]
            pad[:, w:] = pad[:, w - 1 : w]
            return (
                pad.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            ).round().astype(np.uint8)

        cb_p, cr_p = shrink(cb), shrink(cr)
    else:
        hy, vy = 1, 1
        cb_p = np.asarray(cb, dtype=np.uint8)
        cr_p = np.asarray(cr, dtype=np.uint8)

    hmax, vmax = hy, vy
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        {"px": y, "hv": (hy, vy), "q": ql, "tq": 0, "cid": 1},
        {"px": cb_p, "hv": (1, 1), "q": qc, "tq": 1, "cid": 2},
        {"px": cr_p, "hv": (1, 1), "q": qc, "tq": 1, "cid": 3},
    ]
    for p in planes:
        hi, vi = p["hv"]
        p["bw"], p["bh"] = mcux * hi, mcuy * vi
        p["rows"] = _plane_zigzag_coefs(p["px"], p["q"], p["bh"], p["bw"])

    dc_l = _build_codes(DC_BITS, DC_HUFFVAL)
    ac_l = _build_codes(AC_BITS, AC_HUFFVAL)
    dc_c = _build_codes(DC_BITS_CHROMA, DC_HUFFVAL_CHROMA)
    ac_c = _build_codes(AC_BITS_CHROMA, AC_HUFFVAL_CHROMA)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, huffval) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(huffval)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(_M_DQT, bytes([0x00]) + bytes(int(ql[ZIGZAG[i]]) for i in range(64)))
    out += seg(_M_DQT, bytes([0x01]) + bytes(int(qc[ZIGZAG[i]]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for p in planes:
        hi, vi = p["hv"]
        sof += bytes([p["cid"], (hi << 4) | vi, p["tq"]])
    out += seg(_M_SOF0, sof)
    out += seg(_M_DHT, dht(0x00, DC_BITS, DC_HUFFVAL))
    out += seg(_M_DHT, dht(0x10, AC_BITS, AC_HUFFVAL))
    out += seg(_M_DHT, dht(0x01, DC_BITS_CHROMA, DC_HUFFVAL_CHROMA))
    out += seg(_M_DHT, dht(0x11, AC_BITS_CHROMA, AC_HUFFVAL_CHROMA))

    for ci, p in enumerate(planes):
        dc_codes = dc_l if ci == 0 else dc_c
        ac_codes = ac_l if ci == 0 else ac_c
        td = ta = 0 if ci == 0 else 1
        out += seg(
            _M_SOS,
            bytes([1, p["cid"], (td << 4) | ta, 0, 63, 0]),
        )
        wtr = _BitWriter()
        prev = 0
        hi, vi = p["hv"]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        eob_code, eob_len = ac_codes[0x00]
        zrl_code, zrl_len = ac_codes[0xF0]
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                row = p["rows"][by * p["bw"] + bx]
                dc = int(row[0])
                diff = dc - prev
                prev = dc
                s = _category(diff)
                code, length = dc_codes[s]
                wtr.write(code, length)
                if s:
                    wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                last_nz = 0
                for i in range(63, 0, -1):
                    if row[i]:
                        last_nz = i
                        break
                run = 0
                for i in range(1, last_nz + 1):
                    v = int(row[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        wtr.write(zrl_code, zrl_len)
                        run -= 16
                    s = _category(v)
                    code, length = ac_codes[(run << 4) | s]
                    wtr.write(code, length)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    wtr.write(eob_code, eob_len)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_color(
    y, cb, cr, quant_luma=None, quant_chroma=None, subsample=False
) -> bytes:
    """YCbCr planes -> a progressive (SOF2) color JPEG: interleaved
    DC first scan over all three components, per-component AC first +
    AC refinement scans (progressive AC scans are single-component by
    G.1.1.1.1), interleaved DC refinement. ``subsample=True`` encodes
    4:2:0 (luma 2x2, chroma 1x1 on a half-resolution grid)."""
    import numpy as np

    ql = np.asarray(
        quant_luma if quant_luma is not None else QUANT_ANNEX_K, dtype=np.int32
    )
    qc = np.asarray(
        quant_chroma if quant_chroma is not None else QUANT_ANNEX_K_CHROMA,
        dtype=np.int32,
    )
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if subsample:
        hy, vy = 2, 2

        def shrink(p):
            p = np.asarray(p, dtype=np.float64)
            # average 2x2 cells over an edge-padded even grid
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            pad = np.empty((eh, ew), dtype=np.float64)
            pad[:h, :w] = p
            pad[h:, :w] = p[h - 1 : h, :]
            pad[:, w:] = pad[:, w - 1 : w]
            return (
                pad.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            ).round().astype(np.uint8)

        cb_p, cr_p = shrink(cb), shrink(cr)
    else:
        hy, vy = 1, 1
        cb_p = np.asarray(cb, dtype=np.uint8)
        cr_p = np.asarray(cr, dtype=np.uint8)

    hmax, vmax = hy, vy
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        {"px": y, "hv": (hy, vy), "q": ql, "tq": 0, "cid": 1},
        {"px": cb_p, "hv": (1, 1), "q": qc, "tq": 1, "cid": 2},
        {"px": cr_p, "hv": (1, 1), "q": qc, "tq": 1, "cid": 3},
    ]
    for p in planes:
        hi, vi = p["hv"]
        p["bw"], p["bh"] = mcux * hi, mcuy * vi
        p["rows"] = _plane_zigzag_coefs(p["px"], p["q"], p["bh"], p["bw"])

    dc_codes = _build_codes(DC_BITS, DC_HUFFVAL)
    dc_codes_c = _build_codes(DC_BITS_CHROMA, DC_HUFFVAL_CHROMA)
    # one shared progressive AC table (has the EOBn symbols Annex K
    # lacks); luma and chroma scans both reference table id 0
    ac_codes = ac_codes_c = _build_codes(PROG_AC_BITS, PROG_AC_HUFFVAL)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, huffval) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(huffval)

    def sos(comp_tbl, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_tbl)])
        for cid, td, ta in comp_tbl:
            body += bytes([cid, (td << 4) | ta])
        return seg(_M_SOS, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(_M_DQT, bytes([0x00]) + bytes(int(ql[ZIGZAG[i]]) for i in range(64)))
    out += seg(_M_DQT, bytes([0x01]) + bytes(int(qc[ZIGZAG[i]]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for p in planes:
        hi, vi = p["hv"]
        sof += bytes([p["cid"], (hi << 4) | vi, p["tq"]])
    out += seg(_M_SOF2, sof)
    out += seg(_M_DHT, dht(0x00, DC_BITS, DC_HUFFVAL))
    out += seg(_M_DHT, dht(0x10, PROG_AC_BITS, PROG_AC_HUFFVAL))
    out += seg(_M_DHT, dht(0x01, DC_BITS_CHROMA, DC_HUFFVAL_CHROMA))

    # interleaved DC first (Al=1): per-component DPCM in MCU order
    wtr = _BitWriter()
    prev = [0, 0, 0]
    al = 1
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(planes):
                hi, vi = p["hv"]
                codes = dc_codes if ci == 0 else dc_codes_c
                for v in range(vi):
                    for hh in range(hi):
                        bi = (my * vi + v) * p["bw"] + mx * hi + hh
                        dc = int(p["rows"][bi][0]) >> al
                        diff = dc - prev[ci]
                        prev[ci] = dc
                        s = _category(diff)
                        code, length = codes[s]
                        wtr.write(code, length)
                        if s:
                            wtr.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    out += wtr.flush()

    def comp_rows(p):
        """Blocks the single-component scans cover, row-major over the
        COMPONENT's own grid (matches the decoder's _block_units)."""
        hi, vi = p["hv"]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield p["rows"][by * p["bw"] + bx]

    for ci, p in enumerate(planes):
        codes = ac_codes if ci == 0 else ac_codes_c
        ta = 0  # shared progressive AC table
        out += sos([(p["cid"], 0, ta)], 1, 63, 0, 1)
        wtr = _BitWriter()
        _enc_ac_first(wtr, codes, list(comp_rows(p)), 1, 63, 1)
        out += wtr.flush()
    for ci, p in enumerate(planes):
        codes = ac_codes if ci == 0 else ac_codes_c
        ta = 0  # shared progressive AC table
        out += sos([(p["cid"], 0, ta)], 1, 63, 1, 0)
        wtr = _BitWriter()
        _enc_ac_refine(wtr, codes, list(comp_rows(p)), 1, 63, 0)
        out += wtr.flush()
    # interleaved DC refinement (Ah=1, Al=0): raw bit 0 per block
    wtr = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for p in planes:
                hi, vi = p["hv"]
                for v in range(vi):
                    for hh in range(hi):
                        bi = (my * vi + v) * p["bw"] + mx * hi + hh
                        wtr.write(int(p["rows"][bi][0]) & 1, 1)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _plane_zigzag_coefs(plane, quant, bh, bw):
    """Pad a uint8 plane to (bh*8, bw*8) by edge replication, DCT +
    quantize every block, and return the (bh*bw, 64) zigzag-ordered
    integer coefficients in raster block order."""
    import numpy as np

    px = np.asarray(plane, dtype=np.uint8)
    h, w = px.shape
    q = np.asarray(quant, dtype=np.int32)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0
    a = _dct_matrix()
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coefs = a @ blocks @ a.T
    quantized = np.rint(coefs / q.reshape(8, 8)).astype(np.int64)
    zz = np.asarray(ZIGZAG)
    return quantized.reshape(-1, 64)[:, zz]


def encode_jpeg_color(y, cb, cr, quant_luma=None, quant_chroma=None,
                      subsample=False) -> bytes:
    """Full-resolution (h, w) uint8 Y/Cb/Cr planes -> a GENUINE
    baseline YCbCr JPEG: SOF0 3-component frame, two DQTs (luma +
    chroma), four Annex-K DHTs, and one interleaved entropy-coded
    scan. ``subsample=False`` emits 4:4:4 (every component 1x1);
    ``subsample=True`` emits 4:2:0 (Y at 2x2, chroma reduced by a
    rounded 2x2 mean) — the two layouts that cover essentially all
    real-corpus color JPEGs. With unity quant tables and planes
    constant per MCU, the lossy format round-trips EXACTLY (DC-only
    blocks; same argument as the grayscale module doc)."""
    import numpy as np

    ypx = np.asarray(y, dtype=np.uint8)
    h, w = ypx.shape
    ql = list(quant_luma if quant_luma is not None else QUANT_ANNEX_K)
    qc = list(quant_chroma if quant_chroma is not None else QUANT_ANNEX_K_CHROMA)
    if subsample:
        hy = vy = 2

        def shrink(p):
            px = np.asarray(p, dtype=np.float64)
            hh = -(-px.shape[0] // 2) * 2
            ww = -(-px.shape[1] // 2) * 2
            pad = np.empty((hh, ww), dtype=np.float64)
            pad[: px.shape[0], : px.shape[1]] = px
            pad[px.shape[0] :, : px.shape[1]] = px[-1:, :]
            pad[:, px.shape[1] :] = pad[:, px.shape[1] - 1 : px.shape[1]]
            m = pad.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            return np.clip(np.rint(m), 0, 255).astype(np.uint8)

        cbp, crp = shrink(cb), shrink(cr)
    else:
        hy = vy = 1
        cbp = np.asarray(cb, dtype=np.uint8)
        crp = np.asarray(cr, dtype=np.uint8)
    mcux, mcuy = -(-w // (8 * hy)), -(-h // (8 * vy))
    planes = [
        (ypx, ql, hy, vy, 0),
        (cbp, qc, 1, 1, 1),
        (crp, qc, 1, 1, 1),
    ]
    coef_sets = [
        _plane_zigzag_coefs(px, q, mcuy * vi, mcux * hi)
        for px, q, hi, vi, _tq in planes
    ]
    # Vectorized last-nonzero-AC index per block (same trick as the
    # grayscale encoder) so the write loop only walks real coefficients.
    last_nz_sets = []
    for flat in coef_sets:
        has_ac = (flat[:, 1:] != 0).any(axis=1)
        last_nz_sets.append(
            np.where(has_ac, 63 - np.argmax(flat[:, :0:-1] != 0, axis=1), 0)
        )

    dc_luma = _build_codes(DC_BITS, DC_HUFFVAL)
    ac_luma = _build_codes(AC_BITS, AC_HUFFVAL)
    dc_chroma = _build_codes(DC_BITS_CHROMA, DC_HUFFVAL_CHROMA)
    ac_chroma = _build_codes(AC_BITS_CHROMA, AC_HUFFVAL_CHROMA)
    tables = [(dc_luma, ac_luma), (dc_chroma, ac_chroma), (dc_chroma, ac_chroma)]

    writer = _BitWriter()
    write = writer.write
    prev_dc = [0, 0, 0]

    def put_block(row, end, dc_codes, ac_codes, ci):
        diff = int(row[0]) - prev_dc[ci]
        prev_dc[ci] = int(row[0])
        s = _category(diff)
        code, length = dc_codes[s]
        write(code, length)
        if s:
            write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        zrl_code, zrl_len = ac_codes[0xF0]
        for i in range(1, end + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                write(zrl_code, zrl_len)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            write(code, length)
            write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if end < 63:
            code, length = ac_codes[0x00]
            write(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (px, q, hi, vi, _tq) in enumerate(planes):
                bwc = mcux * hi
                for v in range(vi):
                    for hh in range(hi):
                        bi = (my * vi + v) * bwc + mx * hi + hh
                        put_block(
                            coef_sets[ci][bi],
                            int(last_nz_sets[ci][bi]),
                            *tables[ci],
                            ci,
                        )
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, huffval) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(huffval)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(_M_DQT, bytes([0x00]) + bytes(ql[ZIGZAG[i]] for i in range(64)))
    out += seg(_M_DQT, bytes([0x01]) + bytes(qc[ZIGZAG[i]] for i in range(64)))
    out += seg(
        _M_SOF0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hy << 4) | vy, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    out += seg(_M_DHT, dht(0x00, DC_BITS, DC_HUFFVAL))
    out += seg(_M_DHT, dht(0x10, AC_BITS, AC_HUFFVAL))
    out += seg(_M_DHT, dht(0x01, DC_BITS_CHROMA, DC_HUFFVAL_CHROMA))
    out += seg(_M_DHT, dht(0x11, AC_BITS_CHROMA, AC_HUFFVAL_CHROMA))
    out += seg(
        _M_SOS,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def ycbcr_to_rgb(y, cb, cr):
    """JFIF YCbCr -> RGB (uint8 planes in, uint8 planes out): the
    public fixed conversion R = Y + 1.402(Cr-128), G = Y -
    0.344136(Cb-128) - 0.714136(Cr-128), B = Y + 1.772(Cb-128),
    rounded and clipped."""
    import numpy as np

    yf = np.asarray(y, dtype=np.float64)
    cbf = np.asarray(cb, dtype=np.float64) - 128.0
    crf = np.asarray(cr, dtype=np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(r), clip(g), clip(b)


def rgb_to_ycbcr(r, g, b):
    """JFIF RGB -> YCbCr (uint8 planes in, uint8 planes out): Y =
    0.299R + 0.587G + 0.114B, Cb = 128 - 0.168736R - 0.331264G +
    0.5B, Cr = 128 + 0.5R - 0.418688G - 0.081312B, rounded/clipped."""
    import numpy as np

    rf = np.asarray(r, dtype=np.float64)
    gf = np.asarray(g, dtype=np.float64)
    bf = np.asarray(b, dtype=np.float64)
    y = 0.299 * rf + 0.587 * gf + 0.114 * bf
    cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
    cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def decode_jpeg(data: bytes):
    """Parse a REAL JPEG into ``(width, height, planes)`` where
    ``planes`` is a list of row-major uint8 (h, w) arrays — one for
    grayscale, three (Y, Cb, Cr, chroma upsampled to full size by
    sample replication) for color. Handles baseline sequential (SOF0)
    interleaved scans AND progressive (SOF2, T.81 Annex G: DC/AC
    first + refinement scans, EOBn runs), with sampling factors 1-2
    in each direction (4:4:4, 4:2:2, 4:2:0). Returns ``None`` when
    the blob does not start with SOI (not a JPEG — the operator's
    null path); raises ``NotImplementedError`` at the codec's honest
    boundaries (lossless/hierarchical frames, 12-bit precision, >2x
    sampling factors, 16-bit quant tables) and ``ValueError`` on
    corrupt streams. Baseline multi-scan (non-interleaved) layouts
    decode through the same persistent-state machinery as progressive
    (r8). Restart intervals
    (DRI/RSTn — standard camera output) are fully supported: the
    entropy stream resyncs and DC predictors reset at every RSTn."""
    import numpy as np

    if len(data) < 4 or data[:2] != JPEG_MAGIC:
        return None
    pos = 2
    quant_tables: dict[int, list[int]] = {}
    huff_tables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    prog_state = None  # per frame component, persists across scans
    saw_eoi = False
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got 0x{data[pos]:02X}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2)
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no length
            pos += 2
            continue
        if marker == _M_EOI:
            if prog_state is not None:
                saw_eoi = True
                break  # all progressive scans landed; reconstruct below
            raise ValueError("EOI before SOS")
        if pos + 4 > len(data):
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + seg_len]
        if seg_len < 2 or len(payload) != seg_len - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        pos += 2 + seg_len
        if marker == _M_DQT:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT table")
                zz_table = payload[p + 1 : p + 65]
                raster = [0] * 64
                for i in range(64):
                    raster[ZIGZAG[i]] = zz_table[i]
                quant_tables[tq] = raster
                p += 65
        elif marker == _M_DHT:
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise ValueError("truncated DHT table")
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(payload[p + 17 : p + 17 + n])
                codes = _build_codes(bits, huffval)
                huff_tables[(tc, th)] = {
                    (c, ln): sym for sym, (c, ln) in codes.items()
                }
                p += 17 + n
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker 0x{marker:02X}); "
                "baseline sequential (SOF0) and progressive (SOF2) "
                "are supported"
            )
        elif marker in (_M_SOF0, _M_SOF2):
            progressive = marker == _M_SOF2
            if len(payload) < 6:
                raise ValueError("truncated SOF0 segment")
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG; grayscale and YCbCr only"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component list")
            comps = []
            for c in range(ncomp):
                cid = payload[6 + 3 * c]
                hv = payload[7 + 3 * c]
                tq = payload[8 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} (only 1-2 supported)"
                    )
                comps.append({"cid": cid, "h": hi, "v": vi, "tq": tq})
            if ncomp == 1 and (comps[0]["h"], comps[0]["v"]) != (1, 1):
                raise NotImplementedError("subsampled single component")
            frame = (w, h, comps)
        elif marker == _M_DRI:
            if len(payload) < 2:
                raise ValueError("truncated DRI segment")
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == _M_SOS:
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(payload) < 1:
                raise ValueError("truncated SOS segment")
            ns = payload[0]
            if ns < 1:
                raise ValueError("SOS with zero components")
            w, h, comps = frame
            if len(payload) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            by_cid = {c["cid"]: c for c in comps}

            if not progressive and ns == len(comps):
                scan_comps = []
                for s in range(ns):
                    cs = payload[1 + 2 * s]
                    td, ta = payload[2 + 2 * s] >> 4, payload[2 + 2 * s] & 0x0F
                    c = by_cid.get(cs)
                    if c is None:
                        raise ValueError(f"SOS component {cs} not in SOF0")
                    if c["tq"] not in quant_tables:
                        raise ValueError(
                            f"SOF references undefined DQT table {c['tq']}"
                        )
                    if (0, td) not in huff_tables or (1, ta) not in huff_tables:
                        raise ValueError(
                            f"SOS references undefined DHT table (dc={td}, ta={ta})"
                        )
                    scan_comps.append(
                        {
                            "h": c["h"],
                            "v": c["v"],
                            "quant": quant_tables[c["tq"]],
                            "dc": huff_tables[(0, td)],
                            "ac": huff_tables[(1, ta)],
                        }
                    )
                return _decode_scan(
                    data, pos, w, h, scan_comps, restart_interval
                )

            # multi-scan path: progressive scans, or BASELINE
            # non-interleaved scans (ns < frame components — each
            # component's blocks arrive fully coded in its own scan,
            # T.81 A.2.2). Both decode into persistent coefficient
            # state and continue the marker loop (DHT/DRI may redefine
            # between scans) until EOI.
            import numpy as np

            if prog_state is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                prog_state = {}
                for c in comps:
                    if c["tq"] not in quant_tables:
                        raise ValueError(
                            f"SOF references undefined DQT table {c['tq']}"
                        )
                    bwc, bhc = mcux * c["h"], mcuy * c["v"]
                    prog_state[c["cid"]] = {
                        "coefs": np.zeros((bhc * bwc, 64), dtype=np.int64),
                        "bw": bwc,
                        "bh": bhc,
                        "h": c["h"],
                        "v": c["v"],
                        "quant": quant_tables[c["tq"]],
                        "prev_dc": 0,
                        "dc_lut": None,
                        "ac_lut": None,
                    }
            ss_, se_ = payload[1 + 2 * ns], payload[2 + 2 * ns]
            approx = payload[3 + 2 * ns]
            ah_, al_ = approx >> 4, approx & 0x0F
            scan_states = []
            for s in range(ns):
                cs = payload[1 + 2 * s]
                td, ta = payload[2 + 2 * s] >> 4, payload[2 + 2 * s] & 0x0F
                st = prog_state.get(cs)
                if st is None:
                    raise ValueError(f"SOS component {cs} not in SOF")
                if not progressive or (ss_ == 0 and ah_ == 0):
                    # sequential scans and progressive DC-first need DC
                    if (0, td) not in huff_tables:
                        raise ValueError(
                            f"SOS references undefined DC DHT table {td}"
                        )
                    st["dc_lut"] = _build_lut(huff_tables[(0, td)])
                if not progressive or ss_ > 0:
                    # sequential scans and progressive AC scans need AC
                    if (1, ta) not in huff_tables:
                        raise ValueError(
                            f"SOS references undefined AC DHT table {ta}"
                        )
                    st["ac_lut"] = _build_lut(huff_tables[(1, ta)])
                scan_states.append(st)
            if progressive:
                pos = _decode_scan_progressive(
                    data, pos, frame, scan_states, ss_, se_, ah_, al_,
                    restart_interval,
                )
            else:
                pos = _decode_scan_sequential(
                    data, pos, frame, scan_states, restart_interval
                )
            continue
        # else: APPn/COM/etc — skipped via seg_len
    if prog_state is not None:
        # Strict pipeline semantics: a progressive stream without its
        # EOI is a truncated download, not a partially-refined preview
        # — raise rather than silently return a lower-fidelity image.
        if not saw_eoi:
            raise ValueError("truncated progressive stream (no EOI)")
        w, h, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        states = [prog_state[c["cid"]] for c in comps]
        quants = [st["quant"] for st in states]
        return w, h, _reconstruct(states, quants, w, h, hmax, vmax)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, w, h, comps, restart_interval: int = 0):
    """Entropy-decode an interleaved baseline scan and reconstruct.

    ``comps`` is the scan's component list ({h, v, quant, dc, ac} per
    component); a single-component scan is the 1-element case (MCU =
    one block, Hmax = Vmax = 1 — identical to the dedicated grayscale
    path this generalizes).

    Fast path: the scan is un-stuffed ONCE per restart segment
    (0xFF 0x00 -> 0xFF; legal because baseline entropy data contains
    no other 0xFF-started pair inside a segment), then read through
    16-bit-window integer peeks against the prefix LUTs — a handful of
    int ops per coefficient instead of a per-bit method-call walk.

    ``restart_interval`` > 0 (from DRI): the scan is split at RSTn
    markers into byte-aligned segments; after every that-many MCUs the
    reader jumps to the next segment and every component's DC
    predictor resets (T.81 F.2.2.5) — one corrupt segment in a real
    camera JPEG damages 8 MCU rows, not the rest of the image."""
    import numpy as np

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ri = int(restart_interval)
    if ri <= 0:
        # Entropy data ends at the first marker (0xFF followed by
        # anything but the stuffed 0x00).
        m = _MARKER_RE.search(data, pos)
        end = m.start() if m else len(data)
        segments = [data[pos:end].replace(b"\xff\x00", b"\xff")]
    else:
        # Split on RSTn (D0-D7, cyclic, no length field); the first
        # non-RST marker ends the scan.
        segments = []
        start = p = pos
        while True:
            m = _MARKER_RE.search(data, p)
            if m is None:
                segments.append(data[start:].replace(b"\xff\x00", b"\xff"))
                break
            segments.append(
                data[start : m.start()].replace(b"\xff\x00", b"\xff")
            )
            if 0xD0 <= data[m.start() + 1] <= 0xD7:
                start = p = m.start() + 2
            else:
                break
    seg_idx = 0
    entropy = segments[0]
    buf = entropy + b"\x00\x00\x00\x00"
    nbits_total = len(entropy) * 8

    zz = np.asarray(ZIGZAG)
    state = []  # per component: (coefs, blocks_w, dc_lut, ac_lut)
    for c in comps:
        bwc, bhc = mcux * c["h"], mcuy * c["v"]
        state.append(
            {
                "coefs": np.zeros((bhc * bwc, 64), dtype=np.int64),
                "bw": bwc,
                "bh": bhc,
                "dc_lut": _build_lut(c["dc"]),
                "ac_lut": _build_lut(c["ac"]),
                "prev_dc": 0,
                "h": c["h"],
                "v": c["v"],
            }
        )
    bitpos = 0
    from_bytes = int.from_bytes
    for my in range(mcuy):
        for mx in range(mcux):
            mi = my * mcux + mx
            if ri > 0 and mi and mi % ri == 0:
                if bitpos > nbits_total:
                    raise ValueError("entropy stream truncated")
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError(
                        f"missing RSTn marker before MCU {mi}"
                    )
                entropy = segments[seg_idx]
                buf = entropy + b"\x00\x00\x00\x00"
                nbits_total = len(entropy) * 8
                bitpos = 0
                for st in state:
                    st["prev_dc"] = 0
            for st in state:
                for v in range(st["v"]):
                    for hh in range(st["h"]):
                        if bitpos > nbits_total:
                            raise ValueError("entropy stream truncated")
                        dc_lut, ac_lut = st["dc_lut"], st["ac_lut"]
                        byteidx = bitpos >> 3
                        chunk = from_bytes(buf[byteidx : byteidx + 4], "big")
                        ent = dc_lut[(chunk >> (16 - (bitpos & 7))) & 0xFFFF]
                        if ent == 0:
                            raise ValueError("invalid Huffman code in scan")
                        s = ent >> 5
                        bitpos += ent & 31
                        if s:
                            byteidx = bitpos >> 3
                            chunk = from_bytes(
                                buf[byteidx : byteidx + 4], "big"
                            )
                            val = (chunk >> (32 - s - (bitpos & 7))) & (
                                (1 << s) - 1
                            )
                            bitpos += s
                            st["prev_dc"] += _extend(val, s)
                        bi = (my * st["v"] + v) * st["bw"] + mx * st["h"] + hh
                        block = st["coefs"][bi]
                        block[0] = st["prev_dc"]
                        i = 1
                        while i < 64:
                            byteidx = bitpos >> 3
                            chunk = from_bytes(
                                buf[byteidx : byteidx + 4], "big"
                            )
                            ent = ac_lut[(chunk >> (16 - (bitpos & 7))) & 0xFFFF]
                            if ent == 0:
                                raise ValueError("invalid Huffman code in scan")
                            sym = ent >> 5
                            bitpos += ent & 31
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                i += 16
                                continue
                            i += sym >> 4
                            size = sym & 0x0F
                            if i >= 64:
                                raise ValueError("AC run past block end")
                            byteidx = bitpos >> 3
                            chunk = from_bytes(
                                buf[byteidx : byteidx + 4], "big"
                            )
                            val = (chunk >> (32 - size - (bitpos & 7))) & (
                                (1 << size) - 1
                            )
                            bitpos += size
                            block[i] = _extend(val, size)
                            i += 1
    if bitpos > nbits_total:
        raise ValueError("entropy stream truncated")
    quants = [c["quant"] for c in comps]
    return w, h, _reconstruct(state, quants, w, h, hmax, vmax)


def _reconstruct(state, quants, w, h, hmax, vmax):
    """Dequantize + IDCT every component's zigzag coefficient blocks
    and crop/upsample to (h, w) planes — shared by the baseline and
    progressive paths (same math once all scans have landed)."""
    import numpy as np

    a = _dct_matrix()
    zz = np.asarray(ZIGZAG)
    planes = []
    for q64, st in zip(quants, state):
        q = np.asarray(q64, dtype=np.float64)
        dez = np.zeros((st["bh"] * st["bw"], 64), dtype=np.float64)
        dez[:, zz] = st["coefs"]  # de-zigzag, all blocks at once
        blocks = (dez * q).reshape(st["bh"], st["bw"], 8, 8)
        spatial = a.T @ blocks @ a  # f = A^T F A, broadcast over blocks
        raster = spatial.transpose(0, 2, 1, 3).reshape(
            st["bh"] * 8, st["bw"] * 8
        )
        plane = np.clip(np.rint(raster) + 128, 0, 255).astype(np.uint8)
        # Upsample subsampled chroma by replication, then crop.
        fy, fx = vmax // st["v"], hmax // st["h"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    return planes


# ---------------------------------------------------------------------------
# Progressive DCT (T.81 Annex G) — decode side
# ---------------------------------------------------------------------------


def _entropy_segments(data, pos, ri):
    """Split a scan's entropy data at RSTn markers, unstuffing each
    segment; returns ``(segments, end_pos)`` with ``end_pos`` the
    offset of the first non-RST marker after the scan (where the
    caller's marker loop resumes)."""
    if ri <= 0:
        m = _MARKER_RE.search(data, pos)
        end = m.start() if m else len(data)
        return [data[pos:end].replace(b"\xff\x00", b"\xff")], end
    segments = []
    start = p = pos
    while True:
        m = _MARKER_RE.search(data, p)
        if m is None:
            segments.append(data[start:].replace(b"\xff\x00", b"\xff"))
            return segments, len(data)
        segments.append(data[start : m.start()].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= data[m.start() + 1] <= 0xD7:
            start = p = m.start() + 2
        else:
            return segments, m.start()


class _ScanBits:
    """MSB-first bit reader over RST-segmented unstuffed entropy data,
    using the same 16-bit-window LUT peek as the baseline fast path.
    ``restart()`` jumps to the next RST segment (byte-aligned by
    construction) and ``finish()`` validates no segment over-read."""

    __slots__ = ("segments", "idx", "buf", "nbits", "pos")

    def __init__(self, segments):
        self.segments = segments
        self._load(0)

    def _load(self, i):
        if i >= len(self.segments):
            raise ValueError("missing RSTn marker in scan")
        self.idx = i
        ent = self.segments[i]
        self.buf = ent + b"\x00\x00\x00\x00"
        self.nbits = len(ent) * 8
        self.pos = 0

    def restart(self):
        self.finish()
        self._load(self.idx + 1)

    def finish(self):
        if self.pos > self.nbits:
            raise ValueError("entropy stream truncated")

    def decode(self, lut):
        byteidx = self.pos >> 3
        chunk = int.from_bytes(self.buf[byteidx : byteidx + 4], "big")
        ent = lut[(chunk >> (16 - (self.pos & 7))) & 0xFFFF]
        if ent == 0:
            raise ValueError("invalid Huffman code in scan")
        self.pos += ent & 31
        return ent >> 5

    def bits(self, n):
        if n == 0:
            return 0
        byteidx = self.pos >> 3
        chunk = int.from_bytes(self.buf[byteidx : byteidx + 4], "big")
        v = (chunk >> (32 - n - (self.pos & 7))) & ((1 << n) - 1)
        self.pos += n
        return v

    def bit(self):
        return self.bits(1)


def _block_units(scan_states, mcux, mcuy, w, h, hmax, vmax):
    """Yield the scan's block sequence, grouped per restart-countable
    unit (T.81 G: one MCU for interleaved scans, one block for
    single-component scans). Each unit is a list of (state, block_idx).

    Single-component scans iterate the COMPONENT's own block grid
    (ceil of its scaled dimensions), row-major — narrower than the
    padded interleaved grid when the image is not an exact multiple
    of the MCU size."""
    if len(scan_states) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for st in scan_states:
                    for v in range(st["v"]):
                        for hh in range(st["h"]):
                            unit.append(
                                (st, (my * st["v"] + v) * st["bw"] + mx * st["h"] + hh)
                            )
                yield unit
    else:
        st = scan_states[0]
        cw = -(-(w * st["h"]) // hmax)
        ch = -(-(h * st["v"]) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(st, by * st["bw"] + bx)]


def _decode_scan_sequential(data, pos, frame, scan_states, ri):
    """Entropy-decode ONE baseline sequential scan over a SUBSET of
    the frame's components (non-interleaved when ns == 1, partially
    interleaved otherwise — T.81 A.2) into the persistent coefficient
    state: every block arrives complete (DC diff + run-length AC),
    DC predictors reset per scan and at RSTn. Returns the position
    after the scan's entropy data."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segments, end = _entropy_segments(data, pos, ri)
    rd = _ScanBits(segments)
    for st in scan_states:
        st["prev_dc"] = 0
    units = _block_units(scan_states, mcux, mcuy, w, h, hmax, vmax)
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0:
            rd.restart()
            for st in scan_states:
                st["prev_dc"] = 0
        for st, bi in unit:
            block = st["coefs"][bi]
            s = rd.decode(st["dc_lut"])
            st["prev_dc"] += _extend(rd.bits(s), s) if s else 0
            block[0] = st["prev_dc"]
            k = 1
            while k < 64:
                rs = rd.decode(st["ac_lut"])
                r, sz = rs >> 4, rs & 15
                if sz == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                block[k] = _extend(rd.bits(sz), sz)
                k += 1
    rd.finish()
    return end


def _decode_scan_progressive(
    data, pos, frame, scan_states, ss, se, ah, al, ri
):
    """Entropy-decode ONE progressive scan into the frame's persistent
    coefficient state (T.81 G.2): DC first / DC refinement (interleaved
    or single-component) and AC first / AC refinement (single-component
    only, per G.1.1.1.1). Returns the stream position after the scan's
    entropy data."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segments, end = _entropy_segments(data, pos, ri)
    rd = _ScanBits(segments)
    units = _block_units(scan_states, mcux, mcuy, w, h, hmax, vmax)

    if ss == 0:  # DC scan (Se must be 0 per G.1.1.1.1)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        for st in scan_states:
            st["prev_dc"] = 0
        if ah == 0:  # first pass: Huffman diffs, shifted left Al
            for i, unit in enumerate(units):
                if ri and i and i % ri == 0:
                    rd.restart()
                    for st in scan_states:
                        st["prev_dc"] = 0
                for st, bi in unit:
                    s = rd.decode(st["dc_lut"])
                    st["prev_dc"] += _extend(rd.bits(s), s) if s else 0
                    st["coefs"][bi][0] = st["prev_dc"] << al
        else:  # refinement: one raw bit per block, OR into bit Al
            p1 = 1 << al
            for i, unit in enumerate(units):
                if ri and i and i % ri == 0:
                    rd.restart()
                for st, bi in unit:
                    if rd.bit():
                        st["coefs"][bi][0] |= p1
        rd.finish()
        return end

    # AC scan: single component only
    if len(scan_states) != 1:
        raise ValueError("progressive AC scan with multiple components")
    st = scan_states[0]
    ac_lut = st["ac_lut"]
    coefs = st["coefs"]
    eobrun = 0
    if ah == 0:  # AC first pass for this band
        for i, unit in enumerate(units):
            if ri and i and i % ri == 0:
                rd.restart()
                eobrun = 0
            if eobrun:
                eobrun -= 1
                continue
            block = coefs[unit[0][1]]
            k = ss
            while k <= se:
                rs = rd.decode(ac_lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:  # EOBn: run of (1<<r) + extra blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                block[k] = _extend(rd.bits(s), s) << al
                k += 1
    else:  # AC refinement (G.1.2.3)
        p1, m1 = 1 << al, -1 << al

        def correct(block, k):
            if rd.bit() and not (block[k] & p1):
                block[k] += p1 if block[k] >= 0 else m1

        for i, unit in enumerate(units):
            if ri and i and i % ri == 0:
                rd.restart()
                eobrun = 0
            block = coefs[unit[0][1]]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rd.decode(ac_lut)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.bits(r)
                            break  # rest of block handled as EOB below
                        # r == 15, s == 0: skip 16 zero-history coefs
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude in AC scan"
                            )
                        newval = p1 if rd.bit() else m1
                    # advance past r zero-history coefficients, emitting
                    # correction bits for nonzero-history ones passed
                    while k <= se:
                        if block[k] != 0:
                            correct(block, k)
                        else:
                            if r == 0:
                                if newval:
                                    block[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                # inside an EOB run: correction bits only, for every
                # nonzero-history coefficient left in the band
                while k <= se:
                    if block[k] != 0:
                        correct(block, k)
                    k += 1
                eobrun -= 1
    rd.finish()
    return end


def decode_jpeg_gray(data: bytes):
    """Grayscale view of :func:`decode_jpeg`: ``(width, height, gray)``
    with ``gray`` the luma plane — the Y channel for color JPEGs, the
    single component for grayscale ones. ``None`` for non-JPEG blobs."""
    out = decode_jpeg(data)
    if out is None:
        return None
    w, h, planes = out
    return w, h, planes[0]
