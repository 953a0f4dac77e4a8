"""Pure-Python baseline + progressive JPEG codec (stdlib + numpy).

Completes the multimodal pixel surface: with BMP/PPM (raw), PNG
(DEFLATE + filters) and GIF (LZW) already real, JPEG's entropy-coded
DCT pixels were the last stub.  Everything here is from the public
ITU-T T.81 specification: the 8x8 DCT-II, Annex-K quantization and
Huffman tables, zigzag ordering, DC prediction, AC run-length with
ZRL/EOB, byte stuffing, restart markers, and the Annex-G progressive
modes (spectral selection, successive approximation, EOB runs).

Scope (stated honestly):

* encode: baseline sequential (``encode_jpeg``) and progressive
  (``encode_jpeg_progressive``, libjpeg's default 10-scan script),
  8-bit YCbCr 4:4:4, one block interleave — every decoder reads both.
* decode: baseline sequential (SOF0/SOF1) AND progressive (SOF2), with
  per-component sampling factors 1 or 2 (so 4:4:4, 4:2:2 and 4:2:0
  streams all decode), restart markers honored, multi-scan coefficient
  accumulation with EOBn runs.  Arithmetic coding and hierarchical
  modes raise ``ValueError`` — loud, not wrong.

The transform runs as numpy matrix products per 8x8 block; this codec
exists for correctness (oracle fixtures, round-trip property tests) and
executor-side decode of modest images — a production pipeline would
swap in libjpeg-turbo behind the same ``decode_jpeg_pixels`` contract.
"""

from __future__ import annotations

import numpy as np

# --- shared constant tables (ITU-T T.81 Annex K, public) -------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)

QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# (bits[1..16], values) per Annex K
DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: row u, col x
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _D[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _D @ block @ _D.T


def _idct2(coefs: np.ndarray) -> np.ndarray:
    return _D.T @ coefs @ _D


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scale mapping, clamped to [1, 255]."""
    q = min(max(quality, 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a (bits, huffval) table."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v >= 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 90) -> bytes:
    """Baseline JFIF encoder: 8-bit YCbCr 4:4:4, Annex-K Huffman tables,
    one interleaved scan.  ``rgb`` is top-down width*height*3 bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if width <= 0 or height <= 0 or width > 65535 or height > 65535:
        raise ValueError("jpeg: dimensions out of range")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    ycc = rgb_to_ycbcr(img)

    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)
    dc_codes = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS), _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS), _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    # pad to 8x8 multiples by edge replication
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]
    padded[:, width:] = padded[:, width - 1 : width]

    w = _BitWriter()
    dc_prev = [0, 0, 0]
    qts = [qt_l, qt_c, qt_c]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                tbl = 0 if comp == 0 else 1
                block = padded[by : by + 8, bx : bx + 8, comp] - 128.0
                coefs = _dct2(block)
                q = np.round(coefs.flatten() / qts[comp].reshape(8, 8).flatten()).astype(int)
                zz = q[ZIGZAG]
                diff = int(zz[0]) - dc_prev[comp]
                dc_prev[comp] = int(zz[0])
                size, amp = _magnitude(diff)
                code, ln = dc_codes[tbl][size]
                w.write(code, ln)
                if size:
                    w.write(amp, size)
                run = 0
                last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[tbl][0xF0]  # ZRL
                        w.write(code, ln)
                        run -= 16
                    size, amp = _magnitude(v)
                    code, ln = ac_codes[tbl][(run << 4) | size]
                    w.write(code, ln)
                    w.write(amp, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[tbl][0x00]  # EOB
                    w.write(code, ln)
    w.flush()

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return _marker(0xDB, bytes([tid]) + bytes(int(x) for x in qt.flatten()[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:]) + bytes(vals))

    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + _marker(0xC0, sof)
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + _marker(0xDA, sos)
        + bytes(w.out)
        + b"\xff\xd9"
    )


def _quantized_blocks(
    width: int, height: int, rgb: bytes, quality: int
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray, int, int]:
    """Shared encoder front-end: (per-component (hb, wb, 64) zigzag
    coefficient grids, luma QT, chroma QT, hb, wb) for 8-bit YCbCr
    4:4:4 input."""
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    ycc = rgb_to_ycbcr(img)
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]
    padded[:, width:] = padded[:, width - 1 : width]
    hb, wb = ph // 8, pw // 8
    out = []
    qts = [qt_l, qt_c, qt_c]
    for comp in range(3):
        grid = np.zeros((hb, wb, 64), dtype=np.int64)
        for by in range(hb):
            for bx in range(wb):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp] - 128.0
                q = np.round(
                    _dct2(block).flatten() / qts[comp].reshape(8, 8).flatten()
                ).astype(np.int64)
                grid[by, bx] = q[ZIGZAG]
        out.append(grid)
    return out, qt_l, qt_c, hb, wb


# libjpeg's default progressive scan script for 3-component YCbCr
# (jcparam.c, public): spectral selection + two successive-approximation
# levels for luma AC, one for chroma, split DC first/refine.
_PROG_SCRIPT = (
    ([0, 1, 2], 0, 0, 0, 1),  # DC first, Al=1
    ([0], 1, 5, 0, 2),  # luma AC 1-5 first, Al=2
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),  # luma AC 6-63 first, Al=2
    ([0], 1, 63, 2, 1),  # luma AC refine Al 2->1
    ([0, 1, 2], 0, 0, 1, 0),  # DC refine
    ([0], 1, 63, 1, 0),  # luma AC refine Al 1->0
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
)


def _emit_ac_first(w: _BitWriter, codes, block, ss: int, se: int, al: int) -> None:
    """AC first-pass scan for one block band (point transform Al),
    per-block EOB0 (no EOBn accumulation, so Annex-K tables suffice)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(block[k])
        vals.append((abs(v) >> al) * (1 if v >= 0 else -1))
    last_nz = -1
    for j, v in enumerate(vals):
        if v:
            last_nz = j
    run = 0
    for j in range(last_nz + 1):
        v = vals[j]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = codes[0xF0]
            w.write(c, ln)
            run -= 16
        size, amp = _magnitude(v)
        c, ln = codes[(run << 4) | size]
        w.write(c, ln)
        w.write(amp, size)
        run = 0
    if last_nz < se - ss:
        c, ln = codes[0x00]
        w.write(c, ln)


def _emit_ac_refine(w: _BitWriter, codes, block, ss: int, se: int, al: int) -> None:
    """AC refinement scan for one block band (T.81 G.1.2.3): each
    newly-significant coefficient (magnitude exactly 1 at this
    precision) codes (zero_run<<4)|1 plus a sign bit; history
    coefficients crossed contribute one correction bit each, emitted
    POSITIONALLY — interleaved exactly where the decoder's walk reads
    them (after the symbol whose run crosses the coefficient);
    trailing band content closes with a per-block EOB0 followed by the
    remaining history corrections."""
    temps = [abs(int(block[p])) >> al for p in range(ss, se + 1)]

    def t(pos: int) -> int:
        return temps[pos - ss]

    newly = [p for p in range(ss, se + 1) if t(p) == 1]
    k = ss
    for j in newly:
        run = sum(1 for p in range(k, j) if t(p) == 0)
        while run > 15:
            c, ln = codes[0xF0]
            w.write(c, ln)
            zeros = 0  # mirror the decoder: cross history coefficients
            while zeros < 16:  # until the 16th zero is consumed
                if t(k) == 0:
                    zeros += 1
                else:
                    w.write(t(k) & 1, 1)
                k += 1
            run -= 16
        c, ln = codes[(run << 4) | 1]
        w.write(c, ln)
        w.write(1 if int(block[j]) > 0 else 0, 1)
        for p in range(k, j):
            if t(p) > 1:
                w.write(t(p) & 1, 1)
        k = j + 1
    if k <= se:  # the decoder will read one more symbol: close the band
        c, ln = codes[0x00]
        w.write(c, ln)
        for p in range(k, se + 1):
            if t(p) > 1:
                w.write(t(p) & 1, 1)


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, quality: int = 90
) -> bytes:
    """Progressive JFIF encoder (SOF2): 8-bit YCbCr 4:4:4, Annex-K
    tables, libjpeg's default 10-scan script — spectral selection plus
    successive approximation on both DC and AC.  Emits the SAME
    quantized coefficients as :func:`encode_jpeg`, so decoding both
    must produce bit-identical pixels (the round-trip oracle)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if width <= 0 or height <= 0 or width > 65535 or height > 65535:
        raise ValueError("jpeg: dimensions out of range")
    grids, qt_l, qt_c, hb, wb = _quantized_blocks(width, height, rgb, quality)
    dc_codes = [
        _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
        _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    ac_codes = [
        _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
        _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    ]

    scans = []
    for comp_list, ss, se, ah, al in _PROG_SCRIPT:
        w = _BitWriter()
        if ss == 0 and ah == 0:  # DC first: interleaved over comps
            dc_prev = [0, 0, 0]
            for by in range(hb):
                for bx in range(wb):
                    for comp in comp_list:
                        tbl = 0 if comp == 0 else 1
                        v = int(grids[comp][by, bx, 0]) >> al  # arithmetic
                        diff = v - dc_prev[comp]
                        dc_prev[comp] = v
                        size, amp = _magnitude(diff)
                        c, ln = dc_codes[tbl][size]
                        w.write(c, ln)
                        if size:
                            w.write(amp, size)
        elif ss == 0:  # DC refine: one bit per block per comp
            for by in range(hb):
                for bx in range(wb):
                    for comp in comp_list:
                        w.write((int(grids[comp][by, bx, 0]) >> al) & 1, 1)
        else:
            comp = comp_list[0]
            tbl = 0 if comp == 0 else 1
            for by in range(hb):
                for bx in range(wb):
                    block = grids[comp][by, bx]
                    if ah == 0:
                        _emit_ac_first(w, ac_codes[tbl], block, ss, se, al)
                    else:
                        _emit_ac_refine(w, ac_codes[tbl], block, ss, se, al)
        w.flush()
        ns = len(comp_list)
        hdr = bytes([ns])
        for comp in comp_list:
            dc_tid = 0 if comp == 0 else 1
            ac_tid = 0 if comp == 0 else 1
            hdr += bytes([comp + 1, (dc_tid << 4) | ac_tid])
        hdr += bytes([ss, se, (ah << 4) | al])
        scans.append(_marker(0xDA, hdr) + bytes(w.out))

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return _marker(0xDB, bytes([tid]) + bytes(int(x) for x in qt.flatten()[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:]) + bytes(vals))

    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + _marker(0xC2, sof)
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + b"".join(scans)
        + b"\xff\xd9"
    )


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte-stuffing
    removal; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller resyncs
            else:
                return False  # EOI / next segment
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("jpeg: entropy stream exhausted")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def skip_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


def _read_huff_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _decode_seq_block(r, huff, dc_tid: int, ac_tid: int, block, dc_prev: list, ci: int) -> None:
    """Baseline sequential DC+AC for one block into zigzag array ``block``."""
    size = _read_huff_symbol(r, huff[(0, dc_tid)])
    diff = _extend(r.read_bits(size), size)
    dc_prev[ci] += diff
    block[0] = dc_prev[ci]
    k = 1
    while k < 64:
        rs = _read_huff_symbol(r, huff[(1, ac_tid)])
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        block[k] = _extend(r.read_bits(rs & 0xF), rs & 0xF)
        k += 1


def _decode_ac_first(r, table, block, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first pass (T.81 G.2.2) for one block; returns the
    updated end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff_symbol(r, table)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr < 15:  # EOBn: run of 2^rr + extra bits blocks
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.read_bits(rr)
                break
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("jpeg: AC index overflow in progressive scan")
        block[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(r, table, block, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement (T.81 G.2.3; the stb_image walk): each
    history coefficient crossed reads one correction bit; zero-history
    positions count toward the run; returns the updated EOB run."""
    bit = 1 << al

    def refine(k: int) -> None:
        if r.read_bit() and (block[k] & bit) == 0:
            block[k] += bit if block[k] > 0 else -bit

    if eobrun > 0:
        for k in range(ss, se + 1):
            if block[k] != 0:
                refine(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff_symbol(r, table)
        rr, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if rr < 15:  # EOBn: refine the rest of this band, then run
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.read_bits(rr)
                rr = 64  # walk to band end refining history coefficients
            # rr == 15 (ZRL): skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("jpeg: refinement magnitude must be 1")
            newval = bit if r.read_bit() else -bit
        while k <= se:
            if block[k] != 0:
                refine(k)
            else:
                if rr == 0:
                    if newval:
                        block[k] = newval
                    k += 1
                    break
                rr -= 1
            k += 1
    return eobrun


def decode_jpeg_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from a baseline sequential
    (SOF0/SOF1) or progressive (SOF2) JPEG.  Sampling factors 1-2 per
    component (4:4:4 / 4:2:2 / 4:2:0), restart markers honored,
    progressive spectral-selection and successive-approximation scans
    (DC first/refine, AC first/refine with EOB runs) fully decoded;
    arithmetic-coded and hierarchical streams raise.

    Architecture: every scan decodes into per-component zigzag
    COEFFICIENT grids; dequantization + one vectorized IDCT over all
    blocks happens once at EOI (so baseline is just the one-scan
    special case of the multi-scan engine)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qt_id)
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] = []  # per comp: (bh, bw, 64) zigzag coefficients
    geom: list[tuple[int, int]] = []  # per comp: non-interleaved (hb, wb)
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    i = 2
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:
            break
        if i + 4 > len(data):
            raise ValueError("jpeg: truncated segment")
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        body = data[i + 4 : i + 2 + seglen]
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: unsupported SOF marker 0x{marker:02x}")
        if marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            n = body[5]
            comps = []
            for c in range(n):
                cid, hv, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            if any(not (1 <= h <= 2 and 1 <= v <= 2) for _, h, v, _ in comps):
                raise ValueError("jpeg: sampling factors beyond 2 not supported")
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            coef = []
            geom = []
            for _, h, v, _ in comps:
                coef.append(np.zeros((mcuy * v, mcux * h, 64), dtype=np.int64))
                cw = (width * h + hmax - 1) // hmax
                chh = (height * v + vmax - 1) // vmax
                geom.append(((chh + 7) // 8, (cw + 7) // 8))
        elif marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tid = body[j] >> 4, body[j] & 0xF
                j += 1
                if pq == 0:
                    vals = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                else:
                    vals = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                qt = np.zeros(64, dtype=np.int32)
                qt[ZIGZAG] = vals
                qts[tid] = qt
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = [0] + list(body[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(body[j + 17 : j + 17 + nvals])
                huff[(cls, tid)] = _decode_table(bits, vals)
                j += 17 + nvals
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if not comps:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            byid = {c[0]: k for k, c in enumerate(comps)}
            scan_comps = []  # (comp_idx, dc_tid, ac_tid)
            for s in range(ns):
                cid, tids = body[1 + 2 * s], body[2 + 2 * s]
                scan_comps.append((byid[cid], tids >> 4, tids & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("jpeg: progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("jpeg: progressive AC scan must be single-component")
                if se > 63 or ss > se:
                    raise ValueError("jpeg: invalid spectral band")
            r = _BitReader(data, i + 2 + seglen)
            if ns > 1:
                # interleaved MCU walk: baseline full-band, or
                # progressive DC (first or refine) over all scan comps
                dc_prev = [0] * len(comps)
                count = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_interval and count and count % restart_interval == 0:
                            r.skip_restart()
                            dc_prev = [0] * len(comps)
                        for ci, dc_tid, ac_tid in scan_comps:
                            _, h, v, _ = comps[ci]
                            for vy in range(v):
                                for vx in range(h):
                                    block = coef[ci][my * v + vy, mx * h + vx]
                                    if not progressive:
                                        _decode_seq_block(
                                            r, huff, dc_tid, ac_tid, block, dc_prev, ci
                                        )
                                    elif ah == 0:
                                        size = _read_huff_symbol(r, huff[(0, dc_tid)])
                                        dc_prev[ci] += _extend(r.read_bits(size), size)
                                        block[0] = dc_prev[ci] << al
                                    else:
                                        if r.read_bit():
                                            block[0] += 1 << al
                        count += 1
            else:
                # non-interleaved walk over ONE component's block grid
                # (progressive AC scans; also single-component DC scans)
                ci, dc_tid, ac_tid = scan_comps[0]
                hb, wb = geom[ci]
                dc_prev = [0] * len(comps)
                eobrun = 0
                count = 0
                for by in range(hb):
                    for bx in range(wb):
                        if restart_interval and count and count % restart_interval == 0:
                            r.skip_restart()
                            dc_prev = [0] * len(comps)
                            eobrun = 0
                        block = coef[ci][by, bx]
                        if not progressive:
                            _decode_seq_block(
                                r, huff, dc_tid, ac_tid, block, dc_prev, ci
                            )
                        elif ss == 0:
                            if ah == 0:
                                size = _read_huff_symbol(r, huff[(0, dc_tid)])
                                dc_prev[ci] += _extend(r.read_bits(size), size)
                                block[0] = dc_prev[ci] << al
                            else:
                                if r.read_bit():
                                    block[0] += 1 << al
                        elif ah == 0:
                            eobrun = _decode_ac_first(
                                r, huff[(1, ac_tid)], block, ss, se, al, eobrun
                            )
                        else:
                            eobrun = _decode_ac_refine(
                                r, huff[(1, ac_tid)], block, ss, se, al, eobrun
                            )
                        count += 1
            saw_scan = True
            # resync the parser at the next marker after the entropy data
            p = r.pos
            while p + 1 < len(data) and not (
                data[p] == 0xFF
                and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)
            ):
                p += 1
            i = p
            continue
        i += 2 + seglen
    if width is None or not saw_scan:
        raise ValueError("jpeg: missing SOF/SOS")

    # one dequantize + vectorized IDCT pass over every block, per comp
    planes = []
    for ci, (_, h, v, qid) in enumerate(comps):
        qt = qts[qid]
        bh, bw = coef[ci].shape[:2]
        zz = coef[ci].reshape(-1, 64)
        nat = np.zeros((zz.shape[0], 64))
        nat[:, ZIGZAG] = zz * qt[ZIGZAG]
        blocks = np.einsum(
            "ij,njk,kl->nil", _D.T, nat.reshape(-1, 8, 8), _D
        ) + 128.0
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        planes.append(plane)

    # upsample subsampled chroma planes to full resolution and crop
    full = []
    for ci, (_, h, v, _) in enumerate(comps):
        p = planes[ci]
        if h < hmax:
            p = np.repeat(p, hmax // h, axis=1)
        if v < vmax:
            p = np.repeat(p, vmax // v, axis=0)
        full.append(p[:height, :width])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        rgb = ycbcr_to_rgb(np.stack(full[:3], axis=-1))
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
