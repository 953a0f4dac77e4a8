"""Binary (image/audio/video) columns as first-class data.

Design: media is an opaque ``binary`` column plus a typed metadata struct
(mime, n_bytes, source).  Heavy per-item work (decode, resize, frame
sampling, feature extraction) runs as Arrow-batched ``mapInPandas`` — the
only sane shape at 100 TB: batches stream through Python workers without
per-row pickling, partitions process independently, and the decode library
never touches the JVM.

No image/audio *codec* library is installed in this environment, but
container-format headers are public byte layouts — so ``sniff_mime``
(magic numbers) and ``decode_image`` (PNG/GIF/BMP/JPEG/TIFF/WAV header
parsing, incl. the TIFF IFD walk in both byte orders) are REAL: they
read actual widths/heights/sample-rates from the offsets each format
specifies.  Pixel-level decode and resize are REAL for all five image
formats: 24-bit BMP and P6 PPM (raw pixel arrays at header offsets),
8- and 16-bit PNG of every color type (stdlib ``zlib`` inflate + the
public five-filter scanline prediction, ``decode_png_pixels``), GIF
(pure-Python LZW table decode incl. interlace, local color tables, and
multi-frame animations, ``decode_gif_pixels`` /
``_gif_decode_all_frames``), and baseline + progressive JPEG (full
T.81 DCT/Huffman codec in ``jpeg_codec.py``, sampling factors to
4:2:0, restart markers, spectral-selection and
successive-approximation scans).  Audio is real 16-bit PCM WAV decode
plus windowed DSP (energy / zero-crossings); video is MJPEG AVI and
animated-GIF frame sampling.  ``deterministic_fake=True`` remains only
for variants outside the decodable set (arithmetic-coded JPEG,
1/2/4-bit PNG) so plumbing tests never depend on content.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_fake_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic stand-in media: 16 md5 bytes of the text as the
    ``data`` blob + metadata columns.  At scale this column would come
    from the lakehouse (parquet/iceberg binary column or object-store
    pointers resolved by a fetch stage)."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.unhex(F.md5(F.col(text_col))).alias("data"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(16).cast("long").alias("n_bytes"),
    )


def sniff_mime(data: bytes) -> str:
    """Magic-number MIME sniffing — the dispatch step every multimodal
    ingest pipeline runs before routing blobs to format-specific
    decoders.  Pure header reads; no library needed."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if data[:2] == b"P6" and (len(data) > 2 and data[2:3].isspace()):
        return "image/x-portable-pixmap"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "video/avi"
    if data[4:8] == b"ftyp":
        return "video/mp4"
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "audio/mpeg"
    return "application/octet-stream"


def decode_image(data: bytes, deterministic_fake: bool = False) -> tuple[int, int]:
    """Decode an image's (width, height) from its container header.

    REAL for PNG / GIF / BMP / JPEG — these dimensions live at fixed,
    publicly specified header offsets (PNG IHDR big-endian at byte 16;
    GIF little-endian at byte 6; BMP BITMAPINFOHEADER little-endian at
    byte 18; JPEG in the first SOF0/1/2 marker segment).  Header-only:
    no pixel decoding happens here — pixel-level ops live in
    ``decode_pixels`` / ``resize_image``, which are real for all five
    formats.

    For unrecognized formats: raises ``NotImplementedError`` unless
    ``deterministic_fake=True``, which derives a plausible shape from
    the first two bytes so downstream plumbing is exercised end-to-end.
    """
    mime = sniff_mime(data)
    if mime == "image/png" and len(data) >= 24:
        return (
            int.from_bytes(data[16:20], "big"),
            int.from_bytes(data[20:24], "big"),
        )
    if mime == "image/gif" and len(data) >= 10:
        return (
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
        )
    if mime == "image/x-portable-pixmap":
        try:
            w, h, _, _ = _ppm_header(data)
            return (w, h)
        except ValueError:
            if not deterministic_fake:
                raise
    if mime == "image/bmp" and len(data) >= 26:
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        # height may legally be negative (top-down row order); width may not
        if w > 0:
            return (w, abs(h))
        if not deterministic_fake:
            raise ValueError("bmp: non-positive width in header")
    if mime == "image/tiff":
        try:
            w, h = _tiff_dimensions(data)
            return (w, h)
        except ValueError:
            if not deterministic_fake:
                raise
    if mime == "image/jpeg":
        # walk marker segments to the first start-of-frame (SOF0/1/2)
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            # 0xFF fill/padding bytes are legal between segments — skip runs
            while i + 2 < len(data) and data[i + 1] == 0xFF:
                i += 1
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                if i + 9 > len(data):
                    break
                return (
                    int.from_bytes(data[i + 7 : i + 9], "big"),
                    int.from_bytes(data[i + 5 : i + 7], "big"),
                )
            if marker in (0xD9, 0xDA):
                # EOI, or SOS: entropy-coded data follows — stop walking
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
            else:
                i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        if not deterministic_fake:
            raise ValueError("jpeg: no SOF marker found in header")
    if not deterministic_fake:
        raise NotImplementedError(
            f"no header parser for {mime}; "
            "pass deterministic_fake=True for the plumbing-test decoder"
        )
    return (64 + data[0] % 64, 64 + data[1] % 64)


def _wav_fmt_fields(data: bytes) -> tuple[int, int, int, int]:
    """(format_tag, channels, sample_rate, bits_per_sample) from the
    located ``fmt `` chunk — walks RIFF chunks rather than assuming the
    fmt chunk sits at a fixed offset, so legal pre-fmt chunks (LIST,
    bext, …) don't break parsing."""
    if sniff_mime(data) != "audio/wav":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(data):
            return (
                int.from_bytes(data[i + 8 : i + 10], "little"),
                int.from_bytes(data[i + 10 : i + 12], "little"),
                int.from_bytes(data[i + 12 : i + 16], "little"),
                int.from_bytes(data[i + 22 : i + 24], "little"),
            )
        i += 8 + size + (size % 2)
    raise ValueError("wav: no fmt chunk found")


def decode_wav_meta(data: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, bits_per_sample) from a WAV fmt chunk."""
    _, channels, rate, bits = _wav_fmt_fields(data)
    return channels, rate, bits


def decode_wav_samples(data: bytes) -> tuple[int, int, int, list[int]]:
    """(channels, sample_rate, bits_per_sample, interleaved samples) from
    a PCM WAV — REAL sample decode: PCM data is raw little-endian
    integers in the ``data`` chunk, no codec needed.  8-bit samples are
    unsigned per the spec and returned as-is (0..255); 16-bit are signed.
    Compressed WAV variants (format tag != 1) raise."""
    fmt_tag, channels, rate, bits = _wav_fmt_fields(data)
    if fmt_tag != 1:
        raise ValueError(f"wav: only PCM (format 1) decodable, got {fmt_tag}")
    if bits not in (8, 16):
        raise ValueError(f"wav: unsupported bits_per_sample {bits}")
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"data":
            body = data[i + 8 : i + 8 + size]
            if len(body) < size:
                raise ValueError("wav: data chunk truncated")
            if bits == 8:
                return channels, rate, bits, list(body)
            return (
                channels,
                rate,
                bits,
                [
                    int.from_bytes(body[j : j + 2], "little", signed=True)
                    for j in range(0, len(body) - 1, 2)
                ],
            )
        i += 8 + size + (size % 2)
    raise ValueError("wav: no data chunk found")


def encode_wav(
    samples: list[int], channels: int = 1, rate: int = 8000, bits: int = 16
) -> bytes:
    """Minimal PCM WAV writer (the decoder's test partner)."""
    if bits == 8:
        body = bytes(s & 0xFF for s in samples)
    elif bits == 16:
        body = b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    else:
        raise ValueError(f"wav: unsupported bits {bits}")
    block = channels * bits // 8
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data_chunk = b"data" + len(body).to_bytes(4, "little") + body
    riff_body = b"WAVE" + fmt + data_chunk
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def byte_entropy(data: bytes) -> float:
    """Shannon entropy of the byte histogram (bits/byte, 0..8) — the
    cheap compressibility proxy multimodal pipelines use to drop
    corrupt/blank blobs before expensive decoding."""
    import math

    if not data:
        return 0.0
    counts: dict[int, int] = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    n = len(data)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _tiff_dimensions(data: bytes) -> tuple[int, int]:
    """Parse (width, height) from a TIFF's first IFD (TIFF 6.0 spec):
    byte-order mark at 0 (II little / MM big), magic 42, IFD offset at
    byte 4; each 12-byte IFD entry is tag(2) type(2) count(4) value(4)
    with SHORT(3)/LONG(4) values left-justified in the value field.
    Tags 256/257 are ImageWidth/ImageLength."""
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    order = "little" if data[:2] == b"II" else "big"
    ifd = int.from_bytes(data[4:8], order)
    if ifd + 2 > len(data):
        raise ValueError("tiff: IFD offset out of range")
    n = int.from_bytes(data[ifd : ifd + 2], order)
    w = h = None
    for i in range(n):
        off = ifd + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("tiff: truncated IFD entry")
        tag = int.from_bytes(data[off : off + 2], order)
        typ = int.from_bytes(data[off + 2 : off + 4], order)
        if typ == 3:  # SHORT: first 2 bytes of the value field
            val = int.from_bytes(data[off + 8 : off + 10], order)
        elif typ == 4:  # LONG
            val = int.from_bytes(data[off + 8 : off + 12], order)
        else:
            continue
        if tag == 256:
            w = val
        elif tag == 257:
            h = val
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("tiff: missing ImageWidth/ImageLength")
    return (w, h)


def _synth_tiff_blob(text: str) -> bytes:
    """Minimal VALID TIFF for a document: endianness = md5[0] % 2,
    width = 1 + h[2:6] % 1024, height = 1 + h[6:10] % 1024 (the same md5
    lanes the image synthesizer uses, so a SQL oracle replays them) —
    header, one IFD with SHORT ImageWidth/ImageLength entries, zero next
    -IFD pointer, then the 16 md5 bytes as payload."""
    import hashlib

    hx = hashlib.md5(text.encode()).hexdigest()
    order = "little" if int(hx[0:2], 16) % 2 == 0 else "big"
    w = 1 + int(hx[2:6], 16) % 1024
    hgt = 1 + int(hx[6:10], 16) % 1024
    bom = b"II" if order == "little" else b"MM"
    head = bom + (42).to_bytes(2, order) + (8).to_bytes(4, order)

    def entry(tag: int, val: int) -> bytes:
        return (
            tag.to_bytes(2, order)
            + (3).to_bytes(2, order)  # SHORT
            + (1).to_bytes(4, order)
            + val.to_bytes(2, order)
            + bytes(2)
        )

    ifd = (2).to_bytes(2, order) + entry(256, w) + entry(257, hgt) + bytes(4)
    return head + ifd + bytes.fromhex(hx)


TIFF_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("byte_order", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_tiff_header_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> synthesize real TIFFs (both endiannesses, md5-derived
    dims) -> parse the IFD back with :func:`_tiff_dimensions` -> emit
    byte order and dimensions.  One narrow Arrow ``mapInPandas`` pass;
    the oracle replays every value from md5 hex."""
    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            orders, ws, hs, nb = [], [], [], []
            for text in pdf["_t"]:
                blob = _synth_tiff_blob(text)
                assert sniff_mime(blob) == "image/tiff"
                w, h = _tiff_dimensions(blob)
                orders.append("II" if blob[:2] == b"II" else "MM")
                ws.append(w)
                hs.append(h)
                nb.append(len(blob))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "byte_order": orders,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, TIFF_HEADER_SCHEMA)


def _synth_blob(text: str) -> bytes:
    """Minimal VALID image container for a document: format and
    dimensions derive from md5(text) hex lanes (fmt = h[0:2] % 3,
    width = 1 + h[2:6] % 1024, height = 1 + h[6:10] % 1024 — the same
    arithmetic a SQL oracle can replay on the md5 hex string), followed
    by the 16 md5 bytes as payload.  The headers are real: PNG
    signature + IHDR, GIF89a logical-screen descriptor, or
    BITMAPINFOHEADER — so ``decode_image`` exercises its actual header
    parsers, not the fake."""
    import hashlib

    h = hashlib.md5(text.encode()).hexdigest()
    fmt = int(h[0:2], 16) % 3
    w = 1 + int(h[2:6], 16) % 1024
    hgt = 1 + int(h[6:10], 16) % 1024
    payload = bytes.fromhex(h)
    if fmt == 0:  # PNG: 8-byte signature, IHDR chunk (length+type+13 data)
        ihdr = w.to_bytes(4, "big") + hgt.to_bytes(4, "big") + bytes(
            [8, 2, 0, 0, 0]
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + payload
        )
    if fmt == 1:  # GIF89a: logical screen descriptor, little-endian dims
        return (
            b"GIF89a"
            + w.to_bytes(2, "little")
            + hgt.to_bytes(2, "little")
            + payload
        )
    # BMP: file header (14 bytes) + BITMAPINFOHEADER start (12 bytes used)
    return (
        b"BM"
        + (42).to_bytes(4, "little")
        + bytes(4)
        + (26).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + hgt.to_bytes(4, "little", signed=True)
        + payload
    )


def _synth_pixel_blob(text: str) -> bytes:
    """A COMPLETE, pixel-decodable 4x4 image for a document: the 48 RGB
    bytes are the 16 md5 bytes tiled (byte i = md5[i % 16]) — pure
    md5-lane arithmetic a SQL oracle replays exactly — wrapped in one of
    the four lossless containers picked by md5[0] % 4 (PPM, PNG, BMP,
    GIF).  Unlike ``_synth_blob`` (header-only), these blobs round-trip
    through the real pixel codecs."""
    import hashlib

    h = hashlib.md5(text.encode()).digest()
    rgb = bytes(h[i % 16] for i in range(48))
    fmt = h[0] % 4
    if fmt == 0:
        return encode_ppm(4, 4, rgb)
    if fmt == 1:
        from ..sources.charts import png_encode

        return png_encode(4, 4, [rgb[12 * y : 12 * (y + 1)] for y in range(4)])
    if fmt == 2:
        return encode_bmp(4, 4, rgb)
    # GIF: palette = distinct pixels in first-appearance order
    pixels = [rgb[3 * p : 3 * p + 3] for p in range(16)]
    palette_list: list[bytes] = []
    indices = []
    for px in pixels:
        if px not in palette_list:
            palette_list.append(px)
        indices.append(palette_list.index(px))
    while len(palette_list) < 2:  # GIF needs >=2 palette entries
        palette_list.append(bytes(3))
    return encode_gif(4, 4, indices, b"".join(palette_list))


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("resized_sum", T.LongType()),
    ]
)


def decode_pixel_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> synthesize REAL 4x4 images (mixed PPM/PNG/BMP/GIF)
    -> real pixel decode -> real nearest-neighbor resize to 2x2 -> per-
    image byte sums, all in one Arrow ``mapInPandas`` pass (narrow, no
    shuffle).  Every byte of the decoded pixels is md5-derived, so a SQL
    oracle can verify the full encode -> decode -> resample -> re-encode
    -> decode chain is EXACT across all four containers."""
    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, widths, heights, sums, rsums = [], [], [], [], []
            for text in pdf["_t"]:
                blob = _synth_pixel_blob(text)
                mimes.append(sniff_mime(blob))
                w, h, rgb = decode_pixels(blob)
                widths.append(w)
                heights.append(h)
                sums.append(sum(rgb))
                _, _, rrgb = decode_pixels(resize_image(blob, 2, 2))
                rsums.append(sum(rrgb))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "mime": mimes,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "resized_sum": pd.Series(rsums, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, PIXEL_STATS_SCHEMA)


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Minimal Motion-JPEG AVI writer: RIFF('AVI ') with an hdrl LIST
    (avih + one video strl) and a movi LIST of '00dc' chunks, one per
    JPEG frame.  MJPEG is the one mainstream video codec a JPEG decoder
    makes fully decodable without a media library — each frame is an
    independent baseline JPEG."""
    if not frames:
        raise ValueError("avi: need at least one frame")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec_per_frame = 1_000_000 // max(fps, 1)
    avih = chunk(
        b"avih",
        usec_per_frame.to_bytes(4, "little")
        + bytes(12)
        + (0x10).to_bytes(4, "little")  # AVIF_HASINDEX off, flags minimal
        + len(frames).to_bytes(4, "little")
        + bytes(4)
        + (1).to_bytes(4, "little")  # one stream
        + bytes(4)
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + bytes(16),
    )
    strh = chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + bytes(12)
        + (1).to_bytes(4, "little")  # scale
        + fps.to_bytes(4, "little")  # rate
        + bytes(4)
        + len(frames).to_bytes(4, "little")
        + bytes(16),
    )
    strf = chunk(
        b"strf",
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + bytes(20),
    )
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = b"AVI " + lst(b"hdrl", avih + lst(b"strl", strh + strf)) + chunk(b"LIST", movi)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def extract_mjpeg_frames(data: bytes) -> list[bytes]:
    """JPEG frame payloads from an MJPEG AVI: walk the RIFF chunk tree
    to the movi LIST and collect '00dc'/'00db' video chunks.  Real
    container parsing — sizes from the chunk headers, word alignment per
    the RIFF spec."""
    if sniff_mime(data) != "video/avi":
        raise ValueError("not an AVI")
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = buf[i : i + 4]
            size = int.from_bytes(buf[i + 4 : i + 8], "little")
            body_start = i + 8
            if cid == b"LIST":
                ltype = buf[body_start : body_start + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(buf, body_start + 4, body_start + size)
            elif cid in (b"00dc", b"00db"):
                frames.append(bytes(buf[body_start : body_start + size]))
            i = body_start + size + (size % 2)

    walk(data, 12, len(data))
    if not frames:
        raise ValueError("avi: no video frames found")
    return frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_video_frames(
    media: DataFrame, every_k: int = 1, id_col: str = "item_id", data_col: str = "data"
) -> DataFrame:
    """1:N REAL video frame sampling: parse the AVI container, take
    every k-th MJPEG frame, and read each frame's dimensions from its
    JPEG header — the row-expanding mapInPandas shape video pipelines
    need, now backed by actual container + codec parsing instead of the
    byte-slicing stand-in (:func:`sample_frames`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, ws, hs = [], [], [], []
            for item_id, data in zip(pdf[id_col], pdf[data_col]):
                for no, frame in enumerate(extract_mjpeg_frames(bytes(data))):
                    if no % every_k:
                        continue
                    w, h = decode_image(frame)
                    ids.append(item_id)
                    nos.append(no)
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return media.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def synthesize_video_frames(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> real MJPEG AVIs -> real frame extraction, one Arrow
    ``mapInPandas`` pass.  Per document: n = 1 + md5[1] % 3 solid-color
    JPEG frames of (8*(1+md5[2]%2)) x 8 pixels inside a RIFF AVI; the
    sampler then re-parses the container and each frame's JPEG header.  All
    emitted values are md5-lane arithmetic, so the SQL oracle replays
    the container write -> parse -> frame decode chain exactly."""
    import hashlib

    from .jpeg_codec import encode_jpeg

    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas, mimes, sizes = [], [], [], []
            for item_id, text in zip(pdf["item_id"], pdf["_t"]):
                h = hashlib.md5(text.encode()).digest()
                n = 1 + h[1] % 3
                w = 8 * (1 + h[2] % 2)
                frames = [
                    encode_jpeg(w, 8, bytes([h[(4 + f) % 16]]) * (w * 8 * 3))
                    for f in range(n)
                ]
                blob = encode_mjpeg_avi(frames, w, 8)
                ids.append(item_id)
                datas.append(blob)
                mimes.append(sniff_mime(blob))
                sizes.append(len(blob))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "data": datas,
                    "mime": mimes,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, MEDIA_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> synthesize REAL 16-bit PCM WAVs (32 samples, sample
    i = (md5[i%16] - 128) * 256) -> real sample decode -> per-clip sum
    and peak, one Arrow ``mapInPandas`` pass.  Same oracle philosophy as
    :func:`decode_pixel_stats`: every decoded sample is md5-derived, so
    SQL replays the full encode -> parse -> decode chain exactly."""
    import hashlib

    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, sums, peaks = [], [], [], []
            for text in pdf["_t"]:
                h = hashlib.md5(text.encode()).digest()
                samples = [(h[i % 16] - 128) * 256 for i in range(32)]
                blob = encode_wav(samples, channels=1, rate=8000, bits=16)
                _, rate, _, back = decode_wav_samples(blob)
                rates.append(rate)
                counts.append(len(back))
                sums.append(sum(back))
                peaks.append(max(abs(s) for s in back))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return cols.mapInPandas(run, AUDIO_STATS_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def decode_audio_window_features(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Windowed DSP features over REAL decoded PCM: synthesize the same
    md5-derived 32-sample WAVs as :func:`decode_audio_stats`, parse the
    container and decode the samples back, then per fixed-size window
    emit the energy (exact integer sum of squares — bit-stable, unlike a
    float RMS) and the strict zero-crossing count (s[j]*s[j+1] < 0
    within the window).  One 1:N Arrow ``mapInPandas`` pass (N = windows
    per clip) — the same fan-out shape as video frame sampling; at scale
    the window loop runs vectorized per Arrow batch and the stage stays
    narrow (no shuffle)."""
    import hashlib

    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, sums, zcs = [], [], [], []
            for item_id, text in zip(pdf["item_id"], pdf["_t"]):
                h = hashlib.md5(text.encode()).digest()
                samples = [(h[i % 16] - 128) * 256 for i in range(32)]
                blob = encode_wav(samples, channels=1, rate=8000, bits=16)
                _, _, _, back = decode_wav_samples(blob)
                for w in range(len(back) // window):
                    seg = back[w * window : (w + 1) * window]
                    ids.append(item_id)
                    widx.append(w)
                    sums.append(sum(s * s for s in seg))
                    zcs.append(
                        sum(
                            1
                            for j in range(len(seg) - 1)
                            if seg[j] * seg[j + 1] < 0
                        )
                    )
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "sum_sq": pd.Series(sums, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int32"),
                }
            )

    return cols.mapInPandas(run, AUDIO_WINDOW_SCHEMA)


def synthesize_image_blobs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> MEDIA_SCHEMA rows with real (header-valid) image
    blobs.  Arrow-batched mapInPandas, narrow (no shuffle); at scale
    this stage is instead an object-store fetch keyed by a pointer
    column — the downstream decode contract is identical."""

    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["_t"].map(_synth_blob)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "data": blobs,
                    "mime": blobs.map(sniff_mime),
                    "n_bytes": blobs.map(len).astype("int64"),
                }
            )

    return cols.mapInPandas(synth, MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy_millibits", T.LongType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Header-level decode over a binary column: MIME sniff + real
    width/height parse (PNG/GIF/BMP/JPEG) + byte entropy, one Arrow
    ``mapInPandas`` pass, no shuffle.  Entropy is reported as integer
    millibits (round(e*1000)) so cross-engine comparison is exact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            dims = [decode_image(d) for d in data]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "mime": data.map(sniff_mime),
                    "width": pd.Series([w for w, _ in dims], dtype="int32"),
                    "height": pd.Series([h for _, h in dims], dtype="int32"),
                    "n_bytes": data.map(len).astype("int64"),
                    "entropy_millibits": data.map(
                        lambda b: round(byte_entropy(b) * 1000)
                    ).astype("int64"),
                }
            )

    return media.select("item_id", "data").mapInPandas(run, DECODED_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    One ``mapInPandas`` pass: each Python worker receives pandas batches
    of (item_id, data, ...), computes features vectorized where possible,
    and yields FEATURE_SCHEMA batches.  No shuffle — runs in the scan
    stage; repartition upstream if decode cost needs more parallelism.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            dims = [decode_image(d, deterministic_fake=True) for d in data]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "n_bytes": data.map(len).astype("int64"),
                    "byte_checksum": data.map(lambda b: sum(b) % (1 << 31)).astype(
                        "int64"
                    ),
                    "width": pd.Series([w for w, _ in dims], dtype="int32"),
                    "height": pd.Series([h for _, h in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_data", T.BinaryType()),
    ]
)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR, rows
    padded to 4 bytes) from raw top-down RGB bytes.  Pure struct — the
    format is public and trivial, no imaging library involved."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    row_raw = width * 3
    pad = (-row_raw) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up row order
        row = rgb[y * row_raw : (y + 1) * row_raw]
        for x in range(width):  # RGB -> BGR
            body += bytes((row[3 * x + 2], row[3 * x + 1], row[3 * x]))
        body += b"\x00" * pad
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(body), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from a 24-bit uncompressed
    BMP.  REAL pixel decoding — possible without a codec library because
    BI_RGB pixel data is just padded BGR rows at a header-declared
    offset.  Compressed or non-24-bit BMPs raise."""
    import struct

    if sniff_mime(data) != "image/bmp" or len(data) < 54:
        raise ValueError("not a BMP or truncated header")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if w <= 0 or h_signed == 0:
        raise ValueError("bmp: non-positive dimensions")
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24-bit BI_RGB decodable (bpp={bpp})")
    h = abs(h_signed)
    row_raw = w * 3
    stride = row_raw + ((-row_raw) % 4)
    if pixel_off + stride * h > len(data):
        raise ValueError("bmp: pixel array truncated")
    out = bytearray(row_raw * h)
    for y in range(h):
        # negative header height = top-down storage; positive = bottom-up
        src_y = y if h_signed < 0 else h - 1 - y
        row = data[pixel_off + src_y * stride : pixel_off + src_y * stride + row_raw]
        for x in range(w):  # BGR -> RGB
            out[y * row_raw + 3 * x] = row[3 * x + 2]
            out[y * row_raw + 3 * x + 1] = row[3 * x + 1]
            out[y * row_raw + 3 * x + 2] = row[3 * x]
    return w, h, bytes(out)


def _gif_lzw_decode(mcs: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW decode: variable code width starting at mcs+1,
    LSB-first bit packing, CLEAR/END control codes, width growing as the
    string table fills (cap 12 bits).  Public algorithm from the GIF89a
    specification appendix."""
    clear = 1 << mcs
    end = clear + 1
    table: list[list[int] | None] = [[i] for i in range(clear)] + [None, None]
    code_size = mcs + 1
    prev: list[int] | None = None
    out: list[int] = []
    pos = 0
    nbits = len(data) * 8
    while pos + code_size <= nbits and len(out) < max_pixels:
        byte_i = pos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 4], "little")
        code = (chunk >> (pos & 7)) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [None, None]
            code_size = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            # spec decoders stop adding at the 12-bit cap (deferred clear);
            # capping here bounds table memory on adversarial streams
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _gif_deinterlace(indices: list[int], w: int, h: int) -> list[int]:
    """Undo GIF's 4-pass row interlacing (rows stored in pass order
    0,8,16,... / 4,12,... / 2,6,... / 1,3,...)."""
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = [0] * (w * h)
    for stored, y in enumerate(order):
        out[y * w : (y + 1) * w] = indices[stored * w : (stored + 1) * w]
    return out


def _gif_decode_indexed(data: bytes) -> tuple[int, int, list[int], bytes]:
    """(width, height, palette indices top-down, RGB palette bytes) for
    the FIRST image frame of a GIF87a/89a stream.  Walks the block
    structure (extensions skipped via their length-prefixed sub-blocks),
    honors local color tables and interlacing.  Real decode, stdlib
    only — GIF's compression is LZW, a table-building byte algorithm,
    not an entropy codec."""
    if sniff_mime(data) != "image/gif":
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    packed = data[10]
    gct_size = 2 << (packed & 0x07)
    i = 13
    palette = b""
    if packed & 0x80:
        palette = data[i : i + 3 * gct_size]
        i += 3 * gct_size
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: label byte + length-prefixed sub-blocks
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(data):
                raise ValueError("gif: truncated image descriptor")
            w = int.from_bytes(data[i + 5 : i + 7], "little")
            h = int.from_bytes(data[i + 7 : i + 9], "little")
            ipacked = data[i + 9]
            i += 10
            if ipacked & 0x80:  # local color table wins for this frame
                lct_size = 2 << (ipacked & 0x07)
                palette = data[i : i + 3 * lct_size]
                i += 3 * lct_size
            if not palette:
                raise ValueError("gif: no color table for frame")
            if w <= 0 or h <= 0:
                raise ValueError("gif: non-positive frame dimensions")
            mcs = data[i]
            i += 1
            lzw = bytearray()
            while i < len(data) and data[i] != 0:
                n = data[i]
                lzw += data[i + 1 : i + 1 + n]
                i += 1 + n
            if not (2 <= mcs <= 11):
                raise ValueError(f"gif: bad LZW min code size {mcs}")
            indices = _gif_lzw_decode(mcs, bytes(lzw), w * h)
            if len(indices) < w * h:
                raise ValueError("gif: pixel data truncated")
            indices = indices[: w * h]
            if ipacked & 0x40:
                indices = _gif_deinterlace(indices, w, h)
            return w, h, indices, palette
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    raise ValueError("gif: no image frame found")


def _gif_decode_all_frames(
    data: bytes, max_frames: int = 64
) -> list[tuple[int, int, list[int], bytes]]:
    """All image frames of a GIF stream as (w, h, indices, palette)
    tuples.  Same block walk as :func:`_gif_decode_indexed`, but a local
    color table applies only to ITS frame (the global table resumes
    afterwards — per the GIF89a spec) and every image descriptor is
    decoded instead of returning at the first."""
    if sniff_mime(data) != "image/gif":
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    packed = data[10]
    gct_size = 2 << (packed & 0x07)
    i = 13
    gct = b""
    if packed & 0x80:
        gct = data[i : i + 3 * gct_size]
        i += 3 * gct_size
    frames: list[tuple[int, int, list[int], bytes]] = []
    while i < len(data):
        b = data[i]
        if b == 0x21:
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:
            if i + 10 > len(data):
                raise ValueError("gif: truncated image descriptor")
            w = int.from_bytes(data[i + 5 : i + 7], "little")
            h = int.from_bytes(data[i + 7 : i + 9], "little")
            ipacked = data[i + 9]
            i += 10
            palette = gct
            if ipacked & 0x80:
                lct_size = 2 << (ipacked & 0x07)
                palette = data[i : i + 3 * lct_size]
                i += 3 * lct_size
            if not palette:
                raise ValueError("gif: no color table for frame")
            if w <= 0 or h <= 0:
                raise ValueError("gif: non-positive frame dimensions")
            mcs = data[i]
            i += 1
            lzw = bytearray()
            while i < len(data) and data[i] != 0:
                n = data[i]
                lzw += data[i + 1 : i + 1 + n]
                i += 1 + n
            i += 1  # block terminator
            if not (2 <= mcs <= 11):
                raise ValueError(f"gif: bad LZW min code size {mcs}")
            indices = _gif_lzw_decode(mcs, bytes(lzw), w * h)
            if len(indices) < w * h:
                raise ValueError("gif: pixel data truncated")
            idx = indices[: w * h]
            if ipacked & 0x40:
                idx = _gif_deinterlace(idx, w, h)
            frames.append((w, h, idx, palette))
            if len(frames) > max_frames:
                raise ValueError(f"gif: more than {max_frames} frames")
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    if not frames:
        raise ValueError("gif: no image frame found")
    return frames


def encode_animated_gif(
    w: int, h: int, frames: list[list[int]], palette: bytes
) -> bytes:
    """GIF89a with one image frame per entry in ``frames``: shared
    global color table, a graphic-control extension (10 cs delay) before
    each frame, frame bodies produced by the same spec-valid
    no-compression LZW writer as :func:`encode_gif` (each single-frame
    encoding is spliced between its header/GCT prefix and trailer)."""
    if not frames:
        raise ValueError("need at least one frame")
    npal = len(palette) // 3
    pal_bits = max(1, (max(npal - 1, 1)).bit_length())
    prefix_len = 13 + 3 * (1 << pal_bits)
    first = encode_gif(w, h, frames[0], palette)
    out = bytearray(b"GIF89a" + first[6:prefix_len])
    for fr in frames:
        body = encode_gif(w, h, fr, palette)[prefix_len:-1]
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 10cs delay
        out += body
    out += b"\x3b"
    return bytes(out)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def decode_gif_frame_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> synthesize ANIMATED GIFs (1-3 md5-derived 4x4 frames
    over a 16-gray global palette) -> real multi-frame LZW decode ->
    one row per frame with its RGB byte sum.  The animated twin of the
    MJPEG AVI sampler: a 1:N Arrow ``mapInPandas`` fan-out whose every
    output value a SQL oracle replays from md5 hex (frame f, pixel j has
    palette index md5[(f + 3j) % 16] % 16; gray k is (16k,16k,16k), so
    the frame sum is 48 * sum(indices))."""
    import hashlib

    palette = b"".join(bytes([k * 16] * 3) for k in range(16))
    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fi, ws, hs, sums = [], [], [], [], []
            for item_id, text in zip(pdf["item_id"], pdf["_t"]):
                hd = hashlib.md5(text.encode()).digest()
                n_frames = 1 + hd[1] % 3
                frames = [
                    [hd[(f + 3 * j) % 16] % 16 for j in range(16)]
                    for f in range(n_frames)
                ]
                blob = encode_animated_gif(4, 4, frames, palette)
                decoded = _gif_decode_all_frames(blob)
                assert len(decoded) == n_frames
                for f, (w, h, idx, pal) in enumerate(decoded):
                    rgb = b"".join(pal[3 * x : 3 * x + 3] for x in idx)
                    ids.append(item_id)
                    fi.append(f)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(rgb))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fi, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, GIF_FRAME_SCHEMA)


GIF_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("transition_idx", T.IntegerType()),
        T.StructField("l1_delta", T.LongType()),
        T.StructField("is_cut", T.BooleanType()),
    ]
)


def decode_gif_scene_deltas(
    df: DataFrame, id_col: str, text_col: str, cut_threshold: int
) -> DataFrame:
    """documents -> the same synthesized animated GIFs as
    :func:`decode_gif_frame_stats` -> real multi-frame LZW decode ->
    one row per consecutive-frame TRANSITION with the exact integer L1
    pixel delta (sum over RGB bytes of |frame_f - frame_{f+1}|) and the
    threshold cut flag — shot-boundary detection's classic frame-
    difference detector, over genuinely decoded frames.  Deltas are
    computed from the DECODED RGB bytes (palette lookup included), so a
    hash match proves the whole codec chain; the oracle replays the
    arithmetic from md5 hex (pixel j of frame f has palette index
    md5[(f + 3j) % 16] % 16, gray k = (16k,16k,16k), so the per-pixel
    delta is 48 * |idx_f - idx_{f+1}|).  Single-frame clips emit no
    transitions.  One 1:N Arrow ``mapInPandas`` pass, no shuffle."""
    import hashlib

    palette = b"".join(bytes([k * 16] * 3) for k in range(16))
    cols = df.select(
        F.col(id_col).alias("item_id").cast("long"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ti, deltas, cuts = [], [], [], []
            for item_id, text in zip(pdf["item_id"], pdf["_t"]):
                hd = hashlib.md5(text.encode()).digest()
                n_frames = 1 + hd[1] % 3
                frames = [
                    [hd[(f + 3 * j) % 16] % 16 for j in range(16)]
                    for f in range(n_frames)
                ]
                blob = encode_animated_gif(4, 4, frames, palette)
                decoded = _gif_decode_all_frames(blob)
                rgbs = [
                    b"".join(pal[3 * x : 3 * x + 3] for x in idx)
                    for (_, _, idx, pal) in decoded
                ]
                for f in range(len(rgbs) - 1):
                    d = sum(abs(a - b) for a, b in zip(rgbs[f], rgbs[f + 1]))
                    ids.append(item_id)
                    ti.append(f)
                    deltas.append(d)
                    cuts.append(d >= cut_threshold)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "transition_idx": pd.Series(ti, dtype="int32"),
                    "l1_delta": pd.Series(deltas, dtype="int64"),
                    "is_cut": pd.Series(cuts, dtype="bool"),
                }
            )

    return cols.mapInPandas(run, GIF_SCENE_SCHEMA)


def decode_gif_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) for the first GIF frame:
    real LZW decode + palette lookup, zero dependencies."""
    w, h, indices, palette = _gif_decode_indexed(data)
    npal = len(palette) // 3
    out = bytearray(w * h * 3)
    for j, idx in enumerate(indices):
        if idx >= npal:
            raise ValueError(f"gif: palette index {idx} out of range")
        out[3 * j : 3 * j + 3] = palette[3 * idx : 3 * idx + 3]
    return w, h, bytes(out)


def encode_gif(w: int, h: int, indices: list[int], palette: bytes) -> bytes:
    """Minimal GIF87a writer: global color table + one non-interlaced
    frame.  The LZW stream uses the classic no-compression trick — each
    pixel emitted as its literal code with a CLEAR every 2^mcs - 2
    pixels so the code width never grows.  Larger than a compressing
    encoder, but spec-valid and dependency-free (the decode side is the
    real test partner)."""
    npal = len(palette) // 3
    if npal < 2 or npal > 256 or len(palette) % 3:
        raise ValueError("palette must be 2..256 RGB triples")
    if len(indices) != w * h:
        raise ValueError("indices must be w*h entries")
    pal_bits = max(1, (max(npal - 1, 1)).bit_length())
    table_size = 1 << pal_bits
    full_pal = bytes(palette) + bytes(3 * (table_size - npal))
    mcs = max(2, pal_bits)
    clear = 1 << mcs
    end = clear + 1
    code_size = mcs + 1

    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for j, idx in enumerate(indices):
        if idx >= npal:
            raise ValueError(f"palette index {idx} out of range")
        if j and j % (clear - 2) == 0:
            emit(clear)  # reset before the decoder's table would widen
        emit(idx)
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)

    blocks = bytearray()
    for off in range(0, len(bits), 255):
        chunk = bits[off : off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    return (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | ((pal_bits - 1) & 0x07), 0, 0])
        + full_pal
        + b"\x2c"
        + bytes(4)
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([mcs])
        + bytes(blocks)
        + b"\x3b"
    )


def resize_indexed_nearest(
    indices: list[int], w: int, h: int, new_w: int, new_h: int
) -> list[int]:
    """Nearest-neighbor resample in palette-INDEX space: picking source
    pixels can never leave the palette, so a resized GIF reuses its
    source color table unchanged."""
    out = []
    for y in range(new_h):
        sy = (y * h) // new_h
        row = indices[sy * w : (sy + 1) * w]
        out.extend(row[(x * w) // new_w] for x in range(new_w))
    return out


def _png_unfilter(
    raw: bytes, pos: int, w: int, h: int, ch: int, depth: int = 8
) -> tuple[bytearray, int]:
    """Undo the five PNG scanline filters over one (sub-)image of
    ``h`` rows x ``w`` pixels x ``ch`` channels of ``depth``-bit samples
    starting at byte ``pos`` of the inflated stream; returns
    (packed scanline bytes, next_pos).  The filters always operate on
    BYTES: the "left" neighbor is ``bpp = max(1, ch*depth//8)`` bytes
    back — 2-byte samples at depth 16, and a single byte holding several
    packed samples at depths 1/2/4 (the spec's sub-byte rule).  Shared
    by the sequential and Adam7 paths — each interlace pass filters its
    own reduced image independently."""
    bpp = max(1, ch * depth // 8)
    stride = (w * ch * depth + 7) // 8
    if len(raw) - pos < h * (1 + stride):
        raise ValueError("png: pixel data truncated")
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub: predict from the pixel to the left
            for k in range(bpp, stride):
                row[k] = (row[k] + row[k - bpp]) & 0xFF
        elif ftype == 2:  # Up: predict from the row above
            for k in range(stride):
                row[k] = (row[k] + prev[k]) & 0xFF
        elif ftype == 3:  # Average of left and above
            for k in range(stride):
                a = row[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + ((a + prev[k]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth: nearest of left/above/upper-left
            for k in range(stride):
                a = row[k - bpp] if k >= bpp else 0
                b = prev[k]
                c = prev[k - bpp] if k >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[k] = (row[k] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return out, pos


def _unpack_subbyte(rows: bytes, w: int, h: int, depth: int) -> bytearray:
    """Unpack MSB-first packed 1/2/4-bit samples (single channel — the
    only sub-byte layouts PNG allows) to one byte per sample, dropping
    each scanline's unused trailing padding bits."""
    stride = (w * depth + 7) // 8
    out = bytearray(w * h)
    mask = (1 << depth) - 1
    per = 8 // depth
    for y in range(h):
        base = y * stride
        for x in range(w):
            shift = 8 - depth * (x % per + 1)
            out[y * w + x] = (rows[base + x // per] >> shift) & mask
    return out


def decode_png_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from any PNG the spec allows:
    grayscale (0, depths 1/2/4/8/16), RGB (2, 8/16), palette
    (3, 1/2/4/8), gray+alpha (4, 8/16), RGBA (6, 8/16), sequential or
    Adam7-interlaced.

    REAL pixel decoding with zero non-stdlib dependencies: PNG's
    compression is DEFLATE, which stdlib ``zlib`` inflates, and the
    per-scanline prediction filters (None/Sub/Up/Average/Paeth) are a
    public five-case algorithm over the previous byte/row (operating on
    bytes with a 2-byte-per-sample "left" offset at depth 16 and a
    packed-byte offset at depths 1/2/4).  Alpha is dropped and palette
    indices resolved AFTER unfiltering (the filters operate on the raw
    channel stride); Adam7 passes unfilter as the independent reduced
    images the spec defines, then reassemble onto the sample grids.
    16-bit samples reduce to their high byte and 1/2/4-bit grays rescale
    by bit replication (x255 / x85 / x17) — both the spec's sample-depth
    rescaling rules.
    """
    import struct
    import zlib

    if sniff_mime(data) != "image/png":
        raise ValueError("not a PNG")
    w = h = None
    depth = ctype = interlace = None
    idat = bytearray()
    plte = b""
    i = 8
    while i + 8 <= len(data):
        length = int.from_bytes(data[i : i + 4], "big")
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("png: truncated IHDR")
            w, h = struct.unpack(">II", body[:8])
            depth, ctype, _, _, interlace = body[8:13]
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length  # 4 length + 4 tag + body + 4 crc
    if w is None:
        raise ValueError("png: no IHDR chunk")
    if w <= 0 or h <= 0:
        raise ValueError("png: non-positive dimensions")
    if (
        depth not in (1, 2, 4, 8, 16)
        or ctype not in (0, 2, 3, 4, 6)
        or interlace not in (0, 1)
        or (depth in (1, 2, 4) and ctype not in (0, 3))
    ):
        raise ValueError(
            "png: depth/color-type combination outside the spec "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    if ctype == 3 and depth == 16:
        raise ValueError("png: 16-bit palette images are invalid per spec")
    if ctype == 3 and (not plte or len(plte) % 3):
        raise ValueError("png: palette image without a valid PLTE chunk")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    sb = depth // 8  # bytes per sample (0 for packed sub-byte depths)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"png: bad IDAT stream ({e})") from e
    if interlace == 0:
        out, pos = _png_unfilter(raw, 0, w, h, ch, depth)
        if depth < 8:
            out = _unpack_subbyte(out, w, h, depth)
    else:
        # Adam7: seven independently-filtered sub-images, reassembled
        # onto the (x0, y0, dx, dy) sample grids the spec defines
        # (sub-byte depths unpack to one byte per sample first — each
        # reduced image has its own scanline padding)
        bpp = ch * sb if depth >= 8 else 1
        out = bytearray(h * w * bpp)
        pos = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _png_unfilter(raw, pos, pw, ph, ch, depth)
            if depth < 8:
                sub = _unpack_subbyte(sub, pw, ph, depth)
            for sy in range(ph):
                y = y0 + sy * dy
                for sx in range(pw):
                    x = x0 + sx * dx
                    out[(y * w + x) * bpp : (y * w + x) * bpp + bpp] = sub[
                        (sy * pw + sx) * bpp : (sy * pw + sx) * bpp + bpp
                    ]
    if sb == 2:
        # 16 -> 8 bit: each big-endian sample's high byte (spec rescale)
        out = out[0::2]
    if ctype == 2:
        return w, h, bytes(out)
    scale = 255 // ((1 << depth) - 1) if depth < 8 else 1  # bit replication
    rgb = bytearray(w * h * 3)
    if ctype == 6:  # RGBA: drop alpha
        for px in range(w * h):
            rgb[3 * px : 3 * px + 3] = out[4 * px : 4 * px + 3]
    elif ctype == 0:  # grayscale: replicate (sub-byte grays rescale)
        for px in range(w * h):
            rgb[3 * px] = rgb[3 * px + 1] = rgb[3 * px + 2] = out[px] * scale
    elif ctype == 4:  # gray+alpha: replicate gray, drop alpha
        for px in range(w * h):
            rgb[3 * px] = rgb[3 * px + 1] = rgb[3 * px + 2] = out[2 * px]
    else:  # palette lookup
        npal = len(plte) // 3
        for px in range(w * h):
            idx = out[px]
            if idx >= npal:
                raise ValueError(f"png: palette index {idx} out of range")
            rgb[3 * px : 3 * px + 3] = plte[3 * idx : 3 * idx + 3]
    return w, h, bytes(rgb)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6): ASCII header + raw top-down RGB — the simplest
    real image container; zero dependencies."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _ppm_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, pixel_offset) from a P6 header —
    tolerates '#' comment lines and arbitrary whitespace between tokens
    per the Netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < len(data):
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
    if len(tokens) < 3:
        raise ValueError("ppm: truncated header")
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        raise ValueError("ppm: non-positive dimensions")
    return w, h, maxval, i + 1  # one whitespace byte separates pixels


def decode_ppm_pixels(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from a binary P6 PPM with
    maxval 255."""
    w, h, maxval, off = _ppm_header(data)
    if maxval != 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    if off + w * h * 3 > len(data):
        raise ValueError("ppm: pixel data truncated")
    return w, h, bytes(data[off : off + w * h * 3])


def decode_pixels(data: bytes) -> tuple[int, int, bytes]:
    """Format-dispatching REAL pixel decode: (width, height, top-down
    RGB bytes) for any of the five decodable containers.  The single
    entry point executor stages use — swap individual decoders for
    library-backed ones without touching callers."""
    mime = sniff_mime(data)
    if mime == "image/bmp":
        return decode_bmp_pixels(data)
    if mime == "image/x-portable-pixmap":
        return decode_ppm_pixels(data)
    if mime == "image/png":
        return decode_png_pixels(data)
    if mime == "image/gif":
        return decode_gif_pixels(data)
    if mime == "image/jpeg":
        from .jpeg_codec import decode_jpeg_pixels

        return decode_jpeg_pixels(data)
    raise ValueError(f"no pixel decoder for {mime}")


def resize_rgb_nearest(rgb: bytes, w: int, h: int, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of top-down RGB bytes (numpy index
    map — vectorized, no imaging library)."""
    import numpy as np

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return arr[ys][:, xs].tobytes()


def resize_image(data: bytes, w: int, h: int, deterministic_fake: bool = False) -> bytes:
    """Resize a media blob to (w, h).

    REAL for all five image formats: pixel decode (header offsets for
    BMP/PPM, zlib inflate + scanline unfilter for 8/16-bit PNG, LZW for
    GIF, the T.81 Huffman/DCT pipeline for baseline and progressive
    JPEG) -> nearest-neighbor resample (index-space for GIF, RGB
    otherwise) -> re-encode in the same format, all stdlib + numpy.
    Variants outside the decodable set (arithmetic-coded JPEG,
    sub-8-bit PNG, truncated headers) raise
    ``NotImplementedError`` unless ``deterministic_fake=True``, which
    produces a deterministic (w*h//64)-byte blob so batch shapes stay
    realistic in plumbing tests."""
    mime = sniff_mime(data)
    if mime == "image/bmp":
        try:
            sw, sh, rgb = decode_bmp_pixels(data)
            return encode_bmp(w, h, resize_rgb_nearest(rgb, sw, sh, w, h))
        except ValueError:
            pass  # synthetic/truncated BMP: fall through to the stub path
    if mime == "image/x-portable-pixmap":
        try:
            sw, sh, rgb = decode_ppm_pixels(data)
            return encode_ppm(w, h, resize_rgb_nearest(rgb, sw, sh, w, h))
        except ValueError:
            pass
    if mime == "image/png":
        try:
            sw, sh, rgb = decode_png_pixels(data)
            resized = resize_rgb_nearest(rgb, sw, sh, w, h)
            from ..sources.charts import png_encode

            rows = [resized[3 * w * y : 3 * w * (y + 1)] for y in range(h)]
            return png_encode(w, h, rows)
        except ValueError:
            pass  # synthetic header-only PNG: stub path
    if mime == "image/gif":
        try:
            sw, sh, indices, palette = _gif_decode_indexed(data)
            # nearest-neighbor in INDEX space: the source palette is
            # reused verbatim, no quantization step needed
            return encode_gif(w, h, resize_indexed_nearest(indices, sw, sh, w, h), palette)
        except ValueError:
            pass  # header-only/truncated GIF: stub path
    if mime == "image/jpeg":
        try:
            from .jpeg_codec import decode_jpeg_pixels, encode_jpeg

            sw, sh, rgb = decode_jpeg_pixels(data)
            return encode_jpeg(w, h, resize_rgb_nearest(rgb, sw, sh, w, h))
        except ValueError:
            pass  # truncated/arithmetic-coded JPEG: stub path
    if not deterministic_fake:
        raise NotImplementedError(
            "pixel resize supports BMP (24-bit BI_RGB), P6 PPM, PNG (all "
            "spec-legal depths incl. 1/2/4-bit), GIF, and baseline + "
            "progressive JPEG; this blob is a format/variant outside "
            "that set — pass deterministic_fake=True for the "
            "plumbing-test resizer"
        )
    n = max(1, (w * h) // 64)
    reps = (n // max(1, len(data))) + 1
    return (bytes(data) * reps)[:n]


def resize_images(media: DataFrame, w: int = 64, h: int = 64) -> DataFrame:
    """Arrow-batched 1:1 media transform (decode -> resample -> re-encode
    in the real pipeline).  Same mapInPandas shape as extract_features:
    no shuffle, scan-stage parallelism."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "data": pdf["data"].map(
                        lambda b: resize_image(b, w, h, deterministic_fake=True)
                    ),
                    "width": pd.Series([w] * len(pdf), dtype="int32"),
                    "height": pd.Series([h] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4) -> DataFrame:
    """1:N frame sampling: each media row yields one output row per
    sampled "frame" (here: every_n_bytes-th slice of the blob — the real
    decoder would seek keyframes).  Demonstrates the row-expanding
    mapInPandas shape video pipelines need (explode is not expressible
    for lazily-decoded frames)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(item_id)
                    frame_nos.append(i)
                    frames.append(bytes(data[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "frame_data": frames,
                }
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: batches arrive as
    raw ``pyarrow.RecordBatch`` — no pandas materialization, so binary
    blobs never copy into Python objects until touched.  Preferable when
    the per-batch work is itself Arrow/numpy-native; output is
    bit-identical to the pandas path."""
    import pyarrow as pa

    def featurize(batches):
        for batch in batches:
            ids = batch.column("item_id")
            data = batch.column("data").to_pylist()
            dims = [decode_image(d, deterministic_fake=True) for d in data]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([len(d) for d in data], type=pa.int64()),
                    pa.array(
                        [sum(d) % (1 << 31) for d in data], type=pa.int64()
                    ),
                    pa.array([w for w, _ in dims], type=pa.int32()),
                    pa.array([h for _, h in dims], type=pa.int32()),
                ],
                names=["item_id", "n_bytes", "byte_checksum", "width", "height"],
            )

    return media.mapInArrow(featurize, FEATURE_SCHEMA)
