"""Presentation sink (reference S11): query result -> pie chart -> PNG.

The reference's final DAG task collects the facility-type counts, draws a
matplotlib pie and uploads the PNG to S3
(``/root/reference/airflow.py:676-690``).  This module reproduces the
observable output — a valid PNG pie chart of a tiny aggregated relation —
with ZERO third-party imaging dependencies: the rasterizer and PNG
encoder are stdlib-only (``zlib`` + ``struct``), so the sink works on a
bare cluster image where matplotlib is absent.

Scale contract, stated honestly: a presentation sink is DRIVER-side by
design.  Its input must be a post-aggregation relation of at most
``max_slices`` meaningful rows — the distributed work (the groupBy that
produced the counts) already happened upstream; collecting a <=10-row
result is not a scale hazard.  The guard enforces the contract rather
than trusting the caller.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame

# Deterministic categorical palette (RGB), applied in slice order.
PALETTE: tuple[tuple[int, int, int], ...] = (
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
    (227, 119, 194),
    (127, 127, 127),
    (188, 189, 34),
    (23, 190, 207),
)

_BACKGROUND = (255, 255, 255)


def png_encode(width: int, height: int, rgb_rows: list[bytes]) -> bytes:
    """Minimal PNG writer: 8-bit/channel RGB, no interlace, filter 0 per
    scanline.  ``rgb_rows`` is ``height`` rows of ``3*width`` bytes."""
    if len(rgb_rows) != height or any(len(r) != 3 * width for r in rgb_rows):
        raise ValueError("rgb_rows must be `height` rows of 3*width bytes")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + row for row in rgb_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def render_pie_png(
    slices: list[tuple[str, float]], size: int = 200
) -> bytes:
    """Rasterize a pie chart of (label, value) slices to PNG bytes.

    Per-pixel angle test against the cumulative slice fractions — O(size^2)
    driver-side work on a fixed-size canvas, independent of data scale.
    Slice order (and therefore color assignment) follows input order, so
    output bytes are fully deterministic for a sorted input.
    """
    # clamp BEFORE summing: a negative slice in the total but not the
    # per-slice fractions would push cumulative bounds past 1 mid-list,
    # making the bounds non-monotonic and silently distorting slices
    clamped = [max(0.0, float(v)) for _, v in slices]
    total = sum(clamped)
    if total <= 0 or not slices:
        raise ValueError("pie chart needs at least one positive-valued slice")
    import math

    bounds = []
    acc = 0.0
    for v in clamped:
        acc += v / total
        bounds.append(acc)
    bounds[-1] = 1.0 + 1e-9  # float-sum slack: the last slice owns the seam

    cx = cy = (size - 1) / 2.0
    radius = size * 0.45
    r2 = radius * radius
    colors = [PALETTE[i % len(PALETTE)] for i in range(len(slices))]
    rows: list[bytes] = []
    for y in range(size):
        row = bytearray()
        dy = y - cy
        for x in range(size):
            dx = x - cx
            if dx * dx + dy * dy <= r2:
                # 12-o'clock start, clockwise — matplotlib's startangle=90
                # counterclockwise convention mirrored for screen coords
                frac = (math.atan2(dx, -dy) % (2 * math.pi)) / (2 * math.pi)
                for i, b in enumerate(bounds):
                    if frac < b:
                        row += bytes(colors[i])
                        break
            else:
                row += bytes(_BACKGROUND)
        rows.append(bytes(row))
    return png_encode(size, size, rows)


def pie_chart_png(
    df: DataFrame,
    label_col: str,
    value_col: str,
    size: int = 200,
    max_slices: int = 10,
) -> bytes:
    """S11 sink: an aggregated (label, value) relation to pie-chart PNG
    bytes.  Pulls at most ``max_slices + 1`` rows (the guard: a caller
    pointing this at an unaggregated table fails loudly instead of
    collecting it), sorts by value descending for stable slice order."""
    rows = df.select(label_col, value_col).limit(max_slices + 1).collect()
    if len(rows) > max_slices:
        raise ValueError(
            f"pie chart input has more than {max_slices} rows — aggregate "
            "first; a presentation sink never collects unaggregated data"
        )
    pairs = sorted(
        ((str(r[0]), float(r[1])) for r in rows),
        key=lambda p: (-p[1], p[0]),
    )
    return render_pie_png(pairs, size=size)


def save_pie_chart(
    df: DataFrame, path: str, label_col: str, value_col: str, **kwargs
) -> int:
    """Render and write the PNG; returns bytes written.  ``path`` is any
    driver-writable location (the reference uploads to S3 —
    airflow.py:688 — which here is a mounted/object-store path)."""
    data = pie_chart_png(df, label_col, value_col, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)
