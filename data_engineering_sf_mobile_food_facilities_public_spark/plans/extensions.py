"""Oracle-paired queries for the streaming / ML / multimodal surfaces.

Streaming results are produced by a real Structured Streaming execution
(Trigger.AvailableNow into a memory sink); since complete-mode output over
a finite file set equals the batch aggregate, the DuckDB batch SQL is its
exact oracle — the driver verifies a *streaming* run against *batch* SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..ml.regression import linreg_pipeline, ols_simple
from ..multimodal.binary_ops import attach_fake_binary, extract_features
from ..streaming.events_stream import (
    hourly_event_counts_stream,
    read_events_stream,
    run_available_now,
)
from .relational import _register

_stream_run_counter = [0]


@_register(
    "streaming_hourly_event_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS event_count
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts executed as a genuine stream
    (AvailableNow) — checked against the batch aggregate."""
    _stream_run_counter[0] += 1
    name = f"hourly_event_counts_{_stream_run_counter[0]}"
    stream = hourly_event_counts_stream(read_events_stream(spark, sf_dir))
    return run_available_now(stream, name)


@_register(
    "event_type_daily_values",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def event_type_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming rollup: daily value totals per type
    (exact DECIMAL sums)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@_register(
    "ols_price_vs_quantity",
    """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_quantity AS DECIMAL(18,2))) AS sxx
        FROM lineitem
    )
    SELECT n,
           round(CAST(CAST(n AS DECIMAL(38,6)) * sxy - sx * sy AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,6)) * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(CAST(n AS DECIMAL(38,6)) * sxy - sx * sy AS DOUBLE)
                     / CAST(CAST(n AS DECIMAL(38,6)) * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
    FROM s
    """,
)
def ols_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of extendedprice on quantity — the engine's
    oracle-checkable regression (exact decimal sums, double at the edge)."""
    return ols_simple(load(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice")


@_register("ml_linreg_metrics")  # rows-only: MLlib model, not SQL-expressible
def ml_linreg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml parity (M1-M2): assemble per-customer order features,
    fit LinearRegression (normal solver), report RMSE/R2."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    feats = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.avg("o_totalprice").alias("avg_price"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
    )
    return linreg_pipeline(feats, ["n_orders", "avg_price"], "c_acctbal")


_BYTE_CHECKSUM_SQL = "CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT) + CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)"

_MULTIMODAL_ORACLE = f"""
    SELECT doc_id AS item_id,
           CAST(16 AS BIGINT) AS n_bytes,
           CAST(({_BYTE_CHECKSUM_SQL}) % 2147483648 AS BIGINT) AS byte_checksum,
           CAST(64 + (CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) % 64 AS INTEGER) AS width,
           CAST(64 + (CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) % 64 AS INTEGER) AS height
    FROM documents
"""


@_register("ml_logreg_embedding_classifier")  # rows-only: MLlib model
def ml_logreg_embedding_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-predictability probe: multinomial logistic regression
    predicting ``label`` from the 64-dim embedding, reporting train vs
    held-out accuracy — the "does this metadata leak into embedding
    space?" curation diagnostic (classification twin of
    ``ml_linreg_metrics``).  On this corpus the labels are geometric
    noise, so the probe must show chance-level held-out accuracy while
    the model still fits its training fold — both asserted in
    ``tests/test_sketch_quality.py``."""
    from ..ml.regression import logreg_embedding_pipeline

    e = load(spark, sf_dir, "embeddings")
    return logreg_embedding_pipeline(e, "embedding", "label")


@_register("multimodal_byte_features", _MULTIMODAL_ORACLE)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach deterministic media bytes to the
    documents table, then Arrow-batched mapInPandas feature extraction
    (opaque 16-byte blobs exercise the deterministic-fake dimension path;
    the real-codec chains are oracle-checked by ``image_pixel_decode`` /
    ``audio_sample_decode`` / ``video_frame_sample``)."""
    d = load(spark, sf_dir, "documents")
    return extract_features(attach_fake_binary(d, "doc_id", "text"))


# The synthetic blobs carry REAL container headers; the oracle replays the
# same md5-lane arithmetic the generator used (fmt = h[0:2] % 3,
# width = 1 + h[2:6] % 1024, height = 1 + h[6:10] % 1024), so a hash match
# proves the header bytes written by the generator and the offsets read by
# the parser agree with the public format specs end-to-end.
_IMAGE_HEADER_ORACLE = """
    SELECT doc_id AS item_id,
           CASE (CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 3)
             WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
             ELSE 'image/bmp' END AS mime,
           CAST(1 + CAST(('0x' || substr(md5(text), 3, 4)) AS BIGINT) % 1024
                AS INTEGER) AS width,
           CAST(1 + CAST(('0x' || substr(md5(text), 7, 4)) AS BIGINT) % 1024
                AS INTEGER) AS height,
           CAST(CASE (CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 3)
             WHEN 0 THEN 45 WHEN 1 THEN 26 ELSE 42 END AS BIGINT) AS n_bytes
    FROM documents
"""


@_register("image_header_decode", _IMAGE_HEADER_ORACLE)
def image_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real header-level image decode (no codec library): synthesize
    header-valid PNG/GIF/BMP blobs per document, then parse MIME and
    width/height back from the actual bytes at the offsets the format
    specs define (``multimodal/binary_ops.py: sniff_mime, decode_image``).
    Two Arrow ``mapInPandas`` stages, narrow end-to-end."""
    from ..multimodal.binary_ops import decode_media, synthesize_image_blobs

    d = load(spark, sf_dir, "documents")
    return decode_media(synthesize_image_blobs(d, "doc_id", "text")).drop(
        "entropy_millibits"
    )


# Byte i (0-based) of md5(text) as a BIGINT — the oracle's view of the
# synthesized pixel content.
def _md5_byte(i: int) -> str:
    return f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"


# The 2x2 nearest-neighbor resample of a 4x4 image picks source pixels
# (0,0),(0,2),(2,0),(2,2) = flat pixel indices {0,2,8,10}; pixel p's RGB
# bytes are md5[(3p+j) % 16], j=0..2 — so the resized byte-sum is this
# fixed multiset of md5 lanes.
_RESIZED_LANES = sorted((3 * p + j) % 16 for p in (0, 2, 8, 10) for j in range(3))

_IMAGE_PIXEL_ORACLE = f"""
    SELECT doc_id AS item_id,
           CASE ({_md5_byte(0)} % 4)
             WHEN 0 THEN 'image/x-portable-pixmap' WHEN 1 THEN 'image/png'
             WHEN 2 THEN 'image/bmp' ELSE 'image/gif' END AS mime,
           CAST(4 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(3 * ({' + '.join(_md5_byte(i) for i in range(16))}) AS BIGINT)
             AS pixel_sum,
           CAST({' + '.join(_md5_byte(i) for i in _RESIZED_LANES)} AS BIGINT)
             AS resized_sum
    FROM documents
"""


# Video twin: n_frames = 1 + md5[1] % 3, width = 8 * (1 + md5[2] % 2),
# height fixed 8 — one row per extracted frame.
_VIDEO_ORACLE = f"""
    WITH v AS (
        SELECT doc_id,
               1 + {_md5_byte(1)} % 3 AS n_frames,
               CAST(8 * (1 + {_md5_byte(2)} % 2) AS INTEGER) AS width
        FROM documents
    )
    SELECT doc_id AS item_id,
           CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) AS frame_no,
           width,
           CAST(8 AS INTEGER) AS height
    FROM v
"""


@_register("video_frame_sample", _VIDEO_ORACLE)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, oracle-verified: synthesize a Motion-
    JPEG AVI per document (1-3 solid-color baseline-JPEG frames, dims
    from md5 lanes), then re-parse the RIFF container, extract every
    '00dc' frame chunk, and read each frame's dimensions from its JPEG
    header (``multimodal/binary_ops.py: encode_mjpeg_avi,
    extract_mjpeg_frames, sample_video_frames``).  The 1:N row-expanding
    mapInPandas shape video pipelines need — container write -> parse ->
    per-frame codec, all real, all md5-replayable in SQL.  Two narrow
    Arrow stages, no shuffle."""
    from ..multimodal.binary_ops import sample_video_frames, synthesize_video_frames

    d = load(spark, sf_dir, "documents")
    return sample_video_frames(synthesize_video_frames(d, "doc_id", "text"))


# Animated-GIF twin of the video oracle: frame f pixel j has palette
# index md5[(f + 3j) % 16] % 16 over a 16-gray table (gray k = 16k per
# channel), so each frame's RGB byte sum is 48 * sum(indices).
_GIF_FRAMES_ORACLE = """
    WITH g AS (
        SELECT doc_id, text,
               1 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) % 3
                 AS n_frames
        FROM documents
    ),
    f AS (
        SELECT doc_id, text,
               CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER)
                 AS frame_idx
        FROM g
    )
    SELECT doc_id AS item_id, frame_idx,
           CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           CAST(48 * ((CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 0) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 3) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 6) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 9) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 12) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 15) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 18) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 21) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 24) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 27) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 30) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 33) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 36) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 39) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 42) % 16) + 1, 2)) AS BIGINT) % 16) + (CAST(('0x' || substr(md5(text), 2 * ((frame_idx + 45) % 16) + 1, 2)) AS BIGINT) % 16)) AS BIGINT) AS pixel_sum
    FROM f
"""


@_register("gif_frame_sample", _GIF_FRAMES_ORACLE)
def gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF frame sampling, oracle-verified: synthesize a
    GIF89a with 1-3 md5-derived frames per document (graphic-control
    extensions, shared global color table), walk ALL image descriptors
    with the real LZW decoder, and emit each frame's dimensions and RGB
    byte sum (``multimodal/binary_ops.py: encode_animated_gif,
    _gif_decode_all_frames``).  The animated twin of
    ``video_frame_sample`` — web-scrape corpora are full of animated
    GIFs, and the 1:N mapInPandas fan-out is identical.  One narrow
    Arrow stage, md5-replayable end to end."""
    from ..multimodal.binary_ops import decode_gif_frame_stats

    d = load(spark, sf_dir, "documents")
    return decode_gif_frame_stats(d, "doc_id", "text")


# Scene-change twin of the GIF oracle: the per-pixel L1 delta between
# consecutive decoded frames is 48 * |idx_f - idx_{f+1}| with idx from
# md5 lanes, so the whole shot-boundary pass replays in SQL.
_SCENE_CUT_THRESHOLD = 4000


def _scene_change_oracle_sql() -> str:
    def delta(f: int) -> str:
        return " + ".join(
            f"48 * abs(({_md5_byte((f + 3 * j) % 16)}) % 16"
            f" - ({_md5_byte((f + 1 + 3 * j) % 16)}) % 16)"
            for j in range(16)
        )

    rows = []
    for f in range(2):  # n_frames <= 3 -> at most transitions 0 and 1
        rows.append(
            f"""SELECT doc_id AS item_id, CAST({f} AS INTEGER) AS transition_idx,
           CAST({delta(f)} AS BIGINT) AS l1_delta,
           ({delta(f)}) >= {_SCENE_CUT_THRESHOLD} AS is_cut
    FROM v WHERE n_frames >= {f + 2}"""
        )
    return (
        f"""
    WITH v AS (
        SELECT doc_id, text, 1 + {_md5_byte(1)} % 3 AS n_frames FROM documents
    )
    """
        + "\n    UNION ALL ".join(rows)
    )


@_register("video_scene_change_gif", _scene_change_oracle_sql())
def video_scene_change_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-change) detection over REAL decoded frames:
    synthesize each document's 1-3 frame animated GIF, decode every
    frame with the real multi-frame LZW decoder, and emit the exact
    integer L1 pixel delta for each consecutive-frame transition plus
    the threshold cut flag (classic frame-difference shot detection —
    the first pass a video curation pipeline runs to split clips into
    shots before sampling).  GIF is the LOSSLESS animated container, so
    the oracle replays every decoded byte from md5 arithmetic — the
    MJPEG/AVI path (``video_frame_sample``) keeps container+header
    parity while its JPEG payload is quantized, which is proven by the
    codec's own round-trip tests instead.  One narrow 1:N Arrow
    ``mapInPandas`` pass fused into the scan; no shuffle."""
    from ..multimodal.binary_ops import decode_gif_scene_deltas

    d = load(spark, sf_dir, "documents")
    return decode_gif_scene_deltas(d, "doc_id", "text", _SCENE_CUT_THRESHOLD)


# WAV twin of the pixel oracle: sample i = (md5[i%16] - 128) * 256,
# 32 samples -> each lane contributes twice to the sum.
_AUDIO_ORACLE = f"""
    SELECT doc_id AS item_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(32 AS BIGINT) AS n_samples,
           CAST(2 * 256 * (({' + '.join(_md5_byte(i) for i in range(16))})
                           - 16 * 128) AS BIGINT) AS sample_sum,
           CAST(256 * greatest({', '.join(f'abs({_md5_byte(i)} - 128)' for i in range(16))})
                AS INTEGER) AS peak
    FROM documents
"""


@_register("audio_sample_decode", _AUDIO_ORACLE)
def audio_sample_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio sample decode, oracle-verified: synthesize 16-bit PCM
    WAVs whose samples are md5-derived, parse the RIFF/fmt/data chunks
    and decode the PCM integers back (``decode_wav_samples``), emit
    per-clip sum and peak.  DuckDB replays the arithmetic from md5 hex —
    the audio twin of ``image_pixel_decode``.  Narrow mapInPandas, no
    shuffle."""
    from ..multimodal.binary_ops import decode_audio_stats

    d = load(spark, sf_dir, "documents")
    return decode_audio_stats(d, "doc_id", "text")


# Windowed-DSP twin of the audio oracle: the 32 samples are md5-derived
# (sample i = (md5[i%16]-128)*256), so each 8-sample window's integer
# energy and strict zero-crossing count replay in SQL from md5 hex alone.
_AUDIO_WINDOW_ORACLE = """
    SELECT doc_id AS item_id, CAST(0 AS INTEGER) AS window_idx,
           CAST((((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256) AS BIGINT) AS sum_sq,
           CAST((CASE WHEN (((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
    FROM documents
    UNION ALL
    SELECT doc_id AS item_id, CAST(1 AS INTEGER) AS window_idx,
           CAST((((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256) AS BIGINT) AS sum_sq,
           CAST((CASE WHEN (((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
    FROM documents
    UNION ALL
    SELECT doc_id AS item_id, CAST(2 AS INTEGER) AS window_idx,
           CAST((((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256) AS BIGINT) AS sum_sq,
           CAST((CASE WHEN (((CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 7, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 11, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 13, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
    FROM documents
    UNION ALL
    SELECT doc_id AS item_id, CAST(3 AS INTEGER) AS window_idx,
           CAST((((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256) + (((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256) AS BIGINT) AS sum_sq,
           CAST((CASE WHEN (((CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 19, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 21, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 23, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 25, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 27, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) + (CASE WHEN (((CAST(('0x' || substr(md5(text), 29, 2)) AS BIGINT)) - 128) * 256)*(((CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT)) - 128) * 256) < 0 THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
    FROM documents
"""


@_register("audio_window_features", _AUDIO_WINDOW_ORACLE)
def audio_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL windowed audio DSP, oracle-verified: decode the synthesized
    PCM WAVs and emit per-8-sample-window energy (exact integer sum of
    squares, bit-stable across engines) and strict zero-crossing count
    (``multimodal/binary_ops.py: decode_audio_window_features``).  The
    1:N mapInPandas fan-out (4 windows per clip) is the same stage shape
    as video frame sampling; DuckDB replays every window from md5 hex
    arithmetic, proving container parse + PCM decode + windowing agree
    end to end."""
    from ..multimodal.binary_ops import decode_audio_window_features

    d = load(spark, sf_dir, "documents")
    return decode_audio_window_features(d, "doc_id", "text")


# TIFF twin of the image-header oracle: endianness and dims replay from
# the same md5 lanes the synthesizer reads; blob = 8 header + 2 count +
# 2*12 entries + 4 next-IFD + 16 payload = 54 bytes always.
_TIFF_HEADER_ORACLE = """
    SELECT doc_id AS item_id,
           CASE WHEN CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 2 = 0
                THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(1 + CAST(('0x' || substr(md5(text), 3, 4)) AS BIGINT) % 1024
                AS INTEGER) AS width,
           CAST(1 + CAST(('0x' || substr(md5(text), 7, 4)) AS BIGINT) % 1024
                AS INTEGER) AS height,
           CAST(54 AS BIGINT) AS n_bytes
    FROM documents
"""


@_register("tiff_header_decode", _TIFF_HEADER_ORACLE)
def tiff_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real TIFF IFD decode, oracle-verified: synthesize valid TIFFs in
    BOTH byte orders (II and MM, md5-selected), walk the IFD entries per
    the TIFF 6.0 spec (tags 256/257, SHORT values left-justified in the
    value field), and emit byte order + dimensions
    (``multimodal/binary_ops.py: _tiff_dimensions``).  DuckDB replays
    endianness and dims from md5 hex — a hash match proves the writer's
    and parser's byte-order handling agree for both encodings."""
    from ..multimodal.binary_ops import decode_tiff_header_stats

    d = load(spark, sf_dir, "documents")
    return decode_tiff_header_stats(d, "doc_id", "text")


@_register("image_pixel_decode", _IMAGE_PIXEL_ORACLE)
def image_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level codec chain, oracle-verified end-to-end: per
    document, synthesize a complete 4x4 image (pixels = md5 bytes tiled,
    container = PPM/PNG/BMP/GIF by md5 lane), decode the pixels with the
    real codecs (zlib+unfilter for PNG, LZW for GIF, raw arrays for
    BMP/PPM), nearest-neighbor resize to 2x2, re-encode, decode again,
    and emit both byte sums.  The DuckDB oracle recomputes every value
    from md5 hex arithmetic alone — a hash match proves the entire
    encode -> decode -> resample -> re-encode -> decode chain is exact
    for all four containers.  One Arrow ``mapInPandas`` stage: narrow,
    no shuffle, scan-speed at any corpus size."""
    from ..multimodal.binary_ops import decode_pixel_stats

    d = load(spark, sf_dir, "documents")
    return decode_pixel_stats(d, "doc_id", "text")


@_register(
    "streaming_token_counts_by_lang",
    """
    WITH tok AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(tokens)) AS BIGINT) AS total_tokens
    FROM tok GROUP BY lang
    """,
)
def streaming_token_counts_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-ingestion monitoring as a genuine stream: documents arrive
    per micro-batch, tokenization runs as the same JVM regexp projection
    the batch queries use, and per-language doc/token totals aggregate in
    complete mode — the throughput dashboard a streaming curation
    pipeline watches.  AvailableNow + hash-matching the batch oracle
    proves stream/batch parity for the text path, exactly as the OHLC
    twin proves it for the numeric path."""
    from ..functions import text as _TX
    from ..streaming.events_stream import (
        read_documents_stream,
        run_available_now,
    )

    _stream_run_counter[0] += 1
    name = f"token_counts_lang_{_stream_run_counter[0]}"
    docs = read_documents_stream(spark, sf_dir)
    agg = (
        docs.select("lang", _TX.token_count("text").cast("long").alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    return run_available_now(agg, name)


@_register(
    "streaming_ohlc_hourly",
    """
    WITH keyed AS (
        SELECT event_type,
               strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
                 AS bucket,
               value,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 20, '0') AS k
        FROM events
    )
    SELECT event_type, bucket,
           arg_min(value, k) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, k) AS close,
           COUNT(*) AS n_events
    FROM keyed
    GROUP BY event_type, bucket
    """,
)
def streaming_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OHLC candle rollup as a genuine stream (AvailableNow +
    complete mode): watermarked hourly windows whose min_by/max_by
    open/close state merges incrementally per micro-batch.  Because
    every aggregate is mergeable and the order key is total, the
    streamed candles are IDENTICAL to the batch rollup — the oracle is
    the same SQL, and the hash match proves stream/batch parity, not
    just 'runs'."""
    from ..streaming.events_stream import (
        ohlc_hourly_stream,
        read_events_stream,
        run_available_now,
    )

    _stream_run_counter[0] += 1
    name = f"ohlc_hourly_{_stream_run_counter[0]}"
    stream = ohlc_hourly_stream(read_events_stream(spark, sf_dir))
    return run_available_now(stream, name)


@_register(
    "streaming_running_user_counts",
    """
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def streaming_running_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    counts emitted in update mode.  The count per key is monotone across
    micro-batches, so max-over-emissions == batch COUNT(*) — an exact
    batch oracle for a genuinely stateful streaming execution."""
    from ..streaming.stateful import run_update_stream, running_user_counts

    _stream_run_counter[0] += 1
    name = f"running_user_counts_{_stream_run_counter[0]}"
    return run_update_stream(
        running_user_counts(read_events_stream(spark, sf_dir)), name
    )


@_register(
    "streaming_stream_stream_join",
    """
    SELECT a.user_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           b.value AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: purchases within 1 hour of
    a view by the same user.  Inner matches emit as found, so the
    AvailableNow drain equals the batch interval join exactly — the
    oracle is that batch join."""
    from ..streaming.events_stream import interval_join_streams

    _stream_run_counter[0] += 1
    name = f"stream_stream_join_{_stream_run_counter[0]}"
    views = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_streams(views, purchases, "1 hour").select(
        F.col("l.user_id").alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@_register(
    "streaming_complete_event_type_counts",
    """
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def streaming_complete_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete output mode: every trigger re-emits the FULL aggregate
    state (the mode for small always-fresh result tables, e.g. live
    leaderboards).  After an AvailableNow drain the memory sink holds
    exactly the batch GROUP BY — no monotone-max reduction needed,
    which is the observable difference from update mode."""
    _stream_run_counter[0] += 1
    name = f"complete_counts_{_stream_run_counter[0]}"
    counts = read_events_stream(spark, sf_dir).groupBy("event_type").agg(
        F.count("*").alias("n_events")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _register_tws(name: str, sql: str):
    # transformWithStateInPandas runs a Python state-server process that
    # speaks protobuf; without the package the query crashes at start,
    # so the entry only registers where the API can actually run.
    from ..streaming.stateful import HAS_TRANSFORM_WITH_STATE

    return _register(name, sql) if HAS_TRANSFORM_WITH_STATE else (lambda fn: fn)


@_register_tws(
    "streaming_tws_running_stats",
    """
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_tws_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4 stateful API, RocksDB state
    store): per-user running (count, max value) in a typed ValueState,
    emitted in update mode.  Both measures are monotone across
    micro-batches, so max-over-emissions == the batch GROUP BY — an
    exact oracle for the successor stateful operator."""
    from ..streaming.stateful import tws_running_user_stats

    _stream_run_counter[0] += 1
    name = f"tws_running_stats_{_stream_run_counter[0]}"
    result = tws_running_user_stats(read_events_stream(spark, sf_dir))
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
    )


@_register(
    "streaming_sliding_window_counts",
    """
    WITH starts AS (
        SELECT event_type, time_bucket(INTERVAL 15 MINUTES, ts) AS wstart FROM events
        UNION ALL
        SELECT event_type,
               time_bucket(INTERVAL 15 MINUTES, ts) - INTERVAL 15 MINUTES
        FROM events
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS event_count
    FROM starts GROUP BY 1, 2
    """,
)
def streaming_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30min/15min watermarked window counts executed as a real
    stream; the oracle enumerates each event's two containing windows
    explicitly (union of the two 15-min-aligned starts)."""
    from ..streaming.events_stream import sliding_window_counts_stream

    _stream_run_counter[0] += 1
    name = f"sliding_window_counts_{_stream_run_counter[0]}"
    stream = sliding_window_counts_stream(read_events_stream(spark, sf_dir))
    return run_available_now(stream, name)


@_register(
    "streaming_enriched_events",
    """
    SELECT e.event_id, e.user_id, c.c_name AS user_name, e.event_type
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join: the event stream enriched against
    the static customer dimension, append mode (stateless)."""
    from ..streaming.events_stream import enrich_stream_with_dim, run_append_to_table

    _stream_run_counter[0] += 1
    name = f"enriched_events_{_stream_run_counter[0]}"
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return run_append_to_table(
        enrich_stream_with_dim(read_events_stream(spark, sf_dir), dim), name
    )


@_register(
    "streaming_dedup_event_counts",
    """
    SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
    """,
)
def streaming_dedup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a deliberately doubled stream
    (same source unioned with itself): per-type counts of the deduped
    append output equal the plain batch counts — exactly-once semantics
    made observable."""
    from ..streaming.events_stream import dedup_doubled_stream, run_append_to_table

    _stream_run_counter[0] += 1
    name = f"dedup_events_{_stream_run_counter[0]}"
    deduped = run_append_to_table(dedup_doubled_stream(spark, sf_dir), name)
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


@_register(
    "streaming_session_windows",
    """
    WITH lagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT *,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM lagged
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-sessionization via the built-in session_window
    (incremental session-state merging) — oracle is the batch
    gaps-and-islands formulation.  Session start equals min(ts) in both;
    the >= boundary matches session_window's exclusive session end."""
    from ..streaming.events_stream import session_window_counts_stream

    _stream_run_counter[0] += 1
    name = f"session_windows_{_stream_run_counter[0]}"
    stream = session_window_counts_stream(read_events_stream(spark, sf_dir))
    return run_available_now(stream, name)


@_register(
    "streaming_latest_user_state",
    """
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           event_id, event_type, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def streaming_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC latest-state maintenance (applyInPandasWithState):
    per-user argmax of (event_type, value) by the (ts, event_id) total
    order, kept as one tuple of state per key and emitted in update
    mode.  The emitted state is monotone in that order across
    micro-batches, so reducing all emissions by the same argmax equals
    the batch last-state exactly — proving the streaming path maintains
    precisely the table :func:`snapshot_diff_user_state` snapshots.
    State store is O(distinct users), independent of event volume."""
    from ..streaming.events_stream import read_events_stream
    from ..streaming.stateful import latest_user_state, run_latest_stream

    _stream_run_counter[0] += 1
    name = f"latest_user_state_{_stream_run_counter[0]}"
    return run_latest_stream(latest_user_state(read_events_stream(spark, sf_dir)), name)


# ---------------------------------------------------------------------------
# Image perceptual-hash near-dup — real decode -> aHash -> banded join.
# ---------------------------------------------------------------------------

_AHASH_BANDS = 4  # 16-bit hash -> 4 bands of 4 bits
_AHASH_MAXDIST = 2


def _ahash_oracle_sql() -> str:
    # pixel p's luminance = md5 bytes (3p)%16 + (3p+1)%16 + (3p+2)%16;
    # each lane appears exactly 3x across the 16 pixels, so the total is
    # 3 * sum(all lanes).  Bit p set iff 16*lum_p > total (strict).
    def lum(p: int) -> str:
        return " + ".join(_md5_byte((3 * p + j) % 16) for j in range(3))

    total = " + ".join(_md5_byte(i) for i in range(16))
    ahash = " + ".join(
        f"(CASE WHEN 16 * ({lum(p)}) > 3 * ({total}) THEN {1 << p} ELSE 0 END)"
        for p in range(16)
    )
    bands = "\n        UNION ALL ".join(
        f"SELECT item_id, {b} AS band_idx, "
        f"(ahash // {16 ** b}) % 16 AS band_val FROM hashes"
        for b in range(_AHASH_BANDS)
    )
    return f"""
    WITH hashes AS (
        SELECT doc_id AS item_id, CAST({ahash} AS BIGINT) AS ahash
        FROM documents
    ),
    bands AS (
        {bands}
    ),
    cand AS (
        SELECT DISTINCT a.item_id AS id_a, b.item_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.item_id < b.item_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.ahash, hb.ahash)) AS INT) AS hamming
    FROM cand c
    JOIN hashes ha ON ha.item_id = c.id_a
    JOIN hashes hb ON hb.item_id = c.id_b
    WHERE bit_count(xor(ha.ahash, hb.ahash)) <= {_AHASH_MAXDIST}
    """


@_register("image_ahash_near_dup", _ahash_oracle_sql())
def image_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection over REAL decoded pixels: per
    document synthesize its 4x4 image (mixed PPM/PNG/BMP/GIF containers,
    md5-derived bytes — the ``image_pixel_decode`` corpus), decode with
    the real codecs, compute the 16-bit average-hash (aHash: bit p set
    iff pixel p's luminance exceeds the image mean — integer-exact as
    ``16*lum_p > total``), then find near-duplicates by LSH-style
    BANDED Hamming join: 4 bands of 4 bits, candidates share a band,
    verify ``bit_count(xor) <= {d}``.  Any pair within Hamming distance
    {d} differs in <= {d} bands and therefore SHARES at least one of
    the 4 — the banding is lossless at this radius (the pigeonhole
    guarantee SimHash banding uses), so the output is exactly the
    all-pairs answer without the quadratic join.

    The oracle recomputes every hash from md5 arithmetic alone while
    Spark derives it from the REAL decode chain — a hash match proves
    decode exactness AND the dedup mechanics in one query.  Scale
    shape: one narrow Arrow ``mapInPandas`` (decode fuses into the
    scan), then signatures — never images — shuffle through the banded
    equi-join, the ``minhash_lsh_near_dup`` shape on binary media."""
    import pandas as pd

    from pyspark.sql import types as T

    from ..multimodal.binary_ops import _synth_pixel_blob, decode_pixels

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("item_id"), F.col("text").alias("_t")
    )

    def run(batches):
        for pdf in batches:
            hashes = []
            for text in pdf["_t"]:
                _, _, rgb = decode_pixels(_synth_pixel_blob(text))
                lums = [sum(rgb[3 * p : 3 * p + 3]) for p in range(16)]
                total = sum(lums)
                h = 0
                for p, lum in enumerate(lums):
                    if 16 * lum > total:
                        h |= 1 << p
                hashes.append(h)
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "ahash": pd.Series(hashes, dtype="int64")}
            )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )
    hashes = d.mapInPandas(run, schema)
    bands = None
    for b in range(_AHASH_BANDS):
        one = hashes.select(
            "item_id",
            F.lit(b).alias("band_idx"),
            F.expr(f"(ahash div {16 ** b}) % 16").alias("band_val"),
        )
        bands = one if bands is None else bands.unionAll(one)
    a_, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .select(F.col("a.item_id").alias("id_a"), F.col("b.item_id").alias("id_b"))
        .distinct()
    )
    ha = hashes.select(F.col("item_id").alias("id_a"), F.col("ahash").alias("h_a"))
    hb = hashes.select(F.col("item_id").alias("id_b"), F.col("ahash").alias("h_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(bit_count(h_a ^ h_b) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _AHASH_MAXDIST)
    )


image_ahash_near_dup.__doc__ = image_ahash_near_dup.__doc__.format(
    d=_AHASH_MAXDIST
)


# ---------------------------------------------------------------------------
# pHash (sign-DCT perceptual hash) near-dup over REAL decoded pixels —
# the frequency-domain sibling of image_ahash_near_dup: aHash compares
# luminances to their mean (robust to uniform brightness), the DCT sign
# hash captures the image's low-frequency STRUCTURE (robust to global
# scaling, the property that makes pHash the industry default).
# ---------------------------------------------------------------------------

_PHASH_BANDS = 3  # 15 sign bits -> 3 bands x 5 bits
_PHASH_MAXDIST = 2  # pigeonhole-lossless: dist <= 2 shares >= 1 of 3 bands


def _phash_weights() -> list[tuple[int, list[float]]]:
    """Per AC coefficient (u,v) != (0,0): the 16 flattened 4x4 DCT-II
    basis weights a(u)a(v)cos((2x+1)u*pi/8)cos((2y+1)v*pi/8), FIXED
    POINT as round(w * 1e9) INTEGERS.  A double multiply-add chain is
    NOT bit-stable across engines (a compiled engine may fuse a*b+c
    into FMA — observed as a sign flip on one sf0.1 document), so the
    weighted sums run entirely in int64: |sum| <= 16 * 765 * 1e9 ~
    1.2e13, far inside the int64 range; the 1e-9 basis quantization
    only moves sign bits of coefficients within ~1e-8 of zero, and
    does so IDENTICALLY on both engines."""
    import math

    def alpha(u: int) -> float:
        return math.sqrt(0.25) if u == 0 else math.sqrt(0.5)

    out = []
    bit = 0
    for u in range(4):
        for v in range(4):
            if u == 0 and v == 0:
                continue
            w = [
                round(
                    alpha(u)
                    * alpha(v)
                    * math.cos((2 * x + 1) * u * math.pi / 8)
                    * math.cos((2 * y + 1) * v * math.pi / 8)
                    * 1_000_000_000
                )
                for y in range(4)
                for x in range(4)
            ]
            out.append((bit, w))
            bit += 1
    return out


_PHASH_W = _phash_weights()


def _phash_oracle_sql() -> str:
    def lum(p: int) -> str:
        return "(" + " + ".join(_md5_byte((3 * p + j) % 16) for j in range(3)) + ")"

    coeffs = []
    for bit, w in _PHASH_W:
        expr = " + ".join(f"{lum(p)} * {w[p]}" for p in range(16))
        coeffs.append(f"(CASE WHEN ({expr}) > 0 THEN {1 << bit} ELSE 0 END)")
    phash = " + ".join(coeffs)
    bands = "\n        UNION ALL ".join(
        f"SELECT item_id, {b} AS band_idx, "
        f"(phash // {32 ** b}) % 32 AS band_val FROM hashes"
        for b in range(_PHASH_BANDS)
    )
    return f"""
    WITH hashes AS MATERIALIZED (
        SELECT doc_id AS item_id, CAST({phash} AS BIGINT) AS phash
        FROM documents
    ),
    bands AS (
        {bands}
    ),
    cand AS (
        SELECT DISTINCT a.item_id AS id_a, b.item_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.item_id < b.item_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS INT) AS hamming
    FROM cand c
    JOIN hashes ha ON ha.item_id = c.id_a
    JOIN hashes hb ON hb.item_id = c.id_b
    WHERE bit_count(xor(ha.phash, hb.phash)) <= {_PHASH_MAXDIST}
    """


@_register("image_phash_near_dup", _phash_oracle_sql())
def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over REAL decoded
    pixels: decode each document's synthesized 4x4 image with the real
    codecs, take the 2D DCT-II of the luminance grid, and set one bit
    per AC coefficient's SIGN (the sign-DCT pHash variant — no median
    threshold, so the hash is a pure deterministic function of the
    pixels) — then the same pigeonhole-lossless banded Hamming join as
    ``image_ahash_near_dup`` (15 bits -> 3 bands of 5; any pair within
    distance {d} shares a band).  aHash answers "same brightness
    pattern"; the DCT signs answer "same low-frequency STRUCTURE" —
    running both is the standard near-dup defense in image pipelines.

    Cross-engine exactness: the DCT basis is FIXED-POINT (round(w*1e9)
    integers computed once in Python, embedded in the oracle), so the
    weighted sums are pure int64 arithmetic — a double multiply-add
    chain is not bit-stable across engines (FMA fusion flipped one
    sf0.1 document's sign bit in this query's first draft); the oracle
    derives luminances from md5
    arithmetic while Spark decodes REAL containers, so a hash match
    again proves the codec chain end-to-end.  Scale shape: one narrow
    Arrow ``mapInPandas`` fused into the scan; only 15-bit signatures
    shuffle through the banded equi-join."""
    import pandas as pd

    from pyspark.sql import types as T

    from ..multimodal.binary_ops import _synth_pixel_blob, decode_pixels

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("item_id"), F.col("text").alias("_t")
    )
    weights = _PHASH_W

    def run(batches):
        for pdf in batches:
            hashes = []
            for text in pdf["_t"]:
                _, _, rgb = decode_pixels(_synth_pixel_blob(text))
                lums = [sum(rgb[3 * p : 3 * p + 3]) for p in range(16)]
                h = 0
                for bit, w in weights:
                    c = 0
                    for p in range(16):
                        c += lums[p] * w[p]
                    if c > 0:
                        h |= 1 << bit
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    hashes = d.mapInPandas(run, schema)
    bands = None
    for b in range(_PHASH_BANDS):
        one = hashes.select(
            "item_id",
            F.lit(b).alias("band_idx"),
            F.expr(f"(phash div {32 ** b}) % 32").alias("band_val"),
        )
        bands = one if bands is None else bands.unionAll(one)
    a_, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .select(F.col("a.item_id").alias("id_a"), F.col("b.item_id").alias("id_b"))
        .distinct()
    )
    ha = hashes.select(F.col("item_id").alias("id_a"), F.col("phash").alias("h_a"))
    hb = hashes.select(F.col("item_id").alias("id_b"), F.col("phash").alias("h_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(bit_count(h_a ^ h_b) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAXDIST)
    )


image_phash_near_dup.__doc__ = image_phash_near_dup.__doc__.format(
    d=_PHASH_MAXDIST
)


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup over REAL decoded PCM — the audio member
# of the multimodal x dedup crossover (aHash/pHash are the image
# members): a scaled-down Haitsma & Kalker 2002 ("A Highly Robust
# Audio Fingerprinting System", public) sub-fingerprint — frame the
# clip, measure per-frame spectral band amplitudes, and set one bit
# per (band, frame) from the SIGN of the band-energy difference's
# time derivative — then the same pigeonhole-lossless banded Hamming
# join as the image tiers.
# ---------------------------------------------------------------------------

_AFP_FRAME = 8  # samples per analysis frame
_AFP_HOP = 4  # frame hop (50% overlap, the paper's shape)
_AFP_NFRAMES = 7  # (32 - _AFP_FRAME) / _AFP_HOP + 1 over the 32-sample clip
_AFP_NBANDS = 5  # cosine bands 0..4; bits use adjacent-band differences
_AFP_BITS = (_AFP_NFRAMES - 1) * (_AFP_NBANDS - 1)  # 24-bit fingerprint
_AFP_BANDS = 3  # 24 bits -> 3 bands x 8 bits for the LSH join
_AFP_MAXDIST = 2  # pigeonhole-lossless: dist <= 2 shares >= 1 of 3 bands


def _afp_weights() -> list[list[int]]:
    """Integer-cosine analysis bank: band b's weight on frame sample x
    is round(cos(pi*b*(2x+1)/(2*FRAME)) * 1e9), FIXED POINT for the
    same reason as the pHash DCT basis (``29fa948``): a double
    multiply-add chain is not bit-stable across engines (FMA fusion),
    so band amplitudes are pure int64 — |sum| <= 8 * 32768 * 1e9 ~
    2.7e14, and the second-order bit differences stay < 1.1e15, both
    far inside int64."""
    import math

    return [
        [
            round(math.cos(math.pi * b * (2 * x + 1) / (2 * _AFP_FRAME)) * 1_000_000_000)
            for x in range(_AFP_FRAME)
        ]
        for b in range(_AFP_NBANDS)
    ]


_AFP_W = _afp_weights()


def _afp_fingerprint(samples: list[int]) -> int:
    """24-bit Haitsma-Kalker sub-fingerprint of a 32-sample PCM clip,
    pure integer arithmetic (shared by the Spark mapInPandas body and
    the test fixtures; the oracle replays the same algebra in SQL)."""
    e = [
        [
            abs(
                sum(
                    samples[_AFP_HOP * m + x] * _AFP_W[b][x]
                    for x in range(_AFP_FRAME)
                )
            )
            for m in range(_AFP_NFRAMES)
        ]
        for b in range(_AFP_NBANDS)
    ]
    fp = 0
    for m in range(_AFP_NFRAMES - 1):
        for b in range(1, _AFP_NBANDS):
            if (e[b][m] - e[b][m + 1]) - (e[b - 1][m] - e[b - 1][m + 1]) > 0:
                fp |= 1 << (m * (_AFP_NBANDS - 1) + b - 1)
    return fp


def _afp_oracle_sql() -> str:
    def sample(i: int) -> str:
        return f"(({_md5_byte(i % 16)}) - 128) * 256"

    e_cols = []
    for b in range(_AFP_NBANDS):
        for m in range(_AFP_NFRAMES):
            expr = " + ".join(
                f"({sample(_AFP_HOP * m + x)}) * ({_AFP_W[b][x]})"
                for x in range(_AFP_FRAME)
            )
            e_cols.append(f"abs(CAST({expr} AS BIGINT)) AS e_{b}_{m}")
    bits = []
    for m in range(_AFP_NFRAMES - 1):
        for b in range(1, _AFP_NBANDS):
            bit = m * (_AFP_NBANDS - 1) + b - 1
            bits.append(
                f"(CASE WHEN (e_{b}_{m} - e_{b}_{m + 1})"
                f" - (e_{b - 1}_{m} - e_{b - 1}_{m + 1}) > 0"
                f" THEN {1 << bit} ELSE 0 END)"
            )
    bands = "\n        UNION ALL ".join(
        f"SELECT item_id, {b} AS band_idx, "
        f"(afp // {256 ** b}) % 256 AS band_val FROM hashes"
        for b in range(_AFP_BANDS)
    )
    return f"""
    WITH e AS MATERIALIZED (
        SELECT doc_id AS item_id, {', '.join(e_cols)}
        FROM documents
    ),
    hashes AS MATERIALIZED (
        SELECT item_id, CAST({' + '.join(bits)} AS BIGINT) AS afp FROM e
    ),
    bands AS (
        {bands}
    ),
    cand AS (
        SELECT DISTINCT a.item_id AS id_a, b.item_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.item_id < b.item_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.afp, hb.afp)) AS INT) AS hamming
    FROM cand c
    JOIN hashes ha ON ha.item_id = c.id_a
    JOIN hashes hb ON hb.item_id = c.id_b
    WHERE bit_count(xor(ha.afp, hb.afp)) <= {_AFP_MAXDIST}
    """


@_register("audio_fingerprint_near_dup", _afp_oracle_sql())
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-duplicate detection over REAL decoded
    PCM: synthesize each document's md5-derived 32-sample 16-bit WAV,
    round-trip it through the real container codec
    (``multimodal/binary_ops.py: encode_wav`` -> ``decode_wav_samples``),
    then compute a scaled-down Haitsma-Kalker sub-fingerprint — frame
    the clip ({f}-sample frames, hop {h}), measure {nb} integer-cosine
    band amplitudes per frame, and set one bit per (band, frame
    transition) from the sign of the band difference's time derivative
    (the paper's F(n,m) bit rule) — {bits} bits total, then the same
    pigeonhole-lossless banded Hamming join as ``image_phash_near_dup``
    ({bits} bits -> {bands} bands of 8; any pair within distance {d}
    shares a band).

    Cross-engine exactness: the analysis bank is FIXED-POINT
    (round(cos * 1e9) integers embedded in both engines), so band
    amplitudes and the second-order bit differences are pure int64 —
    no float filterbank anywhere (the pHash FMA lesson).  The oracle
    derives samples from md5 arithmetic while Spark decodes REAL WAV
    containers, so a hash match proves the codec chain end to end.
    Scale shape: one narrow Arrow ``mapInPandas`` fused into the scan;
    only 24-bit signatures shuffle through the banded equi-join —
    never audio."""
    import hashlib

    import pandas as pd

    from pyspark.sql import types as T

    from ..multimodal.binary_ops import decode_wav_samples, encode_wav

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("item_id"), F.col("text").alias("_t")
    )

    def run(batches):
        for pdf in batches:
            fps = []
            for text in pdf["_t"]:
                h = hashlib.md5(text.encode()).digest()
                samples = [(h[i % 16] - 128) * 256 for i in range(32)]
                blob = encode_wav(samples, channels=1, rate=8000, bits=16)
                _, _, _, back = decode_wav_samples(blob)
                fps.append(_afp_fingerprint(back))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )
    hashes = d.mapInPandas(run, schema)
    bands = None
    for b in range(_AFP_BANDS):
        one = hashes.select(
            "item_id",
            F.lit(b).alias("band_idx"),
            F.expr(f"(afp div {256 ** b}) % 256").alias("band_val"),
        )
        bands = one if bands is None else bands.unionAll(one)
    a_, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .select(F.col("a.item_id").alias("id_a"), F.col("b.item_id").alias("id_b"))
        .distinct()
    )
    ha = hashes.select(F.col("item_id").alias("id_a"), F.col("afp").alias("h_a"))
    hb = hashes.select(F.col("item_id").alias("id_b"), F.col("afp").alias("h_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(bit_count(h_a ^ h_b) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _AFP_MAXDIST)
    )


audio_fingerprint_near_dup.__doc__ = audio_fingerprint_near_dup.__doc__.format(
    f=_AFP_FRAME,
    h=_AFP_HOP,
    nb=_AFP_NBANDS,
    bits=_AFP_BITS,
    bands=_AFP_BANDS,
    d=_AFP_MAXDIST,
)


@_register(
    "streaming_srm_guardrail",
    """
    WITH assigned AS (
        SELECT CAST(('0x' || substr(md5('srm' || CAST(user_id AS VARCHAR)),
                     1, 13)) AS BIGINT) % 2 AS variant
        FROM events
    ),
    counts AS (
        SELECT variant, COUNT(*) AS n FROM assigned GROUP BY variant
    )
    SELECT CAST(SUM(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT)
               AS n_treatment,
           CAST(SUM(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT)
               AS n_control,
           round((SUM(CASE WHEN variant = 1 THEN n ELSE 0 END)
                  - SUM(CASE WHEN variant = 0 THEN n ELSE 0 END))
                 / sqrt(CAST(SUM(n) AS DOUBLE)), 6) AS srm_z
    FROM counts
    """,
)
def streaming_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sample-ratio-mismatch guardrail AS A LIVE STREAM: events
    arrive per micro-batch, each is assigned its md5 variant (the
    srm_check_assignment split), and complete-mode aggregation keeps
    the per-variant exposure counts always fresh — the monitor an
    experimentation platform watches DURING the experiment, where
    catching a broken splitter on day one is the whole point (the
    batch twin audits after the fact).  The final z = (n1 - n0)/
    sqrt(n) is computed over the drained AvailableNow state and
    hash-matched against the batch oracle, proving stream/batch parity
    for the guardrail exactly as the OHLC twin proves it for candles.

    Scale shape: streaming grouped count with 2-row state; the z is
    scalar arithmetic on the final table."""
    from ..streaming.events_stream import read_events_stream

    _stream_run_counter[0] += 1
    name = f"srm_guardrail_{_stream_run_counter[0]}"
    ev = read_events_stream(spark, sf_dir)
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm"), F.col("user_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    counts = ev.select(variant.alias("variant")).groupBy("variant").agg(
        F.count("*").alias("n")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table(name)
    n1 = F.sum(F.when(F.col("variant") == 1, F.col("n")).otherwise(0))
    n0 = F.sum(F.when(F.col("variant") == 0, F.col("n")).otherwise(0))
    return t.agg(
        n1.cast("long").alias("n_treatment"),
        n0.cast("long").alias("n_control"),
        F.round((n1 - n0) / F.sqrt(F.sum("n").cast("double")), 6).alias(
            "srm_z"
        ),
    )
