"""Binary (image/audio/video) columns as first-class data.

Design: media is an opaque ``binary`` column plus a typed metadata struct
(mime, n_bytes, source).  Heavy per-item work (decode, resize, frame
sampling, feature extraction) runs as Arrow-batched ``mapInPandas`` — the
only sane shape at 100 TB: batches stream through Python workers without
per-row pickling, partitions process independently, and the decode library
never touches the JVM.

The actual image/audio codecs are NOT installed in this environment, so
``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is requested — the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested either way.
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


def decode_image(data: bytes, deterministic_fake: bool = False) -> tuple[int, int]:
    """Decode an image to (width, height).

    STUB: real decoding needs an image library not present in this
    container.  The deterministic fake derives a plausible shape from the
    first two bytes so downstream plumbing is exercised end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not installed here; "
            "pass deterministic_fake=True for the plumbing-test decoder"
        )
    return (64 + data[0] % 64, 64 + data[1] % 64)


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


def resize_image(data: bytes, w: int, h: int, deterministic_fake: bool = False) -> bytes:
    """STUB resize: real resampling needs an imaging library not installed
    here.  The fake produces a deterministic (w*h//64)-byte blob derived
    from the source bytes so batch shapes and sizes are realistic."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resizing requires an imaging library not installed here; "
            "pass deterministic_fake=True for the plumbing-test resizer"
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
