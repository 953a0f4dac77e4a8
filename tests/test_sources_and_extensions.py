"""Tests for sources (CSV null round-trip, JSON flatten), streaming,
multimodal plumbing, and the ML surface."""

from __future__ import annotations

import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.ml.regression import (
    linreg_pipeline,
)
from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
    attach_fake_binary,
    decode_image,
    extract_features,
)
from data_engineering_sf_mobile_food_facilities_public_spark.sources.files import (
    read_csv,
    write_csv,
)
from data_engineering_sf_mobile_food_facilities_public_spark.sources.json_flatten import (
    flatten_yelp,
)
from data_engineering_sf_mobile_food_facilities_public_spark.streaming.events_stream import (
    hourly_event_counts_stream,
    read_events_stream,
    run_available_now,
)
from tests.conftest import SF_SMOKE

import pytest


def test_csv_null_round_trip(spark):
    # SURVEY.md 4.3.3: the reference loses null fidelity at CSV edges;
    # the engine must not (explicit schema + nullValue convention).
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [Row(k=1, s="x", d=1.5), Row(k=2, s=None, d=None), Row(k=3, s="", d=0.0)],
        schema,
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/t"
        write_csv(df, path)
        back = read_csv(spark, path, schema)
        rows = {r.k: (r.s, r.d) for r in back.collect()}
    assert rows[1] == ("x", 1.5)
    assert rows[2] == (None, None)
    # empty string and NULL collapse to NULL under the '' convention —
    # the one lossy corner, standardized rather than silent
    assert rows[3] == (None, 0.0)


def test_yelp_json_flatten(spark):
    raw = spark.createDataFrame(
        [
            Row(
                raw_json='{"businesses": [{"id": "b1", "name": "Truck A", '
                '"review_count": 12, "rating": 4.5, '
                '"location": {"display_address": ["1 Main St", "SF"]}, '
                '"display_phone": "555", '
                '"coordinates": {"latitude": 37.7, "longitude": -122.4}}, '
                '{"id": "b2", "name": "Cart B", "review_count": 3, "rating": 3.0, '
                '"location": {"display_address": []}, "display_phone": null, '
                '"coordinates": {"latitude": null, "longitude": null}}]}'
            ),
            Row(raw_json="not json at all"),
        ]
    )
    out = flatten_yelp(raw).collect()
    assert len(out) == 2  # malformed row -> null businesses -> no rows
    b1 = next(r for r in out if r.Yelp_id == "b1")
    assert (b1.Name, b1.Review, b1.Rating, b1.Address) == ("Truck A", 12, 4.5, "1 Main St")
    b2 = next(r for r in out if r.Yelp_id == "b2")
    assert b2.Address is None and b2.Latitude is None


def test_streaming_equals_batch(spark):
    stream_result = run_available_now(
        hourly_event_counts_stream(read_events_stream(spark, SF_SMOKE)),
        "test_hourly_counts",
    )
    batch = (
        load(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
    assert sorted(map(tuple, stream_result.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_multimodal_features(spark):
    d = load(spark, SF_SMOKE, "documents").limit(50)
    feats = extract_features(attach_fake_binary(d, "doc_id", "text")).collect()
    assert len(feats) == 50
    assert all(r.n_bytes == 16 for r in feats)
    assert all(64 <= r.width < 128 and 64 <= r.height < 128 for r in feats)
    # deterministic: same input -> same checksum on re-run
    again = {r.item_id: r.byte_checksum for r in
             extract_features(attach_fake_binary(d, "doc_id", "text")).collect()}
    assert all(again[r.item_id] == r.byte_checksum for r in feats)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 16)


def test_header_decoders_parse_real_formats():
    """decode_image reads REAL header bytes at the public spec offsets —
    round-trip a hand-built header per format and a synthetic JPEG with
    an APP0 segment before its SOF0 marker."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        byte_entropy,
        decode_wav_meta,
        sniff_mime,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    assert sniff_mime(png) == "image/png"
    assert decode_image(png) == (640, 480)

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert sniff_mime(gif) == "image/gif"
    assert decode_image(gif) == (320, 200)

    bmp = (
        b"BM" + (62).to_bytes(4, "little") + bytes(4)
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (800).to_bytes(4, "little", signed=True)
        + (-600).to_bytes(4, "little", signed=True)  # top-down BMP: negative h
    )
    assert sniff_mime(bmp) == "image/bmp"
    assert decode_image(bmp) == (800, 600)

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof0 = b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8]) \
        + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + bytes(10)
    jpg = b"\xff\xd8" + app0 + sof0
    assert sniff_mime(jpg) == "image/jpeg"
    assert decode_image(jpg) == (1920, 1080)

    wav = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    assert sniff_mime(wav) == "audio/wav"
    assert decode_wav_meta(wav) == (2, 44100, 16)

    assert byte_entropy(b"\x00" * 100) == 0.0
    assert byte_entropy(bytes(range(256))) == 8.0


def test_header_decoder_edge_cases():
    """Spec-legal oddities the round-2 ADVICE flagged: 0xFF fill bytes
    between JPEG segments, SOS before any SOF, and BMPs with a negative
    (malformed) width."""
    # fill bytes (legal padding) between APP0 and SOF0 must not derail the walk
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof0 = b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8]) \
        + (240).to_bytes(2, "big") + (320).to_bytes(2, "big") + bytes(10)
    jpg_fill = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0
    assert decode_image(jpg_fill) == (320, 240)

    # SOS with no SOF: walker must stop at entropy-coded data, not read
    # garbage lengths out of it
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes(6)
    jpg_sofless = b"\xff\xd8" + app0 + sos + b"\x12\x34\x56\x78" * 4
    with pytest.raises(ValueError):
        decode_image(jpg_sofless)

    # negative width is malformed (only height may legally be negative)
    bad_bmp = (
        b"BM" + (62).to_bytes(4, "little") + bytes(4)
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (-800).to_bytes(4, "little", signed=True)
        + (600).to_bytes(4, "little", signed=True)
    )
    with pytest.raises(ValueError):
        decode_image(bad_bmp)


def test_hyperplane_bucket_tolerates_null_and_ragged_vectors(spark):
    """A null or wrong-length embedding degrades to a null bucket (row
    drops out of the bucket equi-join) instead of crashing the batch."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.similarity import (
        hyperplane_bucket,
    )

    rows = [
        (1, [float(i) for i in range(8)]),
        (2, None),
        (3, [1.0, 2.0]),  # wrong length
        (4, [float(-i) for i in range(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["bucket"]
        for r in df.select(
            "vec_id", hyperplane_bucket("embedding", num_planes=4, dim=8).alias("bucket")
        ).collect()
    }
    assert out[2] is None and out[3] is None
    assert out[1] is not None and out[4] is not None
    # all-valid fast path agrees with the mixed-batch slow path
    clean = spark.createDataFrame(
        [rows[0], rows[3]], "vec_id long, embedding array<double>"
    )
    clean_out = {
        r["vec_id"]: r["bucket"]
        for r in clean.select(
            "vec_id", hyperplane_bucket("embedding", num_planes=4, dim=8).alias("bucket")
        ).collect()
    }
    assert clean_out[1] == out[1] and clean_out[4] == out[4]


def test_synthesized_blobs_decode_to_oracle_formula(spark):
    """End-to-end: generator writes real headers, parser reads them back;
    values must equal the md5-lane formula the SQL oracle replays."""
    import hashlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_media,
        synthesize_image_blobs,
    )

    d = load(spark, SF_SMOKE, "documents").limit(80)
    texts = {r.doc_id: r.text for r in d.collect()}
    out = decode_media(synthesize_image_blobs(d, "doc_id", "text")).collect()
    assert len(out) == 80
    for r in out:
        h = hashlib.md5(texts[r.item_id].encode()).hexdigest()
        fmt = int(h[0:2], 16) % 3
        assert r.mime == ["image/png", "image/gif", "image/bmp"][fmt]
        assert r.width == 1 + int(h[2:6], 16) % 1024
        assert r.height == 1 + int(h[6:10], 16) % 1024
        assert r.entropy_millibits > 0


def test_linreg_pipeline_deterministic(spark):
    li = load(spark, SF_SMOKE, "lineitem").limit(2000)
    m1 = linreg_pipeline(li, ["l_quantity", "l_discount"], "l_extendedprice").collect()[0]
    m2 = linreg_pipeline(li, ["l_quantity", "l_discount"], "l_extendedprice").collect()[0]
    assert m1.rmse == m2.rmse and m1.r2 == m2.r2
    assert 0.0 <= m1.r2 <= 1.0


def test_multimodal_resize_and_frame_sampling(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        attach_fake_binary,
        resize_images,
        sample_frames,
    )
    from tests.conftest import SF_SMOKE

    media = attach_fake_binary(load(spark, SF_SMOKE, "documents").limit(20), "doc_id", "text")
    resized = resize_images(media, 64, 64).collect()
    assert all(len(r["data"]) == 64 * 64 // 64 for r in resized)
    assert all(r["width"] == 64 and r["height"] == 64 for r in resized)

    frames = sample_frames(media, every_n_bytes=4)
    # 16-byte fake blobs -> 4 frames each, frame_no 0..3
    per_item = frames.groupBy("item_id").count().collect()
    assert all(r["count"] == 4 for r in per_item)
    assert len(per_item) == 20


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    """The reference's weekly refresh drops and rebuilds everything
    (airflow.py:310-311); the engine's equivalent is dynamic partition
    overwrite — rewriting only the partitions present in the new batch."""
    import os

    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.files import (
        write_parquet,
    )
    from tests.conftest import SF_SMOKE

    out = os.path.join(tmp_path, "events_by_day")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        e = load(spark, SF_SMOKE, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        write_parquet(e, out, partition_by=["day"])
        total = spark.read.parquet(out).count()
        days = [r["day"] for r in spark.read.parquet(out).select("day").distinct().collect()]
        one_day = sorted(days)[0]

        # "weekly" re-run delivers one refreshed day; only that partition
        # is rewritten, all others stay untouched
        refreshed = e.filter(F.col("day") == one_day)
        n_day = refreshed.count()
        write_parquet(refreshed, out, mode="overwrite", partition_by=["day"])
        assert spark.read.parquet(out).count() == total
        assert (
            spark.read.parquet(out).filter(F.col("day") == one_day).count() == n_day
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_map_in_arrow_matches_pandas_path(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        attach_fake_binary,
        extract_features,
        extract_features_arrow,
    )
    from tests.conftest import SF_SMOKE

    media = attach_fake_binary(
        load(spark, SF_SMOKE, "documents"), "doc_id", "text"
    )
    a = extract_features(media)
    b = extract_features_arrow(media)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_observe_metrics_on_pipeline(spark):
    """df.observe(): pipeline-health counters collected as a side effect
    of the action — no second scan (the production observability hook
    for row counts / null rates at 100 TB)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    obs = Observation("orders_health")
    o = load(spark, SF_SMOKE, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpositive_price"
        ),
    )
    n_f = o.filter(F.col("o_orderstatus") == "F").count()
    m = obs.get
    assert m["n_rows"] == load(spark, SF_SMOKE, "orders").count()
    assert m["n_nonpositive_price"] == 0
    assert 0 < n_f <= m["n_rows"]


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: files written before and after a column was
    added read together with mergeSchema; old rows surface null."""
    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "evolving")
    o = load(spark, SF_SMOKE, "orders")
    o.select("o_orderkey", "o_totalprice").write.parquet(d + "/batch=1")
    o.select(
        "o_orderkey", "o_totalprice", F.lit("v2").alias("source_tag")
    ).write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "source_tag", "batch"}
    n = o.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("source_tag").isNull()).count() == n


def test_orc_round_trip(spark, tmp_path):
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    p = str(tmp_path / "orders_orc")
    o = load(spark, SF_SMOKE, "orders")
    o.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == o.schema
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_xml_round_trip(spark, tmp_path):
    """XML source/sink (built-in since Spark 4): schema'd round-trip
    preserves types; reads never infer."""
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.files import (
        read_xml,
        write_xml,
    )

    df = load(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_xml")
    write_xml(df, path, row_tag="nation")
    back = read_xml(spark, path, df.schema, row_tag="nation")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_transpose_and_to_arrow(spark):
    """Spark 4 API surface: df.transpose() pivots a small frame about its
    first column; df.toArrow() hands the result to the Arrow ecosystem
    zero-copy (both driver-bounded — for small summaries only)."""
    summary = (
        load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )
    t = summary.transpose()
    # statuses become columns; the two measures become rows
    statuses = [r.o_orderstatus for r in summary.collect()]
    assert t.columns == ["key"] + statuses
    assert {r.key for r in t.collect()} == {"n", "avg_price"}

    at = summary.toArrow()
    assert at.num_rows == summary.count()
    assert at.column_names == summary.columns


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    """spark.read.format("binaryFile") ingests raw media files as
    (path, length, content) rows — the on-ramp from an object store into
    the multimodal mapInPandas pipeline, with a glob pushdown so only
    matching files are listed."""
    import os

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import extract_features

    media_dir = os.path.join(tmp_path, "media")
    os.makedirs(media_dir)
    payloads = {f"img_{i}.bin": bytes([i, 255 - i]) * 8 for i in range(5)}
    for fname, blob in payloads.items():
        with open(os.path.join(media_dir, fname), "wb") as f:
            f.write(blob)
    with open(os.path.join(media_dir, "skip.txt"), "w") as f:
        f.write("not media")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(media_dir)
    )
    assert files.count() == 5  # glob filtered the .txt out at listing time

    media = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1)
        .cast("long")
        .alias("item_id"),
        F.col("content").alias("data"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("length").alias("n_bytes"),
    )
    feats = {r["item_id"]: r for r in extract_features(media).collect()}
    assert set(feats) == set(range(5))
    for i in range(5):
        blob = payloads[f"img_{i}.bin"]
        # fake decoder shape derives from the first two bytes
        assert feats[i]["width"] == 64 + blob[0] % 64
        assert feats[i]["height"] == 64 + blob[1] % 64


def test_json_corrupt_record_handling(spark, tmp_path):
    """Production JSON ingestion: PERMISSIVE mode quarantines bad lines
    into _corrupt_record (pipeline keeps running, rejects auditable);
    DROPMALFORMED silently drops them; FAILFAST aborts — the three
    policies a 100 TB ingest chooses between per contract."""
    import os

    import pytest as _pytest

    src = os.path.join(tmp_path, "events.jsonl")
    with open(src, "w") as f:
        f.write('{"id": 1, "v": 10.5}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"id": 2, "v": -3.25}\n')

    schema = "id BIGINT, v DOUBLE, _corrupt_record STRING"
    permissive = spark.read.schema(schema).json(src)
    rows = permissive.collect()
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1, 2}
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "THIS IS NOT JSON"

    dropped = spark.read.schema("id BIGINT, v DOUBLE").option(
        "mode", "DROPMALFORMED"
    ).json(src)
    assert {r["id"] for r in dropped.collect()} == {1, 2}

    failfast = spark.read.schema("id BIGINT, v DOUBLE").option(
        "mode", "FAILFAST"
    ).json(src)
    with _pytest.raises(Exception):
        failfast.collect()


def test_ansi_mode_fails_loud_and_try_functions_stay_total(spark):
    """Spark 4 runs ANSI mode by default: arithmetic overflow and bad
    casts ABORT the job instead of silently corrupting — and the try_*
    family is the sanctioned per-expression opt-out that returns NULL.
    At 100 TB this is the difference between a poison row failing loudly
    at its source and a wrong aggregate shipped downstream."""
    import pytest as _pytest

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        spark.sql("SELECT 9223372036854775807 + 1 AS x").collect()
    with _pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        spark.sql("SELECT CAST('abc' AS INT) AS x").collect()

    row = spark.sql(
        """
        SELECT try_add(9223372036854775807, 1) AS overflow_null,
               try_divide(1, 0) AS div0_null,
               try_cast('abc' AS INT) AS badcast_null
        """
    ).collect()[0]
    assert row.overflow_null is None
    assert row.div0_null is None
    assert row.badcast_null is None


def test_events_ts_loads_in_data_era(spark):
    """Regression (round-4 verdict): a hard-coded nanos shim once divided
    micros-stored timestamps by 1000, time-traveling every event to
    January 1970.  The loader now detects the unit from the parquet
    footer; this pins that loaded events stay in the data's real era so
    a future testdata regen fails loudly instead of silently."""
    df = load(spark, SF_SMOKE, "events")
    yr = df.select(
        F.min(F.year("ts")).alias("ymin"), F.max(F.year("ts")).alias("ymax")
    ).first()
    assert yr.ymin >= 2020, f"events.ts decoded into the past: min year {yr.ymin}"
    assert yr.ymax <= 2100, f"events.ts decoded into the future: max year {yr.ymax}"


def test_ts_unit_detection_reads_both_nanos_and_micros(spark, tmp_path):
    """The footer-driven unit detection must read a TIMESTAMP(NANOS)
    events file (legacy regen) and a TIMESTAMP(MICROS) one (current
    regen) to the SAME micro-truncated values — batch and streaming."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import (
        _footer_nanos_cols,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.events_stream import (
        read_events_stream,
        run_append_to_table,
    )

    ts = [
        datetime.datetime(2024, 3, 1, 12, 0, 0, 123456),
        datetime.datetime(2024, 3, 2, 13, 30, 0, 654321),
    ]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["a", "b"], pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }
    for unit, sub in (("ns", "nanos"), ("us", "micros")):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table({**cols, "ts": pa.array(ts, pa.timestamp(unit))})
        # column order must match the declared events schema
        tbl = tbl.select(["event_id", "ts", "user_id", "event_type", "value", "props"])
        pq.write_table(tbl, str(d / "events.parquet"), store_schema=False)

    nanos_path = str(tmp_path / "nanos" / "events.parquet")
    micros_path = str(tmp_path / "micros" / "events.parquet")
    assert _footer_nanos_cols(nanos_path, ("ts",)) == ("ts",)
    assert _footer_nanos_cols(micros_path, ("ts",)) == ()

    batch_vals = {}
    for sub in ("nanos", "micros"):
        df = load(spark, str(tmp_path / sub), "events")
        batch_vals[sub] = sorted(r.ts for r in df.select("ts").collect())
    assert batch_vals["nanos"] == batch_vals["micros"] == sorted(ts)

    for i, sub in enumerate(("nanos", "micros")):
        stream = read_events_stream(spark, str(tmp_path / sub)).select(
            "event_id", "ts"
        )
        out = run_append_to_table(stream, f"ts_unit_probe_{i}")
        assert sorted(r.ts for r in out.collect()) == sorted(ts)


def test_http_enrichment_end_to_end_with_stub_server(spark):
    """Reference S3 (airflow.py:92-124) exercised for real: a local
    ``http.server`` stands in for the Yelp endpoint, the ``mapInPandas``
    fetch stage performs actual executor-side HTTP GETs (with one
    retried 500 and one permanent 404), ``flatten_yelp`` parses the
    responses declaratively, and the result joins back to its request
    rows — fetch -> flatten -> join, no skips."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    from data_engineering_sf_mobile_food_facilities_public_spark.sources.http_enrich import (
        enrich_with_yelp,
        fetch_json,
    )

    flaky_hits = {"n": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            term = q.get("term", [""])[0]
            loc = q.get("location", [""])[0]
            if term == "A404":
                self.send_error(404)
                return
            if term == "A500":
                # fail the first attempt, succeed on retry
                flaky_hits["n"] += 1
                if flaky_hits["n"] == 1:
                    self.send_error(500)
                    return
            body = json.dumps(
                {
                    "businesses": [
                        {
                            "id": f"y-{term}",
                            "name": term,
                            "review_count": len(term) * 3,
                            "rating": 4.0,
                            "location": {"display_address": [loc, "San Francisco"]},
                            "display_phone": f"555-{term}",
                            "coordinates": {"latitude": 37.7, "longitude": -122.4},
                        }
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        targets = spark.createDataFrame(
            [
                ("A1", "1 Mission St"),
                ("A1", "9 Market St"),  # same applicant, second address
                ("A2", "2 Howard St"),
                ("A500", "3 Folsom St"),  # 500 once -> retry succeeds
                ("A404", "4 Harrison St"),  # permanent 404 -> row drops
            ],
            "applicant string, address string",
        ).repartition(2)

        enriched = enrich_with_yelp(
            targets, base_url=f"http://127.0.0.1:{port}", retries=2
        )
        # join the enrichment back on BOTH request keys: an applicant at
        # multiple addresses must stay two distinguishable rows, never a
        # cross-match (the location key comes back as request_address so
        # it cannot case-collide with the yelp Address business column)
        joined = targets.join(
            enriched,
            (targets.applicant == enriched.applicant)
            & (targets.address == enriched.request_address),
            "inner",
        ).select(enriched["*"])
        assert joined.count() == 4  # A1 x2 + A2 + A500; no cross-match rows
        rows = {(r.applicant, r.request_address): r for r in joined.collect()}

        assert {a for a, _ in rows} == {"A1", "A2", "A500"}  # A404 dropped
        assert flaky_hits["n"] >= 2  # the 500 really was retried
        a1 = rows[("A1", "1 Mission St")]
        assert a1.Yelp_id == "y-A1"
        assert a1.Name == "A1"
        assert a1.Review == 6
        assert a1.Rating == 4.0
        assert a1.Address == "1 Mission St"  # display_address[0] round-trip
        assert a1.Phone == "555-A1"
        assert a1.Latitude == 37.7 and a1.Longitude == -122.4
        # the second address enriched as its own row, not a copy of the
        # first (the stub echoes the request location back)
        assert rows[("A1", "9 Market St")].Address == "9 Market St"

        # transport-failure path: unroutable port -> status 0, empty body,
        # every input row still present (errors poison rows, not the job)
        dead = fetch_json(
            targets.withColumn(
                "url", F.lit("http://127.0.0.1:1/v3/businesses/search")
            ),
            timeout=0.5,
            retries=0,
        )
        dead_rows = dead.collect()
        assert len(dead_rows) == 5  # one per target row, none dropped
        assert all(r.http_status == 0 and r.raw_json == "" for r in dead_rows)
    finally:
        srv.shutdown()
        srv.server_close()


def test_schema_drift_fails_loudly(spark, tmp_path):
    """A regen that renames/drops a declared column must raise at load
    time, not null-fill silently (Spark's read.schema default)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    d = tmp_path / "drift"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            # 'ts' renamed to 'timestamp' — drift
            "timestamp": pa.array([0], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["a"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    with _pytest.raises(ValueError, match="missing declared column.*ts"):
        load(spark, str(d), "events")


def test_bmp_pixel_codec_and_real_resize(spark):
    """24-bit BMP pixel ops are REAL (no imaging library): encode ->
    decode round-trips bytes exactly, nearest-neighbor resize picks the
    mathematically expected source pixels, and the mapInPandas resize
    path emits valid BMPs of the target dimensions for real inputs."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_bmp_pixels,
        decode_image,
        encode_bmp,
        resize_image,
        resize_rgb_nearest,
        sniff_mime,
    )

    # 4x2 image, distinct pixel values
    rgb = bytes(range(4 * 2 * 3))
    bmp = encode_bmp(4, 2, rgb)
    assert sniff_mime(bmp) == "image/bmp"
    assert decode_image(bmp) == (4, 2)
    w, h, back = decode_bmp_pixels(bmp)
    assert (w, h) == (4, 2)
    assert back == rgb  # exact round-trip through BGR/bottom-up/padding

    # nearest-neighbor: downscale 4x2 -> 2x1 must pick pixels (0,0),(0,2)
    small = resize_rgb_nearest(rgb, 4, 2, 2, 1)
    px = lambda x, y: rgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]
    assert small == px(0, 0) + px(2, 0)

    # full real resize: BMP in -> BMP out at target dims, decodable
    out = resize_image(bmp, 8, 8)  # no deterministic_fake needed for BMP
    assert decode_image(out) == (8, 8)
    ow, oh, orgb = decode_bmp_pixels(out)
    # upscale 4x2 -> 8x8 nearest: corner pixel preserved
    assert orgb[:3] == px(0, 0)

    # non-decodable formats still refuse without the fake flag
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30, 8, 8)

    # distributed path over real BMPs
    from pyspark.sql import Row

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        resize_images,
    )

    media = spark.createDataFrame(
        [Row(item_id=1, data=bmp), Row(item_id=2, data=encode_bmp(2, 2, bytes(12)))]
    )
    resized = {r.item_id: r for r in resize_images(media, 6, 6).collect()}
    for item_id in (1, 2):
        r = resized[item_id]
        assert (r.width, r.height) == (6, 6)
        assert decode_image(bytes(r.data)) == (6, 6)


def test_ppm_codec_real_roundtrip():
    """P6 PPM joins BMP as a fully real codec: encode -> sniff -> header
    dims -> pixel round-trip -> real resize, comments and whitespace in
    the header handled per spec."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
        decode_ppm_pixels,
        encode_ppm,
        resize_image,
        sniff_mime,
    )

    rgb = bytes(range(3 * 2 * 3))
    ppm = encode_ppm(3, 2, rgb)
    assert sniff_mime(ppm) == "image/x-portable-pixmap"
    assert decode_image(ppm) == (3, 2)
    assert decode_ppm_pixels(ppm) == (3, 2, rgb)

    # comment + extra whitespace in header per Netpbm spec
    commented = b"P6\n# a comment\n 3  2 \n255\n" + rgb
    assert decode_ppm_pixels(commented) == (3, 2, rgb)

    out = resize_image(ppm, 6, 4)
    assert sniff_mime(out) == "image/x-portable-pixmap"
    assert decode_image(out) == (6, 4)
    w, h, orgb = decode_ppm_pixels(out)
    assert orgb[:3] == rgb[:3]  # corner preserved by nearest-neighbor

    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm_pixels(b"P6\n3 2\n255\n" + rgb[:-1])


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, row: bytes, prev: bytes, ch: int) -> bytes:
    """Forward-apply a PNG scanline filter (the encoder side of the
    public spec) so the decoder's unfiltering can be exercised on every
    filter type, not just the filter-0 stream our own encoder emits."""
    out = bytearray([ftype])
    for k in range(len(row)):
        a = row[k - ch] if k >= ch else 0
        b = prev[k]
        c = prev[k - ch] if k >= ch else 0
        if ftype == 0:
            v = row[k]
        elif ftype == 1:
            v = (row[k] - a) & 0xFF
        elif ftype == 2:
            v = (row[k] - b) & 0xFF
        elif ftype == 3:
            v = (row[k] - ((a + b) >> 1)) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = (row[k] - pred) & 0xFF
        out.append(v)
    return bytes(out)


def _make_png(w: int, h: int, pixels: bytes, ctype: int, filters: list[int]) -> bytes:
    import struct
    import zlib

    ch = 3 if ctype == 2 else 4
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = pixels[y * stride : (y + 1) * stride]
        raw += _png_filter_row(filters[y % len(filters)], row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_pixel_decode_roundtrip_with_own_encoder():
    """decode(png_encode(x)) == x: the repo's stdlib PNG writer
    (sources/charts.py) and the multimodal decoder must be exact
    inverses for 8-bit RGB."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.charts import png_encode

    w, h = 5, 4
    rgb = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    rows = [rgb[3 * w * y : 3 * w * (y + 1)] for y in range(h)]
    png = png_encode(w, h, rows)
    assert decode_png_pixels(png) == (w, h, rgb)


def test_png_unfilter_all_five_filter_types():
    """Each scanline filter (None/Sub/Up/Average/Paeth) must invert
    exactly; the fixture cycles all five across rows, RGB and RGBA."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )

    w, h = 6, 10
    rgb = bytes((i * 31 + 11) % 256 for i in range(w * h * 3))
    png = _make_png(w, h, rgb, ctype=2, filters=[0, 1, 2, 3, 4])
    assert decode_png_pixels(png) == (w, h, rgb)

    # RGBA: filters run over the 4-byte stride; alpha dropped afterwards
    rgba = bytes((i * 13 + 5) % 256 for i in range(w * h * 4))
    png4 = _make_png(w, h, rgba, ctype=6, filters=[4, 3, 2, 1, 0])
    expect = bytearray()
    for px in range(w * h):
        expect += rgba[4 * px : 4 * px + 3]
    assert decode_png_pixels(png4) == (w, h, bytes(expect))


def test_png_real_resize_and_unsupported_variants():
    """PNG joins BMP/PPM as a fully real pixel codec: real nearest-
    neighbor resize re-encoded as PNG; every spec-legal depth/color-type
    decodes (8/16-bit all types, 1/2/4-bit gray+palette) while
    spec-INVALID combinations refuse loudly instead of decoding wrong."""
    import struct
    import zlib

    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
        decode_png_pixels,
        resize_image,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.charts import png_encode

    w, h = 4, 2
    rgb = bytes(range(w * h * 3))
    png = png_encode(w, h, [rgb[3 * w * y : 3 * w * (y + 1)] for y in range(h)])
    out = resize_image(png, 8, 6)  # no deterministic_fake: PNG is real now
    assert sniff_mime(out) == "image/png"
    assert decode_image(out) == (8, 6)
    ow, oh, orgb = decode_png_pixels(out)
    assert (ow, oh) == (8, 6)
    assert orgb[:3] == rgb[:3]  # corner preserved by nearest-neighbor

    # palette image WITH a PLTE resolves through the color table
    plte = bytes([255, 0, 0, 0, 255, 0])  # red, green
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x01\x00\x01\x00"))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(pal) == (
        2,
        2,
        bytes([255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 0]),
    )
    # ...but a palette image with no PLTE chunk refuses
    no_plte = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png_pixels(no_plte)
    # grayscale and gray+alpha replicate into RGB
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x07\xf0"))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(gray) == (2, 1, bytes([7, 7, 7, 240, 240, 240]))
    ga = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 4, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x42\xff"))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(ga) == (1, 1, bytes([0x42, 0x42, 0x42]))
    # 16-bit now decodes for real (high byte of each BE sample)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(26)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(deep) == (2, 2, bytes(12))
    # sub-8-bit depths decode for real now (4-bit gray, x17 rescale):
    # rows are packed two samples per byte, 0x0F -> (0, 255) after rescale
    shallow = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x0f\x00\xf0"))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(shallow) == (
        2,
        2,
        bytes([0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0]),
    )
    # ...but a sub-byte TRUECOLOR depth is outside the spec and refuses
    bad_combo = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(8)))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="depth=4"):
        decode_png_pixels(bad_combo)
    # 16-bit palette is invalid per spec and refuses
    pal16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(10)))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="16-bit palette"):
        decode_png_pixels(pal16)
    with _pytest.raises(ValueError, match="truncated|bad IDAT"):
        decode_png_pixels(
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
            + _png_chunk(b"IEND", b"")
        )


def test_gif_codec_real_roundtrip_and_resize():
    """GIF joins BMP/PPM/PNG as a fully real pixel codec: the LZW
    decoder inverts the no-compression encoder exactly, palette lookup
    yields the expected RGB, index-space nearest-neighbor resize reuses
    the source palette, and malformed variants refuse loudly."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_gif_pixels,
        decode_image,
        encode_gif,
        resize_image,
        sniff_mime,
    )

    palette = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0]
    )  # R G B Y
    w, h = 5, 4
    indices = [(x + y) % 4 for y in range(h) for x in range(w)]
    gif = encode_gif(w, h, indices, palette)
    assert sniff_mime(gif) == "image/gif"
    assert decode_image(gif) == (w, h)
    dw, dh, rgb = decode_gif_pixels(gif)
    assert (dw, dh) == (w, h)
    expect = b"".join(
        palette[3 * i : 3 * i + 3] for i in indices
    )
    assert rgb == expect

    out = resize_image(gif, 10, 8)  # real path, no deterministic_fake
    assert sniff_mime(out) == "image/gif"
    assert decode_image(out) == (10, 8)
    ow, oh, orgb = decode_gif_pixels(out)
    assert orgb[:3] == expect[:3]  # corner preserved by nearest-neighbor

    with _pytest.raises(ValueError, match="truncated|no image frame"):
        decode_gif_pixels(gif[: len(gif) // 2])
    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif_pixels(b"BMnot-a-gif" + bytes(60))


def test_gif_interlaced_frame_straightens():
    """An interlaced GIF stores rows in 4-pass order; the decoder must
    reorder them back to top-down.  The fixture is built by permuting a
    known image's rows into pass order and setting the interlace bit."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_gif_pixels,
        encode_gif,
    )

    palette = bytes((i * 16) % 256 for i in range(16 * 3))
    w, h = 3, 10
    indices = [(y * w + x) % 16 for y in range(h) for x in range(w)]
    plain = encode_gif(w, h, indices, palette)
    _, _, want = decode_gif_pixels(plain)

    # rebuild with rows permuted into interlace pass order + flag set
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    permuted = []
    for y in order:
        permuted.extend(indices[y * w : (y + 1) * w])
    inter = bytearray(encode_gif(w, h, permuted, palette))
    # image descriptor starts after 6+7 header + 3*16 GCT; packed byte at +9
    desc = 6 + 7 + 3 * 16
    assert inter[desc] == 0x2C
    inter[desc + 9] |= 0x40  # interlace flag
    _, _, got = decode_gif_pixels(bytes(inter))
    assert got == want


def _png_forward_filter(ftype: int, raw_row: bytes, prev_row: bytes, bpp: int) -> bytes:
    """Test-side forward filter (the inverse of the decoder's unfilter)."""
    out = bytearray([ftype])
    for k, x in enumerate(raw_row):
        a = raw_row[k - bpp] if k >= bpp else 0
        b = prev_row[k]
        c = prev_row[k - bpp] if k >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((x - pred) & 0xFF)
    return bytes(out)


def test_png_16bit_all_color_types_and_filters():
    """16-bit PNG pixel decode is real: every non-palette color type
    (gray, RGB, gray+alpha, RGBA), all five scanline filters operating
    on bytes with the 2-byte-per-sample left offset, and Adam7
    interlace — each reduced to the high byte of the BE sample."""
    import hashlib
    import struct
    import zlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )

    def build(w, h, ctype, ch, samples, filters, interlace=0, scanlines=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, interlace)
        if scanlines is None:
            bpp = ch * 2
            rows = []
            prev = bytes(w * bpp)
            for y in range(h):
                raw = b"".join(
                    struct.pack(">H", samples[(y * w + x) * ch + c])
                    for x in range(w)
                    for c in range(ch)
                )
                rows.append(_png_forward_filter(filters[y % len(filters)], raw, prev, bpp))
                prev = raw
            payload = b"".join(rows)
        else:
            payload = scanlines
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(payload))
            + _png_chunk(b"IEND", b"")
        )

    # deterministic 16-bit samples from an md5 chain
    state, samples = b"png16", []
    while len(samples) < 6 * 7 * 4:
        state = hashlib.md5(state).digest()
        samples.extend(
            int.from_bytes(state[i : i + 2], "big") for i in range(0, 16, 2)
        )

    w, h = 6, 7
    for ctype, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        vals = samples[: w * h * ch]
        png = build(w, h, ctype, ch, vals, filters=[0, 1, 2, 3, 4])
        dw, dh, rgb = decode_png_pixels(png)
        assert (dw, dh) == (w, h)
        hi = [v >> 8 for v in vals]  # expected 8-bit samples
        exp = bytearray()
        for px in range(w * h):
            if ctype == 0:
                exp += bytes([hi[px]] * 3)
            elif ctype == 2:
                exp += bytes(hi[3 * px : 3 * px + 3])
            elif ctype == 4:
                exp += bytes([hi[2 * px]] * 3)
            else:
                exp += bytes(hi[4 * px : 4 * px + 3])
        assert rgb == bytes(exp), f"ctype {ctype}"

    # Adam7 16-bit grayscale: interlaced must equal the sequential decode
    w = h = 9
    vals = samples[: w * h]
    seq = build(w, h, 0, 1, vals, filters=[0])
    _, _, want = decode_png_pixels(seq)
    passes = []
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes(pw * 2)
        for sy in range(ph):
            raw = b"".join(
                struct.pack(">H", vals[(y0 + sy * dy) * w + (x0 + sx * dx)])
                for sx in range(pw)
            )
            passes.append(_png_forward_filter(sy % 5, raw, prev, 2))
            prev = raw
    inter = build(w, h, 0, 1, [], filters=[], interlace=1, scanlines=b"".join(passes))
    assert decode_png_pixels(inter) == (w, h, want)


def _pack_subbyte_row(samples: list[int], depth: int) -> bytes:
    """MSB-first sub-byte packing of one scanline, zero-padded to a byte
    boundary — the encoder side of the spec's packed layouts."""
    row = bytearray((len(samples) * depth + 7) // 8)
    per = 8 // depth
    for x, v in enumerate(samples):
        row[x // per] |= v << (8 - depth * (x % per + 1))
    return bytes(row)


def test_png_sub_byte_depths_gray_palette_filters_adam7():
    """1/2/4-bit PNG decode is real: packed-sample scanlines with
    non-byte-aligned widths (trailing padding bits), all five filters
    operating on the packed BYTES with a 1-byte left offset, grayscale
    rescale by bit replication (x255/x85/x17), palette lookup on raw
    indices, and Adam7 (each reduced image has its own padding)."""
    import hashlib
    import struct
    import zlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )

    def build(w, h, depth, ctype, samples, filters, plte=b"", interlace=0, scanlines=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        if scanlines is None:
            rows, prev = [], bytes((w * depth + 7) // 8)
            for y in range(h):
                raw = _pack_subbyte_row(samples[y * w : (y + 1) * w], depth)
                rows.append(_png_forward_filter(filters[y % len(filters)], raw, prev, 1))
                prev = raw
            payload = b"".join(rows)
        else:
            payload = scanlines
        out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        if plte:
            out += _png_chunk(b"PLTE", plte)
        return out + _png_chunk(b"IDAT", zlib.compress(payload)) + _png_chunk(b"IEND", b"")

    # deterministic sample stream from an md5 chain
    state, stream = b"pngsub", []
    while len(stream) < 11 * 9:
        state = hashlib.md5(state).digest()
        stream.extend(state)

    # grayscale at every sub-byte depth, widths that leave padding bits
    for depth, w, h in ((1, 11, 7), (2, 9, 6), (4, 5, 9)):
        scale = 255 // ((1 << depth) - 1)
        vals = [v % (1 << depth) for v in stream[: w * h]]
        png = build(w, h, depth, 0, vals, filters=[0, 1, 2, 3, 4])
        exp = b"".join(bytes([v * scale] * 3) for v in vals)
        assert decode_png_pixels(png) == (w, h, exp), f"gray depth {depth}"

    # 4-bit palette: indices resolve through PLTE (no rescale)
    plte = b"".join(bytes([i * 16, 255 - i * 16, i * 7]) for i in range(16))
    w, h = 7, 5
    idx = [v % 16 for v in stream[: w * h]]
    png = build(w, h, 4, 3, idx, filters=[4, 3, 2, 1, 0], plte=plte)
    exp = b"".join(plte[3 * i : 3 * i + 3] for i in idx)
    assert decode_png_pixels(png) == (w, h, exp)

    # 2-bit palette out-of-range index refuses (PLTE of 3 entries, idx 3)
    import pytest as _pytest

    short_plte = bytes(9)
    bad = build(2, 1, 2, 3, [3, 0], filters=[0], plte=short_plte)
    with _pytest.raises(ValueError, match="palette index"):
        decode_png_pixels(bad)

    # Adam7 1-bit gray must equal the sequential decode
    w = h = 10
    vals = [v & 1 for v in stream[: w * h]]
    _, _, want = decode_png_pixels(build(w, h, 1, 0, vals, filters=[0]))
    passes = []
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes((pw + 7) // 8)
        for sy in range(ph):
            raw = _pack_subbyte_row(
                [vals[(y0 + sy * dy) * w + (x0 + sx * dx)] for sx in range(pw)], 1
            )
            passes.append(_png_forward_filter(sy % 5, raw, prev, 1))
            prev = raw
    inter = build(w, h, 1, 0, [], filters=[], interlace=1, scanlines=b"".join(passes))
    assert decode_png_pixels(inter) == (w, h, want)


def test_jpeg_progressive_roundtrip_matches_baseline():
    """The progressive encoder emits the same quantized coefficients as
    the baseline encoder, so the multi-scan decode (spectral selection +
    successive approximation, DC and AC refinement) must reproduce the
    baseline decode BIT-IDENTICALLY — on a noise image (dense spectra:
    ZRL-in-refinement, history-coefficient correction bits) and on
    gradients (sparse spectra: EOB paths), at several qualities."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        resize_image,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(20260814)
    cases = []
    noise = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    cases.append((17, 24, noise))
    y, x = np.mgrid[0:16, 0:16]
    grad = np.stack([x * 16, y * 16, (x + y) * 8], axis=-1).astype(np.uint8)
    cases.append((16, 16, grad))
    solid = np.full((8, 8, 3), 77, dtype=np.uint8)
    cases.append((8, 8, solid))

    for w, h, arr in cases:
        for q in (30, 75, 95):
            base = encode_jpeg(w, h, arr.tobytes(), quality=q)
            prog = encode_jpeg_progressive(w, h, arr.tobytes(), quality=q)
            assert sniff_mime(prog) == "image/jpeg"
            assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
            assert prog.count(b"\xff\xda") == 10  # the 10-scan script
            assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base), (w, h, q)

    # resize_image handles progressive streams through the real path now
    out = resize_image(prog, 12, 12)
    assert sniff_mime(out) == "image/jpeg"
    assert decode_jpeg_pixels(out)[:2] == (12, 12)


def test_jpeg_progressive_eobn_run_decode():
    """EOBn codes with n>0 (end-of-band RUNS spanning blocks) decode
    correctly: a hand-built single-component progressive stream whose AC
    first scan covers two 8x8 blocks with one EOB2 code (custom DHT —
    the Annex-K tables lack EOBn symbols).  Block 1 gets one AC coef
    then EOB2 ends both blocks' bands."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        decode_jpeg_pixels,
        _marker,
    )

    def dht(cls, tid, bits, vals):
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:]) + bytes(vals))

    # canonical 2-bit codes: symbols get codes 00,01,10 at length 2
    dc_bits = [0, 0, 3] + [0] * 14  # sizes 0,1,2
    dc_vals = [0, 1, 2]
    ac_bits = [0, 0, 3] + [0] * 14  # EOB0 (0x00), EOB1 (0x10), size-1 (0x01)
    ac_vals = [0x00, 0x10, 0x01]
    # flat quant table of 16s: DC=2 -> 32 (pixel offset +4), AC=1 -> 16
    # (visible ±2-3 swing) — big enough to survive uint8 rounding
    dqt = _marker(0xDB, bytes([0]) + bytes([16] * 64))
    sof = _marker(
        0xC2, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    )

    class BW:
        def __init__(self):
            self.out, self.acc, self.n = bytearray(), 0, 0

        def w(self, code, ln):
            self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
            self.n += ln
            while self.n >= 8:
                b = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def flush(self):
            if self.n:
                self.w((1 << (8 - self.n)) - 1, 8 - self.n)

    # scan 1: DC first (Ss=0 Se=0 Ah=0 Al=0), two blocks, both DC=+2
    s1 = BW()
    s1.w(0b10, 2)  # DC size 2
    s1.w(0b10, 2)  # amplitude bits for +2
    s1.w(0b00, 2)  # size 0 (diff 0) for block 2
    s1.flush()
    sos1 = _marker(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes(s1.out)
    # scan 2: AC first (Ss=1 Se=63 Ah=0 Al=0): block 1 codes coef k=1
    # value +1 (run 0, size 1) then EOB1 = run of 2 blocks -> ends block
    # 1's band AND all of block 2's
    s2 = BW()
    s2.w(0b10, 2)  # symbol 0x01: run 0, size 1
    s2.w(1, 1)  # amplitude +1
    s2.w(0b01, 2)  # symbol 0x10: EOB1, 1 extra bit
    s2.w(1, 1)  # extra bit -> eobrun = 2^1 - 1 + 1 = 2
    s2.flush()
    sos2 = _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes(s2.out)

    jpg = (
        b"\xff\xd8"
        + dqt
        + sof
        + dht(0, 0, dc_bits, dc_vals)
        + dht(1, 0, ac_bits, ac_vals)
        + sos1
        + sos2
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg_pixels(jpg)
    assert (w, h) == (16, 8)
    img = np.frombuffer(rgb, np.uint8).reshape(8, 16, 3)
    # grayscale: all three channels equal
    assert (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all()
    left, right = img[:, :8, 0].astype(float), img[:, 8:, 0].astype(float)
    # both blocks carry DC=2*16=32 (pixel offset +4 -> mean 132);
    # block 1 additionally has AC(0,1)=16 -> horizontal variation
    assert abs(right.mean() - 132.0) < 0.51
    assert np.ptp(right) == 0  # block 2: flat (EOB run zeroed its band)
    assert abs(left.mean() - 132.0) < 0.6
    assert np.ptp(left) > 0  # block 1: the AC coefficient shows up
    assert left[0, 0] > left[0, 7]  # cosine k=1 falls across x


def test_gif_lzw_deferred_clear_table_cap():
    """A spec-valid LZW stream may never re-emit CLEAR ("deferred
    clear"): the encoder stops assigning codes at the 12-bit / 4096-entry
    cap and keeps emitting existing codes.  The decoder must (a) decode
    such a stream exactly and (b) stop growing its own table at 4096 so
    adversarial streams can't balloon memory."""
    import hashlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _gif_lzw_decode,
    )

    mcs = 8
    clear = 1 << mcs

    # deterministic pseudo-random bytes: md5 chain (no random module seed
    # drift across Python versions)
    chunks, state = [], b"lzw-cap-fixture"
    for _ in range(2000):  # 32 KB — far past 4096 table entries
        state = hashlib.md5(state).digest()
        chunks.append(state)
    data = b"".join(chunks)

    # test-local GIF-LZW compressor with DEFERRED clear: one CLEAR up
    # front, then never again; stops adding entries at 4096 (mirrors the
    # decoder's widening rule: bump width when next_code hits 2^size)
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    code_size = mcs + 1
    out, acc, nacc = bytearray(), 0, 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # the decoder's table lags one code behind the encoder's
            # (it appends while reading the NEXT code), so widen one
            # assignment later than the table-size boundary
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(clear + 1)  # END
    if nacc:
        out.append(acc & 0xFF)
    assert next_code == 4096  # the fixture genuinely saturated the table

    decoded = _gif_lzw_decode(mcs, bytes(out), len(data))
    assert decoded == list(data)


def test_jpeg_codec_roundtrip_and_resize():
    """Baseline JPEG is a real codec: encode -> decode bounds the
    per-pixel error by the quantization the quality level implies
    (solid blocks exact, gradients tight), dims agree with the header
    walker, resize_image round-trips through the real DCT path, and
    MALFORMED progressive streams (baseline 0..63 scan under an SOF2
    header) refuse loudly rather than misdecoding."""
    import numpy as np
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
        resize_image,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    w, h = 21, 13  # deliberately not 8-multiples: edge-replication pad
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [x * 255 // (w - 1), y * 255 // (h - 1), (x + y) * 127 // (w + h - 2)],
        axis=-1,
    ).astype(np.uint8)
    jpg = encode_jpeg(w, h, arr.tobytes(), quality=95)
    assert sniff_mime(jpg) == "image/jpeg"
    assert decode_image(jpg) == (w, h)  # header walker agrees
    dw, dh, out = decode_jpeg_pixels(jpg)
    assert (dw, dh) == (w, h)
    err = np.abs(
        arr.astype(int) - np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
    )
    assert err.max() <= 8, err.max()

    solid = np.full((8, 8, 3), 130, dtype=np.uint8)
    sj = encode_jpeg(8, 8, solid.tobytes(), quality=75)
    assert decode_jpeg_pixels(sj)[2] == solid.tobytes()  # flat blocks exact

    out = resize_image(jpg, 16, 16)  # real path: decode -> NN -> re-encode
    assert sniff_mime(out) == "image/jpeg"
    assert decode_image(out) == (16, 16)

    prog = bytearray(jpg)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # SOF2 header over a baseline scan = malformed
    with _pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg_pixels(bytes(prog))
    # resize falls back to the honest stub rather than decoding wrong
    with _pytest.raises(NotImplementedError):
        resize_image(bytes(prog), 8, 8)


def _build_dc_only_jpeg(
    dcs_per_mcu: list[list[list[int]]],
    comps_hv: list[tuple[int, int]],
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Hand-assemble a baseline JPEG whose blocks are DC-only: each MCU
    entry lists, per component, the quantized DC value of each of its
    h*v blocks (in vy,vx order).  Lets tests exercise 4:2:0/4:2:2
    layouts and restart markers that the 4:4:4 encoder never emits."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        AC_CHROM_BITS, AC_CHROM_VALS, AC_LUM_BITS, AC_LUM_VALS,
        DC_CHROM_BITS, DC_CHROM_VALS, DC_LUM_BITS, DC_LUM_VALS,
        QT_CHROM, QT_LUM, ZIGZAG, _BitWriter, _canonical_codes, _magnitude,
        _marker, _scaled_qt,
    )

    qt_l, qt_c = _scaled_qt(QT_LUM, quality), _scaled_qt(QT_CHROM, quality)
    dc_codes = [
        _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
        _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    ac_codes = [
        _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
        _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    ]

    ncomp = len(comps_hv)
    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += _marker(0xDB, bytes([tid]) + bytes(int(v) for v in qt.flatten()[ZIGZAG]))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp])
    for c, (hs, vs) in enumerate(comps_hv):
        sof += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    out += _marker(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:]) + bytes(vals))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += _marker(0xDA, sos + bytes([0, 63, 0]))

    w = _BitWriter()
    dc_prev = [0] * ncomp
    for m, mcu in enumerate(dcs_per_mcu):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            out += bytes(w.out)
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            dc_prev = [0] * ncomp
        for c in range(ncomp):
            tbl = 0 if c == 0 else 1
            for dc in mcu[c]:
                diff = dc - dc_prev[c]
                dc_prev[c] = dc
                size, amp = _magnitude(diff)
                code, ln = dc_codes[tbl][size]
                w.write(code, ln)
                if size:
                    w.write(amp, size)
                code, ln = ac_codes[tbl][0x00]  # EOB: DC-only block
                w.write(code, ln)
    w.flush()
    out += bytes(w.out) + b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_420_subsampling_and_restart_markers():
    """Decoder-side coverage the 4:4:4 encoder cannot produce: a 4:2:0
    stream (4 Y blocks + 1 Cb + 1 Cr per MCU) whose Y quadrants differ,
    and a restart-marker stream with per-interval DC prediction reset."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        QT_LUM, _scaled_qt, decode_jpeg_pixels,
    )

    qt0 = int(_scaled_qt(QT_LUM, 90)[0])
    dc_a, dc_b = 6, -6  # two distinct quantized DC values
    # one 16x16 MCU: Y quadrants [a, b / b, a], flat chroma (128)
    jpg = _build_dc_only_jpeg(
        [[[dc_a, dc_b, dc_b, dc_a], [0], [0]]],
        comps_hv=[(2, 2), (1, 1), (1, 1)],
        width=16,
        height=16,
    )
    w, h, rgb = decode_jpeg_pixels(jpg)
    assert (w, h) == (16, 16)
    img = np.frombuffer(rgb, np.uint8).reshape(16, 16, 3).astype(int)
    # flat chroma = greyscale; Y = 128 + dc*qt0/8 per quadrant
    ya = round(128 + dc_a * qt0 / 8)
    yb = round(128 + dc_b * qt0 / 8)
    assert abs(int(img[0, 0, 0]) - ya) <= 1 and abs(int(img[0, 15, 0]) - yb) <= 1
    assert abs(int(img[15, 0, 0]) - yb) <= 1 and abs(int(img[15, 15, 0]) - ya) <= 1
    # greyscale: channels equal up to YCbCr rounding
    assert np.abs(img[..., 0] - img[..., 1]).max() <= 1

    # restart markers: 2 MCUs (16x8, 4:4:4), interval 1, distinct DCs —
    # the second MCU's DC must decode from a RESET predictor
    jpg2 = _build_dc_only_jpeg(
        [[[dc_a], [0], [0]], [[dc_b], [0], [0]]],
        comps_hv=[(1, 1), (1, 1), (1, 1)],
        width=16,
        height=8,
        restart_interval=1,
    )
    w2, h2, rgb2 = decode_jpeg_pixels(jpg2)
    assert (w2, h2) == (16, 8)
    img2 = np.frombuffer(rgb2, np.uint8).reshape(8, 16, 3).astype(int)
    assert abs(int(img2[0, 0, 0]) - ya) <= 1
    assert abs(int(img2[0, 15, 0]) - yb) <= 1


def test_wav_pcm_sample_codec():
    """WAV PCM samples decode for real (raw LE integers in the data
    chunk): 16-bit signed and 8-bit unsigned round-trip exactly, and
    compressed format tags refuse."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_wav_meta,
        decode_wav_samples,
        encode_wav,
        sniff_mime,
    )

    s16 = [0, 1, -1, 32767, -32768, 12345, -12345]
    wav = encode_wav(s16, channels=1, rate=44100, bits=16)
    assert sniff_mime(wav) == "audio/wav"
    assert decode_wav_meta(wav) == (1, 44100, 16)
    assert decode_wav_samples(wav) == (1, 44100, 16, s16)

    s8 = [0, 1, 127, 128, 255]
    wav8 = encode_wav(s8, channels=2, rate=8000, bits=8)
    assert decode_wav_samples(wav8) == (2, 8000, 8, s8)

    # compressed (format tag != 1) must refuse, not misdecode
    mulaw = bytearray(wav)
    mulaw[20:22] = (7).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="only PCM"):
        decode_wav_samples(bytes(mulaw))
    # truncated data chunk
    with _pytest.raises(ValueError, match="truncated|no data chunk"):
        decode_wav_samples(wav[:-3])

    # a legal pre-fmt chunk (LIST/bext may precede fmt) must not break
    # the format-tag read: the tag comes from the LOCATED fmt chunk, not
    # a hard-coded offset 20
    list_chunk = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    shifted = bytearray(wav)
    shifted[12:12] = list_chunk
    new_riff_size = int.from_bytes(shifted[4:8], "little") + len(list_chunk)
    shifted[4:8] = new_riff_size.to_bytes(4, "little")
    assert decode_wav_samples(bytes(shifted)) == (1, 44100, 16, s16)
    # and a non-PCM tag in the shifted fmt chunk still refuses
    shifted_mulaw = bytearray(shifted)
    shifted_mulaw[20 + len(list_chunk) : 22 + len(list_chunk)] = (7).to_bytes(
        2, "little"
    )
    with _pytest.raises(ValueError, match="only PCM"):
        decode_wav_samples(bytes(shifted_mulaw))


def test_mjpeg_avi_container_and_frame_sampling(spark):
    """MJPEG AVI is a fully real video path now: the RIFF writer's
    chunks parse back (incl. odd-size word padding), every frame decodes
    as an independent baseline JPEG with the right pixels, and the
    distributed sampler honors every_k."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import Row

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        encode_mjpeg_avi,
        extract_mjpeg_frames,
        sample_video_frames,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    colors = [40, 120, 200, 250]
    frames = [encode_jpeg(16, 8, bytes([c]) * (16 * 8 * 3)) for c in colors]
    avi = encode_mjpeg_avi(frames, 16, 8, fps=5)
    assert sniff_mime(avi) == "video/avi"
    back = extract_mjpeg_frames(avi)
    assert back == frames  # chunk round-trip exact, order preserved
    for c, f in zip(colors, back):
        w, h, rgb = decode_jpeg_pixels(f)
        arr = np.frombuffer(rgb, np.uint8).astype(int)
        assert (w, h) == (16, 8)
        assert np.abs(arr - c).max() <= 2  # solid frames decode ~exact

    media = spark.createDataFrame([Row(item_id=1, data=avi)])
    rows = sample_video_frames(media, every_k=2).collect()
    assert sorted(r.frame_no for r in rows) == [0, 2]  # every 2nd frame
    assert all((r.width, r.height) == (16, 8) for r in rows)

    with _pytest.raises(ValueError, match="no video frames"):
        extract_mjpeg_frames(avi[:40] + b"\x00" * 8)
    with _pytest.raises(ValueError, match="not an AVI"):
        extract_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _make_interlaced_png(w: int, h: int, rgb: bytes, filters: list[int]) -> bytes:
    """Build an Adam7 PNG from top-down RGB: split into the seven
    reduced images on the spec's sample grids, filter each pass
    independently, concatenate, deflate."""
    import struct
    import zlib

    raw = bytearray()
    fi = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes(pw * 3)
        for sy in range(ph):
            row = bytearray()
            for sx in range(pw):
                p = ((y0 + sy * dy) * w + (x0 + sx * dx)) * 3
                row += rgb[p : p + 3]
            raw += _png_filter_row(filters[fi % len(filters)], bytes(row), prev, 3)
            prev = bytes(row)
            fi += 1
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced_decode():
    """Adam7 streams decode: each of the seven reduced images unfilters
    independently and lands back on its sample grid — checked on shapes
    exercising empty passes (tiny), full 8x8 tiling, and non-multiples,
    with mixed filter types inside passes."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )

    for w, h in [(1, 1), (2, 2), (3, 5), (8, 8), (9, 10), (16, 4)]:
        rgb = bytes((i * 29 + 17) % 256 for i in range(w * h * 3))
        png = _make_interlaced_png(w, h, rgb, filters=[0, 1, 2, 3, 4])
        assert decode_png_pixels(png) == (w, h, rgb), (w, h)


def test_tiff_dimensions_long_entries_truncation_and_both_orders():
    """_tiff_dimensions must read SHORT and LONG IFD entries in either
    byte order and fail loud on truncation — the malformed-blob policy
    every decoder in the module follows."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _synth_tiff_blob,
        _tiff_dimensions,
        sniff_mime,
    )

    def build(order: str, typ: int, w: int, h: int) -> bytes:
        bom = b"II" if order == "little" else b"MM"
        head = bom + (42).to_bytes(2, order) + (8).to_bytes(4, order)

        def entry(tag, val):
            if typ == 3:
                v = val.to_bytes(2, order) + bytes(2)
            else:
                v = val.to_bytes(4, order)
            return (
                tag.to_bytes(2, order)
                + typ.to_bytes(2, order)
                + (1).to_bytes(4, order)
                + v
            )

        return head + (2).to_bytes(2, order) + entry(256, w) + entry(257, h) + bytes(4)

    for order in ("little", "big"):
        for typ in (3, 4):  # SHORT and LONG ImageWidth/Length entries
            blob = build(order, typ, 800, 600)
            assert sniff_mime(blob) == "image/tiff"
            assert _tiff_dimensions(blob) == (800, 600), (order, typ)

    # truncated IFD: offset past the end must raise, not mis-read
    with _pytest.raises(ValueError):
        _tiff_dimensions(b"II*\x00\xff\x00\x00\x00")
    with _pytest.raises(ValueError):
        _tiff_dimensions(build("little", 3, 800, 600)[:20])

    # synthesizer round-trip hits both endiannesses across texts
    orders = {_synth_tiff_blob(t)[:2] for t in ("a", "b", "c", "d", "e", "f")}
    assert orders == {b"II", b"MM"}


def test_animated_gif_roundtrip_and_local_palette_scope():
    """encode_animated_gif -> _gif_decode_all_frames must round-trip
    every frame bit-exactly, and a local color table must apply only to
    its own frame (the global table resumes afterwards, per GIF89a)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _gif_decode_all_frames,
        encode_animated_gif,
        encode_gif,
        sniff_mime,
    )

    palette = b"".join(bytes([k * 16] * 3) for k in range(16))
    frames = [[(f * 5 + j) % 16 for j in range(16)] for f in range(3)]
    blob = encode_animated_gif(4, 4, frames, palette)
    assert sniff_mime(blob) == "image/gif"
    decoded = _gif_decode_all_frames(blob)
    assert len(decoded) == 3
    for f, (w, h, idx, pal) in enumerate(decoded):
        assert (w, h) == (4, 4)
        assert idx == frames[f]
        assert pal[: len(palette)] == palette

    # single-frame animated == plain encoder's pixels
    one = _gif_decode_all_frames(encode_animated_gif(4, 4, frames[:1], palette))
    plain = _gif_decode_all_frames(encode_gif(4, 4, frames[0], palette))
    assert one[0][2] == plain[0][2]

    # local-palette scope: splice frame 2 with a local color table and
    # check frames 1 and 3 still resolve through the global table
    import re as _re

    lct = b"".join(bytes([255 - k * 16] * 3) for k in range(16))
    # build manually: header+GCT from the animated blob, then frame
    # bodies with the middle one given a local table (descriptor packed
    # byte 0x84 = LCT present, 16 entries)
    pal_bits = 4
    prefix_len = 13 + 3 * (1 << pal_bits)
    header = blob[:prefix_len]
    bodies = []
    for fr in frames:
        b = encode_gif(4, 4, fr, palette)[prefix_len:-1]
        bodies.append(b)
    mid = bytearray(bodies[1])
    assert mid[0] == 0x2C
    mid[9] = 0x83  # LCT flag + size bits (2 << 3 = 16 entries)
    mid[10:10] = lct  # insert local table after the 10-byte descriptor
    spliced = header + bodies[0] + bytes(mid) + bodies[2] + b"\x3b"
    d2 = _gif_decode_all_frames(spliced)
    assert d2[0][3][: len(palette)] == palette
    assert d2[1][3] == lct
    assert d2[2][3][: len(palette)] == palette


def test_audio_fingerprint_pure_int_properties():
    """The Haitsma-Kalker sub-fingerprint is a pure integer function of
    the decoded samples: a FLAT clip (constant amplitude) has every
    band amplitude constant across frames, so all second-order
    differences are 0 (not > 0) and the fingerprint is exactly 0;
    amplitude scaling preserves every strict sign and therefore the
    fingerprint (the paper's robustness property, exact here because
    the filterbank is fixed-point integer); and the REAL WAV codec
    round-trip feeds the identical samples into the identical algebra
    as the oracle's md5-derived view."""
    import hashlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_wav_samples,
        encode_wav,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.extensions import (
        _AFP_BITS,
        _afp_fingerprint,
    )

    # flat clip -> all-zero fingerprint
    assert _afp_fingerprint([1000] * 32) == 0
    assert _afp_fingerprint([0] * 32) == 0

    # md5-shaped clip: nonzero, bounded to _AFP_BITS bits, and invariant
    # under integer amplitude scaling (signs of strict differences keep)
    h = hashlib.md5(b"fixture clip").digest()
    clip = [(h[i % 16] - 128) * 256 for i in range(32)]
    fp = _afp_fingerprint(clip)
    assert 0 < fp < (1 << _AFP_BITS)
    assert _afp_fingerprint([3 * s for s in clip]) == fp

    # codec round-trip feeds identical samples -> identical fingerprint
    blob = encode_wav(clip, channels=1, rate=8000, bits=16)
    _, _, _, back = decode_wav_samples(blob)
    assert back == clip and _afp_fingerprint(back) == fp
