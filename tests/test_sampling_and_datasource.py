"""Sampling determinism, grouped-map exactness, custom DataSource."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.grouped_map import (
    zscore_per_group,
)
from data_engineering_sf_mobile_food_facilities_public_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)
from tests.conftest import SF_SMOKE


def test_sample_is_stable_under_repartitioning(spark):
    o = load(spark, SF_SMOKE, "orders")
    a = {r["o_orderkey"] for r in deterministic_sample(o, "o_orderkey", 0.1).collect()}
    b = {
        r["o_orderkey"]
        for r in deterministic_sample(o.repartition(17), "o_orderkey", 0.1).collect()
    }
    assert a == b and 0 < len(a) < o.count()


def test_sample_fraction_one_keeps_everything(spark):
    """fraction >= 1.0 must be the identity — the naive 4-hex threshold
    formats 65536 as the 5-char '10000', which sorts below most buckets
    and silently kept ~6% of rows (round-1 advice)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.sampling import (
        stratified_sample,
    )

    o = load(spark, SF_SMOKE, "orders")
    total = o.count()
    assert deterministic_sample(o, "o_orderkey", 1.0).count() == total
    assert deterministic_sample(o, "o_orderkey", 1.5).count() == total
    strata = [r[0] for r in o.select("o_orderstatus").distinct().collect()]
    s = stratified_sample(
        o, "o_orderkey", {st: 1.0 for st in strata}, "o_orderstatus"
    )
    assert s.count() == total


def test_split_is_disjoint_exhaustive_and_leak_free(spark):
    o = load(spark, SF_SMOKE, "orders")
    s = train_test_split(o, "o_custkey", 0.2)
    total = o.count()
    assert s.count() == total
    # no customer appears on both sides
    leaky = (
        s.select("o_custkey", "split").distinct()
        .groupBy("o_custkey").count().filter(F.col("count") > 1).count()
    )
    assert leaky == 0


def test_grouped_zscore_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 3.0), (3, "h", 5.0)], "id long, k string, v double"
    )
    out = {r["id"]: r["zscore"] for r in zscore_per_group(df, "k", "v").collect()}
    assert out[1] == -1.0 and out[2] == 1.0  # mean 2, std(ddof=0) 1
    assert out[3] == 0.0  # singleton group -> 0


def test_grouped_zscore_rounding_folds_negative_zero(spark):
    """round_digits path: tiny negative z rounds to 0.0 (not -0.0, whose
    repr would hash-mismatch the oracle's 0.0)."""
    import math

    # middle value sits 1e-12 below the group mean -> z ~ -1e-12,
    # which rounds to -0.0 and must be folded to +0.0
    df = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", 1.0 - 1.5e-12), (3, "g", 2.0)],
        "id long, k string, v double",
    )
    out = {
        r["id"]: r["zscore"]
        for r in zscore_per_group(df, "k", "v", round_digits=6).collect()
    }
    z = out[2]
    assert z == 0.0 and math.copysign(1.0, z) == 1.0


def test_api_datasource_scans_in_page_partitions(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.api_source import (
        PagedApiDataSource,
    )

    try:
        spark.dataSource.register(PagedApiDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("paged_api")
        .option("pages", "3")
        .option("page_size", "100")
        .load()
    )
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 3  # one task per API page
    # deterministic: same options -> same content
    df2 = (
        spark.read.format("paged_api")
        .option("pages", "3")
        .option("page_size", "100")
        .load()
    )
    assert df.exceptAll(df2).count() == 0


def test_paged_api_stream_reader(spark):
    """Custom Python streaming data source: page-cursor offsets, one
    partition per page, bounded micro-batches — drains exactly
    max_pages * page_size rows and replays nothing twice."""
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.api_source import (
        PagedApiDataSource,
        page_rows,
    )

    try:
        spark.dataSource.register(PagedApiDataSource)
    except Exception:
        pass  # already registered by the batch test in this session
    stream = (
        spark.readStream.format("paged_api")
        .option("max_pages", 4)
        .option("pages_per_batch", 2)
        .option("page_size", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("paged_api_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("paged_api_stream")
    assert got.count() == 4 * 100
    # exactly-once: no page fetched twice, and rows match the page contract
    assert got.select("record_id").distinct().count() == 400
    want = sorted(r for p in range(4) for r in page_rows(p, 100))
    assert sorted(map(tuple, got.collect())) == want


def test_jsonl_audit_writer_publishes_manifest(spark, tmp_path):
    """Custom Python DataSource WRITER: every task writes its own jsonl
    part and the driver publishes _MANIFEST.json only after all tasks
    commit — readers that trust the manifest see exactly the committed
    rows."""
    import json
    import os

    from data_engineering_sf_mobile_food_facilities_public_spark.sources.api_source import (
        JsonlAuditDataSource,
    )

    spark.dataSource.register(JsonlAuditDataSource)
    out = os.path.join(tmp_path, "audit_sink")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS doubled").repartition(4)
    df.write.format("jsonl_audit").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4  # one part per task

    rows = []
    for entry in manifest["files"]:
        with open(os.path.join(out, entry["file"])) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["doubled"] == 2 * r["id"] for r in rows)

    # a straggler/orphan file outside the manifest is ignored by contract
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write('{"id": 999, "doubled": 0}\n')
    manifest_files = {e["file"] for e in manifest["files"]}
    assert "part-orphan.jsonl" not in manifest_files


def test_jsonl_audit_reader_trusts_manifest(spark, tmp_path):
    """READ side of write-audit-publish: the scan lists only
    manifest-committed files, so orphan parts are invisible; a file
    truncated after publish fails the read loudly."""
    import json
    import os

    from data_engineering_sf_mobile_food_facilities_public_spark.sources.api_source import (
        JsonlAuditDataSource,
    )

    spark.dataSource.register(JsonlAuditDataSource)
    out = os.path.join(tmp_path, "audit_rt")
    df = spark.range(0, 50).selectExpr("id", "id * 3 AS tripled").repartition(3)
    df.write.format("jsonl_audit").option("path", out).mode("append").save()

    # an orphan part NOT in the manifest must be invisible to the scan
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write('{"id": 999, "tripled": 0}\n')

    back = (
        spark.read.format("jsonl_audit")
        .schema("id long, tripled long")
        .option("path", out)
        .load()
    )
    rows = back.collect()
    assert sorted(r.id for r in rows) == list(range(50))
    assert all(r.tripled == 3 * r.id for r in rows)
    assert back.rdd.getNumPartitions() == 3  # one partition per committed file

    # missing schema fails loudly (jsonl is schemaless)
    import pytest as _pytest

    with _pytest.raises(Exception, match="explicit .schema"):
        spark.read.format("jsonl_audit").option("path", out).load().collect()

    # truncation after publish: chop a committed file, read must fail
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        first = json.load(f)["files"][0]["file"]
    with open(os.path.join(out, first), "r+") as f:
        lines = f.readlines()
        f.seek(0)
        f.truncate()
        f.writelines(lines[:-1])
    with _pytest.raises(Exception, match="truncated after publish"):
        (
            spark.read.format("jsonl_audit")
            .schema("id long, tripled long")
            .option("path", out)
            .load()
            .collect()
        )

    # the OTHER corruption mode: rows appended past the committed count
    # must be named as such, not misreported as truncation
    with open(os.path.join(out, first), "a") as f:
        f.write('{"id": 777, "tripled": 0}\n{"id": 778, "tripled": 0}\n')
    with _pytest.raises(Exception, match="appended after publish"):
        (
            spark.read.format("jsonl_audit")
            .schema("id long, tripled long")
            .option("path", out)
            .load()
            .collect()
        )


def test_observation_metrics_ride_the_action(spark):
    """operators/telemetry.observed: stage metrics (rows, nulls, exact
    DECIMAL total) are measured by the SAME tasks that execute the
    action — one pass, no re-scan — and must equal an independent
    aggregation of the same input."""
    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.telemetry import (
        observed,
    )
    from tests.conftest import SF_SMOKE

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    df, obs = observed(
        o.filter(F.col("o_orderstatus") == "F"),
        "orders_f_stage",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.sum(F.col("o_orderpriority").isNull().cast("int")).alias("null_prios"),
    )
    df.write.format("noop").mode("overwrite").save()  # the one action
    got = obs.get
    want = (
        o.filter(F.col("o_orderstatus") == "F")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.sum(F.col("o_orderpriority").isNull().cast("int")).alias("null_prios"),
        )
        .collect()[0]
    )
    assert got["rows"] == want["rows"] > 0
    assert got["total_price"] == want["total_price"]
    assert got["null_prios"] == want["null_prios"]
