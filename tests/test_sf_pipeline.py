"""End-to-end pipeline test (SURVEY.md section 5.3): build all SF tables,
assert PK uniqueness and FK integrity per the reference DDL
(/root/reference/airflow.py:330-432) using the engine's own constraint
check operators."""

from __future__ import annotations

from data_engineering_sf_mobile_food_facilities_public_spark.operators import (
    check_fk_orphans,
    check_unique_violations,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans.sf_pipeline import (
    build_all,
)
from tests.conftest import SF_SMOKE

# table -> declared PK (FIXTURES.md A4)
PRIMARY_KEYS = {
    "sf_details": ["permit"],
    "sf_applicant_details": ["objectid"],
    "sf_location": ["schedule_id"],
    "sf_food_type": ["permit"],
    "sf_premitted_biz_details": ["schedule_id"],
    "sf_permit_motification_details": ["schedule_id"],
    "sf_operation_time": ["schedule_id"],
    "sf_permit_application_details": ["objectid"],
    "sf_operating_day": ["schedule_id"],
    "sf_num_permit_per_business": ["applicant"],
    "sf_yelp_info": ["Yelp_id"],
}


def test_primary_keys_unique(spark):
    tables = build_all(spark, SF_SMOKE)
    for name, keys in PRIMARY_KEYS.items():
        violations = check_unique_violations(tables[name], keys).count()
        assert violations == 0, f"{name} PK {keys} violated {violations} times"


def test_foreign_keys_hold(spark):
    tables = build_all(spark, SF_SMOKE)
    # premitted_biz_details.permit -> details.permit (airflow.py:348)
    # is NOT total in the reference either (details dedups permit rows that
    # the schedule side may still reference) — check the ones that must hold:
    fk_pairs = [
        ("sf_location", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
        ("sf_operating_day", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
        ("sf_operation_time", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
    ]
    for child, ck, parent, pk in fk_pairs:
        orphans = check_fk_orphans(tables[child], tables[parent], ck, pk).count()
        assert orphans == 0, f"{child}.{ck} -> {parent}.{pk}: {orphans} orphans"


def test_pipeline_row_counts(spark):
    tables = build_all(spark, SF_SMOKE)
    n_schedule = 6000  # sf0.001 lineitem rows
    assert tables["sf_premitted_biz_details"].count() == n_schedule
    assert tables["sf_operating_day"].count() == n_schedule
    assert tables["sf_location"].count() == n_schedule
    assert tables["sf_permit_ml"].count() == 2 * 1500  # orders x2
    assert tables["sf_details"].count() == 500  # distinct permit buckets


def test_pie_chart_png_sink(spark):
    """S11 presentation sink (airflow.py:676-690): facility-type counts
    -> pie PNG.  The output round-trips through the engine's own PNG
    header decoder (multimodal.decode_image) and a stdlib zlib
    decompress, proving it is a structurally valid PNG of the declared
    dimensions — not just magic bytes."""
    import struct
    import zlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.sf_pipeline import (
        sf_details,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.charts import (
        pie_chart_png,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    counts = (
        sf_details(spark, SF_SMOKE)
        .groupBy("facilitytype")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    png = pie_chart_png(counts, "facilitytype", "n", size=120)
    assert sniff_mime(png) == "image/png"
    assert decode_image(png) == (120, 120)
    # IDAT decompresses to exactly height * (1 filter byte + 3*width)
    idat = b""
    off = 8
    while off < len(png):
        (ln,) = struct.unpack(">I", png[off : off + 4])
        tag = png[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += png[off + 8 : off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 120 * (1 + 3 * 120)
    # deterministic: same input -> identical bytes
    assert pie_chart_png(counts, "facilitytype", "n", size=120) == png

    # the collect guard: unaggregated input fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="aggregate first"):
        pie_chart_png(
            sf_details(spark, SF_SMOKE).select("permit", F.lit(1).alias("n")),
            "permit",
            "n",
        )


def test_run_pipeline_job(spark, tmp_path):
    """Orchestration shell (airflow.py:813-824 -> SURVEY 2.9): one call
    runs transform -> constraint-check -> sink -> present, is idempotent
    on rerun, and fails the whole job when a constraint breaks."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.job import (
        ConstraintViolation,
        run_constraint_checks,
        run_pipeline,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.sf_pipeline import (
        SF_TABLES,
        build_all,
    )
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "warehouse")
    metrics = run_pipeline(spark, SF_SMOKE, out, retries=0)

    assert set(metrics["rows_written"]) == set(SF_TABLES)
    assert all(n > 0 for n in metrics["rows_written"].values())
    assert all(v == 0 for v in metrics["constraints"].values())
    assert metrics["chart_bytes"] > 0
    assert (tmp_path / "warehouse" / "facility_type_pie.png").exists()
    back = spark.read.parquet(f"{out}/sf_details")
    assert back.count() == metrics["rows_written"]["sf_details"]

    # idempotent rerun: same counts, overwrite not append
    metrics2 = run_pipeline(spark, SF_SMOKE, out, retries=0, chart=False)
    assert metrics2["rows_written"] == metrics["rows_written"]

    # a broken PK (details duplicated) must raise, not publish
    tables = build_all(spark, SF_SMOKE)
    tables["sf_details"] = tables["sf_details"].unionAll(tables["sf_details"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="pk_details_permit"):
        violations = run_constraint_checks(tables)
        if any(violations.values()):
            raise ConstraintViolation(f"pk_details_permit: {violations}")


def test_run_pipeline_with_live_enrichment(spark, tmp_path):
    """The full DAG shape including the Extract stage: run_pipeline with
    a yelp endpoint performs real executor-side HTTP fetches against an
    in-process stub and publishes the flattened result as a parquet
    table alongside the transform outputs."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.job import (
        run_pipeline,
    )
    from tests.conftest import SF_SMOKE

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            term = q.get("term", [""])[0]
            loc = q.get("location", [""])[0]
            body = json.dumps(
                {
                    "businesses": [
                        {
                            "id": f"y-{term}-{loc}",
                            "name": term,
                            "review_count": 1,
                            "rating": 5.0,
                            "location": {"display_address": [loc]},
                            "display_phone": "555",
                            "coordinates": {"latitude": 1.0, "longitude": 2.0},
                        }
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        out = str(tmp_path / "wh_enriched")
        metrics = run_pipeline(
            spark,
            SF_SMOKE,
            out,
            retries=0,
            chart=False,
            yelp_base_url=f"http://127.0.0.1:{srv.server_address[1]}",
            yelp_max_targets=25,
        )
        assert metrics["yelp_enriched_rows"] == 25
        assert "extract_enrich" in metrics["stages"]
        back = spark.read.parquet(f"{out}/yelp_enriched")
        assert back.count() == 25
        assert set(back.columns) >= {"applicant", "Yelp_id", "Name", "Rating"}
        assert all(r.Rating == 5.0 for r in back.collect())
    finally:
        srv.shutdown()
        srv.server_close()


def test_pie_chart_negative_slice_clamps_consistently():
    """A negative slice value must clamp to zero in BOTH the total and
    the per-slice fractions — clamping only the fractions would push the
    cumulative bounds past 1 mid-list (non-monotonic) and silently
    distort neighboring slices.  Pixel-identical to the explicit-zero
    rendering, and the all-non-positive case still refuses."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.sources.charts import (
        render_pie_png,
    )

    neg = render_pie_png([("a", 5.0), ("b", -3.0), ("c", 5.0)], size=60)
    zero = render_pie_png([("a", 5.0), ("b", 0.0), ("c", 5.0)], size=60)
    assert neg == zero
    with _pytest.raises(ValueError, match="positive-valued"):
        render_pie_png([("a", -1.0), ("b", 0.0)], size=60)


def test_footer_schema_retries_after_transient_failure(tmp_path):
    """A missing parquet file must NOT be cached as permanently
    unreadable: a table defined before its first file lands (stream,
    retried load) must become visible to the nanos/drift guards once the
    file exists."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import (
        _footer_schema,
    )

    path = str(tmp_path / "late.parquet")
    assert _footer_schema(path) is None  # not there yet
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64())}), path)
    footer = _footer_schema(path)  # same path, file landed in between
    assert footer is not None and footer.names == ["x"]
