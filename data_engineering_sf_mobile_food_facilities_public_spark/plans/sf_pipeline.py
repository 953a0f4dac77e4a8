"""The SF 11-table normalization pipeline (reference Transform stage,
``/root/reference/airflow.py:158-253``), re-expressed as one lazy Spark
lineage over the deterministic stand-in sources in ``sf_sources``.

Each builder corresponds to one output table of the reference (FIXTURES.md
A4) and is registered as an oracle-paired query (``sf_<table>``), so the
whole pipeline — not just individual operators — is hash-checked against
DuckDB.  Where the reference relied on pandas frame order for "keep first"
(A1-A3), these builders name an explicit total-order tiebreak, per
SURVEY.md section 4.3.1.

Pipeline shape at scale: all 11 outputs share the two source scans —
Catalyst sees the whole lineage, so schedule/permit are each read once per
action (or cached once for a full materialization via ``build_all``);
every dedup/window shuffles on its own key, joins broadcast the small
sides (yelp, per-key dedup results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import normalize_date
from ..operators import dedup_first, join_small_dim, replicate_rows, window_count
from .relational import _register
from .sf_sources import SF_SOURCES_CTE, sf_permit, sf_schedule, sf_yelp


@_register(
    "sf_details",
    SF_SOURCES_CTE
    + """
    SELECT permit, applicant, facilitytype FROM permit_src
    QUALIFY ROW_NUMBER() OVER (PARTITION BY permit ORDER BY objectid) = 1
    """,
)
def sf_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """details (airflow.py:172-176): A1 keep-first dedup of permit by its
    duplicate business key; tiebreak = unique objectid."""
    return dedup_first(sf_permit(spark, sf_dir), ["permit"], ["objectid"]).select(
        "permit", "applicant", "facilitytype"
    )


@_register(
    "sf_premitted_biz_details",
    SF_SOURCES_CTE + "SELECT schedule_id, permit FROM schedule",
)
def sf_premitted_biz_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """premitted_biz_details (airflow.py:178-181): projection of the
    schedule with its F4 surrogate key."""
    return sf_schedule(spark, sf_dir).select("schedule_id", "permit")


@_register(
    "sf_applicant_details",
    SF_SOURCES_CTE + "SELECT objectid, permit FROM permit_src",
)
def sf_applicant_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applicant_details (airflow.py:183-186): projection keyed by the
    unique objectid."""
    return sf_permit(spark, sf_dir).select("objectid", "permit")


@_register(
    "sf_location",
    SF_SOURCES_CTE
    + """
    , permit_dedup AS (
        SELECT permit, cnn, address FROM permit_src
        QUALIFY ROW_NUMBER() OVER (PARTITION BY permit, cnn
                                   ORDER BY address, objectid) = 1
    )
    SELECT s.schedule_id, s.location, s.locationdesc, s.locationid,
           s.cnn, s.block, p.address
    FROM schedule s
    FULL OUTER JOIN permit_dedup p
      ON s.permit = p.permit AND s.cnn = p.cnn
    WHERE s.schedule_id IS NOT NULL
    """,
)
def sf_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """location (airflow.py:188-201): J1 full-outer on the composite key
    (permit, cnn), then the reference's sort/dedup/notna (A2+P3).

    The permit side is deduped to one row per (permit, cnn) *before* the
    join (explicit tiebreak), so each schedule row keeps exactly one
    address deterministically — the reference got this from pandas frame
    order.  Catalyst narrows the outer join using the null-rejecting
    post-filter, so no full-outer shuffle survives in the physical plan.
    """
    s = sf_schedule(spark, sf_dir)
    p = dedup_first(
        sf_permit(spark, sf_dir).select("permit", "cnn", "address", "objectid"),
        ["permit", "cnn"],
        ["address", "objectid"],
    ).drop("objectid")
    joined = s.alias("s").join(
        p.alias("p"),
        (F.col("s.permit") == F.col("p.permit")) & (F.col("s.cnn") == F.col("p.cnn")),
        "full_outer",
    )
    return joined.filter(F.col("s.schedule_id").isNotNull()).select(
        F.col("s.schedule_id").alias("schedule_id"),
        F.col("s.location").alias("location"),
        F.col("s.locationdesc").alias("locationdesc"),
        F.col("s.locationid").alias("locationid"),
        F.col("s.cnn").alias("cnn"),
        F.col("s.block").alias("block"),
        F.col("p.address").alias("address"),
    )


@_register(
    "sf_food_type",
    SF_SOURCES_CTE
    + """
    , permit_dedup AS (
        SELECT permit, fooditems FROM permit_src
        QUALIFY ROW_NUMBER() OVER (PARTITION BY permit ORDER BY objectid) = 1
    )
    SELECT s.permit, s.applicant, s.optionaltext, s.coldtruck, p.fooditems
    FROM schedule s JOIN permit_dedup p ON s.permit = p.permit
    QUALIFY ROW_NUMBER() OVER (PARTITION BY s.permit ORDER BY s.schedule_id) = 1
    """,
)
def sf_food_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """food_type (airflow.py:203-210): J2 inner join on permit + A1 dedup,
    both sides made deterministic by explicit tiebreaks."""
    s = sf_schedule(spark, sf_dir).select(
        "schedule_id", "permit", "applicant", "optionaltext", "coldtruck"
    )
    p = dedup_first(
        sf_permit(spark, sf_dir).select("permit", "fooditems", "objectid"),
        ["permit"],
        ["objectid"],
    ).drop("objectid")
    return (
        dedup_first(s.join(p, "permit", "inner"), ["permit"], ["schedule_id"])
        .select("permit", "applicant", "optionaltext", "coldtruck", "fooditems")
    )


@_register(
    "sf_permit_motification_details",
    SF_SOURCES_CTE
    + """
    SELECT schedule_id,
           strftime(CAST(addr_date_create AS TIMESTAMP), '%Y-%m-%d') AS addr_date_create,
           strftime(CAST(addr_date_modified AS TIMESTAMP), '%Y-%m-%d') AS addr_date_modified
    FROM schedule
    """,
)
def sf_permit_motification_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """permit_motification_details (airflow.py:212-219): F1 date
    normalization of the timestamp-ish strings to yyyy-MM-dd."""
    s = sf_schedule(spark, sf_dir)
    return s.select(
        "schedule_id",
        normalize_date("addr_date_create").alias("addr_date_create"),
        normalize_date("addr_date_modified").alias("addr_date_modified"),
    )


@_register(
    "sf_operation_time",
    SF_SOURCES_CTE
    + "SELECT schedule_id, starttime, endtime, start24, end24 FROM schedule",
)
def sf_operation_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operation_time (airflow.py:232-235): narrow projection."""
    return sf_schedule(spark, sf_dir).select(
        "schedule_id", "starttime", "endtime", "start24", "end24"
    )


@_register(
    "sf_permit_application_details",
    SF_SOURCES_CTE
    + """
    SELECT objectid, status, approved, received, priorpermit, expirationdate
    FROM permit_src
    """,
)
def sf_permit_application_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """permit_application_details (airflow.py:222-225)."""
    return sf_permit(spark, sf_dir).select(
        "objectid", "status", "approved", "received", "priorpermit", "expirationdate"
    )


@_register(
    "sf_operating_day",
    SF_SOURCES_CTE + "SELECT schedule_id, dayorder, dayofweekstr FROM schedule",
)
def sf_operating_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operating_day (airflow.py:227-230)."""
    return sf_schedule(spark, sf_dir).select("schedule_id", "dayorder", "dayofweekstr")


@_register(
    "sf_num_permit_per_business",
    SF_SOURCES_CTE
    + """
    SELECT applicant, permit,
           COUNT(*) OVER (PARTITION BY applicant) AS no_permit_owned_per_business
    FROM schedule
    QUALIFY ROW_NUMBER() OVER (PARTITION BY applicant ORDER BY schedule_id) = 1
    """,
)
def sf_num_permit_per_business(spark: SparkSession, sf_dir: str) -> DataFrame:
    """num_permit_per_business (airflow.py:248-253): A6 window-count of
    schedule rows per applicant broadcast to rows, then A3 keep-first per
    applicant.  Both windows share the same partitioning key, so Spark
    plans a single exchange on ``applicant``."""
    s = sf_schedule(spark, sf_dir).select("schedule_id", "applicant", "permit")
    counted = window_count(s, ["applicant"], "no_permit_owned_per_business")
    return dedup_first(counted, ["applicant"], ["schedule_id"]).select(
        "applicant", "permit", "no_permit_owned_per_business"
    )


@_register(
    "sf_yelp_info",
    SF_SOURCES_CTE
    + """
    SELECT DISTINCT y.Yelp_id, y.Name, y.Review, y.Rating,
                    y.Address, y.Phone, y.Latitude, y.Longitude
    FROM yelp y
    JOIN (SELECT DISTINCT applicant FROM schedule) s ON y.Name = s.applicant
    """,
)
def sf_yelp_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """yelp_info (airflow.py:237-246): J3 left join on applicant = Name +
    A4 full-row distinct + P4 dropna.  dropna-after-left-join on non-null
    yelp attributes == keep only matched yelp rows, i.e. a semi-join of
    yelp against the distinct applicants — which is how the engine plans
    it (broadcast semi-join, no null churn)."""
    applicants = sf_schedule(spark, sf_dir).select("applicant").distinct()
    y = sf_yelp(spark, sf_dir)
    return (
        y.join(applicants, y.Name == applicants.applicant, "left_semi").distinct()
    )


@_register(
    "sf_permit_ml",
    SF_SOURCES_CTE
    + """
    SELECT p.objectid, p.permit, p.status, p.priorpermit
    FROM permit_src p CROSS JOIN (VALUES (0), (1)) copies(i)
    """,
)
def sf_permit_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """permit_ml staging (F5, airflow.py:166-170,772-773): every permit row
    replicated x2 for the ML task."""
    return replicate_rows(sf_permit(spark, sf_dir), 2).select(
        "objectid", "permit", "status", "priorpermit"
    )


SF_TABLES = [
    "sf_details",
    "sf_premitted_biz_details",
    "sf_applicant_details",
    "sf_location",
    "sf_food_type",
    "sf_permit_motification_details",
    "sf_operation_time",
    "sf_permit_application_details",
    "sf_operating_day",
    "sf_num_permit_per_business",
    "sf_yelp_info",
    "sf_permit_ml",
]


def build_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All pipeline outputs as one shared lineage (the engine's replacement
    for the reference's S3-CSV handoffs between Airflow tasks)."""
    from .relational import QUERIES

    return {name: QUERIES[name](spark, sf_dir) for name in SF_TABLES}
