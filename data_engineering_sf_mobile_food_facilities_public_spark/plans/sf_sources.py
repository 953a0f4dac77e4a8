"""Deterministic SF-domain stand-in sources.

The reference's raw inputs are the Socrata *schedule* / *permit* datasets
and a small *yelp* enrichment (FIXTURES.md A1-A3).  The driver's test
environment has no SF tables, so the pipeline derives schedule/permit/yelp
-shaped relations from the TPC-H-ish tables with pure deterministic
expressions (role mapping per FIXTURES.md section B: lineitem -> schedule,
orders -> permit, supplier -> yelp).  The same derivation exists as a SQL
CTE block (``SF_SOURCES_CTE``) so every downstream pipeline table is
DuckDB-oracle-checkable.

Shapes preserved from the reference data:
- schedule: many rows per permit and per applicant (window-count A6,
  dedup A3), nullable locationdesc/optionaltext (P3/P4), date-ish strings
  to normalize (F1), composite join key (permit, cnn) (J1);
- permit: duplicate business key ``permit`` (dedup A1), unique objectid;
- yelp: tiny, sparsely matching ``Name`` (left-join nulls, J3/P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import surrogate_key

# Columns that define the schedule surrogate-key order (a verified total
# order on lineitem — (l_orderkey, l_linenumber) alone is NOT unique).
_SCHEDULE_ORDER = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def sf_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schedule-shaped relation from lineitem, with the contiguous
    ``schedule_id`` surrogate key (F4, airflow.py:158-160) already
    attached via the distributed surrogate_key operator."""
    li = load(spark, sf_dir, "lineitem")
    with_id = surrogate_key(li, _SCHEDULE_ORDER, "schedule_id")
    return with_id.select(
        "schedule_id",
        F.concat(F.lit("P"), (F.col("l_orderkey") % 500).cast("string")).alias("permit"),
        F.concat(F.lit("A"), (F.col("l_orderkey") % 50).cast("string")).alias("applicant"),
        F.concat(F.lit("L"), (F.col("l_partkey") % 100).cast("string")).alias("location"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("D"), F.col("l_suppkey").cast("string")))
        .alias("locationdesc"),
        F.col("l_partkey").alias("locationid"),
        (F.col("l_partkey") % 200).alias("cnn"),
        F.concat(F.lit("B"), F.col("l_suppkey").cast("string")).alias("block"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("opt"))
        .otherwise(F.lit(None).cast("string"))
        .alias("optionaltext"),
        F.when(F.col("l_quantity") > 25, F.lit("Y")).otherwise(F.lit("N")).alias("coldtruck"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("addr_date_create"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("addr_date_modified"),
        (F.col("l_linenumber") % 7).alias("dayorder"),
        F.expr("substring('MoTuWeThFrSaSu', (l_linenumber % 7) * 2 + 1, 2)").alias(
            "dayofweekstr"
        ),
        F.concat(((F.col("l_suppkey") % 12) + 1).cast("string"), F.lit("AM")).alias(
            "starttime"
        ),
        F.concat(((F.col("l_suppkey") % 12) + 1).cast("string"), F.lit("PM")).alias(
            "endtime"
        ),
        F.concat(
            F.lpad((F.col("l_suppkey") % 24).cast("string"), 2, "0"), F.lit(":00")
        ).alias("start24"),
        F.concat(
            F.lpad(((F.col("l_suppkey") + 8) % 24).cast("string"), 2, "0"), F.lit(":00")
        ).alias("end24"),
    )


def sf_permit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permit-shaped relation from orders (duplicate ``permit`` business
    key: ~several orders share each P{k} bucket)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("objectid"),
        F.concat(F.lit("P"), (F.col("o_orderkey") % 500).cast("string")).alias("permit"),
        F.concat(F.lit("A"), (F.col("o_custkey") % 50).cast("string")).alias("applicant"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("Truck"))
        .otherwise(F.lit("Push Cart"))
        .alias("facilitytype"),
        (F.col("o_orderkey") % 200).alias("cnn"),
        F.concat(F.lit("ADDR"), (F.col("o_orderkey") % 300).cast("string")).alias(
            "address"
        ),
        F.col("o_orderpriority").alias("fooditems"),
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("approved"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("received"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("expirationdate"),
        (F.col("o_orderkey") % 2).cast("int").alias("priorpermit"),
    )


def sf_yelp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yelp-shaped enrichment from supplier: tiny, with ``Name`` matching
    only a few schedule applicants (the reference matched 2 of ~2000,
    report.pdf p.11)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        F.concat(F.lit("Y"), F.col("s_suppkey").cast("string")).alias("Yelp_id"),
        F.concat(F.lit("A"), (F.col("s_suppkey") % 50).cast("string")).alias("Name"),
        ((F.col("s_suppkey") * 7) % 100).cast("int").alias("Review"),
        ((F.col("s_suppkey") % 5) + 1).cast("double").alias("Rating"),
        F.concat(F.lit("ADDR"), F.col("s_suppkey").cast("string")).alias("Address"),
        F.concat(F.lit("555-"), F.col("s_suppkey").cast("string")).alias("Phone"),
        (F.lit(37.7) + F.col("s_suppkey").cast("double") / 1000.0).alias("Latitude"),
        (F.lit(-122.4) - F.col("s_suppkey").cast("double") / 1000.0).alias("Longitude"),
    )


# The same three derivations as a DuckDB CTE block, prepended to every
# pipeline oracle query.  Expressions mirror the Spark ones 1:1.
SF_SOURCES_CTE = """
WITH schedule AS (
    SELECT
        ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1
            AS schedule_id,
        'P' || CAST(l_orderkey % 500 AS VARCHAR) AS permit,
        'A' || CAST(l_orderkey % 50 AS VARCHAR) AS applicant,
        'L' || CAST(l_partkey % 100 AS VARCHAR) AS location,
        CASE WHEN l_linenumber % 3 = 0 THEN NULL
             ELSE 'D' || CAST(l_suppkey AS VARCHAR) END AS locationdesc,
        l_partkey AS locationid,
        l_partkey % 200 AS cnn,
        'B' || CAST(l_suppkey AS VARCHAR) AS block,
        CASE WHEN l_linenumber % 2 = 0 THEN 'opt' ELSE NULL END AS optionaltext,
        CASE WHEN l_quantity > 25 THEN 'Y' ELSE 'N' END AS coldtruck,
        strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS addr_date_create,
        strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS addr_date_modified,
        l_linenumber % 7 AS dayorder,
        substring('MoTuWeThFrSaSu', (l_linenumber % 7) * 2 + 1, 2) AS dayofweekstr,
        CAST((l_suppkey % 12) + 1 AS VARCHAR) || 'AM' AS starttime,
        CAST((l_suppkey % 12) + 1 AS VARCHAR) || 'PM' AS endtime,
        lpad(CAST(l_suppkey % 24 AS VARCHAR), 2, '0') || ':00' AS start24,
        lpad(CAST((l_suppkey + 8) % 24 AS VARCHAR), 2, '0') || ':00' AS end24
    FROM lineitem
),
permit_src AS (
    SELECT
        o_orderkey AS objectid,
        'P' || CAST(o_orderkey % 500 AS VARCHAR) AS permit,
        'A' || CAST(o_custkey % 50 AS VARCHAR) AS applicant,
        CASE WHEN o_orderkey % 2 = 0 THEN 'Truck' ELSE 'Push Cart' END AS facilitytype,
        o_orderkey % 200 AS cnn,
        'ADDR' || CAST(o_orderkey % 300 AS VARCHAR) AS address,
        o_orderpriority AS fooditems,
        o_orderstatus AS status,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS approved,
        strftime(o_orderdate, '%Y-%m-%d') AS received,
        strftime(o_orderdate, '%Y-%m-%d') AS expirationdate,
        CAST(o_orderkey % 2 AS INTEGER) AS priorpermit
    FROM orders
),
yelp AS (
    SELECT
        'Y' || CAST(s_suppkey AS VARCHAR) AS Yelp_id,
        'A' || CAST(s_suppkey % 50 AS VARCHAR) AS Name,
        CAST((s_suppkey * 7) % 100 AS INTEGER) AS Review,
        CAST((s_suppkey % 5) + 1 AS DOUBLE) AS Rating,
        'ADDR' || CAST(s_suppkey AS VARCHAR) AS Address,
        '555-' || CAST(s_suppkey AS VARCHAR) AS Phone,
        37.7 + CAST(s_suppkey AS DOUBLE) / 1000.0 AS Latitude,
        -122.4 - CAST(s_suppkey AS DOUBLE) / 1000.0 AS Longitude
    FROM supplier
)
"""
