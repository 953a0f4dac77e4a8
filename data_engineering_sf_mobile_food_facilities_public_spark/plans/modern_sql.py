"""Modern SQL surface (Spark 4.x): re-aggregatable bitmap distinct,
mode/median, regression aggregates, LISTAGG, error-safe try_* arithmetic,
multiset INTERSECT ALL / EXCEPT ALL, recursive CTEs (calendar gap-fill),
VARIANT semi-structured shredding, and a Count-Min frequency sketch.

The reference has none of these (SURVEY.md section 2 — its one Catalyst
query is a join+count+top-5, /root/reference/airflow.py:654-660), but a
100 TB engine is expected to carry them:

* **bitmap distinct** is THE re-aggregatable exact-distinct pattern at
  scale — store per-(group, bucket) roaring-style bitmaps, OR-merge on
  demand; never recount raw data (same shape as the HLL sketch query,
  but exact).
* **recursive CTE** gap-fill generates the calendar dimension inside the
  plan — no driver-side date loop, no collect().
* **VARIANT** (parse_json → variant_get) is Spark 4's shredded
  semi-structured type: binary-encoded, predicate-pushdown-friendly —
  the scale path for JSON event properties vs. per-row string parsing.
* **try_divide** keeps ANSI-mode pipelines total (NULL, not job-abort,
  on divide-by-zero) — at 100 TB one poison row must not kill the run.

Oracle-exactness notes (tests/parity.py): regression aggregates round(6)
both sides (incremental covariance accumulation differs in the last ulp
between engines); mode() is tie-free in the testdata at every SF (ties
would make both engines' choice unspecified); AVG over exact ints is a
single double division — bit-identical across engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_views
from .relational import _dec, _register

# ---------------------------------------------------------------------------
# Re-aggregatable exact distinct: bitmap_construct_agg / bitmap_count
# ---------------------------------------------------------------------------


@_register(
    "bitmap_distinct_parts_by_flag",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bitmap_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count via mergeable bitmaps: group to
    (flag, bucket) partial bitmaps with map-side combine, then OR/count
    — the materialized-view-friendly twin of COUNT(DISTINCT), which at
    scale is stored per partition/day and merged on demand."""
    l = load(spark, sf_dir, "lineitem")
    partials = l.groupBy(
        "l_returnflag", F.bitmap_bucket_number("l_partkey").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("l_partkey")).alias("bm"))
    return partials.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).alias("distinct_parts")
    )


@_register(
    "rolling_7day_active_users",
    """
    WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM e),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY day)
    SELECT d.day, dau.dau, COUNT(DISTINCT e.user_id) AS users_7d
    FROM days d
    JOIN e ON e.day BETWEEN d.day - 6 AND d.day
    JOIN dau ON dau.day = d.day
    GROUP BY d.day, dau.dau
    """,
)
def rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + exact 7-day rolling distinct users per active day — the
    telemetry query where naive sliding COUNT(DISTINCT) re-scans every
    event 7 times (or worse, holds a 7-day distinct window in one task
    per day).

    Scale shape — ONE linear consumer chain, so events are scanned
    exactly once (a branched formulation with separate day-spine and
    DAU consumers of the daily partials re-scanned events six times —
    identical subtrees do NOT get reused once per-branch column pruning
    diverges, the same Catalyst reality the cumsum family documents):
    raw events aggregate ONCE into per-(day, bucket) bitmap partials
    (map-side combined — the same mergeable-bitmap pattern as
    ``bitmap_distinct_parts_by_flag``, stored per day in a real
    deployment); each partial then explodes to the <=7 output days it
    contributes to (a x7 expansion of #days x #buckets rows, not of
    events) carrying an is-self flag, and one (output day, bucket)
    OR-merge feeds one final per-day SUM — buckets partition the
    user-id space, so cardinalities add.  DAU rides the SAME merge as
    the OR of self-flagged bitmaps only, and output days restrict to
    real event days because only they have a self contribution (the
    HAVING dau IS NOT NULL below) — no day-spine join, no second
    consumer, nothing after the first aggregate ever touches events.
    The oracle pays the 7x self-join over raw events instead.  Windows
    at the corpus edge are partial by definition."""
    e = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy(
        "day", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    contrib = daily.select(
        "day",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("out_day"),
        "bucket",
        "bm",
    )
    merged = contrib.groupBy("out_day", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm_all"),
        F.bitmap_or_agg(F.when(F.col("out_day") == F.col("day"), F.col("bm"))).alias(
            "bm_self"
        ),
        # bitmap_or_agg over an all-NULL group returns an EMPTY bitmap,
        # not NULL, so "did this out_day really occur" needs an explicit
        # self-row count — phantom trailing days (last day + 1..6) have
        # contributions but no self row and must not emit
        F.count(F.when(F.col("out_day") == F.col("day"), 1)).alias("n_self"),
    )
    return (
        merged.groupBy("out_day")
        .agg(
            F.sum(F.bitmap_count("bm_self")).alias("dau"),
            F.sum(F.bitmap_count("bm_all")).alias("users_7d"),
            F.sum("n_self").alias("n_self"),
        )
        .filter(F.col("n_self") > 0)  # only real event days emit
        .select(F.col("out_day").alias("day"), "dau", "users_7d")
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: mode / median / regr_*
# ---------------------------------------------------------------------------


@_register(
    "mode_median_by_flag",
    """
    SELECT l_returnflag,
           mode(l_linenumber) AS mode_linenumber,
           median(l_extendedprice) AS median_price,
           median(l_linenumber) AS median_linenumber
    FROM lineitem GROUP BY l_returnflag
    """,
)
def mode_median_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() (deterministic variant) and median() — single-pass typed
    aggregates; median is the exact interpolated 0.5-quantile (ints
    promote to double on interpolation in both engines)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.mode("l_linenumber", True).alias("mode_linenumber"),
        F.median("l_extendedprice").alias("median_price"),
        F.median("l_linenumber").alias("median_linenumber"),
    )


@_register(
    "regr_price_vs_quantity",
    """
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regr_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI regression aggregates (regr_count/slope/intercept/r2) — the
    built-in single-pass OLS twin of ml/regression.py, all map-side
    combinable.  round(6): the engines accumulate covariance in a
    different order, so the last ulp differs."""
    l = load(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return l.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# LISTAGG (SQL:2016) — ordered string aggregation
# ---------------------------------------------------------------------------


@_register(
    "listagg_nations_per_region",
    """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...) through the SQL text
    interface — the standard ordered string aggregation (DuckDB spells
    it string_agg).  Broadcast join on the 5-row region dim."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
        FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
        """
    )


# ---------------------------------------------------------------------------
# Error-safe arithmetic: try_divide
# ---------------------------------------------------------------------------


@_register(
    "try_divide_return_rates",
    """
    SELECT l_partkey,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returned_qty,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS return_lines,
           CASE WHEN COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) = 0 THEN NULL
                ELSE CAST(SUM(CASE WHEN l_returnflag = 'R'
                              THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
                     / COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
           END AS qty_per_return
    FROM lineitem GROUP BY l_partkey
    """,
)
def try_divide_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide: NULL instead of error/poison on zero denominators
    (parts with no returned lines) — keeps ANSI-mode pipelines total at
    scale.  The DuckDB oracle spells the same semantics with CASE."""
    l = load(spark, sf_dir, "lineitem")
    is_r = F.when(F.col("l_returnflag") == "R", True)
    agg = l.groupBy("l_partkey").agg(
        F.sum(is_r.otherwise(None).cast("int") * _dec("l_quantity"))
        .cast("double")
        .alias("returned_qty"),
        F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("return_lines"),
    )
    return agg.select(
        "l_partkey",
        "returned_qty",
        "return_lines",
        F.try_divide("returned_qty", "return_lines").alias("qty_per_return"),
    )


# ---------------------------------------------------------------------------
# Multiset algebra: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------


@_register(
    "multiset_customer_orders_h1_vs_h2",
    """
    SELECT o_custkey, 'both_halves' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-01-01'
    )
    UNION ALL
    SELECT o_custkey, 'early_only' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-01-01'
    )
    """,
)
def multiset_customer_orders_h1_vs_h2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag semantics (per-occurrence, not
    per-value): customers' order multiplicities before vs. after a date
    split.  Each set op is one hash shuffle on the key; no dedup pass."""
    o = load(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1995-01-01").cast("date")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")).select(
        "o_custkey"
    )
    return early.intersectAll(late).withColumn("tag", F.lit("both_halves")).unionAll(
        early.exceptAll(late).withColumn("tag", F.lit("early_only"))
    )


# ---------------------------------------------------------------------------
# Recursive CTE: in-plan calendar dimension + gap fill
# ---------------------------------------------------------------------------


@_register(
    "calendar_fill_monthly_revenue",
    """
    WITH RECURSIVE bounds AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders
    ), months(month_start) AS (
        SELECT lo FROM bounds
        UNION ALL
        SELECT month_start + INTERVAL 1 MONTH FROM months
        WHERE month_start < (SELECT hi FROM bounds)
    ), rev AS (
        SELECT date_trunc('month', o_orderdate) AS month_start,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT strftime(m.month_start, '%Y-%m') AS month,
           COALESCE(rev.revenue, 0.0) AS revenue,
           COALESCE(rev.n_orders, 0) AS n_orders
    FROM months m LEFT JOIN rev ON m.month_start = rev.month_start
    """,
)
def calendar_fill_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4) generating the month calendar INSIDE the
    plan, left-joined to monthly revenue so empty months surface as 0 —
    gap-fill with no driver-side date loop.  The ~80-month recursion is
    a tiny driver-local spine; the revenue agg is the only shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT trunc(MIN(o_orderdate), 'MM') AS lo,
                   trunc(MAX(o_orderdate), 'MM') AS hi
            FROM orders
        ), months(month_start) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT add_months(month_start, 1) FROM months
            WHERE month_start < (SELECT hi FROM bounds)
        ), rev AS (
            SELECT trunc(o_orderdate, 'MM') AS month_start,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT date_format(m.month_start, 'yyyy-MM') AS month,
               COALESCE(rev.revenue, 0.0D) AS revenue,
               COALESCE(rev.n_orders, 0L) AS n_orders
        FROM months m LEFT JOIN rev ON m.month_start = rev.month_start
        """
    )


# ---------------------------------------------------------------------------
# VARIANT: shredded semi-structured event properties
# ---------------------------------------------------------------------------


@_register(
    "variant_shred_event_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           AVG(CAST(json_extract(props, '$.k') AS INT)) AS k_avg,
           MAX(CAST(json_extract(props, '$.k') AS INT)) AS k_max,
           COUNT(CAST(json_extract(props, '$.k') AS INT)) AS k_present
    FROM events GROUP BY event_type
    """,
)
def variant_shred_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT path: parse_json once into Spark 4's binary
    semi-structured type, shred typed fields with variant_get, aggregate
    — the scale path for JSON event properties (columnar, shreddable,
    no per-row string re-parse; AVG over exact ints is one double
    division, bit-identical across engines)."""
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
    return (
        e.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.avg("k").alias("k_avg"),
            F.max("k").alias("k_max"),
            F.count("k").alias("k_present"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — approximate frequency with a DETERMINISTIC md5 hash
# family, so the whole ESTIMATE (not just its error bound) is
# oracle-checkable.  The native ``F.count_min_sketch`` aggregate stays
# exercised in tests/test_sketch_quality.py (deserialized through the
# JVM sketch class, contract-checked per key), but its serialized
# register layout is engine-specific — same reason
# ``hll_sketch_distinct_parts`` stays rows-only.
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash lanes (depth)
_CMS_W = 32  # counters per lane (width)


def _cms_bucket(col, lane: int):
    """Lane ``lane``'s counter index for a key: the ``lane``-th disjoint
    8-hex window of ONE md5 digest of ``'cms_' || key`` as an integer,
    mod the lane width — four independent-enough 32-bit lanes from a
    single 128-bit hash (one md5 per row, not four; the KMV/minhash
    md5-lane convention)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cms_"), col)), 1 + 8 * lane, 8), 16, 10
        )
        .cast("long")
        % _CMS_W
    )


def _cms_bucket_sql(key_expr: str, lane: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('cms_' || {key_expr}), {1 + 8 * lane}, 8))"
        f" AS BIGINT) % {_CMS_W}"
    )


@_register(
    "count_min_sketch_flag_freq",
    f"""
    WITH lanes AS (SELECT unnest([0, 1, 2, 3]) AS lane),
    counters AS (
        SELECT l.lane,
               CASE l.lane
                 WHEN 0 THEN {_cms_bucket_sql('li.l_returnflag', 0)}
                 WHEN 1 THEN {_cms_bucket_sql('li.l_returnflag', 1)}
                 WHEN 2 THEN {_cms_bucket_sql('li.l_returnflag', 2)}
                 ELSE {_cms_bucket_sql('li.l_returnflag', 3)}
               END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem li CROSS JOIN lanes l
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM lineitem GROUP BY 1
    ),
    probe AS (
        SELECT e.l_returnflag, e.exact_count, l.lane,
               CASE l.lane
                 WHEN 0 THEN {_cms_bucket_sql('e.l_returnflag', 0)}
                 WHEN 1 THEN {_cms_bucket_sql('e.l_returnflag', 1)}
                 WHEN 2 THEN {_cms_bucket_sql('e.l_returnflag', 2)}
                 ELSE {_cms_bucket_sql('e.l_returnflag', 3)}
               END AS bucket
        FROM exact e CROSS JOIN lanes l
    )
    SELECT p.l_returnflag,
           CAST(MAX(p.exact_count) AS BIGINT) AS exact_count,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate
    FROM probe p JOIN counters c ON p.lane = c.lane AND p.bucket = c.bucket
    GROUP BY 1
    """,
)
def count_min_sketch_flag_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates over ``l_returnflag``
    (Cormode & Muthukrishnan 2005, public), built with the REAL CMS
    update shape and a deterministic md5 hash family so the estimates
    themselves are oracle-paired: every row increments one counter per
    lane (lane explode -> map-side-combined ``groupBy(lane, bucket)``,
    so only d*w={d}*{w} pre-aggregated counter rows ever shuffle), and
    a key's estimate is the MIN of its {d} lane counters — an
    overestimate by construction (collisions only add), asserted
    against the exact counts emitted alongside.

    Scale shape: the fact scan explodes x{d} but contracts map-side to
    the {d}x{w} counter grid — the sketch's whole point (sub-linear
    mergeable state, no per-key shuffle); probes are dim-sized.  The
    native ``F.count_min_sketch`` aggregate remains the production
    path for opaque-at-rest sketches and is contract-tested in
    tests/test_sketch_quality.py; ITS serialized layout is
    implementation-defined, which is why this md5-lane twin exists
    (the KMV precedent, ``kmv_distinct_estimate``)."""
    li = load(spark, sf_dir, "lineitem")
    flag = F.col("l_returnflag")

    def lane_slices(h):
        # 4 disjoint 8-hex windows of one digest column (Catalyst does
        # NOT common-subexpression-eliminate md5 across array-of-struct
        # fields — measured 3.2s -> ~1.3s at sf0.1 by hashing once in a
        # prior projection and slicing here)
        return F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("lane"),
                    (
                        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
                        % _CMS_W
                    ).alias("bucket"),
                )
                for i in range(_CMS_D)
            ]
        )

    hashed = li.select(F.md5(F.concat(F.lit("cms_"), flag)).alias("__h"))
    counters = (
        hashed.select(F.explode(lane_slices(F.col("__h"))).alias("lb"))
        .select(F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
        .groupBy("lane", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probe = exact.select(
        "l_returnflag",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("lane"),
                        _cms_bucket(F.col("l_returnflag"), i).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("lb"),
    ).select(
        "l_returnflag",
        "exact_count",
        F.col("lb.lane").alias("lane"),
        F.col("lb.bucket").alias("bucket"),
    )
    return (
        probe.join(F.broadcast(counters), ["lane", "bucket"])
        .groupBy("l_returnflag")
        .agg(
            F.max("exact_count").alias("exact_count"),
            F.min("cnt").alias("cms_estimate"),
        )
    )


count_min_sketch_flag_freq.__doc__ = count_min_sketch_flag_freq.__doc__.format(
    d=_CMS_D, w=_CMS_W
)


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer-join distribution (two-level aggregation)
# ---------------------------------------------------------------------------


@_register(
    "q13_customer_order_distribution",
    """
    SELECT order_count, COUNT(*) AS num_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority NOT LIKE '%URGENT%'
        GROUP BY c.c_custkey
    )
    GROUP BY order_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customers-per-order-count histogram.  Left join with a
    pushed residual predicate on the join's probe side, then two
    aggregations — the second groups on the first's output, so AQE can
    coalesce its tiny shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("%URGENT%")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count("*").alias("num_customers")
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (SQL join surface)
# ---------------------------------------------------------------------------


@_register(
    "lateral_long_words_per_doc",
    """
    SELECT d.doc_id,
           COUNT(*) AS long_words,
           MAX(length(x.w)) AS max_len
    FROM documents d,
         LATERAL (SELECT unnest(string_split(d.text, ' ')) AS w) x
    WHERE length(x.w) > 8
    GROUP BY d.doc_id
    """,
)
def lateral_long_words_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL text interface — the
    standard spelling of 'explode this row-derived relation'.  Catalyst
    rewrites it to a Generate (no nested-loop); same plan as the
    DataFrame explode path."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS long_words,
               MAX(length(x.w)) AS max_len
        FROM documents d,
             LATERAL (SELECT explode(split(d.text, ' ')) AS w) x
        WHERE length(x.w) > 8
        GROUP BY d.doc_id
        """
    )


# ---------------------------------------------------------------------------
# Regexp function breadth
# ---------------------------------------------------------------------------


@_register(
    "regexp_doc_features",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '([a-z]{7,})', 1)) AS n_long_tokens,
           split_part(source, '_', 1) AS source_head,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len
    FROM documents
    """,
)
def regexp_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface (regexp_extract_all / split_part /
    regexp_replace) — narrow per-row projections, fully codegen'd
    JVM-side; patterns restricted to the POSIX-common subset both
    engines' regex dialects agree on."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("([a-z]{7,})"), 1)).alias(
            "n_long_tokens"
        ),
        F.split_part("source", F.lit("_"), F.lit(1)).alias("source_head"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("consonant_len"),
    )


# ---------------------------------------------------------------------------
# Parameterized SQL (injection-safe named binds)
# ---------------------------------------------------------------------------


@_register(
    "parameterized_sql_big_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
)
def parameterized_sql_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args=...)): literals bound
    server-side as typed parameters, not string-spliced — the
    injection-safe API surface; Catalyst still constant-folds and
    pushes the bound predicate to the scan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000.0},
    )


# ---------------------------------------------------------------------------
# Pandas UDAF (GROUPED_AGG) — the UDF-triad completion
# ---------------------------------------------------------------------------


@_register(
    "udaf_weighted_avg_discount",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 6)
             AS wavg_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas_udf: quantity-weighted
    mean discount per flag.  Arrow moves each group as one Series batch;
    no per-row Python.  round(6) absorbs the float-summation-order
    difference vs the oracle's built-in SUMs (see functions/udafs.py for
    the no-partial-agg scale caveat)."""
    from ..functions.udafs import weighted_mean

    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_discount", "l_quantity"), 6).alias(
            "wavg_discount"
        )
    )


# ---------------------------------------------------------------------------
# Native session_window (batch) — the built-in twin of operators/
# timeseries.sessionize
# ---------------------------------------------------------------------------


@_register(
    "session_window_user_activity",
    """
    WITH lagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM lagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def session_window_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window in BATCH groupBy: 30-minute-gap sessions
    per user in one aggregate operator (merging session state in the
    agg hash map) — no window-function pass, one shuffle on user_id.
    The oracle derives the same sessions with lag + running sum; session
    end is last event + gap by definition.

    The custom twin (operators/timeseries.sessionize) exists for
    semantics session_window can't express (per-key dynamic gaps,
    session caps); prefer this built-in when plain gap sessions are
    enough."""
    e = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy(sw, "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (single-pass)
# ---------------------------------------------------------------------------


@_register(
    "expectations_orders",
    """
    SELECT 'custkey_not_null' AS rule,
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           COUNT(CASE WHEN NOT (o_totalprice > 0) THEN 1 END) FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
    FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           COUNT(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01'
                           AND o_orderdate < TIMESTAMP '2000-01-01') THEN 1 END)
    FROM orders
    """,
)
def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test/Deequ-style expectations over orders: not-null, range,
    accepted-values, date-bounds — all counted in ONE scan (conditional
    counts in a single aggregate, then unpivoted to (rule, violations)).
    The oracle's UNION ALL of scans is the shape this operator avoids."""
    from ..operators.constraints import run_expectations

    o = load(spark, sf_dir, "orders")
    return run_expectations(
        o,
        [
            ("custkey_not_null", F.col("o_custkey").isNotNull()),
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("status_in_domain", F.col("o_orderstatus").isin("O", "F", "P")),
            (
                "orderdate_in_range",
                (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")),
            ),
        ],
    )


# ---------------------------------------------------------------------------
# Dispersion / association statistics breadth
# ---------------------------------------------------------------------------


@_register(
    "dispersion_stats_by_flag",
    """
    SELECT l_returnflag,
           ROUND(covar_samp(l_extendedprice, l_quantity)
                 / nullif(stddev_samp(l_extendedprice)
                          * stddev_samp(l_quantity), 0.0), 6) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 6) AS covar_s,
           ROUND(covar_pop(l_extendedprice, l_quantity), 6) AS covar_p,
           ROUND(stddev_samp(l_extendedprice), 6) AS price_sd,
           ROUND(var_samp(l_extendedprice), 6) AS price_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def dispersion_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / covar_pop / stddev / variance — single-pass
    co-moment aggregates, all map-side combinable; round(6) for the
    engines' accumulation-order ulp (same note as regr_*).  The
    correlation is spelled covar/(sd*sd) with a nullif guard on BOTH
    sides: a zero-variance group makes correlation undefined, and the
    engines disagree on what the builtin does there (Spark's corr
    raises ANSI DIVIDE_BY_ZERO, DuckDB's returns NULL — caught by the
    hostile-numerics parity corpus)."""
    l = load(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return l.groupBy("l_returnflag").agg(
        F.round(
            F.covar_samp(y, x)
            / F.nullif(F.stddev_samp(y) * F.stddev_samp(x), F.lit(0.0)),
            6,
        ).alias("price_qty_corr"),
        F.round(F.covar_samp(y, x), 6).alias("covar_s"),
        F.round(F.covar_pop(y, x), 6).alias("covar_p"),
        F.round(F.stddev_samp(y), 6).alias("price_sd"),
        F.round(F.var_samp(y), 6).alias("price_var"),
    )


# ---------------------------------------------------------------------------
# Map type surface: build -> transform -> filter -> explode back to rows
# ---------------------------------------------------------------------------


@_register(
    "map_status_counts_by_priority",
    """
    WITH counts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_orderstatus AS status, cnt * 2 AS doubled
    FROM counts WHERE cnt * 2 >= 10
    """,
)
def map_status_counts_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-priority status->count map built
    with map_from_entries(collect_list(struct)), values rewritten with
    transform_values, pruned with map_filter, then exploded back to
    rows.  The map stays tiny (|statuses| entries per group), so the
    interpreted higher-order lambdas touch O(groups) values, not
    O(rows) — the collect_list feeding it is the part that must stay
    bounded at scale (bounded key domain here)."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    maps = counts.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "cnt"))
        ).alias("status_counts")
    )
    transformed = maps.select(
        "o_orderpriority",
        F.map_filter(
            F.transform_values("status_counts", lambda k, v: v * 2),
            lambda k, v: v >= 10,
        ).alias("status_counts"),
    )
    return transformed.select(
        "o_orderpriority",
        F.explode("status_counts").alias("status", "doubled"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate -> HAVING -> join back to detail
# ---------------------------------------------------------------------------


@_register(
    "q18_large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity clears a threshold, joined
    back to customer detail.

    Aggregate-once shape (round-5 rework): the HAVING aggregate already
    computes the per-order quantity the final output needs, so lineitem
    is scanned and shuffled exactly once — the qualifying (orderkey,
    qty) rows then join orders and customer directly.  The round-4
    double-semi-join variant (filter pass + sum pass over lineitem)
    assumed the qualifying key set stays broadcast-small; the regenerated
    data qualifies ~20% of orders, so that plan re-scanned the biggest
    table for no benefit (1.4s -> 10.2s at sf0.1).  This shape is also
    the right one at 100 TB: one wide shuffle on the fact table, then
    joins whose strategy AQE picks from the qualifying set's real size."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# percentile_disc — the discrete quantile twin of median/percentile
# ---------------------------------------------------------------------------


@_register(
    "percentile_disc_by_status",
    """
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_disc_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc (WITHIN GROUP): returns an ACTUAL data value at
    each quantile, not an interpolation — exact cross-engine equality
    with no float tolerance, and the variant to use when the quantile
    must be a real observed value (e.g. a latency sample)."""
    o = load(spark, sf_dir, "orders")
    exprs = [
        F.expr(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias(name)
        for q, name in ((0.25, "p25"), (0.50, "p50"), (0.90, "p90"))
    ]
    return o.groupBy("o_orderstatus").agg(*exprs)


# ---------------------------------------------------------------------------
# Numeric RANGE window frame (value-based, not row-based)
# ---------------------------------------------------------------------------


@_register(
    "range_frame_price_neighbors",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (
               PARTITION BY o_orderstatus ORDER BY o_totalprice
               RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS neighbors_1k
    FROM orders
    """,
)
def range_frame_price_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame over a numeric ordering: for each order,
    how many same-status orders priced within +-1000 — a sliding
    neighborhood count with one shuffle on the partition key and a sort
    the frame scan rides (ties share a frame by definition, so the
    result is deterministic under any partitioning)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("neighbors_1k"),
    )


# ---------------------------------------------------------------------------
# Explicit cross join: dense dimension grid + zero-fill
# ---------------------------------------------------------------------------


@_register(
    "cross_join_region_status_grid",
    """
    WITH counts AS (
        SELECT n.n_regionkey, o.o_orderstatus, COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT r.r_name, s.o_orderstatus AS status,
           COALESCE(counts.n_orders, 0) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    LEFT JOIN counts ON r.r_regionkey = counts.n_regionkey
                    AND s.o_orderstatus = counts.o_orderstatus
    """,
)
def cross_join_region_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate CROSS JOIN: the dense region x status grid, left-joined
    to observed counts so absent combinations surface as 0.  Cartesian
    products are fatal between large inputs, but dim x dim grids are the
    sanctioned use — both sides are tiny, the product stays driver-small,
    and the fact-side aggregation happens BEFORE the grid join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )
    grid = r.crossJoin(o.select("o_orderstatus").distinct())
    return grid.join(
        counts,
        (grid.r_regionkey == counts.n_regionkey)
        & (grid.o_orderstatus == counts.o_orderstatus),
        "left",
    ).select(
        "r_name",
        grid.o_orderstatus.alias("status"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Distribution window functions: cume_dist / percent_rank
# ---------------------------------------------------------------------------


@_register(
    "distribution_windows",
    """
    SELECT o_orderkey,
           ROUND(cume_dist() OVER w, 6) AS cd,
           ROUND(percent_rank() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
)
def distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank — relative-position windows (both
    tie-stable: equal order keys share a value, so no tiebreak column is
    needed).  Same single-shuffle window execution as the ranking
    family; round(6) for the engines' division ulp."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates
# ---------------------------------------------------------------------------


@_register(
    "bitwise_agg_orderkeys",
    """
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor
    FROM orders GROUP BY o_orderstatus
    """,
)
def bitwise_agg_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor — commutative-associative integer
    folds, fully map-side combinable (the xor fold doubles as a cheap
    order-insensitive content checksum for partition reconciliation)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


# ---------------------------------------------------------------------------
# Calendar edge functions
# ---------------------------------------------------------------------------


@_register(
    "calendar_edge_functions",
    """
    SELECT o_orderkey,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate) + 1 AS dow,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS iso_week,
           strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d')
             AS plus_30d
    FROM orders
    """,
)
def calendar_edge_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-edge scalar functions (last_day / dayofweek / quarter /
    ISO week / date_add) — narrow codegen'd projections.  Cross-engine
    shim captured in the oracle: DuckDB numbers Sunday 0, Spark 1."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
    )


# ---------------------------------------------------------------------------
# Scalar string breadth + least/greatest
# ---------------------------------------------------------------------------


@_register(
    "string_scalar_breadth",
    """
    SELECT c_custkey,
           lpad(c_name, 25, '*') AS padded,
           rpad(c_mktsegment, 12, '.') AS segment_padded,
           reverse(c_name) AS reversed,
           left(c_name, 8) AS head8,
           right(c_name, 5) AS tail5,
           repeat(c_mktsegment, 2) AS seg_twice,
           least(c_custkey, c_nationkey) AS lo,
           greatest(c_custkey, c_nationkey) AS hi
    FROM customer
    """,
)
def string_scalar_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/reverse/left/right/repeat + least/greatest — narrow
    codegen'd projections (the fixed-width padding functions are the
    usual key-normalization tools before byte-ordered layouts)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad("c_name", 25, "*").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("segment_padded"),
        F.reverse("c_name").alias("reversed"),
        F.expr("left(c_name, 8)").alias("head8"),
        F.expr("right(c_name, 5)").alias("tail5"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.least("c_custkey", "c_nationkey").alias("lo"),
        F.greatest("c_custkey", "c_nationkey").alias("hi"),
    )


# ---------------------------------------------------------------------------
# to_json — structured row -> JSON document rendering
# ---------------------------------------------------------------------------


@_register(
    "to_json_order_documents",
    """
    SELECT o_orderkey,
           to_json(struct_pack(
               orderkey := o_orderkey,
               status := o_orderstatus,
               price := CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
           )) AS doc
    FROM orders
    """,
)
def to_json_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)): rows rendered as JSON documents inside the
    plan (the sink-side inverse of the from_json flatten path).  The
    price goes through DECIMAL so the JSON number renders identically in
    both engines — raw doubles would expose shortest-repr differences."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.col("o_orderstatus").alias("status"),
                # as a string: Spark's JSON keeps decimal scale
                # ("188990.90") where DuckDB strips it (188990.9)
                _dec("o_totalprice").cast("string").alias("price"),
            )
        ).alias("doc"),
    )


# ---------------------------------------------------------------------------
# Array set algebra: union / intersect / except over collected arrays
# ---------------------------------------------------------------------------


@_register(
    "array_set_ops_region_pairs",
    """
    WITH sets AS (
        SELECT r.r_regionkey, r.r_name,
               list_sort(list(DISTINCT substr(n.n_name, 1, 1))) AS initials
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_regionkey, r.r_name
    )
    SELECT a.r_name AS region_a, b.r_name AS region_b,
           list_aggr(list_sort(list_distinct(list_concat(a.initials, b.initials))),
                     'string_agg', ',') AS union_initials,
           COALESCE(list_aggr(list_sort(list_intersect(a.initials, b.initials)),
                     'string_agg', ','), '') AS common_initials,
           COALESCE(list_aggr(list_sort(list_filter(a.initials,
                     x -> NOT list_contains(b.initials, x))),
                     'string_agg', ','), '') AS only_a_initials
    FROM sets a JOIN sets b ON a.r_regionkey < b.r_regionkey
    """,
)
def array_set_ops_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union / array_intersect / array_except over per-region
    nation-initial sets, for every region pair.  Array set algebra works
    element-wise inside a row — no shuffle once the arrays exist; the
    dim-pair inequality join is a sanctioned tiny cross (5x4/2 rows).
    Sorted + joined to strings so the oracle compare is order-free."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    sets = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey", "r_name")
        .agg(
            F.array_sort(
                F.collect_set(F.substring("n_name", 1, 1))
            ).alias("initials")
        )
    )
    a = sets.alias("a")
    b = sets.alias("b")
    joined = a.join(b, F.col("a.r_regionkey") < F.col("b.r_regionkey"))
    return joined.select(
        F.col("a.r_name").alias("region_a"),
        F.col("b.r_name").alias("region_b"),
        F.array_join(
            F.array_sort(F.array_union("a.initials", "b.initials")), ","
        ).alias("union_initials"),
        F.array_join(
            F.array_sort(F.array_intersect("a.initials", "b.initials")), ","
        ).alias("common_initials"),
        F.array_join(
            F.array_sort(F.array_except("a.initials", "b.initials")), ","
        ).alias("only_a_initials"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (first-touch cohort x activity period)
# ---------------------------------------------------------------------------


@_register(
    "cohort_retention_daily",
    """
    WITH firsts AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events
        GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           day_offset, COUNT(*) AS active_users
    FROM activity GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    day-offset of later activity — the canonical product-analytics
    rollup.  Two shuffles on user_id (first-touch agg + the join back)
    share partitioning; the distinct collapses repeat visits before the
    final small aggregate."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("active_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "active_users",
    )


# ---------------------------------------------------------------------------
# Groupwise top-k (rank window + filter)
# ---------------------------------------------------------------------------


@_register(
    "top2_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 2
    """,
)
def top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise top-k: each customer's two priciest orders via a
    row_number window + filter (orderkey tiebreak names a total order).
    One shuffle on the group key; Spark pushes the rn <= 2 bound into
    the window sort as a group-limit, so no full per-group sort output
    materializes."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Month-over-month change (aggregate -> lag window on the series)
# ---------------------------------------------------------------------------


@_register(
    "mom_revenue_change",
    """
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY month), 2) AS change,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month), 6) AS pct_change
    FROM monthly
    """,
)
def mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: aggregate to a tiny series, then
    a lag window over it.  The unpartitioned window is safe HERE because
    it runs on the ~80-row aggregate, never the fact table — the pattern
    to call out in review at scale.  round() keeps the double division
    cross-engine stable."""
    from pyspark.sql import Window

    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.trunc("o_orderdate", "MM"), "yyyy-MM").alias("month")
        )
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("change"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# Pivot with MULTIPLE aggregates per cell
# ---------------------------------------------------------------------------


@_register(
    "pivot_multi_agg_status",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_revenue,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_revenue,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_multi_agg_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with two aggregates per cell (count + revenue): explicit
    pivot values keep the schema static (no extra distinct-values job),
    and every cell is a conditional aggregate in ONE pass — the oracle's
    FILTER clauses are exactly what the pivot compiles to."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            # count(*) is rejected inside Pivot; count(lit(1)) is the same
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("F_n").alias("f_n"),
        F.col("F_revenue").alias("f_revenue"),
        F.col("O_n").alias("o_n"),
        F.col("O_revenue").alias("o_revenue"),
        F.col("P_n").alias("p_n"),
        F.col("P_revenue").alias("p_revenue"),
    )


# ---------------------------------------------------------------------------
# Broadcast-variable lookup inside a Pandas UDF (model-shipping pattern)
# ---------------------------------------------------------------------------


@_register(
    "broadcast_dict_region_lookup",
    """
    SELECT n.n_nationkey, r.r_name AS region_name, COUNT(c.c_custkey) AS n_customers
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, r.r_name
    """,
)
def broadcast_dict_region_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For RELATIONAL lookups, PREFER THE DIMENSION JOIN — Catalyst
    can't see through a UDF, and the collect() below is only sound
    because `nation x region` is dim-sized (25 rows).  This entry
    demonstrates the one case the join can't express: sc.broadcast of a
    driver-built Python object (model weights, vocab, label maps)
    consumed inside an Arrow pandas_udf — one copy per executor, not
    per task.  The oracle proves the lookup equals the equivalent
    dimension join."""
    from pyspark.sql.functions import pandas_udf

    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    c = load(spark, sf_dir, "customer")
    mapping = {
        row.n_nationkey: row.r_name
        for row in n.join(r, n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "r_name")
        .collect()
    }
    bc = spark.sparkContext.broadcast(mapping)

    @pandas_udf("string")
    def region_of(nk: pd.Series) -> pd.Series:
        m = bc.value
        return nk.map(m)

    return (
        n.select("n_nationkey")
        .join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_nationkey")
        .agg(F.count("c_custkey").alias("n_customers"))
        .select(
            "n_nationkey",
            region_of("n_nationkey").alias("region_name"),
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# Scan provenance: input_file_name audit
# ---------------------------------------------------------------------------


@_register(
    "rows_per_input_file",
    """
    SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def rows_per_input_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_file_name() provenance: row counts per physical input file
    — the audit primitive for 100 TB scans (which files fed this
    result; which file produced the bad rows).  Basename-normalized
    (Spark reports a file: URI); the testdata table is one file, so the
    oracle can name it literally — the Spark side still derives it from
    the scan."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.regexp_extract(F.input_file_name(), r"([^/\\]+)$", 1).alias(
                "file_name"
            )
        )
        .groupBy("file_name")
        .agg(F.count("*").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Zone-map pruning effectiveness by physical layout.
# ---------------------------------------------------------------------------

_ZM_ROWS_PER_FILE = 1000  # pseudo-file granule (rows per file)


@_register(
    "zonemap_pruning_by_layout",
    f"""
    WITH base AS (
        SELECT o_orderkey, o_orderdate FROM orders
    ),
    by_key AS (
        SELECT 'insertion_order' AS layout,
               o_orderkey // {_ZM_ROWS_PER_FILE} AS file_id,
               MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax
        FROM base GROUP BY 2
    ),
    by_month AS (
        SELECT 'date_partitioned' AS layout,
               CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
                   AS file_id,
               MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax
        FROM base GROUP BY 2
    ),
    files AS (SELECT * FROM by_key UNION ALL SELECT * FROM by_month)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN zmax < TIMESTAMP '1996-01-01'
                           OR zmin >= TIMESTAMP '1997-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
           round(CAST(SUM(CASE WHEN zmax < TIMESTAMP '1996-01-01'
                                 OR zmin >= TIMESTAMP '1997-01-01'
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS frac_pruned
    FROM files
    GROUP BY layout
    ORDER BY layout
    """,
)
def zonemap_pruning_by_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max skipping-index) effectiveness under two
    physical layouts for the predicate ``o_orderdate IN 1996``: files
    written in INSERTION ORDER (orderkey ranges — dates land randomly,
    so nearly every file's [min,max] straddles the predicate and
    nothing prunes) versus files PARTITIONED BY MONTH (every file
    outside 1996 prunes by its zone map alone).  This is the planning
    analysis behind "sort/partition/z-order your data": identical rows,
    identical predicate, orders-of-magnitude different scan sets — the
    quantified companion of ``zorder_key_orders`` and the
    bloom-pruning audit.

    Scale shape: one pass per layout producing per-file min/max (the
    zone maps themselves — map-side-combined partials, dim-sized
    output), then the pruning decision is pure arithmetic on the
    #files frame.  At 100 TB this is exactly how a table-format
    maintenance job scores a candidate re-clustering without rewriting
    anything."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")

    def layout(name: str, file_id) -> DataFrame:
        return (
            o.groupBy(file_id.alias("file_id"))
            .agg(
                F.min("o_orderdate").alias("zmin"),
                F.max("o_orderdate").alias("zmax"),
            )
            .select(F.lit(name).alias("layout"), "file_id", "zmin", "zmax")
        )

    files = layout(
        "insertion_order", F.expr(f"o_orderkey div {_ZM_ROWS_PER_FILE}")
    ).unionAll(
        layout(
            "date_partitioned",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long"),
        )
    )
    pruned = F.when((F.col("zmax") < lo) | (F.col("zmin") >= hi), 1).otherwise(0)
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(pruned).cast("long").alias("n_pruned"),
            F.round(
                F.sum(pruned).cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pruned"),
        )
        .orderBy("layout")
    )
