"""DataFrame-API breadth: stat helpers (crosstab, approx_top_k,
DataSketches HLL), LIMIT/OFFSET pagination, and schema-evolving
unionByName.

The reference reaches these needs through pandas (SURVEY.md §3.3 —
driver-side crosstabs and concat); here they are distributed plans.
Everything oracle-paired below is *exactly* reproducible: crosstab is a
pivoted count, approx_top_k tracks more slots (default 10k) than the
column has distinct values so its counts are exact, and pagination
names a total order before LIMIT/OFFSET.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .relational import _register

# ---------------------------------------------------------------------------
# df.stat.crosstab — pivoted contingency table.
# ---------------------------------------------------------------------------


@_register(
    "crosstab_status_priority",
    """
    SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
           SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS "1-URGENT",
           SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS "2-HIGH",
           SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS "3-MEDIUM",
           SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)::BIGINT
             AS "4-NOT SPECIFIED",
           SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table order-status x order-priority via
    ``df.stat.crosstab`` — compiles to one grouped count + pivot
    (single shuffle); the column-per-value layout is the distributed
    twin of the reference's pandas crosstabs."""
    orders = load(spark, sf_dir, "orders")
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    return ct.select(
        "o_orderstatus_o_orderpriority",
        *[F.col(f"`{c}`").alias(c) for c in sorted(ct.columns[1:])],
    )


# ---------------------------------------------------------------------------
# approx_top_k — heavy-hitter sketch (exact here: slots >> distinct values).
# ---------------------------------------------------------------------------


@_register(
    "approx_top_k_priorities",
    """
    SELECT o_orderpriority AS item, COUNT(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def approx_top_k_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via ``approx_top_k`` (Spark 4.1): a mergeable
    frequent-items sketch whose counts are exact whenever the tracked
    slot budget (default 10k) exceeds the column's distinct count — as
    with any low-cardinality dimension, so the oracle is plain GROUP BY.
    At true high cardinality the same plan degrades gracefully to
    approximate counts instead of OOMing."""
    orders = load(spark, sf_dir, "orders")
    topk = orders.select(
        F.expr("approx_top_k(o_orderpriority, 5)").alias("entries")
    )
    return topk.select(F.explode("entries").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    )


# ---------------------------------------------------------------------------
# Native DataSketches HLL — binary sketches, re-aggregated with a union.
# ---------------------------------------------------------------------------


@_register("hll_native_union_distinct")  # rows-only: estimates have no SQL twin
def hll_native_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag HLL sketches (``hll_sketch_agg``) re-aggregated into a
    global distinct estimate with ``hll_union_agg`` — the JVM-native
    twin of the python-datasketches query: partial sketches are the
    thing you persist per partition/day at 100 TB and merge on demand,
    never recounting raw rows."""
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    flags = per_flag.select(
        "l_returnflag", F.hll_sketch_estimate("sk").alias("distinct_parts")
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_parts")
    ).select(F.lit("ALL").alias("l_returnflag"), "distinct_parts")
    return flags.unionByName(merged)


# ---------------------------------------------------------------------------
# LIMIT/OFFSET pagination over a total order.
# ---------------------------------------------------------------------------


@_register(
    "pagination_orders_page3",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(o_totalprice AS DOUBLE) AS total
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def pagination_orders_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination: page 3 of the order book under a total
    order (date, then PK tiebreak).  Spark 3.4's ``offset`` pushes
    limit+offset into a single CollectLimit — fine for page-sized
    results; deep pagination at scale should switch to keyset predicates
    (WHERE (date, key) > last_seen), which this total order enables."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderdate", "o_orderkey")
        .offset(100)
        .limit(50)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# unionByName with missing columns — schema-evolving append.
# ---------------------------------------------------------------------------


@_register(
    "union_by_name_evolved_schema",
    """
    SELECT * FROM (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total, 1 AS half
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
      UNION ALL BY NAME
      SELECT o_orderkey, CAST(NULL AS INTEGER) AS half
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    """,
)
def union_by_name_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Appending an old extract to a newer, wider one:
    ``unionByName(allowMissingColumns=True)`` aligns by column NAME and
    null-fills what the old half lacks — the batch twin of mergeSchema
    file evolution, and position-safe where ``union`` silently is not."""
    orders = load(spark, sf_dir, "orders")
    h1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total"),
        F.lit(1).alias("half"),
    )
    h2 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", F.lit(None).cast("int").alias("half"))
    return h1.unionByName(h2, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# applyInArrow grouped map — exact extrema per group, zero-copy batches.
# ---------------------------------------------------------------------------


@_register(
    "arrow_grouped_extrema_status",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_v,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_v
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def arrow_grouped_extrema_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order-price extrema via an ``applyInArrow`` grouped
    map (pyarrow.compute, no pandas materialization).  min/max/count
    have no floating accumulation, so the Arrow path is exact and
    differential-tested against the SQL aggregate — proving the custom-
    operator escape hatch preserves engine semantics."""
    from ..operators.grouped_map import group_extrema_arrow

    orders = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    return group_extrema_arrow(orders, "o_orderstatus", "o_totalprice")


@_register(
    "approx_top_k_by_status",
    """
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority AS item, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, item, cnt, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY cnt DESC, item) AS rnk
        FROM counts
    )
    WHERE rnk <= 5
    """,
)
def approx_top_k_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP heavy hitters: one ``approx_top_k`` sketch per order
    status, merged map-side like any aggregate — the per-segment
    frequent-items report (top URLs per domain, top tokens per language)
    that at true cardinality replaces a full (group, item) contingency
    shuffle with bounded sketch state per group.  k covers the whole
    priority domain here, so counts are exact and the oracle is a plain
    two-level GROUP BY; the sketch's internal output order is
    engine-specific, so rows re-rank deterministically (count desc,
    item) before comparison."""
    orders = load(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderstatus").agg(
        F.expr("approx_top_k(o_orderpriority, 5)").alias("entries")
    )
    exploded = per_group.select(
        "o_orderstatus", F.explode("entries").alias("e")
    ).select(
        "o_orderstatus",
        F.col("e.item").alias("item"),
        F.col("e.count").alias("cnt"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("cnt").desc(), "item")
    return exploded.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 5
    )
