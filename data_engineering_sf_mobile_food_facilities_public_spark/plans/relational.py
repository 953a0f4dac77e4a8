"""Oracle-paired relational query suite (SURVEY.md section 2 -> TPC-H-ish
test tables, role mapping per FIXTURES.md section B).

Every entry exists twice: a Spark implementation in ``QUERIES`` and an
ANSI-SQL equivalent in ``ORACLE_SQL`` that DuckDB runs on the same parquet
files.  The driver hash-compares the two (row count + schema + order-
insensitive value hash), so the pairs follow strict output conventions:

- every computed column is aliased identically on both sides;
- outputs use only int/long/double/string columns — timestamps are
  rendered ``yyyy-MM-dd [HH:mm:ss]`` strings, and double *aggregates* are
  computed in exact DECIMAL arithmetic and cast to double at the edge so
  both engines produce bit-identical values regardless of summation order
  (a raw double SUM is order-dependent and would flap the hash);
- any LIMIT is preceded by a total order with a unique tiebreak column.

Reference citations (``/root/reference/airflow.py``) are on each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.dates import normalize_date
from ..operators import (
    check_fk_orphans,
    check_unique_violations,
    dedup_first,
    distinct_pairs,
    join_small_dim,
    replicate_rows,
    surrogate_key,
    top_k,
    window_count,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _dec(col: str, prec: int = 18, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


# ---------------------------------------------------------------------------
# Flagship — the reference's only Catalyst query (J4+A7+O2, airflow.py:654-660):
# LEFT JOIN + COUNT per group + top-5.  Translated per FIXTURES.md B:
# top-5 customers by order count.
# ---------------------------------------------------------------------------


@_register(
    "flagship_top5_customers_by_order_count",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS order_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY order_count DESC, c.c_custkey
    LIMIT 5
    """,
)
def flagship_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ``query1`` (airflow.py:654-660): LEFT JOIN preserves
    entities with zero activity and ``COUNT(col)`` skips the manufactured
    nulls, so they count 0.

    Scale shape: pre-aggregate the fact side *before* joining the
    dimension — the shuffle then carries one row per customer key instead
    of one per order, and the post-agg join is broadcastable.  The final
    top-5 is TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    order_counts = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("order_count")
    )
    return top_k(
        customer.join(
            order_counts, customer.c_custkey == order_counts.o_custkey, "left"
        ).select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("order_count"), F.lit(0)).cast("long").alias("order_count"),
        ),
        [F.desc("order_count"), F.col("c_custkey")],
        5,
    )


# ---------------------------------------------------------------------------
# P1-P3: projection + predicates (airflow.py:174,196)
# ---------------------------------------------------------------------------


@_register(
    "projection_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate IS NOT NULL
    """,
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection (P1) + predicates incl. IS NOT NULL (P3).
    Both the filter and the 4-column projection reach the parquet scan
    (PushedFilters / ReadSchema) — verified in tests via explain()."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# J1: full-outer equi-join on a composite key (airflow.py:188-201)
# ---------------------------------------------------------------------------


@_register(
    "full_outer_join_composite",
    """
    SELECT COALESCE(a.l_orderkey, b.l_orderkey) AS l_orderkey,
           COALESCE(a.l_partkey, b.l_partkey)  AS l_partkey,
           a.qty1, b.qty2
    FROM (SELECT l_orderkey, l_partkey, l_quantity AS qty1
          FROM lineitem WHERE l_linenumber = 1) a
    FULL OUTER JOIN
         (SELECT l_orderkey, l_partkey, l_quantity AS qty2
          FROM lineitem WHERE l_linenumber = 2) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey
    """,
)
def full_outer_join_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: schedule-side full-outer permit-side ON (permit, cnn)
    (airflow.py:193).  Stand-in: line 1 vs line 2 of each order keyed on
    (l_orderkey, l_partkey).  Passing the key as a name list makes Spark
    coalesce the key columns exactly like the SQL COALESCE."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_partkey", F.col("l_quantity").alias("qty1")
    )
    b = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey", "l_partkey", F.col("l_quantity").alias("qty2")
    )
    return a.join(b, ["l_orderkey", "l_partkey"], "full_outer")


# ---------------------------------------------------------------------------
# J2: inner equi-join (airflow.py:208)
# ---------------------------------------------------------------------------


@_register(
    "inner_join_orders_customer",
    """
    SELECT o.o_orderkey, c.c_name, o.o_orderstatus
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def inner_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: single-key inner join; small dimension side -> AQE broadcasts."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_name", "o_orderstatus")


# ---------------------------------------------------------------------------
# J3: left join with differing key names, sparse match (airflow.py:242)
# ---------------------------------------------------------------------------


@_register(
    "left_join_sparse_dim",
    """
    SELECT c.c_custkey, c.c_name, s.s_name
    FROM customer c
    LEFT JOIN (SELECT * FROM supplier WHERE s_suppkey <= 5) s
    ON c.c_nationkey = s.s_nationkey
    """,
)
def left_join_sparse_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: schedule left-join tiny yelp ON applicant = Name — differing key
    names, most rows unmatched (report.pdf p.11: 2 hits).  Stand-in: tiny
    supplier subset joined on nationkey; explicit broadcast hint."""
    customer = load(spark, sf_dir, "customer")
    dim = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 5)
    return join_small_dim(
        customer, dim, customer.c_nationkey == dim.s_nationkey, "left"
    ).select("c_custkey", "c_name", "s_name")


# ---------------------------------------------------------------------------
# A1-A3: deterministic keep-first dedup (airflow.py:175,195,209,252)
# ---------------------------------------------------------------------------


@_register(
    "dedup_first_per_order",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
    """,
)
def dedup_first_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: sort_values().drop_duplicates() == deterministic min-per-group.
    (pandas keep='first' depends on frame order; the engine names the
    tiebreak explicitly — SURVEY.md section 4.3.1.)  The order_by is a
    *total* order within each group — (l_orderkey, l_linenumber) alone is
    not unique in the test data, and a partial order would make the winner
    engine-dependent."""
    return dedup_first(
        load(spark, sf_dir, "lineitem"),
        ["l_orderkey"],
        ["l_linenumber", "l_partkey", "l_suppkey"],
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


# ---------------------------------------------------------------------------
# A4/A5: distinct (airflow.py:87-90,244)
# ---------------------------------------------------------------------------


@_register(
    "distinct_pairs",
    "SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
)
def distinct_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct (applicant, location) pairs -> (custkey, status)."""
    return distinct_pairs(load(spark, sf_dir, "orders"), ["o_custkey", "o_orderstatus"])


# ---------------------------------------------------------------------------
# A6: window count (airflow.py:251)
# ---------------------------------------------------------------------------


@_register(
    "window_count_per_customer",
    """
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey) AS orders_per_customer
    FROM orders
    """,
)
def window_count_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-row group size — the reference's one true window function."""
    return window_count(
        load(spark, sf_dir, "orders"), ["o_custkey"], "orders_per_customer"
    ).select("o_orderkey", "o_custkey", "orders_per_customer")


# ---------------------------------------------------------------------------
# A9: distinct count (airflow.py:52, latent countDistinct import)
# ---------------------------------------------------------------------------


@_register(
    "count_distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS row_count
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def count_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: exact distinct-count (Spark expands to a two-phase partial
    aggregate).  At 100 TB prefer approx_count_distinct (HLL, one pass) —
    exposed as a non-oracle variant below."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count(F.lit(1)).alias("row_count"),
        )
    )


@_register("approx_count_distinct_parts")  # no SQL oracle: approximate result
def approx_count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count — the 100 TB-scale path for A9 (single pass,
    constant memory).  Rows-only check: approximation differs from DuckDB's."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_distinct_parts"))
    )


# ---------------------------------------------------------------------------
# F1: date normalization (airflow.py:215-216)
# ---------------------------------------------------------------------------


@_register(
    "date_normalize",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: to_datetime().strftime('%Y-%m-%d') == date_format at the edge."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", normalize_date("o_orderdate").alias("order_date_str")
    )


# ---------------------------------------------------------------------------
# F3: string concat (airflow.py:98)
# ---------------------------------------------------------------------------


@_register(
    "string_concat",
    """
    SELECT c_custkey, c_name || ' - ' || c_mktsegment AS label
    FROM customer
    """,
)
def string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: location + 'San Francisco' -> name + segment label."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" - "), F.col("c_mktsegment")).alias("label"),
    )


# ---------------------------------------------------------------------------
# F2: numeric round (airflow.py:197-200, latent)
# ---------------------------------------------------------------------------


@_register(
    "round_prices",
    """
    SELECT o_orderkey, CAST(ROUND(o_totalprice, 0) AS BIGINT) AS price_rounded
    FROM orders
    """,
)
def round_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: round(lat, 6) analog; integerized so both engines agree bit-wise."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 0).cast("long").alias("price_rounded"),
    )


# ---------------------------------------------------------------------------
# F4: contiguous surrogate key (airflow.py:158-160)
# ---------------------------------------------------------------------------


@_register(
    "surrogate_key_orders",
    """
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS surrogate_id
    FROM orders
    """,
)
def surrogate_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: schedule_id = range(0, n).  Distributed contiguous ids via
    range-partition + per-partition offsets (no single-partition window) —
    see operators.windows.surrogate_key."""
    return surrogate_key(
        load(spark, sf_dir, "orders").select("o_orderkey"), ["o_orderkey"]
    ).select("o_orderkey", "surrogate_id")


# ---------------------------------------------------------------------------
# F5: row replication (airflow.py:166-170)
# ---------------------------------------------------------------------------


@_register(
    "replicate_rows_x2",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s CROSS JOIN (VALUES (0), (1)) copies(i)
    """,
)
def replicate_rows_x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: np.repeat(values, 2) — the permit_ml staging table."""
    return replicate_rows(load(spark, sf_dir, "supplier"), 2).select(
        "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# F7/S4: JSON path extraction (airflow.py:111-119)
# ---------------------------------------------------------------------------


@_register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: nested JSON field access (yelp flatten) on events.props."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


# ---------------------------------------------------------------------------
# Constraint checks (Postgres PK/FK, airflow.py:330-432 -> SURVEY.md 1.2)
# ---------------------------------------------------------------------------


@_register(
    "pk_violations_lineitem_orderkey",
    """
    SELECT l_orderkey, COUNT(*) AS row_count
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
    """,
)
def pk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness check surfacing violations (l_orderkey alone is NOT a key
    of lineitem, so this is intentionally non-empty)."""
    return check_unique_violations(load(spark, sf_dir, "lineitem"), ["l_orderkey"])


@_register(
    "fk_orphans_lineitem_supplier",
    """
    SELECT DISTINCT l.l_suppkey
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_suppkey <= 5)
    """,
)
def fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity check via left-anti join; parent restricted to
    s_suppkey <= 5 so orphans exist and the check path is exercised."""
    child = load(spark, sf_dir, "lineitem")
    parent = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 5)
    return check_fk_orphans(child, parent, ["l_suppkey"], ["s_suppkey"])


# ---------------------------------------------------------------------------
# Aggregation suite: TPC-H-style pricing summary (exact-decimal arithmetic)
# ---------------------------------------------------------------------------


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregate (generalizes A7).  Sums run in
    DECIMAL so the result is independent of partition/summation order —
    map-side partial agg + 6-group final agg; the scan reads only the 6
    referenced columns."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-table join + grouped revenue + top-k.  The
    customer filter is applied before the join (pushdown) and the filtered
    dimension is broadcast; revenue in exact DECIMAL, top-10 tie-broken on
    o_orderkey via TakeOrderedAndProject."""
    cutoff = "1998-01-01"
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    ).cast("double")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        l, l.l_orderkey == o.o_orderkey
    )
    return top_k(
        joined.groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            "o_orderkey",
            normalize_date("o_orderdate").alias("order_date_str"),
            "revenue",
        ),
        [F.desc("revenue"), F.col("o_orderkey")],
        10,
    )
