"""Extended TPC-H query-shape suite — all 22 classic shapes.

The reference's single Catalyst query (airflow.py:654-660) is a
join+count+top-5; ``relational.py`` already carries Q1/Q3-shaped twins
and ``modern_sql.py`` Q13/Q18.  This module rounds out the remaining 18
decision-support shapes the 100 TB engine must execute well — multi-way
star joins, conditional aggregation over joins, correlated scalar
subqueries (Q2/Q11/Q15/Q17), EXISTS/NOT-EXISTS semi/anti pairs
(Q4/Q21/Q22), nested-IN chains (Q20), and blacklist NOT-IN reports
(Q16) — so the full TPC-H 22 runs end to end against the DuckDB oracle.

Shapes are **adapted** to the driver's test schema: there is no
``partsupp`` table and no ship-mode / commit-date / phone columns, so
Q9's cost uses retail price, Q12 classifies on ``o_orderpriority``, and
Q22 keys on nation instead of phone country code.  The *plan* shapes —
what Catalyst must do well — are preserved.

Scale notes (see SCALE.md):

* Every dimension filter is applied **below** the join and the filtered
  dimension is broadcast — at 100 TB the fact table never shuffles for
  a dimension lookup.
* Q15/Q17/Q22 scalar thresholds are 1-row aggregate DataFrames joined
  by broadcast — never ``collect()`` into the driver.
* All money aggregates run in exact DECIMAL and cast to double at the
  edge (partition-order independent, per tests/parity.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .relational import _dec, _register

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _disc_price() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q5 — local-supplier volume: 6-way star join, customer and supplier in the
# SAME nation, revenue per nation for one order year.
# ---------------------------------------------------------------------------


@_register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape.  The region->nation chain collapses to a tiny
    broadcast dim; the only big-big join is lineitem|><|orders, both
    pre-filtered.  The c_nationkey = s_nationkey equality is applied as
    a post-join filter exactly as the spec writes it."""
    nation_in_region = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    joined = (
        load(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(load(spark, sf_dir, "customer")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "supplier")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation_in_region), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: single-scan filter + global aggregate.
# ---------------------------------------------------------------------------


@_register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the whole query is a parquet scan with three
    pushed predicates and a map-side partial aggregate — zero shuffles
    beyond the final 1-row combine.  The COUNT(*) companion makes the
    empty-vs-nonempty selectivity visible to the oracle."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("qualifying_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and ship year.
# ---------------------------------------------------------------------------


@_register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             {_DISC_PRICE_SQL} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape.  The OR-of-two-directions predicate cannot be
    pushed to either nation dim alone, so each side is pre-filtered to
    the two-nation union (tiny broadcast) and the pair condition is the
    join-output filter — Catalyst evaluates it before the aggregate."""
    nations = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    joined = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: share-of-total inside a grouped aggregate.
# ---------------------------------------------------------------------------


@_register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             {_DISC_PRICE_SQL} AS volume,
             n2.n_name AS nation
      FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: nested conditional-sum / total-sum ratio per
    year.  Both sums come out of ONE grouped aggregate (single shuffle);
    the ratio is computed on the 1-row-per-year result in double on both
    engines so the division is bit-identical."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust_region = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    joined = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _disc_price()
    per_year = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero))
        .cast("double")
        .alias("nation_vol"),
        F.sum(vol).cast("double").alias("total_vol"),
    )
    return per_year.select(
        "o_year", (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: cost = 0.5 * retail price, the test
# schema has no partsupp/ps_supplycost).
# ---------------------------------------------------------------------------


@_register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(4,2)))
             - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,2)) *
               CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order year over a
    5-way join with a LIKE part filter.  Revenue and cost stay in exact
    DECIMAL through the subtraction; only the final sum is cast."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp_nation = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = _disc_price() - (
        F.lit(0.5).cast("decimal(2,1)")
        * _dec("p_retailprice")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    joined = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(load(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.select(
            "nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount")
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by lost revenue.
# ---------------------------------------------------------------------------


@_register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Quarter + returnflag filters are pushed to the two fact scans; the
    grouped aggregate keys on the customer PK (name/nation/acctbal ride
    along functionally); top-20 is TakeOrderedAndProject with the PK as
    tiebreak."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust_nation = load(spark, sf_dir, "customer").join(
        F.broadcast(load(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust_nation), F.col("c_custkey") == F.col("o_custkey")
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )
    return (
        agg.select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 (adapted) — priority-class shipping: conditional agg over a join,
# classified on o_orderpriority (the schema has no ship mode).
# ---------------------------------------------------------------------------


@_register(
    "q12_priority_shipping",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAYS
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment lines (shipped >= 60 days after
    the order date) split into high/low priority counts per return flag.
    The cross-column predicate l_shipdate >= o_orderdate + 60d can only
    run post-join; the year window still pushes into the lineitem scan."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    joined = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share: conditional-sum ratio over a part join.
# ---------------------------------------------------------------------------


@_register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                      THEN {_DISC_PRICE_SQL}
                                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO parts.
    One broadcast join, one global aggregate producing both the
    conditional and total DECIMAL sums, ratio taken in double at the
    1-row edge."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    zero = F.lit(0).cast("decimal(18,2)")
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero))
        .cast("double")
        .alias("promo"),
        F.sum(_disc_price()).cast("double").alias("total"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + MAX scalar subquery, no collect().
# ---------------------------------------------------------------------------


@_register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_DISC_PRICE_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) hitting the quarter's max revenue.
    The per-supplier aggregate is computed once; its 1-row MAX is
    broadcast back as a join (equality on exact DECIMAL, so ties are
    kept exactly like the spec) — the driver never sees the threshold."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    top = rev.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-part average.
# ---------------------------------------------------------------------------


@_register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is under 20% of their
    part's average.  The correlated scalar subquery decorrelates to a
    per-part AVG joined back on partkey (one extra aggregate, no
    per-row re-scan).  Quantities are integral doubles, so AVG is exact
    and the 0.2* threshold compares identically on both engines."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return joined.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q22 (adapted) — inactive high-balance customers per nation: scalar AVG
# threshold + NOT EXISTS anti-join (nation stands in for phone country code;
# "inactive" = no URGENT orders, since every test customer has orders).
# ---------------------------------------------------------------------------


@_register(
    "q22_inactive_high_balance",
    """
    SELECT n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY n_name
    """,
)
def q22_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no urgent orders, rolled up by nation.  The global-average
    threshold is a 1-row broadcast (sum in exact DECIMAL, divided by
    the count in double so both engines agree bit-exactly); the NOT
    EXISTS is a left-anti join against the pre-filtered orders keys."""
    cust = load(spark, sf_dir, "customer")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    urgent_custs = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(threshold)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    inactive = rich.join(
        urgent_custs, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        inactive.join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 (adapted) — disjunction of conjunctive band predicates: the classic
# OR-of-ANDs pushdown shape (brand/size bands stand in for brand/container).
# ---------------------------------------------------------------------------


@_register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three conjunctive bands spanning both
    join sides.  Catalyst factors the per-side disjunctions out of the
    OR (CNF conversion): part rows not matching ANY brand/size band and
    lineitem rows outside the quantity hull are dropped BEFORE the join,
    and only the residual mixed-side predicate runs after it."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(band).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q11 (adapted) — share-threshold report: parts whose revenue exceeds a
# fixed fraction of the total (scalar-subquery HAVING).
# ---------------------------------------------------------------------------


@_register(
    "q11_important_parts",
    f"""
    WITH part_rev AS (
        SELECT l_partkey, SUM({_DISC_PRICE_SQL}) AS rev
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue
    FROM part_rev
    WHERE CAST(rev AS DOUBLE) > (
        SELECT CAST(SUM(rev) AS DOUBLE) * 0.001 FROM part_rev
    )
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose aggregate exceeds a fraction
    of the grand total (the scalar subquery over the SAME aggregate).
    The per-part aggregate is computed once; its grand total re-
    aggregates the small grouped result (never the raw table) and comes
    back as a 1-row broadcast threshold.  The share comparison runs in
    double on both engines (exact DECIMAL sums cast at the edge)."""
    li = load(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev"))
    total = part_rev.agg(
        (F.sum("rev").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        part_rev.join(F.broadcast(total))
        .filter(F.col("rev").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("rev").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q2 (adapted) — minimum-cost supplier: correlated MIN subquery per part.
# No partsupp table in the driver schema, so the supply relation derives
# from lineitem: cost(part, supplier) = MIN(l_extendedprice) among that
# supplier's lines for the part (exact DECIMAL; no division, so both
# engines agree bit-for-bit).
# ---------------------------------------------------------------------------


@_register(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY 1, 2
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey,
           CAST(cost AS DOUBLE) AS cost
    FROM part, costs, supplier, nation, region
    WHERE p_partkey = partkey AND s_suppkey = suppkey
      AND p_size = 15 AND p_type = 'PROMO'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND cost = (
          SELECT MIN(c2.cost)
          FROM costs c2, supplier s2, nation n2, region r2
          WHERE c2.partkey = p_partkey AND s2.s_suppkey = c2.suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region achieving the minimum supply cost — the classic correlated
    scalar-MIN subquery.  Decorrelated the way Catalyst (and every
    planner since Starburst) does it: aggregate the per-(part, supplier)
    cost relation once, re-aggregate it per part for the regional MIN,
    and equi-join the two — the correlation becomes a join key, never a
    per-row re-scan.  Supplier/nation/region collapse to one broadcast
    dim; the only fact-sized shuffle is the cost groupBy."""
    from ..operators.topk import top_k

    region_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
        .join(F.broadcast(region_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    parts = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    costs_q = costs.join(
        F.broadcast(parts.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    min_cost = costs_q.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    winners = costs_q.join(
        min_cost,
        (F.col("p_partkey") == F.col("mk")) & (F.col("cost") == F.col("min_cost")),
    ).select(
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        F.col("cost").cast("double").alias("cost"),
    )
    return top_k(
        winners, [F.desc("s_acctbal"), F.col("p_partkey"), F.col("s_name")], 100
    )


# ---------------------------------------------------------------------------
# Q4 (adapted) — order priority checking: EXISTS semi-join with a cross-
# relation lateness predicate.  No commit/receipt dates in the driver
# schema, so "late" is l_shipdate more than 60 days after o_orderdate.
# ---------------------------------------------------------------------------


@_register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority where at least one line
    shipped late.  The EXISTS plans as a LEFT SEMI join — each order
    emits at most once no matter how many late lines it has, and the
    mixed-side predicate (l_shipdate vs o_orderdate) rides on the join
    condition so Spark evaluates it during the hash probe, never as a
    post-join filter over the multiplied rows."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted) — parts/supplier relationship: distinct-supplier counts per
# (brand, type, size) with a NOT-IN supplier blacklist.  No supplier
# comments in the driver schema, so the "complaints" exclusion is the
# low-balance book (s_acctbal < 1000).
# ---------------------------------------------------------------------------


@_register(
    "q16_parts_supplier_relationship",
    """
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM ps, part
    WHERE p_partkey = partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can serve each
    (brand, type, size) bucket, excluding a blacklist.  NOT IN over a
    non-nullable key is exactly a LEFT ANTI join (the null-trap doesn't
    apply; s_suppkey is a PK on both sides), and the blacklist is a
    broadcast.  The part↔supplier relation is the deduplicated
    (l_partkey, l_suppkey) projection — at 100 TB that distinct is the
    one fact shuffle, and the count-distinct re-shuffles only the
    already-deduplicated pairs."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    blacklist = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    return (
        ps.join(F.broadcast(blacklist), ps.suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 (adapted) — potential part promotion: nested-IN chain with a share
# threshold.  No partsupp availqty, so "excess stock" is: this supplier
# shipped more than 30% of the part's total 1996 volume.
# ---------------------------------------------------------------------------


@_register(
    "q20_potential_promotion",
    """
    WITH shipped AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ), part_total AS (
        SELECT partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1
    )
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT suppkey
        FROM shipped
        JOIN part_total pt ON shipped.partkey = pt.partkey
        JOIN part ON p_partkey = shipped.partkey
        WHERE p_name LIKE 'large%'
          AND CAST(qty AS DOUBLE) > 0.3 * CAST(total_qty AS DOUBLE)
    )
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested-IN chain (suppliers -> qualifying
    (part, supplier) volumes -> name-filtered parts) with a per-part
    share threshold.  Both aggregation levels reuse ONE scan: the
    per-part total re-aggregates the (part, supplier) rollup, never the
    raw table, and joins back on the part key — the same
    aggregate-then-rejoin decorrelation as Q2/Q11.  The final IN is a
    LEFT SEMI join on the distinct supplier set."""
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    part_total = shipped.groupBy(F.col("partkey").alias("tk")).agg(
        F.sum("qty").alias("total_qty")
    )
    big_share = (
        shipped.join(part_total, F.col("partkey") == F.col("tk"))
        .join(
            F.broadcast(
                load(spark, sf_dir, "part")
                .filter(F.col("p_name").like("large%"))
                .select("p_partkey")
            ),
            F.col("partkey") == F.col("p_partkey"),
        )
        .filter(
            F.col("qty").cast("double") > F.lit(0.3) * F.col("total_qty").cast("double")
        )
        .select("suppkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(big_share, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 (adapted) — suppliers who kept orders waiting: the semi + anti join
# pair over the same fact.  "Late" is l_shipdate more than 60 days after
# o_orderdate (no commit/receipt dates in the driver schema).
# ---------------------------------------------------------------------------


@_register(
    "q21_suppliers_kept_waiting",
    """
    WITH ll AS (
        SELECT l_orderkey, l_suppkey,
               (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late,
               o_orderstatus
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM ll
          WHERE is_late AND o_orderstatus = 'F') l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM ll l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM ll l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order — the canonical EXISTS + NOT EXISTS
    pair, planned as a LEFT SEMI then LEFT ANTI join on the order key
    with a supplier-inequality residual.  The lateness flag needs
    o_orderdate, so lines and orders join ONCE into a slim
    (orderkey, suppkey, is_late) relation that all three legs reuse;
    each leg is a distinct projection of it, so at 100 TB the semi/anti
    probes carry two ints and a boolean, not the fact row.  One
    (orderkey, suppkey) dedup before counting keeps multi-line supplier
    participations from inflating numwait."""
    from ..operators.topk import top_k

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    ll = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
            "o_orderstatus",
        )
    )
    l1 = (
        ll.filter(F.col("is_late") & (F.col("o_orderstatus") == "F"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = ll.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = ll.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = l1.join(
        others,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    counted = (
        sole_late.join(
            F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return top_k(counted, [F.desc("numwait"), F.col("s_name")], 100)
