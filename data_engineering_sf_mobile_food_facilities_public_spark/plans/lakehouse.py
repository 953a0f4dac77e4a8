"""Oracle-paired lakehouse / incremental-pipeline queries: MERGE upsert,
SCD2 history compaction, and funnel conversion.

The reference's only load strategy is truncate-and-reload
(``/root/reference/airflow.py:330-432``); these queries supply the
incremental shapes a 100 TB pipeline actually runs — newest-wins MERGE
compaction, type-2 dimension history, and sequential funnel analysis —
each as a shuffle-minimal DataFrame plan (see ``operators/merge.py`` for
the plan-shape rationale).

Conventions follow ``plans.relational``: identical aliases on both
sides, timestamps exported as epoch-microsecond BIGINTs (exact in both
engines; the events table is nanos-parquet truncated identically to
micros on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.merge import merge_upsert, scd2_compact
from .relational import _dec, _register


@_register(
    "merge_upsert_orders",
    """
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, 'N' AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 7 = 3
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM updates
    UNION ALL
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders USING updates: a derived update set exercises
    both WHEN MATCHED (every 10th key restated with status 'X' and a 10%
    price bump) and WHEN NOT MATCHED (new keys offset by 1e9).  The
    engine-side plan is union + one keyed window (operators/merge.py),
    not the oracle's anti-join formulation — same result, one shuffle.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    matched = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    inserted = orders.filter(F.col("o_orderkey") % 7 == 3).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return merge_upsert(orders, matched.unionByName(inserted), keys=["o_orderkey"])


@_register(
    "scd2_user_event_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island,
               MIN(ts) AS valid_from, MIN(rn) AS seq, COUNT(*) AS n_changes
        FROM ordered GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type,
           CAST(epoch_us(valid_from) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY seq)) AS BIGINT)
               AS valid_to_us,
           n_changes
    FROM runs
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 compaction of the event stream: one row per maximal run of a
    user's consecutive equal event_type, with [valid_from, valid_to)
    bounds (gaps-and-islands, operators/merge.py scd2_compact).  The
    interval chain orders runs by their first (ts, event_id) position
    (min row_number), so same-instant runs chain identically on every
    engine — the hostile-events corpus caught the valid_from-tie
    ambiguity this removes."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    out = scd2_compact(e, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "n_changes",
    )


@_register(
    "funnel_signup_to_purchase",
    """
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT s.user_id,
           CAST(epoch_us(s.signup_ts) AS BIGINT) AS signup_us,
           CAST(epoch_us(MIN(p.ts)) AS BIGINT) AS first_purchase_us,
           CAST(MIN(p.ts) IS NOT NULL AS INT) AS converted
    FROM s
    LEFT JOIN events p
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= s.signup_ts
    GROUP BY s.user_id, s.signup_ts
    """,
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: each user's first signup and first purchase at or
    after it.  The signup side collapses to one row per user BEFORE the
    join (aggregate pushdown by construction), so the join probe side is
    tiny and broadcastable; the range predicate rides along as a join
    filter on the hash join, never a nested loop."""
    e = load(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    joined = s.join(
        p,
        (F.col("p_user_id") == F.col("user_id")) & (F.col("p_ts") >= F.col("signup_ts")),
        "left",
    )
    return joined.groupBy("user_id", "signup_ts").agg(
        F.min("p_ts").alias("first_purchase_ts")
    ).select(
        "user_id",
        F.unix_micros("signup_ts").alias("signup_us"),
        F.unix_micros("first_purchase_ts").alias("first_purchase_us"),
        F.when(F.col("first_purchase_ts").isNotNull(), 1).otherwise(0).alias("converted"),
    )


def _z_interleave_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of operators/layout.zorder_key — same bit formula."""
    terms = [
        f"((({a} >> {i}) & 1) << {2 * i}) | ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return " | ".join(f"({t})" for t in terms)


@_register(
    "zorder_key_orders",
    f"""
    SELECT o_orderkey,
           CAST({_z_interleave_sql(
               "o_custkey",
               "date_diff('day', DATE '1970-01-01', o_orderdate)",
           )} AS BIGINT) AS zkey
    FROM orders
    """,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day) — the
    write-time layout key that makes parquet min/max stats prune on
    EITHER dimension (operators/layout.py).  Pure bit arithmetic,
    bit-identical in the oracle."""
    from ..operators.layout import zorder_key

    o = load(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date"))
    return o.select(
        "o_orderkey", zorder_key(F.col("o_custkey"), day).alias("zkey")
    )


_HILBERT_BITS = 16


def _hilbert_oracle_sql(bits: int = _HILBERT_BITS) -> str:
    mask = (1 << bits) - 1
    return f"""
    WITH RECURSIVE src AS (
        SELECT o_orderkey,
               CAST(o_custkey & {mask} AS BIGINT) AS x,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                    & {mask} AS BIGINT) AS y
        FROM orders
    ),
    h(o_orderkey, x, y, d, lvl) AS (
        SELECT o_orderkey, x, y, CAST(0 AS BIGINT), {bits - 1} FROM src
        UNION ALL
        SELECT o_orderkey,
               CASE WHEN ry = 0 THEN
                    (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
                    ELSE x END,
               CASE WHEN ry = 0 THEN
                    (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
                    ELSE y END,
               d + s * s * xor(3 * rx, ry),
               lvl - 1
        FROM (
            SELECT o_orderkey, x, y, d, lvl,
                   CAST(1 AS BIGINT) << lvl AS s,
                   CASE WHEN (x & (CAST(1 AS BIGINT) << lvl)) > 0
                        THEN 1 ELSE 0 END AS rx,
                   CASE WHEN (y & (CAST(1 AS BIGINT) << lvl)) > 0
                        THEN 1 ELSE 0 END AS ry
            FROM h WHERE lvl >= 0
        )
    )
    SELECT o_orderkey, d AS hkey FROM h WHERE lvl = -1
    """


@_register("hilbert_key_orders", _hilbert_oracle_sql())
def hilbert_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (customer, order-day) — the
    locality-superior sibling of ``zorder_key_orders`` (no Morton
    seams: consecutive keys are always adjacent cells, so range scans
    touch fewer files; the layout modern lakehouses cluster by).  One
    vectorized Arrow batch of pure int64 bit arithmetic
    (operators/layout.py: hilbert_key — the 16-level rotation would
    blow codegen as a column expression); the oracle walks the same 16
    levels as a recursive CTE.  Bit-exact on both engines."""
    from ..operators.layout import hilbert_key

    o = load(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date"))
    return o.select(
        "o_orderkey", hilbert_key(F.col("o_custkey"), day).alias("hkey")
    )


@_register(
    "forget_customers_cascade",
    """
    WITH forget AS (
        SELECT c_custkey FROM customer
        WHERE substr(md5('forget' || CAST(c_custkey AS VARCHAR)), 1, 2) < '10'
    ),
    o_kept AS (
        SELECT o.o_orderkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.c_custkey = o.o_custkey)
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM customer) AS n_before,
           (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget)
               AS n_after,
           (SELECT COUNT(*) FROM forget) AS n_deleted
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM o_kept),
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM o_kept)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
             WHERE EXISTS (SELECT 1 FROM o_kept k
                           WHERE k.o_orderkey = l.l_orderkey)),
           (SELECT COUNT(*) FROM lineitem)
             - (SELECT COUNT(*) FROM lineitem l
                 WHERE EXISTS (SELECT 1 FROM o_kept k
                               WHERE k.o_orderkey = l.l_orderkey))
    """,
)
def forget_customers_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: a deterministic ~6% of customers
    (md5-prefix selection standing in for an erasure-request table)
    cascade-delete through orders and lineitem via FK anti-joins, and
    the report shows per-table before/after/deleted counts — the
    compliance artifact a deletion job must produce BEFORE rewriting
    any files.

    Scale shape: the erasure set broadcasts (requests are always tiny
    relative to facts); orders prunes with one broadcast anti-join;
    lineitem prunes with a semi-join against surviving orders — at
    100 TB that semi-join is the shuffle, and a real deletion would
    push the same predicates into a MERGE/rewrite (see
    merge_upsert_orders) rather than materialize new tables.  No fact
    table is scanned more than once per count pair."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def erased(key):  # pure row predicate: this key is in the erasure set
        return (
            F.substring(
                F.md5(F.concat(F.lit("forget"), key.cast("string"))), 1, 2
            )
            < "10"
        )

    # ONE lazy plan, no driver-side counts: each table reduces to a
    # 1-row (before, deleted) aggregate; the three rows union at the end
    def report(df, name, deleted_flag):
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_before"),
            (F.count(F.lit(1)) - F.sum(deleted_flag.cast("long"))).alias("n_after"),
            F.sum(deleted_flag.cast("long")).alias("n_deleted"),
        )

    cust = report(c, "customer", erased(F.col("c_custkey")))
    ords = report(o, "orders", erased(F.col("o_custkey")))
    # a lineitem dies iff its order's customer is erased: one join
    # carries the order's custkey to the line (orders are not
    # broadcastable at scale; the equi-join shuffles on orderkey)
    li_flagged = li.select("l_orderkey").join(
        o.select("o_orderkey", "o_custkey"),
        li.l_orderkey == o.o_orderkey,
    )
    lines = report(li_flagged, "lineitem", erased(F.col("o_custkey")))
    return cust.unionByName(ords).unionByName(lines)


@_register(
    "scd2_as_of_snapshot",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island,
               MIN(ts) AS valid_from, MIN(rn) AS seq, COUNT(*) AS n_changes
        FROM ordered GROUP BY user_id, event_type, island
    ),
    hist AS (
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (
                   PARTITION BY user_id ORDER BY seq) AS valid_to,
               n_changes
        FROM runs
    )
    SELECT user_id, event_type AS state_at_t,
           CAST(epoch_us(valid_from) AS BIGINT) AS valid_from_us,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM hist
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
    """,
)
def scd2_as_of_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal AS-OF probe over the SCD2 history: each user's state
    row valid at 2024-01-15T00:00 (half-open [valid_from, valid_to)
    interval, open current row included) — the "what did the table say
    on date X" query every slowly-changing dimension exists to answer,
    and the read-side proof that the SCD2 compaction's interval edges
    are consistent (exactly one row per user can satisfy the predicate;
    a duplicate or gap here means the history is corrupt).

    Scale shape: the same single user_id exchange as the history build
    (both row_numbers, the run aggregate and the lead window share the
    partitioning); the as-of filter is a per-row predicate on the
    result — no extra shuffle, prunable by partition at the storage
    layer when the history is written partitioned on valid_from."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_compact(e, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        hist.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state_at_t"),
            (F.unix_micros(F.col("valid_from"))).cast("long").alias("valid_from_us"),
            F.col("n_changes").cast("long").alias("n_changes"),
        )
    )


# ---------------------------------------------------------------------------
# Keyed snapshot reconciliation: classify added / removed / changed rows
# between two derived state snapshots.
# ---------------------------------------------------------------------------


@_register(
    "snapshot_diff_user_state",
    """
    WITH s1 AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        ) WHERE rn = 1
    ), s2 AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        ) WHERE rn = 1
    )
    SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'added'
                WHEN s2.user_id IS NULL THEN 'removed'
                WHEN s1.event_type IS DISTINCT FROM s2.event_type
                  OR s1.value IS DISTINCT FROM s2.value THEN 'changed'
                ELSE 'unchanged' END AS status,
           s1.event_type AS old_type, s1.value AS old_value,
           s2.event_type AS new_type, s2.value AS new_value
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    """,
)
def snapshot_diff_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table diff between two keyed state snapshots — the reconciliation
    primitive behind "what changed between yesterday's load and
    today's?" audits (the incremental counterpart of the reference's
    truncate-and-reload, /root/reference/airflow.py:330-432, where a
    bad load is only detectable by eyeballing row counts).

    Snapshots here derive from the events table itself so the query is
    self-contained: per-user last (event_type, value) over the first
    half of the corpus window vs over the second half.  The diff
    full-outer-joins the snapshots on the key and classifies each key
    as added (new in snapshot 2), removed (silent in snapshot 2),
    changed (state differs — null-safe comparison on every attribute),
    or unchanged.

    Scale shape: each snapshot's "last state per key" is an ordinary
    hash aggregate of MAX over a (ts, event_id, attrs...) struct — the
    (ts, event_id) prefix is a total order, so the lexicographic struct
    max IS the latest row, computed with map-side partial aggregation
    and one user_id exchange per side, never a per-key sorted window.
    The diff itself is a full-outer equi-join of two frames already
    hash-partitioned on the join key, so no third exchange; at 100 TB
    against STORED snapshot tables (the real deployment: today's vs
    yesterday's latest-state table) the whole diff is one
    co-partitioned join, and bucketed storage makes it shuffle-free.
    The attribute comparison is column-wise null-safe equality, O(1)
    per row regardless of attribute count."""
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )

    def last_state(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s"))
            .select(
                "user_id",
                F.col("s.event_type").alias("event_type"),
                F.col("s.value").alias("value"),
            )
        )

    s1 = last_state(e.filter(F.col("ts") < cutoff)).alias("s1")
    s2 = last_state(e.filter(F.col("ts") >= cutoff)).alias("s2")
    j = s1.join(s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer")
    changed = (~F.col("s1.event_type").eqNullSafe(F.col("s2.event_type"))) | (
        ~F.col("s1.value").eqNullSafe(F.col("s2.value"))
    )
    return j.select(
        F.coalesce(F.col("s1.user_id"), F.col("s2.user_id")).alias("user_id"),
        F.when(F.col("s1.user_id").isNull(), F.lit("added"))
        .when(F.col("s2.user_id").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.col("s1.event_type").alias("old_type"),
        F.col("s1.value").alias("old_value"),
        F.col("s2.event_type").alias("new_type"),
        F.col("s2.value").alias("new_value"),
    )


# ---------------------------------------------------------------------------
# Anti-entropy: order-insensitive, re-aggregatable content checksums.
# ---------------------------------------------------------------------------


@_register(
    "replication_checksum_orders",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(
               COALESCE(CAST(o_orderkey AS VARCHAR), '') || '|' ||
               COALESCE(CAST(o_custkey AS VARCHAR), '') || '|' ||
               COALESCE(o_orderstatus, '') || '|' ||
               COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '')), 1, 15)) AS BIGINT)) AS checksum
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def replication_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month content checksum of the orders table: XOR of a 60-bit
    md5 lane over each row's canonical rendering, plus the row count —
    the anti-entropy primitive for replica/migration verification ("do
    the two copies hold the same rows?") that a full sort-and-diff
    cannot afford at 100 TB.

    XOR is commutative, associative and self-inverse, so the checksum
    is ORDER-INSENSITIVE (no sort anywhere), computes with map-side
    partial aggregation in one pass, and RE-AGGREGATES: per-partition
    checksums stored with the data roll up to any coarser grain by
    further XOR, and a divergent replica localizes to the exact
    partition whose (n_rows, checksum) differs — then to the rows, by
    re-walking only that partition.  The count guards the XOR's one
    blind spot (a row duplicated an even number of times cancels out).
    Keyed columns render canonically (ints, strings, dates as
    yyyy-MM-dd) so the hash is engine-portable; doubles are excluded
    by design — checksum the DECIMAL rendering at a declared scale
    instead when money columns must participate."""
    o = load(spark, sf_dir, "orders")
    # explicit NULL canonicalization (COALESCE to '') on BOTH sides:
    # concat_ws would SKIP a null (shifting separators) while SQL ||
    # would PROPAGATE it (dropping the row from the XOR) — either way a
    # silent cross-engine or null-content blind spot
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("")),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit("")),
        F.coalesce(F.col("o_orderstatus"), F.lit("")),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("")),
    )
    lane = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(lane).alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance with retractions (signed deltas).
# ---------------------------------------------------------------------------


@_register(
    "incremental_agg_retractions",
    """
    WITH merged AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) + 10.00 AS p
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders WHERE o_orderkey % 10 <> 0
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders WHERE o_orderkey % 7 = 3
    )
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(p) AS DOUBLE) AS total
    FROM merged GROUP BY o_custkey
    """,
)
def incremental_agg_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a per-customer (count, revenue)
    aggregate under a delta batch containing UPDATES — the retraction
    algebra append-only incremental pipelines can't express: an update
    arrives as a signed pair (-1 x old row, +1 x new row), a delete as
    a bare -1.  Using :func:`merge_upsert_orders`'s delta definition
    (keys %10 updated — here restated +10.00, exact in DECIMAL, where
    the 1.1x form sits on half-cent boundaries that double->decimal
    casts round differently across engines — keys %7=3 inserted), the
    maintained result must equal a full recompute over the merged
    table — which is exactly what the oracle runs, so the driver hash
    match proves the retraction algebra.

    Shape: signed contribution rows (sign, sign*price) union base
    rows, ONE hash aggregate per side (map-side combined; COUNT and
    DECIMAL SUM are both abelian-group aggregates, so retractions are
    just negative contributions), then a full-outer join of base
    partials with delta partials and coalesced addition.  At 100 TB
    the base partials are the STORED materialized view — maintenance
    cost scales with the DELTA, never re-reading the base fact; groups
    whose count retracts to zero drop out (and the count guard is why
    MIN/MAX — non-group aggregates — need a different, re-scan or
    heap-per-key, maintenance strategy)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    price = _dec("o_totalprice")
    upd = o.filter(F.col("o_orderkey") % 10 == 0)
    ins = o.filter(F.col("o_orderkey") % 7 == 3)

    base_partials = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n0"), F.sum(price).alias("s0")
    )
    new_price = price + F.lit(10).cast("decimal(18,2)")
    delta = (
        upd.select("o_custkey", F.lit(-1).alias("sign"), (-price).alias("p"))
        .unionAll(
            upd.select("o_custkey", F.lit(1).alias("sign"), new_price.alias("p"))
        )
        .unionAll(ins.select("o_custkey", F.lit(1).alias("sign"), price.alias("p")))
    )
    delta_partials = delta.groupBy("o_custkey").agg(
        F.sum("sign").alias("dn"), F.sum("p").alias("ds")
    )
    combined = base_partials.join(delta_partials, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce(F.col("s0"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,2)"))
        ).alias("total"),
    )
    return combined.filter(F.col("n_orders") > 0).select(
        "o_custkey", "n_orders", F.col("total").cast("double").alias("total")
    )


@_register(
    "max_maintenance_under_deletes",
    """
    SELECT o_custkey,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders
    WHERE o_orderkey % 10 <> 0
    GROUP BY o_custkey
    """,
)
def max_maintenance_under_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintaining a per-group MAX under DELETES — the aggregate
    :func:`incremental_agg_retractions` explains it cannot handle with
    signed contributions (MAX is not a group: there is no inverse).
    The standard strategy: store the top-K runner-ups with the view
    (K=2 here), answer from the survivors among them, and RECOMPUTE
    ONLY the groups whose entire stored top-K was deleted.

    Delta: orders with o_orderkey %10 == 0 are deleted; the oracle is
    the plain recompute over surviving rows, so the driver hash match
    proves the maintenance algebra, including the fallback branch and
    the disappearance of fully-deleted groups.

    Shape: the stored view is a per-group top-2 of (price, pk) — a
    window row_number over the group key, the same exchange the
    group-by uses.  Maintenance joins the (small) delete-key set onto
    that top-2 relation (cost scales with K x groups, not facts);
    groups with a surviving top-2 entry answer instantly (their max
    survivor bounds all non-top-2 rows by construction).  Only the
    groups whose BOTH entries died semi-join back into the fact scan —
    the re-scan cost scales with AFFECTED groups, the expected-rare
    case, not the table."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _dec("o_totalprice").alias("p")
    )
    deletes = o.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey")

    w = Window.partitionBy("o_custkey").orderBy(F.desc("p"), "o_orderkey")
    top2 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "p")
    )
    flagged = top2.join(
        deletes.withColumn("__del", F.lit(1)), "o_orderkey", "left"
    )
    survivors = flagged.filter(F.col("__del").isNull())
    fast = survivors.groupBy("o_custkey").agg(F.max("p").alias("max_price"))
    # groups whose stored top-2 was wiped out entirely: recompute scope
    dead = (
        flagged.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"), F.count("__del").alias("kd"))
        .filter(F.col("k") == F.col("kd"))
        .select("o_custkey")
    )
    refetch = (
        o.join(deletes, "o_orderkey", "left_anti")
        .join(F.broadcast(dead), "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(F.max("p").alias("max_price"))
    )
    return fast.unionAll(refetch).select(
        "o_custkey", F.col("max_price").cast("double").alias("max_price")
    )


# ---------------------------------------------------------------------------
# Rendezvous-hash shard placement — stable distribution layout.
# ---------------------------------------------------------------------------

_RV_SHARDS = [f"shard-{i}" for i in range(8)]
_RV_VALUES = ", ".join(f"('{s}')" for s in _RV_SHARDS)


@_register(
    "rendezvous_shard_counts",
    f"""
    WITH shards AS (SELECT * FROM (VALUES {_RV_VALUES}) t(shard)),
    w AS (
        SELECT d.doc_id, s.shard,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || s.shard), 1, 8)) AS BIGINT) AS w
        FROM documents d CROSS JOIN shards s
    ),
    a AS (
        SELECT doc_id, shard FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY w DESC, shard DESC) AS rn
            FROM w
        ) WHERE rn = 1
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM a GROUP BY shard
    """,
)
def rendezvous_shard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard document counts under rendezvous (highest-random-
    weight) placement over 8 shards (``operators/layout.py``) — the
    stable-assignment layout for elastic ingestion fleets: removing a
    shard moves ONLY its own keys, adding one steals ~1/n
    (property-pinned in ``tests/test_skew_and_bucketing.py``).

    Scale shape: assignment is |shards| md5s + one array_max per row,
    all codegen'd at the scan with NO shuffle; only the per-shard
    rollup shuffles (8 groups).  The oracle computes the identical
    md5-lane weights and mirrors struct-max ordering as
    (w DESC, shard DESC)."""
    from ..operators.layout import rendezvous_assign

    d = load(spark, sf_dir, "documents")
    assigned = rendezvous_assign(d.select("doc_id"), "doc_id", _RV_SHARDS)
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_RV9_SHARDS = _RV_SHARDS + ["shard-8"]
_RV9_VALUES = ", ".join(f"('{s}')" for s in _RV9_SHARDS)


@_register(
    "rendezvous_rebalance_delta",
    f"""
    WITH shards8 AS (SELECT * FROM (VALUES {_RV_VALUES}) t(shard)),
    shards9 AS (SELECT * FROM (VALUES {_RV9_VALUES}) t(shard)),
    w8 AS (
        SELECT d.doc_id, s.shard,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || s.shard), 1, 8)) AS BIGINT) AS w
        FROM documents d CROSS JOIN shards8 s
    ),
    a8 AS (
        SELECT doc_id, shard FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY w DESC, shard DESC) AS rn
            FROM w8
        ) WHERE rn = 1
    ),
    w9 AS (
        SELECT d.doc_id, s.shard,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || s.shard), 1, 8)) AS BIGINT) AS w
        FROM documents d CROSS JOIN shards9 s
    ),
    a9 AS (
        SELECT doc_id, shard FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY w DESC, shard DESC) AS rn
            FROM w9
        ) WHERE rn = 1
    )
    SELECT a8.shard AS old_shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a9.shard <> a8.shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a9.shard <> a8.shard
                          AND a9.shard = 'shard-8' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_to_newcomer,
           round(CAST(SUM(CASE WHEN a9.shard <> a8.shard THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) + 0.0 AS moved_frac
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY 1
    """,
)
def rendezvous_rebalance_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elastic-rebalance audit for rendezvous (HRW) placement: assign
    every document under the 8-shard ring AND under the ring plus one
    newcomer, then report per old shard how many keys MOVE and where.
    The query is a live proof of HRW's selling point — every moved key
    lands on the NEWCOMER (n_moved = n_to_newcomer row by row; a
    mod-N ring would reshuffle ~all keys) and the expected movement is
    1/9 per shard.  This is the number a storage operator checks
    before scaling an ingestion fleet.

    Scale shape: both assignments are per-row md5 + array_max
    expressions fused into ONE scan (no shuffle, no join on the fact —
    the oracle's a8/a9 join is its window formulation; Spark computes
    both columns in place); only the 8-group rollup shuffles."""
    from ..operators.layout import rendezvous_assign

    d = load(spark, sf_dir, "documents").select("doc_id")
    both = rendezvous_assign(
        rendezvous_assign(d, "doc_id", _RV_SHARDS, out_col="old_shard"),
        "doc_id",
        _RV9_SHARDS,
        out_col="new_shard",
    )
    moved = (F.col("new_shard") != F.col("old_shard")).cast("int")
    return both.groupBy("old_shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(moved).cast("long").alias("n_moved"),
        F.sum(
            moved * (F.col("new_shard") == "shard-8").cast("int")
        )
        .cast("long")
        .alias("n_to_newcomer"),
        (
            F.round(F.sum(moved).cast("double") / F.count(F.lit(1)), 6) + 0.0
        ).alias("moved_frac"),
    )


# ---------------------------------------------------------------------------
# Deletion-vector compaction audit — merge-on-read bookkeeping: which
# files have soaked up enough deletes that rewriting beats masking.
# ---------------------------------------------------------------------------


@_register(
    "deletion_vector_compaction_audit",
    """
    WITH filed AS (
        SELECT o_orderkey // 4096 AS file_id,
               CASE WHEN CAST(('0x' || substr(md5('dv' ||
                        CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
                        % 100 < 17
                    THEN 1 ELSE 0 END AS deleted
        FROM orders
    ),
    per_file AS (
        SELECT file_id, COUNT(*) AS n_rows,
               SUM(deleted) AS n_deleted
        FROM filed GROUP BY file_id
    )
    SELECT CAST(file_id AS BIGINT) AS file_id,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_deleted AS BIGINT) AS n_deleted,
           round(CAST(n_deleted AS DOUBLE) / n_rows, 6) AS dv_density,
           CAST(CASE WHEN 5 * n_deleted >= n_rows THEN 1 ELSE 0 END
                AS INT) AS rewrite_recommended
    FROM per_file
    """,
)
def deletion_vector_compaction_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-on-read deletion-vector bookkeeping (the Delta/Iceberg v2
    position-delete model, public): rows map to 4096-row files by key
    range, a replayable md5 draw marks ~17% as soft-deleted, and the
    audit reports each file's deletion-vector density plus the
    compaction verdict — rewrite when deletes reach 20% of the file,
    evaluated as the ALL-INTEGER 5*n_deleted >= n_rows so no float
    threshold can flip a file between engines.

    This is the maintenance query a lakehouse table service runs to
    pick OPTIMIZE targets: merge-on-read keeps writes cheap by masking
    rows at scan time, but every masked row is read-side tax forever —
    the density audit is what converts that tax back into a bounded
    rewrite (the copy-on-write/merge-on-read tradeoff).

    Scale shape: one scan, one grouped integer aggregate on the
    file-id contraction (map-side partials) — the same shape the real
    manifest-level audit has, where n_rows/n_deleted come from file
    footers instead of a scan."""
    o = load(spark, sf_dir, "orders")
    deleted = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("dv"), F.col("o_orderkey").cast("string"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < 17,
            1,
        ).otherwise(0)
    )
    per_file = (
        o.select(
            F.expr("o_orderkey div 4096").alias("file_id"),
            deleted.alias("deleted"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("deleted").alias("n_deleted"),
        )
    )
    return per_file.select(
        F.col("file_id").cast("long").alias("file_id"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_deleted").cast("long").alias("n_deleted"),
        F.round(F.col("n_deleted").cast("double") / F.col("n_rows"), 6).alias(
            "dv_density"
        ),
        F.when(5 * F.col("n_deleted") >= F.col("n_rows"), 1)
        .otherwise(0)
        .cast("int")
        .alias("rewrite_recommended"),
    )


# ---------------------------------------------------------------------------
# Largest-remainder apportionment — exact integer allocation of a fixed
# budget by revenue share (quota methods, no float rounding drift).
# ---------------------------------------------------------------------------

_APPORTION_SEATS = 1000


@_register(
    "largest_remainder_apportionment",
    f"""
    WITH rev AS (
        SELECT n.n_name,
               SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(cents) AS t FROM rev),
    quota AS (
        SELECT n_name, cents,
               (cents * {_APPORTION_SEATS}) // t AS floor_seats,
               (cents * {_APPORTION_SEATS}) % t AS remainder
        FROM rev, tot
    ),
    short AS (
        SELECT {_APPORTION_SEATS} - SUM(floor_seats) AS k FROM quota
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY remainder DESC, n_name) AS rnk
        FROM quota
    )
    SELECT n_name,
           CAST(cents AS BIGINT) AS cents,
           CAST(floor_seats + CASE WHEN rnk <= k THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM ranked, short
    """,
)
def largest_remainder_apportionment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-remainder (Hamilton/Hare) apportionment of a fixed
    1000-unit budget across nations by revenue share — the exact
    integer allocation primitive behind quota sampling, budget splits
    and proportional shard counts (public electoral method).  Every
    quantity is integer: quotas are cents*SEATS div total with integer
    remainders, the shortfall k = SEATS - sum(floors), and the k
    largest remainders (nation-name tiebreak) get +1.  Seats sum to
    EXACTLY the budget by construction — no float-share rounding
    drift, ever (the property test pins it).

    Scale shape: one fact contraction to |nations| rows; the total and
    shortfall are 1-row broadcasts; the remainder rank is a window
    over the dim-sized frame."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "cents",
        F.expr(f"(cents * {_APPORTION_SEATS}) div t").alias("floor_seats"),
        ((F.col("cents") * _APPORTION_SEATS) % F.col("t")).alias("remainder"),
    )
    short = quota.agg(
        (F.lit(_APPORTION_SEATS) - F.sum("floor_seats")).alias("k")
    )
    w = Window.orderBy(F.desc("remainder"), "n_name")
    ranked = quota.withColumn("rnk", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(short)).select(
        "n_name",
        F.col("cents").cast("long").alias("cents"),
        (
            F.col("floor_seats")
            + F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
    )


# ---------------------------------------------------------------------------
# DSAR access extract — the right-of-ACCESS dual of the right-to-be-
# forgotten cascade: everything held about a subject, checksummed.
# ---------------------------------------------------------------------------


@_register(
    "dsar_access_extract",
    """
    WITH subjects AS (
        SELECT c_custkey FROM customer
        WHERE substr(md5('forget' || CAST(c_custkey AS VARCHAR)), 1, 2) < '10'
    ),
    c_rows AS (
        SELECT c.c_custkey AS subject, 'customer' AS table_name,
               CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '|'
                     || c.c_name || '|' || CAST(c.c_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) AS rh
        FROM customer c JOIN subjects s ON s.c_custkey = c.c_custkey
    ),
    o_rows AS (
        SELECT o.o_custkey AS subject, 'orders' AS table_name,
               CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '|'
                     || o.o_orderstatus || '|'
                     || CAST(CAST(round(o.o_totalprice * 100) AS BIGINT)
                             AS VARCHAR)), 1, 15)) AS BIGINT) AS rh
        FROM orders o JOIN subjects s ON s.c_custkey = o.o_custkey
    ),
    l_rows AS (
        SELECT o.o_custkey AS subject, 'lineitem' AS table_name,
               CAST(('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR) || '|'
                     || CAST(l.l_linenumber AS VARCHAR) || '|'
                     || CAST(l.l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS rh
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN subjects s ON s.c_custkey = o.o_custkey
    ),
    allr AS (
        SELECT * FROM c_rows UNION ALL SELECT * FROM o_rows
        UNION ALL SELECT * FROM l_rows
    )
    SELECT subject, table_name,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(bit_xor(rh) AS BIGINT) AS xor_checksum
    FROM allr GROUP BY subject, table_name
    """,
)
def dsar_access_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-subject ACCESS request extract (GDPR Art. 15 — the dual of
    the Art. 17 erasure cascade, and the SAME md5 subject cohort as
    :func:`forget_customers_cascade` so the two queries audit each
    other): for every subject, how many records each table holds about
    them, with an order-free XOR checksum of per-record md5 content
    digests — the manifest a DSAR fulfillment job emits, and what a
    post-erasure re-run must return ZERO rows against.

    Exactness: each record digests to a 15-hex md5 prefix (bigint);
    XOR is commutative/associative, so the checksum is partition-order
    free (the merkle_range_checksums convention); money enters the
    digest as integer cents, never a formatted float.

    Scale shape: subject filter pushes into each scan (the cohort is a
    pure row predicate); lineitem reaches subjects through one
    orderkey equi-join; one grouped XOR/count per (subject, table) —
    linear everywhere, no window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    subj = F.substring(
        F.md5(F.concat(F.lit("forget"), F.col("c_custkey").cast("string"))), 1, 2
    ) < "10"
    subjects = c.filter(subj).select("c_custkey")

    def digest(*cols):
        return F.conv(
            F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
        ).cast("long")

    c_rows = c.join(subjects, "c_custkey").select(
        F.col("c_custkey").alias("subject"),
        F.lit("customer").alias("table_name"),
        digest(
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_nationkey").cast("string"),
        ).alias("rh"),
    )
    o_rows = o.join(
        subjects, o.o_custkey == subjects.c_custkey
    ).select(
        F.col("o_custkey").alias("subject"),
        F.lit("orders").alias("table_name"),
        digest(
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        ).alias("rh"),
    )
    l_rows = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(subjects, F.col("o_custkey") == subjects.c_custkey)
        .select(
            F.col("o_custkey").alias("subject"),
            F.lit("lineitem").alias("table_name"),
            digest(
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
            ).alias("rh"),
        )
    )
    allr = c_rows.unionByName(o_rows).unionByName(l_rows)
    return allr.groupBy("subject", "table_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.expr("bit_xor(rh)").cast("long").alias("xor_checksum"),
    )
