"""Viral-basket cap on item-item cosine CF (r8 VERDICT #6).

One degenerate basket with n items contributes C(n, 2) pairs to the
basket self-join — the quadratic hazard the basket-size bound was the
design premise against.  These tests build a hostile corpus (normal
3-item baskets plus one 200-item mega-basket) and prove:

1. capped pair fanout is bounded: the mega-basket contributes zero
   pairs, the rest are exactly the normal baskets' C(3, 2) each;
2. the capped result equals the UNCAPPED operator run on the input
   with oversized baskets pre-filtered (the cap is a filter, not an
   approximation — degrees recompute consistently);
3. the default (cap=None) path is unchanged: exact equality with a
   DuckDB oracle over the same hostile corpus, guarding the
   oracle-paired ``item_item_cosine_recs`` semantics.
"""

from __future__ import annotations

import duckdb

from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    item_item_cosine,
)
from tests.parity import normalize_rows

MEGA = 200  # items in the viral basket
CAP = 10


def _baskets(spark):
    rows = []
    # 30 normal baskets of 3 items over a 60-item catalog, deterministic
    for o in range(30):
        for j in range(3):
            rows.append((o, (o * 7 + j * 11) % 60))
    # the viral basket: one order holding 200 distinct high-id items
    rows += [(999, 1000 + i) for i in range(MEGA)]
    return spark.createDataFrame(sorted(set(rows)), "o int, p int")


def test_cap_bounds_pair_fanout(spark):
    op = _baskets(spark)
    capped = item_item_cosine(op, k=5, max_basket_size=CAP)
    rows = capped.collect()
    # no pair may touch the viral basket's items (p >= 1000)
    assert all(r.item < 1000 and r.neighbor < 1000 for r in rows)
    # pair fanout bound: every surviving basket contributes <= C(CAP, 2)
    # distinct unordered pairs; 30 baskets of 3 -> <= 30 * 3 pairs, each
    # counted once per direction in the symmetric neighbor list
    total_cooc = sum(r.cooc for r in rows)
    assert total_cooc <= 2 * 30 * 3 * (CAP * (CAP - 1) // 2)


def test_cap_equals_prefiltered_uncapped(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    op = _baskets(spark)
    capped = item_item_cosine(op, k=5, max_basket_size=CAP)
    w = Window.partitionBy("o")
    prefiltered = (
        op.withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") <= CAP)
        .drop("n")
    )
    manual = item_item_cosine(prefiltered, k=5, max_basket_size=None)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_uncapped_matches_duckdb_oracle(spark):
    op = _baskets(spark)
    got = item_item_cosine(op, k=5, max_basket_size=None)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE op (o INT, p INT)"
    )
    con.executemany(
        "INSERT INTO op VALUES (?, ?)", [(r.o, r.p) for r in op.collect()]
    )
    cur = con.execute(
        """
        WITH deg AS (SELECT p, COUNT(*) AS n_orders FROM op GROUP BY p),
        cooc AS (
            SELECT a.p AS p_a, b.p AS p_b, COUNT(*) AS c
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p
        ),
        sym AS (
            SELECT p_a AS item, p_b AS neighbor, c FROM cooc
            UNION ALL SELECT p_b, p_a, c FROM cooc
        ),
        scored AS (
            SELECT s.item, s.neighbor, s.c,
                   round(CAST(s.c AS DOUBLE)
                         / sqrt(CAST(da.n_orders AS DOUBLE) * db.n_orders),
                         6) AS cosine
            FROM sym s
            JOIN deg da ON da.p = s.item
            JOIN deg db ON db.p = s.neighbor
        )
        SELECT item, neighbor, CAST(c AS BIGINT) AS cooc, cosine,
               CAST(rnk AS BIGINT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                                           ORDER BY cosine DESC, neighbor) AS rnk
              FROM scored)
        WHERE rnk <= 5
        """
    )
    cols = [d[0] for d in cur.description]
    want = normalize_rows(cols, cur.fetchall())
    have = normalize_rows(got.columns, [tuple(r) for r in got.collect()])
    assert have == want


# ---------------------------------------------------------------------------
# DIMSUM-style degree-ratio prune on the threshold cosine pair join
# (r11 — the SCALE.md designated upgrade for the item-item pair fanout).
# ---------------------------------------------------------------------------


def _skewed_baskets(spark):
    """Hostile degree skew: one mega-popular item (degree 40) crossing
    many rare items (degree 1-2) — exactly the pairs the ratio bound
    must discard pre-shuffle — plus an exact-boundary pair (cosine
    exactly 0.5 under tau = 1/2) and a twin singleton pair (cosine 1)."""
    rows = []
    for o in range(40):
        rows.append((o, 0))  # item 0 in every basket
        rows.append((o, 100 + o))  # a rare item per basket
    # boundary pair: items 500/501 each in 2 baskets, co-occur once
    rows += [(200, 500), (200, 501), (201, 500), (202, 501)]
    # twin singletons: cosine exactly 1.0
    rows += [(300, 600), (300, 601)]
    return spark.createDataFrame(sorted(set(rows)), "o int, p int")


def _brute_threshold(spark, op, num, den):
    """Unpruned brute-force twin: every pair scored, exact integer gate."""
    con = duckdb.connect()
    con.execute("CREATE TABLE op (o INT, p INT)")
    con.executemany(
        "INSERT INTO op VALUES (?, ?)", [(r.o, r.p) for r in op.collect()]
    )
    cur = con.execute(
        f"""
        WITH deg AS (SELECT p, COUNT(*) AS n FROM op GROUP BY p),
        cooc AS (
            SELECT a.p AS u, b.p AS v, COUNT(*) AS c
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p
        )
        SELECT u, v, CAST(c AS BIGINT) AS cooc,
               round(CAST(c AS DOUBLE) / sqrt(CAST(du.n AS DOUBLE) * dv.n),
                     6) AS cosine
        FROM cooc JOIN deg du ON du.p = u JOIN deg dv ON dv.p = v
        WHERE CAST(c AS HUGEINT) * c * {den * den}
              >= CAST(du.n AS HUGEINT) * dv.n * {num * num}
        """
    )
    return normalize_rows([d[0] for d in cur.description], cur.fetchall())


def test_ratio_prune_is_lossless_under_skew(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        cosine_threshold_pairs,
    )

    op = _skewed_baskets(spark)
    for num, den in [(1, 2), (1, 10), (9, 10)]:
        got = cosine_threshold_pairs(op, tau_num=num, tau_den=den)
        have = normalize_rows(got.columns, [tuple(r) for r in got.collect()])
        assert have == _brute_threshold(spark, op, num, den), (num, den)


def test_threshold_boundary_pair_is_kept_exactly(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        cosine_threshold_pairs,
    )

    op = _skewed_baskets(spark)
    rows = {
        (r.u, r.v): r.cosine
        for r in cosine_threshold_pairs(op, tau_num=1, tau_den=2).collect()
    }
    # cosine exactly at tau survives the >= gate (integer compare, no
    # float boundary): 1 / sqrt(2 * 2) = 0.5
    assert rows[(500, 501)] == 0.5
    # the twin singletons score exactly 1.0
    assert rows[(600, 601)] == 1.0
    # no (mega-popular, rare) pair survives: cosine <= 1/sqrt(40) < 0.5
    assert all(u != 0 for (u, v) in rows)


def test_ratio_prune_drops_skew_pairs_before_the_shuffle(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        cosine_threshold_pairs,
    )

    op = _skewed_baskets(spark)
    # tau = 9/10: only near-twin degree pairs can qualify, so the join
    # condition itself must carry the integer ratio bound — visible in
    # the physical plan as a post-join filter/condition on the degree
    # columns rather than a filter after the aggregate alone
    plan = cosine_threshold_pairs(
        op, tau_num=9, tau_den=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "n_u" in plan and "n_v" in plan
