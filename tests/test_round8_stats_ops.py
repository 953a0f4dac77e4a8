"""Invariant tests for the round-8 statistics / curve operators —
mathematical properties the DuckDB oracle parity cannot state (parity
proves Spark == DuckDB; these prove both compute the RIGHT thing).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def q():
    return entrymod.queries()


def test_acf_bounded_and_complete(spark, q):
    rows = q["acf_daily_revenue"](spark, SF_SMOKE).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert r["acf"] is None or -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] >= 0


def test_ccf_bounded(spark, q):
    rows = q["ccf_click_vs_purchase"](spark, SF_SMOKE).collect()
    assert sorted(r["lag"] for r in rows) == list(range(-3, 4))
    for r in rows:
        assert r["ccf"] is None or -1.0 <= r["ccf"] <= 1.0


def test_mann_whitney_identities(spark, q):
    (r,) = q["mann_whitney_u_price_halves"](spark, SF_SMOKE).collect()
    # U1 + U2 == n1 * n2 (the defining identity), both in [0, n1*n2]
    assert r["u1"] + r["u2"] == pytest.approx(r["n1"] * r["n2"])
    assert 0 <= r["u1"] <= r["n1"] * r["n2"]
    assert 0 <= r["u2"] <= r["n1"] * r["n2"]


def test_anova_effect_size_bounded(spark, q):
    (r,) = q["anova_f_price_by_priority"](spark, SF_SMOKE).collect()
    assert r["k"] == 5
    assert r["eta_squared"] is not None and 0.0 <= r["eta_squared"] <= 1.0
    assert r["f_stat"] is not None and r["f_stat"] >= 0.0


def test_trimmed_mean_between_bounds(spark, q):
    # the trimmed mean must lie within [p05, p95] by construction, and
    # trimming can only move the estimate toward the bulk
    rows = q["trimmed_mean_price_by_status"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= r["n_all"]
        # >= 90% of rows survive a 5/95 percentile_disc trim
        assert r["n_kept"] >= 0.9 * r["n_all"] - 1


def test_lorenz_monotone_and_terminal(spark, q):
    rows = sorted(
        q["lorenz_curve_revenue_deciles"](spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert rows and rows[-1]["decile"] == 10
    # all-positive revenue: shares in [0,1], nondecreasing, ending at 1
    shares = [r["cum_revenue_share"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in shares)
    assert shares == sorted(shares)
    assert shares[-1] == pytest.approx(1.0)
    # Lorenz curve lies BELOW the diagonal (poorest p% hold < p% of revenue)
    for r in rows[:-1]:
        assert r["cum_revenue_share"] <= r["decile"] / 10 + 1e-9


def test_heaps_curve_monotone(spark, q):
    rows = q["heaps_law_vocab_growth"](spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["bucket"])
        toks = [r["cum_tokens"] for r in rs]
        vocab = [r["cum_vocab"] for r in rs]
        assert toks == sorted(toks), src
        assert vocab == sorted(vocab), src
        # sublinearity at the tail: vocabulary cannot exceed tokens
        assert all(v <= t for v, t in zip(vocab, toks)), src


def test_zipf_products_and_ranks(spark, q):
    rows = q["zipf_rank_frequency_curve"](spark, SF_SMOKE).collect()
    assert rows
    by_rank = {r["rank"]: r for r in rows}
    assert 1 in by_rank
    # doc_freq non-increasing in rank; product is rank * freq exactly
    ranks = sorted(by_rank)
    for a, b in zip(ranks, ranks[1:]):
        assert by_rank[a]["doc_freq"] >= by_rank[b]["doc_freq"]
    for r in rows:
        assert r["freq_times_rank"] == r["rank"] * r["doc_freq"]


def test_sssp_seed_zero_and_triangle_inequality_vs_bfs(spark, q):
    dist = {
        r["node"]: r["dist"]
        for r in q["sssp_weighted_part_graph"](spark, SF_SMOKE).collect()
    }
    assert dist, "graph non-empty at smoke scale"
    seed = min(
        n for n, d in dist.items() if d == 0.0
    )  # exactly the min-id node
    assert dist[seed] == 0.0
    assert all(d >= 0.0 for d in dist.values())
    # every weighted-reachable node is BFS-reachable within the same
    # round bound (reachability sets agree; weights only change values)
    bfs = {
        r["node"]: r["min_hop"]
        for r in q["bfs_hops_part_graph"](spark, SF_SMOKE).collect()
    }
    assert set(dist) >= {n for n, h in bfs.items() if h <= 3} or set(
        dist
    ) == set(bfs)


def test_hhi_bounds_and_monopoly_floor(spark, q):
    rows = q["hhi_supplier_concentration"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n = r["n_suppliers"]
        assert n >= 1
        if r["hhi"] is not None:
            # HHI of n positive shares lies in [1/n, 1]
            assert 1.0 / n - 1e-9 <= r["hhi"] <= 1.0 + 1e-9


def test_sequence_gaps_consistency(spark, q):
    (r,) = q["orderkey_sequence_gaps"](spark, SF_SMOKE).collect()
    assert r["n_keys"] >= 1
    assert r["span"] >= r["n_keys"]
    # gaps exist iff the span exceeds the key count
    assert (r["n_gaps"] > 0) == (r["span"] > r["n_keys"])


def test_int8_recall_bounds(spark, q):
    (r,) = q["int8_recall_vs_exact"](spark, SF_SMOKE).collect()
    assert r["n_queries"] >= 1
    assert 0.0 <= r["mean_recall_at_10"] <= 1.0
    assert 0 <= r["min_overlap"] <= 10
    assert 0 <= r["n_perfect"] <= r["n_queries"]


def test_l_diversity_vs_k_anonymity(spark, q):
    (ld,) = q["l_diversity_audit"](spark, SF_SMOKE).collect()
    (ka,) = q["k_anonymity_audit"](spark, SF_SMOKE).collect()
    # same equivalence classes on both audits
    assert ld["n_classes"] == ka["n_classes"]
    # l never exceeds the class size floor (can't have more distinct
    # sensitive values than members) or the band cardinality (4)
    assert 1 <= ld["l_diversity"] <= min(ka["k_anonymity"], 4)


def test_partial_corr_matches_numpy_recompute(spark):
    """r14 brute-force check: the one-scan exact-moment partial
    correlation must match numpy's two-regression definition on the
    raw rows (Yule's identity), to the 6dp release grain."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
    from tests.conftest import SF_SMOKE

    r = relational.QUERIES["partial_corr_price_quantity_given_discount"](
        spark, SF_SMOKE
    ).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_extendedprice", "l_quantity", "l_discount")
        .collect()
    )
    x = np.round([float(v.l_extendedprice) for v in rows], 2)
    y = np.round([float(v.l_quantity) for v in rows], 2)
    z = np.round([float(v.l_discount) for v in rows], 2)
    c = np.corrcoef(np.vstack([x, y, z]))
    rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
    want = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r.n == len(rows)
    assert abs(r.r_price_quantity - rxy) <= 2e-6
    assert abs(r.partial_r - want) <= 2e-6, (r.partial_r, want)


def test_goodman_kruskal_lambda_matches_brute_force(spark):
    """r14 brute-force check: lambda recomputed from a plain Python
    crosstab of the raw rows, both directions."""
    from collections import Counter

    from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
    from tests.conftest import SF_SMOKE

    r = relational.QUERIES["goodman_kruskal_lambda_status_priority"](
        spark, SF_SMOKE
    ).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    cell = Counter((v.o_orderstatus, v.o_orderpriority) for v in rows)
    n = len(rows)

    def lam(axis):
        groups = {}
        marg = Counter()
        for (s, p), c in cell.items():
            k, v = (p, s) if axis == "s_given_p" else (s, p)
            groups.setdefault(k, Counter())[v] += c
            marg[v] += c
        sum_max = sum(max(g.values()) for g in groups.values())
        modal = max(marg.values())
        return (sum_max - modal) / (n - modal) if n != modal else None

    assert r.n == n
    assert abs(r.lambda_status_given_priority - lam("s_given_p")) <= 1e-6
    assert abs(r.lambda_priority_given_status - lam("p_given_s")) <= 1e-6


# ---------------------------------------------------------------------------
# Round-15 operators: independent numpy recomputes (third implementations)
# and mathematical invariants on the real SF_SMOKE tables.
# ---------------------------------------------------------------------------


def _duck(sql):
    import duckdb

    from tests.parity import TESTDATA_TABLES

    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{t}.parquet')"
            )
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_average_precision_matches_numpy_recompute(spark, q):
    import numpy as np

    (r,) = q["average_precision_discount_returns"](spark, SF_SMOKE).collect()
    rows = _duck(
        "SELECT CAST(l_discount AS DOUBLE), "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        "FROM lineitem WHERE l_discount IS NOT NULL"
    )
    s = np.array([x[0] for x in rows])
    y = np.array([x[1] for x in rows])
    ap = 0.0
    tp = nn = 0
    P = int(y.sum())
    for v in sorted(set(s), reverse=True):
        m = s == v
        tp += int(y[m].sum())
        nn += int(m.sum())
        ap += (int(y[m].sum()) / P) * (tp / nn)
    assert r["n_pos"] == P and r["n_neg"] == len(y) - P
    assert abs(r["average_precision"] - ap) < 1e-5
    assert abs(r["prevalence"] - P / len(y)) < 1e-5


def test_anderson_darling_matches_numpy_recompute(spark, q):
    import numpy as np

    (r,) = q["anderson_darling_price_halves"](spark, SF_SMOKE).collect()
    rows = _duck(
        "SELECT CAST(o_totalprice AS DOUBLE), "
        "CASE WHEN o_orderdate < TIMESTAMP '1996-07-01' THEN 1 ELSE 0 END "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01'"
    )
    x = np.array([v[0] for v in rows])
    g = np.array([v[1] for v in rows])
    n1, n2 = int(g.sum()), int((1 - g).sum())
    N = n1 + n2
    vals = np.sort(np.unique(x))
    a2 = 0.0
    for ni, mask in ((n1, g == 1), (n2, g == 0)):
        inner = 0.0
        cum = cumi = 0
        for v in vals:
            lj = int((x == v).sum())
            fij = int((x[mask] == v).sum())
            Bj = cum + lj / 2.0
            Mij = cumi + fij / 2.0
            den = Bj * (N - Bj) - N * lj / 4.0
            if den != 0:
                inner += (lj / N) * (N * Mij - ni * Bj) ** 2 / den
            cum += lj
            cumi += fij
        a2 += inner / ni
    a2 *= (N - 1) / N
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["a2akn"] - a2) < 1e-4


def test_hoeffding_d_matches_numpy_brute_force(spark, q):
    import numpy as np

    (r,) = q["hoeffding_d_quantity_discount"](spark, SF_SMOKE).collect()
    rows = _duck(
        "SELECT CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE) "
        "FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL"
    )
    x = np.array([v[0] for v in rows])
    y = np.array([v[1] for v in rows])
    n = len(x)
    lt_x = x[None, :] < x[:, None]
    eq_x = x[None, :] == x[:, None]
    lt_y = y[None, :] < y[:, None]
    eq_y = y[None, :] == y[:, None]
    R = lt_x.sum(1) + (eq_x.sum(1) + 1) / 2.0
    S = lt_y.sum(1) + (eq_y.sum(1) + 1) / 2.0
    Q = (
        1
        + (lt_x & lt_y).sum(1)
        + 0.5 * (eq_x & lt_y).sum(1)
        + 0.5 * (lt_x & eq_y).sum(1)
        + 0.25 * ((eq_x & eq_y).sum(1) - 1)
    )
    D1 = ((Q - 1) * (Q - 2)).sum()
    D2 = ((R - 1) * (R - 2) * (S - 1) * (S - 2)).sum()
    D3 = ((R - 2) * (S - 2) * (Q - 1)).sum()
    D = (
        30.0
        * ((n - 2) * (n - 3) * D1 + D2 - 2 * (n - 2) * D3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert r["n_rows"] == n
    assert abs(r["hoeffding_d"] - D) < 1e-5
    # range sanity (SAS bound: -0.5 <= D <= 1)
    assert -0.5 <= r["hoeffding_d"] <= 1.0


def test_pettitt_matches_numpy_brute_force(spark, q):
    import numpy as np

    (r,) = q["pettitt_changepoint_daily_revenue"](spark, SF_SMOKE).collect()
    rows = _duck(
        "SELECT CAST(o_orderdate AS DATE) AS d, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev "
        "FROM orders GROUP BY 1 ORDER BY 1"
    )
    rev = np.array([float(v[1]) for v in rows])
    n = len(rev)
    sgn = np.sign(rev[None, :] - rev[:, None])
    u = np.array(
        [sgn[: t + 1, t + 1 :].sum() for t in range(n - 1)]
    )  # U_t for t = 1..n-1
    k = int(np.abs(u).max())
    t_star = int(np.argmax(np.abs(u))) + 1
    assert r["n_days"] == n
    assert r["k_statistic"] == k
    assert r["day_index"] == t_star
    p = 2 * np.exp(-6.0 * k * k / (n**3 + n**2))
    assert abs(r["p_value"] - min(1.0, p)) < 1e-6


def test_variance_ratio_matches_numpy_recompute(spark, q):
    import numpy as np

    rows = {r["q"]: r for r in q["variance_ratio_daily_revenue"](spark, SF_SMOKE).collect()}
    raw = _duck(
        "SELECT CAST(o_orderdate AS DATE) AS d, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev "
        "FROM orders GROUP BY 1 ORDER BY 1"
    )
    y = np.array([float(v[1]) for v in raw])
    T = len(y) - 1
    mu = (y[-1] - y[0]) / T
    s1 = ((np.diff(y) - mu) ** 2).sum() / (T - 1)
    for qq, rr in rows.items():
        dq = y[qq:] - y[:-qq]
        m = qq * (T - qq + 1) * (1 - qq / T)
        vr = (((dq - qq * mu) ** 2).sum() / m) / s1
        z = (vr - 1) / np.sqrt(2.0 * (2 * qq - 1) * (qq - 1) / (3.0 * qq * T))
        assert abs(rr["variance_ratio"] - vr) < 1e-4
        assert abs(rr["z_stat"] - z) < 1e-3
        assert rr["n_days"] == T + 1
    assert sorted(rows) == [2, 5, 10]


def test_hurst_matches_numpy_recompute(spark, q):
    import numpy as np

    (r,) = q["hurst_exponent_daily_revenue"](spark, SF_SMOKE).collect()
    raw = _duck(
        "SELECT CAST(o_orderdate AS DATE) AS d, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev "
        "FROM orders GROUP BY 1 ORDER BY 1"
    )
    x = np.array([float(v[1]) for v in raw])
    pts = []
    for s in (16, 32, 64, 128):
        rss = []
        for b in range(len(x) // s):
            blk = x[b * s : (b + 1) * s]
            dev = np.cumsum(blk - blk.mean())
            sd = blk.std()  # population
            if sd > 0:
                rss.append(round((dev.max() - dev.min()) / sd, 6))
        if rss:
            mean_rs = float(np.mean(rss))
            pts.append((np.log(s), np.log(mean_rs)))
            got = r[f"rs_{s}"]
            assert got is not None and abs(got - mean_rs) < 1e-4
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    k = len(pts)
    slope = (k * (lx * ly).sum() - lx.sum() * ly.sum()) / (
        k * (lx * lx).sum() - lx.sum() ** 2
    )
    assert abs(r["h_exponent"] - slope) < 1e-4


def test_ccnet_buckets_ordered_and_partitioned(spark, q):
    rows = q["ccnet_perplexity_buckets"](spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["bucket"]] = r
    assert set().union(*[set(v) for v in by_src.values()]) <= {
        "head",
        "middle",
        "tail",
    }
    # bucket thresholds are GLOBAL value cuts, so within every source the
    # mean logloss must be ordered head <= middle <= tail
    for src, bk in by_src.items():
        means = [
            bk[b]["mean_logloss"] for b in ("head", "middle", "tail") if b in bk
        ]
        assert means == sorted(means), src
    # global buckets are near-terciles (exact thirds up to ties)
    tot = {b: 0 for b in ("head", "middle", "tail")}
    for r in rows:
        tot[r["bucket"]] += r["n_docs"]
    n = sum(tot.values())
    assert n > 0 and tot["head"] >= 1
