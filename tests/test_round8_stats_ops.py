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
