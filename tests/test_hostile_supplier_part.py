"""Cross-engine parity on hostile SUPPLIER and PART dimensions.

Sixth hostile fixture, aimed at the hardest TPC-H shapes (Q2's
correlated-MIN decorrelation, Q9's multi-join profit, Q16's NOT-IN,
Q11/Q20's threshold subqueries, Q21's semi/anti pair): suppliers at
IDENTICAL minimum cost (Q2's tiebreak), suppliers with orphan
nationkeys, zero/negative account balances, duplicate supplier names,
parts whose size/type hit the queries' filter constants exactly and in
bulk (selectivity collapse), duplicated part names and zero retail
prices — fact tables symlinked so the join keys bind.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

# (s_suppkey, s_name, s_nationkey, s_acctbal)
HOSTILE_SUPPLIER = (
    # all-tied account balances, duplicate names
    [(1, "Supplier#dup", 0, 500.0), (2, "Supplier#dup", 1, 500.0)]
    # orphan nationkey
    + [(3, "Supplier#orphan", 99, 500.0)]
    # zero / negative balances
    + [(4, "Supplier#zero", 2, 0.0), (5, "Supplier#neg", 3, -123.45)]
    # bulk of suppliers in one nation (skew)
    + [(6 + i, f"Supplier#skew{i}", 4, 100.0 + i) for i in range(20)]
)

# (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
HOSTILE_PART = (
    # many parts hitting Q2's exact filter (size 15, type PROMO) — the
    # filtered set is LARGE instead of selective, and min-cost ties abound
    [(1 + i, f"part promo {i}", "Brand#1", "PROMO", 15, 100.0)
     for i in range(15)]
    # duplicate names, zero price, extreme size
    + [(100, "dup part", "Brand#2", "STANDARD", 1, 0.0),
       (101, "dup part", "Brand#2", "STANDARD", 50, 0.0),
       (102, "", "Brand#3", "ECONOMY", 15, 9999.99)]
    # cover remaining fact partkeys sparsely
    + [(103 + i, f"tail part {i}", f"Brand#{i % 5}", ["PROMO", "STANDARD", "ECONOMY"][i % 3], (i % 50) + 1, float(i))
       for i in range(40)]
)

_SP_PANEL = [
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_parts",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q15_top_supplier",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "fk_orphans_lineitem_supplier",
    "part_affinity_lift",
    "part_graph_degree_distribution",
    "triangle_count_part_graph",
    # skyline dominance under identical-minimum prices, zero prices and
    # tied sizes: the dominance definition's strictness clause and the
    # sweep's tie handling must agree with the NOT EXISTS oracle
    "skyline_parts",
    # the other two part-graph consumers (same co-occurrence edge build
    # as triangle/degree above): bounded peel and basket cosine must
    # survive the same dimension hostilities
    "kcore_part_graph",
    "item_item_cosine_recs",
    # r11 HITS: hostile graphs with a dominant supplier (max-normalized
    # to exactly 1.000000), singleton components, and zero-degree
    # nodes absent from both score lists must iterate identically
    # through all four DECIMAL-exact reinforcement steps
    "hits_customer_supplier",
    # r11 directed rules share the basket pair build: degenerate
    # baskets (single-part orders contribute no pairs), the support
    # floor under sparse hostile baskets, and the integer-ratio
    # confidence/lift divisions must replay identically
    "association_rules_part_pairs",
    # link prediction shares the edge build AND divides by neighbor
    # degree: degenerate graphs (no support-2 edges, single-edge
    # components) must produce identical empty/short top-20s
    "link_prediction_part_graph",
    # weighted SSSP shares the support-2 edge build; negative
    # hostile prices make negative edge weights, which bounded
    # min-plus relaxation must handle identically on both engines
    "sssp_weighted_part_graph",
    # HHI shares under zero and negative revenue: zero totals must
    # NULL identically, negative revenue makes shares unbounded
    "hhi_supplier_concentration",
    # transitivity under degenerate graphs: no edges (NULL ratio),
    # wedges with no triangles, and the dominant-part hot node
    "global_clustering_coefficient",
    # r11 assortativity + rich club share the same edge build: the
    # dominant-part hub must drive the correlation and the club
    # thresholds identically; clubs smaller than 2 emit NULL density,
    # the threshold-pruned cosine pair join must stay lossless
    "degree_assortativity_part_graph",
    "rich_club_coefficient",
    "cosine_threshold_pairs_pruned",
    # r11 elasticity: constant-price hostile brands have zero log-x
    # variance and must drop via the exact integer-decimal determinant
    # guard identically; zero/negative quantities are excluded rows
    "price_elasticity_by_brand",
]


@pytest.fixture(scope="module")
def hostile_sp_dir(spark, tmp_path_factory):
    from tests.fixture_io import write_naive_parquet

    root = tmp_path_factory.mktemp("hostile_sp")
    for t in TESTDATA_TABLES:
        if t not in ("supplier", "part"):
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    write_naive_parquet(
        str(root / "supplier.parquet"),
        HOSTILE_SUPPLIER,
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        int_cols=["s_suppkey"],
        int32_cols=["s_nationkey"],
    )
    write_naive_parquet(
        str(root / "part.parquet"),
        HOSTILE_PART,
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        int_cols=["p_partkey"],
        int32_cols=["p_size"],
    )
    return str(root)


@pytest.mark.parametrize("name", _SP_PANEL)
def test_supplier_part_family_parity_on_hostile_dims(spark, hostile_sp_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(
        queries[name](spark, hostile_sp_dir), oracles[name], hostile_sp_dir
    )
    assert not problems, f"{name} on hostile supplier/part: {problems}"
