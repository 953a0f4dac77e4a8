"""Cross-engine parity on a hostile DIMENSION table (customer).

Fifth hostile fixture: the customer dimension with the referential and
value pathologies dimension tables actually develop — ORPHAN foreign
keys (nationkey pointing nowhere: joins must drop identically on both
engines), DUPLICATE customer names (the flagship groups by c_name, so
two customers sharing a name must merge identically), negative and zero
account balances (threshold/average logic), a name that is the empty
string, and a nation owning most customers (dimension skew) — replayed
through the customer-consuming query/oracle pairs, with the fact tables
symlinked verbatim so FK joins hit real keys.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

# (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
# custkeys cover the fact tables' o_custkey range so joins bind
HOSTILE_CUSTOMER = (
    # duplicate names across different customers (group-merge semantics)
    [(1, "Customer#dup", 0, 100.0, "BUILDING"),
     (2, "Customer#dup", 1, 200.0, "AUTOMOBILE")]
    # orphan nationkey (no nation 99): nation joins must drop these rows
    + [(3, "Customer#orphan", 99, 300.0, "MACHINERY")]
    # zero / negative balances, empty-string name
    + [(4, "", 2, 0.0, "HOUSEHOLD"),
       (5, "Customer#negative", 3, -999.99, "FURNITURE")]
    # one nation owns most of the dimension (skew); acctbal all-tied
    + [(6 + i, f"Customer#skew{i}", 4, 555.55, "BUILDING") for i in range(40)]
    # cover the remaining fact custkeys sparsely
    + [(46 + i, f"Customer#tail{i}", i % 5, float(i * 10 - 100), "MACHINERY")
       for i in range(30)]
)

_DIM_PANEL = [
    "flagship_top5_customers_by_order_count",
    "inner_join_orders_customer",
    "left_join_sparse_dim",
    "anti_join_customers_no_f_orders",
    "q13_customer_order_distribution",
    "q22_inactive_high_balance",
    "acctbal_boxplot_by_nation",
    "gini_revenue_by_nation",
    "set_intersect_active_customers",
    "set_except_inactive_customers",
    "exists_big_spenders",
    "customers_every_order_above_10k",
    "train_test_split_counts",
    "pareto_customers_80pct",
    "fuzzy_name_match",
    # r9 entity resolution: duplicate/empty/short names must block and
    # pair identically (right()-based key, no position arithmetic)
    "entity_resolution_customers",
    # l-diversity divides classes by sensitive-band cardinality:
    # all-tied balances, singleton classes and NULL-ish names are
    # exactly where min-distinct degenerates to 1 on both engines
    "l_diversity_audit",
    # r11 t-closeness: singleton classes have a degenerate (one-band)
    # distribution with maximal ordered-EMD; negative/huge balances
    # land in the edge bands; the rounded-EMD gate must agree exactly
    "t_closeness_audit",
    # r11 Simpson audit: hostile nations with zero-variance strata
    # exercise the NULL slope guard, and the INTEGER-EXACT sign
    # comparison must agree on every degenerate (zero-numerator) case
    "simpsons_paradox_slopes",
    # r11 SRM: the md5 arm split over the tiny hostile customer set
    # must count identically and push the same integers through chi2/z
    "srm_check_assignment",
]


@pytest.fixture(scope="module")
def hostile_dims_dir(spark, tmp_path_factory):
    from tests.fixture_io import write_naive_parquet

    root = tmp_path_factory.mktemp("hostile_dims")
    for t in TESTDATA_TABLES:
        if t != "customer":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    write_naive_parquet(
        str(root / "customer.parquet"),
        HOSTILE_CUSTOMER,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        int_cols=["c_custkey"],
        int32_cols=["c_nationkey"],
    )
    return str(root)


@pytest.mark.parametrize("name", _DIM_PANEL)
def test_customer_family_parity_on_hostile_dim(spark, hostile_dims_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(
        queries[name](spark, hostile_dims_dir), oracles[name], hostile_dims_dir
    )
    assert not problems, f"{name} on hostile customer dim: {problems}"
