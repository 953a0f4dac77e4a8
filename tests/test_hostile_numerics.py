"""Cross-engine parity on a hostile NUMERIC corpus.

The whitespace twin of this file (test_hostile_whitespace.py) caught a
real divergence class (Java-vs-RE2 \\s) plus a real crash (ANSI
DIVIDE_BY_ZERO on empty documents).  This file aims the same weapon at
the numeric/relational family: synthetic ``orders`` and ``lineitem``
tables stuffed with the inputs that historically break aggregate
parity — all-equal values (total ties), zeros (division/variance
degeneracy), negatives, a single dominant group (skew), groups of size
one, and values at the DECIMAL edge — replayed through the real
registered query/oracle pairs with the driver's comparator.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

# (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
_TS = "2024-01-{d:02d} 00:00:00"
HOSTILE_ORDERS = (
    # all-equal prices: every rank/percentile/median is a pure tiebreak test
    [(i, 1, "O", 100.0, _TS.format(d=1 + i % 28), "1-URGENT") for i in range(10)]
    # zero prices: sums/shares/ratios hit 0 numerators and denominators
    + [(100 + i, 2, "F", 0.0, _TS.format(d=1 + i % 28), "2-HIGH") for i in range(5)]
    # negative prices: abs/variance/Gini sign handling
    + [(200 + i, 3, "P", -50.0 * (i + 1), _TS.format(d=1 + i), "3-MEDIUM") for i in range(4)]
    # one dominant customer: 90% skew into a single group
    + [(300 + i, 4, "O", float(i), _TS.format(d=1 + i % 28), "4-NOT SPECIFIED") for i in range(50)]
    # singleton groups: stddev/ntile over n=1
    + [(400, 5, "X", 123.45, _TS.format(d=7), "5-LOW")]
    # large-magnitude values near the DECIMAL(18,2) edge
    + [(500 + i, 6, "O", 9.99e12 + i, _TS.format(d=9), "1-URGENT") for i in range(3)]
)

# (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
#  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
HOSTILE_LINEITEM = (
    # zero quantity/price, full discount, zero tax
    [(i, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "R", "F", _TS.format(d=2)) for i in range(5)]
    # all-tied rows within one order
    + [(100, 2, 1, n, 5.0, 10.0, 0.1, 0.05, "N", "O", _TS.format(d=3)) for n in range(1, 8)]
    # negative quantity (a return), discount edge 0 and 1
    + [(200, 3, 2, 1, -4.0, 100.0, 0.0, 0.08, "A", "F", _TS.format(d=4)),
       (200, 3, 2, 2, 4.0, 100.0, 1.0, 0.0, "A", "F", _TS.format(d=5))]
    # dominant part: skewed join/group key
    + [(300 + i, 9, 3, 1, float(i % 7), 50.0, 0.05, 0.04, "N", "O", _TS.format(d=6)) for i in range(40)]
)

# Numeric-family queries that read ONLY orders / lineitem (plus dims we
# symlink verbatim).  Each is a place where tie order, zero division,
# zero variance, or negative values could diverge between engines.
_NUMERIC_PANEL = [
    # r11 quantile normalization: all-equal prices make every rank a
    # pure orderkey tiebreak, and singleton priority groups take the
    # pooled-median branch — both must map identically on both engines
    "quantile_normalize_prices",
    # r11 Holt-Winters: the hostile corpus is a SHORT pre-cut series
    # (seasonal slots only partially visited) with an EMPTY test window
    # -> n_days = 0 and NULL wape must agree; all-equal and zero
    # revenue days keep the recursion exactly flat on both engines
    "holt_winters_backtest_wape",
    # r11 CvM + Kruskal-Wallis: the all-equal price block is one giant
    # tie (the tie-corrected denominator and the doubled average rank
    # must agree exactly); zero/negative prices order identically
    "cramer_von_mises_price_halves",
    "kruskal_wallis_price_by_priority",
    # r11 Neyman: the all-equal price stratum has sigma exactly 0
    # (weight 0, floor 0 seats) and singleton strata drop — the
    # largest-remainder integerization must agree on degenerate
    # weights; Nelson-Aalen's duration spine under few distinct dates
    "neyman_allocation_sample_sizes",
    "nelson_aalen_repurchase_hazard",
    # r11 drawdown + RDD: the hostile corpus is all-F-status (a
    # monotone cumulative curve -> drawdown exactly 0, trough = first
    # day) and sits entirely OUTSIDE the RDD bandwidth (both sides
    # empty -> NULLs must propagate identically)
    "max_drawdown_daily_revenue",
    "regression_discontinuity_price",
    # r11 PIT join: single-order customers are the cold-start row
    # (0 priors, NULL average); same-date orders make the label pick
    # and the prior frame a pure orderkey tiebreak that must agree
    "point_in_time_feature_join",
    # r11 mediation: near-degenerate hostile designs (constant
    # quantity blocks) stress the exact determinant guards, and
    # near-zero effects stress the -0.0 normalization on BOTH engines
    "mediation_quantity_discount_returns",
    # r11 k-fold CV: tiny hostile folds (a few rows each) exercise the
    # totals-minus-fold identity near degeneracy — constant-quantity
    # training complements drop via the exact determinant guard
    "kfold_cv_ols_rmse",
    # r11 stump: all-equal quantities leave NO valid split (nl < n
    # never holds -> empty result identically); pure-class sides give
    # Gini exactly 0 on both engines
    "decision_stump_returnflag",
    # r11 MK + runs: the all-equal price block makes tied DAYS (the
    # tie-corrected variance term binds); hostile short series with
    # flat moves must drop them identically before the runs chain
    "mann_kendall_trend_daily",
    "runs_test_daily_moves",
    # r11 Cohen's d: the hostile corpus sits outside the 1996 window
    # entirely -> empty groups and NULL effect sizes must agree
    "cohens_d_price_halves",
    # r11 Theil's U: near-degenerate hostile tables (one dominant
    # status) push marginal entropies toward 0 — the NULLIF guard and
    # the rounded p*ln(p) addends must agree at the boundary
    "theils_u_status_priority",
    "pricing_summary",
    "round_prices",
    "conditional_aggregation",
    "percentiles_by_status",
    "histogram_order_prices",
    "weighted_median_price",
    "mad_outliers_by_status",
    "regr_price_vs_quantity",
    "try_divide_return_rates",
    "ntile_price_quartiles",
    "top2_prices_with_ties",
    "benford_first_digit_prices",
    "psi_price_drift",
    "ks_statistic_price_halves",
    "dispersion_stats_by_flag",
    "percentile_disc_by_status",
    "mode_median_by_flag",
    "stats_from_moments",
    # TPC-H-shaped consumers of the same hostile facts (dims symlinked):
    # ties and zero/negative revenue stress their ranks and ratios
    "flagship_top5_customers_by_order_count",
    "top_revenue_orders",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "q4_order_priority",
    "rolling_7day_spend",
    "mom_revenue_change",
    "pareto_customers_80pct",
    "rfm_segment_counts",
    "weekday_seasonality_profile",
    "calendar_fill_monthly_revenue",
    "revenue_share_by_nation",
    "merge_upsert_orders",
    # sampling / window / subquery shapes: total-order tiebreaks and
    # per-group degeneracy under the same hostile facts
    "deterministic_sample_orders",
    "weighted_sample_orders",
    "grouped_zscore_sample",
    "lag_gap_days_per_customer",
    "keyset_page_after_cursor",
    "first_last_nth_order",
    "moving_sum_3_orders",
    # content checksums must canonicalize hostile rows (NULL-bearing
    # keys, duplicate rows) identically on both engines
    "replication_checksum_orders",
    # retraction algebra under all-tied / zero / negative prices
    "incremental_agg_retractions",
    # top-2 MAX maintenance fallback under all-tied prices and groups
    # whose entire stored top-k is deleted
    "max_maintenance_under_deletes",
    # LOO encoding under singleton categories (dropped) and all-tied
    # targets: (sum-x)/(n-1) must stay exact through DECIMAL both sides
    "loo_target_encoding_priority",
    # r9 rank statistics: all-tied values (midranks collapse, tau-b
    # denominators shrink toward zero) and negative/zero prices must
    # produce identical midranks and tie corrections on both engines
    "spearman_price_vs_quantity",
    "kendall_tau_quantity_discount",
    # r15 ECDF/rank family: the all-equal price block is one giant
    # pooled tie (AD's midrank cumulatives and the tie-adjusted
    # denominator must agree; degenerate single-value grids hit the
    # nullif guard), and the 2024-dated hostile corpus empties the
    # 1996 halves entirely (all-null release must match)
    "anderson_darling_price_halves",
    # r15 AP: discount=1.0 edge rows, zero-positives prevalence, and
    # tie groups spanning both classes must step identically
    "average_precision_discount_returns",
    # r15 Hoeffding: all-tied quantity blocks collapse grid columns
    # (quarter-integer tie weights bind); negative quantities order
    # below zero identically; n <= 4 would null via the guard
    "hoeffding_d_quantity_discount",
    # r15 day-series trio: ~2-week hostile series (few days, heavy
    # revenue ties from the all-equal block) — Pettitt's midranks and
    # integer argmax, VR's short-horizon dropout (q >= T) and the
    # sigma=0 nullif, and Hurst's no-complete-block degradation
    # (single regression point -> null H) must agree on both engines
    "pettitt_changepoint_daily_revenue",
    "variance_ratio_daily_revenue",
    "hurst_exponent_daily_revenue",
    # r9 WOE binning: empty bins (0.5 smoothing paths), all-good or
    # all-bad bins, and out-of-range prices must bin identically
    "woe_binning_price_returns",
    # r9 range checksums: NULL statuses/prices hit the coalesce
    # serialization contract; disjoint key ranges yield sparse leaves
    "merkle_range_checksums",
    # r9 KMV sketch: domains smaller than k (exact fallback via NULL
    # h_k) and hash ties must estimate identically
    "kmv_distinct_estimate",
    # r9 rolling median: single-day windows, even/odd midpoints over
    # all-tied and negative revenue, calendar gaps shrinking the frame
    "rolling_7day_median_revenue",
    # r9 Theil-Sen: all-tied days (every slope 0), single-day 1996
    # (zero pairs -> NULL), negative revenue
    "theil_sen_trend_1996",
    # r9 equi-depth histogram: massive ties (all-equal prices make one
    # value span buckets), zero/negative values, n < buckets
    "equi_depth_histogram_price",
    # r9 NDCG: empty holdout windows, items with fewer relevants than
    # the list (ideal-DCG truncation), and all-tied cosine ranks
    "cf_holdout_ndcg",
    # r9 Holt backtest: single-day training series (trend stays 0),
    # empty test windows (NULL wape), negative revenue
    "holt_linear_backtest_wape",
    "ranking_windows",
    "customers_every_order_above_10k",
    "orders_above_customer_avg",
    "exists_big_spenders",
    # the reference's own SF pipeline derives its staging frames from
    # these same facts — run the whole 11-table build on hostile inputs
    "sf_details",
    "sf_location",
    "sf_food_type",
    "sf_num_permit_per_business",
    "sf_applicant_details",
    "sf_yelp_info",
    "sf_permit_ml",
    # lag-k autocorrelation under all-tied days (zero variance ->
    # NULL guard), negative revenue, and a series shorter than the
    # longest lag (empty moment groups must vanish identically)
    "acf_daily_revenue",
    # rank / moment statistics under all-tied prices (zero variance
    # -> NULL guards), empty 1996 windows, and the DECIMAL edge
    "mann_whitney_u_price_halves",
    # r11 KS: all-tied prices make the ECDF gap (and z) exactly 0;
    # one-sided halves drive the integer deviation to its c1*n2 /
    # c2*n1 extremes — the argmax is exact on both engines
    "ks_statistic_price_halves",
    # r11 chi2: degenerate single-status (r = 1 -> dof 0, Cramer's V
    # division by zero -> the least() floor) and sparse cells where
    # expected counts are tiny must replay identically
    "chi2_independence_status_priority",
    # r10 Kaplan-Meier: customers whose orders all land on ONE distinct
    # date are pure censoring (dur = horizon gap), the dominant
    # customer is a single subject despite 50 orders, and tied event
    # days must merge into one step on both engines
    "kaplan_meier_repurchase",
    # r10 BH-FDR: singleton priority class (n=1) and an all-zero-price
    # class must DROP from the screen identically (degenerate-group
    # guard), and huge-magnitude groups stress the DECIMAL moments
    "bh_fdr_priority_price",
    # r10 Brier: hostile lineitem has no post-cut rows in some shapes
    # (empty eval -> NULL-safe), all-tied discounts collapse to one
    # forecast bin, and zero-variance outcomes give uncertainty = 0
    "brier_decomposition_returns",
    # r10 linear interp: the hostile series is dense-with-holes across
    # Jan 2024 — interior gaps must interpolate identically and edge
    # days must never extrapolate
    "linear_interp_daily_revenue",
    # r10 negative sampling: skewed positives (one dominant part) and
    # tiny per-user positive sets — every md5 draw, rejection and the
    # integer (attempt, candidate) encoding must replay exactly
    "cf_negative_sampling",
    # r10 isotonic: negative quantities, all-tied values (flat fit) and
    # a dominant level set — the minimax envelope must pool identically
    "isotonic_price_vs_quantity",
    "anova_f_price_by_priority",
    "trimmed_mean_price_by_status",
    # Lorenz shares under negative revenue (shares outside [0,1]),
    # all-tied spend (pure custkey tiebreak) and tiny N (< 10
    # customers: zero-target deciles absent identically)
    "lorenz_curve_revenue_deciles",
    # dense-vs-gappy key audit: the hostile orderkeys are four
    # disjoint ranges, so every range boundary is a gap start
    "orderkey_sequence_gaps",
    # CUSUM argmax under all-tied days (numerator identically 0 ->
    # pure day tiebreak) and single-day series
    "cusum_changepoint_daily_revenue",
    # WAPE under negative/zero revenue (abs semantics, zero-total
    # NULL guard) and series shorter than the 7-day season
    "seasonal_naive_backtest_wape",
    # r12 time-series diagnostics: the 28-day hostile series with
    # all-tied revenue days (zero-variance NULL guards), negative and
    # zero day sums, and a DECIMAL-edge block; all moment-closed forms
    # must keep exact decimals until the final expression
    "ljung_box_daily_revenue",
    "durbin_watson_daily_trend",
    "periodogram_daily_revenue",
    # r12 chow: every hostile date is 2024 -> the pre-break regime is
    # EMPTY (NULL n_pre) and pooled == post RSS; both engines must
    # propagate the empty-regime NULLs identically
    "chow_break_daily_trend",
    # r12 group tests: the singleton 5-LOW/X groups (zero within-group
    # spread), the all-tied price block (median deviations exactly 0),
    # and a status alphabet beyond F/O/P stress every degenerate guard
    "brown_forsythe_price_priority",
    "cochran_armitage_priority_trend",
    "tukey_hsd_price_priority",
    # r12 mcnemar: all hostile dates sit AFTER the 1998 split -> b = 0
    # and every active customer is h2-only; chi2 = c and the continuity
    # correction must agree
    "mcnemar_customer_halves",
    # r12 EB shrinkage: hostile brands give all-equal raw rates
    # (across-brand variance 0 -> raw-rate fallback with NULL priors)
    "eb_shrunk_return_rates_brand",
    # r12 seasonal MK: ~4 days per weekday with the all-tied block
    # (tie-corrected variance can hit 0 -> NULL z) and signed revenue
    "seasonal_mann_kendall_daily",
    # r12 GQ: hostile quantities cluster at 0/5/negative -> regimes
    # with zero quantity variance take the intercept-only RSS branch
    "goldfeld_quandt_price_quantity",
    # r12 seeded mechanisms: zero/negative prices (w = 0 priorities tie
    # on the orderkey), tiny populations near the K boundary, and the
    # 'X' status outside the RR alphabet (reported truthfully or
    # replaced, never invented)
    "randomized_response_status",
    "priority_sample_revenue_total",
    # r12 DDSketch: zero and negative prices are EXCLUDED by contract
    # (log undefined) and the all-tied block lands in one bucket whose
    # estimate must satisfy the alpha bound on both engines
    "ddsketch_quantiles_price",
    # r12 from-scratch HLL: the hostile corpus has only 6 distinct
    # customers -> deep linear-counting regime (250 empty registers);
    # the md5 registers and the integer harmonic sum must replay
    # bit-for-bit
    "hll_md5_registers_distinct",
    # r12 RANSAC: hk ties from the duplicate (orderkey, linenumber)
    # rows ARE the hostile case (value tiebreak); all-vertical pick
    # pairs (tied quantities) drop candidates on both engines
    "ransac_price_quantity_line",
    # r12 Gumbel-PWM: a single-month corpus leaves n_blocks = 1 (the
    # n-1 denominators go NULL/degenerate identically); all-tied block
    # maxima make beta exactly 0 and the return level = mu
    "gumbel_monthly_max_revenue",
    # r12 Page-Hinkley: the 28-day hostile series with all-tied blocks
    # (zero addends), negative day sums, and the DECIMAL-edge spike —
    # the pre-rounded addend trajectory and the running-min excursion
    # must agree exactly, and no alarm fires on a flat series
    "page_hinkley_daily_revenue",
    # skew factors under the 90% dominant customer and singleton keys
    "join_key_skew_report",
    # r13 ordinal shelf: hostile orders collapse to few cells (many
    # empty), so concordant/discordant sums run over sparse grids and
    # tie-heavy marginals; degenerate denominators must NULL identically
    "ordinal_association_status_priority",
    # r13 HL/W1: the 1996 window may leave a half EMPTY (NULL shift /
    # zero-weight grid on both engines) and all-tied quantities put the
    # whole mass on one grid point
    "hodges_lehmann_quantity_shift",
    "wasserstein_quantity_halves",
    # r13 Mood: hostile prices tie heavily, so the pooled median's
    # threshold scan and the above-count dichotomy sit exactly on tie
    # boundaries; a group entirely at the median must zero its a-cell
    "mood_median_test_price_priority",
    # r13 JT: tied quantities exercise the half-weight tie term and the
    # tie-corrected variance; a single populated priority zeroes every
    # ordered pair identically
    "jonckheere_terpstra_priority_trend",
    # r13 Friedman: hostile orders span few months; incomplete blocks
    # (a month missing a priority) must drop identically, and all-tied
    # block values can zero the denominator -> NULL chi2
    "friedman_test_priority_by_month",
    # r13 wave 2: all-tied quantities give every row the same AB score
    # (zero score variance -> NULL z) and an empty half zeroes n1; the
    # Page L permutation moments share Friedman's incomplete-block and
    # all-tied degeneracies
    "ansari_bradley_quantity_halves",
    "page_trend_test_priority_by_month",
    # r13 wave 3: the energy/Cramer integral shares wasserstein's
    # empty-half and single-point degeneracies (zero distance); Qn's
    # doubled-weight grid must count same-value pairs c*(c-1) and the
    # all-tied corpus selects qn_raw = 0 on both engines
    "energy_distance_quantity_halves",
    "qn_scale_quantity_1996",
    # r14 two-sample/eval wave: Cliff's delta and Kuiper share the
    # empty-half degeneracies (NULL delta / NULL V); the exact AUC must
    # NULL (not NaN) when a class is absent and halve ties exactly;
    # Jarque-Bera's 1996 window is EMPTY on the 2024 hostile fixture
    # (all-NULL moments); the inequality indices must survive negative
    # and zero prices via the y > 0 guard and singleton customers
    "cliffs_delta_quantity_halves",
    "kuiper_test_price_halves",
    "roc_auc_discount_returns",
    "jarque_bera_quantity_1996",
    "inequality_indices_customer_revenue",
    # r14 wave 2: partial correlation must NULL (not NaN/error) when a
    # variable is constant (zero variance -> 0/0 under the hostile
    # all-tied shapes) and the huge-magnitude rows stress the HUGEINT
    # moment sums; lambda must NULL on a constant outcome (n == modal)
    "partial_corr_price_quantity_given_discount",
    "goodman_kruskal_lambda_status_priority",
]


@pytest.fixture(scope="module")
def hostile_num_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hostile_num")
    for t in TESTDATA_TABLES:
        if t not in ("orders", "lineitem"):
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")

    from tests.fixture_io import write_naive_parquet

    write_naive_parquet(
        str(root / "orders.parquet"),
        HOSTILE_ORDERS,
        [
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
        ts_cols=["o_orderdate"],
        int_cols=["o_orderkey", "o_custkey"],
    )
    write_naive_parquet(
        str(root / "lineitem.parquet"),
        HOSTILE_LINEITEM,
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        ts_cols=["l_shipdate"],
        int_cols=["l_orderkey", "l_partkey", "l_suppkey"],
        int32_cols=["l_linenumber"],
    )
    return str(root)


@pytest.mark.parametrize("name", _NUMERIC_PANEL)
def test_numeric_family_parity_on_hostile_tables(spark, hostile_num_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(
        queries[name](spark, hostile_num_dir), oracles[name], hostile_num_dir
    )
    assert not problems, f"{name} on hostile numerics: {problems}"


@pytest.fixture(scope="module")
def constant_quantity_dir(spark, tmp_path_factory):
    """Every lineitem has the SAME quantity: all 8 RANSAC pick pairs tie
    on x, so the candidate set is EMPTY (ADVICE r12 medium — the
    generated stack(0, ) was a Spark parse error while the oracle
    cleanly returned 0 rows)."""
    root = tmp_path_factory.mktemp("const_qty")
    for t in TESTDATA_TABLES:
        if t != "lineitem":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    from tests.fixture_io import write_naive_parquet

    rows = [
        [k, k % 7 + 1, k % 3 + 1, 1, 5.0, 100.0 + k, 0.0, 0.0,
         "N", "O", f"1996-01-{k % 9 + 1:02d} 00:00:00"]
        for k in range(1, 25)
    ]
    write_naive_parquet(
        str(root / "lineitem.parquet"),
        rows,
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        ts_cols=["l_shipdate"],
        int_cols=["l_orderkey", "l_partkey", "l_suppkey"],
        int32_cols=["l_linenumber"],
    )
    return str(root)


def test_ransac_empty_candidate_set_matches_oracle(spark, constant_quantity_dir):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    name = "ransac_price_quantity_line"
    df = queries[name](spark, constant_quantity_dir)
    assert df.count() == 0
    problems = compare(df, oracles[name], constant_quantity_dir)
    assert not problems, problems
