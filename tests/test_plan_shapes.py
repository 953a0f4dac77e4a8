"""Plan-shape regression tests — the 100 TB design assertions.

Correctness tests prove the small-SF answer; these prove the *plan* is
the one that survives a 1000-executor scale-up: filters and projections
reach the parquet scan, small dimensions broadcast, top-k never global-
sorts, range joins never degenerate to nested loops, and the relational
hot path contains no Python row evaluation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = relational.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_filter_pushdown(spark):
    plan = _plan(spark, "projection_filter")
    assert "PushedFilters: [" in plan and "EqualTo(l_returnflag,R)" in plan
    # column pruning: the scan must not read the unreferenced wide columns
    assert "l_comment" not in plan
    assert "l_tax" not in plan


def test_pricing_summary_single_shuffle(spark):
    plan = _plan(spark, "pricing_summary")
    assert plan.count("Exchange") == 1  # partial agg -> one shuffle -> final agg
    assert "ReadSchema" in plan and "l_orderkey" not in plan  # pruned scan


def test_top_k_plans_as_take_ordered(spark):
    # O2: ORDER BY ... LIMIT k must be a per-partition heap, not a global sort
    for name in ("flagship_top5_customers_by_order_count", "top_revenue_orders"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_small_dim_join_broadcasts(spark):
    plan = _plan(spark, "left_join_sparse_dim")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_and_asof_joins_never_nested_loop(spark):
    for name in ("range_join_recent_events", "asof_latest_order"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "flagship_top5_customers_by_order_count",
        "pricing_summary",
        "top_revenue_orders",
        "dedup_first_per_order",
        "window_count_per_customer",
        "full_outer_join_composite",
        "surrogate_key_orders",
        "sessionization_stats",
        "time_bucket_rollup_15min",
        "repetition_filter_stats",
        "token_budget_mixture",
    ],
)
def test_relational_hot_path_is_jvm_only(spark, name):
    # UDFs are the slow path: the core suite must contain no Python eval
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, name
    assert "ArrowEvalPython" not in plan, name


def test_exchange_counts_bounded(spark):
    # shuffle budget per operator family: window ops one shuffle,
    # sessionization one shuffle + agg exchange at most
    assert _plan(spark, "window_count_per_customer").count("Exchange") == 1
    assert _plan(spark, "sessionization_stats").count("Exchange") <= 2


def test_merge_upsert_single_shuffle_no_join(spark):
    # MERGE via union + keyed window: exactly one exchange, no join node
    # (the full-outer-join formulation would shuffle both sides).
    plan = _plan(spark, "merge_upsert_orders")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_scd2_single_exchange(spark):
    # Both island row_numbers + the run aggregate + the lead window all
    # reuse the user_id hash partitioning: bounded exchanges.
    plan = _plan(spark, "scd2_user_event_history")
    assert plan.count("Exchange") <= 2


# Queries whose PLAN legitimately contains a nested-loop join: the
# brute-force ANN tiers are a deliberate query-x-corpus cross product
# (broadcast queries, exact scoring), and IVF crosses queries with the
# tiny centroid table.
_NESTED_LOOP_ALLOWED = {
    "ann_cosine_topk",
    "ann_cosine_topk_vectorized",
    "ann_ivf_topk",
    # r11: same deliberate query-sample x corpus broadcast as the ann
    # brute-force tier, with the kNN vote tail
    "knn_loo_label_accuracy",
    # binary prefilter tier: same deliberate broadcast query x corpus
    # scan as the other brute-force ANN tiers (64x smaller state)
    "binary_quantize_hamming_topk",
    # int8 middle tier: same deliberate broadcast query x corpus scan
    # (8x smaller state than doubles, exact integer score)
    "int8_quantized_dot_topk",
    # hard-negative mining: same deliberate broadcast query x corpus
    # scan with a label-inequality predicate riding the join
    "hard_negative_mining_topk",
    # dim x dim dense grid: a deliberate tiny cartesian (5 regions x
    # |statuses|) — the fact side is pre-aggregated before the grid join
    "cross_join_region_status_grid",
    # region-pair inequality join: 5x4/2 rows by construction
    "array_set_ops_region_pairs",
    # 1-row scalar-threshold broadcast (c_acctbal > avg): one comparison
    # per probe row against a single broadcast row — the right plan for
    # a non-equi scalar subquery at any scale
    "q22_inactive_high_balance",
    # 1-row sample-totals broadcast (n1, n2) onto the stepped CDF — the
    # Q22/Q15 scalar pattern replacing the old partition-less window
    "ks_statistic_price_halves",
    # 1-row median/MAD scalar broadcast onto the norms relation
    "embedding_norm_outliers",
    # 1-row order-count scalar broadcast into the lift expression
    "part_affinity_lift",
    # 1-row recency-anchor (MAX date) broadcast onto the orders scan
    "rfm_segment_counts",
    # 1-row corpus-total and max-ratio scalar broadcasts into the
    # per-language keep probabilities
    "temperature_resample_mixture",
    # 1-row budget/n_sources scalar broadcast onto the per-source frame
    "epochs_per_source_schedule",
    # 1-row global-stats broadcast (mean/stddev) joined over the series
    "daily_event_anomalies",
    # 1-row grand-total threshold broadcast over the grouped aggregate
    "q11_important_parts",
    # 1-row bigram grand-total broadcast into the PMI expression
    "top_collocations_pmi",
    # 1-row x 1-row arm-stats combine for the t statistic
    "ab_test_t_statistic",
    # four 1-row step-count/median scalars combined into the single
    # funnel report row; every per-step join is a user-keyed equi-join
    "ordered_funnel_three_step",
    # 1-row node-count broadcast into every rank update (Q15/Q22 scalar
    # pattern); the per-iteration rank/contribution joins are equi-joins
    "pagerank_customer_supplier",
    # 1-row language-counts array broadcast: the interleave position is
    # HOF arithmetic over that array instead of a global-sort window
    "curriculum_interleave_order",
    # PQ tier: 1-row codebook broadcast onto corpus and queries, plus
    # the same deliberate broadcast query x corpus-codes scan as the
    # other ANN tiers (8-byte codes, not vectors, cross the join)
    "ann_pq_adc_topk",
    # RRF fusion: the dense leg is brute_force_topk's deliberate
    # broadcast query x corpus scan (as ann_cosine_topk); the sparse
    # leg and the fusion itself are pure equi-joins
    "hybrid_search_rrf",
    # 7-row lag spine crossed onto the dim-sized day series (the day
    # aggregate contracts the fact table first); the lagged pairing
    # itself is an equi-join on rn +/- lag
    "acf_daily_revenue",
    # (r14 note: cliffs_delta and roc_auc were rewritten to the
    # single-scan stepped-window form — no nested loop at all — so the
    # no-accidental-BNLJ guard covers them like any other query)
    # 1-row sample-totals broadcast onto the stepped CDF (the
    # ks_statistic pattern verbatim)
    "kuiper_test_price_halves",
    # 1-row (n, S) broadcast onto the per-customer revenue relation
    # before the term contraction
    "inequality_indices_customer_revenue",
    # 1-row vocab-size broadcast into the smoothed log-probability
    "bigram_perplexity_by_source",
    # bounded (|sources| x 201) zero-filled bucket grid + 1-row
    # corpus-total/bucket-count broadcasts (the vocab_psi discipline)
    "kl_divergence_source_vs_corpus",
    # 16-row projection-dimension spine crossed onto the sampled-pair
    # diff relation (pairs x dim x k is sample-bounded by design)
    "jl_projection_distortion",
    # four 1-row marginal-maxima scalars combined into the single
    # lambda report row (everything upstream is the <=15-cell grid)
    "goodman_kruskal_lambda_status_priority",
    "ccf_click_vs_purchase",
    # 1-row totals broadcast into the 10-row decile-target spine; the
    # boundary selection is an equi-join on the exact integer targets
    "lorenz_curve_revenue_deciles",
    # 1-row max-key bound + 1-row x 1-row summary combine (Q15/Q22
    # scalar pattern); gap detection itself is the shifted-key anti-join
    "orderkey_sequence_gaps",
    # composes the int8 tier, inheriting its deliberate broadcast
    # query x corpus scan; the recall overlap is a pure equi-join
    "int8_recall_vs_exact",
    # MMR reranks the exact top-k pool: inherits brute_force_topk's
    # deliberate broadcast query x corpus scan; each greedy step's
    # anti-joins are equi-joins on (query_id, cand)
    "mmr_rerank_topk",
    # 1-row (n, S) totals broadcast into the exact CUSUM numerator
    "cusum_changepoint_daily_revenue",
    # truncation gate: two deliberate broadcast query x corpus scans
    # (full-dim and 16-dim), like the other exact ANN tiers
    "matryoshka_truncation_recall",
    # 1-row (t1, t2, n_buckets) totals broadcast into the 21-bucket
    # smoothing expression (Q15/Q22 scalar pattern)
    "vocab_psi_between_sources",
    # 1-row triangle total x 1-row wedge total scalar combine
    "global_clustering_coefficient",
    # composes hybrid_search_rrf, inheriting its dense leg's deliberate
    # broadcast query x corpus scan; the MRR join is a pure equi-join
    "rrf_mrr_vs_dense",
    # r9: 1-row corpus stats (N, avgdl, per-term df) broadcast into the
    # per-document BM25 scoring (Q15/Q22 scalar pattern)
    "bm25_topk_docs",
    # r9: query sample x #labels codebook cross is the IVF probe step —
    # both sides dim-sized, deliberately exhaustive over cells
    "ivf_label_cells_recall_curve",
    # r9: 1-row pair totals x 1-row tie corrections scalar combine over
    # the dense #qx x #dy grid
    "kendall_tau_quantity_discount",
    # r9: 1-row (t_good, t_bad) totals broadcast into per-bin WOE/IV
    "woe_binning_price_returns",
    # r9: the pairwise-slope self-join is an INEQUALITY join over the
    # <=366-row day spine — deliberately dim-sized quadratic (median of
    # pairwise slopes IS the estimator), documented at the operator
    "theil_sen_trend_1996",
    # r9: 1-row sketch state x 1-row exact count scalar combines
    "kmv_distinct_estimate",
    # r9: 1-row (level, trend) smoothing state broadcast onto the
    # 7-row test window (Q15/Q22 scalar pattern)
    "holt_linear_backtest_wape",
    # r11: the same pattern with the 9-field Holt-Winters state
    "holt_winters_backtest_wape",
    # r11: 1-row last-month scalar broadcast onto the hierarchy frame
    "hierarchical_forecast_reconciliation",
    # r11: 1-row (n1, n2) totals broadcast onto the stepped relation
    # (the ks_statistic pattern, integrated variant)
    "cramer_von_mises_price_halves",
    # r11: 1-row tie-term x 1-row rank-sum scalar combine
    "kruskal_wallis_price_by_priority",
    # r11: 1-row revenue-total + 1-row seat-shortfall broadcasts onto
    # the |nations| quota frame
    "largest_remainder_apportionment",
    # r11: the 5-row degree-threshold dim broadcast onto the degree /
    # edge frames (deliberate dim-grid, thresholds are constants)
    "rich_club_coefficient",
    # r11: 1-row max-date censoring scalar broadcast onto the
    # per-customer duration frame (the kaplan_meier pattern)
    "nelson_aalen_repurchase_hazard",
    # r11: 1-row weight-total + 1-row shortfall broadcasts onto the
    # |strata| quota frame (the apportionment pattern)
    "neyman_allocation_sample_sizes",
    # r11: 1-row max-drawdown scalar broadcast back for the trough
    # argmax over the day spine
    "max_drawdown_daily_revenue",
    # r11: theta/common/exact are three 1-row scalar combines over the
    # <=k-row sketch frames (the kmv_distinct 1x1 pattern)
    "kmv_intersection_estimate",
    # r11: 1-row max-date censoring scalar broadcast (the KM pattern)
    "log_rank_test_repurchase",
    # r11: 1-row margin-target broadcast onto every raking half-step
    # (12 of them, each over the |nations| x |segments| cell frame)
    "ipf_raking_weights",
    # r11: the stationary query's 1-row type-count scalar, twice (seed
    # + final entropy combine)
    "markov_entropy_rate",
    # r11: 1-row total-moments broadcast onto the 5-row fold frame
    # (the totals-minus-fold identity)
    "kfold_cv_ols_rmse",
    # r11: 1-row newest-ship-date scalar broadcast onto the scan for
    # the integer decay ages (the Croston calendar-bounds pattern)
    "trending_parts_decayed",
    # r11: 10-row digit frame x 1-row total scalar
    "last_digit_uniformity_audit",
    # r11: seven (1-row child-count x 1-row orphan-count) scalar
    # combines, one per FK edge of the tagged union
    "referential_integrity_dashboard",
    # r11: four 1-row size/count scalars combined for the FPR algebra
    "bloom_fpr_calibration",
    # r11: the day-spine pair enumeration is a deliberate bounded
    # quadratic on the calendar dim (the Burrows word-grid class),
    # plus 1-row S/ties/n scalar combines
    "mann_kendall_trend_daily",
    # r11: 1-row (total, cell-count) scalar broadcast onto the
    # dim-grid cell frame for the closed-form balance weights
    "kish_design_effect",
    # r11: 1-row max-date censoring scalar (the KM pattern) feeding
    # the duration build
    "weibull_rank_regression_fit",
    # r11: three 1-row entropy scalars combined for the MI identity,
    # plus the 1-row total onto the dim-sized cell/marginal frames
    "theils_u_status_priority",
    # r9: 1-row point-lift estimate broadcast onto the 16-replica frame
    "ab_lift_bootstrap_range",
    # r10: 1-row k-th-threshold broadcast for DSIR's top-k selection
    # (the Q22 scalar pattern; weights themselves are equi-joins)
    "dsir_importance_weights",
    # r10: 1-row MAX-date censoring-horizon broadcast (the
    # rfm_segment_counts recency-anchor pattern)
    "kaplan_meier_repurchase",
    # r10: 1-row totals x 1-row chance-agreement combine (the
    # ab_test_t_statistic scalar pattern)
    "cohens_kappa_langid",
    # r10: 1-row global-train-rate broadcast onto the eval scan plus the
    # final 1-row x 1-row direct-vs-decomposition combine
    "brier_decomposition_returns",
    # r10: 1-row max-partkey vocabulary-bound broadcast onto the
    # positives frame (the rfm recency-anchor pattern)
    "cf_negative_sampling",
    # r10: 1-row corpus-horizon (MAX month) broadcast onto the churn
    # frame (the rfm recency-anchor pattern)
    "growth_accounting_monthly",
    # r10: 1-row sum-vector energy x 1-row count combine (closed-form
    # pairwise mean — no pairwise join exists in this plan at all)
    "embedding_isotropy_report",
    # r10: 1-row type-count broadcast seeding the uniform pi0 (the
    # pagerank node-count scalar pattern); every iteration join is a
    # type-keyed equi-join
    "markov_stationary_event_types",
    # r10: deliberate O(|x|^2) span grid over the DISTINCT-QUANTITY dim
    # frame (the minimax isotonic characterization; fact data contracts
    # first — the cross_join_region_status_grid dim-grid pattern)
    "isotonic_price_vs_quantity",
    # r10: 1-row dim-count seed + 1-row Rayleigh combine on the
    # dim-bounded power iteration
    "covariance_power_iteration",
    # r10: 1-row budget/level scalars broadcast onto the |sources| frame
    "water_filling_token_caps",
    # r11: 1-row basket-count (n_orders) broadcast onto the support-
    # floored rule pairs (lift denominator — the pagerank node-count
    # scalar pattern); both metric joins are broadcast equi-joins
    "association_rules_part_pairs",
    # r11: 1-row corpus-stats (|C|, per-term cf) broadcast onto the
    # per-doc feature scan — the bm25_topk_docs pattern exactly
    "query_likelihood_dirichlet_topk",
    # r11: 1-row bigram-type-count broadcast onto the scored stream
    # (the KN continuation-probability denominator)
    "kneser_ney_bigram_scores",
    # r11: 1-row (N, r, c) margin-totals broadcast onto the bounded
    # |status| x |priority| cell table
    "chi2_independence_status_priority",
    # r11: 1-row (n1, n2) totals broadcast onto the distinct-value
    # stepped relation (the KS integer-deviation argmax)
    "ks_statistic_price_halves",
    # r11: 1-row max-normalization scalar broadcast per HITS half-step
    # (the pagerank node-count scalar pattern, 8 of them)
    "hits_customer_supplier",
    # r11: 1-row pooled-moments broadcast onto the |nations| strata
    # frame (the exact-decimal sign comparison needs both sets of
    # moments on every row)
    "simpsons_paradox_slopes",
    # r11: |sources| x top-20-words dense grid (a deliberate dim-grid
    # cross join, the cross_join_region_status_grid pattern) so absent
    # words enter as exact 0 frequencies
    "burrows_delta_sources",
    # r11: 1-row global band-distribution broadcast onto the bounded
    # quasi-identifier class table (the ordered-EMD reference)
    "t_closeness_audit",
    # r11: 1-row (n_cells, total-points) broadcast onto the grid-sized
    # cell table for the all-integer density threshold (the water-
    # filling budget-scalar pattern)
    "grid_density_clusters",
    # r11: the 4-channel x 16-coalition Shapley kernel is a deliberate
    # dim-grid join (64 rows, data-size-independent — the
    # cross_join_region_status_grid pattern); the fact table feeds it
    # through one grouped bit_or aggregate only
    "shapley_channel_attribution",
    # r11: 1-row pooled-size (N) scalar broadcast onto the ranked frame
    # for the integer position arithmetic (the water-filling pattern)
    "quantile_normalize_prices",
    # r11: the 5-row chain-tag broadcast onto the dim-sized transition
    # table (deliberate dim-grid, builds all removal chains in one
    # frame) + the 1-row full-chain baseline broadcast at the end
    "markov_removal_attribution",
    # r11: 1-row calendar-bounds broadcast (day0 + span) onto the scan
    # and onto the |types| fold frame (the water-filling pattern)
    "croston_intermittent_demand",
    # r11: 1-row corpus-token-total broadcast onto the (source, word)
    # contraction for the G^2 expectations (the bm25 corpus-stats
    # pattern)
    "dunning_llr_keyness",
    # r12: 1-row global-moments / scalar broadcasts onto dim-sized
    # series frames (the water-filling budget-scalar pattern): the
    # 7-lag grid x the ~2.4k-day series (ljung_box), the diff-moments
    # scalar (durbin_watson), the regime-split scalar (chow), the
    # 142-literal phase table against the day spine (periodogram),
    # the 1-row prior onto the ~25-row brand frame (eb_shrunk), the
    # bucket-cumsum quantile probe (ddsketch), the 1-row population
    # total (randomized_response, priority_sample, hll), the dim^2
    # covariance scalars (linear_cka), and the 8-candidate vote
    # broadcast (ransac)
    "ljung_box_daily_revenue",
    "durbin_watson_daily_trend",
    "chow_break_daily_trend",
    "periodogram_daily_revenue",
    "eb_shrunk_return_rates_brand",
    "ddsketch_quantiles_price",
    "randomized_response_status",
    "priority_sample_revenue_total",
    "linear_cka_truncation",
    "hll_md5_registers_distinct",
    "ransac_price_quantity_line",
    # r12: the 5x5 priority pair grid is a deliberate inequality join
    # on a 5-row contraction (the burrows_delta dim-grid pattern)
    "tukey_hsd_price_priority",
    # r12: 1-row max-excursion scalar broadcast onto the day series for
    # the peak/alarm argmins (the water-filling budget-scalar pattern)
    "page_hinkley_daily_revenue",
    # r13: the brute-force evaluation tier broadcasts the query batch
    # with a non-equi (query_id != neighbor_id) predicate — the exact
    # ann_cosine_topk pattern; tiers 2-3 are candidate-sized equi-joins
    "retrieval_cascade_recall",
    # r13: deliberate dim-grid cross joins on contractions (the
    # cross_join_region_status_grid pattern): the 15x15 contingency
    # cell pair grid (ordinal), the <=50x50 value-difference grid
    # (hodges_lehmann), the 5x50 zero-filled priority/quantity grid
    # (jonckheere), the |sources| x |langs| grid (hellinger)
    "ordinal_association_status_priority",
    "hodges_lehmann_quantity_shift",
    "jonckheere_terpstra_priority_trend",
    "hellinger_lang_mix_by_source_pair",
    # r13: 1-row scalar broadcasts onto grid-sized frames (the
    # water-filling budget-scalar pattern): total-weight W onto the
    # difference grid (wasserstein), the pooled median onto the cell
    # table (mood), block-count/treatment-count onto the rank sums
    # (friedman)
    "wasserstein_quantity_halves",
    "mood_median_test_price_priority",
    "friedman_test_priority_by_month",
    # r13 wave 2: 1-row N/moment scalar broadcasts onto the ~50-row
    # value grid (ansari_bradley) and onto the rank-sum frame (page)
    "ansari_bradley_quantity_halves",
    "page_trend_test_priority_by_month",
    # r13 wave 3: scalar/grid broadcasts again — total-weight onto the
    # difference grid (energy, qn) and the 12-row checkpoint grid onto
    # the doc-rank / first-seen contractions (heaps)
    "energy_distance_quantity_halves",
    "qn_scale_quantity_1996",
    "heaps_vocab_growth_checkpoints",
    # r15: the same two deliberate patterns again — 1-row scalar
    # broadcasts (totals onto the value grid for AD; n onto the day
    # grid for pettitt; T/dy and S1 onto the horizon rows for VR; n
    # onto the pair-cell grid for hoeffding; voc/total/threshold
    # scalars for ccnet) and tiny lit-grid fanouts (the 4-row q/size
    # frames onto the day grid for VR/hurst, the 50x11 zero-fill
    # xs-x-ys grid for hoeffding — the cross_join_region_status_grid
    # pattern).  average_precision and semdedup_sharded compile clean.
    "anderson_darling_price_halves",
    "pettitt_changepoint_daily_revenue",
    "variance_ratio_daily_revenue",
    "hurst_exponent_daily_revenue",
    "hoeffding_d_quantity_discount",
    "ccnet_perplexity_buckets",
}


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in relational.QUERIES
        if not n.startswith("streaming_") and n not in _NESTED_LOOP_ALLOWED
    ),
)
def test_no_accidental_nested_loop_joins(spark, name):
    # A CartesianProduct or BroadcastNestedLoopJoin anywhere else means a
    # join predicate failed to become an equi-join key — fatal at 100 TB.
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_are_respected(spark):
    """Join hints steer the physical strategy: BROADCAST forces a
    BroadcastHashJoin, SHUFFLE_MERGE forces a SortMergeJoin — the manual
    overrides for when stats mislead the planner at scale."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    c = load(spark, SF_SMOKE, "customer")
    o = load(spark, SF_SMOKE, "orders")

    broadcast_plan = o.join(
        c.hint("broadcast"), o.o_custkey == c.c_custkey
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in broadcast_plan

    smj_plan = o.join(
        c.hint("shuffle_merge"), o.o_custkey == c.c_custkey
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in smj_plan


def test_cache_table_plan_and_release(spark):
    """catalog.cacheTable materializes an InMemoryRelation reused by
    later plans; uncache releases it — the explicit reuse surface for
    iterative consumers (lineage stays intact for recompute)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import (
        register_views,
    )
    from tests.conftest import SF_SMOKE

    register_views(spark, SF_SMOKE)
    spark.catalog.cacheTable("nation")
    try:
        assert spark.catalog.isCached("nation")
        df = spark.table("nation").groupBy("n_regionkey").count()
        df.collect()  # materialize the cache, finalize the AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "In-memory table" in plan
    finally:
        spark.catalog.uncacheTable("nation")
    assert not spark.catalog.isCached("nation")


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter injection: a selective dimension filter puts
    a bloom_filter_agg semi-filter on the fact side of a shuffle join,
    so most fact rows drop BEFORE the exchange — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    matching slice.  (Broadcast joins don't need it, so the test pins a
    shuffle join.)"""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load(spark, SF_SMOKE, "orders").filter(F.col("o_totalprice") > 350000)
        l = load(spark, SF_SMOKE, "lineitem")
        plan = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_checkpoint_truncates_lineage(spark, tmp_path):
    """df.checkpoint() persists to reliable storage and cuts the logical
    plan back to a scan of the checkpointed data — the lineage-control
    tool for iterative pipelines whose plans would otherwise grow per
    iteration (localCheckpoint variant used by operators/graph.py)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = (
        load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .count()
        .checkpoint(eager=True)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # post-checkpoint plan scans the materialized RDD, not the parquet
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "parquet" not in plan.lower()
    assert df.count() == 3  # and it still answers


def test_accumulator_counts_batches_processed(spark):
    """Accumulators: executor-side counters visible on the driver after
    an action — the standard bad-record/bytes-processed telemetry
    channel for Arrow-batched Python operators."""
    import pandas as pd

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from tests.conftest import SF_SMOKE

    rows_seen = spark.sparkContext.accumulator(0)

    def tag(batches):
        for pdf in batches:
            rows_seen.add(len(pdf))
            yield pdf.assign(flagged=pdf["o_totalprice"] < 0)

    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    out = o.mapInPandas(tag, "o_orderkey long, o_totalprice double, flagged boolean")
    n = out.count()
    assert rows_seen.value == n == o.count()


# ---------------------------------------------------------------------------
# TPC-H suite (plans/tpch_suite.py) — star-join physical shape.
# ---------------------------------------------------------------------------


def test_q5_star_join_broadcasts_all_dims(spark):
    # Q5: region/nation/customer/supplier are broadcast; the only
    # shuffle-worthy join is lineitem |><| orders.
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q6_is_scan_plus_single_aggregate(spark):
    # Q6 is the purest scan-shape: pushed predicates, no join, and the
    # only exchange is the 1-row final-aggregate combine.
    plan = _plan(spark, "q6_forecast_revenue")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_q8_single_fact_shuffle(spark):
    # Every dimension (part, supplier+nation, customer-in-region)
    # broadcasts; lineitem should shuffle at most for the orders join
    # and the year aggregate.
    plan = _plan(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan


def test_q10_topk_is_take_ordered(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_max_threshold_is_broadcast_not_collect(spark):
    # The MAX-revenue scalar rides a broadcast join — the plan must not
    # contain a cartesian/nested-loop product and needs two aggregates
    # (per-supplier revenue + its max) feeding a broadcast.
    plan = _plan(spark, "q15_top_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q22_anti_join_physical(spark):
    # The NOT EXISTS must be a broadcast anti join; the only nested-loop
    # element allowed is the 1-row scalar-threshold broadcast.
    plan = _plan(spark, "q22_inactive_high_balance")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_analyze_table_stats_feed_cbo(spark, tmp_path):
    """ANALYZE TABLE persists row counts + column NDV/min/max into the
    catalog, and with CBO enabled the optimizer's cardinality estimates
    come from those stats — the foundation of stats-driven join
    reordering at scale (file size alone misestimates filtered scans)."""
    import uuid

    tbl = f"cbo_probe_{uuid.uuid4().hex[:8]}"
    try:
        spark.range(0, 10_000).selectExpr(
            "id", "id % 7 AS g", "CAST(id AS DOUBLE) * 1.5 AS v"
        ).write.saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS id, g, v")

        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        }
        assert "10000 rows" in detail["Statistics"]

        gstats = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl} g").collect()
        }
        assert gstats["distinct_count"] == "7"
        assert gstats["min"] == "0" and gstats["max"] == "6"

        with _cbo(spark):
            est = (
                spark.table(tbl)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .rowCount()
            )
            assert est.isDefined() and int(str(est.get())) == 10_000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


from contextlib import contextmanager


@contextmanager
def _cbo(spark):
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)


def test_nested_schema_pruning_reads_one_subfield(spark, tmp_path):
    """Nested-column pruning: selecting one struct subfield must scan
    ONLY that leaf (ReadSchema shows the pruned struct) — on 100 TB
    lakes with wide event structs this is the difference between reading
    kilobytes and terabytes per row group."""
    import os

    path = os.path.join(tmp_path, "nested")
    spark.range(0, 1000).selectExpr(
        "id",
        "named_struct('a', id * 2, 'b', CAST(id AS STRING), "
        "'big', repeat('x', 100)) AS payload",
    ).write.parquet(path)

    df = spark.read.parquet(path).select("payload.a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    assert "payload:struct<a:bigint>" in plan.replace(" ", "")
    # the wide leaves never reach the scan schema
    assert "big:string" not in plan.replace(" ", "")
    assert "b:string" not in plan.replace(" ", "")


def test_bucket_pruning_scans_selected_buckets(spark, tmp_path):
    """Bucket pruning: an equality predicate on the bucketing key scans
    only the matching bucket files (SelectedBucketsCount in the scan) —
    the static sibling of partition pruning for high-cardinality keys."""
    import os
    import uuid

    from data_engineering_sf_mobile_food_facilities_public_spark.sources.bucketed import write_bucketed

    name = f"bucket_prune_{uuid.uuid4().hex[:8]}"
    try:
        df = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS v")
        write_bucketed(df, name, os.path.join(tmp_path, name), "k", 8)
        # the planner auto-disables bucketed scans that bring no
        # distribution benefit; pin it on so the filter can bucket-prune
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            plan = (
                spark.table(name)
                .filter(F.col("k") == 42)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "SelectedBucketsCount: 1 out of 8" in plan
        finally:
            spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_distribute_and_cluster_by_sql_layout(spark):
    """DISTRIBUTE BY / CLUSTER BY SQL: explicit layout control compiles
    to a hash repartition (and local sort for CLUSTER BY) — the SQL
    surface for pre-shuffling ahead of co-partitioned consumers."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import register_views

    register_views(spark, SF_SMOKE)
    dist = spark.sql(
        "SELECT o_custkey, o_totalprice FROM orders DISTRIBUTE BY o_custkey"
    )
    dplan = dist._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" in dplan

    clus = spark.sql(
        "SELECT o_custkey, o_totalprice FROM orders CLUSTER BY o_custkey"
    )
    cplan = clus._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" in cplan
    assert "Sort [o_custkey" in cplan


def test_q18_scans_lineitem_exactly_once(spark):
    """Round-4 regression guard: q18's old shape semi-joined lineitem
    against its own HAVING keys, scanning the biggest table twice (7.4x
    slower once ~20% of orders qualified).  The aggregate-once rewrite
    must keep exactly one lineitem scan and no semi-joins."""
    plan = _plan(spark, "q18_large_volume_customers")
    assert plan.count("lineitem.parquet") == 1, "lineitem must be scanned once"
    assert "LeftSemi" not in plan


def test_repetition_stats_zero_shuffle_single_scan(spark):
    """Per-document stats must never explode-and-reaggregate: the array
    HOF formulation computes bigram repetition inside one narrow
    projection — no Exchange, one scan, no Python eval."""
    plan = _plan(spark, "repetition_filter_stats")
    assert "Exchange" not in plan
    assert plan.count("documents.parquet") == 1
    assert "EvalPython" not in plan


@pytest.mark.parametrize(
    "name", ["token_budget_mixture", "corpus_curation_pipeline"]
)
def test_mixture_cumsum_has_no_per_group_sequential_window(spark, name):
    """The per-language running sum must run as the two-pass
    range-partition decomposition (grouped_running_sum), never as a
    ``Window.partitionBy(lang)`` over the corpus — that funnels each
    language through ONE task, a sequential bottleneck at 100 TB.  The
    full-data window (ordered by h, doc_id) must be partitioned by
    (__bucket, lang); the only lang-partitioned window allowed is the
    tiny per-bucket offsets aggregate (ordered by __bucket)."""
    import re

    plan = _plan(spark, name)
    # corpus-sized window partitioned by lang alone = the bottleneck
    assert not re.search(r"\], \[lang#\d+\], \[h#", plan), name
    # the scalable local window: partitioned by (__bucket, lang)
    assert re.search(r"\], \[__bucket#\d+, lang#\d+\], \[h#", plan), name
    assert "EvalPython" not in plan


def test_ks_statistic_has_no_global_order_window(spark):
    """The KS statistic's two CDF counters must run as the constant-key
    two-pass range-partition cumsum, never as a ``Window.orderBy(x)``
    over the distinct-value set (a single sequential task at scale).
    The only windows allowed are the per-``(__bucket, …)`` local running
    sum and the #buckets-row offsets aggregate ordered by __bucket."""
    import re

    plan = _plan(spark, "ks_statistic_price_halves")
    # a window whose spec LEADS with the value order = global cum window
    assert not re.search(r"windowspecdefinition\(x#\d+ ASC", plan)
    # the scalable local window: partitioned by __bucket, ordered by x
    assert re.search(r"windowspecdefinition\(__bucket#\d+,.*x#\d+ ASC", plan)
    assert "EvalPython" not in plan


def test_curation_pipeline_fuses_filter_and_holds_no_cache(spark):
    """The composed repetition-filter -> token-budget pipeline must fuse
    the filter into the mixture's scan (per-row HOF stats, no join
    between the stages), and — since the cumsum decomposition derives
    bucket ids from the data itself (broadcast cut points) — the plan
    must hold NO cache: determinism is by algebra, not pinned physical
    state, and at 100 TB caching the corpus is the non-scalable path."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

    df = relational.QUERIES["corpus_curation_pipeline"](spark, SF_SMOKE)
    df.collect()  # materialize: AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "InMemoryTableScan" not in plan
    assert "EvalPython" not in plan


def test_bitmap_distinct_two_level_merge_shape(spark):
    """The mergeable-bitmap distinct must keep its two-level shape: a
    partial bitmap_construct_agg per (flag, bucket) BEFORE the exchange
    (map-side combine — at 100 TB the shuffle carries one bitmap per
    bucket per task, never raw part keys), then one final merge + count.
    Exactly two exchanges: (flag,bucket) then (flag).  Pinned after the
    r01->r06 0.41s->0.54s bench drift was adjudicated as machine noise —
    this asserts the plan itself cannot silently regress."""
    plan = _plan(spark, "bitmap_distinct_parts_by_flag")
    assert plan.count("Exchange") == 2
    assert plan.count("partial_bitmap_construct_agg") >= 1  # map-side combine
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_q4_exists_plans_as_single_semi_join_one_scan(spark):
    """Q4's EXISTS must be ONE left-semi probe over one lineitem scan —
    never a join-then-distinct (which multiplies rows before collapsing
    them) — and the cross-relation lateness predicate must ride the
    join, not a post-join filter."""
    plan = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_q16_not_in_plans_as_broadcast_anti_join(spark):
    """Q16's NOT-IN blacklist (non-nullable PK both sides) must plan as
    a broadcast LEFT ANTI join, never a null-aware nested loop."""
    plan = _plan(spark, "q16_parts_supplier_relationship")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_q21_semi_anti_pair_and_heap_topk(spark):
    """Q21's EXISTS/NOT-EXISTS pair must plan as exactly one LeftSemi
    and one LeftAnti, and the final ORDER BY..LIMIT as a per-partition
    heap (TakeOrderedAndProject), never a global sort."""
    plan = _plan(spark, "q21_suppliers_kept_waiting")
    assert plan.count("LeftSemi") == 1
    assert plan.count("LeftAnti") == 1
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_q2_correlated_min_decorrelates_to_joins(spark):
    """Q2's correlated scalar-MIN must decorrelate: the per-part minimum
    re-aggregates the grouped cost relation and equi-joins back — no
    nested-loop re-scan per part, dims broadcast, top-100 as a heap."""
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "EvalPython" not in plan


def test_sequence_packing_has_no_global_order_window(spark):
    """The packer's global token running sum must be the constant-key
    two-pass bucketed cumsum, never a partition-less ``Window.orderBy``
    (one sequential task over the whole corpus).  Same contract as the
    KS statistic: the only windows allowed are the per-(__bucket, …)
    local running sum and the tiny per-bucket offsets aggregate."""
    import re

    plan = _plan(spark, "sequence_packing_bins")
    assert not re.search(r"windowspecdefinition\(h#\d+ ASC", plan)
    assert re.search(r"windowspecdefinition\(__bucket#\d+,", plan)
    assert "EvalPython" not in plan


def test_simhash64_candidates_are_banded_equi_join(spark):
    """SimHash near-dup candidates must come from an equi-join on the
    (band_idx, band_val) keys — a hash-partitioned shuffle of signature
    rows — never an all-pairs nested loop over documents, and the
    Hamming filter must be codegen'd bit arithmetic, not Python."""
    plan = _plan(spark, "simhash64_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_ohlc_rollup_is_single_mergeable_aggregate(spark):
    """All five OHLC aggregates (min_by/max/min/max_by/count) must run
    in ONE hash aggregate with map-side partials — exactly one exchange,
    one events scan, no window, no Python."""
    plan = _plan(spark, "ohlc_hourly_by_type")
    assert plan.count("Exchange") == 1
    assert plan.count("events.parquet") == 1
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_corpus_report_is_one_expand_one_shuffle(spark):
    """The GROUPING SETS datasheet must be a single Expand feeding one
    aggregate exchange — never three scans or three shuffles."""
    plan = _plan(spark, "corpus_statistics_report")
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("documents.parquet") == 1
    assert "EvalPython" not in plan


def test_poisson_bootstrap_is_expand_plus_one_aggregate(spark):
    """The bootstrap's claim — 16 replicas from two narrow expressions
    and ONE aggregate — must hold in the plan: the replica explode is a
    Generate over the scan (no join, no extra shuffle) and the replica
    means cost exactly one exchange."""
    plan = _plan(spark, "poisson_bootstrap_mean_price")
    assert "Generate" in plan  # explode(sequence(...)) fused over the scan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_vocab_overlap_global_topk_is_heap_not_window(spark):
    """The corpus-wide top-25 vocabulary must plan as a TakeOrdered
    heap (per-partition top-k then merge), never an unpartitioned rank
    window over the vocabulary; the per-source ranks stay partitioned
    by source; no Python eval."""
    plan = _plan(spark, "vocab_topk_overlap_by_source")
    assert "TakeOrderedAndProject" in plan
    import re

    # no windowspec that lacks a partition key (global rank)
    assert not re.search(r"windowspecdefinition\(c#\d+", plan)
    assert "EvalPython" not in plan


def test_span_decontamination_window_is_per_document(spark):
    """The gaps-and-islands run compression must window PER DOCUMENT
    (bounded by doc length) — never corpus-wide — and the benchmark
    probe must be an equi-join on the shingle, not a nested loop."""
    import re

    plan = _plan(spark, "benchmark_span_decontamination")
    assert re.search(r"windowspecdefinition\(doc_id#\d+", plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_label_centroids_pairwise_touches_only_dim_frames(spark):
    """The centroid pairwise stage must join the (#labels x dim)
    aggregates, never corpus rows: exactly one embeddings scan per
    branch feeding a partial-agg exchange, and the pair join carries no
    corpus-sized side."""
    plan = _plan(spark, "embedding_label_centroids")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_chunker_is_pure_scan_side_no_shuffle(spark):
    """The RAG chunker must be a pure scan-side row expansion: zero
    exchanges, one documents scan, no Python eval — the shape that makes
    it free to fuse under any downstream index build."""
    plan = _plan(spark, "chunk_documents_overlapping")
    assert "Exchange" not in plan
    assert plan.count("documents.parquet") == 1
    assert "EvalPython" not in plan


def test_curriculum_interleave_avoids_both_oracle_windows(spark):
    """The curriculum order's oracle uses two scale-trap windows: a
    per-language ROW_NUMBER (one sequential task per language) and a
    global ROW_NUMBER (single-task total sort).  The engine must run
    NEITHER: the rank comes from the bucketed running-count (windows
    partitioned by (__bucket, lang), bounded per task), and the global
    position is HOF arithmetic over a 1-row broadcast language-counts
    array — the plan's only nested-loop join."""
    import re

    plan = _plan(spark, "curriculum_interleave_order")
    assert "row_number" not in plan  # both oracle windows replaced
    # corpus-sized windows must lead with __bucket, never lang alone
    assert re.search(r"windowspecdefinition\(__bucket#\d+", plan)
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row array
    assert "aggregate(" in plan  # HOF position arithmetic
    assert "EvalPython" not in plan


def test_datasheet_single_pass_no_windows(spark):
    """The per-(source, lang) datasheet must be ONE aggregation pass over
    ONE documents scan: partial agg -> exchange on the distinct key ->
    merge -> exchange on the group key -> final.  No windows, no joins,
    no second scan — at 100 TB this is a nightly telemetry query whose
    whole cost is the scan."""
    plan = _plan(spark, "dataset_datasheet_by_source")
    assert plan.count("documents.parquet") == 1
    assert plan.count("Exchange") == 2  # two-phase distinct aggregate
    assert "Window" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_rolling_distinct_users_linear_single_scan(spark):
    """The 7-day rolling distinct must be ONE linear chain: events
    aggregate once into per-(day, bucket) bitmap partials (map-side
    combined), the x7 explode runs on that day-sized relation, and DAU
    rides the same OR-merge as self-flagged bitmaps — no day-spine
    join, no second events scan (the branched formulation re-scanned
    events six times), exactly three exchanges, every one dim-sized
    after the first."""
    plan = _plan(spark, "rolling_7day_active_users")
    assert plan.count("events.parquet") == 1
    assert plan.count("Exchange") == 3
    assert "Join" not in plan
    assert "partial_bitmap_construct_agg" in plan  # map-side combine
    assert "partial_bitmap_or_agg" in plan  # merge is also two-phase
    assert "EvalPython" not in plan

def _shuffle_exchanges_with_child(plan: str) -> list[tuple[str, str]]:
    """(exchange line, first-child line) for every SHUFFLE exchange
    (``Exchange hashpartitioning``/``rangepartitioning`` — broadcast
    exchanges excluded) in a physical-plan tree string.  In
    ``executedPlan().toString()`` a node's first child is the next
    non-empty line."""
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    out = []
    for i, ln in enumerate(lines):
        if "Exchange " in ln and "BroadcastExchange" not in ln and "ReusedExchange" not in ln:
            out.append((ln, lines[i + 1] if i + 1 < len(lines) else ""))
    return out


@pytest.mark.parametrize(
    "name",
    [
        "token_budget_mixture",
        "corpus_curation_pipeline",
        "sequence_packing_bins",
        "surrogate_key_orders",
    ],
)
def test_bucketed_cumsum_single_full_width_shuffle(spark, name):
    """The two-pass bucketed cumsum must pay exactly ONE full-width
    shuffle: the window's required hashpartitioning(__bucket, group).
    Every OTHER shuffle exchange must sit ABOVE a HashAggregate (the
    offsets branch partial-aggregates map-side, so only ~#buckets x
    #groups pre-aggregated rows cross the wire).  Pinned after r8,
    where an explicit pre-branch repartition intended for ReuseExchange
    never actually reused (the branches prune different columns, so the
    canonicalized exchanges differ) and the offsets branch silently
    paid a second corpus-wide shuffle."""
    plan = _plan(spark, name)
    pairs = _shuffle_exchanges_with_child(plan)
    assert pairs, name
    full_width = [ex for ex, child in pairs if "HashAggregate" not in child]
    aggregated_pairs = [(ex, child) for ex, child in pairs if "HashAggregate" in child]
    assert len(full_width) == 1, (
        f"{name}: want exactly 1 non-aggregated (full-width) shuffle, got "
        f"{len(full_width)}: {full_width}"
    )
    # the map-side combine must actually be partial (at least one
    # shuffle carries pre-aggregated rows, not raw ones); the OTHER
    # aggregated exchange — bucket totals re-shuffled for the running
    # offset join — is legitimately fed by a FINAL HashAggregate
    assert aggregated_pairs, name
    assert any("partial_" in child for _, child in aggregated_pairs), (
        f"{name}: no aggregated shuffle fed by a map-side partial combine: "
        f"{aggregated_pairs}"
    )
    assert "EvalPython" not in plan


def test_bucket_lookup_codegen_stable_past_flat_cap(spark):
    """Large-cut-count regime (driver-vanilla 200+ shuffle partitions on
    inputs past the sample cap): the bucket lookup must NOT degrade to
    interpreted eval.  The old single nested-CASE tree at ~400 cuts
    exceeds Janino's 64 KB method limit; the two-level form (bounded
    coarse tree + broadcast HASH equi-join to a fine-cut lookup +
    bounded fine tree) must (a) compile under CODEGEN_ONLY with
    fallback disabled — a compile failure throws here instead of
    silently interpreting — (b) produce exactly the single-window
    semantics, and (c) contain no nested-loop join."""
    from pyspark.sql import Window

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        _FLAT_CUTS_MAX,
        _range_cuts,
        grouped_running_sum,
        surrogate_key,
    )

    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    # sample of 1024 from 20k rows binds exactly -> no bucket shrink ->
    # ~399 cuts, well past the flat codegen-safe cap
    cuts = _range_cuts(df, ["lang", "h", "doc_id"], 400, 1024)
    assert len(cuts) > _FLAT_CUTS_MAX, len(cuts)

    old = {
        "spark.sql.codegen.fallback": spark.conf.get("spark.sql.codegen.fallback", "true"),
        "spark.sql.codegen.factoryMode": spark.conf.get(
            "spark.sql.codegen.factoryMode", "FALLBACK"
        ),
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        out = grouped_running_sum(
            df, "lang", ["h", "doc_id"], "n_tokens", "cum",
            n_buckets=400, sample_size=1024,
        )
        w = (
            Window.partitionBy("lang")
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ref = df.withColumn("cum", F.sum("n_tokens").over(w))
        cols = ["doc_id", "lang", "n_tokens", "cum"]
        assert out.select(cols).exceptAll(ref.select(cols)).count() == 0
        assert ref.select(cols).exceptAll(out.select(cols)).count() == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "BroadcastHashJoin" in plan  # the fine-cut lookup join

        sk = surrogate_key(
            df, ["h", "doc_id"], "sid", n_buckets=400, sample_size=1024
        )
        refk = df.withColumn(
            "sid",
            (F.row_number().over(Window.orderBy("h", "doc_id")) - 1).cast("long"),
        )
        skc = ["doc_id", "lang", "n_tokens", "h", "sid"]
        assert sk.select(skc).exceptAll(refk.select(skc)).count() == 0
        assert refk.select(skc).exceptAll(sk.select(skc)).count() == 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_priority_sample_is_take_ordered_not_global_sort(spark):
    # DLT priority sampling: both the K+1 and K cuts must compile to
    # per-partition heaps (TakeOrderedAndProject) — a global Sort would
    # materialize the full fact ordering at 100 TB for a 64-row sample
    plan = _plan(spark, "priority_sample_revenue_total")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [pq" not in plan


def test_linear_cka_contracts_map_side_and_broadcasts_scalars(spark):
    # the dim^2 covariance build must contract via partial aggregation
    # (map-side combine on (i, j)) and the per-dim sums / scalar frames
    # must broadcast — no sort-merge join on the exploded pair frame
    plan = _plan(spark, "linear_cka_truncation")
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hll_sketch_reduction_is_register_sized(spark):
    # the whole reduction is one grouped MAX over 256 register keys —
    # exactly two aggregation exchanges (registers, then the 1-row
    # harmonic sum) plus the exact-twin audit aggregate; no join of
    # fact-sized frames
    plan = _plan(spark, "hll_md5_registers_distinct")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 6


def test_bottleneck_recursion_reads_materialized_edges(spark):
    # the recursive CTE must recurse over the localCheckpointed edge
    # contraction (an RDD scan), NOT re-run the 5-way fact join per
    # UnionLoop level: at most one lineitem scan may appear (from the
    # eager checkpoint build happening before this plan), and the
    # recursion body must reference the scanned-RDD edge view
    plan = _plan(spark, "recursive_cte_bottleneck_routes")
    assert plan.count("lineitem") == 0  # edges pre-materialized
    assert "Scan ExistingRDD" in plan or "UnionLoop" in plan
