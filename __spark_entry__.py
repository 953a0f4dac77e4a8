"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the
``data_engineering_sf_mobile_food_facilities_public_spark`` package;
this module only adapts them to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's one Catalyst query (left join +
    group count + top-5, /root/reference/airflow.py:654-660) translated
    to the driver tables: top-5 customers by order count.
    """
    return relational.QUERIES["flagship_top5_customers_by_order_count"](spark, SF0001)


# The verification driver samples a fixed-size (50) prefix of this dict
# for its per-round CORRECTNESS panel, so insertion order is curated in
# two blocks: _PANEL_CORE (sentinels + anything whose engine changed
# this round + this round's new operators) and _PANEL_ROTATING
# (REFRESHED EACH ROUND: any previously-red query until proven green
# externally, then never-driver-verified queries, oldest families
# first).  Every query keeps the same semantics regardless of position;
# the full registry is always returned and the local parity suite
# (tests/test_oracle_parity.py) checks all of it either way.
#
# Round-11 panel (r10 VERDICT #1 + #3): core shrinks 16 -> 11 — the
# three bucket-lookup re-proof slots (surrogate_key_orders,
# token_budget_mixture, sequence_packing_bins) rotate out now that the
# r9 hashes are driver-green over the two-level path, the sf_*
# sentinel drops (all 12 pipeline rows driver-green r09, engine
# untouched since), and count_min_sketch_flag_freq rotates out
# (driver-green r10).  semdedup_embedding_prototypes STAYS: its engine
# changed this round (one shared persisted embeddings projection feeds
# both the pair join and the centroid/scoring branch) and the r10 hash
# must be re-proven over the new plan.  New round-11 operators append
# at the end of the core as they land.
_PANEL_CORE = [
    # flagship + §2 family sentinels
    "flagship_top5_customers_by_order_count",  # J4 (the reference's query)
    "projection_filter",  # P1-P3/P6
    "full_outer_join_composite",  # J1
    "dedup_first_per_order",  # A1/A2/O1
    "window_count_per_customer",  # A6
    "json_extract_props",  # S4/F7
    "pk_violations_lineitem_orderkey",  # S8 constraint checks
    "top_revenue_orders",  # O2
    "api_source_scan",  # S1/S2 Python DataSource
    "pricing_summary",  # A7 aggregate
    # engine changed this round: shared staged+persisted corpus scan
    "semdedup_embedding_prototypes",  # re-proving the r10 hash over the new plan
]

# Round-11 rotation: 39 slots, ALL never driver-verified (r10 VERDICT
# #1) — the 10 round-11 operators lead (new this round), then the 18
# round-10 operators (matrix-stressed via the opt-in determinism test
# all of round 10), then the TPC-H remainder (completing driver
# coverage of the 22-query suite), then lakehouse/ops and the first
# frame/SQL-feature slot.  Every member is locally parity-green at
# three SFs and vanilla-session pre-flighted before this round ends.
# Rotated out (driver-green r10, still in the local parity suite): the
# r10 rotation cohort and the bucket-lookup re-proof slots.
_PANEL_ROTATING = [
    # round-11 operators (never-verified by definition; fixture +
    # matrix covered in their landing commits)
    "audio_fingerprint_near_dup",  # Haitsma-Kalker PCM fingerprint near-dup
    "query_likelihood_dirichlet_topk",  # Zhai-Lafferty LM retrieval
    "kneser_ney_bigram_scores",  # interpolated-KN perplexity filter
    "kcenter_coreset_embeddings",  # Gonzalez farthest-point coreset
    "video_scene_change_gif",  # shot-boundary detection over real decode
    "embedding_decontaminate_split",  # cross-split semantic decontamination
    "association_rules_part_pairs",  # directed basket rules (conf + lift)
    "mtld_lexical_diversity",  # stateful HOF fold vs recursive-CTE oracle
    "hilbert_key_orders",  # Hilbert layout key (locality sibling of zorder)
    "t_closeness_audit",  # ordered-EMD release gate (privacy trio complete)
    # round-10 operators (matrix-stressed, first in line)
    "dsir_importance_weights",
    "kaplan_meier_repurchase",
    "bh_fdr_priority_price",
    "good_turing_unseen_mass",
    "rendezvous_rebalance_delta",
    "cohens_kappa_langid",
    "brier_decomposition_returns",
    "linear_interp_daily_revenue",
    "cf_negative_sampling",
    "growth_accounting_monthly",
    "embedding_isotropy_report",
    "yules_k_by_source",
    "markov_stationary_event_types",
    "lpa_communities_part_graph",
    "isotonic_price_vs_quantity",
    "covariance_power_iteration",
    "water_filling_token_caps",
    "image_phash_near_dup",
    # TPC-H remainder — completes driver coverage of all 22
    "q11_important_parts",
    "q14_promo_revenue",
    "q16_parts_supplier_relationship",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_inactive_high_balance",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    # lakehouse / operational
    "forget_customers_cascade",
]

# Staging pool for the NEXT rounds' rotation (r12+): the oldest-first
# continuation of the never-driver-verified oracle-paired set (170
# entries = ~3 more rounds of ~39-slot rotation; the tail of the
# never-verified set joins as this list drains).  The determinism
# matrix has an opt-in test that stresses exactly this list so
# candidates arrive pre-stressed; all are locally parity-green at
# three SFs.
_PANEL_NEXT_CANDIDATES = [
    # r11 operators that did not fit the 50-slot panel — first in line
    "cosine_threshold_pairs_pruned",
    "recursive_cte_bottleneck_routes",
    "boilerplate_ngram_removal",
    "degree_assortativity_part_graph",
    "dp_noisy_counts_seeded",
    "ips_offline_policy_value",
    "rake_keywords_by_source",
    "grid_density_clusters",
    "shapley_channel_attribution",
    "diff_in_diff_event_value",
    "quantile_normalize_prices",
    "markov_removal_attribution",
    "croston_intermittent_demand",
    "dunning_llr_keyness",
    "mutual_nearest_neighbors",
    "holt_winters_backtest_wape",
    "temporal_precedence_pairs",
    "hierarchical_forecast_reconciliation",
    "cramer_von_mises_price_halves",
    "kruskal_wallis_price_by_priority",
    "deletion_vector_compaction_audit",
    "largest_remainder_apportionment",
    "kmeans_fixed_iterations_exact",
    "chao1_vocab_richness",
    "rich_club_coefficient",
    "nelson_aalen_repurchase_hazard",
    "neyman_allocation_sample_sizes",
    "interval_union_coverage_per_user",
    "max_drawdown_daily_revenue",
    "regression_discontinuity_price",
    "dsar_access_extract",
    "kmv_intersection_estimate",
    "point_in_time_feature_join",
    "log_rank_test_repurchase",
    "ipf_raking_weights",
    "mediation_quantity_discount_returns",
    "streaming_srm_guardrail",
    "word_adaptation_scores",
    "price_elasticity_by_brand",
    "markov_entropy_rate",
    "kfold_cv_ols_rmse",
    "trending_parts_decayed",
    "rocchio_feedback_rerank",
    "last_digit_uniformity_audit",
    "referential_integrity_dashboard",
    "kwic_concordance",
    "bloom_fpr_calibration",
    "knn_loo_label_accuracy",
    "decision_stump_returnflag",
    "mann_kendall_trend_daily",
    "runs_test_daily_moves",
    "cohens_d_price_halves",
    "kish_design_effect",
    "weibull_rank_regression_fit",
    "theils_u_status_priority",
    "ks_statistic_price_halves",
    "chi2_independence_status_priority",
    "hits_customer_supplier",
    "simpsons_paradox_slopes",
    "srm_check_assignment",
    "burrows_delta_sources",
    "max_maintenance_under_deletes",
    "rendezvous_shard_counts",
    "replication_checksum_orders",
    "scd2_as_of_snapshot",
    "array_set_ops_region_pairs",
    "bitwise_agg_orderkeys",
    "broadcast_dict_region_lookup",
    "calendar_edge_functions",
    "calendar_fill_monthly_revenue",
    "cross_join_region_status_grid",
    "dispersion_stats_by_flag",
    "distribution_windows",
    "expectations_orders",
    "lateral_long_words_per_doc",
    "listagg_nations_per_region",
    "map_status_counts_by_priority",
    "mode_median_by_flag",
    "mom_revenue_change",
    "multiset_customer_orders_h1_vs_h2",
    "parameterized_sql_big_orders",
    "percentile_disc_by_status",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "range_frame_price_neighbors",
    "regexp_doc_features",
    "regr_price_vs_quantity",
    "rows_per_input_file",
    "string_scalar_breadth",
    "to_json_order_documents",
    "top2_orders_per_customer",
    "try_divide_return_rates",
    "udaf_weighted_avg_discount",
    "zonemap_pruning_by_layout",
    "approx_top_k_by_status",
    "approx_top_k_priorities",
    "arrow_grouped_extrema_status",
    "pagination_orders_page3",
    "collated_type_counts",
    "execute_immediate_status_totals",
    "filter_clause_aggregates",
    "group_by_all_status_priority",
    "identifier_dynamic_rollup",
    "lateral_column_alias_margins",
    "pipe_syntax_flag_revenue",
    "select_except_projection",
    "sql_scripting_tiered_rollup",
    "sql_tvf_monthly_spine",
    "sql_udf_net_revenue",
    "sql_variables_above_avg_orders",
    "values_inline_priority_weights",
    "xml_parse_roundtrip_orders",
    "bigram_lm_scores",
    "bm25_topk_docs",
    "chunk_documents_overlapping",
    "containment_pairs",
    "corpus_statistics_report",
    "curriculum_interleave_order",
    "dedup_rate_by_source",
    "diversified_topk_docs",
    "encoding_quality_audit",
    "epochs_per_source_schedule",
    "flesch_readability_by_source",
    "gopher_curation_pipeline",
    "gopher_dup_trigram_chars",
    "gopher_quality_rules",
    "greedy_coverage_selection",
    "incremental_near_dup_new_batch",
    "inverted_index_conjunctive",
    "k_anonymity_audit",
    "l_diversity_audit",
    "lang_entropy_by_source",
    "longest_shared_passage_pairs",
    "minhash_estimate_calibration",
    "mutual_information_lang_source",
    "near_dup_cluster_sizes",
    "near_dup_cluster_source_purity",
    "near_dup_threshold_histogram",
    "ngram_jaccard_pairs",
    "pii_redact_documents",
    "pseudonymize_customer_orders",
    "repetition_filter_stats",
    "simhash64_near_dup_pairs",
    "simhash_signatures",
    "streaming_incremental_near_dup",
    "text_fingerprints",
    "text_lang_id",
    "text_token_stats",
    "textrank_keywords",
    "tokenizer_fertility_by_lang",
    "top_collocations_pmi",
    "vocab_psi_between_sources",
    "vocab_topk_overlap_by_source",
    "winnowing_fingerprints",
    "zipf_rank_frequency_curve",
    "conformal_calibration_quantile",
    "embedding_dim_stats",
    "embedding_norm_outliers",
    "hard_negative_mining_topk",
    "int8_quantized_dot_topk",
    "ivf_label_cells_recall_curve",
    "label_noise_centroid_disagreement",
    "matryoshka_truncation_recall",
    "mmr_rerank_topk",
    "rrf_mrr_vs_dense",
    "ab_lift_bootstrap_range",
    "ab_test_t_statistic",
    "acctbal_boxplot_by_nation",
    "acf_daily_revenue",
    "activity_islands_per_user",
]

_PANEL_FIRST = _PANEL_CORE + _PANEL_ROTATING


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    ordered = {n: relational.QUERIES[n] for n in _PANEL_FIRST}
    ordered.update(relational.QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(relational.ORACLE_SQL)
