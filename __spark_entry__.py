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
# Round-10 restructure (r9 VERDICT #1): the old 36-slot core had been
# green for 9 straight rounds while 256 of 352 oracle-paired queries
# had NEVER seen a driver check — external verification must catch up
# to the registry.  The core shrinks to SENTINELS: the flagship, one
# representative per §2 operator family, one row of the 12-query sf_*
# reference pipeline (all 12 stay in the local parity suite and were
# driver-green r09; they rotate back in if they ever change), the
# queries whose ENGINE changed this round (the bucketed-cumsum lookup
# rewrite: surrogate_key_orders, token_budget_mixture,
# sequence_packing_bins — re-proving the r9 hashes against the new
# two-level bucket path), and the two round-10 operators.
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
    "sf_location",  # sf_* reference-pipeline sentinel (J1+P5 composite)
    # engine changed this round: two-level codegen-stable bucket lookup
    "surrogate_key_orders",  # F4 over the new _with_bucket
    "token_budget_mixture",  # grouped_running_sum consumer (r9 VERDICT #2 gate)
    "sequence_packing_bins",  # grouped_running_sum consumer (same gate)
    # new round-10 operators
    "count_min_sketch_flag_freq",  # md5-lane CMS, first oracle-paired round
    "semdedup_embedding_prototypes",  # semantic dedup tier, new
]

# Round-10 rotation: 34 slots, ALL drawn from the 256 oracle-paired
# queries that have never appeared in any driver panel (r9 VERDICT #1),
# oldest families first — TPC-H suite and lakehouse (r2-4), modern SQL
# and frame/SQL-feature surfaces (r4-6), text curation (r4-8),
# similarity (r5-9), analytics (r6-9), streaming/multimodal (r5-8).
# Every member is locally parity-green at sf0.001+0.01+0.1 (the r9
# closeout 351/351 sweep) and 5-cell determinism-matrix stressed before
# this round ends.  Rotated out (driver-green r09, still in the local
# suite): the r9 HUGEINT cohort, the remaining §2 singles, and 11 of
# the 12 sf_* pipeline rows.
_PANEL_ROTATING = [
    # TPC-H suite (oldest never-verified family)
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    # lakehouse
    "scd2_user_event_history",
    "funnel_signup_to_purchase",
    "snapshot_diff_user_state",
    "zorder_key_orders",
    # modern SQL
    "bitmap_distinct_parts_by_flag",
    "session_window_user_activity",
    "rolling_7day_active_users",
    "pivot_multi_agg_status",
    "cohort_retention_daily",
    # frame API
    "crosstab_status_priority",
    "union_by_name_evolved_schema",
    # SQL features
    "locf_order_price_fill",
    "width_bucket_quantity_deciles",
    # text curation
    "tfidf_top_terms",
    "minhash_dedup_survivors",
    "near_dup_quality_survivors",
    "decontaminate_documents",
    "temperature_resample_mixture",
    "lang_id_confusion_matrix",
    # similarity
    "embedding_near_dup_blocked",
    "embedding_label_centroids",
    "hybrid_search_rrf",
    # analytics
    "rolling_7day_spend",
    "fuzzy_name_match",
    "revenue_share_by_nation",
    "kmv_distinct_estimate",
    # streaming (a REAL AvailableNow stream checked against batch SQL)
    "streaming_hourly_event_counts",
    # multimodal (md5-replayable real-codec decode)
    "image_header_decode",
]

# Staging pool for the NEXT rounds' rotation (r11+): the oldest-first
# continuation of the never-driver-verified oracle-paired set, capped at
# 120 (three more rounds of ~35-slot rotation).  The determinism matrix
# has an opt-in test that stresses exactly this list so candidates
# arrive pre-stressed; all are locally parity-green at three SFs.
_PANEL_NEXT_CANDIDATES = [
    # round-10 operators not already in this round's panel — FIRST in
    # line for the r11 rotation, matrix-stressed via this list
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
    "forget_customers_cascade",
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
