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
# Round-15 panel (r14 VERDICT #1): core is the 10 sentinels only.  No
# core query's engine changed this round — pagerank's r14 auto-mode
# change is driver-proven (pass r14) and its delegation is now pinned
# end-to-end by test_pagerank_auto_mode_branch_matches_helper_across_
# crossover, so its re-proof slot returns to the rotation.  The one
# released query whose engine DID change (kl_divergence_source_vs_
# corpus: ADVICE r14 per-term DECIMAL pinning) is never-driver-verified
# and sits in the rotation, covering the change and burning backlog in
# the same slot.  prefix_jaccard_pairs_run gained a knob-conflict
# ValueError (ADVICE r14) — the registered default paths pass no knobs
# and compile unchanged.
_PANEL_CORE = [
    # flagship + section-2 family sentinels
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
]

# Round-15 rotation: 40 slots, ALL never driver-verified (r14 VERDICT
# #1: burn below 160+adds; the mechanical ledger reads 207 after this
# round's 8 adds, so the 40-slot burn lands the post-r15 count at
# 167 <= the 160+8 target).  Composition per the r14 brief: the EIGHT
# named SURVEY-mapped stragglers first (no section-2/section-8 family
# may stay without a driver-green member), then the engine-changed KL
# pair, this round's 7 novel operators + the VERDICT-#2 semdedup
# mitigation tier (driver-proven in its landing round, the
# prefix_jaccard_sampled_pairs precedent), and 23 oldest-first from
# the staging pool.  Every member is locally parity-green at three
# SFs, hostile-fixture covered, and matrix-stressed before the round
# ends.
_PANEL_ROTATING = [
    # r14 VERDICT #1's eight named stragglers (SURVEY section-2/8 rows)
    "flagship_via_sql",  # S10 SQL-interface proof
    "ols_price_vs_quantity",  # M2 oracle-paired twin
    "audio_sample_decode",  # multimodal audio oracle pair
    "video_frame_sample",  # multimodal video oracle pair
    "simhash_signatures",  # dedup primitive
    "ngram_jaccard_pairs",  # dedup primitive
    "text_lang_id",  # text-analysis family
    "text_token_stats",  # text-analysis family
    # engine changed this round (ADVICE r14: per-term DECIMAL pinning)
    "kl_divergence_source_vs_corpus",
    # r15 novel pairs (pre-registered in SCALE.md with distinctness
    # notes; numpy third-implementation tests in test_round8_stats_ops)
    "average_precision_discount_returns",
    "anderson_darling_price_halves",
    "pettitt_changepoint_daily_revenue",
    "variance_ratio_daily_revenue",
    "hurst_exponent_daily_revenue",
    "hoeffding_d_quantity_discount",
    "ccnet_perplexity_buckets",
    # VERDICT r14 #2 mitigation tier (x10/x30 probe: fixed-codebook
    # semdedup alpha~2.1; md5-lane sharded pair join returns ~linear)
    "semdedup_sharded_prototypes",
    # staging pool head, oldest first
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
]

# Staging pool for the NEXT rounds' rotation (r16+): the oldest-first
# continuation of the never-driver-verified oracle-paired set (the 24
# staged entries + 4 staged stragglers promoted into this round's
# rotation are removed; the r15 novel operators all rotate THIS round
# so none append here).  The determinism matrix has an opt-in test
# that stresses exactly this list so candidates arrive pre-stressed;
# all are locally parity-green at three SFs.
_PANEL_NEXT_CANDIDATES = [
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
    "pii_redact_documents",
    "pseudonymize_customer_orders",
    "repetition_filter_stats",
    "simhash64_near_dup_pairs",
    "streaming_incremental_near_dup",
    "text_fingerprints",
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
    "ljung_box_daily_revenue",
    "durbin_watson_daily_trend",
    "chow_break_daily_trend",
    "periodogram_daily_revenue",
    "brown_forsythe_price_priority",
    "cochran_armitage_priority_trend",
    "mcnemar_customer_halves",
    "tukey_hsd_price_priority",
    "seasonal_mann_kendall_daily",
    "granger_clicks_purchases_lag1",
    "ddsketch_quantiles_price",
    "goldfeld_quandt_price_quantity",
    "randomized_response_status",
    "priority_sample_revenue_total",
    "linear_cka_truncation",
    "gumbel_monthly_max_revenue",
    "page_hinkley_daily_revenue",
    "wasserstein_quantity_halves",
    "mood_median_test_price_priority",
    "ansari_bradley_quantity_halves",
    "page_trend_test_priority_by_month",
    "energy_distance_quantity_halves",
    "qn_scale_quantity_1996",
    "heaps_vocab_growth_checkpoints",
    # r14 additions land at the staging tail as they register
    "kuiper_test_price_halves",
    "jarque_bera_quantity_1996",
    "partial_corr_price_quantity_given_discount",
    "goodman_kruskal_lambda_status_priority",
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
