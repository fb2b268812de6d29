"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (daily cumulative order curve, the
reference's epidemic-curve plan shape, cv-stats.py:54-56) on sf0.001.

``queries()`` / ``oracle_sql()`` — the full operator suite from
SURVEY.md §2, registered in ``covid_19_fl_spark.suite``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_19_fl_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.QUERIES["w1_cumulative_daily"](spark, "/root/testdata/sf0.001")


# Representative cross-section of the suite, ordered first so that any
# prefix of queries() (the driver checks a bounded number, in order)
# spans every operator family: reference-parity aggs/windows/joins,
# TPC-H join-heavy shapes, relational extensions (sessionization,
# as-of/range/interval joins, SCD2, CDC, rollups), and the
# LLM-data-pipeline operators (dedup, text quality, retrieval,
# similarity, packing). Everything stays registered; this is ordering,
# not selection.
SHOWCASE = [
    "a1_global_max",
    "a2_daily_counts",
    "a4_top5_by_count",
    "a5_mean_tail_rates",
    "w1_cumulative_daily",
    "w2_cumulative_by_group",
    "w3_growth_rates",
    "w4_daily_delta",
    "w6_last_row",
    "j1_broadcast_left_join",
    "j2_per_capita_dim_join",
    "j3_semi_join",
    "j4_anti_join",
    "g1_growth_sim",
    "u2_union_tagged_series",
    "u3_watermark_append",
    "f_predicate_suite",
    "o4_pagination",
    "p_scalar_suite",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_sole_blame_suppliers",
    "x_sessionization",
    "x_asof_join",
    "x_range_join",
    "x_interval_overlap",
    "x_scd2_build",
    "x_cdc_snapshot",
    "x_gap_fill_ffill",
    "x_grouping_sets",
    "x_percentiles",
    "x_window_ranks",
    "x_ohlc_bars",
    "x_pagerank",
    "x_triangle_count",
    "x_rfm_segmentation",
    "x_cusum_changepoint",
    "x_equidepth_histogram",
    "ml_naive_bayes",
    "dd_exact_dedup",
    "dd_ngram_jaccard_pairs",
    "dd_minhash_lsh_pairs",
    "dd_embedding_cosine",
    "tx_boilerplate_ngrams",
    "ss_pq_quantize",
    "x_agg_state_rollup",
    "x_markov_transitions",
    "x_ivm_join_view",
    "sp_weighted_sample",
    "ss_hybrid_rrf",
    "ml_kmeans_clusters",
    "tx_quality_scores",
    "cur_funnel",
    "tx_tfidf_topterms",
    "tx_bm25_topk",
    "ss_cosine_topk",
    "ss_lsh_topk",
    "tx_repetition_scores",
    "sp_pack_sequences",
    "x_autocorrelation",
    "ml_linear_trend",
    "x_skyline",
    "ml_knn_accuracy",
    "ml_decision_stump",
    "tx_zipf_fit",
    "x_rolling_median",
    "ss_ivf_recall",
    "ml_pca_power",
    "x_market_basket",
    "tx_pmi_collocations",
    "x_holt_smoothing",
    "x_weighted_median",
    "x_gini_spend",
    "x_abc_classification",
    "x_bfs_distances",
    "tx_contamination",
    "x_bloom_semi_join",
    "x_audience_overlap",
    "x_histogram_quantiles",
    "ss_ndcg_eval",
    "dd_prefix_dup",
    "dd_containment_pairs",
    "sp_ppl_bucket_mix",
    "x_rolling_corr",
    "ml_logreg_gd",
    "dd_semantic_dedup",
    "sp_uniform_rebalance",
    "tx_chunk_udtf",
    "x_cohort_ltv",
    "mm_binary_profile",
    "x_backlog_burndown",
    "ml_feature_matrix",
    "ss_vector_norms",
    "x_trimmed_mean",
    "st_stream_daily_counts",
    "x_funnel_latency",
    "x_seasonal_decompose",
    "tx_novelty_curve",
    "x_chi2_independence",
    "tx_lexical_diversity",
    "dd_impact_report",
    "ss_centroid_drift",
    "x_slump_streaks",
    "sp_epoch_shuffle",
    "x_wilson_ci",
    "x_kaplan_meier",
    "x_mann_whitney",
    "dd_minhash_calibration",
    "x_degree_distribution",
    "x_lorenz_deciles",
    "sp_pps_systematic",
    "x_revenue_waterfall",
    "x_column_profile",
    "x_dau_wau_stickiness",
    "dd_nearest_doc",
]


def _ordered(src: dict) -> dict:
    out = {k: src[k] for k in SHOWCASE if k in src}
    out.update((k, v) for k, v in src.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(suite.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(suite.ORACLES))
