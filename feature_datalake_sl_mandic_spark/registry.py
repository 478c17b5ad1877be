"""Central registry: every operator lands here as a (spark_fn, oracle_sql) pair.

This is the engine's public query surface and the driver contract's backbone:
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Each entry is a named query with

- ``fn(spark, sf_dir) -> DataFrame``  — the PySpark (DataFrame/SQL) plan,
- ``oracle``                          — equivalent ANSI SQL DuckDB can run on
  the same parquet tables (None for non-SQL-expressible ops: the driver then
  records a weaker rows-only check),
- ``tags``                            — coverage bookkeeping vs SURVEY.md §2.

Column-name discipline: every computed column is aliased identically in the
DataFrame plan and the oracle SQL (the driver sorts columns by name before
hashing). Float aggregates are rounded on BOTH sides to absorb summation-order
differences between engines.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "feature_datalake_sl_mandic_spark.operators.relational",
    "feature_datalake_sl_mandic_spark.operators.misc",
    "feature_datalake_sl_mandic_spark.operators.joins",
    "feature_datalake_sl_mandic_spark.operators.windows",
    "feature_datalake_sl_mandic_spark.operators.aggregates",
    "feature_datalake_sl_mandic_spark.operators.scalars",
    "feature_datalake_sl_mandic_spark.operators.events",
    "feature_datalake_sl_mandic_spark.operators.dedup",
    "feature_datalake_sl_mandic_spark.operators.similarity",
    "feature_datalake_sl_mandic_spark.operators.retrieval",
    "feature_datalake_sl_mandic_spark.operators.text",
    "feature_datalake_sl_mandic_spark.operators.timeseries",
    "feature_datalake_sl_mandic_spark.operators.clustering",
    "feature_datalake_sl_mandic_spark.operators.sketches",
    "feature_datalake_sl_mandic_spark.operators.graph",
    "feature_datalake_sl_mandic_spark.operators.profile",
    "feature_datalake_sl_mandic_spark.operators.validation",
    "feature_datalake_sl_mandic_spark.operators.curation",
    "feature_datalake_sl_mandic_spark.operators.layout",
    "feature_datalake_sl_mandic_spark.operators.linkage",
    "feature_datalake_sl_mandic_spark.ingest.change_detection",
    "feature_datalake_sl_mandic_spark.ingest.scd",
    "feature_datalake_sl_mandic_spark.ingest.incremental",
    "feature_datalake_sl_mandic_spark.multimodal.media",
    "feature_datalake_sl_mandic_spark.sources.pyds",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 entries in iteration
# order. Rounds 1+2 drove 97 distinct queries green (96 hash + 1 rows-only);
# this list pins the round-3 window: 50 of the 64 queries that have never had
# a driver row (whole modules: TPC-H tail, timeseries, clustering, graph,
# sketches, profile/stats/validation, curation, SCD2/incremental/CDF, plus
# the heavy text/LLM plans rewritten this round). Names not listed follow in
# registration order (all already driver-green in r1/r2).
# Rotate per round until every query has a driver-green row.
_PRIORITY: list[str] = [
    # TPC-H tail
    "q2_min_cost_supplier",
    "q9_product_profit_by_nation_year",
    "q11_important_part_value",
    "q12_priority_by_linestatus",
    "q15_top_supplier",
    "q20_excess_supply_share",
    # ACID table format
    "txlog_change_data_feed",
    # events tail
    "events_cohort_retention",
    "events_sequence_pattern",
    "events_assoc_rules",
    "events_markov_transitions",
    "events_dau_wau_stickiness",
    # similarity tail
    "mine_hard_negatives",
    "ann_ivf_pq",
    # text / LM tail (sparse-cosine + BM25 rewritten this round)
    "quality_unigram_perplexity",
    "lm_bigram_next_tokens",
    "text_sparse_cosine_pairs",
    "text_bm25_search",
    # timeseries (entire module)
    "ts_ewma_daily_value",
    "ts_zscore_anomalies",
    "ts_rolling_median_value",
    "ts_mad_outliers",
    "ts_linear_trend_daily",
    "ts_linear_interpolate",
    "drift_psi_event_values",
    # clustering (entire module)
    "kmeans_lloyd_embeddings",
    "kmeans_balanced_sample",
    "semdedup_cluster_cosine",
    # sketches (entire module; CMS rewritten this round)
    "cms_heavy_hitters_events",
    "bloom_prefilter_supplier_join",
    # graph (entire module; edge ranking rewritten this round)
    "graph_cosupply_triangles",
    "graph_pagerank_cosupply",
    "graph_bfs_distances",
    "graph_min_cost_paths",
    # profile / stats / validation
    "profile_orders_columns",
    "stats_chi2_segment_priority",
    "stats_mutual_info_lang_source",
    "stats_gini_order_values",
    "validate_quarantine_orders",
    # curation (entire module)
    "dedup_prefix_fingerprint",
    "corpus_domain_caps",
    "quality_unigram_entropy",
    "quality_decile_stats",
    "corpus_curation_end_to_end",
    "split_exact_stratified",
    "corpus_length_batches",
    "source_overlap_jaccard",
    # SCD2 / incremental
    "scd2_customer_dim",
    "scd2_point_in_time_join",
    "incremental_agg_refresh",
]
# Round-4 rotation candidates — the last 14 never-driver-checked queries
# (every one green in the repo's oracle mirror), plus any queries newly
# registered in round 3:
# udaf_median_session_value, recursive_cte_customer_chain,
# arrow_batch_embedding_norms, maps_zipwith_type_rates, variant_props_events,
# arrays_setops_adjacent_docs, agg_winsorized_event_values,
# join_interval_overlap_campaigns, join_lateral_topn_customers,
# join_null_safe_profiles, embedding_standardize_dims,
# corpus_quality_weighted_sample, checksum_orders_content,
# kanon_release_customers, plus new-in-round-3: ann_ivf_cells_nprobe2,
# text_hybrid_rrf_search, eval_retrieval_metrics, corpus_dsir_importance,
# dedup_duplicate_ngram_spans, ts_autocorrelation, layout_zorder_files,
# layout_skipping_scorecard, corpus_temperature_resample,
# eval_matryoshka_recall, events_hopping_3h_1h, dedup_ngram_containment,
# dedup_incremental_batch, events_time_to_convert, profile_partition_skew,
# graph_link_prediction_jaccard, customers_rfm_segments,
# validate_benford_order_values, agg_exact_mode_priority,
# join_asof_nearest_view, ts_cross_correlation_lags, ts_seasonal_dow_index,
# privacy_dp_noisy_counts, sample_weighted_reservoir,
# corpus_js_divergence_sources, ann_two_stage_rerank, er_parts_scored_matches,
# sketch_hll_manual_users, sketch_kmv_set_algebra_users, eval_dedup_lsh_recall,
# validate_referential_integrity, ts_seasonal_adjusted_anomalies,
# drift_embedding_centroid_shift, pyds_training_shards_roundtrip,
# sketch_hll_daily_to_weekly_merge, multimodal_wav_decode,
# ts_seasonal_naive_backtest, events_capped_running_balance,
# corpus_zipf_fit, ann_pq_lloyd_refined, dedup_incremental_minhash,
# sketch_ddsketch_order_quantiles, ts_cusum_mean_shift, ts_theilsen_trend,
# ts_mann_kendall_test, ts_ks_two_sample_drift, multimodal_video_frame_sample,
# ts_brown_double_smoothing, text_bpe_pair_stats, stats_welch_ttest_priority,
# stats_anova_order_priority.
# (multimodal_feature_extract stays out of every window by design: its codec
# stubs make it permanently rows-only; multimodal_ppm_decode is the family's
# hash-green representative.)


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in load_all().items() if s.oracle is not None}
