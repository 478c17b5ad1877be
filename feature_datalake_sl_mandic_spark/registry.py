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
# order. Rounds 1-3 drove 146 distinct queries green; this list pins the
# round-4 window: the 14 queries carried since round 2 (never driver-checked,
# all green in the repo's oracle mirror), then 35 round-3 registrations, plus
# ann_ivf_pq_packed (new this round — the production PQ scoring path, put in
# the window immediately so its driver row lands with its registration).
# Names not listed follow in registration order (all already driver-green in
# r1-r3). Rotate per round until every query has a driver-green row.
_PRIORITY: list[str] = [
    # --- the 14 round-2 leftovers, oldest debt first
    "udaf_median_session_value",
    "recursive_cte_customer_chain",
    "arrow_batch_embedding_norms",
    "maps_zipwith_type_rates",
    "variant_props_events",
    "arrays_setops_adjacent_docs",
    "agg_winsorized_event_values",
    "join_interval_overlap_campaigns",
    "join_lateral_topn_customers",
    "join_null_safe_profiles",
    "embedding_standardize_dims",
    "corpus_quality_weighted_sample",
    "checksum_orders_content",
    "kanon_release_customers",
    # --- new in round 4: packed-code PQ ADC scoring
    "ann_ivf_pq_packed",
    # --- retrieval evaluation family
    "eval_retrieval_metrics",
    "text_hybrid_rrf_search",
    "eval_matryoshka_recall",
    "eval_dedup_lsh_recall",
    # --- incremental dedup
    "dedup_incremental_batch",
    "dedup_incremental_minhash",
    # --- layout / data-skipping
    "layout_zorder_files",
    "layout_skipping_scorecard",
    # --- sketches family (HLL integer-math + KMV checkpoint fixed this round)
    "sketch_hll_manual_users",
    "sketch_hll_daily_to_weekly_merge",
    "sketch_kmv_set_algebra_users",
    "sketch_ddsketch_order_quantiles",
    # --- real codecs (WAV PCM16, PVID video)
    "multimodal_wav_decode",
    "multimodal_video_frame_sample",
    # --- ANN tail
    "ann_ivf_cells_nprobe2",
    "ann_two_stage_rerank",
    "ann_pq_lloyd_refined",
    # --- queries touched by round-3 ADVICE fixes (verify the fixes under
    #     the driver's own hash, not just the mirror)
    "validate_referential_integrity",
    "ts_ks_two_sample_drift",
    "privacy_dp_noisy_counts",
    # --- corpus curation / dedup tail
    "corpus_dsir_importance",
    "dedup_duplicate_ngram_spans",
    "dedup_ngram_containment",
    "corpus_temperature_resample",
    # --- events tail
    "events_hopping_3h_1h",
    "events_time_to_convert",
    # --- profile / graph / segmentation
    "profile_partition_skew",
    "graph_link_prediction_jaccard",
    "customers_rfm_segments",
    # --- validation / aggregation / joins tail
    "validate_benford_order_values",
    "agg_exact_mode_priority",
    "join_asof_nearest_view",
    # --- entity resolution, custom data source, BPE
    "er_parts_scored_matches",
    "pyds_training_shards_roundtrip",
    "text_bpe_pair_stats",
]
# Round-5 rotation candidates — the 16 remaining never-driver-checked queries
# (every one green in the repo's oracle mirror; mostly the timeseries tail):
# ts_autocorrelation, ts_cross_correlation_lags, ts_seasonal_dow_index,
# ts_seasonal_adjusted_anomalies, ts_seasonal_naive_backtest,
# ts_cusum_mean_shift, ts_theilsen_trend, ts_mann_kendall_test,
# ts_brown_double_smoothing, events_capped_running_balance, corpus_zipf_fit,
# corpus_js_divergence_sources, sample_weighted_reservoir,
# drift_embedding_centroid_shift, stats_welch_ttest_priority,
# stats_anova_order_priority — plus the queries newly registered in round 4:
# ts_trend_pair_sampled, kanon_l_diversity, sample_stratified_neyman,
# dedup_url_canonical, stats_bootstrap_ci_mean, embedding_pca_power_iteration,
# corpus_cdc_chunking, events_ab_test_proportions, quality_lexicon_screen,
# multimodal_image_phash_pairs, events_survival_kaplan_meier,
# lm_bigram_kneser_ney, embedding_outliers_mahalanobis,
# text_tokenizer_fertility, eval_rouge_redaction_impact,
# eval_langid_confusion, graph_components_star, eval_lsh_band_tuning,
# customers_pareto_abc, multimodal_audio_fingerprint_pairs,
# ts_chow_structural_break, agg_weighted_median_price,
# customers_cohort_ltv (ann_ivf_pq_packed is already inside this round's
# window).
# (multimodal_feature_extract was retired from the registry in round 4: its
# codec stubs made it permanently rows-only and every registered query must
# carry an oracle; it stays pytest-covered via tests/test_multimodal.py.)


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
