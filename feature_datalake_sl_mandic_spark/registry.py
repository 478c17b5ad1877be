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
# order. Rounds 1-4 drove 196 distinct queries green; this list pins the
# round-5 window: the FINAL 39 never-driver-checked queries (16 carried from
# round 3 — the timeseries/stats tail — and the 23 round-4 registrations),
# plus the two banded multimodal pair queries registered this round. 41
# names; the remaining 9 slots fall through to registration order and
# re-verify round-1 rows. After this window EVERY registered query has a
# driver-green row in some CORRECTNESS_r*.json — the rotation debt is
# retired.
_PRIORITY: list[str] = [
    # --- the 16 round-3 stragglers, oldest debt first (timeseries/stats)
    "ts_autocorrelation",
    "ts_cross_correlation_lags",
    "ts_seasonal_dow_index",
    "ts_seasonal_adjusted_anomalies",
    "ts_seasonal_naive_backtest",
    "ts_cusum_mean_shift",
    "ts_theilsen_trend",
    "ts_mann_kendall_test",
    "ts_brown_double_smoothing",
    "events_capped_running_balance",
    "corpus_zipf_fit",
    "corpus_js_divergence_sources",
    "sample_weighted_reservoir",
    "drift_embedding_centroid_shift",
    "stats_welch_ttest_priority",
    "stats_anova_order_priority",
    # --- the 23 round-4 registrations (registry.py order of that round)
    "ts_trend_pair_sampled",
    "kanon_l_diversity",
    "sample_stratified_neyman",
    "dedup_url_canonical",
    "stats_bootstrap_ci_mean",
    "embedding_pca_power_iteration",
    "corpus_cdc_chunking",
    "events_ab_test_proportions",
    "quality_lexicon_screen",
    "multimodal_image_phash_pairs",
    "events_survival_kaplan_meier",
    "lm_bigram_kneser_ney",
    "embedding_outliers_mahalanobis",
    "text_tokenizer_fertility",
    "eval_rouge_redaction_impact",
    "eval_langid_confusion",
    "graph_components_star",
    "eval_lsh_band_tuning",
    "customers_pareto_abc",
    "multimodal_audio_fingerprint_pairs",
    "ts_chow_structural_break",
    "agg_weighted_median_price",
    "customers_cohort_ltv",
    # --- new in round 5: banded-LSH multimodal pair generation (the scale
    #     path for the two all-pairs verifiers above) — windowed immediately
    #     so their driver rows land with their registration
    "multimodal_phash_banded_pairs",
    "multimodal_audio_fp_banded_pairs",
]
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
