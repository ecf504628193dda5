"""The operator contract registry.

Every operator declared in SURVEY.md §2.B registers here exactly once:
a name, a Spark query function (spark, sf_dir) -> DataFrame, and (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes these to the driver harness.

Register with the decorator:

    @register("project_prune", oracle="SELECT ... FROM lineitem ...")
    def project_prune(spark, sf_dir):
        ...

Rows-only ops (no DuckDB equivalent) pass oracle=None.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Names the correctness driver should reach FIRST. The driver checks
# only the first 50 registered queries per round (SURVEY.md §9), so
# registration order is a verification budget that must be RE-PINNED
# every round (the list does not rotate by itself).
# ROUND-8 PIN (executes VERDICT r7 item #1): the list below is exactly
# the 159 operators that have NEVER appeared in any driver CORRECTNESS
# window (union of CORRECTNESS_r01..r07 keys vs the 359-op registry),
# ordered sql-checked first (142 ops -> hash verdicts) then rows-only
# (17 ops). Slots 1-50 of round 8 are therefore the first 50 sql-checked
# never-checked ops (composed_q2_min_cost_supplier ...
# join_point_in_time_features); the remaining 92 sql-checked + 17
# rows-only names pre-queue rounds 9-10. After the never-checked tail
# drains, rotate oldest-driver-evidence-first (r4-latest greens next).
# ROUND-9 PIN (write now in case of context reset): delete the first 50
# names below (they will hold r8 evidence) and keep the rest in order.
_DRIVER_PRIORITY = [
    "composed_q2_min_cost_supplier",
    "composed_q15_top_supplier",
    "composed_q20_part_surplus",
    "composed_q22_global_sales",
    "sink_avro_roundtrip",
    "composed_q8_market_share",
    "composed_q9_product_profit",
    "composed_q11_important_stock",
    "composed_q13_order_distribution",
    "composed_q16_supplier_part_cnt",
    "composed_q17_small_qty_revenue",
    "analytics_cusum_changepoint",
    "sql_pipe_syntax",
    "agg_corr_matrix",
    "agg_weighted_median",
    "agg_observe_metrics",
    "agg_approx_top_k",
    "agg_trimmed_mean",
    "agg_boolean_every_any",
    "agg_ohlc_candles",
    "agg_winsorized_mean",
    "agg_exact_quantile_twopass",
    "analytics_heavy_hitters_twopass",
    "analytics_gini_concentration",
    "analytics_life_table",
    "analytics_cohort_ltv",
    "analytics_attribution_position",
    "window_rolling_median",
    "analytics_seasonal_naive_backtest",
    "analytics_session_paths",
    "analytics_market_basket",
    "graph_triangle_count",
    "analytics_interpolate_linear",
    "analytics_funnel_windowed",
    "analytics_benford_audit",
    "analytics_audience_overlap",
    "analytics_sequence_pattern_regex",
    "analytics_pareto_abc",
    "analytics_shapley_attribution",
    "analytics_forecast_backtest",
    "graph_bfs_distance",
    "analytics_stickiness_dau_wau",
    "analytics_root_cause_contribution",
    "analytics_yoy_growth",
    "analytics_attribution_rules",
    "analytics_price_index",
    "analytics_xyz_classification",
    "join_full_outer",
    "join_aqe_runtime_broadcast",
    "join_point_in_time_features",
    "join_spatial_grid",
    "join_fuzzy_blocked",
    "join_hint_shuffle_hash",
    "maintenance_materialized_rollup",
    "maintenance_constraint_audit",
    "maintenance_snapshot_vacuum",
    "scan_bucket_pruned",
    "scan_agg_pushdown_footer",
    "source_binaryfile",
    "source_xml_roundtrip",
    "scan_columnar_cache_reuse",
    "scan_ignore_corrupt_files",
    "maintenance_repartition_layout",
    "maintenance_content_fingerprint",
    "maintenance_analyze_stats",
    "maintenance_backfill_overwrite",
    "maintenance_deletion_vectors",
    "layout_parquet_bloom_filter",
    "scan_nested_schema_pruning",
    "merge_scd2_upsert",
    "sample_bottomk_sketch",
    "analytics_ks_test",
    "analytics_chisq_independence",
    "analytics_autocorrelation",
    "agg_kmv_jaccard_estimate",
    "analytics_did_estimator",
    "window_alert_debounce",
    "analytics_bootstrap_ci",
    "analytics_seasonal_residual_outliers",
    "analytics_theil_sen_trend",
    "analytics_mannwhitney_u",
    "analytics_permutation_test",
    "analytics_psi_drift",
    "analytics_goertzel_weekly_power",
    "analytics_sprt_sequential",
    "analytics_pettitt_changepoint",
    "sql_recursive_date_spine",
    "sql_recursive_reachability",
    "sql_scripting_batch",
    "subquery_any_all",
    "sql_named_parameters",
    "window_max_drawdown",
    "window_running_sum_scalable",
    "window_rolling_regression",
    "window_gap_fill_locf",
    "dedup_paragraph",
    "dedup_semantic_cluster",
    "pipeline_mix_temperature",
    "pipeline_span_corruption",
    "pipeline_rlhf_pair_prep",
    "pipeline_length_batching",
    "pipeline_epoch_shuffle",
    "pipeline_fim_transform",
    "pipeline_kfold_assign",
    "pipeline_chat_template",
    "pipeline_dpo_pairs",
    "pipeline_curriculum_phases",
    "json_variant_shred",
    "string_collation_groupby",
    "sim_vector_pq_search",
    "sim_scalar_quantize_int8",
    "sim_maxsim_multivector",
    "sim_rrf_fusion",
    "ml_feature_hashing",
    "ml_calibration_bins",
    "sim_matryoshka_eval",
    "pipeline_hard_negative_mining",
    "ml_knn_eval_accuracy",
    "sim_binary_quantize_hamming",
    "ml_roc_auc",
    "ml_lift_gains_table",
    "text_bigram_logprob",
    "text_cooccurrence_pmi",
    "text_zipf_fit",
    "udtf_analyze_dynamic",
    "udf_pandas_iter",
    "udf_cogroup_pandas",
    "udf_map_in_arrow",
    "udf_sql_declarative",
    "udtf_table_arg",
    "udtf_arrow_char_ngrams",
    "stream_stream_left_outer",
    "stream_multisink_atomic",
    "stream_dedup_within_watermark",
    "stream_chained_window_agg",
    "stream_rocksdb_state_store",
    "source_state_store_reader",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
    "source_warc_ingest",
    "source_fixed_width",
    "stream_cdc_changelog",
    "sink_s3_object_store",
    "agg_count_min_sketch",
    "multimodal_image_resize",
    "multimodal_audio_features",
    "analytics_markov_removal_attribution",
    "sink_manifest_committer",
    "pipeline_neardup_eval_pr",
    "pipeline_bpe_merges",
    "pipeline_bpe_apply",
    "pipeline_unigram_tokenizer_em",
    "multimodal_phash_neardup",
    "multimodal_audio_fingerprint_neardup",
    "sim_ann_ivf_multiprobe",
    "ml_logreg_gd",
    "sim_mmr_rerank",
    "ml_ols_normal_eq",
]


def load_all_operators() -> None:
    """Import every module that registers operators (idempotent), then
    order the registry so ``_DRIVER_PRIORITY`` names come first."""
    # Imports are for their registration side effects.
    from pg_archiver_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        filters,
        joins,
        scans,
        setops,
        sorts,
        statistics,
        subqueries,
        windows,
    )
    from pg_archiver_spark.functions import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        pipeline,
        scalars,
        similarity,
        text,
        udfs,
    )
    from pg_archiver_spark.streaming import windows as stream_windows  # noqa: F401
    from pg_archiver_spark.streaming import archival  # noqa: F401
    from pg_archiver_spark.sources import jdbc, pyds, warc  # noqa: F401

    ordered = [n for n in _DRIVER_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _DRIVER_PRIORITY
    ]
    for mapping in (QUERIES, ORACLES):
        items = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(items)
