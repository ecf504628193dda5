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
# ROUND-9 PIN (executes VERDICT r8 items #1 and #2): slots 1-5 are the
# five SURVEY §2.B contract ops whose latest driver record predates
# their rows-only -> sql-oracle conversion (source_jdbc,
# agg_approx_distinct, minhash_neardup, stream_watermark_late,
# stream_archival_foreachbatch -- all no_oracle rows in r01-r08, never
# a hash verdict); slots 6-50 are the next 45 never-driver-checked ops
# from the r8 queue, in queue order. The remaining 68 never-checked
# names (incl. the four r8-session additions appended at the end)
# pre-queue rounds 10-11. tests/test_registry_rotation.py enforces
# that slots 1-50 never hold an op that already has a full driver
# hash pass.
# ROUND-10 PIN (write now in case of context reset): delete the first
# 50 names below (they will hold r9 evidence) and keep the rest; top
# up slots to 50 from oldest-driver-evidence-first greens (r4-latest).
_DRIVER_PRIORITY = [
    "source_jdbc",
    "agg_approx_distinct",
    "minhash_neardup",
    "stream_watermark_late",
    "stream_archival_foreachbatch",
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
    "ml_pr_auc_average_precision",
    "dedup_repeated_substring_spans",
    "text_readability",
    "text_ngram_novelty_decay",
    # Converted rows-only -> invariant sql oracle in r9; queue for a
    # driver hash verdict after the never-checked tail drains.
    "ml_pca_project",
    # New in r9 (VERDICT r8 item #7): trained-classifier inference
    # gate and 13-gram eval decontamination (doc-level + span surgery).
    "ml_logreg_inference_gate",
    "pipeline_decontaminate_13gram",
    "pipeline_decontaminate_spans",
    "text_gopher_repetition",
    "sim_ann_recall_eval",
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
