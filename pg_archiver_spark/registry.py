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
# ROUND-10 PIN (executes VERDICT r9 item #1): slots 1-50 are the first
# 50 never-driver-checked ops, in r9 queue order; slots 51-73 are the
# remaining 23 never-checked names; after them come the 19 ops whose
# only driver records are rows-only/no_oracle from rounds 1-5 (all
# since converted to sql oracles), oldest evidence first -- they still
# need a first hash verdict.
# ROUND-11 PIN (write now in case of context reset): delete the first
# 50 names below (they will hold r10 evidence), bump _PIN_ROUND to 11,
# and let the 23 + 19 + any r10-session additions fill the window; top
# up to 50 from oldest-driver-evidence-first greens (r4-latest). That
# closes first-time driver evidence over the whole registry.
_DRIVER_PRIORITY = [
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
    "ml_logreg_inference_gate",
    "pipeline_decontaminate_13gram",
    "pipeline_decontaminate_spans",
    "text_gopher_repetition",
    "sim_ann_recall_eval",
    "agg_hll_partial_merge",
    "graph_pagerank",
    "ml_kmeans_lloyd",
    "maintenance_compact",
    "stream_stateful_count",
    "ml_pca_project",
    "sim_batch_knn_ivf",
    "pipeline_neardup_dedup_e2e",
    "stream_progress_metrics",
    "stream_state_timeout_sessions",
    "source_jdbc_poll",
    "agg_approx_percentile",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivf_partitioned",
    "sim_cosine_topk_arrow",
    "dedup_simhash",
    "dedup_cluster_cc",
    "multimodal_binary_features",
]

# The round this pin was written for. tests/test_registry_rotation.py
# ignores CORRECTNESS files from rounds >= this when deciding whether
# the window is stale (ADVICE r9 #1: the driver writes CORRECTNESS_r10
# DURING round 10, giving the window ops fresh full passes -- that is
# the pin WORKING, not a stale pin; only evidence from rounds BEFORE
# the pin means the budget would be wasted re-verifying greens).
_PIN_ROUND = 10


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
