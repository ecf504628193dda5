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
# every round (the list does not rotate by itself). Round-5 spend
# (CORRECTNESS_r04 was 50/50 green, so the window moves on): never-
# driver-checked operators first —
#   slots 1-28  — the 28 round-5 additions;
#   slots 29-46 — the 18 round-4 additions that have never appeared in
#                 ANY driver round (registered past slot 50 in r4);
#   slots 47-50 — the head of the events-based r1/r2 stale-green block
#                 (driver hashes earned on OLD timestamp[ns] fixtures).
# Everything else follows in rotation order (remaining stale events
# greens, the TPC-H ms→µs re-proofs, then fresh greens); re-pin again
# next round so the stale blocks keep draining through the window.
_DRIVER_PRIORITY = [
    # -- round-5 additions (no driver evidence yet) -------------------
    "composed_q10_returned_items", "composed_q12_priority_shipmode",
    "text_gopher_rules", "pipeline_dedup_keep_best",
    "pipeline_quality_weighted_sample", "analytics_linreg_trend",
    "source_csv_permissive", "composed_q6_forecast_revenue",
    "maintenance_retention_drop_partitions", "pipeline_bpe_pair_counts",
    "analytics_cumulative_users", "text_unigram_logprob",
    "source_jsonl_schema_infer", "composed_q14_promo_revenue",
    "composed_q4_priority_exists", "join_scd2_pointintime",
    "ml_pca_project", "stream_jdbc_sink", "analytics_ab_ztest",
    "maintenance_dataset_diff", "analytics_time_to_convert",
    "stream_state_timeout_sessions", "composed_q19_disjunctive",
    "join_asof_nearest", "pipeline_neardup_dedup_e2e",
    "udf_arrow_optimized", "agg_string_concat_groups",
    "analytics_seasonality_profile", "analytics_zero_filled_report",
    "window_nth_value",
    # -- round-4 additions never reached by a driver window -----------
    "agg_bitmap_distinct", "analytics_mad_outliers",
    "analytics_markov_transitions", "analytics_rfm_segments",
    "composed_q7_volume_shipping", "join_null_safe_eq",
    "merge_cdc_apply", "pipeline_dataset_card", "pipeline_vocab_coverage",
    "scan_metadata_columns", "scan_partition_pruned_static",
    "sim_batch_knn_join", "sim_batch_knn_ivf", "source_jdbc_poll",
    "stream_progress_metrics", "stream_static_enrich",
    "text_entropy_quality", "window_ratio_to_report",
    # -- 17-39: events-based stale greens (ns→µs re-proof) ------------
    "stream_sliding", "stream_session", "select_literal", "agg_having",
    "agg_distinct_per_group", "json_extract", "dedup_dropduplicates",
    "sample_deterministic", "agg_time_bucket_rollup",
    "agg_group_pricing", "join_broadcast_dim", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "sim_cosine_topk",
    "pipeline_training_prep", "multimodal_join", "udf_python_scalar",
    "udf_pandas_scalar", "udaf_pandas_grouped", "udtf_split",
    "minhash_neardup", "sim_label_avg",
    # -- 40-50: §2.B TPC-H contract greens (date ms→µs re-proof) ------
    "scan_parquet_full", "scan_filter_prune", "project_prune",
    "filter_in_list", "filter_null_safe", "join_inner_equi",
    "join_star_multiway", "join_left_outer", "join_semi", "join_anti",
    "join_theta_range",
    # -- 51+: remaining stale greens in rotation order (if the cap
    # ever rises), then the r4-fresh block ----------------------------
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_approx_distinct",
    "agg_percentile", "agg_approx_percentile", "agg_stats_moments",
    "agg_pivot", "union_all_multi_table", "union_distinct",
    "intersect_keys", "except_keys", "global_topk_orders",
    "merge_upsert", "subquery_scalar", "subquery_exists_correlated",
    "subquery_not_in", "window_rank", "window_range_frame", "window_ntile",
    "string_funcs", "string_levenshtein", "string_regexp",
    "date_parts_format", "date_arith_retention", "math_funcs", "case_when",
    "array_funcs", "array_higher_order", "struct_nested", "map_funcs",
    "text_wordcount", "text_stats", "text_langid", "text_quality",
    "text_tokencount", "text_fingerprint", "udf_apply_in_pandas",
    "multimodal_frame_sample", "join_bucketed_colocated",
    "join_skew_salted", "sink_json_roundtrip", "sink_orc_roundtrip",
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
    from pg_archiver_spark.sources import jdbc  # noqa: F401

    ordered = [n for n in _DRIVER_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _DRIVER_PRIORITY
    ]
    for mapping in (QUERIES, ORACLES):
        items = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(items)
