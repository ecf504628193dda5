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
# every round (the list does not rotate by itself). Round-6 spend:
# CORRECTNESS_r05 was 50/50 green, so after r4+r5 exactly 100 ops carry
# post-fixture-regen driver evidence and 94 are stale (latest driver
# check r≤3, i.e. BEFORE the events ns→µs / dates ms→µs regeneration).
# This round's window takes the 94 stale ops oldest-driver-evidence
# first (computed from CORRECTNESS_r01..r05 latest-round-per-op):
#   slots 1-24  — the 24 ops whose only driver check is r1;
#   slots 25-50 — the first 26 of the 43 r2-latest ops.
# Slots 51+ hold the remaining 17 r2 ops and the 27 r3 ops (round 7's
# window), then this round's new additions (round 7/8), then the
# r4/r5-fresh greens. Re-pin again next round so the drain completes.
_DRIVER_PRIORITY = [
    # -- last driver evidence r1 (24 ops) -----------------------------
    "select_literal", "agg_having", "agg_distinct_per_group",
    "scan_parquet_full", "project_prune", "filter_in_list",
    "filter_null_safe", "join_star_multiway", "join_left_outer",
    "join_semi", "join_anti", "join_theta_range",
    "agg_rollup", "agg_cube", "agg_approx_distinct",
    "agg_percentile", "agg_approx_percentile", "agg_pivot",
    "union_all_multi_table", "union_distinct", "intersect_keys",
    "subquery_scalar", "subquery_exists_correlated", "subquery_not_in",
    # -- last driver evidence r2 (43 ops) -----------------------------
    "json_extract", "dedup_dropduplicates", "sample_deterministic",
    "agg_time_bucket_rollup", "agg_group_pricing", "join_broadcast_dim",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_cosine_topk", "pipeline_training_prep", "multimodal_join",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_split", "sim_label_avg", "agg_grouping_sets",
    "merge_upsert", "window_rank", "window_range_frame",
    "window_ntile", "string_funcs", "string_levenshtein",
    "string_regexp", "date_parts_format",
    # ---- slot-50 boundary: names below land in round 7's window -----
    "date_arith_retention",
    "math_funcs", "case_when", "array_funcs",
    "array_higher_order", "struct_nested", "map_funcs",
    "text_wordcount", "text_stats", "text_langid",
    "text_quality", "text_tokencount", "text_fingerprint",
    "udf_apply_in_pandas", "multimodal_frame_sample",
    "join_bucketed_colocated", "join_skew_salted",
    # -- last driver evidence r3 (27 ops) -----------------------------
    "minhash_neardup", "scan_filter_prune", "join_inner_equi",
    "agg_stats_moments", "except_keys", "global_topk_orders",
    "sink_json_roundtrip", "sink_orc_roundtrip", "composed_q5_local_supplier",
    "window_cume_dist", "dedup_simhash", "dedup_cluster_cc",
    "pipeline_contamination", "pipeline_token_budget", "pipeline_domain_quota",
    "pipeline_pii_redact", "pipeline_train_test_split", "text_repetition",
    "pipeline_doc_chunking", "pipeline_seq_packing", "pipeline_source_mix",
    "multimodal_binary_features", "sim_ann_lsh", "sim_ann_ivf",
    "sim_ann_ivf_partitioned", "sim_cosine_topk_arrow", "text_tfidf",
    # -- round-6 additions (no driver evidence yet; round 7/8 window) -
    "composed_q2_min_cost_supplier", "composed_q21_waiting_orders",
    "composed_q15_top_supplier", "composed_q20_part_surplus",
    "composed_q22_global_sales", "stream_cdc_changelog",
    "sink_avro_roundtrip", "sink_s3_object_store",
    "pipeline_incremental_neardup", "sim_vector_pq_encode",
    "composed_q8_market_share", "composed_q9_product_profit",
    "composed_q11_important_stock", "composed_q13_order_distribution",
    "composed_q16_supplier_part_cnt", "composed_q17_small_qty_revenue",
    "maintenance_snapshot_time_travel", "analytics_cusum_changepoint",
    "window_percent_rank", "agg_count_min_sketch", "dedup_containment",
    "multimodal_image_resize", "multimodal_audio_features",
    # Everything not named here (the r4/r5-fresh greens) follows in
    # registration order via load_all_operators()'s fallback.
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
