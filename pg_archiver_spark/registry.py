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
# every round (the list does not rotate by itself). Round-7 spend:
# CORRECTNESS_r06 was 50/50 green (24 r1-stale + 26 r2-stale retired),
# so the remaining backlog is 44 stale ops (17 r2-latest + 27 r3-latest
# — all pre-fixture-regen evidence) and 23 never-checked r6 additions.
# This round's window (slots 1-50), per VERDICT r6 item #1:
#   slots 1-17  — the 17 r2-latest ops;
#   slots 18-44 — the 27 r3-latest ops;
#   slots 45-50 — six sql-checked never-checked r6 ops (hash verdicts).
# ROUND-8 PIN (write it now so the rotation survives a context reset):
# slots 1-17 of r8 = the remaining never-checked tail in the order they
# appear below after the slot-50 boundary (composed_q2_min_cost_supplier
# ... multimodal_audio_features, minus the six promoted this round),
# slots 18-45 = the 28 round-7 additions in registration order (the 8
# early-r7 ops sink_manifest_committer / maintenance_materialized_rollup
# / json_variant_shred / sql_pipe_syntax / sql_recursive_date_spine /
# analytics_heavy_hitters_twopass / sim_vector_pq_search /
# maintenance_constraint_audit, then the 20 late-r7 ops join_full_outer
# ... stream_multisink_atomic), preferring sql-checked ops first so the
# window yields hash verdicts; remaining slots = oldest fresh greens
# (r4-latest ops). Session-2 of r7 added 19 more never-checked ops
# (analytics_market_basket ... pipeline_length_batching, registration
# order) — queue them AFTER the 28 above in the r8/r9 windows, again
# sql-checked first; all 19 carry local gate evidence at three SFs.
# Session-3 of r7 added 20 more (analytics_ks_test ...
# analytics_seasonal_residual_outliers, registration order; 19
# sql-checked + 1 rows-only) — queue them last in the r8/r9 rotation;
# all 20 carry local 3-SF gate evidence and op-level pytest.
# Session-4 of r7 added 51 more, closing the round at 359 registered
# (318 sql-checked): bucket-offset prefix sum, Markov removal
# attribution, regex sequence screen, minhash PR eval, hard-negative
# mining, Theil-Sen, watermark-dedup contract, chained streaming
# rollup, WARC ingest, Mann-Whitney U, kNN label-recovery eval, FIM
# transform, fixed-width source, k-fold assign, chat template, Pareto
# ABC, blocked fuzzy join, permutation test, Shapley attribution,
# collation groupby, MMR rerank, PSI drift, OLS normal equations,
# forecast backtest, BFS distance, DPO pairs, rolling regression,
# winsorized mean, Goertzel weekly power, two-pass exact quantile,
# DAU/WAU stickiness, root-cause contribution, SPRT sequential,
# RocksDB state store, state-store reader, nested schema pruning,
# binary-quantize Hamming, Arrow UDTF ngrams, Pettitt changepoint,
# shuffle-hash hint, YoY growth, attribution rules, price index,
# curriculum phases, pHash image near-dup, audio fingerprint near-dup,
# LOCF gap fill, exact ROC AUC, lift/gains table, XYZ variability
# bands, Zipf fit — queue them after
# the session-2/3 tails in the
# r8/r9/r10 rotation, sql-checked first; all carry local 3-SF gate
# evidence and op-level pytest.
_DRIVER_PRIORITY = [
    # -- last driver evidence r2 (17 ops) -----------------------------
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
    # -- never-checked r6 ops promoted into r7's window (sql-checked,
    #    so each yields a hash verdict rather than rows-only) ---------
    "dedup_containment", "pipeline_incremental_neardup",
    "sim_vector_pq_encode", "composed_q21_waiting_orders",
    "maintenance_snapshot_time_travel", "window_percent_rank",
    # ---- slot-50 boundary: names below land in round 8's window -----
    "composed_q2_min_cost_supplier", "composed_q15_top_supplier",
    "composed_q20_part_surplus", "composed_q22_global_sales",
    "stream_cdc_changelog", "sink_avro_roundtrip", "sink_s3_object_store",
    "composed_q8_market_share", "composed_q9_product_profit",
    "composed_q11_important_stock", "composed_q13_order_distribution",
    "composed_q16_supplier_part_cnt", "composed_q17_small_qty_revenue",
    "analytics_cusum_changepoint", "agg_count_min_sketch",
    "multimodal_image_resize", "multimodal_audio_features",
    # Everything not named here (the r4/r5/r6-fresh greens) follows in
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
