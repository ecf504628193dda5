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
# ROUND-13 PIN (executes VERDICT r12 item #1): all 50 r12-window names
# landed fresh r12 evidence (CORRECTNESS_r12 50/50 green) and are
# deleted. The registry's evidence backlog is empty (394/394 hold a
# green latest check), so from this round on the window is a pure
# freshness rotation: lead with any r13 session additions or ops whose
# output hashes change this session, then fill oldest-driver-evidence-
# first — here all 32 remaining r4-evidence greens, topped up with the
# 18 oldest r5-evidence greens in registry order.
# ROUND-14 PIN (write now in case of context reset): delete every
# name below that holds r13 evidence (expected: all 50), bump
# _PIN_ROUND to 14, lead with any r14 session additions / changed-
# hash ops, then fill oldest-evidence-first greens — the pool after
# this rotation is the 26 remaining r5 greens (sim_batch_knn_join,
# composed_q7_volume_shipping, join_null_safe_eq, and onward in
# registry order), then r6.
_DRIVER_PRIORITY = [
    # hashes changed this session (ADVICE r12 fixes: ndcg -1 sentinel
    # now reachable via left join; KMV/chisq count-magnitude outputs
    # moved off ROUND(.,6) onto exact-integer ladders):
    "ml_ndcg_at_k",
    "agg_kmv_jaccard_estimate",
    "analytics_chisq_independence",
    # oldest-driver-evidence greens (all 32 r4-evidence ops, registry
    # order):
    "window_gaps_islands",
    "window_ewma",
    "analytics_zscore_outliers",
    "filter_range_cutoff",
    "filter_conjunction",
    "cast_epoch_ms",
    "join_asof",
    "join_interval_pairs",
    "join_asof_tolerance",
    "composed_q3_shipping_priority",
    "join_bloom_runtime_filter",
    "composed_q18_large_orders",
    "sink_csv_roundtrip",
    "sink_parquet_sorted",
    "sink_parquet_partitioned",
    "source_schema_evolution",
    "sample_stratified",
    "scan_dpp_partition_pruned",
    "maintenance_incremental_agg",
    "layout_zorder_scan",
    "orderby_limit_topk",
    "subquery_lateral_topn",
    "window_topk_per_group",
    "window_lag_lead",
    "window_running_sum",
    "window_first_last",
    "window_ntile_scalable",
    "window_scd2_intervals",
    "stream_tumbling_daily",
    "stream_dedup_watermark",
    "stream_rate_trigger",
    "stream_stream_join",
    # next-oldest greens (r5 evidence, registry order), topping up to
    # 50:
    "agg_bitmap_distinct",
    "agg_string_concat_groups",
    "analytics_mad_outliers",
    "analytics_markov_transitions",
    "analytics_rfm_segments",
    "analytics_linreg_trend",
    "analytics_cumulative_users",
    "analytics_ab_ztest",
    "analytics_time_to_convert",
    "analytics_seasonality_profile",
    "analytics_zero_filled_report",
    "window_nth_value",
    "composed_q10_returned_items",
    "composed_q12_priority_shipmode",
    "composed_q14_promo_revenue",
]

# The round this pin was written for. tests/test_registry_rotation.py
# ignores CORRECTNESS files from rounds >= this when deciding whether
# the window is stale (ADVICE r9 #1: the driver writes CORRECTNESS_r12
# DURING round 12, giving the window ops fresh full passes -- that is
# the pin WORKING, not a stale pin; only evidence from rounds BEFORE
# the pin means the budget would be wasted re-verifying greens).
# ADVICE r10 #4: the rotation test also asserts _PIN_ROUND equals
# 1 + the max round present in CORRECTNESS_r*.json, so bumping this
# without actually re-pinning the window re-arms the tripwire instead
# of disarming it.
_PIN_ROUND = 13


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
