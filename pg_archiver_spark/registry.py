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
# ROUND-12 PIN (executes VERDICT r11 item #1): all 50 r11-window names
# hold fresh r11 evidence and are deleted. The window leads with the
# nine r11 session additions that missed the r11 window, then the
# EIGHT r12 session additions (mann_kendall, threshold sweep, ndcg,
# count-min, runs test, skew/kurtosis, push archival, brier decomp —
# all never driver-checked), then the two ops whose outputs were
# re-rounded post-check, then the 20 R12-AUDIT sweep ops whose output
# hashes changed this session, topped up with oldest-evidence (r4)
# greens (several greens were swapped OUT as session ops landed, per
# the keep-the-window-first-time rule).
# ROUND-13 PIN (write now in case of context reset): delete every
# name below that holds r12 evidence (expected: all 50), bump
# _PIN_ROUND to 13, lead with any r13 session additions, then fill
# oldest-driver-evidence-first greens (r4-up: cast_epoch_ms,
# join_asof, join_interval_pairs, join_asof_tolerance,
# filter_range_cutoff, filter_conjunction, analytics_zscore_outliers,
# window_ewma were the greens displaced from the r12 window — they
# are the oldest-evidence pool to draw from first). From r13 on the
# whole registry holds current hash evidence and the window is a pure
# freshness rotation.
_DRIVER_PRIORITY = [
    # never driver-checked (r11 session additions):
    "text_stupid_backoff_lm",
    "text_pii_scrub",
    "sim_ann_nsw_beam",
    "sim_ann_nsw_recall_eval",
    "sample_weighted_reservoir",
    "analytics_event_sequence_match",
    "ml_naive_bayes_lang",
    "analytics_rfm_segmentation",
    "analytics_market_basket_lift",
    # round-12 session additions (never driver-checked):
    "analytics_mann_kendall",
    "ml_confusion_threshold_sweep",
    "ml_ndcg_at_k",
    "agg_countmin_sketch",
    "analytics_runs_test",
    "agg_skew_kurtosis",
    "source_notify_push_archival",
    "ml_brier_decomposition",
    "analytics_spearman_corr",
    # stale evidence (outputs re-rounded post-check, commit ed64783):
    "analytics_autocorrelation",
    "analytics_pettitt_changepoint",
    # R12 double-output sweep (outputs now engine-stable: ROUND(.,6)
    # +0.0 at small magnitudes, exact-integer ladders / ROUND(.,2) at
    # money magnitudes — hashes changed this session, fresh evidence
    # must land this round; details in SURVEY §9 round-12 deltas):
    "agg_kmv_jaccard_estimate",
    "analytics_attribution_position",
    "analytics_bootstrap_ci",
    "analytics_chisq_independence",
    "analytics_did_estimator",
    "analytics_ks_test",
    "analytics_mannwhitney_u",
    "analytics_pareto_abc",
    "analytics_permutation_test",
    "analytics_price_index",
    "analytics_root_cause_contribution",
    "analytics_seasonal_naive_backtest",
    "analytics_seasonal_residual_outliers",
    "analytics_shapley_attribution",
    "analytics_theil_sen_trend",
    "analytics_yoy_growth",
    "composed_q17_small_qty_revenue",
    "ml_calibration_bins",
    "pipeline_source_mix",
    "text_repetition",
    # oldest-driver-evidence greens (r4, registry order):
    "agg_global_stats",
    "agg_max_timestamp",
    "agg_mode_stats",
    "agg_unpivot",
    "analytics_histogram",
    "analytics_sessionize",
    "analytics_funnel",
    "analytics_retention_cohort",
    "join_range_binned",
    "window_rolling_distinct",
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
_PIN_ROUND = 12


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
