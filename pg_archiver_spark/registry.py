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
# ROUND-11 PIN (executes VERDICT r10 item #1): the 50 r10-evidenced
# names are deleted. Slots 1-23 are the remaining never-driver-checked
# ops (r10 queue order preserved); slots 24-26 are the three r10
# session additions (also never checked); slots 27-45 are the 19 ops
# whose only driver records are rows-only/no_oracle from rounds 1-5
# (since converted to sql oracles), oldest evidence first; slots 46-50
# top up from oldest-driver-evidence greens (r4, registry order).
# As r11 session ops land (pipeline_pretraining_e2e, ...), swap them
# in for the green top-ups so the window stays 100% first-time.
# ROUND-12 PIN (write now in case of context reset): delete every name
# below that holds r11 evidence (expected: all 50), bump _PIN_ROUND to
# 12, and fill the window with the r11 session additions that missed
# the window (text_stupid_backoff_lm, text_pii_scrub,
# sim_ann_nsw_beam, sim_ann_nsw_recall_eval,
# sample_weighted_reservoir, analytics_event_sequence_match,
# ml_naive_bayes_lang, analytics_rfm_segmentation,
# analytics_market_basket_lift — never driver-checked; they MUST
# lead the r12 window), then analytics_autocorrelation and
# analytics_pettitt_changepoint (outputs changed to the ROUND-6dp
# discipline after the seed-99 sweep found their full-precision
# doubles engine-unstable — their old driver evidence refers to the
# unrounded outputs), plus oldest-driver-evidence-first greens
# (r4-latest). R12 AUDIT (SURVEY §9): sweep the ~20 remaining
# unrounded CAST(int AS DOUBLE)/... output columns (grep
# '"AS DOUBLE) /"' minus ROUND) onto ROUND(.,6)+0.0 — stable on four
# random seeds today, but the >2^53 cast-ulp class is reachable at
# 100 TB magnitudes; batch each fix with that op's window slot so
# fresh driver evidence lands the same round.
# From r12 on the whole registry holds hash evidence, so the window
# becomes a pure freshness rotation.
_DRIVER_PRIORITY = [
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
    "sim_ivfpq_search",
    "pipeline_dsir_resample",
    "pipeline_tokenizer_fertility",
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
    # round-11 session additions (never driver-checked):
    "pipeline_pretraining_e2e",
    "pipeline_domain_reweight",
    "text_perplexity_filter",
    "sim_bm25_topk",
    "sim_bitext_margin_mine",
]

# The round this pin was written for. tests/test_registry_rotation.py
# ignores CORRECTNESS files from rounds >= this when deciding whether
# the window is stale (ADVICE r9 #1: the driver writes CORRECTNESS_r11
# DURING round 11, giving the window ops fresh full passes -- that is
# the pin WORKING, not a stale pin; only evidence from rounds BEFORE
# the pin means the budget would be wasted re-verifying greens).
# ADVICE r10 #4: the rotation test also asserts _PIN_ROUND equals
# 1 + the max round present in CORRECTNESS_r*.json, so bumping this
# without actually re-pinning the window re-arms the tripwire instead
# of disarming it.
_PIN_ROUND = 11


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
