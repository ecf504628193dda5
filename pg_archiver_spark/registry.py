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
# every round (the list does not rotate by itself). Round-4 spend:
# the driver regenerated /root/testdata between the round-3 build and
# its evaluation (events.ts went timestamp[ns] → timestamp[us]), which
# crashed every events-reading op in CORRECTNESS_r03 at catalog.load.
# catalog.load is now schema-adaptive, so:
#   slots 1-23  — the 23 ops that ERRORED in r3 (all events-based;
#                 §2.B contract ops first, then oracle-backed
#                 extensions, then rows-only streaming);
#   slots 24-39 — the 16 round-3 additions that have never appeared
#                 in any driver round (registered past slot 50);
#   slots 40-50 — re-proof of §2.B events-based greens: their r1/r2
#                 hashes were earned on the OLD ns fixtures, so they
#                 need one green on the regenerated data (flagship
#                 first).
# Everything else follows in module registration order; re-pin again
# next round.
_DRIVER_PRIORITY = [
    # -- 1-23: errored in r3 on the regenerated fixtures --------------
    "source_jdbc", "stream_watermark_late", "stream_archival_foreachbatch",
    "sink_parquet_partitioned", "agg_global_stats",
    "sink_csv_roundtrip", "sink_parquet_sorted",
    "window_scd2_intervals", "window_first_last",
    "stream_dedup_watermark", "stream_rate_trigger", "stream_stream_join",
    "source_schema_evolution", "window_ntile_scalable",
    "analytics_sessionize", "analytics_funnel", "analytics_retention_cohort",
    "join_range_binned", "join_asof_tolerance", "agg_mode_stats",
    "window_rolling_distinct", "maintenance_compact", "stream_stateful_count",
    # -- 24-39: round-3 additions never reached by a driver window ----
    "agg_unpivot", "window_gaps_islands", "composed_q3_shipping_priority",
    "sample_stratified", "scan_dpp_partition_pruned",
    "join_bloom_runtime_filter", "composed_q18_large_orders",
    "maintenance_incremental_agg", "layout_zorder_scan",
    "subquery_lateral_topn", "window_ewma", "analytics_zscore_outliers",
    "analytics_histogram", "agg_hll_partial_merge", "graph_pagerank",
    "ml_kmeans_lloyd",
    # -- 40-50: events-based §2.B greens re-proven on the new data ----
    "orderby_limit_topk", "filter_range_cutoff", "filter_conjunction",
    "cast_epoch_ms", "agg_max_timestamp", "window_topk_per_group",
    "window_lag_lead", "window_running_sum", "join_asof",
    "join_interval_pairs", "stream_tumbling_daily",
    # -- 51+: remaining events-dependent ops first (stale-data greens,
    # for rotation if the cap ever rises), then cumulative greens -----
    "stream_sliding", "stream_session", "select_literal", "agg_having",
    "agg_distinct_per_group", "json_extract", "dedup_dropduplicates",
    "sample_deterministic", "agg_time_bucket_rollup", "window_cume_dist",
    "agg_group_pricing", "join_broadcast_dim", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "sim_cosine_topk",
    "pipeline_training_prep", "multimodal_join", "udf_python_scalar",
    "udf_pandas_scalar", "udaf_pandas_grouped", "udtf_split",
    "minhash_neardup",
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
