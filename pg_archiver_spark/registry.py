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
# every round (the list does not rotate by itself). Round-3 spend:
#   slots 1-30  — the 30 operators with NO driver evidence after
#                 rounds 1+2 (CORRECTNESS_r01 ∪ r02): the 4 rows-only
#                 §2.B contract ops first, then every oracle-backed
#                 extension (each can earn full hash-green), then the
#                 rows-only ANN/stream/multimodal extensions;
#   slots 31-41 — regression re-proof: r1-greens whose function or
#                 oracle text changed after their last driver check
#                 (except_keys multiset fix, the G13 decimal→double
#                 sweep, sink tmp isolation);
#   slots 42-50 — operators added in round 3, all oracle-backed.
# Everything else follows in module registration order; re-pin again
# next round.
_DRIVER_PRIORITY = [
    # -- 1-4: §2.B contract ops, rows-only by design, never run ------
    "minhash_neardup", "source_jdbc", "stream_watermark_late",
    "stream_archival_foreachbatch",
    # -- 5-21: oracle-backed, never checked ---------------------------
    "stream_dedup_watermark", "stream_rate_trigger", "window_scd2_intervals",
    "window_cume_dist", "window_first_last",
    "pipeline_contamination", "pipeline_token_budget", "pipeline_domain_quota",
    "pipeline_pii_redact", "pipeline_train_test_split", "text_repetition",
    "pipeline_doc_chunking", "pipeline_seq_packing", "pipeline_source_mix",
    "stream_stream_join", "source_schema_evolution",
    "composed_q5_local_supplier",
    # -- 22-30: rows-only extensions, never run -----------------------
    "dedup_cluster_cc", "sim_ann_ivf_partitioned", "maintenance_compact",
    "dedup_simhash", "multimodal_binary_features", "sim_ann_lsh",
    "sim_ann_ivf", "stream_stateful_count", "sim_cosine_topk_arrow",
    # -- 31-41: re-proof of r1-greens whose code changed since r1 -----
    "except_keys", "agg_global_stats", "agg_stats_moments",
    "global_topk_orders", "join_inner_equi", "scan_filter_prune",
    "sink_csv_roundtrip", "sink_json_roundtrip", "sink_orc_roundtrip",
    "sink_parquet_sorted", "sink_parquet_partitioned",
    # -- 42-50: new in round 3, oracle-backed -------------------------
    "window_ntile_scalable", "analytics_sessionize", "analytics_funnel",
    "analytics_retention_cohort", "join_range_binned", "text_tfidf",
    "join_asof_tolerance", "agg_mode_stats", "window_rolling_distinct",
    # -- 51+: cumulative greens, most-load-bearing first, for rotation
    # if the cap ever rises ------------------------------------------
    "orderby_limit_topk", "agg_group_pricing", "join_broadcast_dim",
    "join_asof", "window_topk_per_group", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "sim_cosine_topk",
    "pipeline_training_prep", "multimodal_join", "stream_tumbling_daily",
    "stream_sliding", "stream_session", "udf_python_scalar",
    "udf_pandas_scalar", "udaf_pandas_grouped", "udtf_split",
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
