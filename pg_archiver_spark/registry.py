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
# registration order is a verification budget. Round 1 spent all 50
# slots on the basic operator modules and left every window / scalar /
# text / dedup / similarity / streaming / UDF operator unchecked. This
# list front-loads (a) the 9 round-1 hash failures, to prove the G13
# schema fixes, then (b) every oracle-backed operator with no driver
# evidence yet. Exactly 50 names. Everything else follows in module
# registration order and rotates into later rounds.
_DRIVER_PRIORITY = [
    # round-1 hash_match failures, now fixed (G13):
    "agg_group_pricing", "agg_grouping_sets", "agg_time_bucket_rollup",
    "join_broadcast_dim", "join_asof", "join_bucketed_colocated",
    "join_skew_salted", "sample_deterministic", "merge_upsert",
    # never driver-checked, oracle-backed — §2.B contract first:
    "window_topk_per_group", "window_rank", "window_lag_lead",
    "window_running_sum", "window_range_frame", "window_ntile",
    "dedup_exact", "dedup_dropduplicates", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "multimodal_join", "multimodal_frame_sample",
    "pipeline_training_prep",
    "string_funcs", "string_levenshtein", "string_regexp",
    "date_parts_format", "date_arith_retention", "math_funcs",
    "case_when", "json_extract", "array_funcs", "array_higher_order",
    "struct_nested", "map_funcs",
    "sim_cosine_topk", "sim_label_avg",
    "text_wordcount", "text_stats", "text_langid", "text_quality",
    "text_tokencount", "text_fingerprint",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udf_apply_in_pandas", "udtf_split",
    "stream_tumbling_daily", "stream_sliding", "stream_session",
    # slots 51+: new round-2 oracle-backed ops, then never-checked
    # rows-only ops — evidence before re-checking already-green basics
    # if the cap ever rises:
    "stream_dedup_watermark", "stream_rate_trigger", "window_scd2_intervals",
    "sink_csv_roundtrip", "sink_json_roundtrip", "sink_orc_roundtrip",
    "sink_parquet_sorted", "sink_parquet_partitioned",
    "dedup_cluster_cc", "sim_ann_ivf_partitioned", "maintenance_compact",
    "minhash_neardup", "dedup_simhash", "multimodal_binary_features",
    "sim_ann_lsh", "sim_ann_ivf", "stream_archival_foreachbatch",
    "stream_stateful_count", "stream_watermark_late", "source_jdbc",
    "window_cume_dist", "window_first_last",
    "pipeline_contamination", "pipeline_token_budget", "pipeline_domain_quota",
    "pipeline_pii_redact", "pipeline_train_test_split", "text_repetition",
    "pipeline_doc_chunking", "pipeline_seq_packing", "pipeline_source_mix",
    "stream_stream_join", "sim_cosine_topk_arrow", "source_schema_evolution",
    "composed_q5_local_supplier",
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
