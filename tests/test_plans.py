"""Physical-plan regression tests: the scale properties (pushdown,
broadcast, no cross products) must survive refactors."""

from __future__ import annotations

import pytest

from pg_archiver_spark.plans.inspect import physical_plan
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


@pytest.fixture(scope="module", autouse=True)
def _ops():
    load_all_operators()


def test_project_prune_pushes_filter_and_schema(spark, sf_dir):
    plan = physical_plan(QUERIES["project_prune"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan
    # Column pruning: untouched wide columns must not be read.
    assert "l_comment" not in plan and "l_extendedprice" not in plan


def test_events_cutoff_pushes_to_scan(spark, sf_dir):
    plan = physical_plan(QUERIES["orderby_limit_topk"](spark, sf_dir))
    assert "LessThan(ts_ns" in plan or "LessThan(ts," in plan
    # Sorted limit must be top-k, not a global sort.
    assert "TakeOrderedAndProject" in plan


def test_broadcast_dim_join_is_broadcast(spark, sf_dir):
    plan = physical_plan(QUERIES["join_broadcast_dim"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_star_join_has_no_shuffle_joins(spark, sf_dir):
    plan = physical_plan(QUERIES["join_star_multiway"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_theta_join_keeps_equi_prefix(spark, sf_dir):
    """The brand equi-key must keep this a hash join, not a nested-loop
    cross product."""
    plan = physical_plan(QUERIES["join_theta_range"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_semi_anti_plans(spark, sf_dir):
    assert "LeftSemi" in physical_plan(QUERIES["join_semi"](spark, sf_dir))
    assert "LeftAnti" in physical_plan(QUERIES["join_anti"](spark, sf_dir))


def test_embedding_cosine_has_no_nested_loop(spark, sf_dir):
    """The exact cosine pair join must stay a block-partitioned
    EQUI-join; a pure `vec1 < vec2` condition regresses to
    BroadcastNestedLoopJoin (all-pairs broadcast — the 100 TB killer)."""
    plan = physical_plan(QUERIES["dedup_embedding_cosine"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_agg_has_partial_aggregation(spark, sf_dir):
    """Grouped agg must map-side combine (partial_*) before the shuffle."""
    plan = physical_plan(QUERIES["agg_group_pricing"](spark, sf_dir))
    assert "partial_" in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Co-located bucketed join must not shuffle either side.

    At fixture size Catalyst correctly prefers a broadcast join, so we
    disable broadcast to surface the sort-merge path the bucketing is
    for — that's the 100 TB shape where neither side fits in memory."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["join_bucketed_colocated"](spark, sf_dir)
        plan = physical_plan(df)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # Exactly ONE exchange in the whole plan: the final aggregation.
        # The join itself reads the bucketed layout — no join-side
        # shuffles, no broadcast.
        tree = plan.split("(1) Scan")[0]
        n_exchanges = sum(
            "Exchange" in line for line in tree.splitlines()
        )
        assert n_exchanges == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_no_python_udf_in_builtin_ops(spark, sf_dir):
    """Core relational ops must stay JVM-side (no Python eval nodes)."""
    for name in ["agg_group_pricing", "join_inner_equi", "text_wordcount"]:
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_partitioned_scan_prunes_cells(spark, sf_dir):
    """The IVF index read must prune to the query's cell partition —
    PartitionFilters on `cell`, not a full-index scan."""
    plan = physical_plan(QUERIES["sim_ann_ivf_partitioned"](spark, sf_dir))
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_q5_pushes_date_range_and_broadcasts_dims(spark, sf_dir):
    """The composed Q5 plan must push the o_orderdate range into the
    orders scan (a scan reading the full table then filtering is wrong
    at 100 TB) and probe supplier/nation/region as broadcasts — no
    nested-loop or cartesian shapes anywhere."""
    plan = physical_plan(QUERIES["composed_q5_local_supplier"](spark, sf_dir))
    # o_orderdate exists only in the orders scan, so plan-wide matches
    # pin that scan's PushedFilters (the formatted plan splits a scan's
    # path and filters across lines).
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_schema_evolution_backfills_nulls(spark, sf_dir):
    """mergeSchema must surface the v2-only column as NULL for v1 rows
    (n_v1_rows == the even-event_id half of the table)."""
    from pg_archiver_spark.catalog import load

    row = QUERIES["source_schema_evolution"](spark, sf_dir).collect()[0]
    total = load(spark, sf_dir, "events").count()
    assert row.n_rows == total
    assert 0 < row.n_v1_rows < total
    assert row.v2_value_cents > 0


def test_ntile_scalable_matches_and_avoids_global_sort(spark, sf_dir):
    """The scalable twin returns exactly window_ntile's result, and its
    event-sized window runs partitioned by bucket — the only
    unpartitioned windows operate on the 256-row offset frame."""
    baseline = {
        (r.tile, r.event_type): r.n_events
        for r in QUERIES["window_ntile"](spark, sf_dir).collect()
    }
    scalable = {
        (r.tile, r.event_type): r.n_events
        for r in QUERIES["window_ntile_scalable"](spark, sf_dir).collect()
    }
    assert scalable == baseline
    plan = physical_plan(QUERIES["window_ntile_scalable"](spark, sf_dir))
    assert "hashpartitioning(bucket" in plan


def test_range_binned_join_is_equi_not_nested_loop(spark, sf_dir):
    """The band join must hit the derived-bin equi-join path — a
    BroadcastNestedLoopJoin/CartesianProduct here means the inequality
    predicate leaked into the join condition."""
    plan = physical_plan(QUERIES["join_range_binned"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_funnel_stages_join_on_user_key(spark, sf_dir):
    plan = physical_plan(QUERIES["analytics_funnel"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The month-dim filter must become a runtime partition-pruning
    subquery on the fact scan — NOT a static filter (that would mean
    constraint propagation ate the demo) and NOT a full scan."""
    plan = physical_plan(QUERIES["scan_dpp_partition_pruned"](spark, sf_dir))
    assert "dynamicpruning" in plan.lower()


def test_q3_topk_avoids_global_sort(spark, sf_dir):
    plan = physical_plan(QUERIES["composed_q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_unpivot_single_shuffle(spark, sf_dir):
    """Expand over the aggregated frame must not add exchanges beyond
    the one agg shuffle."""
    plan = physical_plan(QUERIES["agg_unpivot"](spark, sf_dir))
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_bloom_runtime_filter_injected_and_conf_isolated(spark, sf_dir):
    """The probe side must carry a runtime bloom-filter subquery
    (`might_contain` over `bloom_filter_agg`), and the op's threshold
    overrides must stay on its cloned session — the caller's conf (the
    driver's session) must keep the stock 10 GB probe threshold."""
    before = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    plan = physical_plan(QUERIES["join_bloom_runtime_filter"](spark, sf_dir))
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    after = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    assert after == before != "0"


def test_q18_single_lineitem_scan(spark, sf_dir):
    """The rewrite's point: one lineitem scan feeding the HAVING agg,
    not the textbook two (outer agg + IN-subquery), and a top-k final."""
    plan = physical_plan(QUERIES["composed_q18_large_orders"](spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_incremental_agg_prunes_both_branches(spark, sf_dir):
    """Base and delta partials must each push their cutoff predicate
    into the orders scan — the delta branch touching only new data is
    what makes the maintenance incremental."""
    plan = physical_plan(QUERIES["maintenance_incremental_agg"](spark, sf_dir))
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_ewma_lag_stack_single_window_pass(spark, sf_dir):
    """All 9 lags share one window spec — the plan must contain exactly
    one Window node (one sort, one pass), not nine."""
    import re

    plan = physical_plan(QUERIES["window_ewma"](spark, sf_dir))
    # The formatted plan names each node twice (tree + detail section);
    # count distinct Window node ids instead of raw substrings.
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_zscore_stats_join_is_broadcast(spark, sf_dir):
    plan = physical_plan(QUERIES["analytics_zscore_outliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_static_partition_pruning_from_directory_names(spark, sf_dir):
    """The day-range predicate must be satisfied from the hive layout's
    directory names (PartitionFilters), not from row-group stats of
    opened files — the README.md:92 downstream pattern."""
    from pg_archiver_spark.operators.scans import scan_partition_pruned_static

    df = scan_partition_pruned_static(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:250]
    assert "day" in seg and ("5" in seg and "9" in seg)


def test_vocab_coverage_topk_no_window(spark, sf_dir):
    """The coverage curve must rank only the top-100 terms, never the
    full vocabulary: the plan shows TakeOrderedAndProject bounding the
    frame, contains NO window operator at all (the r4 form moved the
    whole vocab to one task via an unpartitioned window), and the
    total arrives via broadcast, not a driver .first()."""
    plan = physical_plan(QUERIES["pipeline_vocab_coverage"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan and "WindowExec" not in plan
    assert "BroadcastExchange" in plan


def test_countmin_build_is_partial_agg_no_cartesian(spark, sf_dir):
    """The sketch build must stay a posexplode → partial-agg collapse
    (DEPTH·WIDTH cells), never a join against the corpus."""
    plan = physical_plan(QUERIES["agg_countmin_sketch"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate posexplode" in plan or "posexplode" in plan


def test_threshold_sweep_single_pass_broadcast_spine(spark, sf_dir):
    """All nine operating points fold in one agg over a broadcast
    9-row spine — a SortMergeJoin here would mean the spine shuffled
    the corpus."""
    plan = physical_plan(
        QUERIES["ml_confusion_threshold_sweep"](spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ndcg_panel_broadcasts_not_shuffles(spark, sf_dir):
    """The 16-query panel must broadcast onto the corpus scoring pass;
    a shuffle join on the panel would re-partition the corpus."""
    plan = physical_plan(QUERIES["ml_ndcg_at_k"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
