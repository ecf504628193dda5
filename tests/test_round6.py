"""Semantics tests for the round-6 operators.

The driver gate (tools/check.py) proves Spark↔DuckDB hash equality;
these pin what the hash alone can't: plan shapes (single fact scans,
exchange reuse), the Avro codec's spec-level behavior, the CDC
snapshot's three-way consistency flags, and the object-store
round-trip invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


# -- TPC-H tail --------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_min_cost_rows_are_per_part_minima(spark, sf_dir):
    rows = QUERIES["composed_q2_min_cost_supplier"](spark, sf_dir).collect()
    assert rows, "q2 empty at fixture scale"
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.unit_cost)
    # all surviving rows for one part carry the identical (min) cost
    for costs in by_part.values():
        assert len(set(costs)) == 1
    bals = [r.acctbal for r in rows]
    assert bals == sorted(bals, reverse=True)


def test_q21_single_lineitem_scan(spark, sf_dir):
    plan = _plan(QUERIES["composed_q21_waiting_orders"](spark, sf_dir))
    # exactly one parquet scan of the lineitem fixture in the plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan


def test_q21_numwait_counts_r_lines(spark, sf_dir):
    rows = QUERIES["composed_q21_waiting_orders"](spark, sf_dir).collect()
    assert rows
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)
    assert all(w >= 1 for w in waits)


def test_q15_top_supplier_is_argmax(spark, sf_dir):
    rows = QUERIES["composed_q15_top_supplier"](spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # ties all carry the max


def test_q20_single_lineitem_scan_and_semi_join(spark, sf_dir):
    df = QUERIES["composed_q20_part_surplus"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    rows = df.collect()
    names = [r.s_name for r in rows]
    assert names == sorted(names)
    assert len(names) == len(set(names))  # semi-join: no duplicates


def test_q22_threshold_excludes_below_average(spark, sf_dir):
    rows = QUERIES["composed_q22_global_sales"](spark, sf_dir).collect()
    for r in rows:
        # every group's mean balance is above the positive-average gate,
        # so per-customer average must be clearly positive
        assert r.totacctbal / r.numcust > 0


# -- Avro codec --------------------------------------------------------


def test_avro_codec_roundtrip_edge_values():
    from pg_archiver_spark.sources import avro_codec as ac

    fields = [("k", "long"), ("s", "string"), ("v", "double")]
    rows = [
        (0, "", 0.0),
        (-1, "héllo ✓", -0.5),
        (2**62, "x" * 300, 1e308),
        (-(2**62), "y", 5e-324),
    ]
    schema = ac.make_schema("edge", fields)
    path = "/tmp/test_round6_edge.avro"
    assert ac.write_container(path, schema, fields, rows) == len(rows)
    with open(path, "rb") as fh:
        f2, r2 = ac.read_container(fh.read())
    assert f2 == fields
    assert r2 == rows


def test_avro_codec_rejects_corrupt_sync():
    from pg_archiver_spark.sources import avro_codec as ac

    fields = [("k", "long")]
    path = "/tmp/test_round6_corrupt.avro"
    ac.write_container(path, ac.make_schema("c", fields), fields, [(1,), (2,)])
    with open(path, "rb") as fh:
        data = bytearray(fh.read())
    data[-1] ^= 0xFF  # flip a sync-marker byte
    with pytest.raises(ValueError, match="sync"):
        ac.read_container(bytes(data))


def test_avro_codec_rejects_wrong_magic():
    from pg_archiver_spark.sources import avro_codec as ac

    with pytest.raises(ValueError, match="container"):
        ac.read_container(b"PAR1notavro")


def test_avro_sink_profile_matches_source(spark, sf_dir):
    out = QUERIES["sink_avro_roundtrip"](spark, sf_dir)
    src = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    assert out.exceptAll(src).count() == 0
    assert src.exceptAll(out).count() == 0


# -- CDC change feed ---------------------------------------------------


def test_stream_cdc_changelog_consistent(spark, sf_dir):
    row = QUERIES["stream_cdc_changelog"](spark, sf_dir).collect()[0]
    assert row.snapshot_consistent
    assert row.n_inserts == 240
    # every update hits an even id among the inserted, minus none yet
    assert row.n_updates == 120
    # deletes hit MOD(id,5)=0 rows still present
    assert row.n_deletes == 48
    assert row.n_live_keys == row.n_inserts - row.n_deletes
    assert row.n_batches >= 2  # the feed actually streamed in pieces


# -- Object store ------------------------------------------------------


def test_s3_object_store_round_trip(spark, sf_dir):
    row = QUERIES["sink_s3_object_store"](spark, sf_dir).collect()[0]
    assert row.round_trip_ok
    assert row.objects_accounted and row.n_partitions >= 1
    src_n = load(spark, sf_dir, "events").count()
    assert row.n_rows == src_n


# -- dataset_diff id-namespace guard (ADVICE r5) -----------------------


def test_dataset_diff_fixture_ids_nonnegative(spark, sf_dir):
    # the diff op synthesizes added-doc ids as -id-1; disjointness
    # holds iff real doc ids are non-negative
    assert (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 0)
        .count()
        == 0
    )


# -- skew salting: wall-time evidence (r5 verdict task 8) --------------


def test_skew_salting_spreads_hot_key_across_shuffle_tasks(spark):
    """join_skew_salted is oracle-verified for CORRECTNESS; this pins
    that salting BUYS something — as task-level shuffle distribution,
    not wall time (r6 ADVICE: the old wall-clock ratio assert was
    load-sensitive on shared hardware). The straggler task IS the
    max-rows hash partition, so we assert on that directly: Spark
    hash-partitions a shuffle by murmur3 of the join keys (`F.hash`
    is the same murmur3), so the per-partition row counts below are
    exactly what the shuffle would deal to tasks — deterministic on
    every run and box. On a fact where ~95% of rows share one key,
    the unsalted max partition carries the whole hot key; salting by
    32 must cut the max task's rows by ≥4× (measured 6.3× — not 32×,
    because hashing 32 salt buckets into 32 tasks stacks a few buckets
    per task, classic balls-into-bins; murmur3 is deterministic, so
    the measured ratio never varies run to run)."""
    parts = 32
    ev = load(spark, "/root/testdata/sf0.01", "events")
    key = F.when(F.col("user_id") % 20 != 0, F.lit(0)).otherwise(
        F.col("user_id")
    )
    fact = ev.select(key.alias("k"), "event_id")
    n = fact.count()
    hot = fact.filter(F.col("k") == 0).count()
    assert hot > 0.9 * n  # the workload really is hot-key dominated

    def max_task_rows(cols: list[str]) -> int:
        return (
            fact.withColumn("salt", F.col("event_id") % parts)
            .groupBy(F.pmod(F.hash(*cols), F.lit(parts)).alias("task"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    unsalted_max = max_task_rows(["k"])
    salted_max = max_task_rows(["k", "salt"])
    assert unsalted_max >= hot  # the hot key lands on ONE task
    assert salted_max * 4 < unsalted_max, (
        f"salting no longer spreads the hot key: "
        f"unsalted_max={unsalted_max} salted_max={salted_max} n={n}"
    )


# -- incremental dedup / PQ / snapshot / CUSUM / CMS -------------------


def test_incremental_neardup_partitions_batch(spark, sf_dir):
    rows = QUERIES["pipeline_incremental_neardup"](spark, sf_dir).collect()
    counts = {r.status: r.n_docs for r in rows}
    n_new = (
        load(spark, sf_dir, "documents")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                "0", "1", "2"
            )
        )
        .count()
    )
    # the three classes partition the new batch exactly
    assert sum(counts.values()) == n_new
    assert counts.get("unique", 0) > 0


def test_pq_encode_codes_in_range_and_selfmatch(spark, sf_dir):
    from pg_archiver_spark.functions.similarity import (
        PQ_CENTROIDS,
        PQ_SUBSPACES,
    )

    df = QUERIES["sim_vector_pq_encode"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == load(spark, sf_dir, "embeddings").count()
    code_cols = [f"code{s}" for s in range(PQ_SUBSPACES)]
    for r in rows:
        for c in code_cols:
            assert 0 <= r[c] < PQ_CENTROIDS
    # Round 10 (trained codebooks): the old self-match invariant (the
    # first 16 vectors quantize to themselves) only holds for the
    # UNTRAINED init. ADVICE r10 #2: "every codeword used" is a
    # property of the current fixtures, not the algorithm -- assert
    # instead that the Spark encoding equals an independent numpy
    # nearest-codeword assignment over the trained codebooks (which
    # test_round10 pins bit-for-bit to the from-scratch numpy Lloyd
    # replay), plus determinism and a loose coverage floor (Lloyd from
    # a 16-point init should not collapse to a handful of cells).
    import numpy as np

    from pg_archiver_spark.functions.similarity import (
        PQ_SUBDIM,
        _pq_trained_codebooks,
    )

    cbs = np.asarray(_pq_trained_codebooks(spark, sf_dir))
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    for r in rows:
        v = emb[r.vec_id]
        for s, c in enumerate(code_cols):
            sub = v[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            # left-assoc fold, matching the Spark expression tree
            # (numpy .sum() pairwise-sums and could flip near-ties)
            d = np.zeros(len(cbs[s]))
            for k in range(PQ_SUBDIM):
                diff = cbs[s][:, k] - sub[k]
                d = d + diff * diff
            assert r[c] == int(np.argmin(d)), (r.vec_id, s)
    used = {r[c] for r in rows for c in code_cols}
    assert len(used) >= PQ_CENTROIDS // 2, sorted(used)
    assert rows == df.collect()


def test_snapshot_time_travel_isolation(spark, sf_dir):
    rows = QUERIES["maintenance_snapshot_time_travel"](spark, sf_dir).collect()
    prof = {r.snapshot: r for r in rows}
    total = load(spark, sf_dir, "events").count()
    # v1 is a strict subset; v2 is the full table (append preserved v1)
    assert 0 < prof["v1"].n_rows < prof["v2"].n_rows
    assert prof["v2"].n_rows == total


def test_cusum_changepoint_detects_planted_shift(spark, sf_dir):
    # synthetic series: flat at 10 for days 0-19, flat at 20 for 20-39 —
    # the CUSUM argmax must land exactly at the boundary (day 19, the
    # last pre-shift prefix maximizes |n*prefix - k*total|)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_type": ["synthetic"] * 40,
            "day_idx": list(range(40)),
            "x": [10.0] * 20 + [20.0] * 20,
        }
    )
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import Window

    tot = sdf.groupBy("event_type").agg(
        F.sum("x").alias("total"), F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day_idx")
    pre = (
        sdf.join(tot, "event_type")
        .withColumn(
            "prefix",
            F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("k", F.row_number().over(w))
    )
    scored = pre.select(
        "day_idx",
        F.abs(F.col("prefix") * F.col("n") - F.col("total") * F.col("k")).alias(
            "dev"
        ),
    )
    best = scored.orderBy(F.desc("dev"), "day_idx").first()
    assert best.day_idx == 19, best


def test_count_min_sketch_bounds(spark, sf_dir):
    rows = QUERIES["agg_count_min_sketch"](spark, sf_dir).collect()
    assert len(rows) == 5  # five event types
    for r in rows:
        assert r.no_undercount  # one-sided CMS guarantee


def test_containment_pairs_bounded_on_fixture(spark, sf_dir):
    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows, "no containment pairs at fixture scale"
    for r in rows:
        assert r.contained_doc != r.container_doc
        assert 0.8 <= r.containment <= 1.0


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    # the directional case the fixture lacks (its planted dups are all
    # same-length): a short doc quoted verbatim inside a much longer
    # one. Containment(short→long) must be 1.0 while Jaccard — and the
    # reverse containment — stay far below any threshold.
    from pg_archiver_spark.functions.dedup import _shingles

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long = filler + " " + short + " " + filler.replace("w", "v")
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    ).select("doc_id", _shingles(F.col("text")).alias("sh"))
    a, b = {r.doc_id: set(r.sh) for r in df.collect()}.values()
    inter = len(a & b)
    assert inter / len(a) == 1.0          # short fully contained
    assert inter / len(b) < 0.1           # reverse containment tiny
    assert inter / len(a | b) < 0.1       # Jaccard misses it entirely
