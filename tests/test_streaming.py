"""Streaming tests: batch-equivalence of windowed aggregations and the
incremental archiver's safety invariants (SURVEY.md §5.2)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def test_stream_tumbling_equals_batch(spark, sf_dir, tmp_path):
    """A tumbling-window count over a file-source stream (replayed in 3
    micro-batches) must equal the same aggregation run in batch mode —
    the exactness guarantee micro-batch execution is supposed to give."""
    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "value")
    )
    staging = str(tmp_path / "staging")
    events.repartition(3).write.parquet(staging)

    batch = {
        (r.day.isoformat(), r.n)
        for r in events.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "n")
        .collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    query = (
        stream.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "n")
        .writeStream.format("memory")
        .queryName("tumbling_equiv_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    streamed = {
        (r.day.isoformat(), r.n)
        for r in spark.sql("SELECT day, n FROM tumbling_equiv_sink").collect()
    }
    assert streamed == batch


def test_archival_stream_invariants(spark, sf_dir):
    """archived ∪ remaining == source and archived ∩ remaining == ∅."""
    row = QUERIES["stream_archival_foreachbatch"](spark, sf_dir).first()
    assert row.invariants_ok
    assert row.n_archived + row.n_remaining == row.n_source
    assert row.n_archived > 0


def test_watermark_emits_each_window_at_most_once(spark, sf_dir):
    """Append-mode watermarking guarantees at-most-once emission per
    window (and bounded state) — NOT guaranteed late-row dropping, which
    Spark documents as best-effort. Each window start must appear
    exactly once in the sink, and only watermark-finalized windows are
    emitted (the newest batch's windows stay open)."""
    rows = QUERIES["stream_watermark_late"](spark, sf_dir).collect()
    assert len(rows) > 0
    starts = [r.window_start for r in rows]
    assert len(starts) == len(set(starts)), "a window was emitted twice"
    # The final watermark comes from the day-5 batch; every emitted
    # window ends at or before it (window_start is a formatted string).
    assert all(r.window_start[:10] <= "2024-01-05" for r in rows)


def test_stateful_count_equals_batch(spark, sf_dir):
    """The applyInPandasWithState running counter's final state must
    equal the batch-mode per-user profile."""
    expected = {
        (r.user_id, r.n)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r.user_id, r.n_events)
        for r in QUERIES["stream_stateful_count"](spark, sf_dir).collect()
    }
    assert got == expected


def test_cli_archiver_runs(spark, sf_dir, tmp_path, monkeypatch):
    """python -m pg_archiver_spark end-to-end with an explicit cutoff."""
    from pg_archiver_spark.archiver import run

    monkeypatch.setenv("ARCHIVER_CUTOFF", "2024-01-15")
    monkeypatch.setenv("ARCHIVER_SOURCE_DIR", sf_dir)
    monkeypatch.setenv("ARCHIVER_DEST_DIR", str(tmp_path / "archive"))
    stats = run()
    assert stats["archived_rows"] > 0
    back = spark.read.parquet(str(tmp_path / "archive"))
    assert back.count() == stats["archived_rows"]
    assert dict(back.dtypes)["ts"].startswith("timestamp")


def test_stream_stream_join_equals_batch_join(spark, sf_dir):
    """The watermarked stream-stream interval join must produce exactly
    the batch join's pair set (the 30-day watermark exceeds the
    fixture's span, so no state is evicted mid-run and the availableNow
    drain is lossless)."""
    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"), "user_id"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("user_id").alias("p_user"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("user_id").alias("n_users"),
        F.coalesce(F.sum(F.col("c_id") + F.col("p_id")), F.lit(0)).alias(
            "id_checksum"
        ),
    ).collect()[0]
    streamed = QUERIES["stream_stream_join"](spark, sf_dir).collect()[0]
    assert (streamed.n_pairs, streamed.n_users, streamed.id_checksum) == (
        batch.n_pairs,
        batch.n_users,
        batch.id_checksum,
    )


def test_dedup_within_watermark_bounds_state_and_filters_late(spark, sf_dir):
    from pg_archiver_spark.registry import QUERIES

    r = QUERIES["stream_dedup_within_watermark"](spark, sf_dir).collect()[0]
    # 9-ish keys were fed three times total (once base, twice dup),
    # yet output equals the base exactly: in-delay dups suppressed by
    # state, beyond-delay replays filtered by the late gate.
    assert r.n_dup_keys > 0
    assert r.n_emitted == r.n_base


def test_chained_window_agg_equals_batch_daily(spark, sf_dir):
    from pyspark.sql import functions as F

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.registry import QUERIES

    got = QUERIES["stream_chained_window_agg"](spark, sf_dir).collect()
    ref = (
        load(spark, sf_dir, "events")
        .groupBy(F.expr("ts_ns DIV 1000000 DIV 86400000").alias("day_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("day_id")
        .collect()
    )
    assert [(r.day_id, r.n_events, r.sum_value) for r in got] == [
        (r.day_id, r.n_events, r.sum_value) for r in ref
    ]
