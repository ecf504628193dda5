"""Streaming window operators.

The reference names streaming archival as intended scope
(README.md:124) but ships batch only. Here the window *semantics*
(tumbling / sliding / session) are declared with the exact operators
Structured Streaming executes — ``F.window`` / ``F.session_window`` —
evaluated on static frames so the DuckDB oracle can check them; the
true incremental ops (watermark, foreachBatch archival) live in
``archival.py`` as rows-only checks.

Windows are computed on ms-floored timestamps: events.ts is ns at rest,
Spark µs in flight, and the oracle floors to ms — flooring BEFORE the
window math makes gap/bucket comparisons identical in both engines
(SURVEY.md §8 G1/G7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts_ms = ms-floored timestamp (shared engine/oracle
    precision) alongside the raw columns."""
    return load(spark, sf_dir, "events").withColumn(
        "ts_ms", F.timestamp_millis(F.expr("ts_ns DIV 1000000"))
    )


@register(
    "stream_tumbling_daily",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY day
    """,
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window — ``F.window(ts, '1 day')``, the same
    operator a readStream plan uses; per-day counts + decimal sums."""
    ev = _events_ms(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts_ms", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        # Day as a STRING: a DATE column round-trips through the
        # driver's pandas fetch as midnight Timestamp on the oracle side
        # but datetime.date from Spark collect — strings compare stably
        # in both (G13).
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT strftime(window_start, '%Y-%m-%d') AS window_day,
           COUNT(*) AS n_events
    FROM (
        SELECT unnest([
            date_trunc('day', ts) - INTERVAL 1 DAY,
            date_trunc('day', ts)
        ]) AS window_start
        FROM events
    )
    GROUP BY window_day
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 2-day length, 1-day slide — every event lands in
    exactly two windows. The oracle unnests the two bucket starts."""
    ev = _events_ms(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts_ms", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("window_day"), "n_events"
        )
    )


@register(
    "stream_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
        FROM events
    ),
    flagged AS (
        SELECT user_id, ms,
               CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ),
    sized AS (
        SELECT user_id, session_id, COUNT(*) AS session_size
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST((SUM(session_size) * 1000) // COUNT(*) AS BIGINT) AS avg_size_milli
    FROM sized
    GROUP BY user_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute gap — ``F.session_window``, the same
    stateful operator Structured Streaming runs with a state store.

    Boundary semantics (G7, verified empirically on PySpark 4.1.2 in
    tests/test_operators.py::test_session_window_boundary): a gap of
    EXACTLY the session duration still merges — a new session starts
    only when gap > duration. The oracle mirrors this with
    ``ms - prev_ms > 1800000``. Both sides compare ms-floored values,
    so the boundary test is identical.

    The mean session size is reported in exact milli-units via integer
    floor division — a ROUND(avg, 2) ties when a user's session count
    divides cleanly (e.g. 82/80 events = 1.025) and Spark/DuckDB break
    such ties differently (observed at sf0.1).
    """
    ev = _events_ms(spark, sf_dir)
    per_session = ev.groupBy(
        "user_id", F.session_window("ts_ms", "30 minutes").alias("w")
    ).agg(F.count("*").alias("session_size"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.expr("(SUM(session_size) * 1000) DIV COUNT(*)").alias("avg_size_milli"),
    )
