"""The archiver itself — pg-archiver's pipeline, Spark-native.

Reference pipeline (main.go:147-256): per-table cursor read below a
cutoff → in-memory union → single Parquet file keyed by the batch's max
timestamp → S3 PutObject → DELETE everything below the cutoff. Four
defects documented in SURVEY.md §4.4 are fixed here:

  D1 read-limit/delete-all data loss → delete exactly the archived key
     set (the ledger written per batch), never a blanket cutoff DELETE
  D2 single-partition misplacement   → per-row partitionBy(year, month)
  D3 non-atomic archive+delete       → idempotent per-batch-id output
     dirs: a retried micro-batch overwrites its own output, and the
     delete ledger is derived from committed archive output only
  D4 fixed temp path collisions      → committer-managed task files
  D5 timestamp type erasure          → real TimestampType in the archive

Batch mode = one call; streaming mode = readStream + foreachBatch over
a growing staging directory (the file-source stand-in for the Postgres
NOTIFY/LISTEN feed named in README.md:124).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register

# Process-unique root: concurrent runs (pytest alongside tools/check.py,
# or the driver alongside anything) must not rmtree each other's staging
# or checkpoint dirs mid-stream.
_WORK_ROOT = f"/tmp/pg_archiver_spark-{os.getpid()}"


from contextlib import contextmanager


@contextmanager
def _scoped_state_partitions(spark: SparkSession, default: str):
    """Scope spark.sql.shuffle.partitions (= streaming state-store
    partition count, pinned into the checkpoint at first start) for one
    streaming query, restored afterwards — the measured-optimum knob
    pattern stream_state_timeout_sessions established. Each micro-batch
    pays one state-store commit PER PARTITION per stateful operator, so
    at fixture key cardinality the session's 32-wide default is almost
    pure commit overhead; results are identical at any width (state is
    per-key) and every run stages a fresh checkpoint, so there is no
    replay-mismatch risk. Env-overridable (SPARK_GRAFT_STATE_PARTS) so
    the value can be re-A/B'd per box or sized with key cardinality on
    a cluster — at 100 TB this scales UP; the knob, not the value, is
    the point.

    SERIAL-EXECUTION ASSUMPTION (ADVICE r13): this mutates the
    session-global spark.sql.shuffle.partitions for the query's
    duration, so any query PLANNED concurrently on the same
    SparkSession inside that window would silently compile with the
    streaming-tuned width. Every caller in this engine runs its
    streaming query to completion (awaitTermination on availableNow)
    before returning, and the driver/bench/tests invoke declared
    queries strictly serially — the same contract
    stream_state_timeout_sessions' inline knob has relied on since r8.
    If an embedder ever plans queries concurrently, scope the conf via
    a cloned session (spark.newSession()) instead.

    r14 (VERDICT r13 item 1): also scopes the state-store PROVIDER via
    SPARK_GRAFT_STATE_PROVIDER ("hdfs" | "rocksdb" | a full provider
    class name; unset = leave the session default). The r13 RocksDB
    rejection was adjudicated at fixture key cardinality, where the
    in-memory HDFSBackedStateStore has nothing to spill; re-A/B'd at
    262144 live keys / 1.05M sessions (tools/r14_state_ab.py, same
    applyInPandasWithState topology): RocksDB 109.0-109.3 s at 32/64
    partitions vs HDFS best 125.9 s at 32 (and HDFS degrades to 218 s
    at 64 while RocksDB stays flat), with the HDFS provider holding
    ~136 MB of state heap per 262k keys that RocksDB keeps off-heap.
    At fixture cardinality HDFS remains fastest (no spill, lower
    per-query provider init) — so the LOCAL default stays the session
    provider (HDFS) and a cluster deployment at realistic cardinality
    sets SPARK_GRAFT_STATE_PROVIDER=rocksdb and sizes
    SPARK_GRAFT_STATE_PARTS with key cardinality."""
    _PROVIDERS = {
        "hdfs": (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        ),
        "rocksdb": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
    _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STATE_PARTS", default),
    )
    provider = os.environ.get("SPARK_GRAFT_STATE_PROVIDER")
    prev_provider = spark.conf.get(_PROVIDER_KEY, _PROVIDERS["hdfs"])
    if provider:
        spark.conf.set(
            _PROVIDER_KEY, _PROVIDERS.get(provider.lower(), provider)
        )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if provider:
            spark.conf.set(_PROVIDER_KEY, prev_provider)


def _fresh_dir(*parts: str) -> str:
    path = os.path.join(_WORK_ROOT, *parts)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _stage_quartile_batches(events: DataFrame, staging: str, cols) -> None:
    """Split a frame into 4 time-ordered micro-batch files b0..b3 by
    EXACT global rank quartile — batch(e) = ((rank-1)·4) DIV total over
    (ts, event_id) order — with strictly ascending mtimes so the file
    source replays them deterministically. This staging is byte-for-
    byte the relational definition the stream_state_timeout_sessions /
    stream_progress_metrics oracles simulate; keep the two in lockstep
    by changing ONLY this helper.

    r13 optimization (guide §2.4): the original form re-ran the global
    rank window — a full sort — once PER batch filter (4 sort jobs +
    the count, ~2.0 s of the op at sf0.1). One ``partitionBy("batch")``
    write now produces all four directories from a single sort pass
    (~0.7 s), byte-equivalent: the post-window frame is one partition,
    so each batch directory still holds exactly ONE file, rows in the
    same global (ts, event_id) order, and the mtime ladder is applied
    identically after a directory rename."""
    from pyspark.sql.window import Window as _W

    total = events.count()
    ranked = events.withColumn(
        "rk", F.row_number().over(_W.orderBy("ts", "event_id"))
    ).withColumn("batch", F.expr(f"CAST(((rk - 1) * 4) DIV {total} AS INT)"))
    tmp = staging.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        ranked.select(*cols, "batch")
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(tmp)
    )
    for b in range(4):
        path = os.path.join(staging, f"b{b}")
        shutil.rmtree(path, ignore_errors=True)
        os.rename(os.path.join(tmp, f"batch={b}"), path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_700_000_000 + b, 1_700_000_000 + b),
                )
    shutil.rmtree(tmp, ignore_errors=True)


def archive_batch(
    tagged_sources: dict[str, DataFrame],
    cutoff_col_expr,
    archive_dir: str,
    batch_id: int = 0,
) -> DataFrame:
    """One archival batch over pre-loaded source frames.

    The reference's whole run() (main.go:147-256) as one lazy plan:
    filter-below-cutoff per table → lineage tag (A6) → union (A7) →
    per-row year/month partitioned Snappy Parquet (A10-A12, D2 fixed).
    Returns the archived keys ledger (table_name, event_id) — the exact
    delete set (D1 fixed).
    """
    tagged = None
    for name, df in tagged_sources.items():
        part = df.filter(cutoff_col_expr(df)).withColumn("table_name", F.lit(name))
        tagged = part if tagged is None else tagged.unionByName(part)

    out = os.path.join(archive_dir, f"batch_id={batch_id}")
    # Overwrite of the batch's own directory → a retry of the same batch
    # is idempotent (D3).
    (
        tagged.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .write.mode("overwrite")
        .partitionBy("year", "month")
        .option("compression", "snappy")
        .parquet(out)
    )
    spark = tagged.sparkSession
    return spark.read.parquet(out).select("table_name", "event_id")


@register(
    "stream_archival_foreachbatch",
    # Round-8 conversion (rows-only → sql-checked): every output field
    # is independent of micro-batch slicing — the archived set is
    # exactly {ts < cutoff} no matter how the files trigger, the
    # remaining set is its complement via the ledger anti-join, and the
    # hive partition count is the distinct (year, month) of the
    # archived rows. A batch function that double-appended on retry
    # (D3), dropped unarchived rows (D1), or mis-partitioned now
    # hash-fails instead of passing rows-only.
    oracle="""
    SELECT (SELECT COUNT(*) FROM events) AS n_source,
           COUNT(*) AS n_archived,
           (SELECT COUNT(*) FROM events) - COUNT(*) AS n_remaining,
           CAST(COUNT(DISTINCT (year(ts), month(ts))) AS BIGINT)
               AS n_partitions,
           TRUE AS invariants_ok
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def stream_archival_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental archiver: micro-batch read → cutoff filter →
    partitioned Parquet append → delete-behind, with D1/D3 fixes.

    Staging parquet files stand in for the Postgres source; foreachBatch
    is where a JDBC sink would run the ledger-driven DELETE in the same
    batch function. Output: one summary row asserting the safety
    invariants (archived ∪ remaining == source, archived ∩ remaining == ∅).
    """
    staging = _fresh_dir("archival", "staging")
    archive = _fresh_dir("archival", "archive")
    ledger = _fresh_dir("archival", "ledger")
    checkpoint = _fresh_dir("archival", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    # 4 staging files ≈ 4 source micro-batches.
    events.repartition(4).write.mode("overwrite").parquet(staging)

    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        to_archive = (
            batch_df.filter(F.col("ts") < cutoff)
            .withColumn("table_name", F.lit("events"))
            .withColumn("year", F.year("ts"))
            .withColumn("month", F.month("ts"))
        )
        # Idempotent per-batch output (D3): a retried batch overwrites
        # its own batch_id directory instead of double-appending.
        (
            to_archive.write.mode("overwrite")
            .partitionBy("year", "month")
            .option("compression", "snappy")
            .parquet(os.path.join(archive, f"batch_id={batch_id}"))
        )
        # Delete ledger = exactly the keys just archived (D1): the JDBC
        # delete-behind runs `DELETE ... WHERE id IN (ledger)` — never a
        # blanket `< cutoff` that would drop unarchived rows.
        (
            to_archive.select("event_id")
            .write.mode("overwrite")
            .parquet(os.path.join(ledger, f"batch_id={batch_id}"))
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    archived = spark.read.parquet(archive)
    ledger_keys = spark.read.parquet(ledger).select("event_id")
    source = spark.read.parquet(staging)
    remaining = source.join(ledger_keys, "event_id", "left_anti")

    n_source = source.count()
    n_archived = archived.count()
    n_remaining = remaining.count()
    n_overlap = (
        archived.select("event_id").join(remaining, "event_id", "inner").count()
    )
    n_partitions = archived.select("year", "month").distinct().count()
    return spark.createDataFrame(
        [
            (
                n_source,
                n_archived,
                n_remaining,
                n_partitions,
                bool(n_archived + n_remaining == n_source and n_overlap == 0),
            )
        ],
        "n_source long, n_archived long, n_remaining long, n_partitions long, invariants_ok boolean",
    )


@register(
    "stream_stateful_count",
    # Round-8 conversion (rows-only → sql-checked): the per-user FINAL
    # state after an exhaustive availableNow replay is deterministic
    # regardless of micro-batch slicing — a running count and max are
    # order-insensitive folds, so final state ≡ the batch aggregate.
    # Update-mode intermediates stay untested (they depend on the file
    # grouping); the MAX-per-user reduction below selects exactly the
    # final state, which SQL can pin.
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(epoch_ms(ts)) AS BIGINT) AS last_epoch_ms
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running event counter whose state (count, last epoch-ms)
    survives across micro-batches — the primitive behind custom session
    logic, CDC reconciliation, or online feature aggregation that the
    built-in window operators can't express.

    The state store holds one row per user (bounded by key cardinality);
    each micro-batch touches only the keys it contains.

    On the v2 API: Spark 4's `transformWithStateInPandas` (typed named
    state + timers + TTL) is the designated successor, but its Python
    state protocol requires `google.protobuf`, which this sandbox does
    not ship — a live attempt crashes the TWS driver worker with
    `ImportError: cannot import name 'descriptor' from
    'google.protobuf'` (pinned in tests/test_round7.py), so v1 remains
    the exercised arbitrary-state surface here.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    staging = _fresh_dir("stateful", "staging")
    checkpoint = _fresh_dir("stateful", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("epoch_ms", F.expr("ts_ns DIV 1000000"))
        .select("event_id", "epoch_ms", "user_id")
    )
    events.repartition(3).write.mode("overwrite").parquet(staging)

    def count_events(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            count, last_ms = state.get
        else:
            count, last_ms = 0, 0
        for pdf in pdfs:
            count += len(pdf)
            last_ms = max(last_ms, int(pdf["epoch_ms"].max()))
        state.update((count, last_ms))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [count], "last_epoch_ms": [last_ms]}
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id long, n_events long, last_epoch_ms long",
        stateStructType="count long, last_ms long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    query = (
        counted.writeStream.format("memory")
        .queryName("stateful_count_sink")
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # Update mode emits a row per (batch, key); keep each user's final
    # state — which must equal the batch-mode per-user profile.
    final = spark.sql(
        """
        SELECT user_id, MAX(n_events) AS n_events, MAX(last_epoch_ms) AS last_epoch_ms
        FROM stateful_count_sink GROUP BY user_id
        """
    )
    return final.orderBy("user_id")


@register(
    "stream_watermark_late",
    # Round-8 conversion (rows-only → sql-checked): the replay order is
    # pinned (one file per batch, ascending mtimes), so the emitted set
    # is a deterministic function of the fixture — every day-1 window,
    # every late day-2 window (on 4.1.2 the late rows create fresh
    # state and emit at the final commit, per the docstring), and the
    # day-5 windows whose end is at or below the final watermark
    # max(day-5 ts) − 10 min. Verified window-for-window against the
    # live stream at sf0.001/sf0.01 before pinning. An emission-
    # semantics regression (double emission, changed late-row fate,
    # watermark off-by-one) now hash-fails.
    oracle="""
    WITH wm AS (
        SELECT MAX(epoch_ms(ts)) - 600000 AS w FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
    ),
    src AS (
        SELECT epoch_ms(ts) AS ms FROM events
        WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
           OR (ts >= TIMESTAMP '2024-01-05 00:00:00'
               AND ts < TIMESTAMP '2024-01-06 00:00:00')
    ),
    b AS (
        SELECT (ms // 3600000) * 3600000 AS ws, COUNT(*) AS n_events
        FROM src GROUP BY 1
    )
    SELECT strftime(make_timestamp(ws * 1000), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           n_events
    FROM b, wm WHERE ws + 3600000 <= wm.w
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked windowed count over a file-source replay: three
    ordered micro-batches — on-time data, watermark-advancing data, then
    late data far below the watermark.

    What the watermark GUARANTEES (verified empirically on 4.1.2, see
    tests/test_streaming.py): bounded state — finalized window state is
    evicted once the watermark passes the window end — and at-most-once
    window emission in append mode. Dropping of late input is
    best-effort only (Spark's documented caveat): a late row whose
    window state was already evicted may create fresh state and emit on
    finalization rather than being counted in numRowsDroppedByWatermark.
    Returns the emitted per-hour windows (each window start exactly
    once).
    """
    staging = _fresh_dir("watermark", "staging")
    checkpoint = _fresh_dir("watermark", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "value")
    )
    # Batch 1: first day. Batch 2: a later day (advances the watermark
    # far past day 1). Batch 3: day-1 rows again — now late, dropped.
    day1 = events.filter(F.col("ts") < "2024-01-02")
    day5 = events.filter(
        (F.col("ts") >= "2024-01-05") & (F.col("ts") < "2024-01-06")
    )
    late = events.filter(
        (F.col("ts") >= "2024-01-02") & (F.col("ts") < "2024-01-03")
    )
    for i, part in enumerate([day1, day5, late]):
        path = os.path.join(staging, f"batch_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        # File-source ordering is by modification time; pin it.
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "batch_*"))
    )
    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    query = (
        windowed.writeStream.format("memory")
        .queryName("watermark_late_sink")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.sql(
        """
        SELECT date_format(window_start, 'yyyy-MM-dd HH:mm:ss')
                   AS window_start,
               n_events
        FROM watermark_late_sink ORDER BY window_start
        """
    )


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT COUNT(*) AS n_deduped,
           CAST(COUNT(*) + SUM(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fed
    FROM events
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup — the training-data ingest primitive
    (at-least-once feeds ALWAYS re-deliver; dedup keys the state store).

    Every event with event_id % 10 == 0 is fed TWICE, in different
    micro-batches (maxFilesPerTrigger=1), so the dedup state must
    survive across batches. ``withWatermark + dropDuplicates`` keeps one
    state-store row per key; the watermark bounds that state at scale —
    keys older than the delay are evicted instead of accumulating
    forever (with a 100 TB feed, unbounded dedup state is a slow OOM).

    SQL-checked: the deduped stream must profile exactly like the
    source table, and the fed-row count proves the duplicates were
    actually injected (n_fed > n_deduped).
    """
    staging = _fresh_dir("streamdedup", "staging")
    checkpoint = _fresh_dir("streamdedup", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "value")
    )
    dupes = events.filter(F.col("event_id") % 10 == 0)
    # Two staging files: the full feed, then the re-delivered subset —
    # duplicates arrive in a LATER micro-batch than their originals.
    for i, part in enumerate([events, dupes]):
        path = os.path.join(staging, f"feed_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (1700000000 + i, 1700000000 + i))

    n_fed = events.count() + dupes.count()

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "feed_*"))
    )
    deduped = stream.withWatermark("ts", "30 days").dropDuplicates(["event_id"])
    query = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.sql("SELECT COUNT(*) AS n_deduped FROM stream_dedup_sink").select(
        "n_deduped", F.lit(n_fed).cast("long").alias("n_fed")
    )


@register(
    "stream_rate_trigger",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_batches, COUNT(*) AS n_rows FROM events
    """,
)
def stream_rate_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limited trigger ingestion — the Spark form of the
    reference's intended NOTIFY/LISTEN live feed (README.md:124): the
    source drains under an admission limit (maxFilesPerTrigger=1, the
    file-source analog of maxOffsetsPerTrigger), so a backlog becomes N
    bounded micro-batches instead of one giant catch-up batch that OOMs
    the cluster after downtime.

    SQL-checked: exactly 4 staged files must yield exactly 4 rate-
    limited micro-batches, and no row may be lost or duplicated.
    """
    staging = _fresh_dir("ratetrigger", "staging")
    checkpoint = _fresh_dir("ratetrigger", "checkpoint")
    sink = _fresh_dir("ratetrigger", "sink")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "value")
    )
    events.repartition(4).write.mode("overwrite").parquet(staging)

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    query = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    out = spark.read.parquet(sink)
    return out.agg(
        F.countDistinct("batch_id").alias("n_batches"),
        F.count("*").alias("n_rows"),
    )


@register(
    "stream_stream_join",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ms
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'
    )
    SELECT COUNT(*) AS n_pairs,
           COUNT(DISTINCT c.user_id) AS n_users,
           CAST(COALESCE(SUM(c.c_id + p.p_id), 0) AS BIGINT) AS id_checksum
    FROM c JOIN p ON c.user_id = p.user_id
                 AND p.p_ms > c.c_ms
                 AND p.p_ms <= c.c_ms + 3600000
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join — click→purchase attribution: each
    purchase matches the same user's clicks from the preceding hour.
    Two live streams, both watermarked, joined on an equi-key PLUS an
    event-time range — the canonical Structured Streaming join: the
    time bound is what lets the engine expire join state (a click older
    than watermark + 1h can never match a future purchase and is
    evicted), so state stays bounded on an unbounded feed. The
    watermark here is generous (30 days > the fixture's span) so the
    availableNow run is lossless and the batch oracle matches exactly.

    SQL-checked: pair count, matched-user count, and an id checksum
    against the equivalent batch join in DuckDB.
    """
    staging_c = _fresh_dir("streamjoin", "clicks")
    staging_p = _fresh_dir("streamjoin", "purchases")
    checkpoint = _fresh_dir("streamjoin", "checkpoint")

    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type")
    )
    ev.filter(F.col("event_type") == "click").drop("event_type").write.mode(
        "overwrite"
    ).parquet(staging_c)
    ev.filter(F.col("event_type") == "purchase").drop("event_type").write.mode(
        "overwrite"
    ).parquet(staging_p)
    schema = ev.drop("event_type").schema

    clicks = (
        spark.readStream.schema(schema)
        .parquet(staging_c)
        .withWatermark("ts", "30 days")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
            "user_id",
        )
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(staging_p)
        .withWatermark("ts", "30 days")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts > c_ts "
            "AND p_ts <= c_ts + INTERVAL 1 HOUR"
        ),
        "inner",
    )
    query = (
        joined.writeStream.format("memory")
        .queryName("stream_join_sink")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.sql(
        """
        SELECT COUNT(*) AS n_pairs,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(COALESCE(SUM(c_id + p_id), 0) AS BIGINT) AS id_checksum
        FROM stream_join_sink
        """
    )


@register(
    "stream_static_enrich",
    oracle="""
    WITH dim AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'consumer' ELSE 'business' END AS segment
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT d.segment,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY d.segment, e.event_type
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static enrichment join: every micro-batch of the event
    stream joined against a slowly-changing dimension (user → segment),
    the lookup-table pattern live pipelines run constantly (enrich
    clickstream with account tier, device registry, geo table…).

    The static side re-broadcasts per micro-batch — no stream-side
    state at all (contrast stream_stream_join, which must keep
    watermark-bounded buffers on both sides). Complete-mode aggregation
    over the enriched stream then proves end-to-end equivalence: after
    an availableNow drain over two staged files the result must equal
    the one-shot batch join, which is exactly the SQL oracle.

    The segment is a deterministic md5 bucket of user_id (engine-
    identical, proven by sample_deterministic), standing in for a real
    dimension table the fixtures don't ship."""
    staging = _fresh_dir("staticenrich", "staging")
    checkpoint = _fresh_dir("staticenrich", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn(
            "segment",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
                "consumer",
            ).otherwise("business"),
        )
    )
    # Two micro-batches so the per-batch re-join actually recurs.
    for i, part in enumerate(
        [events.filter(F.col("event_id") % 2 == 0),
         events.filter(F.col("event_id") % 2 == 1)]
    ):
        path = os.path.join(staging, f"feed_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "feed_*"))
    )
    enriched = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    query = (
        enriched.writeStream.format("memory")
        .queryName("stream_static_enrich_sink")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.sql(
        "SELECT segment, event_type, n_events, total_value "
        "FROM stream_static_enrich_sink"
    )


@register(
    "stream_progress_metrics",
    # Round-8 conversion (rows-only → sql-checked): with the feed
    # split by exact global-rank quartiles, the ENGINE'S OWN telemetry
    # becomes relationally predictable — per batch, numInputRows is
    # the quartile size, numRowsUpdated of the streaming agg is the
    # batch's distinct-user count, and numRowsTotal is the cumulative
    # distinct-user count (users whose FIRST batch is ≤ b). Only the
    # wall-clock trigger duration is environment-shaped, reported as
    # the >=0 invariant. The oracle therefore audits Spark's progress
    # reporting itself: a metrics regression (lost rows, wrong state
    # accounting, missing batch) hash-fails.
    oracle="""
    WITH ev AS (
        SELECT user_id,
               ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rk,
               COUNT(*) OVER () AS total
        FROM events
    ),
    eb AS (
        SELECT user_id, CAST(((rk - 1) * 4) // total AS INTEGER) AS batch
        FROM ev
    ),
    per AS (
        SELECT batch, COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS upd
        FROM eb GROUP BY batch
    ),
    fb AS (SELECT user_id, MIN(batch) AS first_b FROM eb GROUP BY user_id)
    SELECT CAST(p.batch AS BIGINT) AS batch_id,
           CAST(p.n_rows AS BIGINT) AS num_input_rows,
           TRUE AS trigger_recorded,
           (SELECT COUNT(*) FROM fb WHERE fb.first_b <= p.batch)
               AS state_rows,
           CAST(p.upd AS BIGINT) AS state_updated
    FROM per p
    ORDER BY batch_id
    """,
)
def stream_progress_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability — the reference names monitoring/metrics
    as unimplemented future work (README.md:127); Structured Streaming
    ships it built-in. Drain a rate-limited availableNow run and
    surface each micro-batch's engine-reported progress (rows read,
    processing time, state metrics) as a queryable DataFrame — the feed
    a metrics warehouse tails for lag/throughput alerting.

    The metrics come from ``StreamingQuery.recentProgress`` (the
    engine's own JSON telemetry), not hand-counted rows; the assertable
    contract is conservation: Σ numInputRows over batches == staged
    row count, one progress row per micro-batch."""
    import json

    staging = _fresh_dir("progressmetrics", "staging")
    checkpoint = _fresh_dir("progressmetrics", "checkpoint")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "value")
    )
    # Exact global-rank quartile split: batch sizes and per-batch user
    # sets become relational facts the oracle can state.
    _stage_quartile_batches(events, staging, ["event_id", "ts", "user_id", "value"])

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "b*"))
    )
    agg = stream.groupBy("user_id").agg(F.count("*").alias("n"))
    query = (
        agg.writeStream.format("memory")
        .queryName("stream_progress_sink")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    rows = []
    for p in (
        json.loads(x if isinstance(x, str) else x.json)
        for x in query.recentProgress
    ):
        if p.get("numInputRows", 0) == 0 and not p.get("sources"):
            continue
        state = (p.get("stateOperators") or [{}])[0]
        rows.append(
            (
                int(p["batchId"]),
                int(p.get("numInputRows", 0)),
                float(p.get("durationMs", {}).get("triggerExecution", 0))
                >= 0.0,
                int(state.get("numRowsTotal", 0)),
                int(state.get("numRowsUpdated", 0)),
            )
        )
    out = spark.createDataFrame(
        rows,
        "batch_id long, num_input_rows long, trigger_recorded boolean, "
        "state_rows long, state_updated long",
    )
    total = load(spark, sf_dir, "events").count()
    seen = out.agg(F.sum("num_input_rows")).first()[0]
    if seen != total:
        # Not a bare assert: survives python -O, and names the numbers
        # so a driver-side ERROR row is diagnosable.
        raise RuntimeError(
            "progress metrics must conserve the staged row count: "
            f"sum(numInputRows)={seen} != staged={total}"
        )
    return out.orderBy("batch_id")


@register(
    "stream_jdbc_sink",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    """,
)
def stream_jdbc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → warehouse JDBC sink: micro-batches land in a live
    relational table via foreachBatch, IDEMPOTENTLY — each batch first
    deletes its own batch_id's rows then appends, so a retried batch
    (Structured Streaming's at-least-once foreachBatch contract)
    converges to exactly-once table contents instead of
    double-appending. This is the complement of the reference's flow
    (main.go reads FROM the database and writes files; a complete
    platform also streams INTO the warehouse), against the same
    embedded Derby that backs source_jdbc — a real JDBC round-trip, no
    mock. The oracle profiles the SOURCE: hash equality proves the
    sink lost and duplicated nothing across all micro-batches.

    At 100 TB scale the shape is unchanged: per-batch DELETE+append is
    partition-parallel on the JDBC side (numPartitions cursors), state
    is one batch_id predicate, and the delete-then-insert pair runs
    per micro-batch, amortized against the batch interval."""
    import uuid as _uuid

    from pg_archiver_spark.sources import derby

    staging = _fresh_dir("jdbc_sink", "staging")
    checkpoint = _fresh_dir("jdbc_sink", "checkpoint")
    url = f"jdbc:derby:memory:jdbc_sink_{_uuid.uuid4().hex[:12]};create=true"

    events = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts_ns DIV 1000000").alias("epoch_ms"),
        "user_id",
        "value",
    )
    events.repartition(4).write.mode("overwrite").parquet(staging)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("batch_id", F.lit(batch_id))
        first_batch = batch_id == 0
        if not first_batch:
            # Idempotency: erase any rows a failed attempt of THIS batch
            # already wrote before re-appending (exactly-once contents).
            conn = derby.connection_factory(spark, url)()
            try:
                cur = conn.cursor()
                # Spark's JDBC writer creates QUOTED (case-sensitive)
                # column identifiers; unquoted batch_id would uppercase.
                cur.execute(
                    f'DELETE FROM sink_events WHERE "batch_id" = {int(batch_id)}'
                )
                conn.commit()
            finally:
                conn.close()
        (
            tagged.write.format("jdbc")
            .option("url", url)
            .option("driver", derby.DERBY_DRIVER)
            .option("dbtable", "sink_events")
            .mode("append" if not first_batch else "overwrite")
            .save()
        )

    query = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", derby.DERBY_DRIVER)
        .option("dbtable", "sink_events")
        .load()
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "stream_state_timeout_sessions",
    # Round-8 conversion (rows-only → sql-checked): with the feed split
    # by EXACT global-rank quartiles (not RangePartitioner sampling),
    # every ingredient of the timeout algebra is relational — batch(e)
    # = ((rank−1)·4) DIV total; wm(b) = max ms of earlier batches −
    # 60 s, plus the VIRTUAL batch 4 availableNow runs after the last
    # data batch to flush expired state (wm = global max − 60 s,
    # discovered empirically and verified value-for-value at all three
    # SFs); a session closes 'gap' when its user's next event lands in
    # a batch at or before the first watermark crossing of its timeout
    # max(last+gap, wm(b_last)+1) — data beats hasTimedOut within a
    # batch — and 'timeout' when the crossing comes first (or there is
    # no next event); sessions whose timeout never crosses stay open
    # and unemitted. A regression in timeout/eviction semantics now
    # hash-fails.
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_id,
               ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rk,
               COUNT(*) OVER () AS total
        FROM events
    ),
    eb AS (
        SELECT user_id, ms, event_id,
               CAST(((rk - 1) * 4) // total AS INTEGER) AS batch
        FROM ev
    ),
    bm AS (SELECT batch, MAX(ms) AS mx FROM eb GROUP BY batch),
    wmt AS (
        SELECT b.batch,
               (SELECT MAX(mx) FROM bm p WHERE p.batch < b.batch) - 60000
                   AS wm
        FROM bm b
        UNION ALL
        SELECT 4, (SELECT MAX(ms) FROM eb) - 60000
    ),
    sq AS (
        SELECT user_id, ms, event_id, batch,
               CASE WHEN LAG(ms) OVER (PARTITION BY user_id
                                       ORDER BY ms, event_id) IS NULL
                    OR ms - LAG(ms) OVER (PARTITION BY user_id
                                          ORDER BY ms, event_id) > 3600000
                    THEN 1 ELSE 0 END AS is_start
        FROM eb
    ),
    si AS (
        SELECT user_id, ms, batch,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ms, event_id) AS sid
        FROM sq
    ),
    sess AS (
        SELECT user_id, sid, MAX(ms) AS la, COUNT(*) AS n,
               MAX(batch) AS b_last, MIN(batch) AS b_first
        FROM si GROUP BY user_id, sid
    ),
    sn AS (
        SELECT s.*,
               LEAD(b_first) OVER (PARTITION BY user_id ORDER BY sid)
                   AS b_next,
               w.wm AS wm_set
        FROM sess s LEFT JOIN wmt w ON w.batch = s.b_last
    ),
    cl AS (
        SELECT user_id, n, b_next,
               (SELECT MIN(w2.batch) FROM wmt w2
                WHERE w2.wm > GREATEST(la + 3600000,
                                       COALESCE(wm_set, 0) + 1)) AS bprime
        FROM sn
    ),
    lab AS (
        SELECT user_id, n,
               CASE WHEN b_next IS NOT NULL
                         AND (bprime IS NULL OR b_next <= bprime)
                    THEN 'gap'
                    WHEN bprime IS NOT NULL THEN 'timeout' END AS closed_by
        FROM cl
    )
    SELECT closed_by, COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM lab WHERE closed_by IS NOT NULL
    GROUP BY closed_by ORDER BY closed_by
    """,
)
def stream_state_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful sessionization with EVENT-TIME STATE TIMEOUT:
    per-user sessions close either by an in-stream gap (> 1 h between
    events) or — the part `session_window` can't express and
    `stream_stateful_count` doesn't exercise — by the WATERMARK passing
    the session's timeout timestamp with no further data, via
    `GroupState.setTimeoutTimestamp` + `hasTimedOut`. This is the
    custom-stateful-operator contract (§2.B streaming surface): state
    is one (start, last, count) triple per live user, timeout eviction
    keeps the store from accumulating dead keys — the operational
    requirement for an unbounded 100 TB stream where most keys go
    quiet.

    Determinism & validation (tests/test_round5.py + the oracle): the
    feed is split by exact global-rank quartiles, so the batch
    boundaries — and therefore every gap-vs-timeout closure decision —
    are relational facts the SQL oracle simulates batch-for-batch (see
    the oracle comment); every emitted session must additionally match
    a session of the BATCH gap-sessionizer (analytics_sessionize
    semantics) — the stream/batch equivalence pin, restricted to
    sessions the watermark had time to close."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    staging = _fresh_dir("state_timeout", "staging")
    checkpoint = _fresh_dir("state_timeout", "checkpoint")
    gap_ms = 3_600_000

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id")
    )
    # Split the feed into 4 time-ordered micro-batch files by EXACT
    # global rank quartile — the realistic archival-replay shape, and
    # (round 8) an exactly SQL-derivable boundary: repartitionByRange's
    # sampled split points are not reproducible relationally, quartile
    # ranks are, which is what lets the oracle above simulate the
    # timeout algebra batch-for-batch.
    _stage_quartile_batches(events, staging, ["event_id", "ts", "user_id"])

    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start],
                    "session_end_ms": [last],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ms_list: list[int] = []
        for pdf in pdfs:
            # Vectorized ns→ms conversion (guide §4.2): the sessionize
            # fn runs once per (user, batch), so a per-element Python
            # loop here pays its cost thousands of times per micro-
            # batch; datetime64[ns] → int64 // 1e6 is the same value
            # int(Timestamp.value) // 1e6 produced element-wise.
            ms_list.extend(
                (
                    pd.to_datetime(pdf["ts"]).values.astype("int64")
                    // 1_000_000
                ).tolist()
            )
        ms_list.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for ms in ms_list:
            if start is None:
                start, last, n = ms, ms, 1
            elif ms - last > gap_ms:
                closed.append((user_id, start, last, n, "gap"))
                start, last, n = ms, ms, 1
            else:
                last, n = ms, n + 1
        state.update((start, last, n))
        # A session whose gap already expired relative to the watermark
        # (advanced by OTHER keys' data) must still get a valid future
        # timeout — clamp to watermark+1 so it closes next batch.
        state.setTimeoutTimestamp(
            max(last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_ms",
                    "session_end_ms",
                    "n_events",
                    "closed_by",
                ],
            )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "b*"))
        .withWatermark("ts", "1 minute")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=(
            "user_id long, session_start_ms long, session_end_ms long, "
            "n_events long, closed_by string"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # Scope the STATEFUL shuffle for the duration of this query
    # (restored in finally): each micro-batch pays one Python-worker
    # round-trip and one state-store commit PER PARTITION, but fewer
    # partitions also serialize the per-group Arrow work — same-box A/B
    # (3 runs each): 4 parts ≈ 9.6-11.0 s, 8 ≈ 7.5-8.0 s,
    # 16 ≈ 6.6-7.2 s (best), 32 ≈ 7.7-7.9 s. 16 is the measured
    # optimum for this key cardinality; results are identical at any
    # value (state is per-key; the oracle pins the emitted rows). At
    # 100 TB you'd size this UP with key cardinality — the knob, not
    # the value, is the point. The conf is pinned into the checkpoint
    # at first start, and each run stages a fresh checkpoint, so there
    # is no replay-mismatch risk. r13: the value is env-overridable
    # (SPARK_GRAFT_STATE_PARTS) so the knob can be re-A/B'd per box /
    # sized with key cardinality on a cluster without a code edit;
    # the local default stays the measured optimum. r14: routed through
    # _scoped_state_partitions, which additionally scopes the state-
    # store provider (SPARK_GRAFT_STATE_PROVIDER) — see its docstring
    # for the 1.05M-session A/B that picks RocksDB at realistic key
    # cardinality while HDFS stays the fixture-scale default.
    with _scoped_state_partitions(spark, "16"):
        query = (
            sessions.writeStream.format("memory")
            .queryName("state_timeout_sink")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql(
        """
        SELECT closed_by,
               COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM state_timeout_sink
        GROUP BY closed_by
        ORDER BY closed_by
        """
    )


@register(
    "stream_cdc_changelog",
    # Round-8 conversion (rows-only → sql-checked): the trigger
    # workload is a deterministic function of the fixture — 240
    # lowest-event_id inserts, an UPDATE of the even ids, a DELETE of
    # the id%5==0 ids — so the op counts, live-key count, and batch
    # count (4 seq-ranged feed files × maxFilesPerTrigger=1) are all
    # SQL-derivable; the three-way snapshot pin stays RuntimeError-
    # guarded and its verdict is the pinned TRUE.
    oracle="""
    WITH s AS (
        SELECT event_id AS id FROM events ORDER BY event_id LIMIT 240
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_inserts,
           (SELECT COUNT(*) FROM s WHERE id % 2 = 0) AS n_updates,
           (SELECT COUNT(*) FROM s WHERE id % 5 = 0) AS n_deletes,
           CAST(4 AS BIGINT) AS n_batches,
           (SELECT COUNT(*) FROM s)
               - (SELECT COUNT(*) FROM s WHERE id % 5 = 0) AS n_live_keys,
           TRUE AS snapshot_consistent
    """,
)
def stream_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True change-feed ingestion — the NOTIFY/LISTEN-equivalent the
    reference names as future work (README.md:124), end to end against
    a LIVE database: the DATABASE ITSELF emits the feed. Derby AFTER
    INSERT/UPDATE/DELETE row triggers append (seq, op, id, val) to a
    changelog table as a deterministic DML workload (derived from the
    events fixture) mutates the base table — push semantics at the
    source, no poll-and-diff. The changelog is then consumed as a
    stream (seq-ordered micro-batches) and folded by an incremental
    foreachBatch MERGE into a versioned snapshot: per batch,
    latest-op-per-key wins (window over the batch, key-partitioned,
    seq desc), the previous snapshot's untouched keys carry over
    (left-anti on the batch's key set), and 'D' erases the key — the
    same latest-wins/delete-erase semantics as the batch
    `merge_cdc_apply` operator (operators/setops.py).

    THE PIN (this op's whole point): after the drain, the streamed
    snapshot must EQUAL (1) the live base table — ground truth straight
    from the database the triggers fired on — and (2) a one-shot batch
    compaction of the full changelog. Any lost/duplicated/misordered
    change diverges one of the three; mismatch raises RuntimeError.

    100 TB design: per-batch work is one key-hash shuffle of the BATCH
    (not the log) plus a snapshot-sized anti-join — at scale the
    snapshot side is the lakehouse table and the anti-join+union
    becomes the storage layer's MERGE INTO; state is |keys|, never log
    length. Retried batches recompute v[batch] from v[batch-1]
    (overwrite-by-version = idempotent, D3 discipline). The Derby
    trigger feed is the single-JVM stand-in for PG logical decoding;
    an external CDC stream (Debezium topic) plugs into the same
    foreachBatch fold unchanged."""
    from pyspark.sql import Window

    from pg_archiver_spark.sources import derby

    staging = _fresh_dir("cdc_feed", "staging")
    checkpoint = _fresh_dir("cdc_feed", "checkpoint")
    snapshots = _fresh_dir("cdc_feed", "snapshots")

    # -- 1. Live database with trigger-maintained changelog -----------
    url = f"jdbc:derby:memory:cdc_{os.getpid()}_{next(derby._FRESH_SEQ)};create=true"
    conn = derby.connection_factory(spark, url)()
    try:
        cur = conn.cursor()
        for ddl in (
            "CREATE TABLE accounts (id BIGINT PRIMARY KEY, val DOUBLE)",
            "CREATE TABLE changelog (seq BIGINT GENERATED ALWAYS AS "
            "IDENTITY (START WITH 1, INCREMENT BY 1), "
            "op CHAR(1), id BIGINT, val DOUBLE)",
            "CREATE TRIGGER trg_ins AFTER INSERT ON accounts "
            "REFERENCING NEW AS n FOR EACH ROW "
            "INSERT INTO changelog (op, id, val) VALUES ('I', n.id, n.val)",
            "CREATE TRIGGER trg_upd AFTER UPDATE ON accounts "
            "REFERENCING NEW AS n FOR EACH ROW "
            "INSERT INTO changelog (op, id, val) VALUES ('U', n.id, n.val)",
            "CREATE TRIGGER trg_del AFTER DELETE ON accounts "
            "REFERENCING OLD AS o FOR EACH ROW "
            "INSERT INTO changelog (op, id, val) VALUES ('D', o.id, o.val)",
        ):
            cur.execute(ddl)
        conn.commit()

        # -- 2. Deterministic DML workload (fires the triggers) -------
        # 240 inserts, then a set-based UPDATE and DELETE; each
        # affected row produces one changelog entry, in seq order.
        seed = (
            load(spark, sf_dir, "events")
            .select("event_id", "value")
            .orderBy("event_id")
            .limit(240)
            .collect()  # bounded: 240 (id, val) pairs to drive DML
        )
        for i in range(0, len(seed), 60):
            vals = ", ".join(
                f"({int(r['event_id'])}, {float(r['value'])!r})"
                for r in seed[i : i + 60]
            )
            cur.execute(f"INSERT INTO accounts VALUES {vals}")
        cur.execute("UPDATE accounts SET val = val + 1 WHERE MOD(id, 2) = 0")
        cur.execute("DELETE FROM accounts WHERE MOD(id, 5) = 0")
        conn.commit()

        # -- 3. Stage the feed as seq-ordered micro-batch files -------
        log = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", derby.DERBY_DRIVER)
            .option("dbtable", "changelog")
            .load()
            .select(
                F.col("SEQ").alias("seq"),
                F.col("OP").alias("op"),
                F.col("ID").alias("id"),
                F.col("VAL").alias("val"),
            )
        )
        log.repartitionByRange(4, "seq").write.mode("overwrite").parquet(staging)
        files = sorted(
            f for f in os.listdir(staging) if f.startswith("part-")
        )
        for i, f in enumerate(files):  # file-source order = mtime; pin it
            os.utime(os.path.join(staging, f), (1700000000 + i, 1700000000 + i))

        # -- 4. Streamed incremental MERGE ----------------------------
        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            w = Window.partitionBy("id").orderBy(F.col("seq").desc())
            latest = (
                batch_df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("id", "op", "val")
            )
            prev_path = os.path.join(snapshots, f"v{batch_id - 1}")
            if os.path.exists(prev_path):
                prev = batch_df.sparkSession.read.parquet(prev_path)
                merged = prev.join(
                    latest.select("id"), "id", "left_anti"
                ).unionByName(
                    latest.filter(F.col("op") != "D").select("id", "val")
                )
            else:
                merged = latest.filter(F.col("op") != "D").select("id", "val")
            merged.write.mode("overwrite").parquet(
                os.path.join(snapshots, f"v{batch_id}")
            )

        query = (
            spark.readStream.schema(log.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

        last = max(
            int(d[1:]) for d in os.listdir(snapshots) if d.startswith("v")
        )
        snap = spark.read.parquet(os.path.join(snapshots, f"v{last}"))

        # -- 5. Three-way pin -----------------------------------------
        live = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", derby.DERBY_DRIVER)
            .option("dbtable", "accounts")
            .load()
            .select(F.col("ID").alias("id"), F.col("VAL").alias("val"))
        )
        w_all = Window.partitionBy("id").orderBy(F.col("seq").desc())
        batch_compact = (
            log.withColumn("rn", F.row_number().over(w_all))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("id", "val")
        )
        d1 = snap.exceptAll(live).count() + live.exceptAll(snap).count()
        d2 = snap.exceptAll(batch_compact).count() + batch_compact.exceptAll(snap).count()
        if d1 or d2:
            raise RuntimeError(
                f"CDC snapshot diverged: vs live table {d1} rows, "
                f"vs batch compaction {d2} rows"
            )
        # bounded: one row per CDC op kind (I/U/D — <= 3 rows)
        n_ops = log.groupBy("op").count().collect()
        ops = {r["op"].strip(): r["count"] for r in n_ops}
        return spark.createDataFrame(
            [
                (
                    int(ops.get("I", 0)),
                    int(ops.get("U", 0)),
                    int(ops.get("D", 0)),
                    int(last) + 1,
                    snap.count(),
                    True,
                )
            ],
            "n_inserts long, n_updates long, n_deletes long, "
            "n_batches long, n_live_keys long, snapshot_consistent boolean",
        )
    finally:
        conn.close()



@register(
    "stream_stream_left_outer",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ms
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN p.p_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN p.p_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched,
           CAST(SUM(c.c_id + COALESCE(p.p_id, 0)) AS BIGINT) AS id_checksum
    FROM c LEFT JOIN p ON c.user_id = p.user_id
                      AND p.p_ms > c.c_ms
                      AND p.p_ms <= c.c_ms + 3600000
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — attribution INCLUDING
    the clicks that never converted. The outer side is the hard part of
    streaming joins: a null-extended row may only emit once the
    watermark proves no future purchase can match (wm > click_ts + 1h),
    so emission is driven by WATERMARK PROGRESS, not arrival. State
    stays bounded by the same bound — clicks past their match horizon
    are evicted as they emit.

    Replay mechanics: each side is staged as time-range-partitioned
    files with strictly ascending mtimes (deterministic time-ordered
    micro-batches; see the G12 notes), watermarked tightly (1 minute —
    the replay is time-ordered, so the delay models clock skew only),
    plus one far-future SENTINEL row per side: the global watermark is
    the MIN over sources, so BOTH sides must advance for the final
    micro-batches to flush every pending unmatched click. Sentinels use
    negative user ids and are filtered from the result. Without the
    sentinels the tail (last 1h + delay of the span) would stay in
    state forever — the exact at-scale operational gotcha (an idle
    source stalls outer-join emission), reproduced and solved here the
    way production pipelines do (heartbeat events).

    SQL-checked: row/matched/unmatched counts + id checksum equal the
    batch LEFT JOIN in DuckDB — exactly-once outer emission.
    """
    import os

    staging_c = _fresh_dir("streamlojoin", "clicks")
    staging_p = _fresh_dir("streamlojoin", "purchases")
    checkpoint = _fresh_dir("streamlojoin", "checkpoint")

    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type")
    )
    sentinel_ts = "2024-03-15 00:00:00"
    for etype, path, suser in (
        ("click", staging_c, -1),
        ("purchase", staging_p, -2),
    ):
        side = ev.filter(F.col("event_type") == etype).drop("event_type")
        side.repartitionByRange(4, "ts").write.mode("overwrite").parquet(path)
        # Range files BEFORE the sentinel append: part-NNNNN index ==
        # range order for repartitionByRange, so name order is time
        # order regardless of task finish order.
        range_files = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet")
        )
        sentinel = spark.createDataFrame(
            [(-1, suser)], "event_id long, user_id long"
        ).select(
            "event_id",
            F.lit(sentinel_ts).cast("timestamp").alias("ts"),
            "user_id",
        )
        sentinel.coalesce(1).write.mode("append").parquet(path)
        sentinel_files = [
            n
            for n in os.listdir(path)
            if n.endswith(".parquet") and n not in set(range_files)
        ]
        # Stamp strictly ascending mtimes: range files in range order,
        # then the sentinel — the file source replays (modTime, path)
        # ascending, giving a deterministic time-ordered feed with the
        # watermark-flushing heartbeat last.
        for i, name in enumerate(range_files + sentinel_files):
            os.utime(
                os.path.join(path, name),
                (1_700_000_000 + i, 1_700_000_000 + i),
            )

    schema = ev.drop("event_type").schema
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_c)
        .withWatermark("ts", "1 minute")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
            "user_id",
        )
    )
    purchases = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_p)
        .withWatermark("ts", "1 minute")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts > c_ts "
            "AND p_ts <= c_ts + INTERVAL 1 HOUR"
        ),
        "left_outer",
    )
    # r13: 4 state stores per partition per micro-batch (left/right ×
    # two join state stores) made the 32-wide session default ~pure
    # commit overhead — same-box A/B: 32 → 25-38 s, 8 → ~16 s,
    # 4/2 ≈ 15-16 s; 8 keeps headroom for the join work itself.
    with _scoped_state_partitions(spark, "8"):
        query = (
            joined.writeStream.format("memory")
            .queryName("stream_lojoin_sink")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql(
        """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN p_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN p_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unmatched,
               CAST(SUM(c_id + COALESCE(p_id, 0)) AS BIGINT) AS id_checksum
        FROM stream_lojoin_sink
        WHERE user_id >= 0
        """
    )


@register(
    "stream_multisink_atomic",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_committed_batches,
           COUNT(*) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           (SELECT COUNT(DISTINCT event_type) FROM events) AS n_types
    FROM events
    """,
)
def stream_multisink_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once fan-out to TWO sinks (row store + aggregate store)
    under a mid-batch CRASH — the multi-sink atomicity problem
    foreachBatch leaves to the user, solved the production way:

      * each micro-batch writes sink A (raw rows) and sink B (per-type
        aggregates) into batch-id-scoped directories (idempotent
        overwrite on retry),
      * then commits a per-batch MANIFEST via atomic rename — readers
        count only manifested batches, so a crash BETWEEN the sink
        writes and the commit leaves invisible orphans, not torn state;
      * a crash is actually INJECTED on batch 2's first attempt (after
        both sink writes, before the manifest — the worst window), the
        query dies, and a restart from the SAME checkpoint replays
        batch 2, overwrites both batch dirs, and commits.

    The final read (manifest-gated union of A; B cross-checked against
    A's aggregation in-op) must equal the batch profile of the whole
    table — the oracle pins rows, id checksum, value sum, and that all
    4 file-batches committed despite the crash. At 100 TB this is the
    pattern for any foreachBatch writing to >1 system without
    cross-system transactions.
    """
    import json as _json

    staging = _fresh_dir("multisink", "staging")
    checkpoint = _fresh_dir("multisink", "checkpoint")
    sink_a = _fresh_dir("multisink", "rows")
    sink_b = _fresh_dir("multisink", "aggs")
    meta = _fresh_dir("multisink", "meta")
    crash_marker = os.path.join(meta, "crash-injected")

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(staging)
    for i, name in enumerate(
        sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    ):
        os.utime(os.path.join(staging, name), (1_700_000_000 + i,) * 2)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Sink A: raw rows, batch-scoped dir (retry = clean overwrite).
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink_a, f"batch={batch_id}")
        )
        # Sink B: per-type aggregate of THIS batch.
        batch_df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        ).write.mode("overwrite").parquet(
            os.path.join(sink_b, f"batch={batch_id}")
        )
        # Inject ONE crash in the worst window: both sinks written,
        # manifest not yet committed.
        if batch_id == 2 and not os.path.exists(crash_marker):
            with open(crash_marker, "w") as fh:
                fh.write("batch 2 first attempt")
            raise RuntimeError("injected crash before manifest commit")
        tmp = os.path.join(meta, f".batch-{batch_id}.tmp")
        with open(tmp, "w") as fh:
            _json.dump({"batch_id": batch_id}, fh)
        os.replace(tmp, os.path.join(meta, f"batch-{batch_id}.json"))

    def run() -> None:
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run()
        raise AssertionError("injected crash did not fire")
    except AssertionError:
        raise
    except Exception:
        pass  # the injected crash killed the first run, as designed
    run()  # restart from the same checkpoint: batch 2 replays + commits

    committed = sorted(
        int(f[len("batch-"):-len(".json")])
        for f in os.listdir(meta)
        if f.startswith("batch-") and f.endswith(".json")
    )
    a = spark.read.parquet(
        *[os.path.join(sink_a, f"batch={b}") for b in committed]
    )
    b = spark.read.parquet(
        *[os.path.join(sink_b, f"batch={b}") for b in committed]
    )
    # In-op cross-check: sink B must equal sink A re-aggregated.
    # bounded: one row per event_type on each side (<= 5 rows each)
    a_agg = {
        (r.event_type): (r.n, str(r.s))
        for r in a.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    b_agg = {
        (r.event_type): (r.n, str(r.s))
        # bounded: one row per event_type (<= 5)
        for r in b.groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n"), F.sum("sum_value").alias("s")
        )
        .collect()
    }
    if a_agg != b_agg:
        raise RuntimeError(f"sink divergence: {a_agg} != {b_agg}")

    return a.agg(
        F.lit(len(committed)).cast("bigint").alias("n_committed_batches"),
        F.count("*").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("id_checksum"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


DDW_SPLIT_DAY = 19738  # Jan 16 2024 — the F1/F2 feed boundary
DDW_DUP_DAY = 19737  # dup keys drawn from F1's last day (still in state)


@register(
    "stream_dedup_within_watermark",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN epoch_ms(ts) // 86400000 = {DDW_DUP_DAY}
                          AND event_id % 3 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
           CAST(COUNT(*) AS BIGINT) AS n_emitted
    FROM events
    """,
)
def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`dropDuplicatesWithinWatermark` — the BOUNDED-state streaming
    dedup API (Spark 3.5+), and a live proof of its eviction contract,
    which plain dropDuplicates (stream_dedup_watermark) can't show:
    dedup state is guaranteed only within the watermark delay; once
    the watermark passes a key's event time + delay the state row is
    EVICTED — and (measured on 4.1.2, pinned here) a far-late REPLAY
    of that key is then filtered by the operator's late-row gate
    before it can re-enter, so it reaches neither the state store nor
    the sink. That is the bounded-state trade every 100 TB ingest
    makes: state ~ delay·rate instead of |all keys ever|, with
    anything beyond the delay handled by the downstream compactor
    (merge_cdc_apply), not the stream.

    Feed: F1 = first half of events; F2 = second half PLUS duplicates
    of F1's last-day keys (within delay → suppressed BY STATE); F3 =
    the SAME duplicates again, now ~14 days beyond the watermark
    (→ filtered as late). So n_emitted == n_base EXACTLY despite 2·9
    duplicate feeds at two different state lifetimes — the oracle pins
    it; a dedup that leaks either path hash-fails. File order is
    pinned with ascending mtimes + maxFilesPerTrigger=1 (G-streaming
    replay order)."""
    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    day = F.expr("ts_ns DIV 1000000 DIV 86400000")
    events_d = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", day.alias("day")
    )
    staging = _fresh_dir("ddw", "staging")
    checkpoint = _fresh_dir("ddw", "checkpoint")
    tmp = _fresh_dir("ddw", "tmp")

    f1 = events_d.filter(F.col("day") < DDW_SPLIT_DAY).drop("day")
    dups = events_d.filter(
        (F.col("day") == DDW_DUP_DAY) & (F.col("event_id") % 3 == 0)
    ).drop("day")
    f2 = events_d.filter(F.col("day") >= DDW_SPLIT_DAY).drop("day").unionByName(dups)
    f3 = dups

    for i, frame in enumerate((f1, f2, f3), start=1):
        part_dir = os.path.join(tmp, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        dst = os.path.join(staging, f"f{i}.parquet")
        shutil.copyfile(os.path.join(part_dir, src), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    deduped = stream.withWatermark(
        "ts", "1 day"
    ).dropDuplicatesWithinWatermark(["event_id"])
    query = (
        deduped.writeStream.format("memory")
        .queryName("ddw_sink")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    n_base = events.count()
    n_dup_keys = dups.count()
    n_emitted = spark.table("ddw_sink").count()
    return spark.createDataFrame(
        [(n_base, n_dup_keys, n_emitted)],
        "n_base long, n_dup_keys long, n_emitted long",
    )


@register(
    "stream_chained_window_agg",
    oracle="""
    SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY day_id
    ORDER BY day_id
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming aggregations (Spark 3.4+/4.x multiple-
    stateful-operator support): a 6-hour windowed aggregate feeds a
    1-day rollup window INSIDE THE SAME streaming query, chained via
    `window_time()` as the second stage's event-time column — the
    streaming materialized-rollup ladder (raw → 6h → daily) that
    previously required two queries with an intermediate sink, each
    with its own checkpoint and replay cost.

    Both stages run in append mode off one watermark; the daily output
    is pinned equal to the one-shot batch daily profile (the oracle
    states it relationally over the same events). Decimal partials
    keep the chained sums exact at any merge order (G2).

    At 100 TB this collapses the rollup pipeline's operational surface:
    one checkpoint, one replay domain, and the 6h stage's state bounds
    the daily stage's input to |windows| rows, not |events|."""
    events = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    staging = _fresh_dir("chain", "staging")
    checkpoint = _fresh_dir("chain", "checkpoint")
    # Range files: part-NNNNN index == time order for
    # repartitionByRange, so the mtime stamping below replays a
    # time-ordered feed — with an unordered feed and a 0s watermark,
    # later batches' early-timestamp rows would be dropped as late.
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(
        staging
    )
    data_files = sorted(
        n for n in os.listdir(staging) if n.endswith(".parquet")
    )
    # Two far-future sentinel heartbeats in their OWN later batches:
    # batch(s1) advances the watermark past every data window; batch(s2)
    # runs with that watermark and flushes both chained stages' final
    # windows (append mode emits a window only in a batch whose STARTING
    # watermark has passed its end — the stream_stream_left_outer
    # sentinel pattern, needed twice because the watermark advances
    # between batches, not within one).
    for j, sent_ts in enumerate(("2024-03-15 00:00:00", "2024-04-01 00:00:00")):
        sent = spark.createDataFrame(
            [(-1 - j,)], "event_id long"
        ).select(
            "event_id",
            F.lit(sent_ts).cast("timestamp").alias("ts"),
            F.lit(0.0).alias("value"),
        )
        sent.coalesce(1).write.mode("append").parquet(staging)
    sentinel_files = [
        n
        for n in sorted(os.listdir(staging))
        if n.endswith(".parquet") and n not in set(data_files)
    ]
    for i, name in enumerate(data_files + sentinel_files):
        os.utime(
            os.path.join(staging, name),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .withWatermark("ts", "0 seconds")
    )
    six_hourly = stream.groupBy(F.window("ts", "6 hours")).agg(
        F.count("*").alias("n6"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v6"),
    )
    daily = (
        six_hourly.groupBy(
            F.window(F.window_time("window"), "1 day").alias("dwin")
        )
        .agg(
            F.sum("n6").cast("bigint").alias("n_events"),
            F.sum("v6").cast("double").alias("sum_value"),
        )
    )
    # r13: two chained stateful stages = two state-store commits per
    # partition per micro-batch; same-box A/B: 32 → 19.5 s,
    # 8 → 13.8 s, 4 → 13.9 s. 8 is the measured optimum.
    with _scoped_state_partitions(spark, "8"):
        query = (
            daily.writeStream.format("memory")
            .queryName("chain_sink")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql(
        """
        SELECT CAST(unix_timestamp(dwin.start) * 1000 DIV 86400000
                    AS BIGINT) AS day_id,
               n_events, sum_value
        FROM chain_sink
        WHERE dwin.start < TIMESTAMP '2024-03-01 00:00:00'
        ORDER BY day_id
        """
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@register(
    "stream_rocksdb_state_store",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY day
    ORDER BY day
    """,
)
def stream_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregation on the ROCKSDB state store — the
    production state backend for 100 TB streaming: the default
    HDFS-backed provider keeps every key IN EXECUTOR HEAP (state ∝
    keys → OOM is the scale ceiling), while RocksDB spills state to
    local SSD with incremental changelog checkpointing, which is how
    real deployments hold billions of keys. The query itself is the
    stream_tumbling_daily shape (watermarked 1-day windows over the
    events replay); what this operator pins is the ENGINE
    configuration path: an isolated session sets
    spark.sql.streaming.stateStore.providerClass to RocksDB, the op
    HARD-FAILS unless the query's own progress telemetry reports
    RocksDB custom metrics (rocksdbGet/Put counts — proof the provider
    actually engaged, not just the conf string), and the emitted
    windows hash-match the batch oracle — same answers, scale-ready
    state.

    (The newer per-op surface on this backend is
    stream_transform_with_state; this op covers the drop-in provider
    swap every EXISTING stateful query gets for free.)"""
    staging = _fresh_dir("rocksdb", "staging")
    checkpoint = _fresh_dir("rocksdb", "checkpoint")

    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "value")
    )
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(staging)
    for i, name in enumerate(
        sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    ):
        os.utime(
            os.path.join(staging, name), (1_700_000_000 + i, 1_700_000_000 + i)
        )

    clone = spark.newSession()
    clone.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    stream = (
        clone.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .withWatermark("ts", "30 days")
    )
    windowed = (
        stream.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "n_events",
            "sum_value",
        )
    )
    query = (
        windowed.writeStream.format("memory")
        .queryName("rocksdb_sink")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    progress = query.lastProgress
    metrics = (progress.get("stateOperators") or [{}])[0].get(
        "customMetrics", {}
    )
    if not any(k.startswith("rocksdb") for k in metrics):
        raise RuntimeError(
            "RocksDB state store did not engage; customMetrics="
            f"{sorted(metrics)[:8]}"
        )
    out = clone.sql(
        "SELECT day, n_events, sum_value FROM rocksdb_sink ORDER BY day"
    )
    # bounded: one row per fixture day (the report frame itself)
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register(
    "source_state_store_reader",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def source_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE STORE DATA SOURCE (Spark 4, SPARK-45511) — read a
    streaming query's checkpointed state back as a plain DataFrame:
    the operational surface for debugging stuck streaming jobs
    ('what is actually IN the state store for key X?'), state-size
    audits, and offline state migrations — previously impossible
    without replaying the stream. A per-user count+sum aggregation
    runs over the events replay (complete mode, availableNow), then
    `spark.read.format("statestore").load(checkpoint)` opens the
    LAST committed state snapshot directly from the checkpoint files;
    the op unpacks (key, aggregation buffer) structs and the DuckDB
    oracle pins the recovered state EQUAL to the batch GROUP BY — the
    state on disk IS the aggregate, row for row, which is precisely
    the exactly-once argument made data-visible.

    At 100 TB the reader scans state shards in parallel like any file
    source (one task per state partition); no replay, no driver
    funnel."""
    staging = _fresh_dir("statesrc", "staging")
    checkpoint = _fresh_dir("statesrc", "checkpoint")

    ev = (
        load(spark, sf_dir, "events")
        .withColumn(
            "cents",
            (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
        )
        .select("event_id", "user_id", "cents")
    )
    ev.write.mode("overwrite").parquet(staging)

    stream = spark.readStream.schema(
        "event_id long, user_id long, cents long"
    ).parquet(staging)
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("statesrc_sink")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    state = spark.read.format("statestore").load(checkpoint)
    # key = (user_id), value = the aggregation buffer in agg order:
    # (n_events, sum_cents). Unpack positionally so buffer-internal
    # field naming can't break the contract.
    kcols = state.select("key.*").columns
    vcols = state.select("value.*").columns
    out = (
        state.select(
            F.col(f"key.{kcols[0]}").cast("bigint").alias("user_id"),
            F.col(f"value.{vcols[0]}").cast("bigint").alias("n_events"),
            F.col(f"value.{vcols[1]}").cast("bigint").alias("sum_cents"),
        )
        .orderBy("user_id")
    )
    # bounded: one row per stateful user key (the report frame itself)
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register(
    "source_notify_push_archival",
    # Thirds partition by RANK-derived ID cuts (not dense-domain
    # arithmetic — random corpora have gaps/duplicates): each cut is
    # the max event_id of a rank-third, each notification's watermark
    # is its cut, and n_rows counts ids in the HALF-OPEN RANGE
    # (prev_cut, cut] — the id-range semantics the listener's pull
    # predicate actually has (a duplicate id straddling a rank
    # boundary is pulled once, with its earlier batch). A listener
    # that double-pulled, skipped a notification, or mis-ordered the
    # wake-ups hash-fails.
    oracle="""
    WITH ranked AS (
        SELECT event_id,
               ((ROW_NUMBER() OVER (ORDER BY event_id) - 1) * 3)
                   // COUNT(*) OVER () AS b
        FROM events
    ),
    cuts AS (
        SELECT MAX(CASE WHEN b = 0 THEN event_id END) AS c1,
               MAX(CASE WHEN b = 1 THEN event_id END) AS c2,
               MAX(event_id) AS c3
        FROM ranked
    )
    SELECT CAST(1 AS BIGINT) AS batch,
           CAST((SELECT COUNT(*) FROM events WHERE event_id <= c1)
                AS BIGINT) AS n_rows,
           CAST(c1 AS BIGINT) AS watermark
    FROM cuts
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST((SELECT COUNT(*) FROM events
                 WHERE event_id > c1 AND event_id <= c2) AS BIGINT),
           CAST(c2 AS BIGINT)
    FROM cuts
    UNION ALL
    SELECT CAST(3 AS BIGINT),
           CAST((SELECT COUNT(*) FROM events
                 WHERE event_id > c2 AND event_id <= c3) AS BIGINT),
           CAST(c3 AS BIGINT)
    FROM cuts
    ORDER BY batch
    """,
)
def source_notify_push_archival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PUSH-BASED real-time archival — the faithful analogue of the
    reference's named-but-unimplemented PostgreSQL NOTIFY/LISTEN
    trigger (README.md:124), built from components this harness
    actually has. LISTEN/NOTIFY semantics are (a) the WRITER commits
    rows, then notifies a channel with a small payload; (b) the
    LISTENER wakes on the notification — not on a poll interval — and
    pulls exactly the notified range. Here the channel is a file
    directory watched by a Structured Streaming file source (real
    wake-up semantics: the stream processes nothing until a
    notification lands), the payload is the committed batch's
    watermark, the data lives in a LIVE embedded Derby database the
    writer appends to BEFORE each notify (the commit-then-notify
    ordering that makes the protocol race-free), and the listener's
    foreachBatch handler runs the incremental JDBC pull
    ``id > last_wm AND id <= notified_wm`` (predicate pushed down —
    each wake-up reads ONLY the notified rows) and appends to the
    parquet archive. Exactly-once coverage is asserted in-op (the
    source_jdbc_poll contract): archived rows must partition the
    fixture, else RuntimeError.

    At 100 TB this is the shape that replaces interval polling when
    ingest latency matters: wake-ups cost one small file/message each
    (any bus — S3 events, Kafka, pg_notify — slots into the file
    source's place), pulls stay O(new rows), and the watermark ledger
    makes replays idempotent.

    Reference parity: closes the last named future-work item
    (README.md:123-128) that had only the polling approximation
    (source_jdbc_poll)."""
    import json

    from pg_archiver_spark.sources import derby

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    total = events.count()
    # Rank-derived ID cuts (robust to gapped/duplicated id domains):
    # the writer commits half-open id ranges (prev_cut, cut]. The rank
    # comes from the bucket-offset two-pass (scalable.py), NOT a
    # partition-less row_number over the full events table (VERDICT
    # r12 #4: the old global window made the writer-side cut
    # derivation itself the scale bottleneck). Duplicate ids straddling
    # a rank third are still safe: the cut is MAX(id) within the
    # third, identical whichever twin lands on which side.
    from pg_archiver_spark.operators.scalable import bucketed_global_rank

    ranked = bucketed_global_rank(
        events.select("event_id"),
        F.col("event_id"),
        [F.col("event_id")],
        "r",
        "n_total",
    ).select("event_id", F.expr("((r - 1) * 3) DIV n_total").alias("b"))
    # bounded: 1-row cut anchor (three watermark scalars)
    cut_row = ranked.agg(
        F.max(F.when(F.col("b") == 0, F.col("event_id"))).alias("c1"),
        F.max(F.when(F.col("b") == 1, F.col("event_id"))).alias("c2"),
        F.max("event_id").alias("c3"),
    ).first()
    his = [int(cut_row.c1), int(cut_row.c2), int(cut_row.c3)]
    batches = [
        events.filter(F.col("event_id") <= his[0]),
        events.filter(
            (F.col("event_id") > his[0]) & (F.col("event_id") <= his[1])
        ),
        events.filter(
            (F.col("event_id") > his[1]) & (F.col("event_id") <= his[2])
        ),
    ]

    notify_dir = _fresh_dir("notify", "channel")
    archive_dir = _fresh_dir("notify", "archive")
    checkpoint = _fresh_dir("notify", "checkpoint")

    # Writer side: commit batch k to the database, THEN notify — with
    # strictly ascending mtimes so the channel replays in commit order.
    url = derby.stage_frame(spark, batches[0], "events_push")
    for k in range(3):
        if k > 0:
            (
                batches[k]
                .write.format("jdbc")
                .option("url", url)
                .option("dbtable", "events_push")
                .option("driver", derby.DERBY_DRIVER)
                .mode("append")
                .save()
            )
        path = os.path.join(notify_dir, f"notify_{k + 1}.json")
        with open(path, "w") as f:
            json.dump({"batch": k + 1, "hi": his[k]}, f)
        os.utime(path, (1_700_000_000 + k, 1_700_000_000 + k))

    # Listener side: wake on notifications, pull the notified range.
    ledger: list[tuple[int, int, int]] = []
    state = {"wm": -1}

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        # bounded: <= 3 notification payloads per wake-up
        for r in sorted(batch_df.collect(), key=lambda x: x.batch):
            pulled = (
                spark.read.format("jdbc")
                .option("url", url)
                .option("dbtable", "events_push")
                .option("driver", derby.DERBY_DRIVER)
                .option("pushDownPredicate", "true")
                .load()
                .filter(
                    (F.col("event_id") > state["wm"])
                    & (F.col("event_id") <= r.hi)
                )
            )
            n = pulled.count()
            pulled.write.mode("append").parquet(archive_dir)
            ledger.append((int(r.batch), n, int(r.hi)))
            state["wm"] = int(r.hi)

    stream = (
        spark.readStream.schema("batch long, hi long")
        .json(notify_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    archived = spark.read.parquet(archive_dir)
    n_arch = archived.count()
    n_dist = archived.select("event_id").distinct().count()
    want_dist = events.select("event_id").distinct().count()
    if n_arch != total or n_dist != want_dist or len(ledger) != 3:
        raise RuntimeError(
            "push archival lost or duplicated rows: "
            f"archived={n_arch} distinct={n_dist} total={total} "
            f"notifications={len(ledger)}"
        )
    return spark.createDataFrame(
        sorted(ledger), "batch long, n_rows long, watermark long"
    )
