"""Round-14 item 1 (VERDICT r13 #1): stream_state_timeout_sessions
state-store A/B at REALISTIC key cardinality.

The r13 RocksDB rejection was adjudicated at fixture key cardinality
(~hundreds of live keys), where the in-memory HDFSBackedStateStore has
nothing to spill. This rig synthesizes a high-cardinality feed —
default 262144 users x 4 events = ~1.05M closed sessions, 262144 live
state rows per micro-batch — stages it as the same 4 time-ordered
micro-batch files, and runs the SAME applyInPandasWithState topology
as stream_state_timeout_sessions (same sessionize algebra, same
watermark, same EventTimeTimeout, same availableNow trigger) under a
(provider, shuffle-partitions) grid, recording wall time and the state
operator's own progress metrics (numRowsTotal, memoryUsedBytes /
RocksDB SST bytes, commit latency).

Usage:
    python tools/r14_state_ab.py [--users N] [--events-per-user K]
                                 [--parts 16,32,64] [--providers hdfs,rocksdb]
                                 [--maintenance-sec S] [--passes N]

Emits one JSON line per (provider, parts) cell and a final summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pg_archiver_spark.session import get_spark

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

GAP_MS = 3_600_000
BASE_MS = 1_700_000_000_000  # fixed epoch base; determinism only


def stage_feed(spark, root: str, users: int, epu: int) -> None:
    """4 time-ordered micro-batch files, one event per user per batch
    seq, consecutive events of a user 2h apart (> the 1h gap, so every
    batch closes the previous session — the stress shape: every user
    touches state in every batch and yields a closure row)."""
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    for seq in range(epu):
        df = spark.range(users).selectExpr(
            "id AS event_id",
            f"timestamp_millis({BASE_MS} + {seq} * 2 * {GAP_MS} "
            "+ CAST(id % 60000 AS BIGINT)) AS ts",
            "id AS user_id",
        )
        # ONE file per seq → 4 triggers, like the real op's 4 quartile
        # files (maxFilesPerTrigger=1); more files would multiply the
        # per-trigger fixed overhead and mask the state-store cost.
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"b{seq}")
        )


def run_cell(
    spark, staging: str, provider: str, parts: int, maintenance_sec: int
) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = GAP_MS

    # Same sessionize body as stream_state_timeout_sessions.
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

    checkpoint = tempfile.mkdtemp(prefix=f"r14_state_ab_ckpt_{parts}_")
    prev = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.streaming.stateStore.providerClass": spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", HDFS
        ),
        "spark.sql.streaming.stateStore.maintenanceInterval": spark.conf.get(
            "spark.sql.streaming.stateStore.maintenanceInterval", "60s"
        ),
    }
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        ROCKSDB if provider == "rocksdb" else HDFS,
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.maintenanceInterval",
        f"{maintenance_sec}s",
    )
    name = f"state_ab_{provider}_{parts}"
    try:
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
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        query = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        wall = round(time.time() - t0, 3)
        out = spark.sql(
            f"SELECT closed_by, COUNT(*) n FROM {name} GROUP BY closed_by"
        ).collect()
        emitted = {r["closed_by"]: r["n"] for r in out}
        # Per-batch state metrics from the progress log.
        batches = []
        rocks_sst = 0
        mem_bytes = 0
        rows_total = 0
        for p in query.recentProgress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            so = ops[0]
            rows_total = so.get("numRowsTotal", rows_total)
            mem_bytes = max(mem_bytes, so.get("memoryUsedBytes", 0))
            cm = so.get("customMetrics") or {}
            rocks_sst = max(rocks_sst, cm.get("rocksdbSstFileSize", 0))
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "durationMs": (p.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                    "commitTimeMs": so.get("allUpdatesTimeMs"),
                    "numRowsUpdated": so.get("numRowsUpdated"),
                }
            )
        return {
            "provider": provider,
            "parts": parts,
            "wall_sec": wall,
            "emitted": emitted,
            "state_rows_total": rows_total,
            "state_memory_bytes": mem_bytes,
            "rocksdb_sst_bytes": rocks_sst,
            "batches": batches,
        }
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
        shutil.rmtree(checkpoint, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=262144)
    ap.add_argument("--events-per-user", type=int, default=4)
    ap.add_argument("--parts", default="16,32,64")
    ap.add_argument("--providers", default="hdfs,rocksdb")
    ap.add_argument("--maintenance-sec", type=int, default=60)
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark("r14_state_ab")
    staging = tempfile.mkdtemp(prefix="r14_state_ab_feed_")
    stage_feed(spark, staging, args.users, args.events_per_user)
    print(
        json.dumps(
            {
                "users": args.users,
                "events_per_user": args.events_per_user,
                "expected_sessions": args.users * args.events_per_user,
            }
        )
    )
    results = []
    for provider in args.providers.split(","):
        for parts in (int(x) for x in args.parts.split(",")):
            best = None
            for _ in range(args.passes):
                r = run_cell(
                    spark, staging, provider, parts, args.maintenance_sec
                )
                if best is None or r["wall_sec"] < best["wall_sec"]:
                    best = r
            print(json.dumps(best))
            results.append(best)
    summary = {
        f"{r['provider']}_{r['parts']}": r["wall_sec"] for r in results
    }
    print(json.dumps({"summary": summary}))
    shutil.rmtree(staging, ignore_errors=True)


if __name__ == "__main__":
    main()
