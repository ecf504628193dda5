"""Archival-pipeline regression tests: the reference defect fixes
(SURVEY.md §4.4 D1-D5) must hold."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pg_archiver_spark.operators.sorts import archive_selection
from pg_archiver_spark.streaming.archival import archive_batch


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_archive_batch_partitions_per_row(spark, tmp_path):
    """D2: rows spanning months land in their OWN partitions, not the
    batch-max partition (reference main.go:194-200 keys everything by
    the global max timestamp)."""
    rows = [
        (1, datetime(2024, 1, 10), 1, 1.0),
        (2, datetime(2024, 2, 10), 1, 1.0),
        (3, datetime(2024, 3, 10), 1, 1.0),
    ]
    df = _mk_events(spark, rows)
    archive_dir = str(tmp_path / "archive")
    archive_batch(
        {"iot_data": df},
        lambda d: F.col("ts") < F.lit("2024-04-01").cast("timestamp"),
        archive_dir,
    )
    back = spark.read.parquet(archive_dir + "/batch_id=0")
    months = sorted(r.month for r in back.select("month").distinct().collect())
    assert months == [1, 2, 3]


def test_archive_batch_ledger_is_exact_key_set(spark, tmp_path):
    """D1: the delete set == exactly the archived keys, not everything
    below the cutoff."""
    rows = [
        (1, datetime(2024, 1, 10), 1, 1.0),
        (2, datetime(2024, 1, 20), 1, 1.0),  # above cutoff: NOT archived
    ]
    df = _mk_events(spark, rows)
    ledger = archive_batch(
        {"iot_data": df},
        lambda d: F.col("ts") < F.lit("2024-01-15").cast("timestamp"),
        str(tmp_path / "archive"),
    )
    keys = sorted(r.event_id for r in ledger.collect())
    assert keys == [1]


def test_archive_batch_rerun_is_idempotent(spark, tmp_path):
    """D3: re-running the same batch id must not duplicate archive rows."""
    rows = [(1, datetime(2024, 1, 10), 1, 1.0)]
    df = _mk_events(spark, rows)
    archive_dir = str(tmp_path / "archive")
    cutoff = lambda d: F.col("ts") < F.lit("2024-02-01").cast("timestamp")  # noqa: E731
    archive_batch({"iot_data": df}, cutoff, archive_dir, batch_id=7)
    archive_batch({"iot_data": df}, cutoff, archive_dir, batch_id=7)  # retry
    back = spark.read.parquet(archive_dir + "/batch_id=7")
    assert back.count() == 1


def test_archive_keeps_timestamp_type(spark, tmp_path):
    """D5: the archive must carry a real timestamp, not an epoch int."""
    rows = [(1, datetime(2024, 1, 10), 1, 1.0)]
    df = _mk_events(spark, rows)
    archive_dir = str(tmp_path / "archive")
    archive_batch(
        {"iot_data": df},
        lambda d: F.lit(True),
        archive_dir,
    )
    back = spark.read.parquet(archive_dir + "/batch_id=0")
    assert dict(back.dtypes)["ts"].startswith("timestamp")


def test_flagship_matches_reference_shape(spark, sf_dir):
    """The flagship returns ≤100 rows below the cutoff, newest-first,
    tagged with the lineage literal (main.go:88-93,114)."""
    out = archive_selection(spark, sf_dir).collect()
    assert 0 < len(out) <= 100
    assert all(r.table_name == "iot_data" for r in out)
    ms = [r.epoch_ms for r in out]
    assert ms == sorted(ms, reverse=True)


# --- JDBC delete-behind (reference main.go:131-145, D1-fixed) ---------


class _FakeCursor:
    def __init__(self, log):
        self._log = log
        self.rowcount = 0

    def execute(self, sql, params):
        (keys,) = params
        self._log.append((sql, list(keys)))
        self.rowcount = len(keys)


class _FakeConnection:
    def __init__(self, log, state):
        self._log = log
        self._state = state

    def cursor(self):
        return _FakeCursor(self._log)

    def commit(self):
        self._state["commits"] = self._state.get("commits", 0) + 1

    def close(self):
        self._state["closed"] = True


def test_delete_kernel_deletes_exact_keys_in_chunks():
    """D1: delete EXACTLY the archived key set — chunked, one commit."""
    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    log, state = [], {}
    n = _delete_partition_kernel(
        iter(range(8)),
        "iot_data",
        "event_id",
        lambda: _FakeConnection(log, state),
        batch_size=3,
    )
    assert n == 8
    assert [len(keys) for _, keys in log] == [3, 3, 2]
    assert sorted(k for _, keys in log for k in keys) == list(range(8))
    assert all(
        sql == "DELETE FROM iot_data WHERE event_id = ANY(%s)" for sql, _ in log
    )
    assert state == {"commits": 1, "closed": True}


def test_delete_archived_distributes_exact_key_set(spark, tmp_path):
    """The distributed path deletes each archived key exactly once,
    partition-wise, with no driver-side collect of the key frame."""
    from pg_archiver_spark.sources.jdbc import delete_archived

    sink = str(tmp_path / "deleted")
    import os

    os.makedirs(sink, exist_ok=True)

    def factory(sink=sink):
        import os
        import uuid

        class Cursor:
            rowcount = 0

            def execute(self, sql, params):
                assert sql == "DELETE FROM iot_data WHERE event_id = ANY(%s)"
                (keys,) = params
                path = os.path.join(sink, uuid.uuid4().hex)
                with open(path, "w") as f:
                    f.write("\n".join(str(k) for k in keys))
                self.rowcount = len(keys)

        class Conn:
            def cursor(self):
                return Cursor()

            def commit(self):
                pass

            def close(self):
                pass

        return Conn()

    keys = spark.range(0, 100).select(F.col("id").alias("event_id")).repartition(4)
    n = delete_archived(
        spark, "iot_data", keys, key_col="event_id",
        connection_factory=factory, batch_size=16,
    )
    assert n == 100
    import os as _os

    written = []
    for name in _os.listdir(sink):
        with open(_os.path.join(sink, name)) as f:
            written += [int(line) for line in f.read().splitlines() if line]
    assert sorted(written) == list(range(100))


def test_delete_kernel_rejects_missing_connection():
    """A factory that yields no connection inside the distributed path
    (env/driver check already passed) must FAIL the task, not report 0
    deletions that read as a successful no-op."""
    import pytest

    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    with pytest.raises(RuntimeError, match="connection_factory returned None"):
        _delete_partition_kernel(
            iter(range(3)), "iot_data", "event_id", lambda: None, batch_size=8
        )


def test_delete_kernel_ignores_unknown_rowcount():
    """DB-API rowcount == -1 means 'unknown' and must not be summed
    into the reported delete count."""
    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    log, state = [], {}

    class _UnknownCursor(_FakeCursor):
        def execute(self, sql, params):
            super().execute(sql, params)
            self.rowcount = -1

    class _UnknownConn(_FakeConnection):
        def cursor(self):
            return _UnknownCursor(self._log)

    n = _delete_partition_kernel(
        iter(range(5)),
        "iot_data",
        "event_id",
        lambda: _UnknownConn(log, state),
        batch_size=2,
    )
    assert n == 0
    assert sorted(k for _, keys in log for k in keys) == list(range(5))


def test_delete_archived_noop_without_database(spark):
    """Without a configured database the delete path is a clean no-op."""
    from pg_archiver_spark.sources.jdbc import delete_archived

    keys = spark.range(0, 5).select(F.col("id").alias("event_id"))
    assert delete_archived(spark, "iot_data", keys, key_col="event_id") == 0


def test_archive_sink_accepts_scheme_qualified_uri(spark, tmp_path):
    """Object-store path abstraction (reference main.go:211-241 uploads
    to S3): the sink must accept scheme-qualified URIs, so pointing it
    at s3a:// is a config change, not a code change. file:// exercises
    the same Hadoop FileSystem resolution path in this sandbox."""
    rows = [(1, datetime(2024, 1, 10), 1, 1.0), (2, datetime(2024, 2, 3), 2, 2.0)]
    df = _mk_events(spark, rows)
    archive_uri = "file://" + str(tmp_path / "uri_archive")
    ledger = archive_batch(
        {"iot_data": df},
        lambda d: F.lit(True),
        archive_uri,
    )
    assert sorted(r.event_id for r in ledger.collect()) == [1, 2]
    back = spark.read.parquet(archive_uri + "/batch_id=0")
    assert back.count() == 2
    assert sorted(r.month for r in back.select("month").collect()) == [1, 2]


def test_zscore_kernel_degenerate_groups():
    """Single-row and constant-value groups emit the 0.0 sentinel (G13:
    no nullable numerics), matching the oracle's stddev > 0 guard."""
    import pandas as pd

    from pg_archiver_spark.functions.udfs import _zscore_group

    single = pd.DataFrame({"event_id": [1], "user_id": [7], "value": [3.5]})
    assert _zscore_group(single)["zscore"].tolist() == [0.0]

    constant = pd.DataFrame(
        {"event_id": [1, 2], "user_id": [7, 7], "value": [2.0, 2.0]}
    )
    assert _zscore_group(constant)["zscore"].tolist() == [0.0, 0.0]
