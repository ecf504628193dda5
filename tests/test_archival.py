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
