"""Round-13 session-3 tests: the catalog metadata memo (schema pinned
after first footer inference; timestamp confs pinned once per session)
must not change what load() returns, and must actually stop re-reading
footers."""

import pytest

from pg_archiver_spark import catalog
from pg_archiver_spark.catalog import load


def test_schema_cache_returns_identical_schema(spark, sf_dir):
    """First (inferred) and second (explicit-schema) loads of every
    table must expose the identical Spark schema — the memo is pure
    metadata, invisible to queries."""
    for name in catalog.TABLES:
        path = f"{sf_dir}/{name}.parquet"
        catalog._SCHEMA_CACHE.pop(path, None)
        first = load(spark, sf_dir, name).schema
        assert path in catalog._SCHEMA_CACHE  # miss populated the memo
        second = load(spark, sf_dir, name).schema
        assert first == second


def test_schema_cache_skips_reinference(spark, sf_dir, monkeypatch):
    """After the memo is warm, load() must not call the inferring
    DataFrameReader.parquet path without an explicit schema."""
    path = f"{sf_dir}/orders.parquet"
    load(spark, sf_dir, "orders")  # warm
    calls = {"n": 0}
    orig = catalog._read_table

    def spy(sp, p):
        calls["n"] += 1
        assert p in catalog._SCHEMA_CACHE, "warm load must hit the memo"
        return orig(sp, p)

    monkeypatch.setattr(catalog, "_read_table", spy)
    load(spark, sf_dir, "orders")
    assert calls["n"] == 1


def test_events_contract_columns_survive_memo(spark, sf_dir):
    """The events µs/ns adaptation must hold on a memoized load: both
    ts (timestamp) and ts_ns (long) present with consistent values."""
    df = load(spark, sf_dir, "events")
    row = df.selectExpr(
        "ts", "ts_ns", "unix_micros(ts) * 1000 AS rederived"
    ).first()
    assert row.ts_ns == row.rederived


def test_conf_pin_is_per_session_and_idempotent(spark, sf_dir):
    """The one-time conf pin must leave the pinned values in place on
    repeated loads of the same session."""
    load(spark, sf_dir, "orders")
    load(spark, sf_dir, "orders")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (
        spark.conf.get("spark.sql.parquet.outputTimestampType")
        == "TIMESTAMP_MICROS"
    )
    assert spark in catalog._PINNED_SESSIONS
