"""Round-8 tests: VERDICT r7 follow-ups (seed-vocab cap, bench output
contract, Postgres-dialect delete-behind emission) and round-8 ops."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def test_unigram_seed_vocab_collect_is_capped(spark, sf_dir, monkeypatch):
    """VERDICT r7 #3: the unigram-EM seed vocabulary must be a bounded
    collect. Force a cap far below the fixture's candidate count and
    assert the op still runs end-to-end (single-char coverage keeps
    every word segmentable) and stays deterministic."""
    from pg_archiver_spark.functions import curation

    # The fixture's uncapped multi-char candidate space must exceed the
    # forced cap, or this test proves nothing.
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .count()
    )
    n_multi = (
        words.select(F.explode(
            F.expr(
                "flatten(transform(sequence(0, length(w)-1), i -> "
                "transform(sequence(2, 4), l -> substring(w, i+1, l))))"
            )
        ).alias("tok"))
        .filter(F.length("tok") > 1)
        .select("tok")
        .distinct()
        .count()
    )
    assert n_multi > 50, "fixture too small for the cap to bind"

    monkeypatch.setattr(curation, "UNIGRAM_SEED_CAP", 50)
    rows = QUERIES["pipeline_unigram_tokenizer_em"](spark, sf_dir).collect()
    assert len(rows) > 0
    rows2 = QUERIES["pipeline_unigram_tokenizer_em"](spark, sf_dir).collect()
    assert [(r.tok, r.n_uses) for r in rows] == [
        (r.tok, r.n_uses) for r in rows2
    ]


# -- Postgres-dialect delete-behind statement pin (VERDICT r7 #6) ------
#
# The archiver's write path (delete-behind, main.go:131-145 semantics)
# runs live only against embedded Derby in this harness; these tests pin
# the EXACT statement text + parameter binding the kernel emits under
# the `postgres` dialect (array bind via ANY) and the `standard` dialect
# (quoted identifier + positional binds), so the Derby stand-in cannot
# mask drift on the write path.


class _RecordingCursor:
    def __init__(self, rowcount_per_execute):
        self.executed = []  # (sql, params) tuples
        self._rc = rowcount_per_execute
        self.rowcount = -1

    def execute(self, sql, params=None):
        self.executed.append((sql, params))
        self.rowcount = self._rc


class _RecordingConn:
    def __init__(self, rowcount_per_execute=-1):
        self.cur = _RecordingCursor(rowcount_per_execute)
        self.commits = 0
        self.closed = False

    def cursor(self):
        return self.cur

    def commit(self):
        self.commits += 1

    def close(self):
        self.closed = True


def test_delete_behind_postgres_dialect_exact_sql():
    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    conn = _RecordingConn(rowcount_per_execute=3)
    n = _delete_partition_kernel(
        iter(range(7)),
        "archived_events",
        "id",
        lambda: conn,
        batch_size=3,
        dialect="postgres",
    )
    # Chunked: 7 keys at batch_size=3 → 3 round-trips, one array bind
    # each — never row-at-a-time (the reference loops per row).
    assert [s for s, _ in conn.cur.executed] == [
        "DELETE FROM archived_events WHERE id = ANY(%s)"
    ] * 3
    assert [p for _, p in conn.cur.executed] == [
        ([0, 1, 2],),
        ([3, 4, 5],),
        ([6],),
    ]
    # One commit per partition (idempotent task retry), connection
    # closed, rowcounts accumulated.
    assert conn.commits == 1 and conn.closed
    assert n == 9


def test_delete_behind_standard_dialect_exact_sql():
    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    conn = _RecordingConn(rowcount_per_execute=2)
    n = _delete_partition_kernel(
        iter([10, 11, 12]),
        "sink_events",
        "batch_id",
        lambda: conn,
        batch_size=2,
        dialect="standard",
    )
    # Derby/standard: quoted identifier (Spark's JDBC writer creates
    # quoted lowercase columns) + positional ? binds.
    assert conn.cur.executed == [
        ('DELETE FROM sink_events WHERE "batch_id" IN (?,?)', [10, 11]),
        ('DELETE FROM sink_events WHERE "batch_id" IN (?)', [12]),
    ]
    assert n == 4


def test_delete_behind_unknown_rowcount_not_counted():
    from pg_archiver_spark.sources.jdbc import _delete_partition_kernel

    # DB-API rowcount == -1 ("unknown") must not be summed as -1.
    conn = _RecordingConn(rowcount_per_execute=-1)
    n = _delete_partition_kernel(
        iter([1, 2]), "t", "id", lambda: conn, batch_size=10
    )
    assert n == 0 and conn.commits == 1


def test_bench_compact_totals_line_is_last_and_small():
    """VERDICT r7 #2: the driver keeps only the last ~2000 chars of
    bench stdout. Statically verify bench.py ends its output with a
    compact totals-only JSON line that fits the tail window."""
    src = open("/root/repo/bench.py").read()
    # The compact re-print must exist and come after the full dump.
    assert src.rindex("vs_r1_max") > src.index("tpch_queries")
