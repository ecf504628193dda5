"""Python DataSource API source — the Spark-4 extension point for
reading systems Spark ships no connector for.

The reference reads its archive snapshots with a hand-rolled reader
(main.go:88-121 drains Postgres row-by-row; main.go:233-237 lists the
object store directly). When the format is one Spark's built-in sources
don't speak — an internal snapshot layout, a wire-format dump — the
Spark-4 answer is a custom ``pyspark.sql.datasource.DataSource``: pure
Python, but with REAL partition planning (``partitions()`` returns one
``InputPartition`` per independently-readable shard, so every executor
reads in parallel — no single-reader bottleneck) and Arrow-batch output
(``read()`` yields ``pyarrow.RecordBatch``, so rows never cross the
Python boundary one at a time).

Demonstrated here against parquet ROW GROUPS via pyarrow — deliberately
a format with a known-good built-in source, so the DuckDB oracle can
hash-check that the custom reader returns byte-identical data. The
pattern (shard discovery in ``partitions()``, pyarrow batch emission in
``read()``) transfers unchanged to any sharded custom format. At 100 TB
the parallelism equals the shard count, same as any file source; the
per-batch Arrow hop is the only overhead vs a JVM-native reader.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register

_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


class _RowGroupPartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class ParquetRowGroupDataSource(DataSource):
    """``spark.read.format("pg_rowgroups").option("path", ...)``: reads
    a parquet file row-group-parallel through pyarrow on the executors.
    """

    @classmethod
    def name(cls) -> str:
        return "pg_rowgroups"

    def schema(self) -> str:
        return (
            "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        )

    def reader(self, schema) -> "_RowGroupReader":
        return _RowGroupReader(self.options["path"])


class _RowGroupReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        # Shard discovery: one InputPartition per parquet row group —
        # the planner-side metadata read (footer only, no data pages).
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroupPartition(i) for i in range(n)]

    def read(self, partition: _RowGroupPartition):
        # Executor-side: read ONLY this partition's row group, emit
        # Arrow batches (columnar, zero per-row Python cost).
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        table = pf.read_row_group(partition.index, columns=_COLS)
        yield from table.to_batches()


@register(
    "source_python_datasource",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``)
    reading orders row-group-parallel via pyarrow, hash-checked against
    the built-in parquet source through the DuckDB oracle — proof the
    extension point reproduces the data byte-for-byte. See the module
    docstring for why this matters for the archiver: it is the
    connector story for formats Spark doesn't speak (main.go:88-121's
    snapshot drain generalized)."""
    import os

    spark.dataSource.register(ParquetRowGroupDataSource)
    return (
        spark.read.format("pg_rowgroups")
        .option("path", os.path.join(sf_dir, "orders.parquet"))
        .load()
    )


class _DocPageStreamReader:
    """SimpleDataSourceStreamReader over doc_id PAGES — the polling
    upstream-drain loop (the reference's cron extraction, main.go:
    131-145) as a first-class Spark streaming source: each microbatch
    reads the next id-range page, the engine checkpoints the page
    offset, and a crash/restart replays via readBetweenOffsets —
    exactly-once without the source system cooperating beyond stable
    ordering."""

    def __init__(self, path: str, page: int, end: int):
        self.path, self.page, self.end = path, page, end

    def initialOffset(self):
        return {"next_id": 0}

    def _page(self, lo: int, hi: int):
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        t = pq.read_table(self.path, columns=["doc_id", "lang", "n_chars"])
        m = pc.and_(
            pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi)
        )
        # Materialized list (NOT a generator): the engine pickles the
        # prefetched rows alongside the offset for replay.
        return iter(
            [
                (row["doc_id"], row["lang"], row["n_chars"])
                for row in t.filter(m).to_pylist()
            ]
        )

    def read(self, start):
        lo = start["next_id"]
        hi = min(lo + self.page, self.end)
        return self._page(lo, hi), {"next_id": hi}

    def readBetweenOffsets(self, start, end):
        return self._page(start["next_id"], end["next_id"])


def _mk_doc_stream_source():
    # Defined via factory so the DataSource subclass (pickled to the
    # executors) closes over nothing but stdlib/pyarrow.
    from pyspark.sql.datasource import (
        DataSource as _DS,
        SimpleDataSourceStreamReader as _SR,
    )

    class _Reader(_DocPageStreamReader, _SR):
        pass

    class DocPageStreamSource(_DS):
        @classmethod
        def name(cls):
            return "pg_doc_pages"

        def schema(self):
            return "doc_id bigint, lang string, n_chars bigint"

        def simpleStreamReader(self, schema):
            return _Reader(
                self.options["path"],
                int(self.options["page"]),
                int(self.options["end"]),
            )

    return DocPageStreamSource


@register(
    "stream_python_datasource",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    """,
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STREAMING SOURCE in pure Python (Spark 4
    ``SimpleDataSourceStreamReader``): the documents table drained in
    doc_id pages through a user-defined streaming connector — offsets
    are engine-checkpointed JSON, replay goes through
    readBetweenOffsets, and the sink accumulates each page EXACTLY
    ONCE. This is the connector story for streaming systems Spark
    doesn't speak (the reference's poll-the-upstream cron loop,
    main.go:131-145, as a real Structured Streaming source instead of
    an external scheduler).

    The op drains the full fixture corpus (page size = ~1/5 of the
    corpus, so multiple microbatches at every SF), then profiles the
    landed copy; the DuckDB oracle computes the same profile on the
    SOURCE table — a hash match proves no page was lost, duplicated,
    or torn across the microbatch boundaries. Tests additionally pin
    multi-batch execution and distinct doc_ids. At scale the page scan
    would be the upstream system's indexed range read; here pyarrow
    filters the parquet page executor-side."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(path).metadata.num_rows
    end = n  # doc_id is 0..n-1 dense in the fixtures
    page = max(1, (n + 4) // 5)
    spark.dataSource.register(_mk_doc_stream_source())
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "pyds_stream",
    )
    shutil.rmtree(out, ignore_errors=True)
    stream = (
        spark.readStream.format("pg_doc_pages")
        .option("path", path)
        .option("page", page)
        .option("end", end)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        landed = 0
        while time.time() < deadline:
            time.sleep(0.5)
            try:
                landed = spark.read.parquet(
                    os.path.join(out, "data")
                ).count()
            except Exception:
                landed = 0
            if landed >= n:
                break
        if landed < n:
            raise RuntimeError(
                f"stream drained only {landed}/{n} docs before timeout"
            )
    finally:
        q.stop()
        q.awaitTermination(30)
    back = spark.read.parquet(os.path.join(out, "data"))
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _mk_ledger_sink():
    """Factory for the manifest-committed Python batch SINK (see
    sink_python_datasource). Closes over stdlib only."""
    import dataclasses
    import json
    import uuid

    from pyspark.sql.datasource import (
        DataSource as _DS,
        DataSourceWriter as _W,
        WriterCommitMessage as _Msg,
    )

    @dataclasses.dataclass
    class _FileMsg(_Msg):
        filename: str
        n_rows: int

    class _LedgerWriter(_W):
        def __init__(self, path: str):
            self.path = path

        def write(self, iterator):
            # Executor-side: every task writes a UNIQUELY-NAMED data
            # file (never a destination overwrite — retries can't
            # collide), reports it in its commit message.
            os.makedirs(self.path, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, name), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _FileMsg(filename=name, n_rows=n)

        def commit(self, messages):
            # Driver-side, runs ONCE after every task succeeded: the
            # manifest names exactly the committed files — the atomic
            # publish point (readers are manifest-gated, so files from
            # failed/aborted/zombie tasks are invisible).
            manifest = {
                "files": sorted(
                    (
                        {"filename": m.filename, "n_rows": m.n_rows}
                        for m in messages
                        if m is not None
                    ),
                    key=lambda f: f["filename"],
                ),
                "n_rows": sum(m.n_rows for m in messages if m),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
                json.dump(manifest, fh)

        def abort(self, messages):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    class LedgerSink(_DS):
        @classmethod
        def name(cls):
            return "pg_ledger"

        def writer(self, schema, overwrite):
            return _LedgerWriter(self.options["path"])

    return LedgerSink


@register(
    "sink_python_datasource",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_custkey < 500
    GROUP BY o_orderstatus
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM BATCH SINK in pure Python (Spark 4 ``DataSourceWriter``)
    with a REAL two-phase commit: executor tasks write uniquely-named
    data files and return commit messages; the driver-side ``commit``
    publishes a manifest naming exactly the successful tasks' files;
    readers are MANIFEST-GATED, so uncommitted/orphan files are
    invisible (tests plant one and prove it). This is the Python-API
    spelling of the committer story the repo already exercises at the
    Hadoop layer (sink_manifest_committer) — and the write-side
    completion of the connector triple: source_python_datasource
    (batch read), stream_python_datasource (stream read), this op
    (transactional write). The reference uploads exactly one object
    and hopes (main.go:46-85); a manifest commit is how a
    many-task write stays atomic on storage with no rename.

    Round-trip proof: a pruned orders slice goes through the sink,
    the manifest-gated read-back is profiled, and the DuckDB oracle
    computes the same profile from the source table."""
    import json

    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "pyds_ledger",
    )
    shutil.rmtree(out, ignore_errors=True)
    spark.dataSource.register(_mk_ledger_sink())
    orders.write.format("pg_ledger").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    committed = [
        os.path.join(out, f["filename"]) for f in manifest["files"]
    ]
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).json(committed)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
