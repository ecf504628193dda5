"""WARC (Web ARChive, ISO 28500) container ingest.

The container format of web-scale corpus distribution (CommonCrawl ships
as WARC shards): length-prefixed records of named headers + raw payload,
concatenated with blank-line separators. A training-data engine that
claims 100 TB web ingest must read it; this module implements the
record grammar from the public spec — build side (for the fixture
round-trip) and a pure-Python parser that runs DISTRIBUTED inside
mapInPandas over `binaryFile`-sourced shards, one task per shard.

Spec essentials implemented (WARC/1.1 §4): version line
``WARC/1.0``, header block of ``Name: value`` lines terminated by
CRLF CRLF, exactly ``Content-Length`` payload bytes, record terminated
by CRLF CRLF. Everything else (chunking, digests) is optional per spec
and omitted by this writer; the parser skips unknown headers, so files
from richer writers still parse.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register

WARC_SHARDS = 8
CRLF = "\r\n"


def build_record(doc_id: int, source: str, lang: str, text: str) -> bytes:
    """One WARC 'resource' record for a document (spec §4/§6.6)."""
    payload = text.encode("utf-8")
    headers = [
        "WARC/1.0",
        "WARC-Type: resource",
        f"WARC-Record-ID: <urn:doc:{doc_id}>",
        "WARC-Date: 2024-01-01T00:00:00Z",
        f"WARC-Target-URI: corpus://{source}/{doc_id}",
        f"X-Warc-Lang: {lang}",
        "Content-Type: text/plain",
        f"Content-Length: {len(payload)}",
    ]
    return (
        (CRLF.join(headers) + CRLF + CRLF).encode("utf-8")
        + payload
        + (CRLF + CRLF).encode("utf-8")
    )


def parse_shard(blob: bytes) -> list[tuple[int, str, str, int, str]]:
    """Parse one WARC shard into (doc_id, source, lang, length, text).

    Length-driven per the spec: after the header block, read exactly
    Content-Length bytes — payloads may legally contain blank lines,
    so splitting on separators would misparse conformant files."""
    out = []
    pos = 0
    n = len(blob)
    sep = (CRLF + CRLF).encode("utf-8")
    while pos < n:
        head_end = blob.find(sep, pos)
        if head_end < 0:
            break
        head = blob[pos:head_end].decode("utf-8")
        lines = head.split(CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad record header at byte {pos}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs["content-length"])
        body_start = head_end + len(sep)
        payload = blob[body_start : body_start + length]
        rid = hdrs["warc-record-id"]
        doc_id = int(rid[rid.rindex(":") + 1 : -1])
        uri = hdrs.get("warc-target-uri", "")
        source = uri.split("//")[1].split("/")[0] if "//" in uri else ""
        lang = hdrs.get("x-warc-lang", "")
        out.append((doc_id, source, lang, length, payload.decode("utf-8")))
        pos = body_start + length + len(sep)
    return out


@register(
    "source_warc_ingest",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_doc_ids,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    """,
)
def source_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC corpus round-trip — documents packed into spec-conformant
    WARC/1.0 shards, then re-ingested DISTRIBUTED: `binaryFile` source
    (one row per shard, task-parallel) → mapInPandas pure-Python record
    parser (length-driven per ISO 28500 — payloads with blank lines
    parse correctly) → the relational profile, pinned by the oracle to
    the original documents table, so a record lost, truncated, or
    double-read at any shard boundary hash-fails. The sibling test
    round-trips full text per record and rejects corrupt headers.

    This is the CommonCrawl ingestion shape at 100 TB: shards are the
    unit of parallelism (a WARC file can't be split mid-record without
    an index, exactly like the reference's per-object restore,
    main.go:233-237), so parallelism = shard count — which the crawler
    already sizes to ~1 GB each; the parser is per-shard sequential,
    Arrow-batched out.

    Shard build: per-record bytes are assembled as Spark string
    expressions (JVM-side, one pass) and group-concatenated per shard;
    only the ≤SHARDS shard blobs ever reach the driver for the binary
    write (the fixture-side harness, not the measured read path)."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"warc-{uuid.uuid4().hex[:8]}",
    )
    os.makedirs(base, exist_ok=True)

    # Build shard blobs: record strings JVM-side, concatenated in
    # doc_id order per shard (deterministic layout).
    rec = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: resource" + CRLF),
        F.format_string("WARC-Record-ID: <urn:doc:%d>" + CRLF, "doc_id"),
        F.lit("WARC-Date: 2024-01-01T00:00:00Z" + CRLF),
        F.format_string(
            "WARC-Target-URI: corpus://%s/%d" + CRLF, "source", "doc_id"
        ),
        F.format_string("X-Warc-Lang: %s" + CRLF, "lang"),
        F.lit("Content-Type: text/plain" + CRLF),
        F.format_string("Content-Length: %d" + CRLF + CRLF, "bytelen"),
        F.col("text"),
        F.lit(CRLF + CRLF),
    )
    shards = (
        docs.withColumn("bytelen", F.octet_length("text"))
        .withColumn("shard", F.col("doc_id") % WARC_SHARDS)
        .withColumn("rec", rec)
        .groupBy("shard")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "rec"))
                    ),
                    lambda x: x["rec"],
                ),
                "",
            ).alias("blob")
        )
        # bounded: one row per WARC shard (WARC_SHARDS)
        .collect()
    )
    for row in shards:
        with open(
            os.path.join(base, f"shard-{row.shard:05d}.warc"), "wb"
        ) as fh:
            fh.write(row.blob.encode("utf-8"))

    # Distributed ingest: one binaryFile row per shard → record parse.
    def parse_batches(pdfs):
        for pdf in pdfs:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_shard(bytes(blob)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "source", "lang", "length", "text"],
            )

    parsed = (
        spark.read.format("binaryFile")
        .load(base + "/*.warc")
        .select("content")
        .mapInPandas(
            parse_batches,
            "doc_id long, source string, lang string, length long,"
            " text string",
        )
    )
    result = parsed.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.countDistinct("doc_id").cast("bigint").alias("n_doc_ids"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    # bounded: 1-row corpus summary
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


FW_WIDTHS = {"event_id": 12, "user_id": 8, "event_type": 10, "value": 12}


@register(
    "source_fixed_width",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text ingestion — the mainframe/legacy-feed format
    (COBOL copybook extracts, bank settlement files) every archival
    engine eventually receives: no delimiters, each field a fixed byte
    span. Events are serialized to a right-padded fixed-width layout
    (12/8/10/12 chars), written as plain text, and re-ingested by a
    pure-substring parser — `spark.read.text` + JVM `substring`/`trim`
    per field, so the parse stays inside whole-stage codegen with NO
    Python and NO regex; the oracle pins the round-tripped profile to
    the source table, catching any column-boundary off-by-one.

    Value fidelity: `value` is written as its exact DECIMAL(18,2)
    string (left-padded to the field width) and re-read through
    DECIMAL(18,2), so the round trip is exact (G2), never a float
    re-parse drift.

    At 100 TB: text lines split by byte ranges scale like any
    line-oriented scan (splittable at newlines); schema lives in the
    width map (the copybook), and a malformed line surfaces as a cast
    NULL caught by the null-audit, not a crash."""
    events = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"fixedwidth-{uuid.uuid4().hex[:8]}",
    )
    line = F.concat(
        F.format_string("%12d", "event_id"),
        F.format_string("%8d", "user_id"),
        F.rpad(F.col("event_type"), 10, " "),
        F.lpad(
            F.col("value").cast("decimal(18,2)").cast("string"), 12, " "
        ),
    )
    events.select(line.alias("value")).write.mode("overwrite").text(base)

    pos = 1
    fields = []
    for name, width in FW_WIDTHS.items():
        fields.append((name, pos, width))
        pos += width
    raw = spark.read.text(base)
    parsed = raw.select(
        *[
            F.trim(F.substring("value", p, w)).alias(n)
            for n, p, w in fields
        ]
    ).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_type"),
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    result = (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value").cast("double").alias("sum_value"),
            F.max("event_id").cast("bigint").alias("max_event_id"),
        )
        .orderBy("event_type")
    )
    # bounded: one row per event_type (<= 5)
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)
