"""Scan / source / sink operators.

Reference parity: A1 JDBC scan (main.go:88-121), A2 projection
(main.go:89), A10-A12 partitioned Snappy Parquet sink (main.go:46-85,
220-241). The reference keys the whole batch on the global max timestamp
(main.go:194-200) — a defect (SURVEY.md §4.4 D2) we fix with per-row
``partitionBy``: Spark's dynamic partition insert puts every row in its
true year=/month= directory, which is what makes downstream partition
pruning (reference README.md:92) actually correct.

Scale notes: projections and range predicates here reach the Parquet
reader (ReadSchema / PushedFilters), so a 100 TB scan reads only the
row-groups and columns the query touches.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import fan_out, load
from pg_archiver_spark.registry import register


@register(
    "scan_parquet_full",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_parquet_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan + projection (reference A1/A2, main.go:88-97)."""
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "scan_filter_prune",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY order_month
    """,
)
def scan_filter_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-restricted scan, monthly profile — models the pruned
    partition read the reference README documents (README.md:92).

    The two timestamp bounds push down to Parquet row-group min/max
    stats; on a hive-partitioned archive the same predicate prunes
    whole directories.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "sample_deterministic",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) = '0'
    GROUP BY l_returnflag
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample via an md5-prefix predicate on the
    key — unlike TABLESAMPLE/rand(), identical across engines, runs,
    and partitionings (the reproducible-experiment sampling pattern for
    training-data pipelines)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1) == "0"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "sink_csv_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           MAX(epoch_ms(ts)) AS max_epoch_ms
    FROM events
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV output format ('more output formats' — reference future work,
    README.md:126): header + explicit timestamp format out, schema-pinned
    read back, count verified against the source.

    The oracle profiles the SOURCE table — matching proves the
    write+read round-trip lost nothing."""
    events = load(spark, sf_dir, "events").select(
        "event_id", F.expr("ts_ns DIV 1000000").alias("epoch_ms"), "user_id", "value"
    )
    out = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "csv_events")
    events.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema("event_id long, epoch_ms long, user_id long, value double").option(
        "header", "true"
    ).csv(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("epoch_ms").alias("max_epoch_ms"),
    )


@register(
    "source_csv_permissive",
    oracle="""
    SELECT COUNT(*) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record-tolerant CSV ingestion: the events table is
    written to CSV, three deliberately corrupt lines are injected into
    the directory, and the read-back uses PERMISSIVE mode with a
    corrupt-record column — the ingestion contract a real lake needs
    (a 100 TB drop of vendor CSVs ALWAYS contains bad lines, and
    failing the job or silently dropping them are both wrong; quarantine
    + account is the production pattern). The oracle pins the exact
    partition: every source row parses clean, exactly the 3 injected
    lines are quarantined.

    Plan shape: schema-pinned read (no inference pass), per-row parse
    is data-parallel, the corrupt-record audit is one map-side-combined
    count. The one-pass cache below is required by Spark's
    corrupt-record rule (queries on only the corrupt column over raw
    files are disallowed) and bounded: at scale you'd land the parsed
    frame to bronze storage in the same pass anyway."""
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").alias("value")
    )
    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "csv_permissive"
    )
    events.write.mode("overwrite").csv(base)
    with open(os.path.join(base, "part-99999-injected-bad.csv"), "w") as fh:
        fh.write("notanint,alsobad,NaNope\n" "12.5.7,x,y\n" ",,,too,many,cols\n")
    back = spark.read.schema(
        "event_id long, user_id long, value double, _corrupt_record string"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").option(
        "mode", "PERMISSIVE"
    ).csv(base)
    back = back.cache()
    try:
        # bounded: 1-row good/corrupt count summary
        rows = back.agg(
            F.count_if(F.col("_corrupt_record").isNull()).alias("n_good"),
            F.count_if(F.col("_corrupt_record").isNotNull()).alias("n_corrupt"),
            F.count_distinct(
                F.when(F.col("_corrupt_record").isNull(), F.col("user_id"))
            ).alias("n_users"),
        ).collect()
    finally:
        # Release the one-pass cache immediately — returning the lazy
        # aggregate would pin the cached frame in executor storage for
        # the rest of the process (harness runs hundreds of ops).
        back.unpersist()
    return spark.createDataFrame(rows, "n_good long, n_corrupt long, n_users long")


@register(
    "sink_json_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    """,
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines output format round-trip, schema-pinned read back;
    oracle = the same profile on the source table (round-trip fidelity).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "json_docs")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(out)
    return (
        back.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


@register(
    "sink_manifest_committer",
    # Round-8 conversion (rows-only → sql-checked): the committer class
    # name, success flag, and single job commit are protocol-pinned
    # constants, and the round-tripped row count is COUNT(events); only
    # the raw task-commit count is environment-shaped (it equals the
    # write parallelism, which the driver's session may size
    # differently), so it is reported as the >=1 invariant instead.
    oracle="""
    SELECT 'ManifestCommitter' AS committer,
           TRUE AS success,
           CAST(1 AS BIGINT) AS n_job_commits,
           TRUE AS tasks_committed,
           COUNT(*) AS n_rows
    FROM events
    """,
)
def sink_manifest_committer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cloud-safe commit protocol, exercised LIVE — reference A10's
    S3 upload durability concern (main.go:46-85) at Spark scale.

    The classic FileOutputCommitter assumes atomic directory rename;
    object stores don't have one, so cloud writes need a manifest- or
    multipart-based committer. This harness ships neither hadoop-aws
    nor spark-hadoop-cloud (`org.apache.hadoop.fs.s3a.S3AFileSystem`,
    `org.apache.spark.internal.io.cloud.PathOutputCommitProtocol`, and
    `...BindingParquetOutputCommitter` all fail Class.forName — the
    S3A magic committer is unreachable, see session.cloud_committer_confs),
    but hadoop-client-runtime DOES bundle the rename-less
    **ManifestCommitter** (the ABFS/GCS cloud committer, MAPREDUCE-7341).
    Hadoop's FileOutputFormat resolves its committer through
    PathOutputCommitterFactory, so pinning the per-scheme factory conf
    routes a REAL Spark write through it — task manifests, job-level
    manifest merge, and a `_SUCCESS` that is a SuccessData JSON naming
    the committer (vs the classic committer's empty marker).

    Output: committer class read back from `_SUCCESS`, success flag,
    the committer's own job-commit IOStatistics counter, a task-commit
    >=1 invariant, and the rows round-tripped. At 100 TB the same conf
    line is exactly how a production job on ABFS/GCS commits."""
    import json as _json

    out = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "manifest_events"
    )
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    factory_key = "mapreduce.outputcommitter.factory.scheme.file"
    hc.set(
        factory_key,
        "org.apache.hadoop.mapreduce.lib.output.committer.manifest."
        "ManifestCommitterFactory",
    )
    try:
        events.write.mode("overwrite").json(out)
    finally:
        hc.unset(factory_key)
    with open(os.path.join(out, "_SUCCESS")) as fh:
        success = _json.load(fh)
    committer = success.get("committer", "")
    if not committer.endswith(".ManifestCommitter"):
        raise RuntimeError(f"manifest committer did not run: {success}")
    counters = success.get("iostatistics", {}).get("counters", {})
    n_rows_back = (
        spark.read.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .json(out)
        .count()
    )
    return spark.createDataFrame(
        [
            (
                committer.rsplit(".", 1)[-1],
                bool(success.get("success")),
                int(counters.get("committer_commit_job", 0)),
                int(counters.get("task_stage_commit", 0)) >= 1,
                n_rows_back,
            )
        ],
        "committer string, success boolean, n_job_commits long, "
        "tasks_committed boolean, n_rows long",
    )


@register(
    "sink_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC output format round-trip ('more output formats', README.md:126
    future work) — columnar like Parquet, with the same pushdown/pruning
    behavior under Catalyst. Oracle = source-table profile."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    out = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "orc_orders")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@register(
    "sink_parquet_sorted",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(epoch_ms(ts)) AS min_ts_ms,
           MAX(epoch_ms(ts)) AS max_ts_ms
    FROM events
    """,
)
def sink_parquet_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned, sorted Parquet ingest: repartitionByRange on
    the time key + sortWithinPartitions before the write gives every
    output file a tight, non-overlapping min/max range — so row-group
    zone maps prune time-range queries to a handful of files. This is
    the ingest-side half of the archive's query performance at 100 TB.
    Returns the read-back per-file-range profile."""
    events = load(spark, sf_dir, "events").select("event_id", "ts_ns", "user_id", "value")
    out = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "sorted_events")
    (
        events.repartitionByRange(8, "ts_ns")
        .sortWithinPartitions("ts_ns")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    # A cutoff filter on the sorted layout touches only the files whose
    # range overlaps — verify the data survived and profile it. The
    # range profile is reported in ms: DuckDB truncates the ns parquet
    # timestamp to µs on read, so ns-precision endpoints can't oracle.
    return back.agg(
        F.count("*").alias("n_rows"),
        F.min(F.expr("ts_ns DIV 1000000")).alias("min_ts_ms"),
        F.max(F.expr("ts_ns DIV 1000000")).alias("max_ts_ms"),
    )


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT year(ts) AS year, month(ts) AS month, COUNT(*) AS n_rows
    FROM events
    GROUP BY year, month
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archive sink (reference A10/A11/A12, main.go:46-85,220-223),
    fixed for per-row partitioning (D2) and unique task files (D4).

    Writes events partitioned by (year, month) derived from each row's
    own timestamp, Snappy-compressed, then reads the dataset back and
    returns the per-partition profile. At 100 TB this is the same code:
    the committer handles task-file uniqueness and S3 upload (s3a://).
    """
    events = load(spark, sf_dir, "events")
    out = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "archive_events")
    (
        events.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .write.mode("overwrite")
        .partitionBy("year", "month")
        .option("compression", "snappy")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy("year", "month")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("year", "month")
    )


@register(
    "maintenance_compact",
    # Round-8 conversion (rows-only → sql-checked): every output field
    # is deterministic — n_files_before is pinned by repartition(64)
    # (Spark writes one part file per shuffle partition, empty or not),
    # files_reduced/rows_match are the compaction invariants, and the
    # row counts are plain COUNT(*). Only the post-compaction file
    # COUNT (coalesce merges the small-file read groups, whose number
    # depends on maxPartitionBytes/openCostInBytes at each SF) is
    # environment-shaped, so it is reported as the boolean invariant
    # rather than a raw count.
    oracle="""
    SELECT CAST(64 AS BIGINT) AS n_files_before,
           TRUE AS files_reduced,
           COUNT(*) AS n_rows_before,
           COUNT(*) AS n_rows_after,
           TRUE AS rows_match
    FROM events
    """,
)
def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the archive-maintenance job every
    long-running ingest needs: streaming/micro-batch writers leave
    thousands of KB-scale files per partition, and at 100 TB the
    resulting task-scheduling and open() overhead dominates scans.
    Rewrites a deliberately fragmented copy of events (64 files) into
    a handful via a single coalesced pass, preserving every row.
    Returns (n_files_before, files_reduced, n_rows_before,
    n_rows_after, rows_match)."""
    frag = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "frag_events")
    compact = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "compact_events"
    )
    events = load(spark, sf_dir, "events").select(
        "event_id", "ts_ns", "user_id", "event_type", "value"
    )
    events.repartition(64).write.mode("overwrite").parquet(frag)

    def n_parquet_files(path: str) -> int:
        return sum(
            1
            for _, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    before = spark.read.parquet(frag)
    before.coalesce(4).write.mode("overwrite").parquet(compact)
    after = spark.read.parquet(compact)
    n_before, n_after = before.count(), after.count()
    f_before, f_after = n_parquet_files(frag), n_parquet_files(compact)
    return spark.createDataFrame(
        [
            (
                f_before,
                f_after < f_before,
                n_before,
                n_after,
                n_before == n_after,
            )
        ],
        "n_files_before long, files_reduced boolean, n_rows_before long, "
        "n_rows_after long, rows_match boolean",
    )


@register(
    "source_schema_evolution",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE event_id % 2 = 0) AS n_v1_rows,
           CAST(COALESCE(SUM(CASE WHEN event_id % 2 = 1
                                  THEN CAST(floor(value*100) AS BIGINT) END), 0)
                AS BIGINT) AS v2_value_cents
    FROM events
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read ('more column types / custom schemas' —
    reference future work, README.md:125,128): a long-lived archive
    accumulates files written under different schema versions. Half the
    events are written with the v1 schema (event_id, user_id), half
    with v2 (adds value); `mergeSchema` unifies them at scan time and
    backfills the missing column with NULL — no rewrite of the old
    files, which at 100 TB is the difference between a metadata change
    and a full-corpus compaction.

    SQL-checked: total rows, v1 rows (those whose value is NULL after
    the merge), and the v2 value mass (integer cents) must match the
    source-table profile."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "evolved_events"
    )
    events.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "v1"))
    events.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
        os.path.join(out, "v2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "v1"), os.path.join(out, "v2")
    )
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("value").isNull()).alias("n_v1_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNotNull(),
                         F.floor(F.col("value") * 100))),
            F.lit(0),
        ).cast("bigint").alias("v2_value_cents"),
    )

@register(
    "sample_stratified",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) <
          CASE l_returnflag
               WHEN 'A' THEN '80'
               WHEN 'N' THEN '40'
               ELSE '20' END
    GROUP BY l_returnflag
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: a DIFFERENT keep-rate per
    stratum (A 50%, N 25%, R 12.5%) from one md5-prefix threshold per
    class — the class-rebalancing sampler training-data pipelines need
    (downsample the over-represented class, keep the rare one). Like
    sample_deterministic it is a pure per-row predicate: reproducible
    across engines, runs, and partitionings, no sampleBy()/rand()
    nondeterminism, and it pipelines into the scan with zero extra
    shuffles."""
    li = load(spark, sf_dir, "lineitem")
    threshold = (
        F.when(F.col("l_returnflag") == "A", "80")
        .when(F.col("l_returnflag") == "N", "40")
        .otherwise("20")
    )
    return (
        li.filter(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2)
            < threshold
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )

@register(
    "scan_dpp_partition_pruned",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m')
          IN ('1997-01', '1997-03', '1997-05')
    GROUP BY order_month
    """,
)
def scan_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    hive-partitioned by month, the months to read come from a FILTERED
    DIM TABLE known only at run time, and Spark turns the dim filter
    into a runtime subquery that prunes fact partitions BEFORE the scan
    (plan shows `dynamicpruning#N` on the fact's PartitionFilters).
    At 100 TB this is the difference between scanning 3 months and
    scanning 7 years — static predicates can't do it when the month
    list comes from data.

    Two Catalyst subtleties make the demo honest: the dim filter is an
    int `flag = 1` comparison because (a) PartitionPruning only fires
    on a "likely selective" dim predicate and a bare boolean column is
    not one, and (b) the predicate must not be on the join key itself,
    or InferFiltersFromConstraints turns it into a STATIC partition
    filter and there is nothing dynamic left to prune."""
    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "dpp"
    )
    orders = load(spark, sf_dir, "orders")
    fact_path = os.path.join(base, "orders_by_month")
    (
        orders.withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        .write.mode("overwrite")
        .partitionBy("order_month")
        .parquet(fact_path)
    )
    dim_path = os.path.join(base, "month_dim")
    (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("m")
        )
        .distinct()
        .withColumn(
            "flag",
            F.col("m")
            .isin("1997-01", "1997-03", "1997-05")
            .cast("int"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = (
        spark.read.parquet(dim_path)
        .filter(F.col("flag") == 1)
        .select("m")
    )
    return (
        fact.join(F.broadcast(dim), fact.order_month == dim.m)
        .groupBy("order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "maintenance_incremental_agg",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM orders
    GROUP BY order_month
    """,
)
def maintenance_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: yesterday's rollup
    state (partial SUM/COUNT per month over orders before a cutoff) is
    merged with a delta batch's partials instead of recomputing over
    the full history — the incremental-view-maintenance shape that
    keeps a 100 TB continuous aggregate affordable. The merge works
    because SUM/COUNT are commutative monoids: re-aggregating the
    unioned partials is exact, and algebraic aggregates (AVG) are
    derived from the merged sums at the end, never averaged across
    partials. At scale the base partial is a stored table and only the
    delta touches raw data; sums stay exact DECIMAL until one final
    DOUBLE cast (G13). Oracle proves merged == full recompute."""
    cutoff = F.lit("1997-01-01").cast("timestamp")
    orders = load(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        ).agg(
            F.count("*").alias("p_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("p_sum"),
        )

    base_state = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base_state.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.sum("p_n").alias("n_orders"),
            F.sum("p_sum").cast("double").alias("sum_price"),
        )
    )
    return merged.select(
        "order_month",
        "n_orders",
        "sum_price",
        (F.col("sum_price") / F.col("n_orders")).alias("avg_price"),
    )


@register(
    "maintenance_materialized_rollup",
    oracle="""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, day
    """,
)
def maintenance_materialized_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared materialized rollup with STALENESS BOUNDS — the
    lakehouse sibling of `maintenance_snapshot_time_travel`, and the
    generalization of `maintenance_incremental_agg` from a one-shot
    partial merge to a maintained STORED view (reference README.md:127
    monitoring rollups, kept continuously at archive scale).

    The rollup (per event_type × day: COUNT + exact DECIMAL SUM) is a
    real parquet state table that carries its own refresh watermark
    (max covered ts_ns as a `p_wm` column — no side metadata to lose).
    The source arrives as three time-ordered batches (tertile cutoffs
    on ts_ns, exact integer arithmetic); each refresh
      1. measures STALENESS = newest source ts beyond the stored
         watermark — must be > 0 before a refresh (there is new data)
         and exactly 0 after it (the view is fresh through its
         watermark) — both bounds are asserted, not assumed;
      2. aggregates ONLY the delta `(wm, cutoff]` — partials merge
         because COUNT/SUM are commutative monoids, and the ≤wm / >wm
         boundary split is exact even with duplicate timestamps;
      3. writes the next state version (v0→v1→v2), leaving prior
         versions readable (time travel across refreshes).
    After the final refresh the op PROVES incremental == full
    recompute with an exact full-outer-join diff (raises on any
    mismatch), then returns the rollup — which the DuckDB oracle
    recomputes from scratch. At 100 TB only the delta ever touches
    raw data; state size is bounded by the group count, not history."""
    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "mat_rollup"
    )
    events = load(spark, sf_dir, "events").select(
        "ts", "ts_ns", "event_type", "value"
    )
    lo, hi = events.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    cutoffs = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3, hi]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count("*").alias("p_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("p_sum"),
            F.max("ts_ns").alias("p_wm"),
        )

    def state_path(version: int) -> str:
        return os.path.join(base, f"state_v{version}")

    # v0: initial full refresh over the first batch only.
    partial(events.filter(F.col("ts_ns") <= cutoffs[0])).write.mode(
        "overwrite"
    ).parquet(state_path(0))

    def refresh(version: int, cutoff: int) -> None:
        state = spark.read.parquet(state_path(version))
        wm = state.agg(F.max("p_wm")).first()[0]
        visible = events.filter(F.col("ts_ns") <= cutoff)
        newest = visible.agg(F.max("ts_ns")).first()[0]
        if not newest > wm:  # staleness bound: refresh only when stale
            raise RuntimeError(
                f"no staleness before refresh v{version + 1}: "
                f"newest={newest} wm={wm}"
            )
        delta = partial(
            events.filter((F.col("ts_ns") > wm) & (F.col("ts_ns") <= cutoff))
        )
        merged = (
            state.unionByName(delta)
            .groupBy("event_type", "day")
            .agg(
                F.sum("p_n").alias("p_n"),
                F.sum("p_sum").alias("p_sum"),
                F.max("p_wm").alias("p_wm"),
            )
        )
        merged.write.mode("overwrite").parquet(state_path(version + 1))
        new_wm = (
            spark.read.parquet(state_path(version + 1))
            .agg(F.max("p_wm"))
            .first()[0]
        )
        if new_wm != newest:  # freshness bound: staleness == 0 after
            raise RuntimeError(
                f"stale after refresh v{version + 1}: wm={new_wm} "
                f"newest={newest}"
            )

    refresh(0, cutoffs[1])
    refresh(1, cutoffs[2])

    final = spark.read.parquet(state_path(2))
    full = partial(events)
    mismatches = (
        final.select("event_type", "day", "p_n", "p_sum")
        .withColumnsRenamed({"p_n": "i_n", "p_sum": "i_sum"})
        .join(
            full.select("event_type", "day", "p_n", "p_sum"),
            ["event_type", "day"],
            "full",
        )
        .filter(
            F.col("i_n").isNull()
            | F.col("p_n").isNull()
            | (F.col("i_n") != F.col("p_n"))
            | (F.col("i_sum") != F.col("p_sum"))
        )
        .count()
    )
    if mismatches:
        raise RuntimeError(
            f"incremental rollup diverged from full recompute on "
            f"{mismatches} group(s)"
        )
    return final.select(
        "event_type",
        "day",
        F.col("p_n").alias("n_events"),
        F.col("p_sum").cast("double").alias("sum_value"),
    )


ZORDER_BITS = 8
ZORDER_FILES = 16


def _zorder_dir() -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "zorder",
        "orders_z",
    )


def _interleave_bits(x, y):
    """64-bit Morton code of two ZORDER_BITS-wide int columns: x takes
    the odd (higher) bit positions, y the even — a pure JVM expression
    chain (shift/and/add), unrolled at plan-build time."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = (
            z
            + F.shiftleft(xbit, 2 * i + 1).cast("long")
            + F.shiftleft(ybit, 2 * i).cast("long")
        )
    return z


@register(
    "layout_zorder_scan",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_custkey BETWEEN 20 AND 100
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY order_month
    """,
)
def layout_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustered layout for MULTI-dimension
    pruning: single-key sorting gives tight file/row-group min-max
    stats on ONE column only; interleaving the bits of two bucketed
    dimensions (customer, month) and range-partitioning + sorting on
    the Morton code bounds BOTH dimensions per file — so a
    2-predicate query (custkey band × date range) skips most files on
    either predicate alone. This is the layout trick behind
    lakehouse OPTIMIZE ZORDER, built from public Spark primitives:
    the code is a pure shift/and expression, the layout is
    `repartitionByRange(z).sortWithinPartitions(z)`, and pruning is
    ordinary Parquet min-max skipping on the ORIGINAL columns (tests
    read the footers and pin per-file span ratios on both dims vs a
    single-key-sorted control). Query results are layout-independent
    — the oracle runs on the unclustered table."""
    orders = load(spark, sf_dir, "orders")
    # One tiny scalar agg scales BOTH dims' bucket maps to the data's
    # actual ranges — a dim that occupies a fraction of bucket space
    # would leave its high interleave bits constant and degrade the
    # curve to a single-key sort.
    b = orders.agg(
        F.max("o_custkey").alias("ck"),
        F.min("o_orderdate").alias("d0"),
        F.max("o_orderdate").alias("d1"),
    ).first()
    month_idx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    m0 = b.d0.year * 12 + b.d0.month
    n_months = b.d1.year * 12 + b.d1.month - m0 + 1
    n_buckets = 1 << ZORDER_BITS
    xb = F.floor(F.col("o_custkey") * n_buckets / (b.ck + 1)).cast("int")
    yb = F.floor((month_idx - m0) * n_buckets / n_months).cast("int")
    path = _zorder_dir()
    (
        orders.withColumn("z", _interleave_bits(xb, yb))
        .repartitionByRange(ZORDER_FILES, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )
    clustered = spark.read.parquet(path)
    return (
        clustered.filter(
            F.col("o_custkey").between(20, 100)
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "scan_metadata_columns",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns (`_metadata.file_name`): per-file
    row accounting straight from the scan, no extra pass — the lineage
    primitive behind ingest audits ("which file contributed which
    rows") and incremental re-processing (group by source file, compare
    against a processed-file ledger). The reference tags lineage with a
    constant (main.go:25,114); `_metadata` generalizes it to real
    per-file provenance at any fan-in. At sf fixtures each table is one
    file, so the oracle pins the known name; on a 100 TB multi-file
    dataset the same query yields one row per file with zero shuffle
    beyond the 1-row-per-file aggregate."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            F.col("_metadata.file_name").alias("file_name"),
            "user_id",
        )
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# Hive-layout staging for scan_partition_pruned_static: written ONCE per
# (process, sf_dir) — not per invocation — under a run-unique (uuid) root
# so a recycled pid after restart can never silently reuse a stale
# directory; the whole root is removed at interpreter exit.
_HIVE_LAYOUT_ROOT = os.path.join(
    tempfile.gettempdir(), f"pg_archiver_spark-hive-{uuid.uuid4().hex[:12]}"
)
_HIVE_LAYOUT_CACHE: dict[str, str] = {}
atexit.register(shutil.rmtree, _HIVE_LAYOUT_ROOT, ignore_errors=True)


def _hive_events_layout(spark: SparkSession, sf_dir: str) -> str:
    """Stage events hive-partitioned by ``day=DD/``, memoized per sf_dir."""
    path = _HIVE_LAYOUT_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(
            _HIVE_LAYOUT_ROOT, f"daily_events_{len(_HIVE_LAYOUT_CACHE)}"
        )
        (
            load(spark, sf_dir, "events")
            .withColumn("day", F.dayofmonth("ts"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
        _HIVE_LAYOUT_CACHE[sf_dir] = path
    return path


@register(
    "scan_partition_pruned_static",
    oracle="""
    SELECT CAST(day(ts) AS BIGINT) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE day(ts) BETWEEN 5 AND 9
    GROUP BY day
    """,
)
def scan_partition_pruned_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC partition pruning on the archive's own hive layout — the
    README's downstream promise made checkable (README.md:92: query
    `year=2024/month=11/*.parquet` and touch only that slice). The
    events are laid out `day=DD/` by each row's own timestamp (D2
    fixed), and a literal day-range predicate must be satisfied from
    DIRECTORY NAMES alone: the plan shows it under `PartitionFilters`
    (tests assert this), so 25 of 30 partitions are never opened — at
    100 TB that is the difference between scanning a day and scanning
    three years. Complements `scan_dpp_partition_pruned`, where the
    pruning value arrives at RUNTIME from a joined dim."""
    out = _hive_events_layout(spark, sf_dir)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("day").between(5, 9))
        .groupBy(F.col("day").cast("long").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "composed_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def composed_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical scan-bound aggregate: revenue
    increase if small-quantity discounted lines had shipped full-price.
    No join, no group key: the entire query is predicate evaluation +
    one global sum, so it measures pure scan+filter throughput.

    100 TB strategy: all three predicates reach the Parquet reader
    (shipdate and quantity as min/max row-group pruning, discount as a
    page-level filter), the projection is 3 columns out of 11
    (ReadSchema pruning), and the aggregate is a partial/final pair
    whose shuffle carries one row per task. This is the query shape
    where columnar pruning matters most — reading only ~27% of columns
    and ~1/5 of row groups at the 7-year fixture span. Decimal-exact
    product, one final DOUBLE cast (G2/G13)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "maintenance_retention_drop_partitions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           COUNT(*) AS n_orders
    FROM orders
    WHERE year(o_orderdate) >= 1998
    GROUP BY year
    ORDER BY year
    """,
)
def maintenance_retention_drop_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """File-level retention: drop whole hive partitions older than the
    cutoff — the storage-layer form of the reference's delete-behind
    (main.go:131-145 deletes archived rows from Postgres; a partitioned
    lake applies the same policy by REMOVING partition directories, an
    O(partitions) metadata operation instead of an O(rows) delete).

    Writes orders partitioned by order year, drops every year < 1998
    at the filesystem level, then proves via read-back that partition
    discovery sees exactly the surviving years — the oracle is the
    retention predicate applied relationally to the source. At 100 TB
    dropping a partition directory is the ONLY sane retention
    mechanism: no scan, no rewrite, no tombstones; the s3a analogue is
    a prefix delete."""
    orders = load(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"retention_orders-{uuid.uuid4().hex[:8]}",
    )
    (
        orders.withColumn("year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("year")
        .parquet(base)
    )
    for entry in os.listdir(base):
        if entry.startswith("year=") and int(entry.split("=", 1)[1]) < 1998:
            shutil.rmtree(os.path.join(base, entry))
    back = spark.read.parquet(base)
    result = (
        back.groupBy(F.col("year").cast("long").alias("year"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("year")
    )
    # Materialize before cleanup: the plan lazily re-reads `base`.
    # bounded: one row per partition year (<= 8)
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "source_jsonl_schema_infer",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           'event_id:bigint,user_id:bigint,value:double' AS schema_sig
    FROM events
    """,
)
def source_jsonl_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema INFERENCE on JSON-lines ingest — the reference names
    'custom table schemas support' as unimplemented future work
    (README.md:128); its Go struct is the only schema it has. Here the
    engine derives the schema from the data: events are written as
    JSON-lines, read back with NO schema, and the op's output pins the
    inferred (name:type) signature alongside a row/user profile — the
    oracle hard-codes the signature Spark must infer (long → bigint,
    fractional → double), so a silent inference regression
    hash-fails.

    Plan shape: inference costs one extra sampling pass over the files
    (at 100 TB you bound it with samplingRatio or land the inferred
    schema into a catalog after first contact — both documented
    options); the profile agg is map-side combined. The JSON round-trip
    itself is the sink_json_roundtrip contract; this op is its
    schema-on-read sibling."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "jsonl_infer"
    )
    events.write.mode("overwrite").json(out)
    back = spark.read.json(out)  # no schema: inference pass
    sig = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in back.schema)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    ).select("n_rows", "n_users", F.lit(sig).alias("schema_sig"))


@register(
    "maintenance_dataset_diff",
    oracle="""
    SELECT
        CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'e'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'a'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      NOT IN ('a', 'f') THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unchanged
    FROM documents
    """,
)
def maintenance_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: classify every document across two corpus
    versions as added / removed / changed / unchanged — the audit any
    versioned data lake runs between releases (and the input to an
    incremental re-training decision: re-embed only `changed ∪ added`).
    Version B is derived deterministically from version A (md5 band
    'f' deleted, band 'a' text-edited, band 'e' cloned under new ids),
    and the DIFF itself is the real mechanism: a full-outer join on
    doc_id comparing content fingerprints, classified with null-side
    logic. The oracle states the expected class counts independently
    (directly from the bands), so a broken join/classification
    hash-fails.

    100 TB strategy: one hash-partitioned full-outer join on the key —
    the md5 content fingerprints (16 bytes) are compared instead of
    full text payloads, so the shuffle carries fingerprints + keys;
    class counts aggregate map-side to 1 row per task. No driver
    state, no collect."""
    docs = load(spark, sf_dir, "documents")
    band = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    a = docs.select(
        "doc_id", F.md5("text").alias("a_fp")
    )
    b_kept = docs.filter(band != "f").select(
        "doc_id",
        F.md5(
            F.when(band == "a", F.concat(F.col("text"), F.lit(" vnext")))
            .otherwise(F.col("text"))
        ).alias("b_fp"),
    )
    # Added-doc ids live in a namespace DISJOINT from any real doc_id:
    # fixtures use non-negative ids (asserted in tests), so -id-1 can
    # never collide with a b_kept key no matter how large the corpus
    # grows (a fixed positive offset could).
    b_added = docs.filter(band == "e").select(
        (-F.col("doc_id") - F.lit(1)).alias("doc_id"),
        F.md5("text").alias("b_fp"),
    )
    b = b_kept.unionByName(b_added)
    diff = a.join(b, "doc_id", "full_outer").select(
        F.when(F.col("a_fp").isNull(), "added")
        .when(F.col("b_fp").isNull(), "removed")
        .when(F.col("a_fp") != F.col("b_fp"), "changed")
        .otherwise("unchanged")
        .alias("status")
    )
    return diff.agg(
        F.count_if(F.col("status") == "added").alias("n_added"),
        F.count_if(F.col("status") == "removed").alias("n_removed"),
        F.count_if(F.col("status") == "changed").alias("n_changed"),
        F.count_if(F.col("status") == "unchanged").alias("n_unchanged"),
    )


@register(
    "sink_avro_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sink_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro output-format round-trip — the last 'additional output
    formats' item (reference README.md:126) after CSV/JSON/ORC/Parquet.
    Guarded ladder, like source_jdbc's:

    1. If the external ``spark-avro`` connector is on the classpath,
       use the real ``format("avro")`` write + read (the production
       path on any cluster that ships the connector).
    2. Otherwise (this sandbox: pyspark has avro-1.12.1.jar but NOT
       spark-avro) fall back to a genuine spec-level codec, not a stub:
       each partition writes one Avro OBJECT CONTAINER file via the
       pure-Python encoder in sources/avro_codec.py inside mapInPandas
       (Arrow batches, no driver collect, one file per partition —
       the distributed sink shape), and the read-back decodes those
       files from a ``binaryFile`` scan with the same codec. Spec
       compliance is enforced, not claimed: the files are ALSO read
       through the JVM's org.apache.avro DataFileStream and the
       record count must match (RuntimeError otherwise).

    The oracle profiles the SOURCE table, so any row lost or value
    mangled by either path hash-fails. At 100 TB the fallback writes
    one container per task to shared storage — the same layout
    spark-avro produces — and the binaryFile+decode read is
    partition-parallel; only the cross-check is driver-side, bounded
    to per-file record COUNTS (never data)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "avro_orders"
    )
    try:
        orders.write.mode("overwrite").format("avro").save(out)
        back = spark.read.format("avro").load(out)
    except Exception as exc:  # connector absent: codec fallback
        if "avro" not in str(exc).lower():
            raise
        from pg_archiver_spark.sources import avro_codec

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        fields = [
            ("o_orderkey", "long"),
            ("o_orderstatus", "string"),
            ("o_totalprice", "double"),
        ]
        schema_json = avro_codec.make_schema("orders_row", fields)

        def write_parts(pdfs):
            import pandas as pd
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            rows = []
            for pdf in pdfs:
                rows.extend(pdf.itertuples(index=False, name=None))
            path = os.path.join(out, f"part-{pid:05d}.avro")
            n = avro_codec.write_container(path, schema_json, fields, rows)
            yield pd.DataFrame({"path": [path], "n_rows": [n]})

        written = (
            # r14: conditional fan-out — one container file per core at
            # fixture scale (1 scan split), one per scan split at scale.
            fan_out(spark, orders, sf_dir, "orders")
            .mapInPandas(write_parts, "path string, n_rows long")
            .collect()  # bounded: one (path, count) row per partition
        )
        # Library-level spec check: the JVM avro reader must agree on
        # every file's record count. r13 (guide §7.3): counted at the
        # BLOCK level — hasNext() decodes each block header through
        # DataFileStream (sync markers, codec, framing) and
        # getBlockCount() is its record count, so the JVM reader still
        # validates the container structure, but the driver loop is one
        # py4j round-trip per BLOCK instead of per RECORD (the old
        # reader.next() loop was ~2 py4j round-trips x |rows|: ~28 s at
        # sf0.1, measured 0.56 s per 3000 records). Full per-value
        # decode fidelity stays enforced by the oracle hash over the
        # Python read-back below.
        jvm = spark._jvm
        jvm_total = 0
        for r in written:
            fin = jvm.java.io.FileInputStream(r["path"])
            reader = jvm.org.apache.avro.file.DataFileStream(
                fin, jvm.org.apache.avro.generic.GenericDatumReader()
            )
            k = 0
            while reader.hasNext():
                k += reader.getBlockCount()
                reader.nextBlock()
            reader.close()
            jvm_total += k
        py_total = sum(r["n_rows"] for r in written)
        if jvm_total != py_total:
            raise RuntimeError(
                f"avro container not spec-compliant: jvm read {jvm_total} "
                f"of {py_total} records"
            )

        def decode_parts(pdfs):
            import pandas as pd

            for pdf in pdfs:
                for blob in pdf["content"]:
                    _, rows = avro_codec.read_container(bytes(blob))
                    yield pd.DataFrame(
                        rows,
                        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
                    )

        back = (
            spark.read.format("binaryFile")
            .load(os.path.join(out, "*.avro"))
            .select("content")
            .mapInPandas(
                decode_parts,
                "o_orderkey long, o_orderstatus string, o_totalprice double",
            )
        )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "sink_s3_object_store",
    # Round-8 conversion (rows-only → sql-checked): the hive-partition
    # count and row count of the restored archive are deterministic
    # functions of the fixture — COUNT(DISTINCT (year, month)) and
    # COUNT(*) — and the round-trip/object-accounting invariants are
    # already RuntimeError-guarded, so TRUE is their pinned value. The
    # raw object and byte counts (file-layout/compression shaped) stay
    # out of the hashed output.
    oracle="""
    SELECT CAST(COUNT(DISTINCT (year(ts), month(ts))) AS BIGINT)
               AS n_partitions,
           COUNT(*) AS n_rows,
           TRUE AS objects_accounted,
           TRUE AS round_trip_ok
    FROM events
    """,
)
def sink_s3_object_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's S3 upload (A12, main.go:211-241) against a LIVE
    S3 API endpoint — an in-process moto server speaking the real
    wire protocol over HTTP (bucket create, PutObject, ListObjectsV2,
    GetObject), not a mock of the client.

    Pipeline, with the D2 fix: events → per-row dynamic
    ``partitionBy(year, month)`` parquet (the reference keys the WHOLE
    batch by its max timestamp, main.go:194-200 — wrong partition for
    multi-month batches) → every part file uploaded under the
    reference's hive key layout ``year=YYYY/month=MM/`` (main.go:
    220-223) — the upload runs INSIDE mapInPandas, so each executor
    PUTs its files concurrently (the parallel-upload shape; at real
    scale this is the s3a committer's job — see the s3a note below) →
    ListObjectsV2 + GetObject restore into a fresh directory → Spark
    re-reads the restored tree with hive partition discovery.

    THE PIN: the restored archive must be row-for-row equal to the
    pre-upload archive (exceptAll both ways == 0), and the per-
    (year, month) object layout must match the true row partitioning.
    RuntimeError otherwise.

    Why not ``s3a://`` directly: pyspark ships no hadoop-aws/aws-sdk
    jars in this environment (verified — find / over the image), so
    the Hadoop s3a filesystem cannot register; the SDK-level PutObject
    path exercised here is exactly what the reference binary does
    (aws-sdk-go-v2 PutObject, main.go:233-237). The magic-committer
    session confs remain wired (session.py) for clusters that carry
    the jars."""
    import boto3
    from moto.server import ThreadedMotoServer

    staging = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "s3_staging"
    )
    restore = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "s3_restore"
    )
    shutil.rmtree(restore, ignore_errors=True)

    events = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
    )
    (
        events.write.mode("overwrite")
        .partitionBy("year", "month")
        .option("compression", "snappy")
        .parquet(staging)
    )

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    port = server._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    bucket = "pg-archive"

    def _client():
        import boto3 as _b

        return _b.client(
            "s3",
            endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1",
        )

    try:
        _client().create_bucket(Bucket=bucket)

        # Distributed upload: the binaryFile scan parallelizes over the
        # part files; each task PUTs its own files (main.go:233-237's
        # PutObject, but concurrent instead of one driver call).
        files = spark.read.format("binaryFile").load(
            os.path.join(staging, "year=*", "month=*")
        ).select("path", "content")

        def upload(pdfs):
            import pandas as pd

            s3 = _client()
            for pdf in pdfs:
                keys, sizes = [], []
                for path, blob in zip(pdf["path"], pdf["content"]):
                    local = path.removeprefix("file:")
                    key = local[len(staging) + 1 :]  # year=Y/month=M/part-…
                    s3.put_object(Bucket=bucket, Key=key, Body=bytes(blob))
                    keys.append(key)
                    sizes.append(len(blob))
                yield pd.DataFrame({"key": keys, "n_bytes": sizes})

        # bounded: one row per uploaded file (<= partition count)
        uploaded = files.mapInPandas(upload, "key string, n_bytes long").collect()

        # Restore: ListObjectsV2 + GetObject into a fresh tree (driver
        # loop bounded by object count = partitions × files-per-part).
        s3 = _client()
        token, keys = None, []
        while True:
            kw = {"Bucket": bucket}
            if token:
                kw["ContinuationToken"] = token
            resp = s3.list_objects_v2(**kw)
            keys += [o["Key"] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                break
            token = resp["NextContinuationToken"]
        for key in keys:
            dest = os.path.join(restore, key)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "wb") as fh:
                fh.write(s3.get_object(Bucket=bucket, Key=key)["Body"].read())

        back = spark.read.parquet(restore)
        d = (
            back.exceptAll(events.select(*back.columns)).count()
            + events.select(*back.columns).exceptAll(back).count()
        )
        n_parts_src = events.select("year", "month").distinct().count()
        n_parts_s3 = len({k.rsplit("/", 1)[0] for k in keys})
        if d or n_parts_s3 != n_parts_src or len(keys) != len(uploaded):
            raise RuntimeError(
                f"object-store round-trip diverged: rowdiff={d}, "
                f"partitions s3={n_parts_s3} src={n_parts_src}, "
                f"objects listed={len(keys)} uploaded={len(uploaded)}"
            )
        n_bytes = int(sum(r["n_bytes"] for r in uploaded))
        return spark.createDataFrame(
            [
                (
                    n_parts_s3,
                    back.count(),
                    len(keys) == len(uploaded) and n_bytes > 0,
                    True,
                )
            ],
            "n_partitions long, n_rows long, objects_accounted boolean, "
            "round_trip_ok boolean",
        )
    finally:
        server.stop()


@register(
    "maintenance_snapshot_time_travel",
    oracle="""
    WITH v1 AS (
        SELECT * FROM events
        WHERE epoch_ms(ts) // 86400000 - 19723 < 10
    )
    SELECT 'v1' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM v1
    UNION ALL
    SELECT 'v2' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    ORDER BY snapshot
    """,
)
def maintenance_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel over plain parquet — the core
    table-format mechanic (Iceberg/Delta's contract) built from first
    principles, since no lakehouse jars ship in this environment:
    a snapshot is an immutable JSON MANIFEST listing exactly the data
    files it contains; a commit writes new files THEN atomically
    publishes a new manifest (os.replace on the pointer file); readers
    resolve the pointer → manifest → file list and read ONLY those
    files, so concurrent writers never make a reader see a half-commit,
    and any historical version stays readable as long as its manifest
    and files exist.

    The op commits v1 (events before day 10), then appends the rest as
    v2, then reads BOTH versions by manifest — time travel to v1 after
    v2 exists. The oracle states both version profiles relationally;
    a reader that leaked v2 files into v1 (no isolation) or lost files
    (broken manifest) hash-fails.

    At 100 TB this is exactly the production shape: manifests are
    O(files) metadata, the pointer swap is one atomic rename, vacuum =
    delete files unreachable from retained manifests
    (maintenance_retention_drop_partitions' sibling)."""
    import json as _json

    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "lakehouse"
    )
    shutil.rmtree(base, ignore_errors=True)
    data_dir = os.path.join(base, "data")
    meta_dir = os.path.join(base, "meta")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    events = (
        load(spark, sf_dir, "events")
        .withColumn("day_idx", F.expr("ts_ns DIV 1000000 DIV 86400000") - 19723)
        .select("event_id", "user_id", "value", "day_idx")
    )

    def commit(df: DataFrame, version: int) -> None:
        out = os.path.join(data_dir, f"commit-{version}")
        df.write.mode("overwrite").parquet(out)
        files = [
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        ]
        prev: list[str] = []
        if version > 1:
            with open(os.path.join(meta_dir, f"v{version - 1}.json")) as fh:
                prev = _json.load(fh)["files"]
        manifest = os.path.join(meta_dir, f"v{version}.json")
        with open(manifest, "w") as fh:
            _json.dump({"version": version, "files": prev + files}, fh)
        # Atomic pointer swap — the commit becomes visible all-or-nothing.
        tmp = os.path.join(meta_dir, "HEAD.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"v{version}.json")
        os.replace(tmp, os.path.join(meta_dir, "HEAD"))

    def read_version(version: int) -> DataFrame:
        with open(os.path.join(meta_dir, f"v{version}.json")) as fh:
            files = _json.load(fh)["files"]
        return spark.read.parquet(*files)

    commit(events.filter(F.col("day_idx") < 10), 1)
    commit(events.filter(F.col("day_idx") >= 10), 2)

    def profile(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("snapshot"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        ).select("snapshot", "n_rows", "sum_value")

    return (
        profile(read_version(1), "v1")
        .unionByName(profile(read_version(2), "v2"))
        .orderBy("snapshot")
    )


@register(
    "maintenance_constraint_audit",
    oracle="""
    SELECT 'fk_lineitem_orders' AS constraint_name,
           (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations
    UNION ALL
    SELECT 'fk_orders_customer',
           (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'nn_lineitem_keys',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IS NULL OR l_linenumber IS NULL)
    UNION ALL
    SELECT 'nn_orders_keys',
           (SELECT COUNT(*) FROM orders
            WHERE o_orderkey IS NULL OR o_custkey IS NULL)
    UNION ALL
    SELECT 'pk_lineitem_unique',
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey, l_linenumber FROM lineitem
               GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'pk_orders_unique',
           (SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM orders
               GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'rng_lineitem_discount',
           (SELECT COUNT(*) FROM lineitem
            WHERE CAST(l_discount AS DOUBLE) < 0
               OR CAST(l_discount AS DOUBLE) > 1)
    UNION ALL
    SELECT 'rng_lineitem_quantity',
           (SELECT COUNT(*) FROM lineitem
            WHERE CAST(l_quantity AS DOUBLE) <= 0)
    UNION ALL
    SELECT 'rng_orders_totalprice',
           (SELECT COUNT(*) FROM orders
            WHERE CAST(o_totalprice AS DOUBLE) <= 0)
    ORDER BY constraint_name
    """,
)
def maintenance_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over the archive — the dbt-test /
    CHECK-constraint layer a warehouse-replacement engine must ship:
    parquet enforces nothing, so PK uniqueness, FK integrity, NOT
    NULL, and range invariants the source database guaranteed
    (reference main.go:88-121 extracts from Postgres, which enforced
    them) have to be AUDITED after landing. One row per declared
    constraint with its violation count — zero is a claim, not an
    assumption.

    Scale shape: same-table checks (NOT NULL + range) fold into ONE
    conditional-sum pass per table — constraints are columns of a
    single aggregate, not N scans. PK checks are a groupBy on the key
    (map-side combinable); FK checks are anti-join counts (orders→
    customer broadcasts the dim side at fixture scale and AQE keeps
    the choice honest at 100 TB; lineitem→orders is the one genuine
    fact-fact shuffle, on the natural join key). Nothing here is
    quadratic; every check is a scan plus at most one keyed
    exchange."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    # r13 (guide §2.6): the checks were SEVEN sequential driver
    # actions (.first()/.count() per check) — seven serial jobs at
    # construction time, each paying full scan + job overhead
    # (isolated ~5 s at sf0.1). Every check is now a 1-row lazy frame
    # and the op returns ONE union plan: a single job whose
    # independent check stages the scheduler runs concurrently.
    # Same-table checks stay single-pass via stack() over one
    # conditional-sum aggregate; values are identical (long counts,
    # COALESCE 0 for the empty-table null-sum case the old `or 0`
    # handled).
    li_pass = li.agg(
        F.sum(
            (F.col("l_orderkey").isNull() | F.col("l_linenumber").isNull())
            .cast("long")
        ).alias("nn_keys"),
        F.sum(
            (
                (F.col("l_discount").cast("double") < 0)
                | (F.col("l_discount").cast("double") > 1)
            ).cast("long")
        ).alias("rng_discount"),
        F.sum((F.col("l_quantity").cast("double") <= 0).cast("long")).alias(
            "rng_quantity"
        ),
    ).selectExpr(
        "stack(3,"
        " 'nn_lineitem_keys', COALESCE(nn_keys, CAST(0 AS LONG)),"
        " 'rng_lineitem_discount', COALESCE(rng_discount, CAST(0 AS LONG)),"
        " 'rng_lineitem_quantity', COALESCE(rng_quantity, CAST(0 AS LONG))"
        ") AS (constraint_name, n_violations)"
    )
    o_pass = orders.agg(
        F.sum(
            (F.col("o_orderkey").isNull() | F.col("o_custkey").isNull())
            .cast("long")
        ).alias("nn_keys"),
        F.sum((F.col("o_totalprice").cast("double") <= 0).cast("long")).alias(
            "rng_total"
        ),
    ).selectExpr(
        "stack(2,"
        " 'nn_orders_keys', COALESCE(nn_keys, CAST(0 AS LONG)),"
        " 'rng_orders_totalprice', COALESCE(rng_total, CAST(0 AS LONG))"
        ") AS (constraint_name, n_violations)"
    )

    def one(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.count("*").cast("long").alias("n_violations")
        ).selectExpr(
            f"'{name}' AS constraint_name", "n_violations"
        )

    pk_li = one(
        "pk_lineitem_unique",
        li.groupBy("l_orderkey", "l_linenumber")
        .count()
        .filter(F.col("count") > 1),
    )
    pk_o = one(
        "pk_orders_unique",
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1),
    )
    fk_li = one(
        "fk_lineitem_orders",
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ),
    )
    # No broadcast hint: customer scales linearly with SF, so forcing
    # a broadcast here would pin the wrong plan at 100 TB (r10 sweep of
    # explicit F.broadcast sites — the r4 corpus-growing-broadcast
    # class). Catalyst/AQE still broadcasts it at fixture scale from
    # size stats; at scale this is correctly a shuffled anti-join.
    fk_o = one(
        "fk_orders_customer",
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ),
    )

    out = (
        fk_li.unionByName(fk_o)
        .unionByName(li_pass)
        .unionByName(o_pass)
        .unionByName(pk_li)
        .unionByName(pk_o)
    )
    return out.orderBy("constraint_name")


@register(
    "maintenance_snapshot_vacuum",
    oracle="""
    WITH rewritten AS (
        SELECT * FROM events
        WHERE (epoch_ms(ts) // 86400000) - 19723 >= 10
    )
    SELECT 'v2_pre_vacuum' AS phase,
           (SELECT COUNT(*) FROM rewritten) AS n_rows,
           CAST(4 AS BIGINT) AS n_files
    UNION ALL
    SELECT 'v2_post_vacuum',
           (SELECT COUNT(*) FROM rewritten),
           CAST(4 AS BIGINT)
    UNION ALL
    SELECT 'vacuumed', CAST(4 AS BIGINT), CAST(4 AS BIGINT)
    """,
)
def maintenance_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum for the manifest-based snapshot store — the retention
    sibling of maintenance_snapshot_time_travel: delete every data file
    unreachable from the RETAINED manifests, prove the retained
    snapshot still reads byte-identically afterwards, and prove the
    expired snapshot's files are actually gone.

    Commit v1 = the full events table; commit v2 = a retention REWRITE
    (drop days < 10, written as fresh files — v2 references NONE of
    v1's files). Retention policy keeps only v2, so vacuum deletes
    exactly v1's files (4 — both commits write repartition(4), which
    pins the file accounting the oracle states). The op fails loudly
    if (a) the v2 profile changes across the vacuum (a reachable file
    was deleted), or (b) any expired file survives (vacuum missed it),
    or (c) the expired snapshot is still readable.

    At 100 TB this is the O(files-metadata) pattern Iceberg's
    expire_snapshots/Delta's VACUUM run: reachability = set union over
    retained manifests (pure metadata), deletion is embarrassingly
    parallel, and the atomic HEAD pointer means readers never race the
    sweep. Reference parity: delete-behind after a verified copy is
    exactly main.go:131-145's contract, lifted to file granularity.
    """
    import json as _json

    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "vacuum"
    )
    shutil.rmtree(base, ignore_errors=True)
    data_dir = os.path.join(base, "data")
    meta_dir = os.path.join(base, "meta")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    events = (
        load(spark, sf_dir, "events")
        .withColumn("day_idx", F.expr("ts_ns DIV 1000000 DIV 86400000") - 19723)
        .select("event_id", "user_id", "value", "day_idx")
    )

    def commit(df: DataFrame, version: int, files: list[str] | None = None):
        out = os.path.join(data_dir, f"commit-{version}")
        df.repartition(4).write.mode("overwrite").parquet(out)
        new_files = sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        manifest = {"version": version, "files": (files or []) + new_files}
        with open(os.path.join(meta_dir, f"v{version}.json"), "w") as fh:
            _json.dump(manifest, fh)
        tmp = os.path.join(meta_dir, "HEAD.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"v{version}.json")
        os.replace(tmp, os.path.join(meta_dir, "HEAD"))

    def manifest_files(version: int) -> list[str]:
        with open(os.path.join(meta_dir, f"v{version}.json")) as fh:
            return _json.load(fh)["files"]

    commit(events, 1)
    # Retention rewrite: days >= 10 only, fresh files (no v1 reuse).
    commit(events.filter(F.col("day_idx") >= 10), 2)

    def profile(version: int):
        df = spark.read.parquet(*manifest_files(version))
        n = df.count()
        return n, len(manifest_files(version))

    pre_rows, pre_files = profile(2)

    # Vacuum: reachable = union of files over RETAINED manifests (v2
    # only); everything else under data/ is expired and deleted.
    reachable = set(manifest_files(2))
    all_files = {
        os.path.join(root, f)
        for root, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    expired = sorted(all_files - reachable)
    for path in expired:
        os.remove(path)
    os.remove(os.path.join(meta_dir, "v1.json"))

    survivors = [p for p in expired if os.path.exists(p)]
    if survivors:
        raise RuntimeError(f"vacuum missed expired files: {survivors}")
    try:
        spark.read.parquet(os.path.join(data_dir, "commit-1")).count()
        raise RuntimeError("expired snapshot v1 is still readable")
    except Exception as exc:  # noqa: BLE001 — path-not-found is the pass
        if "still readable" in str(exc):
            raise

    post_rows, post_files = profile(2)
    if (post_rows, post_files) != (pre_rows, pre_files):
        raise RuntimeError(
            f"vacuum corrupted the retained snapshot: "
            f"{(pre_rows, pre_files)} -> {(post_rows, post_files)}"
        )
    return spark.createDataFrame(
        [
            ("v2_pre_vacuum", pre_rows, pre_files),
            ("v2_post_vacuum", post_rows, post_files),
            ("vacuumed", len(expired), len(expired)),
        ],
        "phase string, n_rows long, n_files long",
    )


@register(
    "scan_bucket_pruned",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders WHERE o_custkey = 97
    """,
)
def scan_bucket_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket pruning on read: a point predicate on the BUCKET key of a
    bucketed table scans 1 of 8 buckets — the file-level sibling of
    partition pruning for high-cardinality keys you can't directory-
    partition on. The executed plan must show `SelectedBucketsCount:
    1 out of 8` (asserted in tests); the oracle pins the content
    against the unbucketed source, so pruning provably drops no rows.

    At 100 TB: bucketing the fact table on its hot point-lookup key
    makes key-restricted scans read 1/N of the files with zero
    metadata service involvement (the bucket id is a pure hash of the
    predicate literal) — the ingest-time trade join_bucketed_colocated
    makes for joins, applied to scans.
    """
    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "bucketscan"
    )
    # Isolated cloned session (same SparkContext, private SQLConf):
    # autoBucketedScan=true would DISABLE the bucketed scan here because
    # no join/agg consumes the bucketing — but bucket PRUNING is itself
    # the benefit for a point-predicate scan, so turn the auto-disable
    # off without leaking the conf into the caller's session. (Same
    # isolation pattern as join_bloom_runtime_filter.)
    s2 = spark.newSession()
    s2.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    orders = load(s2, sf_dir, "orders")
    s2.sql("DROP TABLE IF EXISTS bs_orders")
    (
        orders.write.mode("overwrite")
        .option("path", os.path.join(base, "bs_orders"))
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("bs_orders")
    )
    return s2.table("bs_orders").filter(F.col("o_custkey") == 97).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
    )


@register(
    "scan_agg_pushdown_footer",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def scan_agg_pushdown_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX/COUNT answered from parquet FOOTER STATISTICS, zero data
    pages read: with the DSv2 parquet source and
    ``spark.sql.parquet.aggregatePushdown=true``, Spark compiles an
    unfiltered MIN/MAX/COUNT aggregate into a metadata-only scan — the
    executed plan's BatchScan shows ``PushedAggregation: [COUNT(*),
    MIN(o_orderkey), ...]`` (asserted in tests) and reads one footer
    per file instead of the column data. This is the profile/monitoring
    query shape (reference README.md:127's freshness and row-count
    checks): at 100 TB the difference is reading ~KBs of footers vs
    scanning the whole fact table — the single biggest constant-factor
    win Spark offers for monitoring rollups.

    Pushdown-eligibility is narrow by design: no filter, no GROUP BY on
    non-partition columns, and only types whose footer stats are
    trustworthy — integer/float/date qualify, TIMESTAMP and truncatable
    strings do NOT (a timestamp column in the agg silently disables the
    whole pushdown — verified here, which is why this op profiles
    o_orderkey, not o_orderdate). Runs in a CLONED session (private
    SQLConf) so the v2-source switch never leaks to callers — the same
    isolation pattern as scan_bucket_pruned.
    """
    s2 = spark.newSession()
    # Parquet must come off the V1 source list for the DSv2 aggregate
    # pushdown rule to apply; both confs are session-scoped.
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    orders = load(s2, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "source_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    WHERE doc_id < 40
    """,
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the multimodal INGEST path: raw files
    (images, audio, model shards) land as (path, modificationTime,
    length, content) rows with the bytes as an opaque binary column,
    which is exactly the layout the multimodal_* kernels consume.
    Round-trip proof: the first 40 documents are materialized as
    individual ``<doc_id>.bin`` files, read back through binaryFile,
    and reduced to (doc_id parsed from the path, byte length, md5) —
    the oracle computes the same digest from the source table, so the
    ingest path provably preserves every byte.

    Scale notes: binaryFile parallelizes per FILE (no splitting — one
    task per object, the right granularity for media blobs) and
    supports pathGlobFilter/recursiveFileLookup for bucket layouts;
    `spark.sql.sources.binaryFile.maxLength` guards against
    single-object OOM. At 100 TB of media the scan is embarrassingly
    parallel and the ONLY data motion is the objects themselves —
    metadata (path/length/mtime) comes from the listing.

    Note: materializing the fixture blobs via foreachPartition into a
    local temp dir is a single-JVM test harness artifact — in
    production the objects already live in shared storage and ONLY the
    binaryFile read is the operator; on a multi-node cluster the
    staging step would target the shared filesystem instead."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "binfiles",
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # Materialize the blobs executor-side (one file per doc, the
    # object-store layout); foreachPartition keeps the write
    # distributed — nothing returns to the driver.
    def _write_part(rows):
        for r in rows:
            with open(os.path.join(out, f"{r.doc_id}.bin"), "wb") as fh:
                fh.write(r.text.encode("utf-8"))

    docs.foreachPartition(_write_part)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


@register(
    "source_xml_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_custkey < 200
    GROUP BY o_orderstatus
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML format round-trip (built into Spark 4 — no external
    spark-xml package): a pruned orders slice is written as XML
    documents (rowTag=order) and read back with a PINNED schema, then
    profiled; the oracle computes the same profile on the source table,
    so the format provably preserves keys, enum strings, and full
    double precision (Java shortest-roundtrip rendering). XML is the
    interchange surface legacy feeds actually arrive on — the archiver
    equivalent of the reference's CSV/JSON landing formats
    (README.md:88-102) for enterprise sources.

    Scale notes: XML files split per-file (rowTag parsing is not
    byte-splittable) — many medium files beat one giant one; always
    pin the schema on read (inference buys a full extra pass and
    type-widening surprises). Profile-after-roundtrip keeps the hash
    independent of file layout and row order."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "xml_orders",
    )
    (
        orders.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(out)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .load(out)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "scan_columnar_cache_reuse",
    oracle="""
    WITH joined AS (
        SELECT c.c_custkey, c.c_mktsegment, n.n_name, r.r_name,
               c.c_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT 'by_region' AS report, r_name AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM joined GROUP BY r_name
    UNION ALL
    SELECT 'by_segment' AS report, c_mktsegment AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM joined GROUP BY c_mktsegment
    """,
)
def scan_columnar_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMNAR CACHE reuse: an enriched frame consumed by TWO reports
    pays its join cost ONCE — ``.cache()`` materializes the first
    consumer's result as compressed columnar batches (InMemoryRelation)
    and the second consumer scans those batches instead of re-running
    scan+joins (both consumers' plans show InMemoryTableScan — asserted
    in tests). This is the dashboard fan-out shape: N reports over one
    curated frame; without the cache Spark re-executes the whole
    lineage N times (plan REUSE only covers exchange-identical
    subtrees, not sibling queries).

    At 100 TB: cache the CURATED frame (post-join, post-filter — here
    |customers| rows), never the raw fact; MEMORY_AND_DISK spills
    gracefully, and columnar compression typically fits 3-10× the raw
    row size. The try/finally unpersist releases executor memory the
    moment the consumers are done — the same discipline as the CSV
    cache in scan_csv_inferred (r5 ADVICE fix)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_mktsegment", "n_name", "r_name", "c_acctbal")
        .cache()
    )
    try:
        bal = F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
        by_region = joined.groupBy(F.col("r_name").alias("k")).agg(
            F.count("*").alias("n"), bal.alias("bal")
        ).select(F.lit("by_region").alias("report"), "k", "n", "bal")
        by_segment = joined.groupBy(F.col("c_mktsegment").alias("k")).agg(
            F.count("*").alias("n"), bal.alias("bal")
        ).select(F.lit("by_segment").alias("report"), "k", "n", "bal")
        out = by_region.unionAll(by_segment)
        # Materialize while the cache is alive; the returned frame is
        # the (tiny) union result, independent of the cache lifetime.
        # bounded: one row per region + per segment (<= 10)
        rows = out.collect()
    finally:
        joined.unpersist()
    return spark.createDataFrame(
        rows, "report string, k string, n long, bal double"
    )


@register(
    "scan_ignore_corrupt_files",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_ignore_corrupt_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-level fault tolerance (``spark.sql.files.ignoreCorruptFiles``):
    a directory of good parquet batches plus one truncated/garbage file
    scans to exactly the good rows instead of failing the whole job —
    the archive-operations sibling of source_csv_permissive's RECORD-
    level tolerance. At 100 TB a single corrupted object (failed
    multipart upload, bit rot, a half-written file from a crashed
    writer outside the commit protocol) must not take down a thousand-
    task scan; with the flag, the task reading the bad file logs and
    returns empty, every other task is untouched.

    The full orders table is written as two parquet batches, a garbage
    `.parquet` is planted beside them, and the profile of the
    mergeSchema-free read must equal the SOURCE table's profile — i.e.
    the corrupt file contributed nothing and the good files lost
    nothing. Runs in a cloned session so the tolerance flag never
    leaks: in normal operation you WANT corrupt files to fail loudly;
    this flag is the explicit recover-and-continue mode."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "corrupt_scan",
    )
    shutil.rmtree(base, ignore_errors=True)
    orders.filter(F.col("o_orderkey") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "b0"))
    orders.filter(F.col("o_orderkey") % 2 == 1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "b1"))
    # Plant a garbage object that claims to be parquet.
    with open(os.path.join(base, "b0", "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a parquet file at all \x00\xff")
    s2 = spark.newSession()
    s2.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    back = s2.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).option("recursiveFileLookup", "true").parquet(base)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "maintenance_repartition_layout",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY month
    """,
)
def maintenance_repartition_layout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-SCHEME MIGRATION (day layout → month layout): the
    archive was landed `day=YYYY-MM-DD/` (the reference's per-run
    drop granularity, main.go:225-231) but query patterns read months —
    so the maintenance job rewrites the layout coarser WITHOUT touching
    row content. Day-partitioned ingest + month-partitioned serving is
    the classic mismatch: too-fine partitions at 100 TB mean millions
    of directories, metadata-bound listings, and KB-scale files; the
    migration is one partitioned re-write, `partitionOverwriteMode=
    dynamic`-safe, after which old-layout dirs are retired (the
    retention machinery, maintenance_retention_drop_partitions).

    Proof: the op lands BOTH layouts, then profiles the MONTH-layout
    read-back; the oracle computes the same profile from the source
    table — bit-identical content across the migration. Tests
    additionally pin the directory collapse (n day dirs >> n month
    dirs) and that a single-month read of the new layout prunes to
    one partition (PartitionFilters)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "layout_mig",
    )
    shutil.rmtree(base, ignore_errors=True)
    day_path = os.path.join(base, "by_day")
    month_path = os.path.join(base, "by_month")
    ev.write.mode("overwrite").partitionBy("day").parquet(day_path)
    # The migration: read the OLD layout, re-partition coarser.
    old = spark.read.parquet(day_path)
    (
        old.withColumn("month", F.substring("day", 1, 7))
        .drop("day")
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(month_path)
    )
    back = spark.read.parquet(month_path)
    return back.groupBy("month").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "maintenance_content_fingerprint",
    oracle="""
    SELECT 'orders' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
               || '|' || CAST(o_custkey AS VARCHAR)
           ), 1, 8)) AS BIGINT)) AS BIGINT) AS fingerprint
    FROM orders
    UNION ALL
    SELECT 'documents' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
               CAST(doc_id AS VARCHAR) || '|' || lang || '|'
               || CAST(n_chars AS VARCHAR)
           ), 1, 8)) AS BIGINT)) AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def maintenance_content_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORDER-INVARIANT dataset fingerprint — the reproducibility
    manifest entry a training run records next to its model card: an
    additive hash (Σ of each row's md5 prefix as an integer) that is
    identical for any row order, any partitioning, any file layout —
    so re-shards, compactions, and engine migrations can be VERIFIED
    content-preserving with one cheap aggregate instead of a full
    sort-and-diff (maintenance_dataset_diff is the row-level tool when
    this detector fires). Commutative+associative by construction, so
    it map-side combines and merges like any SUM; collision risk is
    the birthday bound on a 32-bit-per-row additive hash — a CHANGE
    detector, not a cryptographic attestation (the docstring contract;
    use the full md5 ledger for adversarial settings).

    Cross-engine exactness: md5-prefix-as-integer is the house
    deterministic-hash idiom; both engines sum the same integers."""
    def fp(df, cols, name):
        key = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in cols]
        )
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum(h).alias("fingerprint"),
        ).select(F.lit(name).alias("tbl"), "n_rows", "fingerprint")

    orders = load(spark, sf_dir, "orders")
    docs = load(spark, sf_dir, "documents")
    return fp(
        orders, ["o_orderkey", "o_orderstatus", "o_custkey"], "orders"
    ).unionAll(fp(docs, ["doc_id", "lang", "n_chars"], "documents"))


@register(
    "maintenance_analyze_stats",
    oracle="""
    SELECT 'nation' AS tbl, CAST(COUNT(*) AS BIGINT) AS stats_rows
    FROM nation
    UNION ALL
    SELECT 'supplier' AS tbl, CAST(COUNT(*) AS BIGINT) AS stats_rows
    FROM supplier
    """,
)
def maintenance_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ANALYZE TABLE … COMPUTE STATISTICS`` — feeding the cost-based
    optimizer: table-level rowCount/sizeInBytes land in the catalog and
    drive CBO decisions (join reordering, broadcast-threshold checks)
    that AQE alone can only correct AFTER a shuffle exists. This is the
    maintenance step a production archive schedules after every major
    append (the reference has no optimizer to feed; Spark does, and
    unanalyzed tables mean the planner flies blind until runtime).

    The op materializes two dims as managed tables, ANALYZEs them, and
    returns the CATALOG's row counts (parsed from DESCRIBE EXTENDED —
    not recounted from data); the oracle counts the source tables —
    a hash match proves the planner's world model agrees with the
    data. The stats surface is exercised further in tests
    (sizeInBytes recorded, stats survive a new session against the
    same warehouse). At 100 TB ANALYZE is one count-ish scan per
    table; column-level NDV stats (FOR COLUMNS) use HLL and are
    deliberately excluded from the hash (approximate by design)."""
    out = []
    for name in ("nation", "supplier"):
        tbl = f"stats_{name}"
        # A managed-table LOCATION can outlive the catalog entry across
        # sessions (fresh in-memory catalog, persistent warehouse dir)
        # — clear both before the overwrite.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
        load(spark, sf_dir, name).write.mode("overwrite").saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
        # bounded: DESCRIBE metadata rows (catalog-sized, not data)
        desc = spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        line = next(r.data_type for r in desc if r.col_name == "Statistics")
        # "<bytes> bytes, <rows> rows"
        n_rows = int(line.split(",")[1].strip().split(" ")[0])
        out.append((name, n_rows))
    return spark.createDataFrame(out, "tbl string, stats_rows long")


@register(
    "maintenance_backfill_overwrite",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY year
    ORDER BY year
    """,
)
def maintenance_backfill_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition backfill via DYNAMIC partition overwrite — the repair
    primitive of every partitioned lake: a bad load lands a corrupted
    year partition; the fix rewrites ONLY that partition
    (`partitionOverwriteMode=dynamic` as a write option, so
    mode=overwrite replaces just the partitions present in the
    incoming frame instead of truncating the table), and the job is
    idempotent — re-running the backfill produces byte-identical
    content, the property that makes scheduled re-runs safe.

    The op stages orders partitioned by year with year 1997 CORRUPTED
    (half its rows dropped), backfills 1997 from source, and returns
    the healed per-year profile — the oracle states the profile
    relationally from the source table, so an overwrite that clobbered
    other partitions (static mode's failure) or missed rows
    hash-fails. The sibling test pins that untouched partitions' files
    are not rewritten (mtime-stable) and that re-backfilling is a
    no-op on content.

    At 100 TB: backfill cost is O(partition), not O(table) — the
    entire point; with object-store committers the partition swap is
    a directory-scoped commit, and concurrent readers see old-or-new
    atomically per partition."""
    orders = load(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"backfill_orders-{uuid.uuid4().hex[:8]}",
    )
    # Bad load: year 1997 lands with half its rows missing.
    corrupted = orders.filter(
        (F.col("year") != 1997) | (F.col("o_orderkey") % 2 == 0)
    )
    corrupted.write.mode("overwrite").partitionBy("year").parquet(base)
    # Backfill: rewrite ONLY the 1997 partition from source.
    (
        orders.filter(F.col("year") == 1997)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("year")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    result = (
        back.groupBy(F.col("year").cast("long").alias("year"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("year")
    )
    # bounded: one row per year (<= 8)
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "maintenance_deletion_vectors",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f
    FROM orders
    WHERE NOT (o_orderstatus = 'P' AND o_totalprice < 100000)
    GROUP BY year
    ORDER BY year
    """,
)
def maintenance_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deletion vectors from first principles — the merge-on-read
    DELETE every modern lakehouse format (Delta DVs, Iceberg v2
    positional deletes) uses instead of rewriting data files: the
    delete predicate is resolved ONCE to a sidecar of
    (file_name, row_index) positions, data files stay immutable, and
    reads subtract the sidecar. Spark's `_metadata.file_name` /
    `_metadata.row_index` columns provide exactly the positional
    identity this needs (the mechanism scan_metadata_columns
    introduced; this op closes the loop by USING it for MoR deletes).

    Stages orders as immutable parquet, materializes the deletion
    vector for `status='P' AND totalprice<100000`, then serves the
    MoR read: scan ⟕ anti-join sidecar on (file, row_index). The
    oracle states the surviving rows relationally, so a positional
    mismatch (off-by-one row_index, wrong file attribution)
    hash-fails. The sibling test pins that data files are untouched
    byte-for-byte after the 'delete'.

    At 100 TB: DELETE cost is O(matching rows) sidecar write, zero
    data rewrite; the read-side anti-join keys on (file, pos) — both
    sides partition by file, so the join is file-local and the
    sidecar side is usually small enough to broadcast. Compaction
    (maintenance_compact) later folds DVs back in."""
    orders = load(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"dv_orders-{uuid.uuid4().hex[:8]}",
    )
    orders.write.mode("overwrite").parquet(base)
    table = spark.read.parquet(base).select(
        "*",
        F.col("_metadata.file_name").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    # DELETE ... WHERE: resolve the predicate to positions, once.
    dv = table.filter(
        (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") < 100000)
    ).select("_file", "_pos")
    dv_path = base + "_dv"
    dv.write.mode("overwrite").parquet(dv_path)
    # Merge-on-read: scan minus deletion vector, positionally.
    dv_back = spark.read.parquet(dv_path)
    live = table.join(
        F.broadcast(dv_back), on=["_file", "_pos"], how="left_anti"
    )
    result = (
        live.groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(
            F.count("*").cast("bigint").alias("n_live"),
            F.sum((F.col("o_orderstatus") == "F").cast("int"))
            .cast("bigint")
            .alias("n_f"),
        )
        .orderBy("year")
    )
    # bounded: one row per year (<= 8)
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(dv_path, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


BLOOM_LOOKUP_IDS = [7, 123, 500, 801, 999]
BLOOM_KEY_OFFSET = 1 << 32  # keeps keys > int32 (py4j long dispatch in tests)


@register(
    "layout_parquet_bloom_filter",
    oracle=f"""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_id IN ({", ".join(str(i) for i in BLOOM_LOOKUP_IDS)})
    ORDER BY event_id
    """,
)
def layout_parquet_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet column BLOOM FILTERS for archive point lookups — the
    storage-layout answer to 'find one event in the cold archive':
    min/max row-group stats prune nothing for a high-cardinality key
    scattered across time-sorted files, but a per-column bloom filter
    (`parquet.bloom.filter.enabled#col` at write) lets the reader skip
    whole row groups on equality probes with ~1% false positives at
    bits-per-key cost. The reference's archive (main.go:220-237) would
    serve `WHERE event_id = ?` restores this way.

    Stages events TIME-sorted (the archival order — exactly the order
    that makes event_id min/max spans useless) with a bloom on the
    lookup key, then serves an IN-list point lookup through the
    bloom-enabled reader; the oracle states the same lookup
    relationally. The sibling test proves the physical claim: bloom
    offset+length present in the footer for the enrolled column only,
    membership answers correct through the parquet-mr bloom API, and
    the no-bloom control file is smaller.

    At 100 TB: blooms are THE practical secondary index on object
    storage — no extra files, no compaction debt, read-side skip
    decided per row group from footer bytes alone."""
    events = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"bloom_events-{uuid.uuid4().hex[:8]}",
    )
    staged = events.select(
        "event_id",
        "event_type",
        "value",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        (F.col("event_id") + F.lit(BLOOM_KEY_OFFSET)).alias("lookup_key"),
    ).sortWithinPartitions("ms")
    (
        staged.coalesce(4)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#lookup_key", "true")
        .option("parquet.bloom.filter.expected.ndv#lookup_key", "100000")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    keys = [i + BLOOM_KEY_OFFSET for i in BLOOM_LOOKUP_IDS]
    result = (
        back.filter(F.col("lookup_key").isin(keys))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )
    # bounded: the fixed BLOOM_LOOKUP_IDS probe set
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "scan_nested_schema_pruning",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def scan_nested_schema_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED schema pruning + pushdown through struct columns — the
    scan discipline for the struct-heavy layouts real archives use
    (an `info struct<price, priority, clerk, comment>` envelope per
    order, the shape JSON-born data lands in): selecting
    `info.priority` and filtering on `info.price` must NOT read the
    whole struct. Orders are rewritten with a 4-field struct envelope;
    the query touches two leaves, and the op HARD-FAILS unless the
    executed plan's ReadSchema contains a PRUNED struct (the envelope
    with only the two referenced leaves — no clerk/comment) — the
    `spark.sql.optimizer.nestedSchemaPruning.enabled` contract,
    asserted on evidence, not configuration. The oracle states the
    same profile over the flat table, so the struct round-trip is also
    value-checked.

    At 100 TB the difference is reading 2 of 4 struct leaves (parquet
    stores leaves as independent column chunks) — same win as flat
    column pruning, commonly LOST the moment anyone materializes the
    full struct first; this op is the regression trip-wire."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        f"nested-{uuid.uuid4().hex[:8]}",
    )
    orders = load(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
        ).alias("info"),
    )
    nested.write.mode("overwrite").parquet(base)

    df = spark.read.parquet(base)
    result = (
        df.filter(F.col("info.price") > 100000)
        .groupBy(F.col("info.priority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("info.price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
    )
    plan = result._jdf.queryExecution().executedPlan().toString()
    # ReadSchema must show the pruned struct: price+priority only.
    import re as _re  # noqa: PLC0415

    m = _re.search(r"ReadSchema: ([^\n]*)", plan)
    schema_line = m.group(1) if m else ""
    if "custkey" in schema_line or "status" in schema_line:
        raise RuntimeError(
            f"nested pruning failed — full struct read: {schema_line}"
        )
    if "price" not in schema_line or "priority" not in schema_line:
        raise RuntimeError(
            f"nested pruning evidence missing from plan: {schema_line}"
        )
    # bounded: the pruned per-year report frame (<= 8 rows)
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)
