"""UDF / UDAF / UDTF surface.

The escape hatches, in preference order (SURVEY.md §2.B UDF block):

  built-in expression  — always first choice (everything else in this
                         repo); whole-stage codegen, zero Python cost
  pandas_udf           — Arrow-batched, vectorized; ~10-100× faster
                         than row UDFs; for numeric kernels Spark lacks
  grouped-agg pandas   — custom aggregates over Arrow group batches
  Python UDTF          — table-generating functions (Spark ≥3.5)
  row Python UDF       — last resort; kept here only as the contract's
                         demonstration op

Each op's oracle is the equivalent relational form, proving the UDF
computes a well-defined function rather than something opaque.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf, udtf

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@udf(returnType=T.StringType())
def _value_category(value: float) -> str:
    """Row-at-a-time Python UDF (deliberately: the contract op for the
    slow path — every other operator avoids this)."""
    if value is None:
        return "unknown"
    if value < 50:
        return "low"
    if value < 150:
        return "mid"
    return "high"


@register(
    "udf_python_scalar",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS category,
           COUNT(*) AS n_events
    FROM events
    GROUP BY category
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(_value_category("value").alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n_events"))
    )


@pandas_udf(T.DoubleType())
def _double_value(v: pd.Series) -> pd.Series:
    """Arrow-batched vectorized kernel: whole Series in, whole Series
    out — one Python call per batch, not per row."""
    return (v * 2).round(2)


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, ROUND(value * 2, 2) AS value_x2
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select("event_id", _double_value("value").alias("value_x2"))


@pandas_udf(T.DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg pandas UDF: quantity-weighted mean extendedprice."""
    return float((price * qty).sum() / qty.sum())


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            _weighted_avg_price("l_extendedprice", "l_quantity").cast("double"), 2
        ).alias("weighted_avg_price")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one user's events in, z-scored values out.
    ddof=1 matches SQL stddev_samp.

    Degenerate groups (single row → std NaN; constant values → std 0)
    emit 0.0, and the ORACLE coalesces its NULL stddev path to 0.0 to
    match — both engines must agree on a concrete sentinel because
    nullable numeric outputs are banned by G13 (the driver's pandas
    fetch turns oracle NULL into NaN while Spark collect keeps None)."""
    sd = pdf["value"].std(ddof=1)
    mean = pdf["value"].mean()
    out = pdf[["event_id", "user_id"]].copy()
    out["zscore"] = ((pdf["value"] - mean) / sd).round(4) if sd and sd > 0 else 0.0
    return out


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN stddev_samp(value) OVER w > 0
                THEN ROUND((value - AVG(value) OVER w)
                           / stddev_samp(value) OVER w, 4)
                ELSE 0.0
           END AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization. Each
    group arrives as one Arrow-backed pandas frame — the pattern for
    per-entity kernels Spark expressions can't write (model scoring,
    signal processing). The oracle is the relational equivalent
    (windowed mean/stddev), proving the Python kernel computes a
    well-defined function."""
    events = load(spark, sf_dir, "events")
    return events.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _zscore_group, schema="event_id long, user_id long, zscore double"
    )


@udtf(returnType="doc_id: bigint, word: string")
class _SplitWords:
    """Python UDTF: one document row in, one row per word out — the
    table-function form of explode(split(...))."""

    def eval(self, doc_id: int, text: str):
        if text:
            for word in text.split(" "):
                yield doc_id, word


@register(
    "udtf_split",
    oracle="""
    SELECT COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_distinct
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    """,
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    spark.udtf.register("split_words", _SplitWords)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_distinct
        FROM docs_for_udtf,
             LATERAL split_words(doc_id, text) AS t(doc_id2, word)
        """
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS category,
           COUNT(*) AS n_events
    FROM events
    GROUP BY category
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same banding logic as `udf_python_scalar`, through Spark 4's
    ARROW-OPTIMIZED Python UDF (`useArrow=True`): rows cross the
    JVM↔Python boundary as Arrow batches instead of pickled one at a
    time, closing most of the gap to pandas UDFs while keeping the
    simple scalar-function authoring model. Completes the UDF-surface
    ladder the engine documents: row-pickle UDF (slowest, contract
    demo) → Arrow-optimized UDF (this) → pandas UDF (vectorized) →
    built-in Catalyst expressions (the real hot path, no Python at
    all)."""
    events = load(spark, sf_dir, "events")

    @F.udf(returnType="string", useArrow=True)
    def band(value: float) -> str:
        if value < 50:
            return "low"
        if value < 150:
            return "mid"
        return "high"

    return (
        events.select(band("value").alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n_events"))
    )


class _TopTokensUDTF:
    """Python UDTF with a dynamic output schema via the static
    ``analyze`` method (Spark ≥ 3.5 / 4.x): the column NAMES are
    computed from a constant argument at PLAN time — the polymorphic
    table-function surface (one UDTF serving many shapes) that static
    returnType UDTFs (udtf_split) cannot express."""

    @staticmethod
    def analyze(doc_id, text, k):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        n = k.value
        fields = [StructField("doc_id", LongType())]
        for i in range(n):
            fields.append(StructField(f"tok_{i + 1}", StringType()))
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, doc_id: int, text: str, k: int):
        toks = (text or "").split(" ")
        row = [doc_id] + [
            toks[i] if i < len(toks) else "" for i in range(k)
        ]
        yield tuple(row)


@register(
    "udtf_analyze_dynamic",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks
        FROM documents
    )
    SELECT doc_id,
           COALESCE(toks[1], '') AS tok_1,
           COALESCE(toks[2], '') AS tok_2,
           COALESCE(toks[3], '') AS tok_3
    FROM t
    """,
)
def udtf_analyze_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: the output schema (3 leading-token
    columns here) is decided by the UDTF's ``analyze`` hook from a
    constant argument at plan time — completing the UDTF surface next
    to the static-schema udtf_split. Execution is still Arrow-batched
    rows through one LATERAL pass; at 100 TB the cost model equals any
    narrow per-row map (no shuffle), and the plan-time schema means
    downstream pruning/codegen see ordinary typed columns."""
    from pyspark.sql.functions import lit, udtf as _udtf

    dyn = _udtf(_TopTokensUDTF)
    spark.udtf.register("top_tokens", dyn)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_for_dyn_udtf")
    return spark.sql(
        """
        SELECT t.doc_id, t.tok_1, t.tok_2, t.tok_3
        FROM docs_for_dyn_udtf,
             LATERAL top_tokens(doc_id, text, 3) AS t
        """
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT event_id,
           CAST(value AS DOUBLE) * 1.1 + 5.0 AS adjusted
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — the batch-STREAMING form of the
    scalar pandas UDF (udf_pandas_scalar): the worker receives an
    iterator over Arrow batches and yields transformed batches, letting
    expensive one-time state (a model handle, a codec table — here the
    (rate, fee) pair standing in for it) initialize ONCE per partition
    instead of once per batch. That amortization is the entire point of
    this variant at 100 TB: per-task setup cost is O(1), not
    O(batches). The oracle pins the arithmetic relationally."""
    # NOTE: module-level ``from __future__ import annotations`` turns
    # hints into strings, which pandas_udf's hint sniffing rejects for
    # the iterator form — pass the eval type explicitly instead.
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.SCALAR_ITER)
    def adjust(batches):
        rate, fee = 1.1, 5.0  # once-per-task init (model-load stand-in)
        for s in batches:
            yield s * rate + fee

    events = load(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id", adjust(F.col("value").cast("double")).alias("adjusted")
    )


def _reconcile(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
    """Cogroup kernel: one order's header rows and its lineitem rows
    arrive as two aligned pandas frames; emit the reconciliation row.
    Integer arithmetic only (quantities are integral) so the result is
    exact and engine-independent."""
    n_lines = len(lines_pdf)
    sum_qty = int(lines_pdf["l_quantity"].astype("int64").sum()) if n_lines else 0
    return pd.DataFrame(
        {
            "o_orderkey": orders_pdf["o_orderkey"].iloc[:1],
            "o_custkey": orders_pdf["o_custkey"].iloc[:1],
            "n_lines": [n_lines],
            "sum_qty": [sum_qty],
        }
    )


@register(
    "udf_cogroup_pandas",
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT)
               AS sum_qty
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_custkey < 50
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def udf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map applyInPandas (the two-sided escape hatch): orders
    and their lineitems are co-partitioned on orderkey and handed to a
    pandas kernel AS A PAIR of aligned frames — the API for custom
    merge logic a join can't express (as-of matching, interval
    reconciliation, per-key diffing). The kernel here reconciles each
    order against its lines INCLUDING line-less orders (the left-outer
    case cogroup gives for free: the right frame arrives empty), and
    the oracle proves it equals the LEFT JOIN + GROUP BY relational
    form.

    Scale shape: ONE co-partitioning shuffle on the key for each side —
    identical exchange topology to a shuffle join — then Arrow-batched
    per-key kernels; the custkey pushdown prunes both scans before the
    shuffle. The Python boundary is per-GROUP, so keep kernels for
    logic expressions can't say (here it could be a join — that's what
    makes it oracle-checkable; udf surface contract op)."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select("o_orderkey", "o_custkey")
    )
    lines = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    # Prune the lineitem side to the filtered orders' keys BEFORE the
    # cogroup shuffle (semi-join; at 100 TB this is the bloom/DPP path)
    lines = lines.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            _reconcile,
            "o_orderkey long, o_custkey long, n_lines long, sum_qty long",
        )
    )


def _arrow_norms(batches):
    """mapInArrow kernel: L2 norms straight off the Arrow buffers —
    zero pandas materialization, zero per-row Python. The list column's
    flat value buffer + offsets give a vectorized segmented reduction
    (np.add.reduceat), the idiomatic Arrow-native kernel shape."""
    import numpy as np
    import pyarrow as pa

    for b in batches:
        ids = b.column(b.schema.get_field_index("vec_id"))
        emb = b.column(b.schema.get_field_index("embedding"))
        flat = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        offs = emb.offsets.to_numpy()[: len(emb) + 1]
        sq = flat * flat
        sums = np.add.reduceat(sq, offs[:-1]) if len(flat) else np.array([])
        # reduceat quirk: an empty segment copies the next element —
        # embeddings are fixed-dim non-empty, assert rather than guess
        assert (np.diff(offs) > 0).all()
        norms = np.round(np.sqrt(sums), 4)
        yield pa.RecordBatch.from_arrays(
            [ids, pa.array(norms, type=pa.float64())],
            ["vec_id", "l2_norm"],
        )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(
               embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
           ))), 4) AS l2_norm
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python escape hatch: the
    kernel receives raw ``pyarrow.RecordBatch``es (no pandas
    conversion, unlike mapInPandas) and reduces the embedding list
    column's flat value buffer with a vectorized segmented numpy
    reduction. Per-vector L2 norms are the normalization pass every
    embedding pipeline runs before cosine/IVF indexing
    (functions/similarity.py consumes unit-normalized scores).

    Escape-hatch ladder (module docstring) extended: mapInArrow sits
    BELOW pandas_udf — same Arrow transfer, minus the arrow→pandas→
    arrow copies, so it wins when the kernel is pure numpy over flat
    buffers. Plan: one embarrassingly-parallel map stage, no shuffle;
    the 4-dp round pins the oracle against summation-order drift."""
    from pg_archiver_spark.catalog import load as _load

    emb = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(_arrow_norms, "vec_id long, l2_norm double")


@register(
    "udf_sql_declarative",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS net_revenue
    FROM lineitem
    WHERE l_extendedprice * (1.0 - l_discount) > 1000.0
    GROUP BY l_returnflag
    """,
)
def udf_sql_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DECLARED scalar function (``CREATE FUNCTION … RETURN expr``,
    Spark 3.5+) — the missing rung at the TOP of the escape-hatch
    ladder (module docstring): a reusable, named user function that
    stays a catalyst EXPRESSION, so unlike every Python UDF variant it
    inlines into whole-stage codegen, pushes through filters, and
    costs literally nothing at 100 TB. The first thing to try when a
    user asks for a UDF is to not write one — this op pins that the
    declared function's plan is Python-free (tests assert no
    BatchEvalPython/ArrowEvalPython node) and the oracle states the
    inlined expression directly.

    net_revenue(price, disc) is the archiver's derived-metric example,
    used in the WHERE — the inlining means the predicate is an
    ordinary expression the optimizer can reason about. (The SUM uses
    the decimal-input form directly: casting the function's DOUBLE
    product to decimal rounds differently across engines — the G11
    trap — so exact money math keeps decimals from the inputs up.)"""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sqlfn_li")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_revenue(
            price DOUBLE, disc DOUBLE
        ) RETURNS DOUBLE RETURN price * (1.0 - disc)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS net_revenue
        FROM sqlfn_li
        WHERE net_revenue(l_extendedprice, l_discount) > 1000.0
        GROUP BY l_returnflag
        """
    )


class _SessionGapStats:
    """Python UDTF consuming a TABLE ARGUMENT with PARTITION BY /
    ORDER BY: Spark instantiates one UDTF per partition key and feeds
    it that user's rows in time order — the engine-managed form of
    'sequential scan per entity' that applyInPandasWithState provides
    for streams, here on the batch SQL surface."""

    def __init__(self):
        self._user = None
        self._n = 0
        self._gaps = 0
        self._max_gap = 0
        self._last = None

    def eval(self, row):
        self._user = row["user_id"]
        ms = row["ms"]
        if self._last is not None:
            gap = ms - self._last
            if gap > 3_600_000:
                self._gaps += 1
            if gap > self._max_gap:
                self._max_gap = gap
        self._last = ms
        self._n += 1

    def terminate(self):
        if self._user is not None:
            yield self._user, self._n, self._gaps, self._max_gap


@register(
    "udtf_table_arg",
    oracle="""
    WITH seq AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ) AS gap
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap > 3600000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_ms
    FROM seq
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4 SQL surface):
    `gap_stats(TABLE(v) PARTITION BY user_id ORDER BY ms)` hands the
    UDTF one ENTITY AT A TIME in timestamp order — per-user gap
    statistics computed by a plain sequential Python loop, with the
    engine owning the shuffle (PARTITION BY) and the in-partition sort
    (ORDER BY). This is the third member of the UDTF ladder: static
    schema (udtf_split) → plan-time polymorphic schema
    (udtf_analyze_dynamic) → table-argument iteration (this).

    The oracle states the same statistics relationally (LAG window +
    group), so the partition routing, ordering contract, and
    per-partition instance lifecycle (fresh __init__ per user,
    terminate() emission) are all hash-checked.

    At 100 TB: one shuffle on the entity key — identical movement to
    the window formulation; use the UDTF form when the per-entity
    logic is genuinely sequential (state machines, parsers) and the
    window form when it's expressible as frames (stay JVM-side)."""
    events = load(spark, sf_dir, "events")
    spark.udtf.register("gap_stats", F.udtf(
        _SessionGapStats,
        returnType="user_id bigint, n_events bigint, n_gaps bigint,"
        " max_gap_ms bigint",
    ))
    events.select(
        "user_id", F.expr("ts_ns DIV 1000000").alias("ms"), "event_id"
    ).createOrReplaceTempView("events_for_gap_udtf")
    return spark.sql(
        """
        SELECT user_id, n_events, n_gaps, max_gap_ms
        FROM gap_stats(TABLE(events_for_gap_udtf)
                       PARTITION BY user_id ORDER BY (ms, event_id))
        ORDER BY user_id
        """
    )


@register(
    "udtf_arrow_char_ngrams",
    oracle="""
    WITH pos AS (
        SELECT text, unnest(range(1, length(text) - 1)) AS i
        FROM documents WHERE length(text) >= 3
    ),
    grams AS (
        SELECT substring(text, CAST(i AS INTEGER), 3) AS trigram FROM pos
    )
    SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams
    GROUP BY trigram
    ORDER BY n DESC, trigram
    LIMIT 20
    """,
)
def udtf_arrow_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED Python UDTF (Spark 4's `useArrow=True`) — the
    last rung of the UDTF performance ladder (udtf_split = pickled
    row-at-a-time, udtf_analyze_dynamic = plan-time schema,
    udtf_table_arg = partitioned table input; this one moves the
    row transport to Arrow batches, the same serialization jump that
    separates `udf_python_scalar` from `udf_pandas_scalar`). The
    function itself is the character-trigram expander a langid/
    fingerprinting stage uses — a row-multiplying transform (doc →
    len−2 rows) that SQL can only express with a LATERAL series join,
    which is exactly what the DuckDB oracle does, pinning the
    expansion row-for-row. Top-20 profile with deterministic (count
    DESC, trigram) ordering.

    Scale: the UDTF runs per input partition with Arrow transfer and
    no shuffle of its own; the trigram agg behind it partial-aggs the
    |Σ^3|-bounded vocabulary. The Python boundary is per-batch, not
    per-row — at 100 TB the cost model matches the Pandas-UDF ops,
    and a pure-JVM rewrite (sequence + explode + substring) remains
    the zero-Python alternative the docstring names for the hot
    path."""

    @udtf(returnType="trigram string", useArrow=True)
    class CharTrigrams:
        def eval(self, text: str):
            if text is None or len(text) < 3:
                return
            for i in range(len(text) - 2):
                yield (text[i : i + 3],)

    spark.udtf.register("char_trigrams_arrow", CharTrigrams)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_for_ngrams")
    return spark.sql(
        """
        SELECT g.trigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM docs_for_ngrams d,
             LATERAL char_trigrams_arrow(d.text) g
        GROUP BY g.trigram
        ORDER BY n DESC, g.trigram
        LIMIT 20
        """
    )
