"""Scalar-function operators: string / date / math / conditional / json /
array / struct / map.

Reference parity: A14 date arithmetic (main.go:177), A15 string
split/trim (main.go:156-159), A18 formatting (main.go:220-223). All of
these are Catalyst expressions inside whole-stage codegen — no Python in
the hot path, so they cost the same per-row at sf0.01 and at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_tokens,
           upper(string_split(p_name, ' ')[1]) AS first_token,
           length(p_name) AS name_len,
           concat(trim(p_brand), '|', p_type) AS brand_type
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/trim/upper/length/concat (reference A15, main.go:156-159 —
    the config-parsing string ops, applied as columnar expressions)."""
    part = load(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.upper(toks.getItem(0)).alias("first_token"),
        F.length("p_name").alias("name_len"),
        F.concat(F.trim(F.col("p_brand")), F.lit("|"), F.col("p_type")).alias(
            "brand_type"
        ),
    )


@register(
    "string_levenshtein",
    oracle="""
    SELECT levenshtein(p_type, 'STANDARD') AS dist, COUNT(*) AS n_parts
    FROM part
    GROUP BY dist
    """,
)
def string_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance histogram vs a reference string (fuzzy matching /
    typo clustering primitive; identical DP algorithm in both engines)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy(F.levenshtein(F.col("p_type"), F.lit("STANDARD")).alias("dist"))
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "string_regexp",
    oracle="""
    SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
           COUNT(*) AS n_parts,
           MIN(regexp_replace(p_name, '[aeiou]', '_', 'g')) AS sample_devoweled
    FROM part
    GROUP BY brand_num
    """,
)
def string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (capture group → int) + regexp_replace (global).
    MIN of the devoweled name keeps the output deterministic per group."""
    part = load(spark, sf_dir, "part")
    return part.groupBy(
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num")
    ).agg(
        F.count("*").alias("n_parts"),
        F.min(F.regexp_replace("p_name", "[aeiou]", "_")).alias("sample_devoweled"),
    )


@register(
    "date_parts_format",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           strftime(o_orderdate, '%Y-%m') AS order_ym,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY order_year, order_month, order_ym
    """,
)
def date_parts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + formatting (reference A11/A18 partition
    keying, main.go:220-223)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        )
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "date_arith_retention",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_recent
    FROM orders
    WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 90 DAY
    GROUP BY o_orderstatus
    """,
)
def date_arith_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention cutoff (reference A14, main.go:177: now − 90 days)
    anchored to max(o_orderdate) instead of wall-clock (G9). The 1-row
    max aggregate joins in via broadcast — no driver-side collect."""
    orders = load(spark, sf_dir, "orders")
    max_date = orders.agg(F.max("o_orderdate").alias("max_date"))
    return (
        orders.crossJoin(F.broadcast(max_date))
        .filter(F.col("o_orderdate") >= F.col("max_date") - F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_recent"))
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(abs(l_discount - 0.05), 4) AS disc_dev,
           round(sqrt(l_quantity), 4) AS qty_sqrt,
           round(pow(l_quantity, 2), 1) AS qty_sq
    FROM lineitem
    WHERE l_quantity >= 49
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/pow — IEEE double ops are bit-identical
    across engines; rounding normalizes display-scale differences."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 1).alias("qty_sq"),
    )


@register(
    "case_when",
    oracle="""
    SELECT CASE o_orderstatus
             WHEN 'F' THEN 'finished'
             WHEN 'O' THEN 'open'
             ELSE 'pending'
           END AS status_label,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY status_label
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.when(F.col("o_orderstatus") == "F", "finished")
            .when(F.col("o_orderstatus") == "O", "open")
            .otherwise("pending")
            .alias("status_label")
        )
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (events.props is
    '{"k": <int>}'). get_json_object stays JVM-side."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
    )


@register(
    "json_variant_shred",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           COUNT(*) FILTER (
               WHERE json_extract_string(props, '$.absent') IS NULL
           ) AS n_absent
    FROM events
    GROUP BY event_type
    """,
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type — the
    open-format answer to JSON-string columns: `parse_json` builds a
    binary variant ONCE per row (instead of `get_json_object` re-
    parsing the string for every path), then `variant_get` extracts
    typed paths with cast semantics and `try_variant_get`/missing
    paths yield NULL instead of raising. At 100 TB the difference is
    real: one parse feeding N typed extractions, binary-encoded values
    that skip string re-tokenization, and a column that parquet can
    shred into typed subcolumns (VARIANT shredding). The aggregate
    shape matches `json_extract` so the two are directly comparable;
    the oracle recomputes everything from raw JSON strings in DuckDB.
    """
    events = load(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("variant_get(v, '$.k', 'int')")).alias("sum_k"),
        F.min(F.expr("variant_get(v, '$.k', 'int')")).alias("min_k"),
        F.count(
            F.when(F.expr("try_variant_get(v, '$.absent', 'int')").isNull(), 1)
        ).alias("n_absent"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           MAX(len(embedding)) AS dim,
           ROUND(CAST(MIN(list_min(embedding)) AS DOUBLE), 4) AS min_val,
           ROUND(CAST(MAX(list_max(embedding)) AS DOUBLE), 4) AS max_val
    FROM embeddings
    GROUP BY label
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / element min-max over the embedding column. min/max
    select existing float32 values; cast to double before rounding
    (float32 round keeps float32 noise otherwise — G4)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.max(F.size("embedding")).alias("dim"),
        F.round(F.min(F.array_min("embedding")).cast("double"), 4).alias("min_val"),
        F.round(F.max(F.array_max("embedding")).cast("double"), 4).alias("max_val"),
    )


@register(
    "array_higher_order",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(len(list_filter(embedding, x -> x > 0))) AS BIGINT) AS n_positive,
           ROUND(CAST(MAX(list_sum(list_transform(embedding,
                 x -> CAST(abs(x) AS DOUBLE)))) AS DOUBLE), 4) AS max_l1_norm
    FROM embeddings
    GROUP BY label
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter / transform / fold) over the
    embedding vectors: positive-component counts and max L1 norm per
    label. All JVM-side lambda evaluation — the same machinery the
    similarity ops build on."""
    emb = load(spark, sf_dir, "embeddings")
    l1 = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum(n_pos).alias("n_positive"),
        F.round(F.max(l1).cast("double"), 4).alias("max_l1_norm"),
    )


@register(
    "struct_nested",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer
    GROUP BY segment
    """,
)
def struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build struct(custkey, segment) and extract a field back out —
    result-equivalent to grouping on the raw column (the oracle), but
    the Spark plan exercises nested-type construction and field access.
    """
    customer = load(spark, sf_dir, "customer")
    return (
        customer.select(
            F.struct(F.col("c_custkey"), F.col("c_mktsegment")).alias("cust")
        )
        .select(F.col("cust").getField("c_mktsegment").alias("segment"))
        .groupBy("segment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "map_funcs",
    oracle="""
    SELECT CASE o_orderstatus
             WHEN 'F' THEN 'finished'
             WHEN 'O' THEN 'open'
             WHEN 'P' THEN 'pending'
           END AS status_label,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY status_label
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-literal lookup (create_map + element_at). The oracle is the
    result-equivalent CASE mapping (DuckDB map syntax differs)."""
    orders = load(spark, sf_dir, "orders")
    status_map = F.create_map(
        F.lit("F"), F.lit("finished"),
        F.lit("O"), F.lit("open"),
        F.lit("P"), F.lit("pending"),
    )
    return (
        orders.select(
            F.element_at(status_map, F.col("o_orderstatus")).alias("status_label")
        )
        .groupBy("status_label")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "string_collation_groupby",
    oracle="""
    WITH cased AS (
        SELECT CASE substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                 WHEN '0' THEN upper(event_type)
                 WHEN '1' THEN upper(event_type)
                 WHEN '2' THEN upper(substring(event_type, 1, 1))
                               || substring(event_type, 2)
                 WHEN '3' THEN upper(substring(event_type, 1, 1))
                               || substring(event_type, 2)
                 ELSE event_type END AS raw
        FROM events
    )
    SELECT lower(raw) AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_case_variants
    FROM cased
    GROUP BY lower(raw)
    ORDER BY event_type
    """,
)
def string_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a feed whose
    producers disagree on casing ('purchase' / 'Purchase' / 'PURCHASE'
    — deterministically re-cased here off an md5 band so the fixture
    exhibits the mess) is aggregated under the UTF8_LCASE collation,
    so the GROUP BY itself is case-insensitive — the engine-native
    form of the lower()-wrapping workaround, and unlike the wrapper it
    also drives joins, ORDER BY, and comparisons once the column's
    collation is declared. The group representative under a collation
    is whichever variant a task saw first (nondeterministic), so the
    output key is normalized with lower() — the oracle states the
    whole thing relationally with lower() grouping, pinning that
    collated grouping loses/merges nothing vs the classic rewrite.
    `n_case_variants` counts the raw spellings each group absorbed
    (binary-distinct inside a collated group).

    Scale: identical plan to any single-key agg — partial agg then a
    |event types|-bounded shuffle; collation compares stay JVM-side
    (ICU/UTF8 comparators in codegen), no Python."""
    events = load(spark, sf_dir, "events")
    c1 = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    raw = (
        F.when(c1.isin("0", "1"), F.upper("event_type"))
        .when(
            c1.isin("2", "3"),
            F.concat(
                F.upper(F.expr("substring(event_type, 1, 1)")),
                F.expr("substring(event_type, 2)"),
            ),
        )
        .otherwise(F.col("event_type"))
    )
    cased = events.select(raw.alias("raw"))
    return (
        cased.groupBy(F.expr("collate(raw, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct(F.expr("collate(raw, 'UTF8_BINARY')"))
            .cast("bigint")
            .alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k").cast("string")).alias("event_type"),
            "n_events",
            "n_case_variants",
        )
        .orderBy("event_type")
    )
