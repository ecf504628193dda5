"""Data-curation operators — the training-data governance surface.

Rounds out the pipeline family (functions/pipeline.py) with the
curation steps a pre-training corpus build runs between raw ingest and
tokenization:

  benchmark contamination  — flag training docs whose shingle set is
                             substantially contained in an eval doc
  token-budget sampling    — deterministic prefix of the corpus up to a
                             global token budget (two-phase scan, no
                             single-partition cumsum)
  per-domain quotas        — cap documents per source deterministically
  PII redaction            — regex scrub with per-language audit counts
  train/val/test split     — stratified deterministic hash split
  repetition scoring       — duplicate-token ratio per language
  document chunking        — fixed-size token windows with stride
  sequence packing         — assign docs to fixed-length training
                             sequences by global token cumsum
  source-mixture sampling  — per-source weighted keep rates
  keep-best dedup          — prefix-fingerprint groups keep their
                             highest-quality member, not an arbitrary one
  quality-weighted sample  — deterministic hash-band keep rates by
                             document-quality tier

All stages are built-in Spark expressions (no Python row path); each
op's oracle re-states the semantics in ANSI SQL over the same parquet.
Generalizes the reference's single extract query (main.go:99-129) the
same way the rest of the §2.B surface does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load, load_spread
from pg_archiver_spark.functions.dedup import _shingles
from pg_archiver_spark.registry import register

# Benchmark membership: md5(doc_id) first hex char c-f (a deterministic
# ~25% slice standing in for an eval suite). Containment ≥ 0.5 sits in
# the fixture's similarity gap (planted near-dup pairs ≥0.9, background
# ≤~0.2 — same gap dedup_ngram_jaccard uses).
_BENCH_CHARS = ("c", "d", "e", "f")
CONTAINMENT_THRESHOLD = 0.5
# Exact rational form (== CONTAINMENT_THRESHOLD) for integer threshold
# predicates: n/t >= 1/2  ⟺  2·n >= t (r12 sweep — no double cast in
# keep/drop logic).
CONTAINMENT_T_NUM, CONTAINMENT_T_DEN = 1, 2

TOKEN_BUDGET = 12_000
DOMAIN_QUOTA = 15
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
SEQ_LEN = 512

_MD5 = "md5(CAST(doc_id AS VARCHAR))"


def _with_global_running(docs: DataFrame) -> DataFrame:
    """Add a ``running`` column: the exact global cumulative sum of
    ``n_tokens`` in ``(m, doc_id)`` order, where ``m`` is the doc's md5
    hex — WITHOUT a single-partition global window.

    Two-phase scan: (1) per-bucket token subtotals over the md5's first
    two hex chars (256 buckets), prefix-summed on a 256-row frame;
    (2) the within-bucket running sum, offset by the bucket's prefix.
    Equal to the global cumsum because the bucket IS the md5 prefix, so
    bucket order == global order; every partition-sized piece of work
    is bounded by corpus/256."""
    docs = docs.withColumn("bucket", F.substring("m", 1, 2))
    offsets = (
        docs.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bucket_total").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    w = Window.partitionBy("bucket").orderBy("m", "doc_id")
    return docs.join(F.broadcast(offsets), "bucket").withColumn(
        "running", F.sum("n_tokens").over(w) + F.col("offset")
    )


@register(
    "pipeline_contamination",
    # Oracle-contract note: the Spark side intersects xxhash64-hashed
    # shingles (dedup._shingles) while DuckDB (no xxhash64 built-in)
    # intersects the string shingles. Equality of n_common/t_n therefore
    # assumes zero 64-bit collisions WITHIN one document pair's shingle
    # sets — w.h.p. true (a pair has ≲10^2 shingles; P[collision]
    # ≈ k²/2^65 ≈ 1e-16), and a collision could only flip a doc across
    # the 0.5 threshold if its true containment were exactly at the
    # boundary, which the fixture's similarity gap (≥0.9 planted vs
    # ≤0.2 background) keeps far away.
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               substring({_MD5}, 1, 1) IN ('c','d','e','f') AS is_bench,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - 2),
                   i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')
               )) AS shingles
        FROM documents
        WHERE len(string_split(text,' ')) >= 3
    ),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM d t, d b
        WHERE NOT t.is_bench AND b.is_bench
          AND {CONTAINMENT_T_DEN} * len(list_intersect(t.shingles, b.shingles))
              >= {CONTAINMENT_T_NUM} * len(t.shingles)
    )
    SELECT lang,
           COUNT(*) FILTER (WHERE NOT is_bench) AS n_train,
           COUNT(*) FILTER (WHERE is_bench) AS n_benchmark,
           COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM contaminated))
               AS n_contaminated
    FROM d
    GROUP BY lang
    """,
)
def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: a training document is
    contaminated when ≥50% of its 3-token shingles appear in some
    benchmark document (n-gram containment, the standard eval-leak
    test). Pairs meet through a shared-shingle equi-join — train and
    benchmark docs with no common shingle never meet, and the benchmark
    side is a small fraction of the corpus, so the join is bipartite
    and bounded (at 100 TB the benchmark side's exploded shingles are a
    broadcast- or bloom-filter-sized table, not a shuffle)."""
    docs = load_spread(spark, sf_dir, "documents")
    d = (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            "lang",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            .isin(*_BENCH_CHARS)
            .alias("is_bench"),
            _shingles(F.col("text")).alias("shingles"),
        )
        # Not cached: same session-storage-leak reasoning as
        # pipeline_decontaminate_13gram below (ADVICE r9 #4) — the
        # shingle arrays dominate the op's footprint and the returned
        # DataFrame is lazy, so there is no unpersist point.
    )
    ex = d.select(
        "doc_id",
        "is_bench",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    train = ex.filter(~F.col("is_bench")).select(
        F.col("doc_id").alias("t_id"), F.col("n_sh").alias("t_n"), "shingle"
    )
    bench = ex.filter(F.col("is_bench")).select(
        F.col("doc_id").alias("b_id"), "shingle"
    )
    contaminated = (
        train.join(bench, "shingle")
        .groupBy("t_id", "b_id", "t_n")
        .agg(F.count("*").alias("n_common"))
        # integer-exact threshold (r12 sweep)
        .filter(
            F.col("n_common") * CONTAINMENT_T_DEN
            >= F.col("t_n") * CONTAINMENT_T_NUM
        )
        .select(F.col("t_id").alias("doc_id"))
        .distinct()
    )
    flagged = d.join(contaminated.withColumn("hit", F.lit(True)), "doc_id", "left")
    return flagged.groupBy("lang").agg(
        F.count_if(~F.col("is_bench")).alias("n_train"),
        F.count_if(F.col("is_bench")).alias("n_benchmark"),
        F.count_if(F.col("hit").isNotNull()).alias("n_contaminated"),
    )


DECONTAM_NGRAM = 13  # Brown et al. 2020 (GPT-3, appendix C) gram order
DECONTAM_PAD = 10  # tokens excised on EACH side of a colliding 13-gram
DECONTAM_MIN_SPAN = 5  # clean fragments shorter than this are dropped


@register(
    "pipeline_decontaminate_13gram",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               substring({_MD5}, 1, 1) IN ('c','d','e','f') AS is_bench,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {DECONTAM_NGRAM - 1}),
                   i -> array_to_string(
                       string_split(text,' ')[i+1:i+{DECONTAM_NGRAM}], ' ')
               )) AS grams
        FROM documents
    ),
    ex AS (SELECT doc_id, lang, is_bench, unnest(grams) AS g FROM d),
    bg AS (SELECT DISTINCT g FROM ex WHERE is_bench),
    hits AS (
        SELECT e.doc_id, e.lang, e.g
        FROM ex e JOIN bg USING (g) WHERE NOT e.is_bench
    ),
    gl AS (SELECT lang, COUNT(DISTINCT g) AS dirty_grams
           FROM hits GROUP BY lang)
    SELECT d.lang,
           COUNT(*) FILTER (WHERE NOT is_bench) AS n_train,
           COUNT(*) FILTER (WHERE is_bench) AS n_benchmark,
           COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM hits))
               AS n_dirty,
           COALESCE(ANY_VALUE(gl.dirty_grams), 0) AS dirty_grams
    FROM d LEFT JOIN gl ON d.lang = gl.lang
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def pipeline_decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-BENCHMARK DECONTAMINATION at 13-gram granularity (VERDICT
    r8 item #7b) — the Brown et al. 2020 protocol (GPT-3 appendix C):
    a training document is DIRTY if it shares ANY exact 13-gram with
    any benchmark document; dirty docs are removed before training so
    eval scores measure generalization, not memorized leakage. The
    3-gram-containment sibling (pipeline_contamination, above) catches
    paraphrase-level leaks; this catches verbatim quote-level leaks at
    the industry-standard gram order. Output per language: train/bench
    doc counts, dirty-doc count, and the distinct colliding 13-gram
    count (the audit a data team reviews before committing a purge).

    Scale shape: the benchmark side is an eval suite — thousands of
    docs against a 100 TB corpus — so its distinct-13-gram table is
    broadcast- or bloom-filter-sized; the train side streams through
    one explode + equi-join (bipartite, no train×train pairing) and
    the per-doc verdict is a groupBy on doc_id. Docs shorter than 13
    tokens produce zero grams (guarded empty array, the
    text_ngram_novelty_decay idiom) but still count in n_train."""
    docs = load_spread(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.expr(
            f"CASE WHEN size(split(text,' ')) < {DECONTAM_NGRAM} "
            "THEN CAST(array() AS array<string>) ELSE "
            f"transform(sequence(0, size(split(text,' ')) - {DECONTAM_NGRAM}), "
            f"i -> array_join(slice(split(text,' '), i+1, {DECONTAM_NGRAM}), ' ')) "
            "END"
        )
    )
    d = docs.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_BENCH_CHARS)
        .alias("is_bench"),
        grams.alias("grams"),
    )
    # Deliberately NOT cached (ADVICE r9 #4): the gram arrays are the
    # largest intermediate in the op and a returned-lazy DataFrame has
    # no post-materialization point to unpersist them, so a cache here
    # accumulates executor storage across invocations in one session.
    # The consumers recompute split+transform, which is cheap relative
    # to the joins — same trade the spans variant makes.
    ex = d.select(
        "doc_id", "lang", "is_bench", F.explode("grams").alias("g")
    )
    bench_grams = ex.filter(F.col("is_bench")).select("g").distinct()
    # At 100 TB: broadcast(bench_grams) — eval suites stay tiny. At
    # fixture scale Spark's AQE already picks the broadcast side; the
    # explicit hint is omitted so the sf0.1 bench reflects AQE's plan.
    hits = (
        ex.filter(~F.col("is_bench"))
        .join(bench_grams, "g")
        .select("doc_id", "lang", "g")
    )
    dirty = hits.select("doc_id").distinct().withColumn("hit", F.lit(True))
    gl = hits.groupBy("lang").agg(
        F.countDistinct("g").alias("dirty_grams_l")
    )
    return (
        d.join(dirty, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count_if(~F.col("is_bench")).alias("n_train"),
            F.count_if(F.col("is_bench")).alias("n_benchmark"),
            F.count_if(F.col("hit").isNotNull()).alias("n_dirty"),
        )
        .join(gl, "lang", "left")
        .select(
            "lang",
            "n_train",
            "n_benchmark",
            "n_dirty",
            F.coalesce(F.col("dirty_grams_l"), F.lit(0).cast("bigint")).alias(
                "dirty_grams"
            ),
        )
        .orderBy("lang")
    )


def _decontam_cte(prefix: str = "") -> str:
    """Oracle mirror of _decontam_frames as CTE text: emits
    ``{prefix}d`` (doc_id, lang, is_bench, n_tok, toks),
    ``{prefix}kept`` (doc_id, lang, span_len — surviving clean
    fragments of colliding docs) and ``{prefix}dirty`` (doc_id, lang,
    n_tok — distinct colliding non-bench docs). The benchmark gram set
    always comes from the FULL documents table (the eval suite is an
    external fixed set, not part of any pipeline stage). ONE
    definition serves the standalone pipeline_decontaminate_spans
    oracle and the pipeline_pretraining_e2e chain."""
    p = prefix
    chars = ", ".join(f"'{c}'" for c in _BENCH_CHARS)
    return f"""{p}d AS (
        SELECT doc_id, lang,
               substring({_MD5}, 1, 1) IN ({chars}) AS is_bench,
               len(string_split(text,' ')) AS n_tok,
               string_split(text,' ') AS toks
        FROM documents
    ),
    {p}g AS (
        SELECT doc_id, lang, is_bench, n_tok,
               unnest(range(n_tok - {DECONTAM_NGRAM - 1})) AS i
        FROM {p}d
    ),
    {p}gx AS (
        SELECT g.doc_id, g.lang, g.is_bench, g.n_tok, g.i,
               array_to_string(
                   d.toks[g.i+1:g.i+{DECONTAM_NGRAM}], ' ') AS gram
        FROM {p}g g JOIN {p}d d ON g.doc_id = d.doc_id
    ),
    {p}bg AS (SELECT DISTINCT gram FROM {p}gx WHERE is_bench),
    {p}iv AS (
        SELECT DISTINCT e.doc_id, e.lang, e.n_tok,
               GREATEST(e.i - {DECONTAM_PAD}, 0) AS s,
               LEAST(e.i + {DECONTAM_NGRAM + DECONTAM_PAD}, e.n_tok) AS e
        FROM {p}gx e JOIN {p}bg USING (gram) WHERE NOT e.is_bench
    ),
    {p}isl0 AS (
        SELECT doc_id, lang, n_tok, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                   PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_isl
        FROM {p}iv
    ),
    {p}isl1 AS (
        SELECT *, SUM(new_isl) OVER (
                   PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS isl
        FROM {p}isl0
    ),
    {p}islands AS (
        SELECT doc_id, lang, n_tok, isl,
               MIN(s) AS s, MAX(e) AS e
        FROM {p}isl1 GROUP BY doc_id, lang, n_tok, isl
    ),
    {p}gaps AS (
        SELECT doc_id, lang,
               s - COALESCE(LAG(e) OVER (
                   PARTITION BY doc_id ORDER BY s), 0) AS span_len
        FROM {p}islands
        UNION ALL
        SELECT doc_id, lang, n_tok - MAX(e) AS span_len
        FROM {p}islands GROUP BY doc_id, lang, n_tok
    ),
    {p}kept AS (
        SELECT doc_id, lang, span_len FROM {p}gaps
        WHERE span_len >= {DECONTAM_MIN_SPAN}
    ),
    {p}dirty AS (
        SELECT DISTINCT doc_id, lang, n_tok FROM {p}iv
    )"""


@register(
    "pipeline_decontaminate_spans",
    oracle=f"""
    WITH {_decontam_cte()}
    SELECT dd.lang,
           CAST(COUNT(*) AS BIGINT) AS n_dirty_docs,
           CAST(COALESCE(ANY_VALUE(k.n_spans), 0) AS BIGINT)
               AS n_spans_kept,
           CAST(SUM(dd.n_tok) AS BIGINT) AS tokens_before,
           CAST(COALESCE(ANY_VALUE(k.tok_after), 0) AS BIGINT)
               AS tokens_after
    FROM dirty dd
    LEFT JOIN (SELECT lang, COUNT(*) AS n_spans,
                      SUM(span_len) AS tok_after
               FROM kept GROUP BY lang) k
        ON dd.lang = k.lang
    GROUP BY dd.lang
    ORDER BY dd.lang
    """,
)
def pipeline_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL eval decontamination — the surgery variant of the
    Brown et al. protocol actually used in production (GPT-3
    appendix C removes a window AROUND each collision and keeps the
    clean remainder, instead of discarding whole documents as
    pipeline_decontaminate_13gram does): excise DECONTAM_PAD tokens on
    each side of every benchmark-colliding 13-gram, merge overlapping
    excisions (gaps-and-islands, the dedup_repeated_substring_spans
    machinery), split the document at the excised intervals, and drop
    clean fragments shorter than DECONTAM_MIN_SPAN tokens. Output per
    language: dirty-doc count, surviving span count, and exact token
    counts before/after surgery — the data-retention audit that makes
    span surgery preferable to doc dropping (it saves most tokens of a
    lightly-contaminated document).

    Scale shape: gram positions explode once; the benchmark gram table
    is broadcast-sized (eval suites vs 100 TB corpus); interval union
    and gap extraction are doc_id-partitioned window functions over
    ONLY the colliding docs (a tiny fraction of the corpus) — nothing
    quadratic, all-integer arithmetic, bit-deterministic cross-engine.
    The per-doc frames are the shared _decontam_frames helper (funnel
    stage 3 of pipeline_pretraining_e2e)."""
    docs = load_spread(spark, sf_dir, "documents")
    _d, dirty, kept = _decontam_frames(docs)
    k = kept.groupBy("lang").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").cast("bigint").alias("tok_after"),
    )
    return (
        dirty.groupBy("lang")
        .agg(
            F.count("*").alias("n_dirty_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens_before"),
        )
        .join(k, "lang", "left")
        .select(
            "lang",
            "n_dirty_docs",
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("bigint")
            .alias("n_spans_kept"),
            "tokens_before",
            F.coalesce(F.col("tok_after"), F.lit(0))
            .cast("bigint")
            .alias("tokens_after"),
        )
        .orderBy("lang")
    )


def _decontam_frames(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(d, dirty, kept): the span-surgery frames of
    pipeline_decontaminate_spans, factored per doc so the standalone
    audit and pipeline_pretraining_e2e share one definition (oracle
    mirror: _decontam_cte). d: (doc_id, lang, is_bench, n_tok) for
    every doc; dirty: (doc_id, lang, n_tok) distinct colliding
    non-bench docs; kept: (doc_id, lang, span_len) their clean
    fragments of at least DECONTAM_MIN_SPAN tokens."""
    n_tok = F.size(F.split("text", " "))
    d = docs.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_BENCH_CHARS)
        .alias("is_bench"),
        n_tok.alias("n_tok"),
        F.expr(
            f"CASE WHEN size(split(text,' ')) < {DECONTAM_NGRAM} "
            "THEN CAST(array() AS array<struct<i:int,gram:string>>) ELSE "
            f"transform(sequence(0, size(split(text,' ')) - {DECONTAM_NGRAM}), "
            "i -> struct(CAST(i AS INT) AS i, "
            f"array_join(slice(split(text,' '), i+1, {DECONTAM_NGRAM}), ' ') AS gram)) "
            "END"
        ).alias("grams"),
    )
    gx = d.select(
        "doc_id",
        "lang",
        "is_bench",
        "n_tok",
        F.explode("grams").alias("pg"),
    ).select(
        "doc_id",
        "lang",
        "is_bench",
        "n_tok",
        F.col("pg.i").alias("i"),
        F.col("pg.gram").alias("gram"),
    )
    bench_grams = gx.filter(F.col("is_bench")).select("gram").distinct()
    iv = (
        gx.filter(~F.col("is_bench"))
        .join(bench_grams, "gram")
        .select(
            "doc_id",
            "lang",
            "n_tok",
            F.greatest(F.col("i") - DECONTAM_PAD, F.lit(0)).alias("s"),
            F.least(
                F.col("i") + (DECONTAM_NGRAM + DECONTAM_PAD), F.col("n_tok")
            ).alias("e"),
        )
        .distinct()
    )
    w_ord = Window.partitionBy("doc_id").orderBy("s", "e")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl1 = iv.withColumn(
        "new_isl",
        (
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-1))
        ).cast("int"),
    ).withColumn("isl", F.sum("new_isl").over(w_run))
    islands = isl1.groupBy("doc_id", "lang", "n_tok", "isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    w_isl = Window.partitionBy("doc_id").orderBy("s")
    gap_before = islands.select(
        "doc_id",
        "lang",
        (
            F.col("s") - F.coalesce(F.lag("e").over(w_isl), F.lit(0))
        ).alias("span_len"),
    )
    gap_tail = islands.groupBy("doc_id", "lang", "n_tok").agg(
        F.max("e").alias("max_e")
    ).select(
        "doc_id", "lang", (F.col("n_tok") - F.col("max_e")).alias("span_len")
    )
    kept = (
        gap_before.unionByName(gap_tail)
        .filter(F.col("span_len") >= DECONTAM_MIN_SPAN)
    )
    dirty = iv.select("doc_id", "lang", "n_tok").distinct()
    return (
        d.select("doc_id", "lang", "is_bench", "n_tok"),
        dirty,
        kept,
    )


@register(
    "pipeline_token_budget",
    oracle=f"""
    WITH ordered AS (
        SELECT lang, len(string_split(text,' ')) AS n_tokens,
               SUM(len(string_split(text,' ')))
                   OVER (ORDER BY {_MD5}, doc_id) AS running
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM ordered WHERE running <= {TOKEN_BUDGET}
    GROUP BY lang
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget sampling: shuffle the corpus by
    md5(doc_id) and keep the prefix whose running token count stays
    within the budget.

    A naive ``SUM() OVER (ORDER BY md5)`` is a single-partition global
    sort — the classic scale-killer. ``_with_global_running`` is the
    two-phase 256-bucket scan instead: same result as the global
    cumsum, but every partition-sized piece of work is bounded by
    corpus/256."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("m"),
    )
    running = _with_global_running(docs)
    return (
        running.filter(F.col("running") <= TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "pipeline_domain_quota",
    oracle=f"""
    WITH ranked AS (
        SELECT source, lang, len(string_split(text,' ')) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {_MD5}, doc_id) AS rk
        FROM documents
    )
    SELECT source,
           COUNT(*) FILTER (WHERE rk <= {DOMAIN_QUOTA}) AS n_kept,
           COUNT(*) AS n_total,
           CAST(SUM(n_tokens) FILTER (WHERE rk <= {DOMAIN_QUOTA}) AS BIGINT)
               AS kept_tokens
    FROM ranked
    GROUP BY source
    """,
)
def pipeline_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping: keep a deterministic md5-ordered head
    of at most DOMAIN_QUOTA documents per source — how a corpus build
    stops one crawl domain from dominating the mix. One shuffle on
    source; the rank window is per-source, so parallelism is the domain
    count (salt the rank's order key *within* source if one domain is
    huge — the quota head is order-stable under any within-source
    split)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("m"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy("m", "doc_id")
    )
    kept = F.col("rk") <= DOMAIN_QUOTA
    return (
        docs.withColumn("rk", rk)
        .groupBy("source")
        .agg(
            F.count_if(kept).alias("n_kept"),
            F.count("*").alias("n_total"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)
            ).cast("bigint").alias("kept_tokens"),
        )
    )


_EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
_PHONE_RE = r"555-[0-9]{4}"


@register(
    "pipeline_pii_redact",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, lang,
               CASE
                 WHEN doc_id % 10 = 0 THEN
                   text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com today'
                 WHEN doc_id % 10 = 1 THEN
                   text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
                 ELSE text
               END AS text
        FROM documents
    ),
    redacted AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phone,
               regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM injected
    )
    SELECT lang, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE n_email + n_phone > 0) AS n_docs_redacted,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(CASE WHEN n_email + n_phone > 0
                         THEN len(clean) ELSE 0 END) AS BIGINT)
               AS redacted_chars
    FROM redacted
    GROUP BY lang
    """,
)
def pipeline_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub with an audit trail: match emails and 555-prefixed
    phone numbers, replace with typed placeholders, report per-language
    counts. The fixture corpus is synthetic vocabulary with no PII, so
    the op deterministically injects tokens into doc_id%10∈{0,1} first
    — the regex machinery under test is the real surface (a pure
    narrow map: no shuffle until the final small agg). Patterns stay in
    the portable subset shared by Java regex and RE2 so both engines
    match identically."""
    docs = load(spark, sf_dir, "documents")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com today"),
            ),
        )
        .when(
            F.col("doc_id") % 10 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.col("text")),
    )
    redacted = injected.select(
        "lang",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean"),
    )
    hit = F.col("n_email") + F.col("n_phone") > 0
    return redacted.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_if(hit).alias("n_docs_redacted"),
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_phone").cast("bigint").alias("n_phones"),
        F.sum(F.when(hit, F.length("clean")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("redacted_chars"),
    )


@register(
    "pipeline_train_test_split",
    oracle=f"""
    SELECT CASE
             WHEN substring({_MD5}, 1, 1) IN ('e','f') THEN 'test'
             WHEN substring({_MD5}, 1, 1) IN ('c','d') THEN 'val'
             ELSE 'train'
           END AS split,
           lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split on the md5 hex
    prefix, reported per (split, language) so stratification is
    auditable. Hash-based membership means any worker can route any
    document with no coordination or lookup table — the only shuffle
    is the final small agg. The same expression works as a
    partitionBy() column when materializing the splits."""
    docs = load(spark, sf_dir, "documents")
    c1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c1.isin("e", "f"), "test")
        .when(c1.isin("c", "d"), "val")
        .otherwise("train")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "text_repetition",
    oracle="""
    WITH t AS (
        SELECT lang,
               len(string_split(text,' ')) AS n_tok,
               len(list_distinct(string_split(text,' '))) AS n_uniq
        FROM documents
    )
    SELECT lang,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok - n_uniq) AS BIGINT) AS repeated_tokens,
           ROUND(CAST(SUM(n_tok - n_uniq) AS DOUBLE)
               / CAST(SUM(n_tok) AS DOUBLE), 6) + 0.0 AS repetition_ratio
    FROM t
    GROUP BY lang
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring — the duplicate-token fraction per language,
    a standard low-quality-text signal (boilerplate and keyword-stuffed
    pages repeat). The ratio is one double division of two exact
    integer sums, so it is bit-identical across engines regardless of
    aggregation order (a double-typed AVG would not be)."""
    toks = F.split("text", " ")
    t = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    total = F.sum("n_tok").cast("bigint")
    repeated = F.sum(F.col("n_tok") - F.col("n_uniq")).cast("bigint")
    return t.groupBy("lang").agg(
        total.alias("total_tokens"),
        repeated.alias("repeated_tokens"),
        # ROUND 6dp + 0.0 (r12 sweep): G13 double-output discipline.
        (
            F.round(repeated.cast("double") / total.cast("double"), 6)
            + F.lit(0.0)
        ).alias("repetition_ratio"),
    )


@register(
    "pipeline_doc_chunking",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text,' ') AS toks FROM documents
    ),
    c AS (
        SELECT doc_id, toks,
               unnest(range((len(toks)-1)//{CHUNK_STRIDE} + 1)) AS chunk_id
        FROM d
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(toks[chunk_id*{CHUNK_STRIDE}+1
                         : chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS}]) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(toks[chunk_id*{CHUNK_STRIDE}+1
                                    : chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' '))
               AS chunk_md5
    FROM c
    """,
)
def pipeline_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking with overlap — split every document into
    CHUNK_TOKENS-token windows advancing by CHUNK_STRIDE (the standard
    context-window prep for embedding or next-token training). A pure
    narrow map — sequence→explode→slice per document, zero shuffles —
    so it scales linearly with corpus bytes. chunk_md5 fingerprints the
    chunk text so the oracle proves content equality, not just counts
    (and is what a chunk-level dedup downstream would key on)."""
    toks = F.split("text", " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    c = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n - 1) DIV {CHUNK_STRIDE}"))
        ).alias("chunk_id"),
    )
    chunk = F.slice(
        "toks",
        (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"),
        CHUNK_TOKENS,
    )
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
    )


@register(
    "pipeline_seq_packing",
    oracle=f"""
    WITH d AS (
        SELECT len(string_split(text,' ')) AS n_tokens,
               SUM(len(string_split(text,' ')))
                   OVER (ORDER BY {_MD5}, doc_id) AS running
        FROM documents
    )
    SELECT CAST((running - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_started,
           COUNT(*) FILTER (WHERE (running - 1) // {SEQ_LEN}
                                  != (running - n_tokens) // {SEQ_LEN})
               AS n_crossing
    FROM d GROUP BY 1
    """,
)
def pipeline_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate the md5-shuffled corpus and assign
    every document to the fixed-length SEQ_LEN training sequence its
    first token lands in (concat-and-chunk packing — zero padding
    waste; n_crossing counts docs that straddle a sequence boundary,
    the attention-masking cost of this scheme). The global token
    cumsum reuses ``_with_global_running`` (two-phase 256-bucket scan),
    so no single-partition window exists at any corpus size; the
    oracle states the same semantics as one global window, which is
    fine for DuckDB at fixture scale."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("m"),
    )
    r = _with_global_running(docs).select(
        F.expr(f"(running - n_tokens) DIV {SEQ_LEN}").alias("seq_id"),
        F.expr(f"(running - 1) DIV {SEQ_LEN}").alias("end_seq"),
        "n_tokens",
    )
    return r.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_started"),
        F.count_if(F.col("end_seq") != F.col("seq_id")).alias("n_crossing"),
    )


# Mixture weights: source srcN gets keep rate (N % 4 + 1)/4 — a
# deterministic stand-in for tuned per-domain mixture weights (à la
# DoReMi / The Pile). Membership is an md5-hex-prefix threshold, so the
# keep decision is a pure function of doc_id: hex first char < '4'
# keeps ~25%, < '8' ~50%, < 'c' ~75%, < 'g' all (ASCII orders 0-9 < a-f).
_MIX_THRESHOLDS = ("4", "8", "c", "g")


@register(
    "pipeline_source_mix",
    oracle=f"""
    WITH d AS (
        SELECT source,
               CAST(substring(source, 4) AS INT) % 4 AS g,
               substring({_MD5}, 1, 1) AS c1,
               len(string_split(text,' ')) AS n_tokens
        FROM documents
    ),
    k AS (
        SELECT source, g, n_tokens,
               c1 < CASE g WHEN 0 THEN '4' WHEN 1 THEN '8'
                           WHEN 2 THEN 'c' ELSE 'g' END AS kept
        FROM d
    )
    SELECT source,
           ROUND(CAST(g + 1 AS DOUBLE) / 4, 6) + 0.0 AS target_rate,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE kept) AS n_kept,
           CAST(COALESCE(SUM(n_tokens) FILTER (WHERE kept), 0) AS BIGINT)
               AS kept_tokens
    FROM k GROUP BY source, g
    """,
)
def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture sampling: downsample each source to its target
    mixture weight with a deterministic hash threshold — how a corpus
    build hits tuned per-domain proportions without a shuffle or a
    coordination table (any worker can route any row; the only shuffle
    is the final per-source audit agg). Reported per source so the
    achieved rate is auditable against the target."""
    docs = load(spark, sf_dir, "documents")
    g = (F.expr("CAST(substring(source, 4) AS INT)") % 4).alias("g")
    d = docs.select(
        "source",
        g,
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("c1"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    thresh = F.element_at(
        F.array(*[F.lit(t) for t in _MIX_THRESHOLDS]), F.col("g") + 1
    )
    k = d.withColumn("kept", F.col("c1") < thresh)
    return k.groupBy("source", "g").agg(
        F.count("*").alias("n_total"),
        F.count_if("kept").alias("n_kept"),
        F.coalesce(F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0))
        .cast("bigint")
        .alias("kept_tokens"),
    ).select(
        "source",
        # ROUND 6dp + 0.0 (r12 sweep): exact here (quarters), rounded
        # anyway so the G13 double-output grep class stays empty.
        (F.round((F.col("g") + 1).cast("double") / 4, 6) + F.lit(0.0)).alias(
            "target_rate"
        ),
        "n_total",
        "n_kept",
        "kept_tokens",
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH d AS (
        SELECT source, lang, n_chars,
               len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n_tokens
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(median(n_chars) AS DOUBLE), 4) AS median_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM d
    GROUP BY source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card profile: the per-source summary block a corpus
    release ships (doc/token/char volumes, language spread, length
    distribution) — the audit artifact every training-data build ends
    with, here as one declarative pass so the card is always computed
    from the shipped data, never hand-maintained.

    One shuffle on source; token counts are a pure map expression
    (size-of-split, no explode — the cardinality never leaves the row),
    and the exact median is per-group `percentile` (== DuckDB `median`
    on even counts via linear interpolation, parity proven by
    agg_percentile). At 100 TB swap `percentile` for the mergeable
    `approx_percentile` sketch; every other column is already a
    partial-aggregable monoid."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "n_tokens"
        ),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)").cast("double"), 4).alias(
            "median_chars"
        ),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "pipeline_vocab_coverage",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS c FROM tok WHERE word <> '' GROUP BY word
    ),
    ranked AS (
        SELECT word, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rnk,
               SUM(c) OVER (ORDER BY c DESC, word
                            ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM counts
    ),
    tot AS (SELECT SUM(c) AS total FROM counts)
    SELECT CAST(v AS BIGINT) AS vocab_size,
           CAST(MAX(cum_c) FILTER (WHERE rnk <= v) AS BIGINT)
               AS covered_tokens,
           CAST(MAX(cum_c) FILTER (WHERE rnk <= v) AS DOUBLE)
               / CAST((SELECT total FROM tot) AS DOUBLE) AS coverage
    FROM ranked, (VALUES (10), (20), (50), (100)) AS sizes(v)
    WHERE rnk <= v
    GROUP BY v
    """,
)
def pipeline_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve: what fraction of all corpus tokens a
    top-N vocabulary covers, at several N — the sizing study run before
    fixing a tokenizer vocab (the knee of this curve IS the vocab-size
    decision; everything past it becomes UNK/byte-fallback traffic).

    Plan shape: one explode+groupBy builds the term counts (the same
    frame wordcount/TF-IDF reuse); the curve only needs ranks ≤
    max(v)=100, so a `TakeOrderedAndProject` top-100 runs FIRST — the
    ranking never sees more than 100 rows no matter how large the
    vocabulary grows (the r4 form windowed the FULL vocab in one task:
    10⁸⁺ rows at 100 TB). Rank and cumulative count over the bounded
    frame come from a 100×100 broadcast triangle join (count/sum of
    predecessors) — no window at all, so no `WindowExec: No Partition
    Defined` single-task sort exists anywhere in the plan (asserted in
    tests/test_plans.py). The corpus-wide token total is a per-row
    `size(split)` sum — identical to SUM(c) but with no second
    explode+groupBy pass — carried as a 1-row broadcast crossJoin
    instead of a driver `.first()`. Determinism: counts are exact
    integers; coverage is one bigint/bigint IEEE division (G11: no
    rounding)."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("word")).limit(100)
    a = top.select(F.col("word").alias("a_word"), F.col("c").alias("a_c"))
    b = top.select(F.col("word").alias("b_word"), F.col("c").alias("b_c"))
    # (rank, cumsum) of each term = (count, sum) of terms at-or-above
    # it in (c DESC, word ASC) order; ≤100 rows per side by construction.
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b_c") > F.col("a_c"))
            | ((F.col("b_c") == F.col("a_c")) & (F.col("b_word") <= F.col("a_word"))),
        )
        .groupBy("a_word")
        .agg(F.count("*").alias("rnk"), F.sum("b_c").alias("cum_c"))
    )
    total = docs.select(
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n")
    ).agg(F.sum("n").cast("bigint").alias("total"))
    sizes = spark.createDataFrame([(10,), (20,), (50,), (100,)], "v long")
    return (
        ranked.join(F.broadcast(sizes), ranked.rnk <= sizes.v)
        .groupBy("v")
        .agg(F.max("cum_c").alias("covered"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("v").cast("bigint").alias("vocab_size"),
            F.col("covered").cast("bigint").alias("covered_tokens"),
            (
                F.col("covered").cast("double") / F.col("total").cast("double")
            ).alias("coverage"),
        )
    )


@register(
    "pipeline_dedup_keep_best",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               source,
               md5(array_to_string(
                   list_slice(string_split(text, ' '), 1, 50), ' '))
                   AS content_hash,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY content_hash
                   ORDER BY n_tokens DESC, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY content_hash) AS group_size
        FROM scored
    )
    SELECT doc_id, source, content_hash, n_tokens, group_size
    FROM ranked
    WHERE rn = 1 AND group_size > 1
    ORDER BY doc_id
    """,
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-selection dedup: among each duplicate content group —
    keyed by a 50-token PREFIX fingerprint, the boilerplate-prefix
    dedup real corpus builds use (exact-hash groups are its special
    case; the fixture's planted near-dups share prefixes, not full
    text) — keep ONE representative chosen by quality (longest doc,
    doc_id tiebreak) instead of dropDuplicates' arbitrary first-seen
    row. Output is the kept representative of every non-trivial group
    with its cluster size.

    Plan shape: one scan; md5 content hash JVM-side; ONE shuffle on
    content_hash serves both window functions (row_number + count share
    the partition spec, Catalyst plans a single WindowExec after a
    single exchange). Hash-partitioned — no global sort, no driver
    state; at 100 TB the dup-group histogram is bounded by cluster
    sizes, never corpus size. Deterministic: (n_tokens DESC, doc_id)
    is a total order within a group (G11)."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 50))).alias(
            "content_hash"
        ),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("content_hash")
    ranked = scored.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.desc("n_tokens"), "doc_id"))
        .alias("rn"),
        F.count("*").over(w).alias("group_size"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("group_size") > 1))
        .drop("rn")
        .orderBy("doc_id")
    )


@register(
    "pipeline_quality_weighted_sample",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               len(string_split(text, ' ')) AS wc,
               substring({_MD5}, 1, 2) AS h2
        FROM documents
    ),
    decided AS (
        SELECT lang, wc,
               CASE
                 WHEN wc >= 200 THEN TRUE          -- weight 1.0
                 WHEN wc >= 100 THEN h2 < '80'     -- weight 0.5
                 ELSE               h2 < '40'      -- weight 0.25
               END AS keep
        FROM scored
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN wc ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM decided
    GROUP BY lang
    """,
)
def pipeline_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: long (high-quality-proxy) docs
    are always kept, medium docs kept at 50%, short docs at 25% — the
    standard quality-upweighting step of a pre-training data mix,
    made DETERMINISTIC by hashing doc_id instead of drawing randoms:
    the keep decision is `hex_prefix(md5(doc_id)) < band`, so re-runs
    (and retried tasks — critical for exactly-once semantics on a
    1000-executor cluster where stragglers re-execute) select the
    SAME sample. Lowercase-hex prefixes compare lexicographically in
    numeric order in both engines, so the band check is a plain string
    comparison — no hex→int conversion divergence.

    Plan shape: one scan, all decisions per-row Catalyst expressions,
    5-group partial+final hash agg. No shuffle other than the final
    5-row exchange; integer-only outputs (G13)."""
    docs = load(spark, sf_dir, "documents")
    wc = F.size(F.split("text", " "))
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    keep = (
        F.when(wc >= 200, F.lit(True))
        .when(wc >= 100, h2 < "80")
        .otherwise(h2 < "40")
    )
    return (
        docs.select(
            "lang", wc.alias("wc"), keep.alias("keep")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("wc")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
    )


@register(
    "pipeline_bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(
                   range(1, length(w)),
                   i -> substring(w, i, 2))) AS pair
        FROM words WHERE length(w) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def pipeline_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration (Sennrich et al. 2016): corpus-wide
    adjacent character-pair frequencies, top-20 — the inner loop of
    tokenizer training, which any pre-training data platform runs over
    its own corpus rather than shipping text to a separate system.

    Plan shape: two generator stages (word explode, then in-word pair
    explode via sequence+substr — all Catalyst expressions, no Python),
    then a groupBy on a key space bounded by |alphabet|² — map-side
    partial combine collapses each task's pairs to ≤ a few thousand
    rows, so the shuffle is alphabet-sized no matter the corpus, and
    top-20 is TakeOrderedAndProject with the pair string as tiebreak
    (G5). A full BPE train iterates this with a merge table; the
    per-iteration plan is exactly this one."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


# Temperature-scaled source mixing (the multilingual-LM sampling rule,
# e.g. XLM-R §3.1): sample source i with probability p_i ∝ f_i^ALPHA.
# ALPHA < 1 flattens the natural distribution — big sources are
# down-sampled, small sources up-weighted. TEMP_TARGET_FRAC sets the
# overall corpus fraction the mixed sample should keep.
TEMP_ALPHA = 0.5
TEMP_TARGET_FRAC = 0.5
_U32 = 4294967296  # 2^32: md5-prefix → uniform u32 denominator


def _mix_rates_cte(src: str = "documents", prefix: str = "") -> str:
    """Oracle mirror of _mix_rates as CTE text: emits
    ``{prefix}rates(source, f, rate)`` over source relation
    ``src(source, ...)`` — one row per source with its 6dp-rounded
    temperature-scaled keep rate. Shared by the standalone
    pipeline_mix_temperature oracle and pipeline_pretraining_e2e."""
    p = prefix
    return f"""{p}counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS f
        FROM {src} GROUP BY source
    ),
    {p}tot AS (
        SELECT CAST(SUM(f) AS DOUBLE) AS n_total,
               SUM(pow(CAST(f AS DOUBLE), {TEMP_ALPHA})) AS s_alpha
        FROM {p}counts
    ),
    {p}rates AS (
        SELECT source, f,
               ROUND(least(1.0,
                   {TEMP_TARGET_FRAC} * n_total
                   * (pow(CAST(f AS DOUBLE), {TEMP_ALPHA}) / s_alpha)
                   / CAST(f AS DOUBLE)), 6) AS rate
        FROM {p}counts CROSS JOIN {p}tot
    )"""


# The deterministic per-doc accept draw shared by mix-temperature and
# the e2e funnel: md5(doc_id) 8-hex prefix as a u32 uniform, keep iff
# u32 < floor(rate * 2^32).
_MIX_U32_SQL = f"CAST(('0x' || substring({_MD5}, 1, 8)) AS UBIGINT)"


@register(
    "pipeline_mix_temperature",
    oracle=f"""
    WITH {_mix_rates_cte()}
    SELECT d.source,
           MAX(r.f) AS n_docs,
           MAX(r.rate) + 0.0 AS rate,
           CAST(SUM(CASE WHEN CAST(('0x' || substring({_MD5}, 1, 8))
                                   AS UBIGINT)
                              < floor(r.rate * {_U32})
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY d.source
    """,
)
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing — the sampling rule multilingual
    and multi-source LM pipelines use to rebalance a skewed corpus:
    source i is kept with probability p_i ∝ f_i^α (α=0.5 here), scaled
    so the blended sample is TEMP_TARGET_FRAC of the corpus. α<1
    up-weights small sources without exhausting them and caps the keep
    rate at 1.0.

    Per-doc keep decisions are DETERMINISTIC (md5(doc_id) prefix as a
    u32 uniform vs the per-source threshold) — identical under task
    retry, reproducible across engines, no RNG state. The per-source
    rate is rounded to 6 decimals BEFORE thresholding on both engines
    so the one float reduction (Σ f^α over the per-source frame, whose
    accumulation order differs between engines) can never flip a
    boundary document.

    Plan: counts = one map-side-combinable aggregate (|sources| rows);
    the 1-row Σf^α total and the per-source rate table broadcast back
    onto one documents pass. At 100 TB: two corpus scans total, no
    shuffle of document rows at all (the only shuffles carry
    |sources|-sized frames). The rate table is the shared _mix_rates
    helper (funnel stage 6 of pipeline_pretraining_e2e).
    """
    docs = load(spark, sf_dir, "documents")
    rates = _mix_rates(docs)
    u32 = _mix_u32()
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("f").alias("n_docs"),
            (F.max("rate") + F.lit(0.0)).alias("rate"),
            F.sum(
                F.when(u32 < F.floor(F.col("rate") * _U32), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sampled"),
        )
    )


def _mix_rates(frame: DataFrame) -> DataFrame:
    """(source, f, rate): the temperature-scaled per-source keep-rate
    table over any frame carrying a ``source`` column — shared by
    pipeline_mix_temperature and pipeline_pretraining_e2e (oracle
    mirror: _mix_rates_cte). The rate is rounded to 6 decimals BEFORE
    thresholding on both engines so the one float reduction (Σ f^α)
    can never flip a boundary document."""
    counts = frame.groupBy("source").agg(F.count("*").alias("f"))
    tot = counts.agg(
        F.sum("f").cast("double").alias("n_total"),
        F.sum(F.pow(F.col("f").cast("double"), F.lit(TEMP_ALPHA))).alias(
            "s_alpha"
        ),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "f",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(TEMP_TARGET_FRAC)
                * F.col("n_total")
                * (
                    F.pow(F.col("f").cast("double"), F.lit(TEMP_ALPHA))
                    / F.col("s_alpha")
                )
                / F.col("f").cast("double"),
            ),
            6,
        ).alias("rate"),
    )


def _mix_u32():
    """The deterministic accept draw: md5(doc_id) 8-hex prefix as a
    u32 uniform (Spark mirror of _MIX_U32_SQL)."""
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")


# T5-style span corruption: spans of SPAN_LEN consecutive tokens are
# replaced by one sentinel, one candidate span every SPAN_STRIDE tokens
# (≈ SPAN_LEN/SPAN_STRIDE = 15% token mask rate), with a per-document
# deterministic start offset derived from md5(doc_id) so span positions
# vary across documents but are identical across engines and retries.
SPAN_LEN = 3
SPAN_STRIDE = 20
SPAN_OFFSET_MOD = 7
SPAN_SENTINEL = "<X>"


@register(
    "pipeline_span_corruption",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n,
               CAST(CAST(('0x' || substring({_MD5}, 1, 8)) AS UBIGINT)
                    % {SPAN_OFFSET_MOD} AS BIGINT) AS off
        FROM documents
    ),
    c AS (
        SELECT doc_id, n,
               list_filter(
                   list_transform(range(1, n + 1), i ->
                       CASE
                         WHEN i - 1 - off >= 0
                              AND (i - 1 - off) % {SPAN_STRIDE} < {SPAN_LEN}
                              AND i - ((i - 1 - off) % {SPAN_STRIDE})
                                  + {SPAN_LEN} - 1 <= n
                         THEN CASE WHEN (i - 1 - off) % {SPAN_STRIDE} = 0
                                   THEN '{SPAN_SENTINEL}'
                                   ELSE chr(1) END
                         ELSE toks[i]
                       END),
                   x -> x <> chr(1)) AS corrupted
        FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(len(list_filter(corrupted, x -> x = '{SPAN_SENTINEL}'))
                AS BIGINT) AS n_spans,
           CAST({SPAN_LEN} * len(list_filter(corrupted,
                                 x -> x = '{SPAN_SENTINEL}'))
                AS BIGINT) AS n_masked,
           md5(array_to_string(corrupted, ' ')) AS corrupted_md5
    FROM c
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption prep: replace ~15% of each document's
    tokens — spans of SPAN_LEN consecutive tokens, one candidate span
    per SPAN_STRIDE positions — with a single sentinel, the exact
    pretraining-objective transform (Raffel et al. 2020 §3.1.4) run as
    a data-prep pass. Span positions are per-document deterministic
    (md5-derived offset): reproducible across engines AND across task
    retries, which an RNG-based masker is not.

    A pure narrow map: one array transform + filter per document, zero
    shuffles, so it scales with corpus bytes at 100 TB like any
    tokenizer pass. The oracle pins the corrupted text by fingerprint
    (content equality, not just counts) plus the exact span ledger.
    Spans are only taken where the full SPAN_LEN fits (a trailing
    partial span is left unmasked — same rule both engines).
    """
    toks = F.split("text", " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % SPAN_OFFSET_MOD
        ).alias("off"),
    )

    def corrupt_token(i):
        dd = i - 1 - F.col("off")
        r = dd % SPAN_STRIDE
        start = i - r
        in_span = (
            (dd >= 0)
            & (r < SPAN_LEN)
            & (start + SPAN_LEN - 1 <= F.col("n"))
        )
        return (
            F.when(in_span & (r == 0), F.lit(SPAN_SENTINEL))
            .when(in_span, F.lit("\x01"))
            .otherwise(F.element_at("toks", i.cast("int")))
        )

    c = d.select(
        "doc_id",
        "n",
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.col("n")), corrupt_token
            ),
            lambda x: x != "\x01",
        ).alias("corrupted"),
    )
    n_spans = F.size(
        F.filter("corrupted", lambda x: x == SPAN_SENTINEL)
    ).cast("bigint")
    return c.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        n_spans.alias("n_spans"),
        (n_spans * SPAN_LEN).cast("bigint").alias("n_masked"),
        F.md5(F.array_join("corrupted", " ").cast("binary")).alias(
            "corrupted_md5"
        ),
    )


@register(
    "pipeline_rlhf_pair_prep",
    oracle="""
    WITH scored AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) * 1000 + n_chars
                    AS BIGINT) AS score_milli
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, score_milli,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score_milli DESC, doc_id)
                   AS rk_best,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score_milli ASC, doc_id)
                   AS rk_worst
        FROM scored
    )
    SELECT b.source,
           b.doc_id AS chosen_doc_id,
           w.doc_id AS rejected_doc_id,
           b.score_milli - w.score_milli AS score_gap_milli
    FROM ranked b JOIN ranked w
      ON b.source = w.source AND b.rk_best = 1 AND w.rk_worst = 1
    """,
)
def pipeline_rlhf_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for RLHF/DPO data prep: per prompt
    group (source stands in for the prompt), emit one (chosen,
    rejected) pair — the best- and worst-scoring response — with the
    score margin. The scorer here is the deterministic integer
    length×1000+chars proxy; a production pipeline swaps in any reward
    model's output column and the plan is unchanged.

    Plan: ONE shuffle on the group key feeding both directions' ranks
    (same partitioning, two in-partition sorts), then a self-join of
    two 1-row-per-group frames. Integer scores make the pair choice
    exactly reproducible across engines — a float reward column would
    need the G11 rounding contract at the rank boundary.
    """
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        (F.size(F.split("text", " ")) * 1000 + F.col("n_chars"))
        .cast("bigint")
        .alias("score_milli"),
    )
    wsrc = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "doc_id",
        "score_milli",
        F.row_number()
        .over(wsrc.orderBy(F.desc("score_milli"), "doc_id"))
        .alias("rk_best"),
        F.row_number()
        .over(wsrc.orderBy(F.asc("score_milli"), "doc_id"))
        .alias("rk_worst"),
    )
    best = ranked.filter(F.col("rk_best") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("score_milli").alias("s_best"),
    )
    worst = ranked.filter(F.col("rk_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("score_milli").alias("s_worst"),
    )
    return best.join(worst, "source").select(
        "source",
        "chosen_doc_id",
        "rejected_doc_id",
        (F.col("s_best") - F.col("s_worst")).alias("score_gap_milli"),
    )


BPE_MERGE_ITERS = 3


def _bpe_train(vocab: DataFrame) -> tuple[DataFrame, list]:
    """Run BPE_MERGE_ITERS greedy merge iterations over a weighted
    vocabulary frame ``(w, cnt, syms)``; returns the final vocabulary
    (each word's symbol array after all merges) and the ordered merge
    list. Shared by pipeline_bpe_merges (reports the merge table) and
    pipeline_bpe_apply (encodes the corpus with it). Per-iteration
    argmax is a 1-row driver fetch (bounded-driver contract); each
    iteration self-checks the merged pair is extinct afterwards."""
    merges = []
    for it in range(1, BPE_MERGE_ITERS + 1):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.sequence(F.lit(1), F.size("syms") - 1)
                ).alias("i"),
                "syms",
            )
            .select(
                "cnt",
                F.element_at("syms", F.col("i").cast("int")).alias("a"),
                F.element_at(
                    "syms", (F.col("i") + 1).cast("int")
                ).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "a", "b").first()
        a, b, n = top.a, top.b, int(top.n)
        merged_sym = a + b
        merges.append((it, a, b, merged_sym, n))

        fold = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged_sym)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select("w", "cnt", fold.alias("syms")).persist()
        # Self-check: the merged pair's adjacency must now be extinct.
        leftover = (
            vocab.select(
                F.explode(
                    F.sequence(F.lit(1), F.size("syms") - 1)
                ).alias("i"),
                "syms",
            )
            .filter(
                (F.element_at("syms", F.col("i").cast("int")) == a)
                & (
                    F.element_at("syms", (F.col("i") + 1).cast("int"))
                    == b
                )
            )
            .count()
        )
        if leftover:
            raise RuntimeError(
                f"BPE merge {it} left {leftover} unmerged ({a},{b}) pairs"
            )
    return vocab, merges


def _bpe_vocab(docs: DataFrame) -> DataFrame:
    """Weighted word vocabulary with per-word symbol arrays: the frame
    BPE training iterates on. Words end with a '</w>' terminal symbol
    so merges can't cross word boundaries — the standard formulation."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            "w",
            "cnt",
            F.concat(
                F.split("w", ""), F.array(F.lit("</w>"))
            ).alias("syms"),
        )
    )


def _bpe_oracle_ctes() -> str:
    """Shared DuckDB CTE chain replicating the BPE training loop,
    UNROLLED over BPE_MERGE_ITERS (converted from rows-only in round 8
    — the fixed-iteration convertibility of graph_pagerank/kmeans/MMR,
    and here every quantity is an INTEGER, so there is no float risk
    at all). The merge-application fold maps onto leftmost
    non-overlapping string replace over a doubled-separator encoding:
    syms are joined with chr(31)chr(31) (outer pads included) and the
    pattern `␟a␟␟b␟` keeps one separator on each flank, so a match
    consumes its trailing flank and the next adjacent occurrence still
    matches — exactly the Spark aggregate-fold's greedy-leftmost
    overlap rule ('aaa' + (a,a) → ['aa','a'])."""
    sep = "chr(31)"
    sep2 = f"{sep} || {sep}"
    parts = [
        """
    v0 AS (
        SELECT w, cnt,
               list_append(
                   list_transform(range(length(w)), i -> w[i+1]),
                   '</w>') AS syms
        FROM (SELECT w, COUNT(*) AS cnt
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents)
              GROUP BY w)
    )"""
    ]
    for k in range(1, BPE_MERGE_ITERS + 1):
        parts.append(f"""
    p{k} AS (
        SELECT u.a AS a, u.b AS b, SUM(cnt) AS n
        FROM (SELECT cnt,
                     unnest(list_transform(
                         range(len(syms) - 1),
                         i -> {{'a': syms[i+1], 'b': syms[i+2]}})) AS u
              FROM v{k - 1})
        GROUP BY u.a, u.b
    ),
    t{k} AS (SELECT a, b, n FROM p{k} ORDER BY n DESC, a, b LIMIT 1),
    v{k} AS (
        SELECT w, cnt,
               string_split(
                   trim(replace(
                       {sep2} || array_to_string(syms, {sep2}) || {sep2},
                       {sep} || t.a || {sep2} || t.b || {sep},
                       {sep} || t.a || t.b || {sep}), chr(31)),
                   {sep2}) AS syms
        FROM v{k - 1} CROSS JOIN t{k} t
    )""")
    return "WITH " + ",".join(parts)


def _bpe_merges_oracle() -> str:
    picks = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS iteration, a AS \"left\", "
        f"b AS \"right\", a || b AS merged, CAST(n AS BIGINT) "
        f"AS pair_count FROM t{k}"
        for k in range(1, BPE_MERGE_ITERS + 1)
    )
    return (
        _bpe_oracle_ctes()
        + f"\n    SELECT * FROM ({picks}) ORDER BY iteration\n"
    )


@register("pipeline_bpe_merges", oracle=_bpe_merges_oracle())
def pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer-training loop (Sennrich et al. 2016), three
    merge iterations: count weighted adjacent symbol pairs → merge the
    argmax pair corpus-wide → recount. pipeline_bpe_pair_counts is one
    iteration of the counting stage; this op closes the loop with the
    actual merge, producing the ordered merge table a tokenizer ships.

    Scale shape — the part that matters at 100 TB: after one initial
    corpus pass, training operates ONLY on the weighted VOCABULARY
    frame (distinct word × count, with per-word symbol arrays) — BPE's
    classic optimization — so each iteration is an explode/groupBy over
    a vocabulary-bounded frame plus a JVM-side array fold for the
    merge (no Python row path). The per-iteration argmax is a 1-row
    driver fetch (same bounded-driver contract as the k-means/PQ
    codebooks). Each iteration self-checks that the merged pair's
    adjacency count drops to zero — a wrong fold (e.g. missing the
    overlap rule in 'aaa') fails loudly.

    Words end with a '</w>' terminal symbol so merges can't cross word
    boundaries — the standard formulation.
    """
    docs = load(spark, sf_dir, "documents")
    _, merges = _bpe_train(_bpe_vocab(docs))
    return spark.createDataFrame(
        merges,
        "iteration long, left string, right string, "
        "merged string, pair_count long",
    )


def _bpe_apply_oracle() -> str:
    return (
        _bpe_oracle_ctes()
        + f""",
    wa AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(w) + 1) AS BIGINT) AS char_tokens,
           CAST(SUM(len(syms)) AS BIGINT) AS bpe_tokens,
           CAST((SUM(length(w) + 1) - SUM(len(syms))) * 1000
                // SUM(length(w) + 1) AS BIGINT) AS saved_pm
    FROM wa JOIN v{BPE_MERGE_ITERS} USING (w)
    GROUP BY source
    ORDER BY source
    """
    )


@register("pipeline_bpe_apply", oracle=_bpe_apply_oracle())
# Converted from rows-only in round 8: the trained merge table IS
# SQL-derivable (see _bpe_oracle_ctes), so the encode join is too; the
# in-op reconstruction invariant stays as a second, independent check.
def pipeline_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of pipeline_bpe_merges:
    encode the corpus with the trained merge table and report, per
    source, the realized compression (character-level tokens vs BPE
    tokens). This is the pass a training pipeline actually runs per
    shard once the tokenizer is frozen, and the report is the
    tokens-per-source table a dataset card publishes.

    Scale shape: training touches only the vocabulary frame
    (pipeline_bpe_merges' loop, shared helper); application is then a
    plain EQUI-JOIN of the exploded corpus words onto the encoded
    vocabulary — one shuffle on the word key (or a broadcast when the
    vocab fits), no per-document Python, no re-running the merge fold
    per occurrence. Encoding N occurrences of a word costs ONE fold
    total — BPE's classic word-level memoization, expressed as a join.

    Self-check (runs before returning): every encoded symbol array must
    RECONSTRUCT its word exactly — concat(syms) == word + '</w>'. A
    wrong fold (dropped symbol, crossed word boundary) fails loudly
    here rather than silently skewing token counts.
    """
    docs = load(spark, sf_dir, "documents")
    vocab, _ = _bpe_train(_bpe_vocab(docs))

    broken = vocab.filter(
        F.array_join("syms", "") != F.concat(F.col("w"), F.lit("</w>"))
    ).count()
    if broken:
        raise RuntimeError(
            f"BPE encode broke reconstruction for {broken} vocab words"
        )

    words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    encoded = words.join(vocab.select("w", "syms"), "w")
    return (
        encoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_words"),
            # +1: the '</w>' terminal each word carries pre-merge.
            F.sum(F.length("w") + F.lit(1)).alias("char_tokens"),
            F.sum(F.size("syms")).alias("bpe_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "char_tokens",
            "bpe_tokens",
            F.expr(
                "((char_tokens - bpe_tokens) * 1000) DIV char_tokens"
            ).alias("saved_pm"),
        )
        .orderBy("source")
    )


BATCH_SIZE = 64


def _length_batch_cte(src: str = "toks", prefix: str = "") -> str:
    """Oracle mirror of _length_batch_assign as CTE text: emits
    ``{prefix}batched(doc_id, batch_id, n_tokens)`` over source
    relation ``src(doc_id, n_tokens)``. Shared by the standalone
    pipeline_length_batching oracle and pipeline_pretraining_e2e."""
    p = prefix
    return f"""{p}offsets AS (
        SELECT n_tokens,
               COALESCE(SUM(cnt) OVER (ORDER BY n_tokens
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS off
        FROM (SELECT n_tokens, COUNT(*) AS cnt FROM {src}
              GROUP BY n_tokens)
    ),
    {p}ranked AS (
        SELECT t.doc_id, t.n_tokens,
               o.off + ROW_NUMBER() OVER (PARTITION BY t.n_tokens
                                          ORDER BY t.doc_id) AS rk
        FROM {src} t JOIN {p}offsets o USING (n_tokens)
    ),
    {p}batched AS (
        SELECT doc_id,
               CAST((rk - 1) // {BATCH_SIZE} AS BIGINT) AS batch_id,
               n_tokens
        FROM {p}ranked
    )"""


@register(
    "pipeline_length_batching",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    {_length_batch_cte()}
    SELECT batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(((COUNT(*) * MAX(n_tokens) - SUM(n_tokens)) * 1000)
                // (COUNT(*) * MAX(n_tokens)) AS BIGINT) AS padding_pm
    FROM batched
    GROUP BY batch_id
    ORDER BY batch_id
    """,
)
def pipeline_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-GROUPED BATCHING: documents sorted by token count and cut
    into fixed-size training batches, so every batch pads to ITS OWN
    max length instead of the corpus max — the standard dynamic-
    batching trick that cuts padding FLOPs (tests pin that the padding
    waste is a fraction of random batching's). Output is the per-batch
    manifest (sizes + exact integer permille padding waste) a training
    loader consumes.

    The global rank that drives the batch cut is computed WITHOUT a
    single-task global sort: token counts are small integers, so the
    counts-per-length frame is tiny — prefix offsets on that frame
    (one broadcast) + a per-length row_number give the exact global
    (n_tokens, doc_id) rank, the same two-phase trick as
    _with_global_running. Residual bound: one task per DISTINCT length
    value orders that length's docs — at extreme per-length skew the
    substitute is a range-partitioned rank (window_ntile_scalable
    pattern), traded here for the exact, oracle-checkable cut. The
    batch assignment is the shared _length_batch_assign helper
    (funnel stage 7 of pipeline_pretraining_e2e)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    batched = _length_batch_assign(toks)
    return (
        batched.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "batch_id",
            "n_docs",
            "min_tokens",
            "max_tokens",
            "sum_tokens",
            F.expr(
                "((n_docs * max_tokens - sum_tokens) * 1000)"
                " DIV (n_docs * max_tokens)"
            ).alias("padding_pm"),
        )
        .orderBy("batch_id")
    )


def _length_batch_assign(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, batch_id): the length-grouped batch cut over
    any (doc_id, n_tokens) frame — shared by pipeline_length_batching
    and pipeline_pretraining_e2e (oracle mirror: _length_batch_cte).
    Global (n_tokens, doc_id) rank without a single-task sort: prefix
    offsets on the tiny counts-per-length frame + a per-length
    row_number."""
    counts = toks.groupBy("n_tokens").agg(F.count("*").alias("cnt"))
    offsets = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("n_tokens").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("n_tokens", "off")
    return (
        toks.join(F.broadcast(offsets), "n_tokens")
        .withColumn(
            "rk",
            F.col("off")
            + F.row_number().over(
                Window.partitionBy("n_tokens").orderBy("doc_id")
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"(rk - 1) DIV {BATCH_SIZE}").alias("batch_id"),
        )
    )


EPOCH_PEEK = 10


@register(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH e1 AS (
        SELECT 1 AS epoch,
               ROW_NUMBER() OVER (ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos,
               doc_id
        FROM documents
        ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {EPOCH_PEEK}
    ),
    e2 AS (
        SELECT 2 AS epoch,
               ROW_NUMBER() OVER (ORDER BY md5('2:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos,
               doc_id
        FROM documents
        ORDER BY md5('2:' || CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {EPOCH_PEEK}
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(pos AS BIGINT) AS pos, doc_id
    FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
    ORDER BY epoch, pos
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-EPOCH DETERMINISTIC SHUFFLING — the training-loader contract:
    every epoch must visit the SAME corpus in a DIFFERENT but
    REPRODUCIBLE order (resume-from-step needs to recompute order
    without storing it; multi-worker loaders need to agree on it with
    no coordination). The epoch-salted content hash md5(epoch:doc_id)
    IS the permutation — no stored shuffle index, no RNG state, and
    any worker can compute its own slice of epoch k's order locally
    (the same md5-as-deterministic-randomness idiom as
    pipeline_train_test_split). Tests pin that epochs produce
    different permutations of the identical multiset.

    Output: the first {EPOCH_PEEK} loader positions of two epochs (the
    verifiable prefix). Plan: each epoch's prefix is a
    TakeOrderedAndProject over a map-computed sort key — top-k, never
    a global sort, so peeking the front of ANY epoch's order at 100 TB
    costs one scan; materializing a full epoch order is the same scan
    with a range-partitioned write (no extra machinery)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    parts = []
    for epoch in (1, 2):
        key = F.md5(
            F.concat(
                F.lit(f"{epoch}:"), F.col("doc_id").cast("string")
            )
        )
        w = Window.orderBy(key.asc(), F.col("doc_id").asc())
        parts.append(
            docs.orderBy(key.asc(), F.col("doc_id").asc())
            .limit(EPOCH_PEEK)
            .select(
                F.lit(epoch).cast("long").alias("epoch"),
                F.row_number().over(w).cast("long").alias("pos"),
                "doc_id",
            )
        )
    return parts[0].unionAll(parts[1]).orderBy("epoch", "pos")


UNIGRAM_MAX_SUB = 4  # max candidate substring length
UNIGRAM_MIN_FREQ = 3  # seed-vocab frequency floor
# Hard cap on the seed vocabulary collected to the driver. At 100 TB the
# distinct-substring space is 1e8+, so an uncapped collect OOMs the
# driver; real SentencePiece caps the seed the same way
# (seed_sentencepiece_size, default 1e6). Top-K by weighted corpus
# count, single characters always retained for coverage.
UNIGRAM_SEED_CAP = 20000
UNIGRAM_TOPK = 200  # report size
# Oracle DP unroll bound: the relational Viterbi below is unrolled to
# this many positions. Fixture words are space-split synthetic tokens
# (max observed length 8 at every SF); the op RAISES if a longer word
# ever appears so the Spark side and the SQL oracle can never silently
# diverge on out-of-bound inputs.
_UNIGRAM_LMAX = 16
_UNIGRAM_LN2 = "0.6931471805599453"
_UNIGRAM_Q = "1000000000000.0"  # pico-quantization grid for log scores


def _ilog2_case(var: str) -> str:
    """floor(log2(n)) for integer-valued columns via a descending
    comparison ladder — exact integer comparisons, no engine log2."""
    branches = " ".join(
        f"WHEN {var} >= {2 ** k} THEN {float(k)!r}" for k in range(40, 0, -1)
    )
    # Explicit DOUBLE: DuckDB types bare x.0 literals as DECIMAL, and
    # a DECIMAL ladder result overflows the downstream multiplications.
    return f"CAST((CASE {branches} ELSE 0.0 END) AS DOUBLE)"


def _pow2_case_pos(var: str) -> str:
    """2^k for k ∈ [0, 40] as exact literals (the logreg CASE-table
    discipline, positive range)."""
    branches = " ".join(
        f"WHEN {var} = {float(k)!r} THEN {2.0 ** k!r}" for k in range(41)
    )
    return f"CAST((CASE {branches} ELSE 1.0 END) AS DOUBLE)"


def _unigram_q_stages() -> list[list[str]]:
    """Column-staged quantized log-probability: q(tok) = round(
    (ln(c) − ln(total)) · 1e12) as BIGINT, with ln(n) = ln1p(n/2^k − 1)
    + k·ln2 over the exact power-of-two reduction — every fragment is
    shared verbatim by Spark and DuckDB, so the score table is
    bit-identical and the integer DP over it is engine-free."""
    from pg_archiver_spark.functions.similarity import _lr_horner_ln1p

    return [
        [f"{_ilog2_case('c')} AS kc", f"{_ilog2_case('t')} AS kt"],
        [
            f"(CAST(c AS DOUBLE)/{_pow2_case_pos('kc')}) AS mc",
            f"(CAST(t AS DOUBLE)/{_pow2_case_pos('kt')}) AS mt",
        ],
        ["(mc-1.0) AS uc", "(mt-1.0) AS ut"],
        ["(uc/(2.0+uc)) AS tc", "(ut/(2.0+ut)) AS tu"],
        [
            f"({_lr_horner_ln1p('tc')}+(kc*{_UNIGRAM_LN2})) AS lnc",
            f"({_lr_horner_ln1p('tu')}+(kt*{_UNIGRAM_LN2})) AS lnt",
        ],
        [f"CAST(ROUND((lnc-lnt)*{_UNIGRAM_Q}) AS BIGINT) AS q"],
    ]


def _unigram_oracle_sql() -> str:
    """The full Viterbi-EM round as SQL: seed vocabulary (identical
    cap/floor policy), the shared quantized score table, a relational
    Viterbi DP unrolled to _UNIGRAM_LMAX positions (argmax tie-break =
    smallest split point, exactly the Python loop's first-max-kept),
    a backtrace walk, and the M-step usage report."""
    stage_sql = ""
    prev = "v0"
    for k, stage in enumerate(_unigram_q_stages()):
        stage_sql += f"vs{k} AS MATERIALIZED (SELECT *, {', '.join(stage)} FROM {prev}),\n"
        prev = f"vs{k}"
    dp_sql = ""
    for j in range(1, _UNIGRAM_LMAX + 1):
        pool = " UNION ALL ".join(
            f"SELECT * FROM d{i}"
            for i in range(max(0, j - UNIGRAM_MAX_SUB), j)
        )
        dp_sql += (
            f"d{j} AS MATERIALIZED (SELECT w, n, {j} AS j, s AS best, i AS back FROM ("
            f"SELECT p.w, p.n, p.j AS i, p.best + v.q AS s, "
            f"ROW_NUMBER() OVER (PARTITION BY p.w "
            f"ORDER BY p.best + v.q DESC, p.j ASC) AS rn "
            f"FROM ({pool}) p JOIN vocab v "
            f"ON v.tok = substr(p.w, p.j + 1, {j} - p.j) "
            f"WHERE strlen(p.w) >= {j}) WHERE rn = 1),\n"
        )
    bt_sql = ""
    for k in range(1, _UNIGRAM_LMAX + 1):
        bt_sql += (
            f"sg{k} AS MATERIALIZED (SELECT b.w, b.n, d.back AS i, b.j AS j "
            f"FROM bt{k - 1} b JOIN dall d ON d.w = b.w AND d.j = b.j "
            f"WHERE b.j > 0),\n"
            f"bt{k} AS MATERIALIZED (SELECT w, n, i AS j FROM sg{k}),\n"
        )
    return f"""
    WITH w0 AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE strlen(w) > 0 GROUP BY w
    ),
    sub AS (
        SELECT substr(w, CAST(i AS INTEGER) + 1, CAST(l AS INTEGER)) AS tok,
               CAST(SUM(n) AS BIGINT) AS c
        FROM w0, range(0, {_UNIGRAM_LMAX}) r1(i),
             range(1, {UNIGRAM_MAX_SUB + 1}) r2(l)
        WHERE i < strlen(w) AND i + l <= strlen(w)
        GROUP BY 1
    ),
    seed AS (
        SELECT tok, c FROM sub
        WHERE strlen(tok) = 1 OR c >= {UNIGRAM_MIN_FREQ}
    ),
    vocab0 AS (
        SELECT tok, c FROM seed WHERE strlen(tok) = 1
        UNION ALL
        SELECT tok, c FROM (
            SELECT tok, c FROM seed WHERE strlen(tok) > 1
            ORDER BY c DESC, tok LIMIT {UNIGRAM_SEED_CAP}
        )
    ),
    v0 AS (
        SELECT tok, c, t FROM vocab0
        CROSS JOIN (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab0)
    ),
    {stage_sql}
    vocab AS MATERIALIZED (SELECT tok, q FROM {prev}),
    d0 AS MATERIALIZED (
        SELECT w, n, CAST(0 AS INTEGER) AS j, CAST(0 AS BIGINT) AS best,
               CAST(0 AS INTEGER) AS back
        FROM w0
    ),
    {dp_sql}
    dall AS MATERIALIZED ({" UNION ALL ".join(
        f"SELECT w, n, j, best, back FROM d{j}"
        for j in range(1, _UNIGRAM_LMAX + 1)
    )}),
    bt0 AS (SELECT w, n, CAST(strlen(w) AS INTEGER) AS j FROM w0),
    {bt_sql}
    segs AS ({" UNION ALL ".join(
        f"SELECT w, n, i, j FROM sg{k}"
        for k in range(1, _UNIGRAM_LMAX + 1)
    )}),
    usage AS (
        SELECT substr(w, i + 1, j - i) AS tok,
               CAST(SUM(n) AS BIGINT) AS n_uses
        FROM segs GROUP BY 1
    ),
    tot2 AS (SELECT CAST(SUM(n_uses) AS BIGINT) AS t FROM usage)
    SELECT tok, n_uses,
           CAST((n_uses * 1000000) // t AS BIGINT) AS prob_ppm
    FROM usage, tot2
    ORDER BY n_uses DESC, tok
    LIMIT {UNIGRAM_TOPK}
    """


@register(
    "pipeline_unigram_tokenizer_em",
    # Round-8 conversion (rows-only → sql-checked): the Viterbi-EM DP
    # becomes engine-free by scoring with QUANTIZED INTEGER log
    # probabilities — q(tok) = round((ln c − ln total)·1e12), computed
    # from shared ln expression trees (bit-identical in both engines)
    # — so the DP is exact integer arithmetic, and the oracle replays
    # it as a relational DP unrolled to _UNIGRAM_LMAX positions with
    # the identical smallest-split tie-break. SentencePiece itself
    # treats scores as fixed-precision model constants; pico-grid
    # quantization changes no fixture segmentation decision that a
    # 1e-12 log-score gap wouldn't already make arbitrary.
    oracle=_unigram_oracle_sql(),
)
def pipeline_unigram_tokenizer_em(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece's model family,
    Kudo 2018) — the OTHER trainable tokenizer next to BPE
    (pipeline_bpe_merges): seed a candidate vocabulary from substring
    counts, then run one hard-EM (Viterbi-EM) refinement: E-step
    segments every word optimally under current token probabilities
    (O(len·L) DP per word), M-step re-estimates probabilities from
    segment usage. Emits the post-EM top tokens with usage counts and
    integer-ppm probabilities.

    The Spark shape is what matters at 100 TB: every per-string stage
    runs on the DISTINCT-WORD frame with corpus counts attached
    (vocabulary-bounded, not corpus-bounded — the same collapse
    pipeline_bpe_pair_counts uses), the token table rides to
    executors as one broadcast dict inside the mapInPandas closure,
    and both the substring fan-out and the segment-usage M-step are
    plain groupBy aggregations. Corpus size only enters through the
    one word-count pass.

    Scoring uses quantized integer log probabilities (pico grid) from
    shared expression trees, which makes the DP exact integer
    arithmetic — SQL-checkable end to end (see the oracle comment).
    The sibling tests additionally pin the EM contract (segmentations
    reconstruct their words, corpus Viterbi log-likelihood does not
    decrease across the EM step, runs are deterministic)."""
    import math

    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )

    # Seed vocabulary: substring counts over the distinct-word frame
    # (weighted by corpus word counts), frequency floor, plus all
    # single characters for guaranteed coverage.
    def substrings(pdfs):
        for pdf in pdfs:
            out_t, out_c = [], []
            for w, n in zip(pdf["w"], pdf["n"]):
                for i in range(len(w)):
                    for j in range(
                        i + 1, min(i + 1 + UNIGRAM_MAX_SUB, len(w) + 1)
                    ):
                        out_t.append(w[i:j])
                        out_c.append(n)
            yield pd.DataFrame({"tok": out_t, "c": out_c})

    seed = (
        words.mapInPandas(substrings, "tok string, c long")
        .groupBy("tok")
        .agg(F.sum("c").alias("c"))
        .filter(
            (F.length("tok") == 1) | (F.col("c") >= UNIGRAM_MIN_FREQ)
        )
    )
    # Bounded collect (VERDICT r7 #3): single chars (alphabet-sized)
    # always kept; multi-char candidates top-UNIGRAM_SEED_CAP by
    # weighted count, tok as deterministic tie-break. TakeOrdered-style
    # limit keeps the driver-side dict <= cap + |alphabet|.
    chars = seed.filter(F.length("tok") == 1)
    multi = (
        seed.filter(F.length("tok") > 1)
        .orderBy(F.desc("c"), "tok")
        .limit(UNIGRAM_SEED_CAP)
    )
    # The oracle's relational DP is unrolled to _UNIGRAM_LMAX; refuse
    # longer words loudly rather than silently diverging from it.
    n_long = words.filter(F.length("w") > _UNIGRAM_LMAX).count()
    if n_long:
        raise RuntimeError(
            f"{n_long} words exceed the DP unroll bound {_UNIGRAM_LMAX}"
        )
    # Quantized integer log-score table via the SHARED expression
    # stages (see _unigram_q_stages) — bit-identical to the oracle's.
    vocab_df = chars.unionAll(multi)
    tot = vocab_df.agg(F.sum("c").cast("long").alias("t"))
    staged = vocab_df.crossJoin(F.broadcast(tot))
    for stage in _unigram_q_stages():
        staged = staged.selectExpr("*", *stage)
    # bounded: hard-capped vocab + distinct codepoints (<= 65536)
    logp = {r.tok: int(r.q) for r in staged.select("tok", "q").collect()}
    # multi-char side is hard-capped; chars are distinct-codepoint
    # bounded (<= 65536 for BMP text), so the dict cannot grow with
    # the corpus.
    assert len(logp) <= UNIGRAM_SEED_CAP + 65536, "seed cap breached"

    def viterbi(word: str, table: dict) -> list:
        # Exact INTEGER max-sum DP; `>` with ascending i keeps the
        # smallest split among ties — the oracle's ORDER BY s DESC,
        # i ASC mirror.
        best: list = [0] + [None] * len(word)
        back = [0] * (len(word) + 1)
        for j in range(1, len(word) + 1):
            for i in range(max(0, j - UNIGRAM_MAX_SUB), j):
                t = word[i:j]
                q = table.get(t)
                if q is None or best[i] is None:
                    continue
                if best[j] is None or best[i] + q > best[j]:
                    best[j] = best[i] + q
                    back[j] = i
        toks, j = [], len(word)
        while j > 0:
            i = back[j]
            toks.append(word[i:j])
            j = i
        return toks[::-1]

    # E-step + M-step fused: segment each distinct word under the
    # seed model, count weighted segment usage.
    def segment_usage(pdfs):
        for pdf in pdfs:
            out_t, out_c = [], []
            for w, n in zip(pdf["w"], pdf["n"]):
                for t in viterbi(w, logp):
                    out_t.append(t)
                    out_c.append(n)
            yield pd.DataFrame({"tok": out_t, "c": out_c})

    usage = (
        words.mapInPandas(segment_usage, "tok string, c long")
        .groupBy("tok")
        .agg(F.sum("c").alias("n_uses"))
    )
    tot_uses = usage.agg(F.sum("n_uses").alias("t"))
    return (
        usage.crossJoin(F.broadcast(tot_uses))
        .select(
            "tok",
            "n_uses",
            F.expr("(n_uses * 1000000) DIV t").alias("prob_ppm"),
        )
        .orderBy(F.desc("n_uses"), "tok")
        .limit(UNIGRAM_TOPK)
    )


@register(
    "pipeline_fim_transform",
    oracle="""
    WITH cuts AS (
        SELECT doc_id, text, length(text) AS n,
               1 + ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_a'),
                                      1, 7))::BIGINT % length(text) AS c1,
               1 + ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_b'),
                                      1, 7))::BIGINT % length(text) AS c2
        FROM documents WHERE length(text) >= 20
    ),
    spans AS (
        SELECT doc_id, text, n,
               LEAST(c1, c2) AS lo, GREATEST(c1, c2) AS hi
        FROM cuts
    )
    SELECT doc_id,
           '<PRE>' || substring(text, 1, lo - 1)
               || '<SUF>' || substring(text, hi, n - hi + 1)
               || '<MID>' || substring(text, lo, hi - lo)
               AS fim_text,
           CAST(n AS BIGINT) AS orig_len,
           CAST(lo AS BIGINT) AS cut_lo,
           CAST(hi AS BIGINT) AS cut_hi
    FROM spans
    ORDER BY doc_id
    """,
)
def pipeline_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (FIM) training transform (Bavarian et al.
    2022 — the code-LLM pretraining trick): split each document at two
    deterministic cut points into (prefix, middle, suffix) and emit
    the PSM permutation `<PRE>prefix<SUF>suffix<MID>middle`, teaching
    the model to infill. The sibling of pipeline_span_corruption (T5
    masking) — same family, different objective format.

    Cut points are md5-derived from doc_id (task-retry-safe — rand()
    would re-split per attempt, G-sampling), and the whole transform
    is JVM-side string slicing: one scan, zero shuffles, zero Python.
    Character-count conservation (|prefix|+|middle|+|suffix| = n) is
    structural and pinned by the sibling test; the oracle re-states
    the exact slicing so an off-by-one in either engine hash-fails.

    At 100 TB this is the ideal operator shape: embarrassingly
    parallel, pushdown-friendly (length filter reaches the scan),
    output size = input size."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 20)
    h = lambda salt: (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % F.length("text")
        + 1
    )
    cuts = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        h("_a").alias("c1"),
        h("_b").alias("c2"),
    )
    spans = cuts.select(
        "doc_id",
        "text",
        "n",
        F.least("c1", "c2").alias("lo"),
        F.greatest("c1", "c2").alias("hi"),
    )
    fim = F.concat(
        F.lit("<PRE>"),
        F.expr("substring(text, 1, lo - 1)"),
        F.lit("<SUF>"),
        F.expr("substring(text, hi, n - hi + 1)"),
        F.lit("<MID>"),
        F.expr("substring(text, lo, hi - lo)"),
    )
    return spans.select(
        "doc_id",
        fim.alias("fim_text"),
        F.col("n").cast("bigint").alias("orig_len"),
        F.col("lo").cast("bigint").alias("cut_lo"),
        F.col("hi").cast("bigint").alias("cut_hi"),
    ).orderBy("doc_id")


KFOLD_K = 5


@register(
    "pipeline_kfold_assign",
    oracle=f"""
    WITH folds AS (
        SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_kf'),
                                  1, 7))::BIGINT % {KFOLD_K} AS fold,
               length(string_split(text, ' ')) AS n_tokens,
               n_chars
        FROM documents
    ),
    per_fold AS (
        SELECT fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM folds GROUP BY fold
    )
    SELECT fold, n_docs, n_tokens, n_chars,
           CAST(SUM(n_docs) OVER () - n_docs AS BIGINT) AS n_train_docs,
           CAST(SUM(n_tokens) OVER () - n_tokens AS BIGINT)
               AS n_train_tokens
    FROM per_fold
    ORDER BY fold
    """,
)
def pipeline_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-fold cross-validation assignment — the eval
    harness's split contract: fold = md5(doc_id)-derived hash mod K, so
    every worker (and every retry, and every engine) routes a document
    to the same fold with no coordination, no stored fold table, and
    structural disjointness (fold is a FUNCTION of doc_id — a doc
    cannot land in two folds). Reports the per-fold audit a CV harness
    needs before training K models: held-out size and the complement
    train-set size per fold (fold balance ≈ 1/K is what reviewers
    check; the complement columns come from an unbounded window over
    the K-row frame, not a second corpus pass).

    Same family as pipeline_train_test_split (one static split); this
    is the K-model rotation form. At 100 TB the fold column is a pure
    codegen expression on the scan — one pass, one K-row shuffle."""
    docs = load(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_kf"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % KFOLD_K
    )
    per_fold = (
        docs.select(
            fold.alias("fold"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            "n_chars",
        )
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_fold.select(
        "fold",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.sum("n_docs").over(w) - F.col("n_docs"))
        .cast("bigint")
        .alias("n_train_docs"),
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .cast("bigint")
        .alias("n_train_tokens"),
    ).orderBy("fold")


@register(
    "pipeline_chat_template",
    oracle="""
    WITH cuts AS (
        SELECT doc_id, text, length(text) AS n, length(text) // 2 AS p
        FROM documents WHERE length(text) >= 20
    )
    SELECT doc_id,
           '<|im_start|>user' || chr(10) || substring(text, 1, p)
               || '<|im_end|>' || chr(10) || '<|im_start|>assistant'
               || chr(10) || substring(text, p + 1, n - p)
               || '<|im_end|>' AS chat_text,
           CAST(16 + 1 + p + 10 + 1 + 21 + 1 AS BIGINT) AS mask_len,
           CAST(16 + 1 + p + 10 + 1 + 21 + 1 + (n - p) + 10 AS BIGINT)
               AS total_len
    FROM cuts
    ORDER BY doc_id
    """,
)
def pipeline_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template formatting — the instruction-tuning prep step:
    each document becomes a role-tagged training example
    (`<|im_start|>user … <|im_end|> <|im_start|>assistant … <|im_end|>`,
    the ChatML shape), split deterministically at the character
    midpoint into the user prompt and the assistant completion, with
    `mask_len` = the byte boundary up to which SFT loss is masked
    (everything through the assistant header) — the one number the
    training loader actually consumes, so the oracle pins it exactly
    (a drifting mask boundary silently trains on the prompt).

    Same ideal shape as pipeline_fim_transform: JVM-side string
    assembly, one scan, zero shuffles, output proportional to input;
    the template literals are codegen constants."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 20)
    cuts = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        (F.length("text") / 2).cast("bigint").alias("p"),
    )
    chat = F.concat(
        F.lit("<|im_start|>user\n"),
        F.expr("substring(text, 1, p)"),
        F.lit("<|im_end|>\n<|im_start|>assistant\n"),
        F.expr("substring(text, p + 1, n - p)"),
        F.lit("<|im_end|>"),
    )
    # mask_len counts: '<|im_start|>user' (16) + '\n' + prompt (p) +
    # '<|im_end|>' (10) + '\n' + '<|im_start|>assistant' (21) + '\n'.
    mask_len = (F.lit(16 + 1) + F.col("p") + F.lit(10 + 1 + 21 + 1)).cast("bigint")
    return cuts.select(
        "doc_id",
        chat.alias("chat_text"),
        mask_len.alias("mask_len"),
        (mask_len + (F.col("n") - F.col("p")) + F.lit(10))
        .cast("bigint")
        .alias("total_len"),
    ).orderBy("doc_id")


@register(
    "pipeline_dpo_pairs",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, source,
               CAST(length(list_distinct(string_split(lower(text), ' ')))
                    * 1000 // length(string_split(text, ' '))
                    AS BIGINT) AS score_pm
        FROM documents
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY score_pm DESC, doc_id) AS rk_best,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY score_pm ASC, doc_id) AS rk_worst,
               COUNT(*) OVER (PARTITION BY lang, source) AS grp_n
        FROM scored
    )
    SELECT b.lang, b.source,
           CAST(b.grp_n AS BIGINT) AS grp_n,
           b.doc_id AS chosen_doc_id, w.doc_id AS rejected_doc_id,
           b.score_pm AS chosen_score_pm, w.score_pm AS rejected_score_pm,
           b.score_pm - w.score_pm AS margin_pm
    FROM ranked b JOIN ranked w
      ON b.lang = w.lang AND b.source = w.source
    WHERE b.rk_best = 1 AND w.rk_worst = 1 AND b.doc_id <> w.doc_id
    ORDER BY b.lang, b.source
    """,
)
def pipeline_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training
    (Rafailov et al. 2023): within each prompt group (proxied by the
    (lang, source) cell of the corpus), pair the highest-quality
    member as `chosen` with the lowest as `rejected`, carrying the
    quality MARGIN — near-zero margins are the pairs a trainer
    down-weights or drops (no signal), exactly why the margin column
    exists. Quality here is the deterministic lexical-diversity
    permille (distinct words / words — integer floor arithmetic, the
    house ratio convention) so both engines rank identically with
    doc_id tiebreaks; a real pipeline swaps in its reward-model score
    and NOTHING else changes.

    Scale: one scan → two windows over the SAME (lang, source)
    partitioning (one shuffle, shared exchange), then a self-join of
    the two rank-1 slices on the group key — |groups| rows each side.
    Degenerate single-doc groups are excluded (a doc can't be its own
    rejected twin) by the `chosen <> rejected` predicate, pinned in
    pytest."""
    docs = load(spark, sf_dir, "documents")
    score = (
        F.expr(
            "size(array_distinct(split(lower(text), ' '))) * 1000"
            " DIV size(split(text, ' '))"
        )
    ).cast("bigint")
    scored = docs.select(
        "doc_id", "lang", "source", score.alias("score_pm")
    )
    w_best = Window.partitionBy("lang", "source").orderBy(
        F.desc("score_pm"), "doc_id"
    )
    w_worst = Window.partitionBy("lang", "source").orderBy(
        "score_pm", "doc_id"
    )
    w_grp = Window.partitionBy("lang", "source")
    ranked = scored.select(
        "*",
        F.row_number().over(w_best).alias("rk_best"),
        F.row_number().over(w_worst).alias("rk_worst"),
        F.count("*").over(w_grp).alias("grp_n"),
    )
    b = ranked.filter(F.col("rk_best") == 1).alias("b")
    w = ranked.filter(F.col("rk_worst") == 1).alias("w")
    return (
        b.join(
            w,
            (F.col("b.lang") == F.col("w.lang"))
            & (F.col("b.source") == F.col("w.source"))
            & (F.col("b.doc_id") != F.col("w.doc_id")),
        )
        .select(
            F.col("b.lang").alias("lang"),
            F.col("b.source").alias("source"),
            F.col("b.grp_n").cast("bigint").alias("grp_n"),
            F.col("b.doc_id").alias("chosen_doc_id"),
            F.col("w.doc_id").alias("rejected_doc_id"),
            F.col("b.score_pm").alias("chosen_score_pm"),
            F.col("w.score_pm").alias("rejected_score_pm"),
            (F.col("b.score_pm") - F.col("w.score_pm")).alias("margin_pm"),
        )
        .orderBy("lang", "source")
    )


CURRICULUM_PHASES = 4


@register(
    "pipeline_curriculum_phases",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               length(string_split(text, ' ')) AS n_tokens,
               length(text) * 1000
                   // length(string_split(text, ' ')) AS mean_wlen_milli
        FROM documents
    ),
    ranked AS (
        SELECT *,
               NTILE({CURRICULUM_PHASES}) OVER (
                   ORDER BY n_tokens * 1000000 + mean_wlen_milli, doc_id
               ) AS phase
        FROM scored
    )
    SELECT phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) * 1000 // SUM(SUM(n_tokens)) OVER ()
                AS BIGINT) AS token_share_pm
    FROM ranked
    GROUP BY phase
    ORDER BY phase
    """,
)
def pipeline_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment — order the corpus
    easy→hard and cut it into training phases (Bengio et al. 2009;
    the length+complexity schedule most code/text curricula use):
    difficulty here is (token count, mean word length) combined into
    ONE integer sort key (n_tokens·10⁶ + milli-chars-per-token — no
    float scoring, no tie ambiguity beyond the doc_id break), phases
    are NTILE buckets over that order, and the report is the per-phase
    manifest a training scheduler consumes (doc/token counts and the
    difficulty band each phase spans — monotone non-overlapping bands
    are the property pytest pins). Complements
    pipeline_quality_weighted_sample (what to keep) and
    pipeline_length_batching (how to batch): this is WHEN to feed it.

    Scale: the phase cut runs on the two-pass bucket-offset global
    rank (scalable.py) over the integer difficulty key, with the
    closed-form NTILE algebra — no single-task sort at any corpus
    size (the oracle keeps plain NTILE; the driver proves the
    rewrite); everything downstream is |phases|-bounded."""
    from pg_archiver_spark.operators.scalable import (
        bucketed_global_rank,
        ntile_from_rank,
    )

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "length(text) * 1000 DIV size(split(text, ' '))"
        ).alias("mean_wlen_milli"),
    )
    difficulty = F.col("n_tokens") * 1000000 + F.col("mean_wlen_milli")
    ranked = bucketed_global_rank(
        scored,
        difficulty,
        [difficulty, F.col("doc_id")],
        "__r",
        "__n",
    ).withColumn(
        "phase",
        ntile_from_rank(F.col("__r"), F.col("__n"), CURRICULUM_PHASES),
    )
    per_phase = ranked.groupBy("phase").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_phase.select(
            "phase",
            "n_docs",
            "n_tokens",
            "min_tokens",
            "max_tokens",
            F.expr(
                "CAST(n_tokens * 1000 DIV SUM(n_tokens) OVER "
                "(ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
                " AS BIGINT)"
            ).alias("token_share_pm"),
        )
        .orderBy("phase")
    )


# ----------------------------------------------------------- DSIR
# Data Selection with Importance Resampling (Xie et al. 2023): score
# every raw document by how much its hashed-n-gram profile looks like
# a target domain vs the raw pool, then keep it with probability
# min(1, w) via a deterministic md5 uniform — the data-SELECTION stage
# between the quality gates and pipeline_mix_temperature.
DSIR_BUCKETS = 64
# Target-domain sample: docs whose doc_id md5 starts '0'/'1' (2/16 of
# the corpus) — a held-out domain exemplar set, disjoint by
# construction from the decontamination ops' 'c'-'f' benchmark split.
_DSIR_TARGET_CHARS = ("0", "1")
_DSIR_U_DENOM = 16777216  # 2^24: the md5-derived uniform's grid


def _dsir_staged_sql(src: str, prefix: str) -> tuple[str, str]:
    """Unroll the shared quantized-log ladder (_unigram_q_stages) over
    a CTE named ``src`` carrying integer columns (c, t); returns the
    CTE-chain SQL and the name of the final stage (which adds q =
    round((ln c − ln t)·1e12) as BIGINT). Every fragment is shared
    verbatim with the Spark side, so q is bit-identical cross-engine."""
    sql, prev = "", src
    for k, stage in enumerate(_unigram_q_stages()):
        sql += (
            f"    {prefix}{k} AS MATERIALIZED "
            f"(SELECT *, {', '.join(stage)} FROM {prev}),\n"
        )
        prev = f"{prefix}{k}"
    return sql, prev


def _dsir_sel_cte(pool: str | None = None, prefix: str = "") -> str:
    """DSIR selection chain as CTE text: emits ``{prefix}d`` (doc_id,
    lang, is_target) and ``{prefix}sel`` (doc_id, wq, q_u) — accept iff
    q_u <= wq. The TARGET model always trains on the corpus-wide
    exemplar docs (an external curated set in production); ``pool``
    optionally names a CTE of candidate doc_ids that restricts the RAW
    model, the weights, and the selection draws (None = all non-target
    docs, the standalone pipeline_dsir_resample semantics;
    pipeline_pretraining_e2e passes its stage-4 survivor set)."""
    p = prefix
    tgt_sql, tgt_last = _dsir_staged_sql(f"{p}bt0", f"{p}bts")
    raw_sql, raw_last = _dsir_staged_sql(f"{p}br0", f"{p}brs")
    u_sql, u_last = _dsir_staged_sql(f"{p}u0", f"{p}us")
    chars = ", ".join(f"'{c}'" for c in _DSIR_TARGET_CHARS)
    in_pool = (
        f" AND doc_id IN (SELECT doc_id FROM {pool})" if pool else ""
    )
    gb_pool = (
        f" AND gb.doc_id IN (SELECT doc_id FROM {pool})" if pool else ""
    )
    return f"""{p}d AS MATERIALIZED (
        SELECT doc_id, lang,
               substring({_MD5}, 1, 1) IN ({chars}) AS is_target,
               string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS nw
        FROM documents
    ),
    {p}gb AS MATERIALIZED (
        SELECT doc_id, lang, is_target,
               CAST(CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT)
                    % {DSIR_BUCKETS} AS BIGINT) AS bucket
        FROM (SELECT doc_id, lang, is_target,
                     unnest(list_concat(
                         ws,
                         CASE WHEN nw < 2 THEN CAST([] AS VARCHAR[])
                              ELSE list_transform(
                                  range(nw - 1),
                                  i -> array_to_string(ws[i+1:i+2], ' '))
                         END)) AS g
              FROM {p}d)
    ),
    {p}spine AS (SELECT unnest(range({DSIR_BUCKETS})) AS bucket),
    {p}tc AS (SELECT bucket, COUNT(*) AS n FROM {p}gb WHERE is_target
           GROUP BY bucket),
    {p}rc AS (SELECT bucket, COUNT(*) AS n FROM {p}gb
           WHERE NOT is_target{in_pool}
           GROUP BY bucket),
    {p}tt AS (SELECT COUNT(*) AS n FROM {p}gb WHERE is_target),
    {p}rt AS (SELECT COUNT(*) AS n FROM {p}gb
           WHERE NOT is_target{in_pool}),
    {p}bt0 AS (
        SELECT s.bucket,
               CAST(COALESCE(tc.n, 0) + 1 AS BIGINT) AS c,
               CAST(tt.n + {DSIR_BUCKETS} AS BIGINT) AS t
        FROM {p}spine s LEFT JOIN {p}tc tc USING (bucket)
        CROSS JOIN {p}tt tt
    ),
{tgt_sql}    {p}br0 AS (
        SELECT s.bucket,
               CAST(COALESCE(rc.n, 0) + 1 AS BIGINT) AS c,
               CAST(rt.n + {DSIR_BUCKETS} AS BIGINT) AS t
        FROM {p}spine s LEFT JOIN {p}rc rc USING (bucket)
        CROSS JOIN {p}rt rt
    ),
{raw_sql}    {p}lr AS MATERIALIZED (
        SELECT a.bucket, a.q - b.q AS lr
        FROM {tgt_last} a JOIN {raw_last} b USING (bucket)
    ),
    {p}wts AS MATERIALIZED (
        SELECT gb.doc_id, CAST(SUM(lr.lr) AS BIGINT) AS wq
        FROM {p}gb gb JOIN {p}lr lr USING (bucket)
        WHERE NOT gb.is_target{gb_pool}
        GROUP BY gb.doc_id
    ),
    {p}u0 AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR) || '#dsir'), 1, 6))
                   AS BIGINT) + 1 AS BIGINT) AS c,
               CAST({_DSIR_U_DENOM} AS BIGINT) AS t
        FROM {p}d WHERE NOT is_target{in_pool}
    ),
{u_sql}    {p}sel AS MATERIALIZED (
        SELECT u.doc_id, COALESCE(w.wq, 0) AS wq, u.q AS q_u
        FROM {u_last} u LEFT JOIN {p}wts w USING (doc_id)
    )"""


def _dsir_oracle() -> str:
    return f"""
    WITH {_dsir_sel_cte()}
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN d.is_target THEN 1 ELSE 0 END) AS BIGINT)
               AS n_target,
           CAST(SUM(CASE WHEN s.q_u <= s.wq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(SUM(COALESCE(s.wq, 0)) AS BIGINT) AS sum_weight_q
    FROM d LEFT JOIN sel s USING (doc_id)
    GROUP BY d.lang
    ORDER BY d.lang
    """


@register("pipeline_dsir_resample", oracle=_dsir_oracle())
def pipeline_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling: estimate
    hashed-n-gram bag-of-words models for a TARGET domain sample and
    the RAW pool, weight every raw doc by its log importance ratio
    log p_tgt(d) − log p_raw(d) = Σ_grams [log p_tgt(bucket) −
    log p_raw(bucket)], and keep it with probability min(1, w) — the
    data-selection stage that sits between the quality gates
    (text_gopher_*, ml_logreg_inference_gate) and
    pipeline_mix_temperature in a pretraining pipeline (Xie et al.
    2023, arXiv:2302.03169).

    Spark-first determinism (all house idioms): features are unigrams +
    bigrams hashed to {DSIR_BUCKETS} buckets via the md5-conv trick
    (ml_feature_hashing); the two Laplace-smoothed bucket models become
    a {DSIR_BUCKETS}-row quantized log-ratio table through the SHARED
    pico-grid ln ladder (_unigram_q_stages — bit-identical
    cross-engine), so each doc's weight is an exact BIGINT sum
    (order-insensitive); the accept draw is the md5-derived 24-bit
    uniform u with accept iff round(ln(u/2^24)·1e12) ≤ wq — i.e.
    u ≤ w(d), P = min(1, w) — through the SAME ladder, so the whole
    resampling decision is integer-exact in both engines.

    Scale shape: two corpus passes (gram explode → bucket counts;
    weight sum via a {DSIR_BUCKETS}-row broadcast join), per-doc ladder
    arithmetic is one codegen'd map, nothing driver-sized but the
    bucket table. The target sample is md5-designated here; in
    production it is the curated domain corpus (the math is identical).
    Output: per-language doc/target/selected counts + the exact summed
    weight grid (the selection-rate report a curation run reviews).
    The selection frame is the shared _dsir_selection helper (funnel
    stage 5 of pipeline_pretraining_e2e)."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_DSIR_TARGET_CHARS)
        .alias("is_target"),
    )
    sel = _dsir_selection(docs)
    return (
        d.join(sel, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_target"),
            F.sum(F.when(F.col("q_u") <= F.col("wq"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_selected"),
            F.sum(F.coalesce(F.col("wq"), F.lit(0)))
            .cast("bigint")
            .alias("sum_weight_q"),
        )
        .orderBy("lang")
    )


def _dsir_selection(
    docs: DataFrame, pool_ids: DataFrame | None = None
) -> DataFrame:
    """(doc_id, wq, q_u): the DSIR selection frame — accept iff
    q_u <= wq — shared by pipeline_dsir_resample and
    pipeline_pretraining_e2e (oracle mirror: _dsir_sel_cte). The
    target model always trains on the corpus-wide exemplar docs;
    ``pool_ids`` (a doc_id frame) optionally restricts the RAW model,
    the weights, and the draws to a candidate pool (None = all
    non-target docs)."""
    is_target = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_DSIR_TARGET_CHARS)
    )
    d = docs.select("doc_id", is_target.alias("is_target"))
    toks = F.split("text", " ")
    bigrams = F.expr(
        "CASE WHEN size(split(text,' ')) < 2 "
        "THEN CAST(array() AS array<string>) ELSE "
        "transform(sequence(0, size(split(text,' ')) - 2), "
        "i -> array_join(slice(split(text,' '), i+1, 2), ' ')) END"
    )
    # is_target is a pure doc_id expression — recompute it inline
    # rather than self-joining docs back to d (a corpus-sized build
    # side at 100 TB; Catalyst broadcast-joined it at fixture scale,
    # which is exactly the wrong plan to grow).
    gb = (
        docs.select(
            "doc_id",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            .isin(*_DSIR_TARGET_CHARS)
            .alias("is_target"),
            F.explode(F.concat(toks, bigrams)).alias("g"),
        )
        .select(
            "doc_id",
            "is_target",
            (
                F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
                % DSIR_BUCKETS
            ).alias("bucket"),
        )
    )

    spine = docs.sparkSession.range(DSIR_BUCKETS).select(
        F.col("id").alias("bucket")
    )

    def model_q(flag_target: bool):
        side = gb.filter(
            F.col("is_target") if flag_target else ~F.col("is_target")
        )
        if not flag_target and pool_ids is not None:
            side = side.join(pool_ids, "doc_id", "semi")
        cnt = side.groupBy("bucket").agg(F.count("*").alias("n"))
        tot = side.agg(F.count("*").alias("tn"))
        staged = (
            spine.join(cnt, "bucket", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "bucket",
                (F.coalesce(F.col("n"), F.lit(0)) + 1)
                .cast("long")
                .alias("c"),
                (F.col("tn") + DSIR_BUCKETS).cast("long").alias("t"),
            )
        )
        for stage in _unigram_q_stages():
            staged = staged.selectExpr("*", *stage)
        return staged.select("bucket", "q")

    lr = (
        model_q(True)
        .withColumnRenamed("q", "q_t")
        .join(model_q(False).withColumnRenamed("q", "q_r"), "bucket")
        .select("bucket", (F.col("q_t") - F.col("q_r")).alias("lr"))
    )
    raw_gb = gb.filter(~F.col("is_target"))
    pool_d = d.filter(~F.col("is_target"))
    if pool_ids is not None:
        raw_gb = raw_gb.join(pool_ids, "doc_id", "semi")
        pool_d = pool_d.join(pool_ids, "doc_id", "semi")
    wts = (
        raw_gb.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lr").cast("long").alias("wq"))
    )
    u = pool_d.select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit("#dsir")
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            + 1
        ).alias("c"),
        F.lit(_DSIR_U_DENOM).cast("long").alias("t"),
    )
    for stage in _unigram_q_stages():
        u = u.selectExpr("*", *stage)
    return (
        u.select("doc_id", F.col("q").alias("q_u"))
        .join(wts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("wq"), F.lit(0)).alias("wq"),
            "q_u",
        )
    )


def _fertility_oracle() -> str:
    return (
        _bpe_oracle_ctes()
        + f""",
    wa AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    per_lang AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(length(w)) AS BIGINT) AS n_chars,
               CAST(SUM(len(syms)) AS BIGINT) AS bpe_tokens
        FROM wa JOIN v{BPE_MERGE_ITERS} USING (w)
        GROUP BY lang
    )
    SELECT lang, n_words, n_chars, bpe_tokens,
           bpe_tokens * 1000 // n_words AS fertility_milli,
           n_chars * 1000 // bpe_tokens AS chars_per_token_milli,
           (bpe_tokens * 1000 // n_words
            - MIN(bpe_tokens * 1000 // n_words) OVER ()) * 1000
               // MIN(bpe_tokens * 1000 // n_words) OVER ()
               AS premium_pm
    FROM per_lang
    ORDER BY lang
    """
    )


@register("pipeline_tokenizer_fertility", oracle=_fertility_oracle())
def pipeline_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKENIZER FERTILITY by language — the multilingual-fairness
    report every tokenizer ship reviews: train the BPE tokenizer once
    on the whole corpus (the shared _bpe_train loop
    pipeline_bpe_merges/apply use), encode every word, and report per
    language the fertility (subword tokens per word, milli), the
    compression (chars per token, milli), and the fairness premium —
    each language's fertility overhead vs the best-served language in
    ppm, i.e. how much more compute and effective context that
    language pays for the same text (Ács 2019; Rust et al. 2021).

    Scale shape identical to pipeline_bpe_apply: training touches only
    the vocabulary frame; encoding is an equi-join of the exploded
    corpus words onto the encoded vocab (one shuffle, or broadcast
    when the vocab fits); the per-language report is a 5-row
    aggregation, and the cross-language MIN is a window over those 5
    rows. All ratios are integer milli/ppm (G11) — no float risk."""
    docs = load(spark, sf_dir, "documents")
    vocab, _ = _bpe_train(_bpe_vocab(docs))
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    per_lang = (
        words.join(vocab.select("w", "syms"), "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum(F.size("syms")).cast("bigint").alias("bpe_tokens"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_lang.select(
            "lang",
            "n_words",
            "n_chars",
            "bpe_tokens",
            F.expr("bpe_tokens * 1000 DIV n_words").alias(
                "fertility_milli"
            ),
            F.expr("n_chars * 1000 DIV bpe_tokens").alias(
                "chars_per_token_milli"
            ),
        )
        .withColumn(
            "_fert_min", F.min("fertility_milli").over(w_all)
        )
        # Integer DIV (Spark) ↔ // (DuckDB), never float-divide-then-
        # cast: truncation vs floor could diverge on a near-integer
        # quotient (G11).
        .withColumn(
            "premium_pm",
            F.expr(
                "(fertility_milli - _fert_min) * 1000 DIV _fert_min"
            ),
        )
        .drop("_fert_min")
        .orderBy("lang")
    )


# ----------------------------------------------------- DoReMi-style
# Domain reweighting (Xie et al. 2023b, arXiv:2305.10429): solve for
# per-domain sampling weights by multiplicative-weights iterates on
# per-domain EXCESS LOSS. The loss proxy here is the corpus
# hashed-n-gram surprise (the DSIR bucket model machinery — no neural
# reference model in a SQL engine); the iterate is the LINEARIZED
# exponentiated-gradient step exp(ηx) ≈ 1 + ηx in exact integer
# arithmetic, so both engines produce identical weights.
DOREMI_ROUNDS = 10
DOREMI_SCALE = 10**7  # update-factor grid: factor = SCALE + η·excess
DOREMI_ETA_DIV = 4  # η = 1/4 per micro-nat of excess
DOREMI_NORM = 10**9  # weights are renormalized to ~sum to NORM


def _domain_reweight_oracle() -> str:
    m_sql, m_last = _dsir_staged_sql("m0", "dwms")
    rounds_sql = ""
    for t in range(1, DOREMI_ROUNDS + 1):
        rounds_sql += f"""dwr{t} AS (
        SELECT source, excess_micro,
               u * {DOREMI_NORM} // SUM(u) OVER () AS w
        FROM (SELECT source, excess_micro,
                     w * ({DOREMI_SCALE} + excess_micro // {DOREMI_ETA_DIV})
                         // {DOREMI_SCALE} AS u
              FROM dwr{t - 1})
    ),
    """
    return f"""
    WITH dwg AS MATERIALIZED (
        SELECT source,
               CAST(CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT)
                    % {DSIR_BUCKETS} AS BIGINT) AS bucket
        FROM (SELECT source,
                     unnest(list_concat(
                         ws,
                         CASE WHEN nw < 2 THEN CAST([] AS VARCHAR[])
                              ELSE list_transform(
                                  range(nw - 1),
                                  i -> array_to_string(ws[i+1:i+2], ' '))
                         END)) AS g
              FROM (SELECT source, string_split(text, ' ') AS ws,
                           len(string_split(text, ' ')) AS nw
                    FROM documents))
    ),
    dwspine AS (SELECT unnest(range({DSIR_BUCKETS})) AS bucket),
    dwc AS (SELECT bucket, COUNT(*) AS n FROM dwg GROUP BY bucket),
    dwt AS (SELECT COUNT(*) AS n FROM dwg),
    m0 AS (
        SELECT s.bucket,
               CAST(COALESCE(c.n, 0) + 1 AS BIGINT) AS c,
               CAST(t.n + {DSIR_BUCKETS} AS BIGINT) AS t
        FROM dwspine s LEFT JOIN dwc c USING (bucket) CROSS JOIN dwt t
    ),
{m_sql}    dwloss AS MATERIALIZED (
        SELECT g.source,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM((-q.q) // 1000000) // COUNT(*) AS BIGINT)
                   AS loss_micro
        FROM dwg g JOIN {m_last} q USING (bucket)
        GROUP BY g.source
    ),
    dwx AS (
        SELECT source, n_grams, loss_micro,
               loss_micro - MIN(loss_micro) OVER () AS excess_micro
        FROM dwloss
    ),
    dwr0 AS (
        SELECT source, excess_micro,
               CAST({DOREMI_NORM} AS BIGINT)
                   // (SELECT COUNT(*) FROM dwx) AS w
        FROM dwx
    ),
    {rounds_sql}dwdocs AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    )
    SELECT x.source,
           d.n_docs,
           x.n_grams,
           x.loss_micro,
           x.excess_micro,
           CAST(r.w AS BIGINT) AS weight_ppb
    FROM dwx x
    JOIN dwr{DOREMI_ROUNDS} r USING (source)
    JOIN dwdocs d USING (source)
    ORDER BY x.source
    """


@register("pipeline_domain_reweight", oracle=_domain_reweight_oracle())
def pipeline_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-STYLE DOMAIN REWEIGHTING (Xie et al. 2023b,
    arXiv:2305.10429): the data-mixture solve that sits beside
    temperature mixing in a pretraining pipeline — instead of
    rebalancing by COUNT (pipeline_mix_temperature), up-weight the
    domains the model finds HARD. Each source's loss proxy is its
    mean hashed-n-gram surprise under the corpus bag-of-grams model
    (the DSIR bucket machinery: unigram+bigram md5 buckets, Laplace
    smoothing, the shared pico-ln ladder → exact integer micro-nats
    per gram); its EXCESS is the gap to the easiest domain (the
    reference-model role); DOREMI_ROUNDS multiplicative-weights
    iterates w ← w·(1 + η·excess)/Z then yield the sampling weights.
    exp(ηx) ≈ 1+ηx is the linearized EG step — with a static proxy
    loss the fixpoint direction is identical and every iterate is
    EXACT INTEGER (floor-div against DOREMI_SCALE, renormalized to
    DOREMI_NORM parts-per-billion), so Spark and DuckDB agree
    bit-for-bit; a full DoReMi run re-estimates the loss under the
    evolving mixture, which needs the trained proxy model this engine
    deliberately replaces with the n-gram surprise.

    Scale shape: one gram explode (the DSIR pass shape) → 64-row
    bucket model through the ladder → per-source loss via a
    64-row broadcast join and map-side-combined aggregate; the
    iterates run on the |sources|-row frame (window sums over a
    domain panel, bounded at ANY scale). Nothing corpus-sized
    shuffles. Output: per-source gram counts, loss, excess, and the
    solved weight in ppb."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.expr(
        "CASE WHEN size(split(text,' ')) < 2 "
        "THEN CAST(array() AS array<string>) ELSE "
        "transform(sequence(0, size(split(text,' ')) - 2), "
        "i -> array_join(slice(split(text,' '), i+1, 2), ' ')) END"
    )
    gb = docs.select(
        "source", F.explode(F.concat(toks, bigrams)).alias("g")
    ).select(
        "source",
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    spine = docs.sparkSession.range(DSIR_BUCKETS).select(
        F.col("id").alias("bucket")
    )
    cnt = gb.groupBy("bucket").agg(F.count("*").alias("n"))
    tot = gb.agg(F.count("*").alias("tn"))
    model = (
        spine.join(cnt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("long").alias("c"),
            (F.col("tn") + DSIR_BUCKETS).cast("long").alias("t"),
        )
    )
    for stage in _unigram_q_stages():
        model = model.selectExpr("*", *stage)
    loss = (
        gb.join(F.broadcast(model.select("bucket", "q")), "bucket")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.expr("SUM((-q) DIV 1000000) DIV COUNT(*)")
            .cast("long")
            .alias("loss_micro"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dwx = loss.select(
        "source",
        "n_grams",
        "loss_micro",
        (F.col("loss_micro") - F.min("loss_micro").over(w_all)).alias(
            "excess_micro"
        ),
    )
    dw = dwx.select(
        "source",
        "excess_micro",
        F.expr(f"CAST({DOREMI_NORM} AS BIGINT) DIV COUNT(*) OVER ()")
        .alias("w"),
    )
    for _ in range(DOREMI_ROUNDS):
        dw = dw.select(
            "source",
            "excess_micro",
            F.expr(
                f"w * ({DOREMI_SCALE} + excess_micro DIV {DOREMI_ETA_DIV})"
                f" DIV {DOREMI_SCALE}"
            ).alias("u"),
        ).select(
            "source",
            "excess_micro",
            F.expr(f"u * {DOREMI_NORM} DIV SUM(u) OVER ()").alias("w"),
        )
    n_docs = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return (
        dwx.join(dw.select("source", F.col("w").alias("weight_ppb")), "source")
        .join(n_docs, "source")
        .select(
            "source",
            "n_docs",
            "n_grams",
            "loss_micro",
            "excess_micro",
            F.col("weight_ppb").cast("bigint").alias("weight_ppb"),
        )
        .orderBy("source")
    )


# ------------------------------------------ weighted reservoir (E-S)
ES_SAMPLE_K = 64  # sample size
_ES_SALT = "#esamp"  # independent uniform draw (DSIR-style md5 salt)


def _es_oracle() -> str:
    ladder_sql, ladder_last = _dsir_staged_sql("es0", "ess")
    return f"""
    WITH esd AS MATERIALIZED (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS w_tokens
        FROM documents
    ),
    es0 AS MATERIALIZED (
        SELECT doc_id, lang, w_tokens,
               CAST(CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR) || '{_ES_SALT}'), 1, 6))
                   AS BIGINT) + 1 AS BIGINT) AS c,
               CAST({_DSIR_U_DENOM} AS BIGINT) AS t
        FROM esd
    ),
{ladder_sql}    eskey AS (
        SELECT doc_id, lang, w_tokens,
               CAST((((-q) // 1000000) * 1000000000) // w_tokens
                    AS BIGINT) AS sort_key
        FROM {ladder_last}
    ),
    espick AS (
        SELECT * FROM eskey
        ORDER BY sort_key, doc_id LIMIT {ES_SAMPLE_K}
    )
    SELECT CAST(row_number() OVER (ORDER BY sort_key, doc_id)
                AS BIGINT) AS rank,
           doc_id, lang, w_tokens, sort_key
    FROM espick
    ORDER BY rank
    """


@register("sample_weighted_reservoir", oracle=_es_oracle())
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling WITHOUT replacement in one distributed pass —
    Efraimidis & Spirakis (2006): give every doc the key u^(1/w)
    (u uniform, w its token-count weight) and keep the k largest; the
    inclusion probability is proportional to weight and the sample is
    exact-size — the primitive behind weighted corpus subsampling
    (epoch mixtures, eval-slice draws) that Bernoulli keep-rates
    (pipeline_quality_weighted_sample's banded contract) cannot give
    you when the budget is a hard k. Deterministic and integer-exact
    cross-engine: u is the salted md5 24-bit uniform on the
    (c, 2^24) grid and ln u comes from the SHARED pico-ln ladder (the
    DSIR draw machinery verbatim), maximizing u^(1/w) ⟺ minimizing
    (−ln u)/w, computed as the fixed-point BIGINT
    ((−q) // 1e6) · 1e9 // w on provably non-negative operands
    (q ≤ 0 since c ≤ 2^24) — micro-grid key ties break on doc_id
    (G4/G5; the micro quantization is the documented tie granularity,
    not a correctness bound).

    Plan shape at 100 TB: ONE corpus scan — draw, ladder, and key are
    per-row codegen expressions (no join, no model table); selection
    is a global top-k, which Spark plans as TakeOrderedAndProject
    (per-partition k-heaps, k-row driver merge — the flagship
    orderby_limit_topk shape, zero shuffles); ranking then runs on
    the k-row result. Task retries re-derive identical keys (the
    md5-not-rand discipline every sampling op here follows)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("w_tokens"),
    )
    drawn = docs.select(
        "doc_id",
        "lang",
        "w_tokens",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(_ES_SALT),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            + 1
        ).alias("c"),
        F.lit(_DSIR_U_DENOM).cast("long").alias("t"),
    )
    for stage in _unigram_q_stages():
        drawn = drawn.selectExpr("*", *stage)
    keyed = drawn.select(
        "doc_id",
        "lang",
        "w_tokens",
        F.expr("(((-q) DIV 1000000) * 1000000000) DIV w_tokens")
        .cast("long")
        .alias("sort_key"),
    )
    picked = keyed.orderBy("sort_key", "doc_id").limit(ES_SAMPLE_K)
    w_rank = Window.orderBy("sort_key", "doc_id")
    return (
        picked.withColumn(
            "rank", F.row_number().over(w_rank).cast("long")
        )
        .select("rank", "doc_id", "lang", "w_tokens", "sort_key")
        .orderBy("rank")
    )


# ------------------------------------------- multinomial Naive Bayes
NB_TRAIN_BAND = ("0", "7")  # md5 first hex char: deterministic half


def _nb_oracle() -> str:
    m_sql, m_last = _dsir_staged_sql("nbm0", "nbms")
    p_sql, p_last = _dsir_staged_sql("nbp0", "nbps")
    lo, hi = NB_TRAIN_BAND
    return f"""
    WITH nbd AS MATERIALIZED (
        SELECT doc_id, lang, string_split(text, ' ') AS toks,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        BETWEEN '{lo}' AND '{hi}'
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    ),
    nbti AS MATERIALIZED (
        SELECT lang AS cls, unnest(toks) AS w
        FROM nbd WHERE split = 'train'
    ),
    nbcnt AS (SELECT cls, w, CAST(COUNT(*) AS BIGINT) AS n
              FROM nbti GROUP BY cls, w),
    nbtok AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS tok_c
              FROM nbti GROUP BY cls),
    nbvoc AS (SELECT DISTINCT w FROM nbti),
    nbv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM nbvoc),
    nbm0 AS MATERIALIZED (
        SELECT s.w, s.cls,
               CAST(COALESCE(c.n, 0) + 1 AS BIGINT) AS c,
               CAST(t.tok_c + v.v AS BIGINT) AS t
        FROM (SELECT w, cls FROM nbvoc CROSS JOIN nbtok) s
        LEFT JOIN nbcnt c ON s.w = c.w AND s.cls = c.cls
        JOIN nbtok t ON s.cls = t.cls
        CROSS JOIN nbv v
    ),
{m_sql}    nbmodel AS MATERIALIZED (
        SELECT w, cls, q AS q_wc FROM {m_last}
    ),
    nbdc AS (SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS docs_c
             FROM nbd WHERE split = 'train' GROUP BY lang),
    nbdt AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs_t FROM nbd
             WHERE split = 'train'),
    nbp0 AS (
        SELECT cls, docs_c AS c, docs_t AS t
        FROM nbdc CROSS JOIN nbdt
    ),
{p_sql}    nbprior AS (SELECT cls, q AS q_pr FROM {p_last}),
    nbei AS MATERIALIZED (
        SELECT doc_id, unnest(toks) AS w
        FROM nbd WHERE split = 'eval'
    ),
    nbsum AS (
        SELECT e.doc_id, m.cls, CAST(SUM(m.q_wc) AS BIGINT) AS s
        FROM nbei e JOIN nbmodel m ON e.w = m.w
        GROUP BY e.doc_id, m.cls
    ),
    nbscore AS (
        SELECT d.doc_id, d.lang AS true_lang, p.cls,
               p.q_pr + COALESCE(s.s, 0) AS score
        FROM (SELECT doc_id, lang FROM nbd WHERE split = 'eval') d
        CROSS JOIN nbprior p
        LEFT JOIN nbsum s ON s.doc_id = d.doc_id AND s.cls = p.cls
    ),
    nbpred AS (
        SELECT doc_id, true_lang, cls AS pred_lang
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY score DESC, cls) AS rn
              FROM nbscore)
        WHERE rn = 1
    )
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM nbpred
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """


@register("ml_naive_bayes_lang", oracle=_nb_oracle())
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes TRAINED AND SERVED in the engine — the
    fastText-style bag-of-words classifier every data pipeline keeps
    for language/quality routing (McCallum & Nigam 1998), here as pure
    relational algebra: a deterministic md5 half-split trains add-1
    per-class word models P(w|c) = (n_wc+1)/(tok_c+V) and doc priors,
    every held-out doc scores argmax_c [ln P(c) + Σ ln P(w|c)], and
    the output is the eval confusion matrix (true_lang × pred_lang
    counts). Integer-exact cross-engine: every probability is a ratio
    of exact BIGINT counts through the SHARED pico-ln ladder, scores
    are BIGINT pico-nat sums, and the argmax tie-breaks on class name
    (G4/G5). OOV eval words have no vocab row and drop from the sum —
    uniformly across classes, the standard multinomial-NB treatment.
    The vocab × class spine guarantees a model row for every
    in-vocab (w, c) pair, so zero-count smoothing is explicit, and a
    doc whose every word is OOV still gets the prior-only argmax (the
    class frame LEFT JOIN keeps it).

    Plan shape at 100 TB: the model is vocab×|classes|-bounded, built
    by map-side-combinable groupBys (shuffles carry word keys, never
    documents); serving joins the eval token stream against the model
    on w (AQE-broadcast at small SF, co-partitioned by word at scale
    — the same sharded-count-join as text_stupid_backoff_lm), one
    per-doc partial agg, a |classes|-row broadcast for the prior
    spine, and a per-doc argmax window. Train/serve are ONE lineage:
    retraining is rerunning the query — the in-engine-classifier
    story ml_logreg_gd tells, for the text surface."""
    lo, hi = NB_TRAIN_BAND
    toks = F.split("text", " ")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            .between(lo, hi),
            F.lit("train"),
        )
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    ti = docs.filter(F.col("split") == "train").select(
        F.col("lang").alias("cls"), F.explode("toks").alias("w")
    )
    cnt = ti.groupBy("cls", "w").agg(
        F.count("*").cast("long").alias("n")
    )
    tok_c = ti.groupBy("cls").agg(
        F.count("*").cast("long").alias("tok_c")
    )
    vocab = ti.select("w").distinct()
    v = vocab.agg(F.count("*").cast("long").alias("v"))
    spine = vocab.crossJoin(F.broadcast(tok_c.select("cls")))
    model = (
        spine.join(cnt, ["w", "cls"], "left")
        .join(F.broadcast(tok_c), "cls")
        .crossJoin(F.broadcast(v))
        .select(
            "w",
            "cls",
            (F.coalesce(F.col("n"), F.lit(0)) + 1)
            .cast("long")
            .alias("c"),
            (F.col("tok_c") + F.col("v")).cast("long").alias("t"),
        )
    )
    for stage in _unigram_q_stages():
        model = model.selectExpr("*", *stage)
    model = model.select("w", "cls", F.col("q").alias("q_wc"))
    dc = docs.filter(F.col("split") == "train").groupBy("lang").agg(
        F.count("*").cast("long").alias("docs_c")
    )
    dt = docs.filter(F.col("split") == "train").agg(
        F.count("*").cast("long").alias("docs_t")
    )
    prior = (
        dc.crossJoin(F.broadcast(dt))
        .select(
            F.col("lang").alias("cls"),
            F.col("docs_c").cast("long").alias("c"),
            F.col("docs_t").cast("long").alias("t"),
        )
    )
    for stage in _unigram_q_stages():
        prior = prior.selectExpr("*", *stage)
    prior = prior.select("cls", F.col("q").alias("q_pr"))
    ei = docs.filter(F.col("split") == "eval").select(
        "doc_id", F.explode("toks").alias("w")
    )
    sums = (
        ei.join(model, "w")
        .groupBy("doc_id", "cls")
        .agg(F.sum("q_wc").cast("long").alias("s"))
    )
    base = (
        docs.filter(F.col("split") == "eval")
        .select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(prior))
        .join(sums, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "true_lang",
            "cls",
            (
                F.col("q_pr") + F.coalesce(F.col("s"), F.lit(0))
            ).alias("score"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls")
    )
    pred = (
        base.withColumn("rn", F.row_number().over(w_doc))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cls").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )
