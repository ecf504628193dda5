"""End-to-end training-data preparation pipeline — the capstone op.

Composes the engine's LLM-pipeline pieces into the canonical pre-training
data flow over ``documents``:

    quality filter → near-duplicate removal → token accounting →
    deterministic sampling → per-language yield report

Every stage is a pure DataFrame transformation, so Catalyst fuses the
whole pipeline into a handful of stages; at 100 TB the near-dup stage
swaps in minhash_neardup's LSH candidates with no change to the
surrounding plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load, load_spread
from pg_archiver_spark.functions.dedup import (
    JACCARD_PRED_SQL,
    JACCARD_THRESHOLD,
    MAX_SHINGLE_DF,
    SHINGLE_K,
    _shingle_pairs_ctes,
    _shingles,
)
from pg_archiver_spark.registry import register


@register(
    "pipeline_training_prep",
    oracle=f"""
    WITH quality AS (
        SELECT doc_id, lang, text,
               len(string_split(text,' ')) AS n_tokens
        FROM documents
        WHERE len(string_split(text,' ')) >= 20
          AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
              / len(string_split(text,' ')) >= 0.35
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {SHINGLE_K - 1}),
                   i -> array_to_string(string_split(text,' ')[i+1:i+{SHINGLE_K}], ' ')
               )) AS shingles
        FROM quality
    ),
    dup_losers AS (
        SELECT DISTINCT b.doc_id
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= {JACCARD_THRESHOLD}
    ),
    surviving AS (
        SELECT q.* FROM quality q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM dup_losers)
    ),
    sampled AS (
        SELECT * FROM surviving
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) * 1000) // COUNT(*) AS BIGINT) AS avg_tokens_milli
    FROM sampled
    GROUP BY lang
    """,
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full prep flow: (1) quality gate — ≥20 tokens and type/token
    ratio ≥0.35; (2) near-dup removal — of each duplicate pair keep the
    lower doc_id (exact shingle-Jaccard here; minhash_neardup is the
    drop-in LSH form at scale); (3) deterministic md5 ~25% sample;
    (4) per-language token yield report."""
    # Spread tokenize/shingle CPU across cores (single small source file).
    docs = load_spread(spark, sf_dir, "documents")
    # Cached: the gate feeds the dedup pair-join (both sides), the
    # survivors join, and the final agg — without it the tokenization
    # expressions re-run once per consumer. r13 (guide §7.3): predicates
    # and projection parse from SQL text (CAST(0.35 AS DOUBLE), not a
    # bare decimal literal, to match the original F.lit float).
    quality = (
        docs.filter(
            "size(split(text, ' ')) >= 20"
            " AND CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)"
            " / size(split(text, ' ')) >= CAST(0.35 AS DOUBLE)"
        )
        .selectExpr(
            "doc_id", "lang", "text", "size(split(text, ' ')) AS n_tokens"
        )
        .cache()
    )

    # Pair generation via the shared-shingle equi-join (docs sharing no
    # shingle never meet — sub-quadratic, same pattern as
    # dedup_ngram_jaccard; swap in minhash banding at 100 TB). The
    # hot-shingle df cap bounds worst-case fan-out: a boilerplate
    # shingle shared by 10⁶ docs would alone yield 10¹² pairs; above
    # MAX_SHINGLE_DF it carries ~no Jaccard signal and is dropped
    # BEFORE the join via a broadcast anti-join against the tiny hot
    # set (no-op on fixtures — cap >> fixture max df).
    from pg_archiver_spark.functions.dedup import _shingles_sql

    exploded = quality.selectExpr(
        "doc_id", f"{_shingles_sql('text')} AS shingles"
    ).selectExpr(
        "doc_id", "size(shingles) AS n_sh", "explode(shingles) AS shingle"
    )
    hot = (
        exploded.groupBy("shingle")
        .agg(F.expr("count(*) AS df"))
        .filter(f"df > {MAX_SHINGLE_DF}")
        .select("shingle")
    )
    ex = exploded.join(F.broadcast(hot), "shingle", "left_anti").cache()
    a = ex.selectExpr("doc_id AS d1", "n_sh AS n1", "shingle")
    b = ex.selectExpr("doc_id AS d2", "n_sh AS n2", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter("d1 < d2")
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.expr("count(*) AS n_common"))
    )
    losers = (
        inter.filter(
            "CAST(n_common AS DOUBLE) / (n1 + n2 - n_common)"
            f" >= CAST({JACCARD_THRESHOLD} AS DOUBLE)"
        )
        .selectExpr("d2 AS doc_id")
        .distinct()
    )
    surviving = quality.join(losers, "doc_id", "left_anti")

    sampled = surviving.filter(
        "substring(md5(CAST(doc_id AS STRING)), 1, 1)"
        " IN ('0', '1', '2', '3')"
    )
    return sampled.groupBy("lang").agg(
        F.expr("count(*) AS n_docs"),
        F.expr("SUM(n_tokens) AS total_tokens"),
        F.expr("(SUM(n_tokens) * 1000) DIV COUNT(*) AS avg_tokens_milli"),
    )


@register(
    "pipeline_neardup_dedup_e2e",
    # Round-8 conversion (rows-only → sql-checked): with minhash_neardup
    # itself now hash-checked against the exact pair set (fixture recall
    # is a deterministic fact — see its oracle comment), the rest of the
    # flow is relational: transitive clusters are a recursive-CTE
    # reachability min-label, keep-best is a window, and the yield
    # report is a group-by. A regression anywhere in the composed flow
    # (pairs, clustering, survivor policy) now hash-fails.
    oracle=f"""
    WITH RECURSIVE {_shingle_pairs_ctes("prs")},
    p AS (
        SELECT doc1, doc2 FROM prs
        WHERE {JACCARD_PRED_SQL}
    ),
    edges AS (
        SELECT doc1 AS s, doc2 AS d FROM p
        UNION ALL SELECT doc2, doc1 FROM p
    ),
    reach AS (
        SELECT s AS doc_id, d AS r FROM edges
        UNION
        SELECT rr.doc_id, e2.d FROM reach rr JOIN edges e2 ON rr.r = e2.s
    ),
    labels AS (
        SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster
        FROM reach GROUP BY doc_id
    ),
    docs AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cl AS (
        SELECT d.doc_id, d.lang, d.n_tokens,
               COALESCE(l.cluster, d.doc_id) AS cluster
        FROM docs d LEFT JOIN labels l USING (doc_id)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster ORDER BY n_tokens DESC, doc_id
        ) AS rn FROM cl
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM ranked
    GROUP BY lang
    """,
)
def pipeline_neardup_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END near-duplicate dedup flow, composed from the
    engine's own scale-path pieces: MinHash-LSH candidate pairs
    (minhash_neardup) → transitive clusters (min-label propagation) →
    KEEP-BEST survivor per cluster (longest doc, doc_id tiebreak — the
    pipeline_dedup_keep_best policy applied to NEAR-dup clusters) →
    per-language yield report. This is the dedup stage a 100 TB corpus
    build actually runs: every step is sub-quadratic (banded LSH
    bucket join, diameter-bounded label propagation, one window over
    cluster-partitioned docs), in contrast to the exact-Jaccard twin
    that serves as its fixture-scale ground truth.

    Invariants additionally pinned in tests/test_round5.py:
    survivors+dropped partition the corpus, one survivor per cluster,
    and the survivor is its cluster's (n_tokens, -doc_id) max."""
    from pyspark.sql import Window

    from pg_archiver_spark.functions.dedup import (
        minhash_neardup,
        propagate_min_labels,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    pairs = minhash_neardup(spark, sf_dir).select("doc1", "doc2")
    labels = propagate_min_labels(pairs)  # (doc_id, label) for clustered docs
    clustered = docs.join(labels, "doc_id", "left").withColumn(
        # Singletons form their own cluster.
        "cluster", F.coalesce(F.col("label"), F.col("doc_id"))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_tokens"), F.col("doc_id")
    )
    ranked = clustered.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("rn") == 1).alias("n_kept"),
            F.count_if(F.col("rn") > 1).alias("n_dropped"),
            F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_incremental_neardup",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0', '1', '2') AS is_new,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {SHINGLE_K - 1}),
                   i -> array_to_string(
                       string_split(text,' ')[i+1:i+{SHINGLE_K}], ' ')
               )) AS shingles
        FROM documents
    ),
    pairs AS (
        SELECT n.doc_id AS new_doc,
               o.is_new AS other_is_new,
               o.doc_id AS other_doc
        FROM sh n JOIN sh o ON n.doc_id <> o.doc_id
        WHERE n.is_new
          AND (NOT o.is_new OR o.doc_id < n.doc_id)
          AND CAST(len(list_intersect(n.shingles, o.shingles)) AS DOUBLE)
              / (len(n.shingles) + len(o.shingles)
                 - len(list_intersect(n.shingles, o.shingles)))
              >= {JACCARD_THRESHOLD}
    ),
    flags AS (
        SELECT s.doc_id,
               COALESCE(MAX(CASE WHEN NOT p.other_is_new
                                 THEN 1 ELSE 0 END), 0) AS hit_old,
               COALESCE(MAX(CASE WHEN p.other_is_new
                                 THEN 1 ELSE 0 END), 0) AS hit_new
        FROM sh s LEFT JOIN pairs p ON p.new_doc = s.doc_id
        WHERE s.is_new
        GROUP BY s.doc_id
    )
    SELECT CASE WHEN hit_old = 1 THEN 'dup_of_existing'
                WHEN hit_new = 1 THEN 'dup_within_batch'
                ELSE 'unique' END AS status,
           COUNT(*) AS n_docs
    FROM flags
    GROUP BY status
    ORDER BY status
    """,
)
def pipeline_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup — the shape a continuously-ingested
    corpus actually runs: a new batch (~19% of docs, deterministic md5
    split) is deduped against the EXISTING corpus and within itself,
    WITHOUT ever re-pairing existing×existing. This is the operational
    difference between "dedup the lake nightly" (quadratic in corpus)
    and "dedup the delta on arrival" (linear in batch): at 100 TB the
    existing side contributes only its PERSISTED LSH band keys (the
    signature store an ingest pipeline maintains), and the bucket join
    is |new-bands| ⋈ store — candidate volume scales with the batch,
    not the corpus.

    Plan: shingles → minhash signatures → band keys for all docs (the
    existing side modeling the persisted store); candidates = new-side
    bands ⋈ all bands on (band, bucket), keeping (new, old) pairs and
    (new, earlier-new) pairs — keep-first discipline inside the batch;
    exact-Jaccard verify confined to candidates; per-new-doc flags via
    one groupBy; left-join back so candidate-less docs classify as
    'unique'. Output: status × count. The oracle recomputes the
    classification with EXACT quadratic Jaccard in DuckDB, so LSH
    recall on the fixture's planted dups (j ≥ 0.9; miss probability
    (1-0.81)^12 ≈ 2e-9 with FIXED xxhash64 functions — deterministic)
    must be perfect for the hash to match.

    Imports the banding constants from dedup.py so the two stages
    cannot drift apart.
    """
    from pg_archiver_spark.functions.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_HASHES,
    )

    docs = load_spread(spark, sf_dir, "documents")
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2"
    )
    sh = docs.select(
        "doc_id",
        is_new.alias("is_new"),
        _shingles(F.col("text")).alias("shingles"),
    ).cache()

    ex = sh.select("doc_id", "is_new", F.explode("shingles").alias("h"))
    sig = ex.groupBy("doc_id", "is_new").agg(
        *[
            F.min(F.xxhash64(F.lit(k), F.col("h"))).alias(f"mh{k}")
            for k in range(MINHASH_HASHES)
        ]
    )
    band_hashes = F.array(
        *[
            F.xxhash64(
                *[F.col(f"mh{band * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
            for band in range(LSH_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", "is_new", F.posexplode(band_hashes).alias("band", "bucket")
    )

    new_bands = bands.filter(F.col("is_new")).select(
        "band", "bucket", F.col("doc_id").alias("new_doc")
    )
    # the full band set stands in for the persisted signature store
    store = bands.select(
        "band", "bucket",
        F.col("doc_id").alias("other_doc"),
        F.col("is_new").alias("other_is_new"),
    )
    candidates = (
        new_bands.join(store, ["band", "bucket"])
        .filter(
            (F.col("other_doc") != F.col("new_doc"))
            & (~F.col("other_is_new") | (F.col("other_doc") < F.col("new_doc")))
        )
        .select("new_doc", "other_doc", "other_is_new")
        .distinct()
    )

    sh_n = sh.select(F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_n"))
    sh_o = sh.select(F.col("doc_id").alias("other_doc"), F.col("shingles").alias("sh_o"))
    verified = (
        candidates.join(sh_n, "new_doc")
        .join(sh_o, "other_doc")
        # r13: |A∪B| = |A|+|B|−|A∩B| (shingle arrays are distinct) —
        # one hash-set build per candidate pair, identical quotient.
        .withColumn("n_inter", F.size(F.array_intersect("sh_n", "sh_o")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_n") + F.size("sh_o") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    flags = verified.groupBy("new_doc").agg(
        F.max((~F.col("other_is_new")).cast("int")).alias("hit_old"),
        F.max(F.col("other_is_new").cast("int")).alias("hit_new"),
    )
    new_docs = sh.filter(F.col("is_new")).select(F.col("doc_id").alias("new_doc"))
    status = (
        new_docs.join(flags, "new_doc", "left")
        .select(
            F.when(F.coalesce(F.col("hit_old"), F.lit(0)) == 1, "dup_of_existing")
            .when(F.coalesce(F.col("hit_new"), F.lit(0)) == 1, "dup_within_batch")
            .otherwise("unique")
            .alias("status")
        )
    )
    return (
        status.groupBy("status")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("status")
    )


# --------------------------------------------------------------------
# The capstone composition: the FULL pretraining data pipeline, every
# stage chained on the previous stage's survivors (round 11; VERDICT
# r10 item #2). Stage functions and their oracle CTE builders are the
# SHARED definitions the standalone ops run — the op proves the
# LLM-pipeline surface composes as an engine, not a list.


def _pretraining_e2e_oracle() -> str:
    """End-to-end funnel oracle: chains the stage builders
    (_gopher_len_cte, _gopher_rep_cte, _decontam_cte,
    _shingle_pairs_ctes, _dsir_sel_cte, _mix_rates_cte,
    _length_batch_cte) into ONE WITH chain over `documents`, each
    stage's source CTE being the previous stage's survivor set."""
    from pg_archiver_spark.functions.curation import (
        _MIX_U32_SQL,
        _U32,
        _decontam_cte,
        _dsir_sel_cte,
        _length_batch_cte,
        _mix_rates_cte,
    )
    from pg_archiver_spark.functions.text import (
        _gopher_len_cte,
        _gopher_rep_cte,
    )

    return f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    {_gopher_len_cte(prefix="gl_")},
    {_gopher_rep_cte(prefix="gr_")},
    s1 AS MATERIALIZED (
        SELECT b.* FROM base b JOIN gl_flags f USING (doc_id)
        WHERE f.p_wc AND f.p_mwl
    ),
    s2 AS MATERIALIZED (
        SELECT s1.* FROM s1 JOIN gr_scored g USING (doc_id)
        WHERE g.p_top2 AND g.p_dup5
    ),
    {_decontam_cte(prefix="dc_")},
    dc_spansum AS (
        SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS tok_kept
        FROM dc_kept GROUP BY doc_id
    ),
    s3 AS MATERIALIZED (
        SELECT * FROM (
            SELECT s2.doc_id, s2.lang, s2.source,
                   CASE WHEN dd.doc_id IS NOT NULL
                        THEN COALESCE(ks.tok_kept, 0)
                        ELSE s2.n_tok END AS tok_eff
            FROM s2
            JOIN dc_d d ON d.doc_id = s2.doc_id
            LEFT JOIN dc_dirty dd ON dd.doc_id = s2.doc_id
            LEFT JOIN dc_spansum ks ON ks.doc_id = s2.doc_id
            WHERE NOT d.is_bench
        ) WHERE tok_eff > 0
    ),
    s3docs AS MATERIALIZED (
        SELECT d.doc_id, d.text
        FROM documents d JOIN s3 USING (doc_id)
    ),
    {_shingle_pairs_ctes(src="s3docs")},
    losers AS (
        SELECT DISTINCT doc2 AS doc_id FROM pairs
        WHERE {JACCARD_PRED_SQL}
    ),
    s4 AS MATERIALIZED (
        SELECT * FROM s3
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    s4ids AS (SELECT doc_id FROM s4),
    {_dsir_sel_cte(pool="s4ids", prefix="ds_")},
    s5 AS MATERIALIZED (
        SELECT s4.* FROM s4 JOIN ds_sel s USING (doc_id)
        WHERE s.q_u <= s.wq
    ),
    {_mix_rates_cte(src="s5", prefix="mx_")},
    s6 AS MATERIALIZED (
        SELECT s5.* FROM s5 JOIN mx_rates r USING (source)
        WHERE {_MIX_U32_SQL} < floor(r.rate * {_U32})
    ),
    bt_src AS (SELECT doc_id, tok_eff AS n_tokens FROM s6),
    {_length_batch_cte(src="bt_src", prefix="lb_")},
    f0 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_in,
                  CAST(SUM(n_tok) AS BIGINT) AS tokens_in
           FROM base GROUP BY lang),
    f1 AS (SELECT lang, COUNT(*) AS n FROM s1 GROUP BY lang),
    f2 AS (SELECT lang, COUNT(*) AS n FROM s2 GROUP BY lang),
    f3 AS (SELECT lang, COUNT(*) AS n, SUM(tok_eff) AS tk
           FROM s3 GROUP BY lang),
    f4 AS (SELECT lang, COUNT(*) AS n FROM s4 GROUP BY lang),
    f5 AS (SELECT lang, COUNT(*) AS n FROM s5 GROUP BY lang),
    f6 AS (SELECT lang, COUNT(*) AS n, SUM(tok_eff) AS tk
           FROM s6 GROUP BY lang),
    f7 AS (SELECT s6.lang, COUNT(DISTINCT b.batch_id) AS n
           FROM lb_batched b JOIN s6 USING (doc_id)
           GROUP BY s6.lang)
    SELECT lang,
           f0.docs_in,
           f0.tokens_in,
           CAST(COALESCE(f1.n, 0) AS BIGINT) AS n_quality_len,
           CAST(COALESCE(f2.n, 0) AS BIGINT) AS n_quality_rep,
           CAST(COALESCE(f3.n, 0) AS BIGINT) AS n_decontam,
           CAST(COALESCE(f3.tk, 0) AS BIGINT) AS tokens_decontam,
           CAST(COALESCE(f4.n, 0) AS BIGINT) AS n_dedup,
           CAST(COALESCE(f5.n, 0) AS BIGINT) AS n_dsir,
           CAST(COALESCE(f6.n, 0) AS BIGINT) AS n_mix,
           CAST(COALESCE(f6.tk, 0) AS BIGINT) AS tokens_final,
           CAST(COALESCE(f7.n, 0) AS BIGINT) AS n_batches
    FROM f0
    LEFT JOIN f1 USING (lang)
    LEFT JOIN f2 USING (lang)
    LEFT JOIN f3 USING (lang)
    LEFT JOIN f4 USING (lang)
    LEFT JOIN f5 USING (lang)
    LEFT JOIN f6 USING (lang)
    LEFT JOIN f7 USING (lang)
    ORDER BY lang
    """


@register("pipeline_pretraining_e2e", oracle=_pretraining_e2e_oracle())
def pipeline_pretraining_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CAPSTONE: the complete pretraining data pipeline, end to
    end, every stage consuming the PREVIOUS stage's survivors — the
    flow a downstream user of the reference's archived corpus actually
    runs before training (reference anchor: README.md:88-102's
    consume-the-archive walkthrough; the reference stops at archival,
    this is the engine the archive feeds):

      1. Gopher LENGTH rules   (_gopher_len_flags — doc-local gate)
      2. Gopher REPETITION     (_gopher_rep_flags — doc-local gate)
      3. Eval DECONTAMINATION  (_decontam_frames — benchmark docs
         leave the pool; colliding docs get span surgery: their
         effective token count becomes the surviving clean fragments'
         sum, and docs with no surviving fragment drop)
      4. NEAR-DUP DEDUP        (_neardup_loser_ids over stage-3
         survivors — keep the lowest doc_id of each duplicate pair;
         restricting pairs to survivors equals running the pair
         stage on the survivor corpus, since Jaccard is pairwise)
      5. DSIR SELECTION        (_dsir_selection with the stage-4
         survivor pool: the RAW n-gram model, the importance weights
         and the accept draws all run on the pool; the TARGET model
         stays the corpus-wide exemplar set, which in production is
         an external curated corpus. Target exemplars leave the
         training pool here.)
      6. TEMPERATURE MIX       (_mix_rates over stage-5 survivors —
         per-source keep rates fitted to the post-selection counts)
      7. LENGTH BATCHING       (_length_batch_assign over the final
         docs' EFFECTIVE token counts — surgery-adjusted)

    Output: the per-language funnel report — docs in, tokens in,
    survivors after every stage, decontamination-adjusted and final
    token yields, and how many training batches carry each language.
    All counts integer-exact; the oracle chains the SAME stage
    definitions (each stage helper has a paired CTE builder) into one
    SQL pipeline, so the end-to-end composition is hash-checked, not
    just each stage in isolation.

    Scale shape: every stage is the standalone op's plan (each
    documented at its definition); the chaining adds only doc_id
    semi-joins between stages (shuffle keys are the compact doc_id,
    never text), and stage predicates stay pushed against the one
    corpus scan each stage frame makes. Gram profiles for selection
    use the original text of surviving docs; materializing the
    surgically-cleaned text instead is a sink-side rewrite
    (sink_parquet_partitioned) that leaves this plan unchanged."""
    from pg_archiver_spark.functions.curation import (
        _U32,
        _decontam_frames,
        _dsir_selection,
        _length_batch_assign,
        _mix_rates,
        _mix_u32,
    )
    from pg_archiver_spark.functions.dedup import _neardup_loser_ids
    from pg_archiver_spark.functions.text import (
        _gopher_len_flags,
        _gopher_rep_flags,
    )

    docs = load_spread(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )

    # Stages 1-2: Gopher quality gates (doc-local predicates).
    s1 = base.join(
        _gopher_len_flags(docs)
        .filter(F.col("p_wc") & F.col("p_mwl"))
        .select("doc_id"),
        "doc_id",
        "semi",
    )
    s2 = s1.join(
        _gopher_rep_flags(docs)
        .filter(F.col("p_top2") & F.col("p_dup5"))
        .select("doc_id"),
        "doc_id",
        "semi",
    )

    # Stage 3: decontamination — bench docs out, span surgery on the
    # colliding docs' token accounting.
    d_dec, dirty, kept = _decontam_frames(docs)
    span_sum = kept.groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("tok_kept")
    )
    s3 = (
        s2.join(d_dec.select("doc_id", "is_bench"), "doc_id")
        .filter(~F.col("is_bench"))
        .join(
            dirty.select("doc_id").withColumn("is_dirty", F.lit(True)),
            "doc_id",
            "left",
        )
        .join(span_sum, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(
                F.col("is_dirty").isNotNull(),
                F.coalesce(F.col("tok_kept"), F.lit(0)),
            )
            .otherwise(F.col("n_tok"))
            .alias("tok_eff"),
        )
        .filter(F.col("tok_eff") > 0)
    )
    # Stage-boundary materialization: each survivor frame is compact
    # (ids + small ints) and consumed by several downstream stages.
    # EAGER localCheckpoint both caches it and TRUNCATES LINEAGE —
    # without the cut, stacking the DSIR ladder on the gopher +
    # decontam + pair-join plan drives Catalyst's collapsed expression
    # tree into unbounded analysis (measured: the un-truncated plan
    # never finished analysis). This is also the production shape: a
    # multi-stage pipeline persists stage outputs between stages (at
    # cluster scale, a reliable checkpoint or a parquet sink instead
    # of executor-local blocks).
    s3 = s3.localCheckpoint(eager=True)

    # Stage 4: near-dup dedup among survivors (keep lowest doc_id).
    losers = _neardup_loser_ids(
        docs.join(s3.select("doc_id"), "doc_id", "semi").select(
            "doc_id", "text"
        )
    )
    s4 = s3.join(losers, "doc_id", "anti").localCheckpoint(eager=True)

    # Stage 5: DSIR selection on the survivor pool. The accept
    # decision is evaluated as a PROJECTED boolean and checkpointed
    # BEFORE filtering: a raw filter over the deep quantized-ln ladder
    # expressions sends Catalyst's pushdown/constraint machinery into
    # a pathological blowup (measured: a single task that never
    # completes), while the identical comparison as a projection
    # evaluates in one pass — the same shape the standalone op's
    # aggregate uses.
    sel = _dsir_selection(docs, pool_ids=s4.select("doc_id"))
    dec = sel.select(
        "doc_id", (F.col("q_u") <= F.col("wq")).alias("keep")
    ).localCheckpoint(eager=True)
    s5 = s4.join(
        dec.filter("keep").select("doc_id"), "doc_id", "semi"
    ).localCheckpoint(eager=True)

    # Stage 6: temperature mix fitted to the post-selection counts.
    rates = _mix_rates(s5)
    s6 = (
        s5.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(_mix_u32() < F.floor(F.col("rate") * _U32))
        .drop("rate")
        .localCheckpoint(eager=True)
    )

    # Stage 7: length batching on effective token counts.
    batches = _length_batch_assign(
        s6.select("doc_id", F.col("tok_eff").alias("n_tokens"))
    )

    def _per_lang(frame, n_name, tok_name=None):
        aggs = [F.count("*").cast("bigint").alias(n_name)]
        if tok_name:
            aggs.append(F.sum("tok_eff").cast("bigint").alias(tok_name))
        return frame.groupBy("lang").agg(*aggs)

    f0 = base.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("docs_in"),
        F.sum("n_tok").cast("bigint").alias("tokens_in"),
    )
    f7 = (
        batches.select("doc_id", "batch_id")
        .join(s6.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.countDistinct("batch_id").cast("bigint").alias("n_batches"))
    )
    funnel = (
        f0.join(_per_lang(s1, "n_quality_len"), "lang", "left")
        .join(_per_lang(s2, "n_quality_rep"), "lang", "left")
        .join(_per_lang(s3, "n_decontam", "tokens_decontam"), "lang", "left")
        .join(_per_lang(s4, "n_dedup"), "lang", "left")
        .join(_per_lang(s5, "n_dsir"), "lang", "left")
        .join(_per_lang(s6, "n_mix", "tokens_final"), "lang", "left")
        .join(f7, "lang", "left")
    )
    zero = F.lit(0).cast("bigint")
    return funnel.select(
        "lang",
        "docs_in",
        "tokens_in",
        *[
            F.coalesce(F.col(c), zero).alias(c)
            for c in (
                "n_quality_len",
                "n_quality_rep",
                "n_decontam",
                "tokens_decontam",
                "n_dedup",
                "n_dsir",
                "n_mix",
                "tokens_final",
                "n_batches",
            )
        ],
    ).orderBy("lang")
