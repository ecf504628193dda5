"""Vector-similarity operators (LLM training-data pipeline surface).

Cosine similarity over ``embeddings.embedding`` (array<float>, 64-dim)
built from higher-order functions (zip_with + aggregate): the math stays
inside Tungsten codegen — no Python, no UDF serialization — which is
the 100 TB-viable form of brute-force scoring.

Search strategies:
  sim_cosine_topk  — brute-force top-k vs one query vector (the exact
                     baseline; O(N) per query, embarrassingly parallel)
  sim_label_avg    — within-group pairwise similarity profile
  sim_ann_lsh      — random-hyperplane LSH: 16-bit sign sketch, bucket
                     join, exact re-rank within bucket (sub-linear
                     candidate set; the per-query scale path)
  sim_ann_ivf      — IVF-style: deterministic coarse centroids, assign
                     by nearest centroid, probe the query's cell only
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision via zip_with + aggregate (JVM-side).

    Elements are cast to double BEFORE multiplying: float32 products
    then differ from DuckDB's double math (SURVEY.md §8 G4)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def dot_sql(a: str, b: str) -> str:
    """SQL-text twin of dot_expr — identical ops in identical order
    (zip_with double-cast products, left-to-right aggregate fold), so
    scores are bit-identical; parsed in ONE py4j call where the Column
    form costs ~40 ms of lambda-construction round-trips per site
    (r13, guide §7.3). CAST(0 AS DOUBLE) ≡ F.lit(0.0) — bare SQL
    decimals would parse as DECIMAL, not double."""
    return (
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


@register(
    "sim_cosine_topk",
    oracle="""
    SELECT b.vec_id,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
    WHERE a.vec_id = 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs vec_id=0 — the exact ANN baseline.
    The 1-row query side broadcasts; scoring is a map over candidates;
    top-k is TakeOrderedAndProject (no global sort)."""
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        norm_expr(F.col("embedding")).alias("q_nrm"),
    )
    # r13: norms hoisted out of the pair expression — the corpus norm
    # folds once per row and the query norm once per query instead of
    # inside every cosine (3 folds/pair → 1). Same sqrt-then-multiply
    # op order as cosine_expr → bit-identical (cf. sim_label_avg).
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", norm_expr(F.col("embedding")).alias("nrm"))
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "sim_label_avg",
    oracle="""
    SELECT a.label,
           COUNT(*) AS n_pairs,
           ROUND(CAST(AVG(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE)) AS DOUBLE), 3) + 0.0 AS avg_cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    GROUP BY a.label
    """,
)
def sim_label_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean pairwise cosine — cluster-coherence profiling.
    The label equi-key keeps the self-join hash-partitioned; averaging
    damps fp noise (rounded to 3).

    ``+ 0.0`` after the round on BOTH sides: a tiny negative mean
    rounds to -0.0 in DuckDB but 0.0 in Spark (observed at sf0.1), and
    repr('-0.0') breaks the string compare; IEEE -0.0 + 0.0 = +0.0
    normalizes it (G13)."""
    # Per-vector norms precomputed BEFORE the pair join: cosine per pair
    # then costs one dot fold instead of three (bit-identical result —
    # same sqrt-then-multiply op order as cosine_expr).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    a = emb.select(
        "label",
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = emb.select(
        F.col("label").alias("label2"),
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    return (
        a.join(b, (a.label == b.label2) & (a.v1 < b.v2))
        .select(
            "label",
            (
                dot_expr(F.col("e1"), F.col("e2"))
                / (F.col("n1") * F.col("n2"))
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.round(F.avg("cos").cast("double"), 3) + F.lit(0.0)).alias("avg_cos"),
        )
    )


# --- ANN scale paths ---------------------------------------------------
#
# Round 8 (VERDICT r7 item 5): these were rows-only through round 7;
# every stage is deterministic relational math, so each now carries a
# DuckDB oracle replicating the SAME index construction (centroid
# assignment / hyperplane sketches) rather than comparing against the
# exact scorer — the oracle checks the algorithm, not just recall.

_LSH_BITS = 16


def _hyperplanes(dim: int = 64, bits: int = _LSH_BITS) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a fixed integer
    recurrence (no RNG dependency, identical across runs/machines)."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(bits):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            plane.append(((state >> 16) % 2001 - 1000) / 1000.0)
        planes.append(plane)
    return planes


def _sketch_expr(emb: Column) -> Column:
    """16-bit sign sketch: bit b = sign(embedding · hyperplane_b)."""
    sketch = F.lit(0).cast("long")
    for b, plane in enumerate(_hyperplanes()):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot_expr(emb, plane_col) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sketch = sketch.bitwiseOR(F.shiftleft(bit, b))
    return sketch


def _lsh_oracle() -> str:
    """DuckDB twin of the LSH pipeline: the same 16 deterministic
    hyperplanes inlined as literals, sign-bit sketch packed into a
    BIGINT, Hamming probe via xor + bit_count, exact re-rank."""
    bit_terms = []
    for b, plane in enumerate(_hyperplanes()):
        lit = "[" + ",".join(repr(v) for v in plane) + "]"
        bit_terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    sketch = " + ".join(bit_terms)
    return f"""
    WITH sk AS (
        SELECT vec_id, embedding, ({sketch}) AS sketch FROM embeddings
    ),
    q AS (
        SELECT embedding AS q_emb, sketch AS q_sketch
        FROM sk WHERE vec_id = 0
    )
    SELECT a.vec_id,
           ROUND(CAST(list_cosine_similarity(a.embedding, q.q_emb)
                      AS DOUBLE), 4) AS cos_sim
    FROM sk a CROSS JOIN q
    WHERE a.vec_id <> 0
      AND bit_count(xor(a.sketch, q.q_sketch)) <= 5
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 10
    """


@register("sim_ann_lsh", oracle=_lsh_oracle())
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: query vec_id=0, candidates = vectors
    whose 16-bit sketch is within Hamming distance 5 of the query's
    (multi-probe), exact cosine re-rank of candidates, top-10.

    At 100 TB the sketch column is precomputed once at ingest; a query
    touches only its probe buckets — the candidate set, not the corpus.

    Radius tuning (measured on the fixture, whose N(0,0.1) random
    embeddings are a worst case — true neighbors sit near 72°):
    radius 3 → 4% of corpus scanned / recall@10 2, radius 5 → 14% /
    4, radius 8 → 62% / 9. Clustered real-world embeddings separate
    far better; radius 5 is the demo operating point.
    """
    # r13: norms hoisted out of the candidate re-rank (3 HOF folds per
    # candidate → 1, same op order → bit-identical); the hamming
    # filter doesn't reference nrm, so Catalyst evaluates it only for
    # surviving candidates.
    emb = (
        load(spark, sf_dir, "embeddings")
        .withColumn("sketch", _sketch_expr(F.col("embedding")))
        .withColumn("nrm", norm_expr(F.col("embedding")))
    )
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        F.col("sketch").alias("q_sketch"),
        F.col("nrm").alias("q_nrm"),
    )
    candidates = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .filter(
            F.bit_count(F.col("sketch").bitwiseXOR(F.col("q_sketch"))) <= 5
        )
    )
    return (
        candidates.select(
            "vec_id",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


KMEANS_K = 8
KMEANS_ITERS = 5

# Per-row nano-quantization fragment shared verbatim by the Spark loop
# and the DuckDB oracle (the ml_logreg_gd discipline, applied here in
# round 9 per ADVICE r8 #1): quantizing each per-row term to an integer
# BEFORE the sum makes every aggregate an order-insensitive integer
# reduction, so Spark's shuffle-merge order vs DuckDB's sequential scan
# (and Spark run-to-run fetch order) can never move a centroid, flip a
# near-tied argmin, or flake a 6dp/4dp rounding boundary. The inputs to
# ROUND are bit-identical in both engines (float32 casts + literal
# centroids + sequential folds), so the quantization itself cannot
# diverge.
_KM_NANO = "1000000000.0"
_KM_Q = f"CAST(ROUND(({{}}) * {_KM_NANO}) AS BIGINT)"


def _l2_fold_sql(a: str = "e.v", b: str = "c.c") -> str:
    """Squared-L2 distance as the SAME sequential index-fold Spark's
    zip_with/aggregate runs, so per-pair distances are bit-identical
    cross-engine and argmin ties resolve identically."""
    return (
        f"list_sum(list_transform(range(len({a})), "
        f"i -> ({a}[i+1] - {b}[i+1]) * ({a}[i+1] - {b}[i+1])))"
    )


def _lloyd_cte(k_cells: int, iters: int) -> str:
    """DuckDB twin of the distributed Lloyd loop, UNROLLED (fixed
    iteration count — same convertibility argument as graph_pagerank):
    emits the CTE chain ``ev, c0, a0,u0,m0,c1, ..., c{iters}`` whose
    last member holds the trained centroids as (cid, c DOUBLE[]).
    Initialization is the k_cells lowest vec_ids; per round one
    argmin-assignment CTE and one per-(cid,pos) nano-quantized mean CTE
    (order-insensitive integer sums — see _KM_NANO); empty clusters
    COALESCE to the previous round's centroid. Shared by the
    ml_kmeans_lloyd oracle AND the IVF family's trained coarse
    quantizer (round 10: the IVF index is ml_kmeans_lloyd's model).

    Chain CTEs are AS MATERIALIZED: DuckDB inlines plain CTEs, and
    c{{k+1}} references c{{k}} twice, so an inlined chain re-expands
    exponentially (2^iters corpus scans — 'too many open files' at 20
    iterations); materialization makes the replay linear in iters."""
    dist = _l2_fold_sql()
    parts = [
        f"""
    ev AS MATERIALIZED (
        SELECT vec_id, embedding, embedding::DOUBLE[] AS v
        FROM embeddings
    ),
    c0 AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               v AS c
        FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT {k_cells})
    )"""
    ]
    for k in range(iters):
        parts.append(f"""
    a{k} AS MATERIALIZED (
        SELECT vec_id, v, cid, dist FROM (
            SELECT e.vec_id, e.v, c.cid, {dist} AS dist,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {dist}, c.cid) AS rn
            FROM ev e CROSS JOIN c{k} c
        ) WHERE rn = 1
    ),
    u{k} AS (
        SELECT cid,
               unnest(list_transform(range(len(v)),
                                     i -> {{'pos': i, 'x': v[i+1]}})) AS u
        FROM a{k}
    ),
    m{k} AS MATERIALIZED (
        SELECT cid, list(m ORDER BY pos) AS c
        FROM (SELECT cid, u.pos AS pos,
                     CAST(SUM({_KM_Q.format("u.x")}) AS BIGINT)
                         / (COUNT(*) * {_KM_NANO}) AS m
              FROM u{k} GROUP BY cid, u.pos)
        GROUP BY cid
    ),
    c{k + 1} AS MATERIALIZED (
        SELECT p.cid, COALESCE(m.c, p.c) AS c
        FROM c{k} p LEFT JOIN m{k} m ON p.cid = m.cid
    )""")
    return ",".join(parts)


def _kmeans_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest centroid — a PURE map stage.

    The K current centroids are inlined as a literal array-of-arrays
    (K·dim = 512 doubles), so assignment is whole-stage-codegen'd
    per-row arithmetic: no join, no shuffle, nothing sent anywhere.
    At 1000 executors this is exactly what you want — the only data
    movement in a Lloyd round is the K·dim-sized partial-mean shuffle."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col("v"), c, lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    return emb.withColumn("dists", dists).select(
        "vec_id",
        "v",
        (F.array_position(F.col("dists"), F.array_min("dists")) - 1)
        .cast("int")
        .alias("cid"),
        F.array_min("dists").alias("dist"),
    )


def _kmeans_step(
    assigned: DataFrame, centroids: list[list[float]]
) -> list[list[float]]:
    """New centroids = per-cluster elementwise means via posexplode →
    groupBy (cid, pos) over NANO-QUANTIZED coordinates: each x is
    rounded to an integer nano-grid per row, the sum is an exact
    BIGINT (order-insensitive — see _KM_Q), and the mean
    sum/(n·1e9) is one exact-integer-over-exact-double IEEE division,
    identical in both engines. Map-side partial aggregation bounds the
    shuffle at K·dim rows PER PARTITION regardless of data size; the
    driver collects only K·dim values to re-literalize. Empty clusters
    keep their old centroid."""
    means = (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .withColumn("xq", F.expr(_KM_Q.format("x")))
        .groupBy("cid", "pos")
        .agg(F.sum("xq").alias("s"), F.count("*").alias("n"))
        # bounded: K*dim centroid partials (the docstring's driver bound)
        .collect()
    )
    new = [list(c) for c in centroids]
    for r in means:
        new[r.cid][r.pos] = int(r.s) / (int(r.n) * 1e9)
    return new


_IVF_CELLS = 8
# The coarse quantizer is TRAINED (round 10, VERDICT r9 item #2):
# _IVF_TRAIN_ITERS nano-quantized Lloyd iterations from the first
# _IVF_CELLS vectors by vec_id — ml_kmeans_lloyd's machinery (same
# K/init/step), so the proven bit-deterministic training carries over
# and the oracle replays the identical chain via _lloyd_cte.
# Assignment metric is squared L2 (standard IVF-Flat), lowest-cell
# tie-break on exact distance ties. 20 iterations (vs the kmeans op's
# contract 5) measured by sim_ann_recall_eval: single-probe recall@10
# on the 16-query panel improves over the untrained r9 index at EVERY
# SF — 39→48 (sf0.001), 51→56 (sf0.01), 44→47 (sf0.1) of 160 — while
# 5 iterations regressed sf0.1; the fixture embeddings are isotropic
# (same-label mean cos 0.0016 vs 0.0003 cross-label), so ~35% is the
# data's own single-probe ceiling, not an index defect.
_IVF_TRAIN_ITERS = 20

# Trained centroids per corpus: training is deterministic, so caching
# models the real deployment (the index is built ONCE at ingest and
# served many times; per-query retraining would be the wrong shape at
# any scale).
_IVF_CENT_CACHE: dict[tuple, list[list[float]]] = {}


def _dlit(x: float) -> str:
    """SQL DOUBLE literal for a trained value. repr() of a finite
    double round-trips exactly through CAST(... AS DOUBLE); a
    non-finite value (inf/nan from degenerate training input) would
    repr as 'inf'/'nan', which CAST silently returns NULL for under
    non-ANSI mode — wrong PQ codes with no error (ADVICE r13). Fail
    loudly instead; the old F.lit path preserved such values, so this
    guard restores parity on the only inputs where the SQL-text form
    could diverge."""
    if not math.isfinite(x):
        raise ValueError(f"non-finite trained codebook/LUT value: {x!r}")
    return f"CAST({x!r} AS DOUBLE)"


def _corpus_key(sf_dir: str) -> tuple:
    """Cache key for trained-index state: abspath PLUS the embeddings
    file's (mtime_ns, size) fingerprint (ADVICE r10 #1) -- if the
    driver regenerates fixtures mid-process, the stale-path entry
    stops matching and the index retrains on the fresh corpus instead
    of serving centroids the DuckDB oracle no longer agrees with."""
    import os as _os

    path = _os.path.join(_os.path.abspath(sf_dir), "embeddings.parquet")
    st = _os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Train (or fetch) the IVF coarse quantizer for this corpus:
    _IVF_TRAIN_ITERS Lloyd rounds over the double-cast embeddings,
    init = the _IVF_CELLS lowest vec_ids. Returns K·dim Python floats
    (driver-sized; bounded by K·dim, not the corpus)."""
    key = _corpus_key(sf_dir)
    cents = _IVF_CENT_CACHE.get(key)
    if cents is None:
        emb = (
            load(spark, sf_dir, "embeddings")
            .select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            .persist()
        )
        # bounded: _IVF_CELLS seed centroids
        cents = [r.v for r in emb.orderBy("vec_id").limit(_IVF_CELLS).collect()]
        for _ in range(_IVF_TRAIN_ITERS):
            cents = _kmeans_step(_kmeans_assign(emb, cents), cents)
        emb.unpersist()
        _IVF_CENT_CACHE[key] = cents
    return cents


def _ivf_assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, embedding, cell): nearest trained centroid by squared
    L2, lowest cell on ties — ONE codegen'd map over the corpus
    (centroids inlined as literals; no join, no shuffle)."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    v = F.col("embedding").cast("array<double>")
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    # r13: withColumn instead of a fixed select so callers can thread
    # extra per-row columns (e.g. a hoisted norm) through assignment;
    # every caller projects explicitly downstream, so outputs are
    # unchanged.
    return emb.withColumn(
        "cell",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def _ivf_cell_dists(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, embedding, cell, cdist): distance to EVERY trained
    centroid, exploded — the probe-ordering view (K rows per vector;
    only ever applied to query panels, never the corpus)."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    v = F.col("embedding").cast("array<double>")
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    # r13: "*" instead of a fixed column list so callers can thread
    # extra per-row columns (e.g. a hoisted norm) through the probe
    # view; callers project explicitly downstream.
    return emb.select(
        "*", F.posexplode(dists).alias("cell", "cdist")
    ).withColumn("cell", F.col("cell").cast("int"))


# Shared oracle prefix for the IVF family: replay the identical Lloyd
# training (shared _lloyd_cte — bit-identical centroids, see
# _kmeans_oracle), then argmin-squared-L2 assignment with the same
# lowest-cell tie-break Spark's array_position(argmin) encodes.
_IVF_ORACLE_ASSIGN = (
    "WITH "
    + _lloyd_cte(_IVF_CELLS, _IVF_TRAIN_ITERS)
    + f""",
    cent AS MATERIALIZED (
        SELECT cid AS cell, c AS c_emb FROM c{_IVF_TRAIN_ITERS}
    ),
    scored AS MATERIALIZED (
        SELECT e.vec_id, e.embedding, c.cell,
               {_l2_fold_sql("e.v", "c.c_emb")} AS cdist
        FROM ev e CROSS JOIN cent c
    ),
    assigned AS MATERIALIZED (
        SELECT vec_id, embedding, cell
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cdist, cell) AS rn
              FROM scored)
        WHERE rn = 1
    )
"""
)

_IVF_ORACLE_SINGLE_PROBE = (
    _IVF_ORACLE_ASSIGN
    + """
    , q AS (
        SELECT cell AS q_cell, embedding AS q_emb
        FROM assigned WHERE vec_id = 0
    )
    SELECT a.vec_id,
           ROUND(CAST(list_cosine_similarity(a.embedding, q.q_emb)
                      AS DOUBLE), 4) AS cos_sim
    FROM assigned a CROSS JOIN q
    WHERE a.cell = q.q_cell AND a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 10
    """
)


@register("sim_ann_ivf", oracle=_IVF_ORACLE_SINGLE_PROBE)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with a TRAINED coarse quantizer (round 10, VERDICT
    r9 #2): centroids = _IVF_TRAIN_ITERS nano-quantized Lloyd rounds
    (exactly ml_kmeans_lloyd's model — same K/init/step, cached per
    corpus as a real index would be); every vector is assigned to its
    nearest centroid by squared L2 in ONE codegen'd map (no join, no
    shuffle — centroids are inlined literals); the query probes only
    its own cell, exact cosine re-rank inside. Returns top-10 of the
    probed cell.

    At 100 TB the cell id becomes a partition column, so a query reads
    one partition instead of the corpus (partition pruning —
    sim_ann_ivf_partitioned demonstrates the at-rest form); training
    is paid once at ingest over a sample, not per query. Recall vs
    probes is measured by sim_ann_recall_eval."""
    # r13: norms hoisted out of the probed-cell scoring (3 HOF folds
    # per candidate → 1, same op order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    assigned = _ivf_assign(emb, _ivf_centroids(spark, sf_dir))
    query = assigned.filter(F.col("vec_id") == 0).select(
        F.col("cell").alias("q_cell"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    return (
        assigned.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .filter(F.col("cell") == F.col("q_cell"))
        .select(
            "vec_id",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


# Same oracle as sim_ann_ivf: the physical partitionBy("cell") layout
# changes WHERE the bytes live, never the probed cell's result set.
@register("sim_ann_ivf_partitioned", oracle=_IVF_ORACLE_SINGLE_PROBE)
def sim_ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the cell id as a PHYSICAL partition column — the at-rest
    form of sim_ann_ivf's pruning story, demonstrated for real: the
    assigned corpus is written `partitionBy("cell")`, and the query's
    cell filter prunes the read to ONE directory (PartitionFilters in
    the scan, asserted in tests/test_plans.py). At 100 TB this is the
    difference between scanning the corpus and scanning corpus/n_cells
    per query; the index build (assign + write) is paid once at ingest.
    """
    import os
    import tempfile

    # r13: the per-row norm is computed once at INDEX BUILD time and
    # stored beside the vector — the at-rest analogue of the norm
    # hoist (serving reads the stored norm instead of re-folding the
    # array; the query norm collects with the query row). Parquet
    # stores the double exactly, so cos_sim bits are unchanged.
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    assigned = _ivf_assign(emb, _ivf_centroids(spark, sf_dir))

    # pid-isolated like every other tmp write (scans/joins/archival):
    # pytest and tools/check.py run concurrently and must not overwrite
    # each other's index mid-query.
    index_dir = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "ivf_index"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(index_dir)

    index = spark.read.parquet(index_dir)
    query = index.filter(F.col("vec_id") == 0).select(
        F.col("cell").alias("q_cell"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    q_cell, q_emb, q_nrm = query.first()
    # The literal cell filter is what prunes partitions at the source.
    return (
        index.filter((F.col("cell") == q_cell) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            F.round(
                dot_expr(
                    F.col("embedding"),
                    F.array(*[F.lit(float(v)) for v in q_emb]),
                )
                / (F.col("nrm") * F.lit(float(q_nrm))),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "sim_cosine_topk_arrow",
    # Same contract as sim_cosine_topk, so the same oracle. BLAS
    # pairwise summation reorders the double adds vs the sequential
    # fold (≈1e-15 relative), but both sides round to 4dp before
    # ranking — converted from rows-only in round 8 (VERDICT r7 #5)
    # after the 1e-15-vs-5e-5 margin held at all three SFs.
    oracle="""
    SELECT b.vec_id,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
    WHERE a.vec_id = 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs vec_id=0 through the Arrow/NumPy
    fast path: `mapInPandas` streams Arrow batches, each scored with
    one vectorized matmul (`M @ q / |M|·|q|`) instead of per-row
    zip_with/aggregate folds — Spark's higher-order functions are
    interpreted (not codegen'd), so at 64-dim this kernel does the
    same exact math ~10× cheaper per row. Same plan shape as
    sim_cosine_topk: scan → map → TakeOrderedAndProject; the Python
    boundary is per-batch, never per-row.

    Rows-only: BLAS pairwise summation reorders the double adds vs the
    sequential SQL fold, so bit-equality with a DuckDB oracle is not
    guaranteed (≈1e-15 relative; id-parity with the exact operator is
    asserted in tests/test_similarity.py)."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    # One-row driver fetch of the query vector (same pattern as the
    # partitioned-IVF probe) — broadcast to workers via the closure.
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )
    q_unit = q / np.linalg.norm(q)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sims = (m @ q_unit) / np.linalg.norm(m, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cos_sim": np.round(sims, 4)}
            )

    scored = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .mapInPandas(score, "vec_id bigint, cos_sim double")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)


def _kmeans_oracle() -> str:
    """DuckDB twin of the Lloyd loop, UNROLLED (fixed KMEANS_ITERS —
    same convertibility argument as graph_pagerank): per round one
    argmin-assignment CTE (squared distance computed with the SAME
    sequential index-fold Spark's zip_with/aggregate runs, so per-pair
    distances are bit-identical and argmin ties resolve identically)
    and one per-(cid,pos) mean CTE rebuilt into centroid lists; empty
    clusters COALESCE to the previous round's centroid. Means and the
    final inertia stats run over per-row nano-quantized integers
    (_KM_Q, shared fragment) so every SUM is order-insensitive —
    see the _KM_NANO comment. The training chain itself is the shared
    _lloyd_cte (also the IVF family's coarse-quantizer replay)."""
    dist = _l2_fold_sql()
    final = f"""
    afinal AS (
        SELECT vec_id, cid, {_KM_Q.format("dist")} AS dq FROM (
            SELECT e.vec_id, c.cid, {dist} AS dist,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {dist}, c.cid) AS rn
            FROM ev e CROSS JOIN c{KMEANS_ITERS} c
        ) WHERE rn = 1
    ),
    tot AS (SELECT ROUND(CAST(SUM(dq) AS BIGINT) / {_KM_NANO}, 4)
                AS total_inertia FROM afinal)
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CAST(SUM(dq) AS BIGINT) / (COUNT(*) * {_KM_NANO}), 6)
               AS mean_sq_dist,
           ANY_VALUE(t.total_inertia) AS total_inertia
    FROM afinal CROSS JOIN tot t
    GROUP BY cid
    ORDER BY cid
    """
    return "WITH " + _lloyd_cte(KMEANS_K, KMEANS_ITERS) + ",\n" + final


@register("ml_kmeans_lloyd", oracle=_kmeans_oracle())
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding table — the
    semantic-clustering step (topic bucketing, cluster-balanced
    sampling, semantic dedup) of a training-data pipeline, as pure
    DataFrame ops. Per round: one codegen'd map for assignment
    (centroids inlined as literals — see `_kmeans_assign`) and one
    partial-agg shuffle of K·dim rows per partition for the means; the
    driver never holds more than K·dim floats. Initialization is the K
    lowest vec_ids — deterministic across runs and engines, which the
    reproducibility tests rely on (kmeans++ would need a seeded random
    source). Output: per-cluster size and mean within-cluster squared
    distance, plus total inertia on every row (G5: deterministic)."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .persist()
    )
    centroids = [
        # bounded: KMEANS_K seed centroids
        r.v for r in emb.orderBy("vec_id").limit(KMEANS_K).collect()
    ]
    for _ in range(KMEANS_ITERS):
        assigned = _kmeans_assign(emb, centroids)
        centroids = _kmeans_step(assigned, centroids)
    # The training loop materialized per-iteration (collect), so the
    # cache has done its job; release it here rather than leaking it
    # for the session (the ADVICE r9 #4 class). The final assignment
    # below recomputes one uncached scan.
    emb.unpersist()
    final = _kmeans_assign(emb, centroids).withColumn(
        "dq", F.expr(_KM_Q.format("dist"))
    )
    per_cluster = final.groupBy("cid").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("dq") / (F.count("*") * F.lit(1e9)), 6).alias(
            "mean_sq_dist"
        ),
    )
    total = final.agg(
        F.round(F.sum("dq") / F.lit(1e9), 4).alias("total_inertia")
    )
    return per_cluster.crossJoin(total).orderBy("cid")


# The request batch for the batch-kNN ops: FIXED-SIZE (16 literal ids,
# present at every fixture SF), so the broadcast side is O(16·dim) —
# constant in the corpus. The previous form (`vec_id % 100 = 0`) made
# the batch 1% OF THE CORPUS: a broadcast that grows linearly with the
# data and OOMs executors at 100× (round-4 verdict, "What's wrong" #1).
_KNN_BATCH_IDS = tuple(range(0, 400, 25))  # 16 ids: 0, 25, ..., 375
_KNN_NPROBE = 3  # IVF cells probed per query in sim_batch_knn_ivf


@register(
    "sim_batch_knn_join",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id IN {tuple(_KNN_BATCH_IDS)}
    ),
    scored AS (
        SELECT q.q_id, b.vec_id,
               ROUND(CAST(list_cosine_similarity(q.q_emb, b.embedding)
                          AS DOUBLE), 4) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.q_id
                   ORDER BY ROUND(CAST(list_cosine_similarity(
                       q.q_emb, b.embedding) AS DOUBLE), 4) DESC, b.vec_id
               ) AS rnk
        FROM q JOIN embeddings b ON b.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim, rnk
    FROM scored WHERE rnk <= 3
    """,
)
def sim_batch_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join: EXACT top-3 neighbors for every query in a
    fixed request batch — the serving shape of retrieval (a request
    batch, not one probe; `sim_cosine_topk` is the 1-query special
    case). The 16-query batch broadcasts (O(16·dim), constant in the
    corpus), scoring is one map pass over the corpus (16·N scores,
    embarrassingly parallel, no shuffle of the corpus), and per-query
    top-k is a window partitioned by query id — no global sort, state
    k per query.

    At 100 TB this exact form stays linear in N with a constant
    broadcast; to go sub-linear, `sim_batch_knn_ivf` routes the SAME
    batch through the IVF cell-probe so scored pairs are |Q|·(N/cells)
    and this plan becomes the re-rank stage over candidates.
    Determinism: round(4) BEFORE ranking in BOTH engines with vec_id
    tiebreak, so the selected sets agree (G4/G5)."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr(F.col("embedding")).alias("q_nrm"),
    )
    # r13: norms hoisted out of the pair loop — the corpus norm folds
    # once per row (N folds) and the query norms once per query (|Q|),
    # instead of 2·|Q|·N norm folds inside cosine_expr. Same
    # sqrt-then-multiply op order (q_nrm · nrm) → bit-identical.
    scored = (
        emb.select(
            "vec_id", "embedding", norm_expr(F.col("embedding")).alias("nrm")
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot_expr(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


@register(
    "sim_batch_knn_ivf",
    # Converted from rows-only in round 8 (VERDICT r7 #5): cell
    # assignment + probe-set + candidate join are all pinned
    # relationally via the shared IVF assign CTE.
    oracle=_IVF_ORACLE_ASSIGN
    + f"""
    , q AS (
        SELECT q_id, q_emb, q_cell FROM (
            SELECT s.vec_id AS q_id, s.embedding AS q_emb,
                   s.cell AS q_cell,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY s.cdist, s.cell) AS pr
            FROM scored s WHERE s.vec_id IN {tuple(_KNN_BATCH_IDS)}
        ) WHERE pr <= {_KNN_NPROBE}
    ),
    cand AS (
        SELECT q.q_id, a.vec_id, a.cell,
               ROUND(CAST(list_cosine_similarity(q.q_emb, a.embedding)
                          AS DOUBLE), 4) AS cos_sim
        FROM assigned a JOIN q ON a.cell = q.q_cell
        WHERE a.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cell, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM cand)
    WHERE rnk <= 3
    ORDER BY q_id, rnk
    """,
)
def sim_batch_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN through the IVF cell-probe: the sub-linear scale path
    for `sim_batch_knn_join`. Corpus and queries are both assigned to
    coarse cells (same centroids/assignment as `sim_ann_ivf`), then the
    candidate set is an EQUI-JOIN on cell against the 16-row broadcast
    batch — scored pairs drop from |Q|·N to |Q|·(N/cells) on average,
    and nothing corpus-sized ever broadcasts or shuffles. Per-query
    top-3 over candidates is the same fixed-state window as the exact
    op, which doubles as the re-rank stage.

    Approximation contract (pinned in tests/test_similarity.py):
    neighbors returned always share one of the query's probed cells,
    every query gets rows, and recall@3 vs the exact op stays above
    the pinned floor — the standard IVF trade (nprobe=_KNN_NPROBE of
    _IVF_CELLS cells; more probes = recall knob).
    """
    from pyspark.sql import Window

    # r13: norms hoisted out of the candidate scoring (3 HOF folds per
    # (query, candidate) pair → 1; q_nrm·nrm preserves cosine_expr's
    # multiply order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(emb, cents)
    # Queries probe their top-_KNN_NPROBE cells (16·nprobe rows total):
    # the exploded centroid-distance view runs on the 16-row panel
    # only, never the corpus.
    cw = Window.partitionBy("q_id").orderBy(
        F.col("cdist"), F.col("q_cell")
    )
    q = (
        _ivf_cell_dists(
            emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)), cents
        )
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("cell").alias("q_cell"),
            "cdist",
        )
        .withColumn("probe_rnk", F.row_number().over(cw))
        .filter(F.col("probe_rnk") <= _KNN_NPROBE)
        .drop("cdist", "probe_rnk")
    )
    cand = assigned.join(
        F.broadcast(q), on=F.col("cell") == F.col("q_cell"), how="inner"
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        cand.select(
            "q_id",
            "vec_id",
            F.col("cell"),
            F.round(
                dot_expr(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                4,
            ).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "vec_id", "cell", "cos_sim", "rnk")
    )


_RECALL_K = 10  # recall@k panel depth for sim_ann_recall_eval
_MULTIPROBE_CELLS = 3  # cells probed per query in the multi-probe ANN ops


@register(
    "sim_ann_recall_eval",
    # Eval-report discipline (the pipeline_neardup_eval_pr analogue
    # for ANN): both rankings round cosines to 4dp BEFORE ranking and
    # tie-break on vec_id, so the top-k SETS — and therefore the hit
    # counts — are bit-deterministic cross-engine.
    oracle=_IVF_ORACLE_ASSIGN
    + f"""
    , qb AS (
        SELECT vec_id AS q_id, embedding AS q_emb, cell AS q_cell
        FROM assigned WHERE vec_id IN {tuple(range(0, 400, 25))}
    ),
    probe AS (
        SELECT q_id, cell AS p_cell FROM (
            SELECT s.vec_id AS q_id, s.cell,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                      ORDER BY s.cdist, s.cell) AS rn
            FROM scored s WHERE s.vec_id IN {tuple(range(0, 400, 25))}
        ) WHERE rn <= {_MULTIPROBE_CELLS}
    ),
    exact AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, b.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY ROUND(CAST(list_cosine_similarity(
                           q.q_emb, b.embedding) AS DOUBLE), 4) DESC,
                           b.vec_id) AS rn
            FROM qb q JOIN embeddings b ON b.vec_id <> q.q_id
        ) WHERE rn <= {_RECALL_K}
    ),
    single AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, a.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY ROUND(CAST(list_cosine_similarity(
                           q.q_emb, a.embedding) AS DOUBLE), 4) DESC,
                           a.vec_id) AS rn
            FROM qb q JOIN assigned a
                ON a.cell = q.q_cell AND a.vec_id <> q.q_id
        ) WHERE rn <= {_RECALL_K}
    ),
    multi AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, a.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY ROUND(CAST(list_cosine_similarity(
                           q.q_emb, a.embedding) AS DOUBLE), 4) DESC,
                           a.vec_id) AS rn
            FROM qb q JOIN probe p ON p.q_id = q.q_id
            JOIN assigned a ON a.cell = p.p_cell AND a.vec_id <> q.q_id
        ) WHERE rn <= {_RECALL_K}
    )
    SELECT e.q_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_single,
           CAST(SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_multi
    FROM exact e
    LEFT JOIN single s ON s.q_id = e.q_id AND s.vec_id = e.vec_id
    LEFT JOIN multi m ON m.q_id = e.q_id AND m.vec_id = e.vec_id
    GROUP BY e.q_id
    ORDER BY e.q_id
    """,
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN RECALL@10 EVALUATION — the pre-ship report every vector
    store runs before committing an index config (the
    pipeline_neardup_eval_pr discipline applied to IVF): for the fixed
    16-query panel, compare exact brute-force top-10 against IVF
    single-probe (the query's own cell) and multi-probe (top-3 cells)
    top-10, reporting per-query hit counts. The output IS the
    recall/probe-count trade curve a team reads to pick nprobe; the
    serving ops (sim_ann_ivf, sim_batch_knn_ivf) return the neighbors,
    this op measures what they give up.

    Scale shape: the panel is O(16) broadcast; the exact side is the
    sim_batch_knn_join one-pass scan (on a 100 TB corpus you'd run it
    on a sampled slice — the eval needs a few thousand queries, not
    the corpus); the ANN sides join only the probed cells. Per-query
    top-k is a fixed-state window; hit counting is a panel-sized
    join — nothing quadratic in the corpus.

    Round 10: the measured index is the TRAINED quantizer
    (_ivf_centroids). Single-probe recall improved over the untrained
    r9 index at every SF (39→48 / 51→56 / 44→47 of 160); the residual
    ~35% ceiling is the fixture's isotropy (neighbors are spread
    across cells because the data has no cluster structure), which is
    exactly what this report exists to expose before shipping an
    index config."""
    from pyspark.sql import Window as _W

    # r13: norms hoisted out of all three scoring passes (exact is
    # corpus×|panel| — 3 interpreted HOF folds per pair → 1; same
    # sqrt-then-multiply order as cosine_expr → bit-identical).
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm_expr(F.col("embedding")).alias("nrm")
    )
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(emb, cents)
    qb = assigned.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    w_probe = _W.partitionBy("vec_id").orderBy("cdist", "cell")
    probe = (
        _ivf_cell_dists(
            emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)), cents
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _MULTIPROBE_CELLS)
        .select(F.col("vec_id").alias("q_id"), F.col("cell").alias("p_cell"))
    )
    w_rank = _W.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")

    def topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") <= _RECALL_K)
            .select("q_id", "vec_id")
        )

    hoisted_cos = F.round(
        dot_expr(F.col("embedding"), F.col("q_emb"))
        / (F.col("nrm") * F.col("q_nrm")),
        4,
    )
    exact = topk(
        emb.crossJoin(F.broadcast(qb))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", hoisted_cos.alias("cos_sim"))
    )
    single = topk(
        assigned.join(
            F.broadcast(qb),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("q_id")),
        ).select("q_id", "vec_id", hoisted_cos.alias("cos_sim"))
    )
    multi = topk(
        assigned.join(
            F.broadcast(probe.join(qb, "q_id")),
            (F.col("cell") == F.col("p_cell"))
            & (F.col("vec_id") != F.col("q_id")),
        ).select("q_id", "vec_id", hoisted_cos.alias("cos_sim"))
    )
    return (
        exact.join(
            single.withColumn("hit_s", F.lit(1)), ["q_id", "vec_id"], "left"
        )
        .join(multi.withColumn("hit_m", F.lit(1)), ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit_s"), F.lit(0)))
            .cast("bigint")
            .alias("hits_single"),
            F.sum(F.coalesce(F.col("hit_m"), F.lit(0)))
            .cast("bigint")
            .alias("hits_multi"),
        )
        .orderBy("q_id")
    )


# Invariant bands for the ml_pca_project oracle (round-9 conversion).
# Margins are pinned by tests/test_round9.py at every SF: measured
# capture ratios are 0.0415-0.0559 (band edges ≥ 0.02 away), basis
# orthonormality error ~1e-15 vs the 1e-9 bound, eigen residuals
# ~1e-16 vs 1e-10, per-label mean ‖x−μ‖² is 0.995-1.002 vs [0.5, 1.5].
PCA_CAPTURE_BAND = (0.01, 0.15)
PCA_ORTHO_TOL = 1e-9
PCA_EIG_RESID_TOL = 1e-10
PCA_TOT_VAR_BAND = (0.5, 1.5)


@register(
    "ml_pca_project",
    # Round-9 conversion (rows-only → sql-checked; VERDICT r8 item #3):
    # the eigenVECTOR basis is engine/BLAS-specific AND genuinely
    # unstable on these fixtures (λ2/λ1 up to 0.987, λ3/λ2 up to 0.99 —
    # measured; even the top-2 subspace can rotate), so no per-label
    # projection VALUE can be oracled. But basis-independent facts can,
    # via the agg_approx_distinct discipline. What each boolean gates
    # (honest scoping, ADVICE r9 #2): orthonormality and the eigen
    # residual are eigh SELF-consistency (eigh satisfies them for
    # whatever matrix it is given); the DISTRIBUTED reduction itself is
    # gated by gram_crosscheck_ok — a second, independent aggregation
    # path (built-in JVM aggs over nano-quantized exploded coordinates)
    # must reproduce the mapInPandas merge's count, per-coordinate sums
    # and Gram diagonal within the quantization bound. capture/tot-var
    # bands and Pythagoras (p1²+p2² ≤ ‖x−μ‖²) gate the codegen
    # projection pass row by row; exact per-label counts/id-ranges ride
    # along as plain SQL.
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           MIN(vec_id) AS vec_id_min,
           MAX(vec_id) AS vec_id_max,
           TRUE AS basis_orthonormal,
           TRUE AS eigen_residual_ok,
           TRUE AS gram_crosscheck_ok,
           TRUE AS capture_top2_ok,
           TRUE AS proj_bounded_ok,
           TRUE AS tot_var_band_ok
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def ml_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA — the embedding-space analysis step a vector
    pipeline runs before visualization/whitening/compression: fit the
    top-2 principal components of every 64-dim embedding and project
    each row, reporting per-label basis-independent diagnostics.

    The 100 TB shape is the sufficient-statistic pattern (same family
    as analytics_linreg_trend and ml_kmeans_lloyd): each Arrow batch
    reduces to ONE (count, Σx, XᵀX) partial via a vectorized matmul in
    `mapInPandas` — corpus-sized data never leaves the executors; the
    driver merges #partition Gram partials (64×64 floats each, bounded
    by cluster size not data size), eigendecomposes the 64×64
    covariance (trivially driver-sized), and inlines the two
    eigenvectors as codegen literals so the projection pass is pure
    Catalyst expressions (zip_with/aggregate dot products). Two passes
    over the data total, nothing quadratic, no corpus-sized collect.

    Raw pc1/pc2 values stay available to callers via the projection
    pass; the REGISTERED output is the invariant view (see oracle
    comment) because the eigenbasis itself is not cross-engine
    reproducible. NumPy projection parity is pinned in
    tests/test_round5.py; oracle margins in tests/test_round9.py."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    dim = 64

    def gram_partials(batches):
        for pdf in batches:
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).reshape(-1).tolist()],
                }
            )

    partials = emb.select("embedding").mapInPandas(
        gram_partials, schema="n long, s array<double>, g array<double>"
    )
    # Bounded driver merge: one row per Arrow batch (≈ per partition).
    rows = partials.collect()
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    g = np.sum([np.array(r.g).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)

    # ADVICE r9 #2: gate the DISTRIBUTED reduction directly, not only
    # eigh's self-consistency. Second independent path: built-in JVM
    # partial aggregation over nano-quantized exploded coordinates
    # (order-insensitive integer sums, the ml_kmeans_lloyd discipline)
    # recomputes count, Σx and diag(XᵀX); a dropped or duplicated Arrow
    # batch, misaligned reshape, or wrong-axis sum in the mapInPandas
    # merge diverges here by construction. Per-component quantization
    # error is bounded by n·5e-10.
    alt = (
        emb.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            )
        )
        .groupBy("pos")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.expr(_KM_Q.format("x"))).alias("sx"),
            F.sum(F.expr(_KM_Q.format("x * x"))).alias("sxx"),
        )
        .collect()
    )
    q_tol = n * 5e-10 + 1e-9
    gram_crosscheck_ok = bool(
        len(alt) == dim
        and all(r.cnt == n for r in alt)
        and all(abs(int(r.sx) / 1e9 - s[r.pos]) <= q_tol for r in alt)
        and all(
            abs(int(r.sxx) / 1e9 - g[r.pos, r.pos]) <= q_tol for r in alt
        )
    )

    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending eigenvalues
    pcs, lams = [], []
    for k in (1, 2):
        v = eigvecs[:, -k]
        # Deterministic sign: largest-|coordinate| component positive.
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        pcs.append(v)
        lams.append(float(eigvals[-k]))

    # Driver-side model validation (computed from the DISTRIBUTED Gram,
    # so they gate the mapInPandas reduction + merge, not just numpy).
    ortho_ok = bool(
        abs(pcs[0] @ pcs[0] - 1.0) < PCA_ORTHO_TOL
        and abs(pcs[1] @ pcs[1] - 1.0) < PCA_ORTHO_TOL
        and abs(pcs[0] @ pcs[1]) < PCA_ORTHO_TOL
    )
    resid_ok = bool(
        max(
            float(np.abs(cov @ pcs[0] - lams[0] * pcs[0]).max()),
            float(np.abs(cov @ pcs[1] - lams[1] * pcs[1]).max()),
        )
        < PCA_EIG_RESID_TOL
    )
    capture = (lams[0] + lams[1]) / float(cov.trace())
    capture_ok = bool(PCA_CAPTURE_BAND[0] < capture < PCA_CAPTURE_BAND[1])

    mean_lit = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with("embedding", mean_lit, lambda a, b: a - b)

    def project(v: "np.ndarray") -> Column:
        vec = F.array(*[F.lit(float(x)) for x in v])
        return F.aggregate(
            F.zip_with(centered, vec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    tot = F.aggregate(
        centered, F.lit(0.0), lambda acc, x: acc + x * x
    )
    projected = emb.select(
        "label",
        "vec_id",
        project(pcs[0]).alias("pc1"),
        project(pcs[1]).alias("pc2"),
        tot.alias("tot_sq"),
    )
    return (
        projected.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("vec_id").alias("vec_id_min"),
            F.max("vec_id").alias("vec_id_max"),
            # Pythagoras: the projection onto an orthonormal pair never
            # exceeds the centered squared norm (1e-9 relative slack
            # for the fold's float noise). Gates the literal-inlined
            # projection pass row by row.
            F.every(
                F.col("pc1") * F.col("pc1") + F.col("pc2") * F.col("pc2")
                <= F.col("tot_sq") * F.lit(1.0 + 1e-9)
            ).alias("proj_bounded_ok"),
            F.avg("tot_sq").alias("_mean_tot"),
        )
        .select(
            "label",
            "n_vecs",
            "vec_id_min",
            "vec_id_max",
            F.lit(ortho_ok).alias("basis_orthonormal"),
            F.lit(resid_ok).alias("eigen_residual_ok"),
            F.lit(gram_crosscheck_ok).alias("gram_crosscheck_ok"),
            F.lit(capture_ok).alias("capture_top2_ok"),
            "proj_bounded_ok",
            F.col("_mean_tot")
            .between(*PCA_TOT_VAR_BAND)
            .alias("tot_var_band_ok"),
        )
        .orderBy("label")
    )


PQ_SUBSPACES = 8
PQ_SUBDIM = 8
PQ_CENTROIDS = 16
# Round 10: the PQ sub-codebooks are TRAINED (the IVF-coarse-quantizer
# upgrade applied to the other half of the IVF-PQ stack): per subspace,
# _PQ_TRAIN_ITERS nano-quantized Lloyd rounds over the corpus's 8-dim
# sub-vectors, init = the sub-slices of the PQ_CENTROIDS lowest
# vec_ids (iters=0 degenerates to the old untrained codebook). Chosen
# by measurement: mean per-subspace quantization MSE drops ~28% at
# every SF (0.75→0.54); 10 iterations captures nearly all of it.
_PQ_TRAIN_ITERS = 10

# Trained codebooks per sf_dir (same deployment story as
# _IVF_CENT_CACHE: the codebook is trained once at ingest).
_PQ_CB_CACHE: dict[tuple, list[list[list[float]]]] = {}


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, s, sv): the corpus exploded into per-subspace 8-dim
    DOUBLE sub-vectors — the frame PQ training iterates on (8 rows per
    vector; at 100 TB this explode streams and the per-iteration state
    is the S·K·D quantized-mean shuffle, corpus-size-independent)."""
    v = F.col("embedding").cast("array<double>")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1)),
        lambda s: F.slice(v, (s * PQ_SUBDIM + 1).cast("int"), PQ_SUBDIM),
    )
    return emb.select("vec_id", F.posexplode(subs).alias("s", "sv"))


def _pq_trained_codebooks(
    spark: SparkSession, sf_dir: str
) -> list[list[list[float]]]:
    """Train (or fetch) the per-subspace PQ codebooks: joint Lloyd over
    ALL subspaces per iteration (one codegen'd assign map + one
    S·K·D-bounded quantized-mean shuffle — subspaces never serialize),
    bit-deterministic by the ml_kmeans_lloyd argument. Returns
    cbs[s][j][k] Python floats (driver state = S·K·D = 1024 doubles)."""
    key = _corpus_key(sf_dir)
    cbs = _PQ_CB_CACHE.get(key)
    if cbs is not None:
        return cbs
    emb = load(spark, sf_dir, "embeddings")
    # bounded: PQ_CENTROIDS seed rows (S*K*D driver state)
    init_rows = emb.orderBy("vec_id").limit(PQ_CENTROIDS).collect()
    cbs = [
        [
            [
                float(r["embedding"][s * PQ_SUBDIM + k])
                for k in range(PQ_SUBDIM)
            ]
            for r in init_rows
        ]
        for s in range(PQ_SUBSPACES)
    ]
    cbs = _pq_lloyd_train(_pq_subvectors(emb), cbs)
    _PQ_CB_CACHE[key] = cbs
    return cbs


def _pq_lloyd_train(
    sub: DataFrame, cbs: list[list[list[float]]]
) -> list[list[list[float]]]:
    """The joint per-subspace Lloyd iteration core over a (vec_id, s,
    sv) frame — shared by the raw-vector codebooks and the IVF-PQ
    residual codebooks (same bit-determinism argument as
    _kmeans_step)."""
    sub = sub.persist()
    for _ in range(_PQ_TRAIN_ITERS):
        cb_lit = F.array(
            *[
                F.array(
                    *[F.array(*[F.lit(x) for x in c]) for c in cbs[s]]
                )
                for s in range(PQ_SUBSPACES)
            ]
        )
        dists = F.transform(
            F.element_at(cb_lit, F.col("s") + 1),
            lambda c: F.aggregate(
                F.zip_with(F.col("sv"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        assigned = sub.select(
            "s",
            "sv",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cid"),
        )
        means = (
            assigned.select(
                "s", "cid", F.posexplode("sv").alias("pos", "x")
            )
            .withColumn("xq", F.expr(_KM_Q.format("x")))
            .groupBy("s", "cid", "pos")
            .agg(F.sum("xq").alias("m"), F.count("*").alias("n"))
            # bounded: K*dim centroid partials per Lloyd iteration
            .collect()
        )
        new = [[list(c) for c in cbs[s]] for s in range(PQ_SUBSPACES)]
        for r in means:
            new[r.s][r.cid][r.pos] = int(r.m) / (int(r.n) * 1e9)
        cbs = new
    sub.unpersist()
    return cbs


def _pq_lloyd_cte(iters: int, v_source: str | None = None) -> str:
    """DuckDB replay of the joint per-subspace PQ training, UNROLLED
    (the _lloyd_cte pattern with an extra subspace key everywhere);
    ends at ``pc{iters}(s, cid, c)``. Chain CTEs AS MATERIALIZED for
    the same exponential-inlining reason as _lloyd_cte.

    ``v_source``: name of an earlier CTE providing (vec_id, v DOUBLE[])
    to train on instead of the raw embeddings — the residual-PQ hook
    (sim_ivfpq_search trains on x − cell-centroid)."""
    dist = _l2_fold_sql("e.sv", "c.c")
    src = (
        f"(SELECT vec_id, v, unnest(range({PQ_SUBSPACES})) AS s "
        f"FROM {v_source})"
        if v_source
        else f"(SELECT vec_id, embedding::DOUBLE[] AS v, "
        f"unnest(range({PQ_SUBSPACES})) AS s FROM embeddings)"
    )
    parts = [
        f"""
    pev AS MATERIALIZED (
        SELECT vec_id, s,
               v[s*{PQ_SUBDIM}+1:(s+1)*{PQ_SUBDIM}] AS sv
        FROM {src}
    ),
    pc0 AS MATERIALIZED (
        SELECT s, CAST(rn - 1 AS INT) AS cid, sv AS c
        FROM (SELECT s, sv, row_number() OVER (
                  PARTITION BY s ORDER BY vec_id) AS rn
              FROM pev)
        WHERE rn <= {PQ_CENTROIDS}
    )"""
    ]
    for k in range(iters):
        parts.append(f"""
    pa{k} AS MATERIALIZED (
        SELECT vec_id, s, sv, cid FROM (
            SELECT e.vec_id, e.s, e.sv, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id, e.s
                       ORDER BY {dist}, c.cid) AS rn
            FROM pev e JOIN pc{k} c ON c.s = e.s
        ) WHERE rn = 1
    ),
    pm{k} AS MATERIALIZED (
        SELECT s, cid, list(m ORDER BY pos) AS c
        FROM (SELECT s, cid, u.pos AS pos,
                     CAST(SUM({_KM_Q.format("u.x")}) AS BIGINT)
                         / (COUNT(*) * {_KM_NANO}) AS m
              FROM (SELECT s, cid,
                           unnest(list_transform(range(len(sv)),
                               i -> {{'pos': i, 'x': sv[i+1]}})) AS u
                    FROM pa{k})
              GROUP BY s, cid, u.pos)
        GROUP BY s, cid
    ),
    pc{k + 1} AS MATERIALIZED (
        SELECT p.s, p.cid, COALESCE(m.c, p.c) AS c
        FROM pc{k} p LEFT JOIN pm{k} m
            ON m.s = p.s AND m.cid = p.cid
    )""")
    return ",".join(parts)


def _pq_codes_oracle_ctes() -> str:
    """Trained codebook -> per-(vec, subspace) argmin codes, pivoted to
    one row per vector: the shared CTE tail both PQ oracles use. The
    per-pair distance is the LEFT-TO-RIGHT 8-term sum (explicit index
    order), the exact IEEE op order the Spark literal sums run."""
    terms = " + ".join(
        f"(e.sv[{i}] - c.c[{i}]) * (e.sv[{i}] - c.c[{i}])"
        for i in range(1, PQ_SUBDIM + 1)
    )
    ccols = ",\n           ".join(
        f"CAST(MAX(CASE WHEN s = {s} THEN j END) AS BIGINT) AS code{s}"
        for s in range(PQ_SUBSPACES)
    )
    return f"""
    cb AS MATERIALIZED (
        SELECT s, cid AS j, c FROM pc{_PQ_TRAIN_ITERS}
    ),
    pqd AS (
        SELECT e.vec_id, e.s, c.j, {terms} AS dist
        FROM pev e JOIN cb c ON c.s = e.s
    ),
    amin AS MATERIALIZED (
        SELECT vec_id, s, j FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY dist, j) AS rn
            FROM pqd
        ) WHERE rn = 1
    ),
    codes AS MATERIALIZED (
        SELECT vec_id,
           {ccols}
        FROM amin GROUP BY vec_id
    )"""


@register(
    "sim_vector_pq_encode",
    oracle="WITH "
    + _pq_lloyd_cte(_PQ_TRAIN_ITERS)
    + ","
    + _pq_codes_oracle_ctes()
    + """
    SELECT * FROM codes ORDER BY vec_id
    """,
)
def sim_vector_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding — the vector-compression half of
    an IVF-PQ index (the structure real billion-vector ANN serving
    uses): each 64-dim embedding splits into 8 subvectors of
    8 dims, and each subvector is replaced by the id of its nearest
    codebook centroid — 64 floats (256 B) become 8 nibble codes.

    Codebook: TRAINED per subspace (round 10 — _pq_trained_codebooks,
    _PQ_TRAIN_ITERS nano-quantized Lloyd rounds, init = the sub-slices
    of the PQ_CENTROIDS lowest vec_ids; mean quantization MSE drops
    ~28% vs the untrained init at every SF). The trained centroids are
    driver state (S·K·D = 1024 floats — the ml_pca_project precedent)
    inlined as codegen literals, so assignment is ONE pass over the
    embedding table with zero extra shuffle and zero row fan-out — at
    100 TB the alternative broadcast-crossjoin×16 would multiply the
    scan volume 16-fold and shuffle it again for the argmin. The
    oracle replays the identical training (_pq_lloyd_cte) and computes
    the same assignment relationally (explicit left-to-right 8-term
    distance sums keep the IEEE op order identical in both engines;
    argmin ties break to the smallest centroid id on both sides).

    Output is all-integer (vec_id + 8 codes) — no float in the
    hash surface."""
    emb = load(spark, sf_dir, "embeddings")
    cbs = _pq_trained_codebooks(spark, sf_dir)

    # r13 (guide §7.3): the unrolled per-(subspace, centroid) literal
    # distance sums were ~3000 Column-object py4j round-trips — at
    # ~11 s/construction the largest build cost in the registry, paid
    # on EVERY call (the driver constructs per pass). The identical
    # distances now parse from SQL text as a fold over one codebook
    # array literal per subspace. Bit-identity: the (x−y)·(x−y) terms
    # are unchanged, and the fold's 0.0 + d0 + … + d7 equals the old
    # unrolled d0 + … + d7 exactly (IEEE +0.0 is an identity on the
    # non-negative squares) — pinned by the oracle hash at 3 SFs and
    # the recall/MSE pytests. CAST('repr' AS DOUBLE) literals keep the
    # exact trained doubles (a bare SQL decimal parses DECIMAL, which
    # also round-trips, but the explicit cast makes the type certain).
    def dists_sql(s: int) -> str:
        cb = "array(%s)" % ", ".join(
            "array(%s)" % ", ".join(_dlit(x) for x in c)
            for c in cbs[s]
        )
        sub = f"slice(embedding, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        return (
            f"transform({cb}, c -> aggregate(zip_with({sub}, c,"
            " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            " CAST(0.0 AS DOUBLE), (acc, d) -> acc + d))"
        )

    cols = ["vec_id"] + [
        f"CAST(array_position({dists_sql(s)}, array_min({dists_sql(s)}))"
        f" - 1 AS BIGINT) AS code{s}"
        for s in range(PQ_SUBSPACES)
    ]
    return emb.selectExpr(*cols).orderBy("vec_id")


PQ_TOPK = 10


def _pq_search_oracle() -> str:
    """Self-contained trained ADC-search oracle: training chain →
    shared codes CTEs → per-query LUT over the TRAINED codebook →
    8 LUT joins → top-k. LUT distances are the same left-to-right
    8-term sums (query sub-vector vs trained centroid), and the ADC
    total adds the 8 lookups in ascending-subspace order — exactly the
    Spark literal arithmetic."""
    lut_terms = " + ".join(
        f"(q.qv[c.s*{PQ_SUBDIM}+{i}] - c.c[{i}])"
        f" * (q.qv[c.s*{PQ_SUBDIM}+{i}] - c.c[{i}])"
        for i in range(1, PQ_SUBDIM + 1)
    )
    joins = "\n        ".join(
        f"JOIN lut l{s} ON l{s}.s = {s} AND l{s}.j = codes.code{s}"
        for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(f"l{s}.ld" for s in range(PQ_SUBSPACES))
    return (
        "WITH "
        + _pq_lloyd_cte(_PQ_TRAIN_ITERS)
        + ","
        + _pq_codes_oracle_ctes()
        + f""",
    q AS (
        SELECT embedding::DOUBLE[] AS qv
        FROM embeddings ORDER BY vec_id DESC LIMIT 1
    ),
    lut AS MATERIALIZED (
        SELECT c.s, c.j, {lut_terms} AS ld
        FROM cb c, q
    ),
    adc AS (
        SELECT codes.vec_id, {adc} AS dist
        FROM codes
        {joins}
    )
    SELECT CAST(row_number() OVER (ORDER BY dist, vec_id) AS BIGINT) AS rank,
           vec_id
    FROM adc
    ORDER BY dist, vec_id
    LIMIT {PQ_TOPK}
    """
    )


@register("sim_vector_pq_search", oracle=_pq_search_oracle())
def sim_vector_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes — the
    SEARCH half of the IVF-PQ serving stack whose encode half is
    `sim_vector_pq_encode`: the query stays a full-precision vector, the
    corpus stays 8 nibble codes, and each candidate's approximate
    distance is 8 table lookups instead of 64 float ops. The codebook
    is the TRAINED one (round 10 — shared _pq_trained_codebooks cache
    with the encode op, the way a real index serves one frozen model).

    The per-query LUT (subspace × centroid squared distances, 8×16
    doubles) is computed driver-side from the trained codebook and
    inlined as literal arrays; `element_at(lut_s, code_s + 1)` then
    resolves each code JVM-side, so the scan does ZERO vector math per
    row — the plan is one pass over the codes, a TakeOrdered top-k,
    and no shuffle before it. At 100 TB this is exactly why PQ exists:
    the 256-byte embedding column never leaves disk for serving; only
    the 8-byte code row does (×32 less scan IO), and a real deployment
    additionally prunes by IVF list (`sim_ann_ivf`'s contract).

    Every arithmetic step (Python LUT build, Spark literal sums,
    DuckDB oracle) runs the identical left-to-right IEEE op order, so
    ADC distances are bit-identical and the (dist, vec_id) top-k
    order matches exactly. Output is integer-only (rank, vec_id)."""
    emb = load(spark, sf_dir, "embeddings")
    cbs = _pq_trained_codebooks(spark, sf_dir)
    # bounded: 1-row query anchor
    qrow = emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]
    q = [float(x) for x in qrow["embedding"]]

    def lut_entry(s: int, j: int) -> float:
        acc = 0.0
        for k in range(PQ_SUBDIM):
            t = q[s * PQ_SUBDIM + k] - cbs[s][j][k]
            acc = acc + t * t
        return acc

    enc = sim_vector_pq_encode(spark, sf_dir)
    adc = None
    for s in range(PQ_SUBSPACES):
        lut = F.array(
            *[F.lit(lut_entry(s, j)) for j in range(PQ_CENTROIDS)]
        )
        term = F.element_at(lut, (F.col(f"code{s}") + 1).cast("int"))
        adc = term if adc is None else adc + term
    topk = (
        enc.select("vec_id", adc.alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(PQ_TOPK)
    )
    from pyspark.sql import Window as _W

    return topk.select(
        F.row_number()
        .over(_W.orderBy("dist", "vec_id"))
        .cast("bigint")
        .alias("rank"),
        "vec_id",
    )


_IVFPQ_RES_CB_CACHE: dict[tuple, list[list[list[float]]]] = {}


def _ivfpq_residuals(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, cell, v): each vector's RESIDUAL against its trained
    IVF cell centroid — the frame FAISS-style IVF-PQ encodes (PQ on
    residuals is much tighter than PQ on raw vectors because the
    coarse quantizer has already removed the cell mean). One codegen'd
    map: assignment argmin + zip_with subtraction, no join."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    v = F.col("embedding").cast("array<double>")
    d = emb.select("vec_id", v.alias("v"))
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
    )
    d = d.select(
        "vec_id",
        "v",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cell"),
    )
    return d.select(
        "vec_id",
        "cell",
        F.zip_with(
            "v",
            F.element_at(cent_lit, F.col("cell") + 1),
            lambda x, y: x - y,
        ).alias("v"),
    )


def _ivfpq_residual_codebooks(
    spark: SparkSession, sf_dir: str
) -> list[list[list[float]]]:
    """Train (or fetch) the RESIDUAL PQ codebooks: the shared joint
    Lloyd core over residual sub-vectors, init = the residual
    sub-slices of the PQ_CENTROIDS lowest vec_ids."""
    key = _corpus_key(sf_dir)
    cbs = _IVFPQ_RES_CB_CACHE.get(key)
    if cbs is not None:
        return cbs
    emb = load(spark, sf_dir, "embeddings")
    res = _ivfpq_residuals(emb, _ivf_centroids(spark, sf_dir))
    # bounded: PQ_CENTROIDS seed rows
    init_rows = res.orderBy("vec_id").limit(PQ_CENTROIDS).collect()
    cbs = [
        [
            [float(r["v"][s * PQ_SUBDIM + k]) for k in range(PQ_SUBDIM)]
            for r in init_rows
        ]
        for s in range(PQ_SUBSPACES)
    ]
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1)),
        lambda s: F.slice(F.col("v"), (s * PQ_SUBDIM + 1).cast("int"), PQ_SUBDIM),
    )
    sub = res.select("vec_id", F.posexplode(subs).alias("s", "sv"))
    cbs = _pq_lloyd_train(sub, cbs)
    _IVFPQ_RES_CB_CACHE[key] = cbs
    return cbs


def _ivfpq_oracle() -> str:
    """Self-contained RESIDUAL IVF-PQ search oracle: the trained IVF
    chain assigns cells; residuals (x − cell centroid) feed the PQ
    training chain (v_source hook) and the shared codes tail; the
    query gets a PER-PROBED-CELL residual LUT (FAISS semantics — the
    query residual differs per cell); ADC joins carry the cell key.
    CTE namespaces stay disjoint (ev/c{k}/cent/scored/assigned vs
    resid/pev/pc{k}/cb/pqd/amin/codes)."""
    lut_terms = " + ".join(
        f"(qr.rv[c.s*{PQ_SUBDIM}+{i}] - c.c[{i}])"
        f" * (qr.rv[c.s*{PQ_SUBDIM}+{i}] - c.c[{i}])"
        for i in range(1, PQ_SUBDIM + 1)
    )
    joins = "\n        ".join(
        f"JOIN lut l{s} ON l{s}.cell = cand.cell AND l{s}.s = {s} "
        f"AND l{s}.j = codes.code{s}"
        for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(f"l{s}.ld" for s in range(PQ_SUBSPACES))
    return (
        _IVF_ORACLE_ASSIGN
        + f""",
    resid AS MATERIALIZED (
        SELECT a.vec_id, a.cell,
               list_transform(range(len(e.v)),
                              i -> e.v[i+1] - c.c_emb[i+1]) AS v
        FROM assigned a
        JOIN ev e ON e.vec_id = a.vec_id
        JOIN cent c ON c.cell = a.cell
    ), """
        + _pq_lloyd_cte(_PQ_TRAIN_ITERS, v_source="resid")
        + ","
        + _pq_codes_oracle_ctes()
        + f""",
    probe AS (
        SELECT cell FROM scored WHERE vec_id = 0
        ORDER BY cdist, cell LIMIT {_MULTIPROBE_CELLS}
    ),
    qres AS (
        SELECT p.cell,
               list_transform(range(len(q.v)),
                              i -> q.v[i+1] - c.c_emb[i+1]) AS rv
        FROM probe p
        JOIN cent c ON c.cell = p.cell
        CROSS JOIN (SELECT v FROM ev WHERE vec_id = 0) q
    ),
    lut AS MATERIALIZED (
        SELECT qr.cell, c.s, c.j, {lut_terms} AS ld
        FROM cb c CROSS JOIN qres qr
    ),
    cand AS (
        SELECT a.vec_id, a.cell
        FROM assigned a JOIN probe p ON a.cell = p.cell
        WHERE a.vec_id <> 0
    ),
    scored_adc AS (
        SELECT cand.vec_id, cand.cell,
               CAST(floor(({adc}) * 1e9 + 0.5) AS BIGINT) AS dist
        FROM cand JOIN codes ON codes.vec_id = cand.vec_id
        {joins}
    )
    SELECT CAST(row_number() OVER (ORDER BY dist, vec_id) AS BIGINT) AS rank,
           vec_id, cell
    FROM scored_adc
    ORDER BY dist, vec_id
    LIMIT {PQ_TOPK}
    """
    )


@register("sim_ivfpq_search", oracle=_ivfpq_oracle())
def sim_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with RESIDUAL encoding — the FULL billion-vector
    serving stack exactly as FAISS builds it, composed from this
    repo's trained indexes (round 10): the trained coarse quantizer
    routes the query to its top-{_MULTIPROBE_CELLS} cells
    (sim_ann_ivf_multiprobe's probe), every corpus vector is PQ-encoded
    on its RESIDUAL x − centroid(cell(x)) with residual-trained
    sub-codebooks (far tighter than raw-vector PQ because the coarse
    quantizer already removed the cell mean), and candidates are
    priced by ADC with a PER-PROBED-CELL LUT (the query's residual
    differs per cell — the detail that distinguishes real IVF-PQ from
    naive PQ-after-filter). Measured on the fixtures: residual-PQ
    reconstruction MSE is ~6% below raw-PQ (0.539→0.501 at sf0.01);
    end-to-end probed-cell recall is fixture-neutral because the
    embeddings are isotropic (cell means ≈ 0, so residuals barely
    shrink) — on clustered real data the residual form is the one
    that wins, which is why it is the shipped architecture.

    Scale shape: all three trained artifacts (IVF centroids, residual
    codebooks, code rows) are ingest-time builds cached per corpus;
    serving is a 3-row probe semi-join to prune cells (a pruned
    partition read under sim_ann_ivf_partitioned's layout), an
    equi-join of survivors onto their 8-byte code rows, one
    literal-LUT codegen map (probes·S·K doubles inlined), and a
    TakeOrdered top-k — nothing corpus-sized moves. Training replays,
    residual subtraction, and ADC arithmetic are the proven
    bit-deterministic chains; output is integer-only
    (rank, vec_id, cell)."""
    emb = load(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    rcbs = _ivfpq_residual_codebooks(spark, sf_dir)
    res = _ivfpq_residuals(emb, cents)

    # Residual PQ codes, inline (the encode pattern over res.v).
    # r13 (guide §7.3): SQL-texted like sim_vector_pq_encode — the
    # unrolled rdist tree was ~3000 Column-object round-trips per
    # construction; the fold over one codebook literal per subspace is
    # bit-identical ((x−y)·(x−y) unchanged, 0.0 + d0 + … + d7 ≡
    # d0 + … + d7 on non-negative squares). res.v is already DOUBLE
    # (residual subtraction), so no element cast here — matching the
    # original rv[k] - lit arithmetic exactly.
    def rdists_sql(s: int) -> str:
        cb = "array(%s)" % ", ".join(
            "array(%s)" % ", ".join(_dlit(x) for x in c)
            for c in rcbs[s]
        )
        sub = f"slice(v, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        return (
            f"transform({cb}, c -> aggregate(zip_with({sub}, c,"
            " (x, y) -> (x - y) * (x - y)),"
            " CAST(0.0 AS DOUBLE), (acc, d) -> acc + d))"
        )

    enc = res.selectExpr(
        "vec_id",
        "cell",
        *[
            f"CAST(array_position({rdists_sql(s)},"
            f" array_min({rdists_sql(s)})) - 1 AS BIGINT) AS code{s}"
            for s in range(PQ_SUBSPACES)
        ],
    )

    # Query residual per probed cell -> per-cell literal LUT.
    probe_rows = (
        _ivf_cell_dists(emb.filter(F.col("vec_id") == 0), cents)
        .orderBy("cdist", "cell")
        .limit(_MULTIPROBE_CELLS)
        .select("cell")
        # bounded: _MULTIPROBE_CELLS probe cells
        .collect()
    )
    probes = [int(r.cell) for r in probe_rows]
    # bounded: 1-row query anchor
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in qrow["embedding"]]

    def lut_entry(cell: int, s: int, j: int) -> float:
        if cell not in probes:
            return 0.0  # never selected: cand only holds probed cells
        acc = 0.0
        for k in range(PQ_SUBDIM):
            t = (q[s * PQ_SUBDIM + k] - cents[cell][s * PQ_SUBDIM + k]) - rcbs[s][j][k]
            acc = acc + t * t
        return acc

    # r13 (guide §7.3): the cells×S×K LUT literal was assembled as
    # nested F.array/F.lit Column objects and the 8-term ADC referenced
    # it eight times — thousands of py4j round-trips per construction;
    # identical literal tree (same 8-fold duplication the reused
    # Column already produced in the plan) now parses from SQL text.
    lut_sql = "array(%s)" % ", ".join(
        "array(%s)"
        % ", ".join(
            "array(%s)"
            % ", ".join(
                _dlit(lut_entry(c, s, j))
                for j in range(PQ_CENTROIDS)
            )
            for s in range(PQ_SUBSPACES)
        )
        for c in range(len(cents))
    )
    cand = enc.filter(
        (F.col("vec_id") != 0) & F.col("cell").isin(*probes)
    )
    adc = F.expr(
        " + ".join(
            f"element_at(element_at(element_at({lut_sql}, cell + 1),"
            f" {s + 1}), CAST(code{s} + 1 AS INT))"
            for s in range(PQ_SUBSPACES)
        )
    )
    # ADVICE r10 #3: rank on the NANO-QUANTIZED distance (the house
    # discipline ml_kmeans_lloyd uses for inertia) so the (dist,
    # vec_id) order survives any future op-order drift in the LUT /
    # training chain instead of resting on bit-identical IEEE sums.
    # ADC distances are >= 0, so floor(x*1e9 + 0.5) is the symmetric
    # round; the oracle applies the identical expression.
    qdist = F.floor(adc * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    topk = (
        cand.select("vec_id", "cell", qdist.alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(PQ_TOPK)
    )
    from pyspark.sql import Window as _W

    return topk.select(
        F.row_number()
        .over(_W.orderBy("dist", "vec_id"))
        .cast("bigint")
        .alias("rank"),
        "vec_id",
        "cell",
    )


# Scalar quantization: per-dimension [min,max] → 255 levels stored as
# int8 (code − 127 ∈ [−127,127]). 4 B float32 → 1 B: the standard 4×
# index-memory compression step before PQ (which is 8×–32×; see
# sim_vector_pq_encode). All arithmetic is double-exact on both
# engines (min/max are order-independent aggregates, the affine map +
# floor has no summation), so the CODES are bit-reproducible and the
# oracle checks them exactly — only the final approx-cosine is rounded.
SQ_LEVELS = 255
SQ_DIM = 64
SQ_TOPK = 10


@register(
    "sim_scalar_quantize_int8",
    oracle=f"""
    WITH dims AS (SELECT CAST(i AS BIGINT) + 1 AS i FROM range({SQ_DIM}) t(i)),
    stats AS (
        SELECT i,
               MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
               MAX(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, dims GROUP BY i
    ),
    bounds AS (
        SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
        FROM stats
    ),
    coded AS (
        SELECT e.vec_id,
               list_transform(range(1, {SQ_DIM} + 1), i ->
                   CASE WHEN mxs[i] = mns[i] THEN 0
                        ELSE CAST(least({SQ_LEVELS} - 1.0,
                             floor((CAST(e.embedding[i] AS DOUBLE) - mns[i])
                                   * {SQ_LEVELS}.0 / (mxs[i] - mns[i])))
                             AS BIGINT)
                   END) AS codes,
               list_transform(range(1, {SQ_DIM} + 1), i ->
                   CASE WHEN mxs[i] = mns[i] THEN mns[i]
                        ELSE mns[i]
                             + (CAST(least({SQ_LEVELS} - 1.0,
                                 floor((CAST(e.embedding[i] AS DOUBLE) - mns[i])
                                       * {SQ_LEVELS}.0 / (mxs[i] - mns[i])))
                                AS DOUBLE) + 0.5)
                               * (mxs[i] - mns[i]) / {SQ_LEVELS}.0
                   END) AS decoded
        FROM embeddings e CROSS JOIN bounds
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
    SELECT c.vec_id,
           CAST(list_aggregate(
               list_transform(c.codes, x -> abs(x - 127)), 'sum')
               AS BIGINT) AS code_l1,
           ROUND(CAST(list_cosine_similarity(c.decoded, q.q_emb) AS DOUBLE),
                 4) AS approx_cos
    FROM coded c CROSS JOIN q
    WHERE c.vec_id <> 0
    ORDER BY approx_cos DESC, c.vec_id
    LIMIT {SQ_TOPK}
    """,
)
def sim_scalar_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization + asymmetric top-k search — the 4×
    memory-compression tier of a vector index (between raw float32 and
    PQ). Two passes:

      1. corpus → per-dimension [min,max]: ONE partial aggregate with
         2·dim mergeable min/max accumulators (O(dim) state, map-side
         combined — never an explode of dim×N rows);
      2. the 1-row bounds frame broadcasts back; encode is a narrow
         map (affine scale + floor per dimension), and the asymmetric
         search scores the RAW query against DECODED corpus codes
         (reconstruction = bin midpoint), top-k via
         TakeOrderedAndProject.

    At 100 TB the codes (1 B/dim) are what a serving index persists —
    the scan reads 1/4 the bytes of the float32 corpus; this operator
    materializes the codes and proves, via the oracle, that both the
    quantization grid and the ADC scores agree bit-for-bit (codes) and
    to 4 decimals (scores). Constant dimensions quantize to code 0 and
    decode to their constant (guarded identically on both engines).
    """
    emb = load(spark, sf_dir, "embeddings")
    # r13 (guide §7.3 driver-side cost): the 2·64 per-dimension min/max
    # aggregates were built as ~500 individual Column operations
    # (~0.5 s of py4j construction per bench pass); the identical
    # aggregate now parses from two SQL array expressions.
    mins_sql = ", ".join(
        f"min(cast(element_at(embedding, {i + 1}) as double))"
        for i in range(SQ_DIM)
    )
    maxs_sql = ", ".join(
        f"max(cast(element_at(embedding, {i + 1}) as double))"
        for i in range(SQ_DIM)
    )
    bounds = emb.agg(
        F.expr(f"array({mins_sql}) AS mns"),
        F.expr(f"array({maxs_sql}) AS mxs"),
    )

    # r13 (guide §7.3, second pass): the per-dimension encode/decode
    # transform lambdas were Column trees of ~50 nodes each — the two
    # HOFs alone cost ~0.4 s of py4j lambda construction per bench
    # pass. The identical arithmetic now parses from SQL text in one
    # call per column. Literal discipline: CAST(.. AS DOUBLE) where the
    # Column form used F.lit(float) — a bare SQL decimal would parse as
    # DECIMAL and change the coercion; everything else is the same op
    # tree (element_at / least / floor / CASE) in the same order, so
    # codes and decoded values stay bit-identical (oracle-pinned).
    _mn = "element_at(mns, CAST(i AS INT))"
    _mx = "element_at(mxs, CAST(i AS INT))"
    _x = "CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)"
    code_sql = (
        f"CASE WHEN {_mx} = {_mn} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(least(CAST({SQ_LEVELS - 1} AS DOUBLE), "
        f"floor(({_x} - {_mn}) * {SQ_LEVELS} / ({_mx} - {_mn}))) "
        f"AS BIGINT) END"
    )
    decode_sql = (
        f"CASE WHEN {_mx} = {_mn} THEN {_mn} "
        f"ELSE {_mn} + (CAST({code_sql} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" * ({_mx} - {_mn}) / {SQ_LEVELS} END"
    )
    coded = emb.crossJoin(F.broadcast(bounds)).selectExpr(
        "vec_id",
        f"transform(sequence(1, {SQ_DIM}), i -> {code_sql}) AS codes",
        f"transform(sequence(1, {SQ_DIM}), i -> {decode_sql}) AS decoded",
    )
    # r13: the QUERY norm is hoisted (folds once, broadcast); the
    # decoded vector's norm must still fold per row — it exists only
    # as an expression (3 HOF folds per row → 2, same op order →
    # bit-identical). Scoring parses from the dot_sql/norm_sql twins
    # (same fold, bit-identical — see dot_sql).
    query = emb.filter(F.col("vec_id") == 0).selectExpr(
        "embedding AS q_emb", f"{norm_sql('embedding')} AS q_nrm"
    )
    return (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .selectExpr(
            "vec_id",
            "aggregate(transform(codes, c -> abs(c - 127)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS code_l1",
            f"round({dot_sql('decoded', 'q_emb')}"
            f" / ({norm_sql('decoded')} * q_nrm), 4) AS approx_cos",
        )
        .orderBy(F.desc("approx_cos"), "vec_id")
        .limit(SQ_TOPK)
    )


# Late-interaction (ColBERT-style MaxSim) parameters: each 64-dim
# embedding is treated as MV_CHUNKS token-vectors of MV_SUBDIM dims.
MV_CHUNKS = 8
MV_SUBDIM = 8
MV_TOPK = 10


@register(
    "sim_maxsim_multivector",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_aggregate(
               list_transform(range({MV_CHUNKS}), qi ->
                   list_max(list_transform(range({MV_CHUNKS}), dj ->
                       CAST(list_cosine_similarity(
                           q.qe[qi*{MV_SUBDIM}+1 : qi*{MV_SUBDIM}+{MV_SUBDIM}],
                           e.embedding[dj*{MV_SUBDIM}+1 : dj*{MV_SUBDIM}+{MV_SUBDIM}])
                           AS DOUBLE)))),
               'sum'), 4) AS maxsim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY maxsim DESC, e.vec_id
    LIMIT {MV_TOPK}
    """,
)
def sim_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim retrieval (the ColBERT scoring rule):
    query and document are MULTI-vector — here each 64-dim embedding
    decomposed into 8 token-vectors of 8 dims — and the score is
    Σ_{{query tokens}} max_{{doc tokens}} cos(q_i, d_j): every query
    token finds its best-matching doc token, no single-vector pooling
    loss.

    All scoring is JVM-side nested higher-order functions (transform →
    array_max → aggregate) over the chunked arrays — no Python, no
    explode: the 8×8 cosine grid per candidate stays inside one
    projection, so the plan is a broadcast-1-row query × one corpus
    map pass + TakeOrderedAndProject. At 100 TB the corpus side streams
    exactly as the single-vector scorer does (sim_cosine_topk) at
    chunks² the arithmetic per row — the standard late-interaction
    cost/quality trade — and the candidate-generation tier (sim_ann_*)
    bounds what reaches this scorer.
    """
    emb = load(spark, sf_dir, "embeddings")

    def chunks(col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(MV_CHUNKS - 1)),
            lambda i: F.slice(col, (i * MV_SUBDIM + 1).cast("int"), MV_SUBDIM),
        )

    # r13: chunk norms hoisted — each side's MV_CHUNKS sub-vector
    # norms fold once (per row / per query) instead of inside every
    # q-chunk×d-chunk cosine (3 folds per chunk pair → 1). The lambdas
    # iterate chunk values and norms in the same positional order and
    # q_nrm·d_nrm preserves cosine_expr's multiply order →
    # bit-identical maxsim.
    def chunk_norms(ch):
        return F.transform(ch, lambda c: F.sqrt(dot_expr(c, c)))

    query = emb.filter(F.col("vec_id") == 0).select(
        chunks(F.col("embedding")).alias("q_chunks")
    ).select("q_chunks", chunk_norms(F.col("q_chunks")).alias("q_nrms"))
    idx = F.sequence(F.lit(1), F.lit(MV_CHUNKS))
    d_chunks = chunks(F.col("embedding"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", d_chunks.alias("d_chunks"))
        .select(
            "vec_id",
            "d_chunks",
            chunk_norms(F.col("d_chunks")).alias("d_nrms"),
        )
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.transform(
                        idx,
                        lambda qi: F.array_max(
                            F.transform(
                                idx,
                                lambda di: dot_expr(
                                    F.element_at(
                                        F.col("q_chunks"), qi.cast("int")
                                    ),
                                    F.element_at(
                                        F.col("d_chunks"), di.cast("int")
                                    ),
                                )
                                / (
                                    F.element_at(
                                        F.col("q_nrms"), qi.cast("int")
                                    )
                                    * F.element_at(
                                        F.col("d_nrms"), di.cast("int")
                                    )
                                ),
                            )
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            ).alias("maxsim"),
        )
    )
    return scored.orderBy(F.desc("maxsim"), "vec_id").limit(MV_TOPK)


@register(
    "sim_ann_ivf_multiprobe",
    # Converted from rows-only in round 8 (VERDICT r7 #5): the probe
    # set is pinned relationally — same centroid assignment CTE as
    # sim_ann_ivf, probe = top-3 cells by query→centroid cosine.
    oracle=_IVF_ORACLE_ASSIGN
    + f"""
    , probe AS (
        SELECT cell FROM scored WHERE vec_id = 0
        ORDER BY cdist, cell LIMIT {_MULTIPROBE_CELLS}
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    cand AS (
        SELECT a.cell, a.vec_id,
               ROUND(CAST(list_cosine_similarity(a.embedding, q.q_emb)
                          AS DOUBLE), 4) AS cos_sim
        FROM assigned a JOIN probe p ON a.cell = p.cell CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY cos_sim DESC, a.vec_id
        LIMIT 10
    )
    SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id)
                AS BIGINT) AS rank,
           vec_id, cell, cos_sim
    FROM cand
    """,
)
def sim_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with MULTI-PROBE: the query searches its top-3 nearest
    TRAINED cells (by squared L2 to the Lloyd centroids — see
    _ivf_centroids) instead of only its own — the standard fix for the
    single-probe recall cliff when a true neighbour sits just across a
    cell boundary. Exact cosine re-rank runs inside the probed union;
    top-10 emitted with the probed cell.

    Cost model at 100 TB: probes/cells of the corpus scanned per query
    (3/8 here; 3/√N with √N cells in production), each probe a pruned
    partition read when the cell id is the partition column
    (sim_ann_ivf_partitioned's layout). Recall vs the exact scorer is
    pinned in tests — the single-probe twin (sim_ann_ivf) documents the
    recall it gives up.
    """
    from pyspark.sql import Window as _W

    # r13: norms hoisted out of the probed-cells scoring (3 HOF folds
    # per candidate → 1, same op order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(emb, cents)
    # Query probe set: top-3 nearest trained cells by squared L2.
    probe = (
        _ivf_cell_dists(emb.filter(F.col("vec_id") == 0), cents)
        .orderBy("cdist", "cell")
        .limit(_MULTIPROBE_CELLS)
        .select("cell")
    )
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    return (
        assigned.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe), "cell", "left_semi")
        .crossJoin(F.broadcast(query))
        .select(
            "cell",
            "vec_id",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
        .select(
            F.row_number()
            .over(_W.orderBy(F.desc("cos_sim"), "vec_id"))
            .cast("bigint")
            .alias("rank"),
            "vec_id",
            "cell",
            "cos_sim",
        )
    )


LOGREG_ITERS = 3
LOGREG_LR = 0.5
_LR_LN2 = "0.6931471805599453"
_LR_DIM = 64
_LR_NANO = "1000000000.0"


def _lr_horner_exp(var: str) -> str:
    """Taylor e^x (13 terms, Horner, exact-literal 1/k! coefficients)
    for |x| ≤ ln2/2 — full double precision; shared text, so both
    engines evaluate one identical IEEE tree."""
    import math

    coeffs = [repr(1.0 / math.factorial(k)) for k in range(14)]
    p = coeffs[13]
    for k in range(12, -1, -1):
        p = f"({coeffs[k]}+({var}*{p}))"
    return p


def _lr_case_pow2(var: str) -> str:
    """2^n for the integer-valued double exponent column — an explicit
    CASE table of exact power-of-two literals (n ∈ [-43, 0] after the
    ±30 clamp), so no engine-specific pow() is involved."""
    branches = " ".join(
        f"WHEN {var} = {float(k)!r} THEN {2.0 ** k!r}"
        for k in range(-43, 1)
    )
    return f"(CASE {branches} ELSE 1.0 END)"


def _lr_horner_ln1p(var: str) -> str:
    """ln(1+u) via 2·atanh(u/(2+u)) with an 18-term odd Horner in
    t² — exact to double precision for t ≤ 1/3 (u ≤ 1); `var` is the
    t column. Shared text → identical trees."""
    coeffs = [repr(1.0 / (2 * k + 1)) for k in range(18)]
    p = coeffs[17]
    for k in range(16, -1, -1):
        p = f"({coeffs[k]}+(({var}*{var})*{p}))"
    return f"(2.0*({var}*{p}))"


def _lr_stage_exprs() -> list[list[str]]:
    """Column-staged per-row math from margin z to quantized stats —
    the SAME fragment text runs as Spark selectExpr stages and as
    DuckDB CTE stages, so p, the residual, and the nano-quantized
    loss/gradient terms are bit-identical in both engines:
    numerically-stable sigmoid and softplus both derive from one
    exp(-|z|) tree (clamp → FLOOR exponent → pow2 CASE → Taylor)."""
    return [
        ["GREATEST(-30.0, LEAST(30.0, z)) AS zc"],
        ["(0.0-ABS(zc)) AS za"],
        [f"FLOOR((za/{_LR_LN2})+0.5) AS na"],
        [f"(za-(na*{_LR_LN2})) AS ra"],
        [
            f"{_lr_horner_exp('ra')} AS pa",
            f"{_lr_case_pow2('na')} AS t2a",
        ],
        ["(t2a*pa) AS ea"],
        [
            "CASE WHEN zc >= 0.0 THEN (1.0/(1.0+ea)) "
            "ELSE (ea/(1.0+ea)) END AS p",
            "(ea/(2.0+ea)) AS tt",
        ],
        [f"{_lr_horner_ln1p('tt')} AS l1p"],
        ["(p-y) AS r"],
        [
            "CAST(ROUND(((y*(GREATEST((0.0-zc),0.0)+l1p))"
            f"+((1.0-y)*(GREATEST(zc,0.0)+l1p)))*{_LR_NANO}) "
            "AS BIGINT) AS ln9",
            "CASE WHEN ((p > 0.5) AND (y = 1.0)) "
            "OR ((p <= 0.5) AND (y = 0.0)) THEN 1 ELSE 0 END AS ok",
            f"CAST(ROUND(r*{_LR_NANO}) AS BIGINT) AS rq",
        ],
    ]


def _lr_z_fold(weight_ref, bias_ref: str, idx) -> str:
    """Left-assoc dot-product fold matching Spark's zip_with/aggregate
    order; `weight_ref(j)`/`idx(j)` abstract the engines' weight
    reference (literal vs column) and array index base — the VALUES
    are identical, so the fold is too."""
    expr = "0.0"
    for j in range(_LR_DIM):
        expr = f"({expr}+(CAST(embedding[{idx(j)}] AS DOUBLE)*{weight_ref(j)}))"
    return f"({expr}+{bias_ref})"


_LR_QG = f"CAST(ROUND((r*CAST(xj AS DOUBLE))*{_LR_NANO}) AS BIGINT)"


def _lr_chain_parts() -> list[str]:
    """The GD training chain as CTE parts (shared by the ml_logreg_gd
    trajectory oracle and the ml_logreg_inference_gate oracle): per
    iteration a staged per-row block (shared fragments), an integer
    stats/gradient reduction, a 64-column pivot, and the weight update
    — every float either flows through a shared expression tree or is
    an exact integer, so the trajectory is bit-identical to the Spark
    loop. The final trained weights live in CTE w{LOGREG_ITERS-1}.
    `label` rides along in emb for the inference oracle's grouping
    (unused by the training aggregates)."""
    stages = _lr_stage_exprs()
    parts = [
        "WITH emb AS (SELECT label, embedding, "
        "CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y FROM embeddings)",
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(_LR_DIM))
        + ", 0.0 AS b)",
    ]
    for i in range(1, LOGREG_ITERS + 1):
        z = _lr_z_fold(lambda j: f"w.w{j}", "w.b", lambda j: j + 1)
        parts.append(
            f"z{i} AS (SELECT e.embedding, e.y, {z} AS z "
            f"FROM emb e CROSS JOIN w{i - 1} w)"
        )
        prev = f"z{i}"
        for k, stage in enumerate(stages):
            name = f"c{i}_{k}"
            parts.append(
                f"{name} AS (SELECT *, {', '.join(stage)} FROM {prev})"
            )
            prev = name
        parts.append(
            f"st{i} AS (SELECT CAST(SUM(ln9) AS BIGINT) AS lsum, "
            "CAST(SUM(ok) AS BIGINT) AS csum, "
            "CAST(SUM(rq) AS BIGINT) AS dbsum, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM {prev})"
        )
        if i < LOGREG_ITERS:
            parts.append(
                f"gr{i} AS (SELECT j, CAST(SUM({_LR_QG}) AS BIGINT) AS s "
                f"FROM (SELECT r, unnest(embedding) AS xj, "
                f"generate_subscripts(embedding, 1) AS j FROM {prev}) "
                "GROUP BY j)"
            )
            gp = ", ".join(
                f"MAX(CASE WHEN j = {j + 1} THEN s END) AS g{j}"
                for j in range(_LR_DIM)
            )
            parts.append(f"gp{i} AS (SELECT {gp} FROM gr{i})")
            upd = ", ".join(
                f"(w.w{j} - ({LOGREG_LR}*(CAST(g.g{j} AS DOUBLE)"
                f"/(CAST(st.n AS DOUBLE)*{_LR_NANO})))) AS w{j}"
                for j in range(_LR_DIM)
            )
            parts.append(
                f"w{i} AS (SELECT {upd}, "
                f"(w.b - ({LOGREG_LR}*(CAST(st.dbsum AS DOUBLE)"
                f"/(CAST(st.n AS DOUBLE)*{_LR_NANO})))) AS b "
                f"FROM w{i - 1} w CROSS JOIN gp{i} g CROSS JOIN st{i} st)"
            )
    return parts


def _lr_oracle_sql() -> str:
    """ml_logreg_gd's oracle: the shared training chain + the
    per-iteration loss/accuracy trajectory select."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS iteration, "
        f"ROUND(CAST(lsum AS DOUBLE)/(CAST(n AS DOUBLE)*{_LR_NANO}), 6) "
        "AS log_loss, "
        "ROUND(CAST(csum AS DOUBLE)/CAST(n AS DOUBLE), 4) AS accuracy "
        f"FROM st{i}"
        for i in range(1, LOGREG_ITERS + 1)
    )
    return ",\n".join(_lr_chain_parts()) + "\n" + rows


@register(
    "ml_logreg_gd",
    # Round-8 conversion (rows-only → sql-checked): the full GD
    # trajectory is made bit-deterministic across engines by (a) a
    # SHARED numerically-stable sigmoid/softplus built from one
    # exp(-|z|) expression tree (clamp → FLOOR exponent → exact pow2
    # CASE table → Taylor-13 Horner; ln(1+u) as 2·atanh Horner) — no
    # engine libm in the loop — and (b) nano-quantized integer
    # gradient/loss accumulation (exact BIGINT sums are order-free,
    # and the quantization inputs are bit-identical, so rounding can
    # never diverge). Reproducible quantized-gradient training is a
    # real distributed-SGD discipline, not a test crutch.
    oracle=_lr_oracle_sql(),
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-gradient-descent LOGISTIC REGRESSION over the embeddings
    table (binary target: label < 5) — the linear-probe classifier a
    training pipeline fits on embeddings for quality filtering or
    domain routing, expressed in the house distributed-iterative shape
    (ml_kmeans_lloyd / ml_pca_project): per-iteration model state lives
    as CODEGEN LITERALS baked into the expressions, the data pass is
    map + partial-agg only, and the driver touches exactly DIM+1
    numbers per iteration (the gradient — same bounded-driver contract
    as the k-means centroids).

    Per iteration: margin z = w·x + b via a JVM-side zip_with/aggregate
    fold (no Python), residual r = σ(z) − y, gradient ∇w_j = Σ r·x_j
    by posexplode → groupBy(j) — map-side combinable, 64 result rows —
    and a 1-row stats agg (log-loss, accuracy, ∇b). Gradient descent
    MUST strictly decrease the full-batch loss at this LR; the op
    raises if it ever doesn't (catches sign errors and LR blowups
    loudly). Output: per-iteration loss/accuracy trajectory.

    At 100 TB: 2 linear passes per iteration, zero shuffles of
    anything row-sized (the gradient shuffle carries 64·|partitions|
    partial rows); the all-reduce is the 64-row fetch — the same
    topology as distributed SGD parameter averaging."""
    emb = load(spark, sf_dir, "embeddings").select(
        "embedding", (F.col("label") < 5).cast("double").alias("y")
    )
    nano = float(_LR_NANO)
    w = [0.0] * _LR_DIM
    b = 0.0
    history = []
    prev = None
    for it in range(1, LOGREG_ITERS + 1):
        z = _lr_z_fold(lambda j: repr(w[j]), repr(b), lambda j: j)
        staged = emb.selectExpr("*", f"{z} AS z")
        for stage in _lr_stage_exprs():
            staged = staged.selectExpr("*", *stage)
        stats = staged.agg(
            F.expr("CAST(SUM(ln9) AS BIGINT)").alias("lsum"),
            F.expr("CAST(SUM(ok) AS BIGINT)").alias("csum"),
            F.expr("CAST(SUM(rq) AS BIGINT)").alias("dbsum"),
            F.count("*").alias("n"),
        ).first()
        loss = stats.lsum / (stats.n * nano)
        if prev is not None and not loss < prev:
            raise RuntimeError(f"GD loss rose at iter {it}: {prev} -> {loss}")
        prev = loss
        history.append((it, int(stats.lsum), int(stats.csum), int(stats.n)))

        if it < LOGREG_ITERS:
            grad_rows = (
                staged.select("r", F.posexplode("embedding").alias("j", "xj"))
                .groupBy("j")
                .agg(F.expr(f"CAST(SUM({_LR_QG}) AS BIGINT)").alias("s"))
                .collect()  # bounded: DIM rows — the model all-reduce
            )
            g = [0] * _LR_DIM
            for r in grad_rows:
                g[r.j] = int(r.s)
            # Mirrors the oracle's update expression: exact BIGINT
            # gradient / (n · 1e9), both factors exact doubles.
            w = [
                wj - LOGREG_LR * (gj / (stats.n * nano))
                for wj, gj in zip(w, g)
            ]
            b = b - LOGREG_LR * (int(stats.dbsum) / (stats.n * nano))

    return spark.createDataFrame(
        history, "iteration long, lsum long, csum long, n long"
    ).selectExpr(
        "iteration",
        f"ROUND(CAST(lsum AS DOUBLE)/(CAST(n AS DOUBLE)*{_LR_NANO}), 6) "
        "AS log_loss",
        "ROUND(CAST(csum AS DOUBLE)/CAST(n AS DOUBLE), 4) AS accuracy",
    )


# Quality-gate threshold for the trained-classifier inference pass, in
# integer nanos (p ≥ 0.5 ⇔ pq ≥ 5e8 — exact integer compare, so the
# gate can never flip cross-engine).
_LR_GATE_NANO = 500_000_000
# Per-row nano-quantized score — shared fragment text (the pq inputs
# are bit-identical in both engines via the shared sigmoid tree).
_LR_PQ = f"CAST(ROUND(p * {_LR_NANO}) AS BIGINT) AS pq"


def _lr_trained_weights(spark: SparkSession, sf_dir: str):
    """Replays the deterministic GD loop to its final weight state
    (w{LOGREG_ITERS-1} in oracle terms): the trajectory is
    bit-reproducible (nano-quantized integer gradients — see
    ml_logreg_gd), so 'the trained model' is a pure function of the
    fixture, identical across engines and runs."""
    emb = load(spark, sf_dir, "embeddings").select(
        "embedding", (F.col("label") < 5).cast("double").alias("y")
    )
    nano = float(_LR_NANO)
    w = [0.0] * _LR_DIM
    b = 0.0
    for _ in range(1, LOGREG_ITERS):
        z = _lr_z_fold(lambda j: repr(w[j]), repr(b), lambda j: j)
        staged = emb.selectExpr("*", f"{z} AS z")
        for stage in _lr_stage_exprs():
            staged = staged.selectExpr("*", *stage)
        stats = staged.agg(
            F.expr("CAST(SUM(rq) AS BIGINT)").alias("dbsum"),
            F.count("*").alias("n"),
        ).first()
        grad_rows = (
            staged.select("r", F.posexplode("embedding").alias("j", "xj"))
            .groupBy("j")
            .agg(F.expr(f"CAST(SUM({_LR_QG}) AS BIGINT)").alias("s"))
            .collect()  # bounded: DIM rows
        )
        g = [0] * _LR_DIM
        for r in grad_rows:
            g[r.j] = int(r.s)
        w = [
            wj - LOGREG_LR * (gj / (stats.n * nano))
            for wj, gj in zip(w, g)
        ]
        b = b - LOGREG_LR * (int(stats.dbsum) / (stats.n * nano))
    return w, b


def _lr_inference_oracle_sql() -> str:
    """Inference oracle: the shared training chain up to the final
    weights CTE, then ONE scoring pass (same z fold + sigmoid stages,
    weights referenced from w{LOGREG_ITERS-1}) and an exact-integer
    per-label gate/score reduction."""
    parts = _lr_chain_parts()
    wfinal = f"w{LOGREG_ITERS - 1}"
    z = _lr_z_fold(lambda j: f"w.w{j}", "w.b", lambda j: j + 1)
    parts.append(
        f"zinf AS (SELECT e.label, e.embedding, e.y, {z} AS z "
        f"FROM emb e CROSS JOIN {wfinal} w)"
    )
    prev = "zinf"
    for k, stage in enumerate(_lr_stage_exprs()):
        name = f"cinf_{k}"
        parts.append(f"{name} AS (SELECT *, {', '.join(stage)} FROM {prev})")
        prev = name
    parts.append(f"sq AS (SELECT label, {_LR_PQ} FROM {prev})")
    final = f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN pq >= {_LR_GATE_NANO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(pq) AS BIGINT) AS sum_score_nano
    FROM sq GROUP BY label ORDER BY label
    """
    return ",\n".join(parts) + "\n" + final


@register(
    "ml_logreg_inference_gate",
    # Trained-classifier INFERENCE (VERDICT r8 item #7a): sql-checked
    # through the same shared-expression-tree + nano-quantization
    # discipline as ml_logreg_gd — the oracle retrains the identical
    # weight state inside DuckDB, scores every row through the shared
    # sigmoid tree, and reduces exact integers, so gate decisions and
    # score sums are bit-deterministic cross-engine.
    oracle=_lr_inference_oracle_sql(),
)
def ml_logreg_inference_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-classifier quality gate — the fastText-style filter
    every corpus pipeline runs AFTER fitting a quality probe
    (ml_logreg_gd is the fit; this is the apply): score the FULL
    corpus with the trained weights baked in as codegen literals and
    keep rows the classifier accepts (p ≥ 0.5). Output: per-label kept
    counts + exact nano-score sums (the gate audit a data team reviews
    before committing a filter).

    At 100 TB this is the pipeline's cheapest stage and must stay so:
    the model is DIM+1 literals (no join, no broadcast, no Python), the
    pass is ONE whole-stage-codegen'd map + a per-label partial agg —
    the same single-scan shape as scan_filter_prune. Training replay
    (_lr_trained_weights) costs 2·(ITERS−1) bounded passes once per
    job; at scale you'd persist the weights instead — the scoring pass
    is the contract here."""
    w, b = _lr_trained_weights(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        "embedding",
        (F.col("label") < 5).cast("double").alias("y"),
    )
    z = _lr_z_fold(lambda j: repr(w[j]), repr(b), lambda j: j)
    staged = emb.selectExpr("*", f"{z} AS z")
    for stage in _lr_stage_exprs():
        staged = staged.selectExpr("*", *stage)
    scored = staged.selectExpr("label", _LR_PQ)
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr(
                f"CAST(SUM(CASE WHEN pq >= {_LR_GATE_NANO} THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("n_kept"),
            F.expr("CAST(SUM(pq) AS BIGINT)").alias("sum_score_nano"),
        )
        .orderBy("label")
    )


BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60
RRF_TOPK = 50
RRF_OUT = 15
_RRF_TERMS = ("join", "hash")


@register(
    "sim_rrf_fusion",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM words GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM words WHERE w IN ('join', 'hash') GROUP BY doc_id, w
    ),
    df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    bm25 AS (
        SELECT tf.doc_id,
               ROUND(SUM(
                   ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
        FROM bm25 ORDER BY score DESC, doc_id LIMIT {RRF_TOPK}
    ),
    vec AS (
        SELECT b.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(CAST(list_cosine_similarity(
                       a.embedding, b.embedding) AS DOUBLE), 6) DESC,
                   b.vec_id) AS r
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id = 0
        ORDER BY ROUND(CAST(list_cosine_similarity(
            a.embedding, b.embedding) AS DOUBLE), 6) DESC, b.vec_id
        LIMIT {RRF_TOPK}
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           CAST(COALESCE(l.r, 0) AS BIGINT) AS rank_lex,
           CAST(COALESCE(v.r, 0) AS BIGINT) AS rank_vec,
           CAST(COALESCE(1000000 // ({RRF_K} + l.r), 0)
                + COALESCE(1000000 // ({RRF_K} + v.r), 0) AS BIGINT)
               AS rrf_ppm
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf_ppm DESC, doc_id
    LIMIT {RRF_OUT}
    """,
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL by Reciprocal Rank Fusion: a lexical BM25
    ranking (query terms 'join hash' over the documents table) and a
    dense cosine ranking (vs vec_id 0, doc_id==vec_id) are fused as
    Σ 1/(K + rank) over each list's top-50 — the standard
    score-scale-free hybrid search every RAG stack runs (Cormack et
    al.'s RRF; BM25 per Robertson/Spärck Jones). Cross-engine
    determinism: both scores are ROUNDED to 6dp BEFORE ranking (float
    drift cannot flip a rank), ranks tie-break on doc_id, and the RRF
    contribution is INTEGER ppm (1e6 DIV (K+rank)) so the fused score
    is exact.

    Plan shape: BM25 is the tfidf machinery — explode+filter to the
    query terms only (the scan prunes to matching postings
    immediately), df/avgdl as tiny broadcast aggregates, ONE shuffle
    on doc_id; the dense side is the sim_cosine_topk broadcast scan;
    both lists end in TakeOrderedAndProject (no global sort) and the
    fusion is a 50×50-row full outer join. At 100 TB: each ranking is
    one pruned pass, the fusion is constant-size."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        words.filter(F.col("w").isin(*_RRF_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    bm25 = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                        + 1.0
                    )
                    * F.col("tf")
                    * (BM25_K1 + 1.0)
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (
                            1.0
                            - BM25_B
                            + BM25_B * F.col("dl") / F.col("avgdl")
                        )
                    )
                ),
                6,
            ).alias("score")
        )
    )
    from pyspark.sql.window import Window as W

    lex = (
        bm25.orderBy(F.desc("score"), "doc_id")
        .limit(RRF_TOPK)
        .withColumn(
            "rank_lex",
            F.row_number().over(W.orderBy(F.desc("score"), "doc_id")),
        )
        .select("doc_id", "rank_lex")
    )
    # r13: norms hoisted out of the dense leg's corpus pass (3 HOF
    # folds per row → 1, same op order → bit-identical).
    embn = emb.withColumn("nrm", norm_expr(F.col("embedding")))
    query = embn.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    scored = (
        embn.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("cos"),
        )
    )
    vec = (
        scored.orderBy(F.desc("cos"), "doc_id")
        .limit(RRF_TOPK)
        .withColumn(
            "rank_vec",
            F.row_number().over(W.orderBy(F.desc("cos"), "doc_id")),
        )
        .select("doc_id", "rank_vec")
    )
    # Contributions computed from the NULLABLE pre-coalesce ranks (an
    # absent list contributes 0, not 1e6/(K+0)); the output ranks are
    # coalesced to 0 purely as the "absent" marker.
    contrib_lex = F.when(
        F.col("rank_lex").isNull(), F.lit(0)
    ).otherwise(F.expr(f"1000000 DIV ({RRF_K} + rank_lex)"))
    contrib_vec = F.when(
        F.col("rank_vec").isNull(), F.lit(0)
    ).otherwise(F.expr(f"1000000 DIV ({RRF_K} + rank_vec)"))
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_lex", F.lit(0)).cast("long").alias("rank_lex"),
        F.coalesce("rank_vec", F.lit(0)).cast("long").alias("rank_vec"),
        (contrib_lex + contrib_vec).cast("long").alias("rrf_ppm"),
    )
    return fused.orderBy(F.desc("rrf_ppm"), "doc_id").limit(RRF_OUT)


HASH_DIM = 32


@register(
    "ml_feature_hashing",
    oracle=f"""
    WITH words AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    bucketed AS (
        SELECT lang,
               CAST(CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT)
                    % {HASH_DIM} AS BIGINT) AS bucket
        FROM words
    )
    SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS tf
    FROM bucketed
    GROUP BY lang, bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASHING-TRICK featurization (Weinberger et al. 2009): terms map
    to a FIXED {HASH_DIM}-dim feature space via a hash, so the
    vectorizer needs no vocabulary dictionary at all — the only
    featurizer that works on a 100 TB corpus without first
    building/broadcasting a vocab table (new terms can never grow the
    feature space or force a re-fit). Output is the per-language
    bucketed term-frequency profile — the aggregate view of the
    per-doc vectors a downstream linear model (ml_logreg_gd) consumes.

    Cross-engine determinism: the bucket hash is md5's first 8 hex
    chars parsed as an integer mod D — exact and identical in both
    engines (the house md5 idiom; xxhash64 would be faster in Spark
    but has no DuckDB twin to verify against — at production scale
    swap to xxhash64, same shape). Plan: explode → map-side-combinable
    groupBy on the (lang × D)-bounded key space — one shuffle whose
    payload is vocabulary-independent, THE point of the trick."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        % HASH_DIM
    )
    return (
        words.select("lang", bucket.cast("long").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count("*").alias("tf"))
    )


def _rank_fraction_scored(orders: DataFrame) -> DataFrame:
    """(y, p_milli) for the deterministic price-rank 'model' shared by
    ml_calibration_bins / ml_confusion_threshold_sweep /
    ml_brier_decomposition: label y = fulfilled, score p_milli =
    ((r−1)·1000) DIV n with r the exact global rank over
    (o_totalprice, o_orderkey). The rank comes from the two-pass
    bucket-offset (scalable.py) — NOT a partition-less row_number over
    the whole orders table (the r12-flagged single-task window class);
    the integers are identical, so the oracles keep the plain
    ROW_NUMBER form and the driver proves the rewrite."""
    from pg_archiver_spark.operators.scalable import bucketed_global_rank

    ranked = bucketed_global_rank(
        orders.select("o_orderkey", "o_totalprice", "o_orderstatus"),
        F.col("o_totalprice"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
        "__r",
        "__n",
    )
    return ranked.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.expr("((__r - 1) * 1000) DIV __n").alias("p_milli"),
    )


@register(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               ((ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                 - 1) * 1000)
                   // COUNT(*) OVER () AS p_milli
        FROM orders
    ),
    binned AS (
        SELECT p_milli // 100 AS bin, y, p_milli,
               (p_milli - 1000 * y) * (p_milli - 1000 * y) AS sq
        FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(p_milli) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               / 1000.0, 6) + 0.0 AS mean_p,
           ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               + 0.0 AS frac_pos,
           ROUND(CAST(SUM(sq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               / 1000000.0, 6) + 0.0 AS brier
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration reliability bins — the ML-eval primitive
    behind every probability-producing model's QA: bucket predictions
    into deciles, compare mean predicted probability against observed
    positive rate per bucket, and report per-bin Brier score. The
    'model' here is the price-rank score (predicted probability =
    exact rank fraction of o_totalprice, in integer milli-units) with
    fulfilled-status as the label — on these fixtures price rank
    carries no signal, so the reliability curve should be FLAT at the
    base rate, which the sibling test pins (a calibration harness must
    not invent calibration).

    Determinism: the score is an exact integer rank fraction
    ((r−1)·1000 DIV n), the per-bin sufficient statistics (Σp, Σy,
    Σ(p−1000y)²) are exact integers, and each reported metric is one
    IEEE division (G11) — no float accumulates anywhere.

    Plan: one scan → two-pass bucket-offset global rank
    (_rank_fraction_scored / scalable.py — no single-task window at
    any corpus size; same integers as the oracle's plain ROW_NUMBER)
    → 10-group partial+final agg."""
    orders = load(spark, sf_dir, "orders")
    scored = _rank_fraction_scored(orders)
    binned = scored.select(
        (F.col("p_milli") / 100).cast("bigint").alias("bin"),
        "y",
        "p_milli",
        (
            (F.col("p_milli") - 1000 * F.col("y"))
            * (F.col("p_milli") - 1000 * F.col("y"))
        ).alias("sq"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            # ROUND 6dp + 0.0 (r12 sweep): G13 double-output discipline.
            (
                F.round(
                    F.sum("p_milli").cast("double")
                    / F.count("*").cast("double")
                    / 1000.0,
                    6,
                )
                + F.lit(0.0)
            ).alias("mean_p"),
            (
                F.round(
                    F.sum("y").cast("double") / F.count("*").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("frac_pos"),
            (
                F.round(
                    F.sum("sq").cast("double")
                    / F.count("*").cast("double")
                    / 1000000.0,
                    6,
                )
                + F.lit(0.0)
            ).alias("brier"),
        )
        .orderBy("bin")
    )


MRL_DIMS = [64, 32, 16]
MRL_N_QUERIES = 20
MRL_TOPK = 10


@register(
    "sim_matryoshka_eval",
    oracle=f"""
    WITH dims(d) AS (VALUES (64), (32), (16)),
    scored AS (
        SELECT a.vec_id AS q_id, dims.d, b.vec_id,
               ROUND(CAST(list_cosine_similarity(
                   b.embedding[1:dims.d], a.embedding[1:dims.d]
               ) AS DOUBLE), 4) AS s
        FROM embeddings a
        JOIN embeddings b ON b.vec_id <> a.vec_id
        CROSS JOIN dims
        WHERE a.vec_id < {MRL_N_QUERIES}
    ),
    ranked AS (
        SELECT q_id, d, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id, d ORDER BY s DESC, vec_id
               ) AS rnk
        FROM scored
    ),
    topk AS (
        SELECT q_id, d, vec_id FROM ranked WHERE rnk <= {MRL_TOPK}
    ),
    ref AS (SELECT q_id, vec_id FROM topk WHERE d = 64)
    SELECT CAST(t.d AS BIGINT) AS dim,
           CAST(COUNT(DISTINCT t.q_id) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           CAST((SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1000) // ({MRL_N_QUERIES} * {MRL_TOPK})
                AS BIGINT) AS recall_pm
    FROM topk t
    LEFT JOIN ref r ON t.q_id = r.q_id AND t.vec_id = r.vec_id
    GROUP BY t.d
    ORDER BY dim DESC
    """,
)
def sim_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation (MRL, Kusupati 2022 —
    the public trick behind 'shortened' embedding APIs): score recall@10
    of cosine search when vectors are truncated to prefix dims 32 and
    16 against the full 64-dim ranking, over a 20-query panel. This is
    the eval harness a team runs BEFORE shipping truncated embeddings
    to cut ANN memory 2-4×; the op reports (dim, n_overlap, recall
    permille), with the full dim pinned at recall 1000 as the
    self-anchor.

    Determinism: scores ROUND to 4dp before ranking with vec_id
    tiebreaks (sim_cosine_topk precedent), overlap and recall are
    exact integers (DIV — G11).

    Plan: the 20-query panel broadcasts; scoring is ONE map pass over
    the corpus fan-out (queries × dims), top-k per (query, dim) is a
    bounded window on the scored frame; the overlap join keys on
    (q_id, vec_id) against the ≤ 20·10-row reference — broadcast. At
    100 TB corpus the scoring pass swaps to the IVF candidate set
    (sim_ann_ivf) with this same eval unchanged — that is the point
    of an eval op: it rides any retrieval backend."""
    # r13: per-prefix norms hoisted out of the corpus×panel scoring —
    # each slice's norm folds once per row / once per query instead of
    # twice per (pair, dim); nrm_d·q_nrm_d preserves cosine_expr's
    # multiply order → bit-identical scores.
    emb = load(spark, sf_dir, "embeddings").select(
        "*",
        *[
            norm_expr(F.slice(F.col("embedding"), 1, d)).alias(f"nrm_{d}")
            for d in MRL_DIMS
        ],
    )
    queries = emb.filter(F.col("vec_id") < MRL_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        *[F.col(f"nrm_{d}").alias(f"q_nrm_{d}") for d in MRL_DIMS],
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored_cols = [
        F.round(
            dot_expr(
                F.slice(F.col("embedding"), 1, d),
                F.slice(F.col("q_emb"), 1, d),
            )
            / (F.col(f"nrm_{d}") * F.col(f"q_nrm_{d}")),
            4,
        ).alias(f"s_{d}")
        for d in MRL_DIMS
    ]
    scored = pairs.select("q_id", "vec_id", *scored_cols).select(
        "q_id",
        "vec_id",
        F.expr(
            "stack({n}, {args}) as (d, s)".format(
                n=len(MRL_DIMS),
                args=", ".join(f"{d}, s_{d}" for d in MRL_DIMS),
            )
        ),
    )
    w = Window.partitionBy("q_id", "d").orderBy(
        F.desc("s"), F.asc("vec_id")
    )
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= MRL_TOPK)
        .select("q_id", "d", "vec_id")
    )
    ref = (
        topk.filter(F.col("d") == 64)
        .select(
            F.col("q_id").alias("ref_q"), F.col("vec_id").alias("ref_vec")
        )
        .withColumn("in_ref", F.lit(1))
    )
    return (
        topk.join(
            F.broadcast(ref),
            (F.col("q_id") == F.col("ref_q"))
            & (F.col("vec_id") == F.col("ref_vec")),
            "left",
        )
        .groupBy(F.col("d").cast("bigint").alias("dim"))
        .agg(
            F.countDistinct("q_id").cast("bigint").alias("n_queries"),
            F.sum(F.coalesce(F.col("in_ref"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap"),
        )
        .select(
            "dim",
            "n_queries",
            "n_overlap",
            F.expr(
                f"(n_overlap * 1000) DIV ({MRL_N_QUERIES} * {MRL_TOPK})"
            ).alias("recall_pm"),
        )
        .orderBy(F.desc("dim"))
    )


HNM_N_ANCHORS = 32


@register(
    "pipeline_hard_negative_mining",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS anchor_id, a.label AS a_label,
               b.vec_id, b.label,
               ROUND(CAST(list_cosine_similarity(b.embedding, a.embedding)
                          AS DOUBLE), 3) AS s
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {HNM_N_ANCHORS}
    ),
    ranked AS (
        SELECT anchor_id, vec_id, s,
               label = a_label AS same,
               ROW_NUMBER() OVER (
                   PARTITION BY anchor_id, label = a_label
                   ORDER BY s DESC, vec_id
               ) AS rnk
        FROM scored
    ),
    pos AS (
        SELECT anchor_id, vec_id AS pos_id, s AS pos_sim
        FROM ranked WHERE same AND rnk = 1
    ),
    neg AS (
        SELECT anchor_id, vec_id AS neg_id, s AS neg_sim
        FROM ranked WHERE NOT same AND rnk = 1
    )
    SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
           p.pos_sim - n.neg_sim AS margin
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    ORDER BY p.anchor_id
    """,
)
def pipeline_hard_negative_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training — the
    data-prep step behind every dual-encoder fine-tune: for each
    anchor in the mining batch, pair the nearest SAME-label vector
    (the positive) with the nearest DIFFERENT-label vector (the hard
    negative — random negatives are trivially separable and teach
    nothing), and report the margin between them; near-zero or
    negative margins are exactly the informative triplets.

    Determinism: scores ROUND to 3dp before ranking (4dp hit a
    half-even boundary where the two engines' dot-fold orders differ
    by 1 ulp — sim_label_avg's precedent) with vec_id
    tiebreaks (sim_cosine_topk precedent); both argmaxes are rank-1
    rows of one shared window family; margin subtracts
    identically-computed doubles (G11).

    Plan: the anchor batch broadcasts (sim_batch_knn_join shape — at
    100 TB you iterate mining batches, each one corpus map pass, or
    swap the scorer for the IVF candidate set); one scoring pass, two
    rank-1 windows partitioned by (anchor, same-label), a tiny
    pos⋈neg join on anchor id."""
    # r13: norms hoisted out of the corpus×anchor scoring (3 HOF folds
    # per pair → 1, same op order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    anchors = emb.filter(F.col("vec_id") < HNM_N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "vec_id",
            (F.col("label") == F.col("a_label")).alias("same"),
            F.round(
                dot_expr(F.col("embedding"), F.col("a_emb"))
                / (F.col("nrm") * F.col("a_nrm")),
                3,
            ).alias("s"),
        )
    )
    w = Window.partitionBy("anchor_id", "same").orderBy(
        F.desc("s"), F.asc("vec_id")
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") == 1
    )
    pos = ranked.filter(F.col("same")).select(
        "anchor_id",
        F.col("vec_id").alias("pos_id"),
        F.col("s").alias("pos_sim"),
    )
    neg = ranked.filter(~F.col("same")).select(
        F.col("anchor_id").alias("n_anchor"),
        F.col("vec_id").alias("neg_id"),
        F.col("s").alias("neg_sim"),
    )
    return (
        pos.join(
            F.broadcast(neg), pos.anchor_id == neg.n_anchor
        )
        .select(
            "anchor_id",
            "pos_id",
            "pos_sim",
            "neg_id",
            "neg_sim",
            (F.col("pos_sim") - F.col("neg_sim")).alias("margin"),
        )
        .orderBy("anchor_id")
    )


KNN_EVAL_QUERIES = 64
KNN_EVAL_K = 5


@register(
    "ml_knn_eval_accuracy",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS q_id, a.label AS true_label,
               b.vec_id, b.label,
               ROUND(CAST(list_cosine_similarity(b.embedding, a.embedding)
                          AS DOUBLE), 3) AS s
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {KNN_EVAL_QUERIES}
    ),
    topk AS (
        SELECT q_id, true_label, label
        FROM (
            SELECT q_id, true_label, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY s DESC, vec_id
                   ) AS rnk
            FROM scored
        ) WHERE rnk <= {KNN_EVAL_K}
    ),
    votes AS (
        SELECT q_id, true_label, label, COUNT(*) AS n_votes
        FROM topk GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT q_id, true_label, label AS pred_label
        FROM (
            SELECT q_id, true_label, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id
                       ORDER BY n_votes DESC, label
                   ) AS vr
            FROM votes
        ) WHERE vr = 1
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred_label = true_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST((SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                 * 1000) // COUNT(*) AS BIGINT) AS accuracy_pm
    FROM pred
    GROUP BY true_label
    ORDER BY true_label
    """,
)
def ml_knn_eval_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation — leave-one-out 5-NN majority-vote
    label prediction over a 64-query panel, reported as per-class
    accuracy: the embedding-quality probe every retrieval/labeling
    pipeline runs (if k-NN can't recover the labels, the embeddings
    don't separate the classes — do not ship them to the ANN index).
    Completes the eval trio: calibration (ml_calibration_bins),
    truncation robustness (sim_matryoshka_eval), label recovery
    (this).

    Determinism: scores ROUND to 3dp before ranking with vec_id
    tiebreaks; majority ties break toward the smaller label; accuracy
    is integer permille (DIV).

    Plan: query-panel broadcast → one corpus scoring pass → top-k
    window → votes collapse to ≤panel·|labels| rows → rank-1 vote
    window → per-class agg. At 100 TB the scorer swaps to the IVF
    candidate set (sim_ann_ivf) unchanged."""
    # r13: norms hoisted out of the corpus×panel scoring pass (3
    # interpreted HOF folds per pair → 1; same sqrt-then-multiply
    # order as cosine_expr → bit-identical scores).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < KNN_EVAL_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "true_label",
            "vec_id",
            "label",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                3,
            ).alias("s"),
        )
    )
    w_k = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("vec_id"))
    topk = scored.withColumn("rnk", F.row_number().over(w_k)).filter(
        F.col("rnk") <= KNN_EVAL_K
    )
    votes = topk.groupBy("q_id", "true_label", "label").agg(
        F.count("*").alias("n_votes")
    )
    w_v = Window.partitionBy("q_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(w_v))
        .filter(F.col("vr") == 1)
        .select("q_id", "true_label", F.col("label").alias("pred_label"))
    )
    return (
        pred.groupBy(F.col("true_label").cast("bigint").alias("true_label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("int")
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "true_label",
            "n_queries",
            "n_correct",
            F.expr("(n_correct * 1000) DIV n_queries").alias("accuracy_pm"),
        )
        .orderBy("true_label")
    )


MMR_K = 5
MMR_CAND = 20
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """DuckDB twin of the greedy MMR loop, UNROLLED (MMR_K picks — the
    same fixed-step convertibility as graph_pagerank/ml_kmeans_lloyd,
    round 8, VERDICT r7 #5): pick k is one argmax CTE over the
    remaining candidates with redundancy = max 6dp-rounded cosine to
    the already-picked set; scores are rounded before every compare
    with the vec_id tiebreak, exactly the Spark/driver loop."""
    lam = MMR_LAMBDA
    steps = [f"""
    p1 AS (
        SELECT vec_id, rel, 0.0 AS red,
               ROUND({lam} * rel, 6) AS score
        FROM cand
        ORDER BY ROUND({lam} * rel, 6) DESC, vec_id LIMIT 1
    )"""]
    for k in range(2, MMR_K + 1):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM p{j}" for j in range(1, k)
        )
        steps.append(f"""
    p{k} AS (
        SELECT c.vec_id, c.rel, r.red,
               ROUND({lam} * c.rel - {round(1 - lam, 6)} * r.red, 6)
                   AS score
        FROM cand c
        JOIN (SELECT v1 AS vec_id, MAX(s) AS red
              FROM sims WHERE v2 IN ({sel}) GROUP BY v1) r
          USING (vec_id)
        WHERE c.vec_id NOT IN ({sel})
        ORDER BY score DESC, c.vec_id LIMIT 1
    )""")
    picks = " UNION ALL ".join(
        f"SELECT {k} AS mmr_rank, vec_id, rel, red, score FROM p{k}"
        for k in range(1, MMR_K + 1)
    )
    return f"""
    WITH cand AS (
        SELECT b.vec_id, b.embedding,
               ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding)
                          AS DOUBLE), 6) AS rel
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id = 0
        ORDER BY rel DESC, b.vec_id LIMIT {MMR_CAND}
    ),
    sims AS (
        SELECT x.vec_id AS v1, y.vec_id AS v2,
               ROUND(CAST(list_cosine_similarity(x.embedding, y.embedding)
                          AS DOUBLE), 6) AS s
        FROM cand x, cand y
    ),
    {",".join(steps)},
    relranks AS (
        SELECT vec_id,
               CAST(row_number() OVER (ORDER BY rel DESC, vec_id)
                    AS INT) AS rel_rank
        FROM cand
    )
    SELECT CAST(p.mmr_rank AS INT) AS mmr_rank, p.vec_id, p.rel,
           p.red AS redundancy, p.score AS mmr_score, rr.rel_rank
    FROM ({picks}) p JOIN relranks rr USING (vec_id)
    ORDER BY mmr_rank
    """


@register("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity-aware re-rank every RAG retriever runs on
    its candidate list: greedily pick argmax λ·rel(d) −
    (1−λ)·max_{s∈selected} sim(d, s), so near-duplicate hits that
    would waste context-window slots are demoted in favor of novel
    ones. rows-only by contract: the greedy argmax is inherently
    sequential (each pick changes the next objective), which SQL
    cannot state non-recursively; the pytest twin recomputes the
    selection brute-force and pins exact equality, plus the
    redundancy property (MMR's picks are strictly more diverse than
    the top-K head).

    Scale shape — the serving topology, honestly split: the
    EXPENSIVE part (corpus → top-MMR_CAND candidates by rounded
    cosine) is fully distributed (broadcast 1-row query, one corpus
    pass, TakeOrderedAndProject); the greedy loop then runs on the
    K·CAND bounded frame DRIVER-side over collected rows — the same
    bounded-driver contract as the k-means/PQ codebooks (CAND=20
    rows, corpus-size-independent). Scores are 6dp-rounded before
    every compare with vec_id tiebreaks, so the selection is
    deterministic across runs, partitionings, and retries."""
    import numpy as np

    # r13: norms hoisted out of the corpus relevance pass (3 HOF folds
    # per row → 1, same op order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "embedding",
            F.round(
                dot_expr(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(MMR_CAND)
        .collect()  # bounded: MMR_CAND rows (driver-codebook contract)
    )
    ids = [r.vec_id for r in cands]
    rel = {r.vec_id: r.rel for r in cands}
    mat = np.array([r.embedding for r in cands], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = np.round(unit @ unit.T, 6)
    idx = {v: i for i, v in enumerate(ids)}

    selected: list[int] = []
    remaining = list(ids)
    while remaining and len(selected) < MMR_K:
        best = None
        for v in remaining:
            red = max((sim[idx[v], idx[s]] for s in selected), default=0.0)
            score = round(MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * red, 6)
            # deterministic: higher score wins, then smaller vec_id
            key = (score, -v)
            if best is None or key > best[0]:
                best = (key, v, score, red)
        selected.append(best[1])
        remaining.remove(best[1])
    rows = []
    # rebuild scores in selection order for the report
    chosen: list[int] = []
    for rank_pos, v in enumerate(selected, 1):
        red = max((sim[idx[v], idx[s]] for s in chosen), default=0.0)
        score = round(MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * red, 6)
        rel_rank = 1 + sorted(
            ((rel[u], -u) for u in ids), reverse=True
        ).index((rel[v], -v))
        rows.append(
            (rank_pos, int(v), float(rel[v]), float(red), float(score), rel_rank)
        )
        chosen.append(v)
    return spark.createDataFrame(
        rows,
        "mmr_rank int, vec_id bigint, rel double, redundancy double, "
        "mmr_score double, rel_rank int",
    )


OLS_BASE_DATE = "1992-01-01"


def _det3_str(m) -> str:
    """Fully parenthesized 3×3 determinant over string operands — the
    parens pin one evaluation tree so Spark and DuckDB produce
    bit-identical IEEE doubles from identical inputs."""
    t1 = f"(({m[1][1]}*{m[2][2]})-({m[1][2]}*{m[2][1]}))"
    t2 = f"(({m[1][0]}*{m[2][2]})-({m[1][2]}*{m[2][0]}))"
    t3 = f"(({m[1][0]}*{m[2][1]})-({m[1][1]}*{m[2][0]}))"
    return f"((({m[0][0]}*{t1})-({m[0][1]}*{t2}))+({m[0][2]}*{t3}))"


def _det4_str(m) -> str:
    """Fully parenthesized 4×4 determinant (cofactor expansion along
    row 0) over string operands."""
    minors = [
        _det3_str([[m[i][k] for k in range(4) if k != j] for i in (1, 2, 3)])
        for j in range(4)
    ]
    return (
        f"(((({m[0][0]}*{minors[0]})-({m[0][1]}*{minors[1]}))"
        f"+({m[0][2]}*{minors[2]}))-({m[0][3]}*{minors[3]}))"
    )


def _ols_beta_formulas() -> list[str]:
    """Cramer's-rule beta expressions (cents units) over the DOUBLE
    moment columns d00..d33 (X'X, symmetric) and e0..e3 (X'y). The
    SAME strings are evaluated by Spark and by the DuckDB oracle, so
    both engines run one identical IEEE-754 expression tree — the
    divisions/products are deterministic bit-for-bit given the exact
    integer moments both sides aggregate."""
    xtx = [[f"d{min(i, j)}{max(i, j)}" for j in range(4)] for i in range(4)]
    det = _det4_str(xtx)
    betas = []
    for j in range(4):
        mj = [
            [f"e{i}" if k == j else xtx[i][k] for k in range(4)]
            for i in range(4)
        ]
        betas.append(f"({_det4_str(mj)}/{det})")
    return betas


_OLS_BETAS_C = _ols_beta_formulas()

# Feature + integer-moment SQL fragments shared (modulo engine date
# functions) by the Spark side and the DuckDB oracle below.
_OLS_MOMENT_COLS = [
    ("m01", "x1"), ("m02", "x2"), ("m03", "x3"),
    ("m11", "x1*x1"), ("m12", "x1*x2"), ("m13", "x1*x3"),
    ("m22", "x2*x2"), ("m23", "x2*x3"), ("m33", "x3*x3"),
    ("v0", "yc"), ("v1", "x1*yc"), ("v2", "x2*yc"), ("v3", "x3*yc"),
]
_OLS_D_CASTS = (
    "CAST(m00 AS DOUBLE) AS d00, CAST(m01 AS DOUBLE) AS d01, "
    "CAST(m02 AS DOUBLE) AS d02, CAST(m03 AS DOUBLE) AS d03, "
    "CAST(m11 AS DOUBLE) AS d11, CAST(m12 AS DOUBLE) AS d12, "
    "CAST(m13 AS DOUBLE) AS d13, CAST(m22 AS DOUBLE) AS d22, "
    "CAST(m23 AS DOUBLE) AS d23, CAST(m33 AS DOUBLE) AS d33, "
    "CAST(v0 AS DOUBLE) AS e0, CAST(v1 AS DOUBLE) AS e1, "
    "CAST(v2 AS DOUBLE) AS e2, CAST(v3 AS DOUBLE) AS e3"
)


@register(
    "ml_ols_normal_eq",
    # Round-8 conversion (rows-only → sql-checked): the normal-equation
    # moments are EXACT integers in cents space (features are integers,
    # the target is a DECIMAL(18,2)×100), so both engines aggregate the
    # same numbers; the 4×4 Cramer solve is ONE shared fully-
    # parenthesized expression string (_OLS_BETAS_C) evaluated as IEEE
    # doubles by both, giving bit-identical coefficients; R² sums
    # per-row squared deviations rounded to whole dollars² (exact
    # BIGINTs < 2^53 at every gate SF) and rounds the ratio to 6dp.
    oracle=f"""
    WITH f AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS yc,
               datediff('day', DATE '{OLS_BASE_DATE}', o_orderdate) AS x1,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS x2,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x3
        FROM orders
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m00,
               {", ".join(f"CAST(SUM({expr}) AS BIGINT) AS {name}"
                          for name, expr in _OLS_MOMENT_COLS)}
        FROM f
    ),
    d AS (SELECT m00, {_OLS_D_CASTS} FROM m),
    b AS (
        SELECT m00,
               {", ".join(f"{expr} AS bc{j}"
                          for j, expr in enumerate(_OLS_BETAS_C))},
               (e0/d00) AS ybar_c
        FROM d
    ),
    r AS (
        SELECT CAST(ROUND((((CAST(f.yc AS DOUBLE)
                   - ((((b.bc0*1.0)+(b.bc1*f.x1))+(b.bc2*f.x2))+(b.bc3*f.x3))
               )/100.0)*((CAST(f.yc AS DOUBLE)
                   - ((((b.bc0*1.0)+(b.bc1*f.x1))+(b.bc2*f.x2))+(b.bc3*f.x3))
               )/100.0)), 0) AS BIGINT) AS sq_r,
               CAST(ROUND((((CAST(f.yc AS DOUBLE) - b.ybar_c)/100.0)
                   *((CAST(f.yc AS DOUBLE) - b.ybar_c)/100.0)), 0)
                   AS BIGINT) AS sq_t
        FROM f CROSS JOIN b
    )
    SELECT b.m00 AS n,
           (b.bc0/100.0) AS beta_intercept,
           (b.bc1/100.0) AS beta_day,
           (b.bc2/100.0) AS beta_urgent,
           (b.bc3/100.0) AS beta_status_f,
           ROUND(1.0 - (CAST(s.rss AS DOUBLE)/CAST(s.tss AS DOUBLE)), 6)
               AS r2
    FROM b CROSS JOIN (
        SELECT CAST(SUM(sq_r) AS BIGINT) AS rss,
               CAST(SUM(sq_t) AS BIGINT) AS tss
        FROM r
    ) s
    """,
)
def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature ordinary least squares via distributed NORMAL
    EQUATIONS — the closed-form regression a warehouse runs when it
    wants coefficients, not gradients: price ~ intercept + order-day
    trend + urgency + fulfilled-status. Completes the classical-ML
    family (ml_logreg_gd is the iterative/GD shape, ml_pca_project the
    eigen shape, analytics_linreg_trend the per-group single-feature
    special case): X'X (d(d+1)/2 sums) and X'y (d sums) accumulate in
    ONE partial-agg pass — the only shuffle is 14 numbers — the 4×4
    Cramer solve runs as ONE shared expression string (bounded: the
    PCA/k-means codebook contract), and a second pass with the
    coefficients baked in as CODEGEN LITERALS computes R² from
    residual/total sums of squares.

    Determinism (what makes this sql-checked): the moments are EXACT
    integers (cents-scaled target, integer features), so accumulation
    order cannot perturb them; the float work is confined to the
    shared Cramer expression tree and the per-row residual squares,
    which are rounded to whole dollars² before an exact integer sum.
    pytest additionally pins the coefficients against numpy lstsq on
    the same rows (rtol 1e-6).

    At 100 TB: two scans, no joins, no windows; d² stays constant, so
    the 1-row solve never grows with data — the textbook scalable
    shape for d ≪ n regression (Chen et al., large-scale OLS)."""
    orders = load(spark, sf_dir, "orders")
    feats = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("yc"),
        F.datediff(F.col("o_orderdate"), F.lit(OLS_BASE_DATE)).alias("x1"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("x2"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x3"),
    )
    m = feats.agg(
        F.count("*").cast("long").alias("m00"),
        *[
            F.expr(f"CAST(SUM({expr}) AS BIGINT)").alias(name)
            for name, expr in _OLS_MOMENT_COLS
        ],
    )
    d = m.selectExpr("m00", *_OLS_D_CASTS.split(", "))
    b = d.selectExpr(
        "m00",
        *[f"{e} AS bc{j}" for j, e in enumerate(_OLS_BETAS_C)],
        "(e0/d00) AS ybar_c",
    )
    row = b.first()  # bounded: 4 coefficients + mean + n
    bc = [row[f"bc{j}"] for j in range(4)]
    # Pass 2: residual/total squared deviations, coefficients as
    # literals, mirroring the oracle's expression tree exactly.
    pred = (
        (F.lit(bc[0]) * F.lit(1.0)) + (F.lit(bc[1]) * F.col("x1"))
    ) + (F.lit(bc[2]) * F.col("x2")) + (F.lit(bc[3]) * F.col("x3"))
    rcd = (F.col("yc").cast("double") - pred) / F.lit(100.0)
    tcd = (F.col("yc").cast("double") - F.lit(row["ybar_c"])) / F.lit(100.0)
    s = feats.select(
        F.round(rcd * rcd, 0).cast("long").alias("sq_r"),
        F.round(tcd * tcd, 0).cast("long").alias("sq_t"),
    ).agg(F.sum("sq_r").alias("rss"), F.sum("sq_t").alias("tss"))
    r2 = s.select(
        F.round(
            F.lit(1.0) - F.col("rss").cast("double") / F.col("tss").cast("double"),
            6,
        ).alias("r2")
    ).first()["r2"]
    return spark.createDataFrame(
        [
            (
                int(row["m00"]),
                bc[0] / 100.0,
                bc[1] / 100.0,
                bc[2] / 100.0,
                bc[3] / 100.0,
                float(r2),
            )
        ],
        "n bigint, beta_intercept double, beta_day double, "
        "beta_urgent double, beta_status_f double, r2 double",
    )


def _pack_bits_expr(col: str, lo_offset: int) -> str:
    # Sign bits of dims [lo_offset, lo_offset+32) packed into a BIGINT.
    return (
        f"aggregate(transform(slice({col}, {lo_offset + 1}, 32), "
        "(x, i) -> CASE WHEN x >= 0 THEN CAST(pow(2, i) AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )


@register(
    "sim_binary_quantize_hamming",
    oracle="""
    WITH bits AS (
        SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    packed AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN e >= 0 AND i <= 32
                             THEN CAST(2 AS BIGINT) ** (i - 1)
                             ELSE 0 END) AS BIGINT) AS lo,
               CAST(SUM(CASE WHEN e >= 0 AND i > 32
                             THEN CAST(2 AS BIGINT) ** (i - 33)
                             ELSE 0 END) AS BIGINT) AS hi
        FROM bits GROUP BY vec_id
    ),
    q AS (SELECT lo, hi FROM packed WHERE vec_id = 0)
    SELECT p.vec_id,
           CAST(bit_count(xor(p.lo, q.lo))
                + bit_count(xor(p.hi, q.hi)) AS BIGINT) AS hamming
    FROM packed p CROSS JOIN q
    WHERE p.vec_id <> 0
    ORDER BY hamming, p.vec_id
    LIMIT 10
    """,
)
def sim_binary_quantize_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY (1-bit) vector quantization + Hamming top-k — the
    64×-compression retrieval mode production vector stores ship
    (sign bit per dimension; distance = popcount of XOR): a 64-dim
    float vector becomes two packed 32-bit halves in BIGINTs, and the
    scan-side distance is two XORs + two bit_counts — no floats, no
    multiplies, SIMD-friendly, and exactly the re-rankable coarse
    pass int8 quantization (sim_scalar_quantize_int8) refines. The
    family line: dedup_simhash packs sign bits of TEXT token hashes
    for dedup; sim_ann_lsh uses a 16-bit sketch to BUCKET candidates;
    this op makes the packed code itself the SEARCHED representation
    with exact integer Hamming ranking — hash-checked end-to-end
    (bit packing is integer-exact in both engines: powers of two
    summed per sign, Spark transform's 0-based index vs the oracle's
    1-based generate_subscripts aligned by construction).

    At 100 TB: codes are 8 bytes/vector (vs 256 for float32) — the
    whole corpus' codes fit where 3% of the floats would; the top-k
    is TakeOrderedAndProject over one map pass with a 1-row query
    broadcast (the sim_cosine_topk plan on 1/32 the bytes)."""
    emb = load(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        F.expr(_pack_bits_expr("embedding", 0)).alias("lo"),
        F.expr(_pack_bits_expr("embedding", 32)).alias("hi"),
    )
    q = packed.filter(F.col("vec_id") == 0).select(
        F.col("lo").alias("q_lo"), F.col("hi").alias("q_hi")
    )
    return (
        packed.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


ROC_SCORE_DIMS = 8  # leading embedding dims folded into the score


@register(
    "ml_roc_auc",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(list_sum(embedding[1:{ROC_SCORE_DIMS}]) * 1e6)
                    AS BIGINT) AS score,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings
    ),
    vals AS (
        SELECT score, COUNT(*) AS t, SUM(pos) AS tp
        FROM scored GROUP BY score
    ),
    ranked AS (
        SELECT score, t, tp,
               1 + COALESCE(SUM(t) OVER (
                   ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS r_min
        FROM vals
    ),
    sums AS (
        SELECT CAST(SUM(tp) AS BIGINT) AS n_pos,
               CAST(SUM(t - tp) AS BIGINT) AS n_neg,
               CAST(SUM(CAST(tp AS HUGEINT) * (2 * r_min + t - 1))
                    AS BIGINT) AS sum_avg2_pos
        FROM ranked
    )
    SELECT n_pos, n_neg,
           CAST(sum_avg2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
           COALESCE(CAST(sum_avg2_pos - n_pos * (n_pos + 1) AS DOUBLE)
               / NULLIF(2.0 * CAST(n_pos AS DOUBLE)
                        * CAST(n_neg AS DOUBLE), 0.0), -1.0)
               AS auc
    FROM sums
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC by the EXACT rank-statistic identity AUC = U/(n₊·n₋) —
    the ranking-quality half of model evaluation
    (ml_calibration_bins is the probability-honesty half; a model can
    ace one and fail the other, which is why both ship). The score is
    an integer-quantized fold of the leading embedding dims (×10⁶,
    rounded — scores must be integers BEFORE ranking or cross-engine
    float ordering can disagree, the house ranking rule), the U
    statistic reuses analytics_mannwhitney_u's tie-adjusted doubled-
    midrank machinery (sum of 2·midrank over positives, exact
    BIGINT — ties get the standard 0.5 credit automatically), and the
    single IEEE division at the end is the AUC. No sampling, no
    trapezoid approximation: this IS the exact area.

    Scale: groupBy(score) partial-agg → bucket-offset two-pass prefix
    sums (scalable.py — no single-task window over the distinct-score
    frame) → 1-row sums. The same plan computes AUC at any corpus
    size; a per-segment AUC is one partitionBy away."""
    from pg_archiver_spark.operators.scalable import bucketed_prefix_sums

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.round(
            F.expr(
                f"aggregate(slice(embedding, 1, {ROC_SCORE_DIMS}), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x) * 1e6"
            )
        )
        .cast("bigint")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    vals = scored.groupBy("score").agg(
        F.count("*").alias("t"), F.sum("pos").alias("tp")
    )
    ranked = bucketed_prefix_sums(vals, "score", ["t"]).select(
        "score",
        "t",
        "tp",
        (1 + F.col("t_prefix")).alias("r_min"),
    )
    sums = ranked.agg(
        F.sum("tp").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("tp")).cast("bigint").alias("n_neg"),
        # tp·(2r+t−1) is N²-class per row — DECIMAL(38,0)/HUGEINT
        # promotion before the multiply (the mannwhitney treatment);
        # the BIGINT u2 output holds to N ≈ 2.1e9 rows (documented
        # envelope).
        F.sum(
            F.col("tp").cast("decimal(38,0)")
            * (2 * F.col("r_min") + F.col("t") - 1)
        )
        .cast("bigint")
        .alias("sum_avg2_pos"),
    )
    u2 = F.col("sum_avg2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return sums.select(
        "n_pos",
        "n_neg",
        u2.cast("bigint").alias("u2"),
        # Single-class data leaves AUC undefined: Spark's ANSI divide
        # raises on the zero denominator while DuckDB returns inf
        # (r11 random-fixture sweep) — NULLIF + -1 sentinel both sides.
        F.coalesce(
            u2.cast("double")
            / F.nullif(
                2.0
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double"),
                F.lit(0.0),
            ),
            F.lit(-1.0),
        ).alias("auc"),
    )


@register(
    "ml_pr_auc_average_precision",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(list_sum(embedding[1:{ROC_SCORE_DIMS}]) * 1e6)
                    AS BIGINT) AS score,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings
    ),
    vals AS (
        SELECT score, COUNT(*) AS t, SUM(pos) AS tp
        FROM scored GROUP BY score
    ),
    ranked AS (
        SELECT score, t, tp,
               SUM(t) OVER (ORDER BY score DESC) AS cum_n,
               SUM(tp) OVER (ORDER BY score DESC) AS cum_tp
        FROM vals
    ),
    sums AS (
        SELECT CAST(SUM(tp) AS BIGINT) AS n_pos,
               CAST(SUM(t - tp) AS BIGINT) AS n_neg,
               CAST(SUM(CAST(tp AS HUGEINT) * cum_tp * 1000000 // cum_n)
                    AS BIGINT) AS ap_num
        FROM ranked
    )
    SELECT n_pos, n_neg,
           CAST(ap_num // n_pos AS BIGINT) AS ap_micro,
           CAST(n_pos * 1000000 // (n_pos + n_neg) AS BIGINT)
               AS prevalence_micro
    FROM sums
    """,
)
def ml_pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION-RECALL AUC (average precision) — the ranking metric
    that matters when positives are rare (near-dup detection, quality
    screening), where ROC AUC (ml_roc_auc) looks deceptively good
    because it credits true negatives. AP = Σ_g Δrecall_g·precision_g
    over distinct-score groups ranked descending (ties grouped, the
    sklearn step convention); every term is exact integer arithmetic —
    per-group term = tp·cumTP·10⁶ DIV cumN, total DIV n_pos — so both
    engines floor-quantize identically (the house integer-ratio rule)
    and the result is deterministic to the micro digit.

    Scale: same shape as ml_roc_auc — one groupBy(score) partial agg,
    one bucket-offset two-pass prefix pass (scalable.py, over the
    NEGATED score so the cumulative runs descending; no single-task
    window over the distinct-score frame), one 1-row reduce."""
    from pg_archiver_spark.operators.scalable import bucketed_prefix_sums

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.round(
            F.expr(
                f"aggregate(slice(embedding, 1, {ROC_SCORE_DIMS}), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x) * 1e6"
            )
        )
        .cast("bigint")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    vals = scored.groupBy("score").agg(
        F.count("*").alias("t"), F.sum("pos").alias("tp")
    )
    ranked = bucketed_prefix_sums(
        vals.withColumn("nscore", -F.col("score")), "nscore", ["t", "tp"]
    ).select(
        "t",
        "tp",
        (F.col("t_prefix") + F.col("t")).alias("cum_n"),
        (F.col("tp_prefix") + F.col("tp")).alias("cum_tp"),
    )
    sums = ranked.agg(
        F.sum("tp").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("tp")).cast("bigint").alias("n_neg"),
        # per-group term tp·cumTP·1e6 is ~n_pos²·1e6 — DECIMAL(38,0)/
        # HUGEINT promotion BEFORE the multiply (int64 wraps silently
        # past 2^63); ap_num itself stays ≤ n_pos·1e6, inside int64.
        F.sum(
            F.expr("CAST(tp AS DECIMAL(38,0)) * cum_tp * 1000000 DIV cum_n")
        ).cast("bigint").alias("ap_num"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        F.expr("ap_num DIV n_pos").cast("bigint").alias("ap_micro"),
        F.expr("n_pos * 1000000 DIV (n_pos + n_neg)")
        .cast("bigint")
        .alias("prevalence_micro"),
    )


LIFT_DECILES = 10


@register(
    "ml_lift_gains_table",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id,
               CAST(ROUND(list_sum(embedding[1:{ROC_SCORE_DIMS}]) * 1e6)
                    AS BIGINT) AS score,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings
    ),
    ranked AS (
        SELECT *, NTILE({LIFT_DECILES}) OVER (
                   ORDER BY score DESC, vec_id) AS decile
        FROM scored
    ),
    per_decile AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM ranked GROUP BY decile
    )
    SELECT decile, n, n_pos,
           CAST(SUM(n_pos) OVER (ORDER BY decile) * 1000
                // SUM(n_pos) OVER () AS BIGINT) AS cum_capture_pm,
           CAST(CAST(n_pos AS HUGEINT) * SUM(n) OVER () * 1000
                // (CAST(n AS HUGEINT) * SUM(n_pos) OVER ())
                AS BIGINT) AS lift_milli
    FROM per_decile
    ORDER BY decile
    """,
)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile GAINS/LIFT table — the third leg of the model-eval stool
    (ml_roc_auc = global ranking quality, ml_calibration_bins =
    probability honesty, this = WHERE in the ranking the positives
    concentrate): rank by the quantized score, cut into deciles, and
    report each decile's cumulative positive capture (the gains
    curve — 'top 20% of the list reaches X‰ of all positives', the
    number a campaign-targeting or review-queue owner actually acts
    on) and its lift over the base rate, both as cross-multiplied
    integer ratios (capture·1000÷total, n_pos·N·1000÷(n·N_pos) — all
    operands positive, floor division identical in both engines).

    Scale: the decile cut runs on the two-pass bucket-offset global
    rank (scalable.py) with the closed-form NTILE algebra — no
    single-task sort at any corpus size (the oracle keeps plain NTILE;
    the driver proves the rewrite); everything after is
    |deciles|-bounded."""
    from pg_archiver_spark.operators.scalable import (
        bucketed_global_rank,
        ntile_from_rank,
    )

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.round(
            F.expr(
                f"aggregate(slice(embedding, 1, {ROC_SCORE_DIMS}), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x) * 1e6"
            )
        )
        .cast("bigint")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    ranked = bucketed_global_rank(
        scored,
        -F.col("score"),
        [F.desc("score"), F.col("vec_id")],
        "__r",
        "__n",
    ).withColumn(
        "decile", ntile_from_rank(F.col("__r"), F.col("__n"), LIFT_DECILES)
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_decile.select(
            "decile",
            "n",
            "n_pos",
            F.expr(
                "CAST(SUM(n_pos) OVER (ORDER BY decile "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000 "
                "DIV SUM(n_pos) OVER (ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND UNBOUNDED FOLLOWING) AS BIGINT)"
            ).alias("cum_capture_pm"),
            # lift numerator n_pos·N·1000 is ~N²·1000 — DECIMAL(38,0)/
            # HUGEINT promotion BEFORE the multiply (int64 wraps
            # silently past 2^63; the market_basket_lift class).
            F.expr(
                "CAST(CAST(n_pos AS DECIMAL(38,0)) * SUM(n) OVER "
                "(ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
                "FOLLOWING) * 1000 DIV "
                "(CAST(n AS DECIMAL(38,0)) * SUM(n_pos) OVER "
                "(ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND UNBOUNDED FOLLOWING)) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy("decile")
    )



# ------------------------------------------- margin-based bitext mining
# Artetxe & Schwenk 2019 (arXiv:1811.01136): mine translation pairs
# between two languages' sentence-embedding sides by the RATIO MARGIN
# — cos(x, y) divided by the average of the two points' own
# k-NN-neighborhood similarities — which cancels the hubness that
# makes raw-cosine mining pick the same "hub" targets for every
# source. Sides here are embeddings labels 0 (source) and 1 (target);
# the source side is a fixed 16-probe panel (the _KNN_BATCH_IDS
# discipline: the broadcast never grows with the corpus), the target
# side is corpus-scale.
BITEXT_PANEL = 16
BITEXT_K = 4  # neighborhood size in the margin denominator
BITEXT_MARGIN_THR = 1.05


def _bitext_oracle() -> str:
    return f"""
    WITH btsrc AS (
        SELECT vec_id AS src_id, embedding AS s_emb
        FROM embeddings WHERE label = 0
        ORDER BY vec_id LIMIT {BITEXT_PANEL}
    ),
    bttgt AS (
        SELECT vec_id AS tgt_id, embedding AS t_emb
        FROM embeddings WHERE label = 1
    ),
    btp AS MATERIALIZED (
        SELECT src_id, tgt_id,
               CAST(ROUND(CAST(list_cosine_similarity(s_emb, t_emb)
                               AS DOUBLE) * 10000) AS BIGINT) AS c4
        FROM btsrc CROSS JOIN bttgt
    ),
    btf AS (
        SELECT src_id, CAST(SUM(c4) AS BIGINT) AS dx,
               CAST(COUNT(*) AS BIGINT) AS nx
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY src_id ORDER BY c4 DESC, tgt_id) AS rn
              FROM btp)
        WHERE rn <= {BITEXT_K} GROUP BY src_id
    ),
    btb AS (
        SELECT tgt_id, CAST(SUM(c4) AS BIGINT) AS dy,
               CAST(COUNT(*) AS BIGINT) AS ny
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY tgt_id ORDER BY c4 DESC, src_id) AS rn
              FROM btp)
        WHERE rn <= {BITEXT_K} GROUP BY tgt_id
    ),
    btm AS MATERIALIZED (
        SELECT p.src_id, p.tgt_id, p.c4,
               ROUND(CAST(p.c4 AS DOUBLE)
                     / ((CAST(f.dx AS DOUBLE) / f.nx
                         + CAST(b.dy AS DOUBLE) / b.ny) / 2.0), 6)
                   + 0.0 AS marg
        FROM btp p JOIN btf f USING (src_id) JOIN btb b USING (tgt_id)
        WHERE f.dx * b.ny + b.dy * f.nx > 0
    )
    SELECT m.src_id, m.tgt_id AS best_tgt, m.c4 AS cos_e4,
           m.marg AS margin, a.n_scored, a.n_above
    FROM (SELECT *, row_number() OVER (
              PARTITION BY src_id ORDER BY marg DESC, tgt_id) AS rn
          FROM btm) m
    JOIN (SELECT src_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
                 CAST(SUM(CASE WHEN marg >= {BITEXT_MARGIN_THR}
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_above
          FROM btm GROUP BY src_id) a USING (src_id)
    WHERE m.rn = 1
    ORDER BY m.src_id
    """


@register("sim_bitext_margin_mine", oracle=_bitext_oracle())
def sim_bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019) — the
    parallel-corpus miner behind CCMatrix/LASER-style pipelines: for
    each source-side probe x, candidates y are scored by
    margin(x, y) = cos(x, y) / ((mean_k cos(x, NN_k(x)) +
    mean_k cos(y, NN_k(y))) / 2) and the argmax above a threshold is
    the mined pair; the denominator normalizes away HUBS (targets
    near everything) that raw cosine would mine repeatedly.

    Cross-engine determinism: cosines land on the e4 integer grid
    (ROUND(cos·10⁴) — the 4dp-before-ranking house rule), both k-NN
    selections rank (c4 DESC, id) on integers, the neighborhood sums
    stay BIGINT, and the one float division runs on exact-integer
    inputs in an identical expression shape — then the margin is
    ROUNDed to 6dp (+0.0 normalizes -0.0, G13) before the argmax
    ranking with id tie-break. The positivity guard on the denominator
    is the INTEGER cross-product dx·ny + dy·nx > 0 (no float compare,
    no truncate-vs-floor risk).

    Plan shape at 100 TB: the 16-probe panel broadcasts; scoring is
    one map pass over the target side (|panel|·N pairs, no corpus
    shuffle); the forward k-NN is a window over per-probe frames; the
    backward k-NN is a window partitioned by target over the SAME
    pair frame (each target holds ≤ |panel| rows — bounded state);
    margins and the final argmax reuse that frame. Production-scale
    both-sides-full mining routes each side through the IVF cell
    probe first (sim_batch_knn_ivf) and runs THIS margin math on the
    candidate pairs only."""
    # r13: norms hoisted out of the |panel|·N scoring pass (3 HOF
    # folds per pair → 1; s_nrm·t_nrm preserves cosine_expr's multiply
    # order → bit-identical c4).
    #
    # r13 session 4 (guide §7.3): the whole body parses from SQL text —
    # the Column form was ~1600 py4j round-trips (~0.4 s socket-bound
    # construction per call on this box). Identical expression trees:
    # CAST(k AS DOUBLE) literals where Column code used F.lit floats
    # (bare SQL decimals would parse as DECIMAL), CASE WHEN without
    # ELSE ≡ F.when without otherwise, and the window ORDER BY default
    # null ordering matches Column .desc()/.asc().
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "*", f"{norm_sql('embedding')} AS nrm"
    )
    src = (
        emb.filter("label = 0")
        .orderBy("vec_id")
        .limit(BITEXT_PANEL)
        .selectExpr(
            "vec_id AS src_id", "embedding AS s_emb", "nrm AS s_nrm"
        )
    )
    tgt = emb.filter("label = 1").selectExpr(
        "vec_id AS tgt_id", "embedding AS t_emb", "nrm AS t_nrm"
    )
    # r13 restructure (guide §2.4): the old graph referenced the
    # cosine-scoring `pairs` frame from FOUR subtrees (fwd agg, bwd
    # agg, the margin join probe, and the margin frame again for best
    # + stats), so the |panel|·N scoring pass recomputed up to 4×.
    # Both k-NN neighborhoods, the margin, the per-src argmax AND the
    # per-src counts are now ANALYTIC columns over one lineage: one
    # cosine pass, one shuffle by tgt_id (backward k-NN), one shuffle
    # by src_id (forward k-NN — 16-partition frames, shared by the
    # final rank/stat windows). Every value is computed by the same
    # expression as before; output verified row-identical.
    pairs = tgt.crossJoin(F.broadcast(src)).selectExpr(
        "src_id",
        "tgt_id",
        f"CAST(round({dot_sql('s_emb', 't_emb')}"
        " / (s_nrm * t_nrm) * 10000, 0) AS BIGINT) AS c4",
    )
    p_b = pairs.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY tgt_id"
        " ORDER BY c4 DESC, src_id) AS rn_b",
    ).selectExpr(
        "*",
        f"CAST(sum(CASE WHEN rn_b <= {BITEXT_K} THEN c4 END)"
        " OVER (PARTITION BY tgt_id) AS BIGINT) AS dy",
        f"CAST(sum(CASE WHEN rn_b <= {BITEXT_K} THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY tgt_id) AS BIGINT) AS ny",
    )
    p_f = p_b.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY src_id"
        " ORDER BY c4 DESC, tgt_id) AS rn_f",
    ).selectExpr(
        "*",
        f"CAST(sum(CASE WHEN rn_f <= {BITEXT_K} THEN c4 END)"
        " OVER (PARTITION BY src_id) AS BIGINT) AS dx",
        f"CAST(sum(CASE WHEN rn_f <= {BITEXT_K} THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY src_id) AS BIGINT) AS nx",
    )
    margins = p_f.filter("dx * ny + dy * nx > 0").selectExpr(
        "src_id",
        "tgt_id",
        "c4",
        "round(CAST(c4 AS DOUBLE)"
        " / ((CAST(dx AS DOUBLE) / nx + CAST(dy AS DOUBLE) / ny)"
        " / CAST(2 AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS marg",
    )
    return (
        margins.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY src_id"
            " ORDER BY marg DESC, tgt_id) AS rn",
            "CAST(count(*) OVER (PARTITION BY src_id) AS BIGINT)"
            " AS n_scored",
            f"CAST(sum(CASE WHEN marg >= CAST({BITEXT_MARGIN_THR} AS"
            " DOUBLE) THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY src_id) AS BIGINT) AS n_above",
        )
        .filter("rn = 1")
        .selectExpr(
            "src_id",
            "tgt_id AS best_tgt",
            "c4 AS cos_e4",
            "marg AS margin",
            "n_scored",
            "n_above",
        )
        .orderBy("src_id")
    )


# ------------------------------------------------- graph ANN (NSW)
# The missing index type after LSH / IVF / PQ / IVF-PQ: a navigable
# graph (Malkov & Yashunin's NSW/HNSW family, arXiv:1603.09320).
NSW_M = 4  # out-degree of the within-cell k-NN graph
NSW_BEAM = 6  # beam width per search round (> NSW_TOPK: self rides)
NSW_ROUNDS = 3  # fixed expansion depth (unrolled — convertible plan)
NSW_TOPK = 5  # neighbors reported per query


def _nsw_cte_chain() -> str:
    """_IVF_ORACLE_ASSIGN + the NSW graph/serve CTEs through ``fin``
    (q_id, vec_id, sim, rnk over the final beam minus self). Shared
    by the serving op's oracle and the recall-eval oracle, so both
    replay the IDENTICAL index build and beam trajectory."""
    ids = tuple(_KNN_BATCH_IDS)
    cos = (
        "ROUND(CAST(list_cosine_similarity({a}, {b}) AS DOUBLE), 4)"
    )
    rounds = ""
    prev = "nb0"
    for r in range(1, NSW_ROUNDS + 1):
        rounds += f"""
    nc{r} AS (
        SELECT DISTINCT q_id, vec_id FROM (
            SELECT q_id, vec_id FROM {prev}
            UNION ALL
            SELECT b.q_id, e.dst AS vec_id
            FROM {prev} b JOIN nedges e ON b.vec_id = e.src
        )
    ),
    ns{r} AS MATERIALIZED (
        SELECT c.q_id, c.vec_id,
               {cos.format(a="q.q_emb", b="v.embedding")} AS sim
        FROM nc{r} c
        JOIN assigned v ON c.vec_id = v.vec_id
        JOIN nq q ON c.q_id = q.q_id
    ),
    nb{r} AS MATERIALIZED (
        SELECT q_id, vec_id, sim
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id
                  ORDER BY sim DESC, vec_id) AS rn
              FROM ns{r})
        WHERE rn <= {NSW_BEAM}
    ),"""
        prev = f"nb{r}"
    return (
        _IVF_ORACLE_ASSIGN
        + f"""
    , npair AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {cos.format(a="a.embedding", b="b.embedding")} AS sim
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    nedges AS MATERIALIZED (
        SELECT src, dst
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY src ORDER BY sim DESC, dst) AS rn
              FROM npair)
        WHERE rn <= {NSW_M}
    ),
    nentry AS (
        SELECT cell, MIN(vec_id) AS entry_id
        FROM assigned GROUP BY cell
    ),
    nq AS MATERIALIZED (
        SELECT vec_id AS q_id, embedding AS q_emb, cell AS q_cell
        FROM assigned WHERE vec_id IN {ids}
    ),
    nb0 AS (
        SELECT q.q_id, e.entry_id AS vec_id
        FROM nq q JOIN nentry e ON q.q_cell = e.cell
    ),{rounds}
    fin AS (
        SELECT q_id, vec_id, sim,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY sim DESC, vec_id) AS rnk
        FROM nb{NSW_ROUNDS} WHERE vec_id <> q_id
    )
    """
    )


def _nsw_oracle() -> str:
    return (
        _nsw_cte_chain()
        + f"""
    SELECT q_id AS query_id, vec_id, sim AS cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM fin WHERE rnk <= {NSW_TOPK}
    ORDER BY query_id, rnk
    """
    )


_NSW_EDGES_CACHE: dict[tuple, DataFrame] = {}


def _nsw_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NSW build + beam serve, returning the oracle's ``fin``
    frame: (q_id, vec_id, sim, rnk) — the final beam per panel query,
    self excluded, ranked (sim DESC, vec_id). Shared by the serving
    op and the recall eval."""
    # r13: norms hoisted out of the within-cell k-NN graph build — the
    # quadratic-within-cell pair frame is the hottest cosine site in
    # the NSW family (3 HOF folds per pair → 1, same op order →
    # bit-identical sims, so the graph edges are unchanged).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(emb, cents)
    a = assigned.select(
        "cell", F.col("vec_id").alias("src"),
        F.col("embedding").alias("v_src"),
        F.col("nrm").alias("n_src"),
    )
    b = assigned.select(
        "cell", F.col("vec_id").alias("dst"),
        F.col("embedding").alias("v_dst"),
        F.col("nrm").alias("n_dst"),
    )
    # r13: the checkpointed edge list is cached PER CORPUS like the
    # IVF centroids / PQ codebooks it is built from (the ingest
    # artifact: built once, served many times) — previously every call
    # re-ran the within-cell quadratic build job (~4 s at sf0.1), so
    # sim_ann_nsw_recall_eval rebuilt the graph sim_ann_nsw_beam had
    # just built. Keyed by (applicationId, corpus) because the
    # localCheckpoint blocks live in THIS session's executors.
    ck = (spark.sparkContext.applicationId, _corpus_key(sf_dir))
    # r14 (ADVICE r13): evict entries from other applicationIds — a
    # stopped/replaced session's localCheckpoint blocks are gone, so
    # those DataFrames can never be served again; without eviction the
    # cache grows without bound across session restarts in one process
    # and pins dead JVM references.
    for stale in [k for k in _NSW_EDGES_CACHE if k[0] != ck[0]]:
        del _NSW_EDGES_CACHE[stale]
    edges = _NSW_EDGES_CACHE.get(ck)
    if edges is None:
        w_src = Window.partitionBy("src").orderBy(
            F.col("sim").desc(), F.col("dst")
        )
        edges = (
            a.join(b, "cell")
            .filter(F.col("src") != F.col("dst"))
            .select(
                "src",
                "dst",
                F.round(
                    dot_expr(F.col("v_src"), F.col("v_dst"))
                    / (F.col("n_src") * F.col("n_dst")),
                    4,
                ).alias("sim"),
            )
            .withColumn("rn", F.row_number().over(w_src))
            .filter(F.col("rn") <= NSW_M)
            .select("src", "dst")
            # the serve rounds below reference it NSW_ROUNDS times and
            # must not replay the within-cell build (the
            # pretraining-e2e stage-boundary pattern)
            .localCheckpoint(eager=True)
        )
        _NSW_EDGES_CACHE[ck] = edges
    entry = assigned.groupBy("cell").agg(
        F.min("vec_id").alias("entry_id")
    )
    qp = assigned.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    beam = qp.join(
        entry, F.col("q_cell") == F.col("cell")
    ).select("q_id", F.col("entry_id").alias("vec_id"))
    emb_v = assigned.select("vec_id", "embedding", "nrm")
    q_emb = qp.select("q_id", "q_emb", "q_nrm")
    w_q = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    for _ in range(NSW_ROUNDS):
        expand = (
            beam.join(edges, beam["vec_id"] == edges["src"])
            .select("q_id", F.col("dst").alias("vec_id"))
        )
        cand = beam.select("q_id", "vec_id").union(expand).distinct()
        scored = (
            cand.join(emb_v, "vec_id")
            .join(F.broadcast(q_emb), "q_id")
            .select(
                "q_id",
                "vec_id",
                F.round(
                    dot_expr(F.col("q_emb"), F.col("embedding"))
                    / (F.col("q_nrm") * F.col("nrm")),
                    4,
                ).alias("sim"),
            )
        )
        beam = (
            scored.withColumn("rn", F.row_number().over(w_q))
            .filter(F.col("rn") <= NSW_BEAM)
            .select("q_id", "vec_id", "sim")
        )
    return beam.filter(F.col("vec_id") != F.col("q_id")).withColumn(
        "rnk", F.row_number().over(w_q)
    )


@register("sim_ann_nsw_beam", oracle=_nsw_oracle())
def sim_ann_nsw_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN — the navigable-small-world index (Malkov &
    Yashunin, arXiv:1603.09320) that completes the family after LSH /
    IVF / PQ / IVF-PQ: INGEST builds a bounded k-NN graph (within each
    trained IVF cell, every vector keeps its NSW_M most-cosine-similar
    neighbors — the sharded graph build every DiskANN/HNSW pipeline
    runs: quadratic only WITHIN a cell, exactly
    dedup_semantic_cluster's within-cluster justification, and the
    cells come from the SAME cached trained coarse quantizer as the
    IVF family); SERVE routes a query to its cell's fixed entry node
    (lowest vec_id — HNSW's fixed entry point) and runs NSW_ROUNDS
    unrolled beam-search rounds: expand the beam over the graph edges,
    union the previous beam, dedup, score (rounded-4dp cosine, the
    family's pinned metric), keep the NSW_BEAM best per query
    (sim DESC, vec_id — G5 ties). The query's own vector legitimately
    joins the beam (cos=1 navigation anchor) and is excluded only from
    the final report, so NSW_BEAM > NSW_TOPK keeps the report full.

    Plan shape at 100 TB: the graph is built ONCE at ingest (cell
    equi-join, never corpus×corpus; edge list is N·M compact int
    pairs, eagerly checkpointed so the three serve rounds never replay
    the build); each serve round touches |panel|·(BEAM·(M+1)) rows —
    candidate frames are PANEL-bounded, the corpus appears only
    through vec_id equi-joins against the fixed-size candidate set,
    and the 16-row query panel broadcasts. Beam depth/width are the
    recall knobs exactly as nprobe is for IVF. Oracle replays the
    identical Lloyd training + assignment (shared _IVF_ORACLE_ASSIGN)
    and the unrolled rounds CTE-for-CTE."""
    return (
        _nsw_serve(spark, sf_dir)
        .filter(F.col("rnk") <= NSW_TOPK)
        .select(
            F.col("q_id").alias("query_id"),
            "vec_id",
            F.col("sim").alias("cos_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )


@register(
    "sim_ann_nsw_recall_eval",
    oracle=_nsw_cte_chain()
    + f"""
    , nexact AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, b.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY ROUND(CAST(list_cosine_similarity(
                           q.q_emb, b.embedding) AS DOUBLE), 4) DESC,
                           b.vec_id) AS rn
            FROM nq q JOIN embeddings b ON b.vec_id <> q.q_id
        ) WHERE rn <= {NSW_TOPK}
    ),
    nswk AS (
        SELECT q_id, vec_id FROM fin WHERE rnk <= {NSW_TOPK}
    )
    SELECT e.q_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN n.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_nsw
    FROM nexact e
    LEFT JOIN nswk n ON n.q_id = e.q_id AND n.vec_id = e.vec_id
    GROUP BY e.q_id
    ORDER BY e.q_id
    """,
)
def sim_ann_nsw_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@{NSW_TOPK} of the NSW graph index vs exact brute force —
    the pre-ship eval the graph index needs exactly as
    sim_ann_recall_eval is for IVF: for each panel query, how many of
    the exact top-k (rounded-4dp cosine, vec_id ties — the family's
    bit-deterministic ranking) did the beam search reach? The hit
    count is what a team reads to size NSW_M / NSW_BEAM / NSW_ROUNDS,
    and on the isotropic fixtures it also documents the same data
    ceiling the IVF eval exposes (greedy graph routing cannot beat
    the data's own cluster structure).

    Scale shape: the NSW side is the serving op's panel-bounded beam
    (shared _nsw_serve — same checkpointed ingest graph, same
    trajectory the oracle replays CTE-for-CTE); the exact side is the
    sim_batch_knn_join one-pass broadcast-panel scan (sampled-slice
    discipline at 100 TB, per sim_ann_recall_eval); hit counting is a
    panel·k-sized left join.

    Measured recall@5 on the panel (fixtures): 13/80 (sf0.001),
    14/80 (sf0.01), 7/80 (sf0.1). Two documented ceilings compound
    here: the single-cell routing caps recall at the IVF single-probe
    ceiling (the fixture embeddings are isotropic — true neighbors
    spread across cells; see sim_ann_recall_eval), and within the
    cell a 3-round/beam-6/M-4 walk explores ≤ ~100 of the cell's
    nodes. Both are the knobs this report exists to size: on
    clustered production embeddings raise NSW_M first (graph
    navigability), then NSW_BEAM/NSW_ROUNDS (walk budget), and route
    multiple cells exactly as IVF multiprobe does."""
    # r13: norms hoisted out of the corpus×panel exact pass (3
    # interpreted HOF folds per pair → 1; q_nrm·nrm preserves
    # cosine_expr's multiply order → bit-identical).
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    qp = emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    exact = (
        emb.select("vec_id", "embedding", "nrm")
        .join(F.broadcast(qp), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot_expr(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                4,
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= NSW_TOPK)
        .select("q_id", "vec_id")
    )
    nswk = (
        _nsw_serve(spark, sf_dir)
        .filter(F.col("rnk") <= NSW_TOPK)
        .select("q_id", F.col("vec_id").alias("n_vec"))
    )
    return (
        exact.join(
            nswk,
            (exact["q_id"] == nswk["q_id"])
            & (exact["vec_id"] == nswk["n_vec"]),
            "left",
        )
        .select(exact["q_id"].alias("q_id"), "vec_id", "n_vec")
        .groupBy("q_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(
                F.when(F.col("n_vec").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("hits_nsw"),
        )
        .orderBy("q_id")
    )


THRESH_SWEEP = tuple(range(100, 1000, 100))  # 9 operating points (milli)


@register(
    "ml_confusion_threshold_sweep",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               ((ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                 - 1) * 1000)
                   // COUNT(*) OVER () AS p_milli
        FROM orders
    ),
    th AS (SELECT unnest([{", ".join(str(t) for t in THRESH_SWEEP)}]) AS t),
    cells AS (
        SELECT th.t,
               CAST(SUM(CASE WHEN p_milli >= th.t AND y = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN p_milli >= th.t AND y = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN p_milli < th.t AND y = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN p_milli < th.t AND y = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM scored CROSS JOIN th
        GROUP BY th.t
    )
    SELECT CAST(t AS BIGINT) AS threshold_milli, tp, fp, fn, tn,
           CAST(COALESCE(tp * 1000 // NULLIF(tp + fp, 0), -1) AS BIGINT)
               AS precision_pm,
           CAST(COALESCE(tp * 1000 // NULLIF(tp + fn, 0), -1) AS BIGINT)
               AS recall_pm,
           CAST(COALESCE(2000 * tp // NULLIF(2 * tp + fp + fn, 0), -1)
                AS BIGINT) AS f1_pm
    FROM cells
    ORDER BY threshold_milli
    """,
)
def ml_confusion_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep — the table a model-rollout review reads
    next to ml_roc_auc's scalar: the full confusion matrix plus
    precision/recall/F1 at nine decision thresholds over the same
    deterministic rank-fraction score and fulfilled-status label as
    ml_calibration_bins. Every metric is EXACT integer permille — F1
    uses the identity F1 = 2tp/(2tp+fp+fn), so no float ever enters
    (numerators ≤ 2000·N fit int64 to N≈4.6e15 rows); empty
    denominators report the -1 sentinel (G13: no nullable numerics).

    Plan: one scan → two-pass bucket-offset global rank
    (_rank_fraction_scored / scalable.py — no single-task window at
    any corpus size; same integers as the oracle's plain ROW_NUMBER)
    → the 9-row threshold spine cross-joins BEFORE the
    aggregate so all 9 operating points fold in ONE partial-agg pass
    (9× agg columns, no second scan, no shuffle growth with the sweep
    width).

    Reference parity: no reference counterpart (main.go has no ML
    surface); completes the eval trio of SURVEY §2's ml_* family."""
    orders = load(spark, sf_dir, "orders")
    scored = _rank_fraction_scored(orders)
    th = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in THRESH_SWEEP])).alias("t")
    )
    cells = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(
                ((F.col("p_milli") >= F.col("t")) & (F.col("y") == 1)).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                ((F.col("p_milli") >= F.col("t")) & (F.col("y") == 0)).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                ((F.col("p_milli") < F.col("t")) & (F.col("y") == 1)).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("fn"),
            F.sum(
                ((F.col("p_milli") < F.col("t")) & (F.col("y") == 0)).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("tn"),
        )
    )
    return cells.select(
        F.col("t").cast("bigint").alias("threshold_milli"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.coalesce(
            F.expr("tp * 1000 DIV nullif(tp + fp, 0)"), F.lit(-1)
        )
        .cast("bigint")
        .alias("precision_pm"),
        F.coalesce(
            F.expr("tp * 1000 DIV nullif(tp + fn, 0)"), F.lit(-1)
        )
        .cast("bigint")
        .alias("recall_pm"),
        F.coalesce(
            F.expr("2000 * tp DIV nullif(2 * tp + fp + fn, 0)"), F.lit(-1)
        )
        .cast("bigint")
        .alias("f1_pm"),
    ).orderBy("threshold_milli")


NDCG_K = 10
# Integer milli-discounts round(1000/log2(i+1)) for ranks 1..K, and
# their prefix sums (ideal DCG for m relevant docs = _NDCG_PREFIX[m]).
# Computed ONCE in Python and embedded as identical literals in both
# engines, so no libm log2 ever runs inside a query (G11).
_NDCG_DISC = (1000, 631, 500, 431, 387, 356, 333, 315, 301, 289)
_NDCG_PREFIX = (0, 1000, 1631, 2131, 2562, 2949, 3305, 3638, 3953, 4254, 4543)


def _ndcg_oracle() -> str:
    ids = tuple(_KNN_BATCH_IDS)
    disc = ", ".join(str(d) for d in _NDCG_DISC)
    pre = ", ".join(str(p) for p in _NDCG_PREFIX)
    return f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
        FROM embeddings WHERE vec_id IN {ids}
    ),
    relcnt AS (
        SELECT q.q_id,
               CAST(COUNT(*) AS BIGINT) AS n_corpus_rel
        FROM q JOIN embeddings b
          ON b.label = q.q_label AND b.vec_id <> q.q_id
        GROUP BY q.q_id
    ),
    scored AS (
        SELECT q.q_id, q.q_label, b.vec_id, b.label,
               ROUND(CAST(list_cosine_similarity(b.embedding, q.q_emb)
                          AS DOUBLE), 4) AS sim
        FROM q JOIN embeddings b ON b.vec_id <> q.q_id
    ),
    topk AS (
        SELECT q_id, q_label, label,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        FROM scored
        QUALIFY rnk <= {NDCG_K}
    ),
    dcg AS (
        SELECT q_id,
               CAST(SUM(CASE WHEN label = q_label
                             THEN [{disc}][rnk] ELSE 0 END) AS BIGINT)
                   AS dcg_milli,
               CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rel_topk
        FROM topk GROUP BY q_id
    )
    SELECT d.q_id AS query_id,
           CAST(COALESCE(r.n_corpus_rel, 0) AS BIGINT) AS n_corpus_rel,
           d.n_rel_topk,
           d.dcg_milli,
           CAST([{pre}][CAST(LEAST(COALESCE(r.n_corpus_rel, 0), {NDCG_K})
                             AS INTEGER) + 1]
                AS BIGINT) AS idcg_milli,
           ROUND(CASE WHEN COALESCE(r.n_corpus_rel, 0) = 0 THEN -1.0
                 ELSE CAST(d.dcg_milli AS DOUBLE)
                      / [{pre}][CAST(LEAST(r.n_corpus_rel, {NDCG_K})
                                     AS INTEGER) + 1]
                 END, 6) + 0.0 AS ndcg
    FROM dcg d LEFT JOIN relcnt r ON d.q_id = r.q_id
    ORDER BY query_id
    """


@register("ml_ndcg_at_k", oracle=_ndcg_oracle())
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 retrieval eval — the graded-ranking metric the recall
    evals (sim_ann_recall_eval et al.) don't capture: recall@k treats
    every hit equally, NDCG discounts by rank position, so a system
    that buries its relevant hits at rank 9-10 scores visibly worse.
    Relevance is binary label agreement (the sim_label_avg contract);
    the discount table round(1000/log2(i+1)) and its prefix sums are
    Python-computed INTEGER literals embedded identically in both
    engines, so DCG and ideal DCG are exact bigint milli-units and the
    single float step is the final ratio, ROUND(·,6)+0.0 (O(1), G13).
    Queries with no same-label mate report the -1 sentinel.

    Plan: the 16-query panel broadcasts; scoring is ONE map pass over
    the corpus (|panel|·N pairs, no corpus shuffle); top-k is a
    fixed-state window per query; the corpus relevance counts are a
    |panel|-row broadcast re-join. At 100 TB nothing but the O(N)
    scoring pass scales with the corpus.

    Reference parity: no reference counterpart (main.go has no vector
    surface); completes the retrieval-eval set next to the recall@k
    and MRR-style ops."""
    emb = load(spark, sf_dir, "embeddings")
    # r13 (guide §2.3/§1.2): hoist the float→double array cast and the
    # corpus-side norm OUT of the per-(query, doc) pair loop — the old
    # form re-cast and re-normed every corpus vector once per panel
    # query (16×). Same dot/(nrm_a·nrm_b) factors in the same order,
    # so the IEEE result is bit-identical.
    #
    # r13 session 4 (guide §7.3): expressions parse from SQL text —
    # the Column form was ~1400 py4j round-trips (~0.3 s socket-bound
    # construction per call). Same expression trees, CAST literals
    # where Column code used F.lit floats.
    ids = ", ".join(str(i) for i in _KNN_BATCH_IDS)
    embd = emb.selectExpr(
        "vec_id",
        "label",
        "CAST(embedding AS array<double>) AS emb_d",
    ).selectExpr("*", f"{norm_sql('emb_d')} AS nrm")
    q = embd.filter(f"vec_id IN ({ids})").selectExpr(
        "vec_id AS q_id",
        "emb_d AS q_emb",
        "label AS q_label",
        "nrm AS q_nrm",
    )
    # r13 (guide §2.4): the corpus relevance count is a per-LABEL count
    # minus the query itself — a tiny label aggregate broadcast onto
    # the panel — not a panel⋈corpus equality join (which re-scanned
    # embeddings). Queries whose label is unique drop out (count 0),
    # exactly like the old inner join, so the -1 sentinel path via the
    # left join below is unchanged.
    label_cnt = emb.groupBy("label").agg(F.expr("count(*) AS n_label"))
    relcnt = (
        q.join(F.broadcast(label_cnt), q["q_label"] == label_cnt["label"])
        .selectExpr("q_id", "CAST(n_label - 1 AS BIGINT) AS n_corpus_rel")
        .filter("n_corpus_rel > 0")
    )
    scored = (
        embd.crossJoin(F.broadcast(q))
        .filter("vec_id != q_id")
        .selectExpr(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            f"round({dot_sql('emb_d', 'q_emb')}"
            " / (nrm * q_nrm), 4) AS sim",
        )
    )
    topk = scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY q_id"
        " ORDER BY sim DESC, vec_id) AS rnk",
    ).filter(f"rnk <= {NDCG_K}")
    disc = ", ".join(str(d) for d in _NDCG_DISC)
    dcg = topk.groupBy("q_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN label = q_label"
            f" THEN element_at(array({disc}), rnk)"
            " ELSE 0 END) AS BIGINT) AS dcg_milli"
        ),
        F.expr(
            "CAST(sum(CAST(label = q_label AS INT)) AS BIGINT)"
            " AS n_rel_topk"
        ),
    )
    pre = ", ".join(str(p) for p in _NDCG_PREFIX)
    # LEFT join from the panel-complete dcg frame (ADVICE r12): a
    # panel query whose label is unique in the corpus has no relcnt
    # row; the inner join silently shrank the 16-row panel contract
    # instead of firing the documented -1 sentinel. n_corpus_rel
    # coalesces to 0 so the sentinel branch is reachable.
    rel = "CAST(coalesce(n_corpus_rel, 0) AS BIGINT)"
    idcg = (
        f"element_at(array({pre}),"
        f" CAST(least({rel}, {NDCG_K}) + 1 AS INT))"
    )
    return (
        dcg.join(F.broadcast(relcnt), "q_id", "left")
        .selectExpr(
            "q_id AS query_id",
            f"{rel} AS n_corpus_rel",
            "n_rel_topk",
            "dcg_milli",
            f"CAST({idcg} AS BIGINT) AS idcg_milli",
            f"round(CASE WHEN {rel} = 0 THEN CAST(-1.0 AS DOUBLE)"
            f" ELSE CAST(dcg_milli AS DOUBLE) / {idcg} END, 6)"
            " + CAST(0 AS DOUBLE) AS ndcg",
        )
        .orderBy("query_id")
    )


@register(
    "ml_brier_decomposition",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               ((ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                 - 1) * 1000)
                   // COUNT(*) OVER () AS p_milli
        FROM orders
    ),
    bins AS (
        SELECT p_milli // 100 AS bin,
               CAST(COUNT(*) AS BIGINT) AS nk,
               CAST(SUM(p_milli) AS BIGINT) AS sp,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM((p_milli - 1000 * y) * (p_milli - 1000 * y))
                    AS BIGINT) AS sq
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(nk) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS sy_tot,
               CAST(SUM(sq) AS BIGINT) AS sq_tot,
               CAST(SUM((sp - 1000 * sy) * (sp - 1000 * sy) // nk)
                    AS BIGINT) AS rel_num,
               CAST(SUM(
                        (CAST((SELECT SUM(nk) FROM bins) AS HUGEINT) * sy
                         - CAST(nk AS HUGEINT)
                           * (SELECT SUM(sy) FROM bins))
                        * (CAST((SELECT SUM(nk) FROM bins) AS HUGEINT) * sy
                           - CAST(nk AS HUGEINT)
                             * (SELECT SUM(sy) FROM bins)) // nk)
                    AS BIGINT) AS res_num
        FROM bins
    )
    SELECT n,
           ROUND(CAST(sq_tot AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
               + 0.0 AS brier,
           ROUND(CAST(rel_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
               + 0.0 AS reliability,
           ROUND(CAST(res_num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n AS DOUBLE)), 6) + 0.0 AS resolution,
           ROUND(CAST(sy_tot AS DOUBLE) * (n - sy_tot)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) + 0.0
               AS uncertainty
    FROM tot
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score —
    Brier = RELIABILITY − RESOLUTION + UNCERTAINTY — the diagnosis
    behind ml_calibration_bins' reliability curve: is a bad Brier bad
    CALIBRATION (predictions off the observed rates — fixable by
    recalibration) or poor RESOLUTION (the model doesn't separate
    outcomes at all — not fixable without a better model)? Same
    deterministic rank-fraction score and fulfilled label, same decile
    bins.

    Integer-ladder exactness: per-bin sufficient statistics (n_k, Σp,
    Σy, Σ(p−1000y)²) are exact bigints; the reliability numerator
    Σ (Σp_k − 1000Σy_k)² DIV n_k and resolution numerator
    Σ (nΣy_k − n_kΣy)² DIV n_k quantize each bin's square by a
    truncating division (error < 1 milli²-unit per bin, 10 bins —
    invisible at the 6dp output) and accumulate as exact integers (the
    resolution term n·Σy_k − n_k·Σy and its square run entirely in
    DECIMAL(38,0)/HUGEINT — operands promoted BEFORE the multiply, so
    no int64 stage exists to wrap; n·Σy_k reaches ~2e9 at sf0.1 and
    the DECIMAL envelope holds to n·Σy_k ≈ 1e19); each
    reported component is ONE rounded float ratio of exact integers
    (G13). The decomposition identity is pinned in pytest to the
    quantization tolerance.

    Plan: one scan → two-pass bucket-offset global rank
    (_rank_fraction_scored / scalable.py — no single-task window at
    any corpus size) → 10-bin partial agg → 1-row recombination.
    Nothing after the bin agg scales with rows.

    Reference parity: no reference counterpart; completes the
    calibration/eval family (SURVEY §2 ml_*)."""
    orders = load(spark, sf_dir, "orders")
    scored = _rank_fraction_scored(orders)
    bins = scored.groupBy(
        (F.col("p_milli") / 100).cast("bigint").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("nk"),
        F.sum("p_milli").cast("bigint").alias("sp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            (F.col("p_milli") - 1000 * F.col("y"))
            * (F.col("p_milli") - 1000 * F.col("y"))
        )
        .cast("bigint")
        .alias("sq"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withtot = bins.select(
        "*",
        F.sum("nk").over(w_all).alias("n"),
        F.sum("sy").over(w_all).alias("sy_tot"),
    )
    tot = withtot.groupBy().agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("sy_tot").cast("bigint").alias("sy_tot"),
        F.sum("sq").cast("bigint").alias("sq_tot"),
        F.sum(F.expr("(sp - 1000 * sy) * (sp - 1000 * sy) DIV nk"))
        .cast("bigint")
        .alias("rel_num"),
        # g = n·Σy_k − n_k·Σy and g² run ENTIRELY in DECIMAL(38,0) —
        # the operands are promoted BEFORE the multiply (ADVICE r12:
        # an int64 n*sy wraps silently under Spark non-ANSI once
        # n·Σy_k > 2^63 while the DuckDB oracle, which promotes to
        # HUGEINT, errors). Per-bin quantization is Spark DIV ==
        # DuckDB // (g² >= 0, so floor == trunc — a decimal
        # '/'-then-cast would HALF_UP-round where the oracle floors).
        F.sum(
            F.expr(
                "(CAST(n AS DECIMAL(38,0)) * sy"
                " - CAST(nk AS DECIMAL(38,0)) * sy_tot)"
                " * (CAST(n AS DECIMAL(38,0)) * sy"
                "    - CAST(nk AS DECIMAL(38,0)) * sy_tot)"
                " DIV nk"
            )
        )
        .cast("bigint")
        .alias("res_num"),
    )
    n_d = F.col("n").cast("double")
    return tot.select(
        "n",
        (
            F.round(F.col("sq_tot").cast("double") / (n_d * 1e6), 6)
            + F.lit(0.0)
        ).alias("brier"),
        (
            F.round(F.col("rel_num").cast("double") / (n_d * 1e6), 6)
            + F.lit(0.0)
        ).alias("reliability"),
        (
            F.round(
                F.col("res_num").cast("double") / (n_d * n_d * n_d), 6
            )
            + F.lit(0.0)
        ).alias("resolution"),
        (
            F.round(
                F.col("sy_tot").cast("double")
                * (F.col("n") - F.col("sy_tot"))
                / (n_d * n_d),
                6,
            )
            + F.lit(0.0)
        ).alias("uncertainty"),
    )
