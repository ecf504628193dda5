"""Deduplication operators (LLM training-data pipeline surface).

Five escalating strategies over ``documents`` / ``embeddings``:

  exact            — hash-groupBy on content (or an md5 fingerprint)
  dropDuplicates   — subset-key dedup
  n-gram Jaccard   — exact set-similarity pairs (quadratic verify)
  MinHash + LSH    — shingle→minhash→band→bucket-join: the sub-quadratic
                     scale path; candidates verified with exact Jaccard
  SimHash          — 64-bit signature, near-dup = small Hamming distance
  embedding cosine — near-dup pairs in vector space

Everything is built from built-in Spark expressions (xxhash64, explode,
groupBy) — no Python row path, no ml-lib dependency — so each stage is
a plain shuffle whose cost is measurable in .explain. At 100 TB only
LSH/SimHash bucket-joins survive; the quadratic verifies are confined
to within-bucket candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load, load_spread
from pg_archiver_spark.registry import register

# 3-token shingles; SQL-oracle-verified threshold sits in the clean gap
# of the fixture's pair-similarity distribution (planted near-dups are
# ≥0.9; the background is ≤0.1 — verified empirically at sf0.01).
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
# Exact rational form of the threshold (== JACCARD_THRESHOLD) for
# INTEGER threshold predicates: n/(u) >= p/q  ⟺  q·n >= p·u. Used in
# every WHERE/filter so the keep/drop decision is exact integer
# arithmetic on both engines at any magnitude (the double-cast form is
# engine-unstable in the last ulp once a count exceeds 2^53 — the r12
# unrounded-double sweep, SURVEY §9).
JACCARD_T_NUM, JACCARD_T_DEN = 1, 2
# SQL fragment over the _shingle_pairs_ctes pair columns:
JACCARD_PRED_SQL = (
    f"{JACCARD_T_DEN} * n_common >= "
    f"{JACCARD_T_NUM} * (n1 + n2 - n_common)"
)

# Hot-shingle doc-frequency cap for the shared-shingle pair joins. The
# equi-join on shingle is sub-quadratic only while per-shingle doc
# frequency is bounded: one stop-word shingle shared by 10⁶ docs alone
# yields 10¹² pairs. Shingles above this df carry ~no Jaccard signal
# (they are corpus boilerplate, present in "everything"), so dropping
# them before the join bounds worst-case fan-out at df²·|hot shingles|
# while leaving informative shingles untouched. The cap sits far above
# every fixture's max df (25 at sf0.1 — pinned in tests/test_dedup
# so the DuckDB oracle stays EXACT on fixtures), and at 100 TB it is
# the knob that keeps the join sub-quadratic.
MAX_SHINGLE_DF = 1000

# MinHash parameters: 12 bands × 2 rows = 24 hashes; P(candidate) at
# j=0.5 ≈ 1-(1-0.25)^12 ≈ 0.97, at j=0.1 ≈ 0.11 — good separation for
# the verify step to clean up.
MINHASH_HASHES = 24
LSH_BANDS = 12
LSH_ROWS = 2


def _shingles_sql(col: str = "text") -> str:
    """SQL text of the long-hashed shingle expression over the named
    column — see _shingles for semantics. Exposed separately so hot
    construction paths can embed it in a selectExpr string (guide
    §7.3: parsed text is ~1 py4j round-trip; the original Column
    assembly was ~60)."""
    toks = f"split({col}, ' ')"
    xx = ", ".join(
        f"element_at({toks}, i + {k})" if k else f"element_at({toks}, i)"
        for k in range(SHINGLE_K)
    )
    return (
        f"CASE WHEN size({toks}) < {SHINGLE_K}"
        f" THEN CAST(array() AS array<bigint>)"
        f" ELSE array_distinct(transform("
        f"sequence(1, size({toks}) - {SHINGLE_K - 1}),"
        f" i -> xxhash64({xx}))) END"
    )


def _shingles(text_col):
    """Distinct k-token shingles of a space-tokenized text column,
    HASHED to 64-bit longs (xxhash64 over the k token values).

    Hashing at construction — instead of materializing "tok tok tok"
    strings — keeps every downstream stage on fixed-width longs: the
    explode/equi-join shuffle carries 8-byte keys instead of text,
    array_distinct / array_intersect compare longs, and minhash skips a
    separate string-hash pass. This is also the at-scale shape: the
    shingle table an ingest pipeline persists stores hashes, not text.
    Set semantics survive w.h.p. (64-bit collisions are ~N²/2⁶⁵).

    Built with element_at rather than slice — O(1) element reads instead
    of a per-shingle sub-array allocation (~30% faster at sf0.1).

    Texts shorter than k tokens yield an empty shingle set (the naive
    sequence(1, n-k+1) would run DESCENDING for n < k and crash on
    out-of-bounds element_at).

    r13 (guide §7.3): parsed from SQL text — the _shingle_strs /
    minhash treatment. ~60 Column-object py4j round-trips per call
    collapse to one F.expr parse; the expression tree (and therefore
    every value) is unchanged. Accepts the column NAME; a plain Column
    (the original signature, still used by tests and several ops) is
    unwrapped via its SQL text."""
    if not isinstance(text_col, str):
        text_col = text_col._jc.toString()
    return F.expr(_shingles_sql(text_col))


@register(
    "dedup_exact",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_texts,
           COUNT(DISTINCT md5(text)) AS n_distinct_fingerprints
    FROM documents
    GROUP BY lang
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup profile. At 100 TB, dedup on md5(text) (a
    16-byte shuffle key) instead of the full text payload — the two
    distinct-counts agreeing is exactly the property that makes the
    fingerprint substitution safe."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias(
            "n_distinct_fingerprints"
        ),
    )


@register(
    "dedup_dropduplicates",
    oracle="""
    SELECT COUNT(*) AS n_rows
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def dedup_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-key dedup (dropDuplicates) — one hash shuffle on the key
    columns only."""
    events = load(spark, sf_dir, "events")
    return (
        events.dropDuplicates(["user_id", "event_type"])
        .agg(F.count("*").alias("n_rows"))
    )


def _shingle_pairs_ctes(
    pairs_name: str = "pairs", src: str = "documents"
) -> str:
    """The exact shared-shingle pair machinery as oracle CTE text —
    string shingles per doc (sh), the exploded posting list (e), and
    per-pair intersection counts (``pairs_name``) over source relation
    ``src(doc_id, text)``. ONE definition serves every near-dup oracle
    (ngram ground truth, minhash, the e2e dedup flows, the PR eval),
    so the ground-truth shape cannot drift between ops."""
    return f"""sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {SHINGLE_K - 1}),
                   i -> array_to_string(string_split(text,' ')[i+1:i+{SHINGLE_K}], ' ')
               )) AS shingles
        FROM {src}
    ),
    e AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
        FROM sh
    ),
    {pairs_name} AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               a.n_sh AS n1, b.n_sh AS n2, COUNT(*) AS n_common
        FROM e a JOIN e b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )"""


_EXACT_PAIRS_SELECT = f"""
    SELECT doc1, doc2,
           ROUND(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 3)
               AS jaccard
    FROM pairs
    WHERE {JACCARD_PRED_SQL}
    """


@register(
    "dedup_ngram_jaccard",
    # Round 8: the oracle now uses the SAME shared-shingle equi-join
    # shape as the Spark side (unnest → self-join on shingle → pair
    # counts) instead of the quadratic all-pairs list_intersect — the
    # math is identical (docs sharing no shingle can't reach a
    # positive threshold), and the sf0.1 oracle drops from minutes to
    # seconds, keeping the full-registry sf0.1 gate tractable.
    oracle=f"WITH {_shingle_pairs_ctes()}{_EXACT_PAIRS_SELECT}",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs — the ground truth the LSH
    variants approximate. Implemented as shingle-explode → hot-shingle
    df cap (MAX_SHINGLE_DF; a no-op on fixtures, the sub-quadratic
    guarantee at scale) → pair join on shared shingles → intersection
    counts (docs sharing no shingle never meet, unlike a naive cross
    join; the fully sub-quadratic 100 TB path is minhash_neardup
    below). The cap is applied as a broadcast ANTI-join against the
    hot-shingle set: the set is tiny by construction (≤ one shingle
    per MAX_SHINGLE_DF occurrences, so ≤ |occurrences|/1000 — always
    broadcastable), its aggregation gets map-side partial combine, and
    the exploded frame itself is never re-shuffled just to learn df
    (a df window would re-shuffle it in full). Measured cost of the
    guard at sf0.1: ~0.5 s (one extra agg stage + broadcast barrier,
    A/B'd 1.33 s→1.82 s) — fixed overhead that amortizes at scale,
    where the uncapped form instead risks a 10¹²-pair stage."""
    # Spread the CPU-heavy shingle construction across all cores (the
    # fixture is a single small parquet file → one scan task otherwise).
    docs = load_spread(spark, sf_dir, "documents")
    # The shingle frame feeds both join sides — cache it instead of
    # recomputing the (CPU-heavy) shingle construction per consumer. At
    # scale this is the materialized shingle table of a dedup stage.
    # r13 (guide §7.3): the whole body parses from SQL text — the op's
    # construction was ~770 py4j round-trips (~0.3 s/call, measured by
    # cProfile: the time is socket latency, and bench/driver runs
    # construct 6+ times per query) for identical expressions.
    sh = (
        docs.selectExpr("doc_id", f"{_shingles_sql('text')} AS shingles")
        .selectExpr("doc_id", "shingles", "size(shingles) AS n_sh")
        .cache()
    )
    ex = sh.selectExpr("doc_id", "n_sh", "explode(shingles) AS shingle")
    hot = (
        ex.groupBy("shingle")
        .agg(F.expr("count(*) AS df"))
        .filter(f"df > {MAX_SHINGLE_DF}")
        .select("shingle")
    )
    ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.selectExpr("doc_id AS doc1", "n_sh AS n1", "shingle")
    b = ex.selectExpr("doc_id AS doc2", "n_sh AS n2", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter("doc1 < doc2")
        .groupBy("doc1", "doc2", "n1", "n2")
        .agg(F.expr("count(*) AS n_common"))
    )
    return (
        inter.selectExpr(
            "*",
            "round(CAST(n_common AS DOUBLE)"
            " / (n1 + n2 - n_common), 3) AS jaccard",
        )
        .filter(
            f"n_common * {JACCARD_T_DEN}"
            f" >= (n1 + n2 - n_common) * {JACCARD_T_NUM}"
        )
        .select("doc1", "doc2", "jaccard")
    )


def _jaccard_pred():
    """Integer-exact Jaccard threshold predicate over the standard
    pair columns (n1, n2, n_common) — the Spark twin of
    JACCARD_PRED_SQL (r12 sweep: no double cast in keep/drop logic)."""
    return F.col("n_common") * JACCARD_T_DEN >= (
        F.col("n1") + F.col("n2") - F.col("n_common")
    ) * JACCARD_T_NUM


def _neardup_loser_ids(frame: DataFrame) -> DataFrame:
    """(doc_id): the docs that LOSE near-dup resolution within
    ``frame(doc_id, text)`` — any doc with a SMALLER-doc_id neighbor
    at exact shingle Jaccard >= JACCARD_THRESHOLD (the keep-lowest
    rule pipeline_training_prep uses; oracle mirror:
    _shingle_pairs_ctes(src=...) + the loser DISTINCT). Shared-shingle
    equi-join with the hot-shingle df cap (a no-op on fixtures, the
    sub-quadratic guarantee at scale — see dedup_ngram_jaccard);
    minhash banding is the drop-in 100 TB form of the pair stage."""
    sh = frame.select(
        "doc_id", _shingles(F.col("text")).alias("shingles")
    ).select("doc_id", "shingles", F.size("shingles").alias("n_sh"))
    ex = sh.select(
        "doc_id", "n_sh", F.explode("shingles").alias("shingle")
    )
    hot = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("shingle")
    )
    ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.select(
        F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"), "shingle"
    )
    b = ex.select(
        F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"), "shingle"
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2", "n1", "n2")
        .agg(F.count("*").alias("n_common"))
        .filter(_jaccard_pred())
        .select(F.col("doc2").alias("doc_id"))
        .distinct()
    )


def _shingle_strs(col: str = "text"):
    """Distinct k-token shingles as STRINGS — the md5-minhash sibling
    of _shingles (which hashes to longs): string shingles let both
    engines derive identical md5-based signatures. concat_ws(' ')
    matches the oracle's array_to_string(slice, ' ') byte-for-byte on
    the space-tokenized fixture text.

    r13 (guide §7.3): parsed from SQL text over the named input column
    instead of assembling ~60 Column objects (HOF lambda construction
    alone cost ~75 ms of py4j round-trips per call); the repeated
    split() subtrees match the original Column form, which also
    referenced the tokens expression per element (codegen CSE folds
    them at runtime either way). Accepts the column NAME; a plain
    Column (the pre-r13 signature, still used by tests) is unwrapped
    via its SQL text."""
    if not isinstance(col, str):
        col = col._jc.toString()
    toks = f"split({col}, ' ')"
    parts = ", ".join(
        f"element_at({toks}, i + {k})" if k else f"element_at({toks}, i)"
        for k in range(SHINGLE_K)
    )
    return F.expr(
        f"CASE WHEN size({toks}) < {SHINGLE_K}"
        f" THEN CAST(array() AS array<string>)"
        f" ELSE array_distinct(transform("
        f"sequence(1, size({toks}) - {SHINGLE_K - 1}),"
        f" i -> concat_ws(' ', {parts}))) END"
    )


# md5-derived minhash family: 6 salted md5 digests per shingle, each
# split into four 8-hex-char chunks → 24 32-bit minhashes (the classic
# width). MIN over lowercase-hex strings is the numeric 32-bit min in
# both engines, so signatures — and therefore LSH candidates — are
# engine-reproducible (the dedup_simhash md5 discipline).
MINHASH_SALTS = 6
MINHASH_CHUNKS = 4


def _minhash_min_exprs() -> list:
    # Parsed, not assembled (r13 guide §7.3): the 24 aliased MIN
    # aggregates were ~150 py4j round-trips per construction.
    return [
        F.expr(
            f"min(substring(d{s}, {1 + 8 * c}, 8))"
            f" AS mh{MINHASH_CHUNKS * s + c}"
        )
        for s in range(MINHASH_SALTS)
        for c in range(MINHASH_CHUNKS)
    ]


def _minhash_sig(ex):
    """(doc_id, shingle) → (doc_id, mh0..mh23) via salted md5 chunks."""
    hashed = ex.selectExpr(
        "doc_id",
        *[
            f"md5(concat('{s}|', shingle)) AS d{s}"
            for s in range(MINHASH_SALTS)
        ],
    )
    return hashed.groupBy("doc_id").agg(*_minhash_min_exprs())


def _minhash_bands(sig):
    """Signature frame → (doc_id, band, bucket) with 12 two-hash bands
    (bucket = concat of the two 8-hex minhashes — string equality is
    exact in both engines)."""
    buckets = ", ".join(
        f"concat(mh{b * LSH_ROWS}, mh{b * LSH_ROWS + 1})"
        for b in range(LSH_BANDS)
    )
    return sig.selectExpr(
        "doc_id", f"posexplode(array({buckets})) AS (band, bucket)"
    )


def _minhash_oracle_sig_sql() -> str:
    """DuckDB mirror of _minhash_sig/_minhash_bands over the shared
    string-shingle CTE `e(doc_id, shingle)` — returns the `bands`
    CTE body text."""
    mins = ", ".join(
        f"MIN(substr(md5(CONCAT('{s}|', shingle)), {1 + 8 * c}, 8)) "
        f"AS mh{MINHASH_CHUNKS * s + c}"
        for s in range(MINHASH_SALTS)
        for c in range(MINHASH_CHUNKS)
    )
    buckets = ", ".join(
        f"mh{b * LSH_ROWS} || mh{b * LSH_ROWS + 1}" for b in range(LSH_BANDS)
    )
    return (
        f"sig AS (SELECT doc_id, {mins} FROM e GROUP BY doc_id), "
        f"bands AS (SELECT doc_id, unnest([{buckets}]) AS bucket, "
        f"generate_subscripts([{buckets}], 1) AS band FROM sig)"
    )


@register(
    "minhash_neardup",
    # Round-8 conversion (rows-only → sql-checked): the op's output is
    # the exact-Jaccard-verified subset of the LSH candidates, so it
    # equals the full exact pair set EXACTLY WHEN the banding catches
    # every qualifying pair. On the fixtures that recall is a
    # deterministic fact — the hash family is fixed (md5-derived
    # 32-bit minhashes, engine-reproducible), and the planted
    # near-dups sit at j ≥ 0.9 where the per-pair miss probability is
    # (1-0.81)^12 ≈ 2e-9 — verified set-equal to dedup_ngram_jaccard
    # at all three SFs. The oracle is therefore the exact
    # shared-shingle pair SQL: an LSH recall regression now
    # hash-fails instead of passing rows-only. (The companion
    # pipeline_neardup_eval_pr additionally reproduces the banding
    # itself in SQL and pins candidate counts and precision.)
    oracle=f"WITH {_shingle_pairs_ctes()}{_EXACT_PAIRS_SELECT}",
)
def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection — the sub-quadratic scale path.

    shingle → 24 32-bit minhashes (salted-md5 chunks, engine-
    reproducible — see _minhash_sig) → 12 bands of 2 → band-key bucket
    join → exact-Jaccard verify of candidates only. At 100 TB the
    bucket join replaces the all-pairs comparison: cost is
    Σ bucket_size², bounded by band tuning, and every stage is a plain
    shuffle (no ml-lib, no Python row path). md5 costs ~2× xxhash64 on
    the shingle pass; the pair join dominates either way, and the
    reproducibility buys the hash-checked oracle here and the full
    candidate/precision oracle in pipeline_neardup_eval_pr.
    """
    docs = load_spread(spark, sf_dir, "documents")
    # Cached: consumed by the signature build AND both verify sides (at
    # scale: the persisted shingle/signature tables of an ingest stage).
    sh = docs.select(
        "doc_id", _shingle_strs("text").alias("shingles")
    ).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    bands = _minhash_bands(_minhash_sig(ex))

    # Bucket join → candidate pairs (distinct across bands).
    left = bands.select("band", "bucket", F.col("doc_id").alias("doc1"))
    right = bands.select("band", "bucket", F.col("doc_id").alias("doc2"))
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )

    # Verify candidates with exact Jaccard (quadratic work confined to
    # the candidate set).
    sh1 = sh.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1"))
    sh2 = sh.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2"))
    # r13: |A ∪ B| = |A| + |B| − |A ∩ B| (shingle arrays are distinct
    # by construction) — one hash-set build per candidate pair instead
    # of two, identical counts.
    verified = (
        candidates.join(sh1, "doc1")
        .join(sh2, "doc2")
        .withColumn("n_inter", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "n_union", F.size("sh1") + F.size("sh2") - F.col("n_inter")
        )
        # integer-exact threshold (r12 sweep), double only for display
        .filter(
            F.col("n_inter") * JACCARD_T_DEN
            >= F.col("n_union") * JACCARD_T_NUM
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union"),
        )
        .select("doc1", "doc2", F.round("jaccard", 3).alias("jaccard"))
    )
    return verified.orderBy("doc1", "doc2")


def _simhash_nibble_exprs() -> list[str]:
    """Hex-nibble decode of the first 16 md5 chars (64 bits) — SQL
    shared verbatim by Spark and DuckDB (instr/substr exist in both),
    so the token-hash bits are engine-identical integers."""
    return [
        f"(instr('0123456789abcdef', substr(hx, {c}, 1)) - 1) AS n{c}"
        for c in range(1, 17)
    ]


def _simhash_vote_exprs(div: str) -> list[str]:
    """Per-bit ±1 vote sums over the nibble columns; ``div`` is the
    engine's integer-division keyword (Spark ``DIV``, DuckDB ``//``) —
    all-integer arithmetic, so the votes are exact in both engines."""
    return [
        f"SUM(CASE WHEN ((n{b // 4 + 1} {div} {2 ** (b % 4)}) % 2) = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    ]


def _simhash_half_expr(lo_bit: int, alias: str) -> str:
    """One unsigned 32-bit signature half (bits [lo_bit, lo_bit+32)) as
    a BIGINT built from the vote signs — avoids the engine-specific
    behavior of shifting into a signed 64-bit sign bit."""
    terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << (b - lo_bit)} ELSE 0 END)"
        for b in range(lo_bit, lo_bit + 32)
    )
    return f"CAST(CAST(0 AS BIGINT) + {terms} AS BIGINT) AS {alias}"


@register(
    "dedup_simhash",
    # Round-8 conversion (rows-only → sql-checked): the token hash is
    # now md5 (identical hex in both engines) decoded to bits by the
    # SAME instr/substr nibble SQL, the per-bit votes and signature
    # halves are exact integer arithmetic, and the bucket/Hamming
    # stages are integer ops — the full signature pipeline reproduces
    # bit-for-bit in DuckDB, so the pair list + distances hash-check.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS hx FROM toks),
    nib AS (
        SELECT doc_id, {", ".join(_simhash_nibble_exprs())} FROM h
    ),
    v AS (
        SELECT doc_id, {", ".join(_simhash_vote_exprs("//"))}
        FROM nib GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               {_simhash_half_expr(32, "hi")},
               {_simhash_half_expr(0, "lo")}
        FROM v
    ),
    b AS (SELECT doc_id, hi, lo, hi // 65536 AS bucket FROM sig)
    SELECT s1.doc_id AS doc1, s2.doc_id AS doc2,
           CAST(bit_count(xor(s1.hi, s2.hi))
                + bit_count(xor(s1.lo, s2.lo)) AS INTEGER) AS hamming
    FROM b s1 JOIN b s2
      ON s1.bucket = s2.bucket AND s1.doc_id < s2.doc_id
    WHERE bit_count(xor(s1.hi, s2.hi)) + bit_count(xor(s1.lo, s2.lo)) <= 6
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: 64-bit signature = sign of per-bit
    weighted sums of token hashes; near-dups have small Hamming distance.
    Bucketing on the top 16 bits keeps the pair join sub-quadratic (a
    one-band LSH); Hamming ≤ 6 verifies candidates. Token bits come
    from md5 decoded with the engine-shared nibble SQL (see the oracle
    comment) — xxhash64 would be ~2× cheaper per token but leaves the
    signatures unverifiable; at 100 TB the hash cost is a constant
    factor on the cheapest stage (the token scan), while the pair join
    dominates either way."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = toks.selectExpr("doc_id", "md5(tok) AS hx")
    nib = h.selectExpr("doc_id", *_simhash_nibble_exprs())
    votes = nib.groupBy("doc_id").agg(
        *[F.expr(e) for e in _simhash_vote_exprs("DIV")]
    )
    sigs = votes.selectExpr(
        "doc_id", _simhash_half_expr(32, "hi"), _simhash_half_expr(0, "lo")
    )

    # One-band bucket on the high 16 bits, then Hamming verify.
    bucketed = sigs.selectExpr("doc_id", "hi", "lo", "hi DIV 65536 AS bucket")
    s1 = bucketed.select(
        F.col("doc_id").alias("doc1"),
        F.col("hi").alias("hi1"),
        F.col("lo").alias("lo1"),
        "bucket",
    )
    s2 = bucketed.select(
        F.col("doc_id").alias("doc2"),
        F.col("hi").alias("hi2"),
        F.col("lo").alias("lo2"),
        "bucket",
    )
    pairs = (
        s1.join(s2, "bucket")
        .filter(F.col("doc1") < F.col("doc2"))
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
                + F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= 6)
        .select("doc1", "doc2", "hamming")
    )
    return pairs.orderBy("doc1", "doc2")


EMB_BLOCKS = 8


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec1, b.vec_id AS vec2
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) >= 0.42
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup pairs: cosine ≥ threshold, EXACT, via a
    block-partitioned pair join. Output carries only the pair ids (the
    cosine value itself is fp-noise-sensitive; the comparison is not).

    Round 1 shipped this as ``a.join(b, vec1 < vec2)`` — a pure
    non-equi condition that plans as BroadcastNestedLoopJoin: the whole
    table broadcast to every task, the scale-killer flagged in review.
    An LSH sketch-bucket cover was measured and REJECTED for this exact
    op: the fixture's qualifying pairs sit at cosine 0.42–0.51 with
    16-bit sign-sketch Hamming distances up to 12/16, so any
    sub-quadratic bucket scheme drops pairs (the approximate scale path
    is ``sim_ann_lsh``/``minhash_neardup``; this operator is their
    exact ground-truth twin and must return every pair).

    Instead: the classic triangle/block pair join. Each vector lands in
    block b = vec_id % B; the LEFT replica stream emits it for keys
    (b, j) for j ≥ b, the RIGHT stream for keys (i, b) for i ≤ b, so
    every unordered vector pair meets on EXACTLY one block-pair key
    (same-block pairs dedup on id order). The join is a shuffled
    EQUI-join on the key — no broadcast of the corpus, no BNLJ — and
    per-task work is capped at (N/B)² cosines over B(B+1)/2 evenly
    sized tasks. At 100 TB, B scales with cluster size (B ≈ √tasks) and
    N² cost is the price of exactness, paid with bounded memory and
    full parallelism.
    """
    from pg_archiver_spark.functions.similarity import dot_expr, norm_expr

    # Norms are per-VECTOR — compute them once before the pair join.
    # cosine_expr per pair re-folds each 64-float array 3× (dot + two
    # norms); with N²/2 pairs the norm folds dominate. dot/(na·nb) with
    # precomputed na, nb is bit-identical (same op order: sqrt, then
    # multiply) at one-third the interpreted-HOF work.
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % EMB_BLOCKS).alias("blk"),
        norm_expr(F.col("embedding")).alias("nrm"),
    )
    left = emb.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        F.col("blk").alias("ki"),
        F.explode(
            F.sequence(F.col("blk"), F.lit(EMB_BLOCKS - 1))
        ).alias("kj"),
    )
    right = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ki"),
        F.col("blk").alias("kj"),
    )
    pairs = left.join(right, ["ki", "kj"]).filter(
        # Cross-block keys (ki<kj) pair distinct blocks — every match is
        # a unique pair. Same-block keys see both orderings — keep one.
        (F.col("ki") < F.col("kj")) | (F.col("va") < F.col("vb"))
    )
    return (
        pairs.filter(
            dot_expr(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            >= 0.42
        )
        .select(
            F.least("va", "vb").alias("vec1"),
            F.greatest("va", "vb").alias("vec2"),
        )
    )


CC_MAX_ITERS = 8


def propagate_min_labels(pairs: DataFrame, max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """Connected components over (doc1, doc2) pair edges via iterative
    min-label propagation with pointer jumping: each doc starts labeled
    with its own id, repeatedly takes the minimum label in its
    neighborhood, then replaces its label with its label's label (path
    halving). Fixpoint = one label per component (its smallest doc_id).
    Returns (doc_id, label). Rounds are plain shuffle joins; lineage is
    cut per round with localCheckpoint so the plan stays flat.

    Min-propagation alone needs diameter rounds; the jump step chases
    label chains so the rounds needed drop to O(log diameter) — 8
    rounds cover components of diameter ~2^8, far beyond any real
    near-dup cluster. If a pathological graph still fails to converge
    the function RAISES instead of returning silently under-merged
    labels (a split cluster would violate the one-survivor contract
    downstream with no other signal)."""
    edges = pairs.select("doc1", "doc2").unionByName(
        pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
    ).cache()

    labels = (
        edges.select(F.col("doc1").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.doc2 == labels.doc_id)
            .groupBy(edges.doc1.alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the round's INPUT label alongside the propagated one so
        # the convergence check below is a filter over the checkpointed
        # frame instead of a shuffle join back against `labels` (r14,
        # VERDICT r13 item 4: the per-round changed-count join was one
        # of two shuffles per round that job overhead paid for).
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("new_label"),
            F.col("label").alias("old_label"),
        )
        # Pointer jumping: label <- label's label. Every label value is
        # itself a doc_id in the frame, and at fixpoint the component
        # min is self-labeled, so the jump is the identity there — the
        # changed==0 convergence test below stays valid.
        parent = propagated.select(
            F.col("doc_id").alias("p_id"),
            F.col("new_label").alias("p_label"),
        )
        jumped = (
            propagated.join(
                parent, propagated.new_label == parent.p_id, "left"
            )
            .select(
                "doc_id",
                F.coalesce("p_label", "new_label").alias("label"),
                "old_label",
            )
            .localCheckpoint()
        )
        changed = (
            jumped.filter(F.col("label") != F.col("old_label")).count()
        )
        labels = jumped.select("doc_id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"propagate_min_labels: not converged after {max_iters} rounds; "
            "component diameter exceeds 2^rounds — raise max_iters rather "
            "than accept silently split clusters"
        )
    return labels


@register(
    "dedup_cluster_cc",
    # Converted from rows-only in round 8 (VERDICT r7 #5): the min-label
    # fixpoint IS expressible — a recursive transitive closure over the
    # near-dup edge set, component label = min reachable doc_id. The
    # oracle's edges are the EXACT-Jaccard pairs (dedup_ngram_jaccard's
    # oracle); the Spark side uses the LSH-verified pairs, so the hash
    # check also pins LSH recall = 1 at fixture scale (independently
    # measured by pipeline_neardup_eval_pr).
    oracle=f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {SHINGLE_K - 1}),
                   i -> array_to_string(string_split(text,' ')[i+1:i+{SHINGLE_K}], ' ')
               )) AS shingles
        FROM documents
    ),
    ex AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
        FROM sh
    ),
    pairs AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               a.n_sh AS n1, b.n_sh AS n2, COUNT(*) AS n_common
        FROM ex a JOIN ex b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    edges AS (
        SELECT doc1, doc2 FROM pairs
        WHERE {JACCARD_PRED_SQL}
    ),
    bidir AS (
        SELECT doc1 AS src, doc2 AS dst FROM edges
        UNION
        SELECT doc2, doc1 FROM edges
    ),
    reach AS (
        SELECT src, dst FROM bidir
        UNION
        SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
    )
    SELECT label AS cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (SELECT src, LEAST(src, MIN(dst)) AS label FROM reach GROUP BY src)
    GROUP BY label
    ORDER BY cluster_rep
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup CLUSTERS via iterative min-label propagation —
    the step real dedup pipelines need after pair detection: A≈B and
    B≈C must collapse to ONE surviving document even when A≉C directly.

    Edges = the LSH-verified near-dup pairs (minhash_neardup); the
    propagation fixpoint labels every component by its smallest doc_id
    (the canonical survivor). The iteration count is the graph diameter
    — for near-dup clusters that's tiny (duplicates of one source form
    near-cliques), so at 100 TB this is a handful of bounded shuffles,
    not a long chain.

    Returns one row per multi-doc cluster: (cluster_rep, n_docs).
    """
    pairs = minhash_neardup(spark, sf_dir).select("doc1", "doc2")
    labels = propagate_min_labels(pairs)
    return (
        labels.groupBy(F.col("label").alias("cluster_rep"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("cluster_rep")
    )


CONTAINMENT_THRESHOLD = 0.8
# Exact rational form (== CONTAINMENT_THRESHOLD) for integer threshold
# predicates: n_common/n_a >= 4/5  ⟺  5·n_common >= 4·n_a (r12 sweep).
CONTAINMENT_T_NUM, CONTAINMENT_T_DEN = 4, 5


@register(
    "dedup_containment",
    # Round 8: equi-join oracle form (see dedup_ngram_jaccard) — the
    # all-pairs list_intersect was the sf0.1 gate's pacing item.
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(len(string_split(text,' ')) - {SHINGLE_K - 1}),
                   i -> array_to_string(
                       string_split(text,' ')[i+1:i+{SHINGLE_K}], ' ')
               )) AS shingles
        FROM documents
    ),
    e AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
        FROM sh WHERE len(shingles) > 0
    ),
    pairs AS (
        SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
               a.n_sh AS n_a, COUNT(*) AS n_common
        FROM e a JOIN e b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2, 3
    )
    SELECT contained_doc, container_doc,
           ROUND(CAST(n_common AS DOUBLE) / n_a, 3) AS containment
    FROM pairs
    WHERE {CONTAINMENT_T_DEN} * n_common >= {CONTAINMENT_T_NUM} * n_a
    ORDER BY contained_doc, container_doc
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dup pairs — C(A→B) = |A∩B| / |A|:
    the case Jaccard structurally misses. A 100-word doc quoted
    verbatim inside a 10,000-word doc has Jaccard ≈ 0.01 (never crosses
    any symmetric threshold) but containment 1.0 — and
    quote-inclusion / boilerplate-wrapping is a dominant real dup mode
    in web-crawled training corpora. Pretraining dedup needs BOTH
    screens: `dedup_ngram_jaccard`/`minhash_neardup` for same-size
    near-dups, this op for subset inclusion.

    Same sub-quadratic machinery as the Jaccard twin: shingles hashed
    to longs at construction, hot-shingle df cap
    (MAX_SHINGLE_DF, a no-op on fixtures, the 100 TB fan-out
    bound), shared-shingle equi-join — docs sharing no shingle never
    pair — then the intersection count normalizes by the CONTAINED
    side's set size only. Ordered pairs (a≠b, not a<b): containment is
    directional, A-in-B and B-in-A are different facts. At scale the
    LSH analogue swaps the pair join for minhash-bucket candidates
    exactly as minhash_neardup documents."""
    docs = load_spread(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", _shingles(F.col("text")).alias("shingles"))
        .select("doc_id", "shingles", F.size("shingles").alias("n_sh"))
        .filter(F.col("n_sh") > 0)
        .cache()
    )
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    hot = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("shingle")
    )
    ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.select(
        F.col("doc_id").alias("contained_doc"),
        F.col("n_sh").alias("n_a"),
        "shingle",
    )
    b = ex.select(F.col("doc_id").alias("container_doc"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("contained_doc") != F.col("container_doc"))
        .groupBy("contained_doc", "container_doc", "n_a")
        .agg(F.count("*").alias("n_common"))
    )
    containment = F.col("n_common").cast("double") / F.col("n_a")
    return (
        # integer-exact threshold (r12 sweep), double only for display
        inter.filter(
            F.col("n_common") * CONTAINMENT_T_DEN
            >= F.col("n_a") * CONTAINMENT_T_NUM
        )
        .select(
            "contained_doc",
            "container_doc",
            F.round(containment, 3).alias("containment"),
        )
        .orderBy("contained_doc", "container_doc")
    )


# C4-style segment dedup: non-overlapping 8-token segments; the first
# occurrence (lowest doc_id, then lowest seg_idx) of each distinct
# segment is kept, every later occurrence is removed. 8 tokens sits
# inside the fixture's 10..99-token doc range so even the shortest doc
# yields a segment. (C4 §2.2 removes duplicate three-sentence spans
# corpus-wide keeping one occurrence — same semantics, token-windowed
# because the fixture text has no sentence boundaries.)
SEG_TOKENS = 8


@register(
    "dedup_paragraph",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, seg_idx,
               md5(array_to_string(
                   toks[seg_idx*{SEG_TOKENS}+1 : seg_idx*{SEG_TOKENS}+{SEG_TOKENS}],
                   ' ')) AS seg_md5
        FROM d,
             UNNEST(range(CAST(ceil(len(toks)/{SEG_TOKENS}.0) AS BIGINT)))
                 AS t(seg_idx)
    ),
    ranked AS (
        SELECT doc_id, seg_md5,
               ROW_NUMBER() OVER (PARTITION BY seg_md5
                                  ORDER BY doc_id, seg_idx) AS occ
        FROM s
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
    FROM ranked
    GROUP BY doc_id
    """,
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph/segment-level dedup (the C4 recipe): split
    every document into non-overlapping SEG_TOKENS-token segments, keep
    the FIRST occurrence (lowest doc_id, then seg_idx) of each distinct
    segment, drop the rest, and report the per-document kept/removed
    ledger a curation pipeline applies before training.

    Plan: narrow sequence→explode segmentation (zero shuffles), ONE
    shuffle on the segment fingerprint for the first-occurrence window,
    one groupBy doc_id for the ledger. The window partitions by a
    128-bit content hash — near-uniform keys, no skew beyond true
    boilerplate segments, which is precisely the data a dedup pass
    exists to find. At 100 TB both shuffles carry fixed-width hashes +
    two ints per segment, never the text. The md5 fingerprint (not the
    raw segment string) is the join/window key on BOTH engines, so the
    oracle proves content-keyed equality the way the production path
    would run it.
    """
    toks = F.split("text", " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    segs = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), ((F.col("n") - 1) / SEG_TOKENS).cast("bigint"))
        ).alias("seg_idx"),
        "toks",
    ).select(
        "doc_id",
        "seg_idx",
        F.md5(
            F.array_join(
                F.slice(
                    "toks",
                    (F.col("seg_idx") * SEG_TOKENS + 1).cast("int"),
                    SEG_TOKENS,
                ),
                " ",
            ).cast("binary")
        ).alias("seg_md5"),
    )
    occ = F.row_number().over(
        Window.partitionBy("seg_md5").orderBy("doc_id", "seg_idx")
    )
    ranked = segs.select("doc_id", occ.alias("occ"))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )


# SemDeDup anchors: the first K_SEM embeddings act as fixed cluster
# centroids (expressed via self-join on vec_id < K_SEM in BOTH engines,
# so no floating-point literals cross the code/oracle boundary).
K_SEM = 4
SEM_COS_THRESHOLD = 0.42


@register(
    "dedup_semantic_cluster",
    oracle=f"""
    WITH anchors AS (
        SELECT vec_id AS a_id, embedding AS a_emb
        FROM embeddings WHERE vec_id < {K_SEM}
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, a.a_id,
               CAST(list_cosine_similarity(e.embedding, a.a_emb) AS DOUBLE)
                   AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY CAST(list_cosine_similarity(e.embedding, a.a_emb)
                                 AS DOUBLE) DESC, a.a_id) AS rk
        FROM embeddings e CROSS JOIN anchors a
    ),
    assigned AS (
        SELECT vec_id, embedding, a_id AS cluster_id
        FROM scored WHERE rk = 1
    ),
    dup_pairs AS (
        SELECT x.cluster_id, x.vec_id AS keep_id, y.vec_id AS dup_id
        FROM assigned x JOIN assigned y
          ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
        WHERE CAST(list_cosine_similarity(x.embedding, y.embedding)
                   AS DOUBLE) >= {SEM_COS_THRESHOLD}
    )
    SELECT a.cluster_id,
           COUNT(DISTINCT a.vec_id) AS n_members,
           COUNT(DISTINCT d.dup_id) AS n_removed
    FROM assigned a
    LEFT JOIN dup_pairs d ON a.cluster_id = d.cluster_id
    GROUP BY a.cluster_id
    """,
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023): assign every
    embedding to its nearest anchor centroid, then find near-duplicate
    pairs ONLY within each cluster (cosine ≥ threshold) and remove the
    higher-id member of each pair. Reports the per-cluster member and
    removal ledger.

    The whole point of the cluster stage is confining the quadratic
    pair search: candidates are within-cluster only, via an EQUI-join
    on cluster_id — never a corpus×corpus cross product. At 100 TB the
    centroid count K scales as N/target_cluster_size (SemDeDup used
    50k clusters for LAION), so per-cluster pair work stays bounded
    while assignment is one broadcast-K pass over the corpus. Here K=4
    fixed anchors (the first four embeddings, self-join — no float
    literals to drift between engines) keep the oracle exact.

    Ties: assignment breaks cosine ties toward the lower anchor id; the
    fixture's anchor-cosine gaps are far above cross-engine float noise
    (same reasoning as dedup_embedding_cosine's 0.42 threshold, driver
    hash-pass r6).
    """
    from pg_archiver_spark.functions.similarity import dot_expr, norm_expr

    # r13: norms hoisted out of both cosine sites (the
    # dedup_embedding_cosine treatment) — the corpus norm folds once
    # per row and the K anchor norms once each instead of inside every
    # K·N assignment cosine, and the within-cluster pair verify reuses
    # the same per-row norm (3 HOF folds per pair → 1). Same
    # sqrt-then-multiply op order as cosine_expr → bit-identical.
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm_expr(F.col("embedding")).alias("nrm")
    )
    anchors = emb.filter(F.col("vec_id") < K_SEM).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    scored = emb.crossJoin(F.broadcast(anchors)).select(
        "vec_id",
        "embedding",
        "nrm",
        "a_id",
        (
            dot_expr(F.col("embedding"), F.col("a_emb"))
            / (F.col("nrm") * F.col("a_nrm"))
        ).alias("cos"),
    )
    assigned = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cos"), "a_id"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "nrm", F.col("a_id").alias("cluster_id"))
    )
    x = assigned.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = assigned.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dup_pairs = (
        x.join(y, "cluster_id")
        .filter(F.col("va") < F.col("vb"))
        .filter(
            dot_expr(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            >= SEM_COS_THRESHOLD
        )
        .select("cluster_id", F.col("vb").alias("dup_id"))
    )
    return (
        assigned.join(dup_pairs, "cluster_id", "left")
        .groupBy("cluster_id")
        .agg(
            F.countDistinct("vec_id").alias("n_members"),
            F.countDistinct("dup_id").alias("n_removed"),
        )
    )


@register(
    "pipeline_neardup_eval_pr",
    # Round-8 conversion (rows-only → sql-checked): with the minhash
    # family now md5-derived, DuckDB reproduces the SIGNATURES AND THE
    # BANDING themselves (shared string fragments, _minhash_oracle_
    # sig_sql), so the candidate count, true-positive count, and the
    # integer permille precision/recall are all exact SQL — the full
    # LSH tuning report is hash-checked, not just its ground-truth
    # side.
    oracle=f"""
    WITH {_shingle_pairs_ctes("prs")},
    exact AS (
        SELECT doc1, doc2 FROM prs
        WHERE {JACCARD_PRED_SQL}
    ),
    {_minhash_oracle_sig_sql()},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
    ),
    tp AS (
        SELECT c.doc1, c.doc2 FROM cand c
        JOIN exact x ON c.doc1 = x.doc1 AND c.doc2 = x.doc2
    ),
    s AS (
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT COUNT(*) FROM cand) AS n_candidates,
               (SELECT COUNT(*) FROM tp) AS n_tp
    )
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_tp AS BIGINT) AS n_tp,
           CAST(COALESCE((n_tp * 1000) // NULLIF(n_candidates, 0), -1)
                AS BIGINT) AS precision_pm,
           CAST(COALESCE((n_tp * 1000) // NULLIF(n_exact, 0), -1)
                AS BIGINT) AS recall_pm
    FROM s
    """,
)
def pipeline_neardup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall evaluation of the MinHash-LSH candidate stage
    against exact-Jaccard ground truth — the tuning harness for the
    band/row trade-off (b=12, r=2 here): before shipping an LSH config
    over 100 TB you measure, on a slice, how many true near-dup pairs
    the buckets CATCH (recall — LSH's probabilistic miss) and how much
    verify work the buckets WASTE (precision — candidate pairs below
    threshold). The eval sibling of sim_matryoshka_eval: it rides the
    production machinery (minhash_neardup's exact signature/band
    construction) rather than reimplementing it.

    Ground truth: the shared-shingle equi-join (any pair with
    Jaccard > 0 shares a shingle, so it enumerates ALL qualifying
    pairs — dedup_ngram_jaccard's exact frame). Candidates: the LSH
    band-bucket join BEFORE verification, on the md5-derived
    signatures the oracle reproduces exactly. Both sets are
    deterministic, so TP/precision/recall are exact integers
    (permille DIV) and the WHOLE report hash-checks; the sibling test
    additionally pins set algebra (TP ≤ both sides)."""
    docs = load_spread(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", _shingle_strs("text").alias("shingles")
    ).cache()

    # Exact ground truth — the oracle's own `pairs` CTE topology
    # (r13, guide §2.3/§2.4): per-pair |s1 ∩ s2| is COUNT(*) over the
    # shared-shingle equi-join (shingle arrays are distinct by
    # construction), with the set sizes riding the explode. The
    # previous shape materialized DISTINCT shared pairs, re-joined the
    # FULL string-shingle arrays onto both pair sides (two extra
    # corpus-keyed exchanges whose rows each carried an entire shingle
    # array), and built two hash sets per pair (array_intersect) —
    # heavy per-pair work AND heavy exchange bytes that the aggregate
    # form never creates.
    exn = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    a = exn.selectExpr("doc_id AS doc1", "n_sh AS n1", "shingle")
    b = exn.selectExpr("doc_id AS doc2", "n_sh AS n2", "shingle")
    exact = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2", "n1", "n2")
        .agg(F.count("*").alias("n_inter"))
        # integer-exact threshold (r12 sweep), |A∪B| by
        # inclusion-exclusion — identical filter set to the oracle's
        # JACCARD_PRED_SQL.
        .filter(
            F.col("n_inter") * JACCARD_T_DEN
            >= (F.col("n1") + F.col("n2") - F.col("n_inter"))
            * JACCARD_T_NUM
        )
        .select("doc1", "doc2")
    )

    # LSH candidates: the exact signature/band machinery of
    # minhash_neardup, WITHOUT the verify step. No pair-level DISTINCT
    # here — a pair colliding in several bands is deduplicated by the
    # per-pair aggregate below, which saves the extra exchange the
    # standalone distinct() paid.
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    bands = _minhash_bands(_minhash_sig(ex))
    cand = (
        bands.select("band", "bucket", F.col("doc_id").alias("doc1"))
        .join(
            bands.select("band", "bucket", F.col("doc_id").alias("doc2")),
            ["band", "bucket"],
        )
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
    )

    # Single-lineage scalars (r13, guide §2.4): the old three-subtree
    # form (exact.agg ⨯ cand.agg ⨯ (cand ⋈ exact).agg) recomputed the
    # ENTIRE exact pipeline and the ENTIRE candidate pipeline twice
    # each — the dominant cost of the op. Tag each pair with its
    # origin, dedup per pair, and every count (including the TP
    # intersection) falls out of ONE aggregate over pairs computed
    # exactly once.
    tagged = exact.select(
        "doc1", "doc2", F.lit(1).alias("is_ex"), F.lit(0).alias("is_cand")
    ).unionAll(
        cand.select(
            "doc1", "doc2", F.lit(0).alias("is_ex"), F.lit(1).alias("is_cand")
        )
    )
    per_pair = tagged.groupBy("doc1", "doc2").agg(
        F.max("is_ex").alias("is_ex"), F.max("is_cand").alias("is_cand")
    )
    # COALESCE(…, 0): a corpus with no pairs at all leaves the global
    # aggregate's SUMs NULL where the old COUNT(*) forms returned 0.
    stats = per_pair.agg(
        F.coalesce(F.sum("is_ex"), F.lit(0)).alias("n_exact"),
        F.coalesce(F.sum("is_cand"), F.lit(0)).alias("n_cand"),
        F.coalesce(
            F.sum(F.col("is_ex") * F.col("is_cand")), F.lit(0)
        ).alias("n_tp"),
    )
    return stats.select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.col("n_cand").cast("bigint").alias("n_candidates"),
        F.col("n_tp").cast("bigint").alias("n_tp"),
        # A corpus with no candidates / no true pairs leaves P/R
        # undefined: Spark's ANSI integer DIV raises on zero while
        # DuckDB returns NULL (r11 random-fixture sweep) — NULLIF +
        # -1 sentinel on both engines.
        F.expr(
            "COALESCE((n_tp * 1000) DIV NULLIF(n_cand, 0), -1)"
        ).alias("precision_pm"),
        F.expr(
            "COALESCE((n_tp * 1000) DIV NULLIF(n_exact, 0), -1)"
        ).alias("recall_pm"),
    )


SPAN_K = 6  # window length (tokens) for repeated-substring detection


@register(
    "dedup_repeated_substring_spans",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    w AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(len(toks) - {SPAN_K - 1}),
                   i -> {{'pos': i,
                         'win': array_to_string(toks[i+1:i+{SPAN_K}], ' ')}}
               )) AS u
        FROM d WHERE len(toks) >= {SPAN_K}
    ),
    w2 AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM w),
    rep AS (
        SELECT win FROM w2 GROUP BY win
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    r AS (SELECT w2.doc_id, w2.pos FROM w2 JOIN rep USING (win)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                    OR pos > MAX(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        + {SPAN_K - 1}
                    THEN 1 ELSE 0 END AS new_isl
        FROM r
    ),
    isl2 AS (
        SELECT doc_id, pos,
               SUM(new_isl) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS isl_id
        FROM isl
    ),
    spans AS (
        SELECT doc_id, isl_id,
               MIN(pos) AS s, MAX(pos) + {SPAN_K - 1} AS e
        FROM isl2 GROUP BY doc_id, isl_id
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens,
           CAST(MAX(e - s + 1) AS BIGINT) AS max_span_len
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_repeated_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REPEATED-SUBSTRING span detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    recipe): find, per document, the MAXIMAL token spans whose every
    {SPAN_K}-token window also occurs in some OTHER document. Document-
    and paragraph-level dedup (dedup_exact / dedup_paragraph) miss
    these partial overlaps — boilerplate headers, license blocks,
    syndicated fragments — which are exactly the memorization-prone
    content. The suffix-array machinery of the paper collapses to
    relational form: overlapping windows (the suffix-array probe),
    cross-doc frequency filter, then interval-union via a running-max
    gaps-and-islands pass merges overlapping window hits into maximal
    spans — a span of any length is detected from its length-{SPAN_K}
    windows, the classic k-mer reduction.

    Scale: windows explode is a map stage; the cross-doc filter is one
    groupBy on the window key (hashed to 8-byte longs Spark-side, the
    dedup-stack convention; the oracle compares the strings — w.h.p.
    identical, 64-bit collisions ~N²/2⁶⁵); islands run inside a
    per-doc window partition. A production hot-window df cap slots in
    exactly like MAX_SHINGLE_DF in the Jaccard twin.
    """
    docs = load_spread(spark, sf_dir, "documents")
    # Short-doc filter BEFORE the generate (round-9 hardening, the
    # text_ngram_novelty_decay bug class): sequence(0, n-SPAN_K) runs
    # descending for n < SPAN_K and slice(...,0,..) raises. With the
    # filter after the select this only worked because Catalyst pushed
    # the predicate below the Generate; make the safety structural.
    #
    # r13 (guide §1.2 per-task work): tokenize ONCE into a projected
    # column. The old spelling kept `split(text,' ')` inside the
    # transform lambda, and Catalyst does not hoist loop-invariant
    # subexpressions out of higher-order-function lambdas — every
    # window position re-split the whole document (O(len²) chars/doc).
    wins = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {SPAN_K}), "
                    f"i -> xxhash64(array_join(slice(toks, i+1, {SPAN_K}), ' ')))"
                )
            ).alias("pos", "wh"),
        )
    )
    # "window occurs in ≥ 2 distinct docs" ⟺ MIN(doc_id) < MAX(doc_id):
    # COUNT(DISTINCT doc_id) planned as a two-phase distinct aggregate
    # (an extra exchange keyed (wh, doc_id) plus a whole aggregate
    # level); MIN/MAX are single-phase and map-side combinable — at
    # corpus scale the distinct expansion was a second full shuffle of
    # the window stream (guide §2.3/§2.4). Value-identical filter set.
    rep = (
        wins.groupBy("wh")
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
        .filter(F.col("d_min") < F.col("d_max"))
        .select("wh")
    )
    r = wins.join(rep, "wh").select("doc_id", "pos")
    # r13: pos is strictly ascending and unique per doc in this order,
    # so the running MAX over all preceding rows equals LAG(pos) —
    # constant window state instead of a growing-frame aggregate.
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    isl = r.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(w_lag).isNull()
            | (F.col("pos") > F.lag("pos").over(w_lag) + (SPAN_K - 1)),
            1,
        )
        .otherwise(0)
        .alias("new_isl"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl2 = isl.select(
        "doc_id", "pos", F.sum("new_isl").over(w_run).alias("isl_id")
    )
    spans = isl2.groupBy("doc_id", "isl_id").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (SPAN_K - 1)).alias("e"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("covered_tokens"),
            F.max(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("max_span_len"),
        )
        .orderBy("doc_id")
    )
