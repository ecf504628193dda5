"""Round-9 tests: ADVICE r8 follow-ups (k-means nano-quantization
parity, ANN sign/argmax fixture margins, minhash LSH recall canary,
novelty-decay short-doc guard, watermark version pin) and the
ml_pca_project invariant-oracle margins (VERDICT r8 item #3)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import ORACLES, QUERIES, load_all_operators

load_all_operators()

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _embeddings(sf: str) -> tuple[np.ndarray, np.ndarray]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{sf}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    return X, labels


# ---------------------------------------------------------------- PCA


@pytest.mark.parametrize("sf", SF_DIRS)
def test_pca_invariant_oracle_margins(sf):
    """The ml_pca_project oracle pins booleans; each must be a fixture
    fact with COMFORTABLE margin, not a knife-edge — ADVICE r8
    discipline: fixture drift toward a boundary must surface here, in
    pytest, before it can flake the hash gate."""
    from pg_archiver_spark.functions.similarity import (
        PCA_CAPTURE_BAND,
        PCA_EIG_RESID_TOL,
        PCA_ORTHO_TOL,
        PCA_TOT_VAR_BAND,
    )

    X, labels = _embeddings(sf)
    n = len(X)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    v1, v2 = eigvecs[:, -1], eigvecs[:, -2]
    lam1, lam2 = eigvals[-1], eigvals[-2]

    # Orthonormality / eigen residual: ~1e-15, bounds 1e-9 / 1e-10.
    ortho_err = max(
        abs(v1 @ v1 - 1.0), abs(v2 @ v2 - 1.0), abs(v1 @ v2)
    )
    assert ortho_err < PCA_ORTHO_TOL * 1e-3, ortho_err
    resid = max(
        np.abs(cov @ v1 - lam1 * v1).max(),
        np.abs(cov @ v2 - lam2 * v2).max(),
    )
    assert resid < PCA_EIG_RESID_TOL * 1e-3, resid

    # Capture ratio: stays ≥ 0.015 from both band edges.
    capture = (lam1 + lam2) / cov.trace()
    lo, hi = PCA_CAPTURE_BAND
    assert capture - lo > 0.015 and hi - capture > 0.015, capture

    # Per-label mean ‖x−μ‖²: well inside [0.5, 1.5].
    C = X - mean
    tot = (C * C).sum(axis=1)
    for lab in set(labels.tolist()):
        m = float(tot[labels == lab].mean())
        assert PCA_TOT_VAR_BAND[0] + 0.3 < m < PCA_TOT_VAR_BAND[1] - 0.3, (
            lab,
            m,
        )

    # Pythagoras: per-row projection never exceeds the centered norm
    # (the Spark side allows 1e-9 relative slack for fold noise; the
    # exact quantity satisfies it with zero slack).
    p1, p2 = C @ v1, C @ v2
    mask = tot > 0
    assert ((p1**2 + p2**2)[mask] <= tot[mask]).all()


@pytest.mark.parametrize("sf", SF_DIRS)
def test_pca_spectrum_is_degenerate_so_values_stay_unoracled(sf):
    """Documents WHY the oracle pins invariants, not projections: if
    the spectrum ever separates (λ2/λ1 and λ3/λ2 drop well below 1),
    the oracle could be upgraded to pin per-label projection values —
    this test flags that opportunity instead of letting the weaker
    oracle silently persist."""
    X, _ = _embeddings(sf)
    n = len(X)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / n - np.outer(mean, mean)
    lam = np.linalg.eigvalsh(cov)[::-1]
    assert lam[1] / lam[0] > 0.9 and lam[2] / lam[1] > 0.9, (
        "spectrum separated: consider pinning projection values in the "
        f"ml_pca_project oracle (ratios {lam[1]/lam[0]:.3f}, "
        f"{lam[2]/lam[1]:.3f})"
    )


# ------------------------------------------------------------ k-means


def _quantize_nano(x: np.ndarray) -> np.ndarray:
    """Python twin of the shared `CAST(ROUND(x*1e9) AS BIGINT)`
    fragment: round-half-away-from-zero on the exact double."""
    return np.where(
        x >= 0,
        np.floor(x * 1e9 + 0.5),
        np.ceil(x * 1e9 - 0.5),
    ).astype(np.int64)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_kmeans_quantized_trajectory_matches_numpy(sf):
    """Independent-reference cross-check (the ml_ols/markov
    discipline): a shared Spark/DuckDB expression tree could be
    same-wrong in both engines and the hash gate would never see it.
    Rebuild the nano-quantized Lloyd trajectory in NumPy, with
    left-assoc fold distances exactly as zip_with/aggregate computes
    them, and compare the registered op's output values."""
    from pg_archiver_spark.functions.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
    )

    X, _ = _embeddings(sf)
    n = len(X)
    cent = X[:KMEANS_K].copy()

    def assign(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # Left-assoc sequential fold per pair, matching zip_with/
        # aggregate: sum in index order with ONE accumulator (numpy's
        # vectorized sum would reorder the adds).
        d = np.zeros((n, KMEANS_K))
        for k in range(KMEANS_K):
            acc = np.zeros(n)
            for j in range(X.shape[1]):
                diff = X[:, j] - c[k, j]
                acc = acc + diff * diff
            d[:, k] = acc
        cid = d.argmin(axis=1)  # first (lowest cid) argmin on ties
        return cid, d[np.arange(n), cid]

    for _ in range(KMEANS_ITERS):
        cid, _dist = assign(cent)
        new = cent.copy()
        for k in range(KMEANS_K):
            m = cid == k
            if m.any():
                q = _quantize_nano(X[m])
                new[k] = q.sum(axis=0) / (m.sum() * 1e9)
        cent = new
    cid, dist = assign(cent)
    dq = _quantize_nano(dist)
    expect = {}
    for k in range(KMEANS_K):
        m = cid == k
        if m.any():
            expect[k] = (
                int(m.sum()),
                round(float(dq[m].sum()) / (m.sum() * 1e9), 6),
            )
    total = round(float(dq.sum()) / 1e9, 4)

    # No boundary-margin assert is needed for the quantization itself:
    # the ROUND inputs (x*1e9, dist*1e9) are bit-identical across
    # engines (column values + shared sequential folds + one IEEE
    # multiply), and exact .5 halves DO occur in the fixture (float32
    # dyadics like 153/1024 at sf0.1) — verified both engines round
    # them half-away-from-zero identically; _quantize_nano mirrors
    # that, and the trajectory comparison below would fail if any
    # rounding diverged.

    sql = ORACLES["ml_kmeans_lloyd"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    rows = con.execute(sql).fetchall()
    got = {r[0]: (r[1], r[2]) for r in rows}
    assert got == expect
    assert all(r[3] == total for r in rows)


# ------------------------------------------------------------ minhash


def test_minhash_lsh_recall_is_one(spark, sf_dir):
    """ADVICE r8 #3: minhash_neardup (and dedup_cluster_cc /
    pipeline_neardup_dedup_e2e transitively) is oracled against the
    EXACT Jaccard pair set — valid only while LSH recall is 1 on the
    fixture. Assert that directly so a regenerated fixture with an
    organic pair near the 0.5 threshold (per-pair band-miss
    probability ≈ 3.2% at j=0.5) fails HERE with a clear message, not
    as a confusing hash mismatch in the driver gate."""
    from pg_archiver_spark.functions.dedup import (
        JACCARD_THRESHOLD,
        _minhash_bands,
        _minhash_sig,
        _shingle_strs,
    )

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", _shingle_strs(F.col("text")).alias("shingles")
    ).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    bands = _minhash_bands(_minhash_sig(ex))
    cand = {
        (r.doc1, r.doc2)
        for r in bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .distinct()
        .collect()
    }
    exact = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .withColumn(
            "j",
            F.size(F.array_intersect("x.shingles", "y.shingles")).cast(
                "double"
            )
            / F.size(F.array_union("x.shingles", "y.shingles")),
        )
        .filter(F.col("j") >= JACCARD_THRESHOLD)
        .select(
            F.col("x.doc_id").alias("doc1"),
            F.col("y.doc_id").alias("doc2"),
            "j",
        )
        .collect()
    )
    missed = [
        (r.doc1, r.doc2, r.j)
        for r in exact
        if (r.doc1, r.doc2) not in cand
    ]
    assert not missed, (
        "LSH banding missed exact-Jaccard pairs — the minhash_neardup/"
        "dedup_cluster_cc/pipeline_neardup_dedup_e2e oracles assume "
        f"recall 1 on this fixture and will hash-fail: {missed}. "
        "Either re-plant these pairs at j ≥ 0.9 or widen the banding."
    )
    # The recall-1 argument leans on planted pairs sitting at high j
    # where band-miss probability is ~(1-j²)^12; keep a printed margin.
    min_j = min((r.j for r in exact), default=1.0)
    assert min_j >= JACCARD_THRESHOLD


# ----------------------------------------------------- ANN margins


def _ivf_numpy_train(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NumPy replay of the trained IVF coarse quantizer (round 10):
    _IVF_TRAIN_ITERS nano-quantized Lloyd rounds from the first
    _IVF_CELLS vectors, squared-L2 distances computed with the SAME
    left-assoc sequential fold Spark's zip_with/aggregate (and the
    oracle's list_sum(list_transform)) run. Returns (centroids,
    per-vector distance matrix to every trained centroid)."""
    from pg_archiver_spark.functions.similarity import (
        _IVF_CELLS,
        _IVF_TRAIN_ITERS,
    )

    n = len(X)

    def dists(c: np.ndarray) -> np.ndarray:
        d = np.zeros((n, len(c)))
        for k in range(len(c)):
            acc = np.zeros(n)
            for j in range(X.shape[1]):
                diff = X[:, j] - c[k, j]
                acc = acc + diff * diff
            d[:, k] = acc
        return d

    cent = X[:_IVF_CELLS].copy()
    for _ in range(_IVF_TRAIN_ITERS):
        cid = dists(cent).argmin(axis=1)  # first (lowest cell) on ties
        new = cent.copy()
        for k in range(_IVF_CELLS):
            m = cid == k
            if m.any():
                new[k] = _quantize_nano(X[m]).sum(axis=0) / (m.sum() * 1e9)
        cent = new
    return cent, dists(cent)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_ann_sign_and_argmax_margins(sf):
    """ADVICE r8 #4 (updated for the round-10 trained quantizer): the
    sim_ann_lsh oracle compares different summation orders (DuckDB
    list_dot_product vs Spark's sequential fold), so a hyperplane dot
    product near 0 could flip a sketch bit cross-engine — pin the
    fixture margin far above the ~1e-15 reordering noise. The IVF
    family's assignment distances are bit-identical cross-engine by
    construction (shared sequential fold + bit-identical trained
    centroids, the ml_kmeans_lloyd proof), so ties cannot DIVERGE —
    but pin the top-2 trained-cell distance gap anyway as a fixture
    drift tripwire (an exact tie would mean the lowest-cell tiebreak
    is doing semantic work)."""
    from pg_archiver_spark.functions.similarity import _hyperplanes

    X, _ = _embeddings(sf)
    H = np.array(_hyperplanes(), dtype=np.float64)
    min_dot = np.abs(X @ H.T).min()
    assert min_dot > 1e-9, min_dot

    _, d = _ivf_numpy_train(X)
    top2 = np.sort(d, axis=1)[:, :2]
    min_gap = (top2[:, 1] - top2[:, 0]).min()
    assert min_gap > 1e-9, min_gap


# ------------------------------------------- novelty short-doc guard


def test_ngram_novelty_short_doc_guard(spark, tmp_path):
    """ADVICE r8 #2: a document with fewer than NOVELTY_NGRAM tokens
    must yield an empty gram list (not a slice(...,0,3) crash), and
    the Spark op must still match the DuckDB oracle on such a
    fixture."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "one",  # 1 token: previously crashed Spark
                "two tokens",  # 2 tokens: ditto
                "alpha beta gamma delta",
                "alpha beta gamma epsilon",
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))

    out = QUERIES["text_ngram_novelty_decay"](spark, str(tmp_path))
    spark_rows = sorted(tuple(r) for r in out.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle_rows = sorted(
        tuple(r) for r in con.execute(
            ORACLES["text_ngram_novelty_decay"]
        ).fetchall()
    )
    assert spark_rows == oracle_rows
    # Docs 0 and 1 contribute no grams: totals come from docs 2-3 only.
    assert sum(r[2] for r in spark_rows) == 4


# ------------------------------------------------- version coupling


def test_watermark_late_semantics_are_version_pinned():
    """ADVICE r8 #5: stream_watermark_late's oracle hard-codes an
    empirically discovered Spark 4.1 behavior — late rows below the
    watermark whose window state was already evicted create FRESH
    state and emit at the final commit (best-effort dropping, per
    Spark's own caveat). A Spark upgrade that changes late-row
    disposition will hash-fail that op BY DESIGN; this assert makes
    the failure attributable in seconds instead of a debugging
    session. On a version bump: re-verify the emitted window set
    window-for-window (see streaming/archival.py oracle comment) and
    then move this pin."""
    import pyspark

    assert pyspark.__version__.startswith("4.1."), (
        "Spark version changed — stream_watermark_late's oracle pins "
        "4.1.x late-row emission semantics; re-verify before bumping "
        f"this pin (got {pyspark.__version__})"
    )


# ------------------------------------------------- round-9 new ops


def test_logreg_inference_gate_consistency(spark, sf_dir):
    """The gate must (a) score every embedding exactly once, (b) keep
    a y=1-enriched set — the trained probe separates label<5 from the
    rest better than chance on its own training data — and (c) agree
    with a NumPy replay of the trained model (independent-reference
    check: a same-wrong shared expression tree is invisible to the
    hash gate)."""
    import duckdb as _duck

    from pg_archiver_spark.functions.similarity import (
        _LR_GATE_NANO,
        _lr_trained_weights,
    )

    rows = QUERIES["ml_logreg_inference_gate"](spark, sf_dir).collect()
    total = sum(r.n_vecs for r in rows)
    con = _duck.connect()
    n_emb = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert total == n_emb
    kept_pos = sum(r.n_kept for r in rows if r.label < 5)
    kept_neg = sum(r.n_kept for r in rows if r.label >= 5)
    n_pos = sum(r.n_vecs for r in rows if r.label < 5)
    n_neg = sum(r.n_vecs for r in rows if r.label >= 5)
    assert kept_pos / n_pos > kept_neg / n_neg

    # NumPy replay: same weights, float64 sigmoid (libm differs from
    # the shared Taylor tree by <1e-12 ≪ the 1e-9 quantization step,
    # so quantized scores match up to ±1 nano on boundary rows; kept
    # counts must match exactly away from p=0.5 ± 1e-12).
    w, b = _lr_trained_weights(spark, sf_dir)
    emb_rows = con.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    X = np.array([r[1] for r in emb_rows], dtype=np.float64)
    labels = np.array([r[0] for r in emb_rows])
    z = np.zeros(len(X))
    for j in range(X.shape[1]):  # left-assoc fold, matching the op
        z = z + X[:, j] * w[j]
    z = z + b
    p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
    pq = np.where(p >= 0, np.floor(p * 1e9 + 0.5), 0).astype(np.int64)
    boundary = np.abs(p - _LR_GATE_NANO / 1e9) < 1e-9
    assert not boundary.any(), "gate threshold sits on a score boundary"
    for r in rows:
        m = labels == r.label
        assert int((pq[m] >= _LR_GATE_NANO).sum()) == r.n_kept
        assert abs(int(pq[m].sum()) - r.sum_score_nano) <= int(m.sum())


def test_decontaminate_13gram_matches_bruteforce(spark, sf_dir):
    """Brute-force the Brown et al. doc-level verdicts in Python sets
    and compare per-language counts; also pin that short docs count in
    n_train but never in the gram join."""
    import duckdb as _duck
    import hashlib

    from pg_archiver_spark.functions.curation import (
        _BENCH_CHARS,
        DECONTAM_NGRAM,
    )

    con = _duck.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    bench_grams: set[str] = set()
    info = []
    for doc_id, lang, text in docs:
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + DECONTAM_NGRAM])
            for i in range(len(toks) - DECONTAM_NGRAM + 1)
        }
        is_bench = hashlib.md5(str(doc_id).encode()).hexdigest()[0] in _BENCH_CHARS
        info.append((doc_id, lang, is_bench, grams))
        if is_bench:
            bench_grams |= grams
    expect: dict[str, list[int]] = {}
    dirty_by_lang: dict[str, set[str]] = {}
    for doc_id, lang, is_bench, grams in info:
        e = expect.setdefault(lang, [0, 0, 0])
        if is_bench:
            e[1] += 1
        else:
            e[0] += 1
            hit = grams & bench_grams
            if hit:
                e[2] += 1
                dirty_by_lang.setdefault(lang, set()).update(hit)
    rows = QUERIES["pipeline_decontaminate_13gram"](spark, sf_dir).collect()
    got = {
        r.lang: (r.n_train, r.n_benchmark, r.n_dirty, r.dirty_grams)
        for r in rows
    }
    assert got == {
        lang: (e[0], e[1], e[2], len(dirty_by_lang.get(lang, set())))
        for lang, e in expect.items()
    }


def test_decontaminate_spans_matches_bruteforce(spark, sf_dir):
    """Brute-force the span surgery in Python (explicit interval
    merging over token indices) and compare the per-language audit;
    also pin the invariants tokens_after < tokens_before and that
    every dirty doc from the doc-level op is dirty here too."""
    import duckdb as _duck
    import hashlib

    from pg_archiver_spark.functions.curation import (
        _BENCH_CHARS,
        DECONTAM_MIN_SPAN,
        DECONTAM_NGRAM,
        DECONTAM_PAD,
    )

    con = _duck.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    bench_grams: set[str] = set()
    parsed = []
    for doc_id, lang, text in docs:
        toks = text.split(" ")
        grams = [
            " ".join(toks[i : i + DECONTAM_NGRAM])
            for i in range(len(toks) - DECONTAM_NGRAM + 1)
        ]
        is_bench = (
            hashlib.md5(str(doc_id).encode()).hexdigest()[0] in _BENCH_CHARS
        )
        parsed.append((doc_id, lang, is_bench, len(toks), grams))
        if is_bench:
            bench_grams.update(grams)
    expect: dict[str, list[int]] = {}
    for doc_id, lang, is_bench, n_tok, grams in parsed:
        if is_bench:
            continue
        ivs = []
        for i, g in enumerate(grams):
            if g in bench_grams:
                ivs.append(
                    (
                        max(i - DECONTAM_PAD, 0),
                        min(i + DECONTAM_NGRAM + DECONTAM_PAD, n_tok),
                    )
                )
        if not ivs:
            continue
        ivs = sorted(set(ivs))
        merged = [list(ivs[0])]
        for s, e in ivs[1:]:
            if s > merged[-1][1]:
                merged.append([s, e])
            else:
                merged[-1][1] = max(merged[-1][1], e)
        spans = []
        prev = 0
        for s, e in merged:
            spans.append(s - prev)
            prev = e
        spans.append(n_tok - prev)
        kept = [x for x in spans if x >= DECONTAM_MIN_SPAN]
        agg = expect.setdefault(lang, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += len(kept)
        agg[2] += n_tok
        agg[3] += sum(kept)
    rows = QUERIES["pipeline_decontaminate_spans"](spark, sf_dir).collect()
    got = {
        r.lang: [r.n_dirty_docs, r.n_spans_kept, r.tokens_before, r.tokens_after]
        for r in rows
    }
    assert got == expect
    for r in rows:
        assert r.tokens_after < r.tokens_before
    # Consistency with the doc-level op: same dirty-doc totals.
    doc_level = QUERIES["pipeline_decontaminate_13gram"](spark, sf_dir).collect()
    assert sum(r.n_dirty for r in doc_level) == sum(
        r.n_dirty_docs for r in rows
    )


# ------------------------------------------ span-surgery property test


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    docs=st.lists(
        st.lists(
            # Tiny alphabet so cross-doc 13-gram collisions are common;
            # lengths straddle the 13-token gram threshold and the
            # min-span boundary.
            st.sampled_from(["a", "b"]),
            min_size=0,
            max_size=40,
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_decontaminate_spans_oracle_property(docs):
    """The span-surgery ORACLE (which the gate proves equal to the
    Spark op) must match an independent Python interval-merge reference
    for ANY corpus — exercising edges the fixture cannot produce:
    all-dirty docs, collisions at position 0 / end-of-doc, adjacent
    (touching) excision windows, empty docs, sub-13-token docs. Runs
    DuckDB-only per example (no Spark job), so examples are cheap."""
    import hashlib

    import duckdb as _duck
    import pandas as pd

    from pg_archiver_spark.functions.curation import (
        _BENCH_CHARS,
        DECONTAM_MIN_SPAN,
        DECONTAM_NGRAM,
        DECONTAM_PAD,
    )
    from pg_archiver_spark.registry import ORACLES

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "lang": ["xx"] * len(docs),
            "text": [" ".join(toks) for toks in docs],
        }
    )
    con = _duck.connect()
    con.register("documents", pdf)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            ORACLES["pipeline_decontaminate_spans"]
        ).fetchall()
    }

    bench_grams: set[str] = set()
    parsed = []
    for doc_id, toks in enumerate(docs):
        # Match the ops' tokenization: split(' ') on the joined text —
        # an empty doc still yields one empty token.
        toks = " ".join(toks).split(" ")
        grams = [
            " ".join(toks[i : i + DECONTAM_NGRAM])
            for i in range(len(toks) - DECONTAM_NGRAM + 1)
        ]
        is_bench = (
            hashlib.md5(str(doc_id).encode()).hexdigest()[0] in _BENCH_CHARS
        )
        parsed.append((doc_id, is_bench, len(toks), grams))
        if is_bench:
            bench_grams.update(grams)
    agg = [0, 0, 0, 0]
    for doc_id, is_bench, n_tok, grams in parsed:
        if is_bench:
            continue
        ivs = sorted(
            {
                (
                    max(i - DECONTAM_PAD, 0),
                    min(i + DECONTAM_NGRAM + DECONTAM_PAD, n_tok),
                )
                for i, g in enumerate(grams)
                if g in bench_grams
            }
        )
        if not ivs:
            continue
        merged = [list(ivs[0])]
        for s, e in ivs[1:]:
            if s > merged[-1][1]:
                merged.append([s, e])
            else:
                merged[-1][1] = max(merged[-1][1], e)
        spans, prev = [], 0
        for s, e in merged:
            spans.append(s - prev)
            prev = e
        spans.append(n_tok - prev)
        kept = [x for x in spans if x >= DECONTAM_MIN_SPAN]
        agg[0] += 1
        agg[1] += len(kept)
        agg[2] += n_tok
        agg[3] += sum(kept)
    expect = {"xx": tuple(agg)} if agg[0] else {}
    assert got == expect


# ------------------------------------------ gopher repetition


@given(
    docs=st.lists(
        st.lists(
            # 3-word alphabet + short lists → heavy in-doc n-gram
            # repetition, exercising the dup-5-gram interval union the
            # fixture never fires.
            st.sampled_from(["x", "y", "z"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_gopher_repetition_oracle_property(docs):
    """The Gopher-repetition ORACLE (gate-proven equal to the Spark op)
    must match an independent Python reference for ANY corpus: top
    2-gram char fraction with lowest-gram tie-break, and duplicate
    5-gram CHARACTER coverage (overlap union, islands weighted by their
    char length incl. internal separators — ADVICE r9 #3)."""
    import duckdb as _duck
    import pandas as pd
    from collections import Counter

    from pg_archiver_spark.functions.text import (
        GOPHER_DUP5_MAX_PERMILLE,
        GOPHER_DUP_N,
        GOPHER_TOP2_MAX_PERMILLE,
    )
    from pg_archiver_spark.registry import ORACLES

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "lang": ["xx"] * len(docs),
            "text": [" ".join(t) for t in docs],
        }
    )
    con = _duck.connect()
    con.register("documents", pdf)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(ORACLES["text_gopher_repetition"]).fetchall()
    }

    n_docs = p_top2 = p_dup5 = p_all = 0
    for t in docs:
        toks = " ".join(t).split(" ")
        n, n_chars = len(toks), len(" ".join(t))
        n_docs += 1
        grams2 = Counter(
            " ".join(toks[i : i + 2]) for i in range(n - 1)
        )
        if grams2:
            # highest count, then lexicographically smallest gram
            g, c = sorted(grams2.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            top2 = c * len(g) * 1000 // n_chars
        else:
            top2 = 0
        ok_top2 = top2 <= GOPHER_TOP2_MAX_PERMILLE
        g5 = Counter(
            " ".join(toks[i : i + GOPHER_DUP_N])
            for i in range(n - GOPHER_DUP_N + 1)
        )
        covered_pos: set[int] = set()
        for i in range(n - GOPHER_DUP_N + 1):
            if g5[" ".join(toks[i : i + GOPHER_DUP_N])] >= 2:
                covered_pos.update(range(i, i + GOPHER_DUP_N))
        # Independent char-coverage reference: maximal runs of covered
        # token positions, each weighted by the chars of its joined
        # tokens (separators inside the run count, gaps don't).
        covered_chars = 0
        run: list[int] = []
        for p in sorted(covered_pos) + [-2]:
            if run and p != run[-1] + 1:
                covered_chars += len(" ".join(toks[run[0] : run[-1] + 1]))
                run = []
            run.append(p)
        # n_chars == 0 (a single empty token): both engines yield NULL
        # from the integer division (Spark DIV 0, DuckDB // 0), and a
        # NULL predicate counts as a FAIL in the CASE/when sums.
        ok_dup5 = (
            n_chars > 0
            and covered_chars * 1000 // n_chars <= GOPHER_DUP5_MAX_PERMILLE
        )
        p_top2 += ok_top2
        p_dup5 += ok_dup5
        p_all += ok_top2 and ok_dup5
    assert got == {"xx": (n_docs, p_top2, p_dup5, p_all)}


# ------------------------------------------------- ANN recall eval


def test_ann_recall_eval_matches_numpy(spark, sf_dir):
    """Full NumPy replay of the recall@10 report (round 10: TRAINED
    coarse quantizer): quantized-Lloyd centroids, argmin-squared-L2
    assignment (lowest-cell ties), top-3 probe sets by (cdist, cell),
    exact/single/multi rankings by (4dp-rounded cosine desc, vec_id) —
    the independent-reference check; plus the dominance invariant
    multi ≥ single per query."""
    from pg_archiver_spark.functions.similarity import (
        _IVF_CELLS,
        _KNN_BATCH_IDS,
        _MULTIPROBE_CELLS,
        _RECALL_K,
    )

    rows = QUERIES["sim_ann_recall_eval"](spark, sf_dir).collect()
    assert [r.q_id for r in rows] == sorted(_KNN_BATCH_IDS)
    for r in rows:
        assert r.n_exact == _RECALL_K
        assert 0 <= r.hits_single <= r.hits_multi <= _RECALL_K

    X, _ = _embeddings(sf_dir)
    norms = np.linalg.norm(X, axis=1)
    _, d = _ivf_numpy_train(X)
    cell = d.argmin(axis=1)  # argmin; ties -> lowest cell

    def topk(q, idx_pool):
        sims = X[idx_pool] @ X[q] / (norms[idx_pool] * norms[q])
        order = sorted(
            zip(np.round(sims, 4), -np.array(idx_pool)),
            key=lambda t: (t[0], t[1]),
            reverse=True,
        )
        return {int(-i) for _, i in order[:_RECALL_K]}

    all_ids = np.arange(len(X))
    for r in rows:
        q = r.q_id
        pool = [int(i) for i in all_ids if i != q]
        exact = topk(q, pool)
        own = [int(i) for i in all_ids if cell[i] == cell[q] and i != q]
        single = topk(q, own) if own else set()
        probes = sorted(
            range(_IVF_CELLS), key=lambda c: (d[q, c], c)
        )[:_MULTIPROBE_CELLS]
        probed = [
            int(i) for i in all_ids if cell[i] in probes and i != q
        ]
        multi = topk(q, probed) if probed else set()
        assert r.hits_single == len(exact & single), q
        assert r.hits_multi == len(exact & multi), q
