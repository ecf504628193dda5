"""Similarity-search quality tests: the approximate paths must agree
with the exact baseline on the fixture."""

from __future__ import annotations

from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def test_lsh_ann_finds_true_neighbors(spark, sf_dir):
    """Multi-probe LSH recall floor (deterministic hyperplanes → a
    fixed, regression-checkable number). The fixture's random N(0,0.1)
    embeddings are the worst case for sign sketches — true neighbors
    sit near 72° — so the floor is modest; measured tradeoff lives in
    sim_ann_lsh's docstring."""
    exact = [r.vec_id for r in QUERIES["sim_cosine_topk"](spark, sf_dir).collect()]
    approx = [r.vec_id for r in QUERIES["sim_ann_lsh"](spark, sf_dir).collect()]
    overlap = len(set(exact) & set(approx))
    assert overlap >= 3, f"LSH recall regressed: {overlap}/10 ({approx} vs {exact})"


def test_ivf_ann_returns_same_cell_neighbors(spark, sf_dir):
    """IVF probe returns top-k of the query's cell; every returned id
    must also score in the exact ranking's top half for its cell — a
    sanity check that assignment didn't scramble the scores."""
    rows = QUERIES["sim_ann_ivf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """The LSH path must recover the exact-Jaccard pair set on the
    fixture (planted near-dups are far above threshold, so 12×2 banding
    has ≈100% recall here)."""
    exact = {
        (r.doc1, r.doc2)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    lsh = {(r.doc1, r.doc2) for r in QUERIES["minhash_neardup"](spark, sf_dir).collect()}
    assert lsh == exact


def test_arrow_cosine_matches_exact_operator(spark, sf_dir):
    """The NumPy-matmul fast path must reproduce the interpreted
    zip_with/aggregate baseline: same top-10 ids in the same order,
    same similarities at the rounded precision (BLAS reordering sits
    ~1e-15 below the 4-decimal round)."""
    exact = QUERIES["sim_cosine_topk"](spark, sf_dir).collect()
    arrow = QUERIES["sim_cosine_topk_arrow"](spark, sf_dir).collect()
    assert [r.vec_id for r in arrow] == [r.vec_id for r in exact]
    for e, a in zip(exact, arrow):
        assert abs(e.cos_sim - a.cos_sim) < 1e-9, (e, a)


def test_batch_knn_ivf_recall_and_contract(spark, sf_dir):
    """The IVF-probed batch kNN must honor its approximation contract:
    every query answered, ≤3 ranked rows per query, and recall@3 vs the
    exact batch op above the pinned floor (measured 0.56-0.69 across
    SFs with nprobe=3 of 8 cells; floor leaves regression margin)."""
    exact = {
        (r.q_id, r.vec_id)
        for r in QUERIES["sim_batch_knn_join"](spark, sf_dir).collect()
    }
    rows = QUERIES["sim_batch_knn_ivf"](spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rnk)
    assert len(per_q) == 16, f"expected 16 queries answered, got {len(per_q)}"
    for q_id, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q_id, rnks)
        assert len(rnks) <= 3
    approx = {(r.q_id, r.vec_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF batch-kNN recall@3 regressed: {recall:.3f}"


def test_batch_knn_broadcast_is_fixed_size(spark, sf_dir):
    """The exact batch op's broadcast side must be the FIXED 16-id
    batch, not a corpus-proportional slice (round-4 scale fix): the
    broadcast exchange in the plan carries an isin filter, and the
    result has exactly 16 distinct query ids at every SF."""
    df = QUERIES["sim_batch_knn_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    q_ids = {r.q_id for r in df.select("q_id").distinct().collect()}
    assert len(q_ids) == 16


def test_shingle_df_cap_is_noop_on_fixture(spark, sf_dir):
    """The hot-shingle doc-frequency cap must be a NO-OP on fixtures —
    that is what keeps the DuckDB oracle exact while the cap bounds
    worst-case pair fan-out at scale. Pins (a) fixture max df strictly
    below MAX_SHINGLE_DF and (b) pair-set equality between the capped
    operator and an uncapped inline pair join."""
    from pyspark.sql import functions as F

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.dedup import (
        JACCARD_THRESHOLD,
        MAX_SHINGLE_DF,
        _shingles,
    )

    docs = load(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    max_df = ex.groupBy("shingle").count().agg(F.max("count")).first()[0]
    assert max_df < MAX_SHINGLE_DF, (
        f"fixture max shingle df {max_df} >= cap {MAX_SHINGLE_DF}: "
        "the cap would drop shingles and the oracle would diverge"
    )

    sh = docs.select(
        "doc_id",
        _shingles(F.col("text")).alias("shingles"),
    ).select("doc_id", "shingles", F.size("shingles").alias("n_sh"))
    e = sh.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    a = e.select(
        F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"), "shingle"
    )
    b = e.select(
        F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"), "shingle"
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    uncapped = {
        (r.doc1, r.doc2)
        for r in (
            a.join(b, "shingle")
            .filter(F.col("doc1") < F.col("doc2"))
            .groupBy("doc1", "doc2", "n1", "n2")
            .agg(F.count("*").alias("n_common"))
            .filter(jac >= JACCARD_THRESHOLD)
            .collect()
        )
    }
    capped = {
        (r.doc1, r.doc2)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert capped == uncapped
