"""Round-11 additions (VERDICT r10 item #2): the pretraining-pipeline
composition capstone. The op is sql-checked end to end by the gate;
these tests pin the CROSS-OP consistency the hash gate cannot see —
that the funnel's per-stage counts agree with the standalone stage
operators they are built from — plus funnel structure and determinism."""

from __future__ import annotations

import math

from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def _funnel(spark):
    rows = QUERIES["pipeline_pretraining_e2e"](spark, SF).collect()
    return {r.lang: r for r in rows}


def test_pretraining_e2e_funnel_is_monotone(spark):
    """Each stage can only shrink its input: the per-language survivor
    counts must be non-increasing along the chain, token yields
    non-increasing across the two accounting points, and the batch
    count bounded by the final doc count."""
    f = _funnel(spark)
    assert f  # at least one language
    for lang, r in f.items():
        chain = [
            r.docs_in,
            r.n_quality_len,
            r.n_quality_rep,
            r.n_decontam,
            r.n_dedup,
            r.n_dsir,
            r.n_mix,
        ]
        assert all(
            a >= b for a, b in zip(chain, chain[1:])
        ), (lang, chain)
        assert r.tokens_in >= r.tokens_decontam >= 0, lang
        # tokens_final counts only stage-6 survivors
        assert r.tokens_decontam >= r.tokens_final >= 0, lang
        assert 0 <= r.n_batches <= max(r.n_mix, 0) or (
            r.n_mix == 0 and r.n_batches == 0
        ), lang
        if r.n_mix > 0:
            assert r.n_batches >= 1, lang


def test_pretraining_e2e_stage1_equals_gopher_rules(spark):
    """Funnel stage 1 applies the Gopher length rules to ALL incoming
    docs, so its per-language survivor count must EQUAL the standalone
    text_gopher_rules pass_all — the two run the same shared
    _gopher_len_flags frame."""
    f = _funnel(spark)
    rules = {
        r.lang: r for r in QUERIES["text_gopher_rules"](spark, SF).collect()
    }
    assert set(f) == set(rules)
    for lang in f:
        assert f[lang].docs_in == rules[lang].n_docs, lang
        assert f[lang].n_quality_len == rules[lang].pass_all, lang


def test_pretraining_e2e_stage2_within_inclusion_exclusion(spark):
    """Stage 2 intersects the stage-1 survivors with the repetition
    pass set. The standalone text_gopher_repetition reports the
    corpus-wide repetition pass count, so the intersection is bounded
    by inclusion-exclusion: max(0, len + rep - n) <= stage2 <=
    min(len, rep)."""
    f = _funnel(spark)
    rep = {
        r.lang: r
        for r in QUERIES["text_gopher_repetition"](spark, SF).collect()
    }
    for lang in f:
        n = f[lang].docs_in
        a = f[lang].n_quality_len
        b = rep[lang].pass_all
        lo, hi = max(0, a + b - n), min(a, b)
        assert lo <= f[lang].n_quality_rep <= hi, (lang, lo, hi)


def test_pretraining_e2e_dedup_losers_subset_of_corpus_pairs(spark):
    """Stage 4 drops the higher doc_id of each near-dup pair among
    stage-3 SURVIVORS; because Jaccard is pairwise, the survivor loser
    set is a subset of the corpus-wide loser set — so the total docs
    dropped at stage 4 is bounded by the distinct doc2 count of the
    corpus-wide exact pair list (dedup_ngram_jaccard = minhash_neardup
    ground truth)."""
    f = _funnel(spark)
    dropped = sum(r.n_decontam - r.n_dedup for r in f.values())
    corpus_losers = {
        r.doc2 for r in QUERIES["dedup_ngram_jaccard"](spark, SF).collect()
    }
    assert dropped <= len(corpus_losers), (dropped, len(corpus_losers))


def test_pretraining_e2e_global_batches_are_dense(spark):
    """Length batching cuts the final corpus into ceil(n / BATCH_SIZE)
    consecutive batches; the per-language distinct-batch counts must
    each fit inside that global budget, and the busiest language must
    touch at least ceil(its_docs / BATCH_SIZE) batches."""
    from pg_archiver_spark.functions.curation import BATCH_SIZE

    f = _funnel(spark)
    total = sum(r.n_mix for r in f.values())
    n_global = math.ceil(total / BATCH_SIZE)
    for lang, r in f.items():
        assert r.n_batches <= n_global, (lang, r.n_batches, n_global)
        assert r.n_batches >= math.ceil(r.n_mix / BATCH_SIZE), lang


def test_pretraining_e2e_deterministic(spark):
    """Two runs produce identical funnels (md5 draws, deterministic
    tie-breaks, no RNG state anywhere in the chain)."""
    a = QUERIES["pipeline_pretraining_e2e"](spark, SF).collect()
    b = QUERIES["pipeline_pretraining_e2e"](spark, SF).collect()
    assert a == b
