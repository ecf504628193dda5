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


# ------------------------------------------- DoReMi domain reweight


def test_domain_reweight_iterates_replay_exactly(spark):
    """Given the op's OWN integer loss/excess outputs, an independent
    Python replay of the DOREMI_ROUNDS multiplicative-weights iterates
    must reproduce weight_ppb exactly — the iterate algebra is pure
    integer floor-division, so any drift is a real defect, not
    tolerance."""
    from pg_archiver_spark.functions.curation import (
        DOREMI_ETA_DIV,
        DOREMI_NORM,
        DOREMI_ROUNDS,
        DOREMI_SCALE,
    )

    rows = QUERIES["pipeline_domain_reweight"](spark, SF).collect()
    ex = {r.source: r.excess_micro for r in rows}
    w = {s: DOREMI_NORM // len(ex) for s in ex}
    for _ in range(DOREMI_ROUNDS):
        u = {
            s: w[s] * (DOREMI_SCALE + ex[s] // DOREMI_ETA_DIV)
            // DOREMI_SCALE
            for s in ex
        }
        z = sum(u.values())
        w = {s: u[s] * DOREMI_NORM // z for s in ex}
    got = {r.source: r.weight_ppb for r in rows}
    assert got == w
    # hardest domain carries the largest weight; easiest the smallest
    hardest = max(ex, key=lambda s: (ex[s], s))
    easiest = min(ex, key=lambda s: (ex[s], s))
    assert got[hardest] == max(got.values())
    assert got[easiest] == min(got.values())
    # weights stay a (floor-rounded) distribution over NORM
    assert 0 < sum(got.values()) <= DOREMI_NORM


def test_domain_reweight_loss_matches_mathlog(spark):
    """The SAME-WRONG check the hash gate cannot do (both engines share
    the ladder expression tree): recompute each source's mean bucket
    surprise with hashlib md5 + math.log and require agreement within
    the quantization slack (1 micro-nat per gram floor + 1 for the
    final mean floor)."""
    import hashlib
    import math

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.curation import DSIR_BUCKETS

    docs = load(spark, SF, "documents").select("source", "text").collect()
    cnt: dict[int, int] = {}
    per_src: dict[str, list[int]] = {}
    for r in docs:
        ws = r.text.split(" ")
        grams = ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        bks = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS
            for g in grams
        ]
        per_src.setdefault(r.source, []).extend(bks)
        for bk in bks:
            cnt[bk] = cnt.get(bk, 0) + 1
    tot = sum(cnt.values())
    lnp = {
        b: math.log(cnt.get(b, 0) + 1) - math.log(tot + DSIR_BUCKETS)
        for b in range(DSIR_BUCKETS)
    }
    rows = QUERIES["pipeline_domain_reweight"](spark, SF).collect()
    for r in rows:
        bks = per_src[r.source]
        assert r.n_grams == len(bks)
        approx = sum(-lnp[b] * 1e6 for b in bks) / len(bks)
        assert abs(r.loss_micro - approx) <= 2.0, (r.source, approx)


# --------------------------------------------- perplexity gate


def test_perplexity_filter_threshold_matches_mathlog(spark):
    """Independent math.log replay of the bigram model and the
    per-language mean-of-doc-means threshold; agreement within the
    floor-quantization slack (1 micro per bigram + 1 per doc mean +
    1 for the threshold mean)."""
    import math

    from pg_archiver_spark.catalog import load

    docs = load(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for r in docs:
        ws = r.text.split(" ")
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    per_lang: dict[str, list[float]] = {}
    n_scored: dict[str, int] = {}
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) < 2:
            continue
        s = sum(
            -(math.log(c2[(a, b)] + 1) - math.log(c1[a] + v)) * 1e6
            for a, b in zip(ws, ws[1:])
        ) / (len(ws) - 1)
        per_lang.setdefault(r.lang, []).append(s)
        n_scored[r.lang] = n_scored.get(r.lang, 0) + 1
    rows = QUERIES["text_perplexity_filter"](spark, SF).collect()
    for r in rows:
        assert r.n_scored == n_scored.get(r.lang, 0), r.lang
        approx_thr = sum(per_lang[r.lang]) / len(per_lang[r.lang])
        assert abs(r.thr_micro - approx_thr) <= 3.0, (r.lang, approx_thr)


def test_perplexity_filter_splits_nontrivially(spark):
    """Per language: the threshold sits inside [min, max], the gate
    keeps at least one doc and (whenever surprise varies at all)
    drops at least one — a mean split can only be trivial if every
    doc scores identically."""
    rows = QUERIES["text_perplexity_filter"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= r.n_scored >= 1, r.lang
        assert r.min_surprise_micro <= r.thr_micro <= r.max_surprise_micro
        assert 1 <= r.n_pass <= r.n_scored, r.lang
        if r.min_surprise_micro < r.max_surprise_micro:
            assert r.n_pass < r.n_scored, r.lang


def test_perplexity_filter_unscored_lang_sentinel(spark, tmp_path):
    """Post-close review (r11): a language whose docs are ALL
    single-token has no bigrams to score — thr/min/max must be the
    -1 sentinel (NOT NULL: pandas NaN != Spark None under the driver
    compare, G13c) and the Spark result must match the DuckDB oracle
    row-for-row on this controlled corpus."""
    import duckdb as _duck
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_archiver_spark.registry import ORACLES

    rows = [
        {"doc_id": 1, "lang": "en", "text": "a b c a b"},
        {"doc_id": 2, "lang": "en", "text": "a b d e f g"},
        {"doc_id": 3, "lang": "xx", "text": "lonely"},
        {"doc_id": 4, "lang": "xx", "text": "single"},
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)),
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r.lang: r
        for r in QUERIES["text_perplexity_filter"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["xx"].n_scored == 0
    assert out["xx"].thr_micro == -1
    assert out["xx"].min_surprise_micro == -1
    assert out["xx"].max_surprise_micro == -1
    assert out["xx"].n_pass == 0
    assert out["en"].n_scored == 2 and out["en"].thr_micro > 0

    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.execute(ORACLES["text_perplexity_filter"]).df()
    for _, o in odf.iterrows():
        s = out[o["lang"]]
        assert int(o["thr_micro"]) == s.thr_micro
        assert int(o["n_pass"]) == s.n_pass
        assert int(o["min_surprise_micro"]) == s.min_surprise_micro
        assert int(o["max_surprise_micro"]) == s.max_surprise_micro
