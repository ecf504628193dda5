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


# ------------------------- round-11 budget ops: BM25 + bitext margin


def test_bm25_matches_float_reference(spark):
    """Independent float replay: Robertson-idf ln((N-df+0.5)/(df+0.5)+1)
    (algebraically ln((2N+2)/(2df+1)), the op's ladder input) and the
    k1=1.2/b=0.75 saturation in plain Python floats; the op's integer
    micro scores must agree within the quantization slack (ladder pico
    round + idf DIV 1e6 + one truncating DIV per term: ~2.3 micro per
    matched term)."""
    import math

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.text import _BM25_QUERIES

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, SF, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    n = len(docs)
    t_tok = sum(len(ws) for ws in docs.values())
    avgdl = t_tok / n
    terms = {w for _, q in _BM25_QUERIES for w in q.split(" ")}
    df = {
        w: sum(1 for ws in docs.values() if w in ws) for w in terms
    }
    ref: dict[tuple, float] = {}
    for qid, q in _BM25_QUERIES:
        for doc_id, ws in docs.items():
            s = 0.0
            for w in set(q.split(" ")):
                tf = ws.count(w)
                if tf == 0:
                    continue
                idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                s += (
                    idf
                    * tf
                    * 2.2
                    / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
                )
            if s > 0:
                ref[(qid, doc_id)] = s * 1e6
    rows = QUERIES["sim_bm25_topk"](spark, SF).collect()
    assert len(rows) == 20  # 4 queries x top-5
    for r in rows:
        assert abs(r.score_micro - ref[(r.query_id, r.doc_id)]) <= (
            2.3 * r.n_terms + 1
        ), (r.query_id, r.doc_id)
    # and the op's top-1 per query is the float reference's argmax
    # (margin between ranks far exceeds the micro slack on fixtures)
    for qid, _ in _BM25_QUERIES:
        best_ref = max(
            (
                (s, -d)
                for (q, d), s in ref.items()
                if q == qid
            ),
        )
        got = [r for r in rows if r.query_id == qid and r.rank == 1]
        assert got[0].doc_id == -best_ref[1]


def test_bm25_ladder_pinned_on_bm25_ranges(spark):
    """The pico-ln ladder gets NEW (c, t) ranges from BM25:
    c = 2df+1 up to 2N+1, t = 2N+2 with N = 500..5000 docs. Pin
    q = round((ln c - ln t)*1e12) against math.log on these ranges."""
    import math

    import duckdb as _duck

    from pg_archiver_spark.functions.curation import _unigram_q_stages

    cases = [
        (1, 1002),
        (3, 1002),
        (999, 1002),
        (1001, 1002),
        (1, 10002),
        (4999, 10002),
        (9999, 10002),
        (10001, 10002),
    ]
    con = _duck.connect()
    for c, t in cases:
        sql = f"SELECT {c}::BIGINT AS c, {t}::BIGINT AS t"
        for stage in _unigram_q_stages():
            sql = f"SELECT *, {', '.join(stage)} FROM ({sql})"
        got = con.execute(f"SELECT q FROM ({sql})").fetchone()[0]
        want = round((math.log(c) - math.log(t)) * 1e12)
        assert abs(got - want) <= 1, (c, t, got, want)


def test_bitext_margin_numpy_replay(spark):
    """Full numpy replay of the mining pipeline — e4 cosine grid,
    top-4 neighborhood sums both directions, margin, argmax — must
    reproduce the op's mined pairs and counts exactly."""
    import numpy as np

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.similarity import (
        BITEXT_K,
        BITEXT_MARGIN_THR,
        BITEXT_PANEL,
    )

    emb = load(spark, SF, "embeddings").select(
        "vec_id", "embedding", "label"
    ).collect()
    srcs = sorted(
        [r for r in emb if r.label == 0], key=lambda r: r.vec_id
    )[:BITEXT_PANEL]
    tgts = sorted([r for r in emb if r.label == 1], key=lambda r: r.vec_id)
    s = np.array([r.embedding for r in srcs], dtype=np.float64)
    t = np.array([r.embedding for r in tgts], dtype=np.float64)
    sid = [r.vec_id for r in srcs]
    tid = [r.vec_id for r in tgts]
    cos = (s @ t.T) / (
        np.linalg.norm(s, axis=1)[:, None]
        * np.linalg.norm(t, axis=1)[None, :]
    )
    c4 = np.round(cos * 10000).astype(np.int64)
    # top-k sums: ranks tie-break on ascending id, ids are ascending
    # in the arrays, and numpy argsort is stable
    dx = np.array(
        [
            int(np.sort(row)[::-1][:BITEXT_K].sum())
            for row in c4
        ]
    )
    dy = np.array(
        [
            int(np.sort(col)[::-1][:BITEXT_K].sum())
            for col in c4.T
        ]
    )
    nx, ny = min(BITEXT_K, len(tid)), min(BITEXT_K, len(sid))
    marg = np.round(
        c4 / ((dx[:, None] / nx + dy[None, :] / ny) / 2.0), 6
    )
    rows = {
        r.src_id: r
        for r in QUERIES["sim_bitext_margin_mine"](spark, SF).collect()
    }
    assert len(rows) == BITEXT_PANEL
    for i, x in enumerate(sid):
        order = sorted(
            range(len(tid)), key=lambda j: (-marg[i, j], tid[j])
        )
        j = order[0]
        r = rows[x]
        assert r.best_tgt == tid[j], x
        assert r.cos_e4 == c4[i, j], x
        assert abs(r.margin - marg[i, j]) < 1e-9, x
        assert r.n_scored == len(tid), x
        assert r.n_above == int(
            (marg[i] >= BITEXT_MARGIN_THR).sum()
        ), x


def test_bitext_margin_demotes_hub_target(spark, tmp_path):
    """Controlled-corpus semantics — the exact failure mode the ratio
    margin exists to fix: a HUB target that raw cosine would mine for
    EVERY probe loses to each probe's true match under the margin,
    because the hub's own neighborhood (the 4 decoy probes sitting on
    its axis) is even closer to it, inflating its denominator."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 8

    def v(*pairs):
        out = [0.0] * dim
        for i, x in pairs:
            out[i] = x
        return out

    rows = []
    # 12 real probes (label 0): axis p%4 at 0.9 plus a 1.0 component
    # on axis 6 (the hub axis) — so cos(probe, hub) > cos(probe, true)
    # and raw cosine picks the hub for every one of them.
    for p in range(12):
        rows.append(
            {
                "vec_id": p,
                "embedding": v((p % 4, 0.9), (6, 1.0)),
                "label": 0,
            }
        )
    # 4 decoy probes: pure axis-6 — the hub's backward k-NN
    # neighborhood, which drives its margin denominator up.
    for p in range(12, 16):
        rows.append(
            {"vec_id": p, "embedding": v((6, 1.0)), "label": 0}
        )
    # true matches (label 1): one per axis, id 100+axis
    for a in range(4):
        rows.append(
            {"vec_id": 100 + a, "embedding": v((a, 1.0)), "label": 1}
        )
    rows.append({"vec_id": 200, "embedding": v((6, 1.0)), "label": 1})
    # filler targets so the k=4 neighborhoods are populated
    for f in range(8):
        rows.append(
            {
                "vec_id": 300 + f,
                "embedding": v((7, 1.0), (f % 4, 0.1)),
                "label": 1,
            }
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)),
        str(tmp_path / "embeddings.parquet"),
    )
    out = {
        r.src_id: r
        for r in QUERIES["sim_bitext_margin_mine"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 16
    # premise: raw cosine (the mined pair's own cos_e4 is NOT the
    # probe's max) — the hub is cosine-closer than the mined match
    hub = {r["vec_id"]: r["embedding"] for r in rows}[200]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb)

    for p in range(12):
        probe = rows[p]["embedding"]
        true = rows[12 + 4 + (p % 4)]["embedding"]
        assert cos(probe, hub) > cos(probe, true)  # raw prefers hub
        assert out[p].best_tgt == 100 + (p % 4), (
            p,
            out[p].best_tgt,
        )  # margin recovers the true match
