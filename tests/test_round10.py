"""Round-10 additions (VERDICT r9 item #3): DSIR hashed-n-gram
importance resampling and the tokenizer-fertility fairness report.
Both ops are sql-checked by the gate; these tests pin SEMANTICS the
hash gate cannot see (selection behavior on a controlled corpus, a
from-scratch Python BPE reference, determinism)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _write_docs(tmp_path, rows) -> str:
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


# ------------------------------------------------------------- DSIR


def _dsir_ids():
    """doc_ids split by the op's md5-prefix rule, computed
    independently with hashlib."""
    from pg_archiver_spark.functions.curation import _DSIR_TARGET_CHARS

    tgt, raw = [], []
    for i in range(2000):
        h = hashlib.md5(str(i).encode()).hexdigest()[0]
        (tgt if h in _DSIR_TARGET_CHARS else raw).append(i)
    return tgt, raw


def test_dsir_keeps_target_like_and_drops_offtarget(spark, tmp_path):
    """Controlled-corpus semantics: raw docs IDENTICAL to the target
    sample get strongly positive log importance weights (accepted at
    any u, since q_u <= 0 always), while long unique-token junk docs
    score far below ln(2^-24)*1e12 — the md5 uniform's floor — so no
    draw can accept them. Selection must be exactly the target-like
    set; the held-out target sample itself is never selected."""
    tgt_ids, raw_ids = _dsir_ids()
    target_text = "alpha beta gamma alpha beta gamma"
    rows = [
        {"doc_id": i, "lang": "xx", "text": target_text}
        for i in tgt_ids[:8]
    ]
    match_ids = raw_ids[:3]
    rows += [
        {"doc_id": i, "lang": "xx", "text": target_text}
        for i in match_ids
    ]
    rows += [
        {
            "doc_id": i,
            "lang": "xx",
            "text": " ".join(f"junk{i}w{j}" for j in range(40)),
        }
        for i in raw_ids[3:23]
    ]
    out = QUERIES["pipeline_dsir_resample"](
        spark, _write_docs(tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == len(rows)
    assert r.n_target == 8
    assert r.n_selected == len(match_ids)


def test_dsir_fixture_invariants_and_determinism(spark, sf_dir):
    """On the real fixture: selected docs are a subset of the raw
    (non-target) pool in every language, every language appears, and
    the run is deterministic (md5 draws, not RNG)."""
    a = QUERIES["pipeline_dsir_resample"](spark, sf_dir).collect()
    b = QUERIES["pipeline_dsir_resample"](spark, sf_dir).collect()
    assert a == b
    assert len(a) == 5
    for r in a:
        assert 0 <= r.n_selected <= r.n_docs - r.n_target, r
        assert r.n_target > 0  # md5 split hits every fixture language


# ----------------------------------------------- tokenizer fertility


def _bpe_reference(texts: list[str], iters: int):
    """From-scratch Python BPE (Sennrich et al. 2016): weighted pair
    counts over the word vocabulary, greedy argmax with (a, b) lexical
    tie-break, leftmost non-overlapping merge application — the
    independent twin of _bpe_train's aggregate-fold."""
    from collections import Counter

    vocab = Counter(w for t in texts for w in t.split(" "))
    syms = {w: list(w) + ["</w>"] for w in vocab}
    for _ in range(iters):
        pairs: Counter = Counter()
        for w, cnt in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        (a, b), _n = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return syms


def test_fertility_matches_python_bpe_reference(spark, tmp_path):
    """Full pipeline parity on a controlled bilingual corpus: train
    the reference BPE, compute per-language fertility/compression/
    premium in plain Python integers, compare to the op."""
    from pg_archiver_spark.functions.curation import BPE_MERGE_ITERS

    rows = [
        {"doc_id": 0, "lang": "aa", "text": "low low lower lowest"},
        {"doc_id": 1, "lang": "aa", "text": "low lower low low"},
        {"doc_id": 2, "lang": "bb", "text": "zip zap zip zup zip"},
        {"doc_id": 3, "lang": "bb", "text": "zap zup zap zip zap"},
    ]
    out = {
        r.lang: r
        for r in QUERIES["pipeline_tokenizer_fertility"](
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    syms = _bpe_reference([r["text"] for r in rows], BPE_MERGE_ITERS)
    expect = {}
    for lang in ("aa", "bb"):
        words = [
            w
            for r in rows
            if r["lang"] == lang
            for w in r["text"].split(" ")
        ]
        n_words = len(words)
        n_chars = sum(len(w) for w in words)
        toks = sum(len(syms[w]) for w in words)
        expect[lang] = (n_words, n_chars, toks, toks * 1000 // n_words)
    ferts = [e[3] for e in expect.values()]
    for lang, (n_words, n_chars, toks, fert) in expect.items():
        r = out[lang]
        assert (r.n_words, r.n_chars, r.bpe_tokens) == (
            n_words,
            n_chars,
            toks,
        ), lang
        assert r.fertility_milli == fert
        assert r.chars_per_token_milli == n_chars * 1000 // toks
        assert r.premium_pm == (fert - min(ferts)) * 1000 // min(ferts)


def test_fertility_fixture_shape(spark, sf_dir):
    """Fixture sanity: 5 languages, fertility >= 1000 milli (a word is
    at least one token), exactly one best-served language at
    premium_pm == 0, chars/token positive."""
    rows = QUERIES["pipeline_tokenizer_fertility"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert min(r.premium_pm for r in rows) == 0
    for r in rows:
        assert r.fertility_milli >= 1000
        assert r.chars_per_token_milli > 0
        assert r.premium_pm >= 0


def test_dsir_ladder_matches_math_log_on_dsir_ranges():
    """The shared quantized-ln ladder is already pinned to math.log on
    vocabulary-count ranges (test_round7); DSIR feeds it NEW ranges —
    Laplace'd bucket counts up to corpus-gram scale and the 24-bit
    uniform against t = 2^24. A shared-fragment drift here would be
    same-wrong in both engines (hash-invisible), so pin q =
    round((ln c − ln t)·1e12) against the independent math.log
    reference to ±1 pico-grid unit across the magnitudes DSIR uses."""
    import math

    import duckdb as _duck

    from pg_archiver_spark.functions.curation import (
        _DSIR_U_DENOM,
        _unigram_q_stages,
    )

    cases = [
        (1, 64 + 1),
        (1, 2_000_000),
        (17, 153),
        (25_000, 1_700_000),
        (999_999, 4_000_000),
        (1, _DSIR_U_DENOM),
        (2, _DSIR_U_DENOM),
        (8_388_608, _DSIR_U_DENOM),  # u = 2^23: exact half ratio
        (16_777_215, _DSIR_U_DENOM),
        (_DSIR_U_DENOM, _DSIR_U_DENOM),  # ln(1) == 0 exactly
    ]
    rows = " UNION ALL ".join(
        f"SELECT CAST({c} AS BIGINT) AS c, CAST({t} AS BIGINT) AS t"
        for c, t in cases
    )
    sql, prev = f"WITH s0 AS ({rows})", "s0"
    for k, stage in enumerate(_unigram_q_stages()):
        sql += f", s{k + 1} AS (SELECT *, {', '.join(stage)} FROM {prev})"
        prev = f"s{k + 1}"
    sql += f" SELECT c, t, q FROM {prev} ORDER BY c, t"
    got = _duck.connect().execute(sql).fetchall()
    for c, t, q in got:
        expect = round((math.log(c) - math.log(t)) * 1e12)
        assert abs(q - expect) <= 1, (c, t, q, expect)
    assert any(q == 0 for _, _, q in got)  # the ln(1) row


# ------------------------------------------------ IVF centroid cache


def test_ivf_centroid_cache_is_keyed_per_corpus(spark):
    """The trained coarse quantizer is cached per sf_dir (the index is
    built once per corpus). A keying bug would silently serve one
    corpus's centroids to another inside a long-lived session (the
    driver and tools/check.py run every SF's ops in one process), so
    pin: different corpora yield different trained centroids, repeated
    calls return the identical cached object, the cache key resolves
    the ABSOLUTE path (same dir via a relative spelling must not
    retrain), and the key carries the file fingerprint (ADVICE r10 #1:
    a regenerated fixture must miss the stale entry and retrain)."""
    import os

    from pg_archiver_spark.functions.similarity import (
        _IVF_CENT_CACHE,
        _corpus_key,
        _ivf_centroids,
    )

    a = _ivf_centroids(spark, "/root/testdata/sf0.001")
    b = _ivf_centroids(spark, "/root/testdata/sf0.01")
    assert a != b  # different corpora -> different trained centroids
    assert _ivf_centroids(spark, "/root/testdata/sf0.001") is a
    rel = os.path.relpath("/root/testdata/sf0.001")
    assert _ivf_centroids(spark, rel) is a
    key = _corpus_key("/root/testdata/sf0.001")
    assert key in _IVF_CENT_CACHE
    # fingerprinted key: path alone is not enough to hit the cache
    assert key[0].endswith("/embeddings.parquet")
    st = os.stat(key[0])
    assert key[1:] == (st.st_mtime_ns, st.st_size)


# ------------------------------- DSIR full-corpus-logic property test


def _q_fn():
    """Shared-ladder q(c, t) evaluated through DuckDB once per distinct
    (c, t) — the ladder itself is pinned against math.log separately;
    this factors it out so the property test below exercises ONLY the
    corpus logic (buckets, integer sums, joins, accept decisions)."""
    import duckdb as _duck

    from pg_archiver_spark.functions.curation import _unigram_q_stages

    con = _duck.connect()
    cache: dict[tuple[int, int], int] = {}

    def q(c: int, t: int) -> int:
        key = (c, t)
        if key not in cache:
            sql = f"SELECT CAST({c} AS BIGINT) AS c, CAST({t} AS BIGINT) AS t"
            prev = f"({sql})"
            for stage in _unigram_q_stages():
                prev = f"(SELECT *, {', '.join(stage)} FROM {prev})"
            cache[key] = con.execute(f"SELECT q FROM {prev}").fetchone()[0]
        return cache[key]

    return q


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    docs=st.lists(
        st.lists(
            # Tiny alphabet -> heavy bucket collisions; includes multi-
            # token docs so bigrams fire, and 1-token docs so the
            # bigram guard fires.
            st.sampled_from(["a", "b", "c", "aa"]),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=24,
    )
)
@settings(max_examples=25, deadline=None)
def test_dsir_oracle_matches_python_corpus_logic(docs):
    """Full Python replica of the DSIR oracle's CORPUS logic for ANY
    corpus: hashlib md5 target split + gram hashing + Laplace'd bucket
    counts + exact integer weight sums + the accept comparison, with
    the shared q ladder factored out through DuckDB (pinned vs
    math.log elsewhere). Catches join/NULL/smoothing/bucket mistakes
    the fixture gate could miss if both engines shared them."""
    import duckdb as _duck
    import pandas as pd

    from pg_archiver_spark.functions.curation import (
        _DSIR_TARGET_CHARS,
        _DSIR_U_DENOM,
        DSIR_BUCKETS,
    )
    from pg_archiver_spark.registry import ORACLES

    q = _q_fn()
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
        for r in con.execute(ORACLES["pipeline_dsir_resample"]).fetchall()
    }

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    def grams(toks: list[str]) -> list[str]:
        return toks + [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]

    is_target = {
        i: hashlib.md5(str(i).encode()).hexdigest()[0] in _DSIR_TARGET_CHARS
        for i in range(len(docs))
    }
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for i, t in enumerate(docs):
        toks = " ".join(t).split(" ")
        for g in grams(toks):
            side = tc if is_target[i] else rc
            b = bucket(g)
            side[b] = side.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    lr = {
        b: q(tc.get(b, 0) + 1, tt + DSIR_BUCKETS)
        - q(rc.get(b, 0) + 1, rt + DSIR_BUCKETS)
        for b in range(DSIR_BUCKETS)
    }

    n_docs = len(docs)
    n_target = sum(is_target.values())
    n_selected = 0
    sum_wq = 0
    for i, t in enumerate(docs):
        if is_target[i]:
            continue
        toks = " ".join(t).split(" ")
        wq = sum(lr[bucket(g)] for g in grams(toks))
        sum_wq += wq
        u1 = (
            int(
                hashlib.md5(f"{i}#dsir".encode()).hexdigest()[:6], 16
            )
            + 1
        )
        q_u = q(u1, _DSIR_U_DENOM)
        if q_u <= wq:
            n_selected += 1
    assert got == {"xx": (n_docs, n_target, n_selected, sum_wq)}


# ------------------------------------------------ trained PQ codebook


def _pq_numpy_train(X):
    """NumPy replay of the joint per-subspace PQ Lloyd training:
    left-assoc sequential folds for assignment distances, nano-
    quantized integer means — the independent third implementation
    (the _ivf_numpy_train pattern)."""
    import numpy as np

    from pg_archiver_spark.functions.similarity import (
        _PQ_TRAIN_ITERS,
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
    )

    def quant(x):
        return np.where(
            x >= 0, np.floor(x * 1e9 + 0.5), np.ceil(x * 1e9 - 0.5)
        ).astype(np.int64)

    n = len(X)
    sub = X.reshape(n, PQ_SUBSPACES, PQ_SUBDIM)
    cbs = (
        X[:PQ_CENTROIDS]
        .reshape(PQ_CENTROIDS, PQ_SUBSPACES, PQ_SUBDIM)
        .transpose(1, 0, 2)
        .copy()
    )

    def assign(s):
        d = np.zeros((n, PQ_CENTROIDS))
        for j in range(PQ_CENTROIDS):
            acc = np.zeros(n)
            for k in range(PQ_SUBDIM):
                diff = sub[:, s, k] - cbs[s, j, k]
                acc = acc + diff * diff
            d[:, j] = acc
        return d.argmin(axis=1)  # ties -> lowest centroid id

    for _ in range(_PQ_TRAIN_ITERS):
        new = cbs.copy()
        for s in range(PQ_SUBSPACES):
            a = assign(s)
            for j in range(PQ_CENTROIDS):
                m = a == j
                if m.any():
                    new[s, j] = quant(sub[m, s]).sum(axis=0) / (
                        m.sum() * 1e9
                    )
        cbs = new
    return cbs


def test_pq_trained_codebooks_match_numpy_replay(spark, sf_dir):
    """The Spark-trained PQ codebooks must equal the independent NumPy
    replay bit-for-bit (quantized integer means + shared fold order =
    no tolerance needed) — the same-wrong check the hash gate cannot
    do because the oracle replays the SAME training."""
    import numpy as np

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.similarity import (
        _pq_trained_codebooks,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.array([np.array(r.embedding, dtype=np.float64) for r in rows])
    expect = _pq_numpy_train(X)
    got = np.array(_pq_trained_codebooks(spark, sf_dir))
    assert got.shape == expect.shape
    assert (got == expect).all(), np.abs(got - expect).max()


def test_pq_trained_codebook_beats_untrained_mse(spark, sf_dir):
    """The point of training: mean per-subspace quantization error of
    the trained codebook must be BELOW the untrained first-16 init's
    (measured ~28% lower at every SF; assert any strict improvement so
    fixture drift shows up as a loud failure, not silent regression)."""
    import numpy as np

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.similarity import (
        _pq_trained_codebooks,
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.array([np.array(r.embedding, dtype=np.float64) for r in rows])
    sub = X.reshape(len(X), PQ_SUBSPACES, PQ_SUBDIM)

    def mse(cbs):
        tot = 0.0
        for s in range(PQ_SUBSPACES):
            d = ((sub[:, s, None, :] - np.asarray(cbs[s])[None, :, :]) ** 2).sum(2)
            tot += d.min(1).sum()
        return tot / len(X)

    untrained = (
        X[:PQ_CENTROIDS]
        .reshape(PQ_CENTROIDS, PQ_SUBSPACES, PQ_SUBDIM)
        .transpose(1, 0, 2)
    )
    trained = _pq_trained_codebooks(spark, sf_dir)
    assert mse(trained) < 0.9 * mse(untrained), (
        mse(trained),
        mse(untrained),
    )


# ------------------------------------------------------ IVF-PQ stack


def test_ivfpq_composes_its_two_trained_indexes(spark, sf_dir):
    """Composition invariants of the RESIDUAL IVF-PQ serving stack:
    every result comes from one of the query's top probe cells (the
    IVF half), the result SET equals the residual-ADC top-k computed
    independently in numpy from the cached artifacts (residual codes
    against the residual-trained codebooks, per-probed-cell query
    LUT), ranks are contiguous from 1, and the run is deterministic."""
    import numpy as np

    from pg_archiver_spark.catalog import load
    from pg_archiver_spark.functions.similarity import (
        _MULTIPROBE_CELLS,
        _ivf_centroids,
        _ivfpq_residual_codebooks,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        PQ_TOPK,
    )

    rows = QUERIES["sim_ivfpq_search"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert 0 < len(rows) <= PQ_TOPK
    assert rows == QUERIES["sim_ivfpq_search"](spark, sf_dir).collect()

    emb = sorted(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    X = np.array([np.array(r.embedding, dtype=np.float64) for r in emb])
    ids = np.array([r.vec_id for r in emb])
    cents = np.array(_ivf_centroids(spark, sf_dir))
    rcbs = np.array(_ivfpq_residual_codebooks(spark, sf_dir))

    d_cells = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(2)
    cell = d_cells.argmin(1)
    qi = int(np.where(ids == 0)[0][0])
    probes = sorted(range(len(cents)), key=lambda c: (d_cells[qi, c], c))[
        :_MULTIPROBE_CELLS
    ]
    assert {r.cell for r in rows} <= set(probes)

    R = X - cents[cell]  # residuals against each vector's own cell
    rsub = R.reshape(len(X), PQ_SUBSPACES, PQ_SUBDIM)
    codes = np.stack(
        [
            ((rsub[:, s, None, :] - rcbs[s][None, :, :]) ** 2)
            .sum(2)
            .argmin(1)
            for s in range(PQ_SUBSPACES)
        ],
        axis=1,
    )
    # Per-probed-cell query residual LUT (FAISS semantics).
    adc = np.zeros(len(X))
    for i in range(len(X)):
        if cell[i] not in probes:
            continue
        qr = (X[qi] - cents[cell[i]]).reshape(PQ_SUBSPACES, PQ_SUBDIM)
        adc[i] = sum(
            ((qr[s] - rcbs[s][codes[i, s]]) ** 2).sum()
            for s in range(PQ_SUBSPACES)
        )
    cand = [
        i
        for i in range(len(X))
        if cell[i] in probes and ids[i] != 0
    ]
    # ADVICE r10 #3: both engines rank on the nano-quantized distance.
    adcq = np.floor(adc * 1e9 + 0.5)
    order = sorted(cand, key=lambda i: (adcq[i], ids[i]))[:PQ_TOPK]
    assert [r.vec_id for r in rows] == [int(ids[i]) for i in order]
