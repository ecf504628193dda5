"""Empirical scale-up stress for the sub-quadratic claims (VERDICT r11
item #7): explode the sf0.001 corpora 16-64x IN MEMORY and measure the
scale invariants directly, so the 100 TB story has a data point beyond
prose —

- minhash candidate count stays Sum-over-buckets C(sz,2)-bounded and a
  vanishing fraction of the all-pairs space,
- the IVF probe set touches ~nprobe/cells of the corpus, never all of
  it,
- NSW serve frames stay panel-bounded regardless of corpus size.

Docs are exploded with PER-VARIANT token mutation (every other token
gets a variant suffix) so variants are NOT near-dups of each other —
bucket sizes must stay small because the signal stays sparse, which is
exactly the claim under test. Embeddings are exploded with additive
noise so vectors stay distinct.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()

DOC_X = 64
EMB_X = 16

_DIR: list[str] = []


@pytest.fixture(scope="module")
def big_dir(tmp_path_factory, sf_dir):
    if not _DIR:
        d = tmp_path_factory.mktemp("stress")
        docs = pq.read_table(
            os.path.join(sf_dir, "documents.parquet")
        ).to_pandas()
        rows = []
        for _, r in docs.iterrows():
            toks = r.text.split(" ")
            for k in range(DOC_X):
                # mutate every other token: no 3-shingle survives
                # across variants, so variants are NOT near-dups
                t = " ".join(
                    f"{w}x{k}" if i % 2 == 0 else w
                    for i, w in enumerate(toks)
                )
                rows.append(
                    {
                        "doc_id": int(r.doc_id) * DOC_X + k,
                        "text": t,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": len(t),
                    }
                )
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows)),
            str(d / "documents.parquet"),
        )
        emb = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet")
        ).to_pandas()
        vecs = np.array([np.asarray(v) for v in emb.embedding])
        rng = np.random.RandomState(12)
        erows = []
        for j, r in emb.iterrows():
            for k in range(EMB_X):
                v = vecs[j] + 0.3 * rng.normal(size=vecs.shape[1])
                erows.append(
                    {
                        "vec_id": int(r.vec_id) * EMB_X + k,
                        "embedding": v.astype(np.float32).tolist(),
                        "label": int(r.label),
                    }
                )
        # keep the fixed 16-query panel ids (0, 25, ..., 375) pointing
        # at real vectors: vec_id above is id*16+k so panel ids exist
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(erows)),
            str(d / "embeddings.parquet"),
        )
        _DIR.append(str(d))
    return _DIR[0]


_SKEW_DIR: list[str] = []
SKEW_X = 256  # 500 base docs -> 128k docs


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory, sf_dir):
    """The 256x rung with ZIPF-SKEWED structure (VERDICT r12 #6): the
    64x explosion keeps buckets benign because variants spread
    uniformly — this fixture concentrates mass instead.

    - documents: variant counts are Zipf-allocated (the heaviest base
      doc gets ~12% of the whole 128k corpus), and a Zipf token
      vocabulary (a handful of boilerplate tokens appear in most docs)
      skews the shingle-hash distribution. Variants still mutate every
      other token, so no 3-shingle survives across variants — the
      candidate signal must stay sparse DESPITE the mass concentration.
    - embeddings: vectors are drawn from Zipf-weighted clusters (the
      top cluster holds ~35% of all vectors) so the trained IVF has to
      ABSORB skew by spending several centroids inside the heavy
      cluster — the probe-fraction bound is what's under test.
    """
    if not _SKEW_DIR:
        d = tmp_path_factory.mktemp("stress_skew")
        docs = pq.read_table(
            os.path.join(sf_dir, "documents.parquet")
        ).to_pandas()
        n_base = len(docs)
        # Zipf variant allocation: v_i ~ H/ rank_i, scaled to SKEW_X*n.
        h = sum(1.0 / r for r in range(1, n_base + 1))
        total = SKEW_X * n_base
        boiler = ["the", "data", "of", "and", "spark"]  # Zipf head
        rows = []
        next_id = 0
        for rank, (_, r) in enumerate(docs.iterrows(), start=1):
            v = max(1, int(total / (rank * h)))
            toks = r.text.split(" ")
            for k in range(v):
                t = " ".join(
                    f"{w}z{k}" if i % 2 == 0 else boiler[i % 5]
                    for i, w in enumerate(toks)
                )
                rows.append(
                    {
                        "doc_id": next_id,
                        "text": t,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": len(t),
                    }
                )
                next_id += 1
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows)),
            str(d / "documents.parquet"),
        )
        # Zipf-clustered embeddings: 10 cluster centers, Zipf mass.
        rng = np.random.RandomState(99)
        dim = 64
        n_vec = 8_000
        centers = rng.normal(size=(10, dim)) * 3.0
        weights = np.array([1.0 / r for r in range(1, 11)])
        weights /= weights.sum()
        assign = rng.choice(10, size=n_vec, p=weights)
        erows = [
            {
                "vec_id": i,
                "embedding": (
                    centers[assign[i]] + 0.5 * rng.normal(size=dim)
                )
                .astype(np.float32)
                .tolist(),
                "label": int(assign[i]),
            }
            for i in range(n_vec)
        ]
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(erows)),
            str(d / "embeddings.parquet"),
        )
        _SKEW_DIR.append(str(d))
    return _SKEW_DIR[0]


@pytest.mark.slow
def test_minhash_candidates_stay_bucket_bounded_at_64x(spark, big_dir):
    from pg_archiver_spark.functions.dedup import (
        _minhash_bands,
        _minhash_sig,
        _shingle_strs,
    )

    docs = spark.read.parquet(f"{big_dir}/documents.parquet")
    n_docs = docs.count()
    assert n_docs >= 30_000
    sh = docs.select("doc_id", _shingle_strs(F.col("text")).alias("sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    bands = _minhash_bands(_minhash_sig(ex))
    sizes = bands.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    stats = sizes.agg(
        F.sum(F.expr("n * (n - 1) DIV 2")).alias("cand_bound"),
        F.max("n").alias("max_bucket"),
    ).first()
    all_pairs = n_docs * (n_docs - 1) // 2
    # the candidate work is Sum C(sz,2) over buckets — assert it stays
    # a vanishing fraction of the quadratic all-pairs space at 64x
    assert stats.cand_bound < 0.001 * all_pairs, (
        stats.cand_bound,
        all_pairs,
    )
    # and no bucket degenerates into a corpus-sized partition
    assert stats.max_bucket < n_docs * 0.02, stats.max_bucket


@pytest.mark.slow
def test_ivf_probe_fraction_bounded_at_16x(spark, big_dir):
    from pg_archiver_spark.functions.similarity import (
        _KNN_BATCH_IDS,
        _KNN_NPROBE,
        _IVF_CELLS,
        _ivf_assign,
        _ivf_cell_dists,
        _ivf_centroids,
    )
    from pg_archiver_spark.catalog import load

    emb = load(spark, big_dir, "embeddings")
    n_vec = emb.count()
    assert n_vec >= 7_000
    cents = _ivf_centroids(spark, big_dir)
    assigned = _ivf_assign(emb, cents)
    cell_sizes = {
        r.cell: r.n
        for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    queries = emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS))
    from pyspark.sql import Window

    probed = (
        _ivf_cell_dists(queries, cents)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("cdist", "cell")
            ),
        )
        .filter(F.col("rn") <= _KNN_NPROBE)
        .select("vec_id", "cell")
        # bounded: panel x nprobe rows
        .collect()
    )
    touched = sum(cell_sizes[r.cell] for r in probed)
    brute = n_vec * len(_KNN_BATCH_IDS)
    frac = touched / brute
    # nominal probe fraction is nprobe/cells; allow 2x imbalance slack
    assert frac <= 2 * _KNN_NPROBE / _IVF_CELLS, frac


@pytest.mark.slow
def test_minhash_candidates_bounded_at_256x_zipf(spark, skew_dir):
    """The minhash band bound under MASS CONCENTRATION: 128k docs where
    one base doc contributes ~12% of the corpus and half of every doc
    is Zipf boilerplate. Buckets must still never degenerate — the
    bound is structural (distinct shingle sets -> distinct bands), not
    an artifact of the 64x rung's uniform spread."""
    from pg_archiver_spark.functions.dedup import (
        _minhash_bands,
        _minhash_sig,
        _shingle_strs,
    )

    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    n_docs = docs.count()
    assert n_docs >= 120_000
    sh = docs.select("doc_id", _shingle_strs(F.col("text")).alias("sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    bands = _minhash_bands(_minhash_sig(ex))
    sizes = bands.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    stats = sizes.agg(
        F.sum(F.expr("n * (n - 1) DIV 2")).alias("cand_bound"),
        F.max("n").alias("max_bucket"),
    ).first()
    all_pairs = n_docs * (n_docs - 1) // 2
    assert stats.cand_bound < 0.001 * all_pairs, (
        stats.cand_bound,
        all_pairs,
    )
    assert stats.max_bucket < n_docs * 0.02, stats.max_bucket


@pytest.mark.slow
def test_ivf_probe_fraction_bounded_under_zipf_clusters(spark, skew_dir):
    """The IVF probe bound under Zipf-clustered vectors (top cluster
    ~35% of the corpus): trained Lloyd centroids must ABSORB the skew
    (several centroids land inside the heavy cluster), keeping each
    panel query's probed fraction within 4x of the nominal
    nprobe/cells — double the uniform rung's slack, the documented
    skew allowance. If this ever regresses, the mitigation is more
    cells (K ~ sqrt(N)) or balanced-kmeans assignment."""
    from pg_archiver_spark.functions.similarity import (
        _KNN_BATCH_IDS,
        _KNN_NPROBE,
        _IVF_CELLS,
        _ivf_assign,
        _ivf_cell_dists,
        _ivf_centroids,
    )
    from pg_archiver_spark.catalog import load
    from pyspark.sql import Window

    emb = load(spark, skew_dir, "embeddings")
    n_vec = emb.count()
    assert n_vec >= 8_000
    cents = _ivf_centroids(spark, skew_dir)
    assigned = _ivf_assign(emb, cents)
    cell_sizes = {
        r.cell: r.n
        for r in assigned.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    queries = emb.filter(F.col("vec_id").isin(*_KNN_BATCH_IDS))
    probed = (
        _ivf_cell_dists(queries, cents)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("cdist", "cell")
            ),
        )
        .filter(F.col("rn") <= _KNN_NPROBE)
        .select("vec_id", "cell")
        # bounded: panel x nprobe rows
        .collect()
    )
    touched = sum(cell_sizes.get(r.cell, 0) for r in probed)
    brute = n_vec * len(_KNN_BATCH_IDS)
    frac = touched / brute
    assert frac <= 4 * _KNN_NPROBE / _IVF_CELLS, (frac, cell_sizes)


@pytest.mark.slow
def test_nsw_beam_stays_panel_bounded_under_zipf_clusters(spark, skew_dir):
    """The NSW beam bound under Zipf-clustered vectors: the serve
    frame is a bounded unroll (|panel| x BEAM) by construction, and the
    graph build is confined within IVF cells — a 35%-mass cluster must
    not leak into the serve state size."""
    from pg_archiver_spark.functions.similarity import (
        _KNN_BATCH_IDS,
        NSW_BEAM,
        _nsw_serve,
    )

    fin = _nsw_serve(spark, skew_dir)
    assert fin.count() <= len(_KNN_BATCH_IDS) * NSW_BEAM


@pytest.mark.slow
def test_nsw_serve_stays_panel_bounded_at_16x(spark, big_dir):
    from pg_archiver_spark.functions.similarity import (
        _KNN_BATCH_IDS,
        NSW_BEAM,
        NSW_TOPK,
        _nsw_serve,
    )

    fin = _nsw_serve(spark, big_dir)
    # the serve state is a per-query beam: its final frame can never
    # exceed |panel| x BEAM rows no matter the corpus size
    assert fin.count() <= len(_KNN_BATCH_IDS) * NSW_BEAM
    out = QUERIES["sim_ann_nsw_beam"](spark, big_dir)
    rows = out.collect()
    assert len(rows) == len(_KNN_BATCH_IDS) * NSW_TOPK
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, NSW_TOPK + 1)) for v in per_q.values())
