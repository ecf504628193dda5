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
