"""Round-13 session tests: the ADVICE r12 fixes.

- ml_ndcg_at_k's -1 sentinel must actually FIRE for a panel query
  whose label is unique in the corpus (the old inner join silently
  dropped the query from the panel instead), cross-engine.
- ml_brier_decomposition's resolution term must survive operand
  magnitudes where an int64 n*sy would wrap (the DECIMAL(38,0)
  promotion happens BEFORE the multiply).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo/tools")
import check as ck  # noqa: E402  (driver-faithful comparator)

from pg_archiver_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_operators,
)

load_all_operators()


def _compare(spark, tmp_path, name: str):
    import duckdb

    sf_dir = str(tmp_path)
    df = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    scols = df.columns
    from pg_archiver_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = tmp_path / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    ocols, orows = ck._oracle_rows_pandas(con.execute(ORACLES[name]))
    assert ck.frame_fingerprint(scols, srows) == ck.frame_fingerprint(
        ocols, orows
    ), name
    return srows, scols


def test_ndcg_unique_label_query_reports_sentinel(spark, tmp_path):
    """A panel query with NO same-label corpus mate stays in the
    output with ndcg = -1 (ADVICE r12: the inner relcnt join used to
    shrink the panel instead), and the fixed Spark/oracle pair still
    hash-agree on the hostile fixture."""
    from pg_archiver_spark.functions.similarity import _KNN_BATCH_IDS

    rng = np.random.RandomState(7)
    n = 90  # panel ids present: 0, 25, 50, 75
    vecs = rng.normal(size=(n, 64)).astype(np.float32)
    labels = [int(x) for x in rng.randint(0, 3, size=n)]
    labels[0] = 99  # vec 0's label is unique in the corpus
    emb = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [v.tolist() for v in vecs],
            "label": labels,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(emb), str(tmp_path / "embeddings.parquet")
    )
    srows, scols = _compare(spark, tmp_path, "ml_ndcg_at_k")
    by_q = {row[scols.index("query_id")]: dict(zip(scols, row)) for row in srows}
    panel = [q for q in _KNN_BATCH_IDS if q < n]
    assert sorted(by_q) == panel  # the full panel, nobody dropped
    sent = by_q[0]
    assert sent["n_corpus_rel"] == 0
    assert sent["idcg_milli"] == 0
    assert sent["ndcg"] == -1.0
    for q in panel[1:]:
        assert by_q[q]["ndcg"] >= 0.0


def test_brier_resolution_term_survives_int64_scale():
    """Pure-integer replay of the resolution ladder at a magnitude
    where the OLD int64 n*sy stage wraps: n=2^33 rows, sy=2^31
    positives in one bin -> n*sy = 2^64 > int64. The DECIMAL(38,0)
    ladder must reproduce the exact Python big-int value."""
    from decimal import Decimal

    n, sy, nk, sy_tot = 2**33, 2**31, 2**32, 2**32
    g = n * sy - nk * sy_tot  # exact Python bigint
    want = g * g // nk
    got = int(
        (Decimal(n) * Decimal(sy) - Decimal(nk) * Decimal(sy_tot)) ** 2
        // Decimal(nk)
    )
    assert got == want
    # and the wrapped int64 value would NOT equal it:
    import ctypes

    wrapped = ctypes.c_int64(n * sy & (2**64 - 1)).value - nk * sy_tot
    assert wrapped * wrapped // nk != want


def test_brier_resolution_decimal_promotion_in_spark(spark):
    """Drive the exact Spark expression from ml_brier_decomposition on
    a 1-row frame whose n*sy exceeds int64: the promoted-operand form
    must return the exact big-int result (the un-promoted form wraps).
    """
    df = spark.createDataFrame(
        [(2**33, 2**31, 2**32, 2**32)], "n long, sy long, nk long, sy_tot long"
    )
    import pyspark.sql.functions as F

    got = df.select(
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sy"
            " - CAST(nk AS DECIMAL(38,0)) * sy_tot)"
            " * (CAST(n AS DECIMAL(38,0)) * sy"
            "    - CAST(nk AS DECIMAL(38,0)) * sy_tot)"
            " DIV nk AS DECIMAL(38,0))"
        ).alias("v")
    ).collect()[0].v
    want = (2**33 * 2**31 - 2**32 * 2**32) ** 2 // 2**32
    assert int(got) == want
