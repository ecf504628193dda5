"""Round-8 session-2 conversion machinery — property tests.

This session converted 23 rows-only ops to sql-checked; several rely
on SHARED expression-tree helpers whose correctness the hash check
alone cannot prove (both engines evaluating the same wrong formula
would still hash-match). These tests pin each helper against an
independent reference (numpy / math / DuckDB's own libm):

  - _det4_str / _mkv_det_str  vs exact integer determinants
  - the logreg sigmoid / softplus trees  vs math.exp / math.log1p
  - the pow2 CASE table  vs exact 2**k
  - the audio oracle's isqrt emulation  vs math.isqrt
  - dedup_simhash  must recover every identical-text pair at Hamming 0
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _duck_scalar(expr: str):
    return duckdb.sql(f"SELECT {expr} AS out").fetchone()[0]


# -- shared determinant trees ------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-6, max_value=6), min_size=16, max_size=16
    )
)
def test_det4_tree_matches_exact_integer_determinant(vals):
    import numpy as np

    from pg_archiver_spark.functions.similarity import _det4_str

    m = [[repr(float(vals[4 * i + j])) for j in range(4)] for i in range(4)]
    got = _duck_scalar(_det4_str(m))
    ref = round(float(np.linalg.det(np.array(vals).reshape(4, 4))))
    assert round(got) == ref


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-4, max_value=4), min_size=25, max_size=25
    )
)
def test_det5_tree_matches_exact_integer_determinant(vals):
    import numpy as np

    from pg_archiver_spark.operators.analytics import _mkv_det_str

    m = [[repr(float(vals[5 * i + j])) for j in range(5)] for i in range(5)]
    got = _duck_scalar(_mkv_det_str(m))
    ref = round(float(np.linalg.det(np.array(vals).reshape(5, 5))))
    assert round(got) == ref


# -- logreg shared transcendental trees --------------------------------


def _lr_chain(zs):
    """Run the staged sigmoid/softplus fragments over given z values
    in DuckDB; returns (z, p, l1p, ea) rows."""
    from pg_archiver_spark.functions.similarity import _lr_stage_exprs

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS z, 1.0 AS y", [list(zs)]
    )
    prev = "(SELECT z, y FROM t)"
    for stage in _lr_stage_exprs():
        prev = f"(SELECT *, {', '.join(stage)} FROM {prev})"
    return con.sql(f"SELECT z, p, l1p, ea FROM {prev}").fetchall()


def test_sigmoid_tree_matches_libm_to_ulps():
    zs = [k / 97.0 for k in range(-2910, 2911, 7)] + [0.0, -30.0, 30.0]
    for z, p, l1p, ea in _lr_chain(zs):
        zc = max(-30.0, min(30.0, z))
        assert p == pytest.approx(1.0 / (1.0 + math.exp(-zc)), abs=1e-14)
        assert l1p == pytest.approx(math.log1p(ea), abs=1e-14)


def test_pow2_case_table_is_exact():
    from pg_archiver_spark.functions.similarity import _lr_case_pow2

    for k in range(-43, 1):
        got = _duck_scalar(_lr_case_pow2(repr(float(k))))
        assert got == 2.0**k


# -- audio oracle's isqrt emulation ------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**60))
def test_isqrt_emulation_matches_math_isqrt(x):
    got = _duck_scalar(
        f"""
        (r0 + (CASE WHEN (r0 + 1) * (r0 + 1) <= {x} THEN 1 ELSE 0 END))
            - (CASE WHEN r0 * r0 > {x} THEN 1 ELSE 0 END)
        FROM (SELECT CAST(FLOOR(SQRT(CAST({x} AS DOUBLE))) AS BIGINT) AS r0)
        """
    )
    assert got == math.isqrt(x)


# -- simhash: identical text ⇒ identical signature ---------------------


def test_simhash_signature_invariants(spark, sf_dir):
    """The md5-nibble signature must be (a) deterministic, (b) a
    bag-of-tokens function — token PERMUTATION cannot change it (votes
    are order-free sums) — and (c) discriminative for unrelated text.
    The fixture ships no byte-identical doc pairs, so the property is
    pinned on constructed rows through the op's own fragments."""
    from pyspark.sql import functions as F

    from pg_archiver_spark.functions.dedup import (
        _simhash_half_expr,
        _simhash_nibble_exprs,
        _simhash_vote_exprs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    perm = " ".join(reversed(base.split(" ")))
    other = "completely different words that share almost nothing at all"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, perm), (4, other)], "doc_id long, text string"
    )
    toks = df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    nib = toks.selectExpr("doc_id", "md5(tok) AS hx").selectExpr(
        "doc_id", *_simhash_nibble_exprs()
    )
    votes = nib.groupBy("doc_id").agg(
        *[F.expr(e) for e in _simhash_vote_exprs("DIV")]
    )
    sigs = {
        r.doc_id: (r.hi, r.lo)
        for r in votes.selectExpr(
            "doc_id", _simhash_half_expr(32, "hi"), _simhash_half_expr(0, "lo")
        ).collect()
    }
    assert sigs[1] == sigs[2]  # deterministic on identical text
    assert sigs[1] == sigs[3]  # bag-of-tokens: permutation-invariant
    assert sigs[1] != sigs[4]  # unrelated text separates
    # and the registered op's output stays well-formed on the fixture
    got = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert all(r.hamming <= 6 and r.doc1 < r.doc2 for r in got)


# -- sketch conversions: keep the numeric error signal visible ----------


def test_sketch_numeric_error_margins(spark, sf_dir):
    """The converted sketch ops hash only pass/fail bound booleans;
    this test retains the NUMERIC signal so drift toward a bound edge
    surfaces here before it ever flips an oracle boolean: both HLL
    estimates must sit within HALF their pinned envelopes."""
    from pyspark.sql import functions as F

    from pg_archiver_spark.catalog import load

    ev = load(spark, sf_dir, "events")
    r = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
        F.countDistinct("user_id").alias("e"),
    ).first()
    assert abs(r.a - r.e) / r.e <= 0.03  # half the pinned 3·rsd bound

    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("s")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("s")).alias("m")
    ).first()["m"]
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact <= 0.025  # half the pinned 5%
