"""Round-13 optimization-session tests: pins for the two equivalences
the session-2 rewrites lean on.

- The hoisted-norm cosine form (dot/(nrm_a·nrm_b) with norms computed
  per row) must be BIT-identical to cosine_expr on the fixture — this
  is the claim behind the ~20 cosine-site hoists; a drift here would
  silently change every similarity ranking.
- join_spatial_grid's 5-offset half-plane must produce each qualifying
  pair exactly once with custkey_a < custkey_b — the canonicalization
  replaced the 9-offset key-order filter, and a double-count would
  survive the order-insensitive oracle hash only by luck.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.functions.similarity import (
    cosine_expr,
    dot_expr,
    norm_expr,
)
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_hoisted_norm_cosine_is_bit_identical(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm_expr(F.col("embedding"))
    )
    a = emb.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    rows = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ia") != F.col("ib"))
        .select(
            cosine_expr(F.col("ea"), F.col("eb")).alias("ref"),
            (
                dot_expr(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("hoisted"),
        )
        .collect()
    )
    assert rows
    mism = [r for r in rows if _bits(r.ref) != _bits(r.hoisted)]
    assert not mism, f"{len(mism)} of {len(rows)} cosines drifted bitwise"


def test_spatial_half_plane_pairs_are_canonical_and_unique(spark, sf_dir):
    rows = QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    assert rows
    pairs = [(r.custkey_a, r.custkey_b) for r in rows]
    # canonical order within each pair, no pair emitted twice
    assert all(x < y for x, y in pairs)
    assert len(pairs) == len(set(pairs))
