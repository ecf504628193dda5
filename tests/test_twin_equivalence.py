"""Exact-twin ↔ scale-alternate equivalence (VERDICT r11 item #4).

Seven registry ops are honest `weak_at_scale` ground-truth twins, each
naming a scale-safe alternate. dedup_ngram_jaccard ↔ minhash_neardup
already has a set-equality pin (test_round11.py); these tests extend
the pattern so a regressing alternate can no longer hide behind its
twin's green:

- window_ntile ↔ window_ntile_scalable: same oracle, so the driver
  checks each against SQL — but only HERE are the two frames compared
  row-for-row against each other in one session.
- agg_weighted_median ↔ the weight-expanded form: every quantity unit
  becomes one sample (the approx-percentile production path, run
  exactly at fixture scale via an explicit expanded-rank pick).
- analytics_gini_concentration ↔ a range-partitioned two-phase-rank
  replica (the window_ntile_scalable pattern): per-nation ranks built
  from bucket offsets instead of one per-nation window sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _rows(df, *key):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[: len(key)])


def test_ntile_twin_matches_scalable_alternate(spark, sf_dir):
    exact = QUERIES["window_ntile"](spark, sf_dir)
    scalable = QUERIES["window_ntile_scalable"](spark, sf_dir)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, scalable.collect())
    )


def test_weighted_median_matches_weight_expanded_rank(spark, sf_dir):
    """The alternate expands each lineitem into l_quantity unit
    samples (quantities are integral in the fixture) and picks the
    lower median as the ceil(N/2)-th smallest sample — the
    weight-expanded percentile path, evaluated exactly."""
    got = {
        r.l_returnflag: (r.weighted_median_price, r.total_weight)
        for r in QUERIES["agg_weighted_median"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("int").alias("wt"),
    )
    # fixture precondition the expansion relies on
    assert li.filter(
        F.col("l_quantity").cast("decimal(18,2)")
        != F.col("wt").cast("decimal(18,2)")
    ).count() == 0
    expanded = li.select(
        "l_returnflag", "price", F.explode(F.expr("sequence(1, wt)"))
    )
    w = Window.partitionBy("l_returnflag").orderBy("price")
    wall = Window.partitionBy("l_returnflag")
    picked = (
        expanded.select(
            "l_returnflag",
            "price",
            F.row_number().over(w).alias("k"),
            F.count("*").over(wall).alias("n"),
        )
        .filter(F.col("k") * 2 >= F.col("n"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("median"),
            F.max("n").cast("double").alias("n"),
        )
    )
    alt = {r.l_returnflag: (r.median, r.n) for r in picked.collect()}
    assert got == alt


def test_gini_matches_two_phase_rank_replica(spark, sf_dir):
    """Range-partitioned rank replica: per-nation revenue ranks are
    rebuilt from 64 revenue-range buckets + per-bucket row_number +
    bucket-offset prefix sums (no per-nation full-sort window), then
    fed through the same exact-decimal Gini formula."""
    got = {
        r.n_name: (r.n_customers, r.total_rev, r.gini)
        for r in QUERIES["analytics_gini_concentration"](
            spark, sf_dir
        ).collect()
    }
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "o_custkey", "rev")
    )
    n_buckets = 64
    mm = rev.agg(
        F.min("rev").alias("lo"), (F.max("rev") + F.lit(1)).alias("hi")
    )
    bucketed = rev.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.width_bucket(
            F.col("rev").cast("double"),
            F.col("lo").cast("double"),
            F.col("hi").cast("double"),
            F.lit(n_buckets),
        ),
    )
    w_prefix = (
        Window.partitionBy("n_name")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("n_name", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "n_name",
            "bucket",
            F.coalesce(F.sum("n").over(w_prefix), F.lit(0)).alias("off"),
        )
    )
    w_bucket = Window.partitionBy("n_name", "bucket").orderBy(
        "rev", "o_custkey"
    )
    ranked = bucketed.join(offsets, ["n_name", "bucket"]).select(
        "n_name",
        "rev",
        (F.row_number().over(w_bucket) + F.col("off")).alias("rn"),
    )
    n = F.count("*")
    s0 = F.sum("rev").cast("double")
    s1 = F.sum(F.col("rn").cast("decimal(18,0)") * F.col("rev")).cast(
        "double"
    )
    alt_df = ranked.groupBy("n_name").agg(
        n.alias("n_customers"),
        s0.alias("total_rev"),
        (
            F.round((F.lit(2.0) * s1 - (n + 1) * s0) / (n * s0), 6)
            + F.lit(0.0)
        ).alias("gini"),
    )
    alt = {
        r.n_name: (r.n_customers, r.total_rev, r.gini)
        for r in alt_df.collect()
    }
    assert got == alt
