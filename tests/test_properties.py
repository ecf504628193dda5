"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures. Example counts are kept small — each
example is a Spark job."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-9999.99"),
            max_value=Decimal("9999.99"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_decimal_sum_matches_python_exact(spark, vals):
    """G2: a decimal sum must equal Python's exact Decimal sum for any
    values and any partitioning — order-independence is the point."""
    df = spark.createDataFrame([(str(v),) for v in vals], "v string").repartition(4)
    got = df.agg(
        F.sum(F.col("v").cast("decimal(18,2)")).alias("s")
    ).first().s
    assert got == sum(vals)


@given(
    gaps_min=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=15)
)
@settings(max_examples=10, deadline=None)
def test_session_window_count_matches_reference_model(spark, gaps_min):
    """session_window session count == the gaps-and-islands reference
    model with the empirically-verified boundary (new session iff
    gap > duration) for arbitrary gap sequences — including exact
    30-minute boundary gaps."""
    ts, times = 0, []
    for g in gaps_min:
        ts += g * 60_000
        times.append(ts)
    expected = 1 + sum(1 for g in gaps_min[1:] if g * 60 > 1800)

    df = spark.createDataFrame(
        [(1, t) for t in times], "user_id long, epoch_ms long"
    ).select("user_id", F.timestamp_millis("epoch_ms").alias("ts"))
    got = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )
    assert got == expected, (gaps_min, got, expected)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_topk_per_group_matches_python_model(spark, rows):
    """Window top-k per group == the obvious Python model (sort by
    (-value, id), take 3 per group) for arbitrary data incl. ties."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v int, id long"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    got = {
        (r.g, r.v, r.id)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    model = set()
    by_group: dict[int, list] = {}
    for i, (g, v) in enumerate(rows):
        by_group.setdefault(g, []).append((-v, i, g))
    for g, items in by_group.items():
        for negv, i, _ in sorted(items)[:3]:
            model.add((g, -negv, i))
    assert got == model


@given(
    n=st.integers(min_value=2, max_value=40),
    b=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_block_pair_join_meets_every_pair_exactly_once(spark, n, b):
    """The triangle block-pair replication behind dedup_embedding_cosine:
    for ANY corpus size and block count, every unordered id pair must
    meet on exactly one block-pair key — no lost pairs (the correctness
    half) and no double-counted pairs (the dedup half)."""
    ids = spark.range(n).select(
        F.col("id").alias("v"), (F.col("id") % b).alias("blk")
    )
    left = ids.select(
        F.col("v").alias("va"),
        F.col("blk").alias("ki"),
        F.explode(F.sequence(F.col("blk"), F.lit(b - 1))).alias("kj"),
    )
    right = ids.select(
        F.col("v").alias("vb"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ki"),
        F.col("blk").alias("kj"),
    )
    pairs = (
        left.join(right, ["ki", "kj"])
        .filter((F.col("ki") < F.col("kj")) | (F.col("va") < F.col("vb")))
        .select(F.least("va", "vb").alias("p1"), F.greatest("va", "vb").alias("p2"))
        .filter(F.col("p1") != F.col("p2"))
    )
    got = sorted((r.p1, r.p2) for r in pairs.collect())
    want = sorted((i, j) for i in range(n) for j in range(i + 1, n))
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",)  # no lone surrogates
            ),
            min_size=20,
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_fim_psm_reassembles_any_text(spark, texts):
    """pipeline_fim_transform invariant: for ANY document (any unicode,
    any length >= 20), prefix+middle+suffix reassembles the original
    and the cut points respect 1 <= lo <= hi <= n."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    h = lambda salt: (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % F.length("text")
        + 1
    )
    cuts = df.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.least(h("_a"), h("_b")).alias("lo"),
        F.greatest(h("_a"), h("_b")).alias("hi"),
    )
    out = cuts.select(
        "doc_id",
        "text",
        "n",
        "lo",
        "hi",
        F.expr("substring(text, 1, lo - 1)").alias("pre"),
        F.expr("substring(text, lo, hi - lo)").alias("mid"),
        F.expr("substring(text, hi, n - hi + 1)").alias("suf"),
    ).collect()
    for r in out:
        assert 1 <= r.lo <= r.hi <= r.n
        assert r.pre + r.mid + r.suf == r.text


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None)
def test_binary_quantize_hamming_metric_properties(spark, vecs):
    """sim_binary_quantize_hamming's packing invariants for ANY
    vectors: Hamming(a,a)=0, symmetry, range [0,64], and equality
    with the directly-computed sign-bit distance."""
    from pg_archiver_spark.functions.similarity import _pack_bits_expr

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    packed = {
        r.vec_id: (r.lo, r.hi)
        for r in df.select(
            "vec_id",
            F.expr(_pack_bits_expr("embedding", 0)).alias("lo"),
            F.expr(_pack_bits_expr("embedding", 32)).alias("hi"),
        ).collect()
    }
    # Spark casts the python floats to float32; recompute signs from
    # the values Spark actually stored.
    stored = {r.vec_id: r.embedding for r in df.collect()}

    def code(v):
        return sum(1 << i for i, x in enumerate(v) if x >= 0)

    for vid, (lo, hi) in packed.items():
        full = code(stored[vid])
        assert lo == full & 0xFFFFFFFF
        assert hi == full >> 32
    ids = list(packed)
    for a in ids:
        for b in ids:
            da = bin(
                (packed[a][0] ^ packed[b][0]) | ((packed[a][1] ^ packed[b][1]) << 32)
            ).count("1")
            assert 0 <= da <= 64
            db = bin(code(stored[a]) ^ code(stored[b])).count("1")
            assert da == db
            if a == b:
                assert da == 0
