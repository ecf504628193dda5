"""Round-7 tests: ADVICE-nit regressions and new round-7 operators.

Covers: Avro negative-map-block-count handling, count-min sketch
bound reporting, Q16's null-aware NOT IN, and the round-7 additions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import ORACLES, QUERIES, load_all_operators

load_all_operators()


def test_avro_negative_map_block_count_spec_path():
    # Per the Avro spec a NEGATIVE map/array block count is followed by
    # a long byte-size before the entries; conformant writers may emit
    # this form for the file-header metadata map. Build such a header
    # by hand and prove read_container still decodes the file.
    from pg_archiver_spark.sources import avro_codec as ac

    fields = [("k", "long"), ("s", "string")]
    schema = ac.make_schema("neg", fields)
    path = "/tmp/test_round7_negmap.avro"
    ac.write_container(path, schema, fields, [(1, "a"), (2, "b")])
    with open(path, "rb") as fh:
        data = fh.read()

    # Re-write the metadata map with a negative block count + byte size.
    import io

    buf = io.BytesIO(data)
    assert buf.read(4) == ac.MAGIC
    n_meta = ac._zigzag_decode(buf)
    assert n_meta > 0
    entries = bytearray()
    for _ in range(n_meta):
        klen = ac._zigzag_decode(buf)
        k = buf.read(klen)
        vlen = ac._zigzag_decode(buf)
        v = buf.read(vlen)
        entries += ac._zigzag_encode(klen) + k + ac._zigzag_encode(vlen) + v
    assert ac._zigzag_decode(buf) == 0  # end of metadata map
    rest = buf.read()

    rewritten = (
        ac.MAGIC
        + ac._zigzag_encode(-n_meta)      # negative count ...
        + ac._zigzag_encode(len(entries)) # ... then block byte-size
        + bytes(entries)
        + ac._zigzag_encode(0)
        + rest
    )
    f2, r2 = ac.read_container(rewritten)
    assert f2 == fields
    assert r2 == [(1, "a"), (2, "b")]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q16_not_in_is_null_aware_anti_join(spark, sf_dir):
    plan = _plan(QUERIES["composed_q16_supplier_part_cnt"](spark, sf_dir))
    # BroadcastHashJoin [...], LeftAnti, BuildRight, true — the trailing
    # flag is isNullAwareAntiJoin: Catalyst's real NOT IN compilation,
    # not a plain left_anti that ignores NULL three-valued semantics.
    assert "LeftAnti, BuildRight, true" in plan, plan


def test_q16_not_in_null_semantics_on_synthetic():
    # A NULL in the NOT IN subquery result must empty the whole output.
    from pg_archiver_spark.session import get_spark

    spark = get_spark()
    spark.createDataFrame(
        [(1,), (2,)], "k long"
    ).createOrReplaceTempView("t7_probe")
    spark.createDataFrame(
        [(2,), (None,)], "k long"
    ).createOrReplaceTempView("t7_excl")
    out = spark.sql(
        "SELECT k FROM t7_probe WHERE k NOT IN (SELECT k FROM t7_excl)"
    )
    assert out.count() == 0


def test_count_min_sketch_reports_bound_ok(spark, sf_dir):
    rows = QUERIES["agg_count_min_sketch"](spark, sf_dir).collect()
    assert rows
    # ε=0.001 over the fixture is far below one count unit, so the
    # probabilistic upper bound holds here — but as a REPORTED column,
    # not an assertion that could crash on other data/seeds.
    assert all(r.bound_ok for r in rows)
    assert all(r.no_undercount for r in rows)


# -- JDBC dialect conformance (r6 verdict task 6) ----------------------
#
# source_jdbc runs live against embedded Derby; these assertions pin
# what Spark's OWN dialect layer would emit for Postgres vs Derby so
# the Derby stand-in can't silently mask Postgres dialect drift. All
# checks go through org.apache.spark.sql.jdbc.JdbcDialects — the exact
# code path the JDBC source uses to render pushdown SQL.


@pytest.fixture(scope="module")
def dialects(spark):
    jvm = spark._jvm
    return {
        "postgres": jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
            "jdbc:postgresql://host/db"
        ),
        "derby": jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
            "jdbc:derby:memory:conformance"
        ),
    }


def test_dialect_resolution_by_url(dialects):
    assert (
        dialects["postgres"].getClass().getName()
        == "org.apache.spark.sql.jdbc.PostgresDialect"
    )
    assert (
        dialects["derby"].getClass().getName()
        == "org.apache.spark.sql.jdbc.DerbyDialect"
    )


@pytest.mark.parametrize("name", ["postgres", "derby"])
def test_dialect_quotes_identifiers_double(dialects, name):
    # Both dialects double-quote (SQL standard) — the reason
    # read_table's MIN/MAX probe writes "<col>" works on both engines
    # (jdbc.py:49-53). A dialect drift here would break the probe.
    d = dialects[name]
    assert d.quoteIdentifier("batch_id") == '"batch_id"'
    # embedded quotes must be escaped by doubling
    assert d.quoteIdentifier('we"ird') == '"we""ird"'


@pytest.mark.parametrize("name", ["postgres", "derby"])
def test_dialect_escapes_string_literals(dialects, name):
    assert dialects[name].compileValue("O'Brien") == "'O''Brien'"


@pytest.mark.parametrize("name", ["postgres", "derby"])
def test_dialect_timestamp_and_date_literals(dialects, name, spark):
    jvm = spark._jvm
    ts = jvm.java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123")
    assert dialects[name].compileValue(ts) == "'2024-01-02 03:04:05.123'"
    d = jvm.java.sql.Date.valueOf("2024-01-02")
    assert dialects[name].compileValue(d) == "'2024-01-02'"


def test_dialect_limit_emulation_diverges(dialects):
    # THE divergence the Derby stand-in masks: Postgres pushes
    # `LIMIT n` into the remote query; Derby's dialect emits NO limit
    # clause, so Spark applies the limit locally after the scan. Both
    # are correct; only Postgres saves remote IO. Pin both behaviors
    # so an upgrade that changes either is caught.
    assert dialects["postgres"].getLimitClause(100) == "LIMIT 100"
    assert dialects["derby"].getLimitClause(100) == ""


# -- cloud committer evidence (r6 verdict task 5) ----------------------


def test_magic_committer_classes_truly_absent(spark):
    # Pin the negative result: the S3A magic-committer path is
    # impossible on this classpath — these exact classes fail to load.
    # If a future environment ships them, this test failing is the
    # signal to wire s3a_committer_confs() up against moto for real.
    jvm = spark._jvm
    for cls in [
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
        "org.apache.hadoop.fs.s3a.S3AFileSystem",
    ]:
        with pytest.raises(Exception):
            jvm.java.lang.Class.forName(cls)


def test_manifest_committer_commits_live(spark, sf_dir):
    from pg_archiver_spark.catalog import load as _load

    row = QUERIES["sink_manifest_committer"](spark, sf_dir).collect()[0]
    assert row.committer == "ManifestCommitter"
    assert row.success is True
    assert row.n_job_commits == 1
    assert row.tasks_committed is True  # >=1 task commit recorded
    assert row.n_rows == _load(spark, sf_dir, "events").count()
    # and the factory conf was unset afterwards (no leakage into other
    # writes in the same session)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("mapreduce.outputcommitter.factory.scheme.file") is None


# -- materialized rollup with staleness bounds (r6 verdict task 8) -----


def test_materialized_rollup_states_version_and_watermarks_advance(
    spark, sf_dir
):
    import os
    import tempfile

    df = QUERIES["maintenance_materialized_rollup"](spark, sf_dir)
    rows = df.collect()
    assert rows
    base = os.path.join(
        tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "mat_rollup"
    )
    # all three state versions remain readable (refresh-level time travel)
    wms = []
    for v in range(3):
        st = spark.read.parquet(os.path.join(base, f"state_v{v}"))
        wms.append(st.agg(F.max("p_wm")).first()[0])
        assert st.count() > 0
    assert wms[0] < wms[1] < wms[2]  # each refresh advanced the watermark

    # incremental result == straight recompute (the op also self-checks
    # with an exact diff and raises; this is the external pin)
    ev = load(spark, sf_dir, "events")
    full = (
        ev.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    expect = {(r.event_type, r.day): r.n_events for r in full}
    got = {(r.event_type, r.day): r.n_events for r in rows}
    assert got == expect


def test_transform_with_state_v2_blocked_by_missing_protobuf():
    # Spark 4's transformWithStateInPandas (state API v2) needs
    # google.protobuf for its state-server protocol; the sandbox ships
    # no protobuf, so the v2 API is unreachable (a live run crashes the
    # TWS driver worker with this exact ImportError). If this test ever
    # fails, protobuf arrived — port stream_state_timeout_sessions'
    # workload to the v2 API and register it.
    with pytest.raises(ImportError):
        import google.protobuf  # noqa: F401


# ---------- round-7 batch: relational + LLM-curation additions ----------


def test_join_full_outer_has_all_three_sides(spark, sf_dir):
    rows = QUERIES["join_full_outer"](spark, sf_dir).collect()
    sides = {r.side for r in rows}
    assert sides == {"both", "left_only", "right_only"}
    by = {r.side: r for r in rows}
    # right_only rows carry no orders by construction
    assert by["right_only"].n_orders == 0
    assert by["right_only"].urgent_spend == 0.0
    assert by["both"].n_orders > 0


def test_gini_bounds_and_known_inequality(spark, sf_dir):
    rows = QUERIES["analytics_gini_concentration"](spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        # discrete Gini over non-negative revenue is within [0, 1)
        assert 0.0 <= r.gini < 1.0, r
        assert r.n_customers > 0 and r.total_rev > 0


def test_corr_matrix_six_pairs_in_range(spark, sf_dir):
    rows = QUERIES["agg_corr_matrix"](spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
    assert {(r.x_col, r.y_col) for r in rows} == {
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"),
    }


def test_dedup_paragraph_ledger_conserves_segments(spark, sf_dir):
    df = QUERIES["dedup_paragraph"](spark, sf_dir)
    rows = df.collect()
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(rows) == n_docs  # every doc has a ledger row
    total_kept = sum(r.n_kept for r in rows)
    total_removed = sum(r.n_removed for r in rows)
    total = sum(r.n_segments for r in rows)
    assert total_kept + total_removed == total
    # kept == number of DISTINCT segments corpus-wide (first-occurrence
    # semantics keep exactly one occurrence per distinct segment)
    from pg_archiver_spark.functions.dedup import SEG_TOKENS

    toks = F.split("text", " ")
    seg = docs.select(
        F.explode(
            F.sequence(
                F.lit(0),
                ((F.size(toks) - 1) / SEG_TOKENS).cast("bigint"),
            )
        ).alias("i"),
        toks.alias("toks"),
    ).select(
        F.md5(
            F.array_join(
                F.slice("toks", (F.col("i") * SEG_TOKENS + 1).cast("int"), SEG_TOKENS),
                " ",
            ).cast("binary")
        ).alias("h")
    )
    assert total_kept == seg.select("h").distinct().count()


def test_semantic_cluster_partitions_corpus(spark, sf_dir):
    rows = QUERIES["dedup_semantic_cluster"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.dedup import K_SEM

    assert len(rows) == K_SEM
    emb_n = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == emb_n  # total partition
    for r in rows:
        assert 0 <= r.n_removed < r.n_members  # never removes a whole cluster


def test_scalar_quantize_recalls_exact_neighbours(spark, sf_dir):
    sq = QUERIES["sim_scalar_quantize_int8"](spark, sf_dir).collect()
    exact = QUERIES["sim_cosine_topk"](spark, sf_dir).collect()
    assert len(sq) == 10
    # int8 reconstruction error is ~(range/255)/2 per dim — far below
    # the fixture's neighbour gaps: recall@10 vs the exact baseline
    # must be high (allow 2 boundary swaps).
    overlap = {r.vec_id for r in sq} & {r.vec_id for r in exact}
    assert len(overlap) >= 8, (sorted(r.vec_id for r in sq), sorted(r.vec_id for r in exact))
    for r in sq:
        assert -1.0 <= r.approx_cos <= 1.0
        assert r.code_l1 >= 0


def test_stream_left_outer_flushes_all_unmatched(spark, sf_dir):
    row = QUERIES["stream_stream_left_outer"](spark, sf_dir).first()
    # every click emits at least once: matched pairs + null-extensions
    clicks = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert row.n_rows >= clicks  # fan-out for multi-match clicks
    assert row.n_unmatched > 0  # null-extended rows actually emitted
    assert row.n_matched + row.n_unmatched == row.n_rows


def test_life_table_km_identities(spark, sf_dir):
    rows = sorted(
        QUERIES["analytics_life_table"](spark, sf_dir).collect(),
        key=lambda r: r.t_day,
    )
    users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    # reverse-cumulative at-risk: n(t) = n(t+1) + d(t) + c(t), and the
    # smallest lifetime's at-risk covers every user
    assert rows[0].n_at_risk == users
    for a, b in zip(rows, rows[1:]):
        assert a.n_at_risk == b.n_at_risk + a.n_deaths + a.n_censored
        assert 0.0 <= a.hazard <= 1.0


def test_temperature_mix_flattens_distribution(spark, sf_dir):
    rows = QUERIES["pipeline_mix_temperature"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.curation import TEMP_TARGET_FRAC

    n_total = sum(r.n_docs for r in rows)
    n_sampled = sum(r.n_sampled for r in rows)
    # sampled fraction lands near the target (md5-hash thresholding is
    # unbiased; tolerance covers small-sample noise)
    assert abs(n_sampled / n_total - TEMP_TARGET_FRAC) < 0.15
    for r in rows:
        assert 0.0 <= r.rate <= 1.0
        assert r.n_sampled <= r.n_docs


def test_maxsim_bounds_and_dominates_pooled_cosine(spark, sf_dir):
    rows = QUERIES["sim_maxsim_multivector"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.similarity import MV_CHUNKS

    assert len(rows) == min(10, len(rows))
    for r in rows:
        # MaxSim is a sum of MV_CHUNKS cosines, each in [-1, 1]
        assert -MV_CHUNKS <= r.maxsim <= MV_CHUNKS
    # per-token max can only help: the top MaxSim score must be at
    # least the full-vector cosine of the same candidate pair is NOT
    # generally true, but the score of the top candidate must exceed
    # the average score (sanity that scoring discriminates)
    scores = [r.maxsim for r in rows]
    assert scores[0] == max(scores)


def test_bigram_model_scores_higher_than_uniform_floor(spark, sf_dir):
    rows = QUERIES["text_bigram_logprob"](spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        # add-1 smoothed conditional surprise is positive and below
        # the uniform-model ceiling log2(V) + 1 (V ≈ small fixture vocab)
        assert 0.0 < r.avg_bits_per_bigram < 20.0


def test_scd2_merge_properties(spark, sf_dir):
    from pg_archiver_spark.operators.setops import SCD2_OPEN_MS

    df = QUERIES["merge_scd2_upsert"](spark, sf_dir)
    rows = df.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = load(spark, sf_dir, "events")
    assert len(by_user) == ev.select("user_id").distinct().count()
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r.valid_from_ms)
        # exactly one open interval per user, intervals chain with no
        # gaps/overlaps, and consecutive states always differ
        assert sum(1 for r in hist if r.valid_to_ms == SCD2_OPEN_MS) == 1
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to_ms == b.valid_from_ms, uid
            assert a.state != b.state, uid


def test_snapshot_vacuum_deletes_only_expired(spark, sf_dir):
    rows = {r.phase: r for r in QUERIES["maintenance_snapshot_vacuum"](spark, sf_dir).collect()}
    assert rows["v2_pre_vacuum"].n_rows == rows["v2_post_vacuum"].n_rows
    assert rows["vacuumed"].n_files == 4  # v1's repartition(4) files


def test_weighted_median_between_min_max(spark, sf_dir):
    rows = QUERIES["agg_weighted_median"](spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem")
    bounds = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.l_returnflag]
        assert lo <= r.weighted_median_price <= hi


def test_cohort_ltv_monotone_cumulative(spark, sf_dir):
    rows = QUERIES["analytics_cohort_ltv"](spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    for hist in by_cohort.values():
        hist.sort(key=lambda r: r.week_offset)
        for a, b in zip(hist, hist[1:]):
            assert b.cum_revenue >= a.cum_revenue - 1e-9  # non-decreasing


def test_attribution_conserves_credit(spark, sf_dir):
    rows = QUERIES["analytics_attribution_position"](spark, sf_dir).collect()
    # floor division loses at most (n-2) permille per purchase with
    # interior touches; totals must stay within that slack of the
    # full-credit bound and never exceed it
    total_permille = sum(r.permille_sum for r in rows)
    # reconstruct the per-purchase touch counts for the exact bound
    from pg_archiver_spark.operators.analytics import ATTR_WINDOW_MS

    ev = load(spark, sf_dir, "events")
    ms = F.expr("ts_ns DIV 1000000")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", ms.alias("c_ms")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", ms.alias("p_ms")
    )
    counts = (
        p.join(c, "user_id")
        .filter(
            (F.col("c_ms") < F.col("p_ms"))
            & (F.col("c_ms") >= F.col("p_ms") - ATTR_WINDOW_MS)
        )
        .groupBy("p_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    exact = sum(
        1000 if r.n <= 2 else 800 + (200 // (r.n - 2)) * (r.n - 2)
        for r in counts
    )
    assert total_permille == exact


def test_rolling_median_covers_every_type_day(spark, sf_dir):
    rows = QUERIES["window_rolling_median"](spark, sf_dir).collect()
    types = {r.event_type for r in rows}
    assert types == {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        assert r.n_in_window > 0


def test_udtf_analyze_schema_follows_constant(spark, sf_dir):
    df = QUERIES["udtf_analyze_dynamic"](spark, sf_dir)
    assert df.columns == ["doc_id", "tok_1", "tok_2", "tok_3"]
    row = df.orderBy("doc_id").first()
    docs_first = (
        load(spark, sf_dir, "documents").orderBy("doc_id").first()
    )
    assert [row.tok_1, row.tok_2, row.tok_3] == docs_first.text.split(" ")[:3]


def test_pandas_iter_udf_matches_expression(spark, sf_dir):
    got = {
        r.event_id: r.adjusted
        for r in QUERIES["udf_pandas_iter"](spark, sf_dir).collect()
    }
    exp = {
        r.event_id: r.value * 1.1 + 5.0
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    assert got.keys() == exp.keys()
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9


def test_multisink_crash_recovery_invariants(spark, sf_dir):
    row = QUERIES["stream_multisink_atomic"](spark, sf_dir).first()
    ev = load(spark, sf_dir, "events")
    assert row.n_committed_batches == 4  # crash did not lose a batch
    assert row.n_rows == ev.count()  # no dupes, no loss across restart
    assert row.n_types == 5


def test_span_corruption_mask_rate_and_reconstruction(spark, sf_dir):
    from pg_archiver_spark.functions.curation import (
        SPAN_LEN,
        SPAN_SENTINEL,
        SPAN_STRIDE,
    )

    rows = QUERIES["pipeline_span_corruption"](spark, sf_dir).collect()
    docs = {r.doc_id: r for r in rows}
    assert len(docs) == load(spark, sf_dir, "documents").count()
    tot_tokens = sum(r.n_tokens for r in rows)
    tot_masked = sum(r.n_masked for r in rows)
    # mask rate ≈ SPAN_LEN/SPAN_STRIDE asymptotically; short docs pull
    # it UP (a 10-token doc masks one full span = 30%), trailing
    # partials pull it down — band covers both
    assert 0.5 * SPAN_LEN / SPAN_STRIDE < tot_masked / tot_tokens <= 0.30
    for r in rows:
        assert r.n_masked == SPAN_LEN * r.n_spans
        assert r.n_masked <= r.n_tokens


def test_seasonal_naive_backtest_shape(spark, sf_dir):
    rows = QUERIES["analytics_seasonal_naive_backtest"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {
        "click", "view", "purchase", "signup", "error",
    }
    for r in rows:
        assert r.n_days > 0
        assert r.mae >= 0.0
        assert abs(r.bias) <= r.mae + 1e-9  # |mean err| ≤ mean |err|


def test_rlhf_pairs_one_per_source_with_positive_gap(spark, sf_dir):
    rows = QUERIES["pipeline_rlhf_pair_prep"](spark, sf_dir).collect()
    srcs = load(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(rows) == srcs
    for r in rows:
        assert r.chosen_doc_id != r.rejected_doc_id
        assert r.score_gap_milli > 0


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    exact = {r.vec_id for r in QUERIES["sim_cosine_topk"](spark, sf_dir).collect()}
    multi = {r.vec_id for r in QUERIES["sim_ann_ivf_multiprobe"](spark, sf_dir).collect()}
    single = {r.vec_id for r in QUERIES["sim_ann_ivf"](spark, sf_dir).collect()}
    # probing 3 cells can only add candidates vs probing 1
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 5  # ≥ 50% recall@10 on the fixture


def test_bpe_merges_are_ordered_and_greedy(spark, sf_dir):
    rows = QUERIES["pipeline_bpe_merges"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.curation import BPE_MERGE_ITERS

    assert [r.iteration for r in rows] == list(range(1, BPE_MERGE_ITERS + 1))
    for r in rows:
        assert r.merged == r.left + r.right
        assert r.pair_count > 0
    # greedy: a later iteration can never beat an earlier count, except
    # when a merge CREATES a new frequent symbol — allow equality drift
    # but require iteration 1 to be the global argmax of raw pairs
    assert rows[0].pair_count == max(r.pair_count for r in rows)


def test_bucket_pruning_in_plan(spark, sf_dir):
    df = QUERIES["scan_bucket_pruned"](spark, sf_dir)
    plan = _plan(df)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_bottomk_sketch_is_mergeable(spark, sf_dir):
    from pg_archiver_spark.operators.sorts import BOTTOMK_K

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("h"),
        F.to_date("ts").alias("day"),
    )
    # per-day bottom-k sketches ...
    wd = Window.partitionBy("event_type", "day").orderBy("h", "event_id")
    daily = (
        ev.withColumn("pos", F.row_number().over(wd))
        .filter(F.col("pos") <= BOTTOMK_K)
        .select("event_type", "event_id", "h")
    )
    # ... merged (union + global re-rank) must equal the direct sketch
    wm = Window.partitionBy("event_type").orderBy("h", "event_id")
    merged = {
        (r.event_type, r.event_id)
        for r in daily.withColumn("pos", F.row_number().over(wm))
        .filter(F.col("pos") <= BOTTOMK_K)
        .collect()
    }
    direct = {
        (r.event_type, r.event_id)
        for r in QUERIES["sample_bottomk_sketch"](spark, sf_dir).collect()
    }
    assert merged == direct


def test_session_paths_counts_conserve_sessions(spark, sf_dir):
    rows = QUERIES["analytics_session_paths"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    sessions_total = QUERIES["analytics_sessionize"](spark, sf_dir).count()
    assert sum(r.n_sessions for r in rows) <= sessions_total
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3


# -- session-2 round-7 additions -------------------------------------


def test_footer_agg_pushdown_in_plan(spark, sf_dir):
    df = QUERIES["scan_agg_pushdown_footer"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedAggregation: [COUNT(*)" in plan, plan
    assert "MIN(o_orderkey)" in plan and "MAX(o_totalprice)" in plan


def test_footer_agg_pushdown_blocked_by_timestamp(spark, sf_dir):
    # The docstring's claim that a timestamp column disables the whole
    # pushdown must stay true across Spark upgrades — if it starts
    # pushing, the op should be widened back to o_orderdate.
    import os

    s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    orders = s2.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    df = orders.agg(F.count(F.lit(1)).alias("n"), F.min("o_orderdate").alias("d"))
    assert "PushedAggregation: []" in _plan(df)


def test_market_basket_bounds(spark, sf_dir):
    from pg_archiver_spark.operators.analytics import MB_TOPN

    rows = QUERIES["analytics_market_basket"](spark, sf_dir).collect()
    assert 0 < len(rows) <= MB_TOPN
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0 <= r.support_pm <= 1000
        assert r.lift_ppm >= 0
    # strongest pair first, deterministic tie-break
    counts = [r.pair_n for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_triangle_edges_all_in_topk_pairs(spark, sf_dir):
    # every triangle edge must be one of the TRI_EDGES strongest pairs,
    # and the three vertices must be strictly ordered (each triangle
    # materializes exactly once)
    tris = QUERIES["graph_triangle_count"](spark, sf_dir).collect()
    assert len(tris) > 0
    for t in tris:
        assert t.brand_a < t.brand_b < t.brand_c
        assert t.min_support > 0


def test_observe_metrics_shares_sum_to_thousand_ish(spark, sf_dir):
    rows = QUERIES["agg_observe_metrics"](spark, sf_dir).collect()
    n_total = sum(r.n_lines for r in rows)
    ev = load(spark, sf_dir, "lineitem").count()
    assert n_total == ev  # observation total == true total (same pass)
    s = sum(r.share_pm for r in rows)
    assert 1000 - len(rows) < s <= 1000  # floor-division undershoot only


def test_bpe_apply_compresses_and_reconstructs(spark, sf_dir):
    rows = QUERIES["pipeline_bpe_apply"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # merges only ever shrink the symbol stream, never grow it
        assert r.bpe_tokens <= r.char_tokens
        assert 0 <= r.saved_pm < 1000
        assert r.n_words > 0 and r.n_docs > 0
    # 3 merges on this corpus must realize SOME compression somewhere
    assert any(r.saved_pm > 0 for r in rows)


def test_python_datasource_partitions_by_rowgroup(spark, sf_dir):
    import os
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "orders.parquet")
    n_rg = pq.ParquetFile(path).num_row_groups
    df = QUERIES["source_python_datasource"](spark, sf_dir)
    # partition-planned parallelism == row-group count
    assert df.rdd.getNumPartitions() == n_rg
    assert df.count() == pq.ParquetFile(path).metadata.num_rows


def test_cogroup_handles_lineless_orders(spark, sf_dir):
    rows = QUERIES["udf_cogroup_pandas"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_lines >= 0
        if r.n_lines == 0:
            assert r.sum_qty == 0  # empty right frame handled


def test_recursive_reachability_dominates_outdegree(spark, sf_dir):
    reach = {
        r.src: r.n_reachable
        for r in QUERIES["sql_recursive_reachability"](
            spark, sf_dir
        ).collect()
    }
    assert reach
    # transitive closure can only ADD to the direct out-degree
    deg = {
        r.a: r.cnt
        for r in spark.sql(
            "SELECT a, COUNT(*) AS cnt FROM rc_brand_edges GROUP BY a"
        ).collect()
    }
    for src, n in reach.items():
        assert n >= deg[src]


def test_scripting_finds_largest_qualifying_threshold(spark, sf_dir):
    r = QUERIES["sql_scripting_batch"](spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    pm = F.round(F.col("l_discount") * 100).cast("int")
    n_at = li.filter(pm >= r.threshold_pm).count()
    assert n_at == r.n_qualifying
    assert n_at * 10 >= r.n_total  # chosen threshold qualifies
    if r.threshold_pm < 10:  # and the next one up must NOT
        n_up = li.filter(pm >= r.threshold_pm + 1).count()
        assert n_up * 10 < r.n_total


def test_binaryfile_digests_match_source(spark, sf_dir):
    rows = QUERIES["source_binaryfile"](spark, sf_dir).collect()
    assert len(rows) > 0
    src = {
        r.doc_id: (len(r.text.encode("utf-8")), r.text)
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .collect()
    }
    assert {r.doc_id for r in rows} == set(src)
    import hashlib

    for r in rows:
        n, text = src[r.doc_id]
        assert r.n_bytes == n
        assert r.digest == hashlib.md5(text.encode("utf-8")).hexdigest()


def test_xml_roundtrip_preserves_double_precision(spark, sf_dir):
    # the profile compares SUMs of decimal-cast doubles — equality with
    # the direct profile means every o_totalprice survived the XML hop
    got = {
        r.o_orderstatus: (r.n_orders, r.revenue)
        for r in QUERIES["source_xml_roundtrip"](spark, sf_dir).collect()
    }
    want = {
        r.o_orderstatus: (r.n, r.rev)
        for r in load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert got == want


def test_map_in_arrow_norms_positive_and_complete(spark, sf_dir):
    df = QUERIES["udf_map_in_arrow"](spark, sf_dir)
    n_emb = load(spark, sf_dir, "embeddings").count()
    rows = df.collect()
    assert len(rows) == n_emb
    assert all(r.l2_norm > 0 for r in rows)


def test_interpolation_error_is_small_relative(spark, sf_dir):
    rows = QUERIES["analytics_interpolate_linear"](spark, sf_dir).collect()
    assert rows  # knocked-out interior days exist
    # linear reconstruction of a noisy daily series: right order of
    # magnitude (median relative error < 1), strictly positive values
    rel = sorted(
        r.abs_err / r.actual_v for r in rows if r.actual_v > 0
    )
    assert rel[len(rel) // 2] < 1.0
    assert all(r.interp_v > 0 for r in rows)
    # endpoints were never knocked out: every row has both neighbors
    assert all(r.interp_v is not None for r in rows)
    # abs_err is consistent with the published pair
    for r in rows[:10]:
        assert abs(abs(r.actual_v - r.interp_v) - r.abs_err) < 2e-4


def test_cache_reuse_shows_inmemory_scan(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cached = cust.cache()
    try:
        cached.count()
        plan = _plan(cached.groupBy().sum("c_acctbal"))
        assert "InMemoryTableScan" in plan
    finally:
        cached.unpersist()
    # and the op itself returns both reports with equal totals
    rows = QUERIES["scan_columnar_cache_reuse"](spark, sf_dir).collect()
    reports = {r.report for r in rows}
    assert reports == {"by_region", "by_segment"}
    n_by = {
        rep: sum(r.n for r in rows if r.report == rep) for rep in reports
    }
    assert n_by["by_region"] == n_by["by_segment"]  # same base frame


def test_logreg_loss_monotone_and_learns(spark, sf_dir):
    rows = QUERIES["ml_logreg_gd"](spark, sf_dir).collect()
    assert [r.iteration for r in rows] == [1, 2, 3]
    losses = [r.log_loss for r in rows]
    assert losses == sorted(losses, reverse=True)  # strictly improving
    assert losses[0] == pytest.approx(0.693147, abs=1e-4)  # ln 2 at w=0


def test_rrf_fusion_ranks_and_scores_consistent(spark, sf_dir):
    from pg_archiver_spark.functions.similarity import RRF_K, RRF_OUT, RRF_TOPK

    rows = QUERIES["sim_rrf_fusion"](spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_OUT
    for r in rows:
        assert 0 <= r.rank_lex <= RRF_TOPK and 0 <= r.rank_vec <= RRF_TOPK
        want = (1_000_000 // (RRF_K + r.rank_lex) if r.rank_lex else 0) + (
            1_000_000 // (RRF_K + r.rank_vec) if r.rank_vec else 0
        )
        assert r.rrf_ppm == want
    # fusion actually fuses: some doc must appear in BOTH lists at the
    # top, and docs from a single list must still be representable
    assert any(r.rank_lex > 0 and r.rank_vec > 0 for r in rows)
    scores = [r.rrf_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_funnel_windowed_is_tighter_than_unbounded(spark, sf_dir):
    w = QUERIES["analytics_funnel_windowed"](spark, sf_dir).collect()[0]
    u = {
        r.step: r.n_users
        for r in QUERIES["analytics_funnel"](spark, sf_dir).collect()
    }
    # the 48 h bound can only REMOVE conversions vs the unbounded funnel
    assert w.n_view == u["1_view"]
    assert w.n_click_48h <= u["2_click"]
    assert w.n_purchase_48h <= u["3_purchase"]
    assert w.n_view >= w.n_click_48h >= w.n_purchase_48h > 0


def test_ignore_corrupt_files_fails_loudly_without_flag(spark, sf_dir):
    # the op's cloned-session flag is the ONLY thing standing between
    # the planted garbage file and a job failure — prove the default
    # session (flag off) actually raises on the same directory
    import os
    import tempfile

    QUERIES["scan_ignore_corrupt_files"](spark, sf_dir).collect()
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "corrupt_scan",
    )
    strict = spark.newSession()
    strict.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    df = strict.read.schema("o_orderkey long").option(
        "recursiveFileLookup", "true"
    ).parquet(base)
    with pytest.raises(Exception):
        df.count()


def test_length_batching_beats_random_batching(spark, sf_dir):
    from pg_archiver_spark.functions.curation import BATCH_SIZE

    rows = QUERIES["pipeline_length_batching"](spark, sf_dir).collect()
    n_docs_total = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert all(r.n_docs <= BATCH_SIZE for r in rows)
    # batches are length-contiguous: sorted by batch_id, the per-batch
    # [min,max] ranges never overlap backwards
    ordered = sorted(rows, key=lambda r: r.batch_id)
    for a, b in zip(ordered, ordered[1:]):
        assert a.max_tokens <= b.min_tokens
    # padding waste must crush the random-batching baseline: batch by
    # md5 order (random) and compare total padded-token overhead
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    rnd = toks.withColumn(
        "b",
        (
            F.row_number().over(
                Window.orderBy(F.md5(F.col("doc_id").cast("string")))
            )
            - 1
        )
        / BATCH_SIZE,
    ).withColumn("b", F.floor("b"))
    rand_waste = (
        rnd.groupBy("b")
        .agg((F.count("*") * F.max("n") - F.sum("n")).alias("w"))
        .agg(F.sum("w"))
        .first()[0]
    )
    sorted_waste = sum(
        r.n_docs * r.max_tokens - r.sum_tokens for r in rows
    )
    assert sorted_waste * 2 < rand_waste


def test_python_stream_source_exactly_once_pages(spark, sf_dir):
    import os
    import tempfile

    QUERIES["stream_python_datasource"](spark, sf_dir).collect()
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "pyds_stream",
    )
    landed = spark.read.parquet(os.path.join(out, "data"))
    n_src = load(spark, sf_dir, "documents").count()
    assert landed.count() == n_src
    assert landed.select("doc_id").distinct().count() == n_src  # no dups
    # the drain really was incremental: multiple committed microbatches
    commits = [
        f
        for f in os.listdir(os.path.join(out, "ckpt", "commits"))
        if not f.startswith(".")
    ]
    assert len(commits) >= 5  # page = ~corpus/5


def test_python_sink_manifest_gates_orphan_files(spark, sf_dir):
    import json
    import os
    import tempfile

    QUERIES["sink_python_datasource"](spark, sf_dir).collect()
    out = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "pyds_ledger",
    )
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    n_src = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .count()
    )
    assert manifest["n_rows"] == n_src
    assert sum(f["n_rows"] for f in manifest["files"]) == n_src
    # plant an orphan data file a crashed/zombie task might leave…
    orphan = os.path.join(out, "part-ORPHAN.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"o_orderkey": -1, "o_orderstatus": "X", "o_totalprice": 1.0}\n')
    # …and prove the manifest-gated read never sees it
    committed = [os.path.join(out, f["filename"]) for f in manifest["files"]]
    assert orphan not in committed
    back = spark.read.schema("o_orderkey long").json(committed)
    assert back.filter(F.col("o_orderkey") == -1).count() == 0
    assert back.count() == n_src


def test_feature_hashing_fixed_dim_and_conserves_tokens(spark, sf_dir):
    from pg_archiver_spark.functions.similarity import HASH_DIM

    rows = QUERIES["ml_feature_hashing"](spark, sf_dir).collect()
    assert all(0 <= r.bucket < HASH_DIM for r in rows)
    n_tokens = (
        load(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r.tf for r in rows) == n_tokens  # every token lands once
    # the hash actually spreads (the sf0.001 vocabulary is smaller than
    # the feature space, so not every bucket can be hit — half is the
    # spread floor that catches a broken/constant hash)
    assert len({r.bucket for r in rows}) >= HASH_DIM // 2


def test_epoch_shuffle_distinct_reproducible_permutations(spark, sf_dir):
    rows = QUERIES["pipeline_epoch_shuffle"](spark, sf_dir).collect()
    e1 = [r.doc_id for r in rows if r.epoch == 1]
    e2 = [r.doc_id for r in rows if r.epoch == 2]
    assert len(e1) == len(e2) == 10
    assert e1 != e2  # different epoch, different order
    # reproducible: a second evaluation yields the identical prefix
    again = QUERIES["pipeline_epoch_shuffle"](spark, sf_dir).collect()
    assert [r.doc_id for r in again] == [r.doc_id for r in rows]
    # and the epoch order is a PERMUTATION: salted ranking is bijective
    # on doc_id, so no id can repeat within an epoch prefix
    assert len(set(e1)) == 10 and len(set(e2)) == 10


def test_aqe_rewrites_smj_to_broadcast_at_runtime(spark, sf_dir):
    df = QUERIES["join_aqe_runtime_broadcast"](spark, sf_dir)
    df.collect()  # AQE final plan exists only after execution
    plan = _plan(df)
    # both shapes present: the static plan chose SMJ, runtime chose BHJ
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "isFinalPlan=true" in plan


def test_python_stream_source_resumes_from_checkpoint(spark, sf_dir):
    # Kill the paged drain after the FIRST committed microbatch, then
    # restart from the same checkpoint: the resumed query must land
    # every remaining page exactly once (readBetweenOffsets replay).
    import os
    import shutil
    import tempfile
    import time as _t

    import pyarrow.parquet as pq

    from pg_archiver_spark.sources.pyds import _mk_doc_stream_source

    path = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(path).metadata.num_rows
    page = max(1, (n + 4) // 5)
    spark.dataSource.register(_mk_doc_stream_source())
    out = os.path.join(tempfile.gettempdir(), "t7_pyds_resume")
    shutil.rmtree(out, ignore_errors=True)

    def _start():
        return (
            spark.readStream.format("pg_doc_pages")
            .option("path", path)
            .option("page", page)
            .option("end", n)
            .load()
            .writeStream.format("parquet")
            .option("path", os.path.join(out, "data"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

    q = _start()
    deadline = _t.time() + 60
    while _t.time() < deadline:
        _t.sleep(0.3)
        if os.path.isdir(os.path.join(out, "ckpt", "commits")) and [
            f
            for f in os.listdir(os.path.join(out, "ckpt", "commits"))
            if not f.startswith(".")
        ]:
            break
    q.stop()  # crash after >=1 batch
    q.awaitTermination(30)

    q2 = _start()  # resume from the same checkpoint
    deadline = _t.time() + 90
    landed = 0
    while _t.time() < deadline:
        _t.sleep(0.5)
        try:
            landed = spark.read.parquet(os.path.join(out, "data")).count()
        except Exception:
            landed = 0
        if landed >= n:
            break
    q2.stop()
    q2.awaitTermination(30)

    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == n
    assert got.select("doc_id").distinct().count() == n  # exactly once


def test_layout_migration_collapses_partitions_and_prunes(spark, sf_dir):
    import os
    import tempfile

    QUERIES["maintenance_repartition_layout"](spark, sf_dir).collect()
    base = os.path.join(
        tempfile.gettempdir(),
        f"pg_archiver_spark-{os.getpid()}",
        "layout_mig",
    )
    days = [d for d in os.listdir(os.path.join(base, "by_day")) if d.startswith("day=")]
    months = [d for d in os.listdir(os.path.join(base, "by_month")) if d.startswith("month=")]
    assert len(months) < len(days)  # coarser layout, fewer dirs
    assert len(days) >= 25  # the fixture really was day-fragmented
    # row conservation across the migration
    n_src = load(spark, sf_dir, "events").count()
    assert spark.read.parquet(os.path.join(base, "by_month")).count() == n_src
    # and the new layout actually prunes: a one-month read plans a
    # partition filter, not a full scan
    one = months[0].split("=", 1)[1]
    df = spark.read.parquet(os.path.join(base, "by_month")).filter(
        F.col("month") == one
    )
    assert "PartitionFilters: [isnotnull(month" in _plan(df)


def test_sql_declarative_fn_stays_python_free(spark, sf_dir):
    df = QUERIES["udf_sql_declarative"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the declared function inlined into ordinary expressions
    rows = df.collect()
    assert len(rows) > 0 and all(r.net_revenue > 0 for r in rows)


def test_approx_top_k_exact_at_fixture_cardinality(spark, sf_dir):
    got = [
        (r.item, r.cnt)
        for r in QUERIES["agg_approx_top_k"](spark, sf_dir).collect()
    ]
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    want = [
        (r.p_brand, r.cnt)
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "p_brand")
        .limit(10)
        .collect()
    ]
    assert got == want  # 25 keys « 100 slots: the sketch is exact


def test_pit_features_never_leak_future(spark, sf_dir):
    rows = QUERIES["join_point_in_time_features"](spark, sf_dir).collect()
    total = sum(r.n_labels for r in rows)
    n_purch = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == n_purch  # every label exactly once
    # leakage probe: sum of clicks-before over ALL labels can never
    # exceed labels × total clicks (sanity) and the no-click cohort
    # must contribute zero
    for r in rows:
        if r.had_click == "false":
            assert r.sum_clicks_before == 0


def test_pmi_pairs_bounded_by_top_vocab(spark, sf_dir):
    from pg_archiver_spark.functions.text import PMI_OUT, PMI_TOP_WORDS

    rows = QUERIES["text_cooccurrence_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_OUT
    vocab = {w for r in rows for w in (r.w1, r.w2)}
    assert len(vocab) <= PMI_TOP_WORDS
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r.w1 < r.w2 for r in rows)


def test_fingerprint_is_order_and_layout_invariant(spark, sf_dir):
    import os
    import tempfile

    base = {
        r.tbl: (r.n_rows, r.fingerprint)
        for r in QUERIES["maintenance_content_fingerprint"](
            spark, sf_dir
        ).collect()
    }
    # re-shard orders into a different layout and re-fingerprint
    out = os.path.join(tempfile.gettempdir(), "t7_fp_reshard")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    orders.repartition(7, "o_orderstatus").write.mode("overwrite").parquet(out)
    re = spark.read.parquet(out)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in re.columns])
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    row = re.agg(F.count("*").alias("n"), F.sum(h).alias("fp")).first()
    assert (row.n, row.fp) == base["orders"]
    # and a single-row mutation MUST change the fingerprint
    mut = re.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 1, F.col("o_custkey") + 1).otherwise(
            F.col("o_custkey")
        ),
    )
    key2 = F.concat_ws("|", *[F.col(c).cast("string") for c in mut.columns])
    h2 = F.conv(F.substring(F.md5(key2), 1, 8), 16, 10).cast("long")
    assert mut.agg(F.sum(h2)).first()[0] != base["orders"][1]


def test_trimmed_mean_robust_to_tails(spark, sf_dir):
    rows = {
        r.event_type: r
        for r in QUERIES["agg_trimmed_mean"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    for t, r in rows.items():
        g = ev.filter(F.col("event_type") == t)
        n = g.count()
        # ~80% of rows kept (percent_rank endpoints make it inclusive)
        assert 0.75 * n <= r.n_kept <= 0.85 * n + 2
        mn, mx = g.agg(F.min("value"), F.max("value")).first()
        assert mn < r.trimmed_mean < mx


def test_benford_audit_structure(spark, sf_dir):
    rows = QUERIES["analytics_benford_audit"](spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    # floor-division permilles: sum within 9 units of 1000
    s = sum(r.observed_pm for r in rows)
    assert 1000 - 9 <= s <= 1000
    assert sum(r.cnt for r in rows) == load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    ).count()
    # expectation column is the Benford table, independent of data
    assert rows[0].expected_pm == 301 and rows[8].expected_pm == 46


def test_audience_overlap_jaccard_bounds(spark, sf_dir):
    rows = QUERIES["analytics_audience_overlap"](spark, sf_dir).collect()
    n_types = (
        load(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == n_types * (n_types - 1) // 2  # every pair once
    for r in rows:
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_pm <= 1000


def test_analyze_stats_match_data_and_record_bytes(spark, sf_dir):
    rows = {
        r.tbl: r.stats_rows
        for r in QUERIES["maintenance_analyze_stats"](spark, sf_dir).collect()
    }
    assert rows["nation"] == load(spark, sf_dir, "nation").count()
    assert rows["supplier"] == load(spark, sf_dir, "supplier").count()
    # sizeInBytes landed too (the broadcast-threshold input)
    desc = spark.sql("DESCRIBE EXTENDED stats_nation").collect()
    line = next(r.data_type for r in desc if r.col_name == "Statistics")
    assert "bytes" in line and int(line.split(" ")[0]) > 0


# -- round-7 session-3 additions: statistics + spatial ----------------


def test_ks_test_null_calibration(spark, sf_dir):
    row = QUERIES["analytics_ks_test"](spark, sf_dir).collect()[0]
    n_orders = load(spark, sf_dir, "orders").count()
    assert row.n_a + row.n_b == n_orders
    assert 0.0 <= row.ks_d <= 1.0
    # Hash split of one population: true D = 0, so observed D must sit
    # under a generous KS critical band (alpha ~ 1e-4 -> c ~ 1.95).
    bound = 2.2 * ((row.n_a + row.n_b) / (row.n_a * row.n_b)) ** 0.5
    assert row.ks_d < bound


def test_chisq_cells_reconcile_to_marginals(spark, sf_dir):
    rows = QUERIES["analytics_chisq_independence"](spark, sf_dir).collect()
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r.obs for r in rows) == n_orders
    # Expected counts under independence also sum to N; each cell's
    # milli-expected truncates < 1 milli, so the sum of ≤15 cells sits
    # within 15 milli-units of 1000·N.
    assert abs(sum(r.expected_milli for r in rows) - 1000 * n_orders) <= len(
        rows
    )
    for r in rows:
        assert r.chi_cell_milli >= 0
        assert r.expected_milli > 0
        # Independent replay of the quantized ladder from the row's own
        # exact integers (obs is exact; E_milli comes from the op).
        assert r.chi_cell_milli == (1000 * r.obs - r.expected_milli) ** 2 // max(
            r.expected_milli, 1
        )


def test_autocorrelation_bounds_and_shape(spark, sf_dir):
    rows = QUERIES["analytics_autocorrelation"](spark, sf_dir).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:  # Cauchy-Schwarz with the full-series denominator
        assert -1.0 <= r.acf <= 1.0


def test_kmv_estimates_within_sketch_error(spark, sf_dir):
    row = QUERIES["agg_kmv_jaccard_estimate"](spark, sf_dir).collect()[0]
    assert row.k <= 128
    assert row.both_in_sketch <= row.k
    assert row.exact_both <= row.exact_union
    if row.k < 128:
        # Sketch held the whole set: estimates should be near-exact in
        # membership terms.
        assert row.both_in_sketch == row.exact_both
    else:
        # KMV relative error ~ 1/sqrt(k-2) ~ 9% at k=128; allow 4 sigma.
        est_union = row.est_union_milli / 1000.0
        assert abs(est_union - row.exact_union) < 0.4 * row.exact_union
        exact_j = row.exact_both / row.exact_union
        assert abs(row.est_jaccard - exact_j) < 0.3
        # The intersection ladder is jaccard·union on the same exact
        # integers: replay it from the row's own sketch stats.
        space = 1 << 60
        assert row.est_intersection_milli == (
            row.both_in_sketch * (row.k - 1) * space * 1000
        ) // (row.k * max(row.kth_hash, 1))
        assert row.est_union_milli == (
            (row.k - 1) * space * 1000
        ) // max(row.kth_hash, 1)


def test_spatial_grid_matches_bruteforce(spark, sf_dir):
    fast = {
        (r.custkey_a, r.custkey_b, r.dist2)
        for r in QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    }
    # Brute-force oracle: quadratic cross join on the same derived
    # coordinates (only run at test SF).
    from pg_archiver_spark.operators.joins import SPATIAL_BOX, SPATIAL_R

    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("bigint")
            % SPATIAL_BOX
        ).alias("lat"),
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 9, 7),
                16,
                10,
            ).cast("bigint")
            % SPATIAL_BOX
        ).alias("lon"),
    )
    a = pts.toPandas()
    slow = set()
    recs = list(a.itertuples())
    for i, p in enumerate(recs):
        for q in recs[i + 1 :]:
            d2 = (p.lat - q.lat) ** 2 + (p.lon - q.lon) ** 2
            if d2 <= SPATIAL_R * SPATIAL_R:
                x, y = sorted((p.c_custkey, q.c_custkey))
                slow.add((x, y, d2))
    assert fast == slow
    assert len(fast) > 0


def test_any_all_rewrite_matches_semantics(spark, sf_dir):
    from pg_archiver_spark.operators.subqueries import ANCHOR_BRAND

    rows = QUERIES["subquery_any_all"](spark, sf_dir).collect()
    part = load(spark, sf_dir, "part")
    anchor = [
        r.p_retailprice
        for r in part.filter(F.col("p_brand") == ANCHOR_BRAND).collect()
    ]
    lo, hi = min(anchor), max(anchor)
    others = part.filter(F.col("p_brand") != ANCHOR_BRAND).collect()
    expect_any = {r.p_partkey for r in others if r.p_retailprice > lo}
    expect_all = {r.p_partkey for r in others if r.p_retailprice > hi}
    assert {r.p_partkey for r in rows} == expect_any
    assert {r.p_partkey for r in rows if r.beats_all} == expect_all


def test_did_null_calibration_small_effect(spark, sf_dir):
    row = QUERIES["analytics_did_estimator"](spark, sf_dir).collect()[0]
    n = row.n_treat_pre + row.n_treat_post + row.n_ctrl_pre + row.n_ctrl_post
    assert n == load(spark, sf_dir, "orders").count()
    # Hash split of one population: true effect 0. Allow a generous
    # sampling band (means are ~190k with sd ~100k; 4-cell diff sd ~
    # 2*sd/sqrt(n_cell)).
    n_min = min(
        row.n_treat_pre, row.n_treat_post, row.n_ctrl_pre, row.n_ctrl_post
    )
    assert abs(row.did_estimate) < 10 * 110_000 / (n_min**0.5)


def test_alert_debounce_episodes_are_maximal_runs(spark, sf_dir):
    from pg_archiver_spark.operators.statistics import ALERT_DEBOUNCE_DAYS

    rows = QUERIES["window_alert_debounce"](spark, sf_dir).collect()
    assert len(rows) > 0
    prev_end = None
    for r in rows:
        assert r.n_days_breached >= ALERT_DEBOUNCE_DAYS
        assert r.alert_start <= r.alert_end
        if prev_end is not None:  # episodes are disjoint and ordered
            assert r.alert_start > prev_end
        prev_end = r.alert_end


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_dir):
    df = QUERIES["analytics_bootstrap_ci"](spark, sf_dir)
    r1 = df.collect()[0]
    r2 = QUERIES["analytics_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert (r1.ci_lo, r1.ci_hi) == (r2.ci_lo, r2.ci_hi)  # retry-safe
    assert r1.ci_lo < r1.ci_hi
    # The CI is for the mean of THIS sample's distribution: the full-
    # sample mean sits inside (Poisson bootstrap centers on it).
    assert r1.ci_lo <= r1.mean_price <= r1.ci_hi
    # Width sanity: a few sd/sqrt(n), never degenerate or huge.
    assert (r1.ci_hi - r1.ci_lo) < 0.5 * r1.mean_price


def test_backfill_overwrite_touches_only_target_partition(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as SF

    orders = load(spark, sf_dir, "orders").withColumn(
        "year", SF.year("o_orderdate")
    )
    base = os.path.join(
        tempfile.gettempdir(), f"test_backfill-{uuid.uuid4().hex[:8]}"
    )
    corrupted = orders.filter(
        (SF.col("year") != 1997) | (SF.col("o_orderkey") % 2 == 0)
    )
    corrupted.write.mode("overwrite").partitionBy("year").parquet(base)

    def listing(year):
        d = os.path.join(base, f"year={year}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_1996 = listing(1996)
    fix = orders.filter(SF.col("year") == 1997)
    fix.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("year").parquet(base)
    # Untouched partition: same files, same mtimes (not rewritten).
    assert listing(1996) == before_1996
    # Target partition healed.
    healed = spark.read.parquet(base).filter(SF.col("year") == 1997)
    assert healed.count() == fix.count()
    # Idempotent: re-running the backfill keeps content identical.
    fix.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("year").parquet(base)
    again = spark.read.parquet(base).filter(SF.col("year") == 1997)
    assert again.count() == fix.count()
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_calibration_bins_flat_on_signal_free_score(spark, sf_dir):
    rows = QUERIES["ml_calibration_bins"](spark, sf_dir).collect()
    assert [r.bin for r in rows] == list(range(10))
    n_total = sum(r.n for r in rows)
    base_rate = sum(r.frac_pos * r.n for r in rows) / n_total
    # Bin sizes are balanced by construction (exact rank deciles).
    assert max(r.n for r in rows) - min(r.n for r in rows) <= 1
    for r in rows:
        # mean_p tracks the bin center (exact rank fractions).
        assert abs(r.mean_p - (r.bin / 10 + 0.05)) < 0.01
        # Price rank carries ~no signal for status: observed rate per
        # bin stays within a sampling band of the base rate.
        se = (base_rate * (1 - base_rate) / r.n) ** 0.5
        assert abs(r.frac_pos - base_rate) < 6 * se + 0.02
        assert 0.0 <= r.brier <= 1.0


def test_ohlc_candles_consistent_and_first_last_correct(spark, sf_dir):
    rows = QUERIES["agg_ohlc_candles"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.volume > 0
    # Spot-check open/close against an explicit time sort for one group.
    g = rows[0]
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == g.event_type)
        .withColumn("ms", F.expr("ts_ns DIV 1000000"))
        .filter(F.expr(f"ms DIV 86400000 = {g.day_id}"))
        .orderBy("ms", "event_id")
        .select("value")
        .collect()
    )
    assert ev[0].value == g.open
    assert ev[-1].value == g.close
    assert len(ev) == g.volume


def test_deletion_vectors_leave_data_files_untouched(spark, sf_dir):
    import hashlib
    import os
    import tempfile
    import uuid

    orders = load(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(), f"test_dv-{uuid.uuid4().hex[:8]}"
    )
    orders.write.mode("overwrite").parquet(base)

    def digest():
        out = {}
        for f in os.listdir(base):
            if f.endswith(".parquet"):
                with open(os.path.join(base, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    before = digest()
    table = spark.read.parquet(base).select(
        "*",
        F.col("_metadata.file_name").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    dv = table.filter(F.col("o_orderstatus") == "P").select("_file", "_pos")
    n_dead = dv.count()
    live = table.join(F.broadcast(dv), ["_file", "_pos"], "left_anti")
    assert live.count() == orders.count() - n_dead
    # The "delete" rewrote nothing: data files byte-identical.
    assert digest() == before
    # Positional identity is unique — no double-deletes possible.
    assert dv.distinct().count() == n_dead
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_udtf_table_arg_matches_window_formulation(spark, sf_dir):
    rows = {
        r.user_id: r
        for r in QUERIES["udtf_table_arg"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    ref = (
        ev.withColumn("ms", F.expr("ts_ns DIV 1000000"))
        .withColumn("gap", F.col("ms") - F.lag("ms").over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("gap") > 3_600_000).cast("int")).alias("n_gaps"),
            F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_ms"),
        )
        .collect()
    )
    assert len(ref) == len(rows)
    for r in ref:
        got = rows[r.user_id]
        assert (got.n_events, got.n_gaps, got.max_gap_ms) == (
            r.n_events,
            r.n_gaps or 0,
            r.max_gap_ms,
        )


def test_unigram_em_monotone_likelihood_and_reconstruction(spark, sf_dir):
    import math

    from pg_archiver_spark.functions.curation import (
        UNIGRAM_MAX_SUB,
        UNIGRAM_MIN_FREQ,
    )

    # Rebuild the same word frame the op uses.
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .count()
        .collect()
    )
    words = {r.w: r["count"] for r in wc}

    def seed_model():
        # Mirrors the op's QUANTIZED integer scoring (round(log-prob ·
        # 1e12)) — the op computes the table via shared Spark/DuckDB
        # expression trees that agree with math.log to ≤1 ULP
        # (pinned in tests/test_round8_conversions.py), so this
        # independent math.log reference reproduces it.
        cnt = {}
        for w, n in words.items():
            for i in range(len(w)):
                for j in range(i + 1, min(i + 1 + UNIGRAM_MAX_SUB, len(w) + 1)):
                    cnt[w[i:j]] = cnt.get(w[i:j], 0) + n
        cnt = {
            t: c
            for t, c in cnt.items()
            if len(t) == 1 or c >= UNIGRAM_MIN_FREQ
        }
        tot = sum(cnt.values())
        return {
            t: round((math.log(c) - math.log(tot)) * 1e12)
            for t, c in cnt.items()
        }

    def viterbi(word, table):
        best = [0] + [None] * len(word)
        back = [0] * (len(word) + 1)
        for j in range(1, len(word) + 1):
            for i in range(max(0, j - UNIGRAM_MAX_SUB), j):
                t = word[i:j]
                q = table.get(t)
                if q is None or best[i] is None:
                    continue
                if best[j] is None or best[i] + q > best[j]:
                    best[j] = best[i] + q
                    back[j] = i
        toks, j = [], len(word)
        while j > 0:
            toks.append(word[back[j]:j])
            j = back[j]
        return toks[::-1]

    def corpus_ll(table):
        return sum(
            n * sum(table[t] / 1e12 for t in viterbi(w, table))
            for w, n in words.items()
        )

    def m_step(table):
        usage = {}
        for w, n in words.items():
            for t in viterbi(w, table):
                usage[t] = usage.get(t, 0) + n
        tot = sum(usage.values())
        # Keep the full support (unused tokens get a floor) so the
        # next Viterbi is total; hard-EM monotonicity needs usage
        # tokens to dominate.
        out = dict(table)
        for t, c in usage.items():
            out[t] = round((math.log(c) - math.log(tot)) * 1e12)
        return out, usage

    seed = seed_model()
    # Every word reconstructs exactly from its segmentation.
    for w in words:
        assert "".join(viterbi(w, seed)) == w
    ll0 = corpus_ll(seed)
    m1, usage = m_step(seed)
    ll1 = corpus_ll(m1)
    assert ll1 >= ll0 - 1e-9  # hard-EM never decreases likelihood

    # The registered op reports exactly the M-step usage table (top-K).
    rows = QUERIES["pipeline_unigram_tokenizer_em"](spark, sf_dir).collect()
    tot_uses = sum(usage.values())
    for r in rows:
        assert usage.get(r.tok) == r.n_uses
        assert r.prob_ppm == (r.n_uses * 1_000_000) // tot_uses
    # Determinism across runs.
    rows2 = QUERIES["pipeline_unigram_tokenizer_em"](spark, sf_dir).collect()
    assert [(r.tok, r.n_uses) for r in rows] == [
        (r.tok, r.n_uses) for r in rows2
    ]


def test_max_drawdown_matches_python_scan(spark, sf_dir):
    row = QUERIES["window_max_drawdown"](spark, sf_dir).collect()[0]
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            ).cast("bigint").alias("cents")
        )
        .orderBy("o_orderdate")
        .collect()
    )
    cum = peak = best = 0
    for r in daily:
        cum += r.cents
        peak = max(peak, cum)
        best = max(best, peak - cum)
    assert row.drawdown_cents == best
    assert row.peak_cents - row.cum_cents == row.drawdown_cents
    assert row.drawdown_cents >= 0


def test_parquet_bloom_filter_physical_evidence(spark, sf_dir):
    import glob
    import os
    import tempfile
    import uuid

    from pg_archiver_spark.operators.scans import BLOOM_KEY_OFFSET

    events = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") + F.lit(BLOOM_KEY_OFFSET)).alias("lookup_key"),
        "value",
    )
    base = os.path.join(
        tempfile.gettempdir(), f"test_bloom-{uuid.uuid4().hex[:8]}"
    )
    (
        events.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#lookup_key", "true")
        .option("parquet.bloom.filter.expected.ndv#lookup_key", "100000")
        .parquet(base + "_on")
    )
    events.coalesce(1).write.mode("overwrite").parquet(base + "_off")

    f_on = glob.glob(base + "_on/*.parquet")[0]
    f_off = glob.glob(base + "_off/*.parquet")[0]

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f_on), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    rg = reader.getFooter().getBlocks().get(0)
    blooms = {}
    for i in range(rg.getColumns().size()):
        cc = rg.getColumns().get(i)
        blooms[cc.getPath().toDotString()] = (
            cc.getBloomFilterOffset(),
            reader.readBloomFilter(cc),
        )
    # Bloom present for the enrolled column ONLY.
    assert blooms["lookup_key"][0] > 0 and blooms["lookup_key"][1] is not None
    assert blooms["event_id"][0] == -1
    assert blooms["value"][0] == -1

    bf = blooms["lookup_key"][1]
    n = load(spark, sf_dir, "events").count()
    # Present keys: never a false negative (keys > 2^31 so py4j
    # dispatches the hash(long) overload parquet-mr used at write).
    for eid in [0, 1, n // 2, n - 1]:
        assert bf.findHash(bf.hash(eid + BLOOM_KEY_OFFSET))
    # Absent keys: mostly rejected (~1% fpp; allow generous slack).
    absent_hits = sum(
        1
        for k in range(10_000_000, 10_000_100)
        if bf.findHash(bf.hash(k + BLOOM_KEY_OFFSET))
    )
    assert absent_hits <= 10
    reader.close()

    # The bloom costs real bytes: enrolled file strictly larger.
    assert os.path.getsize(f_on) > os.path.getsize(f_off)
    import shutil

    shutil.rmtree(base + "_on", ignore_errors=True)
    shutil.rmtree(base + "_off", ignore_errors=True)


def test_named_parameters_push_down_to_scan(spark, sf_dir):
    df = QUERIES["sql_named_parameters"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Bound parameters constant-fold into pushed parquet filters.
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1][:300]


def test_matryoshka_recall_monotone_in_dim(spark, sf_dir):
    rows = {
        r.dim: r for r in QUERIES["sim_matryoshka_eval"](spark, sf_dir).collect()
    }
    assert rows[64].recall_pm == 1000  # full dim is its own reference
    # More dimensions never hurt recall on average (MRL premise).
    assert rows[64].recall_pm >= rows[32].recall_pm >= rows[16].recall_pm
    for r in rows.values():
        assert 0 <= r.recall_pm <= 1000
        assert r.n_overlap <= r.n_queries * 10


def test_seasonal_outliers_abnormal_for_their_weekday(spark, sf_dir):
    rows = QUERIES["analytics_seasonal_residual_outliers"](
        spark, sf_dir
    ).collect()
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderdate").alias("d"),
            F.expr(
                "((unix_timestamp(o_orderdate) * 1000) DIV 86400000) % 7"
            ).alias("dow"),
        )
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100))
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    import statistics as st

    by_dow = {}
    for r in daily:
        by_dow.setdefault(r.dow, []).append(r.cents)
    means = {k: sum(v) / len(v) for k, v in by_dow.items()}
    devs = [r.cents - means[r.dow] for r in daily]
    mad = st.median(abs(x) for x in devs)
    expect = {
        r.d for r in daily if abs(r.cents - means[r.dow]) > 3 * 1.4826 * mad
    }
    assert {r.d for r in rows} == expect
    assert len(rows) > 0


def test_prefix_sum_scalable_has_no_single_task_window(spark, sf_dir):
    df = QUERIES["window_running_sum_scalable"](spark, sf_dir)
    rows = df.collect()
    # Monotone non-decreasing global prefix sums ending at the total.
    total = (
        load(spark, sf_dir, "orders")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            ).cast("bigint")
        )
        .collect()[0][0]
    )
    assert rows[-1].cum_cents == total
    assert all(
        rows[i].cum_cents <= rows[i + 1].cum_cents
        for i in range(len(rows) - 1)
    )
    # The data-sized window is PARTITIONED (by bucket) — the only
    # unpartitioned window in the plan is the tiny offsets frame,
    # which sits on an Aggregate, never on the scan.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_markov_removal_attribution_invariants(spark, sf_dir):
    rows = QUERIES["analytics_markov_removal_attribution"](
        spark, sf_dir
    ).collect()
    assert len(rows) >= 3  # the non-purchase channels
    for r in rows:
        assert 0 <= r.removal_effect_pm <= 1000  # removal never helps
        assert 0 <= r.attribution_pm <= 1000
    # Shares normalize to ~1000 permille (integer rounding slack).
    assert abs(sum(r.attribution_pm for r in rows) - 1000) <= len(rows)
    # Deterministic across runs.
    rows2 = QUERIES["analytics_markov_removal_attribution"](
        spark, sf_dir
    ).collect()
    assert rows == rows2


def test_sequence_patterns_nest_logically(spark, sf_dir):
    r = QUERIES["analytics_sequence_pattern_regex"](spark, sf_dir).collect()[0]
    # clean-convert (v then p, no e between) implies view→…→purchase
    # exists, so it can't exceed users with v.*p at all; and every
    # count is bounded by the user population.
    for c in (
        r.n_view_click_buy,
        r.n_clean_convert,
        r.n_repeat_buyers,
        r.n_error_no_recovery,
    ):
        assert 0 <= c <= r.n_users
    # Cross-check one pattern in Python.
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("ts_ns DIV 1000000").alias("ms"),
            "event_id",
            "event_type",
        )
        .collect()
    )
    import re
    from collections import defaultdict

    from pg_archiver_spark.operators.analytics import SEQ_CHAR

    seqs = defaultdict(list)
    for e in ev:
        seqs[e.user_id].append((e.ms, e.event_id, SEQ_CHAR[e.event_type]))
    n = sum(
        1
        for u, items in seqs.items()
        if re.search(
            "v.*c.*p", "".join(ch for _, _, ch in sorted(items))
        )
    )
    assert r.n_view_click_buy == n


def test_neardup_eval_pr_set_algebra_and_banding(spark, sf_dir):
    r = QUERIES["pipeline_neardup_eval_pr"](spark, sf_dir).collect()[0]
    assert r.n_tp <= min(r.n_exact, r.n_candidates)
    assert 0 <= r.precision_pm <= 1000
    assert 0 <= r.recall_pm <= 1000
    # b=12 bands of r=2: catch probability 1-(1-s^2)^12 >= 0.97 for
    # s >= 0.5, so fixture recall should be near-total.
    assert r.recall_pm >= 900
    assert r.n_exact > 0 and r.n_candidates > 0


def test_hard_negative_margins_and_labels(spark, sf_dir):
    rows = QUERIES["pipeline_hard_negative_mining"](spark, sf_dir).collect()
    assert len(rows) == 32
    emb = {
        r.vec_id: r.label
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    for r in rows:
        assert emb[r.pos_id] == emb[r.anchor_id]  # positive: same label
        assert emb[r.neg_id] != emb[r.anchor_id]  # negative: different
        assert r.pos_id != r.anchor_id
        assert abs(r.margin - (r.pos_sim - r.neg_sim)) < 1e-12


def test_theil_sen_robust_to_outlier_month(spark, sf_dir):
    rows = QUERIES["analytics_theil_sen_trend"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_pairs == r.n_months * (r.n_months - 1) // 2
    # Robustness: recompute one group's slope in Python with one month
    # corrupted 100x — the Sen slope must barely move relative to the
    # corruption's OLS impact.
    import statistics as st

    monthly = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m")
        )
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100))
            .cast("bigint")
            .alias("cents")
        )
        .orderBy("m")
        .collect()
    )
    pts = [(r.m, float(r.cents)) for r in monthly]

    def sen(points):
        slopes = [
            (y2 - y1) / (m2 - m1)
            for i, (m1, y1) in enumerate(points)
            for (m2, y2) in points[i + 1 :]
        ]
        return st.median(slopes)

    # Independent replica of the op's integer-quantized slopes
    # (trunc-div toward zero, exact int arithmetic — the r12 ladder).
    def sen_int(points):
        slopes = []
        for i, (m1, y1) in enumerate(points):
            for m2, y2 in points[i + 1 :]:
                dy, dm = int(y2) - int(y1), m2 - m1
                q = abs(dy) // dm
                slopes.append(q if dy >= 0 else -q)
        return st.median(slopes)

    base = sen(pts)
    base_int = sen_int([(r.m, r.cents) for r in monthly])
    corrupted = [
        (m, y * 100 if i == len(pts) // 2 else y)
        for i, (m, y) in enumerate(pts)
    ]
    spread = max(y for _, y in pts) - min(y for _, y in pts)
    assert abs(sen(corrupted) - base) < spread  # bounded movement
    got = [r.sen_slope for r in rows if r.priority == "1-URGENT"][0]
    assert got == base_int  # exact: both sides are integer-median exact
    # quantization moves the estimate by less than 1 cent/month per
    # slope, so the float replica still agrees to that tolerance
    assert abs(got - base) <= 1.0


def test_warc_record_roundtrip_and_corruption_detection(spark, sf_dir):
    import pytest as _pytest

    from pg_archiver_spark.sources.warc import build_record, parse_shard

    # Per-record byte-level roundtrip, including a payload containing
    # the record separator (legal per spec; length-driven parse).
    tricky = "line one\r\n\r\nline two with blank separator inside"
    recs = (
        build_record(1, "web", "en", "hello world")
        + build_record(2, "books", "de", tricky)
    )
    parsed = parse_shard(recs)
    assert [(r[0], r[1], r[2]) for r in parsed] == [
        (1, "web", "en"),
        (2, "books", "de"),
    ]
    assert parsed[1][4] == tricky
    assert parsed[0][3] == len(b"hello world")

    # Corrupt version line → hard error, not silent skip.
    bad = b"HTTP/1.0\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n"
    with _pytest.raises(ValueError):
        parse_shard(bad)

    # Full-corpus text fidelity through the distributed path: every
    # doc's text survives byte-identically.
    from pg_archiver_spark.registry import QUERIES

    row = QUERIES["source_warc_ingest"](spark, sf_dir).collect()[0]
    docs = load(spark, sf_dir, "documents")
    assert row.n_records == docs.count()
    assert row.total_chars == docs.agg(F.sum(F.length("text"))).collect()[0][0]


def test_mannwhitney_matches_scipy_formula(spark, sf_dir):
    r = QUERIES["analytics_mannwhitney_u"](spark, sf_dir).collect()[0]
    # Recompute from first principles in Python.
    vals = [
        (row.v, row.is_a)
        for row in load(spark, sf_dir, "orders")
        .selectExpr(
            "o_totalprice AS v",
            "CASE WHEN substring(md5(CAST(o_orderkey AS STRING)), 1, 1)"
            " BETWEEN '0' AND '7' THEN 1 ELSE 0 END AS is_a",
        )
        .collect()
    ]
    vals.sort()
    n = len(vals)
    n_a = sum(a for _, a in vals)
    # average ranks with ties
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        avg = (i + 1 + j) / 2  # mean of ranks i+1..j
        ranks[vals[i][0]] = (avg, j - i)
        i = j
    r_a = sum(ranks[v][0] for v, a in vals if a == 1)
    u_a = r_a - n_a * (n_a + 1) / 2
    assert abs(r.u2_a / 2 - u_a) < 1e-6
    assert r.n_a == n_a and r.n_b == n - n_a
    # Null calibration: |z| small-ish under the hash split.
    assert abs(r.z_score) < 5.0


def test_knn_eval_counts_partition_the_panel(spark, sf_dir):
    rows = QUERIES["ml_knn_eval_accuracy"](spark, sf_dir).collect()
    assert sum(r.n_queries for r in rows) == 64  # every query predicted once
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert r.accuracy_pm == (r.n_correct * 1000) // r.n_queries


def test_fim_transform_conserves_characters(spark, sf_dir):
    rows = QUERIES["pipeline_fim_transform"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 20)
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:50]:
        body = r.fim_text
        assert body.startswith("<PRE>")
        pre, rest = body[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        # PSM reassembly reproduces the document exactly.
        assert pre + mid + suf == docs[r.doc_id]
        assert len(pre) == r.cut_lo - 1
        assert len(mid) == r.cut_hi - r.cut_lo


def test_fixed_width_roundtrip_exact(spark, sf_dir):
    rows = QUERIES["source_fixed_width"](spark, sf_dir).collect()
    ref = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.n_events, r.sum_value, r.max_event_id) for r in rows] == [
        (r.event_type, r.n_events, r.sum_value, r.max_event_id) for r in ref
    ]


def test_kfold_assign_partitions_corpus(spark, sf_dir):
    rows = QUERIES["pipeline_kfold_assign"](spark, sf_dir).collect()
    total_docs = load(spark, sf_dir, "documents").count()
    assert sorted(r.fold for r in rows) == list(range(len(rows)))
    # Folds partition the corpus; each complement is exactly the rest.
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        assert r.n_train_docs == total_docs - r.n_docs
        # Balance: each fold within a loose band of 1/K.
        assert abs(r.n_docs - total_docs / len(rows)) < total_docs * 0.2


def test_chat_template_mask_boundary_exact(spark, sf_dir):
    rows = QUERIES["pipeline_chat_template"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 20)
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:50]:
        assert len(r.chat_text) == r.total_len
        # The character AT the mask boundary is the first completion
        # char; everything before it is prompt + template scaffolding.
        masked = r.chat_text[: r.mask_len]
        assert masked.endswith("<|im_start|>assistant\n")
        completion = r.chat_text[r.mask_len : -len("<|im_end|>")]
        prompt = masked[len("<|im_start|>user\n") : masked.index("<|im_end|>")]
        assert prompt + completion == docs[r.doc_id]


def test_pareto_abc_bands_are_monotone(spark, sf_dir):
    rows = QUERIES["analytics_pareto_abc"](spark, sf_dir).collect()
    # Cumulative share is nondecreasing and ends at 100%.
    pm = [r.cum_permille for r in rows]
    assert pm == sorted(pm)
    assert 999 <= pm[-1] <= 1000
    # Class bands appear in order A..B..C with no interleaving.
    classes = "".join(r.abc_class for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count(
        "B"
    ) + "C" * classes.count("C")
    assert classes.count("A") >= 1 and classes.count("C") >= 1
    # Revenue is sorted descending within the A-head ordering.
    revs = [r.revenue for r in rows]
    assert all(revs[i] >= revs[i + 1] for i in range(len(revs) - 1))


def test_fuzzy_blocked_matches_quadratic_oracle(spark, sf_dir):
    from pg_archiver_spark.operators.joins import FUZZY_MAX_DIST

    rows = QUERIES["join_fuzzy_blocked"](spark, sf_dir).collect()
    # Ground truth by brute force over the (small) part table.
    import itertools

    parts = (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .collect()
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    blocks = {}
    for p in parts:
        blocks.setdefault((p.p_brand, p.p_size), []).append(p)
    expected = set()
    for members in blocks.values():
        for x, y in itertools.combinations(
            sorted(members, key=lambda p: p.p_partkey), 2
        ):
            if lev(x.p_name, y.p_name) <= FUZZY_MAX_DIST:
                expected.add((x.p_partkey, y.p_partkey))
    got = {(r.id_a, r.id_b) for r in rows}
    # Blocking on the equality keys loses nothing within blocks; the
    # length band is a necessary condition of distance <= 2... only if
    # band >= max dist, which the constants guarantee.
    assert got == expected
    for r in rows:
        assert 0 <= r.edit_dist <= FUZZY_MAX_DIST and r.id_a < r.id_b


def test_permutation_test_null_is_calibrated(spark, sf_dir):
    row = QUERIES["analytics_permutation_test"](spark, sf_dir).collect()[0]
    from pg_archiver_spark.operators.statistics import PERM_B

    assert row.n_extreme <= PERM_B
    assert row.p_permille == (row.n_extreme + 1) * 1000 // (PERM_B + 1)
    # Null calibration: the observed "effect" is itself a hash split,
    # so it should NOT be extreme vs the permutation distribution.
    assert row.p_permille >= 100


def test_shapley_efficiency_axiom(spark, sf_dir):
    rows = QUERIES["analytics_shapley_attribution"](spark, sf_dir).collect()
    assert sorted(r.channel for r in rows) == ["click", "error", "signup", "view"]
    # Monotone characteristic function => every Shapley value >= 0.
    from decimal import ROUND_HALF_UP, Decimal

    for r in rows:
        assert r.shapley_x24 >= 0
        # shapley is the 6dp HALF_UP rounding of x24/24 (r12 sweep)
        want = float(
            Decimal(r.shapley_x24 / 24).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.shapley == want
    # Efficiency: sum of attributions == v(all channels) - v(empty set)
    # = converters with a nonempty pre-purchase touch set.
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000000").alias("ms")
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ms").alias("fp_ms"))
    )
    touched = (
        fp.join(ev, "user_id")
        .filter((F.col("ms") < F.col("fp_ms")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.shapley_x24 for r in rows) == 24 * touched


def test_collation_groupby_merges_case_variants(spark, sf_dir):
    rows = QUERIES["string_collation_groupby"](spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sorted(r.event_type for r in rows) == [
        "click", "error", "purchase", "signup", "view"
    ]
    assert sum(r.n_events for r in rows) == n_events
    # The md5 re-casing produced multiple spellings per type, and the
    # collated GROUP BY absorbed them all.
    assert all(2 <= r.n_case_variants <= 3 for r in rows)


def test_mmr_rerank_matches_bruteforce(spark, sf_dir):
    import numpy as np
    from pg_archiver_spark.functions.similarity import (
        MMR_CAND,
        MMR_K,
        MMR_LAMBDA,
    )

    rows = QUERIES["sim_mmr_rerank"](spark, sf_dir).collect()
    assert [r.mmr_rank for r in rows] == list(range(1, MMR_K + 1))
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0] / np.linalg.norm(emb[0])

    def cos(a, b):
        return float(
            np.round(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)), 6)
        )

    rel = {v: cos(e, emb[0]) for v, e in emb.items() if v != 0}
    cands = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_CAND]
    selected = []
    while cands and len(selected) < MMR_K:
        best = None
        for v in cands:
            red = max((cos(emb[v], emb[s]) for s in selected), default=0.0)
            score = round(MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * red, 6)
            key = (score, -v)
            if best is None or key > best[0]:
                best = (key, v)
        selected.append(best[1])
        cands.remove(best[1])
    assert [r.vec_id for r in rows] == selected
    # First pick is the pure-relevance winner; later picks trade
    # relevance for novelty (the property MMR exists for).
    assert rows[0].rel_rank == 1 and rows[0].redundancy == 0.0
    assert any(r.rel_rank > r.mmr_rank for r in rows)


def test_psi_drift_null_calibrated_and_zero_filled(spark, sf_dir):
    from pg_archiver_spark.operators.statistics import PSI_BUCKETS

    rows = QUERIES["analytics_psi_drift"](spark, sf_dir).collect()
    # Every bin reported exactly once, empty ones as explicit zeros.
    assert [r.bucket for r in rows] == list(range(PSI_BUCKETS))
    assert len({r.psi_total_nano for r in rows}) == 1
    assert sum(r.psi_nano for r in rows) == rows[0].psi_total_nano
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == n_events
    # Both halves draw from the same distribution: PSI far below the
    # 0.1 'stable' industry threshold (in nano units).
    assert abs(rows[0].psi_total_nano) < 0.1e9


def test_ols_normal_eq_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    row = QUERIES["ml_ols_normal_eq"](spark, sf_dir).collect()[0]
    from pg_archiver_spark.functions.similarity import OLS_BASE_DATE

    feats = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_totalprice").cast("double").alias("y"),
            F.datediff("o_orderdate", F.lit(OLS_BASE_DATE))
            .cast("double")
            .alias("x1"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0)
            .otherwise(0.0)
            .alias("x2"),
            F.when(F.col("o_orderstatus") == "F", 1.0)
            .otherwise(0.0)
            .alias("x3"),
        )
        .collect()
    )
    X = np.array([[1.0, r.x1, r.x2, r.x3] for r in feats])
    yv = np.array([r.y for r in feats])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    got = [row.beta_intercept, row.beta_day, row.beta_urgent, row.beta_status_f]
    assert np.allclose(got, beta, rtol=1e-6)
    pred = X @ beta
    r2 = 1 - ((yv - pred) ** 2).sum() / ((yv - yv.mean()) ** 2).sum()
    assert abs(row.r2 - r2) < 1e-6
    assert row.n == len(feats)


def test_forecast_backtest_no_leakage(spark, sf_dir):
    from pg_archiver_spark.operators.analytics import FCST_CUTOFF

    rows = QUERIES["analytics_forecast_backtest"](spark, sf_dir).collect()
    assert all(str(r.day) >= FCST_CUTOFF for r in rows)
    for r in rows:
        assert r.abs_err_cents == abs(r.forecast_cents - r.actual_cents)
    # The fitted trend extrapolates sanely: forecasts stay positive
    # and within an order of magnitude of actuals on average.
    mean_actual = sum(r.actual_cents for r in rows) / len(rows)
    mean_forecast = sum(r.forecast_cents for r in rows) / len(rows)
    assert 0 < mean_forecast < 10 * mean_actual


def test_bfs_distance_triangle_inequality_and_source(spark, sf_dir):
    rows = QUERIES["graph_bfs_distance"](spark, sf_dir).collect()
    dists = {r.brand: r.dist for r in rows}
    src = min(dists)
    # BFS source is the smallest endpoint at distance 0; levels are
    # contiguous (a node at dist d implies some node at dist d-1).
    assert dists[src] == 0
    levels = sorted(set(dists.values()))
    assert levels == list(range(len(levels)))
    from pg_archiver_spark.operators.analytics import BFS_MAX_DEPTH

    assert max(levels) <= BFS_MAX_DEPTH


def test_dpo_pairs_margin_and_group_semantics(spark, sf_dir):
    rows = QUERIES["pipeline_dpo_pairs"](spark, sf_dir).collect()
    assert len(rows) > 0
    seen = set()
    for r in rows:
        assert (r.lang, r.source) not in seen  # one pair per group
        seen.add((r.lang, r.source))
        assert r.chosen_doc_id != r.rejected_doc_id
        assert r.margin_pm == r.chosen_score_pm - r.rejected_score_pm
        assert r.margin_pm >= 0
        assert r.grp_n >= 2  # single-doc groups excluded


def test_rolling_regression_agrees_with_numpy_on_a_window(spark, sf_dir):
    import numpy as np

    rows = QUERIES["window_rolling_regression"](spark, sf_dir).collect()
    from pg_archiver_spark.operators.windows import ROLLREG_WINDOW

    daily = {r.t: r.cents for r in rows}
    # Recompute the slope for a handful of rows from raw window points.
    for r in rows[50:55]:
        ts = [
            t for t in daily if r.t - (ROLLREG_WINDOW - 1) <= t <= r.t
        ]
        ys = [daily[t] for t in ts]
        assert len(ts) == r.n_window or r.t - (ROLLREG_WINDOW - 1) < min(
            daily
        )
        slope = np.polyfit(ts, ys, 1)[0]
        assert abs(slope - r.slope_cents_per_day) < max(
            1e-6 * abs(slope), 1e-6
        )
    assert all(r.n_window >= 2 for r in rows)


def test_winsorized_mean_bounds_effect(spark, sf_dir):
    rows = QUERIES["agg_winsorized_mean"](spark, sf_dir).collect()
    raw = {
        r.priority: (r.n, r.mean_price)
        for r in load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            F.avg("o_totalprice").alias("mean_price"),
        )
        .collect()
    }
    for r in rows:
        n, raw_mean = raw[r.priority]
        assert r.n == n
        # ~10% of mass is clamped (5% each tail), never more than 12%.
        assert 0 < r.n_clamped <= 0.12 * n + 2
        # Winsorizing moves the mean, but not beyond the raw extremes.
        assert abs(r.winsor_mean - raw_mean) / raw_mean < 0.25
        assert r.winsor_sum_cents / r.n / 100 == r.winsor_mean


def test_goertzel_power_detects_planted_weekly_cycle(spark, sf_dir):
    row = QUERIES["analytics_goertzel_weekly_power"](spark, sf_dir).collect()[0]
    assert row.n_days > 100
    assert row.power_weekly >= 0 and row.power_ref >= 0
    assert row.power_ratio == row.power_weekly / row.power_ref
    # Fixed-point coefficient tables are exact-integer and sum to ~0
    # (roots of unity): quantization bias bound.
    from pg_archiver_spark.operators.statistics import _C7, _S7, GOERTZEL_SCALE

    assert abs(sum(_C7)) <= 7 and abs(sum(_S7)) <= 7
    assert max(abs(c) for c in _C7) == GOERTZEL_SCALE


def test_exact_quantile_twopass_equals_sorted_selection(spark, sf_dir):
    row = QUERIES["agg_exact_quantile_twopass"](spark, sf_dir).collect()[0]
    vals = sorted(
        int(round(r[0] * 100))
        for r in load(spark, sf_dir, "orders")
        .select(F.col("o_totalprice").cast("decimal(18,2)").cast("double"))
        .collect()
    )
    n = len(vals)
    assert row.n == n
    k50 = (n + 1) // 2
    k99 = -(-99 * n // 100)
    assert row.p50_cents == vals[k50 - 1]
    assert row.p99_cents == vals[k99 - 1]
    assert row.p50 == row.p50_cents / 100


def test_stickiness_bounds_and_identity(spark, sf_dir):
    rows = QUERIES["analytics_stickiness_dau_wau"](spark, sf_dir).collect()
    assert len(rows) >= 4  # the fixture month spans 4+ epoch-weeks
    for r in rows:
        # avg DAU can never exceed WAU; stickiness ∈ (0, 1000].
        assert 0 < r.stickiness_pm <= 1000
        assert r.stickiness_pm == r.sum_dau * 1000 // (r.n_days * r.wau)
        assert r.wau >= max(1, r.sum_dau // r.n_days)
        assert 1 <= r.n_days <= 7


def test_root_cause_shares_sum_to_one_per_dimension(spark, sf_dir):
    rows = QUERIES["analytics_root_cause_contribution"](spark, sf_dir).collect()
    dims = {}
    for r in rows:
        dims.setdefault(r.dimension, []).append(r)
    assert set(dims) == {"event_type", "weekday"}
    for dim, rs in dims.items():
        # Conservation: per-dimension deltas sum to the SAME global
        # metric delta, and shares sum to 1 (each share is 6dp-rounded
        # per the r12 output discipline — allow that quantization).
        tol = len(rs) * 5e-7 + 1e-9
        assert abs(sum(x.share_of_delta for x in rs) - 1.0) < tol
        assert abs(sum(x.mix_shift for x in rs)) < tol
        for x in rs:
            assert x.delta_cents == x.b_cents - x.a_cents
    d1 = sum(x.delta_cents for x in dims["event_type"])
    d2 = sum(x.delta_cents for x in dims["weekday"])
    assert d1 == d2


def test_rocksdb_state_store_engages_and_matches_batch(spark, sf_dir):
    rows = QUERIES["stream_rocksdb_state_store"](spark, sf_dir).collect()
    ref = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_millis(F.expr("ts_ns DIV 1000000")))
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("day")
        .collect()
    )
    assert [(r.day, r.n_events, r.sum_value) for r in rows] == [
        (r.day, r.n_events, r.sum_value) for r in ref
    ]


def test_nested_schema_pruning_reads_only_touched_leaves(spark, sf_dir):
    # The op hard-fails internally if ReadSchema carries untouched
    # struct leaves, so a clean run IS the plan assertion; verify the
    # values too.
    rows = QUERIES["scan_nested_schema_pruning"](spark, sf_dir).collect()
    ref = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
        .collect()
    )
    assert [(r.priority, r.n_orders, r.sum_price) for r in rows] == [
        (r.priority, r.n_orders, r.sum_price) for r in ref
    ]


def test_binary_quantize_hamming_matches_python_recompute(spark, sf_dir):
    rows = QUERIES["sim_binary_quantize_hamming"](spark, sf_dir).collect()
    emb = {
        r.vec_id: r.embedding
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def code(v):
        return sum(1 << i for i, x in enumerate(v) if x >= 0)

    q = code(emb[0])
    dists = sorted(
        (bin(code(v) ^ q).count("1"), vid)
        for vid, v in emb.items()
        if vid != 0
    )[:10]
    assert [(r.hamming, r.vec_id) for r in rows] == dists
    assert all(0 <= r.hamming <= 64 for r in rows)


def test_arrow_udtf_ngrams_match_jvm_expansion(spark, sf_dir):
    rows = QUERIES["udtf_arrow_char_ngrams"](spark, sf_dir).collect()
    # Zero-Python JVM twin: sequence + explode + substring.
    ref = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(20)
        .collect()
    )
    assert [(r.trigram, r.n) for r in rows] == [(r.trigram, r.n) for r in ref]


def test_sprt_first_crossing_freezes_decision(spark, sf_dir):
    from pg_archiver_spark.operators.statistics import (
        _SPRT_LOWER,
        _SPRT_UPPER,
    )

    rows = QUERIES["analytics_sprt_sequential"](spark, sf_dir).collect()
    assert [r.day for r in rows] == sorted(r.day for r in rows)
    crossed = False
    for r in rows:
        out = r.llr_nano >= _SPRT_UPPER or r.llr_nano <= _SPRT_LOWER
        if not crossed and out:
            crossed = True
            first = r
        if not crossed:
            assert r.decision == "continue"
        else:
            # Decision frozen at the first crossing's direction.
            assert r.decision in ("accept_h0", "accept_h1", "decided")
    # Monotone bookkeeping: cumulative counts never decrease.
    for a, b in zip(rows, rows[1:]):
        assert b.cum_n >= a.cum_n and b.cum_x >= a.cum_x
    # Null-calibrated fixture (purchase share ~0.20 = p0): the test
    # must end in accept_h0, never accept_h1.
    assert rows[-1].decision == "accept_h0"


def test_state_store_reader_recovers_exact_aggregate(spark, sf_dir):
    rows = QUERIES["source_state_store_reader"](spark, sf_dir).collect()
    ref = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.n_events, r.sum_cents) for r in rows] == [
        (r.user_id, r.n_events, r.sum_cents) for r in ref
    ]


def test_pettitt_matches_bruteforce_sign_pairs(spark, sf_dir):
    row = QUERIES["analytics_pettitt_changepoint"](spark, sf_dir).collect()[0]
    daily = sorted(
        (
            (r.day, r.cents)
            for r in load(spark, sf_dir, "orders")
            .groupBy(F.col("o_orderdate").alias("day"))
            .agg(
                (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
                .cast("bigint")
                .alias("cents")
            )
            .collect()
        ),
    )
    xs = [c for _, c in daily]
    T = len(xs)
    assert row.t_days == T
    # Midrank-based U_t (the op's formulation) recomputed directly.
    order = sorted(range(T), key=lambda i: xs[i])
    r2 = [0] * T
    i = 0
    while i < T:
        j = i
        while j < T and xs[order[j]] == xs[order[i]]:
            j += 1
        # doubled midrank = (i+1) + (j) in 1-based = i+j+1
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j
        i = j
    s = 0
    best = (-1, None)
    for t in range(1, T):
        s += r2[t - 1]
        u = s - t * (T + 1)
        if abs(u) > best[0]:
            best = (abs(u), t)
    assert row.k_stat == best[0]
    assert str(row.tau_day) == str(daily[best[1] - 1][0])[:10]
    # No planted shift in the fixture: large p expected.
    assert row.p_approx > 0.01


def test_join_hint_flips_strategy_not_answer(spark, sf_dir):
    rows = QUERIES["join_hint_shuffle_hash"](spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # Unhinted twin (broadcast disabled so size can't short-circuit it):
    # the default big-big strategy is SortMergeJoin.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count("*").cast("bigint").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
            .orderBy("priority")
        )
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert [(r.priority, r.n_items, r.sum_price) for r in rows] == [
            (r.priority, r.n_items, r.sum_price) for r in plain.collect()
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_yoy_growth_join_alignment(spark, sf_dir):
    rows = QUERIES["analytics_yoy_growth"](spark, sf_dir).collect()
    monthly = {
        (r.yr, r.mo): r.cents
        for r in load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    }
    assert len(rows) > 0
    for r in rows:
        assert monthly[(r.yr, r.mo)] == r.cents
        assert monthly[(r.yr - 1, r.mo)] == r.prior_cents
        assert r.delta_cents == r.cents - r.prior_cents
        # yoy_growth is 6dp-rounded (r12 output discipline)
        assert abs(r.yoy_growth - r.delta_cents / r.prior_cents) <= 5e-7
    # Every month with a prior-year twin is present — none dropped.
    expected = {
        (y, m) for (y, m) in monthly if (y - 1, m) in monthly
    }
    assert {(r.yr, r.mo) for r in rows} == expected


def test_attribution_rules_conservation(spark, sf_dir):
    rows = QUERIES["analytics_attribution_rules"](spark, sf_dir).collect()
    # Converters with a nonempty path (reuse the shapley test's frame).
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000000").alias("ms")
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ms").alias("fp_ms"))
    )
    with_path = (
        fp.join(ev, "user_id")
        .filter((F.col("ms") < F.col("fp_ms")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    # First/last credits each sum to exactly the converter count.
    assert sum(r.first_touch for r in rows) == with_path
    assert sum(r.last_touch for r in rows) == with_path
    # Linear credit sums to ~1000 permille per converter (floor dust).
    total_pm = sum(r.linear_credit_pm for r in rows)
    assert with_path * 900 < total_pm <= with_path * 1000


def test_price_index_base_year_is_unity(spark, sf_dir):
    from pg_archiver_spark.operators.analytics import PRICE_INDEX_BASE_YEAR

    rows = QUERIES["analytics_price_index"](spark, sf_dir).collect()
    by_year = {r.yr: r for r in rows}
    assert PRICE_INDEX_BASE_YEAR in by_year
    base = by_year[PRICE_INDEX_BASE_YEAR]
    # Valuing base quantities at base prices IS the base value:
    # index(base year) == 1 up to per-part micro rounding.
    assert abs(base.laspeyres_index - 1.0) < 1e-6
    assert (
        abs(base.current_value_micro - base.base_value_cents * 10**6)
        <= base.n_parts_matched
    )
    for r in rows:
        assert r.n_parts_matched > 0 and r.base_value_cents > 0
        # Synthetic prices are stable: index stays in a sane band.
        assert 0.2 < r.laspeyres_index < 5.0


def test_curriculum_phases_are_monotone_difficulty_bands(spark, sf_dir):
    rows = QUERIES["pipeline_curriculum_phases"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.curation import CURRICULUM_PHASES

    assert [r.phase for r in rows] == list(range(1, CURRICULUM_PHASES + 1))
    total_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    # NTILE balance: phase sizes differ by at most 1.
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # Easy -> hard: the primary difficulty key (token count) ascends
    # across phases with at most boundary overlap of one value.
    for a, b in zip(rows, rows[1:]):
        assert b.min_tokens >= a.min_tokens
        assert b.max_tokens >= a.max_tokens
        assert b.min_tokens >= a.max_tokens - 1 or b.min_tokens >= a.min_tokens
    assert abs(sum(r.token_share_pm for r in rows) - 1000) <= len(rows)


def test_phash_neardup_finds_all_planted_twins(spark, sf_dir):
    rows = QUERIES["multimodal_phash_neardup"](spark, sf_dir).collect()
    planted = {
        int(r.doc_id)
        for r in load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0))
        .collect()
    }
    got_pairs = {(r.id_a, r.id_b) for r in rows}
    # 100% recall: a global brightness shift is aHash-invariant, so
    # every planted (twin, original) pair must surface at hamming 0.
    for d in planted:
        assert (-d - 1, d) in got_pairs
    for r in rows:
        if r.id_a < 0 and r.id_b == -r.id_a - 1:
            assert r.hamming == 0
    # Precision report: planted twins dominate the pair set.
    twin_pairs = sum(1 for r in rows if r.id_a < 0 and r.id_b == -r.id_a - 1)
    assert twin_pairs == len(planted)
    assert twin_pairs / len(rows) > 0.5


def test_audio_fingerprint_recovers_planted_twins(spark, sf_dir):
    rows = QUERIES["multimodal_audio_fingerprint_neardup"](
        spark, sf_dir
    ).collect()
    planted = {
        int(r.doc_id)
        for r in load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 10 == 5))
        .collect()
    }
    got_pairs = {(r.id_a, r.id_b) for r in rows}
    # Amplitude invariance: every halved-amplitude twin must pair with
    # its original within the Hamming budget.
    for d in planted:
        assert (-d - 1, d) in got_pairs
    twin_pairs = sum(1 for r in rows if r.id_a < 0 and r.id_b == -r.id_a - 1)
    assert twin_pairs == len(planted)
    assert twin_pairs / len(rows) > 0.5
    for r in rows:
        assert 0 <= r.hamming <= 10 and r.id_a < r.id_b


def test_gap_fill_locf_step_semantics(spark, sf_dir):
    rows = QUERIES["window_gap_fill_locf"](spark, sf_dir).collect()
    observed = {
        r.d: r.cents
        for r in load(spark, sf_dir, "orders")
        .groupBy(
            F.datediff("o_orderdate", F.lit("1992-01-01"))
            .cast("bigint")
            .alias("d")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    }
    # Dense spine: every day between min and max is present exactly once.
    ds = [r.d for r in rows]
    assert ds == list(range(min(observed), max(observed) + 1))
    last = None
    for r in rows:
        if r.d in observed:
            assert r.is_filled == 0 and r.cents_filled == observed[r.d]
            last = observed[r.d]
        else:
            assert r.is_filled == 1 and r.cents_filled == last
    assert sum(r.is_filled for r in rows) == len(rows) - len(observed)


def test_roc_auc_matches_pairwise_definition(spark, sf_dir):
    from pg_archiver_spark.functions.similarity import ROC_SCORE_DIMS

    row = QUERIES["ml_roc_auc"](spark, sf_dir).collect()[0]
    data = [
        (
            round(sum(r.embedding[:ROC_SCORE_DIMS]) * 1e6),
            1 if r.label < 5 else 0,
        )
        for r in load(spark, sf_dir, "embeddings").collect()
    ]
    pos = [s for s, p in data if p]
    neg = [s for s, p in data if not p]
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    # AUC == P(score_pos > score_neg) + 0.5 P(tie), the pairwise form.
    import bisect

    neg_sorted = sorted(neg)
    wins = ties = 0
    for s in pos:
        lo = bisect.bisect_left(neg_sorted, s)
        hi = bisect.bisect_right(neg_sorted, s)
        wins += lo
        ties += hi - lo
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row.auc - auc) < 1e-12
    # Arbitrary embedding fold vs labels: near-chance AUC expected.
    assert 0.3 < row.auc < 0.7


def test_lift_gains_conservation_and_monotone_capture(spark, sf_dir):
    rows = QUERIES["ml_lift_gains_table"](spark, sf_dir).collect()
    from pg_archiver_spark.functions.similarity import LIFT_DECILES

    assert [r.decile for r in rows] == list(range(1, LIFT_DECILES + 1))
    total = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == total
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance
    caps = [r.cum_capture_pm for r in rows]
    assert caps == sorted(caps)  # gains curve is nondecreasing
    assert 999 <= caps[-1] <= 1000  # full capture at decile 10
    n_tot = sum(r.n for r in rows)
    p_tot = sum(r.n_pos for r in rows)
    for r in rows:
        assert r.lift_milli == r.n_pos * n_tot * 1000 // (r.n * p_tot)


def test_xyz_classification_band_consistency(spark, sf_dir):
    from pg_archiver_spark.operators.analytics import (
        XYZ_T1_SQ_X1E4,
        XYZ_T2_SQ_X1E4,
    )

    rows = QUERIES["analytics_xyz_classification"](spark, sf_dir).collect()
    assert len(rows) == 25  # one row per brand
    import math

    for r in rows:
        assert r.n_weeks > 0 and r.mean_qty_milli > 0
        # The float cv column and the integer band decision agree.
        t1, t2 = math.sqrt(XYZ_T1_SQ_X1E4 / 1e4), math.sqrt(XYZ_T2_SQ_X1E4 / 1e4)
        if r.xyz_class == "X":
            assert r.cv <= t1 + 1e-9
        elif r.xyz_class == "Y":
            assert t1 - 1e-9 <= r.cv <= t2 + 1e-9
        else:
            assert r.cv >= t2 - 1e-9


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    import numpy as np

    row = QUERIES["text_zipf_fit"](spark, sf_dir).collect()[0]
    freqs = sorted(
        (
            r.f
            for r in load(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias("f"))
            .collect()
        ),
        reverse=True,
    )
    assert row.n_vocab == len(freqs)
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(freqs, dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    # Nano-quantized fixed-point OLS tracks the float fit closely.
    assert abs(row.zipf_slope - slope) < 1e-6
    assert -3.0 < row.zipf_slope < 0.0
