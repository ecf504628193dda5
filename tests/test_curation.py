"""Semantics tests for the curation operators (functions/curation.py).

The driver gate (tools/check.py) already proves Spark↔DuckDB hash
equality; these tests pin the *internal* invariants that equality alone
would not catch — the two-phase cumsum really equals the global one,
the split really partitions the corpus, redaction really removes every
match, and the contamination plan stays an equi-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.functions.curation import TOKEN_BUDGET
from pg_archiver_spark.plans.inspect import physical_plan
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def test_token_budget_two_phase_equals_global_cumsum(spark, sf_dir):
    """The 256-bucket two-phase running sum must match the naive
    single-partition global cumsum document-for-document."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("m"),
    )
    naive = docs.withColumn(
        "running", F.sum("n_tokens").over(Window.orderBy("m", "doc_id"))
    )
    naive_kept = {
        r.doc_id for r in naive.filter(F.col("running") <= TOKEN_BUDGET).collect()
    }
    # Reproduce the op's kept-set (it returns an agg; recompute the
    # running column the same two-phase way).
    bucketed = docs.withColumn("bucket", F.substring("m", 1, 2))
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    two_phase = bucketed.join(F.broadcast(offsets), "bucket").withColumn(
        "running",
        F.sum("n_tokens").over(Window.partitionBy("bucket").orderBy("m", "doc_id"))
        + F.col("offset"),
    )
    two_phase_kept = {
        r.doc_id
        for r in two_phase.filter(F.col("running") <= TOKEN_BUDGET).collect()
    }
    assert two_phase_kept == naive_kept
    assert len(naive_kept) > 0  # the budget actually admits something


def test_train_test_split_partitions_corpus(spark, sf_dir):
    out = QUERIES["pipeline_train_test_split"](spark, sf_dir).collect()
    total_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == total_docs
    splits = {r.split for r in out}
    assert splits == {"train", "val", "test"}
    # Hash split should be roughly 75/25: train strictly the largest.
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert by_split["train"] > by_split["val"] + by_split["test"]


def test_pii_redact_counts_and_cleanliness(spark, sf_dir):
    out = QUERIES["pipeline_pii_redact"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    n_email_docs = docs.filter(F.col("doc_id") % 10 == 0).count()
    n_phone_docs = docs.filter(F.col("doc_id") % 10 == 1).count()
    assert sum(r.n_emails for r in out) == n_email_docs
    assert sum(r.n_phones for r in out) == n_phone_docs
    assert sum(r.n_docs_redacted for r in out) == n_email_docs + n_phone_docs
    # No document may retain a match after replacement: rebuild the
    # injected+redacted frame and scan for leftovers.
    from pg_archiver_spark.functions.curation import _EMAIL_RE, _PHONE_RE

    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" contact a@b.co today")),
        ).otherwise(F.col("text")),
    )
    clean = injected.select(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean")
    )
    leftovers = clean.filter(
        F.regexp_count("clean", F.lit(_EMAIL_RE)) + F.regexp_count("clean", F.lit(_PHONE_RE)) > 0
    ).count()
    assert leftovers == 0


def test_contamination_plan_is_equi_join_no_cartesian(spark, sf_dir):
    plan = physical_plan(QUERIES["pipeline_contamination"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_domain_quota_never_exceeds_cap(spark, sf_dir):
    from pg_archiver_spark.functions.curation import DOMAIN_QUOTA

    out = QUERIES["pipeline_domain_quota"](spark, sf_dir).collect()
    assert all(r.n_kept <= DOMAIN_QUOTA for r in out)
    assert all(r.n_kept <= r.n_total for r in out)
    # Sources under the quota keep everything.
    assert all(r.n_kept == r.n_total for r in out if r.n_total <= DOMAIN_QUOTA)


def test_repetition_ratio_bounds(spark, sf_dir):
    out = QUERIES["text_repetition"](spark, sf_dir).collect()
    for r in out:
        assert 0.0 <= r.repetition_ratio < 1.0
        assert r.repeated_tokens <= r.total_tokens


def test_doc_chunking_covers_every_token(spark, sf_dir):
    """Chunk windows must tile each document exactly: the last chunk
    ends at the final token, non-final chunks carry more than a stride
    (so consecutive windows overlap), and chunk ids are dense from 0."""
    from pg_archiver_spark.functions.curation import CHUNK_STRIDE, CHUNK_TOKENS

    chunks = QUERIES["pipeline_doc_chunking"](spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.max("chunk_id").alias("max_id"),
            F.count("*").alias("n_chunks"),
            F.max(F.col("chunk_id") * CHUNK_STRIDE + F.col("n_chunk_tokens")).alias(
                "last_token"
            ),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.n_chunks == r.max_id + 1  # dense ids 0..max
        assert r.n_chunks == (r.n - 1) // CHUNK_STRIDE + 1
        assert r.last_token == r.n  # final chunk reaches the last token
    non_final = chunks.join(
        chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("max_id")), "doc_id"
    ).filter(F.col("chunk_id") < F.col("max_id"))
    # A non-final window always holds stride+1..CHUNK_TOKENS tokens.
    bad = non_final.filter(
        (F.col("n_chunk_tokens") <= CHUNK_STRIDE)
        | (F.col("n_chunk_tokens") > CHUNK_TOKENS)
    ).count()
    assert bad == 0


def test_seq_packing_conserves_docs_and_tokens(spark, sf_dir):
    from pg_archiver_spark.functions.curation import SEQ_LEN

    out = QUERIES["pipeline_seq_packing"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    total_docs = docs.count()
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r.n_docs for r in out) == total_docs
    assert sum(r.n_tokens_started for r in out) == total_tokens
    # Sequence ids live in [0, total_tokens // SEQ_LEN].
    assert all(0 <= r.seq_id <= total_tokens // SEQ_LEN for r in out)
    # At most one doc can straddle each sequence's end boundary.
    assert all(r.n_crossing <= 1 for r in out)


def test_source_mix_rates_and_determinism(spark, sf_dir):
    out = {r.source: r for r in QUERIES["pipeline_source_mix"](spark, sf_dir).collect()}
    again = {
        r.source: r for r in QUERIES["pipeline_source_mix"](spark, sf_dir).collect()
    }
    assert out.keys() == again.keys()
    for src, r in out.items():
        assert r.n_kept <= r.n_total
        assert 0.25 <= r.target_rate <= 1.0
        # Hash membership is a pure function of doc_id: re-running the
        # sample yields the identical kept set (count + token mass).
        assert (r.n_kept, r.kept_tokens) == (again[src].n_kept, again[src].kept_tokens)
        if r.target_rate == 1.0:
            assert r.n_kept == r.n_total
