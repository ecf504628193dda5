"""Multimodal-column operators (LLM training-data pipeline surface).

Pattern: media (image/audio/video) travels as an opaque ``binary``
column with a typed metadata struct alongside; decode / feature-extract
runs as Arrow-batched ``mapInPandas`` so the Python boundary is paid per
batch, not per row. The container has no image/audio codecs, so the
decode kernel is a clearly-marked deterministic stub — the Spark-side
plumbing (schema, batching, partitioning) is real and is what the
operator contract tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "multimodal_join",
    oracle="""
    SELECT d.lang, e.label,
           COUNT(*) AS n_docs,
           CAST((SUM(d.n_chars) * 1000) // COUNT(*) AS BIGINT) AS avg_chars_milli
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector modalities in one frame (doc_id = vec_id). Mean
    length in exact milli-units (int-ratio ROUND ties, G11)."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("(SUM(n_chars) * 1000) DIV COUNT(*)").alias("avg_chars_milli"),
        )
    )


def decode_image(payload: bytes) -> dict:
    """Media decode kernel — STUB.

    Real deployments plug a codec (PIL/ffmpeg/torchaudio) in here; this
    container ships none, so we return a deterministic fake derived from
    the payload bytes. The surrounding Spark plumbing (binary column →
    Arrow batch → feature columns) is the real, tested part.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this container")
    checksum = 0
    for i, byte in enumerate(payload[:64]):
        checksum = (checksum * 31 + byte + i) % 1_000_000_007
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        # A real decoder would return pixels; the fake "dimensions" are a
        # deterministic function of the payload, standing in for them.
        "width": 16 + (checksum % 64),
        "height": 16 + ((checksum // 64) % 64),
    }


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [decode_image(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "media_type", pdf["media_type"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register("multimodal_binary_features")  # rows-only: Python kernel, no SQL form
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → decode → typed features via mapInPandas.

    The fixture has no real media, so the binary payload is the UTF-8
    text bytes tagged with a media_type — the schema shape (binary +
    metadata struct) and the Arrow batch path are identical to a real
    image pipeline. Output: per-(media_type) feature profile.
    """
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("media_type"),
    )
    feats = media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_frames
    FROM (
        SELECT doc_id, lang, unnest(range(10)) AS frame_no
        FROM documents
    )
    WHERE frame_no % 3 = 0
    GROUP BY lang
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: each doc fans out to 10
    per-frame rows (what a video decode produces), then every 3rd frame
    is kept. explode() is the fan-out primitive; a real pipeline swaps
    the synthetic frame list for mapInPandas-decoded frames."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("frame_no"),
        )
        .filter(F.col("frame_no") % 3 == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n_frames"))
    )
