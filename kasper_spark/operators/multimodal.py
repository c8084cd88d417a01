"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct — exactly the reference's opaque-bytes value model
(/root/reference/store.go:16-31) lifted into a schema. Decode/feature
extraction runs as Arrow-batched pandas functions over ``mapInPandas``;
since no image/audio libs exist in this container, the decode step is a
clearly-marked deterministic fake (STUB) while the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

Scale notes:
- binary payloads never enter a shuffle here: metadata extraction is a
  map-only stage; downstream joins should carry the (doc_id, features)
  projection, not the blob;
- mapInPandas streams Arrow batches (bounded memory per task) rather than
  collecting rows; batch size is governed by
  spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kasper_spark.catalog import load_table
from kasper_spark.registry import register_query

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature_hash", StringType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: documents' text bytes stand in for encoded
    payloads (deterministic), with a media_type derived from doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched).

    The decode stub and the batch function are *nested* on purpose:
    cloudpickle serializes closures by value, so Spark's Python workers need
    no importable kasper_spark on their PYTHONPATH. (A module-level function
    would pickle by reference and fail on any worker that can't import this
    package — e.g. when the driver process imports us from a file path.)
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
            # STUB decoder: derives (width, height, n_frames, feature_hash)
            # from a sha256 of the payload. A real deployment replaces this
            # with PIL/ffmpeg etc.; everything around it (schemas, Arrow
            # batching) is production plumbing. Raises on None to mirror a
            # real decoder's failure mode.
            if payload is None:
                raise NotImplementedError("real decoder required for null payloads")
            digest = _hashlib.sha256(payload).digest()
            width = 1 + int.from_bytes(digest[0:2], "big") % 4096
            height = 1 + int.from_bytes(digest[2:4], "big") % 4096
            n_frames = 1 + int.from_bytes(digest[4:6], "big") % 300
            return width, height, n_frames, digest.hex()[:16]

        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "feature_hash": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


@register_query(
    "multimodal_meta",
    oracle="""
    SELECT
        doc_id,
        CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
        END AS media_type,
        octet_length(encode(text)) AS byte_len,
        sha256(text) AS payload_sha
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — byte length and content
    digest, all JVM-side (no decode needed). The oracle checks the binary
    column plumbing end-to-end."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("integer").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )


@register_query("multimodal_features")  # rows-only: decoder is a local stub
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas (STUB decode,
    real plumbing). Deterministic output: features derive from sha256."""
    return extract_features(media_table(spark, sf_dir))
