"""Structural gates for the multimodal plumbing: schemas, row-cardinality
shapes (1:1 resize, 1:N frame sampling), and payload integrity — the parts
that must survive swapping the STUB decoder for a real one."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kasper_spark.operators.multimodal import media_table
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_resize_is_one_to_one_over_images(spark):
    n_images = media_table(spark, SF_SMOKE).filter(F.col("media_type") == "image").count()
    out = QUERIES["multimodal_resize"](spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == n_images > 0
    r = rows[0]
    assert (r["width"], r["height"]) == (224, 224)
    # digest column must match the shipped payload (transport integrity)
    assert hashlib.sha256(bytes(r["resized_payload"])).hexdigest()[:16] == r["resized_sha"]


def test_frame_sample_shape_and_cap(spark):
    videos = media_table(spark, SF_SMOKE).filter(F.col("media_type") == "video")
    n_videos = videos.count()
    out = QUERIES["multimodal_frame_sample"](spark, SF_SMOKE)
    per_doc = out.groupBy("doc_id").count().collect()
    assert 0 < len(per_doc) == n_videos
    assert all(1 <= r["count"] <= 8 for r in per_doc)
    # frame indices strictly increasing per doc, ts = 40ms * idx
    one = (
        out.filter(F.col("doc_id") == per_doc[0]["doc_id"])
        .orderBy("frame_idx")
        .collect()
    )
    idxs = [r["frame_idx"] for r in one]
    assert idxs == sorted(set(idxs))
    assert all(r["ts_ms"] == r["frame_idx"] * 40 for r in one)
