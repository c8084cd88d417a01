"""Real PGM codec path: hand-computed decode/resize expectations plus the
end-to-end mapInPandas pipeline."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kasper_spark.operators.multimodal import (
    decode_pgm,
    encode_pgm,
    multimodal_pgm_codec,
)
from tests.conftest import SF_SMOKE


def test_pgm_roundtrip_and_resize_math():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)  # 6x4 gradient
    blob = encode_pgm(6, 4, px.tobytes())
    assert blob.startswith(b"P5\n6 4\n255\n")
    w, h, maxval, raster = decode_pgm(blob)
    assert (w, h, maxval) == (6, 4, 255)
    back = np.frombuffer(raster, dtype=np.uint8).reshape(4, 6)
    assert (back == px).all()
    # nearest-neighbor 2x: rows 0,2 and cols 0,2,4
    small = back[::2, ::2]
    assert small.tolist() == [[0, 2, 4], [12, 14, 16]]


def test_pgm_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a binary PGM"):
        decode_pgm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated raster"):
        decode_pgm(b"P5\n4 4\n255\n" + b"\x00" * 7)


def test_pgm_pipeline_stats_match_reference(spark):
    """Cross-check the distributed pipeline against a local recomputation
    for a few documents: same dims, same exact mean, same resized digest."""
    rows = {r["doc_id"]: r for r in multimodal_pgm_codec(spark, SF_SMOKE).collect()}
    assert len(rows) > 100

    import duckdb

    n_chars = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF_SMOKE}/documents.parquet' LIMIT 5000"
        ).fetchall()
    )
    for doc_id in list(rows)[:5]:
        w = 16 + int(n_chars[doc_id]) % 17
        h = 12 + int(doc_id) % 9
        xs = np.arange(w, dtype=np.uint16)
        ys = np.arange(h, dtype=np.uint16)[:, None]
        px = ((xs * 7 + ys * 13 + int(doc_id)) % 256).astype(np.uint8)
        r = rows[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_px"] == float(px.sum()) / (w * h)
        small = px[::2, ::2]
        expected = hashlib.sha256(
            encode_pgm(small.shape[1], small.shape[0], small.tobytes())
            .hex()
            .encode("ascii")
        ).hexdigest()[:16]
        assert r["resized_digest"] == expected
