"""Gates for the multimodal real-codec pipeline: row-cardinality shapes
(1:1 resize, 1:N frame sampling), demux correctness, and pixel-arithmetic
spot checks against hand-computed values."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from kasper_spark.operators.multimodal import (
    decode_pgm,
    demux_pgm_stream,
    encode_pgm,
    pgm_dims,
    synth_pgm_frame_px,
)
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_resize_is_one_to_one_with_real_box_average(spark):
    out = QUERIES["multimodal_resize"](spark, SF_SMOKE)
    rows = {r["doc_id"]: r for r in out.collect()}
    n_docs = QUERIES["multimodal_meta"](spark, SF_SMOKE).count()
    assert len(rows) == n_docs > 0
    # spot-check one doc against a local recompute of the whole pipeline
    doc_id = sorted(rows)[0]
    r = rows[doc_id]
    w, h = r["width"], r["height"]
    px = synth_pgm_frame_px(doc_id, w, h).astype(np.int64)
    pe = px[: (h // 2) * 2, : (w // 2) * 2]
    small = (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) // 4
    assert (r["resized_h"], r["resized_w"]) == small.shape
    assert r["resized_px_sum"] == int(small.sum())
    assert r["resized_byte_len"] == len(
        encode_pgm(small.shape[1], small.shape[0], small.astype(np.uint8).tobytes())
    )


def test_frame_sample_shape_cap_and_demux(spark):
    out = QUERIES["multimodal_frame_sample"](spark, SF_SMOKE)
    per_doc = out.groupBy("doc_id").count().collect()
    n_docs = QUERIES["multimodal_meta"](spark, SF_SMOKE).count()
    assert 0 < len(per_doc) == n_docs
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
    # per-frame sums match a local decode of the sampled frames
    doc_id = one[0]["doc_id"]
    w, h = one[0]["frame_w"], one[0]["frame_h"]
    for r in one:
        px = synth_pgm_frame_px(doc_id, w, h, r["frame_idx"])
        assert r["frame_px_sum"] == int(px.astype(np.int64).sum())


def test_demux_walks_concatenated_frames():
    """The demuxer must find frame boundaries from headers alone — frames
    of DIFFERENT sizes back to back."""
    f1 = encode_pgm(3, 2, bytes(range(6)))
    f2 = encode_pgm(2, 2, bytes([250, 251, 252, 253]))
    frames = demux_pgm_stream(f1 + f2)
    assert [(f[0], f[1]) for f in frames] == [(3, 2), (2, 2)]
    assert frames[0][3] == bytes(range(6))
    assert frames[1][3] == bytes([250, 251, 252, 253])
    # round trip through the single-frame decoder too
    w, h, maxval, raster = decode_pgm(f2)
    assert (w, h, maxval, raster) == (2, 2, 255, bytes([250, 251, 252, 253]))


def test_features_matches_analytic_texture(spark):
    got = {r["doc_id"]: r for r in QUERIES["multimodal_features"](spark, SF_SMOKE).collect()}
    assert got
    doc_id = sorted(got)[0]
    r = got[doc_id]
    # dims come from the row (width derives from n_chars, not carried here)
    w, h = r["width"], r["height"]
    assert h == pgm_dims(doc_id, 0)[1]  # h depends only on doc_id
    px = synth_pgm_frame_px(doc_id, w, h).astype(np.int64)
    assert r["px_sum"] == int(px.sum())
    assert r["min_px"] == int(px.min())
    assert r["max_px"] == int(px.max())
    assert r["mean_px"] == float(px.sum()) / (w * h)
    assert r["byte_len"] == len(encode_pgm(w, h, px.astype(np.uint8).tobytes()))


def test_wav_codec_golden_bytes_and_roundtrip():
    """Hand-computed RIFF header for a 2-sample clip at 8 kHz: RIFF size
    36+4, fmt chunk (PCM, mono, 8000 Hz, byte rate 16000, block 2,
    16 bit), data size 4, then little-endian int16 samples."""
    from kasper_spark.operators.multimodal import decode_wav, encode_wav

    payload = encode_wav(8000, [1, -2])
    assert payload[:4] == b"RIFF"
    assert payload[4:8] == (36 + 4).to_bytes(4, "little")
    assert payload[8:16] == b"WAVEfmt "
    assert payload[16:20] == (16).to_bytes(4, "little")
    assert payload[20:22] == (1).to_bytes(2, "little")      # PCM
    assert payload[22:24] == (1).to_bytes(2, "little")      # mono
    assert payload[24:28] == (8000).to_bytes(4, "little")
    assert payload[28:32] == (16000).to_bytes(4, "little")  # byte rate
    assert payload[32:34] == (2).to_bytes(2, "little")      # block align
    assert payload[34:36] == (16).to_bytes(2, "little")     # bits
    assert payload[36:40] == b"data"
    assert payload[40:44] == (4).to_bytes(4, "little")
    assert payload[44:] == b"\x01\x00\xfe\xff"
    sr, n, data = decode_wav(payload)
    assert (sr, n, data) == (8000, 2, b"\x01\x00\xfe\xff")
    # corrupted inputs fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])
    with _pytest.raises(ValueError):
        decode_wav(payload[:-1])


def test_wav_features_matches_local_recompute(spark):
    import numpy as _np

    got = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_wav_features"](spark, SF_SMOKE).collect()
    }
    assert got
    doc_id = sorted(got)[0]
    r = got[doc_id]
    n = r["n_samples"]
    t = _np.arange(n, dtype=_np.int64)
    s = (t * 37 + doc_id * 101) % 65536 - 32768
    assert r["sum_sq"] == int((s * s).sum())
    assert r["sum_amp"] == int(s.sum())
    assert r["peak"] == int(_np.abs(s).max())
    assert r["byte_len"] == 44 + 2 * n
    assert r["duration_ms"] == (n * 1000) // 8000


def test_scene_cuts_recover_true_boundaries(spark):
    """Every true scene boundary (every _SCENE_LEN-th frame pair) must be
    flagged as a cut, and no within-scene pair may be — the separation the
    thresholds are designed around (+31 shift ~54 MAD vs boundary ~97)."""
    from kasper_spark.operators.multimodal import _SCENE_LEN

    out = QUERIES["multimodal_scene_cuts"](spark, SF_SMOKE).collect()
    assert out
    for r in out:
        true_boundary = (r["frame_idx"] + 1) % _SCENE_LEN == 0
        assert r["is_cut"] == int(true_boundary), r
        # mad_mean consistency with the integer sum
        assert r["mad_mean"] > 0


def test_phash_neardup_buckets_identical_textures(spark):
    """aHash invariants: equal (doc_id mod 256, dims) means an identical
    texture and therefore an identical hash; n_same_hash is the true
    bucket size; every image hashes."""
    from tests.conftest import SF_SMOKE

    from kasper_spark.registry import QUERIES

    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["multimodal_phash_neardup"](spark, SF_SMOKE).collect()
    }
    from kasper_spark.catalog import load_table

    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    assert set(rows) == set(docs)
    # identical texture => identical hash
    by_texture: dict = {}
    for d, n_chars in docs.items():
        key = (d % 256, 16 + n_chars % 17, 12 + d % 9)
        by_texture.setdefault(key, []).append(d)
    for ds in by_texture.values():
        hashes = {(rows[d]["ahash_hi"], rows[d]["ahash_lo"]) for d in ds}
        assert len(hashes) == 1
    # n_same_hash is the exact bucket size
    bucket: dict = {}
    for d, r in rows.items():
        bucket.setdefault((r["ahash_hi"], r["ahash_lo"]), []).append(d)
    for r in rows.values():
        assert r["n_same_hash"] == len(bucket[(r["ahash_hi"], r["ahash_lo"])])


def test_audio_fingerprint_matches_python_recompute(spark):
    """Recompute every fingerprint from the waveform formula in plain
    Python: window means, global-mean threshold, bit packing, buckets."""
    from tests.conftest import SF_SMOKE

    from kasper_spark.catalog import load_table
    from kasper_spark.registry import QUERIES

    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    expect = {}
    for d, n_chars in docs.items():
        n = 200 + n_chars % 300
        amps = [abs((t * 37 + d * 101) % 65536 - 32768) for t in range(n)]
        sums, counts = [0] * 64, [0] * 64
        for t, a in enumerate(amps):
            k = (t * 64) // n
            sums[k] += a
            counts[k] += 1
        es = [s // c for s, c in zip(sums, counts)]
        m = sum(es) // 64
        bits = [1 if e > m else 0 for e in es]
        hi = sum(b << (31 - i) for i, b in enumerate(bits[:32]))
        lo = sum(b << (63 - i) for i, b in enumerate(bits[32:], start=32))
        expect[d] = (hi, lo)
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["multimodal_audio_fingerprint"](spark, SF_SMOKE).collect()
    }
    assert {d: (r["fp_hi"], r["fp_lo"]) for d, r in got.items()} == expect
    buckets: dict = {}
    for d, (hi, lo) in expect.items():
        buckets.setdefault((hi, lo), []).append(d)
    for d, r in got.items():
        assert r["n_same_fp"] == len(buckets[(r["fp_hi"], r["fp_lo"])])


def test_video_neardup_partner_symmetry(spark):
    """Structural invariants: n_frames matches the synth formula, sharing
    is symmetric (A a partner of B => B a partner of A), and videos with
    equal (doc_id mod 256, dims, frame count) share ALL frames."""
    from tests.conftest import SF_SMOKE

    from kasper_spark.catalog import load_table
    from kasper_spark.registry import QUERIES

    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["multimodal_video_neardup"](spark, SF_SMOKE).collect()
    }
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    assert set(rows) == set(docs)
    for d, r in rows.items():
        assert r["n_frames"] == 4 + d % 24
        assert 1 <= r["n_distinct_frame_hashes"] <= r["n_frames"]
    # full-texture twins: same (d mod 256, dims, nf) => same frame set
    by_tex: dict = {}
    for d, n_chars in docs.items():
        key = (d % 256, 16 + n_chars % 17, 12 + d % 9, 4 + d % 24)
        by_tex.setdefault(key, []).append(d)
    for ds in by_tex.values():
        if len(ds) > 1:
            for d in ds:
                assert rows[d]["n_partner_videos"] >= len(ds) - 1
