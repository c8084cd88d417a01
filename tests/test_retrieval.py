"""Dedicated semantic tests for the round-8 retrieval + anomaly operators
(bm25_keyword_topk, rrf_fusion_topk, ewma_anomaly_events,
boilerplate_shingle_stats). Oracle parity is covered by
test_oracle_parity.py; these pin the semantics a user relies on by
recomputing each result independently in plain Python."""

from __future__ import annotations

import math

from kasper_spark.catalog import load_table
from kasper_spark.operators.retrieval import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TOPK,
    _RRF_DEPTH,
    _RRF_K,
)
from kasper_spark.operators.temporal import _EWMA_DEN, _EWMA_K
from kasper_spark.operators.text import _BOILER_DF, _BOILER_N
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _docs(spark):
    return [
        (r["doc_id"], [w for w in r["text"].split(" ") if w != ""])
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]


def _bm25_python(docs):
    """Reference BM25 (odds-ratio idf) over the corpus, in floats — used
    for ORDER checks, not bit-exactness (the operator certifies bits via
    the decimal-summed oracle)."""
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    df = {
        term: sum(1 for _, t in docs if term in t) for term in _BM25_TERMS
    }
    scores = {}
    for doc_id, t in docs:
        s = 0.0
        for term in _BM25_TERMS:
            tf = t.count(term)
            if tf == 0:
                continue
            idf = (n - df[term] + 0.5) / (df[term] + 0.5)
            s += idf * (tf * (_BM25_K1 + 1)) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(t) / avgdl)
            )
        if s > 0:
            scores[doc_id] = s
    return scores


def test_bm25_topk_order_and_scores(spark):
    docs = _docs(spark)
    ref = _bm25_python(docs)
    order = sorted(ref, key=lambda d: (-ref[d], d))[:_BM25_TOPK]
    got = sorted(
        (r.asDict() for r in QUERIES["bm25_keyword_topk"](spark, SF_SMOKE).collect()),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in got] == order
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert math.isclose(r["bm25_score"], ref[r["doc_id"]], rel_tol=1e-9)
    # a top-ranked doc must actually contain at least one query term
    by_id = dict(docs)
    assert any(t in by_id[got[0]["doc_id"]] for t in _BM25_TERMS)


def test_rrf_fusion_combines_both_rankers(spark):
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["rrf_fusion_topk"](spark, SF_SMOKE).collect()
    }
    assert len(rows) == _BM25_TOPK
    for r in rows.values():
        expect = 0.0
        if r["kw_rank"] is not None:
            assert 1 <= r["kw_rank"] <= _RRF_DEPTH
            expect += 1.0 / (_RRF_K + r["kw_rank"])
        if r["quality_rank"] is not None:
            assert 1 <= r["quality_rank"] <= _RRF_DEPTH
            expect += 1.0 / (_RRF_K + r["quality_rank"])
        assert r["kw_rank"] is not None or r["quality_rank"] is not None
        assert math.isclose(r["rrf_score"], expect, rel_tol=0, abs_tol=0)
    # fused ranks are dense 1..k and ordered by score desc
    ordered = sorted(rows.values(), key=lambda r: r["fused_rank"])
    assert [r["fused_rank"] for r in ordered] == list(range(1, _BM25_TOPK + 1))
    scores = [r["rrf_score"] for r in ordered]
    assert scores == sorted(scores, reverse=True)
    # a doc present in BOTH lists must outrank one with a single equal-rank
    # appearance (the point of fusion); verified structurally: any doc in
    # both lists scores > 1/(k+1), the max single-list score
    both = [r for r in rows.values() if r["kw_rank"] and r["quality_rank"]]
    for r in both:
        assert r["rrf_score"] > 1.0 / (_RRF_K + 1)


def test_ewma_anomaly_matches_python_recompute(spark):
    events = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], round(r["value"] * 100))
            for r in load_table(spark, SF_SMOKE, "events").collect()
        ),
        key=lambda e: (e[0], e[1], e[2]),
    )
    expect = {}
    by_user: dict[int, list] = {}
    for u, ts, eid, cents in events:
        by_user.setdefault(u, []).append((ts, eid, int(cents)))
    for u, seq in by_user.items():
        for i in range(_EWMA_K, len(seq)):
            num = sum(
                seq[i - j][2] * (1 << (_EWMA_K - j)) for j in range(1, _EWMA_K + 1)
            )
            cents = seq[i][2]
            if abs(cents * _EWMA_DEN - num) > 2 * num:
                expect[seq[i][1]] = (u, cents, num / _EWMA_DEN)
    got = {
        r["event_id"]: (r["user_id"], r["cents"], r["ewma"])
        for r in QUERIES["ewma_anomaly_events"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    assert len(got) > 0  # the detector fires at smoke scale
    for eid, (u, cents, ewma) in expect.items():
        gu, gc, ge = got[eid]
        assert (gu, gc) == (u, cents)
        assert math.isclose(ge, ewma, rel_tol=1e-12)
    # anomalies are a minority — the gate is selective (the synthetic
    # values swing ~5 orders of magnitude, so ~10% trip the 3x band)
    assert len(got) < len(events) / 5


def test_boilerplate_stats_match_python_recompute(spark):
    docs = _docs(spark)
    doc_shingles = {
        doc_id: {
            " ".join(t[i : i + _BOILER_N]) for i in range(len(t) - _BOILER_N + 1)
        }
        for doc_id, t in docs
        if len(t) >= _BOILER_N
    }
    df: dict[str, int] = {}
    for shs in doc_shingles.values():
        for s in shs:
            df[s] = df.get(s, 0) + 1
    boiler = {s for s, c in df.items() if c >= _BOILER_DF}
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["boilerplate_shingle_stats"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(doc_shingles)
    for doc_id, shs in doc_shingles.items():
        r = got[doc_id]
        assert r["n_distinct_shingles"] == len(shs)
        assert r["n_boiler_shingles"] == len(shs & boiler)
        assert math.isclose(
            r["boiler_ratio"], len(shs & boiler) / len(shs), rel_tol=1e-15
        )
        assert r["kept"] == (len(shs & boiler) / len(shs) < 0.5)


import pytest


@pytest.mark.parametrize(
    "twin",
    [
        "streaming_ewma_anomaly_twin",
        "streaming_ewma_tws_twin",
        "streaming_ewma_parallel_twin",
    ],
)
def test_streaming_ewma_twins_equal_batch(spark, twin):
    """All streaming forms (applyInPandasWithState, the state-v2
    transformWithStateInPandas, and the PARALLEL-ingest variant over four
    user-disjoint lane sources) — per-user state over time-ordered file
    feeds — must emit exactly the batch operator's anomaly set: the §1.3
    stream/batch convergence contract for an ORDER-dependent operator.
    The parallel twin proves the detector needs only PER-KEY arrival
    order (the Kafka contract), not global serialization. The TWS form
    additionally needs the protobuf runtime (shimmed where absent) and
    the RocksDB provider."""
    if twin == "streaming_ewma_tws_twin":
        pytest.importorskip("google.protobuf")
    batch = {
        r["event_id"]: (r["user_id"], r["cents"], r["ewma"], r["ratio"])
        for r in QUERIES["ewma_anomaly_events"](spark, SF_SMOKE).collect()
    }
    stream = {
        r["event_id"]: (r["user_id"], r["cents"], r["ewma"], r["ratio"])
        for r in QUERIES[twin](spark, SF_SMOKE).collect()
    }
    assert stream == batch
    assert len(stream) > 0


def test_hybrid_search_fuses_lexical_and_semantic(spark):
    """Hybrid = RRF of the BM25 list and the exact-cosine list anchored at
    doc 0's embedding; recompute both rankings independently."""
    import numpy as np

    docs = _docs(spark)
    ref = _bm25_python(docs)
    kw_order = sorted(ref, key=lambda d: (-ref[d], d))[:_RRF_DEPTH]
    kw_rank = {d: i + 1 for i, d in enumerate(kw_order)}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    q = emb[0]
    cos = {
        v: float(q @ e / (np.linalg.norm(q) * np.linalg.norm(e)))
        for v, e in emb.items()
    }
    vec_order = sorted(cos, key=lambda v: (-cos[v], v))[:_RRF_DEPTH]
    vec_rank = {v: i + 1 for i, v in enumerate(vec_order)}
    rrf = {
        d: (1.0 / (_RRF_K + kw_rank[d]) if d in kw_rank else 0.0)
        + (1.0 / (_RRF_K + vec_rank[d]) if d in vec_rank else 0.0)
        for d in set(kw_rank) | set(vec_rank)
    }
    expect = sorted(rrf, key=lambda d: (-rrf[d], d))[:_BM25_TOPK]
    got = sorted(
        (r.asDict() for r in QUERIES["hybrid_search_topk"](spark, SF_SMOKE).collect()),
        key=lambda r: r["fused_rank"],
    )
    assert [r["doc_id"] for r in got] == expect
    # the semantic anchor itself must lead the vector list
    assert vec_order[0] == 0
    for r in got:
        assert r["kw_rank"] == kw_rank.get(r["doc_id"])
        assert r["vec_rank"] == vec_rank.get(r["doc_id"])


def test_winsorize_matches_python_recompute(spark):
    """Histogram-derived bounds must equal the naive rank spec: the value
    at rank ceil(q*n) per event type; clip counts and clipped sum follow."""
    ev = [
        (r["event_type"], int(round(r["value"] * 100)))
        for r in load_table(spark, SF_SMOKE, "events").collect()
    ]
    by_type: dict[str, list[int]] = {}
    for t, c in ev:
        by_type.setdefault(t, []).append(c)
    got = {
        r["event_type"]: r.asDict()
        for r in QUERIES["winsorize_event_values"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[(5 * n + 99) // 100 - 1]   # rank is 1-based
        hi = vals[(95 * n + 99) // 100 - 1]
        r = got[t]
        assert (r["n"], r["lo_cents"], r["hi_cents"]) == (n, lo, hi)
        assert r["n_clipped_low"] == sum(1 for c in vals if c < lo)
        assert r["n_clipped_high"] == sum(1 for c in vals if c > hi)
        assert r["sum_cents_clipped"] == sum(min(max(c, lo), hi) for c in vals)
        assert lo <= hi


def test_key_skew_report_matches_python_recompute(spark):
    """Histogram-derived skew stats must equal the naive ranked spec,
    recomputed in pure Python (exact fractions for the divisions)."""
    from kasper_spark.operators.analytics import _SKEW_KEYS

    got = {
        r["key_name"]: r.asDict()
        for r in QUERIES["key_skew_report"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {f"{t}.{k}" for t, k in _SKEW_KEYS}
    for table, key in _SKEW_KEYS:
        counts: dict = {}
        for r in load_table(spark, SF_SMOKE, table).select(key).collect():
            counts[r[key]] = counts.get(r[key], 0) + 1
        vals = sorted(counts.values())
        n, tot = len(vals), sum(vals)
        rank_mass = sum((i + 1) * v for i, v in enumerate(vals))
        r = got[f"{table}.{key}"]
        assert (r["n_keys"], r["n_rows"], r["max_rows"]) == (n, tot, max(vals))
        assert r["p99_rows"] == vals[(99 * n + 99) // 100 - 1]
        assert math.isclose(r["avg_rows"], tot / n, rel_tol=0)
        assert math.isclose(r["skew_factor"], max(vals) * n / tot, rel_tol=0)
        assert math.isclose(
            r["gini"], (2.0 * rank_mass) / (n * tot) - (n + 1) / n, rel_tol=1e-12
        )
        assert 0.0 <= r["gini"] < 1.0


@pytest.mark.parametrize("n_files", [1, 2, 7])
def test_streaming_ewma_invariant_to_batch_cuts(spark, n_files):
    """The anomaly set must not depend on WHERE the stream is cut into
    micro-batches: any contiguous time-range split (including a single
    batch and a 7-way split that strands partial windows in state across
    many boundaries) yields the batch answer."""
    import os

    from pyspark.sql import functions as F

    from kasper_spark.operators.streaming_twins import _staged_ewma_feed
    from kasper_spark.operators.temporal import _EWMA_DEN, _EWMA_K
    from kasper_spark.streaming.state import ewma_anomalies_tws

    batch = {
        r["event_id"] for r in QUERIES["ewma_anomaly_events"](spark, SF_SMOKE).collect()
    }
    stream, out_dir, ckpt = _staged_ewma_feed(
        spark, SF_SMOKE, f"kasper-tcut{n_files}-", n_files=n_files
    )
    anomalies = ewma_anomalies_tws(stream, _EWMA_K, _EWMA_DEN)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            anomalies.writeStream.foreachBatch(
                lambda df, eid: df.write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"batch={eid}")
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    got = {
        r["event_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    }
    assert got == batch
