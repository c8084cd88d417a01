"""Dedicated semantic tests for the round-8 curation tier
(kasper_spark/operators/curation.py). Oracle parity is covered by
test_oracle_parity.py and plan shapes by test_plans.py — this module pins
the INVARIANTS a user of the curation tier actually relies on: the bloom
prefilter never changes the answer, chunking covers every character,
mined pairs really are the per-anchor extremes, quotas are honored
exactly, the CDC diff carries no unchanged rows, and the e2e pipeline
equals its standalone stages composed.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.operators.curation import (
    _CHUNK_CHARS,
    _CHUNK_STRIDE,
    _CLF_BIAS,
    _CLF_BUCKETS,
    _CLF_MIX,
    _MIX_APPLY_BUDGET,
    _MIX_BUDGET_DOCS,
)
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _rows(spark, name, key_cols):
    df = QUERIES[name](spark, SF_SMOKE)
    return {tuple(r[c] for c in key_cols): r.asDict() for r in df.collect()}


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_equals_exact(spark):
    """The bloom is a pure prefilter: false positives die in the exact
    verify join, so the result must be BIT-IDENTICAL to the plain
    broadcast-join operator (they share one oracle for the same reason)."""
    exact = _rows(spark, "ngram_decontaminate", ["doc_id"])
    bloom = _rows(spark, "ngram_decontaminate_bloom", ["doc_id"])
    assert exact == bloom
    assert len(exact) > 0  # the gate must actually catch contamination


def test_bloom_prefilter_actually_filters(spark):
    """The survivors reaching the exact join must be a small fraction of
    the corpus shingle stream — otherwise the bloom buys nothing. With
    k=3 hashes over 2^20 bits and a sf0.001-sized eval set, the false
    positive rate is ~(kn/m)^k ≈ 0; survivors ≈ true matches."""
    from kasper_spark.operators.curation import _bloom_positions, _shingles

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = _shingles(docs, 4)
    corpus_shingles = sh.filter(F.col("doc_id") % 41 != 0).count()
    ev = (
        sh.filter(F.col("doc_id") % 41 == 0)
        .select("shingle")
        .distinct()
    )
    # build the bloom exactly as the operator does, then measure pass rate
    pos = F.explode(F.array(*_bloom_positions(F.col("shingle")))).alias("pos")
    set_bits = ev.select(pos).distinct().count()
    true_matches = (
        sh.filter(F.col("doc_id") % 41 != 0).join(ev, "shingle").count()
    )
    # a uniform random probe passes with p = (set_bits / 2^20)^3
    p_fp = (set_bits / float(1 << 20)) ** 3
    expected_max_survivors = true_matches + corpus_shingles * p_fp * 50 + 10
    assert true_matches < corpus_shingles  # the gate is selective at all
    assert expected_max_survivors < corpus_shingles / 2


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------


def test_chunking_covers_and_reconstructs(spark):
    """Every character of every document appears in >=1 chunk, consecutive
    chunks overlap by exactly chunk-stride chars, and stitching chunk
    prefixes reconstructs the original text."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
        if len(r["text"]) > 0
    }
    out = QUERIES["doc_chunk_overlap"](spark, SF_SMOKE).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
        assert r["chunk_len"] == len(r["chunk"]) <= _CHUNK_CHARS
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        ks = sorted(chunks)
        assert ks == list(range(len(ks)))  # dense chunk ids from 0
        # chunk k is exactly text[k*stride : k*stride+chunk]
        for k in ks:
            assert chunks[k] == text[k * _CHUNK_STRIDE : k * _CHUNK_STRIDE + _CHUNK_CHARS]
        # coverage: the last chunk reaches the end of the text
        assert ks[-1] * _CHUNK_STRIDE + len(chunks[ks[-1]]) == len(text)
        # overlap: consecutive chunks share chunk-stride characters
        for k in ks[:-1]:
            overlap = _CHUNK_CHARS - _CHUNK_STRIDE
            if len(chunks[k]) == _CHUNK_CHARS:
                assert chunks[k][_CHUNK_STRIDE:] == chunks[k + 1][:overlap]
        # reconstruction from stride-prefixes + final chunk
        rebuilt = "".join(chunks[k][:_CHUNK_STRIDE] for k in ks[:-1]) + chunks[ks[-1]]
        assert rebuilt == text


# ---------------------------------------------------------------------------
# Hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negative_pairs_are_per_anchor_extremes(spark):
    """Recompute the anchor->neighbor cosine matrix in numpy and verify the
    operator picked the argmax same-label (positive) and argmax
    other-label (hard negative) for every anchor, with margin = difference."""
    import numpy as np

    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    out = _rows(spark, "hard_negative_mining", ["query_id"])
    assert len(out) == 20  # every bounded anchor mined
    for (qid,), row in out.items():
        qv, qlab = emb[qid]
        assert row["query_label"] == qlab
        best = {True: (-2.0, None), False: (-2.0, None)}
        for nid, (nv, nlab) in emb.items():
            if nid == qid:
                continue
            cos = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
            same = nlab == qlab
            # tie-break on neighbor_id ascending, as the operator does
            if cos > best[same][0] + 1e-9 or (
                abs(cos - best[same][0]) <= 1e-9 and nid < best[same][1]
            ):
                best[same] = (cos, nid)
        assert row["positive_id"] == best[True][1]
        assert row["hard_negative_id"] == best[False][1]
        assert math.isclose(row["positive_cos"], best[True][0], abs_tol=1e-9)
        assert math.isclose(row["hard_negative_cos"], best[False][0], abs_tol=1e-9)
        assert math.isclose(
            row["margin"], row["positive_cos"] - row["hard_negative_cos"], abs_tol=1e-12
        )
        assert -1.0 - 1e-9 <= row["positive_cos"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Temperature mixture: weights + quota application
# ---------------------------------------------------------------------------


def test_mixture_weights_invariants(spark):
    rows = _rows(spark, "corpus_mixture_weights", ["source"])
    docs = load_table(spark, SF_SMOKE, "documents")
    truth = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert {k[0] for k in rows} == set(truth)
    shares = [r["share_pct"] for r in rows.values()]
    assert math.isclose(sum(shares), 100.0, abs_tol=1e-9)
    quota_sum = sum(r["quota_docs"] for r in rows.values())
    # floor() loses < 1 doc per source; never exceeds the budget
    assert _MIX_BUDGET_DOCS - len(rows) <= quota_sum <= _MIX_BUDGET_DOCS
    for (src,), r in rows.items():
        assert r["n_docs"] == truth[src]
        assert r["w_micros"] == math.floor(math.sqrt(truth[src]) * 1_000_000)
    # sqrt temperature flattens: smaller sources get a LARGER share per doc
    per_doc = sorted(
        (r["n_docs"], r["share_pct"] / r["n_docs"]) for r in rows.values()
    )
    assert all(
        per_doc[i][1] >= per_doc[i + 1][1] - 1e-12 for i in range(len(per_doc) - 1)
    )


def test_mix_apply_honors_quota_exactly(spark):
    """Per source the sample size is min(quota, n_docs); membership is the
    md5-rank prefix (reproducible, engine-independent); two runs agree."""
    rows = _rows(spark, "corpus_mix_apply", ["source", "doc_id"])
    again = _rows(spark, "corpus_mix_apply", ["source", "doc_id"])
    assert rows == again  # no RNG anywhere
    docs = [
        (r["source"], r["doc_id"])
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]
    n_by_src: dict[str, int] = {}
    for src, _ in docs:
        n_by_src[src] = n_by_src.get(src, 0) + 1
    w = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in n_by_src.items()}
    tot = sum(w.values())
    quota = {s: math.floor((_MIX_APPLY_BUDGET * w[s]) / tot) for s in w}
    got_by_src: dict[str, list[int]] = {}
    for (src, doc_id), r in rows.items():
        got_by_src.setdefault(src, []).append(doc_id)
    for src, n in n_by_src.items():
        expect_n = min(quota[src], n, _MIX_APPLY_BUDGET)
        assert len(got_by_src.get(src, [])) == expect_n
    # membership: the expected sample is the md5-order prefix
    for src in got_by_src:
        ordered = sorted(
            (d for s, d in docs if s == src),
            key=lambda d: (hashlib.md5(f"{d}/mix-apply-1".encode()).hexdigest(), d),
        )
        assert sorted(got_by_src[src]) == sorted(ordered[: quota[src]])


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classification(spark):
    """Recompute both snapshots driver-side and check the diff is exactly
    {added, removed, changed} with no unchanged rows leaked."""
    orders = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderstatus")
        .collect()
    }
    snap_a = {k: v for k, v in orders.items() if k % 9 != 0}
    snap_b = {
        k: ("X" if k % 5 == 0 else v) for k, v in orders.items() if k % 7 != 0
    }
    expect = {}
    for k in snap_a.keys() | snap_b.keys():
        if k not in snap_a:
            expect[k] = ("added", None, snap_b[k])
        elif k not in snap_b:
            expect[k] = ("removed", snap_a[k], None)
        elif snap_a[k] != snap_b[k]:
            expect[k] = ("changed", snap_a[k], snap_b[k])
    got = {
        k[0]: (r["change_type"], r["old_status"], r["new_status"])
        for k, r in _rows(spark, "snapshot_diff_cdc", ["o_orderkey"]).items()
    }
    assert got == expect
    assert {t for t, _, _ in got.values()} == {"added", "removed", "changed"}


# ---------------------------------------------------------------------------
# Model-based quality scoring
# ---------------------------------------------------------------------------


def test_classifier_logit_matches_python_recompute(spark):
    """The hashed-ngram linear score is integer-exact: recompute it
    token-by-token in pure Python (md5-prefix bucket -> weight -> sum)."""
    rows = _rows(spark, "quality_classifier_logit", ["doc_id"])
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert len(rows) == len(docs)
    for r in docs[:50]:
        toks = [w for w in r["text"].split(" ") if w != ""]
        logit = _CLF_BIAS
        for t in toks:
            bucket = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CLF_BUCKETS
            logit += (bucket * _CLF_MIX) % 17 - 8
        got = rows[(r["doc_id"],)]
        assert got["n_tokens"] == len(toks)
        assert got["logit"] == logit
        assert got["kept"] == (logit > 0)


# ---------------------------------------------------------------------------
# End-to-end composition
# ---------------------------------------------------------------------------


def test_e2e_equals_composed_stages(spark):
    """curation_pipeline_e2e must equal the standalone stages composed by
    hand driver-side: classifier gate -> 4-gram decontamination vs the
    eval slice -> sqrt-quota md5 sample -> chunk stats per source."""
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]

    def logit(text: str) -> int:
        s = _CLF_BIAS
        for t in text.split(" "):
            if t == "":
                continue
            bucket = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CLF_BUCKETS
            s += (bucket * _CLF_MIX) % 17 - 8
        return s

    def shingles(text: str, n: int = 4) -> set:
        toks = [w for w in text.split(" ") if w != ""]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    ev = set()
    for doc_id, _, text in docs:
        if doc_id % 41 == 0:
            ev |= shingles(text)
    surv = [
        (doc_id, src, text)
        for doc_id, src, text in docs
        if doc_id % 41 != 0 and logit(text) > 0 and not (shingles(text) & ev)
    ]
    n_by_src: dict[str, int] = {}
    for _, src, _ in surv:
        n_by_src[src] = n_by_src.get(src, 0) + 1
    w = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in n_by_src.items()}
    tot = sum(w.values())
    quota = {s: math.floor((150 * w[s]) / tot) for s in w}
    expect: dict[str, list[int]] = {}
    for src in n_by_src:
        ordered = sorted(
            ((d, t) for d, s, t in surv if s == src),
            key=lambda dt: (
                hashlib.md5(f"{dt[0]}/e2e-sample-1".encode()).hexdigest(),
                dt[0],
            ),
        )
        sampled = [(d, t) for d, t in ordered[: quota[src]] if len(t) > 0]
        n_chunks = sum(
            math.floor((len(t) - 1) / _CHUNK_STRIDE) + 1 for _, t in sampled
        )
        chunk_chars = sum(
            min(len(t) - k * _CHUNK_STRIDE, _CHUNK_CHARS)
            for _, t in sampled
            for k in range(math.floor((len(t) - 1) / _CHUNK_STRIDE) + 1)
        )
        if sampled:
            expect[src] = [len(sampled), n_chunks, chunk_chars]
    got = {
        k[0]: [r["n_docs"], r["n_chunks"], r["chunk_chars"]]
        for k, r in _rows(spark, "curation_pipeline_e2e", ["source"]).items()
    }
    assert got == expect


def test_token_budget_select_matches_greedy_prefix(spark):
    """The two-pass threshold plan must equal the naive greedy prefix:
    order docs by (logit desc, md5 tie, doc_id), keep while the running
    token total stays within budget = total_tokens // 3."""
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]

    def logit(text: str) -> int:
        s = _CLF_BIAS
        for t in text.split(" "):
            if t == "":
                continue
            bucket = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CLF_BUCKETS
            s += (bucket * _CLF_MIX) % 17 - 8
        return s

    scored = [
        (
            d,
            src,
            len([w for w in t.split(" ") if w != ""]),
            logit(t),
            hashlib.md5(f"{d}/budget-1".encode()).hexdigest(),
        )
        for d, src, t in docs
    ]
    budget = sum(n for _, _, n, _, _ in scored) // 3
    order = sorted(scored, key=lambda r: (-r[3], r[4], r[0]))
    expect, cum = {}, 0
    for d, src, n, lg, _ in order:
        cum += n
        if cum > budget:
            break  # prefix semantics: cum only grows, nothing later fits
        expect[d] = (src, n, lg)
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["logit"])
        for r in QUERIES["token_budget_select"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert 0 < len(got) < len(docs)  # the budget actually binds
