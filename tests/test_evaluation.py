"""Invariant tests for the round-9 evaluation & label-quality tier
(operators/evaluation.py + the incremental dup-matrix twin) — each pinned
against an independent sequential reference or a structural law the oracle
comparison alone wouldn't localize."""

from __future__ import annotations

import hashlib

import pandas as pd

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _py_logit(text: str) -> int:
    """Sequential Python reference of the hashed-ngram quality logit."""
    from kasper_spark.operators.curation import _CLF_BIAS, _CLF_BUCKETS, _CLF_MIX

    s = _CLF_BIAS
    for t in text.split(" "):
        if t == "":
            continue
        bucket = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CLF_BUCKETS
        s += (bucket * _CLF_MIX) % 17 - 8
    return s


def _py_labels(text: str) -> tuple[int, int, int]:
    logit = _py_logit(text)
    out = []
    for k in (1, 2, 3):
        h = int(hashlib.md5(f"ann{k}:{text}".encode()).hexdigest()[:15], 16)
        out.append(int(logit + (h % 9 - 4) > 0))
    return tuple(out)


def test_kappa_matches_sequential_reference(spark):
    """Pairwise kappa must equal the textbook (po - pe)/(1 - pe) computed
    by a sequential Python pass over the same deterministic labels."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    labels = [_py_labels(t) for t in docs["text"]]
    out = QUERIES["annotator_agreement_kappa"](spark, SF_SMOKE).toPandas()
    assert len(out) == 3
    for _, row in out.iterrows():
        a, b = int(row["ann_a"]) - 1, int(row["ann_b"]) - 1
        la = [l[a] for l in labels]
        lb = [l[b] for l in labels]
        n = len(la)
        agree = sum(int(x == y) for x, y in zip(la, lb))
        na1, nb1 = sum(la), sum(lb)
        s = na1 * nb1 + (n - na1) * (n - nb1)
        assert int(row["n"]) == n
        assert int(row["n_agree"]) == agree
        assert row["po"] == agree / n
        assert row["kappa"] == (n * agree - s) / (n * n - s)
        # sanity: correlated-through-logit annotators agree above chance
        assert row["kappa"] > 0


def test_majority_vote_consistency(spark):
    """Per-source counts must match the sequential labels, and unanimity
    can never exceed majority-consistency bounds."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    out = QUERIES["label_majority_vote"](spark, SF_SMOKE).toPandas()
    by_src = {}
    for src, text in zip(docs["source"], docs["text"]):
        l1, l2, l3 = _py_labels(text)
        n, maj, una = by_src.get(src, (0, 0, 0))
        by_src[src] = (
            n + 1,
            maj + int(l1 + l2 + l3 >= 2),
            una + int(l1 == l2 == l3),
        )
    assert set(out["source"]) == set(by_src)
    for _, row in out.iterrows():
        n, maj, una = by_src[row["source"]]
        assert int(row["n_docs"]) == n
        assert int(row["n_majority_keep"]) == maj
        assert int(row["n_unanimous"]) == una
        assert row["disagreement_rate"] == 1.0 - una / n
        assert una <= n


def test_calibration_bins_are_rank_deciles(spark):
    """Bin sizes must be the ceil-rank-quantile partition (every bin
    n//10 or n//10+1 docs) and mean logit must be non-increasing across
    deciles (deciles are ordered BY logit)."""
    out = (
        QUERIES["calibration_reliability_bins"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("decile")
    )
    n = int(out["n_docs"].sum())
    assert sorted(out["decile"]) == list(range(1, 11))
    assert set(out["n_docs"]) <= {n // 10, n // 10 + 1}
    ml = list(out["mean_logit"])
    assert all(a >= b for a, b in zip(ml, ml[1:]))
    assert ((out["gopher_keep_rate"] >= 0) & (out["gopher_keep_rate"] <= 1)).all()


def test_mrr_against_bruteforce_ranking(spark):
    """first_rel_rank must equal the rank of the best relevant doc in an
    independently computed pandas BM25 ranking (same formula, float64 —
    ranks are tie-broken identically)."""
    from kasper_spark.operators.evaluation import (
        _MRR_QUERIES,
        _MRR_REL_TF,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = [
        [w for w in t.split(" ") if w != ""] for t in docs["text"]
    ]
    n_docs = len(docs)
    total = sum(len(t) for t in toks)
    avgdl = total / n_docs
    out = QUERIES["mrr_relevance_contract"](spark, SF_SMOKE).toPandas()
    assert set(out["query_id"]) == {qid for qid, _ in _MRR_QUERIES}
    for qid, terms in _MRR_QUERIES:
        rows = []
        for doc_id, t in zip(docs["doc_id"], toks):
            tfs = {term: t.count(term) for term in terms}
            if all(v == 0 for v in tfs.values()):
                continue
            score = 0.0
            for term, tf in tfs.items():
                if tf == 0:
                    continue
                df = sum(1 for tt in toks if term in tt)
                idf = (n_docs - df + 0.5) / (df + 0.5)
                tfp = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
                score += idf * tfp
            rows.append((doc_id, score, min(tfs.values()) >= _MRR_REL_TF))
        rows.sort(key=lambda r: (-r[1], r[0]))
        row = out[out["query_id"] == qid].iloc[0]
        assert int(row["n_retrieved"]) == len(rows)
        rel_ranks = [i + 1 for i, r in enumerate(rows) if r[2]]
        assert int(row["n_relevant"]) == len(rel_ranks)
        if rel_ranks:
            # float64 reference vs decimal-exact ranks: scores differ only
            # at ulp level, which cannot reorder distinct BM25 sums here —
            # assert exact rank equality
            assert int(row["first_rel_rank"]) == rel_ranks[0]
            assert row["rr"] == 1.0 / rel_ranks[0]
        else:
            assert int(row["first_rel_rank"]) == 0 and row["rr"] == 0.0


def test_dataset_card_totals(spark):
    """Card totals must reconcile with direct pandas aggregation."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    out = QUERIES["dataset_card_report"](spark, SF_SMOKE).toPandas()
    assert set(out["source"]) == set(docs["source"])
    assert int(out["n_docs"].sum()) == len(docs)
    g = docs.groupby("source")
    for _, row in out.iterrows():
        sub = g.get_group(row["source"])
        assert int(row["n_docs"]) == len(sub)
        langs = sub["lang"].value_counts()
        assert int(row["n_langs"]) == sub["lang"].nunique()
        top_c = int(langs.max())
        top_langs = sorted(l for l, c in langs.items() if c == top_c)
        assert row["top_lang"] == top_langs[0]
        assert row["top_lang_share"] == top_c / len(sub)
        n_distinct = sub["text"].nunique()
        assert row["exact_dup_rate"] == 1.0 - n_distinct / len(sub)
        assert 0.0 <= row["gopher_keep_rate"] <= 1.0


def test_streaming_dup_matrix_equals_batch(spark):
    """The incremental twin must reproduce the batch matrix exactly."""
    batch = (
        QUERIES["cross_source_dup_matrix"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_dup_matrix_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_session_turn_structure_rle_reference(spark):
    """Turn counts must equal a sequential run-length encoding over the
    (ts, event_id)-ordered per-user event stream with 30-min session
    cuts."""
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ref = {}
    for uid, g in ev.groupby("user_id"):
        session_no = 0
        prev_ts = None
        prev_type = None
        for _, r in g.iterrows():
            ts = r["ts"].value // 10**9
            if prev_ts is None or ts - prev_ts > 1800:
                session_no += 1
                prev_type = None
            key = (uid, session_no)
            n_ev, n_turn, runs = ref.get(key, (0, 0, []))
            if r["event_type"] != prev_type:
                n_turn += 1
                runs.append(1)
            else:
                runs[-1] += 1
            ref[key] = (n_ev + 1, n_turn, runs)
            prev_ts = ts
            prev_type = r["event_type"]
    out = QUERIES["session_turn_structure"](spark, SF_SMOKE).toPandas()
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        n_ev, n_turn, runs = ref[(row["user_id"], row["session_no"])]
        assert int(row["n_events"]) == n_ev
        assert int(row["n_turns"]) == n_turn
        assert int(row["max_run_len"]) == max(runs)
        assert row["turn_ratio"] == n_turn / n_ev


def test_split_leakage_consistent_with_split(spark):
    """The leakage report must reconcile with deterministic_split's
    assignment and with an exact pandas duplicate-pair count."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(f"{doc_id}/split-seed-1".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    def digest(text: str) -> str:
        toks = sorted({w for w in text.split(" ") if w != ""})
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    from collections import Counter

    counts = Counter(
        (digest(t), split_of(d)) for d, t in zip(docs["doc_id"], docs["text"])
    )
    expect = Counter()
    shared = {}
    digs = {}
    for (dig, split), c in counts.items():
        digs.setdefault(dig, []).append((split, c))
    for dig, entries in digs.items():
        for i, (sa, ca) in enumerate(entries):
            for sb, cb in entries[i:]:
                a, b = sorted((sa, sb))
                np_ = ca * (ca - 1) // 2 if sa == sb else ca * cb
                if np_ > 0:
                    expect[(a, b)] += np_
                    shared.setdefault((a, b), set()).add(dig)
    out = QUERIES["split_leakage_report"](spark, SF_SMOKE).toPandas()
    got = {
        (r["split_a"], r["split_b"]): (int(r["n_dup_pairs"]), int(r["n_shared_digests"]))
        for _, r in out.iterrows()
    }
    assert got == {k: (v, len(shared[k])) for k, v in expect.items()}


def test_streaming_ivf_assign_equals_batch(spark):
    """The ingest twin's assignments must equal the batch assign stage
    (nearest fixed-K centroid, centroid-id tiebreak) exactly."""
    from kasper_spark.operators.similarity import _IVF_K

    twin = (
        QUERIES["streaming_ivf_assign_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert len(twin) == (emb["vec_id"] >= _IVF_K).sum()
    assert twin["cid"].between(0, _IVF_K - 1).all()
    assert twin["vec_id"].min() >= _IVF_K


import pytest


@pytest.mark.parametrize("n_files", [1, 2, 7])
def test_streaming_turn_structure_invariant_to_batch_cuts(spark, n_files):
    """The per-session turn audit must not depend on WHERE the stream is
    cut: any contiguous time-range split (single batch through a 7-way
    split stranding open sessions in state across many boundaries) reduces
    to the batch answer."""
    import os

    from pyspark.sql import functions as F

    from kasper_spark.operators.streaming_twins import (
        _staged_markov_feed,
        turn_structure_stream,
    )

    batch = {
        (r["user_id"], r["session_no"]): (
            r["n_events"],
            r["n_turns"],
            r["max_run_len"],
        )
        for r in QUERIES["session_turn_structure"](spark, SF_SMOKE).collect()
    }
    stream, out_dir, ckpt = _staged_markov_feed(
        spark, SF_SMOKE, f"kasper-turncut{n_files}-", n_files=n_files
    )
    revisions = turn_structure_stream(stream)
    q = (
        revisions.writeStream.foreachBatch(
            lambda df, eid: df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={eid}")
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id", "session_no")
        .agg(F.max(F.struct("n_events", "n_turns", "max_run_len")).alias("s"))
        .collect()
    )
    got = {
        (r["user_id"], r["session_no"]): (
            r["s"]["n_events"],
            r["s"]["n_turns"],
            r["s"]["max_run_len"],
        )
        for r in final
    }
    assert got == batch


def test_eval_report_example(spark):
    """The evaluation walkthrough composes the round-9 tier; the summary
    must be internally consistent on the bounded testdata."""
    import examples.eval_report as er

    c = er.main(spark, SF_SMOKE)
    assert c["sources_carded"] > 0
    assert c["cross_split_leaked_pairs"] >= 0
    assert -1.0 <= c["min_pairwise_kappa"] <= 1.0
    assert 0.0 <= c["worst_disagreement_rate"] <= 1.0
    # calibrated-ish: the top logit decile keeps at least as often as the
    # bottom one under the independent heuristic gates
    assert c["calibration_top_vs_bottom_keep"] >= 0.0
    assert 0.0 < c["mrr_at_corpus"] <= 1.0


def test_session_path_topk_consistency(spark):
    """Path counts must reconcile with session_turn_structure: total
    sessions match, every path is <= 3 steps over the event-type
    alphabet, and ranks are dense from 1."""
    paths = QUERIES["session_path_topk"](spark, SF_SMOKE).toPandas()
    turns = QUERIES["session_turn_structure"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    alphabet = set(ev["event_type"])
    assert list(paths.sort_values("rank")["rank"]) == list(
        range(1, len(paths) + 1)
    )
    for p in paths["path"]:
        steps = p.split(">")
        assert 1 <= len(steps) <= 3
        assert all(s in alphabet for s in steps)
        # turns collapse runs: consecutive steps always differ
        assert all(a != b for a, b in zip(steps, steps[1:]))
    assert int(paths["n_sessions"].sum()) <= len(turns)


def test_source_ngram_overlap_jaccard_reference(spark):
    """Per-pair shared counts and Jaccard must equal a direct pandas
    set computation over per-source shingle sets."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sets = {}
    for src, text in zip(docs["source"], docs["text"]):
        t = [w for w in text.split(" ") if w != ""]
        sh = {" ".join(t[i : i + 4]) for i in range(len(t) - 3)} if len(t) >= 4 else set()
        sets.setdefault(src, set()).update(sh)
    out = QUERIES["source_ngram_overlap"](spark, SF_SMOKE).toPandas()
    for _, row in out.iterrows():
        a, b = sets[row["source_a"]], sets[row["source_b"]]
        inter = len(a & b)
        assert int(row["n_shared"]) == inter
        assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
        assert row["jaccard"] == inter / (len(a) + len(b) - inter)
    # completeness: every overlapping pair appears
    srcs = sorted(sets)
    expected_pairs = {
        (x, y)
        for i, x in enumerate(srcs)
        for y in srcs[i + 1 :]
        if sets[x] & sets[y]
    }
    assert {(r["source_a"], r["source_b"]) for _, r in out.iterrows()} == expected_pairs


def test_benford_shares_and_counts(spark):
    """Digit counts must match a sequential pass; Benford shares must sum
    to ~1 and be the canonical log10(1+1/d) values."""
    import math

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    from collections import Counter

    cents = (ev["value"] * 100 + 0.5).apply(math.floor).astype("int64")
    digits = Counter(int(str(c)[0]) for c in cents if c > 0)
    out = QUERIES["benford_digit_audit"](spark, SF_SMOKE).toPandas()
    assert {int(d) for d in out["digit"]} <= set(range(1, 10))
    total = sum(digits.values())
    for _, row in out.iterrows():
        d = int(row["digit"])
        assert int(row["n_observed"]) == digits[d]
        assert row["obs_share"] == digits[d] / total
        assert abs(row["benford_share"] - math.log10(1 + 1 / d)) < 1e-9
        assert abs(row["expected_n"] - total * math.log10(1 + 1 / d)) < 1e-4
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_int8_quantization_error_reference(spark):
    """Errors must match a numpy reference of the exact quantizer within
    float tolerance, and the structural bounds must hold: max error is at
    most sc/2 (round-to-nearest) and the L1 sum dominates the max."""
    import numpy as np

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = QUERIES["int8_quantization_error"](spark, SF_SMOKE).toPandas()
    assert len(out) == len(emb)
    by_id = {int(r["vec_id"]): r for _, r in out.iterrows()}
    for vid, v in zip(emb["vec_id"], emb["embedding"]):
        v = np.asarray(v, dtype=np.float64)
        sc = max(np.abs(v).max(), 1e-30) / 127.0
        err = np.abs(v - np.round(v / sc) * sc)
        row = by_id[int(vid)]
        assert abs(row["max_abs_err"] - err.max()) < 1e-12
        assert abs(row["sum_abs_err"] - err.sum()) < 1e-9
        assert row["max_abs_err"] <= sc / 2 + 1e-12
        assert row["sum_abs_err"] >= row["max_abs_err"] - 1e-12
        assert row["err_to_norm"] >= 0


def test_quality_weighted_mixture_discount_bounds(spark):
    """The adjusted weight must equal floor(sqrt(n))*1e6 * kept/n exactly
    and never exceed the undiscounted temperature weight; quotas must not
    exceed the budget."""
    import math

    base = {
        r["source"]: r
        for r in QUERIES["corpus_mixture_weights"](spark, SF_SMOKE).collect()
    }
    out = QUERIES["quality_weighted_mixture"](spark, SF_SMOKE).collect()
    assert {r["source"] for r in out} == set(base)
    total_quota = 0
    for r in out:
        b = base[r["source"]]
        w_micros = int(b["w_micros"])
        assert int(r["adj_w_micros"]) == (w_micros * int(r["n_kept"])) // int(
            r["n_docs"]
        )
        assert int(r["adj_w_micros"]) <= w_micros
        assert 0 <= int(r["n_kept"]) <= int(r["n_docs"])
        total_quota += int(r["quota_docs"])
    assert total_quota <= 1_000_000


def test_streaming_benford_equals_batch(spark):
    """The ingest twin must reproduce the batch Benford table exactly."""
    batch = (
        QUERIES["benford_digit_audit"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_benford_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_turn_twin_state_survives_query_restart(spark, tmp_path):
    """Checkpoint-resume proof for the turn-structure state: stage the
    feed as 4 time-range files, expose only the first 2, drain
    (availableNow), STOP, expose the rest, drain again on the SAME
    checkpoint — the restored per-user (open session, run) state must
    carry every session to exactly the batch answer, including sessions
    that straddle the restart."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from kasper_spark.operators.streaming_twins import (
        _stage_time_ordered,
        turn_structure_stream,
    )

    batch = {
        (r["user_id"], r["session_no"]): (
            r["n_events"],
            r["n_turns"],
            r["max_run_len"],
        )
        for r in QUERIES["session_turn_structure"](spark, SF_SMOKE).collect()
    }
    src_all, out_dir, ckpt = _stage_time_ordered(
        spark, SF_SMOKE, "kasper-turnresume-", 4, "event_type"
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    ranges = sorted(os.listdir(src_all))
    assert len(ranges) == 4
    epoch_base = [0]

    def drain():
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(os.path.join(live, "range=*"))
        )
        revisions = turn_structure_stream(stream)

        def sink(df, epoch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={epoch_id}")
            )

        q = (
            revisions.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for r in ranges[:2]:
        shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
    drain()
    for r in ranges[2:]:
        shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
    drain()
    final = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id", "session_no")
        .agg(F.max(F.struct("n_events", "n_turns", "max_run_len")).alias("s"))
        .collect()
    )
    got = {
        (r["user_id"], r["session_no"]): (
            r["s"]["n_events"],
            r["s"]["n_turns"],
            r["s"]["max_run_len"],
        )
        for r in final
    }
    assert got == batch


def test_residual_pq_beats_plain_on_recall(spark):
    """Residual encoding must not LOSE recall vs the plain composed index
    at the same (K, M, nprobe, shortlist) budget — the reason FAISS
    encodes residuals by default. Deterministic data -> exact assertion
    (measured 0.95 vs 0.91 mean recall@k at this SF)."""
    from pyspark.sql import functions as F

    plain = (
        QUERIES["ann_ivf_pq_recall_contract"](spark, SF_SMOKE)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    resid = (
        QUERIES["ann_ivf_pq_residual_recall_contract"](spark, SF_SMOKE)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    assert resid >= plain
    assert resid >= 0.9


def test_stl_decomposition_identity_and_balance(spark):
    """Structural laws of the STL-lite decomposition: the three components
    reassemble to the raw count exactly (one-expression residual), the
    hour-of-day-weighted seasonal terms cancel per type (additive
    seasonality is mean-zero by construction), and the trend is the
    centered 25-row moving average."""
    out = QUERIES["stl_decompose_hourly"](spark, SF_SMOKE).toPandas()
    # identity under the op's own association: residual = (n - trend) -
    # seasonal bit-exactly (re-associating to trend+seasonal+residual==n
    # would differ in the last ulp — floats are not associative)
    recon = (out["n_events"].astype("float64") - out["trend"]) - out["seasonal"]
    assert (recon == out["residual"]).all()
    assert ((out["trend"] + out["seasonal"] + out["residual"]
             - out["n_events"]).abs() < 1e-9).all()
    for etype, g in out.groupby("event_type"):
        g = g.sort_values("hour_ts").reset_index(drop=True)
        # seasonal is constant per (type, hour-of-day) and mean-zero when
        # weighted by the hours actually present
        hod = g["hour_ts"].dt.hour
        per_hod = g.groupby(hod)["seasonal"].nunique()
        assert (per_hod == 1).all()
        assert abs(float(g["seasonal"].sum())) < 1e-6 * max(1.0, g["n_events"].sum())
        # trend: re-derive the centered moving average in pandas
        import numpy as np

        n = g["n_events"].to_numpy(dtype="float64")
        for i in (0, len(g) // 2, len(g) - 1):
            lo, hi = max(0, i - 12), min(len(g), i + 13)
            assert g["trend"].iloc[i] == np.sum(n[lo:hi]) / (hi - lo)


def test_streaming_mixture_equals_batch(spark):
    """The ingest twin must reproduce the batch mixture table exactly."""
    batch = (
        QUERIES["quality_weighted_mixture"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_mixture_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_kappa_identity_property():
    """PROPERTY (hypothesis): the clearing-denominators kappa
    (n*agree - S) / (n^2 - S) equals the textbook (po-pe)/(1-pe) for any
    binary label pair set with a non-degenerate denominator, and lands in
    [-1, 1]."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 1)),
            min_size=2,
            max_size=60,
        )
    )
    def check(pairs):
        n = len(pairs)
        agree = sum(1 for a, b in pairs if a == b)
        na1 = sum(a for a, _ in pairs)
        nb1 = sum(b for _, b in pairs)
        s = na1 * nb1 + (n - na1) * (n - nb1)
        if n * n == s:  # pe == 1: kappa undefined (constant labels)
            return
        kappa = (n * agree - s) / (n * n - s)
        po = agree / n
        pe = s / (n * n)
        assert abs(kappa - (po - pe) / (1 - pe)) < 1e-12
        assert -1.0 - 1e-12 <= kappa <= 1.0 + 1e-12

    check()


import pytest as _pytest


@_pytest.mark.parametrize("n_files", [1, 7])
def test_streaming_funnel_invariant_to_batch_cuts(spark, n_files):
    """The attribution counts must not depend on WHERE the stream is cut —
    views/clicks/purchases separated across micro-batch boundaries must
    still qualify through the restored 4-long state."""
    import os

    from pyspark.sql import functions as F

    from kasper_spark.operators.streaming_twins import (
        _staged_markov_feed,
        funnel_attribution_stream,
    )

    batch = {
        r["user_id"]: (r["n_purchases"], r["n_attributed"])
        for r in QUERIES["funnel_attribution_windowed"](spark, SF_SMOKE).collect()
    }
    stream, out_dir, ckpt = _staged_markov_feed(
        spark, SF_SMOKE, f"kasper-funcut{n_files}-", n_files=n_files
    )
    revisions = funnel_attribution_stream(stream)
    q = (
        revisions.writeStream.foreachBatch(
            lambda df, eid: df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={eid}")
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["s"]["n_purchases"], r["s"]["n_attributed"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_purchases", "n_attributed")).alias("s"))
        .collect()
    }
    assert got == batch


def test_auc_matches_sequential_reference(spark):
    """Per-source AUC must equal the textbook average-rank Mann-Whitney
    statistic computed by a sequential Python pass over the same
    deterministic scores/labels — localizes the histogram-rank rewrite
    independently of the oracle."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    rows = [
        (src, _py_logit(t), 1 if sum(_py_labels(t)) >= 2 else 0)
        for src, t in zip(docs["source"], docs["text"])
    ]
    out = QUERIES["auc_label_quality"](spark, SF_SMOKE).toPandas()
    assert set(out["source"]) == set(docs["source"])
    for _, row in out.iterrows():
        grp = [(s, p) for src, s, p in rows if src == row["source"]]
        grp.sort(key=lambda x: x[0])
        # average ranks (1-based) with ties
        ranks: dict[int, float] = {}
        i = 0
        while i < len(grp):
            j = i
            while j < len(grp) and grp[j][0] == grp[i][0]:
                j += 1
            ranks[grp[i][0]] = (i + 1 + j) / 2  # avg of positions i+1..j
            i = j
        n1 = sum(p for _, p in grp)
        n0 = len(grp) - n1
        assert int(row["n_pos"]) == n1 and int(row["n_neg"]) == n0
        if n1 * n0 == 0:
            # degenerate slice: the guarded NULL, never a 0/0 NaN-by-luck
            assert pd.isna(row["auc"])
            continue
        r1 = sum(ranks[s] for s, p in grp if p == 1)
        expect = (r1 - n1 * (n1 + 1) / 2) / (n1 * n0)
        assert abs(row["auc"] - expect) < 1e-12
        assert 0.0 <= row["auc"] <= 1.0
        # the logit GENERATES the labels, so ranking quality must be high
        assert row["auc"] > 0.9


def test_t_closeness_matches_sequential_reference(spark):
    """Per-class ordered EMD must equal the textbook cumulative-difference
    sum over the empirical distributions, and sit in [0, 1]."""
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = cust.assign(acctbal_bin=(cust["c_acctbal"] // 1000).astype("int64"))
    fact = orders.merge(
        cust[["c_custkey", "c_nationkey", "c_mktsegment", "acctbal_bin"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    dom = sorted(fact["o_orderpriority"].unique())
    m = len(dom)
    big_n = len(fact)
    big_c = fact["o_orderpriority"].value_counts().to_dict()
    out = QUERIES["t_closeness_audit"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    by_class = dict(
        tuple(fact.groupby(["c_nationkey", "c_mktsegment", "acctbal_bin"]))
    )
    for _, row in out.iterrows():
        key = (row["c_nationkey"], row["c_mktsegment"], row["acctbal_bin"])
        grp = by_class[key]
        n = len(grp)
        assert int(row["n_orders"]) == n
        cnt = grp["o_orderpriority"].value_counts().to_dict()
        cum, tot = 0, 0
        for sens in dom[:-1]:
            cum += cnt.get(sens, 0) * big_n - big_c[sens] * n
            tot += abs(cum)
        expect = tot / ((m - 1) * n * big_n)
        assert row["t_emd"] == expect
        assert 0.0 <= row["t_emd"] <= 1.0
        assert bool(row["at_risk"]) == (row["t_emd"] > 0.2)


def test_bigram_surprisal_matches_sequential_reference(spark):
    """The worst-20 list must match a sequential Python bigram LM built
    from the same corpus (whole-bit surprisal, integer division)."""
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    doc_bgs = {}
    c_ab: Counter = Counter()
    c_a: Counter = Counter()
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in t.split(" ") if w != ""]
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        doc_bgs[did] = bgs
        for bg in bgs:
            c_ab[bg] += 1
            c_a[bg.split(" ")[0]] += 1
    scores = []
    for did, bgs in doc_bgs.items():
        if not bgs:
            continue
        total = sum(
            (c_a[bg.split(" ")[0]] // c_ab[bg]).bit_length() - 1 for bg in bgs
        )
        scores.append((did, len(bgs), total, total / len(bgs)))
    scores.sort(key=lambda x: (-x[3], x[0]))
    out = QUERIES["bigram_lm_surprisal"](spark, SF_SMOKE).toPandas()
    assert len(out) == 20
    for row, (did, nb, tot, avg) in zip(out.itertuples(), scores[:20]):
        assert (row.doc_id, row.n_bigrams, row.total_bits) == (did, nb, tot)
        assert row.avg_bits == avg


def test_hourly_acf_matches_sequential_reference(spark):
    """The correlogram must equal a sequential pass over the dense hourly
    count series (full-series mean/variance, overlapping pairs), and obey
    |r| <= 1; the synthetic feed's daily cycle must peak at lag 24."""
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    hours = pd.to_datetime(ev["ts"]).dt.floor("h")
    lo, hi = hours.min(), hours.max()
    idx = pd.date_range(lo, hi, freq="h")
    x = hours.value_counts().reindex(idx, fill_value=0).to_numpy().astype(int)
    n, s = len(x), int(x.sum())
    dev = [int(v) * n - s for v in x]
    den = sum(d * d for d in dev)
    out = (
        QUERIES["hourly_autocorrelation"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("lag_hours")
    )
    assert list(out["lag_hours"]) == list(range(1, 25))
    for _, row in out.iterrows():
        lag = int(row["lag_hours"])
        num = sum(a * b for a, b in zip(dev, dev[lag:]))
        assert int(row["n_pairs"]) == n - lag
        assert row["acf"] == num / den
        assert abs(row["acf"]) <= 1.0
