"""Invariant tests for the round-8 event-model + embedding-quality quartet
(cusum_changepoint_events, markov_event_transitions, knn_label_disagreement,
embedding_outlier_topk) — each pinned against a direct sequential reference
or a structural law the oracle comparison alone wouldn't localize."""

from __future__ import annotations

import pandas as pd

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_cusum_matches_recursive_reference(spark):
    """The prefix-sum/running-min closed form must equal the textbook
    recursion S_i = max(0, S_{i-1} + d_i) exactly (integer arithmetic —
    no tolerance)."""
    out = (
        QUERIES["cusum_changepoint_events"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hour_ts"])
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    for etype, g in out.groupby("event_type"):
        hh = len(g)
        tt = int(g["n_events"].sum())
        s_up = s_dn = 0
        for _, row in g.iterrows():
            n = int(row["n_events"])
            s_up = max(0, s_up + (2 * hh * n - 3 * tt))
            s_dn = max(0, s_dn + (tt - 2 * hh * n))
            assert row["cusum_up"] == s_up / (2 * hh), (etype, row["hour_ts"])
            assert row["cusum_dn"] == s_dn / (2 * hh), (etype, row["hour_ts"])
            assert bool(row["alarm_up"]) == (s_up > 8 * tt + 8 * hh)
            assert bool(row["alarm_dn"]) == (s_dn > 8 * tt + 8 * hh)
        # the grid really is zero-filled: hourly counts re-derived from the
        # raw events must agree where present
        raw = ev[ev["event_type"] == etype].groupby("hour_ts").size()
        got = g.set_index("hour_ts")["n_events"]
        assert int(got.sum()) == int(raw.sum())
        # key by isoformat: Spark hands back us-precision timestamps, pandas
        # floor gives ns — value equality is what matters
        nonzero = {ts.isoformat(): int(v) for ts, v in got.items() if v > 0}
        assert nonzero == {ts.isoformat(): int(v) for ts, v in raw.items()}


def test_markov_rows_are_a_distribution(spark):
    """Each prev_type's outgoing probabilities sum to 1 and the transition
    counts reconcile with a direct pandas recount of consecutive pairs."""
    out = QUERIES["markov_event_transitions"](spark, SF_SMOKE).toPandas()
    sums = out.groupby("prev_type")["p_trans"].sum()
    assert ((sums - 1.0).abs() < 1e-9).all(), sums
    totals = out.groupby("prev_type")["n_trans"].sum()
    fromprev = out.groupby("prev_type")["n_from_prev"].first()
    assert (totals == fromprev).all()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["prev_type"] = ev.groupby("user_id")["event_type"].shift(1)
    ref = (
        ev.dropna(subset=["prev_type"])
        .groupby(["prev_type", "event_type"])
        .size()
        .rename("n_ref")
        .reset_index()
        .rename(columns={"event_type": "next_type"})
    )
    merged = out.merge(ref, on=["prev_type", "next_type"], how="outer")
    assert merged["n_trans"].notna().all() and merged["n_ref"].notna().all()
    assert (merged["n_trans"] == merged["n_ref"]).all()


def test_knn_vote_consistency(spark):
    """The vote columns must be mutually consistent and the suspect flag
    must be exactly the minority-vote predicate."""
    out = QUERIES["knn_label_disagreement"](spark, SF_SMOKE).toPandas()
    assert len(out) == 20  # one row per audited vector
    assert out["n_same"].between(0, 10).all()
    assert (out["frac_same"] == out["n_same"] / 10.0).all()
    assert (out["suspect"] == (2 * out["n_same"] < 10).astype(int)).all()


def test_outlier_ranks_are_dense_and_ordered(spark):
    """Per label: exactly top-5 rows, ranks 1..5, dist2 non-increasing and
    non-negative (a squared distance)."""
    out = QUERIES["embedding_outlier_topk"](spark, SF_SMOKE).toPandas()
    assert (out["dist2"] >= 0).all()
    for label, g in out.groupby("label"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        assert (g["dist2"].diff().dropna() <= 0).all(), label


import pytest  # noqa: E402


@pytest.mark.parametrize("n_files", [1, 3, 7])
def test_streaming_markov_invariant_to_batch_cuts(spark, n_files):
    """The transition matrix must not depend on WHERE the stream is cut
    into micro-batches: the carried last-event_type state bridges every
    boundary, so any contiguous time-range split yields the batch counts."""
    import os

    from kasper_spark.operators.streaming_twins import (
        _staged_markov_feed,
        markov_partial_counts,
    )
    from pyspark.sql import functions as F

    batch = {
        (r["prev_type"], r["next_type"]): r["n_trans"]
        for r in QUERIES["markov_event_transitions"](spark, SF_SMOKE).collect()
    }
    stream, out_dir, ckpt = _staged_markov_feed(
        spark, SF_SMOKE, f"kasper-mcut{n_files}-", n_files=n_files
    )
    partials = markov_partial_counts(stream)

    def sink(df, epoch_id):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        partials.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").cast("long").alias("n"))
        .collect()
    }
    assert got == batch


def test_user_cusum_matches_recursive_reference(spark):
    """The fixed-target alarm must equal the textbook per-user recursion —
    and every emitted row must be above threshold (integer arithmetic)."""
    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    out = QUERIES["cusum_user_spend_alarm"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0 and (out["excess"] > _UCUSUM_THRESH).all()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    got = {(r.user_id, r.event_id): r.excess for r in out.itertuples()}
    expected = {}
    for uid, g in ev.groupby("user_id"):
        s = 0
        for r in g.itertuples():
            cents = int(round(r.value * 100))
            s = max(0, s + cents - _UCUSUM_TARGET - _UCUSUM_SLACK)
            if s > _UCUSUM_THRESH:
                expected[(uid, r.event_id)] = s
    assert got == expected


@pytest.mark.parametrize("n_files", [1, 3, 7])
def test_streaming_cusum_invariant_to_batch_cuts(spark, n_files):
    """Alarm rows must not depend on WHERE the stream is cut: the
    two-BIGINT carried state (prefix, running min) bridges every
    boundary."""
    import os

    from kasper_spark.operators.streaming_twins import (
        _staged_ewma_feed,
        cusum_alarm_stream,
    )
    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    batch = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in QUERIES["cusum_user_spend_alarm"](spark, SF_SMOKE).collect()
    }
    stream, out_dir, ckpt = _staged_ewma_feed(
        spark, SF_SMOKE, f"kasper-ccut{n_files}-", n_files=n_files
    )
    alarms = cusum_alarm_stream(stream, _UCUSUM_TARGET, _UCUSUM_SLACK, _UCUSUM_THRESH)

    def sink(df, epoch_id):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        alarms.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    }
    assert got == batch


def test_markov_anomaly_ranks_least_probable(spark):
    """Bottom-50 contract: ranks dense 1..50, p_trans non-decreasing with
    rank, and every row's (prev, next, p) agrees with the fitted matrix."""
    out = (
        QUERIES["markov_transition_anomaly"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("rank")
    )
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out["p_trans"].diff().dropna() >= 0).all()
    matrix = QUERIES["markov_event_transitions"](spark, SF_SMOKE).toPandas()
    m = {(r.prev_type, r.next_type): r.p_trans for r in matrix.itertuples()}
    for r in out.itertuples():
        assert m[(r.prev_type, r.next_type)] == r.p_trans


def test_entity_resolution_structure(spark):
    """ER invariants: the canonical record is the min doc_id of its
    entity, sizes are consistent, and every resolved doc really has an
    edge in the blocking graph."""
    out = QUERIES["entity_resolution_pipeline"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    for eid, g in out.groupby("entity_id"):
        assert g["doc_id"].min() == eid
        assert (g["entity_size"] == len(g)).all()
        assert g["is_canonical"].sum() == 1
        assert int(g.loc[g["is_canonical"] == 1, "doc_id"].iloc[0]) == eid
    edges = QUERIES["levenshtein_block_pairs"](spark, SF_SMOKE).toPandas()
    nodes = set(edges["doc_a"]) | set(edges["doc_b"])
    assert set(out["doc_id"]) == nodes


def test_markov_stationary_is_fixpoint(spark):
    """The 16-round iterate must (a) be a probability vector and (b) be
    numerically stationary: one more application of the fitted matrix
    moves it by < 1e-9 in L1."""
    pi = {
        r["state"]: r["stationary_p"]
        for r in QUERIES["markov_stationary_distribution"](spark, SF_SMOKE).collect()
    }
    assert abs(sum(pi.values()) - 1.0) < 1e-9
    assert all(p > 0 for p in pi.values())
    m = QUERIES["markov_event_transitions"](spark, SF_SMOKE).toPandas()
    nxt = {s: 0.0 for s in pi}
    for r in m.itertuples():
        nxt[r.next_type] += pi[r.prev_type] * r.p_trans
    l1 = sum(abs(nxt[s] - pi[s]) for s in pi)
    assert l1 < 1e-9, l1


def test_ks_drift_matches_direct_computation(spark):
    """KS per source must equal a direct pandas two-sample CDF comparison
    (source vs rest) and sit in [0, 1]."""
    import numpy as np

    out = QUERIES["ks_quality_drift_by_source"](spark, SF_SMOKE).toPandas()
    assert ((out["ks_stat"] >= 0) & (out["ks_stat"] <= 1)).all()
    q = QUERIES["quality_score"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "source"]]
    qs = q.merge(docs, on="doc_id")
    values = np.sort(qs["quality"].unique())
    for r in out.itertuples():
        a = qs.loc[qs["source"] == r.source, "quality"].to_numpy()
        b = qs.loc[qs["source"] != r.source, "quality"].to_numpy()
        diffs = [
            abs((a <= v).mean() - (b <= v).mean()) for v in values
        ]
        assert abs(max(diffs) - r.ks_stat) < 1e-12, r.source
        assert len(a) == r.n_docs


def test_attribution_funnel_matches_sequential_reference(spark):
    """The two-window attribution plan must equal a direct per-user
    sequential scan (last qualifying touchpoint carried forward)."""
    out = QUERIES["funnel_attribution_windowed"](spark, SF_SMOKE).toPandas()
    assert (out["n_attributed"] <= out["n_purchases"]).all()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    W = pd.Timedelta(hours=1)
    expected = {}
    for uid, g in ev.groupby("user_id"):
        last_view = last_qclick = None
        n_p = n_a = 0
        for r in g.itertuples():
            if r.event_type == "view":
                last_view = r.ts
            elif r.event_type == "click":
                if last_view is not None and r.ts <= last_view + W:
                    last_qclick = r.ts
            elif r.event_type == "purchase":
                n_p += 1
                if last_qclick is not None and r.ts <= last_qclick + W:
                    n_a += 1
        if n_p:
            expected[uid] = (n_p, n_a)
    got = {
        r.user_id: (r.n_purchases, r.n_attributed) for r in out.itertuples()
    }
    assert got == expected


def test_session_markov_is_subset_of_global(spark):
    """Session-scoped transition counts can never exceed the global
    matrix's (dropping cross-session pairs only removes counts), and the
    total dropped equals the number of multi-event session boundaries."""
    glob = QUERIES["markov_event_transitions"](spark, SF_SMOKE).toPandas()
    sess = QUERIES["markov_session_transitions"](spark, SF_SMOKE).toPandas()
    g = {(r.prev_type, r.next_type): r.n_trans for r in glob.itertuples()}
    s = {(r.prev_type, r.next_type): r.n_trans for r in sess.itertuples()}
    assert set(s) <= set(g)
    assert all(s[k] <= g[k] for k in s)
    dropped = sum(g.values()) - sum(s.values())
    sessions = QUERIES["sessionize_events"](spark, SF_SMOKE).toPandas()
    # each user's first session starts no pair-drop; every LATER session
    # start drops exactly the one cross-boundary pair
    expected_dropped = int(
        (sessions.groupby("user_id")["session_no"].max() - 1).sum()
    )
    assert dropped == expected_dropped


def test_mad_outliers_match_pandas_reference(spark):
    """The histogram-selection medians must equal pandas lower medians and
    the flag set must equal the direct |x-med| > 5*max(MAD,1) rule."""
    out = QUERIES["mad_outlier_events"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    expected = set()
    meds = {}
    for uid, g in ev.groupby("user_id"):
        vals = sorted(g["cents"])
        med = vals[(len(vals) + 1) // 2 - 1]  # lower median
        devs = sorted(abs(c - med) for c in g["cents"])
        mad = max(devs[(len(devs) + 1) // 2 - 1], 1)
        meds[uid] = (med, mad)
        for r in g.itertuples():
            if abs(r.cents - med) > 5 * mad:
                expected.add((uid, r.event_id))
    assert {(r.user_id, r.event_id) for r in out.itertuples()} == expected
    for r in out.itertuples():
        assert (r.med, r.mad) == meds[r.user_id]
        assert r.dev == abs(r.cents - r.med)


def test_interarrival_quantiles_match_numpy_reference(spark):
    """The histogram rank selection must equal the direct lower-quantile
    (ceil(q*n)-th order statistic) over the raw gap list."""
    import math

    out = QUERIES["interarrival_quantiles_by_type"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["event_type", "user_id", "ts", "event_id"]
    )
    ev["epoch"] = ev["ts"].astype("datetime64[s]").astype("int64")
    ev["gap"] = ev["epoch"] - ev.groupby(["event_type", "user_id"])["epoch"].shift(1)
    for r in out.itertuples():
        gaps = sorted(
            int(g)
            for g in ev.loc[ev["event_type"] == r.event_type, "gap"].dropna()
        )
        assert r.n_gaps == len(gaps)
        rank = math.ceil(r.q * len(gaps))
        assert r.gap_sec == gaps[rank - 1], (r.event_type, r.q)


def test_deseasonalized_cusum_preserves_totals(spark):
    """Deseasonalization must preserve each type's total (sum of v = T),
    the CUSUM statistics must be non-negative, and on this stationary
    testdata the deseasonalized detector must alarm at most as often as
    the raw one."""
    out = QUERIES["cusum_deseasonalized_events"](spark, SF_SMOKE).toPandas()
    assert (out["cusum_up"] >= 0).all() and (out["cusum_dn"] >= 0).all()
    for etype, g in out.groupby("event_type"):
        assert abs(g["deseasonalized"].sum() - g["n_events"].sum()) < 1e-6, etype
    # stationary data: alarms must be rare (at smoke scale the sparse
    # hourly counts make the deseasonalized series noisier than the raw
    # one, but a sane detector still flags only a few % of the grid —
    # the pre-fix dn-drift bug flagged 97%)
    n_deseason = int((out["alarm_up"] + out["alarm_dn"]).sum())
    assert n_deseason <= 0.05 * len(out), n_deseason


def test_pareto_deciles_are_a_lorenz_curve(spark):
    """Deciles partition all users, shares sum to 1, and shares are
    non-increasing from the top decile down (users ranked by spend)."""
    out = (
        QUERIES["value_pareto_deciles"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("decile")
    )
    assert list(out["decile"]) == list(range(1, len(out) + 1))
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    assert out["n_users"].sum() == ev["user_id"].nunique()
    assert abs(out["value_share"].sum() - 1.0) < 1e-9
    # deciles are rank-ordered, but with few users their SIZES alternate
    # (ceil boundaries) — the size-independent invariant is the per-user
    # average share being non-increasing down the ranking
    avg = out["value_share"] / out["n_users"]
    assert (avg.diff().dropna() <= 1e-12).all()


@pytest.mark.parametrize("n_files", [1, 5])
def test_streaming_interarrival_invariant_to_batch_cuts(spark, n_files):
    """Gap partials must not depend on WHERE the stream is cut: the
    per-user last-epoch map bridges every boundary, so the summed
    histogram equals the batch operator's gap histogram exactly."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kasper_spark.operators.streaming_twins import (
        _staged_markov_feed,
        interarrival_partial_counts,
    )

    from kasper_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    batch_hist = (
        ev.select(
            "event_type",
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
        .groupBy("event_type", "gap")
        .count()
    )
    batch = {
        (r["event_type"], r["gap"]): r["count"] for r in batch_hist.collect()
    }
    stream, out_dir, ckpt = _staged_markov_feed(
        spark, SF_SMOKE, f"kasper-gcut{n_files}-", n_files=n_files
    )
    partials = interarrival_partial_counts(stream)

    def sink(df, epoch_id):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        partials.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_type"], r["gap"]): r["n"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("event_type", "gap")
        .agg(F.sum("n").cast("long").alias("n"))
        .collect()
    }
    assert got == batch


def test_session_duration_quantiles_match_order_statistics(spark):
    """The histogram selection must equal the direct lower-quantile order
    statistic over the sessionize_events durations."""
    import math

    out = QUERIES["session_duration_quantiles"](spark, SF_SMOKE).toPandas()
    durs = sorted(
        r["duration_sec"]
        for r in QUERIES["sessionize_events"](spark, SF_SMOKE).collect()
    )
    for r in out.itertuples():
        assert r.n_sessions == len(durs)
        rank = math.ceil(r.q * len(durs))
        assert r.duration_sec == durs[rank - 1], r.q


def test_cross_source_matrix_accounts_every_dup_pair(spark):
    """The matrix's pair total must equal sum over digest groups of
    C(group_size, 2) — every duplicate pair lands in exactly one cell."""
    out = QUERIES["cross_source_dup_matrix"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0 and (out["n_dup_pairs"] > 0).all()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    digests = docs["text"].map(
        lambda t: " ".join(sorted(set(w for w in t.split(" ") if w)))
    )
    sizes = digests.value_counts()
    expected_pairs = int((sizes * (sizes - 1) // 2).sum())
    assert int(out["n_dup_pairs"].sum()) == expected_pairs


def test_cusum_twin_state_survives_query_restart(spark, tmp_path):
    """Checkpoint-resume proof for the order-dependent state: stage the
    feed as 4 time-range files, expose only the first 2, drain
    (availableNow), STOP, expose the rest, and drain again with the SAME
    checkpoint — the restored (prefix, running-min) state must carry the
    alarms to exactly the batch answer."""
    import os
    import shutil

    from kasper_spark.operators.streaming_twins import (
        _stage_time_ordered,
        cusum_alarm_stream,
    )
    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    batch = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in QUERIES["cusum_user_spend_alarm"](spark, SF_SMOKE).collect()
    }
    src_all, out_dir, ckpt = _stage_time_ordered(
        spark, SF_SMOKE, "kasper-resume-", 4, "value"
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    ranges = sorted(os.listdir(src_all))
    assert len(ranges) == 4

    def drain():
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(os.path.join(live, "range=*"))
            .selectExpr(
                "user_id",
                "event_id",
                "ts",
                "CAST(round(value * 100) AS LONG) AS cents",
            )
        )
        alarms = cusum_alarm_stream(
            stream, _UCUSUM_TARGET, _UCUSUM_SLACK, _UCUSUM_THRESH
        )

        def sink(df, epoch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={epoch_id}")
            )

        q = (
            alarms.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # first life: only the first two time ranges exist
    for r in ranges[:2]:
        shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
    drain()
    # second life: the rest arrives; same checkpoint -> state restores
    for r in ranges[2:]:
        shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
    drain()
    got = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    }
    assert got == batch


def test_cusum_tws_state_survives_query_restart(spark, tmp_path):
    """The same restart proof on the STATE-V2 runtime: the typed
    ValueState ("prefix long, minpre long") must restore from the RocksDB
    checkpoint (through the protobuf shim) and carry the alarms to the
    batch answer."""
    import os
    import shutil

    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import cusum_alarms_tws
    from kasper_spark.operators.streaming_twins import _stage_time_ordered
    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    ensure_protobuf()
    ship_shim_to_workers(spark)

    batch = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in QUERIES["cusum_user_spend_alarm"](spark, SF_SMOKE).collect()
    }
    src_all, out_dir, ckpt = _stage_time_ordered(
        spark, SF_SMOKE, "kasper-twsres-", 4, "value"
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    ranges = sorted(os.listdir(src_all))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)

    def drain():
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(os.path.join(live, "range=*"))
            .selectExpr(
                "user_id",
                "event_id",
                "ts",
                "CAST(round(value * 100) AS LONG) AS cents",
            )
        )
        alarms = cusum_alarms_tws(
            stream, _UCUSUM_TARGET, _UCUSUM_SLACK, _UCUSUM_THRESH
        )

        def sink(df, epoch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={epoch_id}")
            )

        q = (
            alarms.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        for r in ranges[:2]:
            shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
        drain()
        for r in ranges[2:]:
            shutil.copytree(os.path.join(src_all, r), os.path.join(live, r))
        drain()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    got = {
        (r["user_id"], r["event_id"]): r["excess"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    }
    assert got == batch
