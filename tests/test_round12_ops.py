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
