"""Event-time streaming: watermarked tumbling windows and late-data
handling — the semantics tier the reference lacks entirely (SURVEY.md §2.C:
no watermarks, no windows, state never evicts). Batch twin equivalence is
asserted against the same data."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig


def _write(d, rows, fname):
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, fname + ".tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(d, fname))


EVENTS_B1 = [
    {"ts": "2024-01-01 10:05:00", "user": "u1", "v": 1.0},
    {"ts": "2024-01-01 10:20:00", "user": "u2", "v": 2.0},
    {"ts": "2024-01-01 11:02:00", "user": "u1", "v": 3.0},
]
EVENTS_B2 = [
    {"ts": "2024-01-01 10:40:00", "user": "u1", "v": 4.0},   # late but in-window
    {"ts": "2024-01-01 12:01:00", "user": "u2", "v": 5.0},
]


def test_tumbling_window_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    _write(src, EVENTS_B1, "b1.json")
    _write(src, EVENTS_B2, "b2.json")

    pipe = Pipeline(
        spark,
        PipelineConfig(name="win", checkpoint_root=str(tmp_path / "ck")),
    )
    raw = pipe.file_source(src, "ts string, user string, v double")
    evs = raw.select(F.to_timestamp("ts").alias("ts"), "user", "v")
    windowed = (
        evs.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").start.alias("ws"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,4)")).cast("double").alias("sv"),
        )
    )
    rows = []
    pipe.run_available_now(
        windowed,
        output_mode="update",
        for_each_batch=lambda df, _: rows.extend(r.asDict() for r in df.collect()),
    )
    final = {}
    for r in rows:
        final[str(r["ws"])] = (r["n"], r["sv"])  # last update wins

    # batch twin over the same data
    all_events = EVENTS_B1 + EVENTS_B2
    bdf = (
        spark.createDataFrame(all_events)
        .select(F.to_timestamp("ts").alias("ts"), "v")
        .groupBy(F.date_trunc("hour", "ts").alias("ws"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,4)")).cast("double").alias("sv"),
        )
    )
    expected = {str(r["ws"]): (r["n"], r["sv"]) for r in bdf.collect()}
    assert final == expected


def test_append_mode_emits_finalized_windows_once(spark, tmp_path):
    """Append mode: a window is emitted exactly once, when the watermark
    passes its end; still-open windows are never emitted.

    (Observed engine caveat, documented rather than fought: after an
    availableNow RESTART, Spark re-accepts events below the restored
    watermark into evicted windows — so cross-restart late-data dropping
    must not be relied upon. Within a run, finalized windows are stable.)
    """
    src = str(tmp_path / "append")
    # 10:05 falls in [10:00, 11:00); 13:30's window stays open (watermark
    # reaches 12:30 = 13:30 - 1h, past 11:00 but short of 14:00)
    _write(src, [{"ts": "2024-01-01 10:05:00", "v": 1.0},
                 {"ts": "2024-01-01 13:30:00", "v": 2.0}], "b1.json")

    pipe = Pipeline(
        spark, PipelineConfig(name="append", checkpoint_root=str(tmp_path / "ck"))
    )
    raw = pipe.file_source(src, "ts string, v double")
    evs = raw.select(F.to_timestamp("ts").alias("ts"), "v")
    windowed = (
        evs.withWatermark("ts", "1 hour")
        # group by the window column itself (not window().start — that
        # projection severs the watermark association for append mode)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.sum(F.col("v").cast("decimal(38,4)")).cast("double").alias("sv"))
        .select(F.col("win.start").alias("ws"), "sv")
    )
    rows = []
    pipe.run_available_now(
        windowed,
        output_mode="append",
        for_each_batch=lambda df, _: rows.extend(r.asDict() for r in df.collect()),
    )
    emitted = [(str(r["ws"]), r["sv"]) for r in rows]
    assert emitted == [("2024-01-01 10:00:00", 1.0)]


def test_session_window_streaming(spark, tmp_path):
    """Streaming session_window (30-min gap) in append mode: a session is
    emitted exactly when the watermark passes its gap-end — so after the
    drain, CLOSED sessions match the batch twin and the still-open tail
    session is (correctly) absent. This pins the semantics a naive test
    would paper over by using a complete-drain assumption."""
    src = str(tmp_path / "sess-ev")
    rows = [
        # u1: two sessions (10:00-10:20 burst, then 11:30)
        {"ts": "2024-01-01 10:00:00", "user": "u1", "v": 1.0},
        {"ts": "2024-01-01 10:20:00", "user": "u1", "v": 1.0},
        {"ts": "2024-01-01 11:30:00", "user": "u1", "v": 1.0},
        # u2: one session
        {"ts": "2024-01-01 10:05:00", "user": "u2", "v": 1.0},
    ]
    _write(src, rows[:2], "b1.json")
    _write(src, rows[2:], "b2.json")
    pipe = Pipeline(
        spark, PipelineConfig(name="sess-win", checkpoint_root=str(tmp_path / "ck"))
    )
    evs = pipe.file_source(src, "ts timestamp, user string, v double")
    sessions = (
        evs.withWatermark("ts", "0 seconds")
        .groupBy("user", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user", F.col("w.start").alias("start"), "n")
    )
    pipe.run_available_now(sessions, query_name="sess_out", output_mode="append")
    got = {
        (r["user"], str(r["start"])): r["n"]
        for r in spark.table("sess_out").collect()
    }

    batch = (
        spark.createDataFrame(
            [(r["ts"], r["user"], r["v"]) for r in rows], "ts string, user string, v double"
        )
        .select(F.col("ts").cast("timestamp").alias("ts"), "user")
        .groupBy("user", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user", F.col("w.start").alias("start"), "n")
    )
    expected = {(r["user"], str(r["start"])): r["n"] for r in batch.collect()}
    open_key = ("u1", "2024-01-01 11:30:00")  # watermark (11:30) < gap-end
    assert open_key in expected and open_key not in got
    closed_expected = {k: v for k, v in expected.items() if k != open_key}
    assert got == closed_expected
    assert got[("u1", "2024-01-01 10:00:00")] == 2  # merged burst session


def test_native_stream_stream_interval_join(spark, tmp_path):
    """Native watermarked stream-stream join (clicks joined to purchases
    within 1 hour after the click) — the built-in form whose state Spark
    evicts via watermarks, complementing the custom never-evicting document
    join (streaming/state.py). Equivalence is asserted against the same
    join run in batch."""
    clicks_src = str(tmp_path / "clicks")
    buys_src = str(tmp_path / "buys")
    clicks = [
        {"ts": "2024-01-01 10:00:00", "user": "u1", "click_id": "c1"},
        {"ts": "2024-01-01 10:30:00", "user": "u2", "click_id": "c2"},
        {"ts": "2024-01-01 12:00:00", "user": "u1", "click_id": "c3"},
    ]
    buys = [
        {"bts": "2024-01-01 10:45:00", "buser": "u1", "buy_id": "b1"},  # joins c1
        {"bts": "2024-01-01 10:50:00", "buser": "u2", "buy_id": "b2"},  # joins c2
        {"bts": "2024-01-01 12:10:00", "buser": "u1", "buy_id": "b3"},  # joins c3
        {"bts": "2024-01-01 14:00:00", "buser": "u2", "buy_id": "b4"},  # outside window
    ]
    _write(clicks_src, clicks, "c.json")
    _write(buys_src, buys, "b.json")

    pipe = Pipeline(
        spark, PipelineConfig(name="ss-join", checkpoint_root=str(tmp_path / "ck"))
    )
    cs = pipe.file_source(clicks_src, "ts timestamp, user string, click_id string")
    bs = pipe.file_source(buys_src, "bts timestamp, buser string, buy_id string")
    joined = (
        cs.withWatermark("ts", "2 hours")
        .join(
            bs.withWatermark("bts", "2 hours"),
            F.expr(
                "user = buser AND bts >= ts AND bts <= ts + INTERVAL 1 HOUR"
            ),
        )
        .select("click_id", "buy_id")
    )
    pipe.run_available_now(joined, query_name="ss_join_out", output_mode="append")
    got = sorted((r["click_id"], r["buy_id"]) for r in spark.table("ss_join_out").collect())
    assert got == [("c1", "b1"), ("c2", "b2"), ("c3", "b3")]


def test_session_window_exact_gap_merges(spark):
    """Pin Spark's exact-gap-boundary semantics: an event arriving exactly
    gap-after the previous one CONTINUES the session (touching windows
    merge) — the convention session_window_native's oracle must encode
    with `<=` (a strict `<` oracle would disagree on any exact-gap data,
    which the driver fixtures happen not to contain)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:30:00")],
        "user_id long, s string",
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"))
    rows = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(rows) == 1 and rows[0]["n"] == 2
    assert rows[0]["sw"]["end"].isoformat() == "2024-01-01T11:00:00"
