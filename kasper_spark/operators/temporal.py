"""Temporal operators: event-time windows, range joins, as-of joins.

The reference has NO event-time semantics (SURVEY.md §2.C — its only clock
is the processing-time batch ticker, /root/reference/topic_processor.go:193,
219-232). These operators supply the event-time tier a streaming engine
needs, each with a bounded oracle-checked twin; the streaming forms (window()
aggregations with watermarks) are exercised in tests/test_streaming_windows.py.

Scale notes:
- tumbling windows are a plain groupBy on a derived bucket column — partial
  aggregation applies, shuffle carries (bucket, key) groups;
- the range join pre-buckets both sides to the hour so Spark joins on the
  equality (user_id, bucket) pair first and applies the range predicate as
  a post-filter — avoiding the O(n^2) theta-join a naive BETWEEN would give;
- the as-of join uses a window over the unioned stream rather than a
  per-row subquery (one shuffle + one sort, no N lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import dsum, dsum_sql
from kasper_spark.lineage import cut_lineage
from kasper_spark.registry import register_query


@register_query(
    "events_tumbling_1h",
    oracle=f"""
    SELECT
        date_trunc('hour', ts) AS window_start,
        event_type,
        COUNT(*) AS n,
        {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — batch twin of the
    streaming groupBy(window(ts, '1 hour')) (aligned windows make
    window.start == date_trunc('hour')). The streaming form adds a
    watermark; same grouping, same state layout."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@register_query(
    "events_by_day",
    oracle="""
    SELECT
        -- TIMESTAMP, not DATE: Spark DateType reaches pandas as object
        -- (datetime.date) while DuckDB DATE becomes datetime64 — the
        -- driver's value-hash can see those differently, so both sides
        -- emit midnight timestamps
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        COUNT(*) AS n,
        COUNT(DISTINCT user_id) AS dau
    FROM events
    GROUP BY 1
    """,
)
def events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup with distinct users (date functions + distinct agg)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("dau")
    )


@register_query(
    "join_range_events",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, ts AS ets FROM events WHERE event_type = 'error'
    )
    SELECT
        p.user_id,
        p.purchase_id,
        COUNT(e.ets) AS errors_before
    FROM p LEFT JOIN e
      ON p.user_id = e.user_id
     AND e.ets >= p.pts - INTERVAL 1 HOUR
     AND e.ets < p.pts
    GROUP BY p.user_id, p.purchase_id
    """,
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: errors within the hour before each purchase.

    Spark-first shape: both sides bucket to the hour and the probe side
    explodes into the two candidate buckets (h, h-1), turning the range
    predicate into an equi-join on (user_id, bucket) + residual filter —
    the standard bucketed range-join decomposition that keeps the shuffle
    keyed and bounded instead of falling into a broadcast-nested-loop."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("ets"),
        F.date_trunc("hour", "ts").alias("e_bucket"),
    )
    # purchase probes both candidate buckets covering [pts-1h, pts)
    pb = p.select(
        "user_id",
        "purchase_id",
        "pts",
        F.explode(
            F.array(
                F.date_trunc("hour", "pts"),
                F.date_trunc("hour", F.col("pts") - F.expr("INTERVAL 1 HOUR")),
            )
        ).alias("bucket"),
    ).dropDuplicates(["purchase_id", "bucket"])
    joined = pb.join(
        e,
        (pb.user_id == e.e_user_id)
        & (pb.bucket == e.e_bucket)
        & (e.ets >= pb.pts - F.expr("INTERVAL 1 HOUR"))
        & (e.ets < pb.pts),
        "left",
    )
    return joined.groupBy("user_id", "purchase_id").agg(
        F.count("ets").alias("errors_before")
    )


@register_query(
    "sessionize_events",
    oracle="""
    WITH marked AS (
        SELECT
            user_id, event_id, ts,
            CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        -- CAST: DuckDB's SUM(int) is HUGEINT, which pandas renders as
        -- float64 and the driver's value-hash then sees 1.0 vs Spark's 1
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    )
    SELECT
        user_id,
        session_no,
        COUNT(*) AS n_events,
        MIN(ts) AS session_start,
        MAX(ts) AS session_end,
        CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) via gaps-and-islands:
    lag -> new-session flag -> running sum -> per-session aggregation. This
    is the batch twin of the streaming session_window() aggregation
    (event-time semantics the reference lacks, SURVEY.md §2.C).

    Scale: one shuffle on user_id serves both window passes and the final
    groupBy (same partitioning reused); no self-join."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)) <= 1800,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
    )


@register_query(
    "asof_join_last_click",
    oracle="""
    SELECT
        p.event_id AS purchase_id,
        p.user_id,
        (
            SELECT MAX(c.ts) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        ) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each purchase, the most recent click at or
    before it by the same user.

    Spark-first shape: union both event kinds, sort within user by time,
    and carry the last click timestamp forward with a running MAX window —
    one shuffle + one sort for the whole table instead of a correlated
    per-row lookup. (max(ts) over rows<=current of click-only timestamps —
    NULL until the first click.)"""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before purchases at the same timestamp so a simultaneous
    # click counts (ts <= p.ts), matching the oracle's <=
    order_tag = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", order_tag, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_last = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max("click_ts").over(w).alias("last_click_ts"),
    )
    return with_last.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "last_click_ts"
    )


@register_query(
    "events_sliding_1h_15m",
    oracle=f"""
    SELECT
        ws AS window_start,
        COUNT(*) AS n,
        {dsum_sql('value')} AS sum_value
    FROM (
        -- the 4 sliding windows covering each ts: the event's 15-min
        -- time_bucket, stepping back 15 min three times (timestamp-native
        -- arithmetic; double epoch() math misassigns sub-second events)
        SELECT value,
               time_bucket(INTERVAL '15 minutes', ts)
                   - k * INTERVAL '15 minutes' AS ws
        FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
    )
    GROUP BY ws
    """,
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window: 1-hour windows every 15 minutes — each
    event lands in 4 overlapping windows (Spark expands via Expand, a
    map-side 4x row multiplication BEFORE the keyed shuffle, so partial
    aggregation still applies; same operator the streaming twin uses with a
    watermark). The oracle derives the same 4 covering windows per event
    with a LATERAL generate_series.

    Absent from the reference (no event-time at all — SURVEY.md §2.C);
    required by the full-query-capability north star."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@register_query(
    "scd2_user_event_intervals",
    oracle="""
    SELECT
        user_id,
        event_id,
        event_type,
        ts AS valid_from,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL THEN TRUE ELSE FALSE END AS is_current
    FROM events
    WHERE user_id < 200
    """,
)
def scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 style validity intervals: each per-user event becomes a
    [valid_from, valid_to) version row, open-ended on the latest (the
    dimension-history build every warehouse load runs). One shuffle+sort by
    user_id — the same profile as any per-key window; event_id breaks ts
    ties so the intervals are deterministic on any partitioning. The
    user_id predicate is pushed to the parquet scan (bounded probe set,
    same shape as the other bounded-subset queries)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register_query(
    "session_window_native",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS ns
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT
        user_id,
        MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation in batch mode, certified
    against an independent gaps-and-islands formulation — the complement of
    sessionize_events (which implements the islands form itself).

    Two semantic details the cross-check pins down exactly:
    - the gap is INCLUSIVE: an event arriving exactly 30:00 after the
      previous one CONTINUES the session — Spark merges touching
      [ts, ts+gap) windows, verified empirically (events at 10:00:00 and
      10:30:00 with a 30-minute gap yield ONE session 10:00->11:00), and
      pinned by test_session_window_exact_gap_merges; so the oracle's lag
      comparison is `<=`, matching sessionize_events' convention;
    - the native operator's session_end is last_event + gap (the window's
      half-open upper bound), not the last event time.

    Scale: session_window compiles to ONE shuffle on the grouping key plus
    a per-partition sort-merge of overlapping windows — same cost shape as
    the islands form, with the merge logic inside the engine (and shared
    with the streaming path, where state eviction rides the watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register_query(
    "gapfill_hourly_events",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, hour_ts FROM types CROSS JOIN hours),
    agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS s
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT
        spine.event_type AS event_type,
        spine.hour_ts AS hour_ts,
        CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_events,
        agg.s AS sum_value,
        last_value(agg.s IGNORE NULLS) OVER (
            PARTITION BY spine.event_type ORDER BY spine.hour_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS filled_sum
    FROM spine LEFT JOIN agg
      ON spine.event_type = agg.event_type AND spine.hour_ts = agg.hour_ts
    """,
)
def gapfill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: an hourly date spine per event type with
    zero-filled counts and forward-filled (last-observation-carried-
    forward) sums — the gap-filling pattern dashboards and feature
    pipelines need, since a groupBy over sparse events silently OMITS
    empty buckets instead of reporting them as zeros.

    Plan shape: the spine is sequence()+explode over a 1-row bounds
    aggregate crossed with the distinct type set — spine size is
    (hours x types), a function of the TIME RANGE, not the event volume,
    so at 100 TB it is still thousands of rows (the cross join is a
    bounded broadcast, allow-listed). The event-side aggregation partially
    aggregates map-side; the left join broadcasts the spine; the forward
    fill is one per-type window over spine-sized data."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    spine = ev.select("event_type").distinct().crossJoin(hours)
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("s"))
    joined = spine.join(agg, ["event_type", "hour_ts"], "left")
    ffill = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("s").alias("sum_value"),
        F.last("s", ignorenulls=True).over(ffill).alias("filled_sum"),
    )


# ---------------------------------------------------------------------------
# Trailing-EWMA anomaly detection (round 8)
# ---------------------------------------------------------------------------

_EWMA_K = 8  # trailing window length; weights 2^(K-1-j) halve per step back
_EWMA_DEN = (1 << _EWMA_K) - 1  # sum of the K power-of-two weights = 255


@register_query(
    "ewma_anomaly_events",
    oracle=f"""
    WITH cents AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    lagged AS (
        SELECT user_id, event_id, ts, cents,
               {" + ".join(
                   f"lag(cents, {j}) OVER w * {1 << (_EWMA_K - j)}"
                   for j in range(1, _EWMA_K + 1)
               )} AS num,
               lag(cents, {_EWMA_K}) OVER w AS oldest
        FROM cents
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts, cents,
           CAST(num AS DOUBLE) / {_EWMA_DEN}.0 AS ewma,
           CAST(cents * {_EWMA_DEN} AS DOUBLE) / CAST(num AS DOUBLE) AS ratio
    FROM lagged
    WHERE oldest IS NOT NULL
      AND abs(cents * {_EWMA_DEN} - num) > 2 * num
    """,
)
def ewma_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-EWMA anomaly detection over each user's event-value time
    series: forecast the next value as the exponentially-weighted mean of
    the previous K=8 observations (weights 2^(K-1-j), newest heaviest) and
    flag events deviating from the forecast by more than 3x up or down
    (|x - ewma| > 2*ewma). The reference engine has no analog (its only
    clock is the processing-time ticker, topic_processor.go:193); this is
    the per-entity drift/outlier gate a metrics or data-quality tier runs.

    Cross-engine exactness: values are quantized once to integer cents
    (round(value*100) on the identical parquet double — deterministic),
    the weighted numerator is PURE BIGINT arithmetic (max ~49e6 * 255 <<
    2^53), the anomaly predicate compares integers only, and the exposed
    ewma/ratio are single exact-int double divisions — bit-identical on
    any IEEE engine, no float accumulation anywhere.

    Scale: one shuffle on user_id, then a per-user sort — the window is
    embarrassingly parallel over entities (150 here, millions at 100 TB;
    no global sort, no skew since per-user rows are bounded). The K lags
    are one window spec evaluated in a single pass; emitting only
    anomalies keeps the output a tiny fraction of the input."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    for j in range(1, _EWMA_K + 1):
        term = F.lag("cents", j).over(w) * F.lit(1 << (_EWMA_K - j))
        num = term if num is None else num + term
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        num.alias("num"),
        F.lag("cents", _EWMA_K).over(w).alias("oldest"),
    )
    return (
        lagged.filter(F.col("oldest").isNotNull())
        .filter(
            F.abs(F.col("cents") * _EWMA_DEN - F.col("num")) > 2 * F.col("num")
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "cents",
            (F.col("num").cast("double") / float(_EWMA_DEN)).alias("ewma"),
            (
                (F.col("cents") * _EWMA_DEN).cast("double")
                / F.col("num").cast("double")
            ).alias("ratio"),
        )
    )


@register_query(
    "window_count_distinct_cum",
    oracle="""
    SELECT event_type, ts, event_id,
           COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_distinct_users
    FROM events
    """,
)
def window_count_distinct_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user count per event type — the audience-growth
    curve every engagement dashboard wants, and a window shape Spark has no
    native aggregate for (COUNT(DISTINCT) OVER is unsupported in Spark SQL).

    Oracle-as-spec / plan-as-scale-path: the DuckDB oracle states the naive
    semantics (a DISTINCT window aggregate, which materializes a distinct
    set per frame — O(users) state per row). The Spark plan runs the
    scalable rewrite instead: a user contributes only at their FIRST
    (ts, event_id) within the event type (row_number over the per-user
    window), and the cumulative distinct count is then a running SUM of
    that 0/1 first-seen flag — O(1) window state. The hash match certifies
    the rewrite.

    Scale: two shuffles (by (event_type, user_id), then by event_type).
    The second window is partitioned by event_type only — low cardinality,
    so at 100 TB that ordered pass is the bottleneck; the standard fix is
    range-repartitioning each type's timeline and prefix-summing the
    per-range first-seen subtotals (same two-pass trick as
    token_budget_select). The running-sum state stays O(1) either way,
    vs the naive plan's O(distinct-users) set per frame."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "user_id"
    )
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("first_seen"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("first_seen").over(w_cum).cast("bigint").alias("cum_distinct_users"),
    )


@register_query(
    "ohlc_bars_hourly",
    oracle=f"""
    SELECT
        event_type,
        date_trunc('hour', ts) AS bar_hour,
        COUNT(*) AS n_events,
        CAST((min(struct_pack(ts := ts, eid := event_id, v := value))).v
             AS DOUBLE) AS open_value,
        max(value) AS high_value,
        min(value) AS low_value,
        CAST((max(struct_pack(ts := ts, eid := event_id, v := value))).v
             AS DOUBLE) AS close_value,
        {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ohlc_bars_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the classic
    time-series downsample (metrics, tick data, sensor rollups).

    Open/close are argmin/argmax by the unique (ts, event_id) order key,
    expressed as min/max over a (ts, eid, value) struct — lexicographic
    struct comparison is identical in Spark and DuckDB, and the unique
    (ts, event_id) prefix makes the extremum unambiguous, so no
    first()/last() partition-order nondeterminism anywhere. sum_value uses
    the decimal-exact dsum.

    Scale: a single groupBy((event_type, hour)) — partial aggregation
    (min/max/count/decimal-sum all have map-side combiners) means the
    shuffle carries one row per group per task, not the raw events. No
    window, no sort, no skew beyond group count; this is the shape that
    survives 100 TB unchanged."""
    ev = load_table(spark, sf_dir, "events")
    o_struct = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return (
        ev.groupBy(
            "event_type", F.window("ts", "1 hour").start.alias("bar_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(o_struct).getField("v").alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max(o_struct).getField("v").alias("close_value"),
            dsum("value").alias("sum_value"),
        )
    )


@register_query(
    "peak_concurrency_daily",
    oracle="""
    WITH marked AS (
        SELECT
            user_id, event_id, ts,
            CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_no, MIN(ts) AS s, MAX(ts) AS e
        FROM numbered GROUP BY user_id, session_no
    ),
    bounds AS (
        SELECT s AS ts, 1 AS delta, user_id, session_no FROM sessions
        UNION ALL
        SELECT e AS ts, -1 AS delta, user_id, session_no FROM sessions
    ),
    curve AS (
        SELECT ts,
               CAST(SUM(delta) OVER (
                   ORDER BY ts, delta DESC, user_id, session_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS concurrent
        FROM bounds
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           MAX(concurrent) AS peak_concurrency,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries
    FROM curve
    GROUP BY date_trunc('day', ts)
    """,
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent sessions — the interval sweep-line every
    capacity/billing/licensing report runs: sessionize (30-min gap, the
    sessionize_events logic), emit +1/-1 boundary events at each session's
    start/end (start sorts before end at the same instant: inclusive
    overlap), running-sum the deltas in global time order, and take each
    day's max over its boundary instants.

    Oracle-as-spec / plan-as-scale-path: the DuckDB oracle runs the NAIVE
    sweep — one global running sum, a single-partition window that dies at
    100 TB. The Spark plan computes the identical curve in two passes
    (the token_budget_select discipline): (1) net delta per HOUR bucket,
    whose tiny hour-level cumulative window yields each hour's carry-in
    offset; (2) a running sum WITHIN each hour (window partitioned by
    hour — parallel across hours) plus the broadcast offset. The hash
    match certifies the decomposition.

    Exactness: deltas are integers, ordering is the total key
    (ts, delta desc, user_id, session_no) — no floats, no ties, no
    partition-order dependence anywhere."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)) <= 1800,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    # one explode pass emits both boundaries (a union of two selects would
    # recompute the whole sessionize chain per branch); the cut materializes
    # the session-sized boundary list once for its two consumers below
    bounds = cut_lineage(
        sessions.select(
            "user_id",
            "session_no",
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("ts"), F.lit(1).alias("delta")),
                    F.struct(F.col("e").alias("ts"), F.lit(-1).alias("delta")),
                )
            ).alias("b"),
        ).select(
            F.col("b.ts").alias("ts"),
            F.col("b.delta").alias("delta"),
            "user_id",
            "session_no",
            F.date_trunc("hour", F.col("b.ts")).alias("hour"),
        )
    )
    # pass 1: hour-level carry-in offsets (|hours| rows — the tiny window)
    w_hours = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        bounds.groupBy("hour")
        .agg(F.sum("delta").alias("net"))
        .select(
            "hour", (F.sum("net").over(w_hours) - F.col("net")).alias("carry_in")
        )
    )
    # pass 2: per-hour running sum (parallel across hours) + carry-in
    w_in_hour = Window.partitionBy("hour").orderBy(
        "ts", F.desc("delta"), "user_id", "session_no"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = bounds.join(F.broadcast(offsets), "hour").select(
        "ts",
        (F.col("carry_in") + F.sum("delta").over(w_in_hour))
        .cast("bigint")
        .alias("concurrent"),
    )
    return curve.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.max("concurrent").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (round 8, continued)
# ---------------------------------------------------------------------------

# CUSUM tuning, expressed as integer ratios of the per-type mean so the
# whole statistic stays BIGINT: slack k = mean/2, alarm threshold
# h = 4*mean + 4 (the absolute +4-events guard keeps the sparse-count
# regime — hourly means << 1 — from alarming on Poisson noise).
_CUSUM_ALARM_NUM = 8  # relative term scaled by 2H: 4*(T/H) * 2H = 8*T
_CUSUM_ALARM_ABS = 8  # absolute term scaled by 2H: 4 events * 2H = 8*H


@register_query(
    "cusum_changepoint_events",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, h.hour_ts, COALESCE(c.n, 0) AS n
        FROM types t CROSS JOIN hours h
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
    ),
    tot AS (
        SELECT event_type, hour_ts, n,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS hh,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tt
        FROM grid
    ),
    pre AS (
        SELECT event_type, hour_ts, n, hh, tt,
               CAST(SUM(2 * hh * n - 3 * tt) OVER w AS BIGINT) AS pre_up,
               CAST(SUM(tt - 2 * hh * n) OVER w AS BIGINT) AS pre_dn
        FROM tot
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, hour_ts, n, hh, tt,
               pre_up - LEAST(CAST(0 AS BIGINT), MIN(pre_up) OVER w) AS s_up,
               pre_dn - LEAST(CAST(0 AS BIGINT), MIN(pre_dn) OVER w) AS s_dn
        FROM pre
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_ts, n AS n_events,
           CAST(s_up AS DOUBLE) / CAST(2 * hh AS DOUBLE) AS cusum_up,
           CAST(s_dn AS DOUBLE) / CAST(2 * hh AS DOUBLE) AS cusum_dn,
           CAST(CASE WHEN s_up > 8 * tt + 8 * hh THEN 1 ELSE 0 END AS INTEGER)
               AS alarm_up,
           CAST(CASE WHEN s_dn > 8 * tt + 8 * hh THEN 1 ELSE 0 END AS INTEGER)
               AS alarm_dn
    FROM s
    """,
)
def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detection over each event type's hourly
    volume: flag sustained level shifts up or down against the type's own
    long-run mean (target mu = T/H, slack k = mu/2, alarm at 4*mu + 4 —
    the absolute term guards the sparse regime where 4*mu is under one
    event). The
    classic recursive form S_i = max(0, S_{i-1} + (x_i - mu - k)) is NOT a
    SQL window aggregate, but it has a closed form the planner CAN run:
    S_i = prefix_i - min(0, min_{j<=i} prefix_j) — one running sum plus one
    running min, both embarrassingly parallel across event types. The
    reference engine has no analog (its only clock is the processing-time
    ticker, /root/reference/topic_processor.go:193); this is the volume
    drift monitor a 100 TB ingest pipeline runs per source.

    Cross-engine exactness: hourly counts are integers; multiplying the
    deviation through by 2H makes slack and mean exact integers too
    (D_up = 2*H*n - 3*T, D_dn = T - 2*H*n), so prefix sums, running mins
    and alarm predicates are PURE BIGINT; the exposed cusum_* columns are
    single exact-int double divisions. Magnitude: |D| <= ~2*H*T, prefix
    <= H*max|D| — at 1e5 hours x 1e9 rows/hour this approaches int64 range;
    the documented escape is decimal(38,0) prefixes (SCALING.md).

    Scale: the zero-filled spine is |types| x |hours| — tiny relative to
    the event scan that feeds it (the only data-sized stage is the hourly
    partial-agg groupBy). Windows partition by event_type: parallel across
    types, sequential only within a type's hour curve, which is bounded by
    calendar time, not data volume."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        types.crossJoin(hours)
        .join(counts, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )
    w_type = Window.partitionBy("event_type")
    tot = grid.select(
        "event_type",
        "hour_ts",
        "n",
        F.count(F.lit(1)).over(w_type).cast("long").alias("hh"),
        F.sum("n").over(w_type).cast("long").alias("tt"),
    )
    w_run = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = tot.select(
        "event_type",
        "hour_ts",
        "n",
        "hh",
        "tt",
        F.sum(2 * F.col("hh") * F.col("n") - 3 * F.col("tt"))
        .over(w_run)
        .cast("long")
        .alias("pre_up"),
        F.sum(F.col("tt") - 2 * F.col("hh") * F.col("n"))
        .over(w_run)
        .cast("long")
        .alias("pre_dn"),
    )
    zero = F.lit(0).cast("long")
    s = pre.select(
        "event_type",
        "hour_ts",
        "n",
        "hh",
        "tt",
        (F.col("pre_up") - F.least(zero, F.min("pre_up").over(w_run))).alias("s_up"),
        (F.col("pre_dn") - F.least(zero, F.min("pre_dn").over(w_run))).alias("s_dn"),
    )
    return s.select(
        "event_type",
        "hour_ts",
        F.col("n").alias("n_events"),
        (F.col("s_up").cast("double") / (2 * F.col("hh")).cast("double")).alias(
            "cusum_up"
        ),
        (F.col("s_dn").cast("double") / (2 * F.col("hh")).cast("double")).alias(
            "cusum_dn"
        ),
        (F.col("s_up") > _CUSUM_ALARM_NUM * F.col("tt") + _CUSUM_ALARM_ABS * F.col("hh"))
        .cast("int")
        .alias("alarm_up"),
        (F.col("s_dn") > _CUSUM_ALARM_NUM * F.col("tt") + _CUSUM_ALARM_ABS * F.col("hh"))
        .cast("int")
        .alias("alarm_dn"),
    )


@register_query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
               AS n_from_prev,
           CAST(n_trans AS DOUBLE)
               / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
               AS p_trans
    FROM trans
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    P(next_type | prev_type) estimated from every consecutive event pair in
    each user's (ts, event_id)-ordered history. The behavioral-model
    building block for session simulation, anomaly scoring (improbable
    transitions), and funnel-drop analysis; the reference has no ordered
    per-key iteration at all (its callback sees one message at a time,
    /root/reference/topic_processor.go:219-232).

    Exactness: transition counts are integers from a deterministic
    (ts, event_id) order (unique tiebreak), row totals are window sums of
    those integers, and p_trans is a single exact-int double division —
    bit-identical on any engine or partitioning.

    Scale: one shuffle on user_id for the lag window (parallel across
    users, per-user rows bounded), then a partial-agg groupBy that
    collapses to a |types|^2 grid map-side; the probability window runs on
    that tiny grid. Nothing downstream of the first aggregation scales
    with data volume."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_prev = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.sum("n_trans").over(w_prev).cast("long").alias("n_from_prev"),
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(w_prev).cast("double")
        ).alias("p_trans"),
    )


# fixed-target CUSUM over per-user spend: constants are part of the query
# contract (a monitoring rule), so the streaming twin needs no global pass
_UCUSUM_TARGET = 5000  # cents: the per-event spend target (~ the corpus mean)
_UCUSUM_SLACK = 1000  # cents: slack k — drift below target+k never alarms
_UCUSUM_THRESH = 30_000  # cents: cumulative excess that trips the alarm


@register_query(
    "cusum_user_spend_alarm",
    oracle=f"""
    WITH cents AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    pre AS (
        SELECT user_id, event_id, ts, cents,
               CAST(SUM(cents - {_UCUSUM_TARGET} - {_UCUSUM_SLACK}) OVER w
                    AS BIGINT) AS prefix
        FROM cents
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT user_id, event_id, ts, cents,
               prefix - LEAST(CAST(0 AS BIGINT), MIN(prefix) OVER w) AS excess
        FROM pre
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts, cents, excess
    FROM s WHERE excess > {_UCUSUM_THRESH}
    """,
)
def cusum_user_spend_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-target CUSUM alarm per user: flag every event at which the
    user's cumulative spend excess over a FIXED budget rule (target 50.00
    + slack 10.00 per event, alarm past 300.00 of sustained excess) is
    tripped — the fraud/abuse-monitoring shape, where the rule is fixed
    up front so it can run AT INGEST with no global statistics pass
    (streaming_cusum_twin carries exactly two BIGINTs per user). Same
    closed form as cusum_changepoint_events (S_i = prefix_i - min(0,
    running_min prefix)); everything stays BIGINT cents end-to-end —
    there is not a single floating-point operation in this query.

    Scale: one user_id shuffle, two window passes over each user's
    bounded history, alarms are a tiny fraction of events."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = ev.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.sum(F.col("cents") - _UCUSUM_TARGET - _UCUSUM_SLACK)
        .over(w)
        .cast("long")
        .alias("prefix"),
    )
    zero = F.lit(0).cast("long")
    s = pre.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        (F.col("prefix") - F.least(zero, F.min("prefix").over(w))).alias("excess"),
    )
    return s.filter(F.col("excess") > _UCUSUM_THRESH)


_MKV_BOTTOMK = 50  # surfaced least-probable transitions


@register_query(
    "markov_transition_anomaly",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    probs AS (
        SELECT prev_type, next_type, n_trans,
               CAST(n_trans AS DOUBLE)
                   / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
                   AS p_trans
        FROM trans
    )
    SELECT user_id, event_id, ts, prev_type, next_type, n_trans, p_trans,
           rank
    FROM (
        SELECT s.user_id, s.event_id, s.ts, s.prev_type,
               s.event_type AS next_type, p.n_trans, p.p_trans,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY p.p_trans ASC, s.event_id ASC
               ) AS BIGINT) AS rank
        FROM seq s
        JOIN probs p
          ON s.prev_type = p.prev_type AND s.event_type = p.next_type
    )
    WHERE rank <= {_MKV_BOTTOMK}
    """,
)
def markov_transition_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-APPLY over the Markov matrix: score every observed transition
    with its own corpus-estimated probability and surface the bottom-50
    least-probable ones — sequence-anomaly detection (improbable
    state jumps: bot behavior, broken funnels, session hijacks) done
    entirely in-engine: the model is fit and applied in one plan.

    Exactness: p_trans values are exact-int divisions (markov_event_
    transitions discipline); the global bottom-k orders by (p_trans,
    event_id) — a deterministic total order.

    Scale: the matrix is |types|^2 rows — broadcast back onto the event
    stream, so scoring is map-side after the one user_id shuffle the lag
    needs; the global bottom-50 is a rank-1 window (WindowGroupLimit /
    TakeOrderedAndProject shape, per-partition state bounded by k)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    w_prev = Window.partitionBy("prev_type")
    probs = trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(w_prev).cast("double")
        ).alias("p_trans"),
    )
    scored = seq.join(F.broadcast(probs), ["prev_type", "next_type"])
    w_rank = Window.orderBy(F.asc("p_trans"), F.asc("event_id"))
    return (
        scored.select(
            "user_id",
            "event_id",
            "ts",
            "prev_type",
            "next_type",
            "n_trans",
            "p_trans",
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= _MKV_BOTTOMK)
    )


_MKV_POWER_ITERS = 16  # stationary-distribution power-iteration rounds


def _markov_stationary_oracle_sql(iters: int = _MKV_POWER_ITERS) -> str:
    """Unrolled power-iteration oracle (the PageRank discipline): the same
    fitted matrix, the same start vector, the same per-round decimal-exact
    contraction — one CTE per iteration."""
    head = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    probs AS (
        SELECT prev_type, next_type,
               CAST(n_trans AS DOUBLE)
                   / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
                   AS p_trans
        FROM trans
    ),
    states AS (SELECT DISTINCT event_type AS state FROM events),
    it0 AS (
        SELECT state,
               CAST(1.0 AS DOUBLE)
                   / (SELECT CAST(COUNT(*) AS BIGINT) FROM states) AS p
        FROM states
    )"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    it{i} AS (
        SELECT pr.next_type AS state,
               CAST(SUM(CAST(i.p * pr.p_trans AS DECIMAL(30,12))) AS DOUBLE)
                   AS p
        FROM it{i - 1} i JOIN probs pr ON pr.prev_type = i.state
        GROUP BY pr.next_type
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT state, p AS stationary_p FROM it{iters}
    """
    )


@register_query(
    "markov_stationary_distribution", oracle=_markov_stationary_oracle_sql()
)
def markov_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run state occupancy of the fitted event-type Markov chain:
    16 synchronous power-iteration rounds pi <- pi P from the uniform
    start — 'what share of a user's steady-state activity is purchases'
    — the fourth ITERATIVE operator (after CC, PageRank, power iteration)
    and like them hash-exact against an UNROLLED SQL oracle despite a
    float fixpoint.

    Per-round determinism: each term pi_i * P_ij is one double multiply of
    identically-derived doubles, rounded once into DECIMAL(30,12); the
    per-state contraction sums decimals (order-independent); the collected
    pi re-enters the next round as float literals — bit-equal on both
    engines by induction.

    Scale: the matrix is |types|^2 rows — the fit is the
    markov_event_transitions plan (one user_id shuffle, partial-agg
    collapse); every iteration is a |S|-element map over the broadcast
    matrix with driver state O(|S|) doubles (the embedding_power_iteration
    rule: state is model-sized, never data-sized)."""
    probs = markov_event_transitions(spark, sf_dir).select(
        "prev_type", "next_type", "p_trans"
    )
    # materialize the tiny fitted matrix once (|types|^2 rows): the 16
    # iteration jobs must not each re-fit it, and localCheckpoint is
    # ContextCleaner-managed (the persist-discipline lint forbids pinned
    # cache() entries outliving a query)
    probs = probs.localCheckpoint()
    states = sorted(
        r["prev_type"] for r in probs.select("prev_type").distinct().collect()
    )
    pi = {s: 1.0 / len(states) for s in states}

    def step(pi_now: dict) -> DataFrame:
        mp = F.create_map(
            *[x for s, p in sorted(pi_now.items()) for x in (F.lit(s), F.lit(p))]
        )
        return (
            probs.select(
                F.col("next_type").alias("state"),
                (mp[F.col("prev_type")] * F.col("p_trans"))
                .cast("decimal(30,12)")
                .alias("t"),
            )
            .groupBy("state")
            .agg(F.sum("t").cast("double").alias("p"))
        )

    for _ in range(_MKV_POWER_ITERS - 1):
        pi = {r["state"]: r["p"] for r in step(pi).collect()}
    return step(pi).select("state", F.col("p").alias("stationary_p"))


@register_query(
    "markov_session_transitions",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    ),
    seq AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id, session_no ORDER BY ts, event_id
               ) AS prev_type
        FROM numbered
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
               AS n_from_prev,
           CAST(n_trans AS DOUBLE)
               / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
               AS p_trans
    FROM trans
    """,
)
def markov_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-SCOPED Markov transition matrix: consecutive pairs are
    counted only within a 30-minute-gap session (the sessionize_events
    islands), so an overnight gap between a purchase and next week's view
    is not a 'transition' — the behaviorally honest fit the global matrix
    (markov_event_transitions) approximates. Comparing the two matrices
    quantifies how much cross-session noise the global fit carries.

    Scale: the session numbering, the lag, and the grouping all run on
    ONE user_id shuffle (session_no partitioning is a refinement of
    user_id, so no second exchange); the matrix grid is |types|^2."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_user))
            <= 1800,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_no"),
    )
    w_sess = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    seq = numbered.select(
        "event_type", F.lag("event_type").over(w_sess).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_prev = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.sum("n_trans").over(w_prev).cast("long").alias("n_from_prev"),
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(w_prev).cast("double")
        ).alias("p_trans"),
    )


@register_query(
    "interarrival_quantiles_by_type",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY event_type, user_id
                                       ORDER BY ts, event_id),
                         ts) AS gap
        FROM events
        QUALIFY gap IS NOT NULL
    ),
    hist AS (
        SELECT event_type, gap, CAST(COUNT(*) AS BIGINT) AS c
        FROM gaps GROUP BY event_type, gap
    ),
    cum AS (
        SELECT event_type, gap,
               CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY gap
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM hist
    ),
    qs AS (
        SELECT * FROM (VALUES (0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100))
            AS t(q, num, den)
    )
    SELECT c.event_type, q.q, c.n AS n_gaps,
           MIN(c.gap) AS gap_sec
    FROM cum c JOIN qs q ON c.cum >= (c.n * q.num + q.den - 1) // q.den
    GROUP BY c.event_type, q.q, c.n
    """,
)
def interarrival_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of per-user inter-arrival gaps for each event
    type — the latency-distribution readout capacity planning and
    anomaly-threshold tuning start from — without sorting events: the
    sort-free value-histogram selection (exact_quantiles_histogram) over
    a DERIVED measure (lag gaps in whole seconds). Discrete lower-quantile
    selection keeps every step integer: rank r = ceil(q*n) is
    (n*num + den - 1) div den for rational q, the bracketing value is the
    first histogram entry whose cumulative count reaches r, and no
    floating-point arithmetic exists anywhere in the query (the q column
    is a literal label).

    Scale: the gap computation rides the (event_type, user_id) window
    shuffle; the histogram collapses to (type, distinct gap) map-side;
    the rank lookup joins a 3-row broadcast against the cumulative grid
    (bounded by the gap domain, not data volume)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias(
            "gap"
        ),
    ).filter(F.col("gap").isNotNull())
    hist = gaps.groupBy("event_type", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return gap_quantiles_from_hist(spark, hist)


def gap_quantiles_from_hist(spark: SparkSession, hist: DataFrame) -> DataFrame:
    """The rank-selection tail of interarrival_quantiles_by_type over an
    (event_type, gap, c) histogram - shared by the batch plan and the
    ingest twin (whose per-batch partial counts sum to the same histogram
    exactly, so this tail certifies both)."""
    from pyspark.sql.window import Window

    w_run = Window.partitionBy("event_type").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_type = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "gap",
        F.sum("c").over(w_run).cast("long").alias("cum"),
        F.sum("c").over(w_type).cast("long").alias("n"),
    )
    qs = spark.createDataFrame(
        [(0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100)], "q double, num long, den long"
    )
    return (
        cum.join(
            F.broadcast(qs),
            F.col("cum") >= F.expr("(n * num + den - 1) div den"),
        )
        .groupBy("event_type", "q", F.col("n").alias("n_gaps"))
        .agg(F.min("gap").alias("gap_sec"))
        .select("event_type", "q", "n_gaps", "gap_sec")
    )


@register_query(
    "seasonality_hourly_profile",
    oracle="""
    WITH counts AS (
        SELECT event_type,
               CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type, date_part('hour', ts)
    )
    SELECT event_type, hour_of_day, n_events,
           CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_type,
           CAST(n_events * 24 AS DOUBLE)
               / CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DOUBLE)
               AS seasonality_index
    FROM counts
    """,
)
def seasonality_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type: the share of each type's
    traffic landing in each clock hour, normalized so a flat profile reads
    1.0 everywhere (index = 24 * share). The baseline every volume-anomaly
    rule should divide out before alarming — feeding cusum_changepoint_
    events a deseasonalized series kills the daily-cycle false positives.

    Exactness: counts are integers and the index is one exact-int double
    division of n*24 by the type total. Scale: one partial-agg groupBy to
    a |types| x 24 grid; the window runs on the grid."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.sum("n_events").over(w).cast("long").alias("n_type"),
        (
            (F.col("n_events") * 24).cast("double")
            / F.sum("n_events").over(w).cast("double")
        ).alias("seasonality_index"),
    )


@register_query(
    "dq_freshness_by_type",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               MAX(ts) AS latest_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    ),
    gmax AS (SELECT MAX(ts) AS global_max FROM events)
    SELECT p.event_type, p.latest_ts, p.n_events,
           CAST(date_diff('second', p.latest_ts, g.global_max) AS BIGINT)
               AS staleness_sec,
           CAST(CASE WHEN date_diff('second', p.latest_ts, g.global_max)
                          > 86400 THEN 1 ELSE 0 END AS INTEGER) AS stale_24h
    FROM per_type p CROSS JOIN gmax g
    """,
)
def dq_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness audit: per event type, the latest event time, its
    staleness behind the freshest feed in whole seconds, and a stale-24h
    flag — the first data-quality page an on-call checks when a producer
    silently dies (the reference's consumer-lag gauge sees offsets, not
    event time; this is the event-time complement).

    Exactness: MAX of timestamps is exact, the staleness is a whole-second
    boundary count (identical truncation on both engines), the flag is an
    integer comparison. Scale: one partial-agg groupBy to |types| rows and
    a 1-row global-max broadcast."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    glob = ev.agg(F.max("ts").alias("global_max"))
    stale = F.col("global_max").cast("long") - F.col("latest_ts").cast("long")
    return per_type.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "latest_ts",
        "n_events",
        stale.alias("staleness_sec"),
        (stale > 86400).cast("int").alias("stale_24h"),
    )


@register_query(
    "cusum_deseasonalized_events",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, h.hour_ts, COALESCE(c.n, 0) AS n,
               CAST(date_part('hour', h.hour_ts) AS BIGINT) AS hod
        FROM types t CROSS JOIN hours h
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
    ),
    season AS (
        SELECT event_type, hod, CAST(SUM(n) AS BIGINT) AS c_hod
        FROM grid GROUP BY event_type, hod
    ),
    tot AS (
        SELECT g.event_type, g.hour_ts, g.n, s.c_hod,
               CAST(COUNT(*) OVER (PARTITION BY g.event_type) AS BIGINT) AS hh,
               CAST(SUM(g.n) OVER (PARTITION BY g.event_type) AS BIGINT) AS tt
        FROM grid g JOIN season s
          ON s.event_type = g.event_type AND s.hod = g.hod
    ),
    devs AS (
        SELECT event_type, hour_ts, n, hh, tt,
               CASE WHEN c_hod = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(n * tt AS DOUBLE)
                         / CAST(24 * c_hod AS DOUBLE) END AS v,
               CAST((CASE WHEN c_hod = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(n * tt AS DOUBLE)
                         / CAST(24 * c_hod AS DOUBLE) END)
                    - 1.5 * (CAST(tt AS DOUBLE) / CAST(hh AS DOUBLE))
                    AS DECIMAL(30,12)) AS d_up,
               -- the down deviation is 0.5*mu - v (slack SUBTRACTS on the
               -- down side; negating d_up would add it and drift upward)
               CAST(0.5 * (CAST(tt AS DOUBLE) / CAST(hh AS DOUBLE))
                    - (CASE WHEN c_hod = 0 THEN CAST(0.0 AS DOUBLE)
                       ELSE CAST(n * tt AS DOUBLE)
                            / CAST(24 * c_hod AS DOUBLE) END)
                    AS DECIMAL(30,12)) AS d_dn
        FROM tot
    ),
    pre AS (
        SELECT event_type, hour_ts, n, hh, tt, v,
               CAST(SUM(d_up) OVER w AS DECIMAL(30,12)) AS pre_up,
               CAST(SUM(d_dn) OVER w AS DECIMAL(30,12)) AS pre_dn
        FROM devs
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, hour_ts, n, hh, tt, v,
               -- CASE, not LEAST: DuckDB's LEAST(decimal, windowed min)
               -- promotes to DOUBLE and loses the exact-decimal discipline
               CAST(pre_up - (CASE WHEN MIN(pre_up) OVER w < 0
                                   THEN MIN(pre_up) OVER w
                                   ELSE CAST(0 AS DECIMAL(30,12)) END)
                    AS DOUBLE) AS s_up,
               CAST(pre_dn - (CASE WHEN MIN(pre_dn) OVER w < 0
                                   THEN MIN(pre_dn) OVER w
                                   ELSE CAST(0 AS DECIMAL(30,12)) END)
                    AS DOUBLE) AS s_dn
        FROM pre
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_ts, n AS n_events, v AS deseasonalized,
           s_up AS cusum_up, s_dn AS cusum_dn,
           CAST(CASE WHEN s_up > 4.0 * (CAST(tt AS DOUBLE) / CAST(hh AS DOUBLE))
                          + 4.0 THEN 1 ELSE 0 END AS INTEGER) AS alarm_up,
           CAST(CASE WHEN s_dn > 4.0 * (CAST(tt AS DOUBLE) / CAST(hh AS DOUBLE))
                          + 4.0 THEN 1 ELSE 0 END AS INTEGER) AS alarm_dn
    FROM s
    """,
)
def cusum_deseasonalized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the DESEASONALIZED hourly series:
    each hour's count is divided by its clock-hour seasonality index
    (v = n*T / (24*c_hod) — the seasonality_hourly_profile baseline),
    which removes the daily cycle before the drift test, the false-positive
    fix the raw detector (cusum_changepoint_events) needs on strongly
    diurnal feeds. A pleasant identity keeps the target honest:
    deseasonalization PRESERVES the type total (sum of v over a full day's
    hours = T/24 per clock hour), so mu = T/H is unchanged.

    Exactness discipline for the now-fractional series: each hour's
    deviation v - 1.5*mu is a tree of exact-int divisions and one
    subtraction (identically rounded doubles), rounded ONCE into
    decimal(30,12); prefix sums and running mins stay in decimal
    (order-independent), and the exported statistics are single
    decimal->double conversions. The closed form is the same
    prefix - min(0, running min) identity.

    Scale: identical shape to cusum_changepoint_events plus one
    |types| x 24 seasonality join on the grid."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        types.crossJoin(hours)
        .join(counts, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.hour("hour_ts").cast("long").alias("hod"),
        )
    )
    season = grid.groupBy("event_type", "hod").agg(
        F.sum("n").cast("long").alias("c_hod")
    )
    w_type = Window.partitionBy("event_type")
    tot = grid.join(F.broadcast(season), ["event_type", "hod"]).select(
        "event_type",
        "hour_ts",
        "n",
        "c_hod",
        F.count(F.lit(1)).over(w_type).cast("long").alias("hh"),
        F.sum("n").over(w_type).cast("long").alias("tt"),
    )
    v = F.when(F.col("c_hod") == 0, F.lit(0.0)).otherwise(
        (F.col("n") * F.col("tt")).cast("double")
        / (24 * F.col("c_hod")).cast("double")
    )
    mu = F.col("tt").cast("double") / F.col("hh").cast("double")
    d_up = (v - 1.5 * mu).cast("decimal(30,12)")
    # down deviation: 0.5*mu - v (slack subtracts on the down side)
    d_dn = (0.5 * mu - v).cast("decimal(30,12)")
    devs = tot.select(
        "event_type",
        "hour_ts",
        "n",
        "hh",
        "tt",
        v.alias("v"),
        d_up.alias("d_up"),
        d_dn.alias("d_dn"),
    )
    w_run = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = devs.select(
        "event_type",
        "hour_ts",
        "n",
        "hh",
        "tt",
        "v",
        F.sum("d_up").over(w_run).cast("decimal(30,12)").alias("pre_up"),
        F.sum("d_dn").over(w_run).cast("decimal(30,12)").alias("pre_dn"),
    )
    zero = F.lit(0).cast("decimal(30,12)")
    s = pre.select(
        "event_type",
        "hour_ts",
        "n",
        "hh",
        "tt",
        "v",
        (
            F.col("pre_up")
            - F.when(F.min("pre_up").over(w_run) < 0, F.min("pre_up").over(w_run))
            .otherwise(zero)
        )
        .cast("double")
        .alias("s_up"),
        (
            F.col("pre_dn")
            - F.when(F.min("pre_dn").over(w_run) < 0, F.min("pre_dn").over(w_run))
            .otherwise(zero)
        )
        .cast("double")
        .alias("s_dn"),
    )
    thresh = 4.0 * mu + 4.0
    return s.select(
        "event_type",
        "hour_ts",
        F.col("n").alias("n_events"),
        F.col("v").alias("deseasonalized"),
        F.col("s_up").alias("cusum_up"),
        F.col("s_dn").alias("cusum_dn"),
        (F.col("s_up") > thresh).cast("int").alias("alarm_up"),
        (F.col("s_dn") > thresh).cast("int").alias("alarm_dn"),
    )


@register_query(
    "session_duration_quantiles",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    ),
    durs AS (
        SELECT CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur
        FROM numbered GROUP BY user_id, session_no
    ),
    hist AS (
        SELECT dur, CAST(COUNT(*) AS BIGINT) AS c FROM durs GROUP BY dur
    ),
    cum AS (
        SELECT dur,
               CAST(SUM(c) OVER (ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM hist
    ),
    qs AS (
        SELECT * FROM (VALUES (0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100))
            AS t(q, num, den)
    )
    SELECT q.q, c.n AS n_sessions, MIN(c.dur) AS duration_sec
    FROM cum c JOIN qs q ON c.cum >= (c.n * q.num + q.den - 1) // q.den
    GROUP BY q.q, c.n
    """,
)
def session_duration_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of session durations — the engagement readout
    product analytics serves next to the funnel — composed from the
    certified sessionization (gaps-and-islands) and the sort-free
    value-histogram rank selection (discrete lower quantiles, pure
    integer ranks). Nothing sorts sessions: the histogram collapses to
    distinct whole-second durations and the 3-row rank lookup joins
    broadcast.

    Scale: sessionize's one user_id shuffle + a duration-domain-sized
    histogram; the global cumulative window runs over distinct durations,
    not sessions."""
    from pyspark.sql.window import Window

    durs = sessionize_events(spark, sf_dir).select(
        F.col("duration_sec").alias("dur")
    )
    hist = durs.groupBy("dur").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "dur",
        F.sum("c").over(w_run).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    qs = spark.createDataFrame(
        [(0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100)], "q double, num long, den long"
    )
    return (
        cum.join(
            F.broadcast(qs),
            F.col("cum") >= F.expr("(n * num + den - 1) div den"),
        )
        .groupBy("q", F.col("n").alias("n_sessions"))
        .agg(F.min("dur").alias("duration_sec"))
        .select("q", "n_sessions", "duration_sec")
    )


# ---------------------------------------------------------------------------
# Session turn structure (round 9): the conversation-threading primitive
# ---------------------------------------------------------------------------


@register_query(
    "session_turn_structure",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    ),
    turn_marked AS (
        SELECT user_id, session_no, ts, event_id, event_type,
               CASE WHEN event_type = LAG(event_type) OVER s
                    THEN 0 ELSE 1 END AS new_turn
        FROM numbered
        WINDOW s AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)
    ),
    turn_numbered AS (
        SELECT user_id, session_no, event_type,
               CAST(SUM(new_turn) OVER (
                   PARTITION BY user_id, session_no ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS turn_no
        FROM turn_marked
    ),
    runs AS (
        SELECT user_id, session_no, turn_no,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM turn_numbered
        GROUP BY user_id, session_no, turn_no
    )
    SELECT user_id, session_no,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(MAX(run_len) AS BIGINT) AS max_run_len,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(run_len) AS DOUBLE)
               AS turn_ratio
    FROM runs
    GROUP BY user_id, session_no
    """,
)
def session_turn_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TURN structure inside each session — the conversation-threading
    primitive an instruction-data pipeline runs before packing dialogs: a
    "turn" is a maximal run of consecutive same-type events (consecutive
    same-role messages get merged into one turn), and the per-session
    audit reports event count, turn count, the longest single-type run
    (a run of 40 'error' rows is a stuck client, and a dialog where one
    role speaks 40 times in a row is broken), and the turn/event collapse
    ratio. Double run-length encoding: gaps-and-islands for the 30-minute
    session boundary (sessionize_events' exact rule), then gaps-and-
    islands AGAIN inside the session for the type-change boundary.

    Scale: every window is PARTITION BY user_id (or (user_id, session_no),
    a refinement of it) — ONE hash-partition by user serves the session
    numbering, the turn numbering, and both aggregations; nothing global,
    no self-join. The turn_ratio is one exact-int double division."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
            <= 1800,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_no"),
    )
    s_w = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    turn_marked = numbered.select(
        "user_id",
        "session_no",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == F.lag("event_type").over(s_w), 0)
        .otherwise(1)
        .alias("new_turn"),
    )
    turn_numbered = turn_marked.select(
        "user_id",
        "session_no",
        F.sum("new_turn")
        .over(s_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("turn_no"),
    )
    runs = turn_numbered.groupBy("user_id", "session_no", "turn_no").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return runs.groupBy("user_id", "session_no").agg(
        F.sum("run_len").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max("run_len").cast("long").alias("max_run_len"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("run_len").cast("double")
        ).alias("turn_ratio"),
    )


@register_query(
    "session_path_topk",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    ),
    turn_marked AS (
        SELECT user_id, session_no, ts, event_id, event_type,
               CASE WHEN event_type = LAG(event_type) OVER s
                    THEN 0 ELSE 1 END AS new_turn
        FROM numbered
        WINDOW s AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)
    ),
    turn_numbered AS (
        SELECT user_id, session_no, event_type,
               CAST(SUM(new_turn) OVER (
                   PARTITION BY user_id, session_no ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS turn_no
        FROM turn_marked
    ),
    turns AS (
        SELECT user_id, session_no, turn_no, MIN(event_type) AS ttype
        FROM turn_numbered
        GROUP BY user_id, session_no, turn_no
    ),
    paths AS (
        SELECT user_id, session_no,
               array_to_string(list_slice(
                   list(ttype ORDER BY turn_no), 1, 3), '>') AS path
        FROM turns
        GROUP BY user_id, session_no
    ),
    counted AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
    )
    SELECT path, n_sessions, rank FROM (
        SELECT path, n_sessions,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
        FROM counted
    ) WHERE rank <= 20
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATH MINING over session openings: the top-20 most common
    first-three-TURN paths (turn = maximal same-type run, the
    session_turn_structure RLE) — "view > click > purchase" vs
    "error > error" is how a product or agent-behavior analyst reads what
    sessions actually do, and for dialog data it is the opening-move
    distribution an instruction-tuning curator balances. Paths use turns,
    not raw events, so a 40-click burst reads as one step.

    Scale: the turn pipeline's single user_id hash-partition; path
    assembly is a per-session ordered collect of <= 3 turn types; the
    final count + top-k runs over |distinct paths| rows — bounded by the
    type-alphabet combinatorics (here <= 5 + 5·4 + 5·4·4 = 105), a
    domain-sized window, not a corpus-sized one."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
            <= 1800,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_no"),
    )
    s_w = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    turn_numbered = numbered.select(
        "user_id",
        "session_no",
        "event_type",
        F.sum(
            F.when(
                F.col("event_type") == F.lag("event_type").over(s_w), 0
            ).otherwise(1)
        )
        .over(s_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("turn_no"),
    )
    turns = turn_numbered.groupBy("user_id", "session_no", "turn_no").agg(
        F.min("event_type").alias("ttype")
    )
    paths = turns.groupBy("user_id", "session_no").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_no", "ttype"))),
                    lambda s: s["ttype"],
                ),
                1,
                3,
            ),
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counted.select(
            "path",
            "n_sessions",
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 20)
    )


@register_query(
    "stl_decompose_hourly",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, h.hour_ts, COALESCE(c.n, 0) AS n
        FROM types t CROSS JOIN hours h
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
    ),
    trended AS (
        SELECT event_type, hour_ts, n,
               CAST(SUM(n) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
        FROM grid
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seasoned AS (
        SELECT event_type, hour_ts, n, trend,
               (CAST(SUM(n) OVER hod AS DOUBLE)
                    / CAST(COUNT(*) OVER hod AS DOUBLE))
               - (CAST(SUM(n) OVER alltype AS DOUBLE)
                    / CAST(COUNT(*) OVER alltype AS DOUBLE)) AS seasonal
        FROM trended
        WINDOW hod AS (PARTITION BY event_type, EXTRACT(hour FROM hour_ts)),
               alltype AS (PARTITION BY event_type)
    )
    SELECT event_type, hour_ts, n AS n_events, trend, seasonal,
           (CAST(n AS DOUBLE) - trend) - seasonal AS residual
    FROM seasoned
    """,
)
def stl_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-LITE decomposition of each type's hourly volume curve:
    trend (centered 25-hour moving average over the zero-filled grid) +
    seasonal (hour-of-day mean minus the type's grand mean — the additive
    seasonality index) + residual (what the anomaly detectors should be
    looking at: CUSUM/EWMA on raw counts confound trend shifts with
    seasonal swings; on this residual they see only genuine surprises).
    Completes the event-model tier's decomposition story — seasonality_
    hourly_profile exposes the seasonal component alone; this op exposes
    all three.

    Cross-engine exactness: counts are BIGINT on the gap-filled grid;
    trend and both means are single exact-int divisions (IEEE-identical);
    seasonal is one subtraction of two such doubles and residual one more
    — identical expression trees, no float accumulation anywhere.

    Scale: the cusum_changepoint_events grid discipline — the only
    data-sized stage is the hourly partial-agg groupBy; every window
    partitions by event_type (or (type, hour-of-day)), so work is
    parallel across types and bounded by calendar length within one."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        types.crossJoin(hours)
        .join(counts, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )
    w_ma = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-12, 12)
    )
    trended = grid.select(
        "event_type",
        "hour_ts",
        "n",
        (
            F.sum("n").over(w_ma).cast("double")
            / F.count(F.lit(1)).over(w_ma).cast("double")
        ).alias("trend"),
    )
    w_hod = Window.partitionBy("event_type", F.hour("hour_ts"))
    w_all = Window.partitionBy("event_type")
    seasonal = (
        F.sum("n").over(w_hod).cast("double")
        / F.count(F.lit(1)).over(w_hod).cast("double")
    ) - (
        F.sum("n").over(w_all).cast("double")
        / F.count(F.lit(1)).over(w_all).cast("double")
    )
    seasoned = trended.select(
        "event_type", "hour_ts", "n", "trend", seasonal.alias("seasonal")
    )
    return seasoned.select(
        "event_type",
        "hour_ts",
        F.col("n").alias("n_events"),
        "trend",
        "seasonal",
        ((F.col("n").cast("double") - F.col("trend")) - F.col("seasonal")).alias(
            "residual"
        ),
    )


def _stl_anomaly_oracle() -> str:
    from kasper_spark.registry import ORACLES

    return f"""
    WITH stl AS ({ORACLES["stl_decompose_hourly"]})
    SELECT event_type, hour_ts, n_events, trend, seasonal, residual,
           residual / sqrt(trend + 1.0) AS poisson_score
    FROM stl
    WHERE abs(residual / sqrt(trend + 1.0)) > 4.0
    """


@register_query("stl_residual_anomalies", oracle=_stl_anomaly_oracle())
def stl_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decomposition's payoff: anomaly gating on the STL RESIDUAL,
    variance-normalized Poisson-style (counts have variance ~ mean, so
    score = residual / sqrt(trend + 1)) — a 4-sigma gate that cannot be
    tripped by a weekend dip or a steady ramp, because the trend and
    hour-of-day components were already subtracted. The composition
    complement of ewma_anomaly_events (trailing, causal, per-entity) for
    offline/backfill use where the centered window is available.

    Exactness: score = one double division of two deterministic doubles
    (residual is the stl op's one-expression value; sqrt is IEEE-correctly
    rounded); the gate compares that double to a literal.

    Scale: the stl plan plus a map-side filter — nothing new shuffles."""
    stl = stl_decompose_hourly(spark, sf_dir)
    score = F.col("residual") / F.sqrt(F.col("trend") + F.lit(1.0))
    return stl.select(
        "event_type",
        "hour_ts",
        "n_events",
        "trend",
        "seasonal",
        "residual",
        score.alias("poisson_score"),
    ).filter(F.abs(F.col("poisson_score")) > 4.0)


# ---------------------------------------------------------------------------
# Hourly autocorrelation (round 10)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 24


@register_query(
    "hourly_autocorrelation",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour_ts, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    grid AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY h.hour_ts) AS idx,
               CAST(COALESCE(a.x, 0) AS BIGINT) AS x
        FROM hours h LEFT JOIN agg a ON a.hour_ts = h.hour_ts
    ),
    stat AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
        FROM grid
    ),
    dev AS MATERIALIZED (
        SELECT idx, grid.x * stat.n - stat.s AS d FROM grid, stat
    ),
    den AS (SELECT CAST(SUM(d * d) AS BIGINT) AS den FROM dev),
    lags AS (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS lag_hours),
    num AS (
        SELECT l.lag_hours,
               CAST(SUM(a.d * b.d) AS BIGINT) AS num,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM lags l
        JOIN dev a ON true
        JOIN dev b ON b.idx = a.idx + l.lag_hours
        GROUP BY l.lag_hours
    )
    SELECT CAST(num.lag_hours AS BIGINT) AS lag_hours, num.n_pairs,
           CASE WHEN den.den = 0 THEN NULL
                ELSE CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
           END AS acf
    FROM num, den
    """,
)
def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the global hourly event-count series at lags
    1..{_ACF_MAX_LAG} — the diagnostic that tells a pipeline WHETHER a
    series is seasonal (and at what period) before it deseasonalizes:
    a daily cycle shows as the lag-24 peak; this is the measurement that
    justifies seasonality_hourly_profile / cusum_deseasonalized_events'
    24-hour assumption instead of hard-coding it. Standard full-series-
    mean ACF: r_L = sum_t (x_t - mean)(x_t+L - mean) / sum_t (x_t - mean)^2
    with denominators cleared by n: dev_t = n*x_t - S is exact BIGINT, the
    numerator/denominator are BIGINT sums of dev products, and r_L is ONE
    double division (constant series => den 0 => NULL). Overflow bound:
    dev^2 * hours < 2^63 holds while per-hour counts stay under ~10^7 at a
    year's grid; past that, pre-scale counts (x div 1000 — ACF is
    scale-invariant up to rounding) or shard by type.

    Scale shape: everything after the one partial-aggregated hourly
    count is GRID-sized (hours x lags, a function of the time range, not
    event volume): the dense spine, the 1-row (n, S) broadcast, the
    24-lag self-join — all bounded broadcasts (allow-listed), the gapfill
    /cusum spine discipline."""
    ev = load_table(spark, sf_dir, "events")
    counts = hourly_event_counts(ev)
    return acf_from_hourly_counts(spark, counts)


def hourly_event_counts(ev: DataFrame) -> DataFrame:
    """(hour_ts, x) hourly event counts — the mergeable sufficient
    statistic of the correlogram (integer counts sum across any partition
    of the input), shared by the batch ACF and its streaming twin."""
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )


def acf_from_hourly_counts(spark: SparkSession, agg: DataFrame) -> DataFrame:
    """The correlogram projection over merged hourly counts: densify to
    the [min, max] hour spine (absent hours are REAL zeros), clear the
    mean, and evaluate all lags — everything grid-sized."""
    from pyspark.sql.window import Window

    bounds = agg.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    grid = (
        hours.join(agg, "hour_ts", "left")
        .select(
            F.row_number().over(Window.orderBy("hour_ts")).alias("idx"),
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
        )
        .transform(cut_lineage)  # consumed by stat, den and both join sides
    )
    stat = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = grid.join(F.broadcast(stat)).select(
        "idx", (F.col("x") * F.col("n") - F.col("s")).alias("d")
    ).transform(cut_lineage)
    den = dev.agg(F.sum(F.col("d") * F.col("d")).cast("long").alias("den"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag_hours")
    )
    a = dev.select(F.col("idx").alias("a_idx"), F.col("d").alias("a_d"))
    b = dev.select(F.col("idx").alias("b_idx"), F.col("d").alias("b_d"))
    num = (
        a.join(F.broadcast(lags))
        .join(b, F.col("b_idx") == F.col("a_idx") + F.col("lag_hours"))
        .groupBy("lag_hours")
        .agg(
            F.sum(F.col("a_d") * F.col("b_d")).cast("long").alias("num"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    return num.join(F.broadcast(den)).select(
        "lag_hours",
        "n_pairs",
        F.when(F.col("den") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("num").cast("double") / F.col("den").cast("double"))
        .alias("acf"),
    )


# ---------------------------------------------------------------------------
# Anomaly-detector ensemble (round 10)
# ---------------------------------------------------------------------------


def _ensemble_oracle() -> str:
    from kasper_spark.registry import ORACLES

    return f"""
    WITH stl AS ({ORACLES["stl_decompose_hourly"]}),
    cus AS ({ORACLES["cusum_deseasonalized_events"]}),
    flags AS (
        SELECT s.event_type,
               CASE WHEN abs(s.residual / sqrt(s.trend + 1.0)) > 4.0
                    THEN 1 ELSE 0 END AS f_stl,
               CASE WHEN c.alarm_up = 1 OR c.alarm_dn = 1
                    THEN 1 ELSE 0 END AS f_cusum
        FROM stl s JOIN cus c
          ON c.event_type = s.event_type AND c.hour_ts = s.hour_ts
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(f_stl) AS BIGINT) AS n_stl_flagged,
           CAST(SUM(f_cusum) AS BIGINT) AS n_cusum_flagged,
           CAST(SUM(f_stl * f_cusum) AS BIGINT) AS n_both,
           CASE WHEN SUM(f_stl) + SUM(f_cusum) - SUM(f_stl * f_cusum) = 0
                THEN NULL
                ELSE CAST(SUM(f_stl * f_cusum) AS DOUBLE)
                     / CAST(SUM(f_stl) + SUM(f_cusum) - SUM(f_stl * f_cusum)
                            AS DOUBLE)
           END AS detector_jaccard
    FROM flags GROUP BY event_type
    """


@register_query("anomaly_ensemble_report", oracle=_ensemble_oracle())
def anomaly_ensemble_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-ensemble agreement audit — the composition that tells an
    on-call team WHICH anomaly detector to trust per event type: the
    STL-residual 4-sigma gate (offline, centered window) and the
    deseasonalized CUSUM (online, one-sided drift alarms) are run over
    the SAME hourly grid and their per-hour flags are cross-tabulated —
    per type: hours flagged by each, by both, and the detector Jaccard
    (NULL when neither fires; a low value on a type means the two are
    seeing DIFFERENT phenomena there and neither alone suffices). Both
    component plans are themselves hash-certified operators; this query
    certifies their COMPOSITION (the curation_pipeline_e2e discipline).

    Scale: the component plans share the hourly-grid discipline (one
    data-sized partial agg each, windows on the calendar-bounded grid);
    the ensemble join and cross-tab are grid-sized."""
    stl = stl_decompose_hourly(spark, sf_dir).select(
        "event_type",
        "hour_ts",
        (
            F.abs(
                F.col("residual") / F.sqrt(F.col("trend") + F.lit(1.0))
            )
            > 4.0
        )
        .cast("int")
        .alias("f_stl"),
    )
    cus = cusum_deseasonalized_events(spark, sf_dir).select(
        "event_type",
        "hour_ts",
        ((F.col("alarm_up") == 1) | (F.col("alarm_dn") == 1))
        .cast("int")
        .alias("f_cusum"),
    )
    flags = stl.join(cus, ["event_type", "hour_ts"])
    union_flags = (
        F.sum("f_stl") + F.sum("f_cusum") - F.sum(F.col("f_stl") * F.col("f_cusum"))
    )
    return flags.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("f_stl").cast("long").alias("n_stl_flagged"),
        F.sum("f_cusum").cast("long").alias("n_cusum_flagged"),
        F.sum(F.col("f_stl") * F.col("f_cusum")).cast("long").alias("n_both"),
        F.when(union_flags == 0, F.lit(None).cast("double"))
        .otherwise(
            F.sum(F.col("f_stl") * F.col("f_cusum")).cast("double")
            / union_flags.cast("double")
        )
        .alias("detector_jaccard"),
    )


@register_query(
    "conversion_latency_quantiles",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS first_purchase
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT CAST(date_diff('second', first_view, first_purchase) AS BIGINT)
                   AS lat
        FROM firsts
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    ),
    hist AS (
        SELECT lat, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY lat
    ),
    cum AS (
        SELECT lat,
               CAST(SUM(c) OVER (ORDER BY lat
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM hist
    ),
    qs AS (
        SELECT * FROM (VALUES (0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100))
            AS t(q, num, den)
    )
    SELECT q.q, c.n AS n_converted, MIN(c.lat) AS latency_sec
    FROM cum c JOIN qs q ON c.cum >= (c.n * q.num + q.den - 1) // q.den
    GROUP BY q.q, c.n
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of first-view -> first-purchase latency — the
    time-to-conversion readout growth teams track next to the funnel
    counts (funnel_view_click_purchase says HOW MANY convert; this says
    HOW FAST). Per user: the earliest view and earliest purchase from one
    conditional-min aggregate; users who purchased before ever viewing
    (direct-link buyers) are excluded, as are non-converters. Quantiles
    via the sort-free value-histogram rank method (discrete lower
    quantiles, ceil-rank r = (n*num + den - 1) div den in pure BIGINTs —
    the session_duration_quantiles discipline).

    Scale: one partial-aggregated conditional-min groupBy (users cross
    the shuffle once); the histogram collapses to distinct whole-second
    latencies and the 3-row rank lookup joins broadcast."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).cast("long").alias("lat")
    )
    hist = lat.groupBy("lat").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_run = Window.orderBy("lat").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "lat",
        F.sum("c").over(w_run).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    qs = spark.createDataFrame(
        [(0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100)], "q double, num long, den long"
    )
    return (
        cum.join(
            F.broadcast(qs),
            F.col("cum") >= F.expr("(n * num + den - 1) div den"),
        )
        .groupBy("q", F.col("n").alias("n_converted"))
        .agg(F.min("lat").alias("latency_sec"))
        .select("q", "n_converted", "latency_sec")
    )


# ---------------------------------------------------------------------------
# Forecast-baseline evaluation: seasonal-naive MASE (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "forecast_mase_seasonal_naive",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, hour_ts FROM types CROSS JOIN hours),
    agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT spine.event_type AS event_type, spine.hour_ts AS hour_ts,
               CAST(COALESCE(agg.n, 0) AS BIGINT) AS n
        FROM spine LEFT JOIN agg
          ON spine.event_type = agg.event_type
         AND spine.hour_ts = agg.hour_ts
    ),
    lagged AS (
        SELECT event_type, n,
               lag(n, 24) OVER (PARTITION BY event_type ORDER BY hour_ts)
                   AS f_seasonal,
               lag(n, 1) OVER (PARTITION BY event_type ORDER BY hour_ts)
                   AS f_naive
        FROM series
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours_scored,
           CAST(SUM(abs(n - f_seasonal)) AS BIGINT) AS sum_abs_err_seasonal,
           CAST(SUM(abs(n - f_naive)) AS BIGINT) AS sum_abs_err_naive,
           CAST(SUM(abs(n - f_seasonal)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mae_seasonal,
           CAST(SUM(abs(n - f_naive)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mae_naive,
           CAST(SUM(abs(n - f_seasonal)) AS DOUBLE)
             / CAST(NULLIF(SUM(abs(n - f_naive)), 0) AS DOUBLE) AS mase
    FROM lagged
    WHERE f_seasonal IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def forecast_mase_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation (MASE — Hyndman & Koehler 2006):
    score the 24-hour seasonal-naive forecast (y_hat_t = y_{t-24}) of
    hourly event counts against the random-walk naive (y_hat_t = y_{t-1})
    per event type. MASE < 1 means daily seasonality is real signal a
    forecaster should exploit; MASE >= 1 means the "same hour yesterday"
    rule beats nothing — the go/no-go gate run BEFORE anyone trains a
    forecast model on the stream. Complements the decomposition views
    (stl/ACF/seasonality-profile) with a proper out-of-sample-style error
    metric rather than a fit diagnostic.

    Determinism: counts are integers over the SAME zero-filled dense
    spine both engines build (gapfill's bounded types x hours cross
    join); absolute errors and their sums are exact BIGINTs; each
    double is a single cast-divide of exact integers. Scoring starts at
    hour 25 (both lags non-null there) so the two MAEs share one
    denominator and MASE reduces to the integer-sum ratio.

    Scale: the spine is types x hours (domain-sized, not data-sized);
    one partial-aggregated hourly groupBy over the corpus, one per-type
    window over spine rows, one per-type final agg."""
    ev = load_table(spark, sf_dir, "events")
    return mase_report_from_counts(mase_hourly_counts(ev))


def mase_hourly_counts(ev: DataFrame) -> DataFrame:
    """(event_type, hour_ts, n) hourly counts — the mergeable sufficient
    statistic (integer counts per fixed hour bucket sum across any cut of
    the input), shared by the batch evaluation and the streaming twin."""
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def mase_report_from_counts(agg: DataFrame) -> DataFrame:
    """Spine zero-fill + lag forecasts + the MASE aggregation over merged
    hourly counts (see forecast_mase_seasonal_naive's docstring). The
    spine bounds come from the counted hours: date_trunc(min ts) equals
    min(date_trunc(ts)), so batch and merged-partial paths see the same
    dense grid."""
    from pyspark.sql.window import Window

    bounds = agg.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_ts"
        )
    )
    spine = agg.select("event_type").distinct().crossJoin(hours)
    series = spine.join(agg, ["event_type", "hour_ts"], "left").select(
        "event_type",
        "hour_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    lagged = series.select(
        "event_type",
        "n",
        F.lag("n", 24).over(w).alias("f_seasonal"),
        F.lag("n", 1).over(w).alias("f_naive"),
    ).filter(F.col("f_seasonal").isNotNull())
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours_scored"),
            F.sum(F.abs(F.col("n") - F.col("f_seasonal")))
            .cast("long")
            .alias("sum_abs_err_seasonal"),
            F.sum(F.abs(F.col("n") - F.col("f_naive")))
            .cast("long")
            .alias("sum_abs_err_naive"),
            (
                F.sum(F.abs(F.col("n") - F.col("f_seasonal"))).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mae_seasonal"),
            (
                F.sum(F.abs(F.col("n") - F.col("f_naive"))).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mae_naive"),
            (
                F.sum(F.abs(F.col("n") - F.col("f_seasonal"))).cast("double")
                / F.nullif(
                    F.sum(F.abs(F.col("n") - F.col("f_naive"))), F.lit(0)
                ).cast("double")
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Forward as-of join (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "asof_join_next_purchase",
    oracle="""
    SELECT
        v.event_id AS view_id,
        v.user_id,
        (
            SELECT MIN(p.ts) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
              AND p.ts >= v.ts
        ) AS next_purchase_ts
    FROM events v
    WHERE v.event_type = 'view'
    """,
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of FORWARD join: for each view, the first purchase at or after
    it by the same user — the other direction of asof_join_last_click
    and the primitive behind time-to-convert attribution (a kdb aj /
    Pandas merge_asof(direction='forward') equivalent the reference has
    no analog for).

    Spark-first shape (mirror of the backward join): union both event
    kinds, sort within user by time, and carry the next purchase
    timestamp BACKWARD with a running MIN over the following-rows frame
    — one shuffle + one sort for the whole table instead of a correlated
    per-row subquery. Purchases sort AFTER views at the same timestamp
    (view tag 0, purchase tag 1) so a simultaneous purchase lands inside
    the view's following-rows frame and counts (ts >= v.ts), matching
    the oracle's >=. Note the tag direction is the MIRROR of the
    backward join's: a preceding frame needs same-ts purchases sorted
    first, a following frame needs them sorted last (ADVICE r11; the
    constructed-tie case is pinned by
    tests/test_round12_ops.py::test_asof_forward_same_ts_purchase)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias(
            "purchase_ts"
        ),
    )
    order_tag = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", order_tag, "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    with_next = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        F.min("purchase_ts").over(w).alias("next_purchase_ts"),
    )
    return with_next.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "next_purchase_ts"
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (round 11)
# ---------------------------------------------------------------------------

_MTA_LOOKBACK_DAYS = 7


@register_query(
    "multi_touch_attribution",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id AS c_id, user_id, ts AS c_ts,
               CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS channel
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT p.p_id, c.channel,
               ROW_NUMBER() OVER (PARTITION BY p.p_id
                                  ORDER BY c.c_ts, c.c_id) AS pos,
               COUNT(*) OVER (PARTITION BY p.p_id) AS n
        FROM purchases p
        JOIN clicks c
          ON p.user_id = c.user_id
         AND c.c_ts <= p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL {_MTA_LOOKBACK_DAYS} DAY
    ),
    credited AS (
        SELECT channel,
               CASE WHEN n = 1 THEN 1000000
                    WHEN n = 2 THEN 500000
                    WHEN pos = 1 OR pos = n THEN 400000
                    ELSE CAST(floor(200000.0 / (n - 2)) AS BIGINT)
               END AS credit_micros
        FROM touches
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit_micros) AS BIGINT) AS credit_micros,
           CAST(SUM(credit_micros) AS DOUBLE) / 1000000.0
               AS attributed_conversions
    FROM credited GROUP BY channel ORDER BY channel
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the standard
    marketing-science credit model: each purchase distributes one
    conversion across the clicks that preceded it within a 7-day
    lookback; first and last touch get 40% each, the middles split the
    remaining 20% (1 touch takes 100%, 2 touches 50/50). Channel is the
    deterministic props-key residue (the json_extract_props column).

    Determinism: credit is INTEGER MICRO-UNITS (floor of the middle
    split), so per-channel totals are exact BIGINT sums — a float credit
    would sum in reduction order and break cross-engine hashing; the
    single terminal divide by 1e6 is exact-input rounding, identical on
    both engines. Floor (not cast) does the truncation: DuckDB's
    double->BIGINT CAST rounds-to-nearest while Spark's truncates — floor
    agrees everywhere.

    Scale: the touch join is user-keyed and time-bounded (clicks within 7
    days of a purchase) — a co-partitioned shuffle join whose per-user
    intermediate is bounded by the user's own activity window, never a
    cross join; the position window runs per purchase (bounded list);
    credit aggregation is a |channels|-key partial agg."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        (F.get_json_object("props", "$.k").cast("long") % 5).alias("channel"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    touches = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & (
                F.col("c_ts")
                >= F.col("p_ts") - F.expr(f"interval {_MTA_LOOKBACK_DAYS} day")
            )
        )
        .select(
            "p_id",
            "channel",
            F.row_number()
            .over(Window.partitionBy("p_id").orderBy("c_ts", "c_id"))
            .alias("pos"),
            F.count(F.lit(1))
            .over(Window.partitionBy("p_id"))
            .alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(400000))
        .otherwise(
            F.floor(F.lit(200000.0) / (F.col("n") - 2)).cast("long")
        )
        .cast("long")
    )
    return (
        touches.select("channel", credit.alias("credit_micros"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit_micros").cast("long").alias("credit_micros"),
            (F.sum("credit_micros").cast("double") / F.lit(1000000.0)).alias(
                "attributed_conversions"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# SLO burn-rate alerts (round 11)
# ---------------------------------------------------------------------------

_SLO_TARGET = 0.25  # error budget: errors may be at most 25% of events
_SLO_LONG_HOURS = 6


@register_query(
    "slo_burn_rate_alerts",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err
        FROM events GROUP BY 1
    ),
    series AS (
        SELECT h.hour_ts,
               CAST(COALESCE(a.n_total, 0) AS BIGINT) AS n_total,
               CAST(COALESCE(a.n_err, 0) AS BIGINT) AS n_err
        FROM hours h LEFT JOIN agg a ON h.hour_ts = a.hour_ts
    ),
    windows AS (
        SELECT hour_ts, n_total, n_err,
               CAST(SUM(n_total) OVER w6 AS BIGINT) AS n_total_6h,
               CAST(SUM(n_err) OVER w6 AS BIGINT) AS n_err_6h
        FROM series
        WINDOW w6 AS (ORDER BY hour_ts
                      ROWS BETWEEN {_SLO_LONG_HOURS - 1} PRECEDING
                                AND CURRENT ROW)
    )
    SELECT hour_ts, n_total, n_err, n_total_6h, n_err_6h,
           CASE WHEN n_total = 0 THEN NULL
                ELSE (CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE))
                     / {_SLO_TARGET} END AS burn_1h,
           CASE WHEN n_total_6h = 0 THEN NULL
                ELSE (CAST(n_err_6h AS DOUBLE) / CAST(n_total_6h AS DOUBLE))
                     / {_SLO_TARGET} END AS burn_6h,
           (n_total > 0 AND n_total_6h > 0
            AND CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE)
                > {_SLO_TARGET}
            AND CAST(n_err_6h AS DOUBLE) / CAST(n_total_6h AS DOUBLE)
                > {_SLO_TARGET}) AS alert
    FROM windows ORDER BY hour_ts
    """,
)
def slo_burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    policy): alert only when BOTH the fast window (1h error rate) and the
    slow window ({_SLO_LONG_HOURS}h trailing) burn above the error budget
    ({int(_SLO_TARGET * 100)}% here) — the two-window AND is what keeps
    one bad minute from paging (fast-only) while still catching slow
    leaks (slow-only would page hours late). Emits the full hourly series
    with both burn rates and the alert flag.

    Determinism: counts over the dense hour spine are exact integers
    (zero-filled hours emit NULL burn, never a division error); each burn
    is one exact-int divide then one divide by the budget constant; the
    alert predicate compares exact-int ratios against the literal budget
    (no derived-double comparison chains).

    Scale: one hourly partial-agg over the corpus; the spine and the
    6-hour trailing window are hour-count-sized (domain, not data); the
    alert is a map-side predicate over spine rows."""
    ev = load_table(spark, sf_dir, "events")
    return slo_report_from_counts(slo_hourly_counts(ev))


def slo_hourly_counts(ev: DataFrame) -> DataFrame:
    """(hour_ts, n_total, n_err) — the mergeable sufficient statistic
    (both counts sum across any cut of the stream), shared by the batch
    report and the streaming twin."""
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )


def slo_report_from_counts(agg: DataFrame) -> DataFrame:
    """Spine zero-fill + two-window burn rates over merged hourly counts
    (see slo_burn_rate_alerts)."""
    from pyspark.sql.window import Window

    bounds = agg.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_ts"
        )
    )
    series = hours.join(agg, "hour_ts", "left").select(
        "hour_ts",
        F.coalesce(F.col("n_total"), F.lit(0)).cast("long").alias("n_total"),
        F.coalesce(F.col("n_err"), F.lit(0)).cast("long").alias("n_err"),
    )
    w6 = Window.orderBy("hour_ts").rowsBetween(-(_SLO_LONG_HOURS - 1), 0)
    windows = series.select(
        "hour_ts",
        "n_total",
        "n_err",
        F.sum("n_total").over(w6).cast("long").alias("n_total_6h"),
        F.sum("n_err").over(w6).cast("long").alias("n_err_6h"),
    )
    rate_1h = F.col("n_err").cast("double") / F.col("n_total").cast("double")
    rate_6h = F.col("n_err_6h").cast("double") / F.col("n_total_6h").cast(
        "double"
    )
    return windows.select(
        "hour_ts",
        "n_total",
        "n_err",
        "n_total_6h",
        "n_err_6h",
        F.when(F.col("n_total") == 0, F.lit(None).cast("double"))
        .otherwise(rate_1h / F.lit(_SLO_TARGET))
        .alias("burn_1h"),
        F.when(F.col("n_total_6h") == 0, F.lit(None).cast("double"))
        .otherwise(rate_6h / F.lit(_SLO_TARGET))
        .alias("burn_6h"),
        (
            (F.col("n_total") > 0)
            & (F.col("n_total_6h") > 0)
            & (rate_1h > F.lit(_SLO_TARGET))
            & (rate_6h > F.lit(_SLO_TARGET))
        ).alias("alert"),
    ).orderBy("hour_ts")


# ---------------------------------------------------------------------------
# Theil-Sen robust daily trend (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "theil_sen_daily_trend",
    oracle="""
    WITH bounds AS (
        SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
               CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
        FROM events
    ),
    days AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, CAST(day_ts AS DATE) AS d
              FROM types CROSS JOIN days),
    agg AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT s.event_type,
               CAST(date_diff('day', b.lo, s.d) AS BIGINT) AS x,
               CAST(COALESCE(a.n, 0) AS BIGINT) AS y
        FROM spine s
        LEFT JOIN agg a ON s.event_type = a.event_type AND s.d = a.d
        CROSS JOIN bounds b
    ),
    slopes AS (
        SELECT a.event_type,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                   AS slope
        FROM series a JOIN series b
          ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS m
        FROM slopes
    )
    SELECT event_type,
           CAST(MAX(m) AS BIGINT) AS n_pairs,
           MIN(CASE WHEN rk = (m + 1) // 2 THEN slope END)
               AS theil_sen_slope
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of each event type's daily volume —
    the median of all pairwise slopes, the standard outlier-immune
    alternative to OLS (breakdown point 29% vs 0%: one bad ingest day
    drags an OLS line but not the pairwise-slope median). Complements
    the forecast/decomposition views with the robust version of "is this
    stream growing".

    Determinism: daily counts over the dense day spine are exact
    integers; each pairwise slope is ONE exact-int double division;
    the median is pure SELECTION (lower median via ROW_NUMBER — ties on
    equal slope values select the same value regardless of tie order).

    Scale: the pair build is per-type over DAY-count rows (C(days, 2) ~
    5k pairs per type per year — domain-sized, independent of event
    volume; the corpus is touched once by the daily partial agg). At
    decade horizons, the standard subsample estimator (random pair
    sample) replaces the full cross — same plan with a hash-gate on
    pairs."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        "lo",
    )
    spine = ev.select("event_type").distinct().crossJoin(days)
    agg = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    series = spine.join(agg, ["event_type", "d"], "left").select(
        "event_type",
        F.datediff(F.col("d"), F.col("lo")).cast("long").alias("x"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("y"),
    )
    a = series.alias("a")
    b = series.alias("b")
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("a.x") < F.col("b.x"))
        .select(
            "event_type",
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    w_all = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("m").cast("long").alias("n_pairs"),
            F.min(
                F.when(
                    F.col("rk") == F.floor((F.col("m") + 1) / 2).cast("long"),
                    F.col("slope"),
                )
            ).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (round 12)
# ---------------------------------------------------------------------------

_KM_CENSOR_TS = "2024-01-30 23:00:00"  # right-censor horizon: sessions
# still open this close to the end of observation may have continued past
# the data boundary, so their durations are censored, not deaths


@register_query(
    "kaplan_meier_survival",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w < INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sno
        FROM marked
    ),
    subjects AS (
        -- floor-of-seconds then integer-divide: date_diff('minute')
        -- counts boundary CROSSINGS, which is not the same function as
        -- floor(elapsed/60) and would diverge from the Spark side
        SELECT (epoch_us(MAX(ts)) // 1000000
                - epoch_us(MIN(ts)) // 1000000) // 60 AS t,
               CASE WHEN MAX(ts) >= TIMESTAMP '{_KM_CENSOR_TS}'
                    THEN 0 ELSE 1 END AS died
        FROM numbered GROUP BY user_id, sno
    ),
    at_t AS (
        SELECT t,
               CAST(COUNT(*) AS BIGINT) AS n_at,
               CAST(SUM(died) AS BIGINT) AS n_deaths
        FROM subjects GROUP BY t
    ),
    risk AS (
        SELECT t, n_deaths,
               SUM(n_at) OVER (ORDER BY t
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS n_risk
        FROM at_t
    ),
    factors AS (
        SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_deaths,
               1 - CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)
                   AS factor,
               ROW_NUMBER() OVER (ORDER BY t) AS rn
        FROM risk WHERE n_deaths > 0
    ),
    flist AS (SELECT list(factor ORDER BY t) AS fl FROM factors)
    SELECT f.t AS duration_minutes, f.n_risk, f.n_deaths,
           CAST(list_reduce(list_slice(fl, 1, f.rn), (a, b) -> a * b)
                AS DOUBLE) AS survival
    FROM factors f CROSS JOIN flist
    """,
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for SESSION duration — "how long does
    an engagement session last", the retention readout (median session
    length, survival-at-minute-k) with censoring done right: a session
    still open within 30 minutes of the observation boundary may have
    continued past the data's edge, so it is RIGHT-CENSORED at its
    observed length rather than counted as ended there — the bias naive
    duration histograms bake in. Subjects are gaps-and-islands sessions
    (the >= 30 min new-session convention shared with the session-window
    twins); S(t) = prod over death times u <= t of (1 - d_u/n_u) with
    n_u the at-risk count (duration >= u, censored included).

    Exactness — the cumulative product is the interesting part: each
    factor is one exact-int double division and one subtraction
    (correctly rounded), and S(t) is a SEQUENTIAL left-to-right fold
    over the death-time-ordered factor list (Spark F.aggregate over the
    sorted collected array == DuckDB list_reduce over list(ORDER BY t);
    1.0 * x == x exactly, so the engines' folds are bit-identical — the
    dot_double discipline applied to products; exp(sum(log)) would be
    libm, and a windowed PRODUCT() does not exist portably).

    Scale: sessionization is one user-keyed sort shuffle; from there
    everything lives on the DURATION-DOMAIN table (distinct observed
    minute-lengths — 37 at sf0.01, bounded by the session-length range,
    not the corpus) — the single-partition risk window and the collected
    factor array are domain-sized (the peak_concurrency discipline)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.select(
        "user_id",
        "ts",
        F.when(
            F.col("ts").cast("long") - F.lag("ts").over(w_lag).cast("long")
            < 30 * 60,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = marked.select(
        "user_id", "ts", F.sum("new_session").over(w_cum).alias("sno")
    )
    censor = F.lit(_KM_CENSOR_TS).cast("timestamp")
    subjects = numbered.groupBy("user_id", "sno").agg(
        F.floor(
            (F.max("ts").cast("long") - F.min("ts").cast("long")) / 60
        )
        .cast("long")
        .alias("t"),
        F.when(F.max("ts") >= censor, 0).otherwise(1).alias("died"),
    )
    at_t = subjects.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.sum("died").cast("long").alias("n_deaths"),
    )
    w_risk = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = at_t.select(
        "t",
        "n_deaths",
        F.sum("n_at").over(w_risk).cast("long").alias("n_risk"),
    )
    factor = F.lit(1) - F.col("n_deaths").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    factors = risk.filter(F.col("n_deaths") > 0).select(
        "t", "n_risk", "n_deaths", factor.alias("factor")
    )
    arr = factors.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "n_risk", "n_deaths", "factor"))
        ).alias("a")
    )
    exploded = arr.select(F.posexplode("a").alias("pos", "row"), F.col("a"))
    survival = F.aggregate(
        F.transform(
            F.slice(F.col("a"), 1, F.col("pos") + 1), lambda x: x["factor"]
        ),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return exploded.select(
        F.col("row.t").alias("duration_minutes"),
        F.col("row.n_risk").alias("n_risk"),
        F.col("row.n_deaths").alias("n_deaths"),
        survival.alias("survival"),
    )


# ---------------------------------------------------------------------------
# Window funnel depth (round 12)
# ---------------------------------------------------------------------------


@register_query(
    "window_funnel_depth",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    step2 AS (
        SELECT v.user_id, v.event_id, v.ts AS v_ts, MIN(c.ts) AS c_ts
        FROM v LEFT JOIN c
          ON c.user_id = v.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        GROUP BY v.user_id, v.event_id, v.ts
    ),
    step3 AS (
        SELECT s.user_id, s.event_id,
               CASE WHEN s.c_ts IS NULL THEN 1
                    WHEN MAX(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) = 1
                    THEN 3 ELSE 2 END AS depth
        FROM step2 s LEFT JOIN p
          ON p.user_id = s.user_id
         AND s.c_ts IS NOT NULL
         AND p.ts >= s.c_ts AND p.ts <= s.v_ts + INTERVAL 1 HOUR
        GROUP BY s.user_id, s.event_id, s.c_ts
    ),
    per_user AS (
        SELECT user_id, CAST(MAX(depth) AS BIGINT) AS funnel_depth
        FROM step3 GROUP BY user_id
    )
    SELECT funnel_depth, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY funnel_depth ORDER BY funnel_depth
    """,
)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel: per user, the deepest
    view -> click -> purchase chain completed within ONE HOUR of the
    anchoring view, reported as a depth histogram. Greedy == existential
    here and both engines exploit it: for a fixed view, the EARLIEST
    in-window click maximizes the remaining purchase interval
    [c.ts, v.ts + 1h] (any later click's interval is a subset), so
    step 2 keeps only min(click_ts) per view and step 3 is one
    existence flag — the three-way existential join (views x clicks x
    purchases per user, cubic in the worst case) collapses to two
    quadratic-at-worst user-keyed joins.

    Scale: both joins are equi on user_id (co-partitioned shuffle) with
    the hour bound cutting the per-user pair volume; per-view state is
    one (min_click, exists_purchase) pair; the histogram is a 3-row
    aggregate. The funnel definition the reference's per-message loop
    could only approximate with hand-rolled state."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    hour = F.expr("INTERVAL 1 HOUR")
    step2 = (
        v.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + hour),
            "left",
        )
        .groupBy("user_id", "event_id", "v_ts")
        .agg(F.min("c_ts").alias("c_ts"))
    )
    step3 = (
        step2.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & F.col("c_ts").isNotNull()
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + hour),
            "left",
        )
        .groupBy("user_id", "event_id", "c_ts")
        .agg(
            F.when(F.col("c_ts").isNull(), 1)
            .when(
                F.max(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)) == 1, 3
            )
            .otherwise(2)
            .alias("depth")
        )
    )
    per_user = step3.groupBy("user_id").agg(
        F.max("depth").cast("long").alias("funnel_depth")
    )
    return (
        per_user.groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("funnel_depth")
    )


# ---------------------------------------------------------------------------
# Bucketed interval join (round 12): the equi-join rewrite of a range join
# ---------------------------------------------------------------------------


@register_query(
    "bucketed_range_join_conversions",
    oracle="""
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT v.event_id) AS BIGINT) AS n_converted_views
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
)
def bucketed_range_join_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View -> purchase pairs within one hour, built as a BUCKETED
    EQUI-JOIN instead of the inequality join the spec (and the oracle)
    states: each view emits its two covering hour buckets
    (floor(v_ts), floor(v_ts + 1h)), purchases join on the exact key
    (user_id, hour_bucket), and the true range predicate re-filters the
    survivors. The rewrite matters because Catalyst plans a bare
    `p.ts BETWEEN v.ts AND v.ts + 1h` join as a broadcast-nested-loop
    (or a per-key sort within user groups at best): the bucket key turns
    it into a plain shuffled hash join whose candidate volume is bounded
    by events-per-(user, hour) — the standard interval-join rewrite every
    scale engine (and Spark's own range-join hints on Databricks) uses.
    No dedupe pass is needed: a purchase lies in exactly one hour bucket,
    so each (view, purchase) pair survives the exact filter from exactly
    one of the view's two bucket rows.

    Scale: 2 rows per view (the interval spans at most 2 hour buckets),
    equi-shuffle on (user, bucket), exact predicate map-side after the
    join; the count aggregates are partial. At a 100 TB event volume the
    bucket granularity tracks the window size (1h window -> 1h buckets),
    keeping the candidate fan-in constant."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_timestamp(F.col("ts")) / 3600).alias("bucket"),
    )
    v2 = v.select(
        "user_id",
        "event_id",
        "v_ts",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.unix_timestamp(F.col("v_ts")) / 3600),
                    F.floor(
                        F.unix_timestamp(F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
                        / 3600
                    ),
                )
            )
        ).alias("bucket"),
    )
    pairs = v2.join(
        p,
        (F.col("p_user") == F.col("user_id")) & (p["bucket"] == v2["bucket"]),
    ).filter(
        (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count_distinct("event_id").cast("long").alias("n_converted_views"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Split-conformal forecast intervals (round 12)
# ---------------------------------------------------------------------------

_CONF_ALPHA_NUM = 9  # 1 - alpha = 9/10: kept as a RATIO so the conformal
_CONF_ALPHA_DEN = 10  # rank is pure integer arithmetic on both engines


@register_query(
    "conformal_forecast_intervals",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, hour_ts FROM types CROSS JOIN hours),
    agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT spine.event_type AS event_type, spine.hour_ts AS hour_ts,
               CAST(COALESCE(agg.n, 0) AS BIGINT) AS n
        FROM spine LEFT JOIN agg
          ON spine.event_type = agg.event_type
         AND spine.hour_ts = agg.hour_ts
    ),
    lagged AS (
        SELECT event_type, hour_ts, n,
               lag(n, 24) OVER (PARTITION BY event_type ORDER BY hour_ts)
                   AS f_seasonal
        FROM series
    ),
    scored AS (
        SELECT l.event_type, l.hour_ts,
               ABS(l.n - l.f_seasonal) AS r,
               l.hour_ts > b.hi - INTERVAL 24 HOUR AS is_holdout
        FROM lagged l CROSS JOIN bounds b
        WHERE l.f_seasonal IS NOT NULL
    ),
    cal_ranked AS (
        SELECT event_type, r,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY r, hour_ts) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_cal
        FROM scored WHERE NOT is_holdout
    ),
    q AS (
        SELECT event_type, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
               CAST(MAX(CASE WHEN rn =
                   ({_CONF_ALPHA_NUM} * (n_cal + 1) + {_CONF_ALPHA_DEN - 1})
                       // {_CONF_ALPHA_DEN}
                   THEN r END) AS BIGINT) AS q_alpha
        FROM cal_ranked GROUP BY event_type
    ),
    hold AS (
        SELECT s.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_holdout,
               CAST(SUM(CASE WHEN s.r <= q.q_alpha THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_covered
        FROM scored s JOIN q ON q.event_type = s.event_type
        WHERE s.is_holdout
        GROUP BY s.event_type
    )
    SELECT q.event_type, q.n_cal, q.q_alpha,
           h.n_holdout, h.n_covered,
           CAST(h.n_covered AS DOUBLE) / CAST(h.n_holdout AS DOUBLE)
               AS holdout_coverage
    FROM q JOIN hold h ON h.event_type = q.event_type
    ORDER BY q.event_type
    """,
)
def conformal_forecast_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals over the seasonal-naive hourly
    forecast — the DISTRIBUTION-FREE uncertainty layer modern forecast
    pipelines wrap around any point model (Vovk's conformal guarantee:
    if calibration and test are exchangeable, the interval
    [forecast - q, forecast + q] with q = the ceil((1-alpha)(n+1))-th
    smallest calibration residual covers with probability >= 1 - alpha,
    NO distributional assumption). Calibration = all scored hours except
    the final 24; holdout = that last day; the report is the per-type
    conformal quantile and its realized holdout coverage.

    Exactness: residuals are exact BIGINTs (integer counts), the
    conformal rank is pure integer arithmetic (alpha kept as the ratio
    9/10 so ceil is (9(n+1)+9) // 10 — no float rank), the quantile is
    SELECTED not interpolated, and coverage is one exact-int division.

    Scale: the series lives on the bounded types x hours spine (the
    MASE/gapfill discipline); ranking windows are per-type over
    spine-sized partitions; the corpus is touched once by the hourly
    count."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    series = spine.join(agg, ["event_type", "hour_ts"], "left").select(
        "event_type",
        "hour_ts",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    lagged = series.select(
        "event_type",
        "hour_ts",
        "n",
        F.lag("n", 24).over(w).alias("f_seasonal"),
    )
    scored = (
        lagged.filter(F.col("f_seasonal").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "hour_ts",
            F.abs(F.col("n") - F.col("f_seasonal")).alias("r"),
            (
                F.col("hour_ts") > F.col("hi") - F.expr("INTERVAL 24 HOUR")
            ).alias("is_holdout"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("r", "hour_ts")
    wc = Window.partitionBy("event_type")
    cal_ranked = scored.filter(~F.col("is_holdout")).select(
        "event_type",
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_cal"),
    )
    conf_rank = F.floor(
        (
            F.lit(_CONF_ALPHA_NUM) * (F.col("n_cal") + 1)
            + F.lit(_CONF_ALPHA_DEN - 1)
        )
        / F.lit(_CONF_ALPHA_DEN)
    )
    q = cal_ranked.groupBy("event_type").agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        F.max(F.when(F.col("rn") == conf_rank, F.col("r")))
        .cast("long")
        .alias("q_alpha"),
    )
    hold = (
        scored.filter(F.col("is_holdout"))
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_holdout"),
            F.sum(F.when(F.col("r") <= F.col("q_alpha"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        q.join(hold, "event_type")
        .select(
            "event_type",
            "n_cal",
            "q_alpha",
            "n_holdout",
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_holdout").cast("double")
            ).alias("holdout_coverage"),
        )
        .orderBy("event_type")
    )
