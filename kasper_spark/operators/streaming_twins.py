"""Streaming-twin queries: run the STREAMING operator over the bounded
testdata (file stream + availableNow) and return its final state as a
DataFrame — so the driver's DuckDB oracle checks the streaming path itself,
not just the batch analog (SURVEY.md §1.3 'batch twin' requirement, in the
other direction).

This is the engine-level proof of kasper's core promise: the same
processing graph gives the same answer whether it arrives as a stream or
sits in a table (/root/reference/README.md:13-19 — at-least-once delivery +
idempotent processing converge to the batch result).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from kasper_spark import index_catalog as _cat
from kasper_spark.catalog import ensure_nanos_as_long, normalize_driver_ts
from kasper_spark.operators.dedup import _LSH_BANDS_CTE
from kasper_spark.registry import register_query
from kasper_spark.streaming.state import running_word_count


def _workdir(prefix: str) -> str:
    """mkdtemp with atexit cleanup. Twins return DataFrames that may
    lazily re-scan the per-epoch parquet written under the work dir, so
    removal must wait until interpreter exit (after the driver/test has
    collected), not a function-scope finally. ignore_errors: a half-torn
    stream must never turn cleanup into a failure."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


@register_query(
    "streaming_word_count_twin",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def streaming_word_count_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count executed through Structured Streaming (parquet file
    stream -> stateful agg -> availableNow drain -> memory sink), verified
    against the SAME SQL oracle as the batch word_count: stream/batch
    convergence, checked by the driver."""
    qname = f"swc_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-swc-")
    ckpt = os.path.join(work, "ck")
    # the file-stream source wants a directory; expose the single parquet
    # file through a symlink (read-only testdata stays untouched)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
    )
    counts = running_word_count(stream, value_col="text")
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register_query(
    "streaming_tumbling_window_twin",
    oracle="""
    SELECT
        date_trunc('hour', ts) AS window_start,
        event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def streaming_tumbling_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation executed through Structured
    Streaming (parquet file stream -> watermark -> window agg -> availableNow
    drain -> memory sink), verified against the SAME SQL oracle as the batch
    events_tumbling_1h: the streaming window operator itself is what the
    DuckDB hash-check certifies. Complete output mode so every window is in
    the final table (the watermark still exercises the event-time tracking
    path; with availableNow + bounded input no window can be late-dropped)."""
    qname = f"stw_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-stw-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    # ts encoding varies across driver-testdata drops (nano-as-long vs
    # TIMESTAMP_NTZ micros), so take the stream schema from a batch schema
    # inference and apply the SAME normalization as the bounded catalog
    # (kasper_spark/catalog.py) instead of hard-coding either.
    ensure_nanos_as_long(spark)  # bare driver sessions reject nano-ts parquet
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    stream = normalize_driver_ts(stream, ("ts",))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register_query(
    "streaming_dedup_twin",
    oracle="""
    SELECT lang, COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique
    FROM documents
    GROUP BY lang
    """,
)
def streaming_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup executed through Structured Streaming: file stream ->
    content digest -> dropDuplicates (streaming state keeps one row per
    key) -> availableNow drain -> memory sink, then a bounded per-language
    count over the sink, checked against COUNT(DISTINCT digest) SQL.

    This is the operator that turns the reference's at-least-once delivery
    (/root/reference/README.md:18-19 — redelivery on crash between produce
    and offset commit) into exactly-once results: replayed messages hash to
    an already-seen key and drop. Dedup key is (lang, digest) so the kept
    row's lang is deterministic even if identical text appears under two
    languages. At scale the state store holds one 16-byte digest per
    distinct document (RocksDB-backed); production jobs bound it with
    withWatermark before dropDuplicates."""
    qname = f"sdd_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-sdd-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
        .select(
            "lang",
            F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("digest"),
        )
        .dropDuplicates(["lang", "digest"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(qname)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


@register_query(
    "streaming_session_window_twin",
    oracle="""
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
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def streaming_session_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization executed through Structured Streaming's
    native session_window operator (parquet file stream -> watermark ->
    session_window(ts, '30 minutes') -> availableNow drain -> memory sink),
    checked against the gaps-and-islands SQL.

    Semantics note: session_window treats a gap of EXACTLY the timeout as a
    new session (windows [t, t+30m) merge only on strict overlap), so the
    oracle's new-session rule is `gap >= 30 minutes` — subtly different
    from the batch sessionize_events operator, whose rule is `gap > 30
    minutes`; both are valid conventions, each oracle encodes its own.

    This is the operator the reference cannot express at all: kasper's only
    notion of time is the processing-time batch ticker
    (/root/reference/topic_processor.go:193,219-232 — SURVEY.md §2.C
    'Event-time semantics: none'). At 100 TB the session state is
    RocksDB-backed and evicted by the watermark; per-user sessions are
    independent, so the shuffle key (user_id) distributes perfectly."""
    qname = f"ssw_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-ssw-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ensure_nanos_as_long(spark)  # bare driver sessions reject nano-ts parquet
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    stream = normalize_driver_ts(stream, ("ts",))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("session_window.start").alias("session_start"),
            F.col("n_events"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register_query(
    "streaming_join_twin",
    oracle="""
    SELECT
        c.event_id AS click_id,
        p.event_id AS purchase_id,
        c.user_id AS user_id,
        c.ts AS click_ts,
        p.ts AS purchase_ts
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def streaming_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join through the real streaming path: clicks and
    purchases (two filtered views of one file stream) joined on user with a
    1-hour event-time range, both sides watermarked, availableNow drain to
    a memory sink — checked against the plain SQL join.

    This is the reference's flagship pattern B5 run on Spark's native
    stream-stream join machinery instead of hand-rolled KV state
    (/root/reference/topic_processor_test.go:76-155 buffers both sides in
    Stores and emits on completion; SURVEY.md §7 'Hard parts'). The
    event-time range condition is what makes it bounded: each side's state
    evicts rows older than watermark + 1 hour, so state size is
    O(rate x window), not O(history) — kasper's stores never evict
    (topic_processor_test.go:94-133), which at 100 TB is the difference
    between a working join and an OOM."""
    qname = f"ssj_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-ssj-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ensure_nanos_as_long(spark)  # bare driver sessions reject nano-ts parquet
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    stream = normalize_driver_ts(stream, ("ts",))
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register_query(
    "streaming_stateful_count_twin",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def streaming_stateful_count_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running word count through the CUSTOM STATEFUL OPERATOR path
    (applyInPandasWithState) — the declarative twins above use Spark's
    built-in aggregation; this one runs user Python against per-key state,
    which is the literal Spark form of kasper's Process() + Store surface
    (/root/reference/topic_processor.go:101-109 hands user code a batch and
    a KV store; /root/reference/examples/word_count_example.go:33-44 is
    this exact loop). Oracle-checked against the same word-count SQL, so
    the driver gate certifies the pandas-state machinery end to end.

    The state row is one bigint per word in the state store (RocksDB at
    scale), sharded by the groupBy key; update-mode rows re-emit per batch,
    so the final table reduces with max(n) — counts only grow, making that
    reduction exact regardless of how availableNow batched the input."""
    qname = f"ssc_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-ssc-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
    )
    words = stream.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )

    # nested fn: cloudpickle pickles it by value, so executors launched
    # from a foreign cwd need no importable kasper_spark
    def count_words(key, pdfs, state):
        import pandas as pd

        total = sum(len(pdf) for pdf in pdfs)
        prev = state.get[0] if state.exists else 0
        n = prev + total
        state.update((n,))
        yield pd.DataFrame({"word": [key[0]], "n": [n]})

    counts = words.groupBy("word").applyInPandasWithState(
        count_words,
        outputStructType="word string, n bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname).groupBy("word").agg(F.max("n").alias("n"))


@register_query(
    "streaming_dedup_watermark_twin",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users
    FROM events
    GROUP BY event_type
    """,
)
def streaming_dedup_watermark_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup: dropDuplicatesWithinWatermark keeps a
    (event_type, user_id) key only until the watermark passes its event
    time + the delay, then evicts — the production form of the unbounded
    streaming_dedup_twin. With availableNow over bounded input whose span
    (30 days) exceeds any intra-run watermark advance, no key expires
    mid-run, so the result equals DISTINCT and stays oracle-checkable
    while the query still exercises the eviction-capable operator. At
    100 TB this is the dedup that never OOMs: state is
    O(keys-per-watermark-window), not O(all keys ever)."""
    qname = f"sdw_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-sdw-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ensure_nanos_as_long(spark)  # bare driver sessions reject nano-ts parquet
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    stream = normalize_driver_ts(stream, ("ts",))
    deduped = (
        stream.select("event_type", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_type", "user_id"])
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(qname)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
    )


@register_query(
    "streaming_enrich_static_twin",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def streaming_enrich_static_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join through the real streaming path: the
    events stream joins the bounded customer dimension per micro-batch,
    then aggregates by segment — kasper's per-record store lookup before
    emit (B8, /root/reference/examples/word_count_example.go:35, the
    Get-against-store enrichment) as a declarative stream-static join.

    Unlike kasper (one Redis RTT per key, /root/reference/redis.go:54-69),
    the dimension is joined in-plan: Spark re-plans the static side each
    micro-batch and picks broadcast vs shuffle by size — no per-row
    network round trips, and the dim can update between batches.

    Scale: the static side here is small enough to auto-broadcast; a
    100 TB dim would shuffle — both correct, same declaration."""
    from kasper_spark.catalog import load_table

    qname = f"ses_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-ses-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ensure_nanos_as_long(spark)  # bare driver sessions reject nano-ts parquet
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        stream.join(cust, stream.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname).orderBy("c_mktsegment")


@register_query(
    "streaming_countmin_twin",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS est_count
        FROM toks WHERE word <> '' GROUP BY word
    )
    SELECT word, est_count
    FROM counts
    ORDER BY est_count DESC, word
    LIMIT 20
    """,
)
def streaming_countmin_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built THROUGH Structured Streaming: the (depth,
    cell) expansion runs per micro-batch and the stateful complete-mode
    aggregation IS the incremental sketch merge — each batch's partial
    cells fold into the running sketch exactly like executor partials fold
    in the batch build (the mergeability law, exercised end-to-end).
    Heavy-hitter point queries then probe the final merged sketch and are
    hash-checked against the same exact-count oracle as
    countmin_heavy_hitters: streaming and batch sketches converge to the
    identical answer over the same data."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.analytics import cm_depth_cells, cm_topk_from_cells

    qname = f"scm_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-scm-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
    )
    stoks = stream.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    cells = (
        stoks.select(F.explode(cm_depth_cells()).alias("dc"))
        .groupBy("dc.depth", "dc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # probe the STREAM-built sketch with the bounded vocabulary
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return cm_topk_from_cells(toks, spark.table(qname))


@register_query(
    "streaming_topic_dir_twin",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
)
def streaming_topic_dir_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key message counts through the kasper_topic_dir connector, end
    to end: events -> produce (key-hash routed, distributed writer) ->
    stream-consume through Spark's connector machinery -> stateful count ->
    drain — hash-checked against plain SQL over the original table.

    This certifies the connector's delivery contract with the oracle, not
    just unit tests: every message written is consumed exactly once, keys
    survive the produce/consume round trip, and the streaming aggregate
    over the log converges to the batch answer (the reference's core
    at-least-once + idempotent-processing promise,
    /root/reference/README.md:13-19, exercised through a real pluggable
    source instead of a file-stream approximation).
    """
    from kasper_spark.sources.topic_dir import register_topic_dir_source

    register_topic_dir_source(spark)
    ensure_nanos_as_long(spark)
    work = _workdir("kasper-stdt-")
    topic = os.path.join(work, "topic")

    events = normalize_driver_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")), ("ts",)
    )
    (
        events.select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_type").alias("value"),
            "ts",
        )
        .write.format("kasper_topic_dir")
        .option("path", topic)
        .option("partitions", "4")
        .mode("append")
        .save()
    )

    qname = f"stdt_{uuid.uuid4().hex[:10]}"
    counts = (
        spark.readStream.format("kasper_topic_dir")
        .option("path", topic)
        .load()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register_query(
    "streaming_lsh_dedup_twin",
    oracle="""
    WITH """
    + _LSH_BANDS_CTE
    + """
    SELECT
        a.doc_id,
        CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_earlier_mates,
        CAST(COUNT(DISTINCT b.doc_id) > 0 AS BIGINT) AS is_near_dup
    FROM bands a
    LEFT JOIN bands b
      ON a.band = b.band AND a.bsig = b.bsig AND b.doc_id < a.doc_id
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """,
)
def streaming_lsh_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-at-ingest: MinHash/LSH band signatures computed INSIDE a
    Structured Streaming plan (file stream -> per-row banding -> epoch-
    idempotent signature store), then the near-dup audit over the
    accumulated store — the composition a training pipeline runs so newly
    crawled documents are flagged against everything already ingested.

    Determinism vs batching: micro-batch boundaries are not deterministic,
    so the per-doc verdict must not depend on ARRIVAL order — the flag is
    "shares >=1 band bucket with a LOWER doc_id", a pure function of the
    corpus, evaluated over the completed signature store after the
    availableNow drain. The streaming stage is the signature EXTRACTION
    (the expensive, perfectly incremental part: stateless per-row
    expressions, no shuffle, no state store); the audit join runs over
    signatures only (~100 B/doc), never re-touching document text. At
    100 TB: extraction scales with ingest rate; the audit is the
    (band, bsig) bucket join of minhash_lsh_candidates, incremental per
    epoch if run batch-vs-store instead of store-vs-store.

    Signatures use the md5 hash family, and the per-row array_min form
    here provably equals the batch path's explode+groupBy partial-agg min
    (same value set, same hashes) — so one SQL oracle certifies both.
    Epoch idempotency: each batch writes batch={epoch} with overwrite —
    a replayed epoch overwrites its own output, never duplicates
    (the connector-native form is sources/topic_dir.py's epoch ledger)."""
    from kasper_spark.operators.dedup import (
        _BANDS,
        _NUM_HASHES,
        _ROWS_PER_BAND,
        _shingles_raw,
        _tokens,
    )

    work = _workdir("kasper-slsh-")
    src_dir = os.path.join(work, "src")
    sig_dir = os.path.join(work, "sigs")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
        # the file source gives ONE input partition per file; without this
        # stateless repartition the 32x-per-shingle hash work runs in a
        # single task (measured 164 s at sf0.1 vs ~8 s spread)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # per-row minhash: mh_i = min over distinct shingles of the
    # independently-seeded hash md5('{i}|' || s) (first 15 hex as a 60-bit
    # long) — streaming-safe (no aggregation state), value-identical to the
    # batch explode+groupBy form in dedup._md5_lsh_pairs (same per-i seeded
    # family; see minhash_lsh_candidates on why NOT the affine h1 + i*h2)
    shingles = F.array_distinct(_shingles_raw(_tokens(F.col("text"))))
    mh = F.transform(
        F.sequence(F.lit(0), F.lit(_NUM_HASHES - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.conv(
                    F.substring(
                        F.md5(F.concat(i.cast("string"), F.lit("|"), s)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    )
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.concat_ws(
                "|",
                *[
                    F.element_at(F.col("mh"), b * _ROWS_PER_BAND + r + 1).cast(
                        "string"
                    )
                    for r in range(_ROWS_PER_BAND)
                ],
            ).alias("bsig"),
        ),
    )
    sig_stream = (
        stream.select("doc_id", shingles.alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", mh.alias("mh"))
        .select("doc_id", F.explode(bands).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))
    )

    def append_sigs(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(sig_dir, f"batch={epoch_id}"))

    q = (
        sig_stream.writeStream.foreachBatch(append_sigs)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    store = spark.read.option("recursiveFileLookup", "true").parquet(sig_dir)
    a = store.alias("a")
    b = store.alias("b")
    mates = F.count_distinct(F.col("b.doc_id"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("b.doc_id") < F.col("a.doc_id")),
            "left",
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            mates.cast("bigint").alias("n_earlier_mates"),
            (mates > 0).cast("bigint").alias("is_near_dup"),
        )
        .orderBy("doc_id")
    )


@register_query(
    "streaming_tws_count_twin",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def streaming_tws_count_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running word count through the STATE-V2 arbitrary-stateful path
    (transformWithStateInPandas) — the third and most modern form of
    kasper's Process() + Store surface
    (/root/reference/topic_processor.go:101-109):
    streaming_stateful_count_twin certifies applyInPandasWithState (state
    v1); this twin certifies the Spark-4 StatefulProcessor runtime — typed
    ValueState handles, a long-lived JVM state server the Python worker
    talks to over protobuf, and RocksDB virtual column families — against
    the same DuckDB oracle. Together they prove BOTH stateful runtimes
    compute the reference answer.

    Driver-session plumbing (each piece is load-bearing under the grading
    driver's bare session):
    - state v2 needs ``google.protobuf`` in the worker processes; where
      only the repo's mini runtime exists, ``ship_shim_to_workers``
      injects it via ``sc.environment`` BEFORE the UDF below is created
      (see protoshim.py for why addPyFile cannot work here);
    - TWS requires a multi-column-family state store: RocksDB is our
      tuned-session default, but a bare session runs the HDFS-backed
      provider, so set it for the query's lifetime (the provider conf is
      read at query START, so the try/finally restore cannot race the
      running stream).

    Scale shape: identical to the v1 twin — one 8-byte counter per word,
    sharded by the groupBy key across executors, state in RocksDB, and
    update-mode re-emissions reduced with max(n) (counts only grow)."""
    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import running_word_count_tws

    ensure_protobuf()
    ship_shim_to_workers(spark)

    qname = f"tws_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-tws-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
    )
    counts = running_word_count_tws(stream, value_col="text")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            counts.writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    return spark.table(qname).groupBy("word").agg(F.max("n").alias("n"))


@register_query(
    "streaming_decontaminate_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below from the registry (text registers first)
)
def streaming_decontaminate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination-AT-INGEST: newly arriving training documents are
    checked against the static eval shingle set INSIDE a Structured
    Streaming plan — the nightly-crawl shape where the benchmark suite is
    fixed and the corpus streams in. Per micro-batch: explode the batch's
    shingles, broadcast-join the static eval set, aggregate per doc, and
    write the epoch's verdicts idempotently (overwrite into batch={epoch}).

    Determinism vs batching: a document is one row, so ALL its shingles
    live in whatever micro-batch carries it — the per-doc aggregate is
    batch-local and complete regardless of where availableNow cuts the
    file; the accumulated store equals the batch operator's output exactly
    (same oracle certifies both directions, the §1.3 twin requirement).

    Scale: the streaming stage is stateless (explode + broadcast join +
    batch-local agg — no state store, no watermark needed); the eval side
    is the bounded broadcast of ngram_decontaminate, or the packed bloom
    of ngram_decontaminate_bloom when the suite outgrows a hash set."""
    from kasper_spark.catalog import load_table

    n = 4
    docs = load_table(spark, sf_dir, "documents")

    def shingles(col):
        toks = F.filter(F.split(col, " "), lambda w: w != "")
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    ev = (
        docs.filter(F.col("doc_id") % 41 == 0)
        .select(F.explode(shingles(F.col("text"))).alias("shingle"), "doc_id")
        .groupBy("shingle")
        .agg(F.min("doc_id").alias("eval_doc_id"))
    )

    work = _workdir("kasper-sdecon-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(src_dir)
        .filter(F.col("doc_id") % 41 != 0)
        # one input partition per file otherwise (see streaming_lsh_dedup_twin)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def check_batch(df, epoch_id: int) -> None:
        out = (
            df.select("doc_id", F.explode(shingles(F.col("text"))).alias("shingle"))
            .join(F.broadcast(ev), "shingle")
            .groupBy("doc_id")
            .agg(
                F.count_distinct("shingle").alias("n_shared_shingles"),
                F.min("eval_doc_id").alias("min_eval_doc_id"),
            )
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(check_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


# the twin shares the batch operator's oracle verbatim (same output
# contract); bound at module end so a rename in operators.text fails loudly
from kasper_spark.registry import ORACLES as _OR  # noqa: E402

assert "ngram_decontaminate" in _OR, "batch decontamination oracle missing"
_OR["streaming_decontaminate_twin"] = _OR["ngram_decontaminate"]


def _stage_time_ordered(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    n_files: int,
    payload_col: str,
):
    """Stage events into ``n_files`` contiguous time-range files (file i's
    max ts <= file i+1's min ts; increasing mtimes => FileStreamSource
    discovers them oldest-first) carrying (user_id, event_id, ts,
    payload_col) — the event-time-ordered feed the order-dependent twins
    consume. ``n_files`` parametrizes how the stream is cut into
    micro-batches; twin answers must be invariant to it. Returns
    (src_dir, out_dir, ckpt_dir)."""
    from pyspark.sql.window import Window

    work = _workdir(prefix)
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev = normalize_driver_ts(raw, ("ts",)).select(
        "user_id", "event_id", "ts", payload_col
    )
    bucketed = ev.select(
        "*", F.ntile(n_files).over(Window.orderBy("ts", "event_id")).alias("bucket")
    )
    for i in range(1, n_files + 1):
        bucketed.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.parquet(
            os.path.join(src_dir, f"range={i:02d}")
        )
    return src_dir, out_dir, ckpt


def _staged_ewma_feed(
    spark: SparkSession, sf_dir: str, prefix: str, n_files: int = 4
):
    """The EWMA twins' cents stream over :func:`_stage_time_ordered`
    (pinned by tests/test_retrieval.py::
    test_streaming_ewma_invariant_to_batch_cuts).
    Returns (stream, out_dir, ckpt_dir)."""
    src_dir, out_dir, ckpt = _stage_time_ordered(
        spark, sf_dir, prefix, n_files, "value"
    )
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(os.path.join(src_dir, "range=*"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    return stream, out_dir, ckpt


def _staged_markov_feed(
    spark: SparkSession, sf_dir: str, prefix: str, n_files: int = 4
):
    """The Markov twin's event_type stream over :func:`_stage_time_ordered`.
    Returns (stream, out_dir, ckpt_dir)."""
    src_dir, out_dir, ckpt = _stage_time_ordered(
        spark, sf_dir, prefix, n_files, "event_type"
    )
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(os.path.join(src_dir, "range=*"))
    )
    return stream, out_dir, ckpt


@register_query(
    "streaming_ewma_anomaly_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below from the registry (temporal registers first)
)
def streaming_ewma_anomaly_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-EWMA anomaly detection AT INGEST: the per-user K=8 value
    history lives in the streaming state store and each arriving event is
    judged against the forecast from state — the alerting shape, where
    anomalies must fire as data lands, not in a nightly batch.

    Unlike the stateless twins, this operator's answer depends on ORDER:
    state must see each user's events in event-time order ACROSS
    micro-batches. The feed stages the events into four contiguous
    time-range files (file i's max ts <= file i+1's min ts) consumed with
    maxFilesPerTrigger=1, so the state genuinely carries trailing windows
    over batch boundaries — within a batch the handler sorts its group's
    rows by (ts, event_id), the same total order the batch operator's
    window uses. In production the same contract comes from the source
    (kafka per-key ordering within a partition + event-time reorder
    buffering); availableNow over time-split files reproduces it exactly,
    which is what lets the batch oracle certify the streaming path
    bit-for-bit.

    State is a per-user JSON list of the last K integer cents (~60 bytes)
    — millions of users fit one executor's RocksDB store; all arithmetic
    is the batch operator's BIGINT/exact-int-division discipline, in
    Python ints (arbitrary precision) and one float division each, so the
    emitted doubles are bit-identical to the JVM's and DuckDB's."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from pyspark.sql.window import Window

    from kasper_spark.operators.temporal import _EWMA_DEN, _EWMA_K

    stream, out_dir, ckpt = _staged_ewma_feed(spark, sf_dir, "kasper-sewma-")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("cents", LongType()),
            StructField("ewma", DoubleType()),
            StructField("ratio", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("hist_json", StringType())])
    k, den = _EWMA_K, _EWMA_DEN

    def detect(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import json

        import pandas as pd

        hist = json.loads(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        out = []
        for r in rows.itertuples():
            cents = int(r.cents)
            if len(hist) >= k:
                num = sum(
                    hist[-j] * (1 << (k - j)) for j in range(1, k + 1)
                )
                if abs(cents * den - num) > 2 * num:
                    # num == 0 (all-zero trailing history): the batch
                    # operator's double division emits NULL, not an error —
                    # mirror that instead of raising ZeroDivisionError and
                    # crashing the micro-batch on degenerate data.
                    out.append(
                        (
                            int(r.user_id),
                            int(r.event_id),
                            r.ts,
                            cents,
                            num / float(den),
                            (cents * den) / float(num) if num else None,
                        )
                    )
            hist.append(cents)
            if len(hist) > k:
                hist = hist[-k:]
        state.update((json.dumps(hist),))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "cents", "ewma", "ratio"]
        )

    anomalies = stream.groupBy("user_id").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        anomalies.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "ewma_anomaly_events" in _OR, "batch EWMA oracle missing"
_OR["streaming_ewma_anomaly_twin"] = _OR["ewma_anomaly_events"]


@register_query(
    "streaming_ewma_tws_twin",
    # identical output contract -> same oracle as the batch operator
    oracle=None,  # bound below
)
def streaming_ewma_tws_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA anomaly detector on the STATE-V2 runtime
    (transformWithStateInPandas): same time-ordered 4-file feed and
    per-user trailing-window state as streaming_ewma_anomaly_twin, but the
    state lives in a typed ValueState behind the Spark-4 StatefulProcessor
    protocol (JVM state server, protobuf transport, RocksDB column
    families). With streaming_tws_count_twin this makes TWO certified
    state-v2 operators — a running aggregation and an ORDER-dependent
    detector — both hash-checked against batch oracles.

    Driver-session plumbing mirrors streaming_tws_count_twin: ship the
    protobuf shim to workers before the UDF exists, and pin the RocksDB
    provider for the query's lifetime (bare sessions default to the
    single-column-family HDFS provider, which state v2 rejects)."""
    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import ewma_anomalies_tws

    ensure_protobuf()
    ship_shim_to_workers(spark)

    from kasper_spark.operators.temporal import _EWMA_DEN, _EWMA_K

    stream, out_dir, ckpt = _staged_ewma_feed(spark, sf_dir, "kasper-tewma-")
    anomalies = ewma_anomalies_tws(stream, _EWMA_K, _EWMA_DEN)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            anomalies.writeStream.foreachBatch(sink_batch)
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
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "ewma_anomaly_events" in _OR, "batch EWMA oracle missing (tws twin)"
_OR["streaming_ewma_tws_twin"] = _OR["ewma_anomaly_events"]


_PARALLEL_LANES = 4  # user-disjoint ingest lanes for the parallel-order twin


@register_query(
    "streaming_ewma_parallel_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below
)
def streaming_ewma_parallel_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA anomaly detector under PARALLEL ingest — the production
    ordering contract, certified. streaming_ewma_anomaly_twin serializes
    the whole stream (one global time-split feed, maxFilesPerTrigger=1),
    which proves order-dependence but over-claims what a real source
    guarantees: Kafka orders per KEY (partition), not globally. This twin
    feeds FOUR user-disjoint staged sources (lane = user_id % 4, each
    lane time-split into contiguous range files, each source
    maxFilesPerTrigger=1) unioned into one stream, so every micro-batch
    carries up to four lanes' files at once — events from different users
    arrive genuinely interleaved and in no global order, exactly like a
    four-partition topic. Per-user order still holds (a user's events
    live in one lane; that lane's files are consumed oldest-first by its
    own source; the handler sorts each user's batch rows by
    (ts, event_id)) — and the batch oracle certifies the result
    bit-for-bit, proving the detector needs only the per-key contract,
    not global serialization.

    State/arithmetic identical to streaming_ewma_anomaly_twin: per-user
    JSON list of the last K integer cents; Python ints + one float
    division reproduce the JVM/DuckDB doubles exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from pyspark.sql.window import Window

    from kasper_spark.operators.temporal import _EWMA_DEN, _EWMA_K

    work = _workdir("kasper-sewpar-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev = normalize_driver_ts(raw, ("ts",)).select(
        "user_id", "event_id", "ts", "value"
    )
    n_files = 3  # time slices per lane
    lanes = ev.select(
        "*",
        F.pmod(F.col("user_id"), F.lit(_PARALLEL_LANES)).alias("lane"),
        F.ntile(n_files)
        .over(
            Window.partitionBy(F.pmod(F.col("user_id"), F.lit(_PARALLEL_LANES)))
            .orderBy("ts", "event_id")
        )
        .alias("bucket"),
    )
    for u in range(_PARALLEL_LANES):
        for i in range(1, n_files + 1):
            lanes.filter((F.col("lane") == u) & (F.col("bucket") == i)).drop(
                "lane", "bucket"
            ).coalesce(1).write.parquet(
                os.path.join(src_dir, f"lane={u}", f"range={i:02d}")
            )

    def lane_stream(u: int):
        return (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(os.path.join(src_dir, f"lane={u}", "range=*"))
        )

    stream = lane_stream(0)
    for u in range(1, _PARALLEL_LANES):
        stream = stream.union(lane_stream(u))
    stream = stream.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("cents", LongType()),
            StructField("ewma", DoubleType()),
            StructField("ratio", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("hist_json", StringType())])
    k, den = _EWMA_K, _EWMA_DEN

    def detect(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import json

        import pandas as pd

        hist = json.loads(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        out = []
        for r in rows.itertuples():
            cents = int(r.cents)
            if len(hist) >= k:
                num = sum(
                    hist[-j] * (1 << (k - j)) for j in range(1, k + 1)
                )
                if abs(cents * den - num) > 2 * num:
                    # num == 0 (all-zero trailing history): the batch
                    # operator's double division emits NULL, not an error —
                    # mirror that instead of raising ZeroDivisionError and
                    # crashing the micro-batch on degenerate data.
                    out.append(
                        (
                            int(r.user_id),
                            int(r.event_id),
                            r.ts,
                            cents,
                            num / float(den),
                            (cents * den) / float(num) if num else None,
                        )
                    )
            hist.append(cents)
            if len(hist) > k:
                hist = hist[-k:]
        state.update((json.dumps(hist),))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "cents", "ewma", "ratio"]
        )

    anomalies = stream.groupBy("user_id").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        anomalies.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not any(p.startswith("batch=") for p in os.listdir(out_dir)):
        raise RuntimeError(
            "streaming_ewma_parallel_twin: no micro-batch ran over "
            f"{src_dir} — the lane sources found no input files"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "ewma_anomaly_events" in _OR, "batch EWMA oracle missing (parallel twin)"
_OR["streaming_ewma_parallel_twin"] = _OR["ewma_anomaly_events"]


@register_query("streaming_ohlc_twin")  # oracle bound at module end (batch OHLC)
def streaming_ohlc_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars computed through Structured Streaming — the batch
    ohlc_bars_hourly re-expressed as a watermarked window aggregation
    (parquet file stream -> window agg with argmin/argmax-by-struct ->
    availableNow drain -> memory sink), checked against the SAME oracle.

    What this certifies beyond the tumbling twin: streaming state can
    carry ORDERED-STRUCT extrema (min/max over a (ts, eid, value) struct
    — the open/close of a bar) incrementally across micro-batches, not
    just commutative count/sum — i.e. the state merge for argmin/argmax
    is exercised, and the decimal-exact sum rides along in the same state
    row. Complete output mode + availableNow keeps every window in the
    final table while still driving the event-time watermark path.

    Scale: identical state layout to any windowed agg — one state row per
    (window, event_type) carrying 5 scalars + 2 structs; late data past
    the 1 h watermark would be dropped in a true continuous run."""
    qname = f"sohlc_{uuid.uuid4().hex[:10]}"
    work = _workdir("kasper-sohlc-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = spark.readStream.schema(raw.schema).format("parquet").load(src_dir)
    stream = normalize_driver_ts(stream, ("ts",))
    o_struct = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(o_struct).getField("v").alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max(o_struct).getField("v").alias("close_value"),
            F.sum(F.col("value").cast("decimal(38,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("bar_hour"),
            "n_events",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


assert "ohlc_bars_hourly" in _OR, "batch OHLC oracle missing (streaming twin)"
_OR["streaming_ohlc_twin"] = _OR["ohlc_bars_hourly"]


# ---------------------------------------------------------------------------
# Markov transition matrix AT INGEST (round 8, continued)
# ---------------------------------------------------------------------------


def markov_partial_counts(stream: DataFrame) -> DataFrame:
    """Stateful per-batch transition counting: per user, state carries the
    LAST event_type seen, so consecutive pairs that straddle a micro-batch
    boundary are still counted exactly once. Emits per-(user, batch)
    partial (prev_type, next_type, n) rows — integers, so the final
    cross-batch aggregation is exact regardless of how the stream was cut."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("prev_type", StringType()),
            StructField("next_type", StringType()),
            StructField("n", LongType()),
        ]
    )
    state_schema = StructType([StructField("last_type", StringType())])

    def count_pairs(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import pandas as pd

        prev = state.get[0] if state.exists else None
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        counts: dict = {}
        for r in rows.itertuples():
            t = r.event_type
            if prev is not None:
                counts[(prev, t)] = counts.get((prev, t), 0) + 1
            prev = t
        state.update((prev,))
        yield pd.DataFrame(
            [(p, n, c) for (p, n), c in counts.items()],
            columns=["prev_type", "next_type", "n"],
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        count_pairs,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register_query(
    "streaming_markov_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_markov_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Markov transition matrix built AT INGEST: per-user streaming
    state carries only the last event_type (one string per user — the
    minimal sufficient state), each micro-batch emits exact integer
    partial counts, and the final matrix aggregates the partials — so the
    full per-user history is never resident anywhere, yet the result is
    bit-identical to the batch operator (same DuckDB oracle certifies
    both). Order contract: the staged feed is event-time contiguous across
    files and each group's rows sort by (ts, event_id) inside a batch —
    the same total order the batch window uses; in production kafka's
    per-key partition ordering provides it.

    Scale: state is O(users) strings in RocksDB, partial counts are
    |types|^2 per user-batch at most, and the final aggregation touches
    partials, not events."""
    from pyspark.sql.window import Window

    stream, out_dir, ckpt = _staged_markov_feed(spark, sf_dir, "kasper-smkv-")
    partials = markov_partial_counts(stream)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        partials.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
    trans = out.groupBy("prev_type", "next_type").agg(
        F.sum("n").cast("long").alias("n_trans")
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


assert "markov_event_transitions" in _OR, "batch Markov oracle missing"
_OR["streaming_markov_twin"] = _OR["markov_event_transitions"]


# ---------------------------------------------------------------------------
# Fixed-target CUSUM alarm AT INGEST (round 8, continued)
# ---------------------------------------------------------------------------


def cusum_alarm_stream(stream: DataFrame, target: int, slack: int, thresh: int) -> DataFrame:
    """Stateful per-event CUSUM: per user, state carries exactly TWO
    BIGINTs — the running deviation prefix and its running minimum — which
    is the whole sufficient statistic of the closed form
    S_i = prefix_i - min(0, running_min prefix). Emits alarm rows
    (excess > thresh) as they happen; all arithmetic is Python ints
    (arbitrary precision) on integer cents, so the emitted values are
    bit-identical to the batch window plan's."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("cents", LongType()),
            StructField("excess", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("prefix", LongType()), StructField("minpre", LongType())]
    )

    def scan(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import pandas as pd

        prefix, minpre = state.get if state.exists else (0, 0)
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        out = []
        for r in rows.itertuples():
            cents = int(r.cents)
            prefix += cents - target - slack
            minpre = min(minpre, prefix)
            excess = prefix - min(0, minpre)
            if excess > thresh:
                out.append((int(r.user_id), int(r.event_id), r.ts, cents, excess))
        state.update((prefix, minpre))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "cents", "excess"]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register_query(
    "streaming_cusum_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_cusum_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-target CUSUM alarm AT INGEST — the reason the rule's
    constants are fixed up front: no global statistics pass is needed, so
    the monitor runs on the live stream with O(users) state (two BIGINTs
    each, vs the EWMA twin's K-value history). Alarms fire the moment the
    cumulative excess crosses the threshold, and the batch oracle
    certifies every emitted row bit-for-bit. Order contract as the other
    order-dependent twins: event-time-contiguous staged files +
    maxFilesPerTrigger=1, per-batch (ts, event_id) sort."""
    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    stream, out_dir, ckpt = _staged_ewma_feed(spark, sf_dir, "kasper-scus-")
    alarms = cusum_alarm_stream(
        stream, _UCUSUM_TARGET, _UCUSUM_SLACK, _UCUSUM_THRESH
    )

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        alarms.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "cusum_user_spend_alarm" in _OR, "batch user-CUSUM oracle missing"
_OR["streaming_cusum_twin"] = _OR["cusum_user_spend_alarm"]


@register_query(
    "streaming_cusum_tws_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_cusum_tws_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-target CUSUM alarm on the STATE-V2 runtime
    (transformWithStateInPandas): same time-ordered feed and two-BIGINT
    per-user state as streaming_cusum_twin, but the state lives in a typed
    ValueState ("prefix long, minpre long") behind the Spark-4
    StatefulProcessor protocol. With streaming_tws_count_twin and
    streaming_ewma_tws_twin this makes THREE certified state-v2 operators —
    a running aggregation, a trailing-window detector, and a
    sufficient-statistic scan — all hash-checked against batch oracles.

    Driver-session plumbing mirrors the other TWS twins: ship the protobuf
    shim to workers before the UDF exists, pin the RocksDB provider for
    the query's lifetime."""
    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import cusum_alarms_tws

    ensure_protobuf()
    ship_shim_to_workers(spark)

    from kasper_spark.operators.temporal import (
        _UCUSUM_SLACK,
        _UCUSUM_TARGET,
        _UCUSUM_THRESH,
    )

    stream, out_dir, ckpt = _staged_ewma_feed(spark, sf_dir, "kasper-tcus-")
    alarms = cusum_alarms_tws(
        stream, _UCUSUM_TARGET, _UCUSUM_SLACK, _UCUSUM_THRESH
    )

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            alarms.writeStream.foreachBatch(sink_batch)
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
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "cusum_user_spend_alarm" in _OR, "batch user-CUSUM oracle missing (tws)"
_OR["streaming_cusum_tws_twin"] = _OR["cusum_user_spend_alarm"]


# ---------------------------------------------------------------------------
# Inter-arrival quantiles AT INGEST (round 8, continued)
# ---------------------------------------------------------------------------


def interarrival_partial_counts(stream: DataFrame) -> DataFrame:
    """Stateful per-batch gap counting: per user, state carries a tiny
    JSON map event_type -> LAST epoch second, so gaps that straddle a
    micro-batch boundary are still counted exactly once while keeping the
    group count at |users| (grouping by (type, user) instead multiplies
    the per-group pandas overhead by |types| - measured 46 s -> 14 s at
    sf0.001). Emits integer (event_type, gap, n) partials whose
    cross-batch sum equals the batch histogram exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("gap", LongType()),
            StructField("n", LongType()),
        ]
    )
    state_schema = StructType([StructField("last_json", StringType())])

    def count_gaps(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import json

        import pandas as pd

        last = json.loads(state.get[0]) if state.exists else {}
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        counts: dict = {}
        for r in rows.itertuples():
            etype = r.event_type
            epoch = int(r.ts.timestamp())  # whole seconds (floor), matches
            # the batch plan's cast-to-long truncation
            prev = last.get(etype)
            if prev is not None:
                k = (etype, epoch - prev)
                counts[k] = counts.get(k, 0) + 1
            last[etype] = epoch
        state.update((json.dumps(last),))
        yield pd.DataFrame(
            [(t, g, c) for (t, g), c in counts.items()],
            columns=["event_type", "gap", "n"],
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        count_gaps,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register_query(
    "streaming_interarrival_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_interarrival_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival quantiles AT INGEST: per-user streaming state is a
    |types|-entry map holding one BIGINT per (type) — each type's last
    epoch second, one BIGINT of information per (type, user) pair — each
    micro-batch emits
    exact integer gap partials, and the final rank selection runs the
    SAME histogram tail as the batch operator (gap_quantiles_from_hist) —
    so the p50/p90/p99 latency readout a capacity dashboard serves is
    certified bit-for-bit against the batch oracle while never holding
    more than one timestamp per key. Fourth order-dependent ingest twin
    (after EWMA, Markov, CUSUM)."""
    from kasper_spark.operators.temporal import gap_quantiles_from_hist

    stream, out_dir, ckpt = _staged_markov_feed(spark, sf_dir, "kasper-sgap-")
    partials = interarrival_partial_counts(stream)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        partials.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hist = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("event_type", "gap")
        .agg(F.sum("n").cast("long").alias("c"))
    )
    return gap_quantiles_from_hist(spark, hist)


assert "interarrival_quantiles_by_type" in _OR, "batch gap-quantile oracle missing"
_OR["streaming_interarrival_twin"] = _OR["interarrival_quantiles_by_type"]


@register_query(
    "streaming_dup_matrix_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below from the registry (dedup registers first)
)
def streaming_dup_matrix_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross_source_dup_matrix AT INGEST: the source x source duplicate
    matrix maintained INCREMENTALLY as documents stream in. Each
    micro-batch emits its PARTIAL per-(digest, source) counts — the
    mergeable sufficient statistic (counts sum across batches, and the
    whole matrix derives from the summed counts) — written idempotently
    per epoch; the final read merges the partials and runs the identical
    count-level self-join. No pair is ever materialized per batch, and no
    state store is needed: the partial-count relation IS the state,
    exactly the incremental-view discipline of incremental_agg_merge.

    Determinism vs batching: counts are order- and cut-invariant (sums),
    so ANY partition of the corpus into micro-batches merges to the batch
    operator's counts — the same oracle certifies both directions (the
    §1.3 twin requirement).

    Scale: per batch the shuffle is the batch's own (digest, source)
    partial aggregation (map-side combined); the merge aggregates
    #batches x #active-(digest,source) rows — at 100 TB the merge keys by
    digest, so it shards like any groupBy, and the count-level self-join
    stays one row per (digest, source), never c^2 pairs."""
    from kasper_spark.operators.dedup import _tokens as _dedup_tokens

    canon = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(_dedup_tokens(F.col("text"))))
        ).cast("binary")
    )

    work = _workdir("kasper-sdupmx-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        # recursiveFileLookup: the staged path may be a single parquet FILE
        # (driver testdata) or a DIRECTORY of part files (any Spark-written
        # dataset, e.g. tools/scale10x.py) — without it the file stream
        # source sees zero files under a directory and silently runs zero
        # batches (caught by the loud guard below)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        # one input partition per file otherwise (see streaming_lsh_dedup_twin)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    rows = stream.select(canon.alias("dig"), "source")

    # the aggregation runs INSIDE foreachBatch so each epoch's output is
    # the batch's OWN counts (a streaming groupBy before the sink would
    # maintain cumulative state and update-mode re-emissions would
    # double-count under the partial-sum merge below)
    def sink_batch(df, epoch_id: int) -> None:
        df.groupBy("dig", "source").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ).write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        rows.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_dup_matrix_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    g = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("dig", "source")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    a = g.select("dig", F.col("source").alias("source_a"), F.col("c").alias("ca"))
    b = g.select("dig", F.col("source").alias("source_b"), F.col("c").alias("cb"))
    x = a.join(b, ["dig"]).filter(F.col("source_a") <= F.col("source_b")).select(
        "dig",
        "source_a",
        "source_b",
        F.when(
            F.col("source_a") == F.col("source_b"),
            F.expr("ca * (ca - 1) div 2"),
        )
        .otherwise(F.col("ca") * F.col("cb"))
        .alias("np"),
    )
    return (
        x.filter(F.col("np") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("np").cast("long").alias("n_dup_pairs"),
            F.count_distinct("dig").cast("long").alias("n_shared_digests"),
        )
    )


assert "cross_source_dup_matrix" in _OR, "batch dup-matrix oracle missing"
_OR["streaming_dup_matrix_twin"] = _OR["cross_source_dup_matrix"]


def _ivf_assign_twin_oracle() -> str:
    from kasper_spark.operators.similarity import (
        _IVF_K,
        dot_double_sql,
        dot_exact_sql,
    )

    return f"""
    WITH e AS (
        SELECT vec_id, embedding,
               sqrt({dot_exact_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
        FROM e WHERE vec_id < {_IVF_K}
    )
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, cent.cid,
            ROW_NUMBER() OVER (
                PARTITION BY e.vec_id
                ORDER BY {dot_double_sql('e.embedding', 'cent.cemb')} / (e.nrm * cent.cnrm) DESC,
                         cent.cid
            ) AS rn
        FROM e CROSS JOIN cent
        WHERE e.vec_id >= {_IVF_K}
    ) WHERE rn = 1
    """


@register_query("streaming_ivf_assign_twin", oracle=_ivf_assign_twin_oracle())
def streaming_ivf_assign_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance AT INGEST: the coarse quantizer (the fixed-K
    centroid set of ann_ivf_topk, built offline from the static table) is
    broadcast into a Structured Streaming plan, and every ARRIVING vector
    is assigned to its nearest centroid list inside its micro-batch — the
    standard way a vector platform keeps an IVF index current between
    rebuilds (assignment is embarrassingly incremental; only training is
    offline). First streaming twin over the embeddings table.

    Determinism vs batching: each vector's assignment depends only on the
    vector and the static centroids, so the accumulated assignments are
    invariant to how availableNow cuts the feed — the batch oracle (the
    assign stage of ann_ivf_topk, restricted to the non-centroid vectors)
    certifies the result hash-exactly.

    Scale: per batch this is a map-side broadcast nested-loop over K=32
    centroids (exactly ann_ivf_topk's assignment shape) + a per-vector
    row_number over K candidate rows, partitioned by vec_id; no state
    store, no corpus-sized anything. The centroid broadcast is computed
    once per micro-batch from the static table — on a cluster it would be
    a pinned broadcast variable; the plan shape is identical."""
    from pyspark.sql.window import Window

    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import _IVF_K, dot_double, norm_exact

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        norm_exact(F.col("embedding")).alias("cnrm"),
    )

    work = _workdir("kasper-sivf-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "embeddings.parquet"),
        os.path.join(src_dir, "embeddings.parquet"),
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        # single-file AND directory-shaped parquet (see streaming_dup_matrix_twin)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .filter(F.col("vec_id") >= _IVF_K)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def assign_batch(df, epoch_id: int) -> None:
        cos = dot_double(F.col("embedding"), F.col("cemb")) / (
            F.col("nrm") * F.col("cnrm")
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
        out = (
            df.select("vec_id", "embedding", norm_exact(F.col("embedding")).alias("nrm"))
            .join(F.broadcast(cent))
            .select("vec_id", "cid", cos.alias("ccos"))
            .select("vec_id", "cid", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(assign_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_ivf_assign_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


# ---------------------------------------------------------------------------
# Session turn structure AT INGEST (round 9): 5th order-dependent twin
# ---------------------------------------------------------------------------


def turn_structure_stream(stream: DataFrame) -> DataFrame:
    """Stateful per-event double-RLE: per user, state carries the open
    session's whole sufficient statistic — (session_no, last event-time,
    last type, event/turn counts, max and current run length) — seven
    scalars, O(users) total. Each micro-batch emits ONE revision row per
    (user, session) it touched; within a session n_events strictly
    increases across revisions, so the final reduce keeps the max-n_events
    row per (user, session) and closed sessions are never revised again."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_no", LongType()),
            StructField("n_events", LongType()),
            StructField("n_turns", LongType()),
            StructField("max_run_len", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_no", LongType()),
            StructField("last_ts", LongType()),
            StructField("last_type", StringType()),
            StructField("n_events", LongType()),
            StructField("n_turns", LongType()),
            StructField("max_run", LongType()),
            StructField("run_len", LongType()),
        ]
    )

    def scan(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import pandas as pd

        if state.exists:
            sess, last_ts, last_type, n_ev, n_turn, max_run, run_len = state.get
        else:
            sess, last_ts, last_type = 0, 0, ""
            n_ev = n_turn = max_run = run_len = 0
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        touched: dict[int, tuple[int, int, int]] = {}
        for r in rows.itertuples():
            ts = int(r.ts.value // 10**9)
            if sess == 0 or ts - last_ts > 1800:
                sess += 1
                n_ev = n_turn = max_run = run_len = 0
                last_type = ""  # lag is null at a session start -> new turn
            n_ev += 1
            if r.event_type != last_type:
                n_turn += 1
                run_len = 1
            else:
                run_len += 1
            max_run = max(max_run, run_len)
            last_type = r.event_type
            last_ts = ts
            touched[sess] = (n_ev, n_turn, max_run)
        state.update((sess, last_ts, last_type, n_ev, n_turn, max_run, run_len))
        yield pd.DataFrame(
            [(int(key[0]), s, *v) for s, v in sorted(touched.items())],
            columns=["user_id", "session_no", "n_events", "n_turns", "max_run_len"],
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register_query(
    "streaming_turn_structure_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_turn_structure_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_turn_structure AT INGEST — the conversation-threading audit
    maintained live: sessions open, collect turns, and close as the gap
    rule fires, entirely from per-user state (no watermark, no global
    pass; the 30-minute rule needs only the previous event). Fifth
    order-dependent twin (after EWMA x2, Markov, CUSUM, inter-arrival);
    order contract as the others: event-time-contiguous staged files +
    maxFilesPerTrigger=1, per-batch (ts, event_id) sort.

    The revision discipline (emit the touched session's CURRENT aggregate
    each batch, reduce to the max-n_events revision at read time) is how
    an incremental sink serves "current session state" queries mid-stream
    while still converging to the batch answer at the end — both faces
    certified by the one oracle."""
    stream, out_dir, ckpt = _staged_markov_feed(spark, sf_dir, "kasper-sturn-")
    revisions = turn_structure_stream(stream)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        revisions.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rev = spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
    final = (
        rev.groupBy("user_id", "session_no")
        .agg(
            F.max(
                F.struct("n_events", "n_turns", "max_run_len")
            ).alias("s")
        )
        .select(
            "user_id",
            "session_no",
            F.col("s.n_events").alias("n_events"),
            F.col("s.n_turns").alias("n_turns"),
            F.col("s.max_run_len").alias("max_run_len"),
        )
    )
    return final.select(
        "user_id",
        "session_no",
        "n_events",
        "n_turns",
        "max_run_len",
        (
            F.col("n_turns").cast("double") / F.col("n_events").cast("double")
        ).alias("turn_ratio"),
    )


assert "session_turn_structure" in _OR, "batch turn-structure oracle missing"
_OR["streaming_turn_structure_twin"] = _OR["session_turn_structure"]


@register_query(
    "streaming_benford_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (analytics registers first)
)
def streaming_benford_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """benford_digit_audit AT INGEST: the first-digit counts are a
    mergeable sufficient statistic (integer counts sum across any cut of
    the stream), so each micro-batch emits its own 9-row partial and the
    read-side merge + Benford projection reproduce the batch audit
    bit-for-bit — the live fraud/unit-mixup monitor shape. Same
    incremental-view discipline as streaming_dup_matrix_twin; no state
    store, cut-invariant by construction."""
    from kasper_spark.operators.analytics import (
        benford_digit_counts,
        benford_report_from_counts,
    )

    work = _workdir("kasper-sbenford-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    stream = (
        # schema = ONLY the column the audit reads: parquet maps declared
        # columns by name, so `ts` (TIMESTAMP(NANOS) in the driver
        # testdata, INT96 in Spark-rewritten copies) is never scanned and
        # its physical-type drift cannot break the stream
        spark.readStream.schema("value double")
        # single-file AND directory-shaped parquet (see streaming_dup_matrix_twin)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def sink_batch(df, epoch_id: int) -> None:
        benford_digit_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_benford_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("digit")
        .agg(F.sum("n_observed").cast("long").alias("n_observed"))
    )
    return benford_report_from_counts(merged)


assert "benford_digit_audit" in _OR, "batch Benford oracle missing"
_OR["streaming_benford_twin"] = _OR["benford_digit_audit"]


@register_query(
    "streaming_mixture_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (curation registers first)
)
def streaming_mixture_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality_weighted_mixture AT INGEST: per-source (n_docs, n_kept)
    counts are mergeable integer partials — each micro-batch computes the
    scan-stage quality logits for ITS documents only and emits per-source
    partial counts; the read-side merge + the identical weight/quota
    projection reproduce the batch mixture exactly. This is how mixture
    weights stay current as a crawl lands, without any global pass.
    Incremental-view discipline (dup-matrix/Benford twins); no state
    store, cut-invariant by construction."""
    from pyspark.sql import Column
    from pyspark.sql.window import Window

    from kasper_spark.operators.curation import (
        _CLF_BIAS,
        _CLF_BUCKETS,
        _CLF_MIX,
        _MIX_BUDGET_DOCS,
    )

    work = _workdir("kasper-smix-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema("text string, source string")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def weight(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % _CLF_BUCKETS
        )
        return (bucket * F.lit(_CLF_MIX)) % 17 - 8

    logit = F.lit(_CLF_BIAS) + F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )

    def sink_batch(df, epoch_id: int) -> None:
        df.select("source", (logit > 0).cast("long").alias("kept")).groupBy(
            "source"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
        ).write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_mixture_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    src = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_kept").cast("long").alias("n_kept"),
        )
    )
    w = src.withColumn(
        "adj_w_micros",
        F.expr(
            "(CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)"
            " * n_kept) div n_docs"
        ),
    )
    w_all = Window.partitionBy()
    tot = F.sum("adj_w_micros").over(w_all).cast("long")
    return w.select(
        "source",
        "n_docs",
        "n_kept",
        "adj_w_micros",
        (
            F.lit(100.0) * (F.col("adj_w_micros").cast("double") / tot.cast("double"))
        ).alias("share_pct"),
        F.floor(
            (F.lit(_MIX_BUDGET_DOCS) * F.col("adj_w_micros")).cast("double")
            / tot.cast("double")
        )
        .cast("long")
        .alias("quota_docs"),
    )


# oracle binding lives at the END of operators/curation.py: curation is
# imported AFTER this module, so quality_weighted_mixture's oracle does
# not exist yet at this point in the import order.


def funnel_attribution_stream(stream: DataFrame) -> DataFrame:
    """Stateful per-event last-touch attribution: per user, state is FOUR
    longs — the latest view epoch, the latest QUALIFYING click epoch
    (within 1h of a preceding view), and the running purchase/attributed
    counts. Each micro-batch emits one revision row per purchase-holding
    user it touched; counts are non-decreasing, so the read-side
    max-struct reduce keeps the final revision (the turn-twin
    discipline)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    _HOUR_US = 3_600 * 1_000_000

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_purchases", LongType()),
            StructField("n_attributed", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_view", LongType()),
            StructField("last_qclick", LongType()),
            StructField("n_purch", LongType()),
            StructField("n_attr", LongType()),
        ]
    )

    def scan(key, pdf_iter, state):
        # nested imports: must pickle by value (workers run from foreign cwd)
        import pandas as pd

        last_view, last_qclick, n_purch, n_attr = (
            state.get if state.exists else (-1, -1, 0, 0)
        )
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        for r in rows.itertuples():
            ts_us = int(r.ts.value // 1000)
            et = r.event_type
            if et == "view":
                last_view = ts_us
            elif et == "click":
                if last_view >= 0 and ts_us <= last_view + _HOUR_US:
                    last_qclick = ts_us
            elif et == "purchase":
                n_purch += 1
                if last_qclick >= 0 and ts_us <= last_qclick + _HOUR_US:
                    n_attr += 1
        state.update((last_view, last_qclick, n_purch, n_attr))
        out = (
            [(int(key[0]), n_purch, n_attr)] if n_purch > 0 else []
        )
        yield pd.DataFrame(
            out, columns=["user_id", "n_purchases", "n_attributed"]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register_query(
    "streaming_funnel_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (analytics registers first)
)
def streaming_funnel_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """funnel_attribution_windowed AT INGEST — the 6th order-dependent
    twin: last-touch attribution with conversion windows maintained live
    from four longs of per-user state (no watermark, no global pass; the
    qualifying-touchpoint rule only ever looks backward). The batch
    operator's two running-max window passes collapse to a single
    in-order state scan at ingest — same answer, certified by the same
    oracle. Order contract as the other order-dependent twins:
    event-time-contiguous staged files + maxFilesPerTrigger=1, per-batch
    (ts, event_id) sort."""
    stream, out_dir, ckpt = _staged_markov_feed(spark, sf_dir, "kasper-sfun-")
    revisions = funnel_attribution_stream(stream)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        revisions.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_purchases", "n_attributed")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_purchases").alias("n_purchases"),
            F.col("s.n_attributed").alias("n_attributed"),
        )
    )
    return final.select(
        "user_id",
        "n_purchases",
        "n_attributed",
        (
            F.col("n_attributed").cast("double") / F.col("n_purchases").cast("double")
        ).alias("attribution_rate"),
    )


assert "funnel_attribution_windowed" in _OR, "batch funnel oracle missing"
_OR["streaming_funnel_twin"] = _OR["funnel_attribution_windowed"]


@register_query(
    "streaming_acf_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (temporal registers first)
)
def streaming_acf_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hourly_autocorrelation AT INGEST: the hourly count table is a
    mergeable sufficient statistic (integer counts sum across any cut of
    the stream), so each micro-batch emits ITS events' per-hour partial
    counts and the read-side merge + correlogram projection reproduce the
    batch ACF bit-for-bit — the live "is my traffic still daily-cyclic"
    monitor shape. Fourth incremental-view twin (dup matrix, mixture,
    Benford); no state store, cut-invariant by construction (the feed is
    staged into 4 unordered part files consumed one per trigger — counts
    need no ordering, unlike the EWMA/CUSUM twins).

    ts handling: the staged copy is written from the NORMALIZED batch
    reader (micros timestamps), so the stream schema declares
    `ts timestamp` without tripping the driver testdata's
    TIMESTAMP(NANOS) physical type; hour truncation is sub-second-
    insensitive, so the staged micros and the oracle's nanos agree."""
    work = _workdir("kasper-sacf-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select("ts").repartition(4).write.parquet(
        src_dir
    )
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    from kasper_spark.operators.temporal import (
        acf_from_hourly_counts,
        hourly_event_counts,
    )

    def sink_batch(df, epoch_id: int) -> None:
        hourly_event_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_acf_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("hour_ts")
        .agg(F.sum("x").cast("long").alias("x"))
    )
    return acf_from_hourly_counts(spark, merged)


assert "hourly_autocorrelation" in _OR, "batch ACF oracle missing"
_OR["streaming_acf_twin"] = _OR["hourly_autocorrelation"]


@register_query(
    "streaming_funnel_tws_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below
)
def streaming_funnel_tws_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch funnel attribution on the STATE-V2 runtime — the 7th
    order-dependent twin and the THIRD order-dependent operator proven on
    transformWithStateInPandas (EWMA, CUSUM, now the funnel): the four
    longs of per-user attribution state live in a typed ValueState behind
    the StatefulProcessor protocol (JVM state server, protobuf transport,
    RocksDB column families), and the same batch oracle certifies the
    result bit-for-bit. Order contract and read-side max-struct revision
    reduce exactly as streaming_funnel_twin.

    Driver-session plumbing mirrors streaming_ewma_tws_twin: ship the
    protobuf shim to workers before the UDF exists, and pin the RocksDB
    provider for the query's lifetime."""
    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import funnel_attribution_tws

    ensure_protobuf()
    ship_shim_to_workers(spark)

    stream, out_dir, ckpt = _staged_markov_feed(spark, sf_dir, "kasper-tfun-")
    revisions = funnel_attribution_tws(stream)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            revisions.writeStream.foreachBatch(sink_batch)
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
    final = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_purchases", "n_attributed")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_purchases").alias("n_purchases"),
            F.col("s.n_attributed").alias("n_attributed"),
        )
    )
    return final.select(
        "user_id",
        "n_purchases",
        "n_attributed",
        (
            F.col("n_attributed").cast("double") / F.col("n_purchases").cast("double")
        ).alias("attribution_rate"),
    )


assert "funnel_attribution_windowed" in _OR, "batch funnel oracle missing (tws)"
_OR["streaming_funnel_tws_twin"] = _OR["funnel_attribution_windowed"]


@register_query(
    "streaming_hll_sliding_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (analytics registers first)
)
def streaming_hll_sliding_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hll_sliding_distinct_users AT INGEST — mergeable SKETCHES as the
    streaming state (5th incremental-view twin, and the first whose
    partials are binary sketch blobs rather than integer counts): each
    micro-batch sketches ITS events per hour and emits the partial
    sketches (plus its hour-deduped pairs for the error-contract's exact
    side); the read-side hll_union_agg merge equals the one-shot hourly
    sketch REGISTER-FOR-REGISTER (HLL registers are per-bucket maxima —
    order- and cut-invariant by algebra), so the sliding-window estimates
    and their certified error bounds reproduce the batch operator
    bit-for-bit. This is the production shape for streaming distinct
    dashboards: sketch at ingest, union at query time, never re-scan.

    ts handling as streaming_acf_twin: the staged copy is written from
    the normalized batch reader, so the stream schema declares plain
    timestamps."""
    from kasper_spark.operators.analytics import _HLL_LGK, hll_window_report

    work = _workdir("kasper-shll-")
    src_dir = os.path.join(work, "src")
    out_sk = os.path.join(work, "out", "sk")
    out_pairs = os.path.join(work, "out", "pairs")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select("ts", "user_id").repartition(
        4
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    def sink_batch(df, epoch_id: int) -> None:
        hourly = df.select(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id"
        )
        hourly.groupBy("hour").agg(
            F.hll_sketch_agg("user_id", F.lit(_HLL_LGK)).alias("sk")
        ).write.mode("overwrite").parquet(os.path.join(out_sk, f"batch={epoch_id}"))
        hourly.distinct().write.mode("overwrite").parquet(
            os.path.join(out_pairs, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_sk):
        raise RuntimeError(
            f"streaming_hll_sliding_twin: no micro-batch ran over {src_dir}"
        )
    sketches = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_sk)
        .groupBy("hour")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    pairs = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_pairs)
        .distinct()
    )
    return hll_window_report(sketches, pairs)


assert "hll_sliding_distinct_users" in _OR, "batch HLL-sliding oracle missing"
_OR["streaming_hll_sliding_twin"] = _OR["hll_sliding_distinct_users"]


@register_query(
    "streaming_auc_twin",
    # identical output contract to the batch operator -> same oracle
    oracle=None,  # bound below (evaluation registers first)
)
def streaming_auc_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auc_label_quality AT INGEST — the live label-quality dashboard
    shape (6th incremental-view twin): the (source, score) histogram with
    positive counts is the op's mergeable sufficient statistic, so each
    micro-batch computes scan-stage logits/labels for ITS documents only
    and emits per-(source, score) integer partials; the read-side merge +
    the identical rank-histogram AUC projection reproduce the batch audit
    bit-for-bit. Cut-invariant by construction — no state store, no
    ordering requirement."""
    from kasper_spark.operators.evaluation import (
        _ANNOTATORS,
        _logit_expr,
        _noise_expr,
        auc_from_score_counts,
    )

    work = _workdir("kasper-sauc-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema("text string, source string")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def sink_batch(df, epoch_id: int) -> None:
        logit = _logit_expr()
        scored = df.select(
            "source",
            logit.cast("bigint").alias("score"),
            (
                sum(
                    ((logit + _noise_expr(k)) > 0).cast("bigint")
                    for k in _ANNOTATORS
                )
                >= 2
            )
            .cast("bigint")
            .alias("pos"),
        )
        scored.groupBy("source", "score").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("cnt_pos"),
        ).write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_auc_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("source", "score")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("cnt_pos").cast("long").alias("cnt_pos"),
        )
    )
    return auc_from_score_counts(merged)


# oracle bound at the END of operators/evaluation.py: this module imports
# BEFORE evaluation in the operators package, so binding here would raise
# at import (the streaming_mixture_twin lesson).


# ---------------------------------------------------------------------------
# Semantic decontamination AT INGEST (round 11): gate each crawl batch
# against the broadcast eval-anchor set as it lands
# ---------------------------------------------------------------------------


def _staged_embedding_feed(
    spark: SparkSession, sf_dir: str, prefix: str, n_files: int = 4
):
    """Stage the TRAINING half of the embeddings table (vec_id >=
    _N_QUERY; the eval anchors stay static) into ``n_files`` vec_id-range
    files consumed one per micro-batch — each file standing in for one
    crawl batch arriving at the ingest gate. The split key is arbitrary
    (each vector's verdict depends only on itself and the static
    anchors), so twin answers must be invariant to ``n_files`` — pinned
    by tests/test_similarity_quality.py::
    test_streaming_semantic_decon_invariant_to_batch_cuts. The global
    ntile sort is test scaffolding, not a production stage.
    Returns (stream, out_dir, ckpt_dir)."""
    from pyspark.sql.window import Window

    from kasper_spark.operators.similarity import _N_QUERY

    work = _workdir(prefix)
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        F.col("vec_id") >= _N_QUERY
    )
    bucketed = emb.select(
        "vec_id",
        "embedding",
        F.ntile(n_files).over(Window.orderBy("vec_id")).alias("bucket"),
    )
    for i in range(1, n_files + 1):
        bucketed.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.parquet(
            os.path.join(src_dir, f"range={i:02d}")
        )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(os.path.join(src_dir, "range=*"))
    )
    return stream, out_dir, ckpt


def semantic_decon_gate(df: DataFrame, anchors: DataFrame) -> DataFrame:
    """ONE micro-batch's decontamination gate — the exact per-row logic of
    the batch operator (kasper_spark.operators.similarity.
    semantic_decontaminate), factored so the twin and the cut-invariance
    tests run the SAME code: score every arriving vector against the
    broadcast anchors (|eval| rows — audit-sized, never corpus-scale),
    keep the max-cosine anchor per vector, emit rows at/above tau. The
    join is a map-side broadcast nested loop over the anchor set; nothing
    corpus-sized shuffles, no state store — assignment is embarrassingly
    incremental, the streaming_ivf_assign_twin shape."""
    from pyspark.sql.window import Window

    from kasper_spark.operators.similarity import (
        _SEMDECON_TAU,
        dot_exact,
        norm_exact,
    )

    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("eval_id"))
    return (
        df.select("vec_id", "embedding", norm_exact(F.col("embedding")).alias("nrm"))
        .join(F.broadcast(anchors))
        .select(
            "vec_id",
            "eval_id",
            (
                dot_exact(F.col("embedding"), F.col("ee"))
                / (F.col("nrm") * F.col("en"))
            ).alias("cosine"),
        )
        .select("vec_id", "eval_id", "cosine", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") == 1) & (F.col("cosine") >= _SEMDECON_TAU))
        .select(
            "vec_id",
            F.col("eval_id").alias("nearest_eval_id"),
            F.col("cosine").alias("max_cosine"),
        )
    )


@register_query("streaming_semantic_decon_twin")  # oracle bound below
def streaming_semantic_decon_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-level) decontamination AT INGEST — the batch
    semantic_decontaminate re-expressed as the production gate: each
    arriving crawl batch is scored against the BROADCAST eval-anchor set
    inside its own micro-batch, and contaminated rows are flagged the
    moment they land rather than in a nightly sweep (r10 verdict ticket
    #4). Same broadcast-model-per-microbatch pattern as
    streaming_ivf_assign_twin: on a cluster the anchor set is a pinned
    broadcast variable refreshed when the eval suite changes; here it is
    recomputed from the static table per batch — identical plan shape.

    Determinism vs batching: each vector's verdict depends only on the
    vector and the static anchors, so the accumulated flag set is
    invariant to how the feed is cut (1/2/7-way — cut-invariance-tested),
    and the batch oracle (semantic_decontaminate's SQL) certifies the
    union hash-exactly: same exact-decimal cosines, same tie rule, same
    tau.

    Scale: per batch ONE map-side broadcast pass over the arriving rows
    (anchors are eval-suite-sized); only flagged rows are written. No
    state store, no corpus-sized shuffle anywhere — the gate's cost is
    O(batch x |anchors|) inside the scan stage."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import _N_QUERY, norm_exact

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ee"),
        norm_exact(F.col("embedding")).alias("en"),
    )
    stream, out_dir, ckpt = _staged_embedding_feed(spark, sf_dir, "kasper-semdecon-")

    def gate_batch(df, epoch_id: int) -> None:
        semantic_decon_gate(df, anchors).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            "streaming_semantic_decon_twin: no micro-batch ran — "
            "the staged embedding feed found no input files"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


assert "semantic_decontaminate" in _OR, "batch semantic decon oracle missing"
_OR["streaming_semantic_decon_twin"] = _OR["semantic_decontaminate"]


# ---------------------------------------------------------------------------
# t-closeness AT INGEST (round 11): 7th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_t_closeness_twin")  # oracle bound at privacy.py end
def streaming_t_closeness_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t_closeness_audit AT INGEST: every statistic the EMD audit needs —
    per-(class, sensitive-value) counts, class totals, and the global
    sensitive distribution — is a sum of the per-cell COUNT partials, so
    each arriving order micro-batch is enriched against the static
    customer dimension and emits its own cell-count partial; the
    read-side merge + the SAME t_closeness_report projection reproduce
    the batch audit bit-for-bit (the EMD numerators clear denominators
    exactly, so partial counts merge with zero error). This settles the
    privacy triad's ingest question (r10 verdict ticket #6): k-anonymity
    and l-diversity need per-class DISTINCT structure (see SCALING.md's
    disclosure-control note), but t-closeness's sufficient statistic is
    pure counts — it CAN run live, and here it does.

    Scale: per batch one dimension-enrichment join (broadcast at this
    scale; the standard stream-static shuffle join when the customer
    dimension outgrows broadcast) + one partial count agg; the merged
    view is classes x m rows, never orders. Incremental-view discipline
    (dup-matrix/Benford/ACF/HLL/AUC twins); no state store, cut-invariant
    by construction."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.privacy import t_closeness_report

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_bin"),
    )

    work = _workdir("kasper-stclose-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "orders.parquet"),
        os.path.join(src_dir, "orders.parquet"),
    )
    stream = (
        # schema = ONLY the columns the audit reads (parquet maps by name)
        spark.readStream.schema("o_custkey long, o_orderpriority string")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    qi = ["c_nationkey", "c_mktsegment", "acctbal_bin"]

    def sink_batch(df, epoch_id: int) -> None:
        (
            df.join(F.broadcast(cust), "o_custkey")
            .select(*qi, F.col("o_orderpriority").alias("sens"))
            .groupBy(*qi, "sens")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={epoch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_t_closeness_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy(*qi, "sens")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return t_closeness_report(merged)


# ---------------------------------------------------------------------------
# Deterministic per-source audit sample AT INGEST (round 11)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 5  # audit-sample size per source


@register_query(
    "streaming_reservoir_twin",
    oracle=f"""
    SELECT source, doc_id, rk FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= {_RESERVOIR_K}
    """,
)
def streaming_reservoir_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-source audit sample maintained AT INGEST — the
    reservoir-sampling job (keep k uniform representatives per stratum
    as the stream flows) in its MERGEABLE deterministic form: rank by
    md5(doc_id) (the portable pseudo-random order every stratified
    sampler in this repo uses — stratified_topn_md5's rationale) and
    keep the k smallest. Bottom-k by a hash IS the classic KMV
    "k minimum values" sketch: each micro-batch emits its own per-source
    bottom-k partial, and bottom-k of the UNION of partials equals
    bottom-k of the union of the data — an exact merge, so the sample is
    invariant to how the stream is cut AND reproducible across engines
    (a rand()-based reservoir is neither). The oracle certifies the
    merged sample against the whole-table ranking.

    Scale: per batch a per-source window truncated to k rows (partial-
    pushed by WindowGroupLimit — only k rows per stratum survive the
    exchange); merged state is k x |sources| rows. No state store —
    the parquet partial dir IS the reservoir; a store-backed variant
    would putall the same k-row lists per tenant (A18-A20 surface)."""
    from pyspark.sql.window import Window

    work = _workdir("kasper-sreservoir-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )

    def bottomk(df):
        return (
            df.select("source", "doc_id", F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= _RESERVOIR_K)
        )

    def sink_batch(df, epoch_id: int) -> None:
        bottomk(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_reservoir_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .select("source", "doc_id")
    )
    return bottomk(merged)


# ---------------------------------------------------------------------------
# Zipf tail index AT INGEST (round 11): 8th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_zipf_twin")  # oracle bound at module end (text imports first)
def streaming_zipf_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zipf_tail_index_by_source AT INGEST: the per-(source, word)
    frequency table is a mergeable integer partial, so each arriving
    micro-batch emits its own word-count partial and the read-side merge
    + the SAME rank/whole-bit-log/OLS projection reproduce the batch
    slope bit-for-bit — the live corpus-health probe (a source whose
    tail flattens mid-crawl is degenerating NOW, not at the nightly
    audit). Incremental-view discipline (dup-matrix/Benford/ACF/HLL/AUC/
    mixture/t-closeness twins); no state store, cut-invariant by
    construction.

    Scale: per batch one (source, word) partial-agg over the arriving
    rows; merged state is the vocabulary per source (types, not tokens);
    the read-side window and OLS run over types only."""
    from kasper_spark.operators.text import _tokens, zipf_report_from_wf

    work = _workdir("kasper-szipf-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema("text string, source string")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def sink_batch(df, epoch_id: int) -> None:
        (
            df.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
            .groupBy("source", "w")
            .agg(F.count(F.lit(1)).cast("long").alias("f"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={epoch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_zipf_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("source", "w")
        .agg(F.sum("f").cast("long").alias("f"))
    )
    return zipf_report_from_wf(merged)


# text.py imports BEFORE this module, so the batch oracle is already
# registered — bind directly (unlike the privacy/evaluation tail binds).
assert "zipf_tail_index_by_source" in _OR, "batch Zipf oracle missing"
_OR["streaming_zipf_twin"] = _OR["zipf_tail_index_by_source"]


# ---------------------------------------------------------------------------
# Exact quantiles AT INGEST (round 11): 9th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_quantile_twin")  # oracle bound at module end
def streaming_quantile_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact_quantiles_histogram AT INGEST: the per-(group, cents-value)
    count histogram is a mergeable integer partial (per-value counts sum
    across any cut of the stream), so each arriving micro-batch emits its
    own value-histogram partial and the read-side merge + the SAME
    cumulative-rank selection reproduce the batch quartiles bit-for-bit
    — EXACT percentiles maintained live, the thing t-digest/GK sketches
    only approximate. This is the integer-domain trick: over a bounded
    value domain (cents), the full histogram IS the quantile sketch, with
    zero approximation error and trivially mergeable state. 9th
    incremental-view twin (dup-matrix/Benford/ACF/HLL/AUC/mixture/
    t-closeness/Zipf); no state store, cut-invariant by construction.

    Scale: per batch one (group, cents) partial-agg over arriving rows;
    merged state is bounded by the VALUE DOMAIN (~1e6 distinct cents for
    TPC-H prices), not the row count — at 100 TB the partials stay
    domain-sized while a sorted-quantile job would shuffle every row."""
    from kasper_spark.operators.analytics import (
        quantile_hist_counts,
        quantiles_from_hist,
    )

    work = _workdir("kasper-squant-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")
    os.makedirs(src_dir)
    os.symlink(
        os.path.join(sf_dir, "lineitem.parquet"),
        os.path.join(src_dir, "lineitem.parquet"),
    )
    stream = (
        spark.readStream.schema("l_returnflag string, l_extendedprice double")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(src_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def sink_batch(df, epoch_id: int) -> None:
        quantile_hist_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_quantile_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("l_returnflag", "c")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return quantiles_from_hist(merged)


# analytics.py imports BEFORE this module -> batch oracle already registered.
assert "exact_quantiles_histogram" in _OR, "batch quantile oracle missing"
_OR["streaming_quantile_twin"] = _OR["exact_quantiles_histogram"]


# ---------------------------------------------------------------------------
# Seasonal-naive MASE AT INGEST (round 11): 10th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_mase_twin")  # oracle bound at module end
def streaming_mase_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forecast_mase_seasonal_naive AT INGEST: the per-(type, hour) count
    grid is a mergeable integer partial, so each arriving micro-batch
    emits its own hourly-count partial and the read-side merge + the SAME
    spine/lag/MASE projection reproduce the batch evaluation bit-for-bit
    — the live "is daily seasonality still beating the naive forecast"
    monitor. 10th incremental-view twin; no state store, cut-invariant by
    construction (fixed hour buckets, integer counts).

    Scale: per batch one (type, hour) partial-agg over arriving rows;
    merged state is the types x observed-hours grid (domain-sized); the
    spine window runs over grid rows only.

    ts handling: staged from the NORMALIZED batch reader (micros), so the
    stream schema declares `ts timestamp` without tripping the driver
    testdata's TIMESTAMP(NANOS) physical type (the streaming_acf_twin
    discipline); hour truncation is sub-second-insensitive, so staged
    micros and the oracle's nanos agree. 4 unordered part files, one per
    trigger — counts need no ordering."""
    from kasper_spark.operators.temporal import (
        mase_hourly_counts,
        mase_report_from_counts,
    )

    work = _workdir("kasper-smase-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select("ts", "event_type").repartition(
        4
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    def sink_batch(df, epoch_id: int) -> None:
        mase_hourly_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_mase_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("event_type", "hour_ts")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return mase_report_from_counts(merged)


assert "forecast_mase_seasonal_naive" in _OR, "batch MASE oracle missing"
_OR["streaming_mase_twin"] = _OR["forecast_mase_seasonal_naive"]


# ---------------------------------------------------------------------------
# SLO burn-rate AT INGEST (round 11): 11th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_slo_twin")  # oracle bound at module end
def streaming_slo_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slo_burn_rate_alerts AT INGEST: the hourly (n_total, n_err) pair is
    a mergeable integer partial, so each micro-batch emits its own
    error-budget partial and the read-side merge + the SAME
    spine/two-window projection reproduce the batch alert table
    bit-for-bit — which is the shape an SRE pipeline actually wants:
    burn-rate pages come from the LIVE stream, and this twin certifies
    the live view converges to the batch audit. 11th incremental-view
    twin; cut-invariant by construction (fixed hour buckets, integer
    counts; the MASE-twin staging discipline for nano-ts)."""
    from kasper_spark.operators.temporal import (
        slo_hourly_counts,
        slo_report_from_counts,
    )

    work = _workdir("kasper-sslo-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select("ts", "event_type").repartition(
        4
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    def sink_batch(df, epoch_id: int) -> None:
        slo_hourly_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_slo_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("hour_ts")
        .agg(
            F.sum("n_total").cast("long").alias("n_total"),
            F.sum("n_err").cast("long").alias("n_err"),
        )
    )
    return slo_report_from_counts(merged)


assert "slo_burn_rate_alerts" in _OR, "batch SLO oracle missing"
_OR["streaming_slo_twin"] = _OR["slo_burn_rate_alerts"]


# ---------------------------------------------------------------------------
# Sessionization on the state-v2 runtime (round 12)
# ---------------------------------------------------------------------------


def _session_tws_run(
    spark: SparkSession, sf_dir: str, n_files: int = 4, sessionizer=None
) -> DataFrame:
    """Run sessionize_tws over an n_files time-ordered feed of events plus
    a per-user SENTINEL flush file (event_id = -1 at max_ts + 2h): the
    sentinel closes every still-open session after the real data, so the
    bounded availableNow drain emits exactly the oracle's session set.
    Parametrized by n_files so the cut-invariance test can re-run the
    same pipeline under different micro-batch boundaries, and by
    ``sessionizer`` so the state-v1 comparator (sessionize_apws) rides
    the IDENTICAL staged feed — the same-boundary attribution ladder of
    r12 verdict ticket #7."""
    from kasper_spark.protoshim import ensure_protobuf, ship_shim_to_workers
    from kasper_spark.streaming.state import sessionize_tws

    if sessionizer is None:
        sessionizer = sessionize_tws
    ensure_protobuf()
    ship_shim_to_workers(spark)

    src_dir, out_dir, ckpt = _stage_time_ordered(
        spark, sf_dir, "kasper-tsess-", n_files, "value"
    )
    raw = normalize_driver_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")), ("ts",)
    )
    mx = raw.agg(F.max("ts").alias("m"))
    sentinels = (
        raw.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("m") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            F.lit(0.0).alias("value"),
        )
    )
    # written LAST -> latest mtime -> FileStreamSource discovers it as the
    # final micro-batch (the flush batch)
    sentinels.coalesce(1).write.parquet(os.path.join(src_dir, "range=99"))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(os.path.join(src_dir, "range=*"))
        .select("user_id", "event_id", "ts")
    )
    sessions = sessionizer(stream, 30)

    def sink_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            sessions.writeStream.foreachBatch(sink_batch)
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
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


@register_query(
    "streaming_session_tws_twin",
    # same gaps-and-islands oracle as the native session_window twin
    # (gap >= 30 minutes starts a new session) — bound below
    oracle=None,
)
def streaming_session_tws_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization on the STATE-V2 runtime
    (transformWithStateInPandas) — the session-window family's port to
    the modern StatefulProcessor protocol (r11 verdict ticket #7),
    completing the two-runtime discipline: the native session_window
    operator, the apws family, and now TWS all certify the same
    semantics. Open-session state lives in a typed ValueState; closed
    sessions emit exactly once (Append); the final open sessions drain
    via the per-user sentinel flush batch (the availableNow analog of
    the watermark passing the last gap — see _session_tws_run).

    Cut-invariance is pinned by tests/test_round12_ops.py: the emitted
    session set is identical under 2-, 4- and 5-file micro-batch
    boundaries, because the only state that crosses a cut is
    (start, last, n) and the feed is globally time-ordered."""
    return _session_tws_run(spark, sf_dir, 4)


assert "streaming_session_window_twin" in _OR, "session oracle missing"
_OR["streaming_session_tws_twin"] = _OR["streaming_session_window_twin"]


# ---------------------------------------------------------------------------
# Churn labels at ingest (round 12): 12th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_churn_twin")  # oracle bound at module end
def streaming_churn_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """churn_label_builder AT INGEST: the per-(user, day, pre/post)
    counter pair is a mergeable integer partial, so each micro-batch
    emits its own daily partials and the read-side merge + the SAME
    finalize projection reproduce the batch training table bit-for-bit —
    the shape a feature store actually wants (labels refresh from the
    live stream; this twin certifies the live view converges to the
    batch build). 12th incremental-view twin; cut-invariant by
    construction (fixed day buckets and a fixed cutoff literal, integer
    counts)."""
    from kasper_spark.operators.evaluation import (
        churn_daily_partials,
        churn_labels_from_partials,
    )

    work = _workdir("kasper-schurn-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select(
        "user_id", "ts", "event_type"
    ).repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    def sink_batch(df, epoch_id: int) -> None:
        churn_daily_partials(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_churn_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id", "day", "pre")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("n_purchases").cast("long").alias("n_purchases"),
        )
    )
    return churn_labels_from_partials(merged)


# oracle binding lives at the end of operators/evaluation.py: that module
# imports AFTER this one, so churn_label_builder's oracle does not exist
# yet here (the one cross-module binding that points forward, not back)


# ---------------------------------------------------------------------------
# Always-valid A/B readout at ingest (round 12): 13th incremental-view twin
# ---------------------------------------------------------------------------


@register_query("streaming_msprt_twin")  # oracle bound in evaluation.py
def streaming_msprt_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ab_test_msprt AT INGEST — the pairing the always-valid literature
    exists for: the e-value is only anytime-valid if the metric can
    actually be read at any time, i.e. maintained incrementally from the
    live stream. Per-user purchase counts are sum-mergeable partials, so
    each micro-batch emits its own (user, y) rows and the read-side
    merge + the SAME mSPRT projection reproduce the batch readout
    bit-for-bit against the batch oracle. 13th incremental-view twin;
    cut-invariant by construction (integer per-user counters)."""
    from kasper_spark.operators.evaluation import (
        msprt_report_from_user_counts,
        msprt_user_counts,
    )

    work = _workdir("kasper-smsprt-")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ck")

    ensure_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    normalize_driver_ts(raw, ("ts",)).select(
        "user_id", "event_type"
    ).repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src_dir)
    )

    def sink_batch(df, epoch_id: int) -> None:
        msprt_user_counts(df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"streaming_msprt_twin: no micro-batch ran over {src_dir} — "
            "the file stream source found no input files"
        )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .groupBy("user_id")
        .agg(F.sum("y").cast("long").alias("y"))
    )
    return msprt_report_from_user_counts(merged)


# ---------------------------------------------------------------------------
# Persisted-IVF-index incremental maintenance (round 13): the 14th
# incremental view, and the first maintained ON DISK
# ---------------------------------------------------------------------------


def _ivf_append_run(
    spark: SparkSession,
    sf_dir: str,
    n_files: int,
    fault=None,
    retries: int = 0,
    fold_every: int = 4,
) -> tuple[str, DataFrame]:
    """Seed a WORK-DIR copy of the persisted scaled-K IVF index with the
    first half of the corpus, then stream the remaining vectors through
    availableNow micro-batches: each epoch assigns its arrivals against
    the on-disk centroids (the same read-back quantizer the offline
    build certifies against), lands them as ONE flat file in the LSM
    pending tail (r14 verdict ticket #4 — the LSH twin's proven shape:
    no K-directory committer round per epoch), and atomically refreshes
    the marker's n; the log-gated group fold moves the tail into the
    partitioned inverted lists every ``fold_every`` epochs and at drain
    (self-healing — index_catalog.fold_pending_epochs), while serving
    unions the bounded tail — exactly how a production vector store
    keeps an IVF index current between retrains (assignment is
    embarrassingly incremental; only training is offline). Returns
    (work index dir, per-list size profile read back from the
    maintained index).

    ``fault(epoch_id, point)`` is a crash-injection hook for the
    exactly-once tests: it is called at the three commit points
    ("staged", "adopted", "recorded"); raising there kills the stream
    mid-epoch, and the run restarts it from the SAME checkpoint up to
    ``retries`` times — Spark re-executes the failed epoch with the same
    epoch_id, which is precisely the re-execution the EpochLog protocol
    must absorb without duplicating a row.

    Cut-invariance: each vector's list depends only on the vector and
    the static centroids, and appends commute, so the final on-disk
    index is invariant to how the feed is cut (tested 2 vs 5 files) and
    equal to the all-at-once offline build — the twin shares
    ann_ivf_index_build's oracle verbatim. Mid-stream, the marker's n
    lags by exactly the unappended tail, so _search_persisted_index
    serves a correct index over the vectors ingested so far
    (tests/test_round13_ops.py)."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import (
        _IVF_PENDING,
        _assign_rows_scan_np,
        _ensure_ivf_index,
        _ivf_index_meta,
        _ivf_marker_write,
    )

    real = _ensure_ivf_index(spark, sf_dir)
    meta = _ivf_index_meta(real)
    split = meta["n"] // 2

    work = _workdir("kasper-sivfidx-")
    idx = os.path.join(work, "index")
    os.makedirs(idx)
    shutil.copytree(
        os.path.join(real, "centroids"), os.path.join(idx, "centroids")
    )
    assignments = os.path.join(idx, "assignments")
    (
        spark.read.parquet(os.path.join(real, "assignments"))
        .filter(F.col("vec_id") < split)
        .select("vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .repartition(F.col("cluster_id"))
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(assignments)
    )
    _ivf_marker_write(idx, n=split, k=meta["k"], train_n=meta["train_n"])
    log = _cat.EpochLog(idx)
    log.set_base(n=split)
    pending = os.path.join(idx, _IVF_PENDING)
    os.makedirs(pending, exist_ok=True)

    emb = load_table(spark, sf_dir, "embeddings")
    src_dir = os.path.join(work, "src")
    (
        emb.filter(F.col("vec_id") >= split)
        .select("vec_id", "embedding")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    ckpt = os.path.join(work, "ck")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    # centroid path, not a DataFrame: _assign_rows_scan_np loads the
    # K x d quantizer state with one driver pyarrow read per epoch
    # instead of a groupBy+collect Spark job (round-15 opt)
    cent = os.path.join(idx, "centroids")

    def append_batch(df, epoch_id: int) -> None:
        # exactly-once under micro-batch re-execution (ADVICE r13): skip
        # committed epochs; stage with overwrite + adopt via deterministic
        # epoch-keyed renames; derive the marker's n from the epoch log so
        # a replayed marker refresh can never double-count.
        if log.is_committed(epoch_id):
            return
        stage = os.path.join(work, "stage", str(epoch_id), "assignments")
        # single-file micro-batch = one partition: spread the numpy
        # assignment scan across cores (see the LSH twin's note)
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        out = (
            _assign_rows_scan_np(df, cent, 1)
            .select(
                "vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
            )
            .persist()
        )
        try:
            # LSM append shape (r14 verdict ticket #4 — the LSH twin's
            # proven fix applied here): the epoch lands as ONE flat file
            # in the pending tail — no K-directory committer round per
            # epoch — and the log-gated group fold moves the tail into
            # the partitioned inverted lists every fold_every epochs and
            # at drain. The parallel count materializes the cache before
            # the single-file staging write (coalesce(1) would otherwise
            # pull the assignment scan into one task).
            n_new = out.count()
            (
                out.coalesce(1)
                .write.mode("overwrite")
                .parquet(stage)
            )
            if fault is not None:
                fault(epoch_id, "staged")
            _cat.adopt_staged(stage, pending, epoch_id)
            if fault is not None:
                fault(epoch_id, "adopted")
            log.record(epoch_id, n=n_new)
            if fault is not None:
                fault(epoch_id, "recorded")
            m = _ivf_index_meta(idx)
            _ivf_marker_write(
                idx, n=log.total("n"), k=m["k"], train_n=m["train_n"]
            )
        finally:
            out.unpersist()
        if (epoch_id + 1) % fold_every == 0:
            _cat.fold_pending_epochs(
                spark, pending, assignments, ["cluster_id"], log,
                group_size=fold_every,
            )

    attempts = 0
    while True:
        q = (
            stream.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            break
        except Exception:
            attempts += 1
            if attempts > retries:
                raise
    # Drain: fold the trailing pending group into the partitioned lists
    # (a crashed mid-stream fold also self-heals here — the group fold is
    # log-gated and idempotent), then reconcile the marker once from the
    # committed epoch log: a crash between log.record and the marker
    # refresh on the FINAL epoch replays into the is_committed skip,
    # which never rewrites the marker — without this, marker n stays
    # permanently behind the rows on disk (ADVICE r14). total() is
    # replay-safe by construction.
    _cat.fold_pending_epochs(
        spark, pending, assignments, ["cluster_id"], log,
        group_size=fold_every, final=True,
    )
    m = _ivf_index_meta(idx)
    _ivf_marker_write(idx, n=log.total("n"), k=m["k"], train_n=m["train_n"])
    profile = (
        spark.read.parquet(assignments)
        .groupBy(F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )
    return idx, profile


@register_query("streaming_ivf_index_append_twin")
def streaming_ivf_index_append_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-maintenance twin of ann_ivf_index_build: half the
    corpus seeds the on-disk index, the rest arrives as a stream and is
    appended per epoch into the partitioned inverted lists with an
    atomic marker/n refresh (see _ivf_append_run). Shares the offline
    build's oracle VERBATIM — a green row certifies that streaming
    maintenance converges to the identical on-disk index."""
    return _ivf_append_run(spark, sf_dir, n_files=3)[1]


assert "ann_ivf_index_build" in _OR, "offline IVF build oracle missing"
_OR["streaming_ivf_index_append_twin"] = _OR["ann_ivf_index_build"]


@register_query("streaming_session_apws_twin", oracle=None)
def streaming_session_apws_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization on the STATE-V1 runtime
    (applyInPandasWithState) — sessionize_tws's same-boundary comparator
    made a certified query: the session-window family now runs on all
    THREE stateful runtimes (native session_window, apws, TWS) against
    one oracle, and the v1-vs-v2 wall difference on the identical staged
    feed is the protocol's attributable cost (r12 verdict ticket #7;
    ladder in tools/tws_session_ladder.py, numbers in SCALING.md)."""
    from kasper_spark.streaming.state import sessionize_apws

    return _session_tws_run(spark, sf_dir, 4, sessionizer=sessionize_apws)


assert "streaming_session_window_twin" in _OR, "session oracle missing"
_OR["streaming_session_apws_twin"] = _OR["streaming_session_window_twin"]


def _ivf_pq_append_run(
    spark: SparkSession, sf_dir: str, n_files: int, fold_every: int = 4
) -> tuple[str, DataFrame]:
    """The FULL IVF-PQ index maintained at ingest: seed a work-dir index
    with the persisted centroids + codebook and the first half's
    inverted lists AND code arrays, then stream the remaining vectors —
    each epoch routes arrivals to their coarse list (_assign_rows_scan),
    encodes their PQ codes against the ON-DISK codebook (_pq_encode over
    the read-back quantizer — the build's consistency discipline), and
    lands BOTH artifacts as one flat file each in their LSM pending
    tails with an atomic marker/n refresh; the log-gated group folds
    (index_catalog.fold_pending_epochs — self-healing, r14 verdict
    tickets #4/#5) move the tails into the partitioned list directories
    every ``fold_every`` epochs and at drain, and ADC serving unions the
    bounded codes tail. Returns (work index dir, per-(subspace,
    codeword) histogram read back from the maintained codes).

    Same cut-invariance argument as _ivf_append_run (assignment and
    encoding are per-vector pure functions of static on-disk state;
    appends commute), so the twin shares ann_ivf_pq_index_build's oracle
    verbatim, and ADC serving (_search_pq_persisted_index) works
    mid-stream over exactly the ingested prefix."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import (
        _IVF_PENDING,
        _PQ_MARKER,
        _PQ_PENDING,
        _assign_rows_scan_np,
        _codes_array,
        _ensure_ivf_pq_index,
        _ivf_index_meta,
        _ivf_marker_write,
        _pq_encode_np,
    )

    real = _ensure_ivf_pq_index(spark, sf_dir)
    meta = _ivf_index_meta(real)
    split = meta["n"] // 2

    work = _workdir("kasper-sivfpq-")
    idx = os.path.join(work, "index")
    os.makedirs(idx)
    for d in ("centroids", "pq_codebook"):
        shutil.copytree(os.path.join(real, d), os.path.join(idx, d))
    for d in ("assignments", "pq_codes"):
        (
            spark.read.parquet(os.path.join(real, d))
            .filter(F.col("vec_id") < split)
            .withColumn(
                "cluster_id", F.col("cluster_id").cast("bigint")
            )
            .repartition(F.col("cluster_id"))
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(os.path.join(idx, d))
        )
    _ivf_marker_write(idx, n=split, k=meta["k"], train_n=meta["train_n"])
    shutil.copyfile(
        os.path.join(real, _PQ_MARKER), os.path.join(idx, _PQ_MARKER)
    )
    log = _cat.EpochLog(idx)
    log.set_base(n=split)
    pend_assign = os.path.join(idx, _IVF_PENDING)
    pend_codes = os.path.join(idx, _PQ_PENDING)
    os.makedirs(pend_assign, exist_ok=True)
    os.makedirs(pend_codes, exist_ok=True)

    emb = load_table(spark, sf_dir, "embeddings")
    src_dir = os.path.join(work, "src")
    (
        emb.filter(F.col("vec_id") >= split)
        .select("vec_id", "embedding")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    ckpt = os.path.join(work, "ck")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    # centroid path, not a DataFrame: _assign_rows_scan_np loads the
    # K x d quantizer state with one driver pyarrow read per epoch
    # instead of a groupBy+collect Spark job (round-15 opt)
    cent = os.path.join(idx, "centroids")
    codebook = spark.read.parquet(os.path.join(idx, "pq_codebook"))

    def append_batch(df, epoch_id: int) -> None:
        # same exactly-once protocol as _ivf_append_run's sink (skip /
        # stage-overwrite / adopt / log-derived marker), over BOTH
        # artifacts — an epoch is committed only once lists AND codes
        # are adopted, so a replay can never leave them out of step.
        if log.is_committed(epoch_id):
            return
        stage = os.path.join(work, "stage", str(epoch_id))
        # single-file micro-batch = one partition: spread the numpy
        # assign + PQ-encode scans across cores (see the LSH twin's
        # note) — and CACHE the spread batch: both scans read it, and
        # without the persist the repartition shuffle runs twice
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        ).persist()
        routed = (
            _assign_rows_scan_np(df, cent, 1)
            .select(
                "vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
            )
            .persist()
        )
        try:
            # LSM append shape (r14 verdict ticket #4): each artifact
            # lands as ONE flat file in its pending tail; the parallel
            # count materializes the cache before the single-file
            # staging writes (the coalesce(1) discipline).
            n_new = routed.count()
            (
                routed.coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(stage, "assignments"))
            )
            # the routing side is micro-batch-bounded (one epoch's ids —
            # capped by maxRecordsPerTrigger in production), so the
            # codes<-list join broadcasts instead of shuffling per epoch
            codes = (
                _pq_encode_np(df, codebook, packed=True)
                .join(F.broadcast(routed.select("vec_id", "cluster_id")), "vec_id")
                .persist()
            )
            try:
                codes.count()
                (
                    codes.coalesce(1)
                    .write.mode("overwrite")
                    .parquet(os.path.join(stage, "pq_codes"))
                )
            finally:
                codes.unpersist()
            _cat.adopt_staged(
                os.path.join(stage, "assignments"), pend_assign, epoch_id
            )
            _cat.adopt_staged(
                os.path.join(stage, "pq_codes"), pend_codes, epoch_id
            )
            log.record(epoch_id, n=n_new)
            m = _ivf_index_meta(idx)
            _ivf_marker_write(
                idx, n=log.total("n"), k=m["k"], train_n=m["train_n"]
            )
        finally:
            routed.unpersist()
            df.unpersist()
        if (epoch_id + 1) % fold_every == 0:
            for pend, table in (
                (pend_assign, "assignments"),
                (pend_codes, "pq_codes"),
            ):
                _cat.fold_pending_epochs(
                    spark, pend, os.path.join(idx, table), ["cluster_id"],
                    log, group_size=fold_every,
                )

    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # drain: fold the trailing pending groups (self-healing), then the
    # marker reconcile from the epoch log — the final-epoch crash-replay
    # heal (ADVICE r14; see _ivf_append_run)
    for pend, table in (
        (pend_assign, "assignments"),
        (pend_codes, "pq_codes"),
    ):
        _cat.fold_pending_epochs(
            spark, pend, os.path.join(idx, table), ["cluster_id"],
            log, group_size=fold_every, final=True,
        )
    m = _ivf_index_meta(idx)
    _ivf_marker_write(idx, n=log.total("n"), k=m["k"], train_n=m["train_n"])
    profile = (
        spark.read.parquet(os.path.join(idx, "pq_codes"))
        .select(F.posexplode("codes").alias("sub_j", "code_r"))
        .groupBy(
            F.col("sub_j").cast("bigint").alias("sub_j"),
            F.col("code_r").cast("bigint").alias("code_r"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("sub_j", "code_r")
    )
    return idx, profile


@register_query("streaming_ivf_pq_append_twin")
def streaming_ivf_pq_append_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-maintenance twin of ann_ivf_pq_index_build — the
    15th incremental view, maintaining the FULL IVF-PQ layout (inverted
    lists + code arrays) on disk per micro-batch (see
    _ivf_pq_append_run). Shares the offline PQ build's oracle VERBATIM:
    a green row certifies streaming maintenance converges to the
    identical on-disk codes."""
    return _ivf_pq_append_run(spark, sf_dir, n_files=3)[1]


assert "ann_ivf_pq_index_build" in _OR, "offline PQ build oracle missing"
_OR["streaming_ivf_pq_append_twin"] = _OR["ann_ivf_pq_index_build"]


def _lsh_append_run(
    spark: SparkSession,
    sf_dir: str,
    n_files: int,
    fold_every: int = 4,
    fold_fault=None,
    fold_retries: int = 0,
) -> tuple[str, DataFrame]:
    """The persisted MinHash-LSH index maintained at ingest: seed a
    work-dir index with the first half of the corpus's signatures and
    band rows, then stream the remaining DOCUMENTS — each epoch shingles
    and minhashes its arrivals (the certified signature expressions) and
    commits them exactly-once (EpochLog + staged adopt, ADVICE r13).

    LSM-style append shape (r13 verdict ticket #4 — the per-epoch
    partitioned append was the registry's heaviest wall): an epoch lands
    as ONE flat sigs file and ONE flat band-rows file in the index's
    ``bands_pending`` tail — no 128-directory committer round per epoch
    — and the tail is FOLDED into the (band, bucket)-partitioned layout
    every ``fold_every`` epochs and at drain, via the SELF-HEALING
    log-gated group fold (index_catalog.fold_pending_epochs: a crash at
    any fold point recovers by re-running the fold, never by rebuild —
    r14 verdict ticket #5). New documents stay findable the moment their
    epoch commits: _search_lsh_index unions the bounded pending tail —
    the memtable-over-SSTable read a production vector store does.
    Returns (work index dir, per-band occupancy profile read back from
    the folded band table).

    Cut-invariance: a document's signature depends only on its own text
    (per-doc pure function), appends and folds commute on row sets — the
    twin shares lsh_index_build's oracle verbatim."""
    import glob

    from kasper_spark.catalog import load_table
    from kasper_spark.operators.dedup import (
        _LSH_IDX_MARKER,
        _LSH_PENDING,
        _band_sigs,
        _ensure_lsh_index,
        _lsh_idx_buckets,
        _md5_sigs,
        _pack_sig,
    )

    real = _ensure_lsh_index(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    split = n_docs // 2

    work = _workdir("kasper-slsh-")
    idx = os.path.join(work, "index")
    os.makedirs(idx)
    (
        spark.read.parquet(os.path.join(real, "sigs"))
        .filter(F.col("doc_id") < split)
        .write.mode("overwrite")
        .parquet(os.path.join(idx, "sigs"))
    )
    (
        spark.read.parquet(os.path.join(real, "bands"))
        .filter(F.col("doc_id") < split)
        .withColumn("bucket", F.col("bucket").cast("int"))
        .repartition(F.col("band"), F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("band", "bucket")
        .parquet(os.path.join(idx, "bands"))
    )
    shutil.copyfile(
        os.path.join(real, _LSH_IDX_MARKER), os.path.join(idx, _LSH_IDX_MARKER)
    )
    # append epochs bucket with the count the copied index was BUILT with
    # (marker-recorded; scale-adaptive since round 16)
    n_buckets = _lsh_idx_buckets(idx)
    log = _cat.EpochLog(idx)
    pending = os.path.join(idx, _LSH_PENDING)
    os.makedirs(pending, exist_ok=True)

    def fold_pending(final: bool = False) -> None:
        """Fold the flat tail into the partitioned band layout via the
        shared LOG-GATED GROUP fold (index_catalog.fold_pending_epochs,
        group = fold_every epochs): fold targets are deterministic per
        epoch group and every fold commits in the EpochLog, so a crash
        at any point — including between adoption and pending-file
        removal, the double-adopt window ADVICE r14 flagged in the
        tag-per-trigger form — recovers by simply RE-RUNNING the fold:
        no rebuild, no duplicated band rows (r14 verdict ticket #5;
        crash-injection test at every fold commit point in
        tests/test_round15_ops.py). ``fold_fault``/``fold_retries``
        thread the hook through."""
        attempts = 0
        while True:
            try:
                _cat.fold_pending_epochs(
                    spark, pending, os.path.join(idx, "bands"),
                    ["band", "bucket"], log,
                    group_size=fold_every, final=final, fault=fold_fault,
                )
                return
            except Exception:
                attempts += 1
                if attempts > fold_retries:
                    raise

    docs = load_table(spark, sf_dir, "documents")
    src_dir = os.path.join(work, "src")
    (
        docs.filter(F.col("doc_id") >= split)
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    ckpt = os.path.join(work, "ck")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )

    def append_batch(df, epoch_id: int) -> None:
        # _md5_sigs shingles/minhashes a TABLE; the batch is one already
        # — run the same expressions over it directly
        from kasper_spark.operators.dedup import (
            _NUM_HASHES,
            _shingles_raw,
            _tokens,
        )

        if log.is_committed(epoch_id):
            return
        # a single-file micro-batch arrives as ONE partition; fan the
        # CPU-bound shingle/md5 work across the executor cores first
        # (the _md5_sigs discipline — without this, each epoch's
        # signatures compute in one task: measured 18 s/epoch vs ~1 s
        # at 10x, the whole of this twin's round-13 wall)
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        toks = df.select("doc_id", _tokens(F.col("text")).alias("toks"))
        raw = toks.select("doc_id", _shingles_raw(F.col("toks")).alias("raw"))
        ex = raw.select(
            "doc_id", F.explode(F.array_distinct("raw")).alias("s")
        )
        sigs = ex.groupBy("doc_id").agg(
            *[
                F.min(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}|"), F.col("s"))), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long")
                ).alias(f"m{i}")
                for i in range(_NUM_HASHES)
            ]
        ).persist()
        try:
            # materialize the cache with the PARALLEL agg before the
            # single-file staging writes (coalesce(1) would otherwise
            # pull the whole signature computation into one task)
            sigs.count()
            stage = os.path.join(work, "stage", str(epoch_id))
            (
                _pack_sig(sigs)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(stage, "sigs"))
            )
            _cat.adopt_staged(
                os.path.join(stage, "sigs"), os.path.join(idx, "sigs"), epoch_id
            )
            (
                _band_sigs(sigs)
                .withColumn(
                    "bucket",
                    F.pmod(
                        F.xxhash64(F.col("bsig")), F.lit(n_buckets)
                    ).cast("int"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(stage, "pending"))
            )
            _cat.adopt_staged(os.path.join(stage, "pending"), pending, epoch_id)
            log.record(epoch_id)
        finally:
            sigs.unpersist()
        if (epoch_id + 1) % fold_every == 0:
            fold_pending()

    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fold_pending(final=True)
    profile = (
        spark.read.parquet(os.path.join(idx, "bands"))
        .groupBy(F.col("band").cast("bigint").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("bsig").alias("n_buckets"),
        )
        .orderBy("band")
    )
    return idx, profile


@register_query("streaming_lsh_index_append_twin")
def streaming_lsh_index_append_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-maintenance twin of lsh_index_build — the 16th
    incremental view, completing the trilogy: every persisted index in
    the engine (coarse IVF, IVF-PQ, MinHash-LSH) is also maintained at
    ingest. Shares the offline LSH build's oracle VERBATIM."""
    return _lsh_append_run(spark, sf_dir, n_files=3)[1]


assert "lsh_index_build" in _OR, "offline LSH build oracle missing"
_OR["streaming_lsh_index_append_twin"] = _OR["lsh_index_build"]


def _ivf_delete_run(
    spark: SparkSession, sf_dir: str, n_files: int
) -> tuple[str, DataFrame]:
    """The DELETE half of index maintenance at ingest: seed a work-dir
    copy of the FULL coarse IVF index, then stream the takedown ids
    (vec_id % 7 == 3 — ann_ivf_index_delete's predicate) — each epoch
    lands its tombstones exactly-once (EpochLog skip + staged adopt into
    the index's tombstones dir), making the deletes effective for
    serving IMMEDIATELY (the anti-join in _search_persisted_index), and
    the drain runs one guarded reclaim pass. Returns (work index dir,
    per-list profile read back from the reclaimed lists).

    Cut-invariance: tombstones commute (set union) and the reclaim is a
    pure function of the final tombstone set, so the twin shares
    ann_ivf_index_delete's oracle VERBATIM — a green row certifies that
    streaming takedowns converge to the same index an offline
    delete+reclaim produces."""
    from kasper_spark.operators.similarity import (
        _DELETE_MOD,
        _DELETE_REM,
        _TOMBSTONES,
        _copy_ivf_index,
        _ivf_reclaim,
    )

    idx = _copy_ivf_index(spark, sf_dir, "kasper-sivfdel-")
    work = _workdir("kasper-sivfdel-src-")
    log = _cat.EpochLog(idx)

    src_dir = os.path.join(work, "src")
    (
        spark.read.parquet(os.path.join(idx, "assignments"))
        .filter(F.col("vec_id") % _DELETE_MOD == _DELETE_REM)
        .select("vec_id")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    ckpt = os.path.join(work, "ck")
    stream = (
        spark.readStream.schema("vec_id long")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    tomb = os.path.join(idx, _TOMBSTONES)

    def append_batch(df, epoch_id: int) -> None:
        if log.is_committed(epoch_id):
            return
        stage = os.path.join(work, "stage", str(epoch_id))
        (
            df.select("vec_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        _cat.adopt_staged(stage, tomb, epoch_id)
        log.record(epoch_id)

    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _ivf_reclaim(spark, idx, {"assignments": ["cluster_id"]})
    profile = (
        spark.read.parquet(os.path.join(idx, "assignments"))
        .groupBy(F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )
    return idx, profile


@register_query("streaming_ivf_delete_twin")
def streaming_ivf_delete_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-DELETE twin of ann_ivf_index_delete — the 17th
    incremental view, and the first over the REMOVAL path: takedown ids
    arrive as a stream, each epoch's tombstones commit exactly-once and
    are serving-effective immediately, and the drain's guarded reclaim
    converges to the offline delete's index. Shares
    ann_ivf_index_delete's oracle VERBATIM."""
    return _ivf_delete_run(spark, sf_dir, n_files=3)[1]


assert "ann_ivf_index_delete" in _OR, "offline IVF delete oracle missing"
_OR["streaming_ivf_delete_twin"] = _OR["ann_ivf_index_delete"]


@register_query("ivf_index_compact_maintenance")
def ivf_index_compact_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPACTION leg of the maintenance loop, driver-certified: run
    the streamed index append (5 epochs — one part-file per touched list
    per epoch, the exact small-files accretion a long-running maintained
    index suffers), then compact every multi-file inverted list in place
    (maintenance.compact_index_partitions — marker-guarded rename-swap),
    and return the per-list profile read back from the COMPACTED lists.
    Shares ann_ivf_index_build's oracle VERBATIM: a green row certifies
    that compaction preserved every row of a streamed-into index while
    collapsing its epoch fragments (file-count reduction is asserted in
    tests/test_round13_ops.py; this query pins the row identity under
    the driver's hash gate). With this, all four maintenance verbs —
    append, delete, split, compact — are hash-certified."""
    from kasper_spark.maintenance import compact_index_partitions

    idx, _ = _ivf_append_run(spark, sf_dir, n_files=5)
    compact_index_partitions(
        spark, os.path.join(idx, "assignments"), target_bytes=64 * 1024 * 1024
    )
    return (
        spark.read.parquet(os.path.join(idx, "assignments"))
        .groupBy(F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )


assert "ann_ivf_index_build" in _OR
_OR["ivf_index_compact_maintenance"] = _OR["ann_ivf_index_build"]


@register_query("streaming_ivf_retrain_twin")
def streaming_ivf_retrain_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrain at the end of an ingest window — the 18th incremental
    view, composing the two maintenance paths end-to-end: half the
    corpus seeds the index, the rest streams in through the LSM append
    twin (exactly-once epochs, log-gated folds), and at drain the
    quantizer RE-TRAINS on the now-doubled corpus with an atomic
    generation flip (similarity._ivf_retrain) — the production cadence
    where append drift accumulates until the skew audit triggers a
    retrain. Returns the per-list profile read back from the NEW
    generation's lists; shares ann_ivf_index_build's oracle VERBATIM —
    a green row certifies that ingest-then-retrain converges to exactly
    the index a fresh build over the full corpus produces."""
    from kasper_spark.operators.similarity import (
        _ivf_gen_root,
        _ivf_index_meta,
        _ivf_retrain,
    )

    idx, _ = _ivf_append_run(spark, sf_dir, n_files=3)
    _ivf_retrain(spark, sf_dir, idx)
    root = _ivf_gen_root(idx, _ivf_index_meta(idx))
    return (
        spark.read.parquet(os.path.join(root, "assignments"))
        .groupBy(F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )


assert "ann_ivf_index_build" in _OR
_OR["streaming_ivf_retrain_twin"] = _OR["ann_ivf_index_build"]
