"""Streaming tier tests — all broker-less (file sources + availableNow),
mirroring the reference's test strategy at the same seams:

- running word count == batch word count (the word_count example)
- checkpoint recovery: restart must not double-count (at-least-once ->
  exactly-once into the memory sink)
- characters x fictions golden join with late arrivals and re-emission
  (topic_processor_test.go semantics, our own fixture data)
- metrics listener sees incoming rows
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig
from kasper_spark.streaming.state import (
    assemble_documents,
    assemble_documents_batch,
    running_word_count,
)
from kasper_spark.streaming.metrics import PipelineMetricsListener


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _pipeline(spark, workdir, name):
    return Pipeline(
        spark,
        PipelineConfig(name=name, checkpoint_root=os.path.join(workdir, "ckpt")),
    )


def _write_json_file(d, rows, fname):
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, fname)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


LINES = [
    "the quick brown fox",
    "the lazy dog",
    "the quick dog jumps",
]


def test_running_word_count_matches_batch(spark, workdir):
    src = os.path.join(workdir, "lines")
    _write_json_file(src, [{"value": l} for l in LINES], "part-0.json")

    pipe = _pipeline(spark, workdir, "wc")
    lines = pipe.file_source(src, "value string")
    counts = running_word_count(lines)
    qname = f"wc_{uuid.uuid4().hex[:8]}"
    pipe.run_available_now(counts, output_mode="update", query_name=qname)

    got = {
        r["word"]: r["n"]
        for r in spark.sql(f"SELECT word, n FROM {qname}").collect()
    }
    batch = (
        spark.createDataFrame([(l,) for l in LINES], "value string")
        .select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word")
        .count()
        .collect()
    )
    assert got == {r["word"]: r["count"] for r in batch}


def test_checkpoint_recovery_no_double_count(spark, workdir):
    """Restarting with the same checkpoint must not re-count processed
    input (A2/A6 — offsets commit after sink write)."""
    src = os.path.join(workdir, "lines2")
    _write_json_file(src, [{"value": "a b a"}], "f1.json")

    emitted: list[tuple[str, int]] = []

    def collect_batch(df, epoch_id):
        emitted.extend((r["word"], r["n"]) for r in df.collect())

    pipe = _pipeline(spark, workdir, "wc-recover")
    counts = running_word_count(pipe.file_source(src, "value string"))
    pipe.run_available_now(counts, output_mode="update", for_each_batch=collect_batch)

    # second run, same checkpoint, new file added
    _write_json_file(src, [{"value": "a c"}], "f2.json")
    pipe2 = _pipeline(spark, workdir, "wc-recover")  # same name -> same checkpoint
    counts2 = running_word_count(pipe2.file_source(src, "value string"))
    pipe2.run_available_now(counts2, output_mode="update", for_each_batch=collect_batch)

    final = {}
    for word, n in emitted:
        final[word] = max(final.get(word, 0), n)
    assert final == {"a": 3, "b": 1, "c": 1}


# ---- golden join fixture (our own data; same shape as FIXTURES.md §1-3) ----

CHARACTERS = [
    {"id": "CH_01", "name": "Ada", "wikipediaUrl": "https://w/Ada"},
    {"id": "CH_02", "name": "Grace", "wikipediaUrl": "https://w/Grace"},
    {"id": "CH_03", "name": "Edsger", "wikipediaUrl": "https://w/Edsger"},
    {"id": "CH_04", "name": "Barbara", "wikipediaUrl": "https://w/Barbara"},
]

FICTIONS = [
    {"id": "FI_01", "fictionType": "Novel", "title": "Engines", "characterIds": ["CH_01", "CH_02"]},
    {"id": "FI_02", "fictionType": "Film", "title": "Compilers", "characterIds": ["CH_02"]},
    {"id": "FI_03", "fictionType": "Series", "title": "Semaphores", "characterIds": ["CH_03", "CH_04", "CH_01"]},
]


def _envelope(topic, payloads, start_offset=0):
    return [
        {
            "topic": topic,
            "partition": 0,
            "offset": start_offset + i,
            "value": json.dumps(p),
        }
        for i, p in enumerate(payloads)
    ]


def test_document_join_golden(spark, workdir):
    """Late arrivals: fictions arrive before some characters; each document
    appears exactly when its last character lands; character update
    re-emits affected complete documents."""
    src = os.path.join(workdir, "msgs")
    # batch 1: all fictions + two characters -> only FI_02 (needs CH_02) completes
    _write_json_file(
        src,
        _envelope("fictions", FICTIONS) + _envelope("characters", CHARACTERS[:2], 100),
        "b1.json",
    )

    schema = "topic string, partition int, offset long, value string"
    pipe = _pipeline(spark, workdir, "docjoin")
    docs = assemble_documents(pipe.file_source(src, schema))

    emitted: list[dict] = []

    def collect_batch(df, epoch_id):
        emitted.extend(r.asDict() for r in df.collect())

    pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
    got1 = {e["fiction_id"] for e in emitted}
    assert "FI_02" in got1 and "FI_01" in got1 and "FI_03" not in got1

    # batch 2: remaining characters + an update to CH_02 -> FI_03 completes,
    # FI_01/FI_02 re-emit with the updated name
    update = {"id": "CH_02", "name": "Grace H.", "wikipediaUrl": "https://w/GraceH"}
    _write_json_file(src, _envelope("characters", CHARACTERS[2:] + [update], 200), "b2.json")
    emitted.clear()
    pipe2 = _pipeline(spark, workdir, "docjoin")
    docs2 = assemble_documents(pipe2.file_source(src, schema))
    pipe2.run_available_now(docs2, output_mode="update", for_each_batch=collect_batch)

    last = {e["fiction_id"]: json.loads(e["doc_json"]) for e in emitted}
    assert set(last) == {"FI_01", "FI_02", "FI_03"}
    assert [c["id"] for c in last["FI_03"]["characters"]] == ["CH_03", "CH_04", "CH_01"]
    assert last["FI_01"]["characters"][1]["name"] == "Grace H."

    # final state matches the batch twin (with updated CH_02)
    chars_final = CHARACTERS[:1] + [update] + CHARACTERS[2:]
    cdf = spark.createDataFrame(chars_final)
    fdf = spark.createDataFrame(FICTIONS)
    batch_docs = {
        r["fiction_id"]: [c["id"] for c in r["characters"]]
        for r in assemble_documents_batch(cdf, fdf).collect()
    }
    stream_docs = {k: [c["id"] for c in v["characters"]] for k, v in last.items()}
    assert batch_docs == stream_docs


def test_metrics_listener(spark, workdir):
    from kasper_spark.streaming.observability import InMemoryMetricsProvider

    provider = InMemoryMetricsProvider()
    listener = PipelineMetricsListener(provider=provider)
    spark.streams.addListener(listener)
    try:
        src = os.path.join(workdir, "lines3")
        _write_json_file(src, [{"value": "x y"}], "f.json")
        pipe = _pipeline(spark, workdir, "metrics")
        counts = running_word_count(pipe.file_source(src, "value string"))
        qname = f"m_{uuid.uuid4().hex[:8]}"
        pipe.run_available_now(counts, output_mode="update", query_name=qname)
        deadline = time.time() + 10
        while time.time() < deadline and listener.snapshot()["incoming"].get(qname, 0) < 1:
            time.sleep(0.2)
        assert listener.snapshot()["incoming"].get(qname, 0) >= 1
        # built-ins also flow through the provider facade (A22)
        c_in = provider.metrics["incoming_message_count"]
        assert c_in.values[(qname,)] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_tws_word_count_matches_batch(spark, workdir):
    """transformWithStateInPandas twin: final per-word counts across two
    micro-batches must equal the batch groupBy over all lines.

    Skipped where pyspark's state-v2 protobuf dependency (google.protobuf)
    is absent — the operator itself is import-clean either way."""
    pytest.importorskip("google.protobuf")
    from kasper_spark.streaming.state import running_word_count_tws

    src = os.path.join(workdir, "tws-src")
    _write_json_file(src, [{"value": v} for v in LINES[:2]], "b1.json")
    _write_json_file(src, [{"value": v} for v in LINES[2:]], "b2.json")
    pipe = _pipeline(spark, workdir, f"tws-{uuid.uuid4().hex[:8]}")
    counts = running_word_count_tws(pipe.file_source(src, "value string"))
    qname = f"tws_counts_{uuid.uuid4().hex[:8]}"
    pipe.run_available_now(counts, query_name=qname, output_mode="update")
    last = {}
    for r in spark.table(qname).collect():  # update mode: later rows win
        last[r["word"]] = r["n"]
    expected = {}
    for line in LINES:
        for w in line.split():
            expected[w] = expected.get(w, 0) + 1
    assert last == expected


def test_tws_checkpoint_recovery_no_double_count(spark, workdir):
    """State-v2 form of the A2/A6 exactly-once proof: a restart from the
    same checkpoint must restore every ValueState from the RocksDB
    snapshot + changelog and must not re-count processed input — the
    reference's at-least-once + idempotence contract, carried by the
    modern stateful runtime (the v1 test above proves it for the built-in
    aggregation path; this one proves user-managed state survives)."""
    pytest.importorskip("google.protobuf")
    from kasper_spark.streaming.state import running_word_count_tws

    src = os.path.join(workdir, "tws-recover-src")
    _write_json_file(src, [{"value": "a b a"}], "f1.json")

    emitted: list[tuple[str, int]] = []

    def collect_batch(df, epoch_id):
        emitted.extend((r["word"], r["n"]) for r in df.collect())

    pipe = _pipeline(spark, workdir, "tws-recover")
    counts = running_word_count_tws(pipe.file_source(src, "value string"))
    pipe.run_available_now(counts, output_mode="update", for_each_batch=collect_batch)
    assert dict(emitted) == {"a": 2, "b": 1}

    # second run, same checkpoint, new file: counts must CONTINUE (a: 2+1),
    # not restart (a: 1) nor re-read f1 (a: 4)
    _write_json_file(src, [{"value": "a c"}], "f2.json")
    pipe2 = _pipeline(spark, workdir, "tws-recover")  # same name -> same checkpoint
    counts2 = running_word_count_tws(pipe2.file_source(src, "value string"))
    pipe2.run_available_now(counts2, output_mode="update", for_each_batch=collect_batch)

    final = {}
    for word, n in emitted:
        final[word] = max(final.get(word, 0), n)
    assert final == {"a": 3, "b": 1, "c": 1}


def test_stream_static_enrichment_join(spark, workdir):
    """B8 streaming form: per-record store Get becomes ONE broadcast hash
    join of the stream against a Store snapshot (bridge.store_to_df) —
    kasper did a network RTT per record
    (/root/reference/examples/word_count_example.go:35)."""
    from kasper_spark.stores.bridge import store_to_df
    from kasper_spark.stores.memory import MapStore

    dim = MapStore()
    dim.put_all({"u1": b"Ada", "u2": b"Edsger"})
    dim_df = store_to_df(spark, dim, value_decoder=lambda b: b.decode())

    src = os.path.join(workdir, "enrich-src")
    _write_json_file(
        src,
        [
            {"key": "u1", "amount": 10},
            {"key": "u2", "amount": 20},
            {"key": "u3", "amount": 30},  # no dim row -> left join null
        ],
        "b1.json",
    )
    pipe = _pipeline(spark, workdir, f"enrich-{uuid.uuid4().hex[:8]}")
    stream = pipe.file_source(src, "key string, amount long")
    enriched = stream.join(
        F.broadcast(dim_df.withColumnRenamed("value", "name")), "key", "left"
    )
    qname = f"enriched_{uuid.uuid4().hex[:8]}"
    pipe.run_available_now(enriched, query_name=qname)
    got = {r["key"]: (r["name"], r["amount"]) for r in spark.table(qname).collect()}
    assert got == {"u1": ("Ada", 10), "u2": ("Edsger", 20), "u3": (None, 30)}


def test_config_naming_parity():
    """Mirror of the reference's config unit test
    (/root/reference/topic_processor_config_test.go:9-21): the consumer
    group derives from the processor name with the kasper prefix, and the
    checkpoint path is name-scoped."""
    cfg = PipelineConfig(name="hello", checkpoint_root="/tmp/ck")
    assert cfg.group_id_prefix == "kasper-topic-processor-hello"
    assert cfg.checkpoint_location == "/tmp/ck/hello"
    assert cfg.batch_size == 1000  # reference default (config.go:40-42)
    assert cfg.batch_wait_seconds == 5.0  # reference default (config.go:43-45)


def test_has_consumed_all_messages_probe(spark, workdir):
    src = os.path.join(workdir, "probe-src")
    _write_json_file(src, [{"value": "a b"}], "f.json")
    pipe = _pipeline(spark, workdir, f"probe-{uuid.uuid4().hex[:8]}")
    assert pipe.has_consumed_all_messages() is False  # nothing started
    counts = running_word_count(pipe.file_source(src, "value string"))
    pipe.run_available_now(counts, output_mode="update",
                           query_name=f"p_{uuid.uuid4().hex[:8]}")
    assert pipe.has_consumed_all_messages() is True  # drained


def test_multitenant_streaming_fanout(spark, workdir):
    """B9 end-to-end through a real streaming query: per-(tenant, key)
    running counts pushed into a MultiStore via foreachBatch in update
    mode. Later micro-batches overwrite earlier counts per key
    (last-write-wins), so the store must end at the full-data counts."""
    from kasper_spark.stores.bridge import multi_foreach_batch_writer
    from kasper_spark.stores.memory import MultiMapStore

    src = os.path.join(workdir, "mt-src")
    rows_b1 = [
        {"tenant": "acme", "key": "clicks", "n": 1},
        {"tenant": "acme", "key": "clicks", "n": 1},
        {"tenant": "globex", "key": "clicks", "n": 1},
    ]
    rows_b2 = [
        {"tenant": "acme", "key": "clicks", "n": 1},
        {"tenant": "globex", "key": "views", "n": 1},
    ]
    _write_json_file(src, rows_b1, "b1.json")
    _write_json_file(src, rows_b2, "b2.json")

    ms = MultiMapStore()
    pipe = _pipeline(spark, workdir, f"mt-{uuid.uuid4().hex[:8]}")
    counts = (
        pipe.file_source(src, "tenant string, key string, n long")
        .groupBy("tenant", "key")
        .agg(F.count(F.lit(1)).alias("value"))
    )
    pipe.run_available_now(
        counts,
        output_mode="update",
        for_each_batch=multi_foreach_batch_writer(ms, small_output=True),
    )
    assert ms.tenant("acme").get("clicks") == b"3"
    assert ms.tenant("globex").get("clicks") == b"1"
    assert ms.tenant("globex").get("views") == b"1"
    assert sorted(ms.all_tenants()) == ["acme", "globex"]


def test_lag_probe_reads_kafka_metric_keys(spark, workdir):
    """The caught-up probe must read the metric keys Spark's Kafka source
    actually emits (min/max/avgOffsetsBehindLatest,
    estimatedTotalBytesBehindLatest) — a bare 'offsetsBehindLatest' key
    never exists, and reading it made the probe always-True against real
    Kafka. Simulated via a stubbed lastProgress (no broker in CI)."""
    pipe = _pipeline(spark, workdir, f"lagkeys-{uuid.uuid4().hex[:8]}")

    class _FakeQuery:
        def __init__(self, metrics):
            self.lastProgress = {"sources": [{"metrics": metrics}]}

    # behind on the worst partition -> NOT caught up
    pipe._query = _FakeQuery({"maxOffsetsBehindLatest": "42",
                              "avgOffsetsBehindLatest": "3.5",
                              "minOffsetsBehindLatest": "0"})
    assert pipe.has_consumed_all_messages() is False
    # fully caught up
    pipe._query = _FakeQuery({"maxOffsetsBehindLatest": "0",
                              "avgOffsetsBehindLatest": "0.0",
                              "minOffsetsBehindLatest": "0"})
    assert pipe.has_consumed_all_messages() is True
    # only the bytes estimate present (older connector variants)
    pipe._query = _FakeQuery({"estimatedTotalBytesBehindLatest": "1024"})
    assert pipe.has_consumed_all_messages() is False
    # no lag metrics at all (file sources) -> caught up once progress exists
    pipe._query = _FakeQuery({})
    assert pipe.has_consumed_all_messages() is True
    pipe._query = None


def test_metrics_listener_lag_from_kafka_keys():
    """PipelineMetricsListener must aggregate lag from the real Kafka
    metric keys (preferring the per-partition worst case)."""
    from types import SimpleNamespace

    from kasper_spark.streaming.metrics import PipelineMetricsListener

    listener = PipelineMetricsListener()
    progress = SimpleNamespace(
        name="q1",
        id="id1",
        numInputRows=10,
        sink=SimpleNamespace(numOutputRows=10),
        sources=[
            SimpleNamespace(metrics={"maxOffsetsBehindLatest": "7",
                                     "avgOffsetsBehindLatest": "2.0"}),
            SimpleNamespace(metrics={"estimatedTotalBytesBehindLatest": "100"}),
        ],
    )
    listener.onQueryProgress(SimpleNamespace(progress=progress))
    assert listener.messages_behind_high_water_mark("q1") == 107


def test_metrics_listener_lag_from_offset_dicts():
    """Python DataSource sources (kasper_topic_dir) emit no lag metrics;
    the listener must fall back to per-partition endOffset-vs-latestOffset
    gaps (A11 semantics through the generic v2 progress fields)."""
    from types import SimpleNamespace

    from kasper_spark.streaming.metrics import PipelineMetricsListener

    listener = PipelineMetricsListener()
    progress = SimpleNamespace(
        name="q2",
        id="id2",
        numInputRows=4,
        sink=SimpleNamespace(numOutputRows=4),
        sources=[
            SimpleNamespace(
                metrics={},
                endOffset='{"0": 2, "1": 5}',
                latestOffset='{"0": 6, "1": 5}',
            ),
            # file-stream-like source: no offsets -> contributes 0
            SimpleNamespace(metrics={}, endOffset=None, latestOffset=None),
        ],
    )
    listener.onQueryProgress(SimpleNamespace(progress=progress))
    assert listener.messages_behind_high_water_mark("q2") == 4


def test_metrics_listener_lag_partial_offsets_still_report():
    """One unparseable end-side partition (e.g. a just-added partition
    serialized as null) must not zero the whole gauge — valid partitions
    keep reporting their backlog."""
    from kasper_spark.streaming.metrics import _offset_dict_lag

    assert _offset_dict_lag('{"0": "5", "1": null}', '{"0": "9", "1": "100"}') == 104
    assert _offset_dict_lag('{"0": 2}', '{"0": 6, "1": "bad"}') == 4
    assert _offset_dict_lag(None, '{"0": 1}') == 0
    assert _offset_dict_lag('{"0": 1}', '{"t": {"0": 5}}') == 0  # nested shape


def test_tws_document_join_golden_parity(spark, workdir):
    """The transformWithStateInPandas form of the B5 join (TTL off) must
    reproduce the golden fixture: same completions, same re-emissions,
    same final docs as the batch twin."""
    pytest.importorskip("google.protobuf")
    from kasper_spark.streaming.state import assemble_documents_tws

    src = os.path.join(workdir, "tws-docjoin-src")
    _write_json_file(
        src,
        _envelope("fictions", FICTIONS) + _envelope("characters", CHARACTERS[:2], 100),
        "b1.json",
    )
    update = {"id": "CH_02", "name": "Grace H.", "wikipediaUrl": "https://w/GraceH"}
    _write_json_file(src, _envelope("characters", CHARACTERS[2:] + [update], 200), "b2.json")

    schema = "topic string, partition int, offset long, value string"
    pipe = _pipeline(spark, workdir, f"twsdoc-{uuid.uuid4().hex[:8]}")
    docs = assemble_documents_tws(pipe.file_source(src, schema))
    emitted: list[dict] = []

    def collect_batch(df, epoch_id):
        emitted.extend(r.asDict() for r in df.collect())

    pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
    last = {e["fiction_id"]: json.loads(e["doc_json"]) for e in emitted}
    assert set(last) == {"FI_01", "FI_02", "FI_03"}
    assert [c["id"] for c in last["FI_03"]["characters"]] == ["CH_03", "CH_04", "CH_01"]
    assert last["FI_01"]["characters"][1]["name"] == "Grace H."

    chars_final = CHARACTERS[:1] + [update] + CHARACTERS[2:]
    batch_docs = {
        r["fiction_id"]: [c["id"] for c in r["characters"]]
        for r in assemble_documents_batch(
            spark.createDataFrame(chars_final), spark.createDataFrame(FICTIONS)
        ).collect()
    }
    stream_docs = {k: [c["id"] for c in v["characters"]] for k, v in last.items()}
    assert batch_docs == stream_docs


# --- TTL eviction fixtures (shared by the v1 and TWS forms) --------------

_TTL_FIC = {"id": "FI_T", "fictionType": "Novel", "title": "T", "characterIds": ["CX_1", "CX_2"]}
_TTL_C1 = {"id": "CX_1", "name": "One", "wikipediaUrl": "u1"}
_TTL_C2 = {"id": "CX_2", "name": "Two", "wikipediaUrl": "u2"}
_TTL_OTHER = {"id": "CX_OTHER", "name": "Other", "wikipediaUrl": "u3"}
_TTL_SCHEMA = "topic string, partition int, offset long, value string"
_TTL_TOTAL_ROWS = 4  # fiction + c1 (b1), other (b2), c2 (b3)


def _seed_ttl_source(src):
    """Three files -> three micro-batches (maxFilesPerTrigger=1), with
    explicit mtimes so the file source's mod-time ordering is deterministic:
    b1: fiction + first character on partition 0 (incomplete);
    b2: traffic on partition 1 only — a batch in which partition 0 is idle
        and its (tiny) TTL timer fires;
    b3: the completing character, after the idle window."""
    _write_json_file(src, _envelope("fictions", [_TTL_FIC]) + _envelope("characters", [_TTL_C1], 10), "b1.json")
    _write_json_file(
        src,
        [{"topic": "characters", "partition": 1, "offset": 0, "value": json.dumps(_TTL_OTHER)}],
        "b2.json",
    )
    _write_json_file(src, _envelope("characters", [_TTL_C2], 20), "b3.json")
    t0 = time.time() - 60
    for i, f in enumerate(["b1.json", "b2.json", "b3.json"]):
        os.utime(os.path.join(src, f), (t0 + 2 * i, t0 + 2 * i))


def _run_ttl_eviction_pair(spark, workdir, op, tag):
    """Drive the eviction contract for one operator form.

    TTL run: a plan with a processing-time timeout cannot be drained by
    availableNow (Spark keeps scheduling empty micro-batches to advance the
    timer clock — the round-3 hang), so it runs on a fast processing-time
    trigger, polls progress until all input rows are consumed, then stops.
    Control run (ttl None): plain bounded availableNow drain."""
    results = {}
    for label, ttl in [("ttl", 1), ("no_ttl", None)]:
        src = os.path.join(workdir, f"{tag}-src-{label}")
        _seed_ttl_source(src)
        pipe = Pipeline(
            spark,
            PipelineConfig(
                name=f"{tag}-{label}-{uuid.uuid4().hex[:8]}",
                checkpoint_root=os.path.join(workdir, "ckpt"),
                batch_wait_seconds=0.3,
            ),
        )
        docs = op(pipe.file_source(src, _TTL_SCHEMA), ttl_ms=ttl)
        emitted: list[dict] = []

        def collect_batch(df, epoch_id):
            emitted.extend(r.asDict() for r in df.collect())

        if ttl is None:
            pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
        else:
            q = pipe.start(docs, output_mode="update", for_each_batch=collect_batch)
            try:
                deadline = time.time() + 180
                consumed = 0
                while time.time() < deadline:
                    consumed = sum(
                        p["numInputRows"] for p in (q.recentProgress or [])
                    )
                    if consumed >= _TTL_TOTAL_ROWS:
                        break
                    time.sleep(0.2)
                assert consumed >= _TTL_TOTAL_ROWS, (
                    f"{tag}: only {consumed}/{_TTL_TOTAL_ROWS} input rows "
                    "consumed before the poll deadline"
                )
            finally:
                pipe.stop()
        results[label] = {e["fiction_id"] for e in emitted}

    assert "FI_T" in results["no_ttl"], "control run must complete the document"
    assert "FI_T" not in results["ttl"], "evicted state must not complete the document"


def test_tws_document_join_ttl_evicts_idle_state(spark, workdir):
    """With ttl_ms set, join state for an idle key is wiped by the timer
    sweep: a character arriving after the window finds no buffered fiction,
    so the document never completes. The control run (TTL off) over the
    exact same files DOES emit it — proving the eviction, not the data,
    made the difference. (The TTL logic itself also runs protobuf-free in
    test_tws_assemble_docs_processor_unit below.)"""
    pytest.importorskip("google.protobuf")
    from kasper_spark.streaming.state import assemble_documents_tws

    _run_ttl_eviction_pair(spark, workdir, assemble_documents_tws, "ttl-tws")


def test_document_join_ttl_evicts_idle_state_v1(spark, workdir):
    """Same eviction contract as the TWS form, on the state-v1 path
    (applyInPandasWithState + ProcessingTimeTimeout) — runnable without the
    state-v2 protobuf dependency, so the eviction behavior is exercised in
    every CI environment."""
    _run_ttl_eviction_pair(spark, workdir, assemble_documents, "ttl-v1")


def test_available_now_refuses_processing_time_timeout(spark, workdir):
    """Bounded drains of processing-time-timeout plans never terminate
    (round-3 hang); the pipeline must refuse them loudly up front instead
    of spinning empty micro-batches forever."""
    src = os.path.join(workdir, "refuse-src")
    _seed_ttl_source(src)
    pipe = _pipeline(spark, workdir, f"refuse-{uuid.uuid4().hex[:8]}")
    docs = assemble_documents(pipe.file_source(src, _TTL_SCHEMA), ttl_ms=1000)
    with pytest.raises(ValueError, match="processing-time timeout"):
        pipe.run_available_now(
            docs, output_mode="update", for_each_batch=lambda df, eid: None
        )
    # ttl_ms=None (reference parity, no timers) still drains fine
    emitted: list[dict] = []
    docs2 = assemble_documents(pipe.file_source(src, _TTL_SCHEMA), ttl_ms=None)
    pipe.run_available_now(
        docs2,
        output_mode="update",
        for_each_batch=lambda df, eid: emitted.extend(r.asDict() for r in df.collect()),
    )
    assert {e["fiction_id"] for e in emitted} == {"FI_T"}


# --- protobuf-free exercise of the TWS TTL logic -------------------------
# Executing transformWithStateInPandas requires google.protobuf on the
# workers (the repo's mini runtime now provides it here — see
# kasper_spark/protoshim.py — but truly protobuf-free environments still
# skip the integration test above, and the TTL semantics deserve coverage
# everywhere). The processor itself is pure Python over a handle/state
# duck-type, so the TTL semantics — timer arm, re-arm, eviction wiping all
# three blobs — run everywhere via these fakes.


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def listTimers(self):
        return list(self.timers)

    def registerTimer(self, t):
        self.timers.append(t)

    def deleteTimer(self, t):
        if t in self.timers:
            self.timers.remove(t)


class _FakeTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


class _FakeExpiredTimer:
    def __init__(self, t):
        self._t = t

    def getExpiryTimeInMs(self):
        return self._t


def test_tws_assemble_docs_processor_unit():
    import pandas as pd

    from kasper_spark.streaming.state import _make_assemble_docs_processor

    cols = ["topic", "partition", "offset", "value"]

    def batch(rows):
        return [pd.DataFrame(rows, columns=cols)]

    fic_row = ("fictions", 0, 0, json.dumps(_TTL_FIC))
    c1_row = ("characters", 0, 10, json.dumps(_TTL_C1))
    c2_row = ("characters", 0, 20, json.dumps(_TTL_C2))

    # --- TTL path: arm, re-arm, expire, then the late character finds
    # nothing to complete
    proc = _make_assemble_docs_processor(ttl_ms=1000)
    h = _FakeHandle()
    proc.init(h)
    out1 = list(proc.handleInputRows((0,), batch([fic_row, c1_row]), _FakeTimerValues(1000)))
    assert sum(len(p) for p in out1) == 0, "incomplete doc must not emit"
    assert h.timers == [2000], "timer armed at now + ttl"

    out2 = list(proc.handleInputRows((0,), batch([]), _FakeTimerValues(1500)))
    assert sum(len(p) for p in out2) == 0
    assert h.timers == [2500], "touching the key re-arms the single timer"

    list(proc.handleExpiredTimer((0,), _FakeTimerValues(2600), _FakeExpiredTimer(2500)))
    assert h.timers == []
    assert all(not s.exists() for s in h.states.values()), (
        "eviction must wipe all three state blobs"
    )

    out3 = list(proc.handleInputRows((0,), batch([c2_row]), _FakeTimerValues(3000)))
    assert sum(len(p) for p in out3) == 0, "evicted fiction must not complete"

    # --- control: same inputs, no TTL -> document completes
    proc2 = _make_assemble_docs_processor(ttl_ms=None)
    h2 = _FakeHandle()
    proc2.init(h2)
    list(proc2.handleInputRows((0,), batch([fic_row, c1_row]), _FakeTimerValues(1000)))
    out = list(proc2.handleInputRows((0,), batch([c2_row]), _FakeTimerValues(3000)))
    emitted = pd.concat(out)
    assert list(emitted["fiction_id"]) == ["FI_T"]
    doc = json.loads(emitted["doc_json"].iloc[0])
    assert [c["id"] for c in doc["characters"]] == ["CX_1", "CX_2"]
    assert h2.timers == [], "ttl_ms=None must never arm timers"


def test_idempotent_foreach_batch_skips_replayed_batch(tmp_path):
    """Unit: the marker ledger short-circuits a replay of a committed
    batch."""
    from kasper_spark.streaming.pipeline import idempotent_foreach_batch

    calls = []
    fn = idempotent_foreach_batch(
        str(tmp_path / "ledger"), lambda df, bid: calls.append(bid)
    )
    fn(None, 7)
    fn(None, 7)  # replay — must be skipped
    fn(None, 8)
    assert calls == [7, 8]


def test_idempotent_foreach_batch_exactly_once_across_crash(spark, workdir):
    """Integration: crash BETWEEN the sink write and the checkpoint commit
    (the at-least-once window, /root/reference/topic_processor.go:150-162),
    then restart from the same checkpoint. The replayed batch overwrites
    its own deterministic output path, so the sink holds every source row
    exactly once."""
    from kasper_spark.streaming.pipeline import idempotent_foreach_batch

    src = os.path.join(workdir, "xo-src")
    out = os.path.join(workdir, "xo-out")
    _write_json_file(src, [{"value": "r1"}, {"value": "r2"}], "f1.json")
    _write_json_file(src, [{"value": "r3"}], "f2.json")

    crashed = {"done": False}

    def write_batch(df, batch_id):
        # batchId-deterministic overwrite target (recipe requirement 1)
        df.write.mode("overwrite").parquet(
            os.path.join(out, f"batch_id={batch_id}")
        )
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after write, before commit")

    fn = idempotent_foreach_batch(os.path.join(workdir, "xo-ledger"), write_batch)

    pipe = _pipeline(spark, workdir, "xo")
    lines = pipe.file_source(src, "value string")
    try:
        pipe.run_available_now(lines, for_each_batch=fn)
        assert False, "first run should have crashed"
    except Exception:
        pipe.stop()

    pipe2 = _pipeline(spark, workdir, "xo")  # same checkpoint
    pipe2.run_available_now(
        pipe2.file_source(src, "value string"), for_each_batch=fn
    )

    got = sorted(
        r["value"] for r in spark.read.parquet(out).select("value").collect()
    )
    assert got == ["r1", "r2", "r3"]


def test_document_join_event_time_ttl_evicts_and_drains_bounded(spark, workdir):
    """Event-time TTL: eviction driven by the WATERMARK, so — unlike the
    processing-time form above — a bounded availableNow drain terminates
    (no wall clock to chase) AND the eviction point is a deterministic
    stream position, replay-safe. Sequence: incomplete fiction at 10:00;
    other-partition traffic moves the watermark past 10:00+1h, firing the
    idle key's timer; the completing character then arrives to evicted
    state, so the document never emits. The no-TTL control over the same
    files does emit it."""
    from kasper_spark.streaming.state import assemble_documents_event_ttl

    schema = _TTL_SCHEMA + ", event_ts timestamp"

    def env(topic, payloads, ts, partition=0, start_offset=0):
        return [
            {
                "topic": topic,
                "partition": partition,
                "offset": start_offset + i,
                "value": json.dumps(p),
                "event_ts": ts,
            }
            for i, p in enumerate(payloads)
        ]

    def seed(src):
        _write_json_file(src, env("fictions", [_TTL_FIC], "2026-01-01T10:00:00Z")
                         + env("characters", [_TTL_C1], "2026-01-01T10:00:00Z", start_offset=10), "b1.json")
        _write_json_file(src, env("characters", [_TTL_OTHER], "2026-01-01T12:00:00Z", partition=1), "b2.json")
        _write_json_file(src, env("characters", [_TTL_OTHER], "2026-01-01T12:00:01Z", partition=1, start_offset=1), "b3.json")
        _write_json_file(src, env("characters", [_TTL_C2], "2026-01-01T12:00:02Z", start_offset=20), "b4.json")
        t0 = time.time() - 60
        for i, f in enumerate(["b1.json", "b2.json", "b3.json", "b4.json"]):
            os.utime(os.path.join(src, f), (t0 + 2 * i, t0 + 2 * i))

    results = {}
    for label in ("ttl", "no_ttl"):
        src = os.path.join(workdir, f"ettl-src-{label}")
        seed(src)
        pipe = Pipeline(
            spark,
            PipelineConfig(
                name=f"ettl-{label}-{uuid.uuid4().hex[:8]}",
                checkpoint_root=os.path.join(workdir, "ckpt"),
            ),
        )
        lines = pipe.file_source(src, schema)
        docs = (
            assemble_documents_event_ttl(lines, ttl_ms=3_600_000)
            if label == "ttl"
            else assemble_documents(lines)
        )
        emitted: list[dict] = []

        def collect_batch(df, epoch_id):
            emitted.extend(r.asDict() for r in df.collect())

        # BOTH runs drain bounded — the processing-time form cannot do this
        pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
        results[label] = {e["fiction_id"] for e in emitted}

    assert "FI_T" in results["no_ttl"], "control run must complete the document"
    assert "FI_T" not in results["ttl"], "evicted state must not complete the document"


def test_latest_source_offsets_reads_uri_checkpoints_via_hadoop_fs(spark, tmp_path):
    """The drain guard's uncapped ground-truth signal must hold for
    URI-schemed checkpointLocations (hdfs://, s3a://, ...), not just bare
    local paths — exercised here with file:// (the Hadoop local
    filesystem), which routes through the same JVM FileSystem code path a
    remote store would."""
    from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig

    offsets = tmp_path / "uri-ck" / "offsets"
    offsets.mkdir(parents=True)
    (offsets / "0").write_text("v1\n{\"batchTimestampMs\":1}\n{\"a\":0}\n")
    (offsets / "2").write_text("v1\n{\"batchTimestampMs\":3}\n{\"a\":7}\n{\"b\":9}\n")
    (offsets / "1").write_text("v1\n{\"batchTimestampMs\":2}\n{\"a\":3}\n")
    (offsets / "2.tmp.crc").write_text("junk")  # non-digit names ignored

    cfg = PipelineConfig(name="uri", checkpoint_root=f"file://{tmp_path}/uri-ck")
    # checkpoint_location == file://<tmp>/uri-ck/uri — but the offsets we
    # wrote sit at uri-ck/offsets, so point name at "" via a direct config:
    cfg = PipelineConfig(name="offsets-parent", checkpoint_root=str(tmp_path))
    p = Pipeline(spark, cfg)
    # direct local read (control)
    p.config = cfg

    class _Cfg:
        checkpoint_location = f"file://{tmp_path}/uri-ck"

    p.config = _Cfg()
    got = p._latest_source_offsets()
    assert got == ('{"a":7}', '{"b":9}')

    class _CfgMissing:
        checkpoint_location = f"file://{tmp_path}/does-not-exist"

    p.config = _CfgMissing()
    assert p._latest_source_offsets() is None
