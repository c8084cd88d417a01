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


def test_tws_document_join_ttl_evicts_idle_state(spark, workdir):
    """With ttl_ms set, join state for an idle key is wiped by the timer
    sweep: a character arriving after the window finds no buffered fiction,
    so the document never completes. The control run (TTL off) over the
    exact same files DOES emit it — proving the eviction, not the data,
    made the difference."""
    pytest.importorskip("google.protobuf")
    from kasper_spark.streaming.state import assemble_documents_tws

    fic = {"id": "FI_T", "fictionType": "Novel", "title": "T", "characterIds": ["CX_1", "CX_2"]}
    c1 = {"id": "CX_1", "name": "One", "wikipediaUrl": "u1"}
    c2 = {"id": "CX_2", "name": "Two", "wikipediaUrl": "u2"}
    other = {"id": "CX_OTHER", "name": "Other", "wikipediaUrl": "u3"}

    def seed(src):
        # b1: fiction + first character on partition 0 (incomplete)
        _write_json_file(src, _envelope("fictions", [fic]) + _envelope("characters", [c1], 10), "b1.json")
        # b2: traffic on partition 1 only -> a micro-batch in which
        # partition 0 is idle and its (tiny) TTL timer fires
        _write_json_file(
            src,
            [{"topic": "characters", "partition": 1, "offset": 0, "value": json.dumps(other)}],
            "b2.json",
        )
        # b3: the completing character, after the idle window
        _write_json_file(src, _envelope("characters", [c2], 20), "b3.json")

    schema = "topic string, partition int, offset long, value string"
    results = {}
    for label, ttl in [("ttl", 1), ("no_ttl", None)]:
        src = os.path.join(workdir, f"ttl-src-{label}")
        seed(src)
        pipe = _pipeline(spark, workdir, f"ttl-{label}-{uuid.uuid4().hex[:8]}")
        docs = assemble_documents_tws(pipe.file_source(src, schema), ttl_ms=ttl)
        emitted: list[dict] = []

        def collect_batch(df, epoch_id):
            emitted.extend(r.asDict() for r in df.collect())

        pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
        results[label] = {e["fiction_id"] for e in emitted}

    assert "FI_T" in results["no_ttl"], "control run must complete the document"
    assert "FI_T" not in results["ttl"], "evicted state must not complete the document"


def test_document_join_ttl_evicts_idle_state_v1(spark, workdir):
    """Same eviction contract as the TWS form, on the state-v1 path
    (applyInPandasWithState + ProcessingTimeTimeout) — runnable without the
    state-v2 protobuf dependency, so the eviction behavior is exercised in
    every CI environment."""
    fic = {"id": "FI_T", "fictionType": "Novel", "title": "T", "characterIds": ["CX_1", "CX_2"]}
    c1 = {"id": "CX_1", "name": "One", "wikipediaUrl": "u1"}
    c2 = {"id": "CX_2", "name": "Two", "wikipediaUrl": "u2"}
    other = {"id": "CX_OTHER", "name": "Other", "wikipediaUrl": "u3"}

    def seed(src):
        _write_json_file(src, _envelope("fictions", [fic]) + _envelope("characters", [c1], 10), "b1.json")
        _write_json_file(
            src,
            [{"topic": "characters", "partition": 1, "offset": 0, "value": json.dumps(other)}],
            "b2.json",
        )
        _write_json_file(src, _envelope("characters", [c2], 20), "b3.json")

    schema = "topic string, partition int, offset long, value string"
    results = {}
    for label, ttl in [("ttl", 1), ("no_ttl", None)]:
        src = os.path.join(workdir, f"ttlv1-src-{label}")
        seed(src)
        pipe = _pipeline(spark, workdir, f"ttlv1-{label}-{uuid.uuid4().hex[:8]}")
        docs = assemble_documents(pipe.file_source(src, schema), ttl_ms=ttl)
        emitted: list[dict] = []

        def collect_batch(df, epoch_id):
            emitted.extend(r.asDict() for r in df.collect())

        pipe.run_available_now(docs, output_mode="update", for_each_batch=collect_batch)
        results[label] = {e["fiction_id"] for e in emitted}

    assert "FI_T" in results["no_ttl"], "control run must complete the document"
    assert "FI_T" not in results["ttl"], "evicted state must not complete the document"
