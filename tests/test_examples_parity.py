"""Parity tests for the reference's example programs (SURVEY.md §2.B):

- B1 hello-world: pass-through consumer printing the message envelope
  (/root/reference/examples/hello_world_example.go:17-33)
- B2 producer: re-key/re-value map 'Hello {value}' -> another topic
  (/root/reference/examples/producer_example.go:25-40)
- B6 multi-topic routing (/root/reference/examples/multiple_input_topics_example.go)
- B3+B4 word count end-to-end with emitted message format
  '{word} has been seen {n} times'
  (/root/reference/examples/word_count_example.go:36-43)

All run broker-less through the Pipeline file source.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig
from kasper_spark.streaming.state import running_word_count


def _write(d, rows, fname):
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, fname + ".tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(d, fname))


ENVELOPE = "key string, value string, topic string, partition int, offset long"


def _pipe(spark, tmp_path, name):
    return Pipeline(
        spark, PipelineConfig(name=name, checkpoint_root=str(tmp_path / "ck"))
    )


def test_hello_world_passthrough(spark, tmp_path):
    """B1: every message's envelope passes through unchanged."""
    src = str(tmp_path / "hello")
    msgs = [
        {"key": "k1", "value": "Hello world", "topic": "hello", "partition": 0, "offset": 0},
        {"key": "k2", "value": "Hej verden", "topic": "hello", "partition": 1, "offset": 0},
    ]
    _write(src, msgs, "b.json")
    pipe = _pipe(spark, tmp_path, "hello")
    out_rows = []
    pipe.run_available_now(
        pipe.file_source(src, ENVELOPE),
        for_each_batch=lambda df, _: out_rows.extend(r.asDict() for r in df.collect()),
    )
    assert sorted(out_rows, key=lambda r: r["key"]) == msgs


def test_producer_map_re_value(spark, tmp_path):
    """B2: map each message to key=key, value='Hello {value}'."""
    src = str(tmp_path / "world")
    _write(
        src,
        [{"key": "a", "value": "there", "topic": "hello", "partition": 0, "offset": 0}],
        "b.json",
    )
    pipe = _pipe(spark, tmp_path, "producer")
    mapped = pipe.file_source(src, ENVELOPE).select(
        "key", F.format_string("Hello %s", F.col("value")).alias("value")
    )
    out = []
    pipe.run_available_now(
        mapped, for_each_batch=lambda df, _: out.extend(df.collect())
    )
    assert [(r["key"], r["value"]) for r in out] == [("a", "Hello there")]


def test_multi_topic_routing(spark, tmp_path):
    """B6: dispatch on msg.topic; unknown topic -> error branch (kasper
    panics — we surface a dedicated 'unroutable' output instead)."""
    src = str(tmp_path / "multi")
    _write(
        src,
        [
            {"key": "1", "value": "x", "topic": "topic-a", "partition": 0, "offset": 0},
            {"key": "2", "value": "y", "topic": "topic-b", "partition": 0, "offset": 1},
            {"key": "3", "value": "z", "topic": "mystery", "partition": 0, "offset": 2},
        ],
        "b.json",
    )
    pipe = _pipe(spark, tmp_path, "router")
    routed = pipe.file_source(src, ENVELOPE).select(
        "key",
        F.when(F.col("topic") == "topic-a", "handler_a")
        .when(F.col("topic") == "topic-b", "handler_b")
        .otherwise("unroutable")
        .alias("route"),
    )
    out = []
    pipe.run_available_now(routed, for_each_batch=lambda df, _: out.extend(df.collect()))
    assert {(r["key"], r["route"]) for r in out} == {
        ("1", "handler_a"),
        ("2", "handler_b"),
        ("3", "unroutable"),
    }


def test_word_count_message_format(spark, tmp_path):
    """B3+B4 with the example's output message shape:
    '{word} has been seen {n} times', keyed by word."""
    src = str(tmp_path / "wc")
    _write(src, [{"value": "go go spark"}], "b.json")
    pipe = _pipe(spark, tmp_path, "wc-fmt")
    counts = running_word_count(pipe.file_source(src, "value string"))
    messages = counts.select(
        F.col("word").alias("key"),
        F.format_string("%s has been seen %d times", F.col("word"), F.col("n")).alias(
            "value"
        ),
    )
    out = []
    pipe.run_available_now(
        messages, output_mode="update", for_each_batch=lambda df, _: out.extend(df.collect())
    )
    got = {r["key"]: r["value"] for r in out}
    assert got == {
        "go": "go has been seen 2 times",
        "spark": "spark has been seen 1 times",
    }


def test_runnable_examples_smoke(spark, capsys):
    """The shipped examples/ scripts (the reference also ships runnable
    examples) must execute broker-less end-to-end via their main()."""
    import examples.hello_world as hw
    import examples.multiple_input_topics as mt
    import examples.producer as pr
    import examples.topic_roundtrip as tr
    import examples.word_count as wc

    hw.main(spark)
    wc.main(spark)
    mt.main(spark)
    pr.main(spark)
    tr.main(spark)
    out = capsys.readouterr().out
    assert "Got message: key='k0'" in out
    assert "the has been seen 3 times" in out
    assert "[handled-by-beta] beta/1: b1" in out
    assert "greetings written to" in out
    assert "-> HELLO WORLD" in out


def test_split_json_dlq_quarantines_poison_payloads(spark):
    """Crafted poison batch: valid objects parse; malformed JSON and NULL
    payloads route to the dead-letter side; nothing is lost or duplicated."""
    from kasper_spark.operators.relational import split_json_dlq

    rows = [
        ("ok1", '{"k": 1}'),
        ("ok2", '{"k": 2, "extra": "ignored"}'),
        ("bad_syntax", '{"k": '),
        ("bad_garbage", "not json at all"),
        ("bad_null", None),
    ]
    df = spark.createDataFrame(rows, "id string, props string")
    parsed, dead = split_json_dlq(df, "props", "k BIGINT")
    assert sorted(r["id"] for r in parsed.select("id").collect()) == ["ok1", "ok2"]
    assert sorted(r["id"] for r in dead.select("id").collect()) == [
        "bad_garbage",
        "bad_null",
        "bad_syntax",
    ]
    # parsed side carries the typed struct; dead side carries the raw payload
    assert {r["p"]["k"] for r in parsed.select("p").collect()} == {1, 2}
    assert "props" in dead.columns and "p" not in dead.columns


def test_split_json_dlq_streaming_foreach_batch(spark, tmp_path):
    """DLQ in streaming: one file-stream pass, split per micro-batch inside
    foreachBatch, both sides landed to parquet — the quarantine valve a
    poison message must hit at 100 TB instead of failing the query."""
    from kasper_spark.operators.relational import split_json_dlq

    src = os.path.join(str(tmp_path), "dlq-src")
    os.makedirs(src, exist_ok=True)
    rows = [
        {"id": "ok1", "props": json.dumps({"k": 1})},
        {"id": "bad", "props": "{oops"},
        {"id": "ok2", "props": json.dumps({"k": 2})},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ok_dir = os.path.join(str(tmp_path), "ok")
    dead_dir = os.path.join(str(tmp_path), "dead")

    def route(df, batch_id):
        parsed, dead = split_json_dlq(df, "props", "k BIGINT")
        parsed.select("id", "p.k").write.mode("append").parquet(ok_dir)
        dead.write.mode("append").parquet(dead_dir)

    pipe = Pipeline(
        spark,
        PipelineConfig(name="dlq-stream", checkpoint_root=os.path.join(str(tmp_path), "ck")),
    )
    stream = pipe.file_source(src, "id string, props string")
    pipe.run_available_now(stream, for_each_batch=route)

    ok = {(r["id"], r["k"]) for r in spark.read.parquet(ok_dir).collect()}
    dead = [r.asDict() for r in spark.read.parquet(dead_dir).collect()]
    assert ok == {("ok1", 1), ("ok2", 2)}
    assert [d["id"] for d in dead] == ["bad"]
    assert dead[0]["props"] == "{oops"  # raw payload preserved for replay


def test_training_pipeline_example(spark):
    """The curation walkthrough composes registered operators end-to-end;
    counts must be monotone non-increasing and the dedup/decontamination
    stages must actually remove something at smoke scale."""
    import examples.training_pipeline as tp
    from tests.conftest import SF_SMOKE

    c = tp.main(spark, SF_SMOKE)
    order = [
        "total",
        "after_exact_dedup",
        "after_quality_gate",
        "after_decontamination",
        "final_keep_list",
    ]
    vals = [c[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert c["final_keep_list"] < c["total"]


def test_retrieval_pipeline_example(spark):
    """The retrieval walkthrough composes registered operators; the fused
    list is k-sized, fusion actually engages both rankers, and the
    budget intersection is a subset."""
    import examples.retrieval_pipeline as rp
    from tests.conftest import SF_SMOKE

    c = rp.main(spark, SF_SMOKE)
    assert c["bm25_topk"] == c["hybrid_topk"] == 20
    assert 0 < c["hybrid_in_both_rankers"] <= 20
    assert 0 <= c["final_budgeted"] <= c["hybrid_topk"]


def test_vector_index_example(spark):
    """The vector-index walkthrough measures recall of every ANN path
    against the exact baseline: all queries answered, recalls in (0, 1],
    and the structure-free LSH path is not spuriously perfect."""
    import examples.vector_index as vi
    from tests.conftest import SF_ORACLE

    c = vi.main(spark, SF_ORACLE)
    assert c["queries"] == 20 and c["exact_pairs"] == 100
    for key in (
        "recall_lsh",
        "recall_ivf",
        "recall_pq",
        "recall_ivf_pq_trained",
        "recall_ivf_pq_residual",
    ):
        assert 0.0 < c[key] <= 1.0, (key, c)
    # quantized/pruned paths must clear the quality-gate floors
    assert c["recall_pq"] >= 0.45
    assert c["recall_ivf_pq_trained"] >= 0.4
    # residual encoding must not lose recall vs the plain composed index
    assert c["recall_ivf_pq_residual"] >= 0.85


def test_anomaly_monitor_example(spark):
    """The anomaly walkthrough composes the four detectors; counts must be
    internally consistent (repeat offenders bounded by either detector's
    user set, sequence anomalies exactly the bottom-k)."""
    import examples.anomaly_monitor as am
    from tests.conftest import SF_SMOKE

    c = am.main(spark, SF_SMOKE)
    assert c["ewma_anomalies"] > 0
    assert c["cusum_user_alarms"] > 0
    assert c["mad_outliers"] > 0
    assert c["sequence_anomalies"] == 50
    assert 0 <= c["users_tripping_both_value_detectors"] <= min(
        c["ewma_anomalies"], c["cusum_user_alarms"]
    )


def test_data_quality_example(spark):
    """The DQ walkthrough composes the audit tier; the report must be
    internally consistent with its inputs on the bounded testdata."""
    import examples.data_quality as dq
    from tests.conftest import SF_SMOKE

    c = dq.main(spark, SF_SMOKE)
    assert c["constraint_checks"] == 6
    assert c["fk_edges_with_orphans"] == 0  # testdata is referentially sound
    assert c["orders_rows_profiled"] > 0
    assert c["stale_feeds_24h"] == 0  # all feeds end at the same horizon
    assert 0.0 < c["worst_ks_stat"] <= 1.0
    assert c["checksum_buckets"] == 16
