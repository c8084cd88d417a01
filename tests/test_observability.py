"""A22/A23 facade contract — mirrors the reference's unit layer
(/root/reference/prometheus_test.go:5-15, /root/reference/logger_test.go:9-30):
metrics record with bound label values; the JSON logger emits parseable
structured lines; noop variants swallow everything."""

from __future__ import annotations

import json
import logging

from kasper_spark.streaming.observability import (
    InMemoryMetricsProvider,
    NoopMetricsProvider,
    get_logger,
)


def test_counter_gauge_summary_with_labels():
    p = InMemoryMetricsProvider()
    c = p.new_counter("incoming_message_count", "msgs in", "topic", "partition")
    c.inc(1, "words", "0")
    c.inc(2, "words", "0")
    c.inc(1, "words", "1")
    assert c.values[("words", "0")] == 3
    assert c.values[("words", "1")] == 1

    g = p.new_gauge("messages_behind_high_water_mark_count", "lag", "topic")
    g.set(42, "words")
    g.set(7, "words")
    assert g.values[("words",)] == 7

    s = p.new_summary("store_get_duration", "latency", "store")
    s.observe(0.5, "redis")
    s.observe(1.5, "redis")
    assert s.values[("redis",)] == 2.0
    assert s.counts[("redis",)] == 2


def test_label_arity_enforced():
    p = InMemoryMetricsProvider()
    c = p.new_counter("c", "h", "a", "b")
    try:
        c.inc(1, "only-one")
        raise AssertionError("arity violation not caught")
    except ValueError:
        pass


def test_same_name_returns_same_metric():
    p = InMemoryMetricsProvider()
    assert p.new_counter("x", "h", "l") is p.new_counter("x", "h", "l")


def test_noop_provider_swallows():
    p = NoopMetricsProvider()
    c = p.new_counter("c", "h", "l")
    c.inc(5, "v")
    g = p.new_gauge("g", "h")
    g.set(3)
    s = p.new_summary("s", "h")
    s.observe(1.0)  # nothing raised, nothing stored
    assert not c.values and not g.values and not s.values


def test_json_logger_emits_parseable_lines(capsys):
    log = get_logger("obs-test", fmt="json", level=logging.DEBUG)
    log.info("processed batch", extra={"topic": "words", "n": 3})
    line = capsys.readouterr().err.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["msg"] == "processed batch"
    assert rec["level"] == "info"
    assert rec["topic"] == "words"
    assert rec["n"] == 3


def test_noop_logger_emits_nothing(capsys):
    log = get_logger("obs-noop", fmt="noop")
    log.error("should vanish")
    assert capsys.readouterr().err == ""


class _FakePromMetric:
    """Collector double: records (label_values -> aggregate) exactly like
    prometheus_client's labels(*values).inc/set/observe surface."""

    def __init__(self, name, help, label_names, registry):
        self.name = name
        self.label_names = tuple(label_names)
        self.data = {}
        registry.collectors.append(self)

    def labels(self, *values):
        if len(values) != len(self.label_names):
            raise ValueError("label arity")
        key = tuple(values)
        outer = self

        class _Bound:
            def inc(self, amount=1.0):
                outer.data[key] = outer.data.get(key, 0.0) + amount

            def set(self, value):
                outer.data[key] = value

            def observe(self, value):
                outer.data[key] = outer.data.get(key, 0.0) + value

        return _Bound()


class _FakePromModule:
    """Module double exposing the prometheus_client surface the provider
    uses (Counter/Gauge/Summary + REGISTRY)."""

    class _Registry:
        def __init__(self):
            self.collectors = []

    def __init__(self):
        self.REGISTRY = self._Registry()
        self.Counter = _FakePromMetric
        self.Gauge = _FakePromMetric
        self.Summary = _FakePromMetric


def test_prometheus_provider_label_mapping_executes():
    """Executes the PrometheusMetricsProvider code path (absent
    prometheus_client) via the prom_module seam: per-observation label
    binding must route to the right timeseries
    (/root/reference/prometheus.go:108-127 parity), and name-caching must
    avoid duplicate collector registration across provider reuse."""
    from kasper_spark.streaming.observability import PrometheusMetricsProvider

    prom = _FakePromModule()
    p = PrometheusMetricsProvider(prom_module=prom)
    c = p.new_counter("incoming_message_count", "msgs in", "topic", "partition")
    c.inc(1, "words", "0")
    c.inc(2, "words", "0")
    c.inc(1, "words", "1")
    g = p.new_gauge("lag", "behind", "topic")
    g.set(42, "words")
    g.set(7, "words")
    s = p.new_summary("latency", "dur", "store")
    s.observe(0.5, "redis")
    s.observe(1.5, "redis")

    by_name = {m.name: m for m in prom.REGISTRY.collectors}
    assert by_name["incoming_message_count"].data == {
        ("words", "0"): 3.0,
        ("words", "1"): 1.0,
    }
    assert by_name["lag"].data == {("words",): 7}
    assert by_name["latency"].data == {("redis",): 2.0}

    # reuse: same name -> same cached metric, no duplicate registration
    c2 = p.new_counter("incoming_message_count", "msgs in", "topic", "partition")
    assert c2 is c
    assert len(prom.REGISTRY.collectors) == 3


def test_prometheus_provider_without_module_raises():
    import pytest

    from kasper_spark.streaming import observability

    if observability._prom is not None:
        pytest.skip("real prometheus_client installed")
    with pytest.raises(ImportError, match="prometheus_client"):
        observability.PrometheusMetricsProvider()
