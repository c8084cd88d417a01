"""Metrics-provider facade + structured logging — the A22/A23 surface.

The reference defines Counter/Gauge/Summary interfaces with Prometheus and
no-op providers (/root/reference/metrics.go:3-24,
/root/reference/prometheus.go:42-127, /root/reference/noop_metrics.go:15-32)
and a leveled Logger with logrus JSON/text, stdlib, and noop impls
(/root/reference/logger.go:10-117). Spark-side, query-engine metrics come
from the StreamingQueryListener (metrics.py); this module supplies the
*application-facing* facade those numbers flow into, so apps keep a
kasper-shaped dependency surface:

- ``MetricsProvider.new_counter/new_gauge/new_summary`` with label values
  bound at observation time (kasper binds label values per call:
  /root/reference/prometheus.go:60-69);
- ``InMemoryMetricsProvider`` (inspectable; the Map-store analog),
  ``NoopMetricsProvider``, and — gated behind an import-try —
  ``PrometheusMetricsProvider`` over prometheus_client when installed;
- ``get_logger(name, fmt=json|text|noop)``: stdlib logging with a JSON
  formatter matching logrus's field-style output (A23). Driver-side only;
  executor logs stay on log4j, exactly as kasper's Logger never crossed
  the network either.
"""

from __future__ import annotations

import json
import logging
import sys
import threading
import time
from collections import defaultdict


class _Metric:
    def __init__(self, name: str, label_names: tuple[str, ...]):
        self.name = name
        self.label_names = label_names
        self._lock = threading.Lock()
        self.values: dict[tuple[str, ...], float] = defaultdict(float)

    def _key(self, labels: tuple[str, ...]) -> tuple[str, ...]:
        if len(labels) != len(self.label_names):
            raise ValueError(
                f"{self.name}: expected {len(self.label_names)} label values, "
                f"got {len(labels)}"
            )
        return tuple(labels)


class Counter(_Metric):
    """Monotonic counter (reference: /root/reference/metrics.go:5-8)."""

    def inc(self, amount: float = 1.0, *labels: str) -> None:
        with self._lock:
            self.values[self._key(labels)] += amount


class Gauge(_Metric):
    """Set-to-current-value metric (reference: /root/reference/metrics.go:10-13)."""

    def set(self, value: float, *labels: str) -> None:
        with self._lock:
            self.values[self._key(labels)] = value


class Summary(_Metric):
    """Observation recorder (reference: /root/reference/metrics.go:15-18).
    Keeps count/sum per label set — enough for rate/mean; percentile
    estimation belongs to the backend (Prometheus summaries do it there too).
    """

    def __init__(self, name: str, label_names: tuple[str, ...]):
        super().__init__(name, label_names)
        self.counts: dict[tuple[str, ...], int] = defaultdict(int)

    def observe(self, value: float, *labels: str) -> None:
        with self._lock:
            k = self._key(labels)
            self.values[k] += value
            self.counts[k] += 1


class MetricsProvider:
    """Factory surface mirroring /root/reference/metrics.go:20-24."""

    def new_counter(self, name: str, help: str, *label_names: str) -> Counter:
        raise NotImplementedError

    def new_gauge(self, name: str, help: str, *label_names: str) -> Gauge:
        raise NotImplementedError

    def new_summary(self, name: str, help: str, *label_names: str) -> Summary:
        raise NotImplementedError


class InMemoryMetricsProvider(MetricsProvider):
    """Inspectable provider — the tests' (and local runs') backend."""

    def __init__(self) -> None:
        self.metrics: dict[str, _Metric] = {}

    def _make(self, cls, name: str, label_names: tuple[str, ...]):
        existing = self.metrics.get(name)
        if existing is not None:
            # re-registration must agree on kind and label arity — a
            # mismatch would otherwise surface later as a baffling
            # AttributeError/ValueError at observation time
            if type(existing) is not cls or existing.label_names != label_names:
                raise ValueError(
                    f"metric {name!r} already registered as "
                    f"{type(existing).__name__}{existing.label_names}, "
                    f"requested {cls.__name__}{label_names}"
                )
            return existing
        self.metrics[name] = cls(name, label_names)
        return self.metrics[name]

    def new_counter(self, name, help, *label_names):
        return self._make(Counter, name, label_names)

    def new_gauge(self, name, help, *label_names):
        return self._make(Gauge, name, label_names)

    def new_summary(self, name, help, *label_names):
        return self._make(Summary, name, label_names)


class _NoopMetric(Counter, Gauge, Summary):
    def inc(self, amount: float = 1.0, *labels: str) -> None:
        pass

    def set(self, value: float, *labels: str) -> None:
        pass

    def observe(self, value: float, *labels: str) -> None:
        pass


class NoopMetricsProvider(MetricsProvider):
    """Discard-everything provider (/root/reference/noop_metrics.go:15-32)."""

    def new_counter(self, name, help, *label_names):
        return _NoopMetric(name, label_names)

    def new_gauge(self, name, help, *label_names):
        return _NoopMetric(name, label_names)

    def new_summary(self, name, help, *label_names):
        return _NoopMetric(name, label_names)


try:  # optional dependency, mirroring the reference's Prometheus provider
    import prometheus_client as _prom
except ImportError:  # facade still works; provider needs a module injected
    _prom = None


class PrometheusMetricsProvider(MetricsProvider):
    """Prometheus backend (/root/reference/prometheus.go:42-127 parity:
    one collector per metric name, label VALUES bound per observation).

    `prom_module` is an injection seam: defaults to the real
    prometheus_client when installed; tests (and embedders with a
    compatible shim) may pass any module-like object exposing
    Counter/Gauge/Summary with the labels(*values).inc/set/observe
    surface — which is how this backend's label-mapping logic executes
    in environments without prometheus_client."""

    def __init__(self, registry=None, prom_module=None):
        prom = prom_module if prom_module is not None else _prom
        if prom is None:
            raise ImportError(
                "prometheus_client not installed; pass prom_module= or use "
                "InMemoryMetricsProvider/NoopMetricsProvider"
            )
        self._prom = prom
        self._registry = registry if registry is not None else prom.REGISTRY
        # cache by name: prometheus_client raises 'Duplicated timeseries'
        # on re-registration, but a provider must be reusable across
        # pipeline restarts (each PipelineMetricsListener re-creates the
        # three built-ins — /root/reference/prometheus.go caches the same
        # way via promauto + registry lookup)
        self._cache: dict[str, object] = {}

    def _cached(self, name, build):
        if name not in self._cache:
            self._cache[name] = build()
        return self._cache[name]

    def new_counter(self, name, help, *label_names):
        def build():
            c = Counter(name, label_names)
            pc = self._prom.Counter(
                name, help, list(label_names), registry=self._registry
            )
            c.inc = lambda amount=1.0, *labels: pc.labels(*labels).inc(amount)  # type: ignore[method-assign]
            return c

        return self._cached(name, build)

    def new_gauge(self, name, help, *label_names):
        def build():
            g = Gauge(name, label_names)
            pg = self._prom.Gauge(
                name, help, list(label_names), registry=self._registry
            )
            g.set = lambda value, *labels: pg.labels(*labels).set(value)  # type: ignore[method-assign]
            return g

        return self._cached(name, build)

    def new_summary(self, name, help, *label_names):
        def build():
            s = Summary(name, label_names)
            ps = self._prom.Summary(
                name, help, list(label_names), registry=self._registry
            )
            s.observe = lambda value, *labels: ps.labels(*labels).observe(value)  # type: ignore[method-assign]
            return s

        return self._cached(name, build)


# ---------------------------------------------------------------------------
# A23 — structured logging
# ---------------------------------------------------------------------------


class _JsonFormatter(logging.Formatter):
    """logrus-JSON-shaped lines (/root/reference/logger.go:27-48): one JSON
    object per record with level/time/msg plus any `extra` fields."""

    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "level": record.levelname.lower(),
            "time": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.localtime(record.created)
            ),
            "msg": record.getMessage(),
            "logger": record.name,
        }
        for k, v in record.__dict__.items():
            if k in ("args", "msg", "levelname", "levelno", "pathname", "filename",
                     "module", "exc_info", "exc_text", "stack_info", "lineno",
                     "funcName", "created", "msecs", "relativeCreated", "thread",
                     "threadName", "processName", "process", "name", "taskName"):
                continue
            payload.setdefault(k, v)
        return json.dumps(payload, sort_keys=True, default=str)


def get_logger(
    name: str, fmt: str = "json", level: int = logging.INFO
) -> logging.Logger:
    """Leveled structured logger: fmt = 'json' | 'text' | 'noop'
    (/root/reference/logger.go:95-117's three constructors)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    logger.handlers.clear()
    if fmt == "noop":
        logger.addHandler(logging.NullHandler())
        return logger
    handler = logging.StreamHandler(sys.stderr)
    if fmt == "json":
        handler.setFormatter(_JsonFormatter())
    elif fmt == "text":
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
    else:
        raise ValueError(f"unknown logger fmt {fmt!r}")
    logger.addHandler(handler)
    return logger
