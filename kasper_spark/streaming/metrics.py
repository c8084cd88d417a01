"""Observability: the reference's three built-in metrics re-expressed via
StreamingQueryListener (reference metrics: incoming_message_count,
outgoing_message_count, messages_behind_high_water_mark_count —
/root/reference/topic_processor.go:133-135, lag computation
/root/reference/partition_processor.go:89-103).

Spark exposes the same quantities per micro-batch in the progress event:
numInputRows (incoming), sink.numOutputRows (outgoing), and the Kafka
source's latestOffset - endOffset gap (lag). This listener accumulates
them; a MetricsProvider-style facade lets apps plug Prometheus etc. without
depending on Spark internals (mirroring /root/reference/metrics.go:3-24).
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


def _offset_dict_lag(end, latest) -> int:
    """Sum of per-partition (latest - end) gaps for offsets serialized as
    JSON objects of partition -> integer index; 0 when either side is
    missing or shaped differently (e.g. Kafka's nested topic dicts are
    handled by the metric keys above, file sources have no offsets)."""
    import json

    def _as_int(v):
        if isinstance(v, int):
            return v
        if isinstance(v, str) and v.lstrip("-").isdigit():
            return int(v)
        return None

    try:
        e, l = json.loads(end), json.loads(latest)
        if not (isinstance(e, dict) and isinstance(l, dict)):
            return 0
    except (TypeError, ValueError):
        return 0
    # per-partition guard: one unparseable END value (e.g. a just-added
    # partition serialized as null) must not zero the WHOLE gauge — that
    # would mask a growing backlog, the exact condition it exists to expose
    total = 0
    for p, lv in l.items():
        latest_i = _as_int(lv)
        if latest_i is None:
            continue
        end_i = _as_int(e.get(p, 0))
        total += max(0, latest_i - (end_i if end_i is not None else 0))
    return total


class PipelineMetricsListener(StreamingQueryListener):
    """Accumulates per-query incoming/outgoing counts and source lag.

    Pass a MetricsProvider (streaming/observability.py) to additionally
    publish the reference's three built-in metrics through the pluggable
    facade, exactly as kasper creates them from its provider at
    /root/reference/topic_processor.go:133-135."""

    def __init__(self, provider=None) -> None:
        self._lock = threading.Lock()
        self.incoming = defaultdict(int)  # query name -> rows consumed
        self.outgoing = defaultdict(int)  # query name -> rows produced
        self.lag = defaultdict(int)  # query name -> offsets behind latest
        self.batches = defaultdict(int)
        self._c_in = self._c_out = self._g_lag = None
        if provider is not None:
            self._c_in = provider.new_counter(
                "incoming_message_count", "rows consumed", "query"
            )
            self._c_out = provider.new_counter(
                "outgoing_message_count", "rows produced", "query"
            )
            self._g_lag = provider.new_gauge(
                "messages_behind_high_water_mark_count", "source lag", "query"
            )

    # -- listener callbacks -------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        with self._lock:
            self.batches[name] += 1
            self.incoming[name] += int(p.numInputRows or 0)
            sink_rows = getattr(p.sink, "numOutputRows", -1)
            if sink_rows and int(sink_rows) > 0:
                self.outgoing[name] += int(sink_rows)
            lag = 0
            for src in p.sources:
                m = src.metrics or {}
                # Kafka source metric keys are min/max/avgOffsetsBehindLatest;
                # a bare "offsetsBehindLatest" is never emitted. Prefer max
                # (worst partition) then fall back.
                behind = None
                for key in (
                    "maxOffsetsBehindLatest",
                    "avgOffsetsBehindLatest",
                    "minOffsetsBehindLatest",
                    "estimatedTotalBytesBehindLatest",
                ):
                    if m.get(key) is not None:
                        behind = m[key]
                        break
                if behind is not None:
                    try:
                        lag += int(float(behind))
                    except (TypeError, ValueError):
                        pass
                else:
                    # Generic v2-source fallback (covers the Python
                    # DataSource API, e.g. kasper_topic_dir, which emits no
                    # lag metrics): when endOffset and latestOffset are
                    # both {partition: index} JSON dicts, the per-partition
                    # gap is the high-water-mark lag, summed like kasper's
                    # per-partition gauge. Rate-limited readers that cap
                    # their own latestOffset under-report here exactly as
                    # they under-report to Spark's planner.
                    lag += _offset_dict_lag(
                        getattr(src, "endOffset", None),
                        getattr(src, "latestOffset", None),
                    )
            self.lag[name] = lag
            if self._c_in is not None:
                self._c_in.inc(int(p.numInputRows or 0), str(name))
                if sink_rows and int(sink_rows) > 0:
                    self._c_out.inc(int(sink_rows), str(name))
                self._g_lag.set(lag, str(name))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- kasper-shaped accessors (A11) -------------------------------------

    def messages_behind_high_water_mark(self, query_name: str) -> int:
        with self._lock:
            return self.lag[query_name]

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "incoming": dict(self.incoming),
                "outgoing": dict(self.outgoing),
                "lag": dict(self.lag),
                "batches": dict(self.batches),
            }
