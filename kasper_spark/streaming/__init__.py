"""Streaming tier: Structured Streaming re-expression of the reference's
consume -> process -> produce -> commit loop (SURVEY.md §2.A).

- pipeline:  Pipeline/PipelineConfig — the TopicProcessor-equivalent surface
- state:     stateful operators (running counts, stream-stream doc-join)
- metrics:   StreamingQueryListener-based counters/lag (A11/A22)
"""

from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig
from kasper_spark.streaming.metrics import PipelineMetricsListener

__all__ = ["Pipeline", "PipelineConfig", "PipelineMetricsListener"]
