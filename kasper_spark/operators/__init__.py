"""Operator modules. Importing this package registers every declared query
(SURVEY.md §2.D) into kasper_spark.registry."""

from kasper_spark.operators import (  # noqa: F401
    relational,
    tpch_more,
    tpch_rest,
    dedup,
    similarity,
    text,
    multimodal,
    temporal,
    analytics,
    streaming_twins,
    grouped_map,
    io_formats,
    privacy,
    curation,
    retrieval,
    evaluation,
)
