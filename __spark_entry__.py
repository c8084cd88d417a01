"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the kasper_spark package; this module is a thin
adapter over kasper_spark.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import kasper_spark.registry as _registry
from kasper_spark.registry import load_all_operators


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: word count over documents
    (the reference's own flagship example — SURVEY.md §2.B B3+B4)."""
    load_all_operators()
    return _registry.QUERIES["word_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.D.

    Ordered via registry.driver_ordered: the driver samples a 50-entry
    prefix per round, so entries still lacking a green driver row are
    rotated to the front (see registry.DRIVER_SAMPLE_PRIORITY)."""
    load_all_operators()
    return _registry.driver_ordered(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here are rows-only checks
    (non-SQL-expressible operators: LSH hyperplane internals and the
    binary-emitting PGM codec round-trip, each twin-certified)."""
    load_all_operators()
    return _registry.driver_ordered(_registry.ORACLES)
