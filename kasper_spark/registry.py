"""Query registry: the single source of truth tying each declared operator
(SURVEY.md §2.D) to (a) its Spark implementation and (b) its DuckDB oracle SQL.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Contract (driver-enforced):
- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- oracle SQL runs on DuckDB views named after the parquet tables;
- column names must match exactly between the two (the driver sorts columns
  by name before value-hashing) — alias everything, both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB SQL; omit only for genuinely
    non-SQL-expressible operators (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module for its registration side effects."""
    # Imports are inside the function so `import kasper_spark` stays cheap
    # and circular-import-free.
    import kasper_spark.operators  # noqa: F401
