"""Bounded-tier catalog: the driver's TPC-H-ish parquet tables (TESTDATA.md).

The reference has no file sources at all (Kafka only — SURVEY.md §2.C); this
catalog is the bounded twin required so every operator is verifiable against
the DuckDB oracle without a broker.

Reads go through ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free. Do NOT cache here — at 100 TB
these are scans, not materializations; callers opt into caching explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Timestamp columns stored as INT64 TIMESTAMP(NANOS) in the driver parquet.
# Spark has no nanosecond timestamp type; with
# spark.sql.legacy.parquet.nanosAsLong they surface as long nanos, which we
# convert to microsecond timestamps here (integer div — no double roundtrip,
# so no precision loss). DuckDB reads the same columns as TIMESTAMP_NS and
# truncates identically when compared at micro precision.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Make nano-timestamp parquet readable under ANY SparkSession.

    nanosAsLong is a runtime SQL conf; setting it here (not only in the
    tuned session factory) means table reads work with a BARE session too —
    the correctness driver builds its own, and without this the read of
    events.parquet (INT64 TIMESTAMP(NANOS,false)) throws
    PARQUET_TYPE_ILLEGAL. Any code that reads the driver parquet directly
    (e.g. streaming twins inferring a file-stream schema) must call this
    first."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
