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

# Timestamp columns in the driver parquet have shipped as either
# INT64 TIMESTAMP(NANOS,false) (earlier drops) or TIMESTAMP(MICROS,
# isAdjustedToUTC=false) (current drops, which Spark reads as
# TIMESTAMP_NTZ). Both are normalized to a session-UTC TIMESTAMP (LTZ)
# so every operator sees ONE type: epoch arithmetic (unix_micros,
# cast-to-long) is defined for LTZ only, and with the session pinned to
# UTC the wall-clock values match DuckDB's naive TIMESTAMP reads of the
# same files exactly.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Make the driver parquet readable/deterministic under ANY SparkSession.

    Both keys are runtime SQL confs; setting them here (not only in the
    tuned session factory) means table reads work with a BARE session too —
    the correctness driver builds its own. nanosAsLong keeps older
    INT64 TIMESTAMP(NANOS,false) drops readable (they'd throw
    PARQUET_TYPE_ILLEGAL); the UTC pin makes the TIMESTAMP_NTZ -> TIMESTAMP
    normalization in load_table deterministic regardless of machine TZ.
    Any code that reads the driver parquet directly (e.g. streaming twins
    inferring a file-stream schema) must call this first."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_driver_ts(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Normalize driver-parquet timestamp columns to session-UTC TIMESTAMP.

    Handles both historical encodings (see _NANO_TS_COLS comment); applies
    to batch tables and to file-stream DataFrames whose schema was inferred
    from the same parquet (streaming twins)."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            continue
        if dtypes[c] == "bigint":  # legacy nano drop, read as long
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif dtypes[c] == "timestamp_ntz":  # current micro drop
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_driver_ts(df, _NANO_TS_COLS.get(name, ()))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
