"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

# repo root importable regardless of how pytest is invoked
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Activate the mini-protobuf fallback (no-op where real protobuf exists)
# BEFORE any SparkSession is created: the JVM snapshots PYTHONPATH at
# launch, and the transformWithStateInPandas workers need google.protobuf
# importable. See kasper_spark/protoshim.py and shims/google/protobuf/.
from kasper_spark.protoshim import ensure_protobuf  # noqa: E402

ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kasper_spark.session import get_spark

    # keep test JVM modest; tests use tiny data
    spark = get_spark(
        "kasper_spark-tests",
        **{"spark.sql.shuffle.partitions": "8", "spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
