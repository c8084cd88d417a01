"""Bucketed co-located join: pre-bucketing both sides on the join key lets
the join run with ZERO exchanges — the pattern that turns a repeated
100 TB fact-fact join from a per-query shuffle into a one-time layout cost
(SCALING.md 'Joins'). Verified at the plan level: same join, bucketed vs
not, loses both Exchange nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_b"))  # external table in tmp
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.mode("overwrite")
        .option("path", str(wh / "lineitem_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ob = spark.table("orders_bucketed")
    lb = spark.table("lineitem_bucketed")
    # hint forces a sort-merge join: at this tiny SF Spark would broadcast,
    # which bypasses the bucket co-location we're verifying (at 100 TB a
    # fact-fact join can't broadcast)
    joined = (
        ob.hint("merge")
        .join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side (bucket co-location);
    # only the final small aggregation may exchange
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_part, join_part[:400]

    # and the result matches the plain-parquet join
    plain = (
        load_table(spark, SF_SMOKE, "orders")
        .join(
            load_table(spark, SF_SMOKE, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
