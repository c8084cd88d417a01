"""File source/sink coverage checks beyond oracle parity: the
partitioned-parquet query must actually PRUNE partitions (read directory
metadata, not data) — parity alone can't see the difference between a
pruned and a full scan."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def test_partitioned_read_prunes(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="kasper-prune-"), "orders_by_year")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.withColumn("o_year", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("o_year") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, i.e. resolved
    # against directory names — not as a row-level data filter
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf

    # pruning correctness: only 1996 rows come back
    years = [r[0] for r in pruned.select("o_year").distinct().collect()]
    assert years == [1996]


def test_csv_json_orc_roundtrips_lossless(spark):
    """Round-trip equality row-for-row (collect-and-compare at smoke scale;
    the sf0.01 hash check is the driver's job)."""
    from kasper_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    nation = load_table(spark, SF_SMOKE, "nation")
    got = QUERIES["csv_roundtrip_nation"](spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, nation.collect()))

    supp = load_table(spark, SF_SMOKE, "supplier")
    got = QUERIES["orc_roundtrip_supplier"](spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, supp.collect()))

    orders = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_orderkey") < 2000)
    got = QUERIES["jsonl_roundtrip_orders"](spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, orders.collect()))


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of bucketBy: the stored layout satisfies the join's
    distribution requirement, so the SMJ runs with ZERO Exchange operators
    between the scans and the join. (The final groupBy still exchanges —
    that one carries 5 rows.)"""
    from kasper_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    # run the registered query once so the bucketed tables exist
    out = QUERIES["bucketed_join_no_shuffle"](spark, SF_SMOKE)
    assert out.count() == 5

    o = spark.table("kasper_bkt_orders")
    l = spark.table("kasper_bkt_lineitem")
    joined = o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # one file per bucket + trusted sortBy metadata: the merge join needs
    # no Sort either — both sides stream straight off the sorted scans
    assert "Sort [" not in plan

    # and the join itself is correct against a non-bucketed replan
    expect = (
        load_table(spark, SF_SMOKE, "orders")
        .join(
            load_table(spark, SF_SMOKE, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == expect
