#!/usr/bin/env python
"""Synthetic 10x scale-up harness (the SCALING.md methodology, now kept as
a tool): union sf0.1 with 9 key-shifted copies — join relationships
preserved, dimensions (nation/region/part kept 1x where they are true
dimensions of the shifted keys' tables need shifting too) — write parquet
to a temp dir shaped like a testdata sf dir, then report warm wall-clock
for chosen queries at 1x vs 10x.

Usage: python tools/scale10x.py q7_volume_shipping q18_large_orders ...
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kasper_spark.catalog import load_table  # noqa: E402
from kasper_spark.registry import QUERIES, load_all_operators  # noqa: E402
from kasper_spark.session import get_spark  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
# key-shift offsets comfortably above the sf0.1 max of each key space
OFF = {
    "o_orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 1_000_000,
    "doc_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "vec_id": 1_000_000,
}

# per-table shifted columns: (column, offset-key)
SHIFTS = {
    "orders": (("o_orderkey", "o_orderkey"), ("o_custkey", "custkey")),
    "lineitem": (
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ),
    "customer": (("c_custkey", "custkey"),),
    "supplier": (("s_suppkey", "suppkey"),),
    "part": (("p_partkey", "partkey"),),
    "documents": (("doc_id", "doc_id"),),
    "events": (("event_id", "event_id"), ("user_id", "user_id")),
    "embeddings": (("vec_id", "vec_id"),),
    # nation/region: true dimensions, stay 1x
    "nation": (),
    "region": (),
}


def build_10x(spark, out_dir: str) -> None:
    for table, shifts in SHIFTS.items():
        base = load_table(spark, SF1, table)
        if not shifts:
            big = base
        else:
            parts = []
            for i in range(COPIES):
                df = base
                for col, key in shifts:
                    df = df.withColumn(col, F.col(col) + F.lit(i * OFF[key]))
                parts.append(df)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionAll(p)
        big.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))


def timed(name: str, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or ["q7_volume_shipping", "q18_large_orders"]
    load_all_operators()
    spark = get_spark("scale10x")
    out = tempfile.mkdtemp(prefix="kasper-10x-")
    try:
        print("building 10x dataset in", out, flush=True)
        build_10x(spark, out)
        for name in names:
            t1 = timed(name, spark, SF1)
            t10 = timed(name, spark, out)
            print(
                f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={t10 / t1:.1f}x",
                flush=True,
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
