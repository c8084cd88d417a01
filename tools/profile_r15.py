#!/usr/bin/env python
"""Round-15 optimization profiler: per-query wall breakdown + plan capture.

For each named query (default: the heaviest headline keys) this times, with
the SAME session/warmup discipline as bench.py:

  - build_s : the fn(spark, sf_dir) call (eager work: index builds, collects)
  - noop_s  : the noop-sink write of the returned DataFrame
  - jobs    : Spark jobs launched inside the timed region (statusTracker)

and captures ``explain("formatted")`` of the returned DataFrame into
plans/r15/<name>_<tag>.txt (tag from argv; "before"/"after").

Usage: python tools/profile_r15.py [--tag before] [--runs 2] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "q1_pricing_summary",
    "minhash_lsh_candidates",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "boilerplate_shingle_stats_cms",
    "mrr_relevance_contract",
    "entity_resolution_pipeline",
    "ann_ivf_trained_topk",
    "ann_ivf_scaledk_topk",
    "market_basket_lift",
    "knn_label_disagreement",
    "ann_ivf_index_build",
    "ann_ivf_search_only",
    "lsh_index_build",
    "lsh_neardup_search_only",
    "ann_ivf_pq_residual_index_build",
    "ann_ivf_split_search_only",
    "lsh_index_delete",
    "ann_ivf_index_retrain",
    "ivf_retrain_search_only",
    "ivf_partial_reclaim_serving",
    "ann_ivf_pq_residual_index_delete",
]


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    runs = 2
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or DEFAULT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kasper_spark.registry import QUERIES, load_all_operators
    from kasper_spark.session import get_spark

    load_all_operators()
    spark = get_spark("kasper-profile-r15")
    sc = spark.sparkContext

    # bench.py's warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(12,4)))").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    plans_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)
    tracker = sc.statusTracker()

    print(f"{'query':40s} {'run':>3s} {'build_s':>8s} {'noop_s':>8s} {'total':>8s} {'jobs':>5s}", flush=True)
    for name in names:
        fn = QUERIES[name]
        for r in range(runs):
            group = f"prof-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
            except Exception as exc:
                print(f"{name:40s} {r:3d} FAIL {type(exc).__name__}: {exc}"[:200], flush=True)
                break
            finally:
                sc.setJobGroup(None, None)
            n_jobs = len(tracker.getJobIdsForGroup(group))
            print(
                f"{name:40s} {r:3d} {t1 - t0:8.2f} {t2 - t1:8.2f} {t2 - t0:8.2f} {n_jobs:5d}",
                flush=True,
            )
            if r == 0:
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ) if False else df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
    spark.stop()


if __name__ == "__main__":
    main()
