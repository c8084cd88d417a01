#!/usr/bin/env python
"""Round-16 optimization profiler: per-query wall breakdown + plan capture.

Same discipline as tools/profile_r15.py (one session, bench.py's warmup,
build_s/noop_s/jobs split via statusTracker), writing plans into
plans/r16/<name>_<tag>.txt. "before" runs execute in a git worktree of the
round-open tree with THIS file copied in, so before/after share a machine
and a methodology (BENCH_VARIANCE.md cross-tree rule).

Usage: python tools/profile_r16.py [--tag before] [--runs 2] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    # PQ ADC family (r15 verdict ticket #3)
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_index_build",
    "ann_ivf_pq_search_only",
    "ann_ivf_pq_residual",
    "ann_ivf_pq_residual_index_build",
    "ann_ivf_pq_residual_search_only",
    # touched-but-still-slow (r15 verdict)
    "ivf_retrain_search_only",
    "ann_ivf_index_retrain",
    "entity_resolution_pipeline",
    "lsh_index_build",
    "lsh_index_delete",
    "lsh_neardup_search_only",
    "ann_ivf_split_search_only",
    # eval chain (df=0 n_terms fix rides it)
    "mrr_relevance_contract",
    "ndcg_relevance_contract",
    "precision_recall_at_k",
    "prf_query_expansion_topk",
    # most expensive untouched + floor candidates
    "minhash_lsh_candidates",
    "market_basket_lift",
    "boilerplate_shingle_stats_cms",
    "curation_pipeline_e2e",
    "mutual_knn_pairs",
    "q1_pricing_summary",
    "q3_top_orders",
    "dataset_card_report",
    "dedup_exact",
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
    spark = get_spark("kasper-profile-r16")
    sc = spark.sparkContext

    # bench.py's warmup (including the r15 additions, so first-query walls
    # match the bench's conditions)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(12,4)))").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(1_000).write.format("noop").mode("overwrite").save()
    spark.range(1_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql import functions as _F

    _r = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    _n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    _r.groupBy("r_name").count().collect()
    _n.join(_F.broadcast(_r), _n.n_regionkey == _r.r_regionkey).count()

    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)
    tracker = sc.statusTracker()

    print(
        f"{'query':40s} {'run':>3s} {'build_s':>8s} {'noop_s':>8s} {'total':>8s} {'jobs':>5s}",
        flush=True,
    )
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
                    fh.write(
                        df._jdf.queryExecution().explainString(
                            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                                "formatted"
                            )
                        )
                    )
    spark.stop()


if __name__ == "__main__":
    main()
