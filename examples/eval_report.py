"""Evaluation-report walkthrough: the round-9 label-quality + retrieval-
quality tier composed the way a dataset-release review reads it — dataset
cards per source, the split-leakage gate, annotator agreement, classifier
calibration, and the retrieval MRR contract, ending in a single
ship/no-ship summary dict.

No reference twin (the reference has no evaluation surface at all; its
quality story ends at the user's Process() callback). Every stage is a
registered, oracle-checked operator; this script strings them into the
one-page review a data lead signs off on.

Run:  python examples/eval_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-eval-report")
    load_all_operators()

    # 1. the dataset card: per-source volume / language / dup / quality
    card = QUERIES["dataset_card_report"](spark, sf_dir).collect()

    # 2. split integrity: duplicate pairs leaking ACROSS train/val/test
    leakage = QUERIES["split_leakage_report"](spark, sf_dir)
    cross = leakage.filter(F.col("split_a") != F.col("split_b"))
    leaked_pairs = int(
        (cross.agg(F.sum("n_dup_pairs")).collect()[0][0]) or 0
    )

    # 3. label quality: inter-annotator agreement + vote disagreement
    kappas = QUERIES["annotator_agreement_kappa"](spark, sf_dir).collect()
    vote = QUERIES["label_majority_vote"](spark, sf_dir)
    worst_src = vote.orderBy(F.desc("disagreement_rate")).first()

    # 4. classifier calibration: does the logit order track the heuristics?
    bins = (
        QUERIES["calibration_reliability_bins"](spark, sf_dir)
        .orderBy("decile")
        .collect()
    )
    top_keep = float(bins[0]["gopher_keep_rate"])
    bottom_keep = float(bins[-1]["gopher_keep_rate"])

    # 5. retrieval quality: per-query reciprocal rank, then the mean (MRR)
    rr = QUERIES["mrr_relevance_contract"](spark, sf_dir).collect()
    mrr = sum(r["rr"] for r in rr) / len(rr)

    out = {
        "sources_carded": len(card),
        "cross_split_leaked_pairs": leaked_pairs,
        "min_pairwise_kappa": min(float(r["kappa"]) for r in kappas),
        "worst_disagreement_source": worst_src["source"],
        "worst_disagreement_rate": float(worst_src["disagreement_rate"]),
        "calibration_top_vs_bottom_keep": top_keep - bottom_keep,
        "mrr_at_corpus": mrr,
        "queries_with_zero_relevant": sum(1 for r in rr if r["n_relevant"] == 0),
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
