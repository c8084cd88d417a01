"""Training-corpus curation walkthrough: the LLM-data operator tier over
the bounded testdata — exact dedup, quality gating, benchmark
decontamination, near-dup candidates, and the final keep-list.

No reference twin (the reference has no corpus operators — SURVEY.md §2.C);
this is the extension tier a 100 TB training-data pipeline uses. Every
stage is a registered, oracle-checked operator; this script just strings
them together the way a user would.

Run:  python examples/training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-training-pipeline")
    load_all_operators()

    total = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # 1. exact dedup: the keeper (first occurrence) per content digest
    kept_exact = QUERIES["dedup_exact"](spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )

    # 2. quality gate: drop the bottom of the quality distribution
    quality = QUERIES["quality_score"](spark, sf_dir).select("doc_id", "quality")
    gated = kept_exact.join(quality, "doc_id").filter(F.col("quality") >= 0.5)

    # 3. benchmark decontamination: drop docs sharing eval n-grams
    # (the query returns only contaminated docs, with shared-shingle counts)
    contaminated = QUERIES["ngram_decontaminate"](spark, sf_dir).select("doc_id")
    clean = gated.join(contaminated, "doc_id", "left_anti")

    # 4. near-dup candidates (MinHash+LSH) -> drop the higher doc_id of
    # each strongly-similar pair (keep-leader rule)
    losers = (
        QUERIES["minhash_lsh_candidates"](spark, sf_dir)
        .filter(F.col("est_jaccard") >= 0.8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    deduped = clean.join(losers, "doc_id", "left_anti")

    # 5. rarity gate: drop rare-token-soup outliers (bottom of the corpus
    # unigram-probability distribution — OCR garbage, non-prose)
    rarity = QUERIES["unigram_rarity_quality"](spark, sf_dir).select(
        "doc_id", "mean_token_prob"
    )
    floor = rarity.approxQuantile("mean_token_prob", [0.02], 0.0)[0]
    final = deduped.join(rarity, "doc_id").filter(
        F.col("mean_token_prob") >= floor
    ).select("doc_id")

    # 6. PII scrub on the survivors: counts only here; the redacted text
    # itself is what a real pipeline would write out
    pii = QUERIES["pii_redact"](spark, sf_dir).join(final, "doc_id")
    n_masked = pii.filter(
        (F.col("n_email") + F.col("n_phone") + F.col("n_ip") + F.col("n_ssn")) > 0
    ).count()

    counts = {
        "total": total,
        "after_exact_dedup": kept_exact.count(),
        "after_quality_gate": gated.count(),
        "after_decontamination": clean.count(),
        "after_neardup_dedup": deduped.count(),
        "final_keep_list": final.count(),
        "kept_docs_pii_masked": n_masked,
    }
    for k, v in counts.items():
        print(f"{k:24s} {v}")
    return counts


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
