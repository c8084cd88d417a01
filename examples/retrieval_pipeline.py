"""Retrieval-stack walkthrough: the in-engine search tier over the bounded
testdata — BM25 keyword ranking, semantic cosine ranking, reciprocal-rank
hybrid fusion, and a token-budget selection of the fused results.

No reference twin (the reference delegates scoring to its Elasticsearch
sink — /root/reference/elasticsearch.go:86-159; here the scoring is
in-engine). Every stage is a registered, oracle-checked operator; this
script strings them together the way a RAG/data-mining user would: find
the documents most relevant to a query by keywords AND meaning, then
spend a token budget on the best of them.

Run:  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-retrieval-pipeline")
    load_all_operators()

    # 1. lexical: BM25 top-k for the fixed query terms
    bm25 = QUERIES["bm25_keyword_topk"](spark, sf_dir)

    # 2. hybrid: fuse the lexical list with the semantic (cosine) list
    hybrid = QUERIES["hybrid_search_topk"](spark, sf_dir)

    # 3. intersect with the quality-budgeted keep list: of the fused
    # top-k, keep only docs the token budget would also select
    budget = QUERIES["token_budget_select"](spark, sf_dir).select("doc_id")
    final = hybrid.join(budget, "doc_id")

    counts = {
        "bm25_topk": bm25.count(),
        "hybrid_topk": hybrid.count(),
        "hybrid_in_both_rankers": hybrid.filter(
            F.col("kw_rank").isNotNull() & F.col("vec_rank").isNotNull()
        ).count(),
        "final_budgeted": final.count(),
    }
    return counts


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(main(sf_dir=sf))
