"""Vector-index lifecycle walkthrough: the ANN tier over the bounded
testdata — exact brute-force baseline, then each production index shape
(hyperplane LSH, IVF, PQ/ADC, composed trained IVF-PQ), with recall@k of
every approximate path measured against the exact baseline.

No reference twin (the reference stores opaque bytes — store.go:16-31;
the vector tier is net-new capability). Every stage is a registered,
oracle-checked operator; this script strings them together the way a
similarity-search user would: pick the index for your memory/recall
budget, knowing exactly what each trade costs on your data.

Run:  python examples/vector_index.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark

INDEXES = [
    # (name, registered query, what it trades)
    ("lsh", "ann_lsh_topk", "hash buckets: no training, recall from table count"),
    ("ivf", "ann_ivf_topk", "coarse lists: probe a fraction of the corpus"),
    ("pq", "ann_pq_topk", "8-byte codes: 32x memory cut, codes-only scan"),
    ("ivf_pq_trained", "ann_ivf_pq_trained", "trained lists + codes: the serving index"),
    ("ivf_pq_residual", "ann_ivf_pq_residual", "codes over v - centroid: same budget, higher recall"),
]


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-vector-index")
    load_all_operators()

    exact = _topk_sets(QUERIES["ann_bruteforce_topk"](spark, sf_dir))
    total = sum(len(v) for v in exact.values())
    out: dict = {"queries": len(exact), "exact_pairs": total}
    for name, qname, _why in INDEXES:
        approx = _topk_sets(QUERIES[qname](spark, sf_dir))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        out[f"recall_{name}"] = round(hits / total, 3) if total else 0.0
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(main(sf_dir=sf))
