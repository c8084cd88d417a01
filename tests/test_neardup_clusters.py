"""Near-dup clustering invariants, straight from the definition of
connected components over the candidate graph:

1. every candidate edge (est_jaccard >= 0.5) connects two docs in the SAME
   cluster — an edge crossing clusters would mean propagation stopped early;
2. every cluster id is the min doc_id of its members (deterministic keeper);
3. every doc with at least one edge is labeled.
"""

from __future__ import annotations

from collections import defaultdict

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_ORACLE

load_all_operators()


def test_components_cover_every_candidate_edge(spark):
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["neardup_clusters"](spark, SF_ORACLE).collect()
    }
    assert clusters, "no near-dup clusters found at all"

    members = defaultdict(list)
    for d, c in clusters.items():
        members[c].append(d)
    assert all(c == min(m) for c, m in members.items()), "min-label rule broken"

    edges = [
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_lsh_candidates"](spark, SF_ORACLE)
        .filter("est_jaccard >= 0.5")
        .collect()
    ]
    assert edges, "no candidate edges at this SF — clustering untestable"
    for a, b in edges:
        assert a in clusters and b in clusters, f"edge endpoint unlabeled: {(a, b)}"
        assert clusters[a] == clusters[b], (
            f"edge {(a, b)} crosses clusters {(clusters[a], clusters[b])}"
        )
    # sanity: some cluster actually groups >1 doc
    assert any(len(m) > 1 for m in members.values())
