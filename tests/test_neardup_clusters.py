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


def test_chain_graph_diameter20_converges(spark):
    """A 21-node chain (diameter 20) — the shape that silently mislabeled
    under k-bounded min-label propagation — must fully collapse to one
    cluster rooted at the min node, thanks to large-star/small-star's
    logarithmic convergence."""
    from kasper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "a long, b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(21)}


def test_random_graph_matches_union_find_oracle(spark):
    """Components on a deterministic pseudo-random graph must match a
    driver-side union-find oracle, including multiple components,
    duplicate edges, reversed edges, and self-loops."""
    import random

    from kasper_spark.operators.dedup import connected_components

    rng = random.Random(42)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    edges += [(b, a) for a, b in edges[:40]]  # reversed duplicates
    edges += [(i, i) for i in range(0, n, 37)]  # self-loops

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges if e[0] != e[1] for v in e}
    expected = {v: find(v) for v in touched}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == expected


def test_pagerank_is_a_probability_distribution(spark):
    """Structural invariants of the PageRank fixpoint: ranks are positive
    and sum to 1 (up to the documented 1e-14-per-term quantization) — a
    broken edge symmetrization or dangling-mass leak shows up here long
    before the oracle hash does."""
    from kasper_spark.registry import QUERIES

    rows = QUERIES["pagerank_neardup_graph"](spark, SF_ORACLE).collect()
    assert rows, "graph should be non-empty at smoke scale"
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-9, total
    assert all(r["pagerank"] > 0 for r in rows)
    # symmetric graph: neighbor counts match the edge-list degrees
    assert all(r["n_neighbors"] >= 1 for r in rows)


def test_minhash_contract_flags_and_family_agreement(spark):
    """Round-7 regression gates for the minhash hash family:

    1. the error-contract flags are all 1 (|est - J| <= 0.2 over every
       bounded pair, disjoint pairs included) — the affine h1+i*h2 family
       this replaced produced |est - J| = 0.87 (est 0.875 at J = 1/110);
    2. the two INDEPENDENT families (production xxhash64(i, s) and the
       oracle-certified md5('{i}|'||s)) must agree on the verified
       near-dup pair set — a family-specific artifact cannot survive both.
    """
    rows = QUERIES["minhash_jaccard_contract"](spark, SF_ORACLE).collect()
    assert rows
    assert all(r["mh_within_bound"] == 1 for r in rows)
    xx = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_lsh_candidates"](spark, SF_ORACLE)
        .filter("est_jaccard >= 0.5")
        .collect()
    }
    md5p = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["lsh_candidates_md5"](spark, SF_ORACLE).collect()
    }
    assert xx == md5p and xx
