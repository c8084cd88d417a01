"""Round-16 OPTIMIZATION gates.

Helper-level pins for this round's changes, so a future edit that breaks
one fails here first rather than in a 50-query sweep:

- the result cache's code-version keying (r15 verdict "what's wrong" #1:
  an edit to the builder must force a rebuild);
- correctness hardening from ADVICE r15 (df=0 n_terms semantics, numpy
  ranking NaN guard, retrain pending-tail assert, reclaim glob assert).
"""

from __future__ import annotations

import os
import textwrap

from kasper_spark.registry import load_all_operators
from tests.conftest import SF_ORACLE  # noqa: F401

load_all_operators()


def test_result_cache_key_tracks_builder_source(tmp_path):
    """Editing the file that defines the build callable must change the
    cache directory (so a stale cache built by OLD code can never be
    served), while the same source keeps the key stable."""
    from kasper_spark.functions.result_cache import cache_dir, code_token

    mod = tmp_path / "builder_mod.py"
    mod.write_text(
        textwrap.dedent(
            """
            def build():
                return "v1"
            """
        )
    )
    ns1: dict = {}
    exec(compile(mod.read_text(), str(mod), "exec"), ns1)
    # a data file for the fingerprint side of the key
    (tmp_path / "documents.parquet").write_bytes(b"x" * 16)

    d1 = cache_dir(str(tmp_path), "t", "documents", build=ns1["build"])
    d1_again = cache_dir(str(tmp_path), "t", "documents", build=ns1["build"])
    assert d1 == d1_again, "same source must give a stable key"

    tok1 = code_token(ns1["build"])
    mod.write_text(
        textwrap.dedent(
            """
            def build():
                return "v2"  # a material edit to the builder's module
            """
        )
    )
    ns2: dict = {}
    exec(compile(mod.read_text(), str(mod), "exec"), ns2)
    tok2 = code_token(ns2["build"])
    assert tok1 != tok2, "editing the builder's file must change the token"
    d2 = cache_dir(str(tmp_path), "t", "documents", build=ns2["build"])
    assert d1 != d2, "an edit to the builder must re-key the cache dir"


def test_result_cache_inflight_chains_carry_module_token():
    """The cached eval/retrieval chains must key on their own operator
    module's source (the exact invalidation the r15 verdict asked for:
    an edit to _graded_scored forces a rebuild)."""
    import hashlib

    from kasper_spark.functions.result_cache import code_token
    from kasper_spark.operators import evaluation, retrieval

    for mod, fn in [
        (evaluation, evaluation._graded_scored),
        (retrieval, retrieval._bm25_ranked),
    ]:
        with open(mod.__file__, "rb") as f:
            want = hashlib.md5(f.read()).hexdigest()[:10]
        assert code_token(fn) == want

# ---- Fused numpy ADC pass (r15 verdict ticket #3) ---------------------
#
# The five PQ serving chains collapsed their encode/LUT/groupBy join
# pyramids into _np_adc_scan; the pre-round-16 join-chain forms stay
# in-tree as references. These pins assert row-for-row equality of the
# public results and of every driver-twin kernel the scan consumes.


def test_ann_pq_topk_matches_joinchain(spark):
    from kasper_spark.operators.similarity import _ann_pq_topk_joinchain
    from kasper_spark.registry import QUERIES

    got = sorted(map(tuple, QUERIES["ann_pq_topk"](spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, _ann_pq_topk_joinchain(spark, SF_ORACLE).collect()))
    assert got == want


def test_ann_ivf_pq_topk_matches_joinchain(spark):
    from kasper_spark.operators.similarity import _ann_ivf_pq_topk_joinchain
    from kasper_spark.registry import QUERIES

    got = sorted(map(tuple, QUERIES["ann_ivf_pq_topk"](spark, SF_ORACLE).collect()))
    want = sorted(
        map(tuple, _ann_ivf_pq_topk_joinchain(spark, SF_ORACLE).collect())
    )
    assert got == want


def test_ann_ivf_pq_residual_matches_joinchain(spark):
    from kasper_spark.operators.similarity import _ann_ivf_pq_residual_joinchain
    from kasper_spark.registry import QUERIES

    got = sorted(
        map(tuple, QUERIES["ann_ivf_pq_residual"](spark, SF_ORACLE).collect())
    )
    want = sorted(
        map(tuple, _ann_ivf_pq_residual_joinchain(spark, SF_ORACLE).collect())
    )
    assert got == want


def test_pq_encode_packed_matches_codes_array(spark):
    """packed=True must emit exactly the rows _codes_array(long form)
    produces — same vec_ids, same sub_j-ordered code arrays."""
    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import (
        _codes_array,
        _pq_codebook_df,
        _pq_encode_np,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    cb = _pq_codebook_df(emb)
    got = {
        r["vec_id"]: tuple(r["codes"])
        for r in _pq_encode_np(emb, cb, packed=True).collect()
    }
    want = {
        r["vec_id"]: tuple(r["codes"])
        for r in _codes_array(_pq_encode_np(emb, cb)).collect()
    }
    assert got == want


def test_pqres_encode_packed_matches_codes_array(spark):
    from kasper_spark.operators.similarity import (
        _codes_array,
        _pqres_codebook,
        _pqres_encode_np,
        _residual_core,
    )

    core = _residual_core(spark, SF_ORACLE)
    cb = _pqres_codebook(core["res"])
    got = {
        r["vec_id"]: tuple(r["codes"])
        for r in _pqres_encode_np(core["res"], cb, packed=True).collect()
    }
    want = {
        r["vec_id"]: tuple(r["codes"])
        for r in _codes_array(_pqres_encode_np(core["res"], cb)).collect()
    }
    assert got == want


def test_seedk_probe_driver_matches_scan(spark):
    """The driver probe twin must produce exactly the (query, cid) pairs
    of the distributed seed-K rank scan at nprobe."""
    from kasper_spark.operators.similarity import (
        _IVF_NPROBE,
        _collect_query_state,
        _seedk_probe_driver,
        _seedk_rank_scan,
        _seedk_state,
    )

    qids, Q, qn = _collect_query_state(spark, SF_ORACLE)
    seed_state = _seedk_state(spark, SF_ORACLE)
    pm = _seedk_probe_driver(qids, Q, qn, seed_state, _IVF_NPROBE)
    got = {(int(qids[p]), int(cid)) for cid, ps in pm.items() for p in ps}
    want = {
        (r["vec_id"], r["cid"])
        for r in _seedk_rank_scan(
            spark, SF_ORACLE, _IVF_NPROBE, queries_only=True
        ).collect()
    }
    assert got == want


def test_assign_probe_driver_matches_scan(spark, tmp_path):
    """The trained-centroid driver probe twin must equal the collected
    _assign_rows_scan_np pairs over the query rows (same kernel, no
    Spark job)."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table
    from kasper_spark.operators.similarity import (
        _N_QUERY,
        _assign_probe_driver,
        _assign_rows_scan_np,
        _collect_query_state,
        _train_centroids_arrays,
        _write_centroids_parquet,
    )

    cids, S, n = _train_centroids_arrays(spark, SF_ORACLE, k=8, train_n=200)
    cent = str(tmp_path / "centroids")
    _write_centroids_parquet(cent, cids, S, n)

    qids, Q, _qn = _collect_query_state(spark, SF_ORACLE)
    pm = _assign_probe_driver(qids, Q, cent, 3)
    got = {(int(qids[p]), int(cid)) for cid, ps in pm.items() for p in ps}
    emb = load_table(spark, SF_ORACLE, "embeddings")
    want = {
        (r["vec_id"], r["cluster_id"])
        for r in _assign_rows_scan_np(
            emb.filter(F.col("vec_id") < _N_QUERY), cent, 3
        ).collect()
    }
    assert got == want


# ---- Structural contracts for the two no_oracle queries (verdict #8) --


def test_structural_contract_fixtures_pinned(spark):
    """The SF-independent fixture fingerprints must match their pinned
    values — any drift in the hyperplane derivation / signature fold /
    simhash tokenizer+fold trips this before the driver window does."""
    from kasper_spark.operators.dedup import (
        _SIMHASH_FIXTURE_MD5,
        _simhash_fixture_fingerprint,
    )
    from kasper_spark.operators.similarity import (
        _LSH_FIXTURE_MD5,
        _lsh_fixture_fingerprint,
    )

    assert _lsh_fixture_fingerprint(spark) == _LSH_FIXTURE_MD5
    assert _simhash_fixture_fingerprint(spark) == _SIMHASH_FIXTURE_MD5


def test_structural_contracts_all_zero(spark):
    from kasper_spark.registry import QUERIES

    for name in ("ann_lsh_topk_contract", "simhash_fingerprints_contract"):
        row = QUERIES[name](spark, SF_ORACLE).collect()[0]
        assert all(v == 0 for v in row.asDict().values()), (name, row)


# ---- ER per-block union-find closure (verdict #4) ---------------------


def test_entity_resolution_matches_loop(spark):
    """The per-block union-find ER must return exactly the rows of the
    large/small-star-loop form it replaced."""
    from kasper_spark.operators.dedup import _entity_resolution_loop
    from kasper_spark.registry import QUERIES

    got = sorted(
        map(tuple, QUERIES["entity_resolution_pipeline"](spark, SF_ORACLE).collect())
    )
    want = sorted(map(tuple, _entity_resolution_loop(spark, SF_ORACLE).collect()))
    assert got == want


def test_cc_within_blocks_matches_connected_components(spark):
    """On a synthetic blocked edge set (edges never span blocks), the
    one-pass union-find must label components exactly like the loop:
    cluster_id = min doc_id, one row per endpoint."""
    from kasper_spark.operators.dedup import _cc_within_blocks, connected_components

    edges = [
        # block A: chain 1-2-3-4 plus dup + self-noise patterns
        ("A", 1, 2), ("A", 2, 3), ("A", 3, 4), ("A", 1, 2),
        # block A: separate pair
        ("A", 10, 11),
        # block B: star around 20, ids overlapping block A's range is
        # impossible by construction in real blocking; keep disjoint
        ("B", 20, 21), ("B", 20, 22), ("B", 21, 23),
        # block C: single edge
        ("C", 30, 31),
    ]
    df = spark.createDataFrame(edges, "bk string, doc_a long, doc_b long")
    got = sorted(
        map(tuple, _cc_within_blocks(df, ["bk"]).collect())
    )
    want = sorted(
        map(tuple, connected_components(df.select("doc_a", "doc_b")).collect())
    )
    assert got == want


# ---- Pre-resolved-literal BM25/eval chains (r15 verdict floor ticket #6)
#
# The driver-bounded stats/df/qt sides of the BM25 scoring plans are
# resolved up front and inlined as literals; the broadcast-join forms
# stay in-tree as references. These pins assert row-for-row equality
# (including the DECIMAL(30,12) scores bit-for-bit, via tuple compare).


def test_graded_scored_literal_matches_joinform(spark):
    from kasper_spark.operators.evaluation import (
        _graded_scored,
        _graded_scored_joinform,
    )

    got = sorted(map(tuple, _graded_scored(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, _graded_scored_joinform(spark, SF_ORACLE).collect()))
    assert got and got == want


def test_bm25_ranked_literal_matches_joinform(spark):
    from kasper_spark.operators.retrieval import (
        _bm25_ranked,
        _bm25_ranked_joinform,
    )

    got = sorted(map(tuple, _bm25_ranked(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, _bm25_ranked_joinform(spark, SF_ORACLE).collect()))
    assert got and got == want


def test_prf_round2_literal_matches_joinform(spark):
    """The literal-terms round-2 scorer must equal the DataFrame-terms
    join form over the same collected expansion set."""
    from kasper_spark.operators.retrieval import (
        _BM25_TERMS,
        _bm25_score_over_literal_terms,
        _bm25_score_over_terms,
        _prf_expansion,
    )

    expansion, docs = _prf_expansion(spark, SF_ORACLE)
    terms2 = _BM25_TERMS + tuple(
        r["term"] for r in expansion.select("term").collect()
    )
    got = sorted(
        map(tuple, _bm25_score_over_literal_terms(docs, terms2).collect())
    )
    terms_df = spark.createDataFrame([(t,) for t in terms2], ["term"])
    want = sorted(
        map(tuple, _bm25_score_over_terms(docs, terms_df).collect())
    )
    assert got and got == want


def test_ivf_trained_fused_matches_composition(spark):
    """The one-pass fused trained-IVF serve must return exactly the rows
    of the composed form (probe candidates + exact re-rank) it replaced,
    at both the fixed-K and the scaled-K parameterizations."""
    import os

    from kasper_spark.operators.similarity import (
        _collect_query_state,
        _exact_rerank,
        _ivf_trained_candidates_np,
        _ivf_trained_serve_fused,
        _parquet_nrows,
        _scaledk_params,
    )

    def composed(**kw):
        qstate = _collect_query_state(spark, SF_ORACLE)
        cand = _ivf_trained_candidates_np(spark, SF_ORACLE, qstate=qstate, **kw)
        return _exact_rerank(spark, SF_ORACLE, cand, qstate=qstate)

    got = sorted(map(tuple, _ivf_trained_serve_fused(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, composed().collect()))
    assert got and got == want

    n = _parquet_nrows(os.path.join(SF_ORACLE, "embeddings.parquet"))
    k, train_n, nprobe = _scaledk_params(n)
    got = sorted(
        map(
            tuple,
            _ivf_trained_serve_fused(
                spark, SF_ORACLE, k=k, train_n=train_n, nprobe=nprobe
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, composed(k=k, train_n=train_n, nprobe=nprobe).collect())
    )
    assert got and got == want


def test_lsh_n_buckets_scale_adaptive():
    from kasper_spark.operators.dedup import (
        _LSH_IDX_BUCKETS_CAP,
        _LSH_TARGET_LEAF_ROWS,
        _lsh_n_buckets,
    )

    assert _lsh_n_buckets(0) == 1
    assert _lsh_n_buckets(5_000) == 1
    assert _lsh_n_buckets(_LSH_TARGET_LEAF_ROWS) == 1
    assert _lsh_n_buckets(_LSH_TARGET_LEAF_ROWS + 1) == 2
    assert _lsh_n_buckets(10 * _LSH_TARGET_LEAF_ROWS) == 10
    assert _lsh_n_buckets(10**12) == _LSH_IDX_BUCKETS_CAP
