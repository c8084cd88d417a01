"""Fingerprint-keyed persisted result cache — the IVF-index discipline
(operators/similarity.py's _ivf_index_dir) applied to derived rankings.

A certification family often shares one expensive, deterministic
intermediate (the decimal-exact BM25 scored ranking feeds MRR, nDCG,
P/R@k, PRF expansion). Re-deriving it per query is correct but wasteful:
production builds the ranking once per corpus version and serves every
evaluation from it. This helper persists such an intermediate under a
directory keyed by the source table's (size, mtime_ns) fingerprint AND
a hash of the builder's source file (r15 verdict "what's wrong" #1: a
data-only key silently served results built by OLD code after an edit
to the chain — the code token makes any edit to the defining module
force a rebuild), so:

- a data refresh can never serve a stale ranking (new fingerprint ->
  new dir -> lazy rebuild);
- an edit to the builder's module can never serve a result the current
  code would not produce (new code token -> new dir -> lazy rebuild;
  over-invalidation on unrelated edits to the same file costs one
  rebuild, never correctness);
- the READY marker lands only after the data write completes, so a crash
  mid-build leaves no marker and the next reader rebuilds;
- values are unchanged bit-for-bit: every cached column type used here
  (BIGINT, DECIMAL, DOUBLE, STRING) round-trips parquet exactly, so
  consumers certified against recompute-from-scratch oracles stay
  hash-green (asserted per family in tests/test_round13_ops.py).

One query per family stays on the in-flight chain as the build-path
certification (mrr_relevance_contract, bm25_keyword_topk); the rest
serve from the cache — bench then reports build and serve costs
separately, the FAISS train/add-vs-search attribution.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kasper_spark import index_catalog as _cat

_MARKER = "_KASPER_CACHE_READY"


def code_token(build: Callable) -> str:
    """Hash of the source FILE that defines ``build`` (for the lambda
    wrappers used by the cached chains, co_filename is the operator
    module that also defines the chain itself — exactly the code whose
    edits must invalidate the cache). Falls back to a constant when no
    source is reachable (interactive/defensive path; the data
    fingerprint still applies)."""
    code = getattr(build, "__code__", None)
    path = getattr(code, "co_filename", None)
    try:
        with open(path, "rb") as f:
            src = f.read()
    except (TypeError, OSError):
        return "nosrc"
    return hashlib.md5(src).hexdigest()[:10]


def cache_dir(
    sf_dir: str, name: str, fingerprint_table: str, build: Callable | None = None
) -> str:
    """Cache directory keyed on (source-table fingerprint, builder code
    version). ``build=None`` keeps the data-only v1 key for callers that
    only need the legacy location (none in-tree; tests pass the builder)."""
    version = "v1" if build is None else f"v2-{code_token(build)}"
    return _cat.fingerprint_dir(
        f"kasper-cache-{name}",
        os.path.join(sf_dir, f"{fingerprint_table}.parquet"),
        version=version,
    )


def cached_result(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fingerprint_table: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``build()``'s result as read back from the fingerprint-keyed
    parquet cache, building it lazily on first use per (corpus version,
    builder code version)."""
    d = cache_dir(sf_dir, name, fingerprint_table, build)
    data = os.path.join(d, "data")
    if not _cat.marker_exists(d, _MARKER):
        build().write.mode("overwrite").parquet(data)
        _cat.marker_write(d, _MARKER, ok=1)
    return spark.read.parquet(data)
