"""Fingerprint-keyed persisted result cache — the IVF-index discipline
(operators/similarity.py's _ivf_index_dir) applied to derived rankings.

A certification family often shares one expensive, deterministic
intermediate (the decimal-exact BM25 scored ranking feeds MRR, nDCG,
P/R@k, PRF expansion). Re-deriving it per query is correct but wasteful:
production builds the ranking once per corpus version and serves every
evaluation from it. This helper persists such an intermediate under a
directory keyed by the source table's (size, mtime_ns) fingerprint, so:

- a data refresh can never serve a stale ranking (new fingerprint ->
  new dir -> lazy rebuild);
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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kasper_spark import index_catalog as _cat

_MARKER = "_KASPER_CACHE_READY"


def cache_dir(sf_dir: str, name: str, fingerprint_table: str) -> str:
    return _cat.fingerprint_dir(
        f"kasper-cache-{name}",
        os.path.join(sf_dir, f"{fingerprint_table}.parquet"),
    )


def cached_result(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fingerprint_table: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``build()``'s result as read back from the fingerprint-keyed
    parquet cache, building it lazily on first use per corpus version."""
    d = cache_dir(sf_dir, name, fingerprint_table)
    data = os.path.join(d, "data")
    if not _cat.marker_exists(d, _MARKER):
        build().write.mode("overwrite").parquet(data)
        _cat.marker_write(d, _MARKER, ok=1)
    return spark.read.parquet(data)
