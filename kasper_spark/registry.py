"""Query registry: the single source of truth tying each declared operator
(SURVEY.md §2.D) to (a) its Spark implementation and (b) its DuckDB oracle SQL.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Contract (driver-enforced):
- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- oracle SQL runs on DuckDB views named after the parquet tables;
- column names must match exactly between the two (the driver sorts columns
  by name before value-hashing) — alias everything, both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB SQL; omit only for genuinely
    non-SQL-expressible operators (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module for its registration side effects."""
    # Imports are inside the function so `import kasper_spark` stays cheap
    # and circular-import-free.
    import kasper_spark.operators  # noqa: F401


# The driver's per-round correctness sweep checks the FIRST 50 entries of
# queries() in dict order (observed: CORRECTNESS_r01-r14 are exact ordered
# prefixes of the registry). Round-15 rotation policy (r14 verdict ticket
# #1, same mechanics as r8-r14): lead with entries whose implementations/
# oracles are NEW or CHANGED this round (they must earn fresh green rows),
# then rotate in the cohort whose newest driver rows are the OLDEST.
# Entries not listed keep registration order after these. Ordering is
# presentation-only: names, implementations and oracles are untouched.
#
# CHANGED-set rule (ADVICE r14 #5 asked for an explicit, complete
# criterion): a query is "changed" iff code it EXECUTES changed
# MATERIALLY this round — new logic in its own body or in a shared
# helper on its path (the LSM append shape, the self-healing fold, the
# serving pending-union/nprobe/generation resolution, the shared
# reclaim's broadcast gate). Signature-only or comment-only edits do not
# count (else the index_catalog import graph would mark the whole
# registry changed every round); the result-cache chain is untouched
# this round, so no eval-family entries qualify. Under this rule:
# - the 3 append twins + compaction (LSM pending tails, group folds);
# - the 4 serving paths that resolve pending tails / marker-k nprobe /
#   generations (ann_ivf_search_only, ann_ivf_pq_search_only,
#   ann_ivf_split_search_only, lsh_neardup_search_only);
# - the 4 delete/reclaim queries on the shared reclaim's gated
#   broadcast + gen-aware marker rewrite.
# ann_ivf_pq_residual_search_only and the builders are NOT changed: their
# executed bodies are byte-equivalent (verified via git diff in the
# round-15 calibration).
#
# ROUND-16 ROTATION (r15 verdict ticket #1 — it outranks every speedup):
# the r15 oracle window was rotated at round open, HOURS before the
# optimization commits, so 24 of the 35 r15-rewired queries have no
# driver-oracle row for their new code (their safety net is the builder's
# own 370/370 sweep + pinned bit-identity tests). This window leads with
# exactly those 24 (the verdict's list: the exact-cosine consumers, the
# trained-IVF in-flight family, all 7 PQ/residual keys, the BM25 eval
# chain, and the lineage-cut text/relational pipelines), plus
# ann_lsh_topk (r15-rewired; no oracle by design — earns the driver's
# rows-only check). Any query rewired in round 16 is in this head: the
# r16 changes target the PQ ADC chain, ER and the LSH build (all
# already below), plus — session 2 — the literal-inlined BM25 chains
# (bm25/prf/rrf/hybrid join the window) and the fused trained-IVF serve
# (its two recall contracts join the window).
# Window arithmetic: 25 rewired + 2 r16 structural contracts + 6 r16
# session-2 rewired/fused + 17 r07-queue = 50.
# r17 queue (oldest evidence after this round): the remaining r07 names
# (neardup_clusters, q4_order_priority, q8_market_share,
# session_window_native, sessionize_events, streaming_lsh_dedup_twin,
# triangle_lsh_graph, xml_roundtrip_orders, zorder_key_events, and the
# six TPC-H tails q17/q19/q20/q21/q22/q2 displaced by the session-2
# entries), then the r08 cohort.
DRIVER_SAMPLE_PRIORITY: list[str] = [
    # -- 0. r15-rewired, driver-unverified (25). Exact-cosine numpy
    #       consumers (_np_dot_exact_scaled / _exact_rerank):
    "ann_bruteforce_topk",
    "knn_label_disagreement",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivf_scaledk_topk",
    # PQ / residual family (7): _seedk_rank_scan, _pqres_encode_np,
    # _pq_encode_np via _pq_parts — and the round-16 ADC work lands here
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_index_build",
    "ann_ivf_pq_search_only",
    "ann_ivf_pq_residual",
    "ann_ivf_pq_residual_index_build",
    "ann_ivf_pq_residual_search_only",
    # BM25 eval chain (_graded_scored sparse rewrite + the round-16
    # df=0 n_terms fix; mrr also the one-pass conditional aggregation).
    # Round-16 session 2 rewired the WHOLE chain again (pre-resolved
    # literals, OPTIMIZATION_r16.md #10), so every consumer — including
    # the cache-served ones that rebuilt under the new code token — is
    # in-window:
    "mrr_relevance_contract",
    "ndcg_relevance_contract",
    "precision_recall_at_k",
    "prf_query_expansion_topk",
    "bm25_keyword_topk",
    "prf_expansion_terms",
    "rrf_fusion_topk",
    "hybrid_search_topk",
    # fused trained-IVF serve (OPTIMIZATION_r16.md #11): the two topk
    # keys are already above; their recall contracts re-execute the
    # fused scan and join the window (each r16 slot displaces one r07
    # TPC-H tail name to the r17 queue)
    "ann_ivf_trained_recall_contract",
    "ann_ivf_scaledk_recall_contract",
    # md5 signature family (_md5_sigs Python pass) + lineage-cut pipelines
    "lsh_index_build",
    "market_basket_lift",
    "boilerplate_shingle_stats_cms",
    "curation_pipeline_e2e",
    "entity_resolution_pipeline",
    "q1_pricing_summary",
    "minhash_lsh_candidates",
    "mutual_knn_pairs",
    # r15-rewired with no oracle by design (hyperplane matrix + numpy
    # signature fold): the driver's rows-only check is the available gate
    "ann_lsh_topk",
    # r16 structural contracts (verdict #8): all-zero invariant rows the
    # oracle CAN express, ending the standing no_oracle asterisk on
    # ann_lsh_topk / simhash_fingerprints (each slot displaces one r07
    # TPC-H name to the r17 queue)
    "ann_lsh_topk_contract",
    "simhash_fingerprints_contract",
    # -- 1. The r07 cohort continuation (25 of the remaining 32; newest
    #       evidence r07), alphabetically — the queue the r15 rotation
    #       wrote down, minus minhash_lsh_candidates (in the head above)
    #       and minus neardup_clusters (no oracle by design: a window
    #       slot spent on it records only a rows-check; it stays in the
    #       r17 queue, scd2_user_event_intervals takes its slot):
    "minhash_jaccard_contract",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_scene_cuts",
    "multimodal_wav_features",
    "scd2_user_event_intervals",
    "orc_roundtrip_supplier",
    "pagerank_lsh_graph",
    "partitioned_parquet_prune",
    "q10_returned_items",
    "q11_important_value",
    "q12_late_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    # (q17/q19/q20/q21/q22/q2 displaced to the r17 queue by the six
    # round-16-session-2 rewired/fused entries above — rewired-unverified
    # outranks evidence refresh, the r15 verdict's standing rule)
]



def driver_ordered(mapping: dict) -> dict:
    """Reorder a registry view so DRIVER_SAMPLE_PRIORITY names come first
    (in priority order), then everything else in registration order."""
    head = [n for n in DRIVER_SAMPLE_PRIORITY if n in mapping]
    head_set = set(head)
    return {n: mapping[n] for n in head + [n for n in mapping if n not in head_set]}
