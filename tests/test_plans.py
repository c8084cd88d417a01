"""Plan-quality gates: the physical plans we rely on at 100 TB must not
silently regress. Each assertion maps to a scale requirement:

- filter pushdown + column pruning -> scans read only needed data
- broadcast joins for dimension tables -> no shuffle of the small side
- rank-limit windows -> per-partition top-k, no global sort
- TakeOrderedAndProject -> top-k without full sort
- partial aggregation -> shuffle carries groups, not rows
"""

from __future__ import annotations

import pytest

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    # the discount + shipdate predicates must reach the scan
    assert "l_discount" in plan.split("PushedFilters")[1][:300]


def test_scan_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # ReadSchema must not include unused columns like l_orderkey/l_partkey
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q3_broadcasts_customer(spark):
    plan = _plan(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_all_dims_broadcast(spark):
    plan = _plan(spark, "q5_local_supplier")
    # customer/supplier/nation/region all broadcast; only lineitem-orders
    # may shuffle
    assert plan.count("BroadcastHashJoin") >= 4


def test_topk_uses_window_group_limit(spark):
    plan = _plan(spark, "window_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_semi_anti_join_shapes(spark):
    semi = _plan(spark, "join_semi")
    anti = _plan(spark, "join_anti")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_partial_aggregation(spark):
    plan = _plan(spark, "word_count")
    # HashAggregate appears twice: partial (map-side) + final after shuffle
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_in_oracle_checked_joins(spark):
    for name in ("q3_top_orders", "q5_local_supplier", "join_left_outer"):
        assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name,needle",
    [
        ("minhash_lsh_candidates", "concat_ws"),   # shingle construction
        ("ann_lsh_topk", "xxhash64"),              # hyperplane signatures
    ],
)
def test_no_inferred_filter_duplicates_generator_input(spark, name, needle):
    """InferFiltersFromGenerate guard (SCALING.md "Catalyst pitfall"):
    explode over a materialized alias of an expensive array lets Catalyst
    inline the whole defining expression into an inferred size>0 filter
    pushed below the repartition Exchange — re-running the pipeline per row
    on the un-repartitioned scan (18-88x slower measured). The expensive
    expression must therefore never appear inside a Filter node."""
    plan = _plan(spark, name)
    for line in plan.splitlines():
        stripped = line.strip(" +-:*")
        if stripped.startswith("Filter ") or stripped.startswith("PushedFilters"):
            assert needle not in line, f"{name}: expensive expr in filter: {line[:200]}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("grouping_sets_orders", 1),   # ONE scan + Expand, not a UNION of scans
        ("unpivot_part_metrics", 0),   # wide->long with NO shuffle at all
        ("events_sliding_1h_15m", 1),  # 4x window Expand, one keyed shuffle
    ],
)
def test_expand_based_ops_single_pass(spark, name, max_exchanges):
    """Multi-granularity / multi-window / unpivot operators must compile to
    an Expand over a single scan (map-side row multiplication), never to
    repeated scans or extra shuffles — the difference between 1 and N passes
    over 100 TB."""
    plan = _plan(spark, name)
    assert "Expand" in plan, f"{name}: expected Expand-based plan"
    assert plan.count("Exchange") <= max_exchanges, plan[:500]


def test_q6_all_predicates_pushed(spark):
    """Q6 is the pushdown showcase: shipdate range, discount range, and
    quantity predicates must all reach the parquet scan."""
    plan = _plan(spark, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1][:500]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


# bounded-|Q| cross joins by design (broadcast side is the small query set)
_INTENTIONAL_BNLJ = {
    "ann_bruteforce_topk",
    "ann_ivf_recall_contract",  # composes the two bounded-|Q| searches below
    "ann_pq_recall_contract",  # same composition over the PQ/ADC path
    "ann_lsh_recall_contract",  # same composition over the certified-LSH path
    "ann_ivf_pq_recall_contract",  # same composition over the composed index
    "ann_ivf_trained_recall_contract",  # same composition over the trained IVF
    "ann_ivf_pq_trained_recall_contract",  # same composition, fully trained
    "ann_ivf_topk",
    "ann_ivf_pq_topk",  # same bounded corpus x centroids assignment as IVF
    "ann_ivf_pq_residual",  # same assignment + bounded centroid-term join
    "ann_ivf_pq_residual_recall_contract",  # composition over the above
    "ann_int8_topk",
    "embedding_neardup_pairs",
    "semantic_dedup_leader",  # bounded-subset all-pairs + leader anti-join
    "tokenset_jaccard_pairs",
    "minhash_jaccard_contract",  # bounded (doc_id<40) all-pairs contract check
    "hard_negative_mining",  # bounded (vec_id<20) anchor set, ann-baseline shape
    "semantic_decontaminate",  # same bounded eval-anchor broadcast, map-side scoring
    "lsh_precision_recall_contract",  # 1-row count broadcasts (P/R scalar row)
    "chi2_source_divergence",  # S x 256-word expected grid + 1-row total, both broadcast
    "exact_quantiles_histogram",  # groups x 3-quantile rank lookup, broadcast
    "interarrival_quantiles_by_type",  # same 3-row quantile rank lookup, broadcast
    "streaming_interarrival_twin",  # shares that tail over the drained partials
    "streaming_quantile_twin",  # same 3-row rank lookup over the merged histogram
    "session_duration_quantiles",  # same 3-row rank lookup over the duration domain
    "conversion_latency_quantiles",  # same 3-row rank lookup over the latency domain
    "length_robust_scaler_params",  # same 3-row rank lookup over the length domain
    "dq_freshness_by_type",  # 1-row global-max broadcast (Q22 shape)
    "pagerank_neardup_graph",  # same bounded (doc_id<40) all-pairs edge build
    "label_propagation_communities",  # same bounded all-pairs edge build
    "neardup_cc_canonical",  # same bounded all-pairs edge build
    "triangle_clustering_coeff",  # same bounded all-pairs edge build
    # 1-row broadcast of a global scalar-subquery threshold (TPC-H Q22
    # shape) — the same physical shape Spark gives a ScalarSubquery.
    "q22_idle_rich_customers",
    "market_basket_lift",  # 1-row broadcast: global basket count (Q22 shape)
    "market_basket_triples",  # same 1-row basket-count broadcast (Q22 shape)
    "bpe_learn_merges",  # 1-row broadcast per merge round: the winning pair
    "forecast_mase_seasonal_naive",  # same bounded types x hours spine as gapfill
    "streaming_mase_twin",  # shares that spine over the drained partials
    "theil_sen_daily_trend",  # bounded types x days spine + 1-row bounds broadcast
    "negative_sampling_table",  # 1-row broadcast of the corpus token total
    "quality_percentile_calibration",  # 1-row broadcast: exact global median
    "q11_important_value",  # 1-row broadcast: national total threshold
    "q15_top_supplier",  # 1-row broadcast: global max revenue
    "tfidf_top_terms",  # 1-row broadcast of the corpus doc count
    "sparse_tfidf_cosine_pairs",  # same 1-row corpus-count broadcast (idf shift)
    "unigram_rarity_quality",  # 1-row broadcast of the corpus token total
    "gapfill_hourly_events",  # bounded spine: distinct types x hour sequence
    "cusum_changepoint_events",  # same bounded types x hours spine as gapfill
    "cusum_deseasonalized_events",  # same spine + |types| x 24 season broadcast
    "stl_decompose_hourly",  # same bounded types x hours spine
    "stl_residual_anomalies",  # the stl plan + a map-side gate
    "anomaly_ensemble_report",  # composes the stl + cusum spine plans
    "knn_label_disagreement",  # bounded audited set, ann-baseline shape
    "ks_quality_drift_by_source",  # sources x quality-bands grid + 1-row total, both broadcast
    "bm25_keyword_topk",  # 1-row broadcast of corpus stats (N, avgdl)
    "rrf_fusion_topk",  # same 1-row corpus-stats broadcast via BM25 ranker
    "token_budget_select",  # 1-row broadcast of the global token budget
    "hybrid_search_topk",  # 1-row query-vector broadcast + corpus-stats broadcast
    "key_skew_report",  # 1-row broadcasts of per-key-audit totals/thresholds
    "boilerplate_shingle_stats_cms",  # 1-row broadcast: CM sketch map + doc count
    "mrr_relevance_contract",  # 1-row broadcast of corpus stats (BM25 shape)
    "ndcg_relevance_contract",  # same 1-row corpus-stats broadcast (BM25 shape)
    "bpe_encode_compression",  # 1-row winner broadcast per merge (learn-op shape)
    "conformal_forecast_intervals",  # bounded types x hours spine + 1-row bounds
    "prf_expansion_terms",  # 1-row corpus-count broadcast in the term gate
    "prf_query_expansion_topk",  # BM25 corpus-stats + bounded term-set broadcasts
    # map-only IVF assignment: ONE broadcast row carrying all k trained
    # centroids, ranked in-row per vector (zero-shuffle scan — the r10
    # rewrite that took the trained family from 2.9-3.3x to <=1.6x at 10x)
    "kmeans_int8_assignments",
    "ann_ivf_trained_topk",
    "ann_ivf_pq_trained",
    "ann_ivf_scaledk_topk",  # same map-only broadcast-centroid scan, K ~ sqrt(N)
    "ann_ivf_scaledk_recall_contract",  # recall composition over the above
    # dense class x 5-row sensitive-domain spine (gapfill pattern)
    "t_closeness_audit",
    "streaming_t_closeness_twin",  # same report projection over merged partials
    # grid-sized: 1-row (n,S) stat broadcast + 24-row lag spine over the
    # calendar-bounded hourly series
    "hourly_autocorrelation",
    "streaming_acf_twin",  # same projection over the merged partials
}
# iterative/streaming queries execute during construction — skip plan-only audit
_AUDIT_SKIP = {"neardup_clusters"}


# Lineage-cut gate for the iterative family: every loop must eagerly
# localCheckpoint its evolving state per round (the connected_components
# discipline), so the FINAL plan's exchange count stays O(one round), not
# O(rounds x upstream pipeline). Before this gate existed, uncut loops
# shipped plans of 1,838 (pagerank_lsh_graph), 1,098 (lpa_lsh_graph) and
# 184 (ann_ivf_trained_topk) exchanges — at 100 TB that is minutes of
# Catalyst planning and a recompute cascade on any eviction. Caps are the
# measured post-fix counts (2-20) plus headroom; a cap breach means a
# checkpoint was dropped from a loop.
_ITERATIVE_EXCHANGE_CAPS = {
    "pagerank_neardup_graph": 10,
    "pagerank_lsh_graph": 10,
    "label_propagation_communities": 10,
    "lpa_lsh_graph": 10,
    "triangle_clustering_coeff": 24,
    "triangle_lsh_graph": 24,
    "kmeans_int8_assignments": 14,
    "ann_ivf_trained_topk": 32,
    "ann_ivf_scaledk_topk": 32,
    "ann_ivf_pq_trained": 40,
    "neardup_cc_canonical": 10,
    "cc_lsh_graph": 10,
    "bfs_khop_lsh_graph": 10,
}


@pytest.mark.parametrize("name", sorted(_ITERATIVE_EXCHANGE_CAPS))
def test_iterative_queries_cut_lineage(spark, name):
    """Iterative operators (PageRank/LPA/CC/k-means/trained-IVF) must plan
    a bounded number of exchanges regardless of iteration count — proof
    that every round's state is checkpointed, not accumulated as lineage.
    (These queries execute during construction: localCheckpoint is eager.)"""
    cap = _ITERATIVE_EXCHANGE_CAPS[name]
    plan = _plan(spark, name)
    n = plan.count("Exchange")
    assert n <= cap, f"{name}: {n} exchanges > cap {cap} — a per-round lineage cut regressed"


def test_repo_wide_plan_hygiene(spark):
    """Every registered batch query's physical plan must be free of
    accidental scale hazards: no CartesianProduct ever, BNLJ only on the
    allow-listed bounded cross joins, and no scan reading more than 8
    columns (the widest intentional projection in the corpus)."""
    # ReadSchema is scan *metadata*, truncated at maxMetadataStringLength
    # (default 100 chars) in plan strings; a truncated schema has no closing
    # '>' and a newline-crossing regex would count unrelated plan text as
    # columns. Raise the limit so every schema prints whole.
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    problems = []
    for name in sorted(QUERIES):
        if name in _AUDIT_SKIP or name.startswith("multimodal"):
            continue
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in _INTENTIONAL_BNLJ:
            problems.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        import re as _re

        for m in _re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan):
            cols = [c for c in m.group(1).split(",") if c]
            if len(cols) > 8:
                problems.append(f"{name}: scan reads {len(cols)} columns")
    assert not problems, "\n".join(problems)


def test_decontaminate_broadcasts_eval_side(spark):
    """ngram_decontaminate's 100 TB contract: the (tiny) eval shingle set
    broadcasts; the corpus-side shingles must NOT shuffle before the join
    (no Exchange between the corpus scan/explode and the BroadcastHashJoin)."""
    plan = _plan(spark, "ngram_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # stream side of the broadcast join is the exploded corpus: everything
    # from the scan up to the join must be exchange-free
    stream_side = plan.split("BroadcastHashJoin")[1]
    probe_segment = stream_side.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_segment


def test_decontaminate_bloom_probe_is_map_side(spark):
    """ngram_decontaminate_bloom's 100 TB contract: the corpus side probes
    the packed bloom through BROADCAST joins only — its shingles must never
    shuffle before the exact-verify join. The sole hash exchanges allowed
    are the final contaminated-survivor aggregation; the eval pipeline runs
    once behind a lineage cut (un-cut, this plan measured 9 exchanges with
    the eval shingle shuffle executed 4x)."""
    plan = _plan(spark, "ngram_decontaminate_bloom")
    assert plan.count("BroadcastHashJoin") == 4  # 3 bloom probes + exact verify
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_doc_chunking_is_narrow(spark):
    """doc_chunk_overlap must stay a pure narrow transformation: the
    sequence/substr explode runs inside the scan stage with no shuffle."""
    plan = _plan(spark, "doc_chunk_overlap")
    assert "Exchange" not in plan
    assert "Generate posexplode" in plan


def test_quality_classifier_is_map_only(spark):
    """quality_classifier_logit's 100 TB contract: the hashed-feature
    weight sum runs as aggregate(transform(tokens)) inside the scan stage
    — no explode, no shuffle, nothing leaves the row."""
    plan = _plan(spark, "quality_classifier_logit")
    assert "Exchange" not in plan


def test_mix_apply_plans_window_group_limit(spark):
    """corpus_mix_apply's literal rank cap must plan a WindowGroupLimit
    (per-partition top-k per source) so map tasks emit ~BUDGET rows per
    source instead of fully ranking every source before the shuffle."""
    plan = _plan(spark, "corpus_mix_apply")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_curation_e2e_composes_scale_shapes(spark):
    """curation_pipeline_e2e must inherit every stage's scale shape when
    composed: broadcast ANTI join for the contaminated subtraction (no
    corpus shuffle to subtract a small set), WindowGroupLimit for the
    quota sample, and no cartesian anywhere."""
    plan = _plan(spark, "curation_pipeline_e2e")
    assert "LeftAnti" in plan and "Broadcast" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injectable(spark):
    """100 TB runtime-filtering contract: our declarative join shapes stay
    eligible for Spark's InjectRuntimeFilter. Locally the fact side is far
    under applicationSideScanSizeThreshold (10 GB) and dimension sides
    broadcast, so no bloom appears in normal runs — but at cluster scale a
    selective fact-fact shuffle join crosses the thresholds and Catalyst
    must be able to inject `bloom_filter_agg` + `might_contain` on the big
    side. Emulate the at-scale condition (thresholds down, broadcast off)
    and pin the injection; config mutations are restored so later tests see
    the tuned session."""
    import pyspark.sql.functions as F

    from kasper_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        o = (
            load_table(spark, SF_SMOKE, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_totalprice")
        )
        li = load_table(spark, SF_SMOKE, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_no_pinned_cache_left_behind(spark):
    """Runtime twin of the persist-discipline lint: after a heavy query
    family runs end-to-end, Spark's CacheManager must hold nothing — the
    sweep session runs 169 queries back-to-back, and a pinned cache from
    one would bleed executor memory into all the rest. (localCheckpoint
    blocks are NOT in the CacheManager; they're ContextCleaner-managed.)"""
    for name in ("minhash_lsh_candidates", "lsh_candidates_md5",
                 "kmeans_int8_assignments"):
        QUERIES[name](spark, SF_SMOKE).write.format("noop").mode("overwrite").save()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "a query left a pinned .persist()/.cache() entry in the CacheManager"
    )
