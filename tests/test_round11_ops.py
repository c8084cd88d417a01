"""Property gates for the round-11 corpus-analysis tier — the oracle sweep
certifies cross-engine value equality; these pin the semantic invariants a
refactor could silently break while both engines stay (wrongly) in
agreement."""

from __future__ import annotations

from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_ORACLE, SF_SMOKE

load_all_operators()


def test_containment_bounds_and_direction(spark):
    """Containments live in (0, 1]; the shared count never exceeds either
    set size; every emitted pair clears the gate on at least one side."""
    rows = QUERIES["shingle_containment_pairs"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r["contain_a"] <= 1.0 and 0 < r["contain_b"] <= 1.0, r
        assert r["n_shared"] <= min(r["na"], r["nb"]), r
        assert max(r["contain_a"], r["contain_b"]) >= 0.8, r


def test_sparse_cosine_cauchy_schwarz(spark):
    """Weighted cosine is bounded by 1 (integer weights, exact sums — any
    excess means the dot/norm accounting broke), and every emitted pair
    clears the tau gate."""
    rows = QUERIES["sparse_tfidf_cosine_pairs"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.5 <= r["cosine"] <= 1.0 + 1e-12, r
        assert r["n_shared"] >= 1


def test_sparse_and_containment_agree_on_heavy_dups(spark):
    """A pair that is a near-total containment dup (both sides >= 0.95)
    must also surface in the weighted-cosine detector — the two views
    disagree on asymmetric partials, never on full dups."""
    cont = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["shingle_containment_pairs"](spark, SF_ORACLE).collect()
        if min(r["contain_a"], r["contain_b"]) >= 0.95
    }
    cosp = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["sparse_tfidf_cosine_pairs"](spark, SF_ORACLE).collect()
    }
    assert cont, "no heavy dups at sf0.01 — gate data drifted"
    assert cont <= cosp, cont - cosp


def test_rfm_scores_and_segments(spark):
    """Every score in 1..5, quintiles roughly balanced (ntile guarantees
    |bucket sizes| differ by <= 1), and the segment label matches its
    rule on every row."""
    rows = QUERIES["rfm_customer_segments"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        if r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4:
            want = "champion"
        elif r["f_score"] >= 4:
            want = "loyal"
        elif r["m_score"] >= 4:
            want = "big_spender"
        elif r["r_score"] <= 2 and r["f_score"] <= 2:
            want = "hibernating"
        elif r["r_score"] <= 2:
            want = "at_risk"
        else:
            want = "regular"
        assert r["segment"] == want, r
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)


def test_zipf_slope_is_negative_and_exact(spark):
    """Rank-frequency slopes must be negative for every source (frequency
    falls with rank by construction of the ranking), and the exposed
    exact integers must reproduce the double."""
    rows = QUERIES["zipf_tail_index_by_source"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["slope_den"] > 0, r
        assert r["zipf_slope"] < 0, r
        assert r["zipf_slope"] == r["slope_num"] / r["slope_den"], r


def test_dup_inflation_accounting(spark):
    """Per source: dup counts/token sums never exceed totals, and the
    corpus-wide canonical count equals the distinct digest count."""
    rows = QUERIES["doc_dup_inflation_report"](spark, SF_ORACLE).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    total_dups = sum(r["n_dup_docs"] for r in rows)
    for r in rows:
        assert 0 <= r["n_dup_docs"] <= r["n_docs"], r
        assert 0 <= r["dup_tokens"] <= r["total_tokens"], r
        if r["inflation"] is not None:
            assert r["inflation"] >= 1.0, r
    from kasper_spark.catalog import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    n_digests = docs.select(F.md5("text").alias("d")).distinct().count()
    assert total_docs - total_dups == n_digests


def test_cross_lingual_pairs_cross_languages(spark):
    """Every emitted pair really crosses a language boundary and clears
    the Jaccard gate."""
    rows = QUERIES["cross_lingual_contamination"](spark, SF_ORACLE).collect()
    assert rows, "synthetic corpus has cross-lang dups — none found"
    for r in rows:
        assert r["lang_a"] != r["lang_b"], r
        assert r["jaccard"] >= 0.5, r


def test_reservoir_twin_matches_static_ranking(spark):
    """The merged ingest reservoir equals the whole-table md5 bottom-k per
    source (KMV merge exactness), with exactly k rows per source."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from kasper_spark.catalog import load_table

    got = {
        (r["source"], r["rk"]): r["doc_id"]
        for r in QUERIES["streaming_reservoir_twin"](spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = {
        (r["source"], r["rk"]): r["doc_id"]
        for r in docs.select(
            "source", "doc_id", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want


def test_market_basket_rule_algebra(spark):
    """Association-rule identities that hold by construction: the pair
    count never exceeds either item's basket count, confidence and
    support live in (0, 1], and lift satisfies its defining identity
    lift = confidence / P(b) (re-derived from the emitted counts)."""
    rows = QUERIES["market_basket_lift"](spark, SF_ORACLE).collect()
    assert rows, "no qualifying pairs at sf0.01 — support gates drifted"
    for r in rows:
        assert r["pair_baskets"] <= min(r["baskets_a"], r["baskets_b"]), r
        assert 0 < r["support"] <= 1.0 and 0 < r["confidence_a_b"] <= 1.0, r
        n_baskets = r["pair_baskets"] / r["support"]
        p_b = r["baskets_b"] / n_baskets
        assert abs(r["lift"] - r["confidence_a_b"] / p_b) < 1e-9, r
        assert r["item_a"] < r["item_b"], r


def test_streaming_quantile_twin_equals_batch(spark):
    """The ingest twin must reproduce the batch exact-quantile table
    bit-for-bit (same merged histogram -> same rank selection)."""
    import pandas as pd

    key = ["l_returnflag", "q"]
    batch = (
        QUERIES["exact_quantiles_histogram"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_quantile_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_quantile_hist_partials_merge_cut_invariantly(spark):
    """The value histogram is a mergeable sufficient statistic: cutting
    the input ANY way (here: 3 disjoint orderkey residue classes),
    emitting per-cut partials, and merging them yields exactly the
    uncut quantile table — the algebraic property the streaming twin's
    correctness rests on, checked without streaming machinery."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table
    from kasper_spark.operators.analytics import (
        quantile_hist_counts,
        quantiles_from_hist,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    whole = {
        (r["l_returnflag"], r["q"]): (r["n"], str(r["value_cents"]))
        for r in quantiles_from_hist(quantile_hist_counts(li)).collect()
    }
    parts = [
        quantile_hist_counts(li.filter(F.col("l_orderkey") % 3 == i))
        for i in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = u.groupBy("l_returnflag", "c").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    cut = {
        (r["l_returnflag"], r["q"]): (r["n"], str(r["value_cents"]))
        for r in quantiles_from_hist(merged).collect()
    }
    assert cut == whole


def test_bpe_merges_are_greedy_and_monotone(spark):
    """Three merge rows in rank order; pair counts are NON-INCREASING
    (a merge can only create pairs no more frequent than the pair it
    consumed, and can only shrink existing pair counts); the merged
    symbol is the concatenation; and re-running merge 1 by hand over a
    degenerate 'aaa'-style word respects the greedy non-overlap rule."""
    rows = QUERIES["bpe_learn_merges"](spark, SF_ORACLE).collect()
    assert [r["merge_rank"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"], r
        assert r["pair_count"] > 0
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    # greedy non-overlap semantics of the separator-replace trick
    sep = "\x1f"
    s = sep + sep.join("aaa") + sep
    merged = s.replace(sep + "a" + sep + "a" + sep, sep + "aa" + sep)
    assert [x for x in merged.split(sep) if x] == ["aa", "a"]


def test_flesch_components_and_bounds(spark):
    """Syllable counts are at least one per word (every token has a
    vowel group or contributes zero — verify non-negative and <= chars),
    the aggregate score is bounded by the per-doc extremes, and the
    very-difficult count never exceeds n_docs."""
    rows = QUERIES["readability_flesch_by_source"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["total_syllables"] >= 0
        assert 0 <= r["n_very_difficult"] <= r["n_docs"], r
        assert r["min_doc_score"] <= r["max_doc_score"], r
        # aggregate is a pooled ratio, not a mean — still must sit within
        # a generous envelope of the doc extremes for sane data
        assert r["min_doc_score"] - 1e-9 <= r["flesch_aggregate"], r


def test_ttr_identities(spark):
    """types <= tokens, hapax <= types, ratios in (0, 1], and the
    low-diversity count bounded by n_docs."""
    rows = QUERIES["lexical_diversity_ttr"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["total_types"] <= r["total_tokens"], r
        assert r["total_hapax"] <= r["total_types"], r
        assert 0 < r["ttr"] <= 1.0 and 0 < r["hapax_rate"] <= 1.0, r
        assert 0 <= r["n_low_diversity"] <= r["n_docs"], r


def test_mase_identity_and_scoring_window(spark):
    """MASE must equal the ratio of the two emitted integer error sums;
    both MAEs re-derive from sums/count; every type scores the same
    number of hours (shared dense spine minus the 24-hour warmup)."""
    rows = QUERIES["forecast_mase_seasonal_naive"](spark, SF_ORACLE).collect()
    assert rows
    hours = {r["n_hours_scored"] for r in rows}
    assert len(hours) == 1, hours
    for r in rows:
        assert abs(
            r["mae_seasonal"] - r["sum_abs_err_seasonal"] / r["n_hours_scored"]
        ) < 1e-12
        if r["sum_abs_err_naive"] > 0:
            assert abs(
                r["mase"] - r["sum_abs_err_seasonal"] / r["sum_abs_err_naive"]
            ) < 1e-12
        else:
            assert r["mase"] is None


def test_negative_sampling_power_law_flattening(spark):
    """f^0.75 flattens the distribution: rel_weight ordering matches f
    ordering, the top row has rel_weight exactly 1.0, weight ratios are
    SMALLER than the corresponding frequency ratios (the whole point of
    the 3/4 power), and the sqrt(sqrt(f^3)) identity reproduces f^0.75
    to float precision."""
    rows = QUERIES["negative_sampling_table"](spark, SF_ORACLE).collect()
    assert rows and rows[0]["rel_weight"] == 1.0
    assert [r["sample_rank"] for r in rows] == list(range(1, len(rows) + 1))
    top = rows[0]
    for r in rows[1:]:
        f_ratio = r["f"] / top["f"]
        assert r["rel_weight"] >= f_ratio - 1e-12, r
        assert abs(r["weight"] - r["f"] ** 0.75) <= 2e-9 * r["weight"]


def test_forward_asof_never_precedes_view(spark):
    """Every matched purchase timestamp is >= its view's timestamp, and
    any view with NO later purchase has NULL — checked against a direct
    per-user reconstruction on the smoke data."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    out = {
        r["view_id"]: r["next_purchase_ts"]
        for r in QUERIES["asof_join_next_purchase"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.filter(F.col("event_type").isin("view", "purchase")).collect()
    purchases = sorted(
        (r["user_id"], r["ts"]) for r in rows if r["event_type"] == "purchase"
    )
    views = [(r["event_id"], r["user_id"], r["ts"]) for r in rows if r["event_type"] == "view"]
    assert out and len(out) == len(views)
    for vid, uid, ts in views:
        expected = min(
            (pts for pu, pts in purchases if pu == uid and pts >= ts),
            default=None,
        )
        assert out[vid] == expected, (vid, out[vid], expected)


def test_curriculum_phases_partition_the_corpus(spark):
    """Exactly 3 phases; difficulty envelopes are ordered and
    non-overlapping (NTILE over the difficulty ranking); the cumulative
    schedule telescopes to the total token count."""
    rows = QUERIES["curriculum_phases"](spark, SF_ORACLE).collect()
    assert [r["phase"] for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert a["max_difficulty"] <= b["min_difficulty"] + 1e-12
    assert rows[-1]["cumulative_tokens"] == sum(r["phase_tokens"] for r in rows)
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1, sizes


def test_edge_density_matches_numpy_reference(spark):
    """Independent per-image reconstruction: regenerate the texture from
    the generator formula in pure Python and compare gradient sums for a
    handful of images — catches a decoder/oracle co-drift that the hash
    gate alone cannot (both engines agreeing on the wrong texture)."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["image_edge_density"](spark, SF_SMOKE).collect()
    }
    assert rows
    import numpy as np

    from kasper_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    checked = 0
    for d in docs[:5]:
        did, n_chars = d["doc_id"], d["n_chars"]
        w, h = 16 + n_chars % 17, 12 + did % 9
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        img = (xs * 7 + ys * 13 + did) % 256
        gx = int(np.abs(np.diff(img, axis=1)).sum())
        gy = int(np.abs(np.diff(img, axis=0)).sum())
        r = rows[did]
        assert (r["grad_x_sum"], r["grad_y_sum"]) == (gx, gy), did
        assert r["n_edges"] == (w - 1) * h + w * (h - 1)
        checked += 1
    assert checked == 5


def test_streaming_mase_twin_equals_batch(spark):
    """The ingest twin must reproduce the batch MASE table bit-for-bit
    (same merged hourly grid -> same spine/lag/aggregate)."""
    import pandas as pd

    batch = (
        QUERIES["forecast_mase_seasonal_naive"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_mase_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_attribution_conserves_conversions(spark):
    """Credit conservation: every purchase with >= 1 touch distributes
    AT MOST 1,000,000 micro-units (exactly 1M for n <= 2 or when
    (n-2) | 200000; the floor loses < (n-2) micro-units otherwise), so
    total credit is bounded by purchases-with-touches x 1M and within
    0.1% of it; per-touch credit never exceeds 40% for n >= 3."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    rows = QUERIES["multi_touch_attribution"](spark, SF_ORACLE).collect()
    assert rows
    total = sum(r["credit_micros"] for r in rows)
    ev = load_table(spark, SF_ORACLE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    touched = (
        p.join(c, "user_id")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 7 day"))
        )
        .select("p_id")
        .distinct()
        .count()
    )
    assert touched > 0
    assert total <= touched * 1_000_000
    assert total >= touched * 1_000_000 * 0.999


def test_fd_audit_key_holds_and_behavior_violates(spark):
    """doc_id -> lang must have ZERO violating keys (doc_id is the table
    key); the behavioral pairs must each violate at least once at
    sf0.01; max_rhs_variants >= 1 everywhere and shares in [0, 1]."""
    rows = {r["fd_name"]: r for r in QUERIES["fd_violation_audit"](spark, SF_ORACLE).collect()}
    assert rows["documents.doc_id->lang"]["n_violating_keys"] == 0
    for name in (
        "lineitem.orderkey->returnflag",
        "orders.custkey->orderstatus",
        "events.user_id->event_type",
    ):
        assert rows[name]["n_violating_keys"] > 0, name
    for r in rows.values():
        assert 0 <= r["violation_share"] <= 1.0
        assert r["max_rhs_variants"] >= 1
        assert r["n_violating_keys"] <= r["n_keys"]


def test_percentile_calibration_balances_sources(spark):
    """The within-source percentile gate keeps ~50% of EVERY source
    (within one doc of half, by percent_rank construction), while the
    raw global-median gate is allowed to drift per source; totals above
    the raw median are ~half the corpus overall."""
    rows = QUERIES["quality_percentile_calibration"](spark, SF_ORACLE).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    raw_above = sum(r["n_above_raw_median"] for r in rows)
    assert abs(raw_above - total / 2) <= total * 0.02 + 1
    for r in rows:
        assert abs(r["share_above_within_pctl"] - 0.5) <= 0.5 / r["n_docs"] + 0.02, r


def test_heaps_beta_sane_and_monotone_growth(spark):
    """Heaps exponent in [0, 1]; totals consistent (types <= tokens).
    This synthetic corpus draws from a FIXED ~31-word vocabulary, so V
    saturates immediately and beta ~ 0 — exactly the 'template farm /
    vocabulary stopped growing' red flag the operator exists to raise;
    assert that interpretation (beta well below the ~0.5 of natural
    text) rather than a natural-text envelope."""
    rows = QUERIES["heaps_law_by_source"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["total_types"] <= r["total_tokens"]
        assert r["heaps_beta"] is not None
        assert 0 <= r["heaps_beta"] <= 1.0 + 1e-9, r
        assert r["heaps_beta"] < 0.3, r  # saturated-vocabulary flag fires


def test_prf_expands_with_non_seed_terms_and_reranks(spark):
    """Expansion terms are disjoint from the seeds, corpus-non-stopword
    (df*2 <= n), and the round-2 ranking actually uses them: at least
    one document's rank differs from the seed-only BM25 ranking."""
    from kasper_spark.operators.retrieval import _BM25_TERMS

    exp = QUERIES["prf_expansion_terms"](spark, SF_ORACLE).collect()
    assert len(exp) == 3
    for r in exp:
        assert r["term"] not in _BM25_TERMS
        assert r["f_fb"] > 0
    seed = {
        r["doc_id"]: r["rank"]
        for r in QUERIES["bm25_keyword_topk"](spark, SF_ORACLE).collect()
    }
    prf = {
        r["doc_id"]: r["rank"]
        for r in QUERIES["prf_query_expansion_topk"](spark, SF_ORACLE).collect()
    }
    assert prf and (set(prf) != set(seed) or any(prf[d] != seed[d] for d in prf))


def test_prefix_filter_matches_exhaustive_jaccard(spark):
    """Recall proof at smoke scale: an exhaustive all-pairs exact Jaccard
    over the same shingle sets finds EXACTLY the pairs the prefix-filter
    join emits — the downward-closure theorem in action (recall 1.0 is a
    property, not a tuning outcome)."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table
    from kasper_spark.operators.dedup import _PFX_TAU, _shingles_raw, _tokens

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["prefix_filter_jaccard_pairs"](spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id",
            F.array_distinct(_shingles_raw(_tokens(F.col("text")))).alias("sh"),
        ).collect()
    }
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= _PFX_TAU:
                expected[(a, b)] = inter / len(sa | sb)
    assert set(got) == set(expected), (set(got) ^ set(expected))
    for k, v in got.items():
        assert abs(v - expected[k]) < 1e-12


def test_zcr_bounds_and_signed_decode(spark):
    """ZCR in [0, 1]; the first crossing index is consistent with a
    positive crossing count; an unsigned-decode regression would push
    ZCR to 0 for every clip (all samples 'non-negative'), so assert at
    least one clip crosses."""
    rows = QUERIES["audio_zero_crossing_rate"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r["n_crossings"] > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r["zcr"] <= 1.0, r
        if r["n_crossings"] > 0:
            assert 1 <= r["first_crossing_t"] <= r["n_samples"] - 1, r
        else:
            assert r["first_crossing_t"] is None


def test_kanon_ladder_monotone_and_one_chosen(spark):
    """Coarser levels can only shrink the class count and suppression
    cost path should be non-increasing along the declared ladder for
    class count; exactly one (or zero) level is chosen, and it is the
    first one meeting the 1% suppression bar."""
    rows = QUERIES["k_anonymity_generalization_ladder"](spark, SF_ORACLE).collect()
    assert [r["level"] for r in rows] == ["L0", "L1", "L2", "L3"]
    for a, b in zip(rows, rows[1:]):
        assert b["n_classes"] <= a["n_classes"], (a, b)
    chosen = [r for r in rows if r["chosen"]]
    ok = [r for r in rows if r["suppression_share"] <= 0.01]
    assert len(chosen) == (1 if ok else 0)
    if ok:
        assert chosen[0]["level"] == min(r["level"] for r in ok)


def test_slo_alert_requires_both_windows(spark):
    """The alert fires iff BOTH windows burn above budget — re-derive the
    predicate from the emitted exact counts for every hour; burn rates
    re-derive from counts too."""
    rows = QUERIES["slo_burn_rate_alerts"](spark, SF_ORACLE).collect()
    assert rows
    fired = 0
    for r in rows:
        want = (
            r["n_total"] > 0
            and r["n_total_6h"] > 0
            and r["n_err"] / r["n_total"] > 0.25
            and r["n_err_6h"] / r["n_total_6h"] > 0.25
        )
        assert bool(r["alert"]) == want, r
        fired += bool(r["alert"])
        if r["n_total"] > 0:
            assert abs(r["burn_1h"] - (r["n_err"] / r["n_total"]) / 0.25) < 1e-12
    assert fired > 0, "uniform 1/5 error mix should breach a 25% budget sometimes"


def test_embedding_drift_identities(spark):
    """Cosine in [-1, 1]; L2 shift consistent with the emitted norms via
    the triangle/parallelogram bounds |n0 - n1| <= L2 <= n0 + n1; both
    halves populated for every label."""
    rows = QUERIES["embedding_drift_report"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9, r
        assert r["n_half0"] > 0 and r["n_half1"] > 0
        lo = abs(r["norm_half0"] - r["norm_half1"]) - 1e-9
        hi = r["norm_half0"] + r["norm_half1"] + 1e-9
        assert lo <= r["centroid_l2_shift"] <= hi, r


def test_streaming_slo_twin_equals_batch(spark):
    """The ingest twin must reproduce the batch SLO table bit-for-bit."""
    import pandas as pd

    batch = (
        QUERIES["slo_burn_rate_alerts"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("hour_ts")
        .reset_index(drop=True)
    )
    twin = (
        QUERIES["streaming_slo_twin"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("hour_ts")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, twin, check_like=True)


def test_theil_sen_robustness_vs_numpy(spark):
    """Re-derive the pairwise-slope lower median in pure Python from the
    daily series for one type — selection identity, not approximation."""
    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    out = {
        r["event_type"]: (r["n_pairs"], r["theil_sen_slope"])
        for r in QUERIES["theil_sen_daily_trend"](spark, SF_SMOKE).collect()
    }
    assert out
    ev = load_table(spark, SF_SMOKE, "events")
    et = sorted(out)[0]
    days = (
        ev.filter(F.col("event_type") == et)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r["d"]: r["n"] for r in days}
    lo = min(
        r["d"]
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .count()
        .collect()
    )
    hi = max(
        r["d"]
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .count()
        .collect()
    )
    import datetime

    xs, ys = [], []
    d = lo
    i = 0
    while d <= hi:
        xs.append(i)
        ys.append(counts.get(d, 0))
        d += datetime.timedelta(days=1)
        i += 1
    slopes = sorted(
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    want = slopes[(len(slopes) + 1) // 2 - 1]
    got_pairs, got_slope = out[et]
    assert got_pairs == len(slopes)
    assert got_slope == want, (got_slope, want)


def test_correlation_matrix_bounds_and_symmetric_pairs(spark):
    """Six unordered pairs, each |r| <= 1; the (quantity, discount) pair
    must numerically match the dedicated corr_covar operator's Pearson
    value to double precision."""
    rows = QUERIES["correlation_matrix_lineitem"](spark, SF_ORACLE).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 - 1e-12 <= r["pearson_r"] <= 1.0 + 1e-12, r
    pairs = {
        frozenset((r["col_a"], r["col_b"])): r["pearson_r"] for r in rows
    }
    pair = pairs[frozenset(("l_discount", "l_quantity"))]
    # independent ground truth: numpy Pearson over the same exact grids
    import numpy as np

    from kasper_spark.catalog import load_table

    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_quantity", "l_discount"
    ).collect()
    q = np.array([round(r["l_quantity"] * 100) for r in li], dtype=np.float64)
    d = np.array([round(r["l_discount"] * 10000) for r in li], dtype=np.float64)
    want = np.corrcoef(q, d)[0, 1]
    assert abs(pair - want) < 1e-9, (pair, want)


def test_ab_ztest_identities(spark):
    """Variances are non-negative, the z statistic re-derives from the
    emitted means/variances/counts, and the significance flag matches
    |z| > 1.96."""
    r = QUERIES["ab_test_mean_ztest"](spark, SF_ORACLE).collect()[0]
    assert r["var_a"] >= 0 and r["var_b"] >= 0
    import math

    se = math.sqrt(r["var_a"] / r["n_a"] + r["var_b"] / r["n_b"])
    assert abs(r["z_stat"] - (r["mean_b"] - r["mean_a"]) / se) < 1e-9
    assert bool(r["significant_95"]) == (abs(r["z_stat"]) > 1.96)


def test_cuped_matches_numpy_and_reduces_variance(spark):
    """theta and rho^2 re-derive from a numpy reconstruction of the
    per-user pre/post counts; variance_reduction (= rho^2) lives in
    [0, 1]."""
    import numpy as np

    from pyspark.sql import functions as F

    from kasper_spark.catalog import load_table

    r = QUERIES["cuped_adjusted_metric"](spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["variance_reduction"] <= 1.0
    ev = load_table(spark, SF_ORACLE, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("pre"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("post"),
    ).collect()
    pre = np.array([x["pre"] for x in pu], dtype=np.float64)
    post = np.array([x["post"] for x in pu], dtype=np.float64)
    cov = np.mean(pre * post) - pre.mean() * post.mean()
    theta = cov / (np.mean(pre * pre) - pre.mean() ** 2)
    rho2 = cov * cov / (
        (np.mean(pre * pre) - pre.mean() ** 2)
        * (np.mean(post * post) - post.mean() ** 2)
    )
    assert abs(r["theta"] - theta) < 1e-9
    assert abs(r["variance_reduction"] - rho2) < 1e-9
