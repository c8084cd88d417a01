"""Quality gate for the rows-only approx_percentile sketch: the sketch
answer must sit within the configured rank-error bound of the exact
percentile (the determinism/quality check rows-only queries carry in
place of the SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_approx_percentile_within_rank_error(spark):
    from kasper_spark.operators.analytics import approx_percentile_estimates

    got = {
        r["o_orderstatus"]: (r["approx_p50"], r["approx_p90"], r["approx_p99"])
        for r in approx_percentile_estimates(spark, SF_SMOKE).collect()
    }
    orders = load_table(spark, SF_SMOKE, "orders")
    for status, approx in got.items():
        vals = sorted(
            r[0]
            for r in orders.filter(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        for q, a in zip((0.5, 0.9, 0.99), approx):
            # accuracy 10000 -> rank error <= n/10000; allow 2x slack plus
            # one position for interpolation-vs-nearest-rank differences
            tol = max(2, 2 * n // 10000 + 2)
            lo = vals[max(0, int(q * n) - tol)]
            hi = vals[min(n - 1, int(q * n) + tol)]
            assert lo <= a <= hi, (status, q, a, lo, hi)


def test_hll_union_matches_exact_distinct(spark):
    """Unioning per-day sketches must estimate the per-type TOTAL distinct
    count within HLL error (~2% at default lgK=12; allow 5%) — the query
    itself now carries that contract (merged_in_bound) plus the exact
    union distinct, so assert both against an independent computation."""
    got = {
        r["event_type"]: (r["exact_users_total"], r["merged_in_bound"])
        for r in QUERIES["hll_mergeable_sketches"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for etype, (exact_total, in_bound) in got.items():
        assert exact_total == exact[etype], (etype, exact_total, exact[etype])
        assert in_bound == 1, f"merged sketch out of 5% bound for {etype}"


def test_approx_percentile_contract_flags_all_true(spark):
    """The certified query's GK-bound flags must all be 1 (what the DuckDB
    oracle asserts as literals) — checked here too so a sketch regression
    fails fast locally, not just in the driver sweep."""
    rows = QUERIES["approx_percentile_totalprice"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert (r["p50_in_bound"], r["p90_in_bound"], r["p99_in_bound"]) == (
            1,
            1,
            1,
        ), r


def test_countmin_never_underestimates_and_matches_exact_here(spark):
    """CM sketch law: estimate >= true count ALWAYS (one-sided error); and
    at this vocab-vs-width ratio the estimates are exactly the true counts
    (the regime the SQL oracle relies on)."""
    est = {
        r["word"]: r["est_count"]
        for r in QUERIES["countmin_heavy_hitters"](spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        r["word"]: r["n"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert est, "heavy-hitter list is empty"
    for w, e in est.items():
        assert e >= exact[w], (w, e, exact[w])
        assert e == exact[w], (w, e, exact[w])
    # and the list really is the top of the exact distribution
    topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: len(est)]
    assert set(est) == {w for w, _ in topk}


def test_countmin_sketches_merge_by_cell_sum(spark):
    """Mergeability law: the sketch of a union is the cell-wise sum of the
    per-subset sketches — the property that makes per-task partials, per-day
    rollups, and cross-datacenter merges all the same operation."""
    from pyspark.sql import functions as F

    from kasper_spark.operators.analytics import cm_depth_cells

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("half"),
        F.explode(F.split("text", " ")).alias("word"),
    ).filter(F.col("word") != "")
    per_half = (
        toks.select("half", F.explode(cm_depth_cells()).alias("dc"))
        .groupBy("half", "dc.depth", "dc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = {
        (r["depth"], r["cell"]): r["s"]
        for r in per_half.groupBy("depth", "cell")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    direct = {
        (r["depth"], r["cell"]): r["cnt"]
        for r in toks.select(F.explode(cm_depth_cells()).alias("dc"))
        .groupBy("dc.depth", "dc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert merged == direct and len(direct) > 0
