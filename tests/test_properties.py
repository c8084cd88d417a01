"""Property-based invariants (hypothesis) — the layer the reference lacks
(SURVEY.md §5: no property tests upstream). Each property pins an invariant
the engine's 100 TB design depends on, independent of any oracle:

- exact decimal sums are PARTITIONING-INVARIANT (the whole point of the
  decimal-backed aggregation in functions/exact.py);
- the salted join is result-equivalent to the plain join for any data;
- sessionization matches a sequential single-machine reference for any
  event-time sequence.

Examples are kept small and bounded (each runs a Spark job); determinism
matters more than volume here.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_decimal_sum_partitioning_invariant(spark, vals, parts):
    """sum(cast(x as decimal)) must not depend on how rows are partitioned —
    this is what makes results cluster-deterministic (double sums are not)."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    agg = lambda d: (
        d.agg(F.sum(F.col("v").cast("decimal(20,6)")).cast("double").alias("s"))
        .collect()[0]["s"]
    )
    assert agg(df.coalesce(1)) == agg(df.repartition(parts))


@given(
    orders=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 3)),  # (custkey, salt-seed)
        min_size=0,
        max_size=60,
    ),
    customers=st.sets(st.integers(0, 12), max_size=13),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, orders, customers):
    """Salting (fact key + salt column vs dimension replicated per salt)
    must be a pure physical rewrite: row-for-row identical to the plain
    equi-join, including duplicate fact keys and unmatched rows."""
    SALT = 4
    odf = spark.createDataFrame(
        [(i, ck) for i, (ck, _) in enumerate(orders)] or [(None, None)],
        "oid long, custkey long",
    ).filter(F.col("oid").isNotNull())
    cdf = spark.createDataFrame(
        [(c, f"c{c}") for c in customers] or [(None, None)], "custkey long, name string"
    ).filter(F.col("custkey").isNotNull())

    plain = odf.join(cdf, "custkey").select("oid", "custkey", "name")

    salted_o = odf.withColumn("salt", (F.col("oid") % SALT))
    salted_c = cdf.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    salted = (
        salted_o.join(salted_c, ["custkey", "salt"]).select("oid", "custkey", "name")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_sessionize_matches_sequential_reference(spark, gaps):
    """30-minute-gap sessionization (the window/lag form used by
    sessionize_events) must agree with the obvious single-pass reference
    on any inter-arrival sequence."""
    GAP_S = 1800
    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    # sequential reference: new session when gap > GAP_S
    expected_sessions = 1 + sum(1 for g in gaps if g > GAP_S)

    df = spark.createDataFrame(
        [(1, t) for t in ts], "user_id long, epoch long"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sessions = (
        df.withColumn("new_sess", (gap.isNull() | (gap > GAP_S)).cast("int"))
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .agg(F.countDistinct("sess_id").alias("n"))
        .collect()[0]["n"]
    )
    assert sessions == expected_sessions


@given(
    a=st.lists(st.integers(min_value=0, max_value=5), max_size=30),
    b=st.lists(st.integers(min_value=0, max_value=5), max_size=30),
)
@settings(**_SETTINGS)
def test_bag_setops_multiset_laws(spark, a, b):
    """exceptAll/intersectAll must obey the multiset laws:
    count(x, A exceptAll B) == max(0, cA(x)-cB(x)) and
    count(x, A intersectAll B) == min(cA(x), cB(x))."""
    from collections import Counter

    A = spark.createDataFrame([(x,) for x in a] or [(None,)], "v int").filter(
        "v IS NOT NULL"
    )
    B = spark.createDataFrame([(x,) for x in b] or [(None,)], "v int").filter(
        "v IS NOT NULL"
    )
    ca, cb = Counter(a), Counter(b)
    got_exc = Counter(r["v"] for r in A.exceptAll(B).collect())
    got_int = Counter(r["v"] for r in A.intersectAll(B).collect())
    want_exc = Counter({k: ca[k] - cb[k] for k in ca if ca[k] > cb[k]})
    want_int = Counter(
        {k: min(ca[k], cb[k]) for k in ca if min(ca[k], cb[k]) > 0 and k in cb}
    )
    assert got_exc == +want_exc
    assert got_int == +want_int


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_interleave_is_bijective(spark, pairs):
    """interleave_bits16 must be a bijection on 16-bit pairs: the Python
    reference de-interleave recovers (u, v) exactly — distinct pairs can
    never collide into one Z-value (a collision would let file pruning
    silently conflate two hyper-rectangles)."""
    from kasper_spark.operators.io_formats import interleave_bits16

    df = spark.createDataFrame(pairs, "u long, v long")
    rows = df.select("u", "v", interleave_bits16(F.col("u"), F.col("v")).alias("z")).collect()
    for r in rows:
        u = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        v = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (u, v) == (r["u"], r["v"])


_PII_SAFE_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=8
)


@given(
    words=st.lists(_PII_SAFE_WORD, min_size=0, max_size=6),
    email_local=st.text(alphabet="abcdefghij0123456789._", min_size=1, max_size=10),
    phone_mid=st.integers(min_value=100, max_value=999),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pii_redaction_plants_are_always_caught(spark, words, email_local, phone_mid):
    """Property: whatever letter-only prose surrounds them, a planted email
    and a planted phone are always masked, and letter-only prose itself is
    never altered."""
    from kasper_spark.operators.privacy import redact_pii

    local = email_local.strip("._") or "a"
    prose = " ".join(words)
    planted = f"{prose} {local}@example.org call 555-{phone_mid}-1234 {prose}".strip()
    df = spark.createDataFrame([(planted,), (prose,)], "t string")
    out = {r["t"]: r["red"] for r in df.select("t", redact_pii(F.col("t")).alias("red")).collect()}
    assert "<EMAIL>" in out[planted]
    assert "<PHONE>" in out[planted]
    assert f"{local}@" not in out[planted]
    assert out[prose] == prose  # letter-only prose passes through untouched


@given(
    xs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
    target=st.integers(min_value=0, max_value=500),
    slack=st.integers(min_value=0, max_value=200),
)
@settings(**_SETTINGS)
def test_cusum_closed_form_equals_recursion(spark, xs, target, slack):
    """The prefix-sum/running-min closed form the CUSUM operators run
    (S_i = prefix_i - min(0, running_min prefix)) must equal the textbook
    recursion S_i = max(0, S_{i-1} + x_i - target - slack) for ANY integer
    sequence — the identity both the batch windows and the streaming
    twins' two-BIGINT state rely on."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i long, x long"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = df.select(
        "i", F.sum(F.col("x") - target - slack).over(w).cast("long").alias("p")
    )
    zero = F.lit(0).cast("long")
    got = [
        r["s"]
        for r in pre.select(
            "i", (F.col("p") - F.least(zero, F.min("p").over(w))).alias("s")
        )
        .orderBy("i")
        .collect()
    ]
    s, want = 0, []
    for x in xs:
        s = max(0, s + x - target - slack)
        want.append(s)
    assert got == want


@given(
    vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=120),
)
@settings(**_SETTINGS)
def test_histogram_rank_selection_equals_order_statistic(spark, vals):
    """The sort-free value-histogram quantile selection (gap_quantiles_
    from_hist, also the exact_quantiles/mad/session machinery) must pick
    exactly the ceil(q*n)-th order statistic for ANY integer multiset."""
    import math

    from kasper_spark.operators.temporal import gap_quantiles_from_hist

    df = spark.createDataFrame(
        [("t", v) for v in vals], "event_type string, gap long"
    )
    hist = df.groupBy("event_type", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    out = {r["q"]: r["gap_sec"] for r in gap_quantiles_from_hist(spark, hist).collect()}
    s = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        assert out[q] == s[math.ceil(q * len(s)) - 1], (q, vals)


@given(
    spends=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=80
    ),
)
@settings(**_SETTINGS)
def test_pareto_decile_assignment_laws(spark, spends):
    """The integer ceil-boundary decile assignment (value_pareto_deciles)
    must partition ANY ranked population: every rank lands in exactly one
    decile, decile sizes differ by at most 1... and never exceed
    ceil(n/10), and the top decile holds the top-ranked user."""
    n = len(spends)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(spends)], "u long, cents long")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cents"), F.asc("u"))
    ranked = df.select(F.row_number().over(w).alias("rk"))
    got = (
        ranked.selectExpr(f"(rk * 10 + {n} - 1) div {n} as decile", "rk")
        .groupBy("decile")
        .count()
        .collect()
    )
    sizes = {r["decile"]: r["count"] for r in got}
    assert sum(sizes.values()) == n
    assert set(sizes) <= set(range(1, 11))
    import math

    assert max(sizes.values()) <= math.ceil(n / 10)
    # the label is the rank-quantile position: decile(rk) = ceil(10*rk/n)
    # (for n < 10 the top rank therefore lands at ceil(10/n), not 1 —
    # "this user sits at the 1/n quantile", which is the honest answer)
    expected = {}
    for rk in range(1, n + 1):
        d = math.ceil(10 * rk / n)
        expected[d] = expected.get(d, 0) + 1
    assert sizes == expected
