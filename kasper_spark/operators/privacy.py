"""PII detection / redaction operators for training-data curation.

The reference has no text hygiene at all (its values are opaque bytes —
/root/reference/store.go:16-31); these operators add the scrubbing pass a
100 TB web-corpus pipeline runs before training: detect and mask emails,
phone numbers, IPv4 addresses, and SSN-shaped identifiers.

Scale shape: pure map-side JVM regex expressions over one parquet scan — no
shuffle, no Python, no UDFs. At 1000 executors this is embarrassingly
parallel and bounded by scan throughput; the regex set is deliberately
RE2-compatible so the same patterns run on DuckDB for the oracle check and
on any RE2-based preprocessor a production pipeline might pair with.

Determinism note: the driver's synthetic `documents.text` contains no PII
(no digits at all), so a redaction pass over raw text would be an identity
no-op and the oracle check would certify nothing. `pii_redact` therefore
first APPENDS deterministic synthetic PII derived from `doc_id` — the same
arithmetic on both engines — then detects and redacts it, so every regex
is exercised on every row and the DuckDB hash-compare certifies the actual
matching/masking behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import register_query

# One pattern set, shared verbatim by the Spark expressions and the DuckDB
# oracle SQL. Java regex and RE2 agree on every construct used here
# (character classes, bounded repetition, \d, \b word boundaries).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement token); applied in this order. The order
    # is load-bearing only for EMAIL-before-IP (an email's domain can
    # contain a dotted quad); the remaining shapes are mutually exclusive
    # (IP 1-3 digit dotted quad, SSN 3-2-4 dashed, PHONE 3-3-4 dashed).
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts (computed BEFORE redaction)."""
    return {
        name: F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(col: Column) -> Column:
    """Mask every PII category in ``col`` with its placeholder token.

    Chained regexp_replace — still ONE projection in the physical plan, so
    whole-stage codegen fuses the four passes into a single generated
    function per row batch.
    """
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


# Deterministic synthetic-PII injection: identical arithmetic on both
# engines (all operands nonnegative, so div/mod agree).
def _injected_spark() -> Column:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), s(d), F.lit("@example.com ip 10."),
        s(d % 256), F.lit("."), s(F.expr("doc_id div 256") % 256), F.lit("."),
        s(1 + d % 254), F.lit(" ssn "),
        s(100 + d % 900), F.lit("-"), F.lpad(s(d % 100), 2, "0"), F.lit("-"),
        s(1000 + d % 9000), F.lit(" call 555-"),
        s(100 + d % 900), F.lit("-"), s(1000 + d % 9000), F.lit(" now"),
    )


_INJECTED_SQL = """
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
             || '.' || CAST(1 + doc_id % 254 AS VARCHAR)
             || ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR)
             || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
             || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
             || ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
             || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' now'
"""


def _redact_sql(expr: str) -> str:
    out = expr
    for pat, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


_PII_ORACLE = f"""
    WITH injected AS (
        SELECT doc_id, {_INJECTED_SQL} AS t
        FROM documents
    )
    SELECT
        doc_id,
        {", ".join(
            f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
            for name, (pat, _) in PII_PATTERNS.items()
        )},
        {_redact_sql("t")} AS redacted
    FROM injected
"""


@register_query("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + mask PII over the documents table (with deterministic
    synthetic PII injected first — see module docstring).

    Output: doc_id, per-category match counts, redacted text. Map-only:
    the plan is scan -> project, no exchange.
    """
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select("doc_id", _injected_spark().alias("t"))
    counts = pii_counts(F.col("t"))
    return injected.select(
        "doc_id",
        *[counts[name].cast("bigint").alias(f"n_{name}") for name in PII_PATTERNS],
        redact_pii(F.col("t")).alias("redacted"),
    )


_K_ANON = 5  # disclosure threshold: groups smaller than k are at risk


@register_query(
    "k_anonymity_audit",
    oracle=f"""
    WITH grouped AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000)
    )
    SELECT c_nationkey, c_mktsegment, acctbal_bin, n,
           (n < {_K_ANON}) AS at_risk,
           CASE WHEN n < {_K_ANON} THEN n ELSE 0 END AS rows_to_suppress
    FROM grouped
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment, coarse account-balance bin): every equivalence class smaller
    than k={_K_ANON} is a re-identification risk — the disclosure-control
    check a privacy pipeline runs BEFORE releasing microdata, and the
    structural complement to pii_redact's content scrubbing (redaction
    hides values; k-anonymity measures whether the remaining attributes
    still single people out). Emits each class with its size, the at-risk
    flag, and the suppression cost — the inputs to the next generalization
    step (widen the bin, drop a QI) in the anonymization lattice.

    Scale: one partial-aggregated groupBy on the QI tuple — classes, not
    customers, cross the shuffle. The generalization loop (re-binning
    until no class is under k) re-runs the same plan with a coarser bin
    expression; nothing else changes."""
    cust = load_table(spark, sf_dir, "customer")
    grouped = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_bin"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return grouped.select(
        "c_nationkey",
        "c_mktsegment",
        "acctbal_bin",
        "n",
        (F.col("n") < _K_ANON).alias("at_risk"),
        F.when(F.col("n") < _K_ANON, F.col("n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rows_to_suppress"),
    )


def _dp_geometric_thresholds() -> list[int]:
    """Cumulative CDF of the two-sided geometric distribution with p=1/2
    (the discrete-Laplace mechanism at epsilon = ln 2), scaled to 60-bit
    integers: P(K=k) = (1/3)(1/2)^|k|, truncated at |k| <= 40 (tail mass
    ~6e-13). Pure rational arithmetic -> the same exact integers on any
    platform; both engines then only compare 60-bit ints."""
    from fractions import Fraction

    p = Fraction(1, 2)
    norm = (1 - p) / (1 + p)
    acc = Fraction(0)
    out = []
    for k in range(-40, 41):
        acc += norm * p ** abs(k)
        out.append(int(acc * (1 << 60)))
    return out


_DP_THRESHOLDS = _dp_geometric_thresholds()
_DP_EPSILON = 0.6931471805599453  # ln 2, the epsilon this mechanism spends


@register_query(
    "dp_noisy_histogram",
    oracle=f"""
    WITH counts AS (
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY c_mktsegment
    ),
    noised AS (
        SELECT c_mktsegment, n,
               CAST(len(list_filter(
                   [{", ".join(str(t) for t in _DP_THRESHOLDS)}],
                   t -> t <= CAST('0x' || substring(md5(c_mktsegment || '/dp-1'), 1, 15) AS BIGINT)
               )) AS BIGINT) AS c
        FROM counts
    )
    SELECT c_mktsegment, n,
           CAST(least(c, 80) - 40 AS BIGINT) AS noise,
           CAST(greatest(n + least(c, 80) - 40, 0) AS BIGINT) AS released_count,
           {_DP_EPSILON!r} AS epsilon
    FROM noised
    """,
)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: per-segment customer
    counts plus two-sided-geometric noise — the discrete-Laplace mechanism
    at epsilon = ln 2 (count sensitivity 1). The usual blocker for testing
    DP pipelines is that noise is random; here the noise stream is SEEDED
    (inverse-CDF over a 60-bit md5 uniform per released cell), so the
    mechanism is bit-reproducible and the two-engine hash oracle certifies
    the entire release path: exact rational CDF thresholds (p = 1/2 makes
    every probability a dyadic rational — no ln anywhere, the reason this
    is portable where an exp/ln-based sampler is not), integer threshold
    comparison, clamped-at-zero release. A production release swaps the
    md5 seed for a CSPRNG draw per cell and drops the true-count column;
    every other line is unchanged.

    Scale: counts are one partial-aggregated groupBy; the 81-entry
    threshold array is a constant-folded in-expression lookup (no join),
    and noise cost is per released CELL, not per row. Truncation at
    |noise| <= 40 (tail mass ~6e-13) is the standard bounded-noise
    variant; epsilon accounting is unaffected at these tails."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("c_mktsegment"), F.lit("/dp-1"))), 1, 15),
        16,
        10,
    ).cast("long")
    th_arr = F.array(*[F.lit(t).cast("long") for t in _DP_THRESHOLDS])
    c = F.size(F.filter(th_arr, lambda t: t <= u)).cast("long")
    noise = (F.least(c, F.lit(80).cast("long")) - 40).cast("bigint")
    return counts.select(
        "c_mktsegment",
        "n",
        noise.alias("noise"),
        F.greatest(F.col("n") + noise, F.lit(0).cast("long"))
        .cast("bigint")
        .alias("released_count"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


_L_DIV = 3  # diversity threshold: classes with fewer distinct sensitive values leak


@register_query(
    "l_diversity_audit",
    oracle=f"""
    WITH qi AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bin
        FROM customer
    ),
    joined AS (
        SELECT q.c_nationkey, q.c_mktsegment, q.acctbal_bin,
               q.c_custkey, o.o_orderpriority
        FROM qi q LEFT JOIN orders o ON o.o_custkey = q.c_custkey
    )
    SELECT c_nationkey, c_mktsegment, acctbal_bin,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
           (COUNT(DISTINCT o_orderpriority) < {_L_DIV}) AS at_risk
    FROM joined
    GROUP BY c_nationkey, c_mktsegment, acctbal_bin
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling: a QI class can
    be large (k-anonymous) yet still leak if every member shares the same
    SENSITIVE value (the homogeneity attack). Here the sensitive attribute
    lives in the FACT table, the realistic shape (order priority standing
    in for e.g. a diagnosis code): per k_anonymity_audit's exact QI tuple
    (nation, market segment, coarse balance bin), count distinct sensitive
    values reached through the customer->orders join; classes with fewer
    than l={_L_DIV} are flagged. Customers with no orders contribute no
    sensitive value (LEFT join -> l counts only real values), so an
    all-quiet class reads l=0 — maximally at risk, correctly.

    Scale: the join shuffles on custkey once; the audit aggregate then
    shuffles QI-class rows with a two-phase distinct expansion — classes,
    not orders, dominate the final exchange."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_bin"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderpriority"
    )
    joined = cust.join(orders, "c_custkey", "left")
    return joined.groupBy("c_nationkey", "c_mktsegment", "acctbal_bin").agg(
        F.countDistinct("c_custkey").cast("long").alias("n_customers"),
        F.countDistinct("o_orderpriority").cast("long").alias("l_distinct"),
        (F.countDistinct("o_orderpriority") < _L_DIV).alias("at_risk"),
    )


_T_CLOSE = 0.2  # EMD threshold: classes farther than t from the global
                # sensitive-value distribution leak by skew


@register_query(
    "t_closeness_audit",
    oracle=f"""
    WITH fact AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS acctbal_bin,
               o.o_orderpriority AS sens
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    dom AS (
        SELECT sens, CAST(COUNT(*) AS BIGINT) AS big_c,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS big_n
        FROM fact GROUP BY sens
    ),
    cls AS (
        SELECT c_nationkey, c_mktsegment, acctbal_bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM fact GROUP BY c_nationkey, c_mktsegment, acctbal_bin
    ),
    grid AS (
        SELECT cls.c_nationkey, cls.c_mktsegment, cls.acctbal_bin, cls.n,
               dom.sens, dom.big_c, dom.big_n
        FROM cls CROSS JOIN dom
    ),
    cell AS (
        SELECT g.*, CAST(COALESCE(f.c, 0) AS BIGINT) AS c
        FROM grid g
        LEFT JOIN (
            SELECT c_nationkey, c_mktsegment, acctbal_bin, sens,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM fact
            GROUP BY c_nationkey, c_mktsegment, acctbal_bin, sens
        ) f USING (c_nationkey, c_mktsegment, acctbal_bin, sens)
    ),
    cum AS (
        SELECT c_nationkey, c_mktsegment, acctbal_bin, n, big_n, sens,
               SUM(c * big_n - big_c * n) OVER (
                   PARTITION BY c_nationkey, c_mktsegment, acctbal_bin
                   ORDER BY sens
               ) AS cum_num,
               COUNT(*) OVER (
                   PARTITION BY c_nationkey, c_mktsegment, acctbal_bin
               ) AS m,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey, c_mktsegment, acctbal_bin
                   ORDER BY sens
               ) AS rn
        FROM cell
    )
    SELECT c_nationkey, c_mktsegment, acctbal_bin,
           CAST(n AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN rn < m THEN abs(cum_num) ELSE 0 END) AS DOUBLE)
               / CAST((MAX(m) - 1) * n * big_n AS DOUBLE) AS t_emd,
           (CAST(SUM(CASE WHEN rn < m THEN abs(cum_num) ELSE 0 END) AS DOUBLE)
               / CAST((MAX(m) - 1) * n * big_n AS DOUBLE)) > {_T_CLOSE}
               AS at_risk
    FROM cum
    GROUP BY c_nationkey, c_mktsegment, acctbal_bin, n, big_n
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the disclosure-control ladder
    (k_anonymity_audit: classes big enough; l_diversity_audit: classes
    varied enough; HERE: each class's SENSITIVE-value distribution close
    enough to the global one, so membership in a class reveals little —
    Li et al., ICDE'07). Sensitive attribute = order priority (ordered
    domain), distance = the ordered-categorical Earth Mover's Distance:
    t = (1/(m-1)) * sum_i |sum_{{j<=i}} (p_j - q_j)|. Denominators clear
    exactly: cum_num_i = sum_{{j<=i}} (c_j*N - C_j*n) is BIGINT, t is ONE
    double division by (m-1)*n*N — bit-identical on both engines.
    Overflow bound: c_j*N <= n*N needs n*N < 2^63 (N = total fact rows);
    shard the audit by partition (e.g. region) past ~3e9 rows — the
    per-shard t against the shard distribution is the deployable form.

    Scale: two partial aggregates over the fact join (per-cell and
    per-class counts), then a DENSE class x sensitive-domain grid built
    by cross-joining the BROADCAST m-row domain table (m = 5 priorities;
    the gapfill-spine pattern) so absent cells contribute their correct
    nonzero |cum| terms; the EMD window runs over m rows per class —
    classes, never orders, cross the final exchanges."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_bin"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("sens"),
    )
    fact = cust.join(orders, "c_custkey").select(
        "c_nationkey", "c_mktsegment", "acctbal_bin", "sens"
    )
    cells = fact.groupBy(
        "c_nationkey", "c_mktsegment", "acctbal_bin", "sens"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return t_closeness_report(cells)


def t_closeness_report(cells: DataFrame) -> DataFrame:
    """EMD report over per-(class, sensitive-value) COUNTS — the second
    half of t_closeness_audit, factored because every input it needs is a
    mergeable count partial: the class totals (n), the global sensitive
    distribution (big_c/big_n) and the per-cell counts (c) are all sums
    of c. That is what makes the audit runnable AT INGEST
    (streaming_t_closeness_twin merges per-micro-batch cell partials and
    calls this same function) — the EMD NUMERATORS clear denominators
    exactly, so partial counts merge with zero error."""
    from pyspark.sql.window import Window

    qi = ["c_nationkey", "c_mktsegment", "acctbal_bin"]
    dom = cells.groupBy("sens").agg(F.sum("c").cast("long").alias("big_c"))
    dom = dom.select(
        "sens",
        "big_c",
        F.sum("big_c").over(Window.partitionBy()).cast("long").alias("big_n"),
    )
    cls = cells.groupBy(*qi).agg(F.sum("c").cast("long").alias("n"))
    grid = cls.join(F.broadcast(dom))  # dense class x domain spine (m rows)
    cell = grid.join(cells, qi + ["sens"], "left").select(
        *qi,
        "n",
        "big_n",
        "sens",
        (F.coalesce(F.col("c"), F.lit(0)) * F.col("big_n")
         - F.col("big_c") * F.col("n")).alias("num"),
    )
    w_cum = Window.partitionBy(*qi).orderBy("sens")
    w_cls = Window.partitionBy(*qi)
    cum = cell.select(
        *qi,
        "n",
        "big_n",
        F.sum("num").over(w_cum).alias("cum_num"),
        F.count(F.lit(1)).over(w_cls).alias("m"),
        F.row_number().over(w_cum).alias("rn"),
    )
    t_emd = F.sum(
        F.when(F.col("rn") < F.col("m"), F.abs(F.col("cum_num"))).otherwise(0)
    ).cast("double") / (
        (F.max("m") - 1) * F.first("n") * F.first("big_n")
    ).cast("double")
    return (
        cum.groupBy(*qi, "n", "big_n")
        .agg(t_emd.alias("t_emd"))
        .select(
            *qi,
            F.col("n").cast("long").alias("n_orders"),
            "t_emd",
            (F.col("t_emd") > _T_CLOSE).alias("at_risk"),
        )
    )


# streaming_t_closeness_twin (operators/streaming_twins.py, which imports
# BEFORE this module) registered with oracle=None; its output contract is
# identical to the batch audit's, so it shares the oracle — bound here,
# at the end of the module that registers the batch op (the
# streaming_mixture_twin lesson: binding in streaming_twins would raise
# at import).
from kasper_spark.registry import ORACLES as _OR  # noqa: E402
from kasper_spark.registry import QUERIES as _Q  # noqa: E402

assert "t_closeness_audit" in _OR, "batch t-closeness oracle missing"
assert "streaming_t_closeness_twin" in _Q, "twin missing (import order)"
_OR["streaming_t_closeness_twin"] = _OR["t_closeness_audit"]


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder (round 11)
# ---------------------------------------------------------------------------

# Generalization levels for the (nationkey, mktsegment, acctbal) QI set —
# each level strictly coarsens the previous one (the Samarati lattice
# walked along one fixed path, which is how production anonymizers apply
# a reviewed policy rather than searching the full lattice online).
_KGEN_LEVELS_SQL = (
    ("L0", "c_nationkey", "c_mktsegment", "CAST(floor(c_acctbal / 1000) AS BIGINT)"),
    ("L1", "c_nationkey", "c_mktsegment", "CAST(floor(c_acctbal / 5000) AS BIGINT)"),
    ("L2", "c_nationkey", "'*'", "CAST(floor(c_acctbal / 5000) AS BIGINT)"),
    ("L3", "CAST(-1 AS BIGINT)", "'*'", "CAST(floor(c_acctbal / 10000) AS BIGINT)"),
)


@register_query(
    "k_anonymity_generalization_ladder",
    oracle=f"""
    WITH levels AS (
        {" UNION ALL ".join(
            f'''SELECT '{lvl}' AS level, CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(MIN(n) AS BIGINT) AS min_class_size,
                   CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END)
                        AS BIGINT) AS rows_suppressed,
                   CAST(SUM(n) AS BIGINT) AS n_rows
            FROM (SELECT CAST({nat} AS BIGINT) AS qi1, {seg} AS qi2,
                         {bal} AS qi3, CAST(COUNT(*) AS BIGINT) AS n
                  FROM customer GROUP BY 1, 2, 3)'''
            for lvl, nat, seg, bal in _KGEN_LEVELS_SQL
        )}
    ),
    scored AS (
        SELECT level, n_classes, min_class_size, rows_suppressed,
               CAST(rows_suppressed AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS suppression_share
        FROM levels
    )
    SELECT level, n_classes, min_class_size, rows_suppressed,
           suppression_share,
           (suppression_share <= 0.01
            AND level = (SELECT MIN(level) FROM scored s2
                         WHERE s2.suppression_share <= 0.01)) AS chosen
    FROM scored ORDER BY level
    """,
)
def k_anonymity_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity REPAIR policy evaluation — the step after the audit:
    walk a fixed generalization ladder over the quasi-identifier set
    (finer bins -> coarser bins -> drop segment -> drop nation) and report,
    per level, the equivalence-class landscape and the rows suppression
    would delete to enforce k = {_K_ANON}; the first level whose
    suppression cost is <= 1% of rows is marked `chosen` (the
    minimal-information-loss pick along the policy path — the Samarati
    lattice walked along one reviewed path, not searched online).

    Determinism: per-level stats are exact integer aggregates; the
    chosen flag compares exact shares and the lexicographic level name.

    Scale: four partial-aggregated groupBys over the same scan (each
    keyed by a strictly-coarser QI tuple — class counts, never rows,
    cross the shuffle), a 4-row window. Privacy audits are batch-scoped
    by design (SCALING.md round-11 note: they need the full QI
    distribution)."""
    cust = load_table(spark, sf_dir, "customer")
    levels = []
    specs = (
        ("L0", F.col("c_nationkey").cast("long"), F.col("c_mktsegment"),
         F.floor(F.col("c_acctbal") / 1000).cast("long")),
        ("L1", F.col("c_nationkey").cast("long"), F.col("c_mktsegment"),
         F.floor(F.col("c_acctbal") / 5000).cast("long")),
        ("L2", F.col("c_nationkey").cast("long"), F.lit("*"),
         F.floor(F.col("c_acctbal") / 5000).cast("long")),
        ("L3", F.lit(-1).cast("long"), F.lit("*"),
         F.floor(F.col("c_acctbal") / 10000).cast("long")),
    )
    for lvl, qi1, qi2, qi3 in specs:
        classes = cust.groupBy(
            qi1.alias("qi1"), qi2.alias("qi2"), qi3.alias("qi3")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        levels.append(
            classes.agg(
                F.lit(lvl).alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.min("n").cast("long").alias("min_class_size"),
                F.sum(F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(0))
                .cast("long")
                .alias("rows_suppressed"),
                F.sum("n").cast("long").alias("n_rows"),
            )
        )
    out = levels[0]
    for m in levels[1:]:
        out = out.unionByName(m)
    scored = out.select(
        "level",
        "n_classes",
        "min_class_size",
        "rows_suppressed",
        (
            F.col("rows_suppressed").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("suppression_share"),
    )
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    first_ok = F.min(
        F.when(F.col("suppression_share") <= 0.01, F.col("level"))
    ).over(w_all)
    return scored.select(
        "*",
        (
            (F.col("suppression_share") <= 0.01)
            & (F.col("level") == first_ok)
        ).alias("chosen"),
    ).orderBy("level")
