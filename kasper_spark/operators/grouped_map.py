"""Grouped-map (applyInPandas) operators — the batch form of the
reference's arbitrary-code escape hatch.

Kasper's MessageProcessor.Process() receives a whole batch and may run any
code over it (/root/reference/topic_processor.go:101-109) — the UDF/UDAF/
UDTF surface collapsed into one callback. The Spark-first equivalents:

- row-level:   pandas UDFs (vectorized, Arrow)
- batch-level: mapInPandas (see operators/multimodal.py)
- group-level: applyInPandas — this module
- stateful:    applyInPandasWithState (see streaming/state.py)

grouped_minmax_normalize is deliberately oracle-checked: numpy min/max are
exact and the (x-min)/(max-min) arithmetic is pointwise IEEE double — so
even though the computation runs in Python workers, the result is
bit-identical to the SQL window-function form. This proves the escape
hatch composes with the correctness gate, not just the declarative tier.

Scale: applyInPandas shuffles by the grouping key and streams each group
through Arrow; groups must fit in worker memory (event_type groups here).
High-cardinality grouping keeps per-group size bounded at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import register_query


@register_query(
    "grouped_minmax_normalize",
    oracle="""
    SELECT
        event_id,
        event_type,
        (value - MIN(value) OVER (PARTITION BY event_type))
            / (MAX(value) OVER (PARTITION BY event_type)
               - MIN(value) OVER (PARTITION BY event_type)) AS norm
    FROM events
    """,
)
def grouped_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization via applyInPandas (the Process()
    escape hatch), bit-exact against the SQL window form."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def normalize(pdf):
        # closure is self-contained (pickled by value — see
        # operators/multimodal.py for why that matters)
        mn = pdf["value"].min()
        mx = pdf["value"].max()
        out = pdf[["event_id", "event_type"]].copy()
        out["norm"] = (pdf["value"] - mn) / (mx - mn)
        return out

    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, norm double"
    )


@register_query(
    "grouped_map_topn_share",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, user_id
    ), ranked AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cents DESC, user_id
               ) AS rk
        FROM per_user
    )
    SELECT
        event_type,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        100.0 * (
            CAST(CAST(SUM(CASE WHEN rk <= 3 THEN cents ELSE 0 END) AS BIGINT)
                 AS DOUBLE)
            / CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
        ) AS top3_share_pct
    FROM ranked GROUP BY event_type
    """,
)
def grouped_map_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 'share of top-3 users' computed imperatively in pandas —
    the kind of small-group custom logic Process() was used for.

    Float parity (same trick as cogroup_balance_gap): event values have 2
    decimals, so per-user sums accumulate integer CENTS (exact int64, any
    order), top-3 selection tie-breaks on (cents DESC, user_id ASC), and
    the share is one double division of two exact integers — bit-identical
    on any engine, which is what lets the escape-hatch pandas path carry a
    full SQL oracle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")

    def topn_share(pdf):
        import numpy as np
        import pandas as pd

        # floor(v*100 + 0.5): the oracle quantizes with the SAME literal
        # expression, so the cents are identical by construction on any
        # rounding mode. np.round (banker's) vs SQL ROUND (half away from
        # zero) agreed only because 2-decimal doubles times 100 never land
        # exactly on .5 — a latent fragility this form removes.
        cents = pd.Series(
            np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64"),
            index=pdf.index,
        )
        per_user = (
            pd.DataFrame({"user_id": pdf["user_id"], "cents": cents})
            .groupby("user_id", as_index=False)["cents"]
            .sum()
            .sort_values(["cents", "user_id"], ascending=[False, True])
        )
        total = int(per_user["cents"].sum())
        top3 = int(per_user["cents"].head(3).sum())
        share = 100.0 * (float(top3) / float(total)) if total else 0.0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_users": [len(per_user)],
                "top3_share_pct": [share],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        topn_share, schema="event_type string, n_users long, top3_share_pct double"
    )


@register_query(
    "pandas_udf_token_count",
    oracle=r"""
    SELECT
        doc_id,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_tokens
    FROM documents
    """,
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR pandas UDF (Arrow-vectorized) token counting — the row-level
    Process() analog (A4), complementing applyInPandas (grouped) and
    applyInPandasWithState (stateful) elsewhere. Same result as the pure
    JVM token_count_regex, so the oracle certifies the Arrow
    serialize->pandas->deserialize path is value-exact.

    Scale: the UDF runs per Arrow batch (10k rows/batch per the session
    factory) inside the scan stage — no shuffle, no collect; throughput is
    bounded by Arrow transfer + pandas regex, which is why the JVM form is
    the hot-path default and this is the escape hatch."""
    docs = load_table(spark, sf_dir, "documents")

    # nested so cloudpickle serializes by value (foreign-cwd workers have
    # no importable kasper_spark)
    @F.pandas_udf("int")
    def n_tokens(texts):
        import pandas as pd  # noqa: F401 (worker-side import)

        return texts.str.count(r"[a-z]+|[0-9]+").astype("int32")

    return docs.select("doc_id", n_tokens(F.col("text")).alias("n_tokens"))


@register_query(
    "cogroup_balance_gap",
    oracle="""
    WITH cb AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM customer GROUP BY 1
    ), sb AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_supp,
               CAST(SUM(CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM supplier GROUP BY 1
    )
    SELECT
        COALESCE(cb.nk, sb.nk) AS n_nationkey,
        COALESCE(n_cust, 0) AS n_cust,
        COALESCE(n_supp, 0) AS n_supp,
        cb.cents / 100.0 / n_cust AS avg_cust_bal,
        sb.cents / 100.0 / n_supp AS avg_supp_bal,
        cb.cents / 100.0 / n_cust - sb.cents / 100.0 / n_supp AS bal_gap
    FROM cb FULL OUTER JOIN sb ON cb.nk = sb.nk
    ORDER BY n_nationkey
    """,
)
def cogroup_balance_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInPandas: per nation, align the customer group with
    the supplier group in one Python function and compare average balances
    — the two-sided Process() analog (kasper's B5 join pattern,
    /root/reference/topic_processor_test.go:76-155, where both sides of a
    key meet in user code). Spark shuffles both tables by nationkey and
    hands each key's pair of pandas frames to the function.

    Float parity trick: balances have 2 decimals, so summing integer
    CENTS (exact int64) and dividing once at the end gives bit-identical
    doubles on any engine and any accumulation order — the pandas-side
    equivalent of functions/exact.py.

    Scale: cogroup = one shuffle per side on the key, then a streamed
    Arrow zip per key; per-nation groups are the only memory unit."""
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    supp = load_table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")

    # nested for pickle-by-value (foreign-cwd workers)
    def gap(key, left, right):
        import numpy as np
        import pandas as pd

        n_cust = len(left)
        n_supp = len(right)
        avg_c = (
            float(np.floor(left["c_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
            / 100.0 / n_cust
            if n_cust
            else None
        )
        avg_s = (
            float(np.floor(right["s_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
            / 100.0 / n_supp
            if n_supp
            else None
        )
        gap_v = avg_c - avg_s if (avg_c is not None and avg_s is not None) else None
        return pd.DataFrame(
            {
                "n_nationkey": [int(key[0])],
                "n_cust": [n_cust],
                "n_supp": [n_supp],
                "avg_cust_bal": [avg_c],
                "avg_supp_bal": [avg_s],
                "bal_gap": [gap_v],
            }
        )

    return (
        cust.groupBy("c_nationkey")
        .cogroup(supp.groupBy("s_nationkey"))
        .applyInPandas(
            gap,
            "n_nationkey int, n_cust bigint, n_supp bigint, "
            "avg_cust_bal double, avg_supp_bal double, bal_gap double",
        )
        .orderBy("n_nationkey")
    )
