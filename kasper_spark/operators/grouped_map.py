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


@register_query("grouped_map_topn_share")  # rows-only: pandas float sums
def grouped_map_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 'share of top-3 users' computed imperatively in pandas —
    the kind of small-group custom logic Process() was used for. Rows-only
    (pandas float accumulation order differs from SQL by design)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")

    def topn_share(pdf):
        import pandas as pd

        per_user = pdf.groupby("user_id")["value"].sum().sort_values(ascending=False)
        total = float(per_user.sum())
        top3 = float(per_user.head(3).sum())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_users": [len(per_user)],
                "top3_share_pct": [round(100.0 * top3 / total, 6) if total else 0.0],
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
