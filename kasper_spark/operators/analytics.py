"""Analytics extensions: pivot, percentiles, sketches, string functions.

All absent from the reference (SURVEY.md §2.C) and required by the
full-query-capability north star. Pivot is expressed as conditional
aggregation (portable SQL both engines); percentiles use linear
interpolation over integer-valued data (identical arithmetic both engines);
approx sketches are rows-only (HLL implementations differ by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import dsum_sql, money
from kasper_spark.registry import register_query

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register_query(
    "pivot_segment_by_nation",
    oracle=f"""
    SELECT
        n_name,
        {", ".join(
            "CAST(CAST(SUM(CASE WHEN c_mktsegment = '" + s + "' THEN CAST(c_acctbal AS DECIMAL(12,4)) END) AS DECIMAL(38,6)) AS DOUBLE) AS " + s.lower()
            for s in _SEGMENTS
        )}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_segment_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) via conditional sums — the portable form of
    df.groupBy().pivot(); Spark's pivot() compiles to exactly these
    conditional aggregates, so this is the same physical plan with
    deterministic column naming."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    aggs = [
        F.sum(
            F.when(F.col("c_mktsegment") == s, money("c_acctbal", 12, 4))
        )
        .cast("decimal(38,6)")
        .cast("double")
        .alias(s.lower())
        for s in _SEGMENTS
    ]
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(*aggs)
    )


@register_query(
    "percentiles_quantity",
    oracle="""
    SELECT
        l_returnflag,
        quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_qty,
        quantile_cont(CAST(l_quantity AS BIGINT), 0.9) AS p90_qty,
        CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        CAST(MAX(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) over integer-valued
    quantities. Both engines interpolate (1-f)*lo + f*hi on the sorted
    values; with integer inputs the arithmetic is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("median_qty"),
        F.percentile(q, F.lit(0.9)).alias("p90_qty"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
    )


@register_query(
    "string_functions",
    oracle="""
    SELECT
        p_partkey,
        upper(p_brand) AS brand_upper,
        substr(p_name, 1, 8) AS name_prefix,
        length(p_name) AS name_len,
        replace(p_type, ' ', '_') AS type_snake,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        CASE WHEN contains(p_type, 'BRASS') THEN 1 ELSE 0 END AS is_brass,
        split_part(p_type, ' ', 1) AS type_first_word
    FROM part
    WHERE p_size >= 10
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (B2 — the reference's only string ops
    are Split/Sprintf, /root/reference/examples/word_count_example.go:32,
    producer_example.go:37). All JVM-side, codegen-friendly."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") >= 10).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    )


@register_query("approx_distinct_users")  # rows-only: HLL sketches differ by engine
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for cardinalities too large for exact distinct at 100 TB. HLL merge
    is order-independent, so the result is deterministic for a given
    dataset; it is rows-only because DuckDB's approx sketch differs."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )
