"""Relational batch operators (SURVEY.md §2.B patterns + §2.C Spark-native
extensions), each registered with a DuckDB oracle.

Reference traceability (kasper is a stream framework; these are the bounded
twins of its demonstrated dataflow patterns):

- B1/B2/B6 scan+project+filter  -> scan_filter_project
- B3 tokenize (flatMap/explode) -> word_count (also the flagship `entry`)
- B4 stateful keyed count/agg   -> q1_pricing_summary, agg_distinct
- B5 equi-join (stream-stream)  -> q3_top_orders, q5_local_supplier (batch)
- B7 nested document assembly   -> nested_order_lines
- B8 enrichment lookup join     -> broadcast dimension joins inside q5
- B9 multitenant keyed agg      -> multitenant_agg
- §2.C "free from Spark" ops    -> left/semi/anti joins, rollup/cube,
                                    windows, set ops, top-k

Scale notes (100 TB mindset):
- dimension tables (region/nation/supplier/part at TPC-H ratios) are
  explicitly `broadcast()`-hinted so the big fact join never shuffles the
  small side;
- aggregates go through partial (map-side) aggregation automatically because
  they are plain `groupBy().agg()` — no UDAFs;
- every filter is a Column predicate on the scan so Catalyst pushes it into
  the parquet reader (verified in tests/test_plans.py);
- exact decimal sums (see functions/exact.py) cost one extra cast but keep
  results order-independent, which also makes them *cluster*-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import (
    dsum,
    davg,
    dsum_sql,
    davg_sql,
    money,
    dsum_dec,
    dsum_dec_sql,
)

# exact-decimal revenue terms shared by the TPC-H-shaped queries
_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(10,4))"
    " * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)
_CHARGE_SQL = _REVENUE_SQL + " * (1 + CAST(l_tax AS DECIMAL(6,4)))"


def _revenue_dec():
    return money("l_extendedprice", 10, 4) * (
        F.lit(1).cast("decimal(1,0)") - money("l_discount", 6, 4)
    )


def _charge_dec():
    return _revenue_dec() * (
        F.lit(1).cast("decimal(1,0)") + money("l_tax", 6, 4)
    )
from kasper_spark.registry import register_query


# ---------------------------------------------------------------------------
# B1/B2/B6 — scan, project with scalar functions, filter
# ---------------------------------------------------------------------------

@register_query(
    "scan_filter_project",
    oracle=f"""
    SELECT
        l_orderkey,
        l_linenumber,
        CONCAT(CAST(l_orderkey AS VARCHAR), '#', CAST(l_linenumber AS VARCHAR)) AS item_id,
        CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
        CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month,
        l_extendedprice * (1 - l_discount) AS net_price,
        UPPER(l_returnflag) AS flag_upper,
        CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount > 0.05
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> project with string/date/arith scalar functions.

    Reference: pass-through + map patterns
    (/root/reference/examples/hello_world_example.go:17-33,
     /root/reference/examples/producer_example.go:25-40) and topic routing
    filter (/root/reference/topic_processor_test.go:83-92).

    The three predicates are plain Column comparisons -> Catalyst pushes them
    into the parquet scan (PushedFilters) and prunes to the 7 needed columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("#"),
                F.col("l_linenumber").cast("string"),
            ).alias("item_id"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.upper("l_returnflag").alias("flag_upper"),
            F.col("l_quantity").cast("bigint").alias("qty_int"),
        )
    )


# ---------------------------------------------------------------------------
# B4 — hash aggregation (the word-count state pattern, TPC-H Q1 shaped)
# ---------------------------------------------------------------------------

@register_query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {dsum_sql('l_quantity')} AS sum_qty,
        {dsum_sql('l_extendedprice')} AS sum_base_price,
        {dsum_dec_sql(_REVENUE_SQL)} AS sum_disc_price,
        {dsum_dec_sql(_CHARGE_SQL)} AS sum_charge,
        {davg_sql('l_quantity')} AS avg_qty,
        {davg_sql('l_extendedprice')} AS avg_price,
        {davg_sql('l_discount')} AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregation — the batch twin of kasper's stateful
    running count per key (/root/reference/examples/word_count_example.go:33-67).

    Pure groupBy().agg() -> Spark does partial (map-side) aggregation before
    the shuffle; at 100 TB the shuffle carries only (#groups x #tasks) rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_dec(_revenue_dec()).alias("sum_disc_price"),
            dsum_dec(_charge_dec()).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register_query(
    "agg_distinct",
    oracle="""
    SELECT
        event_type,
        COUNT(DISTINCT user_id) AS distinct_users,
        COUNT(*) AS n_events,
        CAST(MIN(value) AS DOUBLE) AS min_value,
        CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (SURVEY.md §2.C — absent in kasper, required by
    the north star). count(distinct) expands to a two-phase aggregate in
    Spark; min/max are exact so no decimal trick is needed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# B5/B8 — equi-joins (batch twins of the stream-stream / enrichment joins)
# ---------------------------------------------------------------------------

@register_query(
    "q3_top_orders",
    oracle=f"""
    SELECT
        l_orderkey,
        {dsum_dec_sql(_REVENUE_SQL)} AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join + agg + top-k — batch twin of the reference's
    stream-stream equi-join (/root/reference/topic_processor_test.go:76-155).

    customer is ~1/15 of orders -> broadcast-hinted, so only orders⋈lineitem
    shuffles (on the same key both sides). Top-k runs as TakeOrderedAndProject
    (no full sort). Tiebreak on l_orderkey keeps the limit deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is NOT hint-broadcast: at TPC-H ratios it is 1/10th of
        # orders (TBs at 100 TB), and a broadcast() hint is FORCED — AQE
        # never demotes it. Below the size threshold Catalyst still
        # auto-broadcasts; above it this correctly shuffles.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_dec(_revenue_dec()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register_query(
    "q5_local_supplier",
    oracle=f"""
    SELECT
        n_name,
        {dsum_dec_sql(_REVENUE_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join — generalization of the reference's
    enrichment-lookup pattern (/root/reference/examples/word_count_example.go:35,
    store multi-get /root/reference/redis.go:74-106 used as a join).

    region/nation/supplier are dimension-sized -> broadcast; the only big
    shuffle is lineitem⋈orders. The date filter sits on the orders scan so it
    is pushed down before the join.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is NOT hint-broadcast: at TPC-H ratios it is 1/10th of
        # orders (TBs at 100 TB), and a broadcast() hint is FORCED — AQE
        # never demotes it. Below the size threshold Catalyst still
        # auto-broadcasts; above it this correctly shuffles.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_dec(_revenue_dec()).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register_query(
    "join_left_outer",
    oracle=f"""
    SELECT
        c_custkey,
        c_name,
        COUNT(o_orderkey) AS order_count,
        COALESCE({dsum_sql('o_totalprice')}, 0.0) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + agg with null-safe counting (SURVEY.md §2.C).

    COUNT(col) skips nulls in both engines, so customers without orders get
    order_count = 0; the decimal sum is NULL there -> coalesced to 0.0.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register_query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 100000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). The probe side streams; no row duplication,
    no columns from the build side cross the join — cheapest join shape for
    existence checks at scale."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@register_query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# B3 + B4 — tokenize (explode) + keyed count: THE flagship (word count)
# ---------------------------------------------------------------------------

@register_query(
    "word_count",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count: explode(split()) -> groupBy().count().

    This is the reference's flagship stateful example
    (/root/reference/examples/word_count_example.go:22-67): tokenize each
    message value with strings.Split, keep a running per-word counter in the
    Store. The batch twin aggregates once; the streaming twin
    (kasper_spark.streaming) runs the same plan in update mode.

    Scale: split+explode stays inside whole-stage codegen; the count is
    partially aggregated map-side, so the shuffle is bounded by vocabulary
    size, not corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B7 — nested / denormalized document assembly
# ---------------------------------------------------------------------------

@register_query(
    "nested_order_lines",
    oracle="""
    SELECT
        o_orderkey,
        o_orderstatus,
        COUNT(*) AS n_lines,
        STRING_AGG(CAST(l_partkey AS VARCHAR), ','
                   ORDER BY l_linenumber, CAST(l_partkey AS VARCHAR)) AS part_keys_csv
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderstatus
    """,
)
def nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalized document assembly — batch twin of the reference's
    FictionAndCharacters nested-doc construction
    (/root/reference/topic_processor_test.go:135-155).

    The true nested form (collect_list(struct(...))) is exercised in
    tests/test_golden_join.py; the oracle-checked projection serializes the
    nested array deterministically (ordered CSV) because nested value-hash
    representations differ across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber"), F.col("l_partkey").cast("string").alias("pk")
        ).alias("line"),
    )
    return (
        orders.join(lines, orders.o_orderkey == lines.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("line")), lambda s: s["pk"]
                ),
                ",",
            ).alias("part_keys_csv"),
        )
    )


# ---------------------------------------------------------------------------
# B9 — multitenant keyed aggregation
# ---------------------------------------------------------------------------

@register_query(
    "multitenant_agg",
    oracle=f"""
    SELECT
        n_name AS tenant,
        c_mktsegment AS segment,
        COUNT(*) AS n_customers,
        {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_mktsegment
    """,
)
def multitenant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multitenant fan-in: composite (tenant, key) grouping — the Spark form
    of the reference's MultiStore TenantKey batching
    (/root/reference/store.go:33-44, /root/reference/multi_map.go:44-75).
    nation plays the tenant dimension; broadcast keeps it shuffle-free."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("tenant"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.C — grouping sets, windows, set ops, top-k (absent in kasper, required)
# ---------------------------------------------------------------------------

@register_query(
    "rollup_orders",
    oracle=f"""
    SELECT
        o_orderstatus,
        o_orderpriority,
        COUNT(*) AS n_orders,
        {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY.md §2.C). NULL marks subtotal rows in
    both engines identically."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register_query(
    "cube_events",
    oracle=f"""
    SELECT
        event_type,
        CAST(EXTRACT(year FROM ts) AS INTEGER) AS yr,
        COUNT(*) AS n,
        {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY CUBE (event_type, CAST(EXTRACT(year FROM ts) AS INTEGER))
    """,
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over the events stream table."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.year("ts").alias("yr"), "value")
        .cube("event_type", "yr")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@register_query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT
            o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey
            ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window (north-star top-k operator).

    rn <= k is recognized by Spark as a rank-limit: with AQE it evaluates as
    a WindowGroupLimit (per-partition top-k before the shuffle), so the full
    sort never materializes at scale. Tiebreak on o_orderkey makes row
    numbering deterministic.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register_query(
    "window_running_sum",
    oracle="""
    SELECT
        user_id,
        event_id,
        CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per key — the batch analog of kasper's
    running word-count state (/root/reference/examples/word_count_example.go:36-44):
    every row shows the aggregate as of that message. Decimal accumulation
    keeps prefix sums engine-exact."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,4)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


@register_query(
    "setop_union",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — set operators are absent in kasper (§2.C)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register_query(
    "setop_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register_query(
    "setop_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    # subtract = EXCEPT DISTINCT (exceptAll is the bag-semantics variant,
    # which keeps a row when it occurs more often in a than in b)
    return a.subtract(b)


# ---------------------------------------------------------------------------
# JSON extraction (B2/B7 — the reference carries JSON payloads end-to-end)
# ---------------------------------------------------------------------------

@register_query(
    "json_extract_props",
    oracle="""
    SELECT
        CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsing — the reference serializes all values as JSON
    (/root/reference/topic_processor_test.go:43-63); from_json with an
    explicit schema is our engine's typed boundary (SURVEY.md §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json(F.col("props"), "k BIGINT").alias("p")
    )
    return parsed.groupBy(F.col("p.k").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register_query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT
        COUNT(*) AS n_items,
        CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered global aggregate — the pushdown
    showcase. All four predicates reach the parquet scan (row-group
    skipping on shipdate at 100 TB makes this an I/O-bound scan of a date
    slice, not a full pass); the aggregate is a single partial+final pair
    with no grouping key at all."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_revenue_dec()).cast("double").alias("forecast_revenue"),
        )
    )


@register_query(
    "array_functions",
    oracle="""
    WITH per_order AS (
        SELECT
            l_orderkey,
            list_sort(list(l_linenumber)) AS lines,
            list_sort(list(DISTINCT l_returnflag)) AS flags
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
    )
    SELECT
        l_orderkey,
        len(lines) AS n_lines,
        lines[1] AS first_line,
        lines[-1] AS last_line,
        list_contains(flags, 'R') AS any_returned,
        array_to_string(flags, ',') AS flags_csv,
        len(list_filter(lines, x -> x % 2 = 0)) AS n_even_lines
    FROM per_order
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over collect_list/collect_set (B7's
    array-construction dimension): sort, index, contains, join-to-string,
    lambda filter — all JVM expression work on grouped arrays. The
    groupBy shuffles only (orderkey, linenumber, returnflag); arrays are
    built post-shuffle, never shipped."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines"),
        F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("flags", "R").alias("any_returned"),
        F.array_join("flags", ",").alias("flags_csv"),
        F.size(F.filter("lines", lambda x: x % 2 == 0)).alias("n_even_lines"),
    )


@register_query(
    "join_full_outer",
    oracle="""
    SELECT
        COALESCE(c.c_custkey, -1) AS custkey,
        c.c_name,
        o.o_orderkey,
        o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_custkey < 60) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey < 40) o
        ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — completes the join-type matrix (inner/left/semi/
    anti elsewhere). Both sides filtered to force unmatched rows in BOTH
    directions. Full outer cannot broadcast either side (every row of both
    must surface), so it is always a shuffle join keyed on the equi-key —
    at 100 TB both sides partial-shuffle once; AQE handles the skew."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 60)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
        .select(
            F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("custkey"),
            "c_name",
            "o_orderkey",
            "o_totalprice",
        )
    )


@register_query(
    "window_rank_functions",
    oracle="""
    SELECT * FROM (
        SELECT
            o_custkey,
            o_orderkey,
            rank() OVER w AS rnk,
            dense_rank() OVER w AS drnk,
            percent_rank() OVER w AS prnk,
            cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE o_custkey < 30
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery (rank/dense_rank/percent_rank/cume_dist)
    per customer by order value. percent_rank/cume_dist are ratios of
    integer positions — engine-exact doubles. One shuffle on the partition
    key; the per-group sort never becomes a global sort."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .filter(F.col("o_custkey") < 30)
    )


@register_query(
    "json_roundtrip",
    oracle="""
    SELECT
        event_id,
        k,
        to_json(struct_pack(
            event_id := event_id,
            event_type := event_type,
            k2 := k * 2
        )) AS payload_json
    FROM (
        SELECT event_id, event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_id < 500
    )
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-schema JSON boundary (SURVEY.md §1.3: payloads are opaque
    bytes + from_json/to_json at the edges): parse the props document with
    a declared schema, compute, re-serialize with to_json. Both engines
    emit identical compact JSON for int/string fields (field order = struct
    order), so the round-trip is oracle-checked byte-for-byte."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), "k bigint").alias("p"),
    ).select("event_id", "event_type", F.col("p.k").alias("k"))
    return parsed.select(
        "event_id",
        "k",
        F.to_json(
            F.struct(
                "event_id",
                "event_type",
                (F.col("k") * 2).alias("k2"),
            )
        ).alias("payload_json"),
    )


@register_query(
    "setop_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — the multiset (bag) variant: each view-occurrence of a
    user is cancelled by one purchase-occurrence, keeping multiplicity.
    Complements setop_except's set semantics; Spark compiles it to a
    single-shuffle counted anti-cancel rather than a distinct + anti join.
    (Absent from the reference: SURVEY.md §2.C 'set ops: none'.)"""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.exceptAll(purch)


@register_query(
    "setop_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection: a user appears min(#views,
    #purchases) times. Same single-shuffle counted form as EXCEPT ALL."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.intersectAll(purch)


@register_query(
    "window_range_frame_trailing",
    oracle="""
    SELECT * FROM (
        SELECT
            user_id,
            event_id,
            ts,
            CAST(SUM(CAST(value AS DECIMAL(38,4)))
                 OVER (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS trailing_1h_sum,
            COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS trailing_1h_n
        FROM events
    ) WHERE user_id < 50
    """,
)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user trailing 1-hour sum/count at every
    event — the sliding metric (rate limiting, rolling spend, anomaly
    windows) that rows-based frames cannot express when events are
    irregularly spaced. Value sums go through decimal so every trailing
    window is order-exact.

    RANGE frames need an ordering expression with interval arithmetic;
    Spark's Window.orderBy over a timestamp supports rangeBetween only on
    numeric/interval bounds, so the implementation orders by the epoch-
    microsecond long and bounds the frame in microseconds — semantically
    identical to the SQL INTERVAL form (UTC, no DST gaps in epoch space).
    At 100 TB one shuffle on user_id; each partition evaluates its frames
    with a sliding two-pointer, O(n) per user."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(38,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


@register_query(
    "inmem_lookup_join",
    oracle="""
    WITH weights(event_type, weight) AS (
        VALUES ('view', 1.0), ('click', 3.0), ('signup', 5.0),
               ('purchase', 10.0), ('error', 0.0)
    )
    SELECT
        e.event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(w.weight AS DECIMAL(10,4))) AS DOUBLE) AS weighted_events
    FROM events e
    JOIN weights w ON e.event_type = w.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def inmem_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment against an IN-MEMORY lookup table — the Spark form of the
    reference's Map store used as a dimension (A21,
    /root/reference/map.go:4-64: NewMap handed to Process() as the join
    side). createDataFrame builds the table driver-side; broadcast() ships
    it once per executor, so the fact scan streams past a hash map — no
    shuffle at any scale, the exact physical behavior kasper gets from an
    in-process Go map, minus the per-row call overhead."""
    weights = spark.createDataFrame(
        [("view", 1.0), ("click", 3.0), ("signup", 5.0), ("purchase", 10.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(weights), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("weight").cast("decimal(10,4)")).cast("double").alias(
                "weighted_events"
            ),
        )
        .orderBy("event_type")
    )


@register_query(
    "lateral_posexplode",
    oracle="""
    SELECT
        o_orderkey,
        CAST(i - 1 AS INTEGER) AS pos,
        CAST(lines[i] AS BIGINT) AS linenumber
    FROM (
        SELECT o_orderkey, list_sort(list(l_linenumber)) AS lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey < 500
        GROUP BY o_orderkey
    ), UNNEST(generate_series(1, len(lines))) AS t(i)
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (LATERAL VIEW with ordinal) — collect each order's line
    numbers into a sorted array, then fan back out WITH POSITIONS: the
    array-ordinal round trip that nested-document pipelines (B7,
    /root/reference/topic_processor_test.go:135-155) use to keep element
    order stable through assembly/disassembly. Generate is map-side —
    the only shuffle is the collect_list groupBy."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.array_sort(F.collect_list("l_linenumber")).alias("lines"))
    )
    return nested.select(
        "o_orderkey", F.posexplode(F.col("lines")).alias("pos", "linenumber")
    )


@register_query(
    "variant_extract_props",
    oracle="""
    SELECT
        event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark's VARIANT type (parse_json ->
    variant_get): the open-schema counterpart of json_extract_props'
    fixed-schema from_json. The reference's values are schema-on-read JSON
    blobs (/root/reference/elasticsearch.go:115-118 requires JSON;
    ES dynamic mapping infers types) — VARIANT is the Spark-native answer:
    parse once into a binary-encoded tree, extract typed paths lazily.

    Scale: variant_get is JVM-side and codegen'd; the binary encoding
    avoids re-tokenizing the JSON per extraction (two extractions here,
    one parse), which is the advantage over get_json_object at wide
    extraction fan-outs."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        ev.select("event_type", F.variant_get(v, "$.k", "bigint").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def split_json_dlq(df: DataFrame, col: str, schema: str):
    """Typed-boundary split: rows whose ``col`` parses under ``schema`` vs
    a dead-letter quarantine of the rest (NULL input counts as dead — a
    missing payload is not a valid document).

    The reference's apps hard-require decodable JSON
    (/root/reference/elasticsearch.go:115-118) and a single poison message
    would fail the batch; at 100 TB scale the engine must instead quarantine
    and continue — this is that valve, as a reusable two-DataFrame split.
    Both branches stem from one projection, so a persisted upstream is
    scanned once; the parse itself is JVM-side from_json (no Python).
    Returns (parsed, dead): parsed carries the struct column ``p``; dead
    carries the raw payload for replay/forensics.

    Validity = the payload is well-formed JSON (``try_parse_json`` non-null
    — PERMISSIVE ``from_json`` alone can't detect this: it returns an
    all-null STRUCT for garbage, not NULL). Well-formed-but-wrong-shape
    payloads parse with null fields, matching DuckDB's ``json_valid``
    boundary exactly.
    """
    valid = F.try_parse_json(F.col(col)).isNotNull()
    parsed = df.filter(valid).withColumn("p", F.from_json(F.col(col), schema))
    dead = df.filter(~valid)
    return parsed, dead


@register_query(
    "json_parse_dlq_audit",
    oracle="""
    SELECT
        event_type,
        COUNT(*) FILTER (WHERE props IS NOT NULL AND json_valid(props)) AS n_parsed,
        COUNT(*) FILTER (WHERE props IS NULL OR NOT json_valid(props)) AS n_dead
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_parse_dlq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type parse/dead-letter audit over the events payloads — the
    monitoring face of split_json_dlq (whose split semantics are unit-
    tested against crafted poison payloads in tests/test_examples_parity.py).
    On healthy data every n_dead is 0; the query certifies the counting
    path so a poisoned 100 TB ingest shows up as a per-type dead count,
    not a failed job."""
    ev = load_table(spark, sf_dir, "events")
    parsed, dead = split_json_dlq(ev, "props", "k BIGINT")
    return (
        parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_parsed"))
        .join(
            dead.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_dead")),
            "event_type",
            "full_outer",
        )
        .select(
            "event_type",
            F.coalesce("n_parsed", F.lit(0)).alias("n_parsed"),
            F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
        )
        .orderBy("event_type")
    )


@register_query(
    "union_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS src
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice,
           o_orderpriority, 'v2' AS src
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two generations of the same table — v1
    lacks o_orderpriority, v2 dropped o_totalprice — combined with
    unionByName(allowMissingColumns=True), which aligns columns BY NAME
    and null-fills the gaps.

    This is the 100 TB reality of long-lived datasets: a year of parquet
    partitions written by three pipeline versions must still union into
    one frame. Positional unionAll would mis-align or reject the frames;
    by-name union with null-fill is the contract this query certifies
    (the oracle spells out the aligned + null-padded equivalent). Map-only:
    two scans, no shuffle; at scale the generations are different
    partition directories and mergeSchema-style reads compile to the same
    aligned union."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("v1").alias("src")
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", F.lit("v2").alias("src")
    )
    return v1.unionByName(v2, allowMissingColumns=True)
