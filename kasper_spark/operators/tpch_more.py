"""Additional TPC-H-shaped relational operators (SURVEY.md §2.C breadth).

The reference has no relational algebra at all — any of these shapes would be
hand-written Go inside ``Process()`` (/root/reference/topic_processor.go:101-109)
against the KV store. Each query here is the declarative Spark form of a
pattern class the reference could only express imperatively:

- q4  : EXISTS / semi-join with a non-equi residual condition
- q7  : multi-dimension join with a pair-symmetric filter + year rollup
- q10 : join + agg + deterministic top-k (the enrichment pattern B8 at scale)
- q12 : conditional classification counts (CASE inside SUM)
- q14 : conditional-ratio aggregate (promo revenue share)
- q18 : having-filtered sub-aggregate joined back to facts
- q19 : disjunction-of-conjunctions predicate (OR-of-AND pushdown)
- q22 : global scalar subquery threshold + anti join

Columns are the driver testdata's reduced TPC-H schema (TESTDATA.md), so
predicates are adapted where the classic column is absent (no
l_commitdate/l_receiptdate/l_shipmode/p_container/c_phone): q4/q12 use
"shipped late relative to order date" instead of commit-vs-receipt, q19 drops
the container/shipinstruct conjuncts, q22 groups by market segment instead of
phone prefix. The *plan shapes* — which is what matters for engine parity and
scale behavior — are unchanged.

Scale notes (100 TB mindset):
- nation/supplier/part are `broadcast()`-hinted (true fixed-size
  dimensions). customer is NOT hinted: a hint forces the strategy (AQE never
  demotes it), and customer grows with the fact tables — below the size
  threshold Catalyst auto-broadcasts it anyway, above it the shuffle join is
  the correct plan. Measured: the forced variant OOMs the broadcast build at
  the 10x scale-up (tools/scale10x.py).
- every date/brand/size filter sits directly on the scan column so it reaches
  the parquet reader as a pushed filter (tests/test_plans.py asserts this
  repo-wide).
- sums over money terms use the exact-decimal forms (functions/exact.py) so
  results are accumulation-order-independent — i.e. cluster-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import (
    davg_sql,
    dsum,
    dsum_dec,
    dsum_dec_sql,
    dsum_sql,
)
from kasper_spark.operators.relational import _REVENUE_SQL, _revenue_dec
from kasper_spark.registry import register_query


@register_query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with at least one
    late-shipped line (EXISTS => left-semi join with an extra non-equi
    residual). In the reference this is a per-order store lookup loop
    (/root/reference/examples/word_count_example.go:35 generalized);
    here the semi join shuffles each side once on the order key and the
    residual comparison runs inside the join — no second pass.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register_query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
        {dsum_dec_sql(_REVENUE_SQL)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The two nation joins broadcast (25 rows each); the symmetric
    pair filter lands after them but before the aggregate, so only the
    two relevant nation pairs ever reach the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        # customer is NOT hint-broadcast: at TPC-H ratios it is 1/10th of
        # orders (TBs at 100 TB), and a broadcast() hint is FORCED — AQE
        # never demotes it. Below the size threshold Catalyst still
        # auto-broadcasts; above it this correctly shuffles.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum_dec(_revenue_dec()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register_query(
    "q10_returned_items",
    oracle=f"""
    SELECT
        c_custkey,
        c_name,
        {dsum_dec_sql(_REVENUE_SQL)} AS revenue,
        c_acctbal,
        n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in a quarter. Deterministic top-k (revenue DESC, then the
    unique customer key) so the LIMIT is stable under any parallelism.
    The returnflag + date filters prune at the scans; only surviving rows
    join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_dec(_revenue_dec()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register_query(
    "q12_late_priority_class",
    oracle="""
    SELECT
        l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_late_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among lines shipped >60 days after the order was
    placed (the testdata's analog of commit-vs-receipt lateness), classify
    per returnflag how many belonged to high- vs low-priority orders —
    CASE-inside-SUM conditional counting. The ship-year filter pushes to
    the lineitem scan; the 60-day lateness predicate is the join residual.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register_query(
    "q14_promo_revenue",
    oracle=f"""
    WITH sums AS (
        SELECT
            {dsum_dec_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} ELSE CAST(0 AS DECIMAL(17,8)) END")} AS promo_revenue,
            {dsum_dec_sql(_REVENUE_SQL)} AS total_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    )
    SELECT promo_revenue, total_revenue,
           100.0 * promo_revenue / total_revenue AS promo_pct
    FROM sums
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue — the
    conditional-ratio aggregate. Both sums are exact decimals (the CASE
    arm keeps the decimal type so Spark and DuckDB sum identical values);
    the final ratio is pointwise double arithmetic with identical
    association on both sides (100.0 * p / t), hence bit-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue_dec()
    zero = F.lit(0).cast("decimal(17,8)")
    sums = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            dsum_dec(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias(
                "promo_revenue"
            ),
            dsum_dec(rev).alias("total_revenue"),
        )
    )
    return sums.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@register_query(
    "q18_large_orders",
    oracle=f"""
    SELECT
        c_name,
        c_custkey,
        o_orderkey,
        o_orderdate,
        o_totalprice,
        {dsum_sql("l_quantity")} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {dsum_sql("l_quantity")} > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders (HAVING
    sub-aggregate over lineitem, facts joined back). Written as ONE
    aggregation over lineitem (per-order sum + threshold filter on the
    aggregated row) instead of the textbook agg -> semi-join-back form:
    the semi-join form scans lineitem twice and shuffles it twice; this
    form scans it once, and the filtered per-order rows (already keyed by
    order) flow straight into the orders join — measured 1.9x faster at
    the 10x scale-up (tools/scale10x.py). The >200 threshold compares an
    exact decimal sum, so membership is cluster-deterministic (a double
    sum could flip boundary orders between runs)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        # customer is NOT hint-broadcast: at TPC-H ratios it is 1/10th of
        # orders (TBs at 100 TB), and a broadcast() hint is FORCED — AQE
        # never demotes it. Below the size threshold Catalyst still
        # auto-broadcasts; above it this correctly shuffles.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register_query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_dec_sql(_REVENUE_SQL)} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-AND predicate mixing both
    join sides. Catalyst extracts the common per-side conjuncts from the
    disjunction (p_brand IN (...), p_size <= 35, l_quantity <= 30) and
    pushes them into the scans, so the join sees pre-filtered inputs —
    the optimization this query exists to exercise."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .filter(pred)
        .agg(dsum_dec(_revenue_dec()).alias("revenue"))
    )


@register_query(
    "q22_idle_rich_customers",
    oracle=f"""
    SELECT
        c_mktsegment,
        COUNT(*) AS numcust,
        {dsum_sql("c_acctbal")} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {davg_sql("c_acctbal")}
        FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never ordered
    (global scalar-subquery threshold + anti join), grouped by market
    segment (the testdata's stand-in for phone country codes). The
    threshold is one broadcast row (a 1-row cross join — Spark's scalar
    subquery form); the anti join is the only shuffle. The average is the
    exact-decimal mean so the > comparison picks identical customers on
    any engine or partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    from kasper_spark.functions.exact import davg

    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("_thr")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
