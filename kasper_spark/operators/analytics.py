"""Analytics extensions: pivot, percentiles, sketches, string functions.

All absent from the reference (SURVEY.md §2.C) and required by the
full-query-capability north star. Pivot is expressed as conditional
aggregation (portable SQL both engines); percentiles use linear
interpolation over integer-valued data (identical arithmetic both engines);
approx sketches are rows-only (HLL implementations differ by design).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import dsum, dsum_dec, dsum_sql, money
from kasper_spark.lineage import cut_lineage
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


@register_query(
    "approx_distinct_users",
    oracle="""
    SELECT
        event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(1 AS INTEGER) AS hll_in_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for cardinalities too large for exact distinct at 100 TB.

    ERROR-CONTRACT oracle: the HLL *estimate* is engine-specific, but its
    error guarantee is portable. The same plan computes the exact distinct
    count and emits `hll_in_bound = |approx - exact| <= 5*rsd*exact`
    (rsd=0.01 requested; 5x = ~5 sigma, deterministic for a fixed dataset
    since HLL++ hashing has no RNG). The DuckDB oracle computes the exact
    counts and asserts the contract as literal 1s — a hash match certifies
    the sketch honored its bound. The estimate itself remains available to
    callers of approx_users_estimates() below."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
    )
    bound = F.greatest(F.lit(2.0), F.lit(5 * 0.01) * F.col("exact_users"))
    return agg.select(
        "event_type",
        "exact_users",
        "n",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= bound)
        .cast("integer")
        .alias("hll_in_bound"),
    )


def approx_users_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw HLL++ estimates (what a 100 TB dashboard would serve —
    no exact-distinct pass). Kept separate from the certified contract
    query above because sketch estimates are not portable across engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


@register_query(
    "grouping_sets_orders",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — multi-granularity aggregation in ONE pass over the
    fact table (vs a UNION ALL of three scans). Absent from the reference
    (no grouping machinery at all — SURVEY.md §2.C); Spark expands the sets
    via Expand + a single hash aggregate, so the 100 TB scan happens once
    and each expanded row still combines map-side."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return orders.sparkSession.sql(
        """
        SELECT
            o_orderstatus,
            o_orderpriority,
            CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register_query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey < 100
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_partkey < 100
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns -> long (metric, value) rows via the
    native `unpivot` operator — a Generate (Expand) with NO shuffle, so it
    scales linearly with the scan. The long form is what feature-store and
    training-metrics pipelines ingest."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@register_query(
    "window_nav_lag_lead",
    oracle="""
    SELECT * FROM (
        SELECT
            user_id,
            event_id,
            value,
            lag(value) OVER w AS prev_value,
            lead(event_type) OVER w AS next_type,
            epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev,
            ntile(4) OVER w AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE user_id < 50
    """,
)
def window_nav_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions (lag/lead/ntile) — per-user event
    sequencing, the batch twin of kasper's in-order per-partition processing
    (/root/reference/topic_processor.go:200-216 processes each partition's
    batch in arrival order). One shuffle on user_id; the sort is per
    partition-group, never global."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("event_type").over(w).alias("next_type"),
            (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("us_since_prev"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("user_id") < 50)
    )


@register_query(
    "join_skew_salted",
    oracle="""
    SELECT
        c.c_mktsegment,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: the fact side's join key is split into _SALT
    deterministic sub-keys (o_orderkey % _SALT) and the dimension side is
    replicated once per salt, so ONE hot customer key spreads over _SALT
    reducer tasks instead of one straggler. Result is provably identical to
    the plain join (the oracle IS the plain join).

    At 100 TB this is the manual fallback when AQE's skew-join splitting
    can't kick in (e.g. the skew is in a single shuffle block after an
    aggregation). The dimension replication is an Expand (no extra scan).
    """
    _SALT = 8
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (F.col("o_orderkey") % _SALT).alias("salt"),
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)])))
    )
    return (
        orders.join(cust, (orders.o_custkey == cust.c_custkey) & (orders.salt == cust.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register_query(
    "math_date_functions",
    oracle="""
    SELECT
        o_orderkey,
        year(o_orderdate) AS yr,
        month(o_orderdate) AS mo,
        dayofweek(o_orderdate) + 1 AS dow,
        CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
        datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
        round(o_totalprice, 1) AS price_rounded,
        abs(o_totalprice - 100000.0) AS dist_from_100k,
        floor(o_totalprice / 1000) AS price_k,
        CAST(power(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS DOUBLE) AS pow2,
        sqrt(CAST(o_orderkey AS DOUBLE)) AS root,
        greatest(o_totalprice, 50000.0) AS floored_price
    FROM orders WHERE o_orderkey < 500
    """,
)
def math_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math/date battery (B2's function-library dimension — the
    reference's only scalar ops are Split/Sprintf/strconv, SURVEY.md §2.C).
    All JVM-side, whole-stage-codegen; every function is
    pushdown-transparent (the o_orderkey predicate still reaches the scan).

    Spark's datediff(end, start) and DuckDB's datediff(part, start, end)
    argue argument order differently; both sides here compute
    days-since-1995-01-01. dayofweek differs by one (Spark 1=Sunday,
    DuckDB 0=Sunday) — the oracle adds 1."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.round("o_totalprice", 1).alias("price_rounded"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        F.floor(F.col("o_totalprice") / 1000).cast("double").alias("price_k"),
        F.pow(F.lit(2.0), (F.col("o_orderkey") % 10).cast("double")).alias("pow2"),
        F.sqrt(F.col("o_orderkey").cast("double")).alias("root"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored_price"),
    )


@register_query(
    "stats_moments",
    oracle="""
    WITH sums AS (
        SELECT
            l_returnflag,
            COUNT(*) AS n,
            SUM(CAST(l_quantity AS BIGINT)) AS sq,
            SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sq2
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT
        l_returnflag,
        n,
        CAST(sq AS DOUBLE) / n AS avg_qty,
        CAST(sq2 AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n)
            AS var_pop_qty,
        sqrt(CAST(sq2 AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n))
            AS stddev_pop_qty
    FROM sums
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/stddev via exact integer moment sums. The built-in
    var_pop/stddev aggregates accumulate doubles in partition order —
    nondeterministic across cluster layouts AND engines — so the moments
    are summed exactly (bigint: quantities are integers, squares fit well
    under 2^63) and the identical double arithmetic runs once at the end.
    Same two-phase partial-aggregation profile as any sum/count."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sq2"),
    )
    n = F.col("n")
    mean = F.col("sq").cast("double") / n
    var = F.col("sq2").cast("double") / n - mean * mean
    return sums.select(
        "l_returnflag",
        "n",
        mean.alias("avg_qty"),
        var.alias("var_pop_qty"),
        F.sqrt(var).alias("stddev_pop_qty"),
    )


@register_query(
    "corr_covar_qty_discount",
    oracle="""
    WITH sums AS (
        SELECT
            l_linestatus,
            COUNT(*) AS n,
            SUM(CAST(l_quantity AS BIGINT)) AS sx,
            CAST(SUM(CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE) AS sy,
            SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
            CAST(CAST(SUM(CAST(l_discount AS DECIMAL(10,4))
                          * CAST(l_discount AS DECIMAL(10,4)))
                 AS DECIMAL(38,6)) AS DOUBLE) AS syy,
            CAST(CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(20,0))
                          * CAST(l_discount AS DECIMAL(10,4)))
                 AS DECIMAL(38,6)) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_linestatus
    )
    SELECT
        l_linestatus,
        n,
        sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n) AS cov_pop,
        (sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n))
            / sqrt((CAST(sxx AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   * (syy / n - (sy / n) * (sy / n))) AS corr
    FROM sums
    """,
)
def corr_covar_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance via exact moment sums.

    Spark's built-in corr()/covar_pop() accumulate doubles in partition
    order (co-moment streaming update), so their last ulp depends on the
    cluster layout — useless for a bit-exact oracle AND non-reproducible
    between runs at 100 TB. Here all five moments are exact reductions
    (bigint for integer-valued quantity, decimal for 2-decimal discount;
    the cross moment multiplies decimals so no double product ever hits a
    rounding tie), then the textbook formulas run once in IEEE double —
    identical on any partitioning and any engine. Plan-wise this is one
    partial-aggregated groupBy: the shuffle carries 5 accumulators per
    group, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = money("l_discount", 10, 4)
    sums = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).alias("sxx"),
        dsum_dec(y * y).alias("syy"),
        dsum_dec(x.cast("decimal(20,0)") * y).alias("sxy"),
    )
    n = F.col("n")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy") / n
    cov = F.col("sxy") / n - mx * my
    varx = F.col("sxx").cast("double") / n - mx * mx
    vary = F.col("syy") / n - my * my
    return sums.select(
        "l_linestatus",
        "n",
        cov.alias("cov_pop"),
        (cov / F.sqrt(varx * vary)).alias("corr"),
    )


@register_query(
    "histogram_totalprice",
    oracle=f"""
    SELECT
        CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) * 25000.0 AS bucket_lo,
        COUNT(*) AS n,
        {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25k-wide buckets over order value) — the
    one-pass distribution profile a data-quality sweep runs over every
    numeric column. floor(x / width) is pointwise IEEE arithmetic (engine-
    exact, unlike quantile sketches) and compiles to a plain partial-
    aggregated groupBy on ~20 derived keys: shuffle volume is buckets x
    tasks regardless of input size, the ideal 100 TB profile."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(25000.0))
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    ).select(
        "bucket",
        (F.col("bucket") * F.lit(25000.0)).alias("bucket_lo"),
        "n",
        "sum_price",
    )


@register_query(
    "cohort_retention",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    c AS (
        SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM days
    ),
    pu AS (
        SELECT user_id, cohort_day,
               MAX(CASE WHEN day = cohort_day + 1 THEN 1 ELSE 0 END) AS d1,
               MAX(CASE WHEN day = cohort_day + 7 THEN 1 ELSE 0 END) AS d7
        FROM c
        GROUP BY user_id, cohort_day
    )
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
           COUNT(*) AS cohort_size,
           CAST(SUM(d1) AS BIGINT) AS retained_d1,
           CAST(SUM(d7) AS BIGINT) AS retained_d7
    FROM pu
    GROUP BY cohort_day
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (day-1 / day-7): users grouped by first-active day,
    counted again if they return exactly 1 / 7 days later — the standard
    product-analytics rollup. Formulated for scale: cohort day comes from a
    min-over-user window (one shuffle, no fact⋈agg(fact) self-join), then
    per-user boolean flags aggregate on the SAME user_id partitioning (no
    extra exchange — subset-key grouping reuses it), and only then does the
    tiny per-cohort rollup shuffle. The obvious triple count_distinct
    formulation would Expand the fact 3x instead; per-user flags carry one
    row per user into the final agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohort = F.min("day").over(Window.partitionBy("user_id"))
    per_user = (
        days.withColumn("cohort_day", cohort)
        .groupBy("user_id", "cohort_day")
        .agg(
            F.max((F.col("day") == F.date_add("cohort_day", 1)).cast("int")).alias("d1"),
            F.max((F.col("day") == F.date_add("cohort_day", 7)).cast("int")).alias("d7"),
        )
    )
    return per_user.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size"),
        F.sum("d1").alias("retained_d1"),
        F.sum("d7").alias("retained_d7"),
    ).withColumn("cohort_day", F.col("cohort_day").cast("timestamp"))


@register_query(
    "funnel_view_click_purchase",
    oracle="""
    WITH pu AS (
        SELECT
            user_id,
            MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
            MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
            MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    ),
    flags AS (
        SELECT
            CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
            CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 THEN 1 ELSE 0 END AS s2,
            CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                 THEN 1 ELSE 0 END AS s3
        FROM pu
    )
    SELECT
        CAST(SUM(s1) AS BIGINT) AS step1_view,
        CAST(SUM(s2) AS BIGINT) AS step2_click,
        CAST(SUM(s3) AS BIGINT) AS step3_purchase,
        COUNT(*) AS n_users
    FROM flags
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): a user counts
    at step k only if the k-th event first happens strictly AFTER the
    (k-1)-th first happened — the product-analytics query engines like
    Snowplow/Amplitude run constantly. One pass: conditional MIN per step
    collapses each user's history map-side (3 timestamps per user cross the
    shuffle, not their events), then the ordering flags and the global
    rollup are a few comparisons on one row per user. NULL comparisons
    propagate to false in both engines, so missing steps drop out without
    explicit guards."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    pu = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    s2 = F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1).otherwise(0)
    s3 = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    return pu.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3")).agg(
        F.sum("s1").alias("step1_view"),
        F.sum("s2").alias("step2_click"),
        F.sum("s3").alias("step3_purchase"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register_query(
    "profile_orders_columns",
    oracle="""
    SELECT
        COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS custkey_nulls,
        COUNT(DISTINCT o_custkey) AS custkey_distinct,
        COUNT(DISTINCT o_orderstatus) AS status_distinct,
        COUNT(DISTINCT o_orderpriority) AS priority_distinct,
        MIN(o_totalprice) AS price_min,
        MAX(o_totalprice) AS price_max,
        MIN(o_orderdate) AS date_min,
        MAX(o_orderdate) AS date_max
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (row count, null counts, distinct
    cardinalities, min/max ranges) — the data-quality sweep run before any
    table enters a training pipeline. Multiple exact COUNT(DISTINCT)s make
    Catalyst Expand the input once per distinct column; that is the price
    of exactness and it is documented here deliberately — the 100 TB
    profiler swaps them for approx_count_distinct (see
    approx_distinct_users) and keeps this exact form for audit reruns on
    samples. min/max/null-count all combine map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("custkey_nulls"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
    )


@register_query(
    "agg_argmax_battery",
    oracle="""
    SELECT
        event_type,
        arg_max(event_id, ts) AS latest_event_id,
        arg_min(event_id, ts) AS earliest_event_id,
        CAST(COUNT(CASE WHEN value > 50.0 THEN 1 END) AS BIGINT) AS n_high,
        CAST(bool_or(value > 99.0) AS INTEGER) AS any_extreme,
        CAST(bool_and(value >= 0.0) AS INTEGER) AS all_nonneg
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_argmax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-family aggregate battery: max_by/min_by (the "which row won"
    aggregates that otherwise need a self-join or rank window), count_if,
    bool_or/bool_and. One partial-aggregating shuffle for all six — the
    single-pass replacement for the multi-query loop an imperative
    Process() implementation would run (/root/reference/examples/
    word_count_example.go:33-44 keeps exactly this kind of per-key
    extremum by hand).

    Determinism note: max_by's tie behavior is engine-defined, so the
    ordering value is the event timestamp DISAMBIGUATED by event_id —
    ties are impossible and both engines pick the same row."""
    ev = load_table(spark, sf_dir, "events")
    # tie-free ordering key: (ts, event_id) packed into a struct compare
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by("event_id", ordk).alias("latest_event_id"),
            F.min_by("event_id", ordk).alias("earliest_event_id"),
            F.count_if(F.col("value") > 50.0).alias("n_high"),
            F.bool_or(F.col("value") > 99.0).cast("int").alias("any_extreme"),
            F.bool_and(F.col("value") >= 0.0).cast("int").alias("all_nonneg"),
        )
        .orderBy("event_type")
    )


@register_query(
    "pivot_native",
    oracle=f"""
    SELECT
        n_name,
        {", ".join(
            'CAST(COUNT(CASE WHEN c_mktsegment = ' + chr(39) + s + chr(39) + ' THEN 1 END) AS BIGINT) AS "' + s + '"'
            for s in _SEGMENTS
        )}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def pivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native df.groupBy().pivot() with EXPLICIT pivot values — customer
    counts per (nation x market segment). Explicit values matter at scale:
    without them Spark runs an extra distinct-collect job over 100 TB just
    to discover the column set (and the result schema becomes
    data-dependent, which breaks downstream contracts). With them the
    pivot compiles to the same single-pass conditional aggregation as the
    portable form (pivot_segment_by_nation), one shuffle on the grouping
    key."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.count(F.lit(1)))
        # pivot leaves NULL where a (nation, segment) cell has no rows;
        # SQL's COUNT(CASE ...) yields 0 — align.
        .na.fill(0, subset=list(_SEGMENTS))
        .orderBy("n_name")
    )


@register_query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS edge,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST(COUNT(*) AS BIGINT)
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
    UNION ALL
    SELECT 'nation.n_regionkey->region',
           CAST(COUNT(*) AS BIGINT)
    FROM nation WHERE NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)
    ORDER BY edge
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table foreign-key audit: orphan-row counts for every FK edge
    of the star schema in ONE result — the pre-flight every 100 TB
    ingestion should run before joins silently drop rows. Each edge is a
    left-anti join (no payload columns, no row duplication); dimension
    sides broadcast, the two fact-fact edges shuffle on their key. Edges
    are independent, so Spark schedules them as parallel stages of one
    job rather than six sequential queries."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def orphans(edge, child, key, parent, pkey, bcast):
        p = F.broadcast(parent) if bcast else parent
        return (
            child.join(p, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(edge).alias("edge"), "n_orphans")
        )

    return (
        orphans("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey", False)
        .unionAll(orphans("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey", True))
        .unionAll(orphans("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey", True))
        .unionAll(orphans("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey", True))
        .unionAll(orphans("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey", True))
        .unionAll(orphans("nation.n_regionkey->region", nation, "n_regionkey", region, "r_regionkey", True))
        .orderBy("edge")
    )


@register_query(
    "mom_revenue_growth",
    oracle="""
    WITH monthly AS (
        SELECT
            CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
            CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY o_year, o_month
    )
    SELECT o_year, o_month, revenue,
           LAG(revenue) OVER (ORDER BY o_year, o_month) AS prev_revenue,
           (revenue - LAG(revenue) OVER (ORDER BY o_year, o_month))
               / LAG(revenue) OVER (ORDER BY o_year, o_month) * 100.0 AS growth_pct
    FROM monthly
    ORDER BY o_year, o_month
    """,
)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the window-over-aggregate
    composition (agg first, then lag over the tiny monthly series). The
    expensive pass is the partial-aggregated monthly rollup; the window
    runs over ~n_months rows, so the single-partition window (no
    PARTITION BY) is harmless at any scale — a window over the RAW fact
    table would be the mistake. First month's growth is NULL on both
    engines (lag of nothing)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("o_year", "o_month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_year",
        "o_month",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev * F.lit(100.0)).alias("growth_pct"),
    ).orderBy("o_year", "o_month")


@register_query(
    "approx_percentile_totalprice",
    oracle="""
    WITH ranked AS (
        SELECT
            o_orderstatus,
            o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
            COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    )
    SELECT
        o_orderstatus,
        MIN(CASE WHEN rn >= (50 * n + 99) // 100 THEN o_totalprice END) AS exact_p50,
        MIN(CASE WHEN rn >= (90 * n + 99) // 100 THEN o_totalprice END) AS exact_p90,
        MIN(CASE WHEN rn >= (99 * n + 99) // 100 THEN o_totalprice END) AS exact_p99,
        CAST(1 AS INTEGER) AS p50_in_bound,
        CAST(1 AS INTEGER) AS p90_in_bound,
        CAST(1 AS INTEGER) AS p99_in_bound,
        CAST(n AS BIGINT) AS n
    FROM ranked
    GROUP BY o_orderstatus, n
    """,
)
def approx_percentile_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) over order values per
    status — the percentile path when exact sort-based percentiles are too
    expensive at 100 TB (the sketch is mergeable, one pass, bounded
    memory; Catalyst collapses the three percentile_approx calls over the
    same column into ONE ApproximatePercentile aggregate).

    ERROR-CONTRACT oracle: the sketch *answer* is engine-specific, but the
    GK guarantee is portable: with accuracy A, the returned value's rank r
    satisfies |r - ceil(p*n)| <= n/A. This plan also computes (a) the exact
    nearest-rank percentiles (min value whose rank >= ceil(p*n) — pure
    integer threshold arithmetic, so bit-identical in any engine) and
    (b) the approx value's actual rank interval [count_lt+1, count_le],
    emitting `pXX_in_bound` = does that interval intersect the guaranteed
    band (±(n/A + 1 slack rank for boundary ties)). The DuckDB oracle
    recomputes the exact percentiles and asserts the contract as literal
    1s — the hash match certifies both the exact values and the bound.

    Scale note: the certification twin pays one window sort per status;
    the production path at 100 TB is the sketch alone (mergeable partials,
    no sort) — see approx_percentile_estimates()."""
    accuracy = 10000
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], accuracy)
    agg = orders.groupBy("o_orderstatus").agg(
        F.element_at(pcts, 1).alias("ap50"),
        F.element_at(pcts, 2).alias("ap90"),
        F.element_at(pcts, 3).alias("ap99"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    ranked = orders.select(
        "o_orderstatus", "o_totalprice", F.row_number().over(w).alias("rn")
    )
    j = ranked.join(F.broadcast(agg), "o_orderstatus")
    price = F.col("o_totalprice")

    def k(p: int):  # ceil(p*n/100) in exact integer arithmetic
        return F.expr(f"CAST(({p} * n + 99) DIV 100 AS BIGINT)")

    res = j.groupBy("o_orderstatus", "n", "ap50", "ap90", "ap99").agg(
        *[
            F.min(F.when(F.col("rn") >= k(p), price)).alias(f"exact_p{p}")
            for p in (50, 90, 99)
        ],
        *[
            F.sum((price < F.col(f"ap{p}")).cast("long")).alias(f"lt{p}")
            for p in (50, 90, 99)
        ],
        *[
            F.sum((price <= F.col(f"ap{p}")).cast("long")).alias(f"le{p}")
            for p in (50, 90, 99)
        ],
    )
    err = F.floor(F.col("n") / accuracy).cast("long") + F.lit(1)

    def in_bound(p: int):
        # the approx value covers ranks (lt, le]; the GK band is k ± err
        return (
            (F.col(f"le{p}") >= k(p) - err) & (F.col(f"lt{p}") + 1 <= k(p) + err)
        ).cast("integer")

    return res.select(
        "o_orderstatus",
        "exact_p50",
        "exact_p90",
        "exact_p99",
        in_bound(50).alias("p50_in_bound"),
        in_bound(90).alias("p90_in_bound"),
        in_bound(99).alias("p99_in_bound"),
        F.col("n").cast("long").alias("n"),
    )


def approx_percentile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw GK-sketch percentiles (the one-pass 100 TB production path;
    no window sort). Not cross-engine-hashable — the certified contract
    form is approx_percentile_totalprice above."""
    orders = load_table(spark, sf_dir, "orders")
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    return orders.groupBy("o_orderstatus").agg(
        F.element_at(pcts, 1).alias("approx_p50"),
        F.element_at(pcts, 2).alias("approx_p90"),
        F.element_at(pcts, 3).alias("approx_p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register_query(
    "upsert_snapshot",
    oracle="""
    WITH updates AS (
        SELECT c_custkey,
               c_acctbal + 100.0 AS new_acctbal,
               'GOLD' AS new_segment
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT
        c.c_custkey,
        c.c_name,
        COALESCE(u.new_acctbal, c.c_acctbal) AS c_acctbal,
        COALESCE(u.new_segment, c.c_mktsegment) AS c_mktsegment,
        CAST(CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS was_updated
    FROM customer c
    LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    """,
)
def upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO-shaped snapshot upsert: apply an update batch to the
    current snapshot with matched-row overwrites (left join + coalesce) —
    the batch form of the reference's Store.Put/PutAll upsert loop
    (/root/reference/store.go:23-26, redis.go:111-136) and the exact
    pattern a foreachBatch sink runs per micro-batch to maintain a
    materialized table. Spark's MERGE INTO needs a v2 catalog table; this
    join-coalesce form is plan-identical for insert-free upserts and works
    on any snapshot. One shuffle on the key (or none, broadcast, when the
    update batch is small — AQE decides; here the update side derives from
    the same scan, so Spark reuses it)."""
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("u_custkey"),
        (F.col("c_acctbal") + 100.0).alias("new_acctbal"),
        F.lit("GOLD").alias("new_segment"),
    )
    return cust.join(
        updates, cust.c_custkey == updates.u_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce("new_acctbal", "c_acctbal").alias("c_acctbal"),
        F.coalesce("new_segment", "c_mktsegment").alias("c_mktsegment"),
        F.col("u_custkey").isNotNull().cast("int").alias("was_updated"),
    )


@register_query(
    "hll_mergeable_sketches",
    oracle="""
    SELECT
        event_type,
        CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_total,
        CAST(1 AS INTEGER) AS merged_in_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketches (Apache DataSketches via hll_sketch_agg):
    build one user-cardinality sketch per (day, event_type), then union
    the per-day sketches into per-type totals WITHOUT rescanning the
    facts — the two-level rollup pattern that makes 100 TB cardinality
    dashboards incremental (store daily sketch bytes ~1 KB each; any
    date-range distinct is a sketch union, not a scan).

    ERROR-CONTRACT oracle: sketch bytes/estimates are engine-specific, but
    the merged estimate must land within HLL error of the exact distinct
    over the union — `merged_in_bound` asserts |est - exact| <= 5% (default
    lgConfigK=12 → RSE ≈ 1.04/sqrt(4096) ≈ 1.6%; 5% ≈ 3 sigma,
    deterministic for a fixed dataset). The DuckDB oracle computes the
    exact union distincts and literal 1s; the hash match certifies
    MERGEABILITY end-to-end: daily sketches -> union -> estimate agrees
    with a single exact pass over the union."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users_total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users_total")
    )
    bound = F.greatest(F.lit(2.0), F.lit(0.05) * F.col("exact_users_total"))
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users_total",
            (
                F.abs(F.col("approx_users_total") - F.col("exact_users_total"))
                <= bound
            )
            .cast("integer")
            .alias("merged_in_bound"),
        )
        .orderBy("event_type")
    )


# count-min sketch geometry, shared with the streaming twin
# (operators/streaming_twins.py): depth 4 pairwise-independent xxhash64
# rows of width 8192
CM_DEPTH, CM_WIDTH = 4, 8192


def _cm_cell(d: int) -> Column:
    return F.pmod(F.xxhash64(F.col("word"), F.lit(d)), F.lit(CM_WIDTH))


def cm_depth_cells() -> Column:
    """Array of (depth, cell) structs for a `word` column — the map-side
    expansion both the batch and streaming sketch builds share."""
    return F.array(
        *[
            F.struct(F.lit(d).alias("depth"), _cm_cell(d).alias("cell"))
            for d in range(CM_DEPTH)
        ]
    )


def cm_topk_from_cells(toks: DataFrame, cells: DataFrame, k: int = 20) -> DataFrame:
    """Point-query the merged sketch for every vocabulary word (min over
    the 4 hashed cells — the CM estimate) and return the top-k. The cells
    side is bounded at CM_DEPTH*CM_WIDTH rows by construction, hence the
    broadcast."""
    probes = toks.distinct().select(
        "word", F.explode(cm_depth_cells()).alias("dc")
    ).select("word", "dc.depth", "dc.cell")
    est = (
        probes.join(F.broadcast(cells), ["depth", "cell"])
        .groupBy("word")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), "word").limit(k)


@register_query(
    "countmin_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS est_count
        FROM toks WHERE word <> '' GROUP BY word
    )
    SELECT word, est_count
    FROM counts
    ORDER BY est_count DESC, word
    LIMIT 20
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a MERGEABLE count-min sketch (depth 4 x width 8192).

    The sketch is built the way a 1000-executor cluster would: each task's
    partial aggregation over (depth, cell) IS its local sketch; the shuffle
    merges sketches by summing cells, so at most depth*width = 32k rows ever
    cross the wire per task — independent of corpus size. Point queries then
    take min over the 4 hashed cells (the classic CM estimate, Cormode &
    Muthukrishnan 2005). The sketch side is broadcast into the vocabulary
    probe join because it is bounded by construction.

    Correctness contract: CM overestimates only on collisions; with the
    testdata vocabulary (~40 words) vs 4 independent xxhash64 rows of width
    8192, P(all four cells of a word are contaminated) < 1e-8, so estimates
    equal exact counts and the oracle is the exact GROUP BY — the sketch is
    exercised as the scale path while the hash gate stays exact. (The
    reference has no sketch operators at all — SURVEY.md §2.C.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    # map-side: token -> 4 (depth, cell) pairs; partial agg folds them into
    # the per-task sketch before any shuffle
    cells = (
        toks.select(F.explode(cm_depth_cells()).alias("dc"))
        .groupBy("dc.depth", "dc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cm_topk_from_cells(toks, cells)


@register_query(
    "incremental_agg_merge",
    oracle="""
    WITH parts AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS s
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS s
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    )
    SELECT
        o_orderpriority,
        CAST(SUM(n) AS BIGINT) AS n_orders,
        CAST(CAST(SUM(s) AS DECIMAL(38,6)) AS DOUBLE) AS total_price,
        CAST(CAST(SUM(s) AS DECIMAL(38,6)) AS DOUBLE) / SUM(n) AS avg_price
    FROM parts
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's snapshot partials +
    today's delta partials merge into the same answer as a full recompute
    (certified by the oracle's plain-GROUP-BY-equivalent form).

    This is the 100 TB pattern that makes daily metrics affordable — the
    history is never re-aggregated, only its partial STATE (count + exact
    decimal sum per group) is merged with the new day's partials. The
    state decomposition is the algebraic one: avg is NOT averaged across
    partials (non-associative); it is derived from the merged sum/count at
    the end. The decimal sums make the merge bit-exact AND
    order-independent, so snapshot+delta equals full-recompute equals any
    re-bracketing of days — the property incremental pipelines silently
    assume and double arithmetic silently violates.

    Plan shape: each side partially aggregates map-side; the union merges
    group states in ONE final hash aggregate (groups x 2 rows). Per-group
    decimal-4 unscaled sums stay < 2^53 through sf0.1 (functions/exact.py
    cast rule); a 100 TB deployment keeps the snapshot state as a table
    and unions only (state, delta) — identical topology.
    """
    orders = load_table(spark, sf_dir, "orders")
    pivot = "1997-01-01"

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice", 12, 4)).alias("s"),
        )

    snapshot = partials(orders.filter(F.col("o_orderdate") < pivot))
    delta = partials(orders.filter(F.col("o_orderdate") >= pivot))
    merged_sum = F.sum("s").cast("decimal(38,6)").cast("double")
    return (
        snapshot.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            merged_sum.alias("total_price"),
            (merged_sum / F.sum("n")).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@register_query(
    "dq_constraint_report",
    oracle="""
    WITH m AS (
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(o_custkey) AS BIGINT) AS n_custkey,
            CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_keys,
            CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_status_ok,
            CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_pos,
            MIN(o_totalprice) AS min_price,
            MAX(o_totalprice) AS max_price
        FROM orders
    )
    SELECT 'completeness_o_custkey' AS check_name, CAST(n_custkey AS DOUBLE) / n AS value FROM m
    UNION ALL
    SELECT 'uniqueness_o_orderkey', CAST(n_distinct_keys AS DOUBLE) / n FROM m
    UNION ALL
    SELECT 'compliance_status_domain', CAST(n_status_ok AS DOUBLE) / n FROM m
    UNION ALL
    SELECT 'compliance_price_positive', CAST(n_price_pos AS DOUBLE) / n FROM m
    UNION ALL
    SELECT 'min_o_totalprice', min_price FROM m
    UNION ALL
    SELECT 'max_o_totalprice', max_price FROM m
    ORDER BY check_name
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report (the Deequ/dbt-test pattern) computed
    in ONE aggregation pass: column completeness, key uniqueness, domain
    compliance, value bounds — the audit a 100 TB ingest runs before
    publishing a partition, where "one pass" vs "one query per check" is
    the difference between reading the data once and N times.

    All ratios are int/int -> ONE double division (engine-exact); the
    single-row metric state then unpivots to the (constraint, value) long
    form downstream alerting consumes. Plan: scan -> partial agg -> 1-row
    final agg -> Expand; the only shuffle carries one row per task. The
    exact COUNT(DISTINCT) rewrites to a two-phase aggregate; at extreme
    key cardinality swap in approx_count_distinct (HLL) with the same
    report shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct(F.col("o_orderkey")).alias("n_distinct_keys"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_status_ok"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias("n_price_pos"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    n = F.col("n").cast("double")
    checks = [
        ("completeness_o_custkey", F.col("n_custkey") / n),
        ("uniqueness_o_orderkey", F.col("n_distinct_keys") / n),
        ("compliance_status_domain", F.col("n_status_ok") / n),
        ("compliance_price_positive", F.col("n_price_pos") / n),
        ("min_o_totalprice", F.col("min_price")),
        ("max_o_totalprice", F.col("max_price")),
    ]
    return (
        m.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("check_name"),
                            value.cast("double").alias("value"),
                        )
                        for name, value in checks
                    ]
                )
            ).alias("c")
        )
        .select("c.check_name", "c.value")
        .orderBy("check_name")
    )


@register_query(
    "try_functions_battery",
    oracle="""
    WITH crafted AS (
        SELECT
            CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                 ELSE CAST(o_orderkey AS VARCHAR) END AS int_str,
            CASE WHEN o_orderkey % 4 = 0 THEN 'garbage'
                 ELSE strftime(o_orderdate, '%Y-%m-%d') END AS ts_str,
            o_totalprice,
            o_orderkey % 5 AS divisor
        FROM orders
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN try_cast(int_str AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
        CAST(SUM(try_cast(int_str AS BIGINT)) AS BIGINT) AS sum_cast,
        CAST(SUM(CASE WHEN o_totalprice / divisor IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
        CAST(CAST(SUM(CAST(o_totalprice / divisor AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_div,
        CAST(SUM(CASE WHEN try_strptime(ts_str, '%Y-%m-%d') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_null,
        MIN(try_strptime(ts_str, '%Y-%m-%d')) AS min_ts
    FROM crafted
    """,
)
def try_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-safe scalar battery: try_cast / try_divide /
    try_to_timestamp over deterministically-poisoned inputs — the
    row-level complement of the DLQ split (json_parse_dlq_audit): at 100 TB
    a handful of malformed rows must become NULLs you can count (and
    quarantine), never a task-killing exception 6 hours into the job.
    Spark 4 runs ANSI mode by default, where plain CAST/division THROW on
    bad input, so the try_* family is the scale-safety idiom this engine
    standardizes on.

    Cross-engine note: DuckDB's plain `/` already yields NULL on zero
    divisors (its try_divide equivalent) and try_strptime mirrors
    try_to_timestamp (each side spells the same date format in its own
    syntax). The order-dependent double sum goes through the usual
    decimal-exact discipline. Map-only + one 1-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    crafted = orders.select(
        F.when(k % 3 == 0, F.lit("not-a-number"))
        .otherwise(k.cast("string"))
        .alias("int_str"),
        F.when(k % 4 == 0, F.lit("garbage"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("ts_str"),
        "o_totalprice",
        (k % 5).alias("divisor"),
    )
    cast_val = F.expr("try_cast(int_str AS BIGINT)")
    div_val = F.try_divide(F.col("o_totalprice"), F.col("divisor"))
    ts_val = F.try_to_timestamp(F.col("ts_str"), F.lit("yyyy-MM-dd"))
    return crafted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(cast_val.isNull(), 1).otherwise(0)).alias("n_cast_null"),
        F.sum(cast_val).alias("sum_cast"),
        F.sum(F.when(div_val.isNull(), 1).otherwise(0)).alias("n_div_null"),
        F.sum(div_val.cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("sum_div"),
        F.sum(F.when(ts_val.isNull(), 1).otherwise(0)).alias("n_ts_null"),
        F.min(ts_val).alias("min_ts"),
    )


_EQUIDEPTH_ORACLE = """
    WITH tiled AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT
        CAST(bucket AS BIGINT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        MIN(o_totalprice) AS lo,
        MAX(o_totalprice) AS hi
    FROM tiled
    GROUP BY bucket
    ORDER BY bucket
    """


@register_query("equidepth_histogram_totalprice", oracle=_EQUIDEPTH_ORACLE)
def equidepth_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (quantile) histogram: 10 buckets of equal row count with
    their value ranges — the profile that stays readable under skew, where
    the equi-width histogram (histogram_totalprice) collapses into one hot
    bucket. The two together are the standard column-profiling pair.

    Ties are broken by o_orderkey so bucket assignment (and therefore the
    hash) is total-order deterministic on both engines. This is the
    naive-spec VERIFICATION form (one global ntile sort); the executable
    scale form with the identical output and oracle is
    equidepth_histogram_hist below — no row ever crosses a global sort
    there."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    tiled = orders.select(
        "o_totalprice",
        F.ntile(10)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("bucket"),
    )
    return (
        tiled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n", "lo", "hi")
        .orderBy("bucket")
    )


@register_query("equidepth_histogram_hist", oracle=_EQUIDEPTH_ORACLE)
def equidepth_histogram_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTABLE scale form of equidepth_histogram_totalprice (r13
    verdict ticket #2) — identical output, certified against the SAME
    naive-spec oracle, with the global ntile sort eliminated.

    Why no row rank is needed: a price value v with b rows strictly below
    and count c occupies ranks b+1..b+c CONTIGUOUSLY (ties share a value,
    so which tied row gets which rank never moves a value across a bucket
    edge). NTILE(k)'s bucket rank ranges are a closed form of (n, k)
    alone — with q = n div k, r = n mod k, bucket j covers ranks
    [(j-1)q + min(j-1, r) + 1, jq + min(j, r)] — so each histogram entry
    knows exactly which buckets it intersects and contributes
    overlap = min(hi_j, b+c) - max(lo_j, b+1) + 1 rows to each. The plan
    is: one partial-aggregated groupBy to the (value, count) histogram,
    one cumulative window over the DOMAIN-sized histogram (the
    hist_prefix_rank discipline), a map-side sequence-explode into the
    <= k intersecting buckets per entry (no join, no spine, no BNLJ),
    and a 10-group aggregate. All rank arithmetic is int64-exact (`div`,
    never double division), so the bucket stats equal the spec's exactly
    and the oracle hash is shared."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    hist = orders.groupBy("o_totalprice").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_before = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "o_totalprice",
        "c",
        F.coalesce(F.sum("c").over(w_before), F.lit(0)).cast("long").alias("b"),
        F.sum("c").over(w_all).cast("long").alias("_n"),
    )
    # bucket_of(rank i) — NTILE(k)'s inverse, integer-exact; when q = 0
    # every rank satisfies the WHEN branch, so the `div _q` never runs
    bucket_of = (
        "CASE WHEN {i} <= _r * (_q + 1)"
        "     THEN ({i} - 1) div (_q + 1) + 1"
        "     ELSE _r + ({i} - _r * (_q + 1) - 1) div _q + 1 END"
    )
    spanned = (
        cum.withColumn("_q", F.expr("_n div 10"))
        .withColumn("_r", F.expr("_n % 10"))
        .withColumn("_first", F.expr(bucket_of.format(i="(b + 1)")))
        .withColumn("_last", F.expr(bucket_of.format(i="(b + c)")))
        .withColumn("bucket", F.explode(F.sequence("_first", "_last")))
        .withColumn(
            "_lo_rank",
            F.expr("(bucket - 1) * _q + least(bucket - 1, _r) + 1"),
        )
        .withColumn("_hi_rank", F.expr("bucket * _q + least(bucket, _r)"))
        .withColumn(
            "_ov",
            F.expr("least(_hi_rank, b + c) - greatest(_lo_rank, b + 1) + 1"),
        )
    )
    return (
        spanned.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.sum("_ov").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@register_query(
    "table_checksum_orders",
    oracle="""
    WITH hashed AS (
        SELECT
            o_orderkey % 16 AS bucket,
            md5(COALESCE(CAST(o_orderkey AS VARCHAR), chr(1))
                || '|' || COALESCE(o_orderstatus, chr(1))
                || '|' || COALESCE(o_orderpriority, chr(1))) AS h
        FROM orders
    )
    SELECT
        CAST(bucket AS BIGINT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(list_sum(list_transform(generate_series(1, 10), i ->
            CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
                << (4 * (10 - i)))) AS BIGINT)) AS BIGINT) AS checksum
    FROM hashed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed, order-independent table checksum — the cross-system
    reconciliation primitive: after replicating/migrating 100 TB, compare
    16 (bucket, n_rows, checksum) rows instead of 100 TB of data, and
    binary-search any mismatch bucket by re-running with a finer modulus.

    Determinism across engines is the whole point, so the row hash avoids
    both engine-native hash functions (Spark's xxhash64 and DuckDB's hash
    disagree by design) and float formatting: md5 over a '|'-canonicalized
    string of integer/text key columns, identical bytes on both sides. The
    40-bit prefix keeps per-bucket SUMs far from bigint overflow (~1e12
    per row; rescale buckets/modulus before ~1e6 rows x buckets at 100 TB,
    or sum modulo a prime). Addition is commutative, so the checksum is
    independent of partitioning and row order — exactly what a
    replication audit needs. One map-side hash + a 16-group aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    # NULL-safe canonicalization: concat_ws silently SKIPS nulls (making
    # ('x', NULL, 'y') and ('x', 'y', NULL) collide, and diverging from the
    # oracle's NULL-propagating '||'), so every column is coalesced to a
    # control-char sentinel (\x01 cannot appear in these text domains) on
    # BOTH engines before hashing.
    sent = "\x01"
    h = F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col("o_orderkey").cast("string"), F.lit(sent)),
            F.coalesce(F.col("o_orderstatus"), F.lit(sent)),
            F.coalesce(F.col("o_orderpriority"), F.lit(sent)),
        ).cast("binary")
    )
    hashed = orders.select(
        (F.col("o_orderkey") % 16).alias("bucket"),
        F.conv(F.substring(h, 1, 10), 16, 10).cast("bigint").alias("hv"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("hv").alias("checksum"))
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_rows", "checksum")
        .orderBy("bucket")
    )


@register_query(
    "map_functions_battery",
    oracle="""
    WITH per AS (
        SELECT o_orderpriority AS p, o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT
        p AS o_orderpriority,
        string_agg(s, ',' ORDER BY s) AS statuses,
        CAST(SUM(c) AS BIGINT) AS total,
        CAST(COALESCE(MAX(CASE WHEN s = 'O' THEN c END), 0) AS BIGINT) AS n_open,
        CAST(SUM(CASE WHEN c > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_statuses
    FROM per GROUP BY p
    ORDER BY p
    """,
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type scalar battery: build a status->count map per priority with
    map_from_entries, then drive map_keys / map_values / element_at /
    map_filter / aggregate over it — the map-column family the engine's
    other batteries (string/math/date/array/json/variant) don't touch.
    The oracle computes the same SEMANTICS relationally (DuckDB's map type
    has no higher-order functions), which is exactly the point: outputs
    are scalars derived from the map, so the comparison certifies the map
    operators' results, not an engine-specific map encoding.

    Scale: the map is per-GROUP state (bounded by the status domain), not
    per-row — the standard way to keep small keyed lookups inside a row
    without a second shuffle. sort_array before map_from_entries pins
    entry order so array_join(map_keys) is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "c")))
        ).alias("m")
    )
    return m.select(
        "o_orderpriority",
        F.array_join(F.map_keys("m"), ",").alias("statuses"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total"),
        F.coalesce(F.element_at("m", F.lit("O")), F.lit(0)).cast("bigint").alias("n_open"),
        F.size(F.map_filter("m", lambda _k, v: v > 50)).cast("bigint").alias(
            "n_big_statuses"
        ),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Rank-based winsorization (round 8)
# ---------------------------------------------------------------------------

_WINS_LO_PCT = 5  # clip below the p05 rank value
_WINS_HI_PCT = 95  # and above the p95 rank value


@register_query(
    "winsorize_event_values",
    # The oracle states the NAIVE spec: rank every row per type and read
    # the values at the ceil(q*n) rank positions. The Spark plan computes
    # the identical bounds from a value histogram (see docstring).
    oracle=f"""
    WITH cents AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    ranked AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cents, event_id
               ) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM cents
    ),
    bounds AS (
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN rk >= ({_WINS_LO_PCT} * n + 99) // 100
                             THEN cents END) AS BIGINT) AS lo_cents,
               CAST(MIN(CASE WHEN rk >= ({_WINS_HI_PCT} * n + 99) // 100
                             THEN cents END) AS BIGINT) AS hi_cents
        FROM ranked GROUP BY event_type
    )
    SELECT c.event_type, b.n, b.lo_cents, b.hi_cents,
           CAST(COUNT(CASE WHEN c.cents < b.lo_cents THEN 1 END) AS BIGINT)
               AS n_clipped_low,
           CAST(COUNT(CASE WHEN c.cents > b.hi_cents THEN 1 END) AS BIGINT)
               AS n_clipped_high,
           CAST(SUM(LEAST(GREATEST(c.cents, b.lo_cents), b.hi_cents))
                AS BIGINT) AS sum_cents_clipped
    FROM cents c JOIN bounds b USING (event_type)
    GROUP BY c.event_type, b.n, b.lo_cents, b.hi_cents
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorization per event type: clip values below the
    p05-rank value and above the p95-rank value (rank r_q = ceil(q*n),
    pure integers — NOT interpolated percentiles, so the bounds are
    actual data values and exact on every engine). Emits per-type bounds,
    clip counts, and the clipped sum — the robust-scaling step feature
    pipelines run before normalization so a single corrupt 1e9 reading
    cannot stretch the feature range.

    The oracle states the naive spec (a per-type ROW_NUMBER over every
    row — a full sort of the fact table). This plan computes the same
    bounds WITHOUT sorting rows: values are integer cents, so a
    (type, cents) count histogram + a cumulative window over the
    histogram (|distinct values| rows per type, not |rows|) finds the
    rank thresholds; the bounds broadcast back for a map-side clip +
    partial agg. Same oracle-as-spec / plan-as-scale-path discipline as
    token_budget_select. Shuffles: one on (type, cents) groups, one on
    type — both carry aggregates, never raw rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    hist = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    # rank thresholds: ceil(q*n) in pure integer arithmetic
    r_lo = F.floor((_WINS_LO_PCT * F.col("n") + 99) / 100).cast("bigint")
    r_hi = F.floor((_WINS_HI_PCT * F.col("n") + 99) / 100).cast("bigint")
    bounds = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.col("cum") >= r_lo, F.col("cents")))
        .cast("long")
        .alias("lo_cents"),
        F.min(F.when(F.col("cum") >= r_hi, F.col("cents")))
        .cast("long")
        .alias("hi_cents"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "n",
        "lo_cents",
        "hi_cents",
        "cents",
        F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents")).alias(
            "cc"
        ),
    )
    return clipped.groupBy("event_type", "n", "lo_cents", "hi_cents").agg(
        F.sum(F.when(F.col("cents") < F.col("lo_cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("cents") > F.col("hi_cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
        F.sum("cc").cast("long").alias("sum_cents_clipped"),
    )


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnosis (round 8)
# ---------------------------------------------------------------------------

_SKEW_KEYS = (("lineitem", "l_orderkey"), ("events", "user_id"))


def _skew_naive_sql(table: str, key: str) -> str:
    """Naive spec for one audited key: rank every key by its row count and
    read p99 / Gini from the ranked sequence."""
    return f"""
        SELECT '{table}.{key}' AS key_name,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_rows,
               CAST(MIN(CASE WHEN rk >= (99 * n + 99) // 100
                             THEN cnt END) AS BIGINT) AS p99_rows,
               CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_rows,
               (CAST(MAX(cnt) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
                   / CAST(SUM(cnt) AS DOUBLE) AS skew_factor,
               (2.0 * CAST(SUM(rk * cnt) AS DOUBLE))
                   / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
                   - (CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                   AS gini
        FROM (
            SELECT cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt, k) AS rk,
                   COUNT(*) OVER () AS n
            FROM (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM {table} GROUP BY {key})
        )
    """


@register_query(
    "key_skew_report",
    # The oracle is the NAIVE spec: rank all keys by row count (a
    # key-cardinality sort) and compute p99/Gini from ranks. The plan
    # derives identical numbers from a histogram of counts (docstring).
    oracle=" UNION ALL ".join(_skew_naive_sql(t, k) for t, k in _SKEW_KEYS),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis — the report you run BEFORE pointing a
    100 TB join or aggregation at a key: per audited key column, key
    cardinality, total/max/p99 rows per key, the skew factor
    (max/average — how much longer the hottest shuffle partition's
    straggler task runs), and the exact Gini coefficient of the row
    distribution (0 = perfectly even, ->1 = one key owns everything).
    Feeds the choice between a plain shuffle, AQE skew-join splitting,
    and explicit salting (join_skew_salted).

    The oracle states the naive spec: ROW_NUMBER over every key ordered
    by count — a key-cardinality sort (billions of keys at 100 TB). The
    plan computes identical numbers WITHOUT ranking keys: a histogram of
    counts (distinct count values, typically thousands) with a cumulative
    window gives p99 directly, and Gini's rank-weighted sum collapses per
    histogram bucket to v * (m*(s+1) + m*(m-1)/2) with s the bucket's
    cumulative start — pure BIGINT. Every emitted double is one exact-int
    division (magnitudes < 2^53 through sf ~100; beyond that the Gini
    numerator needs decimal widening, noted here for honesty).

    Shuffles per key: one on the key (count), one on the count value
    (histogram) — both carry aggregates. The per-key counts never sort."""
    dfs = []
    for table, key in _SKEW_KEYS:
        rows = load_table(spark, sf_dir, table).groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        hist = rows.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("m"))
        wcum = Window.orderBy("cnt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = hist.select(
            "cnt",
            "m",
            (F.sum("m").over(wcum) - F.col("m")).alias("s"),  # keys before bucket
            F.sum("m").over(wcum).alias("cum_keys"),
        )
        # per-bucket rank-weighted mass: sum_{i=s+1..s+m} i * cnt. Stays
        # PURE BIGINT: m*(m-1) is even, so the halving is exact integer
        # division (a double `/` here would make the final sum
        # float-accumulated and partition-order-dependent).
        rank_mass = F.col("cnt") * (
            F.col("m") * (F.col("s") + 1)
            + F.expr("CAST(m * (m - 1) AS BIGINT) div 2")
        )
        n_keys = F.sum("m").cast("long")
        n_rows = F.sum(F.col("cnt") * F.col("m")).cast("long")
        agg = cum.agg(
            n_keys.alias("n_keys"),
            n_rows.alias("n_rows"),
            F.max("cnt").cast("long").alias("max_rows"),
            F.sum(rank_mass).cast("long").alias("rank_mass"),
        )
        # p99 needs the threshold rank, which needs n_keys: a second tiny
        # pass over the histogram joined to the 1-row aggregate (broadcast)
        r99 = F.floor((99 * F.col("n_keys") + 99) / 100).cast("bigint")
        p99 = (
            cum.crossJoin(F.broadcast(agg.select(r99.alias("r99"))))
            .filter(F.col("cum_keys") >= F.col("r99"))
            .agg(F.min("cnt").cast("long").alias("p99_rows"))
        )
        nd = F.col("n_keys").cast("double")
        td = F.col("n_rows").cast("double")
        dfs.append(
            agg.crossJoin(F.broadcast(p99)).select(
                F.lit(f"{table}.{key}").alias("key_name"),
                "n_keys",
                "n_rows",
                "max_rows",
                "p99_rows",
                (td / nd).alias("avg_rows"),
                ((F.col("max_rows").cast("double") * nd) / td).alias("skew_factor"),
                (
                    (2.0 * F.col("rank_mass").cast("double")) / (nd * td)
                    - ((F.col("n_keys") + 1).cast("double") / nd)
                ).alias("gini"),
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@register_query(
    "ols_regression_by_group",
    oracle="""
    WITH sums AS (
        -- decimal accumulators for the big moments: SUM(y*y) overflows
        -- int64 already at ~15M rows/group (y is cents, y^2 ~ 1.2e14);
        -- widths chosen so every later product stays <= DuckDB's 38-digit
        -- multiply cap: n(13) x sxy/syy(25) = 38, sy(19) x sy(19) = 38
        SELECT
            l_returnflag,
            l_linestatus,
            COUNT(*) AS n,
            CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
            CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS DECIMAL(19,0)) AS sy,
            CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                     * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
            CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                     * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS DECIMAL(25,0)) AS sxy,
            CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS DECIMAL(25,0)) AS syy
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    ),
    wide AS (
        SELECT
            l_returnflag, l_linestatus, n, sx, sy,
            CAST(CAST(n AS DECIMAL(13,0)) * sxy
                 - CAST(sx AS DECIMAL(14,0)) * sy
                 AS DECIMAL(38,0)) AS num,
            CAST(CAST(n AS DECIMAL(13,0)) * CAST(sxx AS DECIMAL(15,0))
                 - CAST(sx AS DECIMAL(14,0)) * CAST(sx AS DECIMAL(14,0))
                 AS DECIMAL(38,0)) AS den,
            CAST(CAST(n AS DECIMAL(13,0)) * syy
                 - sy * sy
                 AS DECIMAL(38,0)) AS deny
        FROM sums
    )
    SELECT
        l_returnflag,
        l_linestatus,
        n,
        CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope_cents_per_unit,
        (CAST(sy AS DOUBLE)
         - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
            / CAST(n AS DOUBLE) AS intercept_cents,
        (CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)))
            * (CAST(num AS DOUBLE) / sqrt(CAST(deny AS DOUBLE))) AS r2
    FROM wide
    """,
)
def ols_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form OLS (regr_slope / regr_intercept / regr_r2) of
    extendedprice-cents on quantity, per (returnflag, linestatus) — the per-segment trend
    fit every pricing/forecasting notebook runs.

    Both engines SHIP these as built-in aggregates (regr_*), but both
    accumulate doubles in partition order — nondeterministic across cluster
    layouts and not bit-portable between engines. This plan instead gathers
    the five sufficient statistics (n, Sx, Sy, Sxx, Sxy, Syy) as EXACT
    integer/decimal sums (quantity is an integer, price quantized once to
    cents with the rounding-mode-independent floor(v*100+0.5); the y-side
    moments accumulate in DECIMAL because SUM(y^2) overflows int64 at
    ~15M rows per group), then runs one identical IEEE double expression
    per group on both engines. Decimal widths are sized so every cross
    term stays under the 38-digit multiply cap both engines share —
    exact through ~1e10 rows per group (i.e. >10 TB of lineitem PER
    GROUP); beyond that, split the y^2 moment into high/low words. r2 is computed as (num/sqrt(den))*(num/sqrt(deny)) — num^2
    would need 76 digits; the factored form keeps every double op in range.

    Scale: one groupBy((returnflag, linestatus)) with full map-side partial
    aggregation — the shuffle carries 4 rows per task. The closed form needs no second
    pass and no driver-side math; this is the textbook "sufficient
    statistics beat iteration" distributed-ML shape."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    # big moments accumulate in DECIMAL (y*y ~ 1.2e14/row overflows an
    # int64 SUM at ~15M rows/group); per-row products still fit long
    sums = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y.cast("decimal(19,0)")).cast("decimal(19,0)").alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum((x * y).cast("decimal(25,0)")).cast("decimal(25,0)").alias("sxy"),
        F.sum((y * y).cast("decimal(25,0)")).cast("decimal(25,0)").alias("syy"),
    )
    num = (
        F.col("n").cast("decimal(13,0)") * F.col("sxy")
        - F.col("sx").cast("decimal(14,0)") * F.col("sy")
    ).cast("decimal(38,0)")
    den = (
        F.col("n").cast("decimal(13,0)") * F.col("sxx").cast("decimal(15,0)")
        - F.col("sx").cast("decimal(14,0)") * F.col("sx").cast("decimal(14,0)")
    ).cast("decimal(38,0)")
    deny = (
        F.col("n").cast("decimal(13,0)") * F.col("syy")
        - F.col("sy") * F.col("sy")
    ).cast("decimal(38,0)")
    wide = sums.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        "sx",
        "sy",
        num.alias("num"),
        den.alias("den"),
        deny.alias("deny"),
    )
    slope = F.col("num").cast("double") / F.col("den").cast("double")
    return wide.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        slope.alias("slope_cents_per_unit"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
        (
            (F.col("num").cast("double") / F.sqrt(F.col("den").cast("double")))
            * (F.col("num").cast("double") / F.sqrt(F.col("deny").cast("double")))
        ).alias("r2"),
    )


@register_query(
    "incremental_join_view",
    oracle="""
    WITH current_orders AS (
        -- the logical table after the change batch: rows keyed %101 get a
        -- priority re-class (the update), post-pivot rows are the inserts
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE WHEN o_orderkey % 101 = 0 THEN 'RECLASS'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           c.c_name, c.c_mktsegment
    FROM current_orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view (the IVM
    delete+insert algebra): given the stored view V = base ⋈ customer and
    a change batch (inserts = post-pivot orders; updates = %101-keyed
    re-classed orders, applied as delete+insert), the maintained view is

        V'  =  (V  ANTI-JOIN  changed-keys)  UNION  (changes ⋈ customer)

    — only the CHANGE BATCH ever joins again; the bulk view is touched by
    a key anti-join alone. The DuckDB oracle is the naive spec: recompute
    the full join over the post-change logical table. The hash match
    certifies the maintenance algebra (the incremental_agg_merge
    discipline, extended from aggregate state to join views).

    Scale: in production V is a stored table, so per batch the join work
    is O(|changes| x broadcast(dim)) and the anti-join streams the view
    once (or prunes to changed partitions via the key layout); nothing
    corpus-sized shuffles. Locally the "stored" V is built in-query from
    the pre-pivot base — the plan's base half is the one-time backfill
    cost, the delta half is the steady-state per-batch cost."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    pivot = "1997-01-01"
    base = orders.filter(F.col("o_orderdate") < pivot)
    inserts = orders.filter(F.col("o_orderdate") >= pivot)
    updated = base.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderpriority", F.lit("RECLASS")
    )
    proj = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]

    def enrich(df: DataFrame) -> DataFrame:
        return (
            df.select(*proj)
            .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
            .select(
                "o_orderkey",
                "o_orderpriority",
                "o_totalprice",
                "c_name",
                "c_mktsegment",
            )
        )

    stored_view = enrich(base)  # the "materialized" backfill (stored, in prod)
    # the change batch carries POST-change values: %101-keyed inserts are
    # born reclassed, %101-keyed base rows arrive as delete+insert updates
    changes = (
        inserts.select(*proj)
        .unionByName(updated.select(*proj))
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 101 == 0, F.lit("RECLASS")).otherwise(
                F.col("o_orderpriority")
            ),
        )
    )
    changed_keys = changes.select("o_orderkey")
    maintained = stored_view.join(
        F.broadcast(changed_keys), "o_orderkey", "left_anti"
    ).unionByName(enrich(changes))
    return maintained


@register_query(
    "exact_quantiles_histogram",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem
    )
    SELECT l_returnflag, 0.25 AS q, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(c, 0.25) AS value_cents
    FROM cents GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 0.5 AS q, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(c, 0.5) AS value_cents
    FROM cents GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 0.75 AS q, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(c, 0.75) AS value_cents
    FROM cents GROUP BY l_returnflag
    """,
)
def exact_quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quartiles per group WITHOUT sorting rows — the
    distributed order-statistic selection that replaces both
    percentile_approx (inexact) and F.percentile (collects every group
    value into one task's memory). The plan builds a VALUE HISTOGRAM
    (groupBy (group, cents) count — rows proportional to distinct values,
    not data volume), runs the cumulative count over each group's value
    domain, and SELECTS the two bracketing order statistics per quantile
    with a broadcast (group, q, rank) lookup — no per-row sort anywhere.

    Exactness across engines: values are integer cents, the quantile set
    is DYADIC ({0.25, 0.5, 0.75}), so the rank position h = (n-1)*q, its
    fractional weight g, and the interpolation v_lo + g*(v_hi - v_lo) are
    all EXACT double arithmetic — bit-identical to DuckDB's quantile_cont
    by mathematical identity, not by matching evaluation order (q = 0.9
    would NOT be safe: 0.9 is not dyadic and interpolation would round).

    Scale: two shuffles (histogram build keyed by (group, value), then
    the per-group domain window); the domain window is value-bounded
    (~1e6 distinct cents for TPC-H prices) regardless of row count — for
    unbounded domains, descend coarse->fine buckets with the same plan
    twice. The rank lookup table is groups x quantiles x 2 rows,
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = quantile_hist_counts(li)
    return quantiles_from_hist(hist)


def quantile_hist_counts(li: DataFrame) -> DataFrame:
    """(l_returnflag, cents, cnt) value-histogram — the mergeable
    sufficient statistic for exact quantiles over an integer domain
    (per-value counts sum across any partition of the input), shared by
    the batch operator and the streaming twin."""
    cents = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("c"),
    )
    return cents.groupBy("l_returnflag", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def quantiles_from_hist(hist: DataFrame) -> DataFrame:
    """The cumulative-rank quantile selection over a merged value
    histogram (see exact_quantiles_histogram's docstring for the
    exactness argument)."""
    from pyspark.sql.window import Window

    spark = hist.sparkSession
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "l_returnflag", "c", F.sum("cnt").over(w).alias("cum")
    )
    totals = hist.groupBy("l_returnflag").agg(F.sum("cnt").alias("n"))
    qs = spark.createDataFrame([(0.25,), (0.5,), (0.75,)], ["q"])
    # rank table: h = (n-1)*q (exact double for dyadic q), lower rank
    # k = floor(h)+1, interpolation weight g = h - floor(h)
    h = (F.col("n") - 1).cast("double") * F.col("q")
    ranks = totals.crossJoin(F.broadcast(qs)).select(
        "l_returnflag",
        "q",
        "n",
        (F.floor(h) + 1).cast("bigint").alias("k"),
        (h - F.floor(h)).alias("g"),
    )
    lo = (
        cum.join(F.broadcast(ranks), "l_returnflag")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("l_returnflag", "q", "n", "g")
        .agg(F.min("c").alias("v_lo"))
    )
    hi = (
        cum.join(F.broadcast(ranks), "l_returnflag")
        .filter(F.col("cum") >= F.col("k") + 1)
        .groupBy("l_returnflag", "q")
        .agg(F.min("c").alias("v_hi"))
    )
    return (
        lo.join(hi, ["l_returnflag", "q"], "left")
        .select(
            "l_returnflag",
            "q",
            "n",
            (
                F.col("v_lo").cast("double")
                + F.col("g")
                * (
                    F.coalesce(F.col("v_hi"), F.col("v_lo")).cast("double")
                    - F.col("v_lo").cast("double")
                )
            ).alias("value_cents"),
        )
    )


# sliding-window distinct via mergeable sketches (round 8, continued)
_HLL_WIN_HOURS = 24
_HLL_LGK = 12  # Datasketches lgConfigK; rsd ~ 1.04/sqrt(2^12) ~ 1.63%
_HLL_RSD = 1.04 / (1 << (_HLL_LGK // 2))  # = 1.04/64


@register_query(
    "hll_sliding_distinct_users",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id FROM events
    ),
    hours AS (SELECT DISTINCT hour FROM pairs),
    exp AS (
        SELECT h2.hour AS window_end, p.user_id
        FROM pairs p
        JOIN hours h2
          ON h2.hour >= p.hour
         AND h2.hour <= p.hour + INTERVAL {_HLL_WIN_HOURS - 1} HOUR
    )
    SELECT window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INTEGER) AS hll_in_bound
    FROM exp GROUP BY window_end
    """,
)
def hll_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24-hour distinct users from MERGEABLE hourly HLL sketches
    (Datasketches hll_sketch_agg / hll_union_agg): each hour is sketched
    once, and every sliding window is answered by unioning 24 tiny
    sketches — the only way a 100 TB dashboard serves overlapping-window
    cardinalities without re-scanning each window (exact distinct would
    read every event 24 times; the sketch path reads it once).

    ERROR-CONTRACT oracle (the approx_distinct_users discipline): per
    window, the same plan computes the exact distinct count from
    hour-deduped (hour, user) pairs and emits
    `hll_in_bound = |estimate - exact| <= max(2, 5*rsd*exact)` with
    rsd = 1.04/2^(lgK/2); DuckDB recomputes the exact side and asserts
    literal 1s — a hash match certifies every one of the ~720 windows'
    sketch unions honored the bound.

    Scale: the sketch side shuffles |hours| sketches of ~2^12 bytes, the
    window fan-out is a bounded explode (24 per hour, not per event), and
    the certification's exact side works on hour-deduped pairs (a tiny
    fraction of events) — in production you drop the exact side and keep
    the same sketch plan."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id"
    )
    sketches = hourly.groupBy("hour").agg(
        F.hll_sketch_agg("user_id", F.lit(_HLL_LGK)).alias("sk")
    )
    return hll_window_report(sketches, hourly.distinct())


def hll_window_report(sketches: DataFrame, pairs: DataFrame) -> DataFrame:
    """The sliding-window estimate + error-contract projection over
    (hour, sk) hourly sketches and hour-deduped (hour, user_id) pairs —
    shared by the batch operator and its streaming twin (whose inputs are
    read-side MERGES of per-epoch partials; HLL registers are per-bucket
    maxima, so merged partial sketches equal the one-shot sketch
    register-for-register and the estimate is bit-identical)."""
    hours = sketches.select("hour").distinct()
    win = (
        f"sequence(hour, hour + interval {_HLL_WIN_HOURS - 1} hours, "
        "interval 1 hour)"
    )
    est = (
        sketches.select(F.explode(F.expr(win)).alias("window_end"), "sk")
        .join(F.broadcast(hours.withColumnRenamed("hour", "window_end")), "window_end", "semi")
        .groupBy("window_end")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    )
    exact = (
        pairs.select(F.explode(F.expr(win)).alias("window_end"), "user_id")
        .join(F.broadcast(hours.withColumnRenamed("hour", "window_end")), "window_end", "semi")
        .groupBy("window_end")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    bound = F.greatest(F.lit(2.0), F.lit(5 * _HLL_RSD) * F.col("exact_users"))
    return est.join(exact, "window_end").select(
        "window_end",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= bound)
        .cast("integer")
        .alias("hll_in_bound"),
    )


@register_query(
    "funnel_attribution_windowed",
    oracle="""
    WITH staged AS (
        SELECT user_id, event_id, ts, event_type,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w
                   AS last_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    clicks AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'click'
                         AND last_view IS NOT NULL
                         AND ts <= last_view + INTERVAL 1 HOUR
                        THEN ts END) OVER w AS last_qclick
        FROM staged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                          AND last_qclick IS NOT NULL
                          AND ts <= last_qclick + INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                          AND last_qclick IS NOT NULL
                          AND ts <= last_qclick + INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS DOUBLE) AS attribution_rate
    FROM clicks
    GROUP BY user_id
    HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
    """,
)
def funnel_attribution_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution funnel with conversion windows — the
    Amplitude-style strict form the first-occurrence funnel
    (funnel_view_click_purchase) can't express: a purchase converts only
    if a QUALIFYING click (one within 1 hour of a preceding view) happened
    within the hour before it — the most recent such touchpoint carries
    the credit, and later non-qualifying clicks do not shadow it.
    Computed in two running-max
    window passes over each user's (ts, event_id)-ordered stream — the
    'carry the latest qualifying touchpoint' pattern — so no self-joins
    and no per-purchase subqueries; a 100 TB event log pays one user_id
    shuffle and two sorts of the SAME partitioning.

    Exactness: all predicates are timestamp comparisons at microsecond
    precision (identical on both engines); counts are integers and the
    attribution rate is one exact-int double division."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hour = F.expr("INTERVAL 1 HOUR")
    staged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
            "last_view"
        ),
    )
    clicks = staged.select(
        "*",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("last_view").isNotNull()
                & (F.col("ts") <= F.col("last_view") + hour),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("last_qclick"),
    )
    is_purchase = (F.col("event_type") == "purchase").cast("long")
    attributed = (
        (F.col("event_type") == "purchase")
        & F.col("last_qclick").isNotNull()
        & (F.col("ts") <= F.col("last_qclick") + hour)
    ).cast("long")
    return (
        clicks.groupBy("user_id")
        .agg(
            F.sum(is_purchase).cast("long").alias("n_purchases"),
            F.sum(attributed).cast("long").alias("n_attributed"),
            (
                F.sum(attributed).cast("double")
                / F.sum(is_purchase).cast("double")
            ).alias("attribution_rate"),
        )
        .filter(F.col("n_purchases") > 0)
    )


_MAD_K = 5  # flag |x - median| > K * MAD (median absolute deviation)


@register_query(
    "mad_outlier_events",
    oracle=f"""
    WITH cents AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    hist AS (
        SELECT user_id, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM cents GROUP BY user_id, cents
    ),
    med AS (
        SELECT user_id, cents AS med FROM (
            SELECT user_id, cents,
                   CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum,
                   CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
            FROM hist
        )
        WHERE cum >= (n + 1) // 2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents) = 1
    ),
    devs AS (
        SELECT c.user_id, c.event_id, c.ts, c.cents, m.med,
               abs(c.cents - m.med) AS dev
        FROM cents c JOIN med m ON c.user_id = m.user_id
    ),
    dev_hist AS (
        SELECT user_id, dev, CAST(COUNT(*) AS BIGINT) AS c
        FROM devs GROUP BY user_id, dev
    ),
    mad AS (
        SELECT user_id, dev AS mad FROM (
            SELECT user_id, dev,
                   CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY dev
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum,
                   CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
            FROM dev_hist
        )
        WHERE cum >= (n + 1) // 2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev) = 1
    ),
    flagged AS (
        SELECT d.user_id, d.event_id, d.ts, d.cents, d.med,
               greatest(a.mad, 1) AS mad, d.dev
        FROM devs d JOIN mad a ON d.user_id = a.user_id
    )
    SELECT user_id, event_id, ts, cents, med, mad, dev
    FROM flagged WHERE dev > {_MAD_K} * mad
    """,
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier detection: flag events whose spend deviates
    from the user's MEDIAN by more than 5x the user's MAD (median absolute
    deviation) — the breakdown-resistant complement to the EWMA forecast
    gate (which a burst of outliers can drag) and the CUSUM rule (which
    needs a target). Medians are EXACT, grouped, and sort-free: per-user
    value HISTOGRAMS (groupBy user x cents) with a running-count rank
    selection pick the lower median — the exact_quantiles_histogram
    technique made per-group.

    Exactness: everything is BIGINT cents end-to-end — both medians, the
    deviations, and the flag predicate; there is no floating-point
    operation in this query (MAD floors at 1 cent so a >50%-constant user
    still gets a sane gate).

    Scale: two histogram aggregations (each collapses map-side to
    user x distinct-cents, a fraction of events), two grid-sized median
    selections, and two user_id-keyed joins that reuse the same
    partitioning; nothing sorts events globally."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy("user_id", col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        w_run = Window.partitionBy("user_id").orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_user = Window.partitionBy("user_id")
        ranked = hist.select(
            "user_id",
            col,
            F.sum("c").over(w_run).cast("long").alias("cum"),
            F.sum("c").over(w_user).cast("long").alias("n"),
        ).filter(F.col("cum") >= F.expr("(n + 1) div 2"))  # integer rank:
        # `/ 2` would be double division and pick the UPPER median on even n
        w_pick = Window.partitionBy("user_id").orderBy(col)
        return (
            ranked.select("user_id", col, F.row_number().over(w_pick).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col(col).alias("picked"))
        )

    med = lower_median(ev, "cents").withColumnRenamed("picked", "med")
    devs = ev.join(med, "user_id").select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("dev"),
    )
    mad = lower_median(devs, "dev").withColumnRenamed("picked", "mad")
    return (
        devs.join(mad, "user_id")
        .select(
            "user_id",
            "event_id",
            "ts",
            "cents",
            "med",
            F.greatest(F.col("mad"), F.lit(1).cast("long")).alias("mad"),
            "dev",
        )
        .filter(F.col("dev") > _MAD_K * F.col("mad"))
    )


@register_query(
    "value_pareto_deciles",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_users,
               CAST(SUM(cents) OVER () AS BIGINT) AS total
        FROM per_user
    ),
    deciled AS (
        -- equal-width decile by rank: decile d covers ranks
        -- ((d-1)*n)/10 < rk <= (d*n)/10 (integer arithmetic)
        SELECT CAST((rk * 10 + n_users - 1) // n_users AS BIGINT) AS decile,
               cents, n_users, total
        FROM ranked
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) AS DOUBLE) / CAST(ANY_VALUE(total) AS DOUBLE)
               AS value_share
    FROM deciled
    GROUP BY decile
    """,
)
def value_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/Lorenz concentration curve: rank users by total spend
    (descending) and report each decile's share of corpus value — the
    'does 10% of the corpus carry 80% of the value' readout that drives
    sampling and quota decisions, and the curve view of the exact Gini
    key_skew_report computes. Decile assignment is pure integer arithmetic
    (d = ceil(rk*10/n)), sums are BIGINT cents, and the share is one
    exact-int double division.

    Scale: per-user totals partial-aggregate map-side; the global rank is
    the one honest sort (users, not events — at extreme user counts swap
    in the histogram rank-selection of winsorize_event_values for the
    same decile boundaries without a sort)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("long")
        .alias("cents")
    )
    w_rank = Window.orderBy(F.desc("cents"), F.asc("user_id"))
    w_all = Window.partitionBy()
    ranked = per_user.select(
        "cents",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_users"),
        F.sum("cents").over(w_all).cast("long").alias("total"),
    )
    deciled = ranked.select(
        F.expr("(rk * 10 + n_users - 1) div n_users").cast("long").alias("decile"),
        "cents",
        "total",
    )
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("cents"),
        (
            F.sum("cents").cast("double")
            / F.any_value(F.col("total")).cast("double")
        ).alias("value_share"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (round 9)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) scaled to 2^40, precomputed ONCE as integer literals (the
# dp_noisy_histogram constants discipline): both engines consume the same
# exact integers, so no runtime log10 (libm, not bit-portable) ever runs.
_BENFORD_P40 = {
    1: 330985980542,
    2: 193614386881,
    3: 137371593660,
    4: 106553686150,
    5: 87060700731,
    6: 73608773641,
    7: 63762820019,
    8: 56242793221,
    9: 50310892929,
}
_B40 = 1 << 40

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS BIGINT)" for d, p in _BENFORD_P40.items()
) + " END"


@register_query(
    "benford_digit_audit",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents WHERE c > 0
    ),
    counted AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_observed,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
        FROM digits GROUP BY digit
    )
    SELECT digit, n_observed,
           CAST(n_observed AS DOUBLE) / CAST(total AS DOUBLE) AS obs_share,
           CAST({_BENFORD_CASE_SQL} AS DOUBLE) / {_B40}.0 AS benford_share,
           CAST(total AS DOUBLE)
               * (CAST({_BENFORD_CASE_SQL} AS DOUBLE) / {_B40}.0)
               AS expected_n
    FROM counted
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over event amounts — the classic
    fabricated-data / unit-mixup detector a data-quality pipeline runs on
    any money-like column: organically-generated magnitudes follow
    P(d) = log10(1 + 1/d); uniform synthetic values (like this testdata's)
    or copy-pasted figures deviate loudly, and the per-digit
    observed-vs-expected table is the evidence. First digit comes from the
    cents integer's decimal string (exact on both engines — no float log);
    the Benford probabilities are 2^40-scaled integer literals precomputed
    once (the dp_noisy_histogram discipline), so no runtime log10 (libm,
    not bit-portable) appears anywhere and every double is one expression
    over exact integers.

    Scale: map-side digit extraction + a 9-key partial-aggregated groupBy;
    the total is a 9-row window."""
    ev = load_table(spark, sf_dir, "events")
    counted = benford_digit_counts(ev)
    return benford_report_from_counts(counted)


def benford_digit_counts(ev: DataFrame) -> DataFrame:
    """(digit, n_observed) counts of the first cents digit — the mergeable
    sufficient statistic (integer counts sum across any partition of the
    input), shared by the batch audit and the streaming twin."""
    cents = ev.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    ).filter(F.col("c") > 0)
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    )
    return digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_observed")
    )


def benford_report_from_counts(counted: DataFrame) -> DataFrame:
    """The observed-vs-Benford projection over merged digit counts."""
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    p40 = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in _BENFORD_P40.items() for x in (d, p)]
        ),
        F.col("digit").cast("int"),
    ).cast("long")
    return counted.select(
        "digit",
        "n_observed",
        (
            F.col("n_observed").cast("double")
            / F.sum("n_observed").over(w_all).cast("long").cast("double")
        ).alias("obs_share"),
        (p40.cast("double") / F.lit(float(_B40))).alias("benford_share"),
        # total (< 2^53 rows) and p40/2^40 (p40 < 2^40) are both EXACT
        # doubles, so the single multiply rounds identically on Spark and
        # DuckDB. The previous total*p40 BIGINT product overflowed (and
        # wrapped silently under non-ANSI Spark) past ~27.9M counted
        # events — far below target scale.
        (
            F.sum("n_observed").over(w_all).cast("long").cast("double")
            * (p40.cast("double") / F.lit(float(_B40)))
        ).alias("expected_n"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (round 11)
# ---------------------------------------------------------------------------


# Naive-spec oracle shared by the certified spec form and the histogram
# scale form (rfm_customer_segments_hist) — exact rank equality, so one
# oracle pins both.
_RFM_ORACLE = """
    WITH rfm AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              DATE '1999-01-01') AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT custkey, recency_days, frequency, monetary,
               CAST(6 - NTILE(5) OVER (ORDER BY recency_days, custkey)
                    AS BIGINT) AS r_score,
               CAST(NTILE(5) OVER (ORDER BY frequency, custkey)
                    AS BIGINT) AS f_score,
               CAST(NTILE(5) OVER (ORDER BY monetary, custkey)
                    AS BIGINT) AS m_score
        FROM rfm
    )
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                     THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN m_score >= 4 THEN 'big_spender'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                WHEN r_score <= 2 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """


def _rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, recency_days, frequency, monetary): the per-customer RFM
    table shared by the spec and histogram forms."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1999-01-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(14,4)"))
        .cast("double")
        .alias("monetary"),
    )


def _rfm_segment_expr():
    """The playbook segment CASE over (r_score, f_score, m_score)."""
    return (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when(F.col("f_score") >= 4, F.lit("loyal"))
        .when(F.col("m_score") >= 4, F.lit("big_spender"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), F.lit("hibernating"))
        .when(F.col("r_score") <= 2, F.lit("at_risk"))
        .otherwise(F.lit("regular"))
    )


@register_query("rfm_customer_segments", oracle=_RFM_ORACLE)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic retention-marketing model: score each customer 1-5 on how
    recently they ordered, how often, and how much, then label the
    (r, f, m) cell with its playbook segment (champion / loyal /
    big_spender / at_risk / hibernating / regular). The reference engine
    leaves all modeling to user code; this is the canonical batch
    scoring job such a user would run nightly.

    Determinism: recency anchors to the fixed calendar date 1999-01-01
    (just past the TPC-H order horizon) rather than a data-dependent max
    — no global-scalar broadcast, and re-runs on a growing corpus keep
    monotone semantics. Monetary sums through DECIMAL(14,4) (the exact-
    sum discipline) with ONE final double cast; NTILE ties break on
    custkey, so both engines bucket identically.

    Scale: one partial-aggregated groupBy on custkey, then three global
    NTILE windows over CUSTOMERS (post-aggregate cardinality) — the
    certified SPEC form; rfm_customer_segments_hist is the executable
    scale form (identical ranks from per-dimension histogram prefix
    scans, no global row sort; r12 verdict ticket #4)."""
    from pyspark.sql.window import Window

    rfm = _rfm_base(spark, sf_dir)
    r_sc = (
        6 - F.ntile(5).over(Window.orderBy("recency_days", "custkey"))
    ).cast("long")
    f_sc = F.ntile(5).over(Window.orderBy("frequency", "custkey")).cast("long")
    m_sc = F.ntile(5).over(Window.orderBy("monetary", "custkey")).cast("long")
    scored = rfm.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        r_sc.alias("r_score"),
        f_sc.alias("f_score"),
        m_sc.alias("m_score"),
    )
    return scored.select("*", _rfm_segment_expr().alias("segment"))


@register_query("rfm_customer_segments_hist", oracle=_RFM_ORACLE)
def rfm_customer_segments_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTABLE scale form of rfm_customer_segments (r12 verdict
    ticket #4): identical output against the SAME naive-spec oracle,
    with all three global NTILE sorts replaced by histogram prefix
    ranks — each dimension's rank comes from its value histogram's
    cumulative window (|distinct values| rows) plus a PARTITIONED
    row_number within the tie group (functions/ranks.py), and the NTILE
    bucket is the closed-form split of that rank. Rank equality is
    exact (same tiebreak key), so both engines' buckets — and the
    oracle hash — are unchanged. No customer row ever crosses a global
    sort; the widest shuffles carry (value, count) histograms."""
    from kasper_spark.functions.ranks import hist_prefix_rank, ntile_from_rank

    df = _rfm_base(spark, sf_dir)
    df = hist_prefix_rank(df, "recency_days", "custkey", "_ir", n_name="_n")
    df = hist_prefix_rank(df, "frequency", "custkey", "_if")
    df = hist_prefix_rank(df, "monetary", "custkey", "_im")
    n = F.col("_n")
    scored = df.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(6).cast("long") - ntile_from_rank(F.col("_ir"), n, 5)).alias(
            "r_score"
        ),
        ntile_from_rank(F.col("_if"), n, 5).alias("f_score"),
        ntile_from_rank(F.col("_im"), n, 5).alias("m_score"),
    )
    return scored.select("*", _rfm_segment_expr().alias("segment"))


# ---------------------------------------------------------------------------
# Market-basket association rules (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "market_basket_lift",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        FROM lineitem
    ),
    n_b AS (
        SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
        FROM baskets
    ),
    item_n AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS item_baskets
        FROM baskets GROUP BY item
        HAVING COUNT(*) >= 5
    ),
    kept AS (
        SELECT b.basket, b.item
        FROM baskets b JOIN item_n i ON b.item = i.item
    ),
    sized AS (
        SELECT basket FROM kept GROUP BY basket
        HAVING COUNT(*) BETWEEN 2 AND 12
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS pair_baskets
        FROM kept a
        JOIN sized s ON a.basket = s.basket
        JOIN kept b ON a.basket = b.basket AND a.item < b.item
        GROUP BY a.item, b.item
        HAVING COUNT(*) >= 2
    )
    SELECT p.item_a, p.item_b, p.pair_baskets,
           ia.item_baskets AS baskets_a,
           ib.item_baskets AS baskets_b,
           CAST(p.pair_baskets AS DOUBLE) / CAST(n.n_baskets AS DOUBLE)
               AS support,
           CAST(p.pair_baskets AS DOUBLE) / CAST(ia.item_baskets AS DOUBLE)
               AS confidence_a_b,
           (CAST(p.pair_baskets AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
             / (CAST(ia.item_baskets AS DOUBLE)
                * CAST(ib.item_baskets AS DOUBLE)) AS lift
    FROM pairs p
    JOIN item_n ia ON p.item_a = ia.item
    JOIN item_n ib ON p.item_b = ib.item
    CROSS JOIN n_b n
    ORDER BY lift DESC, item_a, item_b
    LIMIT 100
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift) over
    order baskets — the classic a-priori co-purchase analysis (Agrawal &
    Srikant, VLDB'94) every retail / recommendation pipeline runs, and a
    workload family the reference leaves entirely to user code. A basket
    is an order's distinct part set; a rule (a -> b) scores
    support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)P(b)); the
    report is the top-100 pairs by lift.

    Scale (the a-priori discipline — this is what keeps 100 TB feasible):
    (1) items below min_item_support=5 baskets are pruned BEFORE any pair
    is formed (downward closure: an infrequent item cannot be in a
    frequent pair); (2) baskets larger than 12 surviving items are dropped
    (a B-item basket emits C(B,2) pairs — the cap bounds per-basket work;
    capped-basket exclusion is the standard Spark FPGrowth practice);
    (3) the pair build is a SELF-JOIN ON THE BASKET KEY — co-partitioned
    by orderkey, so pair generation is shuffle-local and never all-pairs
    across items. Pair counts are partial-aggregated; the min pair
    support of 2 prunes the singleton tail before the dimension joins.
    item_n is part-cardinality (dimension-sized) -> broadcast; n_baskets
    is a 1-row broadcast (the TPC-H Q22 scalar shape).

    Determinism: all counts are exact BIGINTs < 2**53, so each cast to
    double is exact and the single multiply/divide per metric rounds
    identically on both engines; ordering ties break on (item_a, item_b).
    Overflow: pair_baskets * n_baskets as BIGINT would overflow past
    ~3e9 baskets, so both factors cast to double FIRST (the Benford
    expected_n discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    # one materialization of the distinct basket set: FIVE subtrees read
    # it (n_b, item_n, the kept join, and both self-join sides) — without
    # the cut each re-ran the scan+distinct (round-15 audit)
    baskets = cut_lineage(
        li.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ).distinct()
    )
    n_b = baskets.agg(
        F.count_distinct(F.col("basket")).cast("long").alias("n_baskets")
    )
    item_n = (
        baskets.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("item_baskets"))
        .filter(F.col("item_baskets") >= 5)
    )
    kept = baskets.join(F.broadcast(item_n.select("item")), "item").select(
        "basket", "item"
    )
    # Round-16 opt (§2.4): ONE basket shuffle instead of three. The old
    # form shuffled kept twice (both self-join sides) plus a third
    # exchange for the basket-size gate; collecting each basket's
    # (unique, frequent) items once and emitting the C(B,2) pairs with
    # the same array-transform the LSH bucket pairer uses is
    # value-identical — baskets is distinct so the array has unique
    # items, array_sort makes collect_list order-free, and the sliced
    # 13-item prefix decides size<=12 exactly while bounding the emitted
    # array (per-group state is one basket's items, bounded by the
    # order's line count). The oracle recomputes the pairs from scratch
    # (a genuinely independent join-form reference), so the hash row
    # certifies this rewrite end-to-end.
    items_c = F.slice(F.array_sort(F.collect_list("item")), 1, 12 + 1)
    pairs = (
        kept.groupBy("basket")
        .agg(items_c.alias("items"))
        .filter((F.size("items") >= 2) & (F.size("items") <= 12))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("items"),
                        lambda m: F.transform(
                            F.filter(F.col("items"), lambda x: x > m),
                            lambda x: F.struct(
                                m.alias("item_a"), x.alias("item_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= 2)
    )
    ia = item_n.select(
        F.col("item").alias("item_a"), F.col("item_baskets").alias("baskets_a")
    )
    ib = item_n.select(
        F.col("item").alias("item_b"), F.col("item_baskets").alias("baskets_b")
    )
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_b))
        .select(
            "item_a",
            "item_b",
            "pair_baskets",
            "baskets_a",
            "baskets_b",
            (
                F.col("pair_baskets").cast("double")
                / F.col("n_baskets").cast("double")
            ).alias("support"),
            (
                F.col("pair_baskets").cast("double")
                / F.col("baskets_a").cast("double")
            ).alias("confidence_a_b"),
            (
                (
                    F.col("pair_baskets").cast("double")
                    * F.col("n_baskets").cast("double")
                )
                / (
                    F.col("baskets_a").cast("double")
                    * F.col("baskets_b").cast("double")
                )
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Market-basket level-3: frequent triples via a-priori (round 12)
# ---------------------------------------------------------------------------

_MB_MIN_ITEM = 5  # an item must appear in >= 5 baskets (L1 gate)
_MB_MIN_PAIR = 2  # a pair must appear in >= 2 baskets (L2 gate)
_MB_MIN_TRIPLE = 2  # a triple must appear in >= 2 baskets (L3 gate)
_MB_MAX_BASKET = 12  # C(B,3) bound: basket cap before candidate formation


@register_query(
    "market_basket_triples",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        FROM lineitem
    ),
    n_b AS (
        SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
        FROM baskets
    ),
    item_n AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS item_baskets
        FROM baskets GROUP BY item
        HAVING COUNT(*) >= {_MB_MIN_ITEM}
    ),
    kept AS (
        SELECT b.basket, b.item
        FROM baskets b JOIN item_n i ON b.item = i.item
    ),
    sized AS (
        SELECT basket FROM kept GROUP BY basket
        HAVING COUNT(*) BETWEEN 3 AND {_MB_MAX_BASKET}
    ),
    l2 AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS pair_baskets
        FROM kept a
        JOIN sized s ON a.basket = s.basket
        JOIN kept b ON a.basket = b.basket AND a.item < b.item
        GROUP BY a.item, b.item
        HAVING COUNT(*) >= {_MB_MIN_PAIR}
    ),
    -- candidate triples: extend each IN-BASKET frequent pair by a third
    -- item, then downward-closure-prune on the OTHER two sub-pairs
    -- before counting
    t3 AS (
        SELECT p.item_a, p.item_b, c.item AS item_c,
               CAST(COUNT(*) AS BIGINT) AS triple_baskets
        FROM kept p0a
        JOIN sized s ON p0a.basket = s.basket
        JOIN kept p0b ON p0a.basket = p0b.basket AND p0a.item < p0b.item
        JOIN l2 p ON p.item_a = p0a.item AND p.item_b = p0b.item
        JOIN kept c ON c.basket = p0a.basket AND c.item > p0b.item
        JOIN l2 pac ON pac.item_a = p0a.item AND pac.item_b = c.item
        JOIN l2 pbc ON pbc.item_a = p0b.item AND pbc.item_b = c.item
        GROUP BY p.item_a, p.item_b, c.item
        HAVING COUNT(*) >= {_MB_MIN_TRIPLE}
    )
    SELECT t.item_a, t.item_b, t.item_c, t.triple_baskets,
           p.pair_baskets AS baskets_ab,
           ic.item_baskets AS baskets_c,
           CAST(t.triple_baskets AS DOUBLE) / CAST(n.n_baskets AS DOUBLE)
               AS support,
           CAST(t.triple_baskets AS DOUBLE) / CAST(p.pair_baskets AS DOUBLE)
               AS confidence_ab_c,
           (CAST(t.triple_baskets AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
             / (CAST(p.pair_baskets AS DOUBLE)
                * CAST(ic.item_baskets AS DOUBLE)) AS lift_ab_c
    FROM t3 t
    JOIN l2 p ON p.item_a = t.item_a AND p.item_b = t.item_b
    JOIN item_n ic ON ic.item = t.item_c
    CROSS JOIN n_b n
    ORDER BY lift_ab_c DESC, t.item_a, t.item_b, t.item_c
    LIMIT 100
    """,
)
def market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent TRIPLES with (ab -> c) confidence and lift — the first
    k>2 a-priori level (r11 verdict ticket #5), i.e. the shape FPGrowth
    users actually hit once pairwise rules saturate. A rule (a,b -> c)
    scores confidence = P(c|a,b) and lift = P(abc)/(P(ab) P(c)); report
    is the top-100 by lift.

    Scale — the a-priori ladder, each rung pruned before the next forms:
    (1) L1: items in >= 5 baskets (an infrequent item can be in no
    frequent pair OR triple — downward closure); (2) basket cap 12
    bounds per-basket candidate work at C(12,3) = 220 triples; (3) L2:
    the same basket-key self-join as market_basket_lift, counts
    partial-aggregated, min support 2; (4) candidate triples extend only
    IN-BASKET L2 pairs (the (a,b) edge must be frequent) by a third
    in-basket item c > b, and the OTHER two sub-pairs (a,c), (b,c) are
    closure-checked against L2 BEFORE the count shuffle — so no triple
    whose any sub-pair is infrequent is ever counted, the textbook
    candidate-generation + pruning step. All joins that grow with data
    are co-partitioned on the basket key; L2 and L1 are
    result-of-pruning-sized and join broadcast. At 100 TB the supports
    go corpus-relative (functions/thresholds.py) — absolute floors are
    the certified spec form at driver scales.

    Determinism: exact BIGINT counts < 2**53 cast to double once per
    metric (the market_basket_lift discipline); ties break on the full
    item triple."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n_b = baskets.agg(
        F.count_distinct(F.col("basket")).cast("long").alias("n_baskets")
    )
    item_n = (
        baskets.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("item_baskets"))
        .filter(F.col("item_baskets") >= _MB_MIN_ITEM)
    )
    kept = baskets.join(F.broadcast(item_n.select("item")), "item").select(
        "basket", "item"
    )
    sized = (
        kept.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter((F.col("sz") >= 3) & (F.col("sz") <= _MB_MAX_BASKET))
        .select("basket")
    )
    in_basket_pairs = (
        kept.alias("a")
        .join(sized, "basket")
        .join(kept.alias("b"), "basket")
        .filter(F.col("a.item") < F.col("b.item"))
        .select(
            "basket",
            F.col("a.item").alias("item_a"),
            F.col("b.item").alias("item_b"),
        )
    )
    l2 = cut_lineage(
        in_basket_pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= _MB_MIN_PAIR)
    )
    l2_keys = l2.select("item_a", "item_b")
    # candidate generation: in-basket frequent (a,b) x third item c > b,
    # closure-pruned on (a,c) and (b,c) via broadcast semi-joins of the
    # pruning-result-sized L2 key set — all BEFORE the count shuffle
    cand = (
        in_basket_pairs.join(F.broadcast(l2_keys), ["item_a", "item_b"])
        .join(kept.alias("c"), "basket")
        .filter(F.col("c.item") > F.col("item_b"))
        .select("basket", "item_a", "item_b", F.col("c.item").alias("item_c"))
        .join(
            F.broadcast(
                l2_keys.select(
                    F.col("item_a"), F.col("item_b").alias("item_c")
                )
            ),
            ["item_a", "item_c"],
            "leftsemi",
        )
        .join(
            F.broadcast(
                l2_keys.select(
                    F.col("item_a").alias("item_b"),
                    F.col("item_b").alias("item_c"),
                )
            ),
            ["item_b", "item_c"],
            "leftsemi",
        )
    )
    t3 = (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("long").alias("triple_baskets"))
        .filter(F.col("triple_baskets") >= _MB_MIN_TRIPLE)
    )
    pab = l2.select(
        "item_a", "item_b", F.col("pair_baskets").alias("baskets_ab")
    )
    ic = item_n.select(
        F.col("item").alias("item_c"), F.col("item_baskets").alias("baskets_c")
    )
    return (
        t3.join(F.broadcast(pab), ["item_a", "item_b"])
        .join(F.broadcast(ic), "item_c")
        .crossJoin(F.broadcast(n_b))
        .select(
            "item_a",
            "item_b",
            "item_c",
            "triple_baskets",
            "baskets_ab",
            "baskets_c",
            (
                F.col("triple_baskets").cast("double")
                / F.col("n_baskets").cast("double")
            ).alias("support"),
            (
                F.col("triple_baskets").cast("double")
                / F.col("baskets_ab").cast("double")
            ).alias("confidence_ab_c"),
            (
                (
                    F.col("triple_baskets").cast("double")
                    * F.col("n_baskets").cast("double")
                )
                / (
                    F.col("baskets_ab").cast("double")
                    * F.col("baskets_c").cast("double")
                )
            ).alias("lift_ab_c"),
        )
        .orderBy(F.desc("lift_ab_c"), "item_a", "item_b", "item_c")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Functional-dependency violation audit (round 11)
# ---------------------------------------------------------------------------

# (fd_name, table, lhs, rhs) — the declared dependency candidates a
# schema-inference / data-contract audit would check.
_FD_PAIRS = (
    ("lineitem.orderkey->returnflag", "lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem.partkey->suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("orders.custkey->orderstatus", "orders", "o_custkey", "o_orderstatus"),
    ("documents.doc_id->lang", "documents", "doc_id", "lang"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
)


@register_query(
    "fd_violation_audit",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{name}' AS fd_name,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_keys,
           CAST(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS violation_share,
           CAST(MAX(v) AS BIGINT) AS max_rhs_variants
    FROM (SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS v
          FROM {table} GROUP BY {lhs})
    """
        for name, table, lhs, rhs in _FD_PAIRS
    )
    + " ORDER BY fd_name",
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency violation audit — the data-contract check
    behind schema inference and key discovery (the TANE/Metanome problem
    restricted to DECLARED candidates, which is how production contract
    tools like Deequ run it): for each declared lhs -> rhs dependency,
    how many lhs keys map to more than one rhs value, and how badly.
    documents.doc_id -> lang must hold (doc_id is the key — 0 violating
    keys is the regression signal); the behavioral pairs are expected to
    violate and their share is the drift metric.

    Scale: each pair is one partial-aggregated (lhs, distinct rhs)
    groupBy + a 1-row final agg — the audit reads each table once per
    declared pair and ships only per-key variant counts; a full TANE
    lattice search would be exponential in columns, which is exactly why
    the contract declares its candidates up front.

    Determinism: counts exact; one terminal divide."""
    out = None
    for name, table, lhs, rhs in _FD_PAIRS:
        t = load_table(spark, sf_dir, table)
        per_key = t.groupBy(lhs).agg(
            F.count_distinct(F.col(rhs)).cast("long").alias("v")
        )
        rep = per_key.agg(
            F.lit(name).alias("fd_name"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("v") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_keys"),
            (
                F.sum(F.when(F.col("v") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("violation_share"),
            F.max("v").cast("long").alias("max_rhs_variants"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out.orderBy("fd_name")


# ---------------------------------------------------------------------------
# Single-pass correlation matrix (round 11)
# ---------------------------------------------------------------------------

# (column, integer scale): quantity/price in hundredths, rates in
# ten-thousandths — correlation is scale-invariant, so each column keeps
# its natural exact-integer grid.
_CORRM_COLS = (
    ("l_quantity", 100),
    ("l_extendedprice", 100),
    ("l_discount", 10000),
    ("l_tax", 10000),
)
_CORRM_N = len(_CORRM_COLS)


@register_query(
    "correlation_matrix_lineitem",
    oracle=f"""
    WITH cents AS (
        SELECT {", ".join(
            f"CAST(floor({c} * {s} + 0.5) AS BIGINT) AS c{i}"
            for i, (c, s) in enumerate(_CORRM_COLS)
        )}
        FROM lineitem
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {", ".join(
                   f"CAST(SUM(c{i}) AS BIGINT) AS s{i}"
                   for i in range(_CORRM_N)
               )},
               {", ".join(
                   f"CAST(SUM(CAST(c{i} AS DECIMAL(18,0))"
                   f" * CAST(c{j} AS DECIMAL(18,0))) AS DOUBLE) AS p{i}_{j}"
                   for i in range(_CORRM_N)
                   for j in range(i, _CORRM_N)
               )}
        FROM cents
    )
    {" UNION ALL ".join(
        f'''SELECT '{_CORRM_COLS[i][0]}' AS col_a,
               '{_CORRM_COLS[j][0]}' AS col_b,
               n,
               (CAST(n AS DOUBLE) * p{i}_{j}
                - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * p{i}_{i}
                       - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * p{j}_{j}
                         - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)))
                   AS pearson_r
        FROM stats'''
        for i in range(_CORRM_N)
        for j in range(i + 1, _CORRM_N)
    )}
    ORDER BY col_a, col_b
    """,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over lineitem's numeric
    measures in ONE aggregation pass — the profiling step feature
    engineering runs before any modeling (corr_covar_qty_discount does
    one pair; this does all C(4,2) from a single scan's sufficient
    statistics: n, 4 sums, 10 cross/self product sums). "One pass vs one
    query per pair" is the dq_constraint_report argument at 100 TB.

    Determinism + overflow: each value sits on its natural exact integer
    grid (hundredths / ten-thousandths); plain sums are exact BIGINTs;
    PRODUCT sums go through DECIMAL(18,0) x DECIMAL(18,0) (exact 128-bit
    accumulation on both engines — a BIGINT product sum overflows at
    ~1e18, which price-squared hits within a few thousand rows), emitted
    as ONE deterministic double each; every correlation is a single
    fixed double expression over those (cast-to-double before the n*p
    products — the Benford discipline).

    Scale: one partial-aggregated scan -> a 1-row stats table -> a
    6-row projection."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        *[
            F.floor(F.col(c) * s + 0.5).cast("long").alias(f"c{i}")
            for i, (c, s) in enumerate(_CORRM_COLS)
        ]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [
        F.sum(F.col(f"c{i}")).cast("long").alias(f"s{i}")
        for i in range(_CORRM_N)
    ]
    aggs += [
        F.sum(
            F.col(f"c{i}").cast("decimal(18,0)")
            * F.col(f"c{j}").cast("decimal(18,0)")
        )
        .cast("double")
        .alias(f"p{i}_{j}")
        for i in range(_CORRM_N)
        for j in range(i, _CORRM_N)
    ]
    stats = cents.agg(*aggs)
    rows = []
    for i in range(_CORRM_N):
        for j in range(i + 1, _CORRM_N):
            num = F.col("n").cast("double") * F.col(f"p{i}_{j}") - F.col(
                f"s{i}"
            ).cast("double") * F.col(f"s{j}").cast("double")
            var_i = F.col("n").cast("double") * F.col(f"p{i}_{i}") - F.col(
                f"s{i}"
            ).cast("double") * F.col(f"s{i}").cast("double")
            var_j = F.col("n").cast("double") * F.col(f"p{j}_{j}") - F.col(
                f"s{j}"
            ).cast("double") * F.col(f"s{j}").cast("double")
            rows.append(
                stats.select(
                    F.lit(_CORRM_COLS[i][0]).alias("col_a"),
                    F.lit(_CORRM_COLS[j][0]).alias("col_b"),
                    "n",
                    (num / (F.sqrt(var_i) * F.sqrt(var_j))).alias("pearson_r"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# Revenue concentration: Lorenz/Gini + top-share (round 12)
# ---------------------------------------------------------------------------


# The naive-spec oracle shared by the certified spec form and the
# histogram scale form (their outputs are exactly equal — see
# revenue_concentration_gini_hist for the permutation-invariance proof).
_GINI_ORACLE = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(10,4)))
                    AS DECIMAL(38,4)) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
               COUNT(*) OVER () AS n
        FROM per_cust
    ),
    sums AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(rev) AS DECIMAL(38,4)) AS total,
               CAST(SUM(CAST(i AS DECIMAL(18,0)) * rev)
                    AS DECIMAL(38,4)) AS weighted,
               CAST(SUM(CASE WHEN i > n - GREATEST(1, n // 10)
                             THEN rev ELSE CAST(0 AS DECIMAL(38,4)) END)
                    AS DECIMAL(38,4)) AS top_decile_rev
        FROM ranked
    )
    SELECT n AS n_customers,
           CAST(total AS DOUBLE) AS total_revenue,
           (2.0 * CAST(weighted AS DOUBLE)
            - (CAST(n AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini,
           CAST(top_decile_rev AS DOUBLE) / CAST(total AS DOUBLE)
               AS top_decile_share
    FROM sums
    """


@register_query("revenue_concentration_gini", oracle=_GINI_ORACLE)
def revenue_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration — the Gini coefficient over per-customer
    revenue plus the top-decile share (the "what fraction of revenue do
    the top 10% of customers carry" Pareto readout every commercial
    analytics deck opens with). Gini uses the rank-weighted closed form
    G = (2 * sum(i * x_i) - (n+1) * sum(x_i)) / (n * sum(x_i)) over
    ascending-ranked revenues: both sums are EXACT DECIMALS (rank is an
    integer, revenue a decimal — products and sums stay in decimal), so
    the only doubles are the final fixed expression (cast-first, the
    Benford discipline). Rank ties break on custkey; equal revenues make
    the tie order irrelevant to the weighted sum's VALUE... not in
    general — but each (i, rev) permutation among equal revs yields the
    same multiset of products, so the SUM is permutation-invariant.

    Scale: one per-customer partial agg; the global revenue rank makes
    this the certified SPEC form — revenue_concentration_gini_hist is
    the executable scale form (identical output from the value-histogram
    prefix scan, no global row sort; r12 verdict ticket #4)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        dsum_dec(money("o_totalprice")).cast("decimal(38,4)").alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    top_cut = F.col("n") - F.greatest(
        F.lit(1).cast("long"), F.floor(F.col("n") / 10).cast("long")
    )
    sums = ranked.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("rev").cast("decimal(38,4)").alias("total"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("rev"))
        .cast("decimal(38,4)")
        .alias("weighted"),
        F.sum(
            F.when(
                F.col("i") > top_cut,
                F.col("rev"),
            ).otherwise(F.lit(0).cast("decimal(38,4)"))
        )
        .cast("decimal(38,4)")
        .alias("top_decile_rev"),
    )
    nd = F.col("n").cast("double")
    total_d = F.col("total").cast("double")
    return sums.select(
        F.col("n").alias("n_customers"),
        total_d.alias("total_revenue"),
        (
            (F.lit(2.0) * F.col("weighted").cast("double") - (nd + F.lit(1.0)) * total_d)
            / (nd * total_d)
        ).alias("gini"),
        (F.col("top_decile_rev").cast("double") / total_d).alias(
            "top_decile_share"
        ),
    )


@register_query("revenue_concentration_gini_hist", oracle=_GINI_ORACLE)
def revenue_concentration_gini_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTABLE scale form of revenue_concentration_gini (r12
    verdict ticket #4): identical output, certified against the SAME
    naive-spec oracle, with the global row rank eliminated entirely.

    Why no rank is needed: the spec's rank-weighted sum is permutation-
    invariant among equal revenues, so for a revenue value v with count c
    and b customers strictly below, its copies occupy ranks b+1..b+c and
    contribute v * (c*b + c*(c+1)/2) — a CLOSED FORM per histogram
    bucket. Likewise the top-decile mass of v is v * clamp(b+c-t, 0, c)
    for cut rank t. So the whole statistic folds over the (rev -> count)
    histogram: one partial-aggregated groupBy per customer, one groupBy
    per distinct revenue, one cumulative window over the DOMAIN-sized
    histogram (the prefix scan), one aggregate. No row ever crosses a
    global sort; every product stays in the spec's exact decimal types
    (rank sums <= n^2/2 fit DECIMAL(18,0) to n ~ 10^9), so the sums are
    equal exactly, not approximately — the oracle hash is shared."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        dsum_dec(money("o_totalprice")).cast("decimal(38,4)").alias("rev")
    )
    hist = per_cust.groupBy("rev").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_before = Window.orderBy("rev").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    cum = hist.select(
        "rev",
        "c",
        F.coalesce(F.sum("c").over(w_before), F.lit(0)).cast("long").alias("b"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    # ranks b+1..b+c: sum = c*b + c*(c+1)/2 (c*(c+1) is even -> exact).
    # `div` keeps the halving in int64: Spark's `/` on longs is DOUBLE
    # division, which loses exactness once c*(c+1) > 2^53 (ADVICE r13).
    rank_sum = (
        F.col("c") * F.col("b") + F.expr("(c * (c + 1)) div 2")
    ).cast("decimal(18,0)")
    top_cut = F.col("n") - F.greatest(
        F.lit(1).cast("long"), F.floor(F.col("n") / 10).cast("long")
    )
    n_above = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("c"), F.col("b") + F.col("c") - top_cut),
    ).cast("decimal(18,0)")
    sums = cum.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("rev") * F.col("c").cast("decimal(18,0)"))
        .cast("decimal(38,4)")
        .alias("total"),
        F.sum(F.col("rev") * rank_sum).cast("decimal(38,4)").alias("weighted"),
        F.sum(F.col("rev") * n_above).cast("decimal(38,4)").alias("top_decile_rev"),
    )
    nd = F.col("n").cast("double")
    total_d = F.col("total").cast("double")
    return sums.select(
        F.col("n").alias("n_customers"),
        total_d.alias("total_revenue"),
        (
            (F.lit(2.0) * F.col("weighted").cast("double") - (nd + F.lit(1.0)) * total_d)
            / (nd * total_d)
        ).alias("gini"),
        (F.col("top_decile_rev").cast("double") / total_d).alias(
            "top_decile_share"
        ),
    )
