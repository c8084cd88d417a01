"""Histogram prefix-rank: global row ranks without a global row sort.

The spec form of a rank query (`ROW_NUMBER() OVER (ORDER BY value, key)`)
funnels every row through ONE sort partition — correct, certified, and
wrong at 100 TB. This helper computes the IDENTICAL rank from the value
HISTOGRAM (the winsorize_event_values precedent, r12 verdict ticket #4):

1. group rows by value -> (value, count) — a partial-aggregated shuffle
   whose output is |distinct values| rows, not |rows|;
2. one cumulative window over that histogram (ordered by value) yields
   b(v) = #rows with value < v — the sort now touches only the
   domain-sized histogram;
3. rank(row) = b(value) + row_number() within the row's value group
   (a PARTITIONED window, bounded by the largest tie group).

Equality with the spec is exact, not approximate: every row's rank is
the same integer the global window would assign (ties break on the same
key), so consumers certified against a naive-spec oracle stay
hash-green. Consumers that only need rank-AGGREGATES (Gini's weighted
sum) can skip step 3 entirely and fold the closed-form rank sums per
histogram bucket — see revenue_concentration_gini_hist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hist_prefix_rank(
    df: DataFrame,
    value_col: str,
    key_col: str,
    rank_name: str,
    n_name: str | None = None,
) -> DataFrame:
    """Append the global (value ASC, key ASC) row rank as ``rank_name``
    (and, when ``n_name`` is given, the total row count) — computed via
    the histogram prefix scan, never a global row sort.

    NULL-correct (ADVICE r13): the rows-to-histogram join is null-SAFE,
    and the histogram prefix window orders ASC with Spark's default
    nulls-first — so NULL-valued rows rank first, exactly as the spec
    window ``ROW_NUMBER() OVER (ORDER BY value, key)`` would assign."""
    hist = (
        df.groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("_hc"))
        .withColumnRenamed(value_col, "_hv")
    )
    w_before = Window.orderBy(F.col("_hv").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    pre_cols = [
        F.col("_hv"),
        F.coalesce(F.sum("_hc").over(w_before), F.lit(0)).cast("long").alias("_hb"),
    ]
    if n_name is not None:
        pre_cols.append(F.sum("_hc").over(w_all).cast("long").alias(n_name))
    pre = hist.select(*pre_cols)
    w_in = Window.partitionBy(value_col).orderBy(key_col)
    out = df.join(pre, F.col(value_col).eqNullSafe(F.col("_hv"))).withColumn(
        rank_name,
        (F.col("_hb") + F.row_number().over(w_in).cast("long")).cast("long"),
    )
    return out.drop("_hb", "_hv")


def ntile_from_rank(i: Column, n: Column, k: int) -> Column:
    """The SQL-standard NTILE(k) bucket from a 1-based rank ``i`` over
    ``n`` rows, as a closed form (first n % k buckets hold n // k + 1
    rows): identical to the window NTILE on both engines, but computable
    map-side once the rank is known. Integer-exact for n < 2^53."""
    kc = F.lit(k).cast("long")
    q = F.floor(n / kc).cast("long")
    r = (n % kc).cast("long")
    cut = r * (q + F.lit(1))
    return (
        F.when(i <= cut, F.floor((i - F.lit(1)) / (q + F.lit(1))).cast("long") + 1)
        .otherwise(r + F.floor((i - cut - F.lit(1)) / q).cast("long") + 1)
        .cast("long")
    )
