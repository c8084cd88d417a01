"""Corpus-relative thresholds (round 12, r11 verdict ticket #3).

An absolute document-frequency gate ("df <= 5 is rare", "df >= 3 is
boilerplate") silently changes meaning as the corpus grows: at 10x data a
df<=5 band holds a ~10x SMALLER fraction of the vocabulary, so the
operator's selectivity — and its measured scaling ratio — drifts with N
instead of staying a property of the algorithm. The fix used across the
engine is the C4-style corpus-RELATIVE form::

    thr = GREATEST(floor_, N // div)

i.e. "a fraction of the corpus, never below the small-corpus floor". The
floor keeps driver-scale outputs identical to the historical absolute
gates (hash stability at sf0.001/sf0.01 where N // div <= floor_), while
the fraction term takes over exactly when absolute gates stop meaning
anything.

Both engines must compute thr from COUNT(*) itself so ONE oracle text is
correct at every corpus size — the scaled-K IVF discipline. Spark side:
a 1-row broadcast (the threshold joins every plan as a broadcast nested
loop of one row, never a driver round-trip); DuckDB side: a scalar
subquery.

Adopters: sparse_tfidf_cosine_pairs (rare-band ceiling, dedup.py),
boilerplate_shingle_stats_cms (boilerplate floor, text.py — predates this
helper, now routed through it), and the PPJoin df-ordering
(prefix_filter_jaccard_pairs) whose order statistic is already
corpus-derived by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def corpus_relative_thr(counted: DataFrame, floor_: int, div: int) -> DataFrame:
    """1-row DataFrame ``(thr bigint)``: GREATEST(floor_, COUNT(*) // div)
    over ``counted``. Broadcast-join it into the consuming plan::

        df.crossJoin(F.broadcast(corpus_relative_thr(docs, 3, 1000)))

    The count aggregates map-side to one row per partition; nothing about
    this term grows with the corpus.
    """
    return counted.agg(
        F.greatest(
            F.lit(floor_).cast("long"),
            (F.count(F.lit(1)) / F.lit(div)).cast("long"),
        ).alias("thr")
    )


def corpus_relative_thr_sql(table: str, floor_: int, div: int) -> str:
    """DuckDB twin of :func:`corpus_relative_thr` as a scalar-subquery
    expression (integer division matches Spark's floor-toward-zero cast
    for the nonnegative counts involved)."""
    return (
        f"(SELECT GREATEST(CAST({floor_} AS BIGINT), "
        f"CAST(COUNT(*) AS BIGINT) // {div}) FROM {table})"
    )


def thr_col() -> Column:
    """The joined-in threshold column (readability alias)."""
    return F.col("thr")
