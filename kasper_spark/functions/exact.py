"""Exact (decimal-backed) aggregates for oracle-stable floating point.

Why: double-precision SUM/AVG are not associative — Spark's parallel partial
aggregation and DuckDB's sequential scan can differ in the last ulp, which
breaks value-hash comparison. Summing in DECIMAL is exact, so both engines
produce the *identical* number regardless of accumulation order; casting the
exact decimal back to double is deterministic (round-to-nearest) on both
sides. Pointwise double arithmetic (a*b, a/b, sqrt) is IEEE-deterministic and
needs no special handling — only reductions do.

Scale choice (4): two constraints pull in opposite directions.
(a) Tie-avoidance: a rounding tie at scale s needs the input double's exact
    decimal expansion to terminate with ...5 at digit s+1 — random-mantissa
    doubles have ~50-digit expansions, so ties are measure-zero at s=4.
(b) decimal->double cast exactness: both engines produce the correctly
    rounded double only while the decimal's unscaled value < 2^53 (verified
    empirically for DuckDB; Java BigDecimal.doubleValue is correctly rounded
    by spec). At s=4 that allows sums up to ~9e11 — ample for the testdata
    and for per-group sums at bench scale. At s=10 the cast itself rounds
    differently across engines (observed) — do not raise the scale.

The DuckDB oracle twin of ``dsum(x)`` is::

    CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE)

and of ``davg(x)``::

    CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE) / COUNT(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,4)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent exact mean of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def money(col: Column | str, precision: int = 10, scale: int = 4) -> Column:
    """Cast a *raw* (stored) double column to decimal for exact arithmetic.

    Only raw columns are safe to cast: stored values are near short-decimal
    numbers, so the cast never sits on a rounding tie. Computed products
    must NOT be cast from double (their true values tie at the rounding
    digit systematically — e.g. 2-decimal price x 2-decimal rate has a
    6-decimal true value ending in '50' ~1% of the time, and Spark/DuckDB
    round the neighboring double differently). Instead multiply decimals:
    Spark grows precision/scale exactly while p1+p2+1 <= 38.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum_dec(col: Column) -> Column:
    """Exact sum of an already-decimal column -> double, via scale 6.

    Scale 6 is NOT arbitrary: products of two/three raw 2-decimal factors
    have at most 6 true decimal digits, so the downscale from the product
    scale (8/12) to 6 drops only zeros — exact on both engines even though
    DuckDB truncates while Spark rounds on decimal downcasts. The unscaled
    value then fits 2^53, so the final double cast is correctly rounded on
    both. Do not lower the scale below the true decimal count (rounding-mode
    divergence) or raise it past unscaled~2^53 (cast divergence).
    """
    return F.sum(col).cast("decimal(38,6)").cast("double")


def dsum_dec_sql(expr: str) -> str:
    """DuckDB twin of :func:`dsum_dec` (expr must be a decimal expression)."""
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,6)) AS DOUBLE)"


def dsum_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,4))) AS DOUBLE) / COUNT({expr})"
