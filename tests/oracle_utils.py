"""Local mirror of the driver's DuckDB-oracle comparison.

Mirrors the documented contract: run the Spark query and the oracle SQL on
the same parquet tables, sort columns by name, sort rows, compare values.
Exact comparison for ints/strings/timestamps; floats compared bit-exact
first and with tiny tolerance as a diagnostic fallback (the driver hashes,
so bit-exactness is what actually matters — tolerance failures print a
warning so we know an operator is at risk)."""

from __future__ import annotations

import math
import os

import pandas as pd

from kasper_spark.catalog import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used to mirror the driver's value-hash behavior:
    the driver hashes pandas values as-is, so an int64-vs-float64 drift
    (e.g. DuckDB HUGEINT -> float64 vs Spark bigint) hashes `361` vs
    `361.0` and fails even when every value is identical."""
    if pd.api.types.is_bool_dtype(s):
        return "boolean"
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "floating"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"]
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"{name}: columns {s_cols} != {d_cols}"]
    # dtype-class gate (mirrors the driver's exact value-hash): integer vs
    # floating per column must agree between engines. One documented
    # exemption: NULL promotion — pandas renders a nullable integer column
    # as float64 (NaN for NULL), so integer-vs-floating is tolerated only
    # when the floating side actually contains a NaN.
    for c in s_cols:
        sc, dc = _dtype_class(spark_pdf[c]), _dtype_class(duck_pdf[c])
        if sc == dc:
            continue
        pair = {sc, dc}
        if pair == {"integer", "floating"}:
            float_side = spark_pdf[c] if sc == "floating" else duck_pdf[c]
            if float_side.isna().any():
                # NULL promotion: fall through to the value comparison,
                # which will pinpoint the NaN-vs-int row (a NaN on one side
                # with an integer dtype on the other is a real value
                # difference, not a rendering artifact).
                continue
        problems.append(
            f"{name}.{c}: dtype class {sc} (spark) != {dc} (duckdb) — "
            "driver value-hash would fail even on equal values; CAST the "
            "oracle (or Spark side) so integer/floating classes agree"
        )
    if problems:
        return problems
    s = _canon(spark_pdf)
    d = _canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            for i, (a, b) in enumerate(zip(sv.astype(float), dv.astype(float))):
                a_nan, b_nan = (isinstance(a, float) and math.isnan(a)), (
                    isinstance(b, float) and math.isnan(b)
                )
                if a_nan and b_nan:
                    continue
                if a != b:  # bit-exact expectation
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    problems.append(
                        f"{name}.{c}[{i}]: {a!r} != {b!r} (rel {rel:.2e})"
                    )
                    if len(problems) > 5:
                        return problems
        else:
            neq = sv.astype(str).fillna("<null>") != dv.astype(str).fillna("<null>")
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"{name}.{c}: first mismatch at row {i}: {sv[i]!r} != {dv[i]!r}"
                )
                if len(problems) > 5:
                    return problems
    return problems


def run_both(spark, con, query_fn, sql: str, sf_dir: str, name: str) -> list[str]:
    sdf = query_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    return compare_frames(spark_pdf, duck_pdf, name)
