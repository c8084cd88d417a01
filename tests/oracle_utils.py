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


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"]
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"{name}: columns {s_cols} != {d_cols}"]
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
