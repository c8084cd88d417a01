"""Regenerate OPERATORS.md from the query registry (single source of truth).

Run from the repo root: python tools/gen_operators_md.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kasper_spark.registry as r


def main() -> None:
    r.load_all_operators()
    lines = [
        "# Operator inventory (auto-generated from kasper_spark.registry)",
        "",
        "Every entry is a `queries()` callable the driver runs at sf0.01;",
        "`SQL-oracle` rows are additionally hash-compared against the DuckDB",
        "oracle (the t2 gate); `rows-only` rows carry determinism checks and",
        "dedicated quality/structural tests instead (noted in the docstring).",
        "",
        "| query | module | check | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(r.QUERIES):
        fn = r.QUERIES[name]
        mod = fn.__module__.replace("kasper_spark.operators.", "")
        check = "SQL-oracle" if name in r.ORACLES else "rows-only"
        doc = (inspect.getdoc(fn) or "").split(".")[0].replace("\n", " ").replace("|", "/")
        if len(doc) > 110:
            doc = doc[:107] + "..."
        lines.append(f"| {name} | {mod} | {check} | {doc} |")
    n_sql, n_all = len(r.ORACLES), len(r.QUERIES)
    lines += [
        "",
        f"**{n_all} queries; {n_sql} SQL-oracle-checked, {n_all - n_sql} rows-only.**",
        "",
        "Regenerate: `python tools/gen_operators_md.py` (writes this file).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n_all} queries, {n_sql} oracled")


if __name__ == "__main__":
    main()
