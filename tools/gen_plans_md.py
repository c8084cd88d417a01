#!/usr/bin/env python
"""Generate PLANS.md: a per-query physical-plan audit table at sf0.001.

Human-readable twin of tests/test_plans.py::test_repo_wide_plan_hygiene —
the numbers a reviewer would otherwise pull query-by-query from
.explain("formatted"): exchange count, join strategies, pushdown, widest
scan. Streaming twins are excluded (their registered callable executes the
stream and returns a memory-sink scan, so the batch plan is not visible);
they are covered by the streaming tests and bench throughput instead.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kasper_spark.registry import ORACLES, QUERIES, load_all_operators  # noqa: E402
from kasper_spark.session import get_spark  # noqa: E402

SF = os.path.join(os.path.dirname(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")), "sf0.001")

SKIP_PREFIXES = ("streaming_",)
SKIP = {"neardup_clusters"}  # iterative: executes rounds during construction


def main() -> None:
    load_all_operators()
    spark = get_spark("plan-audit")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    rows = []
    for name in sorted(QUERIES):
        if name in SKIP or name.startswith(SKIP_PREFIXES):
            continue
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        widest = max(
            (
                len([c for c in m.group(1).split(",") if c])
                for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan)
            ),
            default=0,
        )
        rows.append(
            (
                name,
                plan.count("Exchange"),
                plan.count("BroadcastHashJoin"),
                plan.count("SortMergeJoin"),
                plan.count("BroadcastNestedLoopJoin"),
                "yes" if "CartesianProduct" in plan else "no",
                "yes" if "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan) else "-",
                widest,
                "sql" if name in ORACLES else "rows",
            )
        )
    out = [
        "# Physical-plan audit (auto-generated: tools/gen_plans_md.py, sf0.001)",
        "",
        "Machine-checked invariants live in tests/test_plans.py (no cartesian",
        "products ever, BNLJ only on allow-listed bounded cross joins, scans",
        "<= 8 columns, pushdown/broadcast/partial-agg per family); this table",
        "is the same audit in reviewable form. `exch` counts Exchange",
        "operators (shuffles); `bhj`/`smj`/`bnlj` are join strategies;",
        "`pushed` = parquet filter pushdown present; `scan_cols` = widest",
        "scan projection. Streaming twins are excluded (see module docstring).",
        "",
        "| query | exch | bhj | smj | bnlj | cartesian | pushed | scan_cols | check |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append("| " + " | ".join(str(x) for x in r) + " |")
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} queries")


if __name__ == "__main__":
    main()
