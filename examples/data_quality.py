"""Data-quality walkthrough: the audit tier over the bounded testdata —
schema/constraint checks, referential integrity, column profiling, feed
freshness, drift tests, poison-payload quarantine, disclosure risk, and
table checksums — composed the way a nightly DQ job reports them.

No reference twin (the reference trusts its opaque byte values end-to-end;
its only validation is JSON-decode failure in the app callback). Every
stage is a registered, oracle-checked operator; this script strings them
into the one-page report an on-call reads.

Run:  python examples/data_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-data-quality")
    load_all_operators()

    # 1. declarative constraints (nulls, ranges, uniqueness) as one report
    constraints = QUERIES["dq_constraint_report"](spark, sf_dir)

    # 2. referential integrity: orphan counts across every FK edge
    orphans = QUERIES["referential_integrity_audit"](spark, sf_dir)
    broken_edges = orphans.filter(F.col("n_orphans") > 0).count()

    # 3. single-pass column profile (the stats a catalog page shows)
    profile = QUERIES["profile_orders_columns"](spark, sf_dir).collect()[0]

    # 4. event-time freshness per feed (producer-died detector)
    freshness = QUERIES["dq_freshness_by_type"](spark, sf_dir)

    # 5. distribution drift: per-source quality KS + vocabulary chi-square
    ks = QUERIES["ks_quality_drift_by_source"](spark, sf_dir)
    worst_ks = ks.orderBy(F.desc("ks_stat")).first()

    # 6. poison payloads quarantined, not crashed (DLQ pattern)
    dlq = QUERIES["json_parse_dlq_audit"](spark, sf_dir)

    # 7. disclosure risk before sharing (k-anonymity over QI classes)
    kanon = QUERIES["k_anonymity_audit"](spark, sf_dir)

    # 8. cheap table fingerprint for cross-environment reconciliation
    checksum = QUERIES["table_checksum_orders"](spark, sf_dir)

    out = {
        "constraint_checks": constraints.count(),
        "fk_edges_with_orphans": broken_edges,
        "orders_rows_profiled": int(profile["n_rows"]),
        "stale_feeds_24h": int(
            freshness.agg(F.sum("stale_24h")).collect()[0][0]
        ),
        "worst_ks_source": worst_ks["source"],
        "worst_ks_stat": float(worst_ks["ks_stat"]),
        "dead_letter_rows": int(dlq.agg(F.sum("n_dead")).collect()[0][0]),
        "qi_classes_at_risk": kanon.filter(F.col("at_risk")).count(),
        "checksum_buckets": checksum.count(),
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
