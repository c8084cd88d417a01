"""Event-anomaly monitoring walkthrough: the detection tier over the
bounded testdata — per-entity EWMA forecast deviations, fixed-target CUSUM
budget alarms, volume change-points per source, and Markov sequence
anomalies — composed the way an on-call monitoring stack layers them.

No reference twin (the reference's only clock is the processing-time
ticker — /root/reference/topic_processor.go:193); this is the alerting
tier a streaming platform runs beside ingest. Every stage is a registered,
oracle-checked operator; three of the four also have certified AT-INGEST
twins (streaming_ewma_anomaly_twin, streaming_cusum_twin, and the matrix's
streaming_markov_twin), so the same answers fire on the live stream.

Run:  python examples/anomaly_monitor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.registry import QUERIES, load_all_operators
from kasper_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark("example-anomaly-monitor")
    load_all_operators()

    # 1. point anomalies: per-user trailing-EWMA forecast deviations
    ewma = QUERIES["ewma_anomaly_events"](spark, sf_dir)

    # 2. sustained anomalies: fixed-target CUSUM budget alarms per user
    cusum_users = QUERIES["cusum_user_spend_alarm"](spark, sf_dir)

    # 3. volume drift: two-sided CUSUM change-points per event type's
    #    hourly curve (alarm columns mark sustained level shifts)
    drift = QUERIES["cusum_changepoint_events"](spark, sf_dir)
    drift_alarms = drift.filter((F.col("alarm_up") == 1) | (F.col("alarm_dn") == 1))

    # 4. sequence anomalies: improbable state transitions under the fitted
    #    first-order Markov model
    seq_anoms = QUERIES["markov_transition_anomaly"](spark, sf_dir)

    # 5. robust static outliers: deviations beyond 5x the user's MAD
    #    (breakdown-resistant — a burst of outliers can't drag the gate)
    mad = QUERIES["mad_outlier_events"](spark, sf_dir)

    # an on-call rollup: which users trip more than one detector?
    repeat_offenders = (
        ewma.select("user_id")
        .distinct()
        .join(cusum_users.select("user_id").distinct(), "user_id")
        .count()
    )

    out = {
        "ewma_anomalies": ewma.count(),
        "cusum_user_alarms": cusum_users.count(),
        "volume_changepoint_hours": drift_alarms.count(),
        "sequence_anomalies": seq_anoms.count(),
        "mad_outliers": mad.count(),
        "users_tripping_both_value_detectors": repeat_offenders,
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
