"""cut_lineage policy gate (kasper_spark/lineage.py).

The iterative family's per-round lineage cuts must (a) truncate the plan,
(b) preserve rows, and (c) switch to RELIABLE checkpointing the moment a
cluster configures sc.setCheckpointDir — the mode where an executor loss
mid-iteration recomputes nothing and loses nothing. Locally (no dir) the
cut stays a localCheckpoint; "losing an executor" in local[...] means the
JVM died anyway.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kasper_spark.lineage import cut_lineage


def _restore_no_checkpoint_dir(sc) -> None:
    """Clear the context's checkpoint dir (no public unset API)."""
    setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
    setter(sc._jvm.scala.Option.apply(None))


def test_cut_lineage_truncates_and_preserves_rows(spark):
    df = (
        spark.range(1000)
        .withColumn("g", F.col("id") % 7)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cut = cut_lineage(df)
    # plan truncated: the aggregation pipeline is gone, replaced by a
    # materialized-RDD scan
    plan = cut._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan, plan
    assert sorted(r["n"] for r in cut.collect()) == sorted(
        r["n"] for r in df.collect()
    )


def test_cut_lineage_uses_reliable_checkpoint_when_dir_configured(spark):
    import shutil

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # suite invariant: no dir leaks in
    d = tempfile.mkdtemp(prefix="kasper-ckpt-")
    sc.setCheckpointDir(d)
    # baseline: earlier tests' localCheckpoint blocks legitimately sit in
    # getPersistentRDDs until the ContextCleaner collects them — only NEW
    # pins from this cut count as a leak
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    try:
        cut = cut_lineage(spark.range(500).withColumn("x", F.col("id") * 2))
        assert cut.count() == 500
        # reliable mode writes rdd-* block files under the configured dir
        written = [
            name
            for root, _dirs, files in os.walk(d)
            for name in files
        ]
        assert written, f"no checkpoint files under {d} — fell back to local mode?"
        # the cut must not leave a pinned cache behind (the compute-once
        # persist is released as soon as the checkpoint write completes)
        after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        assert after <= before, f"cut_lineage leaked pins: {after - before}"
    finally:
        _restore_no_checkpoint_dir(sc)
        shutil.rmtree(d, ignore_errors=True)
    assert sc.getCheckpointDir() is None


def test_iterative_operator_identical_under_reliable_mode(spark):
    """End-to-end: an iterative operator (connected components over the
    LSH graph — 2 cuts per round) must produce IDENTICAL rows whether its
    per-round cuts are localCheckpoints (no dir) or reliable checkpoints
    (dir configured) — the mode switch changes fault-tolerance, never
    values."""
    import shutil

    from kasper_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    fn = QUERIES["neardup_cc_canonical"]
    sf = "/root/testdata/sf0.001"

    local_rows = sorted(map(tuple, fn(spark, sf).collect()))

    sc = spark.sparkContext
    d = tempfile.mkdtemp(prefix="kasper-ckpt-iter-")
    sc.setCheckpointDir(d)
    try:
        reliable_rows = sorted(map(tuple, fn(spark, sf).collect()))
        checkpointed = [
            name for root, _dirs, files in os.walk(d) for name in files
        ]
        assert checkpointed, "no reliable checkpoint files written by the loop"
    finally:
        _restore_no_checkpoint_dir(sc)
        shutil.rmtree(d, ignore_errors=True)

    assert local_rows == reliable_rows
