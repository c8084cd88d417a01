"""Lineage-cut policy for the iterative operator family.

Every iterative loop in this repo (connected components, PageRank, label
propagation, triangle counting, k-means, trained-IVF) eagerly truncates
its evolving state's lineage once per round — that is what keeps the
physical plan O(one round) instead of O(rounds x upstream pipeline)
(gated by tests/test_plans.py::test_iterative_queries_cut_lineage; before
the discipline existed, pagerank_lsh_graph planned 1,838 exchanges).

WHERE the cut's blocks live is a separate, environment-level decision
that ``cut_lineage`` centralizes:

- ``localCheckpoint``: blocks in executor storage (memory, spilling to
  local disk). Right for ``local[...]`` runs and tests — there, "losing
  an executor" means the whole JVM died anyway. On a real cluster it
  trades fault tolerance away: lineage is gone AND the blocks die with
  their executor, so one lost/decommissioned executor fails the query.
- reliable ``checkpoint``: blocks in the fault-tolerant store configured
  via ``sc.setCheckpointDir`` (HDFS/S3/... on a cluster). An executor
  loss mid-query recomputes nothing and loses nothing — the right mode
  for long iterative jobs at 100 TB, where the probability of losing at
  least one of 1,000 executors during a multi-hour run approaches 1.

``cut_lineage`` picks reliable checkpointing whenever a checkpoint dir is
configured and falls back to ``localCheckpoint`` otherwise, so cluster
deployments opt in with one driver-side line:

    spark.sparkContext.setCheckpointDir("hdfs:///checkpoints/kasper")

and every iterative operator becomes executor-loss-safe with unchanged
results (both forms materialize the same rows; only block placement and
recovery semantics differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and truncate its lineage.

    Reliable ``checkpoint()`` when the SparkContext has a checkpoint dir
    (fault-tolerant: survives executor loss), else ``localCheckpoint()``
    (executor-local blocks: fine where executor loss == process death).

    Reliable-mode details that keep the trade honest:

    - compute-once: a bare ``checkpoint(eager=True)`` runs the plan TWICE
      (the eager materialization job, then the checkpoint-write job
      re-executing the lineage). Persisting first makes the write job read
      the cached blocks, and the pin is dropped as soon as the write
      completes — so reliable mode costs one extra read+write of the
      materialized rows, not a second execution of the pipeline.
    - cleanup: checkpoint files are only garbage-collected when
      ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (Spark's
      default is false; our session factory sets it — a deployment that
      builds its own session must set it alongside ``setCheckpointDir`` or
      every per-round cut leaks a full copy onto the checkpoint volume).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        from pyspark.storagelevel import StorageLevel

        pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return pinned.checkpoint(eager=True)
        finally:
            # blocking: the repo's cache-discipline gate asserts no pinned
            # RDDs survive a query, and non-blocking unpersist removes the
            # registration asynchronously
            pinned.unpersist(blocking=True)
    return df.localCheckpoint(eager=True)
