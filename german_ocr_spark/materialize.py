"""Reliable-materialization seam for multi-round / multi-consumer plans.

Every iterative query (connected components q42, BPE training q116,
shared-postings q161, ...) must cut lineage each round — otherwise the
plan tree grows unboundedly and Catalyst re-derives every prior round
on each action. Two Spark mechanisms exist:

- ``DataFrame.localCheckpoint()``: blocks pinned to executor storage.
  Zero-setup and fast locally, but on a real cluster a single lost
  executor loses blocks that canNOT be recomputed (lineage was cut) —
  one preemption kills a 10-hour job.
- ``DataFrame.checkpoint()``: blocks written to the reliable
  checkpoint directory (HDFS / object storage) configured via
  ``SparkContext.setCheckpointDir``. Survives executor loss; the
  production choice.

``materialize(df)`` is the ONE switch between them: it uses the
reliable ``checkpoint()`` whenever a checkpoint dir is configured on
the session and falls back to ``localCheckpoint()`` otherwise (tests,
single-machine runs). Query code never calls either primitive
directly — always ``df.transform(materialize)`` — so a cluster
deployment flips the whole engine to fault-tolerant materialization
with a single ``spark.sparkContext.setCheckpointDir(...)`` call (or
``SPARK_GRAFT_CHECKPOINT_DIR`` env var consumed by session.get_spark).

Both paths are *eager* (the default): the materialization happens at
the call, so round N+1's plan starts from stored blocks, and the two
paths produce identical rows — pinned by tests/test_materialize.py
running q42 and q161 under both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_reliable_checkpoint(spark) -> bool:
    """True when a reliable checkpoint dir is configured on the context."""
    d = spark.sparkContext.getCheckpointDir()
    return d is not None


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage and persist ``df``; reliable iff a checkpoint dir is set.

    Use as ``df.transform(materialize)`` at every round boundary /
    multi-consumer seam instead of calling ``localCheckpoint`` or
    ``checkpoint`` directly.

    Reliable mode persists the input around the ``checkpoint()`` call:
    an eager Dataset.checkpoint runs its materialization action AND a
    separate checkpoint-file write job, so an un-persisted input would
    recompute its whole lineage twice at every seam — exactly the cost
    this module exists to avoid on multi-round jobs. The persist is
    dropped immediately after the checkpoint files are written (the
    returned plan reads the checkpoint, not the cache). Checkpoint
    files themselves are garbage-collected by the ContextCleaner once
    the RDD goes out of scope — session.get_spark enables
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` — so a
    long-running iterative job does not accumulate one directory per
    round.
    """
    spark = df.sparkSession
    if has_reliable_checkpoint(spark):
        if not eager:
            return df.checkpoint(eager=False)
        df = df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=eager)
