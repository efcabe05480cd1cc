"""Lineage truncation that honors the session's reliable checkpoint dir.

Iterative operators (large-star/small-star components, PageRank,
BPE merge rounds, IVF assignment) truncate their logical plan every
round so round N's plan stays O(1) deep instead of O(N).  Two Spark
mechanisms exist:

* ``localCheckpoint`` — blocks cached on the executors that computed
  them.  Fast (no extra write), but NOT fault-tolerant: lose an
  executor mid-iteration on a real cluster and the lineage needed to
  recompute its blocks is gone → job failure.  Fine on local[n] where
  executor == driver == the only failure domain.
* ``checkpoint`` — blocks written to ``SparkContext.checkpointDir``
  (HDFS/S3/DBFS on a cluster).  Survives executor loss; costs one
  distributed write per truncation.

``truncate`` picks per-session (r7 verdict item 4): if the deployment
configured a reliable checkpoint dir (``sc.setCheckpointDir(...)``),
every truncation in the engine is reliable; otherwise it degrades to
``localCheckpoint``.  A 1000-executor job sets the dir; tests and
local runs don't pay the write.  Results are identical either way
(pinned by tests/test_checkpoint_modes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when the session
    has a checkpoint dir configured, ``localCheckpoint`` otherwise.

    ``eager=False`` defers materialization to the first action — the
    callers' dominant pattern (each iteration's fingerprint/aggregate
    collect is the one action that materializes the round)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
