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

``truncate`` picks per-call-site (ADVICE r8): only MULTI-ROUND loop
frames (``loop=True`` — per-round iteration state and the stationary
frames re-joined every round, where an executor loss mid-loop would
sink minutes-to-hours of progress) upgrade to reliable ``checkpoint``
when the deployment configured a checkpoint dir
(``sc.setCheckpointDir(...)``).  ONE-SHOT reuse barriers (the default)
always use ``localCheckpoint``: they exist to share a subplan between
two consumers inside a single query, a lost executor there merely
fails-and-retries that one query from source, and making every such
barrier a durable distributed write would put an HDFS/S3 round-trip in
hot non-iterative queries.  Superseded per-round checkpoints are
garbage-collected by the ContextCleaner because ``session.get_spark``
and ``session.cluster_conf`` set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — without
it, Spark never deletes DataFrame checkpoint data and a 25-round
components run leaks O(rounds × frame size) of durable storage.
Results are identical across modes (pinned by
tests/test_checkpoint_modes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate(
    df: DataFrame, eager: bool = False, loop: bool = False
) -> DataFrame:
    """Cut ``df``'s lineage.

    ``loop=True`` marks multi-round iteration state (or a stationary
    frame re-read every round): reliable ``checkpoint`` when the
    session has a checkpoint dir configured, ``localCheckpoint``
    otherwise.  The default (``loop=False``) is a one-shot reuse
    barrier inside a single query and always uses ``localCheckpoint``
    — no durable write; executor loss degrades to a query retry, not
    a lost iteration history.

    ``eager=False`` defers materialization to the first action — the
    callers' dominant pattern (each iteration's fingerprint/aggregate
    collect is the one action that materializes the round)."""
    sc = df.sparkSession.sparkContext
    if loop and sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def truncate_loop(df: DataFrame, eager: bool = False) -> DataFrame:
    """``truncate(df, loop=True)`` as a ``DataFrame.transform``-able
    single-argument callable for per-round loop bodies."""
    return truncate(df, eager=eager, loop=True)
