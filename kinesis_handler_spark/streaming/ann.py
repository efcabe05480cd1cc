"""Streaming incremental ANN: the streaming face of
``sim_ann_incremental`` (completes the r10-verdict pattern set —
``streaming/dedup.py`` lifted incremental MinHash onto the stream,
``streaming/quality.py`` the trained quality gate; this lifts the
persisted-IVF search).

A continuous embedding feed (new documents embedded as they arrive) is
searched micro-batch by micro-batch against the PERSISTED IVF index,
and each batch's vectors are then ADDED to the index under the frozen
quantizer so later batches can match them — the FAISS
search-then-add() loop on Structured Streaming:

* **foreachBatch, not a stateful operator**: the index outlives the
  query (it is the corpus's similarity state, shared with batch jobs),
  so state lives in the index parquet, not the state store.  Within a
  micro-batch: one bounded broadcast GEMM assigns the batch to its
  probe cells, one cogrouped exact re-rank scores it against the
  stored inverted lists.
* **Strictly-earlier visibility**: a batch's queries see the index as
  of the previous batch (its own partition is excluded), so an
  at-least-once replay cannot match a doc against its own
  first-attempt vectors, and "earlier arrivals only" is the natural
  search semantics for a feed.
* **Exactly-once via batch_id partitions** (io/sinks.py discipline):
  both the neighbor sink and the index add write ``batch_id=N``
  partitions with dynamic overwrite — a replay of batch N overwrites
  exactly its own partition.
* **Frozen quantizer**: adds assign against the STORED centroids;
  centroid drift is handled by an offline retrain publishing a new
  index version (swap by path), never a per-batch cost — exactly how
  production IVF deployments run.

100 TB: per micro-batch the cost is O(batch·K) assignment + the probed
cells' member rows; the corpus embeddings are never re-scanned and the
index grows append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.worker_tune import tuned
from kinesis_handler_spark.queries.llm_scale import (
    _assign_gemm,
    _ivf_cells,
    _ivf_nprobe,
    _ivf_size_and_sample,
    _train_ivf_centroids,
)

#: Corpus-snapshot members seed the index under this pseudo batch id
#: (real micro-batch ids are >= 0) — the streaming/dedup.py convention.
SEED_BATCH_ID = -1


def init_ann_index(vectors: DataFrame, index_root: str) -> None:
    """Seed ``index_root`` from the existing corpus's ``(vec_id,
    qvec)`` vectors: train the coarse quantizer, write ``centroids/``,
    and write the rank-1 inverted lists under pseudo-partition
    ``batch_id=-1``.  Re-seeding is a FULL REBUILD, not an append:
    it retrains the quantizer, so any ``batch_id >= 0`` member
    partitions written by earlier ``ann_batch`` calls would carry cell
    assignments against the OLD centroids and silently corrupt probe
    routing — the members write therefore uses a STATIC overwrite that
    truncates the whole ``members/`` directory, not just the seed
    partition (r11 ADVICE).  Idempotent on a fresh or re-seeded root
    either way."""
    qv = vectors.filter(F.col("vec_id").isNotNull())
    n, sample = _ivf_size_and_sample(qv)
    cent = _train_ivf_centroids(qv, _ivf_cells(n), sample=sample)
    cent.coalesce(1).write.mode("overwrite").parquet(
        f"{index_root}/centroids"
    )
    cent_back = qv.sparkSession.read.parquet(f"{index_root}/centroids")
    (
        _assign_gemm(qv, cent_back, 1)
        .filter(F.col("rank") == 1)
        .select("cell", "vec_id", "qvec")
        .withColumn("batch_id", F.lit(SEED_BATCH_ID))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(f"{index_root}/members")
    )


def ann_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_root: str,
    neighbor_root: str,
    top_k: int = 3,
) -> None:
    """foreachBatch body: search one micro-batch of ``(vec_id, qvec)``
    rows against the index-so-far, write per-query top-k neighbors,
    then add this batch's vectors to the index.  Callable directly
    (batch backfill / replay tests)."""
    spark = batch_df.sparkSession
    qv = batch_df.filter(F.col("vec_id").isNotNull())
    cent = spark.read.parquet(f"{index_root}/centroids")
    n_probe = _ivf_nprobe(cent.count())
    assigned = _assign_gemm(qv, cent, n_probe).persist()
    try:
        probes = assigned.select("cell", "vec_id", "qvec")
        members = (
            spark.read.parquet(f"{index_root}/members")
            .filter(F.col("batch_id") < F.lit(batch_id))
            .select("cell", "vec_id", "qvec")
        )

        def score_probe(probes_pdf, members_pdf):
            import numpy as np
            import pandas as pd

            empty = pd.DataFrame({"q_id": [], "nbr_id": [], "cosine": []})
            if len(probes_pdf) == 0 or len(members_pdf) == 0:
                return empty
            qi = probes_pdf["vec_id"].to_numpy(dtype=np.int64)
            qm = np.stack(probes_pdf["qvec"].to_numpy()).astype(np.float64)
            mi = members_pdf["vec_id"].to_numpy(dtype=np.int64)
            mm = np.stack(members_pdf["qvec"].to_numpy()).astype(np.float64)
            qn = np.sqrt((qm * qm).sum(axis=1))
            mn = np.sqrt((mm * mm).sum(axis=1))
            cos = (qm @ mm.T) / np.outer(qn, mn)
            keep = min(top_k, cos.shape[1])
            # tie-stable per-cell top-k (r11 ADVICE): argpartition
            # breaks exact-cosine ties (plausible with quantized
            # integer vectors) by in-memory row order, so the emitted
            # candidate set could flip between runs; lexsort orders by
            # (cosine desc, nbr_id asc) — the same total order the
            # final window uses, so the global top-k is recoverable
            order = np.lexsort(
                (np.broadcast_to(mi, cos.shape), -cos), axis=-1
            )
            idx_top = order[:, :keep]
            rows = np.repeat(np.arange(len(qi)), keep)
            cols = idx_top.ravel()
            return pd.DataFrame(
                {
                    "q_id": qi[rows],
                    "nbr_id": mi[cols],
                    "cosine": cos[rows, cols],
                }
            )

        local = (
            probes.groupBy("cell")
            .cogroup(members.groupBy("cell"))
            .applyInPandas(
                tuned(score_probe), "q_id BIGINT, nbr_id BIGINT, cosine DOUBLE"
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("cosine").desc(), F.col("nbr_id")
        )
        neighbors = (
            local.dropDuplicates(["q_id", "nbr_id"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_k)
            .drop("rn")
        )
        (
            neighbors.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(neighbor_root)
        )
        # add AFTER the search sink: a crash between the two writes
        # replays the whole batch; both writes are partition-idempotent
        (
            assigned.filter(F.col("rank") == 1)
            .select("cell", "vec_id", "qvec")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_root}/members")
        )
    finally:
        assigned.unpersist()


def compact_ann_index(
    spark: SparkSession, index_root: str, upto_batch_id: int
) -> None:
    """Fold the per-micro-batch member partitions ``0 <= batch_id <=
    upto_batch_id`` into the seed partition (``batch_id=-1``) — the
    OPTIMIZE step of the append-now-optimize-later discipline
    (``compact_minhash_index`` precedent).  Every ``ann_batch`` appends
    one ``batch_id=N`` directory, so a long-running stream grows the
    members listing (and every search's file count) linearly with batch
    COUNT regardless of data size; folding restores O(1) directories
    and rewrites the folded rows clustered by ``cell`` (AQE-coalesced
    file sizing), which is also the probe cogroup's access pattern.

    Search-result equivalence: rows are copied verbatim (frozen
    quantizer — cell assignments never recomputed), and a folded row's
    visibility predicate ``batch_id < N`` is unchanged for every FUTURE
    batch N > upto_batch_id (it already held ``old_batch_id < N``, and
    ``-1 < N`` still holds).  Pinned in tests/test_streaming_ann.py:
    a post-compaction batch returns bit-identical neighbors.

    Replay contract (the caller's side of the bargain, same as the
    minhash OPTIMIZE step): compact only batches the stream has
    durably committed — i.e. at quiescence (an ``availableNow`` run
    finished) or below the checkpoint's committed watermark.  A replay
    of batch ``M <= upto_batch_id`` after compaction would re-append
    partition ``batch_id=M`` alongside its folded copy (duplicates) and
    see folded later-batch rows as earlier — exactly-once holds only
    above the compaction point.

    Atomic: build-in-tmp + directory swap, rollback on failure —
    readers never observe a partial members tree."""
    import os
    import shutil

    members_path = f"{index_root}/members"
    folded = (
        spark.read.parquet(members_path)
        .withColumn(
            "batch_id",
            F.when(
                F.col("batch_id") <= F.lit(upto_batch_id),
                F.lit(SEED_BATCH_ID),
            ).otherwise(F.col("batch_id")),
        )
        .repartition("cell")
    )
    tmp = f"{members_path}.compact.tmp.{os.getpid()}"
    old = f"{members_path}.compact.old.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    os.rename(members_path, old)
    try:
        os.rename(tmp, members_path)
    except OSError:
        os.rename(old, members_path)  # roll back; leave tmp for forensics
        raise
    shutil.rmtree(old, ignore_errors=True)


def ann_stream(
    stream_vectors: DataFrame,
    index_root: str,
    neighbor_root: str,
    checkpoint_dir: str,
    top_k: int = 3,
):
    """Wire a ``(vec_id, qvec)`` stream into the incremental ANN:
    returns the started StreamingQuery (availableNow-friendly; caller
    awaits termination)."""
    return (
        stream_vectors.writeStream.foreachBatch(
            lambda df, bid: ann_batch(
                df, bid, index_root, neighbor_root, top_k
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_neighbors(spark: SparkSession, neighbor_root: str) -> DataFrame:
    """All per-query neighbor results so far (replays collapse by the
    partition overwrite)."""
    return spark.read.parquet(neighbor_root)
