"""Streaming incremental dedup: the streaming face of
``dedup_incremental_minhash`` (r9 verdict ask #3).

A crawl's document stream is deduped micro-batch by micro-batch against
the PERSISTED MinHash band index, and each batch's signatures are
appended to the index so later batches dedup against everything that
came before — corpus text is never re-scanned, exactly the batch
operator's contract, lifted onto Structured Streaming:

* **foreachBatch, not a stateful operator**: the band index must
  outlive the query (it IS the corpus's dedup state, shared with batch
  jobs and other streams), so state lives in the index parquet, not in
  the stream's state store.  Within a micro-batch the probe is a plain
  batch join; Structured Streaming serializes micro-batches, so batch
  N always sees the index as of batch N-1.
* **Exactly-once via the batch_id-partition discipline** (io/sinks.py
  / streaming/rollup.py precedent): both the signature append AND the
  verdict sink write ``batch_id=N`` partitions with dynamic overwrite —
  an at-least-once replay of batch N overwrites exactly its own
  partition, so neither duplicate signatures nor duplicate verdicts
  survive a retry.
* **Shared arithmetic**: signatures come from the same
  ``minhash_band_frame`` the batch tiers use — streaming and batch
  dedup cannot drift (pinned by the equivalence test in
  tests/test_streaming_dedup.py).

100 TB: per micro-batch the cost is O(batch signatures) + a probe join
that prunes to matching (band, band_sig) buckets; the index grows
append-only (64 small rows per doc) and is the SAME artifact the batch
``append_to_minhash_index`` maintains, so batch backfills and the live
stream can interleave on one index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.lsh import cap_band_buckets
from kinesis_handler_spark.queries.llm import minhash_band_frame

#: Corpus-snapshot signatures seed the index under this pseudo batch id
#: (real micro-batch ids are >= 0).
SEED_BATCH_ID = -1


def init_dedup_index(docs: DataFrame, index_root: str) -> None:
    """Seed ``index_root`` with the existing corpus's band signatures
    (pseudo-partition ``batch_id=-1``).  Idempotent: re-seeding
    overwrites exactly the seed partition."""
    (
        minhash_band_frame(docs.filter(F.col("doc_id").isNotNull()))
        .withColumn("batch_id", F.lit(SEED_BATCH_ID))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_root)
    )


def dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_root: str,
    verdict_root: str,
) -> None:
    """foreachBatch body: dedup one micro-batch of ``(doc_id, text)``
    rows against the index-so-far, write per-doc verdicts, then append
    this batch's signatures.  Callable directly (batch backfill /
    replay tests) — Structured Streaming adds only the serialization
    guarantee between calls."""
    spark = batch_df.sparkSession
    docs = batch_df.filter(F.col("doc_id").isNotNull())
    # one computation feeds probe join, self-join, and the index append
    probe = minhash_band_frame(docs).persist()
    try:
        # probe ONLY strictly-earlier partitions: an at-least-once
        # replay must not match the batch's own first-attempt
        # signatures (self-matches flagged every doc a dup of itself),
        # and "earlier" is exactly the dedup semantics anyway.  The
        # batch_id partition filter prunes at the file listing.
        idx = (
            spark.read.parquet(index_root)
            .filter(F.col("batch_id") < F.lit(batch_id))
            .select(F.col("doc_id").alias("partner"), "band", "band_sig")
        )
        # bucket-width caps on both candidate-join inputs (ADVICE r10):
        # the INDEX APPEND below stays uncapped — the index is durable
        # state and must keep every signature; capping at read time
        # bounds the join no matter how wide a bucket grows across
        # appended batches.  Capped tail members simply emit no pairs
        # (the documented lsh.py recall trade-off).
        idx, _ = cap_band_buckets(idx, "partner", ("band", "band_sig"))
        capped, _ = cap_band_buckets(probe, "doc_id", ("band", "band_sig"))
        vs_index = capped.join(idx, ["band", "band_sig"]).select(
            "doc_id", "partner"
        )
        a, b = capped.alias("a"), capped.alias("b")
        within = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            # keep-first: within a batch the LATER-keyed member of a
            # pair is the duplicate (mirrors the cross-batch direction,
            # where the index side always precedes the probe side)
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("partner"))
        )
        candidates = vs_index.unionByName(within)
        verdicts = (
            probe.select("doc_id")
            .distinct()
            .join(
                candidates.groupBy("doc_id").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                    F.min("partner").alias("dup_of"),
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
                "dup_of",
                F.col("dup_of").isNotNull().alias("is_dup"),
            )
        )
        (
            verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_root)
        )
        # append AFTER verdicts: a crash between the two writes replays
        # the whole batch, and both writes are partition-idempotent
        (
            probe.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(index_root)
        )
    finally:
        probe.unpersist()


def dedup_stream(
    stream_docs: DataFrame,
    index_root: str,
    verdict_root: str,
    checkpoint_dir: str,
):
    """Wire a ``(doc_id, text)`` stream into the incremental dedup:
    returns the started StreamingQuery (availableNow-friendly; caller
    awaits termination)."""
    return (
        stream_docs.writeStream.foreachBatch(
            lambda df, bid: dedup_batch(df, bid, index_root, verdict_root)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_verdicts(spark: SparkSession, verdict_root: str) -> DataFrame:
    """All per-doc dedup verdicts written so far (one row per doc per
    batch; replays collapse by the partition overwrite)."""
    return spark.read.parquet(verdict_root)
