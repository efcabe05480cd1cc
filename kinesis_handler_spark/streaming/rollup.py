"""Continuous aggregate ("hypertable rollup"): a streaming tumbling
rollup persisted to parquet, plus a read path that unions the rolled-up
history with a freshly-aggregated raw tail — the TimescaleDB
continuous-aggregate / materialized-rollup pattern on Structured
Streaming primitives.

Why this shape at 100 TB: re-aggregating months of raw events on every
dashboard query is O(history); maintaining the rollup incrementally in
the stream makes history reads O(buckets) (36,525 day-buckets per
century per key-group), and only the un-finalized tail — bounded by the
watermark horizon — is ever aggregated from raw data at read time.

Exactly-once: the rollup sink reuses the idempotent batch_id-partition
discipline of io/sinks.py (replay overwrites exactly its own
partition), and the reader takes the LAST write per bucket (append mode
emits one finalized row per closed window; duplicates can only arise
from at-least-once replay, which the max-batch_id pick collapses).

Reference parity: the reference library has no aggregation at all
(lib/kinesisHandler.js routes records; state ends at the handler call)
— this is north-star mandate surface (BASELINE.json:6), composed from
the engine's own windowing + sink layers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.streaming.windows import tumbling_aggregate

#: Columns every rollup row carries; the read path depends on them.
ROLLUP_COLS = ("win_start", "win_end", "event_type", "n", "total")


def rollup_stream(
    stream: DataFrame,
    width: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """The incremental half: watermarked tumbling aggregate in APPEND
    mode semantics — a bucket row is emitted exactly once, when the
    watermark passes its end (i.e. the bucket is finalized)."""
    return tumbling_aggregate(stream, window=width, watermark=watermark)


def write_rollup_batch(df: DataFrame, batch_id: int, path: str) -> None:
    """foreachBatch body / append-sink twin: idempotent per-batch
    parquet write (same dynamic-overwrite discipline as io/sinks.py)."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Rolled-up history, deduplicated under at-least-once replay: keep
    the LAST (max batch_id) row per (bucket, key).  O(buckets) rows."""
    raw = spark.read.parquet(path)
    w = Window.partitionBy("win_start", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*ROLLUP_COLS)
    )


def rollup_with_tail(
    spark: SparkSession,
    rollup_path: str,
    raw_tail: DataFrame,
    cutoff,
    width: str = "1 day",
) -> DataFrame:
    """The read path of the continuous aggregate: finalized buckets
    strictly before ``cutoff`` come from the persisted rollup;
    un-finalized raw events at/after ``cutoff`` are aggregated fresh
    with the SAME bucket expression, and the two halves union by name.
    ``cutoff`` must sit on a bucket boundary (callers align it to the
    watermark horizon) so no bucket is half-rolled, half-raw."""
    history = read_rollup(spark, rollup_path).filter(
        F.col("win_start") < F.lit(cutoff)
    )
    # The SAME aggregate expression as the streaming half (identical
    # bucket boundaries and decimal-exact totals), on the batch tail.
    tail = tumbling_aggregate(
        raw_tail.filter(F.col("ts") >= F.lit(cutoff)),
        window=width,
        watermark=None,
    )
    return history.unionByName(tail)
