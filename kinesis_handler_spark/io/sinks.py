"""Idempotent parquet sinks for the routing engine's three channels
(routed / unknown / dead-letter — reference R11-R13).

Exactly-once story (R14, SURVEY.md §2.A): Structured Streaming replays
a failed micro-batch from the checkpoint, so sinks must be idempotent
under batch replay. These sinks write every batch into a
``batch_id=<n>`` partition with dynamic partition overwrite — replaying
batch N overwrites exactly partition N and nothing else, turning
at-least-once delivery into exactly-once output. (The reference only
offers at-least-once: a thrown handler error re-delivers the whole
batch, lib/kinesisHandler.js:151,188-191.)

Layout (all columns the engine attaches are preserved):

    base_dir/routed/schema=<sanitized schema_id>/batch_id=<n>/*.parquet
    base_dir/dead_letter/batch_id=<n>/*.parquet
    base_dir/unknown/batch_id=<n>/*.parquet

At scale: one directory tree per channel partitioned by batch keeps
writes append-only and small-file-bounded (one file per task); readers
prune on ``batch_id``; schema directories shard the routed output the
way the reference's per-schema handlers do.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sanitize(schema_id: str) -> str:
    """Schema IDs contain '/' (vendor/name/version) — not path-safe."""
    return re.sub(r"[^A-Za-z0-9._-]", "_", schema_id)


def _write_batch(df: DataFrame, batch_id: int, path: str) -> None:
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


class ParquetChannelSinks:
    """Bundles the three channel sinks around one base directory.

    Usage::

        sinks = ParquetChannelSinks("/data/retail-stream")
        engine.run_stream(stream, checkpoint_dir=ck,
                          routed_sink=sinks.routed,
                          dead_letter_sink=sinks.dead_letter,
                          unknown_sink=sinks.unknown)
    """

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def routed(self, schema_id: str, df: DataFrame, batch_id: int) -> None:
        # `event` is a per-schema struct — flatten for a stable, readable
        # columnar layout (struct columns parquet-encode fine, but flat
        # columns make the routed table directly queryable).  A handler
        # is allowed to AGGREGATE and drop the event column entirely
        # (engine contract); such frames are written as-is.
        if "event" in df.columns:
            df = df.select(
                *[c for c in df.columns if c != "event"],
                F.col("event.data.*"),
            )
        _write_batch(
            df, batch_id, os.path.join(self.base_dir, "routed", _sanitize(schema_id))
        )

    def dead_letter(self, df: DataFrame, batch_id: int) -> None:
        _write_batch(df, batch_id, os.path.join(self.base_dir, "dead_letter"))

    def unknown(self, df: DataFrame, batch_id: int) -> None:
        _write_batch(df, batch_id, os.path.join(self.base_dir, "unknown"))
