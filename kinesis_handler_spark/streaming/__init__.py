"""Streaming stateful operators (SURVEY.md §2.B streaming table).

The reference has no event-time logic (only arrival timestamps,
lib/kinesisHandler.js:29); these operators are the north-star streaming
surface: event-time windows with watermarks, streaming dedup, and
custom per-key state — all on Structured Streaming's incremental
execution + state store.
"""

from kinesis_handler_spark.streaming.rollup import (
    read_rollup,
    rollup_stream,
    rollup_with_tail,
    write_rollup_batch,
)
from kinesis_handler_spark.streaming.windows import (
    session_aggregate,
    stream_static_enrich,
    stream_stream_interval_join,
    sliding_aggregate,
    stream_dedup,
    stateful_heavy_hitters,
    stateful_running_totals,
    stateful_user_stats_tws,
    tumbling_aggregate,
)

__all__ = [
    "read_rollup",
    "rollup_stream",
    "rollup_with_tail",
    "write_rollup_batch",
    "tumbling_aggregate",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "sliding_aggregate",
    "session_aggregate",
    "stream_dedup",
    "stateful_heavy_hitters",
    "stateful_running_totals",
    "stateful_user_stats_tws",
]
