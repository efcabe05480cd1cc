"""Event-time windowed aggregation, watermarking, streaming dedup, and
custom per-key state.

All helpers accept either a streaming or a batch DataFrame (Spark's
unified semantics) — tests exercise both: batch for value assertions,
streaming for watermark/state behavior.

Scale notes: windowed aggregation shuffles on (key, window) — state per
group is O(1); session windows and dedup keep per-key state bounded by
the watermark delay; state-store backend is RocksDB-capable via
``spark.sql.streaming.stateStore.providerClass`` at deployment.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesis_handler_spark.functions.worker_tune import tune_python_worker, tuned
from kinesis_handler_spark.functions.numeric import dec


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Watermarks apply only to streaming plans; on batch inputs
    withWatermark is a no-op, so it is safe to set unconditionally."""
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "10 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Non-overlapping event-time windows: count + exact-decimal sum per
    (window, key).  Late rows beyond the watermark are dropped (the
    engine's late-data policy; the reference has none — arrival time
    only)."""
    d = _with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(value_col)).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
            "total",
        )
    )


def sliding_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Overlapping windows (each row lands in window/slide buckets)."""
    d = _with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def session_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Session windows: a session extends while events arrive within
    ``gap`` of the previous one; state closes when the watermark passes
    session end (bounded state — required at 100 TB)."""
    d = _with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_dedup(
    df: DataFrame,
    keys: Iterable[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes — the only dedup that survives an unbounded
    stream."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stateful_running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running event count + value total maintained across micro-batches
    (the engine's analogue of the reference's per-key handler state in
    ordered mode, R16).  Emits one row per key per micro-batch."""

    # key type derived from the input frame — a hardcoded 'long' would
    # fail Arrow conversion for string/other keys at runtime
    key_type = df.schema[key_col].dataType.simpleString()
    output_schema = f"{key_col} {key_type}, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        tuned(update),
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_heavy_hitters(
    df: DataFrame,
    token_col: str = "event_type",
    n_buckets: int = 8,
    capacity: int = 256,
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state on an unbounded token
    vocabulary: the streaming twin of the batch `text_heavy_hitters`
    operator (queries/corpus.py).  Tokens are hash-partitioned into
    ``n_buckets`` groups; each group's state is one mergeable
    Misra-Gries summary of at most ``capacity`` counters, updated per
    micro-batch with the same subtract-the-(k+1)-th-largest compression
    (Agarwal et al., PODS'12).  Total state is ``n_buckets × capacity``
    counters FOREVER, however many distinct tokens the stream carries —
    the property that makes this survive an unbounded stream where a
    per-token count state (plain streaming wordcount) grows without
    bound.

    Emits, per bucket per micro-batch, the current candidate set with
    MG lower-bound counts: true_count - stream_len/(capacity+1) <=
    emitted cnt <= true_count, and every token whose true frequency
    share exceeds 1/(capacity+1) is guaranteed present.  Downstream, an
    exact batch count over the candidates turns this into the exact
    top-k (same two-phase shape as the batch tier)."""
    # NULL tokens carry no frequency information — drop them explicitly
    # (pandas value_counts would silently skip NaN anyway; making it a
    # filter keeps the contract visible and the bucket hash total).
    bucketed = df.filter(F.col(token_col).isNotNull()).select(
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(token_col).cast("string").alias("tok"),
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        counts: dict[str, int]
        if state.exists:
            toks, cnts = state.get
            counts = dict(zip(toks, cnts))
        else:
            counts = {}
        for pdf in pdfs:
            for tok, c in pdf["tok"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > capacity:
                s = pd.Series(counts)
                s = s - s.nlargest(capacity + 1).iloc[-1]
                counts = {t: int(c) for t, c in s[s > 0].items()}
        state.update((list(counts), [int(c) for c in counts.values()]))
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(counts),
                "tok": list(counts),
                "cnt": [int(c) for c in counts.values()],
            }
        )

    return bucketed.groupBy("bucket").applyInPandasWithState(
        tuned(update),
        outputStructType="bucket int, tok string, cnt long",
        stateStructType="toks array<string>, cnts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _UserSessionStats(StatefulProcessor):
    """Per-key first-seen / last-seen / count / total via the Spark 4
    ``transformWithState`` arbitrary-state API: typed ValueState with a
    TTL, so abandoned keys age out of the state store without a custom
    timeout loop (state hygiene the GroupState API leaves to the user)."""

    def __init__(
        self,
        value_col: str,
        ttl_ms: int | None,
        key_col: str = "user_id",
        ts_col: str = "ts",
    ):
        self._value_col = value_col
        self._ttl_ms = ttl_ms
        self._key_col = key_col
        self._ts_col = ts_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        tune_python_worker()
        self._state = handle.getValueState(
            "stats",
            "first_us long, last_us long, n long, total double",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            first_us, last_us, n, total = self._state.get()
        else:
            first_us, last_us, n, total = None, None, 0, 0.0
        for pdf in rows:
            ts_us = pdf[self._ts_col].astype("int64") // 1000  # ns → µs
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            n += len(pdf)
            total += float(pdf[self._value_col].sum())
        self._state.update((first_us, last_us, n, total))
        yield pd.DataFrame(
            {
                self._key_col: [key[0]],
                "first_us": [first_us],
                "last_us": [last_us],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_stats_tws(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running stats on the ``transformWithStateInPandas`` API
    (the successor to ``applyInPandasWithState``; both are kept —
    `stateful_running_totals` shows the GroupState form). Emits one row
    per key per micro-batch; with ``state_ttl_ms`` set, idle keys'
    state expires automatically — bounded state on unbounded key
    spaces, which is what survives an unbounded stream at scale.

    Runtime note: the transformWithState Python driver worker requires
    the ``protobuf`` package; where absent (this container), the query
    fails at stream start — the pytest gate importorskips accordingly.
    """
    key_type = df.schema[key_col].dataType.simpleString()
    output_schema = (
        f"{key_col} {key_type}, first_us long, last_us long, "
        "n_events long, total_value double"
    )
    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_UserSessionStats(
            value_col, state_ttl_ms, key_col=key_col, ts_col=ts_col
        ),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="ProcessingTime" if state_ttl_ms else "None",
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    interval_seconds: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time interval:
    ``left.key == right.key AND right_ts ∈ [left_ts, left_ts +
    interval]``.  Both sides carry watermarks (``max_delay``) so the
    state store evicts rows once they can no longer match — without the
    time bound a stream-stream join's state grows without limit, the
    canonical unbounded-state mistake.  Outer variants additionally
    need the watermark to know when to emit unmatched rows.

    Works identically on batch frames (unified semantics) — tests
    assert values on batch and state behavior on streams.  At scale the
    join shuffles both sides on the key; the interval predicate prunes
    state, not parallelism.
    """
    lw = _with_watermark(left, left_ts, max_delay).alias("l")
    rw = _with_watermark(right, right_ts, max_delay).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {interval_seconds} SECONDS"))
    )
    return lw.join(rw, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream with a slowly-changing /
    static dimension table (the streaming analogue of the batch star
    join).  The static side is re-planned every micro-batch — so a dim
    refreshed in place is picked up on the next trigger without
    restarting the query — and is broadcast by default: no shuffle, no
    state store, unlike a stream-stream join.  Stateless, so any output
    mode works and watermarks are not required.

    At 100 TB of stream volume the dim broadcast is per-executor
    constant cost; for dims too big to broadcast, pass
    ``broadcast_dim=False`` to let AQE pick a shuffled join (the stream
    side then shuffles on the key every micro-batch — prefer pre-bucketing
    the dim in that regime)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=key, how=how)
