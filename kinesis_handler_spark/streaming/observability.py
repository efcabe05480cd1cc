"""Streaming observability (reference R15 batch completion + R18
logging, lib/kinesisHandler.js:134,146-148,157 — reimagined without the
per-record payload logging that cannot survive 100 TB/day).

``RoutingMetricsListener`` collects, per completed micro-batch: batch
id, input row count, processing rates, and any ``observe`` metrics the
engine attached (``routing_ingest.records``). Attach once per session;
query state from tests or ops tooling instead of scraping logs.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    query_id: str
    batch_id: int
    num_input_rows: int
    observed: dict[str, int] = field(default_factory=dict)


class RoutingMetricsListener(StreamingQueryListener):
    """Collects per-batch completion metrics (the engine's replacement
    for the reference's `console.log` batch accounting)."""

    def __init__(self, max_batches: int = 1000) -> None:
        # Ring buffer, not a list: a 24/7 stream triggering every few
        # seconds would otherwise grow driver memory without bound.  The
        # cap keeps the recent window for ops tooling; long-horizon
        # accounting belongs in a metrics sink, not the listener.
        self.batches: deque[BatchMetrics] = deque(maxlen=max_batches)
        self.terminated: list[str] = []

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = {}
        for name, row in (p.observedMetrics or {}).items():
            observed.update({f"{name}.{k}": v for k, v in row.asDict().items()})
        self.batches.append(
            BatchMetrics(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                observed=observed,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    # convenience ------------------------------------------------------
    def total_input_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)


def attach_metrics_listener(spark: SparkSession) -> RoutingMetricsListener:
    """Create + register a listener; caller detaches with
    ``spark.streams.removeListener(listener)``."""
    listener = RoutingMetricsListener()
    spark.streams.addListener(listener)
    return listener
