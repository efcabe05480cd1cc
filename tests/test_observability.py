"""R15/R18: per-batch completion metrics via observe + listener, with
no extra jobs and no per-record logging."""

from __future__ import annotations

import json
import time

import pytest

from kinesis_handler_spark.io.sinks import ParquetChannelSinks
from kinesis_handler_spark.io.sources import envelope_json_stream
from kinesis_handler_spark.routing import ENVELOPE_SCHEMA, RoutingEngine
from kinesis_handler_spark.streaming.observability import attach_metrics_listener
from tests import fixtures as fx


def _write_jsonl(path, rows) -> None:
    cols = [f.name for f in ENVELOPE_SCHEMA.fields]
    with open(path, "w") as fh:
        for row in rows:
            obj = dict(zip(cols, row))
            obj["approximateArrivalTimestamp"] = obj[
                "approximateArrivalTimestamp"
            ].isoformat()
            fh.write(json.dumps(obj) + "\n")


@pytest.fixture()
def engine() -> RoutingEngine:
    eng = RoutingEngine(fx.ENVELOPE_JSON_SCHEMA)
    eng.register(fx.PRODUCT_CREATE_SCHEMA, lambda df: df)
    eng.register(fx.PRODUCT_PURCHASE_SCHEMA, lambda df: df)
    return eng


def test_listener_reports_ingest_counts(spark, engine, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batch = fx.batch_ok() + fx.batch_bad_json() + fx.batch_unknown_schema()
    _write_jsonl(src / "b0.json", batch)

    listener = attach_metrics_listener(spark)
    try:
        sinks = ParquetChannelSinks(str(tmp_path / "out"))
        q = engine.run_stream(
            envelope_json_stream(spark, str(src)),
            checkpoint_dir=str(tmp_path / "ck"),
            routed_sink=sinks.routed,
            dead_letter_sink=sinks.dead_letter,
            unknown_sink=sinks.unknown,
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously after termination
        deadline = time.time() + 30
        while time.time() < deadline and listener.total_input_rows() < len(batch):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    assert listener.total_input_rows() == len(batch)
    with_observed = [b for b in listener.batches if b.observed]
    assert with_observed, "observe() metrics missing from progress events"
    assert (
        sum(b.observed.get("routing_ingest.records", 0) for b in with_observed)
        == len(batch)
    )
