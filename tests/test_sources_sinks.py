"""io.sources / io.sinks: envelope-shaped stream sources and idempotent
parquet channel sinks (reference R4 ingest + R13/R14 sink semantics)."""

from __future__ import annotations

import json

import pytest

from kinesis_handler_spark.io.sinks import ParquetChannelSinks, _sanitize
from kinesis_handler_spark.io.sources import (
    envelope_json_stream,
    kinesis_source_options,
    kinesis_stream,
    rate_envelope_stream,
)
from kinesis_handler_spark.routing import ENVELOPE_SCHEMA, RoutingEngine
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


def test_kinesis_source_options_shape():
    opts = kinesis_source_options(
        "retail-stream",
        "us-west-2",
        starting_position="TRIM_HORIZON",
        max_fetch_rate_per_shard_mb=2,
    )
    assert opts == {
        "streamName": "retail-stream",
        "region": "us-west-2",
        "startingPosition": "TRIM_HORIZON",
        "maxFetchRatePerShard": "2",
    }


def test_kinesis_stream_gated_with_clear_error(spark):
    with pytest.raises(RuntimeError, match="Kinesis connector not available"):
        kinesis_stream(spark, "retail-stream", "us-west-2")


def test_envelope_json_stream_end_to_end(spark, engine, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "b0.json", fx.batch_ok() + fx.batch_bad_json())
    sinks = ParquetChannelSinks(str(tmp_path / "out"))
    q = engine.run_stream(
        envelope_json_stream(spark, str(src)),
        checkpoint_dir=str(tmp_path / "ck"),
        routed_sink=sinks.routed,
        dead_letter_sink=sinks.dead_letter,
        unknown_sink=sinks.unknown,
    )
    q.awaitTermination(120)
    routed = spark.read.parquet(
        f"{tmp_path}/out/routed/{_sanitize(fx.PRODUCT_CREATE_ID)}"
    )
    assert routed.count() == 3
    # routed output is flattened to the event's data fields
    assert {"id", "category", "price"} <= set(routed.columns)
    dead = spark.read.parquet(f"{tmp_path}/out/dead_letter")
    assert dead.count() == 1
    assert dead.select("reason").first()[0] == "unparseable-json"


def test_sink_replay_is_idempotent(spark, engine, tmp_path):
    # R14: a retried micro-batch rewrites its own batch_id partition
    # instead of appending duplicates — at-least-once in, exactly-once out.
    rows = spark.createDataFrame(fx.batch_ok(), ENVELOPE_SCHEMA)
    result = engine.process_batch(rows)
    sinks = ParquetChannelSinks(str(tmp_path / "out"))
    for _ in range(2):  # same batch_id delivered twice
        sinks.routed(fx.PRODUCT_PURCHASE_ID, result.routed[fx.PRODUCT_PURCHASE_ID], 7)
    routed = spark.read.parquet(
        f"{tmp_path}/out/routed/{_sanitize(fx.PRODUCT_PURCHASE_ID)}"
    )
    assert routed.count() == 2
    assert routed.select("batch_id").distinct().collect()[0][0] == 7


def test_rate_envelope_stream_drives_the_engine(spark, engine, tmp_path):
    payload = fx.b64(
        fx.payload(fx.PRODUCT_PURCHASE_ID, id="rate-p", quantity=3)
    )
    stream = rate_envelope_stream(
        spark, rows_per_second=50, payload_b64=payload, num_partitions=2
    )
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in ENVELOPE_SCHEMA.fields
    ]
    sinks = ParquetChannelSinks(str(tmp_path / "out"))
    q = engine.run_stream(
        stream,
        checkpoint_dir=str(tmp_path / "ck"),
        routed_sink=sinks.routed,
        dead_letter_sink=sinks.dead_letter,
        trigger_available_now=False,
    )
    try:
        # Poll PROGRESS, never processAllAvailable(): against a LIVE
        # rate source that call returns only if a trigger ever observes
        # zero new offsets, i.e. only when a whole micro-batch completes
        # inside one source second.  Batch time here is ~0.5-1.5 s
        # (foreachBatch + two parquet sink writes), so whether it
        # returns is a coin flip on machine load — measured hanging
        # FOREVER at ~1.1 s/batch while the stream itself was perfectly
        # healthy.  A reported numInputRows > 0 already means a batch
        # with rows COMMITTED (progress is emitted after addBatch), so
        # polling is the race-free completion signal.
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if sum(p.numInputRows for p in q.recentProgress) > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    routed = spark.read.parquet(
        f"{tmp_path}/out/routed/{_sanitize(fx.PRODUCT_PURCHASE_ID)}"
    )
    assert routed.count() >= 1
    assert routed.select("id").distinct().first()[0] == "rate-p"


def test_binaryfile_source_ingests_media_blobs(spark, tmp_path):
    # The multimodal ingestion path at scale: opaque media blobs land
    # as FILES (s3://bucket/audio/*.wav); Spark's binaryFile source
    # reads them as (path, modificationTime, length, content) without
    # any decode — decode happens downstream in the Arrow-batched
    # stages (io/multimodal.py).  Round trip: generate real RIFF/WAVE
    # blobs, write one file per media id, read back via binaryFile,
    # and prove content-exactness by decoding a read blob.
    from kinesis_handler_spark.io.multimodal import (
        decode_wav,
        make_wav_media_df,
    )

    media = (
        make_wav_media_df(spark, "/root/testdata/sf0.001")
        .limit(8)
        .collect()
    )
    blob_dir = tmp_path / "wavs"
    blob_dir.mkdir()
    by_id = {}
    for r in media:
        (blob_dir / f"{r['media_id']}.wav").write_bytes(bytes(r["content"]))
        by_id[r["media_id"]] = bytes(r["content"])

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(str(blob_dir))
    )
    rows = df.collect()
    assert len(rows) == len(by_id)
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content",
    }
    for r in rows:
        mid = int(r["path"].rsplit("/", 1)[-1].removesuffix(".wav"))
        assert r["length"] == len(by_id[mid])
        assert bytes(r["content"]) == by_id[mid]
    # decode one read-back blob end-to-end: still a valid WAV
    rate, channels, samples = decode_wav(bytes(rows[0]["content"]))
    assert rate > 0 and channels == 1 and len(samples) > 0


def test_avro_container_round_trip_and_dead_letter(spark, sf_dir, tmp_path):
    """The hand-rolled Avro OCF codec (io/avro.py): value-exact
    write->read round trip through the DISTRIBUTED reader (binaryFile +
    mapInPandas), and the dead-letter contract on corrupt containers."""
    import math

    import pytest
    from pyspark.sql import types as T

    from kinesis_handler_spark.io.avro import (
        decode_container,
        read_avro,
        write_container,
    )

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "x", "type": ["null", "double"]},
        ],
    }
    rows = [
        {"k": 1, "s": "a", "x": 1.5},
        {"k": -(2**62), "s": None, "x": float("nan")},
        {"k": 2**62, "s": "ü≠🎉", "x": -0.0},
        {"k": 0, "s": "", "x": None},
    ]
    avro_dir = tmp_path / "avro"
    avro_dir.mkdir()
    (avro_dir / "part-0000.avro").write_bytes(write_container(rows, schema))
    spark_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    back = sorted(
        read_avro(spark, str(avro_dir), spark_schema).collect(),
        key=lambda r: r["k"],
    )
    want = sorted(rows, key=lambda r: r["k"])
    assert len(back) == len(want)
    for got, exp in zip(back, want):
        assert got["k"] == exp["k"] and got["s"] == exp["s"]
        if exp["x"] is not None and math.isnan(exp["x"]):
            # ADVICE r8: NaN must SURVIVE ingest as a value — the reader
            # builds double columns as masked FloatingArrays so only
            # true Avro nulls become NULL, and NaN stays distinguishable
            # (COUNT(x) and null-sensitive aggregates match the source).
            assert got["x"] is not None and math.isnan(got["x"])
        else:
            assert got["x"] == exp["x"]  # bit-copied doubles, incl. -0.0
    # true null stays null (the mask marks it, not NaN-folding)
    assert [r["x"] for r in back if r["k"] == 0] == [None]
    # the PURE decode layer preserves NaN bit-exactly too
    _, pure = decode_container(write_container(rows, schema))
    assert math.isnan([r["x"] for r in pure if r["k"] == -(2**62)][0])

    # dead-letter contract: malformed containers raise ValueError
    good = write_container(rows, schema)
    with pytest.raises(ValueError, match="bad magic"):
        decode_container(b"PAR1" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_container(good[:30])
    corrupt = bytearray(good)
    corrupt[-1] ^= 0xFF  # last sync-marker byte
    with pytest.raises(ValueError, match="sync marker mismatch"):
        decode_container(bytes(corrupt))
    # unknown codec is a structural error, not silent garbage
    bad_codec = write_container(rows, schema).replace(
        b"deflate", b"snappyy", 1
    )
    with pytest.raises(ValueError, match="unsupported codec"):
        decode_container(bad_codec)
    # a schema outside the supported subset is rejected up front
    with pytest.raises(ValueError, match="unsupported Avro"):
        write_container(
            [], {"type": "record", "name": "t",
                 "fields": [{"name": "m", "type": {"type": "map"}}]}
        )
