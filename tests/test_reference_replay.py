"""Recorded-envelope replay: the reference's OWN documented sample batch
(lib/kinesisHandler.js:19-57) driven end-to-end through
``envelope_json_stream`` -> ``RoutingEngine.run_stream``.

Provenance is byte-exact where the reference records bytes:

* every envelope metadata field (partition keys, sequence numbers,
  arrival timestamps, event IDs, source ARNs, region) is copied verbatim
  from the doc-comment batch;
* the two ``kinesis.data`` base64 payloads are elided in the reference
  (``eyJzY2hlbWEi...[...]...ifX0=``), so they are RECONSTRUCTED here —
  and the test asserts the reconstruction's base64 starts and ends with
  the literal recorded fragments, i.e. it matches the published bytes
  everywhere the reference published any.  The reconstructed JSON uses
  the vendor/schema-id shapes the reference's ``makeSchemaId`` implies
  (lib/kinesisHandler.js:15-17) and the category visible in the decoded
  suffix ("Sweaters for Men").
"""

from __future__ import annotations

import base64
import datetime as dt
import json

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_handler_spark.io import envelope_json_stream
from kinesis_handler_spark.routing import ENVELOPE_SCHEMA, RoutingEngine

# --- the reference's recorded batch, lib/kinesisHandler.js:19-57 -------

#: Recorded base64 fragments of the two record payloads (the middle is
#: elided as "[...]" in the reference's doc comment).
DATA_B64_PREFIX = "eyJzY2hlbWEiOiJjb20ubm9yZHN0cm9tL3JldGFpb"
DATA_B64_SUFFIX_1 = "Y3NDQiLCJjYXRlZ29yeSI6IlN3ZWF0ZXJzIGZvciBNZW4ifX0="
DATA_B64_SUFFIX_2 = "I3MyIsImNhdGVnb3J5IjoiU3dlYXRlcnMgZm9yIE1lbiJ9fQ=="

#: Reconstructed payloads: chosen so that base64(payload) matches BOTH
#: the recorded prefix and the recorded suffix exactly (verified by
#: test_reconstruction_matches_recorded_bytes below).  Everything the
#: suffixes decode to ('...6744","category":"Sweaters for Men"}}' /
#: '...273","category":"Sweaters for Men"}}') is preserved verbatim.
PAYLOAD_1 = (
    '{"schema":"com.nordstrom/retail-stream/1-0-0",'
    '"origin":"hello-retail/producer",'
    '"data":{"schema":"com.nordstrom/product/create/1-0-0",'
    '"id":"4576744","category":"Sweaters for Men"}}'
)
PAYLOAD_2 = (
    '{"schema":"com.nordstrom/retail-stream/1-0-0",'
    '"origin":"hello-retail/product-producer",'
    '"data":{"schema":"com.nordstrom/product/create/1-0-0",'
    '"id":"4580273","category":"Sweaters for Men"}}'
)

#: Envelope metadata copied verbatim from the reference's sample batch.
SAMPLE_RECORDS = [
    {
        "partitionKey": "undefined",
        "sequenceNumber": "49568749374218235080373793662003016116473266703358230578",
        "payload": PAYLOAD_1,
        "approximateArrivalTimestamp": 1484245766.362,
        "eventID": "shardId-000000000003:49568749374218235080373793662003016116473266703358230578",
        "eventSource": "aws:kinesis",
        "eventSourceARN": "arn:aws:kinesis:us-west-2:123456789012:stream/devRetailStream",
        "awsRegion": "us-west-2",
    },
    {
        "partitionKey": "undefined",
        "sequenceNumber": "49568749374218235080373793662021150003767486140978823218",
        "payload": PAYLOAD_2,
        "approximateArrivalTimestamp": 1484245766.739,
        "eventID": "shardId-000000000003:49568749374218235080373793662021150003767486140978823218",
        "eventSource": "aws:kinesis",
        "eventSourceARN": "arn:aws:kinesis:us-west-2:123456789012:stream/devRetailStream",
        "awsRegion": "us-west-2",
    },
]

# Schemas shaped the way the reference's makeSchemaId expects
# (lib/kinesisHandler.js:15-17: `${vendor}/${name}/${version}`).
RETAIL_STREAM_SCHEMA = {
    "self": {"vendor": "com.nordstrom", "name": "retail-stream", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string", "pattern": "^com\\.nordstrom/retail-stream/"},
        "origin": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["schema"],
            "properties": {"schema": {"type": "string"}},
        },
    },
}
PRODUCT_CREATE_SCHEMA = {
    "self": {
        "vendor": "com.nordstrom",
        "name": "product/create",
        "version": "1-0-0",
    },
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string"},
        "origin": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["schema", "id", "category"],
            "properties": {
                "schema": {"type": "string"},
                "id": {"type": "string", "minLength": 1},
                "category": {"type": "string"},
            },
        },
    },
}
PRODUCT_CREATE_ID = "com.nordstrom/product/create/1-0-0"


def test_reconstruction_matches_recorded_bytes():
    """The reconstructed payloads agree with every byte the reference
    actually recorded: base64 prefix AND suffix of both records."""
    for payload, suffix in (
        (PAYLOAD_1, DATA_B64_SUFFIX_1),
        (PAYLOAD_2, DATA_B64_SUFFIX_2),
    ):
        enc = base64.b64encode(payload.encode("utf-8")).decode("ascii")
        assert enc.startswith(DATA_B64_PREFIX)
        assert enc.endswith(suffix)
    # and the decoded suffixes really say what the test claims they say
    assert base64.b64decode(DATA_B64_SUFFIX_1[2:]).endswith(
        b'","category":"Sweaters for Men"}}'
    )


def test_reference_sample_batch_replays_end_to_end(spark, tmp_path):
    """Drive the reference's sample batch through the streaming engine:
    both records decode, validate against the retail-stream envelope,
    and route to the registered product/create handler."""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "sample_batch.json", "w") as fh:
        for rec in SAMPLE_RECORDS:
            row = {
                "partitionKey": rec["partitionKey"],
                "sequenceNumber": rec["sequenceNumber"],
                "data": base64.b64encode(
                    rec["payload"].encode("utf-8")
                ).decode("ascii"),
                "approximateArrivalTimestamp": dt.datetime.fromtimestamp(
                    rec["approximateArrivalTimestamp"], dt.timezone.utc
                ).isoformat(),
                "eventID": rec["eventID"],
                "eventSource": rec["eventSource"],
                "eventSourceARN": rec["eventSourceARN"],
                "awsRegion": rec["awsRegion"],
            }
            fh.write(json.dumps(row) + "\n")

    engine = RoutingEngine(RETAIL_STREAM_SCHEMA)
    engine.register(PRODUCT_CREATE_SCHEMA, lambda df: df)

    out = tmp_path / "out"

    def routed_sink(sid: str, df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(f"{out}/routed/{sid.replace('/', '_')}")

    def dead_sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(f"{out}/dead_letter")

    q = engine.run_stream(
        envelope_json_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ckpt"),
        routed_sink=routed_sink,
        dead_letter_sink=dead_sink,
    )
    q.awaitTermination(120)

    routed = spark.read.parquet(
        f"{out}/routed/{PRODUCT_CREATE_ID.replace('/', '_')}"
    )
    rows = sorted(
        routed.select(
            "sequenceNumber",
            "event.origin",
            "event.data.id",
            "event.data.category",
        ).collect()
    )
    assert [r["sequenceNumber"] for r in rows] == [
        SAMPLE_RECORDS[0]["sequenceNumber"],
        SAMPLE_RECORDS[1]["sequenceNumber"],
    ]
    assert [r["id"] for r in rows] == ["4576744", "4580273"]
    assert {r["category"] for r in rows} == {"Sweaters for Men"}
    # nothing dead-letters: the reference's own sample is a clean batch
    # (the sink still writes an empty frame per micro-batch, so check
    # row count, not directory existence)
    import os

    if os.path.exists(f"{out}/dead_letter"):
        assert spark.read.parquet(f"{out}/dead_letter").count() == 0
