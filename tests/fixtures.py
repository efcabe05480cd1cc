"""Streaming fixtures for the routing engine (FIXTURES.md §B, seed-free:
fully deterministic literals shaped like the reference's example batch,
lib/kinesisHandler.js:19-57)."""

from __future__ import annotations

import base64
import datetime as dt
import json

VENDOR = "com.example"
STREAM_SCHEMA_ID = f"{VENDOR}/retail-stream/1-0-0"
PRODUCT_CREATE_ID = f"{VENDOR}/product-create/1-0-0"
PRODUCT_PURCHASE_ID = f"{VENDOR}/product-purchase/1-0-0"
UNREGISTERED_ID = f"{VENDOR}/mystery-event/9-9-9"

ENVELOPE_JSON_SCHEMA = {
    "self": {"vendor": VENDOR, "name": "retail-stream", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string", "pattern": "^com\\.example/retail-stream/"},
        "origin": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["schema"],
            "properties": {"schema": {"type": "string"}},
        },
    },
}

PRODUCT_CREATE_SCHEMA = {
    "self": {"vendor": VENDOR, "name": "product-create", "version": "1-0-0"},
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
                "category": {
                    "type": "string",
                    "enum": ["Sweaters", "Pants", "Shoes"],
                },
                "price": {"type": "number", "minimum": 0},
            },
        },
    },
}

PRODUCT_PURCHASE_SCHEMA = {
    "self": {"vendor": VENDOR, "name": "product-purchase", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["schema", "id", "quantity"],
            "properties": {
                "schema": {"type": "string"},
                "id": {"type": "string"},
                "quantity": {"type": "integer", "minimum": 1, "maximum": 100},
            },
        },
    },
}


def payload(data_schema: str, envelope_schema: str = STREAM_SCHEMA_ID, **data):
    return {
        "schema": envelope_schema,
        "origin": "fixtures/test",
        "data": {"schema": data_schema, **data},
    }


def b64(obj) -> str:
    raw = obj if isinstance(obj, (bytes, str)) else json.dumps(obj)
    if isinstance(raw, str):
        raw = raw.encode("utf-8")
    return base64.b64encode(raw).decode("ascii")


_TS0 = dt.datetime(2024, 1, 15, 12, 0, 0)


def record(data_b64: str | None, pk: str = "pk-0", seq: int = 0):
    """One Kinesis-shaped envelope row (order matches ENVELOPE_SCHEMA)."""
    return (
        pk,
        f"{seq:021d}",
        data_b64,
        _TS0 + dt.timedelta(seconds=seq),
        f"shardId-000000000000:{seq:021d}",
        "aws:kinesis",
        "arn:aws:kinesis:us-west-2:000000000000:stream/test-stream",
        "us-west-2",
    )


def batch_ok() -> list:
    """Valid records across 2 registered schemas, 2 partition keys."""
    rows = []
    for i, (pk, cat) in enumerate(
        [("pk-a", "Sweaters"), ("pk-b", "Pants"), ("pk-a", "Shoes")]
    ):
        rows.append(
            record(
                b64(payload(PRODUCT_CREATE_ID, id=f"prod-{i}", category=cat, price=9.5 + i)),
                pk=pk,
                seq=i,
            )
        )
    for i in range(3, 5):
        rows.append(
            record(
                b64(payload(PRODUCT_PURCHASE_ID, id=f"prod-{i}", quantity=i)),
                pk="pk-b",
                seq=i,
            )
        )
    return rows


def batch_unknown_schema() -> list:
    return [record(b64(payload(UNREGISTERED_ID, id="x")), seq=10)]


def batch_bad_base64() -> list:
    return [record("!!!not-base64!!!", seq=20)]


def batch_bad_json() -> list:
    return [record(b64(b"{this is not json"), seq=21)]


def batch_no_schema_field() -> list:
    return [record(b64({"data": {"schema": PRODUCT_CREATE_ID}}), seq=22)]


def batch_wrong_envelope_schema() -> list:
    return [
        record(
            b64(payload(PRODUCT_CREATE_ID, envelope_schema="com.other/stream/0-0-1",
                        id="p", category="Sweaters")),
            seq=23,
        )
    ]


def batch_invalid_data() -> list:
    return [
        # missing required `category`
        record(b64(payload(PRODUCT_CREATE_ID, id="p1")), seq=24),
        # enum violation
        record(b64(payload(PRODUCT_CREATE_ID, id="p2", category="Hats")), seq=25),
        # range violation (quantity 0 < minimum 1)
        record(b64(payload(PRODUCT_PURCHASE_ID, id="p3", quantity=0)), seq=26),
    ]


def batch_missing_kinesis_data() -> list:
    return [record(None, seq=27)]


def batch_ordered() -> list:
    """Interleaved partition keys with per-key sequence numbers."""
    rows = []
    seq = 0
    for round_ in range(4):
        for pk in ("pk-x", "pk-y", "pk-z"):
            rows.append(
                record(
                    b64(payload(PRODUCT_PURCHASE_ID, id=f"{pk}-{round_}", quantity=round_ + 1)),
                    pk=pk,
                    seq=seq,
                )
            )
            seq += 1
    return rows
