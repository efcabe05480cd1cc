"""Unit tests: JSON-Schema → StructType + predicate compiler (R1-R3,
R9-R10 analogues; reference AJV compile at lib/kinesisHandler.js:83-99)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_handler_spark.routing.schema_compiler import (
    UnsupportedSchemaError,
    compile_schema,
    make_schema_id,
)
from tests.fixtures import ENVELOPE_JSON_SCHEMA, PRODUCT_CREATE_SCHEMA


def test_make_schema_id():
    assert make_schema_id(ENVELOPE_JSON_SCHEMA) == "com.example/retail-stream/1-0-0"
    with pytest.raises(ValueError):
        make_schema_id({"type": "object"})


def test_struct_shape():
    cs = compile_schema(PRODUCT_CREATE_SCHEMA)
    names = [f.name for f in cs.struct.fields]
    assert names == ["data", "origin", "schema"]  # sorted
    data_t = dict(zip(names, cs.struct.fields))["data"].dataType
    assert [f.name for f in data_t.fields] == ["category", "id", "price", "schema"]


def test_unsupported_keyword_fails_at_compile():
    # oneOf/$ref/format now route to the jsonschema fallback tier
    # (test_schema_fallback.py); keywords outside BOTH tiers still
    # fail fast at registration.
    bad = {
        "self": {"vendor": "v", "name": "n", "version": "1"},
        "type": "object",
        "properties": {"x": {"type": "string"}},
        "if": {"type": "object"},
        "then": {"required": ["x"]},
    }
    with pytest.raises(UnsupportedSchemaError):
        compile_schema(bad)


@pytest.mark.parametrize(
    ("payload", "expect"),
    [
        # valid
        ({"schema": "s", "data": {"schema": "d", "id": "a", "category": "Pants"}}, True),
        # missing required category
        ({"schema": "s", "data": {"schema": "d", "id": "a"}}, False),
        # enum violation
        ({"schema": "s", "data": {"schema": "d", "id": "a", "category": "Hats"}}, False),
        # minimum violation on optional price
        (
            {"schema": "s", "data": {"schema": "d", "id": "a", "category": "Shoes",
                                     "price": -1.0}},
            False,
        ),
        # minLength violation on id
        ({"schema": "s", "data": {"schema": "d", "id": "", "category": "Shoes"}}, False),
        # data object missing entirely
        ({"schema": "s"}, False),
    ],
)
def test_predicate_semantics(spark, payload, expect):
    import json

    cs = compile_schema(PRODUCT_CREATE_SCHEMA)
    df = spark.createDataFrame([(json.dumps(payload),)], "payload string")
    got = (
        df.select(cs.predicate(F.from_json("payload", cs.struct)).alias("ok"))
        .collect()[0]["ok"]
    )
    assert got is expect


def test_pattern_predicate(spark):
    cs = compile_schema(ENVELOPE_JSON_SCHEMA)
    good = '{"schema": "com.example/retail-stream/1-0-0", "data": {"schema": "x"}}'
    bad = '{"schema": "org.else/stream/1", "data": {"schema": "x"}}'
    df = spark.createDataFrame([(good,), (bad,)], "payload string")
    got = [
        r["ok"]
        for r in df.select(
            cs.predicate(F.from_json("payload", cs.struct)).alias("ok")
        ).collect()
    ]
    assert got == [True, False]


def test_draft4_boolean_exclusive_bounds_compile():
    # the reference's AJV is draft-04, where exclusiveMinimum is a
    # BOOLEAN modifier of minimum; compiling it as a numeric bound
    # produced `col > lit(True)` and killed the first micro-batch
    doc = {
        "self": {"vendor": "v", "name": "d4", "version": "1"},
        "type": "object",
        "required": ["q"],
        "properties": {
            "q": {"type": "number", "minimum": 0, "exclusiveMinimum": True},
            "r": {"type": "number", "maximum": 10, "exclusiveMaximum": False},
        },
    }
    compiled = compile_schema(doc)
    assert compiled.mode == "jvm"


def test_object_array_items_are_validated():
    # object-typed items with required/properties must produce a forall
    # predicate (previously only scalar item constraints triggered one)
    doc = {
        "self": {"vendor": "v", "name": "arr", "version": "1"},
        "type": "object",
        "required": ["xs"],
        "properties": {
            "xs": {
                "type": "array",
                "items": {
                    "type": "object",
                    "required": ["id"],
                    "properties": {
                        "id": {"type": "string", "minLength": 1},
                        "q": {"type": "integer", "minimum": 1},
                    },
                },
            },
        },
    }
    compiled = compile_schema(doc)
    assert compiled.mode == "jvm"
    pred = str(compiled.predicate(__import__("pyspark.sql.functions",
                                            fromlist=["col"]).col("x")))
    assert "forall" in pred


def test_constraining_additional_properties_rides_fallback():
    doc = {
        "self": {"vendor": "v", "name": "ap", "version": "1"},
        "type": "object",
        "required": ["a"],
        "properties": {"a": {"type": "string"}},
        "additionalProperties": False,
    }
    assert compile_schema(doc).mode == "python"
    # unconstrained forms keep the fast path
    doc["additionalProperties"] = True
    assert compile_schema(doc).mode == "jvm"
    del doc["additionalProperties"]
    assert compile_schema(doc).mode == "jvm"
