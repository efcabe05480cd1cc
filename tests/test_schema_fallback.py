"""JSON-Schema composition fallback tier (SURVEY.md §7 hard part (a)):
schemas using $ref / oneOf / anyOf / allOf / format compile to the
jsonschema-in-pandas-UDF path while the typed subset keeps the JVM
predicate fast path.  The reference gets all of this free from AJV
(lib/kinesisHandler.js:83-84,93); these tests pin that a user porting
real composed event schemas can register them here too."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_handler_spark.routing import ENVELOPE_SCHEMA, RoutingEngine
from kinesis_handler_spark.routing.engine import REASON_DATA_INVALID
from kinesis_handler_spark.routing.schema_compiler import (
    UnsupportedSchemaError,
    compile_schema,
)
from tests import fixtures as fx

VENDOR = "com.example"
COUPON_ID = f"{VENDOR}/coupon-apply/1-0-0"

# A composed data schema of the shape real event registries carry:
# intra-document $ref into definitions, a oneOf union (percentage XOR
# fixed-amount discount), format assertions, and a pattern.
COUPON_SCHEMA = {
    "self": {"vendor": VENDOR, "name": "coupon-apply", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string"},
        "origin": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["schema", "discount"],
            "properties": {
                "schema": {"type": "string"},
                "issued": {"type": "string", "format": "date-time"},
                "client_ip": {"type": "string", "format": "ipv4"},
                "discount": {"$ref": "#/definitions/discount"},
            },
        },
    },
    "definitions": {
        "discount": {
            "oneOf": [
                {
                    "type": "object",
                    "required": ["pct"],
                    "properties": {
                        "pct": {"type": "number", "minimum": 0, "maximum": 100}
                    },
                },
                {
                    "type": "object",
                    "required": ["amount", "currency"],
                    "properties": {
                        "amount": {"type": "number", "exclusiveMinimum": 0},
                        "currency": {"type": "string", "pattern": "^[A-Z]{3}$"},
                    },
                },
            ]
        }
    },
}


def identity_handler(df: DataFrame) -> DataFrame:
    return df


def coupon_payload(**data):
    return fx.payload(COUPON_ID, **data)


# -- compilation tier selection / struct derivation -----------------------


def test_fast_path_schema_stays_jvm():
    assert compile_schema(fx.PRODUCT_CREATE_SCHEMA).mode == "jvm"


def test_composed_schema_selects_python_fallback():
    compiled = compile_schema(COUPON_SCHEMA)
    assert compiled.mode == "python"
    assert compiled.schema_id == COUPON_ID


def test_fallback_struct_inlines_refs_and_merges_oneof_branches():
    compiled = compile_schema(COUPON_SCHEMA)
    data_t = dict(zip(compiled.struct.fieldNames(), compiled.struct.fields))[
        "data"
    ].dataType
    discount_t = dict(
        (f.name, f.dataType) for f in data_t.fields
    )["discount"]
    # union-merge of both oneOf branches: pct + amount + currency
    assert isinstance(discount_t, T.StructType)
    assert discount_t.fieldNames() == ["amount", "currency", "pct"]
    assert discount_t["pct"].dataType == T.DoubleType()
    assert discount_t["currency"].dataType == T.StringType()


def test_recursive_ref_fails_fast():
    doc = {
        "self": {"vendor": VENDOR, "name": "rec", "version": "1-0-0"},
        "type": "object",
        "properties": {"node": {"$ref": "#/properties/node"}},
    }
    with pytest.raises(UnsupportedSchemaError, match="recursive"):
        compile_schema(doc)


def test_external_ref_fails_fast():
    doc = {
        "self": {"vendor": VENDOR, "name": "ext", "version": "1-0-0"},
        "type": "object",
        "properties": {"x": {"$ref": "https://example.com/other.json#/x"}},
    }
    with pytest.raises(UnsupportedSchemaError, match="intra-document"):
        compile_schema(doc)


def test_dangling_ref_fails_fast():
    doc = {
        "self": {"vendor": VENDOR, "name": "dangle", "version": "1-0-0"},
        "type": "object",
        "properties": {"x": {"$ref": "#/definitions/missing"}},
    }
    with pytest.raises(UnsupportedSchemaError, match="not found"):
        compile_schema(doc)


def test_keywords_outside_both_tiers_still_fail_fast():
    doc = {
        "self": {"vendor": VENDOR, "name": "pp", "version": "1-0-0"},
        "type": "object",
        "oneOf": [{"type": "object"}],
        "if": {"type": "object"},
        "then": {"type": "object"},
    }
    with pytest.raises(UnsupportedSchemaError, match="if"):
        compile_schema(doc)


def test_pattern_properties_rides_the_fallback_tier(spark):
    doc = {
        "self": {"vendor": VENDOR, "name": "pp", "version": "1-0-0"},
        "type": "object",
        "required": ["schema"],
        "properties": {"schema": {"type": "string"}},
        "patternProperties": {"^x_": {"type": "integer"}},
        "additionalProperties": False,
    }
    compiled = compile_schema(doc)
    assert compiled.mode == "python"
    # static properties stay typed; pattern-matched fields are validated
    # (full jsonschema fidelity) but not surfaced as typed columns
    assert compiled.struct.fieldNames() == ["schema"]
    import jsonschema

    clean = {k: v for k, v in doc.items() if k != "self"}
    for obj in (
        {"schema": "s", "x_a": 1},
        {"schema": "s", "x_a": "not-an-int"},
        {"schema": "s", "rogue": 1},
        {"x_a": 2},
    ):
        assert jsonschema.validators.validator_for(clean)(clean).is_valid(
            obj
        ) == _fallback_verdict(compiled, obj)


def _fallback_verdict(compiled, obj) -> bool:
    # drive the SAME pandas-UDF validator body the engine ships, via a
    # local pandas call (no Spark needed for a verdict check)
    import json

    import pandas as pd

    from kinesis_handler_spark.routing.schema_compiler import _jsonschema_udf

    udf = _jsonschema_udf(compiled.doc)
    return bool(udf.func(pd.Series([json.dumps(obj)]))[0])


def test_fallback_has_no_jvm_predicate(spark):
    compiled = compile_schema(COUPON_SCHEMA)
    with pytest.raises(UnsupportedSchemaError, match="fallback-mode"):
        compiled.predicate(F.col("x"))


# -- end-to-end routing with a composed schema registered -----------------


@pytest.fixture()
def engine() -> RoutingEngine:
    eng = RoutingEngine(fx.ENVELOPE_JSON_SCHEMA)
    eng.register(fx.PRODUCT_CREATE_SCHEMA, identity_handler)  # jvm tier
    eng.register(COUPON_SCHEMA, identity_handler)  # python tier
    return eng


def coupon_batch():
    good_pct = coupon_payload(
        discount={"pct": 25.0}, issued="2024-01-15T12:00:00Z"
    )
    good_amount = coupon_payload(
        discount={"amount": 5.0, "currency": "USD"}, client_ip="10.1.2.3"
    )
    # matches BOTH oneOf branches => oneOf violation
    bad_both = coupon_payload(
        discount={"pct": 10.0, "amount": 5.0, "currency": "USD"}
    )
    bad_format = coupon_payload(
        discount={"pct": 10.0}, issued="yesterday at noon"
    )
    bad_pattern = coupon_payload(discount={"amount": 5.0, "currency": "usd"})
    rows = [
        fx.record(fx.b64(p), seq=i)
        for i, p in enumerate(
            [good_pct, good_amount, bad_both, bad_format, bad_pattern]
        )
    ]
    return rows


def test_routing_with_oneof_schema_registered(spark, engine):
    df = spark.createDataFrame(coupon_batch(), ENVELOPE_SCHEMA)
    result = engine.process_batch(df)
    m = result.metrics()
    assert m[f"routed.{COUPON_ID}"] == 2
    assert m["dead_letter"] == 3
    dead = result.dead_letter.collect()
    assert {r["reason"] for r in dead} == {REASON_DATA_INVALID}
    # handler sees typed columns from the union-merged struct
    rows = (
        result.routed[COUPON_ID]
        .select(
            "event.data.discount.pct",
            "event.data.discount.amount",
            "event.data.discount.currency",
        )
        .collect()
    )
    got = {(r["pct"], r["amount"], r["currency"]) for r in rows}
    assert got == {(25.0, None, None), (None, 5.0, "USD")}


def test_mixed_tier_batch_keeps_jvm_branch_green(spark, engine):
    # jvm-tier records and python-tier records in one batch route
    # independently; the fallback UDF only decides the coupon branch.
    rows = fx.batch_ok() + coupon_batch()
    result = engine.process_batch(spark.createDataFrame(rows, ENVELOPE_SCHEMA))
    m = result.metrics()
    assert m[f"routed.{fx.PRODUCT_CREATE_ID}"] == 3
    assert m[f"routed.{COUPON_ID}"] == 2
    assert m["dead_letter"] == 3


def test_jvm_only_engine_plan_has_no_python_stage(spark):
    # The fallback must cost nothing when unused: an engine with only
    # fast-path schemas keeps the whole enrich plan JVM-side.
    eng = RoutingEngine(fx.ENVELOPE_JSON_SCHEMA)
    eng.register(fx.PRODUCT_CREATE_SCHEMA, identity_handler)
    df = spark.createDataFrame(fx.batch_ok(), ENVELOPE_SCHEMA)
    enriched = eng._enrich(df)
    plan = enriched._sc._jvm.PythonSQLUtils.explainString(
        enriched._jdf.queryExecution(), "simple"
    )
    assert "EvalPython" not in plan and "Pandas" not in plan


def test_nested_keyword_check_reaches_dependencies_and_tuple_items():
    # review finding (round 5): keywords hidden under dependencies /
    # dependentSchemas values or draft-4 tuple-form items must still be
    # screened at registration - an external $ref there previously
    # slipped past the fail-fast and exploded per-record at runtime.
    base = {"self": {"vendor": VENDOR, "name": "dep", "version": "1-0-0"},
            "type": "object"}
    with pytest.raises(UnsupportedSchemaError, match="external|intra"):
        compile_schema({
            **base,
            "dependencies": {"a": {"$ref": "https://example.com/ext.json"}},
        })
    with pytest.raises(UnsupportedSchemaError, match="external|intra"):
        compile_schema({
            **base,
            "properties": {
                "xs": {"type": "array",
                       "items": [{"$ref": "https://example.com/e.json"}]},
            },
        })
    # benign forms of the same shapes compile to the fallback tier with
    # a usable struct (tuple items merge into one element type)
    ok = compile_schema({
        **base,
        "properties": {
            "xs": {"type": "array",
                   "items": [{"type": "integer"}, {"type": "integer"}]},
            "flag": {"type": "string"},
        },
        "dependencies": {"flag": ["xs"]},
    })
    assert ok.mode == "python"
    assert ok.struct["xs"].dataType.simpleString() == "array<bigint>"
