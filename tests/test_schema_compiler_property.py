"""Property-based check of the JSON-Schema → predicate compiler (R9/R10):
for payloads whose values carry the correct JSON types, the compiled
Spark predicate must classify exactly like the `jsonschema` library (the
Python stand-in for the reference's AJV, lib/kinesisHandler.js:83-84).

Type-mismatched payloads are excluded by construction: there the
documented semantics differ (from_json nullifies mistyped fields —
structural conformance — while jsonschema rejects), and that divergence
is covered deterministically in test_schema_compiler.py.
"""

from __future__ import annotations

import json

import jsonschema
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_handler_spark.routing.schema_compiler import compile_schema

SCHEMA = {
    "self": {"vendor": "com.example", "name": "prop-test", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string", "pattern": "^com\\.example/"},
        "origin": {"type": "string", "minLength": 3},
        "data": {
            "type": "object",
            "required": ["id", "category", "quantity"],
            "properties": {
                "id": {"type": "string", "minLength": 1, "maxLength": 10},
                "category": {"type": "string", "enum": ["A", "B", "C"]},
                "quantity": {"type": "integer", "minimum": 1, "maximum": 100},
                "price": {
                    "type": "number",
                    "exclusiveMinimum": 0.0,
                    "exclusiveMaximum": 1000.0,
                },
                "flag": {"type": "boolean", "const": True},
                "tags": {
                    "type": "array",
                    "items": {"type": "string", "minLength": 2, "maxLength": 8},
                    "minItems": 1,
                    "maxItems": 4,
                },
            },
        },
    },
}

ABSENT = object()

def _short_text(max_size: int):
    # printable ASCII only: astral-plane chars hit Java-vs-Python length
    # semantics (UTF-16 units vs code points) — a real divergence, but
    # not the one this test is pinning.
    return st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=max_size,
    )


def _maybe(value_strategy):
    """A field is either absent, valid, or drawn from a wider space."""
    return st.one_of(st.just(ABSENT), value_strategy)


payloads = st.fixed_dictionaries(
    {},
    optional={
        "schema": _maybe(
            st.one_of(st.just("com.example/prop-test/1-0-0"), _short_text(20))
        ),
        "origin": _maybe(_short_text(6)),
        "data": _maybe(
            st.fixed_dictionaries(
                {},
                optional={
                    "id": _maybe(_short_text(12)),
                    "category": _maybe(
                        st.sampled_from(["A", "B", "C", "D", "", "AA"])
                    ),
                    "quantity": _maybe(st.integers(-5, 105)),
                    "price": _maybe(
                        st.floats(
                            -10.0, 1010.0, allow_nan=False, allow_infinity=False
                        )
                    ),
                    "flag": _maybe(st.booleans()),
                    "tags": _maybe(
                        st.lists(_short_text(10), max_size=5)
                    ),
                },
            )
        ),
    },
)


def _strip_absent(obj):
    if isinstance(obj, dict):
        return {
            k: _strip_absent(v) for k, v in obj.items() if v is not ABSENT
        }
    return obj


def _jsonschema_ok(payload: dict) -> bool:
    doc = {k: v for k, v in SCHEMA.items() if k != "self"}
    try:
        jsonschema.validate(payload, doc)
        return True
    except jsonschema.ValidationError:
        return False


@pytest.fixture(scope="module")
def compiled():
    return compile_schema(SCHEMA)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(payloads, min_size=20, max_size=40))
def test_predicate_matches_jsonschema(spark, compiled, batch):
    cleaned = [_strip_absent(p) for p in batch]
    df = spark.createDataFrame(
        [(json.dumps(p),) for p in cleaned], "payload string"
    )
    got = [
        r.ok
        for r in df.select(
            F.coalesce(
                compiled.predicate(
                    F.from_json(F.col("payload"), compiled.struct)
                ),
                F.lit(False),
            ).alias("ok")
        ).collect()
    ]
    want = [_jsonschema_ok(p) for p in cleaned]
    mismatches = [
        (p, g, w) for p, g, w in zip(cleaned, got, want) if g != w
    ]
    assert not mismatches, f"first mismatch: {mismatches[0]}"


# -- composition fallback tier ($ref / oneOf / format) --------------------
# The fallback DELEGATES to jsonschema inside a pandas UDF, so agreement
# with the library is by construction — what this property pins is the
# PLUMBING: fallback-mode selection, raw-text (not struct) validation,
# null/parse-failure handling, and the worker-side validator
# construction (draft selection + FORMAT_CHECKER) staying equivalent to
# a driver-side jsonschema run.

FALLBACK_SCHEMA = {
    "self": {"vendor": "com.example", "name": "prop-fb", "version": "1-0-0"},
    "type": "object",
    "required": ["schema", "data"],
    "properties": {
        "schema": {"type": "string"},
        "data": {
            "type": "object",
            "required": ["discount"],
            "properties": {
                "issued": {"type": "string", "format": "date-time"},
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

discounts = st.fixed_dictionaries(
    {},
    optional={
        "pct": _maybe(st.floats(-10, 110, allow_nan=False, allow_infinity=False)),
        "amount": _maybe(st.floats(-1, 10, allow_nan=False, allow_infinity=False)),
        "currency": _maybe(st.sampled_from(["USD", "EUR", "usd", "US", ""])),
    },
)

fallback_payloads = st.fixed_dictionaries(
    {},
    optional={
        "schema": _maybe(_short_text(10)),
        "data": _maybe(
            st.fixed_dictionaries(
                {},
                optional={
                    "issued": _maybe(
                        st.sampled_from(
                            [
                                "2024-01-15T12:00:00Z",
                                "2024-13-45T99:00:00Z",
                                "yesterday",
                                "",
                            ]
                        )
                    ),
                    "discount": _maybe(discounts),
                },
            )
        ),
    },
)


def _jsonschema_fallback_ok(payload: dict) -> bool:
    # mirror _jsonschema_udf's construction exactly: strip `self`, pick
    # the draft validator, assert formats
    doc = {k: v for k, v in FALLBACK_SCHEMA.items() if k != "self"}
    cls = jsonschema.validators.validator_for(doc)
    validator = cls(doc, format_checker=cls.FORMAT_CHECKER)
    return validator.is_valid(payload)


@pytest.fixture(scope="module")
def compiled_fallback():
    from kinesis_handler_spark.routing.schema_compiler import compile_schema

    compiled = compile_schema(FALLBACK_SCHEMA)
    assert compiled.mode == "python"
    return compiled


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(fallback_payloads, min_size=10, max_size=25))
def test_fallback_validate_matches_jsonschema(spark, compiled_fallback, batch):
    cleaned = [_strip_absent(p) for p in batch]
    df = spark.createDataFrame(
        [(json.dumps(p),) for p in cleaned], "payload string"
    )
    got = [
        r.ok
        for r in df.select(
            F.coalesce(
                compiled_fallback.validate(
                    F.col("payload"),
                    F.from_json(F.col("payload"), compiled_fallback.struct),
                ),
                F.lit(False),
            ).alias("ok")
        ).collect()
    ]
    want = [_jsonschema_fallback_ok(p) for p in cleaned]
    mismatches = [
        (p, g, w) for p, g, w in zip(cleaned, got, want) if g != w
    ]
    assert not mismatches, f"first mismatch: {mismatches[0]}"


# -- type-fidelity tier (r7) ----------------------------------------------
# The r7 hostile-payload find: the variant->struct cast COERCES across
# JSON types (1.5 -> integer 1, "99" -> 99, 123 -> "123"), so the struct
# predicate alone cannot see type violations AJV rejects.  validate()
# with the variant column conjoins per-field token-type checks; this
# property pins that the full fast path now classifies MIS-TYPED
# payloads exactly like the jsonschema library.
#
# Carve-outs, both documented in the compiler: JSON null is
# null-as-absent on our side (referee strips nulls first), and array
# ITEM types keep cast semantics (strategy only generates well-typed
# array items).  Integers stay within int64 (beyond-int64 integrals are
# deliberately stricter than JS).

_typed = {
    "int": st.integers(-(2**63), 2**63 - 1),
    "float": st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
    "text": _short_text(8),
    "bool": st.booleans(),
    "null": st.none(),
}
_any_scalar = st.one_of(*_typed.values())

mistyped_payloads = st.fixed_dictionaries(
    {},
    optional={
        "schema": _maybe(
            st.one_of(st.just("com.example/prop-test/1-0-0"), _any_scalar)
        ),
        "origin": _maybe(_any_scalar),
        "data": _maybe(
            st.one_of(
                _any_scalar,
                st.fixed_dictionaries(
                    {},
                    optional={
                        "id": _maybe(_any_scalar),
                        "category": _maybe(
                            st.one_of(st.sampled_from(["A", "B", "D"]),
                                      _any_scalar)
                        ),
                        "quantity": _maybe(
                            st.one_of(st.integers(-5, 105), _any_scalar)
                        ),
                        "price": _maybe(_any_scalar),
                        "flag": _maybe(_any_scalar),
                        "tags": _maybe(
                            st.lists(_short_text(8), max_size=5)
                        ),
                    },
                ),
            )
        ),
    },
)


def _strip_nulls(obj):
    if isinstance(obj, dict):
        return {k: _strip_nulls(v) for k, v in obj.items() if v is not None}
    return obj


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(mistyped_payloads, min_size=20, max_size=40))
def test_fast_path_type_fidelity_matches_jsonschema(spark, compiled, batch):
    cleaned = [_strip_absent(p) for p in batch]
    df = spark.createDataFrame(
        [(json.dumps(p),) for p in cleaned], "payload string"
    )
    variant = F.try_parse_json(F.col("payload"))
    parsed = variant.try_cast(compiled.struct)
    got = [
        r.ok
        for r in df.select(
            F.coalesce(
                compiled.validate(F.col("payload"), parsed, variant),
                F.lit(False),
            ).alias("ok")
        ).collect()
    ]
    want = [_jsonschema_ok(_strip_nulls(p)) for p in cleaned]
    mismatches = [
        (p, g, w) for p, g, w in zip(cleaned, got, want) if g != w
    ]
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
