"""JSON-Schema → Spark ``StructType`` + constraint-predicate compiler.

The reference registers JSON-Schema documents with AJV, which compiles
each into a specialized validator function at registration time
(lib/kinesisHandler.js:83-84,93; ajv dep package.json:26-28).  This
module is the Spark analogue: compile ONCE on the driver into

* a ``StructType`` for ``from_json`` (structural conformance — wrong
  shape / wrong types surface as nulls), and
* a boolean ``Column`` predicate over the parsed struct (value
  constraints: required / enum / pattern / bounds — evaluated JVM-side
  inside whole-stage codegen, never per-record Python).

Schema documents follow the reference's ``self`` convention: the
registry ID is ``vendor/name/version`` (makeSchemaId,
lib/kinesisHandler.js:15-17).

Supported keywords: type (object/string/number/integer/boolean/array),
properties (nested), required, enum, pattern, minimum/maximum,
exclusiveMinimum/exclusiveMaximum, minLength/maxLength, items,
minItems/maxItems, const.  Unsupported keywords raise at registration
(fail-fast, like a bad schema at AJV compile time).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUPPORTED_KEYWORDS = {
    "type", "properties", "required", "enum", "pattern", "minimum",
    "maximum", "exclusiveMinimum", "exclusiveMaximum", "minLength",
    "maxLength", "items", "minItems", "maxItems", "const", "self",
    "$schema", "title", "description", "additionalProperties", "default",
}

_SCALAR_TYPES = {
    "string": T.StringType(),
    "number": T.DoubleType(),
    "integer": T.LongType(),
    "boolean": T.BooleanType(),
}


class UnsupportedSchemaError(ValueError):
    """Raised at registration for JSON-Schema keywords we cannot compile
    (the engine's analogue of an AJV compile failure)."""


def make_schemaless_id(schema: dict) -> str | None:
    self_block = schema.get("self")
    if not isinstance(self_block, dict):
        return None
    try:
        return f"{self_block['vendor']}/{self_block['name']}/{self_block['version']}"
    except KeyError:
        return None


def make_schema_id(schema: dict) -> str:
    """Registry key from the schema's ``self`` block —
    ``vendor/name/version`` (reference makeSchemaId,
    lib/kinesisHandler.js:15-17)."""
    sid = make_schemaless_id(schema)
    if sid is None:
        raise ValueError("schema missing self:{vendor,name,version} block")
    return sid


@dataclass(frozen=True)
class CompiledSchema:
    schema_id: str
    struct: T.StructType
    doc: dict

    def predicate(self, col: Column) -> Column:
        """Boolean Column: does the parsed struct at ``col`` satisfy all
        value constraints?  Null-safe: violations and absent values both
        yield False where the schema requires presence."""
        return _predicate(self.doc, col, required=True)


def _check_keywords(doc: dict) -> None:
    unknown = set(doc) - _SUPPORTED_KEYWORDS
    if unknown:
        raise UnsupportedSchemaError(
            f"unsupported JSON-Schema keywords: {sorted(unknown)}"
        )


def _to_datatype(doc: dict) -> T.DataType:
    _check_keywords(doc)
    jtype = doc.get("type", "object")
    if jtype == "object":
        fields = []
        for name, sub in sorted(doc.get("properties", {}).items()):
            fields.append(T.StructField(name, _to_datatype(sub), nullable=True))
        if not fields:
            # free-form object: keep raw JSON text of the subtree
            return T.MapType(T.StringType(), T.StringType())
        return T.StructType(fields)
    if jtype == "array":
        item_doc = doc.get("items", {"type": "string"})
        return T.ArrayType(_to_datatype(item_doc))
    if jtype in _SCALAR_TYPES:
        return _SCALAR_TYPES[jtype]
    raise UnsupportedSchemaError(f"unsupported type {jtype!r}")


def _scalar_constraints(doc: dict, col: Column) -> list[Column]:
    preds: list[Column] = []
    if "enum" in doc:
        preds.append(col.isin(*doc["enum"]))
    if "const" in doc:
        preds.append(col == F.lit(doc["const"]))
    if "pattern" in doc:
        # JSON-Schema pattern is unanchored; rlike is unanchored too.
        preds.append(col.rlike(doc["pattern"]))
    if "minimum" in doc:
        preds.append(col >= F.lit(doc["minimum"]))
    if "maximum" in doc:
        preds.append(col <= F.lit(doc["maximum"]))
    if "exclusiveMinimum" in doc:
        preds.append(col > F.lit(doc["exclusiveMinimum"]))
    if "exclusiveMaximum" in doc:
        preds.append(col < F.lit(doc["exclusiveMaximum"]))
    if "minLength" in doc:
        preds.append(F.length(col) >= F.lit(doc["minLength"]))
    if "maxLength" in doc:
        preds.append(F.length(col) <= F.lit(doc["maxLength"]))
    return preds


def _predicate(doc: dict, col: Column, required: bool) -> Column:
    """Constraint predicate for one schema node over its parsed column."""
    jtype = doc.get("type", "object")
    preds: list[Column] = []
    if jtype == "object":
        props = doc.get("properties", {})
        required_names = set(doc.get("required", []))
        for name, sub in props.items():
            preds.append(_predicate(sub, col.getField(name), name in required_names))
        if required_names - set(props):
            for name in sorted(required_names - set(props)):
                # required but untyped: can't project it; structural parse
                # would need the field in the struct — treat as error.
                raise UnsupportedSchemaError(
                    f"required property {name!r} missing from properties"
                )
        node_ok = reduce(lambda a, b: a & b, preds, F.lit(True))
        presence = col.isNotNull()
    elif jtype == "array":
        item_doc = doc.get("items")
        preds = []
        if "minItems" in doc:
            preds.append(F.size(col) >= F.lit(doc["minItems"]))
        if "maxItems" in doc:
            preds.append(F.size(col) <= F.lit(doc["maxItems"]))
        if item_doc and set(item_doc) & {
            "enum", "pattern", "minimum", "maximum", "const",
            "exclusiveMinimum", "exclusiveMaximum", "minLength", "maxLength",
        }:
            preds.append(
                F.forall(col, lambda x: _predicate(item_doc, x, required=True))
            )
        node_ok = reduce(lambda a, b: a & b, preds, F.lit(True))
        presence = col.isNotNull()
    else:
        preds = _scalar_constraints(doc, col)
        node_ok = reduce(lambda a, b: a & b, preds, F.lit(True))
        presence = col.isNotNull()

    if required:
        return presence & F.coalesce(node_ok, F.lit(False))
    # optional: absent is fine; present must satisfy constraints
    return ~presence | F.coalesce(node_ok, F.lit(False))


def compile_schema(doc: dict) -> CompiledSchema:
    """Compile a JSON-Schema document (with ``self`` ID block) into a
    CompiledSchema.  Raises UnsupportedSchemaError for keywords outside
    the supported subset — at registration time, not per record."""
    schema_id = make_schema_id(doc)
    struct = _to_datatype(doc)
    if not isinstance(struct, T.StructType):
        raise UnsupportedSchemaError("top-level schema must be an object")
    return CompiledSchema(schema_id=schema_id, struct=struct, doc=doc)
