"""Streaming routing engine — the Spark-native re-expression of the
reference's entire surface (lib/kinesisHandler.js):

* :mod:`schema_compiler` — JSON-Schema document → Spark StructType +
  constraint predicate (the analogue of AJV's compile step,
  kinesisHandler.js:83-84,93).
* :mod:`engine` — decode → parse → transform → validate → route →
  dead-letter pipeline (kinesisHandler.js:107-191), batch and
  Structured-Streaming entry points, parallel and ordered disciplines.
"""

from kinesis_handler_spark.routing.engine import (
    RoutingEngine,
    RoutingResult,
    ENVELOPE_SCHEMA,
)
from kinesis_handler_spark.routing.schema_compiler import (
    CompiledSchema,
    compile_schema,
    make_schema_id,
)

__all__ = [
    "RoutingEngine",
    "RoutingResult",
    "ENVELOPE_SCHEMA",
    "CompiledSchema",
    "compile_schema",
    "make_schema_id",
]
