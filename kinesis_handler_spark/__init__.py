"""kinesis_handler_spark — a PySpark-native analytics & stream-routing engine.

A from-scratch re-expression of the capability surface of
``Nordstrom/kinesis-handler`` (reference: ``lib/kinesisHandler.js``) on
Apache Spark:

* a **streaming routing engine** (``kinesis_handler_spark.routing``)
  reproducing the reference's decode → parse → transform → validate →
  content-based-route → dead-letter pipeline on Structured Streaming
  (reference lifecycle at ``lib/kinesisHandler.js:132-191``), and
* a **batch analytics layer** (``kinesis_handler_spark.queries``) — joins,
  aggregations, window functions, set ops, scalar functions, plus the
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) — every operator expressed with the DataFrame/SQL
  API so Catalyst/AQE pick the physical plan, and designed to survive a
  100 TB / 1000-executor scale-up (no collect() in any operator path, no
  O(n^2) algorithms without an LSH/bucketed scale variant).

Nothing here is a port: the reference is a row-at-a-time Node.js library;
this engine is declarative Spark.
"""

from kinesis_handler_spark.session import get_spark
from kinesis_handler_spark.tables import TABLES, table

__all__ = ["get_spark", "table", "TABLES"]

__version__ = "0.1.0"
