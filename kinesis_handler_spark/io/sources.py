"""Stream sources for the routing engine (reference R4 — the Kinesis
ingest entry point, lib/kinesisHandler.js:132-139/:316-333).

Three tiers, all yielding the same ``ENVELOPE_SCHEMA``-shaped stream so
the engine is source-agnostic:

* ``kinesis_stream``       — production: the public Apache-2.0
  `spark-sql-kinesis-connector` (format ``aws-kinesis``), normalized to
  the envelope columns. Gated: raises a clear error when the connector
  jar isn't on the classpath (it isn't in this container).
* ``envelope_json_stream`` — dev/test: JSON-lines files shaped like the
  Lambda ``Records[]`` envelope (the reference's documented batch
  shape, lib/kinesisHandler.js:19-57).
* ``rate_envelope_stream`` — load-gen: Spark's ``rate`` source mapped
  into synthetic envelope rows (deterministic per ``value``), for
  throughput/soak tests without any external dependency.

At 100 TB/day the scale knobs live in the source: shard-parallel read
(one task per Kinesis shard), ``maxFetchRate``/``maxFilesPerTrigger``
to bound micro-batch size, and an envelope projection so only the
columns the engine uses cross the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.routing.engine import ENVELOPE_SCHEMA

#: Options forwarded to the spark-sql-kinesis-connector. Kept as data so
#: unit tests can check option-building without the connector jar.
KINESIS_FORMAT = "aws-kinesis"


def kinesis_source_options(
    stream_name: str,
    region: str,
    *,
    endpoint_url: str | None = None,
    starting_position: str = "LATEST",
    max_fetch_rate_per_shard_mb: int | None = None,
) -> dict[str, str]:
    """Connector options for ``spark.readStream.format('aws-kinesis')``.

    ``starting_position``: LATEST | TRIM_HORIZON | AT_TIMESTAMP.
    ``max_fetch_rate_per_shard_mb`` bounds per-shard read throughput —
    the back-pressure knob that keeps micro-batches sized for executor
    memory when a 1000-shard stream bursts.
    """
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": starting_position,
    }
    if endpoint_url is not None:
        opts["endpointUrl"] = endpoint_url
    if max_fetch_rate_per_shard_mb is not None:
        opts["maxFetchRatePerShard"] = str(max_fetch_rate_per_shard_mb)
    return opts


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    account_id: str = "000000000000",
    **kwargs,
) -> DataFrame:
    """Production Kinesis source → envelope-shaped stream.

    The connector emits ``data BINARY, streamName, partitionKey,
    sequenceNumber, approximateArrivalTimestamp, shardId``; we project
    to ``ENVELOPE_SCHEMA`` (binary ``data`` is accepted directly by the
    engine's decode stage — no base64 round-trip).
    """
    try:
        raw = (
            spark.readStream.format(KINESIS_FORMAT)
            .options(**kinesis_source_options(stream_name, region, **kwargs))
            .load()
        )
    except Exception as exc:
        # Rewrite ONLY the missing-jar failure; a bad option or endpoint
        # must surface as itself, or operators debug the classpath
        # instead of their config.
        msg = str(exc)
        if (
            "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            raise RuntimeError(
                "Kinesis connector not available: add the public "
                "spark-sql-kinesis-connector jar (format 'aws-kinesis') to "
                "spark.jars.packages, or use envelope_json_stream / "
                "rate_envelope_stream for local runs"
            ) from exc
        raise
    return raw.select(
        F.col("partitionKey"),
        F.col("sequenceNumber"),
        F.col("data"),
        F.col("approximateArrivalTimestamp"),
        F.concat_ws(":", F.col("shardId"), F.col("sequenceNumber")).alias("eventID"),
        F.lit("aws:kinesis").alias("eventSource"),
        # full 6-part ARN (region:account:stream/name) — the connector
        # doesn't surface the account, so callers pass account_id; a
        # 5-part ARN would shift fields for any consumer splitting on ':'
        F.concat(
            F.lit("arn:aws:kinesis:"),
            F.lit(region),
            F.lit(":"),
            F.lit(account_id),
            F.lit(":stream/"),
            F.col("streamName"),
        ).alias("eventSourceARN"),
        F.lit(region).alias("awsRegion"),
    )


#: Canonical config keys understood by :func:`open_envelope_stream`.
#: Everything else in the config dict is forwarded verbatim as a source
#: option, so connector-specific tuning needs no code change here.
_RESERVED_KEYS = {"format", "path", "stream_name", "region", "payload_b64"}


def open_envelope_stream(spark: SparkSession, config: dict) -> DataFrame:
    """Config-driven source binding (reference R4,
    lib/kinesisHandler.js:132-139 — where the reference hard-wires its
    Kinesis client, this engine binds ANY envelope-shaped source from
    configuration alone; swapping dev files for production Kinesis is a
    config edit, not a code edit).

    ``config["format"]``:

    * ``"aws-kinesis"`` / ``"kinesis"`` — the public connector via
      :func:`kinesis_stream` (needs ``stream_name`` + ``region``;
      raises the documented RuntimeError when the jar is absent).
    * ``"json-files"`` / ``"json"`` — :func:`envelope_json_stream`
      (needs ``path``), the dev/test file twin.
    * ``"rate"`` — :func:`rate_envelope_stream` (needs
      ``payload_b64``), the load-gen twin.
    * anything else — passed straight to
      ``spark.readStream.format(fmt)`` with the remaining config as
      options; the resulting stream must satisfy
      :func:`check_envelope_contract` (validated here), which is what
      lets a future connector bind with zero edits.

    Every tier returns a stream satisfying the same envelope contract,
    so ``RoutingEngine.run_stream`` is oblivious to the source.
    """
    cfg = dict(config)
    fmt = cfg.get("format", "json-files")
    extra = {k: v for k, v in cfg.items() if k not in _RESERVED_KEYS}
    if fmt in ("aws-kinesis", "kinesis"):
        return kinesis_stream(
            spark, cfg["stream_name"], cfg["region"], **extra
        )
    if fmt in ("json-files", "json"):
        return envelope_json_stream(spark, cfg["path"], **extra)
    if fmt == "rate":
        return rate_envelope_stream(
            spark, payload_b64=cfg["payload_b64"], **extra
        )
    df = (
        spark.readStream.format(fmt)
        .options(**{k: str(v) for k, v in extra.items()})
        .load(cfg["path"]) if "path" in cfg
        else spark.readStream.format(fmt)
        .options(**{k: str(v) for k, v in extra.items()})
        .load()
    )
    check_envelope_contract(df)
    return df


def check_envelope_contract(df: DataFrame) -> None:
    """The source contract ``run_stream`` depends on: a STREAMING frame
    carrying every ``ENVELOPE_SCHEMA`` column with a compatible type
    (``data`` may be STRING base64 or raw BINARY — the decode stage
    accepts both).  Raises ``ValueError`` with the exact gap otherwise;
    the file/rate twins and the Kinesis projection all pass, which is
    what makes them interchangeable under the engine
    (tests/test_routing_stream.py::TestSourceContract)."""
    if not df.isStreaming:
        raise ValueError("envelope source must be a streaming DataFrame")
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for f in ENVELOPE_SCHEMA.fields:
        got = have.get(f.name)
        want = f.dataType.simpleString()
        ok = got == want or (f.name == "data" and got in ("string", "binary"))
        if got is None:
            problems.append(f"missing column {f.name} ({want})")
        elif not ok:
            problems.append(f"{f.name}: want {want}, got {got}")
    if problems:
        raise ValueError(
            "stream does not satisfy the envelope contract: "
            + "; ".join(problems)
        )


def envelope_json_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based dev/test source: JSON-lines of envelope rows.

    Fixed ``ENVELOPE_SCHEMA`` (no inference — a streaming source must
    not change schema between micro-batches); ``maxFilesPerTrigger``
    bounds micro-batch size the way Kinesis fetch limits do.
    """
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def rate_envelope_stream(
    spark: SparkSession,
    *,
    rows_per_second: int = 100,
    payload_b64: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic envelope stream from the built-in ``rate`` source.

    Every generated row carries ``payload_b64`` as its data and a
    deterministic partition key / sequence number derived from
    ``value`` — enough to drive the full decode→validate→route pipeline
    at a controlled record rate for throughput tests.
    """
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    rate = reader.load()  # columns: timestamp, value
    return rate.select(
        F.concat(F.lit("pk-"), F.pmod(F.col("value"), F.lit(8))).alias(
            "partitionKey"
        ),
        F.format_string("%021d", F.col("value")).alias("sequenceNumber"),
        F.lit(payload_b64).alias("data"),
        F.col("timestamp").alias("approximateArrivalTimestamp"),
        F.format_string("shardId-%012d:%021d", F.pmod(F.col("value"), F.lit(8)), F.col("value")).alias("eventID"),
        F.lit("spark:rate").alias("eventSource"),
        F.lit("arn:spark:rate:stream/synthetic").alias("eventSourceARN"),
        F.lit("local").alias("awsRegion"),
    )
