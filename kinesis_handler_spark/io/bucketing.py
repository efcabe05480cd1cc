"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both
sides on the key. Bucketing pre-partitions the data ON DISK by
``hash(key) % n_buckets`` at write time; two tables bucketed the same
way join bucket-to-bucket with NO exchange — the shuffle is paid once
at ingest, then amortized over every downstream join/aggregation on
that key. (Spark's bucketed scan also feeds groupBy on the bucket key
without an exchange.)

Sizing rule: n_buckets ≈ total_data / target_partition_size (128-512
MB per bucket file per partition-dir); both join sides MUST share
n_buckets and bucket columns for the co-located plan to kick in
(``spark.sql.sources.bucketing.enabled`` is on by default).

Trust model: bucket metadata is a PROMISE to the planner — a catalog
entry declaring ``CLUSTERED BY (k) INTO 8 BUCKETS`` over files that
were actually written with a different spec makes Spark skip the
exchange and silently join misaligned rows.  So every bucketed write
here leaves a ``_BUCKET_SPEC.json`` sidecar next to ``_SUCCESS``
recording (bucket cols, n_buckets, sort cols, schema), and registering
over EXISTING files validates the sidecar first — a stale or foreign
directory raises instead of producing wrong joins (ADVICE r5).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_SPEC_FILE = "_BUCKET_SPEC.json"


def _spec_dict(
    df: DataFrame,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None,
) -> dict:
    return {
        "bucket_cols": list(bucket_cols),
        "n_buckets": int(n_buckets),
        "sort_cols": list(sort_cols) if sort_cols else [],
        # simpleString is stable across sessions and cheap to diff;
        # it pins both column names/order and types.
        "schema": df.schema.simpleString(),
    }


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    path: str,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table (plus the spec
    sidecar that lets future sessions safely re-register the files).

    ``sort_cols`` additionally sorts within each bucket file — a
    sort-merge join over same-sorted buckets skips its sort stage too.
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    with open(Path(path) / _SPEC_FILE, "w") as fh:
        json.dump(_spec_dict(df, bucket_cols, n_buckets, sort_cols), fh)


def _register_over_files(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    path: str,
    sort_cols: Sequence[str] | None,
) -> None:
    """CREATE an external bucketed table over already-written files,
    after proving the files really carry the declared spec."""
    spec_path = Path(path) / _SPEC_FILE
    want = _spec_dict(df, bucket_cols, n_buckets, sort_cols)
    try:
        with open(spec_path) as fh:
            have = json.load(fh)
    except (OSError, ValueError) as exc:
        raise ValueError(
            f"bucketed dir {path} has _SUCCESS but no readable "
            f"{_SPEC_FILE} — refusing to declare bucket metadata over "
            f"files of unknown layout (wrong-results hazard): {exc}"
        ) from exc
    if have != want:
        raise ValueError(
            f"bucket spec mismatch at {path}: files were written with "
            f"{have}, caller wants {want} — declaring the new spec over "
            f"the old files would silently misalign co-located joins. "
            f"Write to a fresh path (or delete the stale dir) instead."
        )
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    bcols = ", ".join(f"`{c}`" for c in bucket_cols)
    sorted_by = (
        f"SORTED BY ({', '.join(f'`{c}`' for c in sort_cols)}) "
        if sort_cols
        else ""
    )
    spark.sql(
        f"CREATE TABLE `{table_name}` ({cols}) USING PARQUET "
        f"CLUSTERED BY ({bcols}) {sorted_by}INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    path: str,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Idempotent, reuse-friendly variant of :func:`write_bucketed`.

    The catalog is per-session but the bucket FILES are not: a fresh
    session whose catalog lacks ``table_name`` must not blindly
    overwrite ``path`` — a concurrent session may be mid-scan over
    those files (overwrite deletes them under the reader), and at 100 TB
    re-bucketing an already-bucketed table repays the ingest shuffle
    for nothing.  So: files already complete (``_SUCCESS``) → validate
    the ``_BUCKET_SPEC.json`` sidecar, then register an external
    bucketed table over them via DDL; otherwise write them — into a
    process-private temp dir first, atomically renamed into place, so
    two sessions racing a cold cache can never interleave bucket files
    in the shared path (same discipline as ``sources_q._materialize``).
    """
    if spark.catalog.tableExists(table_name):
        return
    final = Path(path)
    if (final / "_SUCCESS").exists():
        _register_over_files(
            spark, df, table_name, bucket_cols, n_buckets, path, sort_cols
        )
        return
    # Cold write: land the bucketed files in a temp sibling dir under a
    # temp catalog name, publish with one atomic rename, then register
    # the real table over the published files.
    tmp = final.parent / f".{final.name}.tmp.{os.getpid()}"
    tmp_table = f"{table_name}__tmp_{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        write_bucketed(
            df, tmp_table, bucket_cols, n_buckets,
            path=str(tmp), sort_cols=sort_cols,
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{tmp_table}`")
    # Debris without _SUCCESS is a crashed writer's leftovers — clear it.
    if final.exists() and not (final / "_SUCCESS").exists():
        shutil.rmtree(final, ignore_errors=True)
    try:
        os.rename(tmp, final)
    except OSError:
        # Only treat this as "lost the publish race" when a winner's
        # complete output actually exists — its contents are
        # deterministic-equal, so ours can go.  Any other rename
        # failure (EXDEV across filesystems, permissions) must NOT
        # silently destroy the freshly written bucket files and then
        # surface later as a misleading missing-sidecar error
        # (ADVICE r6).
        if (final / "_SUCCESS").exists():
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    _register_over_files(
        spark, df, table_name, bucket_cols, n_buckets, path, sort_cols
    )


def append_bucketed(
    spark: SparkSession, df: DataFrame, table_name: str, *, path: str
) -> None:
    """Append rows to an EXISTING bucketed table, preserving its spec.

    Appends are the wrong-results hazard of bucketed storage: rows
    landed via a plain path write carry NO bucket hashing, yet the
    catalog's CLUSTERED BY promise makes the planner skip the exchange
    — a silently misaligned join.  So appends here (a) re-read the
    ``_BUCKET_SPEC.json`` sidecar and refuse on schema drift, (b) go
    through the catalog writer with the SAME bucketBy/sortBy spec (each
    append lands its own correctly-hashed bucket files; a bucketed scan
    groups all files of a bucket id across writes, so co-location
    survives any number of appends — Spark additionally validates the
    spec against the existing table), and (c) refresh the table so
    readers in this session see the new files.  Registration is
    idempotent for fresh sessions (catalog is per-session, files are
    not)."""
    spec_path = Path(path) / _SPEC_FILE
    try:
        with open(spec_path) as fh:
            have = json.load(fh)
    except (OSError, ValueError) as exc:
        raise ValueError(
            f"cannot append to {path}: no readable {_SPEC_FILE} — the "
            "directory was not written by write_bucketed (appending "
            "unbucketed-layout files under a CLUSTERED BY promise is "
            "the wrong-results hazard this sidecar exists to stop)"
        ) from exc
    if df.schema.simpleString() != have["schema"]:
        raise ValueError(
            f"append schema {df.schema.simpleString()} does not match "
            f"the bucketed table's {have['schema']} — a bucketed scan "
            "would read misaligned columns"
        )
    sort_cols = have["sort_cols"] or None
    if not spark.catalog.tableExists(table_name):
        _register_over_files(
            spark, df, table_name, have["bucket_cols"],
            have["n_buckets"], path, sort_cols,
        )
    writer = df.write.mode("append").bucketBy(
        have["n_buckets"], *have["bucket_cols"]
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    spark.catalog.refreshTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Bucketed reads go through the catalog — ``spark.read.parquet``
    on the files would discard bucket metadata (and re-shuffle)."""
    return spark.table(table_name)
