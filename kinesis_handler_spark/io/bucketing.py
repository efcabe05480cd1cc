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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    path: str,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table.

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
    for nothing.  So: files already complete (``_SUCCESS``) → register
    an external bucketed table over them via DDL; otherwise write them.
    The DDL declares the same bucket spec the files were written with,
    which is what makes the metadata trustworthy.
    """
    if spark.catalog.tableExists(table_name):
        return
    from pathlib import Path

    if (Path(path) / "_SUCCESS").exists():
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
        return
    write_bucketed(
        df, table_name, bucket_cols, n_buckets, path=path, sort_cols=sort_cols
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Bucketed reads go through the catalog — ``spark.read.parquet``
    on the files would discard bucket metadata (and re-shuffle)."""
    return spark.table(table_name)
